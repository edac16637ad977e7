"""Pins for ocr_platform_spark.crypto: published standard vectors plus a
randomized bidirectional cross-check against the JDK's JCE ciphers.

The AES block vectors are FIPS-197 Appendix C (all three key sizes, the
full worked examples of the standard); CBC chaining is pinned by NIST
SP 800-38A F.2.1/F.2.2; RC4 by the classic published Key/Wiki/Secret
vectors. JCE (``tools/CryptoTool.java``) then cross-checks random keys
and sizes in both directions, so neither side's tables can be wrong in
a way the fixed vectors happen to miss.
"""

import os

import numpy as np
import pytest

from ocr_platform_spark import crypto
from ocr_platform_spark.crypto import (
    AES,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    pkcs7_pad,
    pkcs7_unpad,
    rc4,
)


def _rng(seed=11):
    return np.random.default_rng(seed)


def _rand(rng, n) -> bytes:
    return bytes(rng.integers(0, 256, n, dtype=np.uint8))


# --------------------------------------------------------------------------
# S-box construction
# --------------------------------------------------------------------------


def test_sbox_is_the_fips_sbox():
    # FIPS-197 figure 7 spot values incl. the inv(1) corner the affine
    # construction must get right
    assert crypto._SBOX[0x00] == 0x63
    assert crypto._SBOX[0x01] == 0x7C
    assert crypto._SBOX[0x53] == 0xED
    assert crypto._SBOX[0xFF] == 0x16
    assert crypto._SBOX[0xC9] == 0xDD
    assert sorted(crypto._SBOX) == list(range(256))  # bijection
    assert all(crypto._INV_SBOX[crypto._SBOX[i]] == i for i in range(256))


# --------------------------------------------------------------------------
# FIPS-197 Appendix C block vectors
# --------------------------------------------------------------------------

_PT = bytes.fromhex("00112233445566778899aabbccddeeff")
_FIPS_C = [
    (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
    (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
    (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
]


@pytest.mark.parametrize("key,ct", _FIPS_C, ids=["128", "192", "256"])
def test_fips197_appendix_c_both_directions(key, ct):
    a = AES(key)
    assert a.encrypt_block(_PT).hex() == ct
    assert a.decrypt_block(bytes.fromhex(ct)) == _PT
    assert a.decrypt_blocks(bytes.fromhex(ct) * 5) == _PT * 5


def test_aes_key_and_block_contracts():
    with pytest.raises(ValueError):
        AES(b"short")
    with pytest.raises(ValueError):
        AES(bytes(16)).encrypt_block(b"x" * 15)
    with pytest.raises(ValueError):
        AES(bytes(16)).decrypt_blocks(b"x" * 17)
    assert AES(bytes(16)).decrypt_blocks(b"") == b""


# --------------------------------------------------------------------------
# NIST SP 800-38A CBC vectors
# --------------------------------------------------------------------------

_NIST_KEY = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
_NIST_IV = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
_NIST_PT = bytes.fromhex(
    "6bc1bee22e409f96e93d7e117393172a"
    "ae2d8a571e03ac9c9eb76fac45af8e51"
    "30c81c46a35ce411e5fbc1191a0a52ef"
    "f69f2445df4f9b17ad2b417be66c3710"
)
_NIST_CT = bytes.fromhex(
    "7649abac8119b246cee98e9b12e9197d"
    "5086cb9b507219ee95db113a917678b2"
    "73bed6b8e3c1743b7116e69e22229516"
    "3ff1caa1681fac09120eca307586e1a7"
)


def test_sp800_38a_cbc_aes128():
    assert aes_cbc_encrypt(_NIST_KEY, _NIST_IV, _NIST_PT) == _NIST_CT
    assert aes_cbc_decrypt(_NIST_KEY, _NIST_IV, _NIST_CT) == _NIST_PT


def test_cbc_roundtrip_random_all_key_sizes():
    rng = _rng(3)
    for klen in (16, 24, 32):
        for nblocks in (1, 2, 7, 130):
            key, iv = _rand(rng, klen), _rand(rng, 16)
            pt = _rand(rng, 16 * nblocks)
            assert aes_cbc_decrypt(key, iv, aes_cbc_encrypt(key, iv, pt)) \
                == pt


def test_cbc_error_contracts():
    key, iv = bytes(16), bytes(16)
    with pytest.raises(ValueError):
        aes_cbc_encrypt(key, b"short", bytes(16))
    with pytest.raises(ValueError):
        aes_cbc_encrypt(key, iv, bytes(15))
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, iv, b"")
    with pytest.raises(ValueError):
        aes_cbc_decrypt(key, iv, bytes(17))


# --------------------------------------------------------------------------
# PKCS#7-style padding (PDF 7.6.2 block padding)
# --------------------------------------------------------------------------


def test_pkcs7_pad_unpad():
    rng = _rng(5)
    for n in (0, 1, 15, 16, 17, 100):
        data = _rand(rng, n)
        padded = pkcs7_pad(data)
        assert len(padded) % 16 == 0 and len(padded) > len(data)
        assert pkcs7_unpad(padded) == data
    with pytest.raises(ValueError):
        pkcs7_unpad(b"")
    with pytest.raises(ValueError):
        pkcs7_unpad(bytes(15) + b"\x00")  # pad byte 0 invalid
    with pytest.raises(ValueError):
        pkcs7_unpad(bytes(14) + b"\x05\x02")  # inconsistent pad bytes
    with pytest.raises(ValueError):
        pkcs7_unpad(bytes(15) + b"\x11")  # pad byte > 16


# --------------------------------------------------------------------------
# RC4 published vectors
# --------------------------------------------------------------------------


def test_rc4_published_vectors():
    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    assert rc4(b"Secret", b"Attack at dawn").hex().upper() \
        == "45A01F645FC35B383552544B9BF5"


def test_rc4_is_an_involution_and_key_contract():
    rng = _rng(7)
    for klen in (1, 5, 16, 256):
        key, data = _rand(rng, klen), _rand(rng, 333)
        assert rc4(key, rc4(key, data)) == data
    with pytest.raises(ValueError):
        rc4(b"", b"data")


# --------------------------------------------------------------------------
# JCE cross-check (external ground truth)
# --------------------------------------------------------------------------


def test_jce_cross_check_rc4_and_aes_cbc(cryptotool):
    rng = _rng(13)
    for klen in (5, 13, 16):
        key, data = _rand(rng, klen), _rand(rng, 257)
        assert rc4(key, data).hex() == cryptotool("rc4", key.hex(),
                                                  data.hex())
    for klen in (16, 32):
        key, iv = _rand(rng, klen), _rand(rng, 16)
        pt = _rand(rng, 16 * 9)
        ours = aes_cbc_encrypt(key, iv, pt)
        assert ours.hex() == cryptotool("aescbcenc", key.hex(), iv.hex(),
                                        pt.hex())
        # and decrypt THEIR ciphertext (not just our own round-trip)
        jce_ct = bytes.fromhex(cryptotool("aescbcenc", key.hex(), iv.hex(),
                                          pt.hex()))
        assert aes_cbc_decrypt(key, iv, jce_ct) == pt
        assert cryptotool("aescbcdec", key.hex(), iv.hex(),
                          ours.hex()) == pt.hex()


def test_fips_vectors_against_jce_too(cryptotool):
    # the Appendix C constants themselves, through JCE (guards against a
    # mistranscribed expected string agreeing with a broken cipher)
    for key, ct in _FIPS_C:
        got = cryptotool("aescbcenc", key.hex(), bytes(16).hex(), _PT.hex())
        assert got == ct
