"""RC4 and AES primitives for PDF standard-security-handler decryption.

Web-crawl PDF corpora contain a steady fraction of *encrypted-but-open*
documents: the standard security handler with an empty user password,
applied for "copy protection" or by default in office-suite exporters.
Readers open them silently; a pipeline that quarantines them loses a
real slice of the corpus. The reference opens such files implicitly
through PyMuPDF (``fitz.open`` authenticates the empty password before
``get_pixmap``, ``apps/worker/app/tasks/ocr_tasks.py:39-52``); this
module supplies the ciphers so :mod:`ocr_platform_spark.pdfcrypt` can do
the same dependency-free.

Everything here is a from-scratch transcription of public standards —
FIPS-197 (AES) and the original RC4 KSA/PRGA — with the test suite
pinning the S-box construction, the FIPS-197 Appendix C block vectors,
the NIST SP 800-38A CBC vectors, the classic published RC4 vectors, and
a randomized bidirectional cross-check against the JDK's JCE ciphers
(``tools/CryptoTool.java``).

Performance split (both sides test-pinned equal):

* bulk **decryption** (the hot path — every stream of an encrypted PDF)
  is numpy-vectorized across blocks: CBC decryption has no inter-block
  dependency (``P_i = D(C_i) XOR C_{i-1}``), so the inverse cipher runs
  on an ``(n_blocks, 4, 4)`` state array in one pass;
* **encryption** (fixtures, and the AES-CBC MAC-like round function
  inside the R6 password hash) is inherently sequential across blocks
  under CBC, so a plain-Python per-block cipher is used there.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# GF(2^8) tables and the AES S-box, built from first principles
# --------------------------------------------------------------------------


def _gf_tables() -> tuple[list[int], list[int]]:
    """exp/log tables over GF(2^8) mod x^8+x^4+x^3+x+1, generator 3."""
    exp, log = [0] * 256, [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by the generator 3 = x * 2 XOR x
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
    return exp, log


_EXP, _LOG = _gf_tables()


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[(_LOG[a] + _LOG[b]) % 255]


def _build_sbox() -> list[int]:
    """FIPS-197 5.1.1: multiplicative inverse then the affine transform."""
    sbox = [0] * 256
    for a in range(256):
        # a^-1 = g^(255 - log a); the index wraps (inv(1) = g^0 = 1)
        inv = 0 if a == 0 else _EXP[(255 - _LOG[a]) % 255]
        r, b = inv, inv
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            r ^= b
        sbox[a] = r ^ 0x63
    return sbox


_SBOX = _build_sbox()
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i

# gmul-by-constant lookup tables for (Inv)MixColumns
_T2 = [_gmul(2, a) for a in range(256)]
_T3 = [_gmul(3, a) for a in range(256)]
_T9 = [_gmul(9, a) for a in range(256)]
_TB = [_gmul(0xB, a) for a in range(256)]
_TD = [_gmul(0xD, a) for a in range(256)]
_TE = [_gmul(0xE, a) for a in range(256)]

# numpy copies for the vectorized inverse cipher
_SBOX_NP = np.array(_SBOX, np.uint8)
_INV_SBOX_NP = np.array(_INV_SBOX, np.uint8)
_T9_NP = np.array(_T9, np.uint8)
_TB_NP = np.array(_TB, np.uint8)
_TD_NP = np.array(_TD, np.uint8)
_TE_NP = np.array(_TE, np.uint8)

# InvShiftRows gather indices: row r right-rotates by r
_ROWS = np.arange(4)[:, None]
_INV_SHIFT_COLS = (np.arange(4)[None, :] - np.arange(4)[:, None]) % 4

# 32-bit T-tables for the scalar forward cipher: with column words
# w_j = s0<<24 | s1<<16 | s2<<8 | s3, one fused SubBytes+ShiftRows+
# MixColumns round is  w'_j = TA[b0(w_j)] ^ TB[b1(w_{j+1})] ^
# TC[b2(w_{j+2})] ^ TD[b3(w_{j+3})] ^ rk_j  (each table column is one
# MixColumns matrix column applied to S[x])
_TEA = [(_T2[s] << 24) | (s << 16) | (s << 8) | _T3[s]
        for s in _SBOX]
_TEB = [(_T3[s] << 24) | (_T2[s] << 16) | (s << 8) | s
        for s in _SBOX]
_TEC = [(s << 24) | (_T3[s] << 16) | (_T2[s] << 8) | s
        for s in _SBOX]
_TED = [(s << 24) | (s << 16) | (_T3[s] << 8) | _T2[s]
        for s in _SBOX]


def _expand_key(key: bytes) -> list[list[int]]:
    """FIPS-197 5.2 key expansion -> list of 4*(Nr+1) four-byte words."""
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_SBOX[b] for b in t[1:] + t[:1]]
            t[0] ^= rcon
            rcon = (rcon << 1) ^ (0x11B if rcon & 0x80 else 0)
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return w


class AES:
    """AES-128/192/256 block cipher (FIPS-197)."""

    def __init__(self, key: bytes):
        if len(key) not in (16, 24, 32):
            raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
        self._nr = len(key) // 4 + 6
        w = _expand_key(key)
        # per-round column words rk[i][c] = bytes of w[4i+c], big-endian
        # (byte 0 = state row 0) — the scalar T-table cipher's shape
        self._rkw = [
            [int.from_bytes(bytes(w[4 * i + c]), "big") for c in range(4)]
            for i in range(self._nr + 1)
        ]
        # column-major (4, 4) uint8 round keys for the vectorized path:
        # rknp[i][r][c] = w[4i + c][r]
        self._rk_np = np.array(
            [[[w[4 * i + c][r] for c in range(4)] for r in range(4)]
             for i in range(self._nr + 1)], np.uint8)

    # -- scalar forward cipher (fixtures, R6 round function) ---------------

    def encrypt_block(self, block: bytes) -> bytes:
        """One 16-byte block via the fused T-table rounds. Each state
        column lives in one 32-bit word (byte 0 = row 0), so block bytes
        ``4c..4c+3`` ARE column ``c`` big-endian."""
        if len(block) != 16:
            raise ValueError("AES block must be 16 bytes")
        rk = self._rkw[0]
        w0 = int.from_bytes(block[0:4], "big") ^ rk[0]
        w1 = int.from_bytes(block[4:8], "big") ^ rk[1]
        w2 = int.from_bytes(block[8:12], "big") ^ rk[2]
        w3 = int.from_bytes(block[12:16], "big") ^ rk[3]
        ta, tb, tc, td = _TEA, _TEB, _TEC, _TED
        for rnd in range(1, self._nr):
            rk = self._rkw[rnd]
            n0 = (ta[w0 >> 24] ^ tb[(w1 >> 16) & 0xFF]
                  ^ tc[(w2 >> 8) & 0xFF] ^ td[w3 & 0xFF] ^ rk[0])
            n1 = (ta[w1 >> 24] ^ tb[(w2 >> 16) & 0xFF]
                  ^ tc[(w3 >> 8) & 0xFF] ^ td[w0 & 0xFF] ^ rk[1])
            n2 = (ta[w2 >> 24] ^ tb[(w3 >> 16) & 0xFF]
                  ^ tc[(w0 >> 8) & 0xFF] ^ td[w1 & 0xFF] ^ rk[2])
            n3 = (ta[w3 >> 24] ^ tb[(w0 >> 16) & 0xFF]
                  ^ tc[(w1 >> 8) & 0xFF] ^ td[w2 & 0xFF] ^ rk[3])
            w0, w1, w2, w3 = n0, n1, n2, n3
        rk = self._rkw[self._nr]
        sb = _SBOX
        out = bytearray(16)
        for c, (a, b, cc, d) in enumerate(
                ((w0, w1, w2, w3), (w1, w2, w3, w0),
                 (w2, w3, w0, w1), (w3, w0, w1, w2))):
            word = ((sb[a >> 24] << 24) | (sb[(b >> 16) & 0xFF] << 16)
                    | (sb[(cc >> 8) & 0xFF] << 8) | sb[d & 0xFF]) ^ rk[c]
            out[4 * c:4 * c + 4] = word.to_bytes(4, "big")
        return bytes(out)

    def decrypt_block(self, block: bytes) -> bytes:
        return self.decrypt_blocks(block)

    # -- vectorized inverse cipher (bulk stream decryption) ----------------

    def decrypt_blocks(self, data: bytes) -> bytes:
        """ECB-decrypt ``data`` (a whole number of blocks) in one
        vectorized pass: state shape ``(n, 4, 4)`` with ``state[:, r, c]``
        = byte ``r + 4c`` of each block (FIPS-197 3.4)."""
        if len(data) % 16:
            raise ValueError("AES data must be a whole number of blocks")
        n = len(data) // 16
        if n == 0:
            return b""
        arr = np.frombuffer(data, np.uint8).reshape(n, 4, 4)
        s = arr.transpose(0, 2, 1) ^ self._rk_np[self._nr]
        for rnd in range(self._nr - 1, 0, -1):
            s = s[:, _ROWS, _INV_SHIFT_COLS]          # InvShiftRows
            s = _INV_SBOX_NP[s]                       # InvSubBytes
            s ^= self._rk_np[rnd]                     # AddRoundKey
            a0, a1, a2, a3 = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
            s = np.stack([                            # InvMixColumns
                _TE_NP[a0] ^ _TB_NP[a1] ^ _TD_NP[a2] ^ _T9_NP[a3],
                _T9_NP[a0] ^ _TE_NP[a1] ^ _TB_NP[a2] ^ _TD_NP[a3],
                _TD_NP[a0] ^ _T9_NP[a1] ^ _TE_NP[a2] ^ _TB_NP[a3],
                _TB_NP[a0] ^ _TD_NP[a1] ^ _T9_NP[a2] ^ _TE_NP[a3],
            ], axis=1)
        s = s[:, _ROWS, _INV_SHIFT_COLS]
        s = _INV_SBOX_NP[s] ^ self._rk_np[0]
        return s.transpose(0, 2, 1).tobytes()


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt with NO padding (``len(data) % 16 == 0``) — the shape
    the R6 password hash and the fixture writers need."""
    if len(iv) != 16:
        raise ValueError("AES-CBC IV must be 16 bytes")
    if len(data) % 16:
        raise ValueError("AES-CBC encrypt needs whole blocks")
    cipher = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = cipher.encrypt_block(
            bytes(a ^ b for a, b in zip(data[i:i + 16], prev)))
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt with NO padding — vectorized (P_i = D(C_i) ^ C_{i-1})."""
    if len(iv) != 16:
        raise ValueError("AES-CBC IV must be 16 bytes")
    if len(data) % 16 or not data:
        raise ValueError("AES-CBC decrypt needs whole, nonzero blocks")
    plain = np.frombuffer(AES(key).decrypt_blocks(data), np.uint8)
    chain = np.frombuffer(iv + data[:-16], np.uint8)
    return (plain ^ chain).tobytes()


def pkcs7_unpad(data: bytes) -> bytes:
    """Strip and validate RFC 2898-style block padding (PDF 7.6.2)."""
    if not data or len(data) % 16:
        raise ValueError("padded AES data must be whole blocks")
    n = data[-1]
    if not 1 <= n <= 16 or data[-n:] != bytes([n]) * n:
        raise ValueError("bad AES block padding")
    return data[:-n]


def pkcs7_pad(data: bytes) -> bytes:
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


# --------------------------------------------------------------------------
# RC4
# --------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (KSA + PRGA); encryption == decryption."""
    if not 1 <= len(key) <= 256:
        raise ValueError(f"RC4 key must be 1..256 bytes, got {len(key)}")
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)
