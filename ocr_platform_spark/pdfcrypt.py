"""PDF standard security handler: empty-user-password decryption.

Web crawls carry a steady stream of *encrypted-but-open* PDFs — the
standard security handler applied with an empty user password (the
"permissions only" mode office exporters and print drivers emit).
Desktop readers, and the reference pipeline through PyMuPDF
(``fitz.open`` authenticates the empty password before ``get_pixmap``,
``apps/worker/app/tasks/ocr_tasks.py:39-52``), open these silently; a
pipeline that quarantined them would drop a real corpus slice. This
module lets :mod:`ocr_platform_spark.pdfcodec` do the same
dependency-free, on top of :mod:`ocr_platform_spark.crypto`.

Supported (PDF 32000-1 §7.6 + ISO 32000-2 for R6):

* ``/V 1``/``/V 2`` — RC4, 40..128-bit file keys (R2/R3);
* ``/V 4`` — crypt filters: ``/StdCF`` with ``/CFM /V2`` (RC4) or
  ``/AESV2`` (AES-128-CBC), ``/StmF`` ``/StdCF`` or ``/Identity``;
* ``/V 5 /R 6`` — AES-256 (``/AESV3``), the ISO 32000-2 / Acrobat X+
  scheme with the iterated SHA-256/384/512 password hash.

Everything else — and any document whose **user password is not
empty** (``/U`` fails to authenticate) — raises ``ValueError``, which
the extraction operators' quarantine path records as an unreadable
document rather than a silent blank.

Scope note: only **streams** are decrypted. The rasterizer and
text-layer extractor never read document-level strings (page geometry
is numbers and names; ``/ToUnicode`` and content are streams; strings
inside a decrypted content stream are plain by construction), so
top-level string decryption (``/StrF``) is deliberately not wired.

The encryption-side writer lives in ``tests/test_pdfcrypt.py`` as an
independent transcription of the same algorithms (the ``pngcodec`` /
Adam7 test-encoder precedent), so a derivation slip on either side
breaks the round-trip pin instead of cancelling out.
"""

from __future__ import annotations

import functools
import hashlib
import struct

from . import crypto

#: Algorithm 2 password pad (PDF 32000-1 7.6.3.3, Table 21 note)
PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


def _as_bytes(v, what: str) -> bytes:
    if not isinstance(v, bytes):
        raise ValueError(f"/Encrypt {what} must be a string")
    return v


class StandardSecurityHandler:
    """Authenticate the EMPTY user password and decrypt streams.

    ``enc`` is the resolved ``/Encrypt`` dictionary, ``id0`` the first
    ``/ID`` string (empty if the file omits it), ``get`` the document's
    indirect-reference resolver (the dict's entries may be refs).
    """

    def __init__(self, enc: dict, id0: bytes, get=lambda v: v):
        if not isinstance(enc, dict):
            raise ValueError("/Encrypt is not a dictionary")
        g = lambda k, d=None: get(enc.get(k, d))  # noqa: E731
        if str(g("Filter", "")) != "Standard":
            raise ValueError(
                f"unsupported security handler /{g('Filter', '?')}"
            )
        v = g("V", 0)
        r = g("R", 0)
        if not isinstance(v, int) or not isinstance(r, int):
            raise ValueError("/Encrypt /V and /R must be integers")
        o = _as_bytes(g("O"), "/O")
        u = _as_bytes(g("U"), "/U")
        p = g("P")
        if not isinstance(p, int):
            raise ValueError("/Encrypt /P must be an integer")
        self._cfm = "rc4"  # stream cipher: "rc4" | "aesv2" | "aesv3" | None
        if v in (1, 2) and r in (2, 3):
            nbits = 40 if v == 1 else g("Length", 40)
            if nbits % 8 or not 40 <= nbits <= 128:
                raise ValueError(f"/Encrypt /Length {nbits} out of range")
            self._init_rc4_aes128(enc, g, r, o, u, p, id0, nbits // 8)
        elif v == 4 and r == 4:
            cf = g("CF")
            stmf = str(g("StmF", "Identity"))
            if stmf == "Identity":
                # Streams pass through untouched, but the document may
                # still be password-protected (strings/other filters
                # encrypted) — run the Algorithm 4/5 authentication
                # before accepting it, or the promised
                # "password-protected" ValueError would never fire for
                # this configuration.  Key length: the StdCF entry when
                # one exists, else the file-level /Length.
                std = get(cf.get("StdCF")) if isinstance(cf, dict) else None
                nbits = (get(std.get("Length", g("Length", 128)))
                         if isinstance(std, dict) else g("Length", 128))
                if not isinstance(nbits, int):
                    raise ValueError("/Encrypt /Length must be an integer")
                if nbits <= 16:      # bytes-vs-bits leniency, as below
                    nbits *= 8
                if nbits % 8 or not 40 <= nbits <= 128:
                    raise ValueError(f"/Encrypt /Length {nbits} out of range")
                self._init_rc4_aes128(enc, g, r, o, u, p, id0, nbits // 8)
                self._cfm = None  # streams not encrypted
                self._key = b""
                return
            if stmf != "StdCF" or not isinstance(cf, dict):
                raise ValueError(f"unsupported /StmF /{stmf}")
            std = get(cf.get("StdCF"))
            if not isinstance(std, dict):
                raise ValueError("/CF has no /StdCF crypt filter")
            cfm = str(get(std.get("CFM", "")))
            cflen = get(std.get("Length", g("Length", 128)))
            if not isinstance(cflen, int):
                raise ValueError("crypt filter /Length must be an integer")
            if cflen <= 16:          # some producers write bytes ...
                cflen *= 8           # ... the spec says bits; accept both
            if cfm == "V2":
                if cflen % 8 or not 40 <= cflen <= 128:
                    raise ValueError(f"/StdCF /Length {cflen} out of range")
                self._init_rc4_aes128(enc, g, r, o, u, p, id0, cflen // 8)
            elif cfm == "AESV2":
                if cflen != 128:
                    raise ValueError("/AESV2 requires a 128-bit key")
                self._init_rc4_aes128(enc, g, r, o, u, p, id0, 16)
                self._cfm = "aesv2"
            else:
                raise ValueError(f"unsupported crypt filter /CFM /{cfm}")
        elif v == 5 and r == 6:
            self._init_r6(g, o, u)
            self._cfm = "aesv3"
        else:
            raise ValueError(f"unsupported /Encrypt /V {v} /R {r}")

    # -- R2/R3/R4: RC4 / AES-128 file key (Algorithms 2, 4, 5) -------------

    def _init_rc4_aes128(self, enc, g, r: int, o: bytes, u: bytes,
                         p: int, id0: bytes, n: int) -> None:
        if len(o) < 32 or len(u) < 16:
            raise ValueError("/O and /U are too short")
        em = g("EncryptMetadata", True)
        # /P is the low 32 bits of a signed permissions word; wild files
        # carry values outside [-2^31, 2^32) which struct's "<i"/"<I"
        # would reject with struct.error (not the codec's ValueError
        # contract) — mask to the two's-complement bit pattern instead.
        h = hashlib.md5(PAD + o[:32]
                        + struct.pack("<I", p & 0xFFFFFFFF)
                        + id0)
        if r >= 4 and em is False:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        if r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        self._key = key[:n]
        self._r = r
        # authenticate the empty user password (Algorithm 6 via 4/5)
        if r == 2:
            ok = crypto.rc4(self._key, PAD) == u[:32]
        else:
            x = crypto.rc4(self._key,
                           hashlib.md5(PAD + id0).digest())
            for i in range(1, 20):
                x = crypto.rc4(bytes(b ^ i for b in self._key), x)
            ok = x == u[:16]
        if not ok:
            raise ValueError(
                "PDF is password-protected (user password is not empty)"
            )

    def _object_key(self, num: int, gen: int) -> bytes:
        """Algorithm 1: per-object RC4/AES-128 key."""
        salt = b"sAlT" if self._cfm == "aesv2" else b""
        h = hashlib.md5(self._key + num.to_bytes(3, "little")
                        + gen.to_bytes(2, "little") + salt).digest()
        return h[:min(len(self._key) + 5, 16)]

    # -- R6: AES-256 (ISO 32000-2 Algorithms 2.A / 2.B) ---------------------

    @staticmethod
    @functools.lru_cache(maxsize=256)
    def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
        """Algorithm 2.B iterated hash (R6). Cached: the ~64-round
        AES+SHA loop costs ~0.3 s, and the extraction operators open the
        same document several times (probe, then decode per bucket) —
        the (password, salt) pair is identical each time."""
        k = hashlib.sha256(password + salt + udata).digest()
        i = 0
        while True:
            k1 = (password + k + udata) * 64
            e = crypto.aes_cbc_encrypt(k[:16], k[16:32], k1)
            k = (hashlib.sha256, hashlib.sha384,
                 hashlib.sha512)[sum(e[:16]) % 3](e).digest()
            i += 1
            if i >= 64 and e[-1] <= i - 32:
                return k[:32]

    def _init_r6(self, g, o: bytes, u: bytes) -> None:
        ue = _as_bytes(g("UE"), "/UE")
        if len(u) < 48 or len(ue) < 32:
            raise ValueError("/U must be 48 and /UE 32 bytes for R6")
        vsalt, ksalt = u[32:40], u[40:48]
        if self._hash_2b(b"", vsalt) != u[:32]:
            raise ValueError(
                "PDF is password-protected (user password is not empty)"
            )
        ikey = self._hash_2b(b"", ksalt)
        self._key = crypto.aes_cbc_decrypt(ikey, b"\x00" * 16, ue[:32])

    # -- stream decryption ---------------------------------------------------

    def decrypt_stream(self, num: int, gen: int, data: bytes) -> bytes:
        """Decrypt one stream's raw bytes (encryption sits OUTSIDE the
        ``/Filter`` chain, so this runs before any defiltering)."""
        if self._cfm is None or not data:
            return data
        if self._cfm == "rc4":
            return crypto.rc4(self._object_key(num, gen), data)
        key = (self._key if self._cfm == "aesv3"
               else self._object_key(num, gen))
        if len(data) < 32 or len(data) % 16:
            raise ValueError(
                "AES-encrypted stream must be IV + whole ciphertext blocks"
            )
        return crypto.pkcs7_unpad(
            crypto.aes_cbc_decrypt(key, data[:16], data[16:])
        )
