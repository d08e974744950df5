"""Standard-security-handler decryption for the pure-Python PDF extractor.

Most "protected" PDFs in a web crawl are permission-encrypted with an
EMPTY user password — any reader can open them, but every string and
stream in the file is RC4- or AES-enciphered with a key derived from the
document's /Encrypt dictionary (ISO 32000-1 §7.6, ISO 32000-2 §7.6 for
the AES-256 revision). Without this module those files extract as empty;
with it they are ordinary documents. Scope:

* **handled** — the Standard security handler with an empty user
  password: R2/R3 (RC4, 40..128-bit, Algorithms 2/7.6.2), R4 crypt
  filters ``/V2`` (RC4) and ``/AESV2`` (AES-128-CBC), and R6
  (``/AESV3``, AES-256-CBC, the Algorithm-2.B hardened hash). Per-object
  RC4/AES-128 keys follow Algorithm 1; AES-256 uses the file key
  directly (Algorithm 1.A).
* **not handled** — documents that actually REQUIRE a password (we have
  none to give), the deprecated R5, public-key (PKCS#7) handlers, and
  ``/Crypt`` filter chains naming a non-default filter. All degrade to
  the pre-existing behavior: undecodable streams are skipped.

Everything here is stdlib-only: ``hashlib`` gives MD5/SHA-2; RC4 and the
AES block cipher (FIPS 197 — S-box derived from the GF(2^8) inverse at
import, not a pasted table) are implemented below and pinned by the
published FIPS-197 / RFC 6229-style known-answer vectors in
``tests/test_pdf_crypt.py``.

Reference parity: semtools sends password-less PDFs to LlamaParse, which
opens empty-user-password files the same way (src/parse/client.rs:290-433
treats them as ordinary uploads); this reproduces that behavior offline.
"""

from __future__ import annotations

import hashlib
import struct
from functools import lru_cache

__all__ = ["rc4", "aes_cbc_decrypt", "aes_cbc_encrypt", "StandardDecryptor"]


# ---- RC4 (Rivest's alleged RC4 — public since 1994) ---------------------

def rc4(key: bytes, data: bytes) -> bytes:
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


# ---- AES block cipher (FIPS 197) ----------------------------------------
# GF(2^8) log/antilog tables over generator 3, from which the S-box is
# derived (inverse + affine map) — no magic constants beyond 0x63/0x1B.

_EXP = [0] * 512
_LOG = [0] * 256
_x = 1
for _i in range(255):
    _EXP[_i] = _x
    _LOG[_x] = _i
    _x ^= (_x << 1) ^ (0x1B if _x & 0x80 else 0)
    _x &= 0xFF
for _i in range(255, 512):
    _EXP[_i] = _EXP[_i - 255]


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _ror32(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & 0xFFFFFFFF


def _rotl8(x: int, n: int) -> int:
    return ((x << n) | (x >> (8 - n))) & 0xFF

_SBOX = [0] * 256
for _i in range(256):
    _inv = 0 if _i == 0 else _EXP[255 - _LOG[_i]]
    _SBOX[_i] = (
        _inv ^ _rotl8(_inv, 1) ^ _rotl8(_inv, 2) ^ _rotl8(_inv, 3)
        ^ _rotl8(_inv, 4) ^ 0x63
    )
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i

_RCON = [0] * 11
_x = 1
for _i in range(1, 11):
    _RCON[_i] = _x
    _x = _gmul(_x, 2)


# T-tables (Rijndael's word-level fusion of SubBytes + ShiftRows +
# MixColumns — the structure FIPS-197 §5.2 describes and every fast
# software AES uses): one 32-bit lookup replaces ~36 byte-level GF
# multiplications per state byte, ~6× over the r7 byte-wise rounds in
# CPython. Derived at import from the same computed S-box — still no
# pasted magic tables.
_TE0 = [0] * 256
_TE1 = [0] * 256
_TE2 = [0] * 256
_TE3 = [0] * 256
_TD0 = [0] * 256
_TD1 = [0] * 256
_TD2 = [0] * 256
_TD3 = [0] * 256
for _i in range(256):
    _s = _SBOX[_i]
    _t = (_gmul(_s, 2) << 24) | (_s << 16) | (_s << 8) | _gmul(_s, 3)
    _TE0[_i], _TE1[_i] = _t, _ror32(_t, 8)
    _TE2[_i], _TE3[_i] = _ror32(_t, 16), _ror32(_t, 24)
    _v = _INV_SBOX[_i]
    _u = (
        (_gmul(_v, 14) << 24) | (_gmul(_v, 9) << 16)
        | (_gmul(_v, 13) << 8) | _gmul(_v, 11)
    )
    _TD0[_i], _TD1[_i] = _u, _ror32(_u, 8)
    _TD2[_i], _TD3[_i] = _ror32(_u, 16), _ror32(_u, 24)


def _sub_word(t: int) -> int:
    return (
        (_SBOX[t >> 24] << 24) | (_SBOX[(t >> 16) & 0xFF] << 16)
        | (_SBOX[(t >> 8) & 0xFF] << 8) | _SBOX[t & 0xFF]
    )


@lru_cache(maxsize=256)
def _enc_schedule(key: bytes) -> "tuple[tuple[int, ...], int]":
    """Encryption round keys as big-endian 32-bit words (one per state
    column), plus the round count. Cached: AES-128 per-object keys repeat
    across a document's strings, AES-256 uses ONE file key throughout."""
    nk = len(key) // 4
    nr = nk + 6
    w = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = _sub_word(_ror32(t, 24)) ^ (_RCON[i // nk] << 24)
        elif nk > 6 and i % nk == 4:
            t = _sub_word(t)
        w.append(w[i - nk] ^ t)
    return tuple(w), nr


@lru_cache(maxsize=256)
def _dec_schedule(key: bytes) -> "tuple[tuple[int, ...], int]":
    """Equivalent-inverse-cipher round keys (FIPS-197 §5.3.5): the
    encryption schedule reversed by round, with InvMixColumns applied to
    the interior rounds so decryption runs the same T-table loop shape."""
    w, nr = _enc_schedule(key)
    dk = [0] * len(w)
    for r in range(nr + 1):
        dk[4 * r : 4 * r + 4] = w[4 * (nr - r) : 4 * (nr - r) + 4]
    for i in range(4, 4 * nr):
        x = dk[i]
        # InvMixColumns(x) via Td∘S: Td0[S[b]] is IMC's column for byte b
        dk[i] = (
            _TD0[_SBOX[x >> 24]] ^ _TD1[_SBOX[(x >> 16) & 0xFF]]
            ^ _TD2[_SBOX[(x >> 8) & 0xFF]] ^ _TD3[_SBOX[x & 0xFF]]
        )
    return tuple(dk), nr


def _encrypt_block_w(block: bytes, w, nr: int) -> bytes:
    s0 = int.from_bytes(block[0:4], "big") ^ w[0]
    s1 = int.from_bytes(block[4:8], "big") ^ w[1]
    s2 = int.from_bytes(block[8:12], "big") ^ w[2]
    s3 = int.from_bytes(block[12:16], "big") ^ w[3]
    e0, e1, e2, e3 = _TE0, _TE1, _TE2, _TE3
    for r in range(1, nr):
        k = 4 * r
        t0 = e0[s0 >> 24] ^ e1[(s1 >> 16) & 255] ^ e2[(s2 >> 8) & 255] ^ e3[s3 & 255] ^ w[k]
        t1 = e0[s1 >> 24] ^ e1[(s2 >> 16) & 255] ^ e2[(s3 >> 8) & 255] ^ e3[s0 & 255] ^ w[k + 1]
        t2 = e0[s2 >> 24] ^ e1[(s3 >> 16) & 255] ^ e2[(s0 >> 8) & 255] ^ e3[s1 & 255] ^ w[k + 2]
        t3 = e0[s3 >> 24] ^ e1[(s0 >> 16) & 255] ^ e2[(s1 >> 8) & 255] ^ e3[s2 & 255] ^ w[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = 4 * nr
    sb = _SBOX
    o0 = ((sb[s0 >> 24] << 24) | (sb[(s1 >> 16) & 255] << 16) | (sb[(s2 >> 8) & 255] << 8) | sb[s3 & 255]) ^ w[k]
    o1 = ((sb[s1 >> 24] << 24) | (sb[(s2 >> 16) & 255] << 16) | (sb[(s3 >> 8) & 255] << 8) | sb[s0 & 255]) ^ w[k + 1]
    o2 = ((sb[s2 >> 24] << 24) | (sb[(s3 >> 16) & 255] << 16) | (sb[(s0 >> 8) & 255] << 8) | sb[s1 & 255]) ^ w[k + 2]
    o3 = ((sb[s3 >> 24] << 24) | (sb[(s0 >> 16) & 255] << 16) | (sb[(s1 >> 8) & 255] << 8) | sb[s2 & 255]) ^ w[k + 3]
    return ((o0 << 96) | (o1 << 64) | (o2 << 32) | o3).to_bytes(16, "big")


def _decrypt_block_w(block: bytes, dk, nr: int) -> bytes:
    s0 = int.from_bytes(block[0:4], "big") ^ dk[0]
    s1 = int.from_bytes(block[4:8], "big") ^ dk[1]
    s2 = int.from_bytes(block[8:12], "big") ^ dk[2]
    s3 = int.from_bytes(block[12:16], "big") ^ dk[3]
    d0, d1, d2, d3 = _TD0, _TD1, _TD2, _TD3
    for r in range(1, nr):
        k = 4 * r
        t0 = d0[s0 >> 24] ^ d1[(s3 >> 16) & 255] ^ d2[(s2 >> 8) & 255] ^ d3[s1 & 255] ^ dk[k]
        t1 = d0[s1 >> 24] ^ d1[(s0 >> 16) & 255] ^ d2[(s3 >> 8) & 255] ^ d3[s2 & 255] ^ dk[k + 1]
        t2 = d0[s2 >> 24] ^ d1[(s1 >> 16) & 255] ^ d2[(s0 >> 8) & 255] ^ d3[s3 & 255] ^ dk[k + 2]
        t3 = d0[s3 >> 24] ^ d1[(s2 >> 16) & 255] ^ d2[(s1 >> 8) & 255] ^ d3[s0 & 255] ^ dk[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = 4 * nr
    ib = _INV_SBOX
    o0 = ((ib[s0 >> 24] << 24) | (ib[(s3 >> 16) & 255] << 16) | (ib[(s2 >> 8) & 255] << 8) | ib[s1 & 255]) ^ dk[k]
    o1 = ((ib[s1 >> 24] << 24) | (ib[(s0 >> 16) & 255] << 16) | (ib[(s3 >> 8) & 255] << 8) | ib[s2 & 255]) ^ dk[k + 1]
    o2 = ((ib[s2 >> 24] << 24) | (ib[(s1 >> 16) & 255] << 16) | (ib[(s0 >> 8) & 255] << 8) | ib[s3 & 255]) ^ dk[k + 2]
    o3 = ((ib[s3 >> 24] << 24) | (ib[(s2 >> 16) & 255] << 16) | (ib[(s1 >> 8) & 255] << 8) | ib[s0 & 255]) ^ dk[k + 3]
    return ((o0 << 96) | (o1 << 64) | (o2 << 32) | o3).to_bytes(16, "big")


def aes_ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    w, nr = _enc_schedule(key)
    return _encrypt_block_w(block, w, nr)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC over already-aligned data (no padding added)."""
    w, nr = _enc_schedule(key)
    out = bytearray(len(data))
    prev = iv
    for i in range(0, len(data), 16):
        blk = int.from_bytes(data[i : i + 16], "big") ^ int.from_bytes(prev, "big")
        prev = _encrypt_block_w(blk.to_bytes(16, "big"), w, nr)
        out[i : i + 16] = prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt of 16-byte-ALIGNED data (no unpadding — caller
    strips). Misaligned input raises ValueError up front — the previous
    behavior was an incidental OverflowError from the final short block's
    slice-assign, which read as an internal bug rather than a violated
    precondition (ADVICE r8). Blocks are ECB-decrypted, then the chain
    XOR (prev ciphertext block) is applied in ONE whole-buffer big-int
    XOR — CPython does that at memcpy-like speed, so the per-block Python
    work is the cipher only."""
    n = len(data)
    if n % 16:
        raise ValueError(
            f"aes_cbc_decrypt: data length {n} is not a multiple of the "
            "16-byte AES block size (caller must pass whole blocks)"
        )
    if n == 0:
        return b""
    dk, nr = _dec_schedule(key)
    out = bytearray(n)
    for i in range(0, n, 16):
        out[i : i + 16] = _decrypt_block_w(data[i : i + 16], dk, nr)
    chain = iv + data[:-16]
    x = int.from_bytes(bytes(out), "big") ^ int.from_bytes(chain, "big")
    return x.to_bytes(n, "big")


# ---- Standard security handler ------------------------------------------

#: Algorithm 2's 32-byte password pad (ISO 32000-1 §7.6.3.3, Table 21 ff.)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _r6_hash(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the hardened SHA-2 hash for R6."""
    k = hashlib.sha256(password + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        rnd += 1
        # stop after >= 64 completed rounds once the last byte of E is
        # <= (completed rounds - 32) — the reading qpdf and pdfminer
        # agree on for Algorithm 2.B's termination clause
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


#: per-document decrypted-bytes budget. Pure-Python ciphers run ~1-5
#: MB/s/core even with T-tables, so one encrypted 500 MB PDF would stall
#: its partition for minutes; past this budget remaining streams decrypt
#: to b"" (→ skipped downstream, the standard degrade) and the decryptor
#: flags ``truncated`` — the document extracts PARTIALLY rather than
#: starving the executor. 64 MiB ≈ tens of seconds worst-case, far above
#: any normal document's text+font streams.
DEFAULT_DECRYPT_BUDGET = 64 * 1024 * 1024


class StandardDecryptor:
    """Per-object decryptor for one document. Construct via
    :meth:`from_encrypt`; ``None`` return = unsupported handler (callers
    then leave the document alone, matching the documented degrade).
    ``truncated`` turns True once the decrypt budget is exhausted (see
    :data:`DEFAULT_DECRYPT_BUDGET`)."""

    def __init__(self, cfm: str, file_key: bytes,
                 budget: "int | None" = None):
        self.cfm = cfm  # "V2" (RC4) | "AESV2" | "AESV3"
        self.file_key = file_key
        # resolved at call time so deployments (and tests) can tune the
        # module-level default for their partition-time tolerance
        self.remaining = DEFAULT_DECRYPT_BUDGET if budget is None else budget
        self.truncated = False

    @classmethod
    def from_encrypt(cls, enc: dict, id0: bytes) -> "StandardDecryptor | None":
        if enc.get("Filter") != "Standard":
            return None
        r = enc.get("R")
        v = enc.get("V")
        o, u = enc.get("O"), enc.get("U")
        p = enc.get("P")
        if not isinstance(o, bytes) or not isinstance(p, int):
            return None
        if r in (2, 3) or (r == 4 and v == 4):
            cfm = "V2"
            cfd = None
            if r == 4:
                cf = enc.get("CF")
                stmf = enc.get("StmF", "Identity")
                if stmf == "Identity":
                    return cls("Identity", b"")
                cfd = cf.get(stmf) if isinstance(cf, dict) else None
                m = cfd.get("CFM") if isinstance(cfd, dict) else None
                if m == "AESV2":
                    cfm = "AESV2"
                elif m != "V2":
                    return None
            nbytes = (enc.get("Length") or 40) // 8 if r >= 3 else 5
            if isinstance(cfd, dict):
                # the crypt filter's own /Length overrides the top-level
                # one; the spec says bytes there, but many writers put
                # bits — values > 32 can only be bits, so divide those
                cl = cfd.get("Length")
                if isinstance(cl, int) and cl > 0:
                    nbytes = cl if cl <= 32 else cl // 8
            h = hashlib.md5()
            h.update(PAD)  # empty user password -> pad alone
            h.update(o[:32])
            h.update(struct.pack("<i", p if p < 2**31 else p - 2**32))
            h.update(id0)
            if r == 4 and enc.get("EncryptMetadata") is False:
                h.update(b"\xff\xff\xff\xff")
            k = h.digest()
            if r >= 3:
                for _ in range(50):
                    k = hashlib.md5(k[:nbytes]).digest()
            return cls(cfm, k[:nbytes])
        if r == 6 and isinstance(u, bytes) and len(u) >= 48:
            ue = enc.get("UE")
            if not isinstance(ue, bytes) or len(ue) < 32:
                return None
            # validate the empty user password, then unwrap the file key
            if _r6_hash(b"", u[32:40]) != u[:32]:
                return None  # a REAL password is required: unsupported
            ikey = _r6_hash(b"", u[40:48])
            return cls("AESV3", aes_cbc_decrypt(ikey, b"\x00" * 16, ue[:32]))
        return None

    def _object_key(self, num: int, gen: int) -> bytes:
        if self.cfm == "AESV3":
            return self.file_key
        h = hashlib.md5()
        h.update(self.file_key)
        h.update(num.to_bytes(3, "little"))
        h.update(gen.to_bytes(2, "little"))
        if self.cfm == "AESV2":
            h.update(b"\x73\x41\x6c\x54")  # "sAlT" (Algorithm 1 step b)
        return h.digest()[: min(len(self.file_key) + 5, 16)]

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        if self.cfm == "Identity" or not data:
            return data
        if len(data) > self.remaining:
            self.truncated = True
            return b""  # over budget: skipped downstream, never stalls
        self.remaining -= len(data)
        key = self._object_key(num, gen)
        if self.cfm == "V2":
            return rc4(key, data)
        # AES-CBC: 16-byte IV prefix, PKCS#7 padding
        if len(data) < 32 or len(data) % 16:
            return data  # not a well-formed AES stream: leave as-is
        plain = aes_cbc_decrypt(key, data[:16], data[16:])
        padlen = plain[-1]
        if 1 <= padlen <= 16 and plain[-padlen:] == bytes([padlen]) * padlen:
            return plain[:-padlen]
        return plain  # bad padding: best effort, never raise
