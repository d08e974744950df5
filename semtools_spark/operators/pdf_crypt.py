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


def _expand_key(key: bytes) -> list[list[int]]:
    """Round keys as a list of 4-byte words."""
    nk = len(key) // 4
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return words


def _add_round_key(st: list[int], words: list[list[int]], rnd: int) -> None:
    for c in range(4):
        w = words[4 * rnd + c]
        for r in range(4):
            st[4 * c + r] ^= w[r]


def _encrypt_block(block: bytes, words: list[list[int]]) -> bytes:
    nr = len(words) // 4 - 1
    st = list(block)  # column-major: st[4*c + r]
    _add_round_key(st, words, 0)
    for rnd in range(1, nr + 1):
        st = [_SBOX[b] for b in st]
        # ShiftRows: row r rotates left by r (column-major indexing)
        st = [st[(4 * (c + r) + r) % 16] for c in range(4) for r in range(4)]
        if rnd < nr:
            ns = list(st)
            for c in range(4):
                a = st[4 * c : 4 * c + 4]
                ns[4 * c + 0] = _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3]
                ns[4 * c + 1] = a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3]
                ns[4 * c + 2] = a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3)
                ns[4 * c + 3] = _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2)
            st = ns
        _add_round_key(st, words, rnd)
    return bytes(st)


def _decrypt_block(block: bytes, words: list[list[int]]) -> bytes:
    nr = len(words) // 4 - 1
    st = list(block)
    _add_round_key(st, words, nr)
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows: row r rotates right by r
        st = [st[(4 * (c - r) + r) % 16] for c in range(4) for r in range(4)]
        st = [_INV_SBOX[b] for b in st]
        _add_round_key(st, words, rnd)
        if rnd > 0:
            ns = list(st)
            for c in range(4):
                a = st[4 * c : 4 * c + 4]
                ns[4 * c + 0] = (
                    _gmul(a[0], 14) ^ _gmul(a[1], 11) ^ _gmul(a[2], 13) ^ _gmul(a[3], 9)
                )
                ns[4 * c + 1] = (
                    _gmul(a[0], 9) ^ _gmul(a[1], 14) ^ _gmul(a[2], 11) ^ _gmul(a[3], 13)
                )
                ns[4 * c + 2] = (
                    _gmul(a[0], 13) ^ _gmul(a[1], 9) ^ _gmul(a[2], 14) ^ _gmul(a[3], 11)
                )
                ns[4 * c + 3] = (
                    _gmul(a[0], 11) ^ _gmul(a[1], 13) ^ _gmul(a[2], 9) ^ _gmul(a[3], 14)
                )
            st = ns
    return bytes(st)


def aes_ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    return _encrypt_block(block, _expand_key(key))


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC over already-aligned data (no padding added)."""
    words = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(x ^ y for x, y in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, words)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt of aligned data (no unpadding — caller strips)."""
    words = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(x ^ y for x, y in zip(_decrypt_block(blk, words), prev))
        prev = blk
    return bytes(out)


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


class StandardDecryptor:
    """Per-object decryptor for one document. Construct via
    :meth:`from_encrypt`; ``None`` return = unsupported handler (callers
    then leave the document alone, matching the documented degrade)."""

    def __init__(self, cfm: str, file_key: bytes):
        self.cfm = cfm  # "V2" (RC4) | "AESV2" | "AESV3"
        self.file_key = file_key

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
