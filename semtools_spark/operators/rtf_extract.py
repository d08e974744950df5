"""Pure-Python RTF text extractor for the pluggable parse slot.

RTF is the second-most-common legacy document format in web crawls (the
reference's ``parse`` accepts documents generally — semtools
src/parse/client.rs:290-433). The format is a plain-text stream of
control words and ``{}``-delimited groups (Microsoft RTF 1.9.1 spec,
public): no container, no compression, so a ~150-line tokenizer covers
text recovery. Deterministic pure function ``bytes -> str`` — drops into
``parse_pages(extractor=...)`` and the parse-cache fingerprint/resume
contract unchanged.

Mapping (documented, not silent):

* plain text accumulates in document order; ``\\par``/``\\line`` end a
  line, ``\\tab`` inserts a tab, ``\\cell``/``\\row`` close table cells/
  rows with a tab / line break;
* ``\\'hh`` hex escapes decode via the document code page (``\\ansicpgN``
  when stdlib knows ``cpN``, else cp1252 — the overwhelming default);
  ``\\uN`` Unicode escapes emit the code point and skip the following
  ``\\ucN``-many fallback bytes (per-group state, as the spec requires;
  surrogate pairs from two \\u escapes are combined);
* destination groups that hold non-body content — ``\\fonttbl``,
  ``\\colortbl``, ``\\stylesheet``, ``\\info``, ``\\pict``, ``\\object``,
  headers/footers/footnotes, and every ``{\\*`` unknown destination —
  are skipped whole; ``\\binN`` skips N raw bytes;
* the escaped literals ``\\\\``, ``\\{``, ``\\}`` and the non-breaking /
  soft entities (``\\~`` space, ``\\-`` nothing, ``\\_`` hyphen) map to
  their characters.

Malformed input degrades to partial/empty text, never a raise."""

from __future__ import annotations

import codecs
import re

__all__ = ["extract_rtf_text", "is_rtf"]

#: destination control words whose whole group is non-body content
_SKIP_DESTS = frozenset(
    (
        b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
        b"object", b"header", b"footer", b"headerl", b"headerr",
        b"headerf", b"footerl", b"footerr", b"footerf", b"footnote",
        b"annotation", b"xe", b"tc", b"fldinst",
        b"themedata", b"colorschememapping", b"datastore", b"latentstyles",
        b"listtable", b"listoverridetable", b"revtbl", b"rsidtbl",
        b"generator", b"template", b"bkmkstart", b"bkmkend",
    )
)

# the control-symbol branch must match \<LF> too (a \par alias on
# Unix-saved files) — bare "." skips \n, silently gluing paragraphs
_CW_RE = re.compile(rb"\\([a-zA-Z]+)(-?\d+)? ?|\\'([0-9a-fA-F]{2})|\\([\s\S])")


def is_rtf(data: bytes) -> bool:
    return data[:5] == b"{\\rtf"


def _codec_for(cpg: int) -> str:
    try:
        codecs.lookup(f"cp{cpg}")
        return f"cp{cpg}"
    except LookupError:
        return "cp1252"


def extract_rtf_text(data: bytes) -> str:
    """RTF bytes → extracted text, one line per paragraph."""
    if not is_rtf(data):
        return ""
    out: list[str] = []
    cur: list[str] = []
    # group state: (uc_skip, skipping) — pushed/popped at {}
    stack: list[tuple[int, bool]] = []
    uc_skip, skipping = 1, False
    pending_skip = 0  # \uN fallback bytes still to swallow
    high_surrogate: "int | None" = None
    enc = "cp1252"
    i, n = 0, len(data)

    def newline() -> None:
        line = "".join(cur).strip()
        if line:
            out.append(line)
        cur.clear()

    def emit(ch: str) -> None:
        nonlocal high_surrogate
        if high_surrogate is not None:
            lo = ord(ch) if len(ch) == 1 else -1
            if 0xDC00 <= lo <= 0xDFFF:
                cur.append(
                    chr(0x10000 + ((high_surrogate - 0xD800) << 10) + (lo - 0xDC00))
                )
                high_surrogate = None
                return
            high_surrogate = None
        cur.append(ch)

    while i < n:
        c = data[i]
        if c == 0x7B:  # {
            stack.append((uc_skip, skipping))
            i += 1
            continue
        if c == 0x7D:  # }
            if stack:
                uc_skip, skipping = stack.pop()
            i += 1
            continue
        if c == 0x5C:  # backslash
            m = _CW_RE.match(data, i)
            if m is None:
                i += 1
                continue
            i = m.end()
            word, param, hexcode, sym = m.groups()
            if hexcode is not None:
                if pending_skip > 0:
                    pending_skip -= 1
                elif not skipping:
                    try:
                        emit(bytes([int(hexcode, 16)]).decode(enc))
                    except (UnicodeDecodeError, ValueError):
                        pass
                continue
            if sym is not None:
                if skipping:
                    continue
                if sym == b"*":
                    # {\* ...}: unknown destination — skip this group
                    skipping = True
                elif sym in (b"\\", b"{", b"}"):
                    emit(sym.decode("latin-1"))
                elif sym == b"~":
                    emit("\u00a0")
                elif sym == b"_":
                    emit("-")
                elif sym in (b"\r", b"\n"):  # \<CRLF> = \par alias
                    newline()
                continue
            pnum = int(param) if param is not None else None
            if word == b"u" and pnum is not None:
                if not skipping:
                    cp = pnum + 0x10000 if pnum < 0 else pnum
                    if 0xD800 <= cp <= 0xDBFF:
                        high_surrogate = cp
                    elif 0 < cp < 0x110000:
                        emit(chr(cp))
                pending_skip = uc_skip
                continue
            if pending_skip > 0:
                pending_skip = 0  # a control word ends the fallback run
            if word == b"bin" and pnum is not None and pnum > 0:
                i += min(pnum, n - i)
                continue
            if word in _SKIP_DESTS:
                skipping = True
            elif skipping:
                pass
            elif word in (b"par", b"line", b"row", b"sect", b"page"):
                newline()
            elif word == b"tab" or word == b"cell":
                cur.append("\t")
            elif word == b"emdash":
                emit("\u2014")
            elif word == b"endash":
                emit("\u2013")
            elif word in (b"lquote", b"rquote"):
                emit("\u2018" if word == b"lquote" else "\u2019")
            elif word in (b"ldblquote", b"rdblquote"):
                emit("\u201c" if word == b"ldblquote" else "\u201d")
            elif word == b"uc" and pnum is not None:
                uc_skip = max(0, pnum)
            elif word == b"ansicpg" and pnum is not None:
                enc = _codec_for(pnum)
            continue
        # plain text run up to the next control character
        j = i
        while j < n and data[j] not in (0x5C, 0x7B, 0x7D, 0x0D, 0x0A):
            j += 1
        if j > i:
            if pending_skip > 0:
                take = min(pending_skip, j - i)
                pending_skip -= take
                i += take
                continue
            if not skipping:
                try:
                    emit(data[i:j].decode(enc))
                except UnicodeDecodeError:
                    emit(data[i:j].decode(enc, "ignore"))
        i = max(j, i + 1)
    newline()
    return "\n".join(out)
