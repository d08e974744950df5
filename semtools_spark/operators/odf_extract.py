"""Pure-Python OpenDocument (ODT / ODP / ODS) text extractors for the
pluggable parse slot.

The reference's ``parse`` accepts office documents generally (semtools
src/parse/client.rs:290-433 posts them to the LlamaParse API); ODF is
the highest-frequency format the dispatch previously mishandled (it fell
through to the HTML extractor). An ODF file is an OCF-style ZIP — a
``mimetype`` first entry plus ``content.xml`` (OASIS ODF 1.2 part 1) —
fully parseable with stdlib ``zipfile`` + ``xml.etree``, the same shape
as :mod:`office_extract`. Deterministic pure functions ``bytes -> str``,
so they drop into ``parse_pages(extractor=...)`` and the parse cache's
fingerprint/resume contract unchanged.

Mapping (documented, not silent):

* **ODT** (text) — each paragraph (``text:p``) or heading (``text:h``)
  becomes one line in document order, including paragraphs inside list
  items and table cells (row-major, XML order); within a paragraph
  ``text:tab`` contributes a tab, ``text:line-break`` a line break,
  ``text:s`` ``text:c``-many spaces; empty paragraphs are dropped. One
  "page" — ODF text flows without explicit page boundaries.
* **ODP** (presentation) — slides in XML order (``draw:page``); each
  paragraph one line; slides join with "\\n\\n" — the reference's
  page-concat separator (src/parse/client.rs:87-88,104-105), same as
  PPTX slides. Notes/masters out of scope.
* **ODS** (spreadsheet) — sheets (``table:table``) join with "\\n\\n";
  each row one line of tab-separated cell values in document order;
  a cell's text is its paragraphs joined with a space;
  ``table:number-columns-repeated`` is honored up to a cap (writers pad
  row ends with ~16k-repeat empty cells — expanding those would emit
  megabytes of tabs); trailing empty cells are trimmed.

Malformed input degrades to partial/empty text, never a raise."""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET

__all__ = [
    "extract_odt_text",
    "extract_odp_text",
    "extract_ods_text",
    "odf_kind",
]

_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_DRAW = "{urn:oasis:names:tc:opendocument:xmlns:drawing:1.0}"

_MIME_PREFIX = b"application/vnd.oasis.opendocument."
_KINDS = {
    b"text": "odt",
    b"presentation": "odp",
    b"spreadsheet": "ods",
    # flat variants (template subtypes) map to the same extractors
    b"text-template": "odt",
    b"presentation-template": "odp",
    b"spreadsheet-template": "ods",
}

#: cap for table:number-columns-repeated — real data never repeats a
#: VALUED cell this often, but writers pad row ends with 16k empties
_REPEAT_CAP = 256


def odf_kind(data: bytes, names: "list[str] | None" = None) -> "str | None":
    """'odt' | 'odp' | 'ods' | None. Like EPUB, ODF's OCF layout puts an
    uncompressed ``mimetype`` first — checkable straight off the local
    file header; falls back to reading the entry via the (caller-shared)
    namelist for writers that misplace it."""
    if data[:4] != b"PK\x03\x04":
        return None
    if data[30:38] == b"mimetype" and data[38:100].startswith(_MIME_PREFIX):
        sub = data[38 + len(_MIME_PREFIX) : 108].split(b"\x50\x4b")[0]
        for key, kind in _KINDS.items():
            if sub.startswith(key):
                return kind
    if names is None or "mimetype" not in names:
        return None
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            mime = zf.read("mimetype").strip()
    except Exception:
        return None
    if not mime.startswith(_MIME_PREFIX):
        return None
    return _KINDS.get(mime[len(_MIME_PREFIX) :])


def _content_root(data: bytes) -> "ET.Element | None":
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            return ET.fromstring(zf.read("content.xml"))
    except Exception:
        return None


def _para_text(p: "ET.Element") -> str:
    """Flatten one text:p / text:h: runs + tabs/breaks/spaces, in order
    (tail text of nested spans included via the document-order walk)."""
    parts: list[str] = []

    def walk(el: "ET.Element") -> None:
        if el.text:
            parts.append(el.text)
        for child in el:
            tag = child.tag
            if tag == _TEXT + "tab":
                parts.append("\t")
            elif tag == _TEXT + "line-break":
                parts.append("\n")
            elif tag == _TEXT + "s":
                try:
                    cnt = int(child.get(_TEXT + "c", "1"))
                except ValueError:
                    cnt = 1
                parts.append(" " * max(1, min(cnt, _REPEAT_CAP)))
            elif tag == _TEXT + "note":  # footnote body: skip inline
                pass
            else:
                walk(child)
            if child.tail:
                parts.append(child.tail)

    walk(p)
    return "".join(parts)


def _paras_under(scope: "ET.Element") -> list[str]:
    """Non-empty paragraph/heading lines under ``scope``, document order.
    Iterates top-level matches only — text:p never nests in valid ODF,
    and iter() returns each element once regardless."""
    out: list[str] = []
    for el in scope.iter():
        if el.tag in (_TEXT + "p", _TEXT + "h"):
            txt = _para_text(el)
            if txt:
                out.append(txt)
    return out


def extract_odt_text(data: bytes) -> str:
    """ODT bytes → text, one line per paragraph/heading."""
    root = _content_root(data)
    if root is None:
        return ""
    body = root.find(f"{_OFFICE}body/{_OFFICE}text")
    return "\n".join(_paras_under(body if body is not None else root))


def extract_odp_text(data: bytes) -> str:
    """ODP bytes → text: one line per paragraph, slides joined \\n\\n."""
    root = _content_root(data)
    if root is None:
        return ""
    pres = root.find(f"{_OFFICE}body/{_OFFICE}presentation")
    scope = pres if pres is not None else root
    slides: list[str] = []
    for page in scope.iter(_DRAW + "page"):
        paras = _paras_under(page)
        if paras:
            slides.append("\n".join(paras))
    if slides:
        return "\n\n".join(slides)
    return "\n".join(_paras_under(scope))  # repair: no draw:page found


def extract_ods_text(data: bytes) -> str:
    """ODS bytes → text: tab-separated rows, sheets joined \\n\\n."""
    root = _content_root(data)
    if root is None:
        return ""
    sheets: list[str] = []
    for table in root.iter(_TABLE + "table"):
        lines: list[str] = []
        for row in table.iter(_TABLE + "table-row"):
            cells: list[str] = []
            for cell in row:
                if cell.tag not in (
                    _TABLE + "table-cell",
                    _TABLE + "covered-table-cell",
                ):
                    continue
                txt = " ".join(_paras_under(cell))
                try:
                    rep = int(cell.get(_TABLE + "number-columns-repeated", "1"))
                except ValueError:
                    rep = 1
                # cap every repeat run — a hostile 500M-repeat cell (empty
                # OR text-bearing) must not materialize 500M list slots
                rep = max(1, min(rep, _REPEAT_CAP))
                cells.extend([txt] * rep)
            line = "\t".join(cells).rstrip("\t")
            if line:
                lines.append(line)
        if lines:
            sheets.append("\n".join(lines))
    return "\n\n".join(sheets)
