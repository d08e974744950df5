"""Pure-Python PPTX / XLSX / EPUB text extractors for the pluggable parse slot.

The reference's ``parse`` accepts Office documents generally (semtools
src/parse/client.rs:290-433 posts them to the LlamaParse API; the README
lists PowerPoint and Excel formats among supported inputs). Both formats
are ZIP archives of ECMA-376 / ISO 29500 XML parts — like DOCX
(:mod:`docx_extract`), fully parseable with stdlib ``zipfile`` +
``xml.etree``. Deterministic pure functions ``bytes -> str``, so they
drop into ``parse_pages(extractor=...)`` and the parse cache's
fingerprint/resume contract unchanged.

Mapping (documented, not silent):

* **PPTX** — slides read in slide-number order (``ppt/slides/slideN.xml``);
  each DrawingML paragraph (``a:p``) becomes one line (``a:t`` text runs
  concatenated, ``a:br`` a line break); empty paragraphs are dropped;
  slides join with "\\n\\n" — the same page-concat separator the
  reference applies to PDF pages (src/parse/client.rs:87-88,104-105).
  Speaker notes, masters and layouts are out of scope.
* **XLSX** — worksheets in workbook order when ``xl/workbook.xml`` +
  its relationships resolve, else in part-name order; each row becomes
  one line of tab-separated cell values in document order; shared
  strings (``t="s"``) resolve through ``xl/sharedStrings.xml``, inline
  strings through ``is/t``, everything else uses the raw ``v`` text
  (dates stay serial numbers — no locale-dependent rendering, which
  would break byte-determinism); sheets join with "\\n\\n". Formulas
  contribute their cached value, not their expression.
* **EPUB** (not ECMA-376 but the same ZIP+XML shape) — content
  documents in SPINE order (``container.xml`` → the OPF's manifest +
  spine; falls back to part-name order when the OPF is absent/broken);
  each XHTML content document contributes its block-level text, one
  line per block (p/h1..h6/li/blockquote/td, with script/style
  dropped); documents join with "\\n\\n". Navigation/NCX parts are
  skipped via the spine; DRM'd books extract empty.

Malformed input degrades to partial/empty text, never a raise."""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

__all__ = [
    "extract_pptx_text",
    "extract_xlsx_text",
    "extract_epub_text",
    "is_pptx",
    "is_xlsx",
    "is_epub",
]

_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")
_SHEET_RE = re.compile(r"^xl/worksheets/sheet\d+\.xml$")


def _zip_names(data: bytes) -> "list[str] | None":
    if data[:4] != b"PK\x03\x04":
        return None
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            return zf.namelist()
    except Exception:
        return None


def is_pptx(data: bytes, names: "list[str] | None" = None) -> bool:
    """``names`` lets dispatchers probe the central directory ONCE and
    classify against it (same for the other ``is_*`` here and in
    :mod:`docx_extract`) — per-document zip re-opens add up on the parse
    hot path at crawl scale."""
    names = _zip_names(data) if names is None else names
    return names is not None and any(_SLIDE_RE.match(n) for n in names)


def is_xlsx(data: bytes, names: "list[str] | None" = None) -> bool:
    names = _zip_names(data) if names is None else names
    return names is not None and "xl/workbook.xml" in names


def extract_pptx_text(data: bytes) -> str:
    """PPTX bytes → text: one line per paragraph, slides joined \\n\\n."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except Exception:
        return ""
    with zf:
        slides: list[tuple[int, str]] = []
        for name in zf.namelist():
            m = _SLIDE_RE.match(name)
            if m:
                slides.append((int(m.group(1)), name))
        out: list[str] = []
        for _n, name in sorted(slides):
            try:
                root = ET.fromstring(zf.read(name))
            except Exception:
                continue
            paras: list[str] = []
            for p in root.iter(_A + "p"):
                parts: list[str] = []
                for el in p.iter():
                    if el.tag == _A + "t":
                        parts.append(el.text or "")
                    elif el.tag == _A + "br":
                        parts.append("\n")
                txt = "".join(parts)
                if txt:
                    paras.append(txt)
            if paras:
                out.append("\n".join(paras))
    return "\n\n".join(out)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except Exception:
        return []
    out: list[str] = []
    for si in root.iter(_S + "si"):
        # plain <t> or rich-text runs <r><t>… — concatenated either way
        out.append("".join(t.text or "" for t in si.iter(_S + "t")))
    return out


def _sheet_order(zf: zipfile.ZipFile) -> "list[str] | None":
    """Worksheet part names in workbook-declared order via the workbook
    relationships; None when either part is absent/odd (caller falls
    back to part-name order)."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    except Exception:
        return None
    _PR = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    by_id = {
        r.get("Id"): r.get("Target")
        for r in rels.iter(_PR + "Relationship")
    }
    order: list[str] = []
    for sh in wb.iter(_S + "sheet"):
        target = by_id.get(sh.get(_R + "id"))
        if not target:
            return None
        target = target.lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target
        order.append(target)
    return order or None


def extract_xlsx_text(data: bytes) -> str:
    """XLSX bytes → text: tab-separated rows, sheets joined \\n\\n."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except Exception:
        return ""
    with zf:
        names = zf.namelist()
        sheets = _sheet_order(zf) or sorted(n for n in names if _SHEET_RE.match(n))
        shared = _shared_strings(zf)
        out: list[str] = []
        for name in sheets:
            if name not in names:
                continue
            try:
                root = ET.fromstring(zf.read(name))
            except Exception:
                continue
            lines: list[str] = []
            for row in root.iter(_S + "row"):
                cells: list[str] = []
                for c in row.iter(_S + "c"):
                    ctype = c.get("t", "n")
                    if ctype == "s":
                        v = c.find(_S + "v")
                        try:
                            cells.append(shared[int((v.text or "").strip())])
                        except (ValueError, IndexError, AttributeError):
                            cells.append("")
                    elif ctype == "inlineStr":
                        isel = c.find(_S + "is")
                        cells.append(
                            "".join(t.text or "" for t in isel.iter(_S + "t"))
                            if isel is not None
                            else ""
                        )
                    else:
                        v = c.find(_S + "v")
                        cells.append((v.text or "") if v is not None else "")
                line = "\t".join(cells).rstrip("\t")
                if line:
                    lines.append(line)
            if lines:
                out.append("\n".join(lines))
    return "\n\n".join(out)


# ---- EPUB ----------------------------------------------------------------

_CNT = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF = "{http://www.idpf.org/2007/opf}"
_XHTML = "{http://www.w3.org/1999/xhtml}"

#: block-level elements that end a line of extracted text
_EPUB_BLOCKS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li blockquote td th dt dd figcaption".split()
)
_EPUB_SKIP = frozenset(("script", "style", "head"))


def is_epub(data: bytes, names: "list[str] | None" = None) -> bool:
    """EPUB's OCF magic: the first entry is an (uncompressed) ``mimetype``
    of ``application/epub+zip`` — checkable straight off the local file
    header, no central directory needed. Falls back to a namelist probe
    for writers that misplace the entry."""
    if data[:4] != b"PK\x03\x04":
        return False
    if data[30:38] == b"mimetype" and b"application/epub+zip" in data[38:100]:
        return True
    names = _zip_names(data) if names is None else names
    if names is None or "mimetype" not in names:
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            return zf.read("mimetype").strip() == b"application/epub+zip"
    except Exception:
        return False


def _epub_spine(zf: zipfile.ZipFile) -> "list[str] | None":
    """Content-document part names in spine order via container.xml →
    OPF; None when either is absent/broken."""
    try:
        container = ET.fromstring(zf.read("META-INF/container.xml"))
        rootfile = next(
            r.get("full-path")
            for r in container.iter(_CNT + "rootfile")
            if r.get("full-path")
        )
        opf = ET.fromstring(zf.read(rootfile))
    except Exception:
        return None
    base = rootfile.rsplit("/", 1)[0] + "/" if "/" in rootfile else ""
    items = {
        it.get("id"): it.get("href")
        for it in opf.iter(_OPF + "item")
        if it.get("id") and it.get("href")
    }
    order = []
    for ref in opf.iter(_OPF + "itemref"):
        href = items.get(ref.get("idref"))
        if href:
            order.append(base + href)
    return order or None


def _xhtml_blocks(xml: bytes) -> list[str]:
    """Block-level text lines of one XHTML content document."""
    try:
        root = ET.fromstring(xml)
    except Exception:
        return []
    lines: list[str] = []
    cur: list[str] = []

    def localname(tag) -> str:
        return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""

    def flush():
        txt = " ".join("".join(cur).split())
        if txt:
            lines.append(txt)
        cur.clear()

    def walk(el):
        name = localname(el.tag)
        if name in _EPUB_SKIP:
            return
        block = name in _EPUB_BLOCKS
        if block:
            flush()
        if el.text:
            cur.append(el.text)
        for child in el:
            walk(child)
            if child.tail:
                cur.append(child.tail)
        if block:
            flush()

    walk(root)
    flush()
    return lines


def extract_epub_text(data: bytes) -> str:
    """EPUB bytes → text: one line per block, content documents in spine
    order joined with \\n\\n."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except Exception:
        return ""
    with zf:
        names = zf.namelist()
        spine = _epub_spine(zf)
        if spine is None:
            spine = sorted(
                n for n in names if n.endswith((".xhtml", ".html", ".htm"))
            )
        out: list[str] = []
        for name in spine:
            if name not in names:
                continue
            try:
                blocks = _xhtml_blocks(zf.read(name))
            except Exception:
                continue
            if blocks:
                out.append("\n".join(blocks))
    return "\n\n".join(out)
