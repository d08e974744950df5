"""Pure-Python PPTX / XLSX text extractors for the pluggable parse slot.

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

Malformed input degrades to partial/empty text, never a raise."""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

__all__ = ["extract_pptx_text", "extract_xlsx_text", "is_pptx", "is_xlsx"]

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


def is_pptx(data: bytes) -> bool:
    names = _zip_names(data)
    return names is not None and any(_SLIDE_RE.match(n) for n in names)


def is_xlsx(data: bytes) -> bool:
    names = _zip_names(data)
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
