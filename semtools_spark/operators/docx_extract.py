"""Pure-Python DOCX (Office Open XML) text extractor for the pluggable
parse slot.

The reference's ``parse`` accepts Office documents alongside PDFs
(semtools src/parse/client.rs:290-433 posts them to the LlamaParse API;
README lists Word formats as supported inputs). A DOCX file is a ZIP
archive whose main body lives at ``word/document.xml`` (ECMA-376 /
ISO 29500 WordprocessingML) — fully parseable with stdlib ``zipfile`` +
``xml.etree``, so unlike image codecs this needs no third-party
dependency. Like every extractor behind the slot this is a DETERMINISTIC
pure function ``bytes -> str`` (no state, no network), satisfying the
parse cache's fingerprint/resume contract.

Mapping (documented, not silent):

* each paragraph (``w:p``) becomes one line, in document order —
  including paragraphs inside table cells (tables read row-major, the
  order they appear in the XML);
* within a paragraph: ``w:t`` contributes its text, ``w:tab`` a tab,
  ``w:br``/``w:cr`` a line break;
* empty paragraphs are dropped (same empty-line policy as the PDF
  extractor's page assembly);
* headers/footers/footnotes/comments (separate XML parts) are out of
  scope, as is embedded-object text.

Malformed input degrades to partial/empty text, never a raise — a
10^12-page parse job must not die on one truncated upload.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET

__all__ = ["extract_docx_text", "is_docx"]

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_DOC_PART = "word/document.xml"


def is_docx(data: bytes, names: "list[str] | None" = None) -> bool:
    """ZIP magic + the WordprocessingML main part. Cheap: only the
    central directory is read, no decompression happens — and callers
    probing several zip formats pass the namelist in so it is read once
    (see :func:`office_extract._zip_names`)."""
    if names is None:
        from semtools_spark.operators.office_extract import _zip_names

        names = _zip_names(data)
    return names is not None and _DOC_PART in names


def extract_docx_text(data: bytes) -> str:
    """DOCX bytes → extracted text, one line per paragraph."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            xml = zf.read(_DOC_PART)
        root = ET.fromstring(xml)
    except Exception:
        return ""
    paras: list[str] = []
    for p in root.iter(_W + "p"):
        parts: list[str] = []
        for el in p.iter():
            tag = el.tag
            if tag == _W + "t":
                parts.append(el.text or "")
            elif tag == _W + "tab":
                parts.append("\t")
            elif tag in (_W + "br", _W + "cr"):
                parts.append("\n")
        txt = "".join(parts)
        if txt:
            paras.append(txt)
    return "\n".join(paras)
