"""DOCX extractor tests: spec-shaped fixtures built deterministically in
pure Python (stdlib zipfile, pinned timestamps), extracted through the
pluggable parse slot next to PDF and HTML."""

from __future__ import annotations

import io
import zipfile

from semtools_spark.operators import docx_extract as DX
from semtools_spark.operators import pdf_extract as PX

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _mk_docx(body_xml: str) -> bytes:
    """Minimal valid DOCX: [Content_Types], the package rel pointing at
    the main part, and word/document.xml wrapping ``body_xml``.
    Deterministic bytes (fixed date_time, no extra fields)."""
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>{body_xml}</w:body></w:document>'
    )
    parts = {
        "[Content_Types].xml": (
            '<?xml version="1.0"?><Types '
            'xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/word/document.xml" ContentType="application/vnd.'
            'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
            "</Types>"
        ),
        "_rels/.rels": (
            '<?xml version="1.0"?><Relationships '
            'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" '
            'Target="word/document.xml"/></Relationships>'
        ),
        "word/document.xml": document,
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, text in sorted(parts.items()):
            zi = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, text)
    return buf.getvalue()


def _p(*runs: str) -> str:
    return "<w:p>" + "".join(runs) + "</w:p>"


def _t(text: str) -> str:
    return f'<w:r><w:t xml:space="preserve">{text}</w:t></w:r>'


def test_paragraphs_tabs_breaks_and_tables():
    body = (
        _p(_t("Title of the document"))
        + _p(_t("col a"), "<w:r><w:tab/></w:r>", _t("col b"))
        + _p(_t("line one"), "<w:r><w:br/></w:r>", _t("line two"))
        + "<w:p/>"  # empty paragraph: dropped
        + "<w:tbl><w:tr>"
        + "<w:tc>" + _p(_t("cell 1")) + "</w:tc>"
        + "<w:tc>" + _p(_t("cell 2")) + "</w:tc>"
        + "</w:tr></w:tbl>"
        + _p(_t("after the table"))
    )
    got = DX.extract_docx_text(_mk_docx(body))
    assert got == (
        "Title of the document\n"
        "col a\tcol b\n"
        "line one\nline two\n"
        "cell 1\ncell 2\n"
        "after the table"
    )


def test_split_runs_concatenate_within_a_paragraph():
    # Word splits one visual sentence across runs at spell-check and
    # formatting boundaries — they must join with no separator
    body = _p(_t("Hyph"), _t("en"), _t("ated word"))
    assert DX.extract_docx_text(_mk_docx(body)) == "Hyphenated word"


def test_is_docx_rejects_plain_zip_and_non_zip():
    assert not DX.is_docx(b"not a zip")
    assert not DX.is_docx(b"")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("data.txt", "just a zip")
    assert not DX.is_docx(buf.getvalue())
    assert DX.is_docx(_mk_docx(_p(_t("x"))))


def test_malformed_inputs_degrade_to_empty_never_raise():
    whole = _mk_docx(_p(_t("content")))
    assert DX.extract_docx_text(whole[: len(whole) // 2]) == ""
    # valid zip, broken XML inside
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", "<w:document unclosed")
    assert DX.extract_docx_text(buf.getvalue()) == ""


def test_extract_any_dispatches_pdf_docx_html():
    docx = _mk_docx(_p(_t("Word body text")))
    assert PX.extract_any(docx) == "Word body text"
    html = (
        b"<html><body><p>"
        + b"Real paragraph content long enough to keep. " * 3
        + b"</p></body></html>"
    )
    assert "Real paragraph content" in PX.extract_any(html)


def test_docx_through_parse_pages_slot(spark):
    """The Spark contract: DOCX bytes in the html column flow through
    parse_pages(extractor=extract_any) next to PDF and passthrough rows."""
    import datetime as dt

    from semtools_spark.operators.parse import parse_pages

    ts = dt.datetime(2026, 1, 1)
    rows = [
        ("https://ex.com/report.docx", ts, _mk_docx(_p(_t("quarterly report"))), "en"),
        ("https://ex.com/readme.txt", ts, b"plain passthrough text", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, lang string"
    )
    got = {r.url: r.text for r in parse_pages(pages, extractor=PX.extract_any).collect()}
    assert got["https://ex.com/report.docx"] == "quarterly report"
    assert got["https://ex.com/readme.txt"] == "plain passthrough text"
