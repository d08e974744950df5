"""PPTX/XLSX extractor tests: spec-shaped fixtures built deterministically
in pure Python (stdlib zipfile, pinned timestamps), extracted through the
pluggable parse slot next to PDF/DOCX/HTML."""

from __future__ import annotations

import io
import zipfile

from semtools_spark.operators import office_extract as OX
from semtools_spark.operators import pdf_extract as PX

_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
_S_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_R_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PR_NS = "http://schemas.openxmlformats.org/package/2006/relationships"


def _zip_bytes(parts: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, text in sorted(parts.items()):
            zi = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, text)
    return buf.getvalue()


def _mk_pptx(slides: list[str]) -> bytes:
    """Minimal PPTX: one slide part per entry; each entry is the inner
    DrawingML (a:p paragraphs)."""
    parts = {
        "[Content_Types].xml": (
            '<?xml version="1.0"?><Types '
            'xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>'
        )
    }
    for i, body in enumerate(slides, start=1):
        parts[f"ppt/slides/slide{i}.xml"] = (
            '<?xml version="1.0"?>'
            f'<p:sld xmlns:p="http://schemas.openxmlformats.org/'
            f'presentationml/2006/main" xmlns:a="{_A_NS}">'
            f"<p:cSld><p:spTree>{body}</p:spTree></p:cSld></p:sld>"
        )
    return _zip_bytes(parts)


def _ap(*runs: str) -> str:
    return "<a:p>" + "".join(f"<a:r><a:t>{r}</a:t></a:r>" for r in runs) + "</a:p>"


def _mk_xlsx(
    sheets: list[str], shared: list[str] | None = None, with_workbook: bool = True
) -> bytes:
    parts: dict[str, str] = {
        "[Content_Types].xml": (
            '<?xml version="1.0"?><Types '
            'xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>'
        )
    }
    for i, rows in enumerate(sheets, start=1):
        parts[f"xl/worksheets/sheet{i}.xml"] = (
            '<?xml version="1.0"?>'
            f'<worksheet xmlns="{_S_NS}"><sheetData>{rows}</sheetData></worksheet>'
        )
    if shared is not None:
        sis = "".join(f"<si><t>{s}</t></si>" for s in shared)
        parts["xl/sharedStrings.xml"] = (
            f'<?xml version="1.0"?><sst xmlns="{_S_NS}" '
            f'count="{len(shared)}" uniqueCount="{len(shared)}">{sis}</sst>'
        )
    if with_workbook:
        decls = "".join(
            f'<sheet name="S{i}" sheetId="{i}" r:id="rId{i}"/>'
            for i in range(1, len(sheets) + 1)
        )
        parts["xl/workbook.xml"] = (
            f'<?xml version="1.0"?><workbook xmlns="{_S_NS}" '
            f'xmlns:r="{_R_NS}"><sheets>{decls}</sheets></workbook>'
        )
        rels = "".join(
            f'<Relationship Id="rId{i}" Type="{_R_NS}/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(sheets) + 1)
        )
        parts["xl/_rels/workbook.xml.rels"] = (
            f'<?xml version="1.0"?><Relationships xmlns="{_PR_NS}">{rels}'
            "</Relationships>"
        )
    else:
        parts["xl/workbook.xml"] = (
            f'<?xml version="1.0"?><workbook xmlns="{_S_NS}"/>'
        )
    return _zip_bytes(parts)


def test_pptx_slides_paragraphs_and_breaks():
    data = _mk_pptx(
        [
            _ap("Title ", "slide") + _ap("bullet one"),
            "<a:p><a:r><a:t>before</a:t></a:r><a:br/>"
            "<a:r><a:t>after</a:t></a:r></a:p>",
        ]
    )
    assert OX.is_pptx(data)
    assert OX.extract_pptx_text(data) == (
        "Title slide\nbullet one\n\nbefore\nafter"
    )


def test_pptx_slide_order_is_numeric_not_lexicographic():
    slides = [_ap(f"slide {i}") for i in range(1, 12)]
    data = _mk_pptx(slides)  # slide10 sorts before slide2 lexicographically
    got = OX.extract_pptx_text(data).split("\n\n")
    assert got == [f"slide {i}" for i in range(1, 12)]


def test_xlsx_shared_inline_and_numeric_cells():
    rows = (
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="s"><v>1</v></c>'
        "</row>"
        '<row r="2">'
        '<c r="A2"><v>42</v></c>'
        '<c r="B2" t="inlineStr"><is><t>inline!</t></is></c>'
        "</row>"
    )
    data = _mk_xlsx([rows], shared=["name", "value"])
    assert OX.is_xlsx(data)
    assert OX.extract_xlsx_text(data) == "name\tvalue\n42\tinline!"


def test_xlsx_sheet_order_follows_workbook_and_falls_back():
    r1 = '<row r="1"><c r="A1" t="inlineStr"><is><t>first</t></is></c></row>'
    r2 = '<row r="1"><c r="A1" t="inlineStr"><is><t>second</t></is></c></row>'
    assert OX.extract_xlsx_text(_mk_xlsx([r1, r2])) == "first\n\nsecond"
    # no workbook declarations: part-name order fallback still extracts
    assert OX.extract_xlsx_text(
        _mk_xlsx([r1, r2], with_workbook=False)
    ) == "first\n\nsecond"


def test_extract_any_dispatches_all_office_formats():
    pptx = _mk_pptx([_ap("deck text")])
    xlsx = _mk_xlsx(
        ['<row r="1"><c r="A1" t="inlineStr"><is><t>cell text</t></is></c></row>']
    )
    assert PX.extract_any(pptx) == "deck text"
    assert PX.extract_any(xlsx) == "cell text"
    # plain zip is neither: falls through to the HTML path (empty here)
    plain = _zip_bytes({"hello.txt": "hi"})
    assert not OX.is_pptx(plain) and not OX.is_xlsx(plain)


def test_malformed_inputs_degrade_to_empty_never_raise():
    bad_zip = b"PK\x03\x04" + b"\x00" * 40
    for fn in (OX.extract_pptx_text, OX.extract_xlsx_text):
        assert fn(b"") == ""
        assert fn(bad_zip) == ""
        assert fn(b"not a zip at all") == ""
    truncated_xml = _zip_bytes({"ppt/slides/slide1.xml": "<p:sld><a:p>"})
    assert OX.extract_pptx_text(truncated_xml) == ""


def test_office_through_parse_pages_slot(spark):
    """The extractors satisfy the pluggable-slot contract: deterministic
    bytes->str through parse_pages, like PDF/DOCX/HTML."""
    import datetime as dt

    from semtools_spark.operators.parse import parse_pages

    ts = dt.datetime(2026, 1, 1)
    pptx = _mk_pptx([_ap("deck body text")])
    xlsx = _mk_xlsx(
        ['<row r="1"><c r="A1" t="inlineStr"><is><t>sheet body</t></is></c></row>']
    )
    pages = spark.createDataFrame(
        [
            ("https://ex.com/deck.pptx", ts, pptx, "en"),
            ("https://ex.com/book.xlsx", ts, xlsx, "en"),
        ],
        "url string, warc_ts timestamp, html binary, lang string",
    )
    out = parse_pages(pages, extractor=PX.extract_any)
    got = {r.url: r.text for r in out.select("url", "text").collect()}
    assert got == {
        "https://ex.com/deck.pptx": "deck body text",
        "https://ex.com/book.xlsx": "sheet body",
    }


def _mk_epub(chapters: list[str], with_opf: bool = True) -> bytes:
    """Minimal EPUB: OCF mimetype (stored first, uncompressed), container
    → OPF with spine, XHTML chapters. Chapter entries are body XHTML."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zi = zipfile.ZipInfo("mimetype", date_time=(2020, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_STORED
        zf.writestr(zi, "application/epub+zip")
        parts: dict[str, str] = {}
        if with_opf:
            parts["META-INF/container.xml"] = (
                '<?xml version="1.0"?><container version="1.0" '
                'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
                '<rootfiles><rootfile full-path="OEBPS/content.opf" '
                'media-type="application/oebps-package+xml"/></rootfiles>'
                "</container>"
            )
            items = "".join(
                f'<item id="c{i}" href="ch{i}.xhtml" '
                'media-type="application/xhtml+xml"/>'
                for i in range(len(chapters))
            )
            # spine deliberately REVERSES file order to prove spine wins
            refs = "".join(
                f'<itemref idref="c{i}"/>'
                for i in reversed(range(len(chapters)))
            )
            parts["OEBPS/content.opf"] = (
                '<?xml version="1.0"?><package version="3.0" '
                'xmlns="http://www.idpf.org/2007/opf" unique-identifier="u">'
                f"<manifest>{items}</manifest><spine>{refs}</spine></package>"
            )
        for i, body in enumerate(chapters):
            parts[f"OEBPS/ch{i}.xhtml"] = (
                '<?xml version="1.0"?><html '
                'xmlns="http://www.w3.org/1999/xhtml"><head>'
                "<style>p{color:red}</style></head>"
                f"<body>{body}</body></html>"
            )
        for name, text in sorted(parts.items()):
            zi = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, text)
    return buf.getvalue()


def test_epub_blocks_spine_order_and_inline_markup():
    data = _mk_epub(
        [
            "<h1>Chapter One</h1><p>First <em>styled</em> paragraph.</p>"
            "<ul><li>alpha</li><li>beta</li></ul>",
            "<p>Second chapter text.</p>",
        ]
    )
    assert OX.is_epub(data)
    # spine reverses file order: ch1 first
    assert OX.extract_epub_text(data) == (
        "Second chapter text."
        "\n\n"
        "Chapter One\nFirst styled paragraph.\nalpha\nbeta"
    )


def test_epub_without_opf_falls_back_to_name_order():
    data = _mk_epub(["<p>one</p>", "<p>two</p>"], with_opf=False)
    assert OX.is_epub(data)
    assert OX.extract_epub_text(data) == "one\n\ntwo"


def test_extract_any_dispatches_epub():
    data = _mk_epub(["<p>book body</p>"])
    assert PX.extract_any(data) == "book body"
    # docx/pptx/xlsx zips are NOT epubs
    assert not OX.is_epub(_mk_pptx([_ap("x")]))


def test_epub_malformed_degrades():
    assert OX.extract_epub_text(b"") == ""
    assert OX.extract_epub_text(b"PK\x03\x04" + b"\x00" * 30) == ""
    # epub magic but truncated archive
    junk = b"PK\x03\x04" + b"\x00" * 22 + b"\x08\x00" + b"mimetypeapplication/epub+zip"
    assert OX.extract_epub_text(junk) == ""
