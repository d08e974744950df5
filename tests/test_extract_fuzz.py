"""Never-raise fuzzing of the whole extractor dispatch.

The parse stage's contract is that ONE corrupt document out of 10^12
must not fail the job: every extractor degrades to partial/empty text.
Three generators attack that claim: arbitrary bytes, arbitrary bytes
behind each format's magic (so the format-specific parser actually
engages), and bit-flipped / truncated REAL documents (the mutations a
broken crawl or storage layer actually produces)."""

from __future__ import annotations

import io
import zipfile
import zlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from semtools_spark.operators.pdf_extract import extract_any

_MAGICS = [
    b"",
    b"%PDF-1.7\n",
    b"PK\x03\x04",
    b"PK\x03\x04" + b"\x00" * 26 + b"mimetypeapplication/epub+zip",
    b"PK\x03\x04" + b"\x00" * 26
    + b"mimetypeapplication/vnd.oasis.opendocument.text",
    b"{\\rtf1\\ansi ",
    b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1",  # OLE2 (.doc)
    b"<!DOCTYPE html><html>",
]

_SETTINGS = dict(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(
    prefix=st.sampled_from(_MAGICS),
    payload=st.binary(min_size=0, max_size=2048),
)
@settings(**_SETTINGS)
def test_arbitrary_bytes_never_raise(prefix, payload):
    out = extract_any(prefix + payload)
    assert isinstance(out, str)


def _real_documents() -> list[bytes]:
    """One small real document per format family, built with the same
    deterministic builders the extractor tests pin."""
    docs: list[bytes] = []
    # PDF: classic layout, Flate content
    content = zlib.compress(b"BT (fuzz seed page) Tj ET", 9)
    pdf = bytearray(b"%PDF-1.4\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Filter /FlateDecode /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
    ]
    for num, body in enumerate(objs, start=1):
        pdf += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    pdf += b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    docs.append(bytes(pdf))
    # DOCX-shaped zip
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "word/document.xml",
            '<w:document xmlns:w="http://schemas.openxmlformats.org/'
            'wordprocessingml/2006/main"><w:body><w:p><w:r>'
            "<w:t>fuzz seed docx</w:t></w:r></w:p></w:body></w:document>",
        )
    docs.append(buf.getvalue())
    # HTML
    docs.append(
        b"<html><body><p>"
        + b"fuzz seed html paragraph with enough words to be main content. " * 5
        + b"</p></body></html>"
    )
    # r8 formats, built with the same deterministic fixture builders
    from test_legacy_extract import _odf, _ppt_fixture, _word_doc, _xls_fixture

    docs.append(_odf("odt", "<office:text><text:p>fuzz seed odt</text:p></office:text>"))
    docs.append(b"{\\rtf1\\ansi fuzz seed rtf\\par}")
    docs.append(_word_doc(["fuzz seed legacy doc"]))
    docs.append(_xls_fixture())
    docs.append(_ppt_fixture())
    return docs


@given(
    doc_i=st.integers(min_value=0, max_value=7),
    mutation=st.one_of(
        # bit flip at an arbitrary offset
        st.tuples(st.just("flip"), st.integers(min_value=0), st.integers(0, 7)),
        # truncate to an arbitrary length
        st.tuples(st.just("cut"), st.integers(min_value=0), st.just(0)),
        # splice arbitrary bytes at an arbitrary offset
        st.tuples(st.just("splice"), st.integers(min_value=0), st.just(0)),
    ),
    junk=st.binary(min_size=1, max_size=32),
)
@settings(**_SETTINGS)
def test_mutated_real_documents_never_raise(doc_i, mutation, junk):
    data = bytearray(_real_documents()[doc_i])
    kind, off, bit = mutation
    off = off % max(1, len(data))
    if kind == "flip":
        data[off] ^= 1 << bit
    elif kind == "cut":
        data = data[:off]
    else:
        data[off:off] = junk
    out = extract_any(bytes(data))
    assert isinstance(out, str)
