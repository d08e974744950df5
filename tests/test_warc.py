"""WARC source (sources/warc.py): record framing, gzip members, HTTP
payload decode (chunked + content-encoding), and the Spark scan into
the parse stage's input shape."""

from __future__ import annotations

import gzip

from semtools_spark.operators.parse import parse_pages
from semtools_spark.sources.warc import (
    _gunzip_members,
    parse_warc,
    warc_pages,
)


def _rec(rtype: str, payload: bytes, uri: str = "", date: str = "",
         ctype: str = "application/http; msgtype=response") -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {rtype}",
            f"Content-Length: {len(payload)}", f"Content-Type: {ctype}"]
    if uri:
        head.append(f"WARC-Target-URI: {uri}")
    if date:
        head.append(f"WARC-Date: {date}")
    return ("\r\n".join(head) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200,
          headers: "tuple[str, ...]" = ("Content-Type: text/html",)) -> bytes:
    head = [f"HTTP/1.1 {status} OK", *headers]
    return ("\r\n".join(head) + "\r\n\r\n").encode() + body


def _corpus() -> bytes:
    chunked = b"5\r\n<p>ch\r\n9\r\nunked</p>\r\n0\r\n\r\n"
    gz_body = gzip.compress(b"<p>gzipped body</p>")
    return (
        _rec("warcinfo", b"software: test\r\n", ctype="application/warc-fields")
        + _rec("request", _http(b"", 0, ("Host: x",)),
               uri="http://a.example/one")
        + _rec("response", _http(b"<p>plain body</p>"),
               uri="http://a.example/one", date="2025-01-06T08:15:30Z")
        + _rec("response",
               _http(chunked, 200, ("Content-Type: text/html",
                                    "Transfer-Encoding: chunked")),
               uri="http://a.example/two", date="2025-01-06T08:16:00Z")
        + _rec("response",
               _http(gz_body, 200, ("Content-Type: text/html",
                                    "Content-Encoding: gzip")),
               uri="http://a.example/three", date="2025-01-06T08:17:00Z")
        + _rec("response", _http(b"gone", 404),
               uri="http://a.example/missing", date="2025-01-06T08:18:00Z")
        + _rec("resource", b"raw resource bytes",
               uri="http://a.example/res.txt", date="2025-01-06T08:19:00Z",
               ctype="text/plain")
    )


def test_parse_warc_records_and_http_decode():
    recs = list(parse_warc(_corpus()))
    by_url = {r["url"]: r for r in recs}
    # warcinfo + request skipped; 4 responses + 1 resource kept
    assert len(recs) == 5
    assert by_url["http://a.example/one"]["html"] == b"<p>plain body</p>"
    assert by_url["http://a.example/one"]["http_status"] == 200
    assert by_url["http://a.example/one"]["content_type"] == "text/html"
    assert by_url["http://a.example/two"]["html"] == b"<p>chunked</p>"
    assert by_url["http://a.example/three"]["html"] == b"<p>gzipped body</p>"
    assert by_url["http://a.example/missing"]["http_status"] == 404
    res = by_url["http://a.example/res.txt"]
    assert res["html"] == b"raw resource bytes"
    assert res["http_status"] is None
    assert res["content_type"] == "text/plain"


def test_gzip_member_per_record_layout():
    plain = _corpus()
    # one gzip member per record — the canonical .warc.gz layout
    members = b"".join(
        gzip.compress(_rec("response", _http(b"<p>m%d</p>" % i),
                           uri=f"http://m.example/{i}",
                           date="2025-01-06T09:00:00Z"))
        for i in range(3)
    )
    assert _gunzip_members(members).count(b"WARC/1.0") == 3
    assert len(list(parse_warc(members))) == 3
    # plain bytes pass through
    assert _gunzip_members(plain) is plain


def test_malformed_and_truncated_degrade():
    corpus = _corpus()
    assert list(parse_warc(b"")) == []
    assert list(parse_warc(b"not a warc at all")) == []
    # truncation mid-payload: earlier records survive, walk stops clean
    cut = list(parse_warc(corpus[: len(corpus) - 40]))
    assert 0 < len(cut) <= 5
    # corrupt gzip tail: first member still decodes
    members = gzip.compress(
        _rec("response", _http(b"<p>ok</p>"), uri="u", date="2025-01-06T09:00:00Z")
    ) + b"\x1f\x8b garbage"
    assert len(list(parse_warc(members))) == 1
    # a declared length overrunning the file ends the walk, no raise
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999\r\n\r\nxx"
    assert list(parse_warc(bad)) == []


def test_warc_pages_scan_feeds_parse_pages(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_corpus())
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_rec(
        "response", _http(b"<p>from gz file</p>"),
        uri="http://b.example/gz", date="2025-01-06T10:00:00Z",
    )))
    df = warc_pages(spark, str(tmp_path) + "/*.warc*")
    rows = {r.url: r for r in df.collect()}
    # 404 dropped by keep_status; resource (NULL status) kept
    assert "http://a.example/missing" not in rows
    assert set(rows) == {
        "http://a.example/one", "http://a.example/two",
        "http://a.example/three", "http://a.example/res.txt",
        "http://b.example/gz",
    }
    assert rows["http://a.example/one"].warc_ts is not None
    assert rows["http://a.example/one"].lang is None
    # the whole point: parse_pages consumes the scan unchanged
    texts = {r.url: r.text for r in parse_pages(df).collect()}
    assert texts["http://a.example/two"] == "chunked"
    assert texts["http://b.example/gz"] == "from gz file"
    # .txt url takes the P1 passthrough branch (raw decode, no markup strip)
    assert texts["http://a.example/res.txt"] == "raw resource bytes"
    # keep_status=None keeps the 404
    assert warc_pages(spark, str(tmp_path) + "/a.warc", keep_status=None).count() == 5


# ---- fuzz: the record walk must never raise --------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except Exception:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    @given(
        prefix=st.sampled_from([b"", b"WARC/1.0\r\n", b"\x1f\x8b\x08\x00"]),
        payload=st.binary(min_size=0, max_size=2048),
    )
    @settings(max_examples=120, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_arbitrary_bytes_never_raise(prefix, payload):
        for rec in parse_warc(prefix + payload):
            assert isinstance(rec, dict)

    @given(
        mutation=st.one_of(
            st.tuples(st.just("flip"), st.integers(min_value=0),
                      st.integers(0, 7)),
            st.tuples(st.just("cut"), st.integers(min_value=0), st.just(0)),
            st.tuples(st.just("splice"), st.integers(min_value=0), st.just(0)),
        ),
        junk=st.binary(min_size=1, max_size=32),
        gz=st.booleans(),
    )
    @settings(max_examples=120, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_mutated_corpus_never_raises(mutation, junk, gz):
        data = bytearray(gzip.compress(_corpus()) if gz else _corpus())
        kind, off, bit = mutation
        off = off % max(1, len(data))
        if kind == "flip":
            data[off] ^= 1 << bit
        elif kind == "cut":
            data = data[:off]
        else:
            data[off:off] = junk
        for rec in parse_warc(bytes(data)):
            assert isinstance(rec, dict)


def test_warc_pipeline_end_to_end_with_resume(spark, tmp_path):
    """pages_format='warc': the full KG pipeline runs straight off
    .warc/.warc.gz files (glob input), resumes via the manifest, and —
    because glob inputs are fingerprinted per matched file — re-parses
    when the crawl directory gains a file."""
    from semtools_spark.pipeline import run_webkg_pipeline

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "a.warc.gz").write_bytes(gzip.compress(_rec(
        "response", _http(b"<p>spark join table</p>"),
        uri="http://w.example/1", date="2025-01-06T12:00:00Z")))
    (crawl / "b.warc").write_bytes(_rec(
        "response", _http(b"<p>row merge column</p>"),
        uri="http://w.example/2", date="2025-01-06T12:01:00Z"))
    out = str(tmp_path / "kg")
    glob_in = str(crawl) + "/*.warc*"

    r1 = run_webkg_pipeline(spark, glob_in, out, pages_format="warc")
    assert r1["stages"]["parse"] == {
        "skipped": False, "rows": 2, "wall_s": r1["stages"]["parse"]["wall_s"],
    }
    graph = {(r.subj, r.pred, r.obj)
             for r in spark.read.parquet(r1["paths"]["graph"]).collect()}
    assert ("spark", "join", "table") in graph
    assert ("row", "merge", "column") in graph

    # same input → every stage resumes off the manifest
    r2 = run_webkg_pipeline(spark, glob_in, out, pages_format="warc")
    assert all(s["skipped"] for s in r2["stages"].values())

    # a new crawl file under the glob must invalidate the parse stage
    (crawl / "c.warc.gz").write_bytes(gzip.compress(_rec(
        "response", _http(b"<p>key filter window</p>"),
        uri="http://w.example/3", date="2025-01-06T12:02:00Z")))
    r3 = run_webkg_pipeline(spark, glob_in, out, pages_format="warc")
    assert r3["stages"]["parse"]["skipped"] is False
    assert r3["stages"]["parse"]["rows"] == 3


def test_response_without_http_content_type_is_null():
    """r8 review: the envelope Content-Type ('application/http; ...')
    describes the WARC record, not the payload — a response whose HTTP
    headers lack Content-Type must yield NULL, not the envelope value."""
    rec = _rec("response", _http(b"<p>x</p>", 200, ("Server: t",)),
               uri="http://e.example/", date="2025-01-06T11:00:00Z")
    (got,) = parse_warc(rec)
    assert got["content_type"] is None
    assert got["http_status"] == 200


def test_dechunk_degrades_on_not_actually_chunked_body():
    """r8 review: some WARC writers store the already-de-chunked body
    while preserving the Transfer-Encoding header; slicing it by
    imaginary chunk sizes corrupted it. Inconsistent walks keep raw."""
    body = b"abc\r\n<html>this body is NOT chunked despite the header</html>"
    rec = _rec("response",
               _http(body, 200, ("Content-Type: text/html",
                                 "Transfer-Encoding: chunked")),
               uri="http://f.example/", date="2025-01-06T11:01:00Z")
    (got,) = parse_warc(rec)
    assert got["html"] == body  # degraded to raw, byte-identical


def test_record_spanning_gzip_members_is_carried_over():
    """r8 review: gzip members now decompress incrementally; a record
    whose bytes straddle a member boundary must still parse (carry
    buffer), and one-member-per-record files must not regress."""
    r1 = _rec("response", _http(b"<p>first</p>"), uri="u1",
              date="2025-01-06T11:02:00Z")
    r2 = _rec("response", _http(b"<p>second</p>"), uri="u2",
              date="2025-01-06T11:03:00Z")
    cut = len(r1) + 37  # mid-way through r2's header/payload
    blob = r1 + r2
    data = gzip.compress(blob[:cut]) + gzip.compress(blob[cut:])
    got = {r["url"]: r["html"] for r in parse_warc(data)}
    assert got == {"u1": b"<p>first</p>", "u2": b"<p>second</p>"}


def test_decompression_bomb_member_degrades(monkeypatch):
    """ADVICE r8: a crafted gzip member inflating past the per-member
    ceiling must END the walk (records decoded so far kept) instead of
    allocating the full inflated size — the record-count budget does not
    bound bytes, this ceiling does."""
    import zlib

    import semtools_spark.sources.warc as W

    r1 = _rec("response", _http(b"<p>ok</p>"), uri="u1",
              date="2025-01-06T12:00:00Z")
    bomb = gzip.compress(b"\x00" * (8 << 20))  # ~8 KiB compressed, 8 MiB inflated
    monkeypatch.setattr(W, "_MAX_INFLATED_BYTES", 1 << 20)
    recs = list(parse_warc(gzip.compress(r1) + bomb))
    assert [r["url"] for r in recs] == ["u1"]
    assert recs[0]["html"] == b"<p>ok</p>"
    # and the same ceiling applied to a well-formed small archive is a no-op
    recs2 = list(parse_warc(gzip.compress(r1)))
    assert [r["url"] for r in recs2] == ["u1"]


def test_content_encoding_bomb_keeps_raw_body(monkeypatch):
    """ADVICE r8: an HTTP body whose Content-Encoding inflate exceeds the
    ceiling degrades to the RAW bytes (same contract as a corrupt
    stream), never allocating the inflated size."""
    import semtools_spark.sources.warc as W

    big = gzip.compress(b"A" * (8 << 20))
    rec = _rec(
        "response",
        _http(big, 200, ("Content-Type: text/html", "Content-Encoding: gzip")),
        uri="u-bomb", date="2025-01-06T12:01:00Z",
    )
    monkeypatch.setattr(W, "_MAX_INFLATED_BYTES", 1 << 20)
    got = {r["url"]: r["html"] for r in parse_warc(rec)}
    assert got["u-bomb"] == big  # raw kept, not inflated
    # under the default ceiling the same body inflates normally
    monkeypatch.undo()
    got2 = {r["url"]: r["html"] for r in parse_warc(rec)}
    assert got2["u-bomb"] == b"A" * (8 << 20)


def test_many_member_spanning_record_linear_carry():
    """ADVICE r8: one record spanning MANY gzip members must round-trip
    through the bytearray carry (the rebuilt-bytes form copied O(k²));
    html must come back as plain bytes."""
    body = b"<p>" + b"x" * 5000 + b"</p>"
    rec = _rec("response", _http(body), uri="u-span",
               date="2025-01-06T12:02:00Z")
    pieces = [rec[i : i + 97] for i in range(0, len(rec), 97)]
    data = b"".join(gzip.compress(p) for p in pieces)
    recs = list(parse_warc(data))
    assert [r["url"] for r in recs] == ["u-span"]
    assert type(recs[0]["html"]) is bytes
    assert recs[0]["html"] == body
