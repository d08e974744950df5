"""WARC (ISO 28500) ingestion source — real-crawl input for the parse
stage.

The generated corpus (:mod:`web_pages`) matches the input_hint schema;
this source produces the SAME (url, warc_ts, lang, html) shape from
actual Web ARChive files, so ``parse_pages`` and everything downstream
run unchanged on Common-Crawl-style data. Reference parity: the
reference parses user-supplied files of any format (src/parse/
client.rs:290-433); WARC is how web corpora arrive in bulk.

Layers, all pure ``bytes ->`` functions (testable without Spark):

* **gzip members** — ``.warc.gz`` files are CONCATENATED gzip members,
  one per record, so readers can skip records without decompressing the
  whole file. Stdlib zlib with ``wbits=47`` loops members via
  ``unused_data``.
* **WARC records** — ``WARC/1.x`` header block (CRLF lines, blank-line
  terminated, case-insensitive field names), ``Content-Length`` payload
  bytes, CRLF CRLF separator. ``response``/``resource`` records are
  kept; ``request``/``warcinfo``/``metadata`` skipped.
* **HTTP payload** — response records wrap an HTTP message: status
  line + headers + body. Chunked transfer-encoding is de-chunked and a
  gzip/deflate ``Content-Encoding`` is inflated (degrading to the raw
  bytes on any error — one corrupt record must not fail a partition).

Spark plumbing: ``binaryFile`` scan → ``mapInPandas`` — parallelism
comes from the FILE COUNT (WARC members are not splittable mid-file;
crawls ship thousands of ~1 GiB files, so a 1000-executor cluster is
saturated by the listing, not by splitting). Records stream out in
Arrow batches; a whole file's records never accumulate in one Python
list beyond the batch being built.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: output schema — parse_pages' exact input columns plus the two HTTP
#: fields a pipeline filters on before parsing
WARC_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
    ]
)

_MAX_HEADER_BYTES = 64 * 1024     # a WARC/HTTP header block beyond this is junk
_MAX_RECORDS_PER_FILE = 1 << 22   # runaway bound, far above real files
#: decompression-bomb ceiling per gzip member / per HTTP body: crawl
#: bytes are untrusted, and a crafted deflate stream inflates ~1000:1 —
#: an unbounded decompress of a few-MB member could allocate GBs on an
#: executor. Past the ceiling the member/body degrades (walk ends with
#: the records decoded so far / body kept raw), the same truncation
#: contract as everywhere else in this module. Real WARC members are one
#: record each (≪ 1 GiB inflated).
_MAX_INFLATED_BYTES = 1 << 30
_INFLATE_CHUNK = 1 << 20


def _iter_gzip_members(data: bytes) -> "Iterator[bytes]":
    """Yield each gzip member's decompressed bytes in order (the
    .warc.gz layout stores one record per member). A corrupt tail ends
    the walk with the members decoded so far; a member inflating past
    ``_MAX_INFLATED_BYTES`` (decompression bomb) ends it too. Inflation
    is chunked (``max_length`` loop) so the ceiling bounds peak memory,
    not just the final size."""
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(47)
        chunks: list[bytes] = []
        total = 0
        src: bytes = rest
        try:
            while True:
                out = d.decompress(src, _INFLATE_CHUNK)
                chunks.append(out)
                total += len(out)
                if total > _MAX_INFLATED_BYTES:
                    return  # bomb: stop the walk, keep prior members
                if d.eof:
                    break
                if not d.unconsumed_tail:
                    # input exhausted mid-member (truncated archive):
                    # yield the partial member, matching the pre-chunked
                    # behavior, then end the walk
                    yield b"".join(chunks)
                    return
                src = d.unconsumed_tail
        except zlib.error:
            return
        yield b"".join(chunks)
        rest = d.unused_data


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated-gzip-member decode; plain bytes pass through
    untouched. (Whole-file form — :func:`parse_warc` itself consumes
    members incrementally to keep peak memory at ~one record.)"""
    if data[:2] != b"\x1f\x8b":
        return data
    return b"".join(_iter_gzip_members(data))


def _parse_headers(block: bytes) -> "dict[str, str]":
    """CRLF header lines → {lower-case name: value} (first wins)."""
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" not in line:
            continue
        name, _, val = line.partition(b":")
        key = name.strip().decode("latin-1").lower()
        if key and key not in headers:
            headers[key] = val.strip().decode("latin-1", "replace")
    return headers


def _dechunk(body: bytes) -> bytes:
    """HTTP/1.1 chunked transfer-encoding → raw bytes. Commits to the
    de-chunked output only when the chunk walk is CONSISTENT (every
    declared chunk fits and ends on a CRLF boundary, terminating at a
    0-size chunk or the body's end) — some WARC writers store the
    already-de-chunked body while preserving the header, and slicing
    such a body by imaginary chunk sizes would corrupt it. Anything
    inconsistent degrades to the raw bytes."""
    out: list[bytes] = []
    i = 0
    terminated = False
    while i < len(body):
        eol = body.find(b"\r\n", i)
        if eol < 0:
            break
        try:
            size = int(body[i:eol].split(b";")[0], 16)
        except ValueError:
            break
        if size == 0:
            terminated = True
            break
        chunk = body[eol + 2 : eol + 2 + size]
        if len(chunk) < size:
            break  # declared chunk overruns the body: not really chunked
        boundary = body[eol + 2 + size : eol + 2 + size + 2]
        if boundary not in (b"\r\n", b""):
            break  # chunk doesn't end on CRLF: not really chunked
        out.append(chunk)
        i = eol + 2 + size + 2
    if terminated or (out and i >= len(body)):
        return b"".join(out)
    return body


def _http_payload(payload: bytes) -> "tuple[int | None, str | None, bytes]":
    """HTTP response message → (status, content_type, body). Non-HTTP
    payloads (resource records) come back as (None, None, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or sep > _MAX_HEADER_BYTES:
        return None, None, payload
    head, body = payload[:sep], payload[sep + 4 :]
    status_line, _, header_block = head.partition(b"\r\n")
    parts = status_line.split(None, 2)
    try:
        status = int(parts[1]) if len(parts) >= 2 else None
    except ValueError:
        status = None
    headers = _parse_headers(header_block)
    ctype = headers.get("content-type")
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").lower()
    if enc in ("gzip", "x-gzip") or (enc == "deflate"):
        try:
            body = _bounded_inflate(body, 47 if enc != "deflate" else -15)
        except zlib.error:
            try:  # some servers send zlib-wrapped "deflate"
                body = _bounded_inflate(body, 15)
            except zlib.error:
                pass  # keep the raw bytes — degrade, don't drop
    return status, ctype, body


def _bounded_inflate(body: bytes, wbits: int) -> bytes:
    """zlib.decompress with the same ``_MAX_INFLATED_BYTES`` ceiling as
    the member walk (untrusted Content-Encoding bodies inflate ~1000:1).
    Matches zlib.decompress semantics otherwise: raises zlib.error on a
    truncated stream (the caller degrades to raw bytes), ignores bytes
    trailing a complete stream."""
    d = zlib.decompressobj(wbits)
    chunks: list[bytes] = []
    total = 0
    src: bytes = body
    while True:
        out = d.decompress(src, _INFLATE_CHUNK)
        chunks.append(out)
        total += len(out)
        if total > _MAX_INFLATED_BYTES:
            raise zlib.error("inflated body exceeds the per-record ceiling")
        if d.eof:
            return b"".join(chunks)
        if not d.unconsumed_tail:
            raise zlib.error("incomplete or truncated stream")
        src = d.unconsumed_tail


def _scan_records(data: bytes, consumed: "list[int]",
                  budget: "list[int]") -> "Iterator[dict]":
    """Complete records in ``data`` → kept-record dicts. ``consumed[0]``
    is set to the offset after the last COMPLETE record (an incomplete
    trailing record stays unconsumed so a caller feeding gzip members
    incrementally can carry it into the next member)."""
    i, n = 0, len(data)
    consumed[0] = n
    while budget[0] > 0:
        budget[0] -= 1
        # seek the next record header (tolerates inter-record padding)
        start = data.find(b"WARC/", i)
        if start < 0:
            consumed[0] = n
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            # header may continue in the next gzip member
            consumed[0] = start if n - start <= _MAX_HEADER_BYTES else n
            return
        if head_end - start > _MAX_HEADER_BYTES:
            consumed[0] = n
            return
        headers = _parse_headers(data[start:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            consumed[0] = n
            return
        if length < 0:
            consumed[0] = n
            return
        if head_end + 4 + length > n:
            consumed[0] = start  # payload continues in the next member
            return
        payload = data[head_end + 4 : head_end + 4 + length]
        i = head_end + 4 + length
        consumed[0] = i
        rtype = headers.get("warc-type", "").lower()
        if rtype not in ("response", "resource"):
            continue
        if rtype == "response":
            status, ctype, body = _http_payload(payload)
            # NO fallback to the WARC envelope Content-Type here: that
            # header describes the ENVELOPE ("application/http; ..."),
            # not the payload — a response without an HTTP Content-Type
            # is honestly NULL
        else:  # resource: the envelope Content-Type IS the payload type
            status, ctype, body = None, headers.get("content-type"), payload
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_ts": headers.get("warc-date"),
            # bytes(): ``data`` may be the carry BYTEARRAY (record spans
            # gzip members) — normalize so downstream Arrow conversion
            # always sees bytes; a no-op (same object) when already bytes
            "html": bytes(body),
            "http_status": status,
            "content_type": ctype,
        }


def parse_warc(data: bytes) -> "Iterator[dict]":
    """WARC bytes (plain or .gz) → dicts of (url, warc_ts, html,
    http_status, content_type), one per kept record. Pure, deterministic,
    and tolerant: truncation or a malformed record ends the walk with
    the records parsed so far. Gzip members decompress INCREMENTALLY —
    a record spanning members is carried over, and peak memory stays at
    ~one member + one record rather than the whole decompressed file
    (a 1 GiB .warc.gz is 4-5 GiB inflated)."""
    consumed, budget = [0], [_MAX_RECORDS_PER_FILE]
    if data[:2] != b"\x1f\x8b":
        yield from _scan_records(data, consumed, budget)
        return
    # the carry buffer is a bytearray trimmed in place (del buf[:consumed])
    # — rebuilding it with ``buf = buf + member`` copied the whole carry
    # once per member, O(k²) bytes when one record spans k gzip members
    # (ADVICE r8); the common one-record-per-member file keeps the carry
    # empty and scans each member directly, no copy at all
    buf = bytearray()
    for member in _iter_gzip_members(data):
        if buf:
            buf += member
            yield from _scan_records(buf, consumed, budget)
            if budget[0] <= 0:
                return
            del buf[: consumed[0]]
        else:
            yield from _scan_records(member, consumed, budget)
            if budget[0] <= 0:
                return
            if consumed[0] < len(member):
                buf += member[consumed[0] :]


def warc_pages(
    spark: SparkSession,
    path: str,
    keep_status: "tuple[int, ...] | None" = (200,),
    batch_rows: int = 256,
    stream: bool = False,
) -> DataFrame:
    """WARC file(s) at ``path`` (glob ok; plain or .gz) → DataFrame in
    the parse stage's input shape ``(url, warc_ts, lang, html)`` plus
    ``(http_status, content_type)`` for upstream filtering. ``lang`` is
    NULL — real crawls don't know it until text analysis
    (:func:`textstats.profile`). ``keep_status`` drops non-200 responses
    JVM-side after the scan (resource records have NULL status and are
    kept); pass None to keep everything.

    ``stream=True`` returns the STREAMING twin: ``readStream`` over the
    same binaryFile source (fixed schema, so no inference needed), every
    transformation unchanged — a crawler landing ``.warc.gz`` files into
    a directory becomes a Structured Streaming source with the file
    checkpoint deciding exactly-once which archives each micro-batch
    sees (:func:`streaming.kg_ingest.ingest_available`)."""

    # binaryFile rows cap at 2 GiB (Int.MaxValue); one oversized plain
    # .warc would otherwise throw and fail the JOB, not the record —
    # filter those files out JVM-side (store such archives gzipped, or
    # split them; the skip is the documented degrade)
    _MAX_FILE = (1 << 31) - 1

    def _records(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        cols = ["url", "warc_ts", "html", "http_status", "content_type"]

        def flush(buf: "list[dict]") -> pd.DataFrame:
            out = pd.DataFrame(buf, columns=cols)
            out["warc_ts"] = pd.to_datetime(
                out["warc_ts"], errors="coerce", utc=True, format="ISO8601"
            )
            out["http_status"] = out["http_status"].astype("Int32")
            out["lang"] = pd.Series([None] * len(out), dtype=object)
            return out[["url", "warc_ts", "lang", "html",
                        "http_status", "content_type"]]

        for b in batches:
            buf: list[dict] = []
            for content in b["content"]:
                for rec in parse_warc(bytes(content)):
                    buf.append(rec)
                    if len(buf) >= batch_rows:
                        yield flush(buf)
                        buf = []
            if buf:
                yield flush(buf)

    reader = spark.readStream if stream else spark.read
    if stream:
        # streaming file sources require an explicit schema; binaryFile's
        # is fixed by the format
        reader = reader.schema(
            "path STRING, modificationTime TIMESTAMP, "
            "length LONG, content BINARY"
        )
    raw = (
        reader.format("binaryFile")
        .load(path)
        .filter(F.col("length") < _MAX_FILE)
        .select("content")
    )
    df = raw.mapInPandas(_records, schema=WARC_PAGES_SCHEMA)
    if keep_status is not None:
        df = df.filter(
            F.col("http_status").isNull()
            | F.col("http_status").isin(list(keep_status))
        )
    return df
