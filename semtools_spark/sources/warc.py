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


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated-gzip-member decode (the .warc.gz layout); plain
    bytes pass through untouched. A corrupt tail keeps the members
    decoded so far."""
    if data[:2] != b"\x1f\x8b":
        return data
    out: list[bytes] = []
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(47)
        try:
            out.append(d.decompress(rest))
        except zlib.error:
            break
        if not d.eof:
            break
        rest = d.unused_data
    return b"".join(out)


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
    """HTTP/1.1 chunked transfer-encoding → raw bytes (best-effort)."""
    out: list[bytes] = []
    i = 0
    while i < len(body):
        eol = body.find(b"\r\n", i)
        if eol < 0:
            break
        try:
            size = int(body[i:eol].split(b";")[0], 16)
        except ValueError:
            break
        if size == 0:
            break
        out.append(body[eol + 2 : eol + 2 + size])
        i = eol + 2 + size + 2  # chunk + its trailing CRLF
    return b"".join(out) if out else body


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
            body = zlib.decompress(body, 47 if enc != "deflate" else -15)
        except zlib.error:
            try:  # some servers send zlib-wrapped "deflate"
                body = zlib.decompress(body, 15)
            except zlib.error:
                pass  # keep the raw bytes — degrade, don't drop
    return status, ctype, body


def parse_warc(data: bytes) -> "Iterator[dict]":
    """WARC bytes (plain or .gz) → dicts of (url, warc_ts, html,
    http_status, content_type), one per kept record. Pure, deterministic,
    and tolerant: truncation or a malformed record ends the walk with
    the records parsed so far."""
    data = _gunzip_members(data)
    i, n = 0, len(data)
    for _ in range(_MAX_RECORDS_PER_FILE):
        # seek the next record header (tolerates inter-record padding)
        start = data.find(b"WARC/", i)
        if start < 0:
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0 or head_end - start > _MAX_HEADER_BYTES:
            return
        headers = _parse_headers(data[start:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        if length < 0 or head_end + 4 + length > n:
            return
        payload = data[head_end + 4 : head_end + 4 + length]
        i = head_end + 4 + length
        rtype = headers.get("warc-type", "").lower()
        if rtype not in ("response", "resource"):
            continue
        status, ctype, body = (
            _http_payload(payload) if rtype == "response" else (None, None, payload)
        )
        if ctype is None:
            ctype = headers.get("content-type")
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_ts": headers.get("warc-date"),
            "html": body,
            "http_status": status,
            "content_type": ctype,
        }


def warc_pages(
    spark: SparkSession,
    path: str,
    keep_status: "tuple[int, ...] | None" = (200,),
    batch_rows: int = 256,
) -> DataFrame:
    """WARC file(s) at ``path`` (glob ok; plain or .gz) → DataFrame in
    the parse stage's input shape ``(url, warc_ts, lang, html)`` plus
    ``(http_status, content_type)`` for upstream filtering. ``lang`` is
    NULL — real crawls don't know it until text analysis
    (:func:`textstats.profile`). ``keep_status`` drops non-200 responses
    JVM-side after the scan (resource records have NULL status and are
    kept); pass None to keep everything."""

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

    raw = spark.read.format("binaryFile").load(path).select("content")
    df = raw.mapInPandas(_records, schema=WARC_PAGES_SCHEMA)
    if keep_status is not None:
        df = df.filter(
            F.col("http_status").isNull()
            | F.col("http_status").isin(list(keep_status))
        )
    return df
