"""Deterministic Common-Crawl-style web-page corpus.

Exact input_hint schema (BASELINE.json):
    web_pages(url: string, warc_ts: timestamp, html: binary,
              text: string, lang: string)

Every page is a pure function of ``(page_id, seed)`` — a Philox counter
RNG keyed per page — so the corpus is identical regardless of scale,
partitioning, executor count, or generation order. ``html`` is a
deterministic rendering of ``text`` (HTML-escaped paragraphs wrapped in
``<p>`` plus boilerplate nav/script/footer the extractor must drop), so
the parse stage's byte-identity invariant ``extract(html) == text`` is
checkable per url.

Realism knobs that matter at scale:
  * **head-domain skew**: ~30% of pages land on one domain (Zipf-ish
    head), so anything that shuffles on domain exercises AQE skew-join.
  * **passthrough files**: ~1/8 of urls end in ``.txt`` (the reference's
    extension passthrough, src/parse/cache.rs:24-53) — their ``html``
    column holds the raw text bytes, no markup.
  * **empty pages**: ~1% have empty text (reference drops empty docs,
    src/search/mod.rs:57-59).
  * **escapable characters**: some words contain ``& < >`` so the
    escape/unescape round-trip is actually exercised.

Generation is distributed: ``spark.range(n) → mapInPandas`` — each Arrow
batch of page ids is materialized with NumPy-seeded vocab draws, no
driver-side loop, no collect.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from semtools_spark.operators.kg import ENTITIES, RELATIONS

DEFAULT_SEED = 42
BASE_TS = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)
N_DOMAINS = 50
HEAD_DOMAIN_SHARE = 0.30  # fraction of pages on domain 0 (skew head)
LANGS = ("en", "de", "fr", "es", "pt")
LANG_WEIGHTS = (0.62, 0.12, 0.10, 0.09, 0.07)

# filler vocabulary; a few words carry &, <, > to exercise HTML escaping
FILLER = (
    "the", "a", "of", "and", "to", "in", "web", "page", "crawl", "archive",
    "site", "index", "content", "link", "title", "cache&hit", "a<b", "x>y",
    "node", "graph", "text", "model", "token", "shard",
)
VOCAB = tuple(ENTITIES) + tuple(RELATIONS) + FILLER

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def render_html(text: str, title: str, domain: str) -> bytes:
    """Deterministic HTML rendering of a page: escaped ``<p>`` paragraphs
    plus boilerplate (script/nav/footer) that extraction must drop."""
    paras = [p for p in text.split("\n\n") if p] if text else []
    body = "\n".join(f"<p>{_escape(p)}</p>" for p in paras)
    return (
        "<html><head><title>{t}</title>"
        "<script>var q=1&&2;</script><style>p{{margin:0}}</style></head>\n"
        "<body><nav><a href=\"/\">home</a> &gt; index</nav>\n"
        "{b}\n"
        "<footer>&copy; {d}</footer></body></html>"
    ).format(t=_escape(title), b=body, d=domain).encode("utf-8")


def make_page(
    i: int,
    seed: int = DEFAULT_SEED,
    max_paras: int = 4,
    max_extra_words: int = 33,
) -> dict:
    """Pure page function — the single source of truth shared by the Spark
    generator, the fixture tool, and the tests.

    ``max_paras``/``max_extra_words`` size the page (defaults match the
    committed fixtures; the scaling bench uses heavier pages ~500 words,
    the realistic Common-Crawl page weight)."""
    rng = np.random.Generator(np.random.Philox(key=[seed, i]))
    r_dom = rng.random()
    if r_dom < HEAD_DOMAIN_SHARE:
        dom_idx = 0
    else:
        dom_idx = 1 + int(rng.integers(0, N_DOMAINS - 1))
    domain = f"site{dom_idx}.example.com"
    lang = str(rng.choice(LANGS, p=LANG_WEIGHTS))
    ext = ".txt" if i % 8 == 3 else ".html"
    url = f"https://{domain}/p/{i:08d}{ext}"
    ts = BASE_TS + _dt.timedelta(seconds=int(i))

    if i % 97 == 0:
        text = ""
    else:
        n_paras = 1 + int(rng.integers(0, max_paras))
        paras = []
        for _ in range(n_paras):
            n_words = 8 + int(rng.integers(0, max_extra_words))
            words = rng.choice(VOCAB, size=n_words)
            paras.append(" ".join(words))
        text = "\n\n".join(paras)

    if ext == ".txt":
        html = text.encode("utf-8")  # passthrough: raw readable bytes
    else:
        html = render_html(text, title=f"page {i}", domain=domain)
    return {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}


def generate_web_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = DEFAULT_SEED,
    num_partitions: int | None = None,
    max_paras: int = 4,
    max_extra_words: int = 33,
) -> DataFrame:
    """Distributed deterministic corpus: ``spark.range → mapInPandas``.

    Default partitioning is 4× parallelism so downstream scans get several
    task waves per core (one-file-per-core gives the slowest task the wall
    clock; finer grain load-balances and scales past one wave)."""
    if num_partitions is None:
        num_partitions = max(16, 4 * spark.sparkContext.defaultParallelism)
    ids = spark.range(0, n_pages, numPartitions=num_partitions)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                make_page(int(i), seed, max_paras, max_extra_words)
                for i in b["id"]
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in SCHEMA.fields])

    return ids.mapInPandas(_gen, schema=SCHEMA)


def write_web_pages(
    spark: SparkSession,
    path: str,
    n_pages: int,
    seed: int = DEFAULT_SEED,
    max_paras: int = 4,
    max_extra_words: int = 33,
) -> str:
    """Materialize the corpus as parquet (the Iceberg stand-in locally)."""
    generate_web_pages(
        spark, n_pages, seed, max_paras=max_paras, max_extra_words=max_extra_words
    ).write.mode("overwrite").parquet(path)
    return path
