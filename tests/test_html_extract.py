"""Real-HTML extractor (VERDICT r4 next #3): the pluggable parse slot
ships a public-literature text-density extractor, exercised on committed
real-world-shaped HTML fixtures — boilerplate (nav/footer/sidebar/menu)
dropped, article prose kept, byte-identical through the Spark UDF path.
The PINNED default extractor is untouched (its byte-identity corpus
fixtures are covered by test_webpipeline.py)."""

from __future__ import annotations

import os

import pytest

from semtools_spark.operators.html_extract import extract_main_text

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "html")


def _read(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


def test_article_keeps_prose_drops_chrome():
    out = extract_main_text(_read("article.html"))
    # body prose, heading and caption all present
    assert "Why distributed joins shuffle, and when they don't" in out
    assert "a broadcast join ships the small table to every executor" in out
    assert "Shuffle bytes by join strategy" in out  # figcaption via smoothing
    # nav menu, sidebar link list, footer chrome all dropped
    for boiler in ("Subscribe", "Trending", "Ten gadgets", "All rights reserved",
                   "Privacy"):
        assert boiler not in out
    # script/style content never leaks
    assert "dataLayer" not in out and "display: flex" not in out


def test_blog_div_soup_and_docs_page():
    blog = extract_main_text(_read("blog.html"))
    assert "incremental view maintenance" in blog
    assert "watermarks are just a promise" in blog
    for boiler in ("archive", "rss", "#databases", "impressum"):
        assert boiler not in blog

    docs = extract_main_text(_read("docs.html"))
    assert "open(path, mode)" in docs          # short h1 rescued by adjacency
    assert "Errors" in docs                    # short h2 rescued
    assert "reference counted" in docs
    for boiler in ("On this page", "Built with docgen", "Edit this page",
                   "Docs > IO"):
        assert boiler not in docs


def test_extractor_is_total_and_deterministic():
    assert extract_main_text(b"") == ""
    assert extract_main_text(b"<p>no closing tags<div><<<&&&") is not None
    assert extract_main_text(b"\xff\xfe garbage \x00 bytes") is not None
    page = _read("article.html")
    assert extract_main_text(page) == extract_main_text(page)


def test_html_extractor_through_spark_parse_slot(spark):
    """The extractor rides the existing pluggable slot: parse_pages output
    equals the pure function byte-for-byte per url (the determinism that
    the parse cache's fingerprint/resume contract requires)."""
    from pyspark.sql import functions as F

    from semtools_spark.operators.parse import parse_pages

    rows = [
        (f"http://site{i}/{name}", 1000 + i, _read(name), "en")
        for i, name in enumerate(["article.html", "blog.html", "docs.html"])
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts long, html binary, lang string"
    )
    got = {
        r.url: r.text
        for r in parse_pages(pages, extractor=extract_main_text).collect()
    }
    want = {url: extract_main_text(html) for url, _ts, html, _l in rows}
    assert got == want
    assert all("Subscribe" not in t for t in got.values())
