"""Search pipeline semantics, mirroring the reference's 11 in-module tests
(src/search/mod.rs:218-464): ascending order, threshold-vs-topk exclusivity,
context size and boundary clamping, multi-doc coverage, empty corpus,
case-insensitive embed with original lines preserved."""

import pytest
from pyspark.sql import functions as F

from semtools_spark.operators import search as S

DOCS = [
    (0, "alpha beta\ngamma delta\nspark join vector\nepsilon zeta\nomega"),
    (1, "spark join vector\nunrelated words here"),
    (2, ""),  # dropped (search/mod.rs:57-59)
    (3, "SPARK JOIN VECTOR"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_split_lines_drops_empty_and_is_zero_based(spark, docs):
    lines = S.split_lines(docs).collect()
    by_doc = {}
    for r in lines:
        by_doc.setdefault(r.doc, []).append((r.line_no, r.line))
    assert 2 not in by_doc
    assert by_doc[0][0] == (0, "alpha beta")
    assert by_doc[0][4] == (4, "omega")


def test_topk_ascending_and_exact_match_first(spark, docs):
    res = S.search(docs, "spark join vector", top_k=3, n_lines=0).collect()
    assert len(res) == 3
    dists = [r.distance for r in res]
    assert dists == sorted(dists)
    # two exact-text lines (docs 0 and 1) must be the nearest
    assert {(r.doc, r.match_line) for r in res[:2]} == {(0, 2), (1, 0)}
    assert res[0].distance < 1e-6


def test_threshold_mode_ignores_topk(spark, docs):
    # max_distance set ⇒ ALL under threshold, top_k ignored (mod.rs:113-119)
    res = S.search(docs, "spark join vector", top_k=1, max_distance=1.5, n_lines=0)
    assert res.count() > 1


def test_threshold_filters(spark, docs):
    res = S.search(docs, "spark join vector", max_distance=1e-6, n_lines=0).collect()
    # exactly the two verbatim lines (doc 0 line 2, doc 1 line 0) pass
    assert {(r.doc, r.match_line) for r in res} == {(0, 2), (1, 0)}


def test_context_window_clamps_at_boundaries(spark, docs):
    res = S.search(docs, "spark join vector", top_k=1, n_lines=2).collect()[0]
    # match at doc 0 line 2, window [0, 5) — full doc, clamped
    assert (res.start, res.end, res.match_line) == (0, 5, 2)
    assert res.content.split("\n") == [
        "alpha beta", "gamma delta", "spark join vector", "epsilon zeta", "omega",
    ]


def test_context_window_clamps_at_start(spark, docs):
    res = S.search(docs, "unrelated words here", top_k=1, n_lines=3).collect()[0]
    assert (res.doc, res.start, res.end, res.match_line) == (1, 0, 2, 1)


def test_case_insensitive_embeds_lower_but_returns_original(spark, docs):
    res = S.search(docs, "SPARK JOIN VECTOR", top_k=3, n_lines=0, ignore_case=True)
    rows = res.collect()
    # docs 0/1/3 all tie at distance 0 under case folding
    assert [r.distance < 1e-6 for r in rows] == [True, True, True]
    d3 = [r for r in rows if r.doc == 3][0]
    assert d3.content == "SPARK JOIN VECTOR"  # original casing preserved (S2)


def test_empty_corpus_returns_empty(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert S.search(empty, "anything", top_k=3).count() == 0


def test_deterministic_tiebreak(spark, docs):
    a = S.search(docs, "spark join vector", top_k=3, n_lines=1).collect()
    b = S.search(docs, "spark join vector", top_k=3, n_lines=1).collect()
    assert a == b


def test_grep_literal_and_case(spark, docs):
    assert S.grep(docs, "spark join").count() == 2
    assert S.grep(docs, "spark join", ignore_case=True).count() == 3
    assert S.grep(docs, "a.b", literal=True).count() == 0  # escaped dot


def test_read_range_clamps_end(spark, docs):
    r = S.read_range(docs, 0, 3, 99).collect()[0]
    assert (r.start, r.end) == (3, 5)
    assert r.content == "epsilon zeta\nomega"


def test_search_on_testdata_documents(documents):
    res = S.search(documents, "spark join vector", top_k=5, n_lines=0)
    rows = res.collect()
    assert len(rows) == 5
    assert all(rows[i].distance <= rows[i + 1].distance for i in range(4))


def test_search_embeddings_topk(spark, embeddings):
    import numpy as np

    qrow = embeddings.orderBy("vec_id").first()
    q = np.asarray(qrow.embedding)
    res = S.search_embeddings(embeddings, q, top_k=3).collect()
    assert res[0].vec_id == qrow.vec_id and res[0].distance < 1e-9
    assert len(res) == 3


def test_score_plan_has_no_context_shuffle_on_corpus(spark, docs):
    # top-k compiles to TakeOrderedAndProject (partial top-k, no full sort)
    lines = S.split_lines(docs)
    scored = S.score_lines(lines, "q").orderBy("distance").limit(3)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
