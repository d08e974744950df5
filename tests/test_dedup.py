"""Dedup hot-key guards: document-frequency cap on shingles, bucket-size
cap on LSH bands (VERDICT r1 'What's wrong' #6 — a stop-word shingle or a
degenerate band signature is an unbounded hot key at web scale)."""

from __future__ import annotations

import pytest

from semtools_spark.operators import dedup

# 30 docs sharing one boilerplate prefix (a planted hot shingle region);
# each doc also has unique content, plus one true near-dup pair (40, 41)
BOILER = "copyright footer legal notice all rights reserved"


@pytest.fixture(scope="module")
def hot_docs(spark):
    rows = [
        (i, "en", "web", f"{BOILER} unique{i} payload{i} tail{i} words{i} more{i}")
        for i in range(30)
    ]
    rows.append((40, "en", "web", "spark join vector window table scan merge filter"))
    rows.append((41, "en", "web", "spark join vector window table scan merge sort"))
    return spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")


def test_shingle_df_cap_bounds_boilerplate_pairs(spark, hot_docs):
    """Uncapped, the 30 boilerplate docs all pair through the shared
    shingles (O(df²) = 435 pairs). With df ≤ 5 the boilerplate shingles
    are dropped and only the true near-dup pair survives."""
    uncapped = dedup.ngram_jaccard_pairs(
        hot_docs, min_jaccard_micro=1, max_shingle_df=None
    )
    n_uncapped = uncapped.count()
    assert n_uncapped >= 435  # every boilerplate pair forms

    capped = dedup.ngram_jaccard_pairs(
        hot_docs, min_jaccard_micro=1, max_shingle_df=5
    ).collect()
    got = {(r.a, r.b) for r in capped}
    assert (40, 41) in got  # true near-dup survives the cap
    assert len(got) < 40    # boilerplate blowup suppressed


def test_shingle_df_cap_keeps_jaccard_consistent(spark, hot_docs):
    """Under the cap, uni = |A'|+|B'|−inter over the FILTERED universe —
    inter can never exceed either filtered set size."""
    rows = dedup.ngram_jaccard_pairs(
        hot_docs, min_jaccard_micro=1, max_shingle_df=5
    ).collect()
    for r in rows:
        assert 0 < r.inter <= r.uni
        assert 0 < r.jac_micro <= 1_000_000


def test_min_jaccard_micro_must_be_positive(spark, hot_docs):
    with pytest.raises(ValueError, match="min_jaccard_micro"):
        dedup.ngram_jaccard_pairs(hot_docs, min_jaccard_micro=0)


def test_lsh_bucket_cap_drops_degenerate_buckets(spark):
    """A boilerplate cluster collapsing into one band bucket is capped;
    pairs from small (informative) buckets survive."""
    base = "spark join vector window table scan merge filter sort group key"
    rows = [(i, f"{BOILER} {BOILER} again {BOILER}") for i in range(20)]
    rows += [(100, base), (101, base + " extra")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {(r.a, r.b) for r in
                dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=4).collect()}
    assert (100, 101) in uncapped
    assert len(uncapped) > 150  # 20 identical boilerplate docs ⇒ ~190 pairs

    capped = {(r.a, r.b) for r in
              dedup.minhash_lsh_pairs(
                  docs, num_hashes=8, bands=4, max_bucket_size=5
              ).collect()}
    assert (100, 101) in capped          # true pair's buckets are tiny
    assert all(a >= 100 for a, _ in capped)  # boilerplate bucket suppressed


def test_lsh_invalid_band_split_raises(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divisible"):
        dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=3)


def test_near_dup_groups_transitive(spark):
    """A≈B and B≈C collapse into one group even if A and C never collide
    directly; the group id is the min doc id."""
    base = "spark join vector window table scan merge filter sort group key"
    docs = spark.createDataFrame(
        [
            (10, base + " aaa bbb"),
            (11, base + " aaa ccc"),      # pairs with 10
            (12, base + " ddd ccc eee"),  # pairs with 11 (maybe not 10)
            (99, "totally different content with nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    groups = {r.doc_id: r.group_id for r in
              dedup.near_dup_groups(docs, num_hashes=8, bands=4).collect()}
    assert groups.get(10) == groups.get(11) == 10
    assert 99 not in groups  # no candidate pair → own group by definition


def test_embedding_near_dups_block_cap(spark):
    """Oversized blocks are dropped whole (the O(n²) hot-key guard);
    small blocks still pair."""
    import numpy as np

    rng = np.random.default_rng(3)
    v = [float(x) for x in rng.standard_normal(8)]
    rows = [(i, 0, v) for i in range(20)]          # hot block: 20 identical
    rows += [(100, 1, v), (101, 1, v)]             # small block: 1 pair
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    uncapped = dedup.embedding_near_dups(emb, max_distance=0.5)
    assert uncapped.count() == 190 + 1
    capped = dedup.embedding_near_dups(emb, max_distance=0.5, max_block_size=5)
    assert {(r.a, r.b) for r in capped.collect()} == {(100, 101)}


def test_near_dup_groups_string_ids(spark):
    """String doc ids (urls — the web corpus's natural key) cluster
    through the hash-mapped CC path; group_id is the MIN original id of
    each cluster, matching the numeric path's survivor contract."""
    from semtools_spark.operators.dedup import near_dup_groups

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        ("http://a/1", base),
        ("http://a/2", base),                       # exact dup of /1
        ("http://b/9", base + " lambda"),           # near dup
        ("http://c/5", "totally different words here nothing shared xyz"),
    ]
    docs = spark.createDataFrame(rows, "url string, text string")
    got = {r.url: r.group_id for r in
           near_dup_groups(docs, id_col="url", num_hashes=8, bands=4).collect()}
    # the three near-dups cluster under the lexicographic min id
    assert got["http://a/1"] == got["http://a/2"] == "http://a/1"
    assert got.get("http://b/9") == "http://a/1"
    # the unrelated doc either forms no pair (absent) or its own group
    assert got.get("http://c/5", "http://c/5") == "http://c/5"


def test_jaccard_verify_pairs_agrees_with_enumeration(spark):
    """jaccard_verify_pairs (score a GIVEN pair list via endpoint joins)
    must agree exactly with ngram_jaccard_pairs' enumeration on the pairs
    the latter produces — same integer (inter, uni, jac_micro)."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g", "en", "s1"),
            (2, "a b c d e f h", "en", "s1"),
            (3, "a b c x y z w", "en", "s1"),
            (4, "q r s t u v w", "en", "s1"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    enumerated = {
        (r.a, r.b): (r.inter, r.uni, r.jac_micro)
        for r in dedup.ngram_jaccard_pairs(docs, max_shingle_df=None).collect()
    }
    assert enumerated, "precondition: overlapping pairs exist"
    pairs = spark.createDataFrame(list(enumerated), ["a", "b"])
    verified = {
        (r.a, r.b): (r.inter, r.uni, r.jac_micro)
        for r in dedup.jaccard_verify_pairs(docs, pairs).collect()
    }
    assert verified == enumerated


def test_jaccard_verify_pairs_strict_raises_on_unresolved(spark):
    """strict=True surfaces pair endpoints absent from docs (the default
    inner-join silently drops them — fine for pairs generated from the
    same docs, a silent hole for externally supplied lists)."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (1, 99)], ["a", "b"])
    # default: the unresolved pair is silently absent
    assert {(r.a, r.b) for r in dedup.jaccard_verify_pairs(docs, pairs).collect()} == {(1, 2)}
    with pytest.raises(ValueError, match="99"):
        dedup.jaccard_verify_pairs(docs, pairs, strict=True).collect()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_hot_key_caps_have_no_window_node(spark, hot_docs):
    """VERDICT r4 'wrong' #2: the three hot-key caps must be groupBy +
    anti-join-back (map-side partial agg), never a count window — the
    window funnels the entire hot bucket through ONE shuffle partition to
    sort-and-count it, making the guard the bottleneck it guards against.
    Assert the Window operator is gone from all three dataflows."""
    jac = dedup.ngram_jaccard_pairs(hot_docs, max_shingle_df=5)
    assert "Window" not in _optimized_plan(jac)

    lsh = dedup.minhash_lsh_pairs(hot_docs, num_hashes=8, bands=4, max_bucket_size=10)
    assert "Window" not in _optimized_plan(lsh)

    emb = spark.createDataFrame(
        [(i, "b0", [1.0, 0.0, 0.0, float(i % 3)]) for i in range(6)],
        "vec_id long, label string, embedding array<double>",
    )
    nd = dedup.embedding_near_dups(emb, max_block_size=5)
    assert "Window" not in _optimized_plan(nd)


def test_hot_key_caps_same_output_as_window_semantics(spark, hot_docs):
    """The rewrite must be output-identical to the window form: keys with
    count <= cap keep ALL their rows, keys above lose all of them."""
    jac_capped = {
        (r.a, r.b) for r in dedup.ngram_jaccard_pairs(hot_docs, max_shingle_df=5).collect()
    }
    assert jac_capped == {(40, 41)}
    # cap high enough to keep everything -> identical to uncapped
    all_pairs = {
        (r.a, r.b)
        for r in dedup.ngram_jaccard_pairs(hot_docs, max_shingle_df=10_000).collect()
    }
    uncapped = {
        (r.a, r.b) for r in dedup.ngram_jaccard_pairs(hot_docs, max_shingle_df=None).collect()
    }
    assert all_pairs == uncapped
