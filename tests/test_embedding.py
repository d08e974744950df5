"""Embedder invariants mirrored from the reference's search tests
(src/search/mod.rs:218-464): determinism, parallel-array invariant,
case-fold behavior, empty-content drop, token cap."""

import numpy as np

from semtools_spark.embedding import MAX_TOKENS, HashEmbedder


def test_deterministic_across_instances():
    a = HashEmbedder(dim=64).embed_one("spark join vector")
    b = HashEmbedder(dim=64).embed_one("spark join vector")
    assert np.array_equal(a, b)


def test_normalized_nonzero():
    v = HashEmbedder(dim=64).embed_one("hello world")
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_empty_text_zero_vector():
    emb = HashEmbedder(dim=64)
    assert not emb.embed_one("").any()
    assert not emb.embed_one("   ").any()


def test_case_fold_changes_embedding_only_when_requested():
    emb = HashEmbedder(dim=64)
    assert not np.array_equal(emb.embed_one("Spark"), emb.embed_one("spark"))
    assert np.array_equal(
        emb.embed_one("Spark", lowercase=True), emb.embed_one("spark")
    )


def test_token_cap():
    emb = HashEmbedder(dim=32)
    base = " ".join(["tok"] * MAX_TOKENS)
    extra = base + " " + " ".join(["zzz"] * 10)
    # tokens past the 2048 cap must not affect the embedding (search/mod.rs:69)
    assert np.array_equal(emb.embed_one(base), emb.embed_one(extra))


def test_similarity_orders_sensibly():
    emb = HashEmbedder(dim=128)
    q = emb.embed_one("spark join")
    same = emb.embed_one("spark join")
    overlap = emb.embed_one("spark filter")
    disjoint = emb.embed_one("banana apple")
    d = lambda v: 1.0 - float(q @ v)  # noqa: E731
    assert d(same) < 1e-6
    assert d(same) < d(overlap) < d(disjoint)


def test_batch_matches_single():
    emb = HashEmbedder(dim=64)
    texts = ["a b c", "", "spark", "x " * 10]
    mat = emb.embed_texts(texts)
    for i, t in enumerate(texts):
        assert np.array_equal(mat[i], HashEmbedder(dim=64).embed_one(t))


def test_batch_equals_single_property():
    """Property: for ANY batch of random texts, the vectorized batch path
    is bit-identical to embedding each text alone with a fresh embedder —
    the invariant that keeps the Spark UDF path, the driver-side query
    embed, and the pure-Python oracles interchangeable."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    token = st.text(alphabet="abcXYZ019", min_size=1, max_size=6)
    text = st.lists(token, min_size=0, max_size=40).map(" ".join)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(text, min_size=1, max_size=8))
    def run(texts):
        emb = HashEmbedder(dim=32)
        mat = emb.embed_texts(texts)
        for i, t in enumerate(texts):
            assert np.array_equal(mat[i], HashEmbedder(dim=32).embed_one(t))

    run()
