"""Text-analysis operators: crafted-document pins for the repetition
signals (Gopher §A1.1 / RefinedWeb-style within-doc duplication rules)
added in round 6 — the sf-corpus word soup exercises them statistically
via the text_profile gate; these pins check the arithmetic exactly."""

from __future__ import annotations

from semtools_spark.operators import textstats as TS


def _profile_one(spark, text: str) -> dict:
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = TS.profile(df).first()
    return r.asDict()


def test_repetition_signals_on_crafted_docs(spark):
    # all-distinct tokens: zero duplication everywhere, top token = 1/n
    r = _profile_one(spark, "alpha beta gamma delta")
    assert r["dup_token_milli"] == 0
    assert r["top_token_milli"] == 250  # 1/4
    assert r["dup_bigram_milli"] == 0

    # one token repeated to 100%: "spam spam spam spam"
    r = _profile_one(spark, "spam spam spam spam")
    assert r["dup_token_milli"] == 750   # 3 of 4 repeat an earlier token
    assert r["top_token_milli"] == 1000  # every token is the mode
    assert r["dup_bigram_milli"] == 666  # 2 of 3 bigrams repeat

    # templated spin: bigrams repeat though token-level dup is moderate
    r = _profile_one(spark, "buy now buy now buy now")
    assert r["dup_token_milli"] == 666   # 4 of 6
    assert r["top_token_milli"] == 500   # 3 of 6
    assert r["dup_bigram_milli"] == 600  # 5 bigrams, 2 distinct -> 3/5

    # degenerate inputs never divide by zero
    assert _profile_one(spark, "")["dup_token_milli"] == 0
    assert _profile_one(spark, "")["top_token_milli"] == 0
    one = _profile_one(spark, "solo")
    assert one["dup_bigram_milli"] == 0 and one["top_token_milli"] == 1000


def test_filter_training_docs_composition(spark):
    """The one-pass Gopher-style keep filter: each rule independently
    rejects its crafted offender; a normal document survives; the plan
    is map-only (no Exchange — the 100 TB shape is a pure scan)."""
    good = "the quick brown fox jumps over the lazy dog near a quiet river bank today"
    docs = spark.createDataFrame(
        [
            (1, good),                                   # survives
            (2, "too short"),                            # min_tokens
            (3, " ".join(["spam"] * 40)),                # top-token + dup caps
            (4, " ".join(["buy now"] * 20)),             # dup-bigram cap
            (5, " ".join(f"w{i}" for i in range(40))),   # quality floor (alpha ratio)
        ],
        ["doc_id", "text"],
    )
    kept = [
        r.doc_id
        for r in TS.filter_training_docs(docs, min_quality_milli=400)
        .select("doc_id")
        .collect()
    ]
    assert kept == [1], kept
    plan = (
        TS.filter_training_docs(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_filter_matches_profiled_keep_column(spark):
    """filter_training_docs and profile()'s keep_default column share ONE
    predicate (training_keep_expr) — the set the filter keeps is exactly
    the keep_default=1 subset, and the DuckDB oracle expression
    (training_keep_sql_duckdb, hash-gated corpus-wide via text_profile)
    agrees on crafted edge docs."""
    import duckdb

    texts = [
        "the quick brown fox jumps over the lazy dog near a quiet river bank today",
        "too short",
        " ".join(["spam"] * 40),
        " ".join(["buy now"] * 20),
        "",
        "solo " * 15,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    kept = {r.doc_id for r in TS.filter_training_docs(df).select("doc_id").collect()}
    flagged = {
        r.doc_id
        for r in TS.profile(df).filter("keep_default = 1").select("doc_id").collect()
    }
    assert kept == flagged
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") t(doc_id, text)"
    )
    oracle = {
        row[0]
        for row in con.execute(
            f"SELECT doc_id FROM documents WHERE "
            f"{TS.training_keep_sql_duckdb('text')} = 1"
        ).fetchall()
    }
    assert kept == oracle


def test_repetition_signals_match_duckdb_on_crafted_docs(spark):
    """The same crafted docs through BOTH engines' expressions — the
    sf-corpus gate proves statistical parity; this proves it on the
    adversarial edge shapes (empty, single token, full repetition)."""
    import duckdb

    texts = [
        "", "solo", "a a", "a b a b a", "the the the quick quick",
        "x y z x y z x y", "one two three four five",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.dup_token_milli, r.top_token_milli, r.dup_bigram_milli)
        for r in TS.profile(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
                + ") t(doc_id, text)")
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in con.execute(
            f"SELECT doc_id, {TS.dup_token_frac_sql_duckdb('text')}, "
            f"{TS.top_token_frac_sql_duckdb('text')}, "
            f"{TS.dup_bigram_frac_sql_duckdb('text')} FROM documents"
        ).fetchall()
    }
    assert got == want


def test_keep_default_is_zero_not_null_for_null_text(spark):
    """Code-review r7: NULL text makes the Spark keep-predicate NULL
    while the DuckDB oracle's CASE WHEN yields 0 — profile() must record
    0 (drop), matching both the oracle and filter_training_docs (whose
    filter drops NULL predicates)."""
    df = spark.createDataFrame(
        [(1, None), (2, "the quick brown fox jumps over the lazy dog near a river today")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.keep_default for r in TS.profile(df).collect()}
    assert rows[1] == 0 and rows[1] is not None
    kept = {r.doc_id for r in TS.filter_training_docs(df).select("doc_id").collect()}
    assert 1 not in kept


def test_profile_two_projection_plan_property(spark):
    """VERDICT r7 #2: profile()'s whole point is a PLAN property — each
    expensive repetition signal is evaluated ONCE per row, with
    keep_default derived from the computed signal COLUMNS in a separate
    outer projection. Pin it in the optimized plan: if CollapseProject
    ever merges the two projects (re-deriving every signal inside the
    keep predicate, the +33% regression the r7 A/B caught), the signal
    expressions duplicate and these counts break."""
    df = spark.createDataFrame(
        [(1, "some text to profile")], "doc_id long, text string"
    )
    plan = TS.profile(df)._jdf.queryExecution().optimizedPlan().toString()
    # one array_sort (top_token), two aggregate() folds (dup_token's
    # run-length pass + dup_bigram) — each would double if merged
    assert plan.count("array_sort") == 1, plan
    assert plan.count("aggregate(") == 2, plan
    # the OUTER project (first plan line) computes keep_default from the
    # named signal columns only — never from the raw text
    outer = plan.split("\n")[0]
    assert "keep_default" in outer
    assert "split(" not in outer and "text#" not in outer
