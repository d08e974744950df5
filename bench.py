#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf", ...}.

Headline metric: total wall seconds across the suite. Also reports
triples/sec for the flagship KG pipeline (the BASELINE.json metric).
Run with SPARK_GRAFT_CPUS=8 and =32 on the same input to measure the
two-parallelism scaling efficiency recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline queries: flagship KG stages + the heaviest operator families
BENCH_QUERIES = [
    "kg_triples",
    "kg_triple_counts",
    "kg_components",
    "ann_search_topk",
    "ann_knn_blocked",
    "s7_ctx_window",
    "q1_pricing",
    "q3_top_orders",
    "dedup_minhash",
    "dedup_jaccard",
    "dedup_simhash",
    "text_profile",
]


def _bench_webkg(spark, sf: float) -> tuple[float, int]:
    """End-to-end flagship pipeline (parse→triples→link→canon→graph) over a
    deterministic web_pages corpus sized to the scale factor. Corpus
    generation is cached in .bench/; the pipeline run itself is fresh
    (pipeline stage outputs removed first so nothing resumes)."""
    import shutil

    from semtools_spark.pipeline import run_webkg_pipeline
    from semtools_spark.sources.web_pages import write_web_pages

    n_pages = max(2000, int((sf if sf > 0 else 0.1) * 200_000))
    # stage outputs on tmpfs when available: the local disk anti-scales
    # with concurrent writers (see tools/bench_scaling.py) and is not the
    # engine behavior under measurement
    work = (
        "/dev/shm/semtools_bench"
        if os.path.isdir("/dev/shm")
        else os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench")
    )
    os.makedirs(work, exist_ok=True)
    corpus = os.path.join(work, f"web_pages_n{n_pages}.parquet")
    if not os.path.isdir(corpus):
        write_web_pages(spark, corpus, n_pages, 42)
    out = os.path.join(work, "bench_kg_out")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    report = run_webkg_pipeline(spark, corpus, out)
    wall = time.time() - t0
    n_triples = spark.read.parquet(report["paths"]["triples"]).count()
    shutil.rmtree(out, ignore_errors=True)
    return wall, n_triples


def _bench_lsh_link(spark) -> tuple[float, dict]:
    """The LSH-bucketed entity-link path at a catalog size that ENGAGES
    it (VERDICT r5 next #6: every committed bench exercised only the
    18-entity broadcast path). 150k synthetic entities, 200k distinct
    mention surface forms (90% exact catalog names, 10% perturbed so the
    multi-probe + rescue tiers see real traffic). Catalog and mentions
    are materialized BEFORE the timed region — the wall is the link
    itself: embed mentions, multi-probe bucket join, min_by top-1,
    bounded rescue. Reports the rescue fraction (the bounded
    approximate tier — should be ≪ 1%)."""
    from pyspark.sql import functions as F

    from semtools_spark.embedding import embed_udf
    from semtools_spark.operators import kg

    n_cat = 150_000
    n_mention_src = 200_000
    words = (
        "corp labs systems group inc holdings tech media works global "
        "north south atlas nova delta vertex orion helix quanta zephyr"
    ).split()
    name = F.concat_ws(
        " ",
        F.lit("entity"),
        F.col("id").cast("string"),
        F.element_at(F.array(*[F.lit(x) for x in words]), (F.col("id") % 19 + 1).cast("int")),
        F.element_at(F.array(*[F.lit(x) for x in words]), (F.col("id") * 7 % 19 + 1).cast("int")),
    )
    catalog = (
        spark.range(n_cat)
        .select(F.col("id").alias("entity_id"), name.alias("name"))
        .withColumn("embedding", embed_udf(dim=64)(F.col("name")))
        .localCheckpoint()
    )
    cat_id = F.pmod(F.xxhash64("id"), F.lit(n_cat))
    m_name = F.concat_ws(
        " ",
        F.lit("entity"),
        cat_id.cast("string"),
        F.element_at(F.array(*[F.lit(x) for x in words]), (cat_id % 19 + 1).cast("int")),
        F.element_at(F.array(*[F.lit(x) for x in words]), (cat_id * 7 % 19 + 1).cast("int")),
    )
    # 10% of mentions get a suffix token: near-miss surface forms whose
    # vector differs from every catalog row — bucket misses happen, the
    # rescue tier gets exercised
    mention = F.when(
        F.col("id") % 10 == 0, F.concat(m_name, F.lit(" ltd"))
    ).otherwise(m_name)
    mentions = (
        spark.range(n_mention_src).select(mention.alias("mention")).localCheckpoint()
    )

    t0 = time.time()
    linked = kg.link_entities(
        mentions, catalog, use_lsh_above=50_000, catalog_size=n_cat
    )
    agg = linked.agg(
        F.count("*").alias("n"),
        F.sum(F.col("rescued").cast("long")).alias("n_rescued"),
    ).first()
    wall = time.time() - t0
    for b in getattr(linked, "_semtools_broadcasts", ()):
        b.unpersist()
    return wall, {
        "n_catalog": n_cat,
        "n_distinct_mentions": int(agg["n"]),
        "n_rescued": int(agg["n_rescued"]),
        "rescue_rate": round(agg["n_rescued"] / max(1, agg["n"]), 6),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as entry_mod
    from semtools_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)
    qs = entry_mod.queries()

    # warm the JVM/Python-worker pool outside the timed region
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.count()
        timings[name] = round(time.time() - t0, 3)

    kg_wall, n_triples = _bench_webkg(spark, sf)
    timings["webkg_pipeline"] = round(kg_wall, 3)

    lsh_wall, lsh_stats = _bench_lsh_link(spark)
    timings["link_lsh_150k"] = round(lsh_wall, 3)

    # headline value excludes the r6-added LSH entry so the suite total
    # stays comparable with rounds 1-5 (per-query walls carry it; the
    # full sum is value_incl_lsh)
    total = round(sum(v for k, v in timings.items() if k != "link_lsh_150k"), 3)
    out = {
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / kg_wall, 1) if kg_wall else None,
        "value_incl_lsh": round(total + timings["link_lsh_150k"], 3),
        "lsh_link": lsh_stats,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
