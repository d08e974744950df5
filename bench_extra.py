#!/usr/bin/env python
"""Optimization-round instrumentation (guide §1): per-query isolation with
the noop sink, plan capture, webkg per-stage walls, link_lsh phase walls.

Does NOT replace bench.py (frozen). Usage:

  python bench_extra.py plans [out_suffix]   # capture .explain("formatted")
  python bench_extra.py suite [n_repeats]    # noop-sink timings per query
  python bench_extra.py webkg                # pipeline per-stage breakdown
  python bench_extra.py lsh                  # link_lsh phase breakdown
  python bench_extra.py cc                   # kg_components round timing
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import BENCH_QUERIES  # noqa: E402

PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r09")


def _spark():
    from semtools_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark("bench_extra", cpus=cpus)


def _sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cmd_plans(suffix: str = "before"):
    import __spark_entry__ as entry

    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = _spark()
    qs = entry.queries()
    for name in BENCH_QUERIES:
        df = qs[name](spark, _sf_dir())
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(PLANS_DIR, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", f"{name}_{suffix}.txt")
    spark.stop()


def cmd_suite(repeats: int = 3):
    import __spark_entry__ as entry

    spark = _spark()
    qs = entry.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict[str, list] = {}
    for name in BENCH_QUERIES:
        walls = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.time()
            df = qs[name](spark, _sf_dir())
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        out[name] = walls
        print(name, walls, flush=True)
    print(json.dumps(out))
    spark.stop()


def cmd_webkg():
    import shutil

    from semtools_spark.pipeline import run_webkg_pipeline
    from semtools_spark.sources.web_pages import write_web_pages

    spark = _spark()
    n_pages = 20000
    work = "/dev/shm/semtools_bench"
    os.makedirs(work, exist_ok=True)
    corpus = os.path.join(work, f"web_pages_n{n_pages}.parquet")
    if not os.path.isdir(corpus):
        write_web_pages(spark, corpus, n_pages, 42)
    out = os.path.join(work, "bench_extra_kg_out")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    report = run_webkg_pipeline(spark, corpus, out)
    wall = time.time() - t0
    print(json.dumps({"wall": round(wall, 3), "stages": report["stages"]}, indent=2))
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


def cmd_lsh():
    """Phase breakdown of the link_lsh_150k bench: embed+sig checkpoint,
    catalog signatures, candidate join + top1, miss/rescue, final agg."""
    import numpy as np
    from pyspark.sql import functions as F

    from semtools_spark.embedding import embed_udf
    from semtools_spark.operators import kg

    spark = _spark()
    n_cat, n_mention_src = 150_000, 200_000
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
    mention = F.when(F.col("id") % 10 == 0, F.concat(m_name, F.lit(" ltd"))).otherwise(m_name)
    mentions = spark.range(n_mention_src).select(mention.alias("mention")).localCheckpoint()

    t0 = time.time()
    linked = kg.link_entities(mentions, catalog, use_lsh_above=50_000, catalog_size=n_cat)
    t_build = time.time() - t0
    t0 = time.time()
    agg = linked.agg(
        F.count("*").alias("n"), F.sum(F.col("rescued").cast("long")).alias("n_rescued")
    ).first()
    t_run = time.time() - t0
    print(json.dumps({
        "build_s": round(t_build, 3),
        "run_s": round(t_run, 3),
        "n": int(agg["n"]),
        "n_rescued": int(agg["n_rescued"]),
    }))
    for b in getattr(linked, "_semtools_broadcasts", ()):
        b.unpersist()
    spark.stop()


def cmd_cc():
    """kg_components with per-round wall clock (monkeypatched probe)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from semtools_spark.operators import kg

    spark = _spark()
    emb = spark.read.parquet(f"{_sf_dir()}/embeddings.parquet").select("vec_id", "label")
    w = Window.partitionBy("label").orderBy("vec_id")
    edges = (
        emb.withColumn("prev", F.lag("vec_id").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.col("prev").alias("src"), F.col("vec_id").alias("dst"))
    )
    t_all = time.time()
    comp = kg.connected_components(edges, small_graph_threshold=0)
    n = comp.count()
    print(json.dumps({"total_s": round(time.time() - t_all, 3), "rows": n}))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "suite"
    if cmd == "plans":
        cmd_plans(*(sys.argv[2:3] or ["before"]))
    elif cmd == "suite":
        cmd_suite(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    elif cmd == "webkg":
        cmd_webkg()
    elif cmd == "lsh":
        cmd_lsh()
    elif cmd == "cc":
        cmd_cc()
    else:
        raise SystemExit(f"unknown command {cmd}")
