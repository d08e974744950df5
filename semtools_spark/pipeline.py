"""End-to-end web-KG construction pipeline with checkpoint-manifest resume.

This is the north-rule flagship job: over a ``web_pages(url, warc_ts,
html, text, lang)`` table it runs

    parse  → byte-identical html→text extraction        (operators.parse)
    triples→ deterministic (subj, pred, obj) extraction  (operators.kg)
    link   → mention → entity cosine top-1, broadcast    (operators.kg)
    canon  → connected-components canonicalization       (operators.kg)
    graph  → canonical triples + node/edge tables        (operators.kg)

Every stage writes parquet (the Iceberg stand-in locally — on a cluster
these become Iceberg tables and the manifest a snapshot log) and then
appends one commit record to ``_manifest.jsonl`` carrying:

  * the stage's **input fingerprint** (md5 over the input files'
    (name, size) listing + stage params) — resume only trusts a commit
    whose inputs haven't changed;
  * **per-partition lineage**: one (file, rows, bytes) record per output
    parquet part, read from parquet footers (zero extra Spark jobs);
  * wall seconds, total rows/bytes.

The manifest append is the atomic commit point: a job killed after stage
k leaves stages 1..k committed; the rerun fingerprints match, those
stages are skipped (their parquet is reused, verifiably not rewritten),
and execution resumes at k+1 — the reference's incremental workspace
semantics (src/workspace/store.rs:549-611) lifted to stage granularity.

Reference shape being rebuilt: semtools' parse→embed→search dataflow
(src/bin/semtools.rs:29-132), extended per BASELINE.json north_star into
KG construction. Not a port: each stage is a declarative DataFrame plan.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semtools_spark.operators import kg
from semtools_spark.operators.parse import parse_pages

STAGES = ("parse", "triples", "link", "canon", "graph")


def _dir_listing(path: str) -> list[tuple[str, int]]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            out.append((os.path.relpath(p, path), os.stat(p).st_size))
    return sorted(out)


def fingerprint(input_paths: list[str], params: dict) -> str:
    """md5 over input parquet listings (name, size) + stage params."""
    payload = {
        "inputs": {p: _dir_listing(p) for p in input_paths},
        "params": params,
    }
    return hashlib.md5(
        json.dumps(payload, sort_keys=True, default=str).encode()
    ).hexdigest()


def _parquet_lineage(path: str) -> list[dict]:
    """Per-output-partition lineage from parquet footers — no Spark job."""
    import pyarrow.parquet as pq

    lineage = []
    for rel, size in _dir_listing(path):
        if not rel.endswith(".parquet"):
            continue
        full = os.path.join(path, rel)
        lineage.append(
            {"file": rel, "rows": pq.read_metadata(full).num_rows, "bytes": size}
        )
    return lineage


class CheckpointManifest:
    """Append-only jsonl commit log; the append IS the commit point."""

    def __init__(self, root: str):
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "_manifest.jsonl")

    def entries(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def committed(self, stage: str, fp: str) -> dict | None:
        for e in reversed(self.entries()):
            if e["stage"] == stage and e["fingerprint"] == fp:
                return e
        return None

    def commit(self, record: dict) -> None:
        line = json.dumps(record, sort_keys=True)
        with open(self.path, "a") as f:
            f.write(line + "\n")
            f.flush()
            os.fsync(f.fileno())


class StageFailure(RuntimeError):
    """Raised by the fault-injection hook (resume tests)."""


def run_webkg_pipeline(
    spark: SparkSession,
    pages_path: str,
    out_dir: str,
    *,
    dim: int = 64,
    seed: int = 42,
    max_link_distance: float | None = None,
    force: bool = False,
    fail_after: str | None = None,
    cc_checkpoint_dir: str | None = None,
) -> dict:
    """Run (or resume) the full pipeline. Returns per-stage metrics plus
    the output paths. ``fail_after='triples'`` raises StageFailure right
    after that stage's commit — the kill point for resume tests."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = CheckpointManifest(out_dir)
    params = {"dim": dim, "seed": seed, "max_link_distance": max_link_distance}
    paths = {s: os.path.join(out_dir, f"{s}.parquet") for s in STAGES}
    report: dict[str, dict] = {}

    def run_stage(name: str, input_paths: list[str], build) -> None:
        fp = fingerprint(input_paths, {**params, "stage": name})
        prior = manifest.committed(name, fp)
        if prior is not None and os.path.isdir(paths[name]) and not force:
            # trust the commit only if the output still matches its
            # committed per-partition lineage — a partially deleted or
            # corrupted stage output must re-run, not feed downstream
            if _parquet_lineage(paths[name]) == prior["partitions"]:
                report[name] = {"skipped": True, "rows": prior["rows"]}
                return
        t0 = time.time()
        df: DataFrame = build()
        df.write.mode("overwrite").parquet(paths[name])
        lineage = _parquet_lineage(paths[name])
        record = {
            "stage": name,
            "fingerprint": fp,
            "wall_s": round(time.time() - t0, 3),
            "rows": sum(p["rows"] for p in lineage),
            "bytes": sum(p["bytes"] for p in lineage),
            "partitions": lineage,
            "committed_at": time.time(),
        }
        manifest.commit(record)
        report[name] = {"skipped": False, "rows": record["rows"],
                        "wall_s": record["wall_s"]}
        if fail_after == name:
            raise StageFailure(f"injected failure after stage '{name}'")

    # 1. parse: html → text, byte-identical per url (P1-P7)
    run_stage(
        "parse",
        [pages_path],
        lambda: parse_pages(spark.read.parquet(pages_path)),
    )

    # 2. triples: deterministic (subj, pred, obj) extraction, map-only
    run_stage(
        "triples",
        [paths["parse"]],
        lambda: kg.extract_triples(
            spark.read.parquet(paths["parse"]), id_col="url"
        ),
    )

    # 3. link: distinct mentions → entity ids (broadcast cosine top-1)
    def _build_link() -> DataFrame:
        triples = spark.read.parquet(paths["triples"])
        mentions = triples.select(F.col("subj").alias("mention")).union(
            triples.select(F.col("obj").alias("mention"))
        )
        catalog = kg.build_entity_catalog(spark, dim=dim, seed=seed)
        return kg.link_entities(
            mentions, catalog, dim=dim, seed=seed,
            max_distance=max_link_distance,
        )

    run_stage("link", [paths["triples"]], _build_link)

    # 4. canon: connected-components canonicalization of surface forms
    run_stage(
        "canon",
        [paths["link"]],
        lambda: kg.canonicalize_mentions(
            spark.read.parquet(paths["link"]),
            cc_checkpoint_dir=cc_checkpoint_dir,
        ),
    )

    # 5. graph: canonical triples with provenance counts
    def _build_graph() -> DataFrame:
        triples = spark.read.parquet(paths["triples"])
        canon = spark.read.parquet(paths["canon"])
        c_subj = canon.select(
            F.col("mention").alias("subj"), F.col("canonical_id").alias("subj_id")
        )
        c_obj = canon.select(
            F.col("mention").alias("obj"), F.col("canonical_id").alias("obj_id")
        )
        return (
            triples.join(F.broadcast(c_subj), "subj", "left")
            .join(F.broadcast(c_obj), "obj", "left")
            .groupBy("subj", "pred", "obj", "subj_id", "obj_id")
            .agg(F.count("*").alias("n_mentions"))
        )

    run_stage("graph", [paths["triples"], paths["canon"]], _build_graph)

    return {"stages": report, "paths": paths, "manifest": manifest.path}
