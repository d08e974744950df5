"""semtools_spark — a PySpark-native rebuild of run-llama/semtools' capabilities.

Reference (read-only, studied for behavior only): /root/reference (semtools
v3.0.0, Rust CLI: parse / search / workspace / ask). This package re-expresses
that parse→embed→search→rank dataflow — plus the knowledge-graph construction
extension (triple extraction, entity linking, canonicalization) and the
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) — as idiomatic PySpark DataFrame programs:

- declarative plans (Catalyst does pushdown/pruning/join-selection),
- pandas/Arrow UDFs only where built-ins can't express semantics
  (the static-embedding model), never per-row Python,
- broadcast joins for small dims, explicit repartition-by-key for big ones,
- parquet tables + an emulated MERGE (anti-join ∪ union ∪ atomic overwrite)
  standing in for Iceberg in this jar-less sandbox,
- a checkpoint manifest for mid-pipeline resume.
"""

__version__ = "0.1.0"

from semtools_spark.session import get_spark  # noqa: F401
