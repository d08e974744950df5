"""Ad-hoc document sources — the reference's stdin path (S11).

`semtools search` accepts a single unnamed document on stdin when no
files are given (reference src/cmds/search.rs:17-21,144-176: stdin lines
become one Document named "<stdin>"). The Spark analog: lift in-memory
text into the same (doc_id, text) relation every operator consumes.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession

STDIN_DOC_ID = "<stdin>"


def single_doc(
    spark: SparkSession,
    text: str,
    doc_id: str = STDIN_DOC_ID,
) -> DataFrame:
    """One ad-hoc document as a (doc_id, text) relation — searchable,
    grep-able, parseable like any corpus table."""
    return spark.createDataFrame([(doc_id, text)], "doc_id string, text string")


def docs_from_strings(
    spark: SparkSession, texts: list[str], prefix: str = "doc"
) -> DataFrame:
    """A small in-memory corpus: (doc_id='{prefix}{i}', text)."""
    rows = [(f"{prefix}{i}", t) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id string, text string")


def stdin_doc(spark: SparkSession) -> DataFrame:
    """Read ALL of stdin as the single unnamed document (the reference
    joins stdin lines back into one doc, cmds/search.rs:144-176)."""
    return single_doc(spark, sys.stdin.read())
