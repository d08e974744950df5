"""Output formatters — the reference's presentation edge, as final
column projections (plain string ops, whole-stage codegen; JSON only at
the output boundary, never as an interchange format).

Reference parity (file:line cites into /root/reference):
  O1 text formatter   cmds/search.rs:35-63   "{file}:{start}::{end} ({distance})"
                      header + "{line_no+1:>4}: {line}" context rows
  O3 JSON formatter   json_mode.rs:17-30     SearchResultJSON {filename,
                      start_line_number, end_line_number,
                      match_line_number, distance, content}
  A7 chunk formatter  ask/tools.rs:530-547   <chunk file=F start=S end=E>
                      ...lines...</chunk>
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def search_result_json(
    results: DataFrame, filename_col: str = "doc"
) -> DataFrame:
    """O3: one JSON object per result row with the SearchResultJSON field
    names (json_mode.rs:17-25). Per-row JSON lines scale (map-only); use
    :func:`search_output_json` for the reference's single wrapped
    ``SearchOutput`` document."""
    return results.select(
        F.to_json(
            F.struct(
                F.col(filename_col).cast("string").alias("filename"),
                F.col("start").cast("long").alias("start_line_number"),
                F.col("end").cast("long").alias("end_line_number"),
                F.col("match_line").cast("long").alias("match_line_number"),
                F.col("distance").cast("double").alias("distance"),
                F.col("content").alias("content"),
            )
        ).alias("json")
    )


def search_output_json(
    results: DataFrame,
    filename_col: str = "doc",
    order=("distance", "doc", "match_line"),
) -> DataFrame:
    """O3: the reference's whole-output wrapper ``SearchOutput{results:
    [...]}`` (json_mode.rs:27-30) as a single-row DataFrame. Global
    aggregation to one row — CLI-parity surface for final (small) result
    sets, not a corpus-scale operator."""
    structed = results.select(
        F.struct(
            *[F.col(c).alias(f"k{i}") for i, c in enumerate(order)],
            F.struct(
                F.col(filename_col).cast("string").alias("filename"),
                F.col("start").cast("long").alias("start_line_number"),
                F.col("end").cast("long").alias("end_line_number"),
                F.col("match_line").cast("long").alias("match_line_number"),
                F.col("distance").cast("double").alias("distance"),
                F.col("content").alias("content"),
            ).alias("r"),
        ).alias("s")
    )
    return structed.agg(
        F.expr("transform(array_sort(collect_list(s)), x -> x.r)").alias("results")
    ).select(F.to_json(F.struct(F.col("results"))).alias("json"))


def format_search_text(
    results: DataFrame, filename_col: str = "doc"
) -> DataFrame:
    """O1: the reference's stdout rendering per result
    (cmds/search.rs:35-63): a ``file:start::end (distance)`` header, then
    each context line prefixed with its right-aligned 1-based line number.
    Returns (doc, match_line, text) so callers can keep ordering keys."""
    numbered = F.concat_ws(
        "\n",
        F.expr(
            "transform(split(content, '\\n'), (l, i) -> "
            "concat(lpad(cast(start + i + 1 as string), 4, ' '), ': ', l))"
        ),
    )
    header = F.concat(
        F.col(filename_col).cast("string"),
        F.lit(":"),
        F.col("start").cast("string"),
        F.lit("::"),
        F.col("end").cast("string"),
        F.lit(" ("),
        F.col("distance").cast("string"),
        F.lit(")"),
    )
    return results.select(
        F.col(filename_col).alias("doc"),
        F.col("match_line"),
        F.concat(header, F.lit("\n"), numbered, F.lit("\n")).alias("text"),
    )


def format_grep_chunks(
    grep_results: DataFrame, filename_col: str = "doc"
) -> DataFrame:
    """A7: the grep tool's per-match chunk rendering (ask/tools.rs:530-547):
    ``<chunk file=F start=S end=E>`` then the context lines then
    ``</chunk>``. Returns (doc, match_line, chunk)."""
    return grep_results.select(
        F.col(filename_col).alias("doc"),
        F.col("match_line"),
        F.concat(
            F.lit("<chunk file="),
            F.col(filename_col).cast("string"),
            F.lit(" start="),
            F.col("start").cast("string"),
            F.lit(" end="),
            F.col("end").cast("string"),
            F.lit(">\n"),
            F.col("content"),
            F.lit("\n</chunk>\n"),
        ).alias("chunk"),
    )
