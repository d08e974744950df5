"""Deduplication operators for web-scale training-data pipelines.

Five strategies, cheapest-first — all shuffle only what they must:

  exact_duplicates     hash-groupBy on md5(text): one shuffle on a 32-byte
                       key, map-side partial agg.
  minhash_signatures   k permutation-min hashes over word shingles —
                       map-only JVM expressions (md5-derived, shared with
                       the DuckDB oracle).
  minhash_lsh_pairs    band the signature, shuffle once on (band, band-hash)
                       buckets, self-join *within buckets only* — the
                       classic MinHash+LSH that avoids all-pairs at scale.
  ngram_jaccard_pairs  exact Jaccard on shingle sets within explicit blocks
                       (the verifier for LSH candidates; integer output).
  simhash_buckets      1-bit random-hyperplane signature per doc (32-bit),
                       bucket by signature for near-dup grouping.
  embedding_near_dups  cosine near-dup pairs over an embedding column,
                       blocked to avoid all-pairs.

Every numeric output is integer arithmetic → bit-exact vs the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semtools_spark.functions.hashing import (
    minhash_signature_cols,
    shingles,
    simhash64,
)


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-duplicate groups: (text_hash, n_copies, keep_id) for every
    content hash, keep_id = min doc id (the canonical survivor)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("keep_id"))
    )


def with_words(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("__w", F.split(F.trim(F.col(text_col)), r"\s+"))


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, mh0..mh{k-1}) minhash signature per doc. Map-only; one md5
    pass over the shingles, then k integer affine-min passes."""
    from semtools_spark.functions.hashing import shingle_hashes

    d = with_words(docs, text_col).withColumn(
        "__sh", F.array_distinct(shingles("__w", shingle_n))
    ).withColumn("__h", shingle_hashes("__sh"))
    return d.select(F.col(id_col), *minhash_signature_cols("__h", num_hashes, seed))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: equal band-signature in ≥1
    band. Shuffles on (band, signature-slice) — never all-pairs. Returns
    distinct (a, b) with a < b.

    ``max_bucket_size`` drops buckets larger than the cap before the
    self-join: a degenerate band signature (e.g. the minhash of a
    boilerplate header shared by millions of pages) would otherwise form
    one O(bucket²) hot key. Dropping only suppresses candidates from that
    band — true near-dups still collide in their other, non-degenerate
    bands, and huge buckets are overwhelmingly boilerplate clusters better
    handled by exact dedup upstream."""
    if num_hashes % bands != 0:
        raise ValueError(f"num_hashes ({num_hashes}) must be divisible by bands ({bands})")
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n, seed)
    mh_cols = [f"mh{i}" for i in range(num_hashes)]
    banded = sig.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ":", *[F.col(c).cast("string") for c in mh_cols[b * rows_per_band:(b + 1) * rows_per_band]]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_sig"),
    ).filter(~F.col("band_sig").contains("NULL") & (F.length("band_sig") > 0))
    if max_bucket_size is not None:
        # groupBy + anti-join-back, NOT a count window: the window form
        # funnels the entire hot bucket through ONE shuffle partition to
        # sort-and-count it — the guard becomes the bottleneck it guards
        # against. groupBy partially aggregates map-side, the over-cap
        # key list is tiny by construction, and AQE broadcasts the anti
        # join — the banded rows never shuffle for the cap at all.
        hot = (
            banded.groupBy("band", "band_sig")
            .agg(F.count("*").alias("__bn"))
            .filter(F.col("__bn") > max_bucket_size)
            .select("band", "band_sig")
        )
        banded = banded.join(hot, ["band", "band_sig"], "left_anti")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_sig") == F.col("r.band_sig"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang", "source"),
    shingle_n: int = 3,
    min_jaccard_micro: int = 1,
    max_shingle_df: int | None = 10_000,
) -> DataFrame:
    """Exact shingle-set Jaccard for every overlapping pair *within a block*.

    Scale shape: explode docs to (id, shingle) rows, equi-join on the
    shingle (within the block), count matches per pair — the shuffle key is
    the shingle, so no doc pair is ever formed unless it shares at least
    one shingle, and no shingle ARRAY is carried into a quadratic join
    (the naive pair-join materializes every array 2·|block| times and
    dies at web scale; this one moves each (id, shingle) row once).
    |A∪B| is reconstructed as |A|+|B|−inter from per-doc set sizes.

    ``max_shingle_df`` caps shingle document frequency BEFORE the
    self-join: a corpus-frequent shingle ("the of a") is an unbounded hot
    key producing O(df²) pair rows. Shingles with df > cap are dropped
    from the shingle universe (both intersection AND set sizes — Jaccard
    stays internally consistent over the filtered universe). The standard
    recall argument: a shingle shared by more than τ documents carries no
    near-duplicate signal, so dropping it cannot split a true near-dup
    pair whose similarity rests on its remaining (rare) shingles.

    Integer output: (a, b, inter, uni, jac_micro = floor(1e6·inter/uni)).
    Pairs with zero overlap are (correctly) absent — callers filter on a
    positive jaccard anyway. Requires min_jaccard_micro > 0.
    """
    if min_jaccard_micro <= 0:
        raise ValueError(
            "min_jaccard_micro must be > 0: zero-overlap pairs are not enumerated"
        )
    # The shingle expression is INLINED into the generator, and nothing
    # else references it: exploding a pre-materialized array column (which
    # is what Catalyst's CSE produces if size(sh) appears alongside
    # explode(sh)) drops Generate out of the fused codegen path and runs
    # ~20x slower (measured 19s vs 1s on sf0.1). The per-doc set size is
    # instead recovered FROM the exploded rows (count per id — exact,
    # because the shingles are array_distinct'ed) and broadcast-joined
    # back onto the pair aggregates.
    sh = F.array_distinct(shingles("__w", shingle_n))
    tok = with_words(docs, text_col).select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        F.explode(sh).alias("s"),
    )
    if max_shingle_df is not None:
        # shingles are distinct per doc, so count(*) per s IS document
        # frequency. groupBy + anti-join-back, NOT a count window: the
        # window shuffles every (id, shingle) row on s and then streams
        # the hottest shingle ("the of a" at corpus df 10^7) through one
        # sorting reducer — the exact hot key this cap exists to stop.
        # The groupBy partial-aggregates map-side, the over-cap shingle
        # list is tiny, and AQE broadcasts the anti join.
        #
        # The exploded relation is lazily localCheckpoint'ed FIRST, so
        # the df-count, the per-doc sizes, and both self-join sides all
        # read ONE materialized generator pass instead of each re-running
        # the regex+shingle codegen (4 passes in the r5 shape — the
        # measured 1.2× cap cost at sf0.1, AB_BENCH r5). The price is
        # storing the exploded (id, block, shingle) rows on executor
        # local storage for the job's duration — the standard
        # recompute-vs-store trade, taken here because the generator is
        # the single hottest expression in the dedup family.
        tok = tok.localCheckpoint(eager=False)
        # NOTE (r9): the hot aggregation appears 4x and sizes 2x in the
        # printed plan (one per consumer), but runtime ReuseExchange
        # dedupes the identical subtrees over the checkpointed tok RDD —
        # lazy-checkpointing hot/sizes was tried and measured SLOWER
        # (+0.7 s on the sf0.1 gate: real extra materialization passes
        # for work the exchange reuse already shares).
        hot = (
            tok.groupBy("s")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_shingle_df)
            .select("s")
        )
        tok = tok.join(hot, "s", "left_anti")
    sizes = tok.groupBy("id").agg(F.count("*").cast("long").alias("n_sh"))
    l, r = tok.alias("l"), tok.alias("r")
    cond = (F.col("l.s") == F.col("r.s")) & (F.col("l.id") < F.col("r.id"))
    for c in block_cols:
        cond = cond & (F.col(f"l.{c}") == F.col(f"r.{c}"))
    pairs = (
        l.join(r, cond)
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.count("*").cast("long").alias("inter"))
        .join(F.broadcast(sizes.withColumnRenamed("n_sh", "na")),
              F.col("a") == F.col("id"))
        .drop("id")
        .join(F.broadcast(sizes.withColumnRenamed("n_sh", "nb")),
              F.col("b") == F.col("id"))
        .drop("id")
        .select(
            "a", "b", "inter",
            (F.col("na") + F.col("nb") - F.col("inter")).cast("long").alias("uni"),
        )
    )
    # floor() on both sides (Spark cast truncates, DuckDB cast rounds —
    # floor is the portable integerization)
    pairs = pairs.withColumn(
        "jac_micro",
        F.when(
            F.col("uni") > 0,
            F.floor((F.lit(1000000) * F.col("inter")) / F.col("uni")),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    return pairs.filter(F.col("jac_micro") >= min_jaccard_micro)


def jaccard_verify_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    strict: bool = False,
) -> DataFrame:
    """Exact shingle-Jaccard for a GIVEN candidate-pair list — the verify
    half of the standard LSH→verify dedup composition (ngram_jaccard_pairs
    enumerates every overlapping pair in a block; this one scores only the
    pairs a candidate generator produced).

    Scale shape: the pair relation is ≪ the corpus, so the shingle sets
    are attached by two equi-joins on the pair's endpoints — only docs
    that appear in a pair carry their (distinct) shingle array through a
    shuffle, and the intersection is one codegen ``array_intersect`` per
    pair. No pair enumeration, no shingle-keyed self-join.

    Input pairs: (a, b). Output: (a, b, inter, uni, jac_micro) with the
    same integer contract as ngram_jaccard_pairs (floor micro-units).

    **Drop semantics**: the endpoint joins are INNER — a pair whose id is
    absent from ``docs`` (or whose id TYPE doesn't match ``id_col``'s) is
    silently absent from the output, indistinguishable from an unscored
    pair. Fine when ``pairs`` came from an LSH pass over the same
    ``docs``; for externally supplied pair lists pass ``strict=True``,
    which anti-joins the pair endpoints against the doc ids first and
    raises with examples if any endpoint fails to resolve (one bounded
    extra job over the small pair relation — never over the corpus).
    """
    sh = with_words(docs, text_col).select(
        F.col(id_col).alias("__id"),
        F.array_distinct(shingles("__w", shingle_n)).alias("__sh"),
    )
    needed = pairs.select(F.col("a").alias("__id")).union(
        pairs.select(F.col("b").alias("__id"))
    ).distinct()
    if strict:
        unresolved = [
            r["__id"]
            for r in needed.join(
                docs.select(F.col(id_col).alias("__id")), "__id", "left_anti"
            ).limit(5).collect()
        ]
        if unresolved:
            raise ValueError(
                "jaccard_verify_pairs(strict=True): pair endpoints missing "
                f"from docs (first {len(unresolved)}): {unresolved} — check "
                "id values AND id column type"
            )
    sh = sh.join(needed, "__id", "left_semi")
    out = (
        pairs.join(
            sh.select(F.col("__id").alias("a"), F.col("__sh").alias("__sa")), "a"
        )
        .join(sh.select(F.col("__id").alias("b"), F.col("__sh").alias("__sb")), "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("__sa", "__sb")).cast("long").alias("inter"),
            (
                F.size("__sa") + F.size("__sb")
                - F.size(F.array_intersect("__sa", "__sb"))
            ).cast("long").alias("uni"),
        )
        .withColumn(
            "jac_micro",
            F.when(
                F.col("uni") > 0,
                F.floor((F.lit(1000000) * F.col("inter")) / F.col("uni")),
            ).otherwise(F.lit(0)).cast("long"),
        )
    )
    return out


def near_dup_groups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate CLUSTERS: banded-LSH candidate pairs → connected
    components → (doc_id, group_id) with group_id = min doc id of the
    cluster. The end-to-end dedup composition a training-data pipeline
    actually runs: transitive near-dup chains (A≈B, B≈C) collapse into
    one group even when A and C never collide directly. Only documents
    with at least one candidate pair appear; all other docs are their own
    group by definition.

    Scale shape: pairs are bucket-joined (never all-pairs), components
    run O(log n) shuffle rounds on the pair relation only (≪ corpus).

    Non-numeric ids (urls, file paths — the web corpus's natural keys)
    are supported: they are mapped through ``xxhash64`` for the CC loop
    (collision odds ~n²/2⁶⁴ — negligible below ~10⁹ clustered docs) and
    joined back, with ``group_id`` then the MIN original id of the
    cluster (lexicographic for strings) — same survivor contract as the
    numeric path. Numeric ids skip the mapping entirely."""
    from pyspark.sql.types import NumericType

    from semtools_spark.operators.kg import connected_components

    # The candidate-pair relation is tiny relative to the corpus but its
    # LINEAGE is the whole signature+band+join dataflow; downstream it is
    # consumed several times (CC orientation, the id-mapping union, the
    # group join), each of which would otherwise recompute the full LSH
    # join over the corpus (measured 3× ≈ 90 s extra on 1M pages). One
    # lazy lineage cut makes every reuse read the materialized pairs.
    pairs = minhash_lsh_pairs(
        docs, id_col, text_col, num_hashes, bands, shingle_n, seed,
        max_bucket_size=max_bucket_size,
    ).localCheckpoint(eager=False)
    if isinstance(docs.schema[id_col].dataType, NumericType):
        comp = connected_components(pairs, src="a", dst="b")
        return comp.select(
            F.col("node").alias(id_col), F.col("component").alias("group_id")
        )
    hashed = pairs.select(
        F.xxhash64("a").alias("a"), F.xxhash64("b").alias("b")
    )
    comp = connected_components(hashed, src="a", dst="b")
    ids = (
        pairs.select(F.col("a").alias("id"))
        .union(pairs.select(F.col("b").alias("id")))
        .distinct()
        .withColumn("node", F.xxhash64("id"))
    )
    with_ids = ids.join(comp, "node").select("id", "component")
    reps = with_ids.groupBy("component").agg(F.min("id").alias("group_id"))
    return (
        with_ids.join(reps, "component")
        .select(F.col("id").alias(id_col), "group_id")
    )


def simhash_buckets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """(id, simhash) — equal or near-equal (low Hamming distance) signatures
    mark near-duplicates; grouping by signature is the O(n) dedup pass."""
    d = with_words(docs, text_col)
    return d.select(F.col(id_col), simhash64("__w", bits).alias("simhash"))


def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    max_distance: float = 0.1,
    max_block_size: int | None = 10_000,
    dim: int | None = None,
) -> DataFrame:
    """Cosine near-dup pairs within blocks over a pre-embedded column,
    JVM-side (codegen) cosine. Returns (a, b, dist_micro).

    Quadratic WITHIN a block by design (this is the exact verifier; LSH
    candidate generation bounds block sizes upstream) — ``max_block_size``
    additionally drops oversized blocks outright, the same hot-key guard
    as the LSH bucket cap: a degenerate block at web scale is one
    unbounded O(n²) key."""
    from semtools_spark.functions.vectors import cosine_distance_expr

    d = emb.select(
        F.col(id_col).alias("id"), F.col(block_col).alias("blk"), F.col(vec_col).alias("v")
    )
    if max_block_size is not None:
        # groupBy + anti-join-back, NOT a count window: the window form
        # shuffles every row WITH its embedding vector on blk and sorts
        # the hot block under one reducer; the groupBy branch is pruned
        # to the blk column alone, partial-aggregates map-side, and the
        # tiny over-cap block list anti-joins back via AQE broadcast.
        hot = (
            d.groupBy("blk")
            .agg(F.count("*").alias("__bn"))
            .filter(F.col("__bn") > max_block_size)
            .select("blk")
        )
        d = d.join(hot, "blk", "left_anti")
    l, r = d.alias("l"), d.alias("r")
    pairs = l.join(
        r, (F.col("l.blk") == F.col("r.blk")) & (F.col("l.id") < F.col("r.id"))
    ).select(
        F.col("l.id").alias("a"),
        F.col("r.id").alias("b"),
        F.floor(cosine_distance_expr("l.v", "r.v", dim=dim) * 1000000)
        .cast("long")
        .alias("dist_micro"),
    )
    return pairs.filter(F.col("dist_micro") < int(max_distance * 1000000))
