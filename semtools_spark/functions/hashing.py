"""Deterministic hashing shared bit-for-bit with the DuckDB oracle.

The engine's content-derived keys follow the reference's idea of
deterministic ids (semtools uses FNV-1a of path / path⊕line_no,
src/workspace/store.rs:75-89,650-661) but use md5, which both Spark and
DuckDB implement identically, so every hash-derived operator (exact dedup,
minhash-LSH, simhash, fingerprints) is oracle-checkable in pure SQL.

h32(s)        = int(first 8 hex chars of md5(s))           ∈ [0, 2^32)
minhash h_i(x) = (a_i·x + b_i) mod p, p = 2^31−1 (prime), a_i<2^30
                 → products < 2^62, no int64 overflow in either engine.

Everything here is a *Column expression builder* — JVM-side, codegen'd,
no Python in the data path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

MINHASH_PRIME = 2147483647  # 2^31 − 1, prime


def h32(col: Column | str) -> Column:
    """md5-derived 32-bit integer hash of a string column (JVM-side).

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 8))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def h32_sql_duckdb(expr: str) -> str:
    """The DuckDB-side rendering of h32 for oracle SQL strings."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def minhash_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs derived from md5 — reproducible by any
    process (and by the committed oracle SQL, which inlines the constants)."""
    coeffs = []
    for i in range(num_hashes):
        d = hashlib.md5(f"minhash:{seed}:{i}".encode()).digest()
        a = (int.from_bytes(d[:4], "big") % (2**30 - 1)) + 1
        b = int.from_bytes(d[4:8], "big") % MINHASH_PRIME
        coeffs.append((a, b))
    return coeffs


def shingles(words_col: str, n: int = 3) -> Column:
    """n-gram shingles over a pre-split array<string> column, JVM-side:
    transform(sequence(0, size-n), i -> concat_ws(' ', w[i..i+n-1])).
    Empty array when the document has fewer than n words."""
    parts = ", ".join(f"{words_col}[i + {k}]" for k in range(n))
    return F.expr(
        f"CASE WHEN size({words_col}) < {n} THEN array() "
        f"ELSE transform(sequence(0, size({words_col}) - {n}), "
        f"i -> concat_ws(' ', {parts})) END"
    )


def shingles_sql_duckdb(words_expr: str, n: int = 3) -> str:
    """DuckDB rendering of shingles() (1-based list indexing)."""
    parts = " || ' ' || ".join(f"{words_expr}[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN len({words_expr}) < {n} THEN [] "
        f"ELSE list_transform(range(1, len({words_expr}) - {n - 1} + 1), "
        f"i -> {parts}) END"
    )


def shingle_hashes(shingle_col: str) -> Column:
    """array<bigint> of h32 per shingle — the ONE md5 pass. Factoring the
    md5 out of the per-permutation transforms makes the k-hash signature
    cost k integer passes + 1 md5 pass instead of k md5 passes (measured
    ~8× on the 1M-page near-dup stage: md5 + hex-string conv dominate;
    the affine (a·x+b) mod p steps are trivial). Bit-identical values:
    the same CAST-to-BIGINT h32 per shingle feeds the same affine maps."""
    return F.expr(
        f"transform({shingle_col}, s -> "
        f"CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT))"
    )


def minhash_signature_cols(
    hash_col: str, num_hashes: int = 16, seed: int = 42
) -> list[Column]:
    """One Column per minhash value: min over pre-hashed shingles
    (:func:`shingle_hashes`) of (a·h + b) mod p. All JVM-side
    (array_min ∘ transform over bigints). NULL when the set is empty."""
    cols = []
    for i, (a, b) in enumerate(minhash_coeffs(num_hashes, seed)):
        expr = (
            f"array_min(transform({hash_col}, h -> "
            f"({a}L * h + {b}L) % {MINHASH_PRIME}L))"
        )
        cols.append(F.expr(expr).alias(f"mh{i}"))
    return cols


def minhash_sql_duckdb(shingle_expr: str, num_hashes: int = 16, seed: int = 42) -> list[str]:
    """Matching DuckDB SQL snippets (one per hash) for oracle queries."""
    out = []
    for i, (a, b) in enumerate(minhash_coeffs(num_hashes, seed)):
        out.append(
            f"list_min(list_transform({shingle_expr}, s -> "
            f"({a} * ('0x' || substr(md5(s), 1, 8))::BIGINT + {b}) % {MINHASH_PRIME})) AS mh{i}"
        )
    return out


def simhash64(words_col: str, bits: int = 32) -> Column:
    """SimHash over a word-array column, JVM-side.

    For each bit j: sum over tokens of (bit_j(h32(token)) ? +1 : −1);
    simhash bit j = (sum > 0). Packed little-endian into a BIGINT.
    32 bits (of the 32-bit md5-derived hash) keeps arithmetic in int64 in
    both engines. DuckDB mirror in tests/oracle uses identical formula.

    Same one-md5-pass factoring as the minhash signature: the token
    hashes are bound ONCE via a lambda variable, then each bit's
    aggregate is pure integer work — not ``bits`` md5 passes."""
    terms = []
    for j in range(bits):
        # popcount-style: sign contribution of bit j across all tokens
        bitj = (
            f"aggregate(__sim_h, 0L, (acc, h) -> acc + "
            f"CASE WHEN (h div {1 << j}) % 2 = 1 THEN 1 ELSE -1 END)"
        )
        terms.append(f"(CASE WHEN ({bitj}) > 0 THEN {1 << j}L ELSE 0L END)")
    # bind the hashed-token array once with a single-element explode-free
    # trick: transform over a 1-element array introduces __sim_h as a
    # lambda variable scoping the whole sum
    body = " + ".join(terms)
    return F.expr(
        f"transform(array(transform({words_col}, t -> "
        f"CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT))), "
        f"__sim_h -> {body})[0]"
    )


def simhash_sql_duckdb(words_expr: str, bits: int = 32) -> str:
    """DuckDB rendering of simhash64 (same formula, list_reduce-free)."""
    terms = []
    for j in range(bits):
        bitj = (
            f"list_sum(list_transform({words_expr}, t -> "
            f"CASE WHEN ((('0x' || substr(md5(t), 1, 8))::BIGINT // {1 << j}) % 2) = 1 "
            f"THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN ({bitj}) > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)
