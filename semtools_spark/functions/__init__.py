from semtools_spark.functions.hashing import (  # noqa: F401
    MINHASH_PRIME,
    h32,
    h32_sql_duckdb,
    minhash_coeffs,
    minhash_signature_cols,
    minhash_sql_duckdb,
    shingles,
    shingles_sql_duckdb,
    simhash64,
    simhash_sql_duckdb,
)
from semtools_spark.functions.vectors import (  # noqa: F401
    cosine_distance_expr,
    cosine_distance_sql_duckdb,
    dot_expr,
    dot_sql_duckdb,
    l2_norm_expr,
    vector_literal,
)
