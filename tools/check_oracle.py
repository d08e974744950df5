#!/usr/bin/env python
"""Self-check harness mimicking the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() through DuckDB on the
same parquet, compare row count, column names, and order-insensitive
values. Usage: python tools/check_oracle.py [sf_dir] [query ...]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                vals.append(f"{v:.9g}")
            elif isinstance(v, bool):
                vals.append(str(int(v)))
            elif v is None:
                vals.append("\0NULL")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # the flagship VALUES oracle reads the corpus at oracle-build time;
    # point it at the sf under test (driver default: sf0.01)
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    import duckdb

    import __spark_entry__ as entry_mod
    from semtools_spark.session import get_spark

    spark = get_spark("check_oracle", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sdf.columns
            srows = normalize([r.asDict() for r in sdf.collect()], cols)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(srows)} rows, {t1-t0:.1f}s spark)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            # the DRIVER hashes Arrow values, where DuckDB decimal128 (e.g.
            # an un-CAST SUM(BIGINT)) mismatches Spark's bigint even when
            # every value is equal — fail here so it can't pass silently
            decs = [
                (f.name, str(f.type))
                for f in rel.arrow().schema
                if "decimal" in str(f.type)
            ]
            if decs:
                failures.append(name)
                print(f"FAIL {name}: oracle produces decimal columns {decs} "
                      "(CAST aggregates to BIGINT)")
                continue
            rel = con.sql(oracles[name])
            orows = normalize(
                [dict(zip(ocols, r)) for r in rel.fetchall()], ocols
            )
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            continue
        t2 = time.time()
        if sorted(cols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL {name}: columns spark={cols} duckdb={ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(orows)}")
            continue
        # compare with columns aligned by sorted name order
        scols_sorted = sorted(cols)
        sidx = [cols.index(c) for c in scols_sorted]
        oidx = [ocols.index(c) for c in scols_sorted]
        s_al = sorted(tuple(r[i] for i in sidx) for r in srows)
        o_al = sorted(tuple(r[i] for i in oidx) for r in orows)
        if s_al != o_al:
            failures.append(name)
            bad = next(
                (i for i, (a, b) in enumerate(zip(s_al, o_al)) if a != b), None
            )
            print(f"FAIL {name}: value mismatch at sorted row {bad}:")
            print(f"  cols:   {scols_sorted}")
            print(f"  spark:  {s_al[bad] if bad is not None else '?'}")
            print(f"  duckdb: {o_al[bad] if bad is not None else '?'}")
        else:
            print(
                f"PASS {name}: {len(srows)} rows "
                f"(spark {t1-t0:.1f}s, duckdb {t2-t1:.1f}s)"
            )

    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
