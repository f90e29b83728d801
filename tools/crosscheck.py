"""Local mirror of the driver's correctness harness.

Runs every __spark_entry__.queries() entry at a given sf, and for entries
with oracle SQL runs DuckDB side-by-side: row count, column names, and
order-insensitive value comparison (sorted rows, columns sorted by name).
Rows-only entries just execute and report row counts.

Usage: python tools/crosscheck.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif "datetime" in str(out[c].dtype):
            out[c] = out[c].astype("datetime64[us]").astype(str)
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str | None:
    if len(spark_pdf) != len(duck_pdf):
        return f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}"
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    # STRICT dtype-kind check: the driver value-hashes the materialized
    # frames, so int64 vs float64 on the same values (e.g. DuckDB HUGEINT
    # sums landing as float64) is a driver hash mismatch even though the
    # values compare equal — r01 failed agg_salted_twophase/grouping_sets/
    # pivot exactly this way while the old coercing compare stayed green.
    for c in sorted(spark_pdf.columns):
        ks, kd = spark_pdf[c].dtype.kind, duck_pdf[c].dtype.kind
        if ks != kd and {ks, kd} != {"i", "u"} and "M" not in (ks, kd):
            return f"dtype-kind {c}: spark={spark_pdf[c].dtype} duck={duck_pdf[c].dtype}"
    a, b = canon_frame(spark_pdf), canon_frame(duck_pdf)
    try:
        # exact: the driver hashes values, so bit-level drift is a failure
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        return "values: " + str(e).split("\n")[-2][:200]
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    import __spark_entry__ as E
    from kgpipe.session import get_spark

    spark = get_spark("crosscheck", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    qs = E.queries()
    sqls = E.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            fails.append(name)
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            continue
        if name in sqls:
            try:
                ddf = con.execute(sqls[name]).df()
            except Exception:
                fails.append(name)
                print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
                continue
            err = compare(sdf, ddf)
            if err:
                fails.append(name)
                print(f"FAIL {name}: {err}")
            else:
                print(f"OK   {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
        else:
            print(f"ROWS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(fails)} failures: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
