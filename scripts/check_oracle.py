"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entry  # noqa: E402
from featureengineer_spark import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].where(pdf[c].notna(), None)
        elif str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pdf[c].dtype.kind in "iu":
            pdf[c] = pdf[c].astype("float64")  # int32 vs int64 parity
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(9)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        got = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:28s} rows={len(got):7d}  (rows-only, no oracle)")
            continue
        exp = con.execute(oracles[name]).df()
        status = []
        if len(got) != len(exp):
            status.append(f"ROWS {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            status.append(f"SCHEMA {sorted(got.columns)} != {sorted(exp.columns)}")
        if not status:
            g, e = normalize(got), normalize(exp)
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
            except AssertionError as err:
                status.append("VALUES " + str(err).split("\n")[1][:120])
                bad = ~(g.eq(e) | (g.isna() & e.isna()))
                nbad = int(np.asarray(bad).sum())
                status.append(f"({nbad} mismatched cells)")
        tag = "OK " if not status else "FAIL"
        print(f"{name:28s} rows={len(got):7d}  {tag} {' '.join(status)}")
        if status:
            failures.append(name)
    spark.stop()
    if failures:
        print("FAILED:", failures)
        return 1
    print("all queries match oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
