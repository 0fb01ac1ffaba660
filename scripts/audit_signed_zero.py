"""Signed-zero audit (round-7): for every queries() entry, compare the
Spark result against its DuckDB oracle at the BIT level on zero-valued
float cells — the driver's value hash distinguishes -0.0 from +0.0 even
though numeric comparison does not (the round-6 time_features red row).

Usage: python scripts/audit_signed_zero.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entry  # noqa: E402
from featureengineer_spark import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def zero_sign_profile(pdf: pd.DataFrame) -> dict:
    """column -> (n_pos_zero, n_neg_zero) over float columns."""
    out = {}
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            vals = pdf[c].dropna()
            zeros = vals[vals == 0.0]
            neg = sum(1 for v in zeros if math.copysign(1.0, v) < 0)
            out[c] = (len(zeros) - neg, neg)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", app_name="signed-zero-audit")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    con.execute("SET TimeZone='UTC'")
    queries = entry.queries()
    oracles = entry.oracle_sql()
    bad = []
    for name in sorted(oracles):
        if only and name not in only:
            continue
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} ERROR {exc}")
            bad.append(name)
            continue
        sp, op = zero_sign_profile(sdf), zero_sign_profile(odf)
        mism = {
            c: (sp.get(c), op.get(c))
            for c in set(sp) | set(op)
            if sp.get(c) != op.get(c)
        }
        if mism:
            print(f"{name:28s} ZERO-SIGN MISMATCH {mism}")
            bad.append(name)
        else:
            nz = sum(v[1] for v in op.values())
            flag = f"(-0.0 cells on both sides: {nz})" if nz else ""
            print(f"{name:28s} ok {flag}")
    print(f"\n{len(bad)} queries with signed-zero divergence: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
