"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 (or $SF_DIR) and
compares row count + column names + order-insensitive values against
the DuckDB oracle_sql() twin. Stricter than the driver: values are
compared exactly after canonicalization (floats already rounded by
the queries themselves).

Usage: python tools/check_entry.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from sparkfp.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def canon(df_pandas):
    cols = sorted(df_pandas.columns)
    pdf = df_pandas[cols].copy()
    for c in cols:
        pdf[c] = pdf[c].map(lambda v: _norm(v))
    rows = sorted(
        map(tuple, pdf.values.tolist()),
        key=lambda r: tuple(str(x) for x in r),
    )
    return cols, rows


def _norm(v):
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if f == int(f) and abs(f) < 2**53:
            return int(f)
        return round(f, 9)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return str(v)
    return str(v)


def main(only: list[str]) -> int:
    spark = get_spark("check-entry", cores=8)
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # loud count so a silent driver-side truncation (round 4: 51
    # registered, 50 recorded, last row dropped) is visible locally
    print(
        f"[check_entry] {len(qs)} queries registered "
        f"({len(oracles)} with SQL oracles); driver records at most 50"
    )
    failures = 0
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            spark_pdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:160]}")
            failures += 1
            continue
        if name not in oracles:
            print(
                f"ok   {name}: rows-only ({len(spark_pdf)} rows, "
                f"{time.time()-t0:.1f}s, no oracle)"
            )
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:160]}")
            failures += 1
            continue
        # the driver's value-hash encodes the physical type width:
        # DuckDB HUGEINT (SUM default) vs Spark BIGINT hash-mismatches
        # even when values are equal — require identical dtypes so the
        # trap is caught locally (CAST the oracle, round 1 lesson).
        sd = {c: str(spark_pdf[c].dtype) for c in spark_pdf.columns}
        dd = {c: str(duck_pdf[c].dtype) for c in duck_pdf.columns}
        diff = {c: (sd.get(c), dd.get(c)) for c in set(sd) | set(dd)
                if sd.get(c) != dd.get(c)}
        if diff:
            print(f"FAIL {name}: dtype mismatch (spark, duck): {diff}")
            failures += 1
            continue
        sc, sr = canon(spark_pdf)
        dc, dr = canon(duck_pdf)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} != {dc}")
            failures += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount {len(sr)} != {len(dr)}")
            failures += 1
            continue
        if sr != dr:
            bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {bad}")
            failures += 1
            continue
        print(f"ok   {name}: {len(sr)} rows match ({time.time()-t0:.1f}s)")
    print(f"[check_entry] ran {ran}/{len(qs)} queries, {failures} failures")
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1:]) else 0)
