"""Dump .explain('formatted') for every declared query to plans/r07/.

Usage: python tools/dump_plans.py <suffix> [query ...]
Writes plans/r07/<name>_<suffix>.txt for each declared query (or the
named subset). Measurement-only tool (guide §1): not part of bench.py.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sparkfp.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("sparkfp-plans")
    qs = entrymod.queries()
    os.makedirs(OUT, exist_ok=True)
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print("ok", name)
        except Exception as e:
            print("FAIL", name, repr(e))
    spark.stop()


if __name__ == "__main__":
    main()
