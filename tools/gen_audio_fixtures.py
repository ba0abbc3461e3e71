"""Regenerate the committed oracle fixtures for the audio/multimodal
driver queries (audio_match, audio_landmarks, media_byte_features).

These three queries synthesize their own deterministic input (seeded
Philox synth — sparkfp/synth.py), so their expected output is a fixed
table: precompute it once, commit it under fixtures/, and give each
query an ``oracle_sql`` of ``SELECT ... FROM read_parquet(fixture)``
so the driver's rows/schema/value-hash gate applies to them like any
SQL-expressible query. tests/test_matching.py::test_audio_fixtures_current
fails if the engine output drifts from the committed fixtures — rerun
this script (and review the diff!) after any intentional DSP/matcher
change.

Usage: python tools/gen_audio_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from sparkfp.session import get_spark  # noqa: E402

FIXTURE_DIR = entrymod.FIXTURE_DIR
AUDIO_QUERIES = entrymod.FIXTURE_QUERIES


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    spark = get_spark("gen-audio-fixtures", cores=8)
    qs = entrymod.queries()
    for name in AUDIO_QUERIES:
        pdf = qs[name](spark, "/root/testdata/sf0.001").toPandas()
        sort_cols = list(pdf.columns)
        pdf = pdf.sort_values(sort_cols).reset_index(drop=True)
        path = os.path.join(FIXTURE_DIR, f"{name}_expected.parquet")
        pdf.to_parquet(path, index=False)
        print(f"wrote {path}: {len(pdf)} rows, dtypes={dict(pdf.dtypes.astype(str))}")
    spark.stop()


if __name__ == "__main__":
    main()
