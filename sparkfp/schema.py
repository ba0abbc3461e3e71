"""Canonical StructTypes for every table flowing through the engine.

Reference shapes (cited into /root/reference):
- sensor event   -> src/flink_job/models.py:5-9   (equip_id, timestamp ms, data map)
- unnested tuple -> src/flink_job/job.py:69-74    (STRING, STRING, FLOAT, LONG)
- fingerprint    -> src/flink_job/models.py:12-19 + serialization.py:23-38
- clip table     -> BASELINE.json input_hint (audio graft input)
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- sensors

SENSOR_EVENT = T.StructType(
    [
        T.StructField("equip_id", T.StringType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        # tag id -> stringified float or the literal "null"
        # (reference: src/generator/data_generator.py:20-23)
        T.StructField("data", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

# post-flatMap long form; value is float32 on the wire
# (reference: src/flink_job/job.py:69-74 uses Types.FLOAT())
SENSOR_VALUE = T.StructType(
    [
        T.StructField("equip_id", T.StringType(), False),
        T.StructField("sensor_id", T.StringType(), False),
        T.StructField("value", T.FloatType(), False),
        T.StructField("ts_ms", T.LongType(), False),
    ]
)

STATS = T.StructType(
    [
        T.StructField("min", T.DoubleType(), False),
        T.StructField("max", T.DoubleType(), False),
        T.StructField("median", T.DoubleType(), False),
        T.StructField("mean", T.DoubleType(), False),
        T.StructField("std_dev", T.DoubleType(), False),
    ]
)

FINGERPRINT = T.StructType(
    [
        # deterministic id replaces the reference's uuid4
        # (src/flink_job/serialization.py:31 — SURVEY.md §7.5.4)
        T.StructField("uuid", T.StringType(), False),
        T.StructField("equip_id", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("start_ms", T.LongType(), False),
        T.StructField("end_ms", T.LongType(), False),
        T.StructField("data", T.MapType(T.StringType(), STATS), False),
    ]
)

# ---------------------------------------------------------------- audio graft

# BASELINE.json input_hint: Iceberg table of audio clip + transcript pairs.
CLIP = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("sr_hz", T.IntegerType(), False),
        T.StructField("dur_ms", T.IntegerType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("transcript", T.StringType(), False),
        # event-time column for the streaming pipeline (epoch ms the clip arrived)
        T.StructField("event_ms", T.LongType(), False),
    ]
)

# one landmark hash: analog of the unnested sensor tuple
# (1 clip -> N hashes; reference flatMap at src/flink_job/job.py:63-75)
LANDMARK = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("hash", T.LongType(), False),
        T.StructField("t_ms", T.IntegerType(), False),  # anchor offset within clip
        T.StructField("event_ms", T.LongType(), False),
    ]
)

# reference track index row (FIXTURES.md F5)
INDEX_ENTRY = T.StructType(
    [
        T.StructField("hash", T.LongType(), False),
        T.StructField("track_id", T.StringType(), False),
        T.StructField("t_track_ms", T.IntegerType(), False),
    ]
)

MATCH = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("matched_track", T.StringType(), False),
        T.StructField("offset_ms", T.LongType(), False),
        T.StructField("vote_count", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)
