"""Batch sources/sinks beyond parquet: CSV round-trip with the
reference's storage timezone convention, JSONL sink, metadata
dimension loading.

Reference shapes (cited into /root/reference):
- S6 CSV save/load with +05:30 offset applied on save and removed on
  load, RUNNING_FLAG dropped on reload
  (src/data_input/kiln_data_producer.py:200-287, process_odr.py:1098-1106)
- S8 JSONL sink, one record per line (generate_fingerprints.py:226-231)
- S10 Excel metadata mapping -> in-memory dict
  (kiln_data_producer.py:98-108); here: any small dim table ->
  broadcast-ready DataFrame (openpyxl isn't in this container, so the
  Excel reader is gated behind an import-try; CSV/parquet dims load
  directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IST_OFFSET = "INTERVAL 5 HOURS 30 MINUTES"  # reference storage convention (E12)


def save_csv_ist(df: DataFrame, path: str, ts_col: str) -> None:
    """Write CSV with timestamps shifted to IST (+05:30), header on —
    byte-compatible with the reference's alerts_dataframe CSVs."""
    shifted = df.withColumn(ts_col, F.col(ts_col) + F.expr(IST_OFFSET))
    shifted.write.mode("overwrite").option("header", True).csv(path)


def load_csv_ist(
    spark: SparkSession, path: str, ts_col: str, drop_cols: tuple[str, ...] = ("RUNNING_FLAG",)
) -> DataFrame:
    """Reload a CSV written by save_csv_ist: subtract the offset, drop
    the replay-only columns (reference drops RUNNING_FLAG on reload)."""
    df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    df = df.withColumn(ts_col, F.col(ts_col) - F.expr(IST_OFFSET))
    for c in drop_cols:
        if c in df.columns:
            df = df.drop(c)
    return df


def write_jsonl(df: DataFrame, path: str) -> None:
    """One JSON document per line (S8)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def kafka_clip_source(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    starting_offsets: str = "latest",
):
    """S1: Kafka clip stream (value = JSON clip row). Requires the
    spark-sql-kafka connector jar on the classpath (not bundled in this
    sandbox — the parquet-dir stream in sparkfp.streaming carries the
    same micro-batch semantics). Reference starts at latest offsets
    (src/flink_job/kafka_config.py:29)."""
    from pyspark.sql import functions as F

    from . import schema

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema.CLIP).alias("c")
    ).select("c.*")


def kafka_json_sink(df: DataFrame, bootstrap: str, topic: str, checkpoint: str):
    """S2: JSON rows -> Kafka (connector jar required; the exactly-once
    parquet/Iceberg sink in sparkfp.sink is the default here)."""
    from pyspark.sql import functions as F

    payload = df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


def load_metadata_dim(spark: SparkSession, path: str, sheet: str | None = None) -> DataFrame:
    """Small metadata mapping -> broadcast-ready dim DataFrame.

    xlsx requires openpyxl (absent here) -> import-try; csv/parquet
    load natively. The result is intended for joins.broadcast_lookup.
    """
    if path.endswith(".xlsx"):
        try:
            import openpyxl  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "xlsx metadata needs openpyxl; convert to csv/parquet"
            ) from e
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet or 0, engine="openpyxl")
        return spark.createDataFrame(pdf)
    if path.endswith(".csv"):
        return spark.read.option("header", True).option("inferSchema", True).csv(path)
    return spark.read.parquet(path)
