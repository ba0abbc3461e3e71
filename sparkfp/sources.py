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


# ------------------------------------------------------------- S5 REST


def group_tags(equipment_name: str, mapping: dict) -> list[dict]:
    """Tag dedup (reference api.py:37-56): generic params that map to
    the same physical (machine, tag) share ONE request; each fetched
    record fans back out to every generic param in the group."""
    groups: dict[tuple[str, str], list[str]] = {}
    for generic_param, equipment_tag in mapping.items():
        if isinstance(equipment_tag, dict):
            key = (equipment_tag["equipment"], equipment_tag["tag"])
        else:
            key = (equipment_name, equipment_tag)
        groups.setdefault(key, []).append(generic_param)
    return [
        {"machine": m, "tag": t, "params": ps}
        for (m, t), ps in sorted(groups.items())
    ]


def _default_fetch(url: str, payload: str, headers: dict) -> tuple[int, str]:
    """POST the reference's request shape; returns (status, body).
    stdlib-only so executors need no extra deps."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url,
        data=payload.encode(),
        headers={"Content-Type": "application/json", **(headers or {})},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:  # non-2xx still has a body/status
        return e.code, e.read().decode()


def rest_timeseries_source(
    spark: SparkSession,
    equipment_name: str,
    mapping: dict,
    start: int,
    end: int,
    url: str,
    headers: dict | None = None,
    max_retries: int = 3,
    base_delay: float = 1.0,
    fetch=None,
) -> DataFrame:
    """S5: REST time-series source (reference api.py:18-154), made
    distributed: the deduped tag groups become a small request table
    and ``mapInPandas`` fan-outs the HTTP fetches across executors —
    each task runs the reference's retry loop (HTTP 429 -> exponential
    backoff ``base_delay * 2**attempt`` up to ``max_retries``; other
    non-200 or an ``{"error": ...}`` payload -> tag skipped), parses
    dict-or-list JSON bodies, and fans each record out to every generic
    param mapped to the tag. At a real deployment the request table is
    (tag x time-slice) so a backfill parallelizes over both; the
    per-task logic is identical.

    Returns (param, machine, tag, timestamp, value) rows. ``fetch``
    is injectable for tests (signature: (url, payload, headers) ->
    (status_code, body_text)); default is a stdlib urllib POST.
    """
    import json as _json

    from pyspark.sql import types as T

    groups = group_tags(equipment_name, mapping)
    req_schema = T.StructType(
        [
            T.StructField("machine", T.StringType()),
            T.StructField("tag", T.StringType()),
            T.StructField("params", T.ArrayType(T.StringType())),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("param", T.StringType()),
            T.StructField("machine", T.StringType()),
            T.StructField("tag", T.StringType()),
            T.StructField("timestamp", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    requests_df = spark.createDataFrame(groups, req_schema).repartition(
        max(len(groups), 1)
    )
    do_fetch = fetch or _default_fetch
    hdrs = dict(headers or {})

    def run(batches):
        import time as _time

        import pandas as pd

        for pdf in batches:
            rows = []
            for machine, tag, params in zip(pdf["machine"], pdf["tag"], pdf["params"]):
                payload = _json.dumps(
                    {
                        "machineName": machine,
                        "parameterName": tag,
                        "min": start,
                        "max": end,
                    }
                )
                records = None
                for attempt in range(max_retries):
                    status, body = do_fetch(url, payload, hdrs)
                    if status == 429:
                        _time.sleep(base_delay * (2**attempt))
                        continue
                    if status != 200:
                        break
                    parsed = _json.loads(body)
                    if isinstance(parsed, dict):
                        if "error" in parsed:
                            break
                        parsed = [parsed]
                    records = parsed
                    break
                if not records:
                    continue  # skipped tag (reference logs + moves on)
                for param in params:
                    for rec in records:
                        rows.append(
                            (
                                param,
                                machine,
                                tag,
                                int(rec["timestamp"]),
                                float(rec["value"]),
                            )
                        )
            yield pd.DataFrame(
                rows, columns=["param", "machine", "tag", "timestamp", "value"]
            )

    return requests_df.mapInPandas(run, out_schema)
