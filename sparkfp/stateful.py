"""Stateful operators: run-state machine + rising-edge alert dedup.

Reference semantics (cited into /root/reference):

- **Run-state machine** (process_odr.py:1028-1084, config
  files/cement/cement_run_time_tags.json): per equipment,
  RUNNING -> (down for >= shutdown_window_h) -> SHUTDOWN
  -> (runs again) -> STARTING -> (for transition_window_h) -> RUNNING.
  Rows in SHUTDOWN/STARTING are excluded from rule evaluation.

- **Rising-edge alert dedup** (process_odr.py:1131-1145, state IO
  helpers.py:23-33): an alarm is emitted only if its rule was NOT
  active at the end of the previous run; state = {key: {rule_id: bool}}.

Both exist twice, sharing semantics:
- a **batch** form (pure DataFrame ops — gaps-and-islands + anti-join),
  used by the request-driven pipeline and the pytest oracles;
- a **streaming** form keyed on equipment via
  ``applyInPandasWithState`` (Arrow-batched per-group state), the
  analog of Flink keyed state (T6/T7 in SURVEY §2.7).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import streaks

RUNNING, SHUTDOWN, STARTING = "RUNNING", "SHUTDOWN", "STARTING"


# ------------------------------------------------------------------ batch


def run_state_batch(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    running_col: str,
    shutdown_window_s: int,
    transition_window_s: int,
    step_fallback_s: float = 60.0,
) -> DataFrame:
    """Label every row RUNNING / SHUTDOWN / STARTING.

    Gaps-and-islands formulation (no Python, one shuffle per window
    partition key):
      - a row is SHUTDOWN once its not-running streak reaches
        shutdown_window_s;
      - after a shutdown island, the next running island's first
        transition_window_s seconds are STARTING;
      - everything else is RUNNING.
    """
    down_flag = "_down"
    df = df.withColumn(down_flag, ~F.col(running_col))
    df = streaks.with_islands(df, key_cols, ts_col, down_flag)
    w_isl = Window.partitionBy(*key_cols, "island").orderBy(ts_col)
    w_key = Window.partitionBy(*key_cols).orderBy(ts_col)

    # elapsed seconds since this island began (state-machine clock:
    # time since the first row of the down/run episode, as in the
    # streaming form and the reference's downtime_state timestamps)
    elapsed = F.unix_timestamp(ts_col) - F.first(F.unix_timestamp(ts_col)).over(w_isl)
    df = df.withColumn("_elapsed", elapsed)

    is_shutdown = F.col(down_flag) & (F.col("_elapsed") >= shutdown_window_s)
    df = df.withColumn("_shut", is_shutdown)
    # island number of the most recent SHUTDOWN row at or before this row:
    # a running island i is "post-shutdown" iff that number is i-1
    # (its immediately preceding down island reached shutdown).
    last_shut_island = F.last(
        F.when(F.col("_shut"), F.col("island")), ignorenulls=True
    ).over(w_key.rowsBetween(Window.unboundedPreceding, 0))
    df = df.withColumn("_last_shut_island", last_shut_island)
    state = (
        F.when(is_shutdown, F.lit(SHUTDOWN))
        .when(
            (~F.col(down_flag))
            & (F.col("_last_shut_island") == F.col("island") - 1)
            & (F.col("_elapsed") < transition_window_s),
            F.lit(STARTING),
        )
        .otherwise(F.lit(RUNNING))
    )
    return df.withColumn("run_state", state).drop(
        down_flag, "_elapsed", "_shut", "_last_shut_island", "island"
    )


def dedup_rising_edge_batch(
    alarms: DataFrame, prev_state: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Drop alarms whose rule was already active at the end of the
    previous run (anti-join vs the state table — J4 in SURVEY §2.4)."""
    active = prev_state.filter(F.col("active")).select(*key_cols).distinct()
    return alarms.join(active, key_cols, "left_anti")


def alert_state_from(alarms: DataFrame, all_rules: DataFrame, key_cols: list[str]) -> DataFrame:
    """Produce the next run's state table: every known rule key, active
    where it alarmed (reference persists {equip: {rule_id: bool}})."""
    fired = alarms.select(*key_cols).distinct().withColumn("active", F.lit(True))
    return (
        all_rules.select(*key_cols)
        .distinct()
        .join(fired, key_cols, "left")
        .fillna(False, subset=["active"])
    )


# --------------------------------------------------------------- streaming


def run_state_stream(
    values: DataFrame,
    key_col: str,
    ts_col: str,
    running_col: str,
    shutdown_window_s: int,
    transition_window_s: int,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming run-state machine via applyInPandasWithState.

    Per-key state = (state, down_since_ms, start_since_ms); emits one
    labeled row per input row. Arrow-batched per group — the Flink
    keyed-state analog (T6).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, ts_ms long, running boolean, run_state string"
    state_schema = "state string, down_since_ms long, start_since_ms long"

    def fn(key, pdfs, state: GroupState):
        (k,) = key
        if state.exists:
            st, down_since, start_since = state.get
        else:
            st, down_since, start_since = RUNNING, None, None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, running in zip(pdf[ts_col], pdf[running_col]):
                ts = int(ts)
                if not running:
                    start_since = None
                    if down_since is None:
                        down_since = ts
                    if st != SHUTDOWN and ts - down_since >= shutdown_window_s * 1000:
                        st = SHUTDOWN
                    label = SHUTDOWN if st == SHUTDOWN else RUNNING
                else:
                    if st == SHUTDOWN:
                        st = STARTING
                        start_since = ts
                    down_since = None
                    if st == STARTING:
                        if ts - start_since >= transition_window_s * 1000:
                            st = RUNNING
                            start_since = None
                    label = st
                rows.append((k, ts, bool(running), label))
        state.update((st, down_since, start_since))
        yield pd.DataFrame(rows, columns=[key_col, "ts_ms", "running", "run_state"])

    with_time = values.withColumn("event_time", F.timestamp_millis(F.col(ts_col)))
    return (
        with_time.withWatermark("event_time", watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
