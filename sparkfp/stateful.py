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
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Label every row RUNNING / SHUTDOWN / STARTING.

    Gaps-and-islands formulation (no Python, one shuffle per window
    partition key):
      - a row is SHUTDOWN once its not-running streak reaches
        shutdown_window_s;
      - after a shutdown, running rows within transition_window_s of
        the FIRST running row after that shutdown are STARTING. The
        STARTING clock survives brief dips: the reference keeps
        start_time across not-running rows and clears it only on a
        full shutdown (process_odr.py:1050-1065), so a dip inside the
        transition window neither crashes nor restarts the clock;
      - everything else is RUNNING.

    ``order_cols``: deterministic tiebreak ordering (ts plus an id
    column); required whenever (key, ts) is not unique.
    """
    order = list(order_cols) if order_cols else [ts_col]
    down_flag = "_down"
    df = df.withColumn(down_flag, ~F.col(running_col))
    df = streaks.with_islands(df, key_cols, ts_col, down_flag, order_cols=order)
    w_isl = Window.partitionBy(*key_cols, "island").orderBy(*order)
    w_key = Window.partitionBy(*key_cols).orderBy(*order)
    cum = Window.unboundedPreceding, 0

    ts_s = F.unix_timestamp(ts_col)
    # seconds since this down/run episode began (state-machine clock:
    # the reference's downtime_state timestamps count from the first
    # row of the episode)
    df = df.withColumn("_ts_s", ts_s).withColumn(
        "_elapsed", F.col("_ts_s") - F.first("_ts_s").over(w_isl)
    )
    is_shutdown = F.col(down_flag) & (F.col("_elapsed") >= shutdown_window_s)
    df = df.withColumn("_shut", is_shutdown)
    # STARTING clock origin = the first running row after the most
    # recent shutdown row. Everything below stays on the SAME window
    # partitioning (key, ordered by `order`) so the whole operator is
    # ONE shuffle — a (key, cohort)-partitioned window would add a
    # second exchange. Row positions (not timestamps) drive the
    # comparisons so ts ties cannot misattribute cohort starts.
    pos = F.row_number().over(w_key)
    df = df.withColumn("_pos", pos)
    last_shut_pos = F.max(F.when(F.col("_shut"), F.col("_pos"))).over(
        w_key.rowsBetween(*cum)
    )
    prev_run_pos = F.max(F.when(~F.col(down_flag), F.col("_pos"))).over(
        w_key.rowsBetween(Window.unboundedPreceding, -1)
    )
    # a running row opens a cohort iff the last shutdown is more recent
    # than the previous running row
    is_start = (
        (~F.col(down_flag))
        & last_shut_pos.isNotNull()
        & (F.coalesce(prev_run_pos, F.lit(-1)) < last_shut_pos)
    )
    df = df.withColumn("_is_start", is_start)
    # latest cohort-start ts at or before this row == this row's cohort
    # start (cohort starts are ordered)
    df = df.withColumn(
        "_start_s",
        F.max(F.when(F.col("_is_start"), F.col("_ts_s"))).over(
            w_key.rowsBetween(*cum)
        ),
    )
    state = (
        F.when(F.col("_shut"), F.lit(SHUTDOWN))
        .when(
            (~F.col(down_flag))
            & F.col("_start_s").isNotNull()
            & (F.col("_ts_s") - F.col("_start_s") < transition_window_s),
            F.lit(STARTING),
        )
        .otherwise(F.lit(RUNNING))
    )
    return df.withColumn("run_state", state).drop(
        down_flag, "_ts_s", "_elapsed", "_shut", "_pos", "_is_start",
        "_start_s", "island",
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


def rate_limit_per_key(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    min_interval_s: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """T8: per-key rate limiter (reference _should_run_equip_analyse,
    llm_job.py:57-70: run the side action iff >= min_interval since the
    key's last run, then record the run). Event-time formulation so
    results are deterministic and replayable — the reference compares
    against the wall clock.

    The emit decision is a greedy chain (each emission moves the
    threshold), which no window function expresses — it's a per-key
    sequential dependency, so this is applyInPandas per key (one
    shuffle; groups are independent, any key cardinality scales out).
    Within a group the chain is computed by searchsorted jumps: each
    emission looks up the next emittable row in O(log n), so the Python
    loop runs once per EMITTED row, not once per input row (a group of
    n rows with e emissions costs O(n log n) numpy + O(e) Python).
    Emits the surviving rows unchanged.
    """
    import numpy as np
    import pandas as pd  # noqa: F401

    # ts_col always leads the sort: the searchsorted chain below is only
    # correct on a non-decreasing ts array, so order_cols are tiebreaks
    # after ts, never a reordering of it (a caller-supplied order not
    # led by ts would silently produce a wrong emit set).
    extra = [c for c in (order_cols or []) if c != ts_col]
    order = [ts_col, *extra]
    schema = df.schema

    def limit(pdf):
        pdf = pdf.sort_values(order).reset_index(drop=True)
        ts = (
            pdf[ts_col].astype("datetime64[ns]").astype(np.int64) // 10**9
        ).to_numpy()
        # correctness-critical invariant: raise, don't assert — assert
        # is stripped under `python -O` and the searchsorted chain
        # would silently produce a wrong emit set on a decreasing ts
        if len(ts) and not (np.diff(ts) >= 0).all():
            raise ValueError("rate_limit_per_key: ts must lead the sort")
        # nxt[i] = first row index emittable after an emission at row i
        nxt = np.searchsorted(ts, ts + min_interval_s, side="left")
        keep_idx = []
        i, n = 0, len(ts)
        while i < n:
            keep_idx.append(i)
            i = nxt[i]
        return pdf.iloc[keep_idx]

    return df.groupBy(*key_cols).applyInPandas(limit, schema)


def rate_limit_stream(
    values: DataFrame,
    key_col: str,
    ts_col: str,
    min_interval_s: int,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming T8: keyed state = (last emitted event-time, buffer of
    pending event-times). Rows are BUFFERED until the watermark passes
    them, then released in event-time order through the same greedy
    chain as the batch path — so out-of-order arrival across
    micro-batches (any disorder within the watermark delay) yields
    exactly the batch/oracle emit set; rows later than the watermark
    are dropped by Spark upstream (standard T2 semantics). The Flink
    keyed-state analog of the reference's persisted last_run_by_equip
    dict (llm_job.py:40-70).

    An EventTimeTimeout is armed at the earliest buffered row so tails
    flush in Spark's no-data micro-batch once the watermark advances —
    a group doesn't need new input to release ripe rows. Like any
    watermark-closed operator, rows within the final watermark delay of
    stream end stay buffered until a later event advances the
    watermark.
    """
    import bisect

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, ts_ms long"
    state_schema = "last_emit_ms long, buf array<long>"

    def fn(key, pdfs, state: GroupState):
        (k,) = key
        if state.exists:
            last, buf = state.get
            buf = list(buf) if buf is not None else []
        else:
            last, buf = None, []
        for pdf in pdfs:
            buf.extend(int(t) for t in pdf[ts_col])
        buf.sort()
        wm = state.getCurrentWatermarkMs()
        # STRICT t < wm, matching EventTimeTimeout's firing condition
        # (timeout fires only when the watermark strictly exceeds the
        # armed timestamp). With t <= wm here, a watermark landing
        # exactly on an event time would release it in input-driven
        # groups but not timeout-only groups — one batch of skew between
        # the two release paths (and silent doc drops in the near-dup
        # collapse, which needs all bands in ONE batch).
        cut = bisect.bisect_left(buf, wm)
        ready, buf = buf[:cut], buf[cut:]
        out = []
        for ts in ready:
            if last is None or ts - last >= min_interval_s * 1000:
                out.append((k, ts))
                last = ts
        state.update((last, buf))
        if buf:
            state.setTimeoutTimestamp(max(buf[0], wm + 1))
        yield pd.DataFrame(out, columns=[key_col, "ts_ms"])

    with_time = values.withColumn("event_time", F.timestamp_millis(F.col(ts_col)))
    return (
        with_time.withWatermark("event_time", watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def tws_available() -> bool:
    """SURVEY.md §7.5.7 version probe: True iff this PySpark can RUN
    the Spark-4 transformWithStateInPandas API. That needs both the
    API surface (StatefulProcessor + typed state + timers, Spark 4.0+)
    and the protobuf runtime its Python state-server protocol is built
    on (pyspark/sql/streaming/proto imports google.protobuf at worker
    startup; without it the driver worker crashes at plan time with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE — measured in this
    sandbox, which ships the 4.1 API but no protobuf). Callers pick
    the TWS implementation when this returns True and fall back to
    applyInPandasWithState otherwise."""
    try:
        import google.protobuf  # noqa: F401
        from pyspark.sql.pandas.group_ops import PandasGroupedOpsMixin
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError:
        return False
    return hasattr(PandasGroupedOpsMixin, "transformWithStateInPandas")


def make_rate_limit_processor(key_col: str, ts_col: str, min_interval_s: int):
    """Build the StatefulProcessor behind rate_limit_stream_tws.

    Factored out so the greedy-release logic is drivable with stub
    state/timer objects in tests even on runtimes where the TWS state
    server can't start (tws_available() False) — the class only touches
    the documented ValueState/ListState/handle surface."""
    import bisect

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    interval_ms = min_interval_s * 1000

    class _RateLimiter(StatefulProcessor):
        def init(self, handle) -> None:
            self.handle = handle
            self.last = handle.getValueState("last_emit", "last_emit_ms long")
            self.buf = handle.getListState("buf", "ts long")

        def _release(self, k: str, wm: int):
            buf = sorted(int(r[0]) for r in self.buf.get()) if self.buf.exists() else []
            # STRICT t < wm: same release rule as the
            # applyInPandasWithState twin (see its docstring)
            cut = bisect.bisect_left(buf, wm)
            ready, rest = buf[:cut], buf[cut:]
            got = self.last.get() if self.last.exists() else None
            last = got[0] if got is not None else None
            out = []
            for ts in ready:
                if last is None or ts - last >= interval_ms:
                    out.append((k, ts))
                    last = ts
            if last is not None:
                self.last.update((last,))
            # materialize before deleting: listTimers streams from the
            # state server and deleting mid-iteration is undefined
            for t in list(self.handle.listTimers()):
                self.handle.deleteTimer(t)
            if rest:
                self.buf.put([(t,) for t in rest])
                self.handle.registerTimer(max(rest[0], wm + 1))
            else:
                self.buf.clear()
            return out

        def handleInputRows(self, key, rows, timerValues):
            (k,) = key
            new = []
            for pdf in rows:
                new.extend(int(t) for t in pdf[ts_col])
            if new:
                self.buf.appendList([(t,) for t in new])
            out = self._release(k, timerValues.getCurrentWatermarkInMs())
            if out:
                yield pd.DataFrame(out, columns=[key_col, "ts_ms"])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (k,) = key
            out = self._release(k, timerValues.getCurrentWatermarkInMs())
            if out:
                yield pd.DataFrame(out, columns=[key_col, "ts_ms"])

        def close(self) -> None:
            pass

    return _RateLimiter()


def rate_limit_stream_tws(
    values: DataFrame,
    key_col: str,
    ts_col: str,
    min_interval_s: int,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming T8 on the Spark-4 transformWithStateInPandas API: the
    exact semantics of rate_limit_stream (buffer until the watermark
    passes a row, then release through the event-time greedy chain;
    strict t < wm release) re-expressed as a StatefulProcessor with
    typed state — a ValueState for the last emitted event-time, a
    ListState for the pending buffer — and an event-time timer armed at
    the earliest buffered row so tails flush in no-data micro-batches.
    Same reference anchor as the applyInPandasWithState twin
    (llm_job.py:40-70); batch==stream==oracle equality is asserted for
    BOTH implementations by the same test (probe-gated), and the
    processor logic itself by a stub-state harness test.
    """
    out_schema = f"{key_col} string, ts_ms long"
    with_time = values.withColumn("event_time", F.timestamp_millis(F.col(ts_col)))
    return (
        with_time.withWatermark("event_time", watermark)
        .groupBy(key_col)
        .transformWithStateInPandas(
            make_rate_limit_processor(key_col, ts_col, min_interval_s),
            out_schema, "append", "eventTime",
        )
    )


def rate_limit_stream_auto(
    values: DataFrame,
    key_col: str,
    ts_col: str,
    min_interval_s: int,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Runtime dispatch (SURVEY.md §7.5.7): transformWithStateInPandas
    when the session's PySpark has it, applyInPandasWithState
    otherwise. Both produce the same emit set."""
    impl = rate_limit_stream_tws if tws_available() else rate_limit_stream
    return impl(values, key_col, ts_col, min_interval_s, watermark)


# --------------------------------------------------------------- streaming


def _run_state_step(
    st, down_since, start_since, ts, running, shutdown_ms, transition_ms
):
    """One run-state-machine transition (T6), shared by the
    applyInPandasWithState and transformWithStateInPandas twins so the
    two streaming implementations cannot drift. Reference semantics:
    process_odr.py:1028-1084 — a full shutdown is the only thing that
    clears the STARTING clock (brief dips survive)."""
    if not running:
        if down_since is None:
            down_since = ts
        if st != SHUTDOWN and ts - down_since >= shutdown_ms:
            st = SHUTDOWN
            start_since = None
        label = SHUTDOWN if st == SHUTDOWN else RUNNING
    else:
        if st == SHUTDOWN:
            st = STARTING
            start_since = ts
        down_since = None
        if st == STARTING:
            if start_since is None:  # resumed from persisted state
                start_since = ts
            if ts - start_since >= transition_ms:
                st = RUNNING
                start_since = None
        label = st
    return st, down_since, start_since, label


def make_run_state_processor(
    key_col: str,
    ts_col: str,
    running_col: str,
    shutdown_window_s: int,
    transition_window_s: int,
):
    """Build the StatefulProcessor behind run_state_stream_tws.

    Factored out (like make_rate_limit_processor) so the transition
    logic is drivable with stub state objects in tests even on
    runtimes where the TWS state server can't start. One ValueState
    holds the whole machine (state, down_since_ms, start_since_ms);
    no timers — the machine emits one labeled row per input row."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    sh_ms = shutdown_window_s * 1000
    tr_ms = transition_window_s * 1000

    class _RunState(StatefulProcessor):
        def init(self, handle) -> None:
            self.machine = handle.getValueState(
                "machine",
                "state string, down_since_ms long, start_since_ms long",
            )

        def handleInputRows(self, key, rows, timerValues):
            (k,) = key
            got = self.machine.get() if self.machine.exists() else None
            st, down_since, start_since = (
                got if got is not None else (RUNNING, None, None)
            )
            out = []
            for pdf in rows:
                pdf = pdf.sort_values(ts_col)
                for ts, running in zip(pdf[ts_col], pdf[running_col]):
                    ts, running = int(ts), bool(running)
                    st, down_since, start_since, label = _run_state_step(
                        st, down_since, start_since, ts, running,
                        sh_ms, tr_ms,
                    )
                    out.append((k, ts, running, label))
            self.machine.update((st, down_since, start_since))
            if out:
                yield pd.DataFrame(
                    out, columns=[key_col, "ts_ms", "running", "run_state"]
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            return iter(())

        def close(self) -> None:
            pass

    return _RunState()


def run_state_stream_tws(
    values: DataFrame,
    key_col: str,
    ts_col: str,
    running_col: str,
    shutdown_window_s: int,
    transition_window_s: int,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming T6 on the Spark-4 transformWithStateInPandas API —
    the second TWS twin (SURVEY.md §7.5.7), exact same semantics as
    run_state_stream re-expressed with typed ValueState. timeMode
    'none': the machine registers no timers (emission is row-driven),
    so only the watermark's late-row drop involves event time."""
    out_schema = (
        f"{key_col} string, ts_ms long, running boolean, run_state string"
    )
    with_time = values.withColumn(
        "event_time", F.timestamp_millis(F.col(ts_col))
    )
    return (
        with_time.withWatermark("event_time", watermark)
        .groupBy(key_col)
        .transformWithStateInPandas(
            make_run_state_processor(
                key_col, ts_col, running_col,
                shutdown_window_s, transition_window_s,
            ),
            out_schema, "append", "none",
        )
    )


def run_state_stream_auto(
    values: DataFrame,
    key_col: str,
    ts_col: str,
    running_col: str,
    shutdown_window_s: int,
    transition_window_s: int,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Runtime dispatch (SURVEY.md §7.5.7): transformWithStateInPandas
    when the session's PySpark can run it, applyInPandasWithState
    otherwise. Both twins produce identical labeled rows."""
    impl = run_state_stream_tws if tws_available() else run_state_stream
    return impl(
        values, key_col, ts_col, running_col,
        shutdown_window_s, transition_window_s, watermark,
    )


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
                ts, running = int(ts), bool(running)
                st, down_since, start_since, label = _run_state_step(
                    st, down_since, start_since, ts, running,
                    shutdown_window_s * 1000, transition_window_s * 1000,
                )
                rows.append((k, ts, running, label))
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
