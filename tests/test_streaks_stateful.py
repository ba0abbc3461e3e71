"""Streak-trigger and run-state machine tests vs literal oracles.

Oracles are verbatim ports of the reference's per-row loops:
- streak trigger: process_odr.py:269-303 (fire at first row where
  accumulated True-duration >= duration_s; reset on False)
- run-state machine: process_odr.py:1028-1084
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkfp import stateful, streaks


def _streak_oracle(ts_list, flags, duration_s, step_s=60.0):
    """Reference loop: returns indices where an alarm fires."""
    fired, cum, prev_ts, active = [], 0.0, None, False
    for i, (ts, flag) in enumerate(zip(ts_list, flags)):
        dt = (ts - prev_ts).total_seconds() if prev_ts is not None else step_s
        prev_ts = ts
        if flag:
            cum += dt
            if cum >= duration_s and not active:
                fired.append(i)
                active = True
        else:
            cum = 0.0
            active = False
    return fired


@pytest.fixture(scope="module")
def flag_frame(spark):
    ts = pd.date_range("2026-01-01", periods=60, freq="1min")
    flags = [False] * 5 + [True] * 10 + [False] * 3 + [True] * 2 + [False] * 10 + [True] * 30
    pdf = pd.DataFrame({"k": "E1", "timestamp": ts, "active": flags,
                        "duration_s": 300})
    return spark.createDataFrame(pdf), pdf


def test_streak_trigger_matches_oracle(spark, flag_frame):
    df, pdf = flag_frame
    got = streaks.streak_triggers(
        df, ["k"], "timestamp", "active", "duration_s"
    ).toPandas()
    exp_idx = _streak_oracle(list(pdf.timestamp), list(pdf.active), 300)
    exp_ts = set(pdf.timestamp.iloc[exp_idx])
    assert set(got.timestamp) == exp_ts
    assert len(got) == len(exp_idx) > 0


def test_streak_duration_resets(spark, flag_frame):
    df, pdf = flag_frame
    out = (
        streaks.with_streak_duration(df, ["k"], "timestamp", "active")
        .orderBy("timestamp")
        .toPandas()
    )
    assert (out.loc[~out.active, "streak_s"] == 0).all()
    # first row of the 30-long streak restarts accumulation
    tail = out.iloc[-30:]
    assert tail.streak_s.iloc[0] == 60.0
    assert tail.streak_s.is_monotonic_increasing


def _run_state_oracle(ts_list, running, shutdown_s, transition_s, step_s=60.0):
    # per-row port of the reference state machine (process_odr.py:1028-1084);
    # note start_since survives brief dips — the reference clears start_time
    # only on a full shutdown (process_odr.py:1050-1065)
    st, down_since, start_since = "RUNNING", None, None
    labels = []
    for ts, run in zip(ts_list, running):
        ts_ms = int(ts.timestamp() * 1000)
        if not run:
            if down_since is None:
                down_since = ts_ms
            if st != "SHUTDOWN" and ts_ms - down_since >= shutdown_s * 1000:
                st, start_since = "SHUTDOWN", None
            labels.append("SHUTDOWN" if st == "SHUTDOWN" else "RUNNING")
        else:
            if st == "SHUTDOWN":
                st, start_since = "STARTING", ts_ms
            down_since = None
            if st == "STARTING":
                if start_since is None:
                    start_since = ts_ms
                if ts_ms - start_since >= transition_s * 1000:
                    st, start_since = "RUNNING", None
            labels.append(st)
    return labels


@pytest.fixture(scope="module")
def run_frame(spark):
    ts = pd.date_range("2026-01-01", periods=120, freq="1min")
    running = (
        [True] * 20          # running
        + [False] * 30       # long outage -> SHUTDOWN after 10 min
        + [True] * 5         # restart -> STARTING (15-min transition)
        + [False] * 2        # dip DURING STARTING: clock survives, no crash
        + [True] * 33        # STARTING until 15 min after restart, then RUNNING
        + [False] * 5        # short dip (< shutdown window) -> stays RUNNING
        + [True] * 25
    )
    pdf = pd.DataFrame({"k": "E1", "timestamp": ts, "running": running})
    pdf["ts_ms"] = (pdf.timestamp.astype("int64") // 10**6)
    return spark.createDataFrame(pdf), pdf


def test_run_state_batch_matches_oracle(spark, run_frame):
    df, pdf = run_frame
    got = (
        stateful.run_state_batch(
            df, ["k"], "timestamp", "running",
            shutdown_window_s=600, transition_window_s=900,
        )
        .orderBy("timestamp")
        .toPandas()
    )
    exp = _run_state_oracle(list(pdf.timestamp), list(pdf.running), 600, 900)
    mismatches = [
        (i, g, e)
        for i, (g, e) in enumerate(zip(got.run_state, exp))
        if g != e
    ]
    assert not mismatches, mismatches[:10]


def _run_state_impl(name):
    """'state' = applyInPandasWithState, 'tws' = the Spark-4
    transformWithStateInPandas twin (skipped where the TWS state
    server can't start)."""
    if name == "tws":
        if not stateful.tws_available():
            pytest.skip("transformWithStateInPandas not runnable here")
        return stateful.run_state_stream_tws
    return stateful.run_state_stream


@pytest.mark.parametrize("impl_name", ["state", "tws"])
def test_run_state_stream_matches_batch(spark, run_frame, tmp_path, impl_name):
    df, pdf = run_frame
    from sparkfp import streaming
    from sparkfp.sink import ExactlyOnceParquetSink

    src_dir, sink_dir, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    streaming.write_stream_source(
        df.select("k", "ts_ms", "running"), src_dir, n_files=4, order_col="ts_ms"
    )
    src = (
        spark.readStream.schema("k string, ts_ms long, running boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    labeled = _run_state_impl(impl_name)(
        src, "k", "ts_ms", "running",
        shutdown_window_s=600, transition_window_s=900,
    )
    sink = ExactlyOnceParquetSink(sink_dir)
    q = (
        labeled.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sink.read(spark).orderBy("ts_ms").toPandas()
    exp = _run_state_oracle(list(pdf.timestamp), list(pdf.running), 600, 900)
    assert len(got) == len(exp)
    assert list(got.run_state) == exp


def test_rising_edge_dedup(spark):
    alarms = spark.createDataFrame(
        [("E1", "r1"), ("E1", "r2"), ("E2", "r1")], "equip string, rule_id string"
    )
    prev = spark.createDataFrame(
        [("E1", "r1", True), ("E1", "r2", False), ("E2", "r1", False)],
        "equip string, rule_id string, active boolean",
    )
    out = stateful.dedup_rising_edge_batch(alarms, prev, ["equip", "rule_id"])
    got = {(r.equip, r.rule_id) for r in out.collect()}
    assert got == {("E1", "r2"), ("E2", "r1")}  # E1/r1 was already active
    nxt = stateful.alert_state_from(out, alarms, ["equip", "rule_id"]).collect()
    state = {(r.equip, r.rule_id): r.active for r in nxt}
    assert state[("E1", "r2")] and state[("E2", "r1")] and not state[("E1", "r1")]


def test_run_state_batch_is_single_shuffle(spark, run_frame):
    """The whole batch state machine stays on one window partitioning
    (the key): a second (key, cohort) exchange would double the shuffle
    volume of every run-state query at scale."""
    df, _ = run_frame
    out = stateful.run_state_batch(
        df, ["k"], "timestamp", "running",
        shutdown_window_s=600, transition_window_s=900,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def _rate_limit_impl(name):
    """Both streaming T8 implementations must pass the same equality:
    'state' = applyInPandasWithState, 'tws' = the Spark-4
    transformWithStateInPandas StatefulProcessor twin (probe-gated:
    skipped on runtimes without the API, SURVEY.md §7.5.7)."""
    if name == "tws":
        if not stateful.tws_available():
            pytest.skip("transformWithStateInPandas not in this PySpark")
        return stateful.rate_limit_stream_tws
    return stateful.rate_limit_stream


@pytest.mark.parametrize("impl_name", ["state", "tws"])
def test_rate_limit_batch_equals_stream_equals_oracle(spark, tmp_path, impl_name):
    """T8 per-key rate limiter: batch (applyInPandas chain) == streaming
    (keyed state) == the reference greedy chain (llm_job.py:57-70 in
    event time): emit iff >= min_interval since the last EMITTED row."""
    from sparkfp import streaming
    from sparkfp.sink import ExactlyOnceParquetSink

    ts = pd.date_range("2026-01-01", periods=50, freq="7min")
    pdf = pd.DataFrame({"k": ["E1"] * 30 + ["E2"] * 20, "timestamp": list(ts[:30]) + list(ts[:20])})
    pdf["ts_ms"] = pdf.timestamp.astype("int64") // 10**6

    def chain(group):
        out, last = [], None
        for t in group:
            s = int(t.timestamp())
            if last is None or s - last >= 1800:
                out.append(t)
                last = s
        return out

    exp = {
        (k, t)
        for k, g in pdf.groupby("k")
        for t in chain(sorted(g.timestamp))
    }

    df = spark.createDataFrame(pdf)
    got_batch = {
        (r.k, r.timestamp)
        for r in stateful.rate_limit_per_key(
            df, ["k"], "timestamp", min_interval_s=1800
        ).collect()
    }
    assert got_batch == exp

    src, sink_dir, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    # sentinel on a throwaway key: the buffered rate limiter (like any
    # watermark-closed operator) releases a row only once the watermark
    # passes it, so the stream needs one later event to flush the tail
    flush_ms = int(pdf.ts_ms.max()) + 3_600_000
    with_sentinel = df.select("k", "ts_ms").unionByName(
        spark.createDataFrame([("ZZ_flush", flush_ms)], "k string, ts_ms long")
    )
    streaming.write_stream_source(with_sentinel, src, n_files=3, order_col="ts_ms")
    stream = (
        spark.readStream.schema("k string, ts_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    limited = _rate_limit_impl(impl_name)(
        stream, "k", "ts_ms", min_interval_s=1800
    )
    sink = ExactlyOnceParquetSink(sink_dir)
    q = (
        limited.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got_stream = {
        (r.k, pd.Timestamp(r.ts_ms, unit="ms"))
        for r in sink.read(spark).collect()
        if r.k != "ZZ_flush"
    }
    assert got_stream == exp


@pytest.mark.parametrize("impl_name", ["state", "tws"])
def test_rate_limit_stream_out_of_order_across_batches(spark, tmp_path, impl_name):
    """Disorder within the watermark across micro-batches must not
    change the emit set: rows are buffered in keyed state and released
    in event-time order once the watermark passes them. Arrival order
    here is t=20min, then t=0/45min — a chain applied in arrival order
    would emit {20} (0 is behind last_emit; 45-20 < 30min); the correct
    event-time greedy emits {0, 45}."""
    import time as _time

    from sparkfp import stateful
    from sparkfp.sink import ExactlyOnceParquetSink

    base = int(pd.Timestamp("2026-02-01").timestamp() * 1000)
    m = 60_000
    src, sink_dir, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    batches = [
        [("K", base + 20 * m)],
        [("K", base + 0 * m), ("K", base + 45 * m)],
        [("ZZ_flush", base + 24 * 60 * 60 * 1000)],
    ]
    for rows in batches:
        spark.createDataFrame(rows, "k string, ts_ms long").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(0.05)  # distinct mtimes -> deterministic replay order
    stream = (
        spark.readStream.schema("k string, ts_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    limited = _rate_limit_impl(impl_name)(
        stream, "k", "ts_ms", min_interval_s=1800, watermark="3 hours"
    )
    sink = ExactlyOnceParquetSink(sink_dir)
    q = (
        limited.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {r.ts_ms for r in sink.read(spark).collect() if r.k == "K"}
    assert got == {base + 0 * m, base + 45 * m}


# ------------------------------------------- TWS processor (stub harness)


class _StubValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = tuple(v)

    def clear(self):
        self.v = None


class _StubListState:
    def __init__(self):
        self.rows = []

    def exists(self):
        return bool(self.rows)

    def get(self):
        return iter(self.rows)

    def put(self, rows):
        self.rows = [tuple(r) for r in rows]

    def appendList(self, rows):
        self.rows.extend(tuple(r) for r in rows)

    def appendValue(self, r):
        self.rows.append(tuple(r))

    def clear(self):
        self.rows = []


class _StubHandle:
    """Implements the StatefulProcessorHandle surface the rate-limit
    processor touches (typed state + event-time timers)."""

    def __init__(self):
        self.states = {}
        self.timers = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _StubValueState())

    def getListState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _StubListState())

    def registerTimer(self, ts):
        self.timers.append(int(ts))

    def deleteTimer(self, ts):
        self.timers.remove(int(ts))

    def listTimers(self):
        return iter(list(self.timers))


class _StubTimerValues:
    def __init__(self, wm):
        self.wm = wm

    def getCurrentWatermarkInMs(self):
        return self.wm

    def getCurrentProcessingTimeInMs(self):
        return 0


def test_tws_rate_limit_processor_logic_with_stub_state():
    """Drives the transformWithStateInPandas rate limiter's
    StatefulProcessor directly through stubbed typed-state/timer
    objects, so its greedy-release logic is covered even on runtimes
    where the TWS state server can't start (this sandbox ships the
    Spark-4 API but not its protobuf runtime — see
    stateful.tws_available). Micro-batches arrive out of order within
    the watermark; the emit set must equal the event-time greedy chain,
    and a no-data timer fire must flush the tail."""
    proc = stateful.make_rate_limit_processor("k", "ts_ms", min_interval_s=1800)
    handle = _StubHandle()
    proc.init(handle)
    m = 60_000
    base = 1_700_000_000_000

    emitted = []

    def feed(rows_ms, wm_ms):
        pdf = pd.DataFrame({"k": ["K"] * len(rows_ms),
                            "ts_ms": [base + t for t in rows_ms]})
        for out in proc.handleInputRows(("K",), iter([pdf]), _StubTimerValues(wm_ms)):
            emitted.extend(int(t) - base for t in out.ts_ms)

    # arrival order 20min, then 0/45min (the arrival-order trap: a
    # chain applied in arrival order would emit {20}); wm lags behind
    feed([20 * m], 0)
    feed([0 * m, 45 * m], base + 10 * m)   # releases only t=0
    assert emitted == [0 * m]
    # buffered rows remain, timer armed at earliest pending (>= wm+1)
    assert handle.states["buf"].rows and handle.timers
    # more rows: 50min (inside interval of 45) and 90min
    feed([50 * m, 90 * m], base + 46 * m)  # releases 20 (suppressed), 45
    assert emitted == [0 * m, 45 * m]
    # no-data batch: timer fires once the watermark passes the tail
    for out in proc.handleExpiredTimer(
        ("K",), _StubTimerValues(base + 100 * m), None
    ):
        emitted.extend(int(t) - base for t in out.ts_ms)
    assert emitted == [0 * m, 45 * m, 90 * m]  # 50 suppressed by 45
    # oracle: greedy chain over the sorted event times
    chain, last = [], None
    for t in sorted([20 * m, 0 * m, 45 * m, 50 * m, 90 * m]):
        if last is None or t - last >= 1800 * 1000:
            chain.append(t)
            last = t
    assert emitted == chain
    # state fully drained: empty buffer, no timers, last_emit persisted
    assert not handle.states["buf"].rows
    assert not handle.timers
    assert handle.states["last_emit"].v == (base + 90 * m,)
    proc.close()


def test_tws_run_state_processor_logic_with_stub_state():
    """Drives the transformWithStateInPandas run-state machine's
    StatefulProcessor through stubbed typed state (runnable even where
    the TWS state server can't start). Rows arrive shuffled WITHIN each
    micro-batch (the processor must sort); labels across batches must
    equal the independent per-row oracle, and the persisted ValueState
    must carry the machine across batches."""
    proc = stateful.make_run_state_processor(
        "k", "ts_ms", "running", shutdown_window_s=600,
        transition_window_s=900,
    )
    handle = _StubHandle()
    proc.init(handle)

    ts = pd.date_range("2026-01-01", periods=120, freq="1min")
    running = (
        [True] * 20 + [False] * 30 + [True] * 5 + [False] * 2
        + [True] * 33 + [False] * 5 + [True] * 25
    )
    ts_ms = [int(t.timestamp() * 1000) for t in ts]
    exp = _run_state_oracle(list(ts), running, 600, 900)

    got = {}
    rng = np.random.default_rng(4)
    for lo in range(0, 120, 30):  # 4 micro-batches, shuffled internally
        rows = list(range(lo, min(lo + 30, 120)))
        rng.shuffle(rows)
        pdf = pd.DataFrame({
            "k": ["E1"] * len(rows),
            "ts_ms": [ts_ms[i] for i in rows],
            "running": [running[i] for i in rows],
        })
        for out in proc.handleInputRows(("E1",), iter([pdf]), _StubTimerValues(0)):
            for t, lab in zip(out.ts_ms, out.run_state):
                got[int(t)] = lab
    assert [got[t] for t in ts_ms] == exp
    # machine state persisted after the final batch (RUNNING steady)
    assert handle.states["machine"].v[0] == "RUNNING"
    proc.close()
