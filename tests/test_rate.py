"""Golden tests for the lag-proportional rate split + clamp
(the reference's batch-sizing algorithm,
DirectDISInputDStream.scala:129-161, 223-232)."""

from __future__ import annotations

from hypothesis import given, strategies as st

from spark_streaming_dis_plugin_spark.sources.rate import (
    clamp, max_messages_per_partition,
)


def test_unlimited_returns_none():
    assert max_messages_per_partition({0: 100, 1: 50}, None, 1.0, 0.0) is None


def test_lag_proportional_split():
    # total rate 100 msg/s over 1 s; lags 300/100 -> 75/25 split
    got = max_messages_per_partition({0: 300, 1: 100}, 100.0, 1.0)
    assert got == {0: 75, 1: 25}


def test_per_partition_cap_applies():
    got = max_messages_per_partition({0: 300, 1: 100}, 100.0, 1.0,
                                     max_rate_per_partition=30.0)
    assert got == {0: 30, 1: 25}


def test_cap_only_no_estimate():
    got = max_messages_per_partition({0: 300, 1: 0}, None, 2.0,
                                     max_rate_per_partition=10.0)
    # 10 msg/s * 2 s = 20 for every partition; clamp() later cuts the
    # zero-lag partition back to its latest offset
    assert got == {0: 20, 1: 20}


def test_floor_one_message_per_partition():
    # tiny rate: every partition still gets >= 1 (reference floor,
    # DirectDISInputDStream.scala:156)
    got = max_messages_per_partition({0: 1000, 1: 1}, 0.001, 1.0)
    assert got[0] >= 1 and got[1] >= 1


def test_zero_lag_partition_clamped_not_advanced():
    allowed = max_messages_per_partition({0: 100, 1: 0}, 50.0, 1.0)
    ends = clamp(current={0: 0, 1: 40}, latest={0: 100, 1: 40},
                 allowed=allowed)
    assert ends[1] == 40  # no lag -> batch end stays at latest
    assert ends[0] == 50


def test_clamp_basic():
    ends = clamp(current={0: 10, 1: 5}, latest={0: 100, 1: 7},
                 allowed={0: 20, 1: 100})
    assert ends == {0: 30, 1: 7}


def test_clamp_unlimited():
    assert clamp({0: 10}, {0: 100}, None) == {0: 100}


def test_clamp_new_partition_added():
    # dynamic partition add: partition 1 appears with no current offset
    ends = clamp(current={0: 10}, latest={0: 20, 1: 50}, allowed=None)
    assert ends == {0: 20, 1: 50}


@given(st.dictionaries(st.integers(0, 8), st.integers(0, 10**6),
                       min_size=1, max_size=9),
       st.floats(0.001, 10**6), st.floats(0.01, 60))
def test_split_never_exceeds_total_much_and_covers_lag(lags, rate, secs):
    got = max_messages_per_partition(lags, rate, secs)
    if sum(lags.values()) == 0:
        # no lag anywhere -> nothing to limit (reference's sum>0 guard)
        assert got is None
        return
    assert got is not None
    for _part, n in got.items():
        assert n >= 1


@given(st.dictionaries(st.integers(0, 8), st.tuples(
    st.integers(0, 1000), st.integers(0, 1000)), min_size=1),
    st.one_of(st.none(),
              st.dictionaries(st.integers(0, 8), st.integers(0, 100))))
def test_clamp_invariants(cur_lat, allowed):
    current = {p: c for p, (c, _) in cur_lat.items()}
    latest = {p: c + d for p, (c, d) in cur_lat.items()}
    ends = clamp(current, latest, allowed)
    for p, end in ends.items():
        assert current.get(p, 0) <= end <= max(latest[p], current.get(p, 0))


# ---------------------------------------------------- PID rate estimator

from spark_streaming_dis_plugin_spark.sources.pid import PIDRateEstimator


def test_pid_warmup_publishes_nothing():
    pid = PIDRateEstimator(batch_interval_ms=1000)
    assert pid.latest_rate() is None
    # degenerate inputs are ignored
    assert pid.compute(1000, 0, 500, 0) is None
    assert pid.compute(1000, 10, 0, 0) is None
    # first valid measurement: adopted, not published (Spark firstRun)
    assert pid.compute(1000, 1000, 500, 0) is None
    assert pid.latest_rate() == 2000.0  # 1000 elems / 0.5 s


def test_pid_steady_state_converges_to_processing_rate():
    pid = PIDRateEstimator(batch_interval_ms=1000)
    pid.compute(1000, 1000, 500, 0)        # warm-up: rate=2000/s
    # batches keep processing at exactly 2000/s with no backlog:
    # error == 0, historical == 0 -> rate stays put
    for i in range(2, 6):
        r = pid.compute(i * 1000, 1000, 500, 0)
        assert r == 2000.0


def test_pid_slow_processing_drops_rate():
    pid = PIDRateEstimator(batch_interval_ms=1000)
    pid.compute(1000, 1000, 500, 0)        # warm-up at 2000/s
    # processing suddenly takes 2 s per 1000 records (true rate 500/s)
    # with a 1 s scheduling backlog
    r1 = pid.compute(3000, 1000, 2000, 1000)
    assert r1 is not None and r1 < 2000.0
    # error = 2000-500 = 1500 -> p-term pushes to 500; historical error
    # = 1000ms*500/1000ms = 500 -> i-term (0.2) subtracts 100 more
    assert r1 == 400.0
    # sustained slowness converges to (just under) the true rate
    r2 = pid.compute(5000, 1000, 2000, 1000)
    assert r2 is not None and r2 <= 500.0


def test_pid_floor_at_min_rate():
    pid = PIDRateEstimator(batch_interval_ms=1000, min_rate=100)
    pid.compute(1000, 10000, 100, 0)       # warm-up at 100k/s
    # catastrophic slowdown: 10 records/s with a huge backlog
    r = pid.compute(11000, 100, 10000, 30000)
    assert r == 100.0


def test_pid_recovers_when_backlog_clears():
    pid = PIDRateEstimator(batch_interval_ms=1000)
    pid.compute(1000, 1000, 500, 0)        # 2000/s
    slow = pid.compute(3000, 1000, 2000, 1000)   # throttled
    assert slow is not None and slow < 2000
    # processing speed returns to 2000/s, backlog drained
    fast = None
    for i in range(4, 10):
        fast = pid.compute(i * 2000, 1000, 500, 0)
    assert fast is not None and fast > slow


# ----------------------------------------------------------- backoff

def test_backoff_interval_sequence_golden():
    """The reference consumer's curve (100 ms -> x1.5 -> cap 5 s,
    DISDataConsumer.scala:87-93): intervals follow trunc(prev * 1.5)
    with long truncation, capped."""
    from spark_streaming_dis_plugin_spark.sources.backoff import (
        ExponentialBackOff,
    )

    ex = ExponentialBackOff(100, 1.5, 5_000).start()
    seq = [ex.next_backoff() for _ in range(12)]
    assert seq == [100, 150, 225, 337, 505, 757, 1135, 1702, 2553,
                   3829, 5000, 5000]


def test_backoff_initial_capped_and_elapsed_stop():
    from spark_streaming_dis_plugin_spark.sources.backoff import (
        STOP, ExponentialBackOff,
    )

    # initial above the cap is clamped (ExponentialBackOff.scala:120-127)
    ex = ExponentialBackOff(10_000, 2.0, 3_000).start()
    assert ex.next_backoff() == 3_000
    # elapsed budget: planned sleep time accumulates BEFORE sleeping, so
    # max_elapsed == initial yields exactly one interval then STOP
    ex2 = ExponentialBackOff(100, 1.5, 5_000, max_elapsed_ms=100).start()
    assert ex2.next_backoff() == 100
    assert ex2.next_backoff() == STOP


def test_backoff_multiplier_below_one_rejected():
    import pytest

    from spark_streaming_dis_plugin_spark.sources.backoff import (
        ExponentialBackOff,
    )

    with pytest.raises(ValueError):
        ExponentialBackOff(100, 0.5)


def test_with_backoff_retries_transient_then_succeeds():
    from spark_streaming_dis_plugin_spark.sources.backoff import (
        ExponentialBackOff, with_backoff,
    )

    sleeps: list[float] = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    out = with_backoff(flaky, ExponentialBackOff(100, 1.5, 5_000),
                       sleep=sleeps.append)
    assert out == "ok" and calls["n"] == 3
    assert sleeps == [0.1, 0.15]


def test_with_backoff_missing_file_fails_fast_budget_exhausts():
    import pytest

    from spark_streaming_dis_plugin_spark.sources.backoff import (
        ExponentialBackOff, with_backoff,
    )

    # FileNotFoundError (an OSError) must NOT be retried: a deleted
    # segment is a retention race for failOnDataLoss, not a blip.
    calls = {"n": 0}

    def gone():
        calls["n"] += 1
        raise FileNotFoundError("seg deleted")

    with pytest.raises(FileNotFoundError):
        with_backoff(gone, sleep=lambda s: None)
    assert calls["n"] == 1

    # exhausted elapsed budget propagates the LAST transient error
    def always():
        raise OSError("still down")

    with pytest.raises(OSError, match="still down"):
        with_backoff(always,
                     ExponentialBackOff(100, 1.5, 5_000,
                                        max_elapsed_ms=250),
                     sleep=lambda s: None)
