"""Exponential retry backoff for transient reader I/O failures.

Behavioral re-implementation of the reference's retry policy
(ExponentialBackOff.scala:5-153 + BackOffExecution.scala:3-12): the
connector retries empty/failed polls sleeping initial -> x multiplier ->
cap, giving up once the PLANNED sleep time reaches max_elapsed_ms. The
reference's consumer instantiates it at 100 ms -> x1.5 -> cap 5 s
(DISDataConsumer.scala:87-99); its class defaults are 2 s -> x1.5 ->
cap 30 s with unbounded elapsed (ExponentialBackOff.scala:10-24).

In this rebuild there is no network poll — the analogous transient
failure is an object-store/file read hiccup while scanning a segment, so
:func:`with_backoff` wraps the segment open in the reader
(dis_datasource._read_segment). The semantics worth preserving exactly
(golden-tested in tests/test_rate.py):

- interval sequence: min(initial, cap), then trunc(prev * multiplier)
  capped at `max_interval_ms` (long truncation, not rounding — matches
  the reference's `.longValue()` arithmetic);
- elapsed accounting adds each PLANNED interval before sleeping, and
  `next_backoff()` returns STOP once accumulated elapsed >= max_elapsed
  (so a policy with max_elapsed == initial yields exactly one retry);
- multiplier < 1 is rejected at construction (a multiplier of 1 is a
  fixed interval, reference check at ExponentialBackOff.scala:97-102).
"""

from __future__ import annotations

import dataclasses
import time
from collections.abc import Callable
from typing import TypeVar

STOP = -1

# The reference consumer's instantiation (DISDataConsumer.scala:87-93).
CONSUMER_INITIAL_MS = 100
CONSUMER_MAX_INTERVAL_MS = 5_000
CONSUMER_MULTIPLIER = 1.5


@dataclasses.dataclass(frozen=True)
class ExponentialBackOff:
    initial_interval_ms: int = 2_000
    multiplier: float = 1.5
    max_interval_ms: int = 30_000
    max_elapsed_ms: float = float("inf")

    def __post_init__(self) -> None:
        if self.multiplier < 1:
            raise ValueError(
                f"invalid multiplier {self.multiplier!r}: must be >= 1 "
                "(1 means a fixed retry interval)")

    def start(self) -> "BackOffExecution":
        return BackOffExecution(self)


class BackOffExecution:
    """One retry episode: an iterator of sleep intervals ending in STOP."""

    def __init__(self, policy: ExponentialBackOff):
        self._policy = policy
        self._current_ms: int = -1
        self._elapsed_ms: int = 0

    def next_backoff(self) -> int:
        """Next sleep in ms, or :data:`STOP` when the episode is over."""
        p = self._policy
        if self._elapsed_ms >= p.max_elapsed_ms:
            return STOP
        if self._current_ms < 0:
            self._current_ms = min(p.initial_interval_ms, p.max_interval_ms)
        elif self._current_ms >= p.max_interval_ms:
            self._current_ms = p.max_interval_ms
        else:
            self._current_ms = min(int(self._current_ms * p.multiplier),
                                   p.max_interval_ms)
        self._elapsed_ms += self._current_ms
        return self._current_ms


T = TypeVar("T")

# Reader-side default: the consumer's curve, but with a finite elapsed
# budget — a permanently missing segment must surface as an error, not an
# infinite poll loop (the reference leaves max_elapsed unbounded because
# its DStream batch deadline bounds the wait externally; a Spark task has
# no such deadline).
READER_POLICY = ExponentialBackOff(
    initial_interval_ms=CONSUMER_INITIAL_MS,
    multiplier=CONSUMER_MULTIPLIER,
    max_interval_ms=CONSUMER_MAX_INTERVAL_MS,
    max_elapsed_ms=10_000,
)


def with_backoff(fn: Callable[[], T],
                 policy: ExponentialBackOff = READER_POLICY,
                 retryable: tuple[type[BaseException], ...] = (OSError,),
                 non_retryable: tuple[type[BaseException], ...] = (
                     FileNotFoundError,),
                 sleep: Callable[[float], None] = time.sleep) -> T:
    """Run ``fn`` retrying transient failures under ``policy``.

    ``non_retryable`` carves exceptions back OUT of ``retryable`` (by
    default FileNotFoundError, an OSError subclass: a deleted segment is
    a retention race that must fail fast through the failOnDataLoss
    machinery, not be polled for 10 s). Non-retryable exceptions
    propagate immediately; when the elapsed budget is exhausted the LAST
    transient error propagates (the caller sees the real cause, not a
    timeout wrapper)."""
    execution = policy.start()
    while True:
        try:
            return fn()
        except retryable as exc:
            if isinstance(exc, non_retryable):
                raise
            interval = execution.next_backoff()
            if interval == STOP:
                raise
            sleep(interval / 1000.0)
