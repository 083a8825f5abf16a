"""PID processing-rate estimator — the backpressure brain.

Behavioral re-implementation of the estimator the reference wires in via
``RateEstimator.create`` / ``DirectKafkaRateController``
(DirectDISInputDStream.scala:57-58,120-127): Apache Spark's public
``PIDRateEstimator`` (streaming/scheduler/rate/PIDRateEstimator.scala),
a proportional-integral-derivative controller over the measured
processing rate of recent batches.

Semantics (matching Spark's defaults):

- ``compute(time_ms, num_elements, processing_delay_ms, scheduling_delay_ms)``
  returns a new records/sec bound, or None while warming up / on
  degenerate inputs (zero elements, zero delay, non-advancing clock).
- error            = latest_rate - processing_rate
- historical_error = scheduling_delay * processing_rate / batch_interval
  (the backlog accumulated while the batch waited, amortized over one
  batch interval — the integral term's stand-in)
- d_error          = (error - latest_error) / seconds_since_update
- new_rate = max(latest_rate - Kp*error - Ki*historical_error - Kd*d_error,
                 min_rate)

Steady state: scheduling delay ~ 0 and new_rate converges onto the true
processing rate. When processing slows, processing_rate drops below
latest_rate -> positive error -> rate is pushed down; once the backlog
drains the controller relaxes back up. Pure driver-side arithmetic: at
any cluster size this is O(1) per micro-batch.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class PIDRateEstimator:
    batch_interval_ms: float
    proportional: float = 1.0
    integral: float = 0.2
    derivative: float = 0.0
    min_rate: float = 100.0

    _latest_time_ms: float = dataclasses.field(default=-1.0, init=False)
    _latest_rate: float = dataclasses.field(default=-1.0, init=False)
    _latest_error: float = dataclasses.field(default=-1.0, init=False)
    _first_run: bool = dataclasses.field(default=True, init=False)

    def __post_init__(self) -> None:
        if self.batch_interval_ms <= 0:
            raise ValueError("batch_interval_ms must be > 0")
        if self.proportional < 0 or self.integral < 0 or self.derivative < 0:
            raise ValueError("PID gains must be >= 0")
        if self.min_rate <= 0:
            raise ValueError("min_rate must be > 0")

    def latest_rate(self) -> float | None:
        """Most recent bound (records/sec), None while warming up."""
        return None if self._first_run or self._latest_rate <= 0 \
            else self._latest_rate

    def compute(self, time_ms: float, num_elements: int,
                processing_delay_ms: float,
                scheduling_delay_ms: float) -> float | None:
        if not (time_ms > self._latest_time_ms and num_elements > 0
                and processing_delay_ms > 0):
            return None
        delay_since_update_s = ((time_ms - self._latest_time_ms) / 1000.0
                                if self._latest_time_ms >= 0 else
                                self.batch_interval_ms / 1000.0)
        processing_rate = num_elements / processing_delay_ms * 1000.0
        error = self._latest_rate - processing_rate
        historical_error = (scheduling_delay_ms * processing_rate
                            / self.batch_interval_ms)
        d_error = (error - self._latest_error) / delay_since_update_s
        new_rate = max(self._latest_rate
                       - self.proportional * error
                       - self.integral * historical_error
                       - self.derivative * d_error,
                       self.min_rate)
        if self._first_run:
            # First measurement: adopt the observed rate, publish nothing
            # yet (one batch of warm-up, like Spark's firstRun branch).
            self._latest_time_ms = time_ms
            self._latest_rate = processing_rate
            self._latest_error = 0.0
            self._first_run = False
            return None
        self._latest_time_ms = time_ms
        self._latest_rate = new_rate
        self._latest_error = error
        return new_rate
