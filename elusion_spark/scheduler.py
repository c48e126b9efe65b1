"""Pipeline scheduler — parity with ``PipelineScheduler``
(features/scheduler.rs:19-107): frequency tokens → periodic job runs with
clean shutdown.

Stdlib-only (threading.Timer chain; no apscheduler in this container).
Each tick runs the job in the scheduler thread; Spark jobs launched from
it share the session — on a cluster this is a driver-side cron, the
right place to kick off incremental loads (pair with
``streaming.stream_write_files(available_now=True)``)."""

from __future__ import annotations

import threading
import traceback
from collections.abc import Callable

# scheduler.rs frequency tokens → seconds
_FREQUENCIES: dict[str, float] = {
    "1min": 60, "2min": 120, "5min": 300, "10min": 600, "15min": 900,
    "30min": 1800,
    "1hour": 3600, "2hour": 7200, "3hour": 10800, "6hour": 21600,
    "12hour": 43200,
    "24hour": 86400, "1day": 86400, "2days": 172800, "7days": 604800,
    "14days": 1209600, "30days": 2592000,
}


def parse_frequency(token: str) -> float:
    """'1min' … '30days' → seconds (scheduler.rs:36-71)."""
    key = token.strip().lower()
    if key not in _FREQUENCIES:
        raise ValueError(
            f"Unsupported frequency {token!r}; supported: "
            f"{', '.join(_FREQUENCIES)} (scheduler.rs:36-71)"
        )
    return _FREQUENCIES[key]


class PipelineScheduler:
    """``PipelineScheduler(freq, job).start()`` runs ``job()`` every
    period until ``shutdown()`` (the reference listens for ctrl-C;
    call ``run_forever()`` for that behavior)."""

    def __init__(self, frequency: str, job: Callable[[], None],
                 on_error: Callable[[BaseException], None] | None = None,
                 _interval_override: float | None = None):
        self.interval = (
            _interval_override
            if _interval_override is not None
            else parse_frequency(frequency)
        )
        self.job = job
        self.on_error = on_error
        self.runs = 0
        self._stop = threading.Event()
        self._timer: threading.Timer | None = None
        self._lock = threading.Lock()

    def _tick(self) -> None:
        if self._stop.is_set():
            return
        try:
            self.job()
        except BaseException as e:  # noqa: BLE001 — scheduler must survive job errors
            if self.on_error:
                self.on_error(e)
            else:
                traceback.print_exc()
        finally:
            self.runs += 1
        with self._lock:
            if not self._stop.is_set():
                self._timer = threading.Timer(self.interval, self._tick)
                self._timer.daemon = True
                self._timer.start()

    def start(self) -> "PipelineScheduler":
        with self._lock:
            self._timer = threading.Timer(self.interval, self._tick)
            self._timer.daemon = True
            self._timer.start()
        return self

    def run_forever(self) -> None:
        """Blocking variant with ctrl-C shutdown (scheduler.rs:88-107)."""
        self.start()
        try:
            while not self._stop.wait(0.5):
                pass
        except KeyboardInterrupt:
            self.shutdown()

    def shutdown(self) -> None:
        self._stop.set()
        with self._lock:
            if self._timer is not None:
                self._timer.cancel()
