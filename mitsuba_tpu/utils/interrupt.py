"""Cooperative render cancellation + timeout.

Mirror of the reference's Integrator::cancel()/m_stop flag and
``timeout`` property (integrator.h:290; integrator.cpp:23-24,90-92) and
the render-loop watchdog ``should_stop()`` checks (integrator.cpp:219).
The reference polls per image block; XLA kernels are not interruptible
mid-launch, so the natural poll boundary here is **between spp passes**
(integrator.cpp:249-265 wavefront splitting): rendering with
``spp_per_pass < spp`` makes cancellation/timeout responsive at
pass granularity, and the partial image stays unbiased because
``Film.develop`` normalizes by the accumulated filter weights.
"""
from __future__ import annotations

import time

_stop = False


def cancel() -> None:
    """Request cooperative cancellation of the current/next render."""
    global _stop
    _stop = True


def clear_cancel() -> None:
    global _stop
    _stop = False


def cancel_requested() -> bool:
    return _stop


class RenderWatchdog:
    """Per-render stop test: cancel flag OR wall-clock timeout.

    ``timeout`` <= 0 disables the clock (integrator.cpp:90-92 semantics:
    m_timeout < 0 means no limit).
    """

    def __init__(self, timeout: float = 0.0):
        self.timeout = float(timeout or 0.0)
        self.t0 = time.monotonic()
        self.stopped_early = False

    def should_stop(self) -> bool:
        if _stop or (self.timeout > 0.0
                     and time.monotonic() - self.t0 > self.timeout):
            self.stopped_early = True
            return True
        return False
