"""Graceful-preemption handling for long-running drivers.

The reference has no failure/preemption story (SURVEY.md §5: recovery =
auto-resume from the newest ``model_step_*``); on preemptible TPU pools the
scheduler sends SIGTERM with a short grace window, and losing the window
costs up to ``valid_steps`` of work. :class:`PreemptionGuard` turns the
signal into a flag the training loop checks at update boundaries: the loop
checkpoints once more and exits cleanly, and the existing auto-resume
discovery continues from that step on the next start.

Each host receives its own signal; saving is rank-0-only as usual (the DP
state is replicated, so rank 0's snapshot is the global state).
"""
from __future__ import annotations

import signal
import threading
from typing import Optional

from lightningdot_tpu.utils.logging import LOGGER


class PreemptionGuard:
    """Context manager: latch SIGTERM/SIGINT-style signals into a flag.

    Signal handlers only install from the main thread; elsewhere (e.g. a
    driver invoked from a worker thread in tests) the guard degrades to a
    manually triggerable flag (``sim_after_step``).
    """

    def __init__(self, signals=(signal.SIGTERM,),
                 sim_after_step: Optional[int] = None,
                 check_every: int = 1):
        self.signals = signals
        self.requested = False
        # fault injection (SURVEY §5: the reference has none): trip the
        # guard once global_step reaches this value, as if signalled
        self.sim_after_step = sim_after_step
        # multi-host OR-reduce cadence: gather once every `check_every`
        # steps instead of every call (the reference pays its host gather
        # once per accumulation window, pretrain.py:392 — a per-step
        # collective serializes hosts on a host-RTT round trip per step)
        self.check_every = max(int(check_every), 1)
        self._old = {}
        self._depth = 0

    def _handler(self, signum, frame):
        LOGGER.warning("signal %d: finishing the current update, "
                       "checkpointing, and exiting", signum)
        self.requested = True

    def check(self, global_step: int) -> bool:
        """True once preemption was requested (or simulated) on ANY host.

        Multi-host: SIGTERMs from the scheduler land tens of ms apart, so
        one host can latch before a step boundary while another latches
        after — if each acted on its local flag alone, the late host would
        enter the next step's collectives without the early one and hang.
        The flag is OR-reduced across hosts, so every host exits at the
        same boundary; between gather boundaries the local latch is NOT
        acted on (returning the local flag early on one host would break
        the same-boundary guarantee the gather exists to provide). On a
        single host there is no skew risk, so the flag acts immediately.
        """
        if (self.sim_after_step is not None
                and global_step >= self.sim_after_step):
            self.requested = True
        import jax

        if jax.process_count() > 1:
            if global_step % self.check_every:
                return False  # act only at shared gather boundaries
            from lightningdot_tpu.utils.misc import host_all_gather

            self.requested = any(host_all_gather(self.requested))
        return self.requested

    def sync(self) -> bool:
        """Force the OR-reduce NOW, regardless of cadence.

        For epoch/run boundaries that every host reaches together: a local
        latch that arrived after the last :meth:`check` gather boundary
        would otherwise desynchronize hosts (one exits the epoch loop, the
        rest enter the next SPMD step and hang waiting for it). Costs one
        collective per call — keep it out of per-step loops.
        """
        import jax

        if jax.process_count() > 1:
            from lightningdot_tpu.utils.misc import host_all_gather

            self.requested = any(host_all_gather(self.requested))
        return self.requested

    def __enter__(self) -> "PreemptionGuard":
        """Re-entrant: drivers install ONE guard at the very top of main()
        (so a signal during the minutes-long setup/compile phase is latched,
        not fatal) and re-enter the same object around the hot loop."""
        self._depth += 1
        if (self._depth == 1
                and threading.current_thread() is threading.main_thread()):
            for sig in self.signals:
                self._old[sig] = signal.signal(sig, self._handler)
        return self

    def __exit__(self, *exc) -> None:
        self._depth -= 1
        if self._depth > 0:
            return
        for sig, old in self._old.items():
            signal.signal(sig, old)
        self._old.clear()
