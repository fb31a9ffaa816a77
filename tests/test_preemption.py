"""PreemptionGuard unit tests (utils/preemption.py).

The multi-process agreement path is exercised for real by
tests/test_multiprocess.py; here we pin the single-host semantics and the
gather CADENCE (VERDICT r3 item 2: no per-step collective in the hot loop).
"""
import jax

from lightningdot_tpu.utils import preemption
from lightningdot_tpu.utils.preemption import PreemptionGuard


def test_single_host_sim_acts_immediately():
    guard = PreemptionGuard(sim_after_step=3, check_every=25)
    assert not guard.check(1)
    assert not guard.check(2)
    # single host: no skew risk, the latch acts on the very step even when
    # it is not a gather boundary
    assert guard.check(3)
    assert guard.requested


def test_multi_host_gather_only_at_boundaries(monkeypatch):
    calls = []

    def fake_gather(flag):
        calls.append(flag)
        return [flag, False]

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(preemption_misc(), "host_all_gather", fake_gather)

    guard = PreemptionGuard(check_every=4)
    # latch locally mid-window (as if SIGTERM landed on this host only)
    guard.requested = True
    # steps 1..3: NOT boundaries — no collective, and the local latch is
    # not acted on (acting early on one host would desync the exit step)
    for step in (1, 2, 3):
        assert guard.check(step) is False
    assert calls == []
    # step 4: boundary — one gather, OR includes our local latch
    assert guard.check(4) is True
    assert len(calls) == 1


def test_multi_host_or_reduce_from_peer(monkeypatch):
    # peer host latched; we did not — boundary gather must flip us too
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(preemption_misc(), "host_all_gather",
                        lambda flag: [flag, True])
    guard = PreemptionGuard(check_every=2)
    assert guard.check(1) is False  # not a boundary: peer signal waits
    assert guard.check(2) is True
    assert guard.requested


def test_reentrant_enter_exit_preserves_outer_handler():
    """Drivers install ONE guard at main() top (covering setup/compile) and
    re-enter the same object around the hot loop; only the outermost exit
    may restore the previous handler."""
    import signal

    def noop(sig, frm):
        pass

    old = signal.signal(signal.SIGTERM, noop)
    try:
        guard = PreemptionGuard()
        with guard:
            assert signal.getsignal(signal.SIGTERM) == guard._handler
            with guard:  # inner re-enter: no re-save of the handler
                assert signal.getsignal(signal.SIGTERM) == guard._handler
            # inner exit must NOT restore — setup/loop both stay covered
            assert signal.getsignal(signal.SIGTERM) == guard._handler
        assert signal.getsignal(signal.SIGTERM) is noop
    finally:
        signal.signal(signal.SIGTERM, old)


def preemption_misc():
    import lightningdot_tpu.utils.misc as misc

    return misc
