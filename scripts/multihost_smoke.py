"""Two-process multi-host smoke test on the CPU backend.

Validates the multi-host plumbing no single-process test can reach:
``jax.distributed.initialize``, ``host_all_gather``,
``assert_same_across_hosts``, and rank-sharded data loading. Run:

    python scripts/multihost_smoke.py        # spawns both processes
"""
import os
import subprocess
import sys

PORT = 37711


def worker(rank: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{PORT}", num_processes=2,
                               process_id=rank)
    assert jax.process_count() == 2

    from lightningdot_tpu.parallel.mesh import (assert_same_across_hosts,
                                                is_main_process)
    from lightningdot_tpu.utils.misc import host_all_gather

    # same value on both hosts -> passes
    assert_same_across_hosts("mlm_task", "task")
    # gather distinct payloads
    gathered = host_all_gather({"rank": rank})
    assert [g["rank"] for g in gathered] == [0, 1], gathered
    # divergent value -> must raise
    try:
        assert_same_across_hosts(f"divergent-{rank}", "task")
        raise SystemExit("assert_same_across_hosts failed to detect skew")
    except RuntimeError:
        pass

    # MetaLoader task sampling must agree across hosts given the same seed
    # (cli/pretrain.py asserts this per accumulation window, reference
    # pretrain.py:392) — run the real sampler on both ranks and cross-check
    from lightningdot_tpu.data.loader import MetaLoader

    def fake_loader(tag):
        def gen():
            i = 0
            while True:
                yield f"{tag}-{i}"
                i += 1
        return gen()

    ml = MetaLoader({"mlm_coco": (fake_loader("a"), 2),
                     "itm_vg": (fake_loader("b"), 1)},
                    accum_steps=2, seed=7)
    it = iter(ml)
    tasks = [next(it)[0] for _ in range(12)]
    assert_same_across_hosts(tasks, "MetaLoader task sequence")

    # preemption-flag agreement under skewed signal delivery: only rank 0
    # "receives SIGTERM", but both ranks must see requested=True after
    # check() (the OR-reduce prevents one host exiting a collective loop
    # the other is still in — utils/preemption.py)
    from lightningdot_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard()
    if rank == 0:
        guard.requested = True            # as if the signal landed here
    assert guard.check(global_step=1), f"rank {rank}: flag not OR-reduced"

    if is_main_process():
        print("MULTIHOST_SMOKE_OK", flush=True)


def main() -> None:
    procs = [subprocess.Popen(
        [sys.executable, __file__, str(rank)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for rank in range(2)]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    ok = any("MULTIHOST_SMOKE_OK" in o for o in outs)
    for i, o in enumerate(outs):
        print(f"--- rank {i} ---\n{o[-1500:]}")
    if not ok or any(p.returncode != 0 for p in procs):
        raise SystemExit("multihost smoke FAILED")
    print("multihost smoke passed")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        main()
