"""Manual multi-host smoke runner (retired into the pytest suite).

The assertions formerly here live in tests/mp_worker.py (``smoke`` and
``journey`` scenarios) and run as part of ``pytest tests/`` via
tests/test_multiprocess.py — 2- and 4-process jax.distributed runs with
per-step global-loss equality against a single-process mesh and a rank-0
save -> all-rank resume cycle. This wrapper remains for quick manual runs:

    python scripts/multihost_smoke.py [world]
"""
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    world = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "mp_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, json.dumps(
            {"port": port, "world": world, "rank": r, "scenario": "smoke"})],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=REPO) for r in range(world)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, o in enumerate(outs):
        print(f"--- rank {i} ---\n{o[-1500:]}")
    if any(p.returncode != 0 for p in procs):
        raise SystemExit("multihost smoke FAILED")
    print("multihost smoke passed")


if __name__ == "__main__":
    main()
