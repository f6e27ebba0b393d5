"""Multi-host scaling-efficiency sweep (BASELINE.md: >=70% rows/s scaling
efficiency at >=2 hosts).

Runs a query distributed at 1/2/4 processes (8 devices total, split
evenly) via jax.distributed over localhost — the exact code path a real
pod runs — and reports rows/s plus efficiency vs the 1-process run.

Each process is PINNED to its own CPU core (taskset), so per-process
compute capacity is constant across the sweep and rows/s efficiency
means what it means on a pod (every host brings its own chips).
Without pinning, N processes share the same cores and throughput can
only go down.  On a real multi-host slice the same script runs
unmodified with JAX_COORDINATOR_ADDRESS et al. set by the launcher
(each host runs one process and `--procs` becomes the host count).

Usage: python tools/scaling_sweep.py [--query 03] [--sf 0.05]
       [--procs 1,2,4] [--reps 3]
"""

import argparse
import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_at(nprocs: int, q: str, sf: float, reps: int,
           cores_per_proc: int = 1) -> float:
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import test_multiprocess as mp

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = "/tmp/scaling_worker.py"
    with open(script, "w") as f:
        f.write(mp._WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["MP_SF"] = str(sf)
    env["MP_REPS"] = str(reps)
    ncores = os.cpu_count() or 1

    def corespec(pid: int) -> str:
        lo = (pid * cores_per_proc) % ncores
        return ",".join(str((lo + i) % ncores)
                        for i in range(cores_per_proc))

    procs = [subprocess.Popen(
        ["taskset", "-c", corespec(pid),
         sys.executable, script, str(pid), str(port), q, str(nprocs),
         "tpch10noorder", "time"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO) for pid in range(nprocs)]
    out0 = None
    for p in procs:
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(err[-2000:])
        if "MP-TIME" in out:
            out0 = out
    m = re.search(r"s=([0-9.]+) rows=(\d+)", out0)
    t, rows = float(m.group(1)), int(m.group(2))
    return rows / t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", default="03")
    ap.add_argument("--sf", type=float, default=0.05)
    ap.add_argument("--procs", default="1,2,4")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cores-per-proc", type=int, default=1,
                    help="pin each process to this many dedicated cores "
                         "(the r5 controlled experiment: 2 procs x 2 "
                         "cores occupies all 4 cores with a 2-way "
                         "exchange, separating core oversubscription "
                         "from exchange cost in the 4-proc droop)")
    args = ap.parse_args()

    results = []
    for n in [int(x) for x in args.procs.split(",")]:
        rps = run_at(n, args.query.zfill(2), args.sf, args.reps,
                     args.cores_per_proc)
        results.append((n, rps))
        print(f"procs={n}: {rps/1e6:.2f}M lineitem-rows/s", flush=True)
    base_n, base = results[0]
    print("\n| processes | M rows/s | scaling efficiency |")
    print("|---|---|---|")
    for n, rps in results:
        eff = rps / (base * n / base_n)
        print(f"| {n} | {rps/1e6:.2f} | {eff:.0%} |")


if __name__ == "__main__":
    main()
