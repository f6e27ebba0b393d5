"""TRUE multi-process distributed execution (SURVEY §4: multi-host tests
via multi-process CPU jax.distributed simulation before real pod slices).

N OS processes, 8/N virtual CPU devices each, wired by
jax.distributed.initialize over localhost — the same code path a real
multi-host pod runs (global jax.Arrays built per-process via
make_array_from_callback, collectives over the full 8-device mesh).
Each process executes the distributed query and process 0 compares
against the single-chip engine.

Covered shapes (VERDICT r1 item 10):
  * 2 processes: Q1 (dense psum), Q3 (sparse shuffle + host allgather),
    Q17 (partitioned shuffle join)
  * 4 processes: Q21 (multi-way partitioned self-joins) and the
    unmodified ordered/top-N monetpch Q3 (order must survive the
    process split)

The scaling-efficiency measurement rides the same worker:
tools/scaling_sweep.py runs it at 1/2/4 processes with timing enabled
and reports rows/s and efficiency (BASELINE.md >=70% target — measured
numbers are only meaningful on real multi-host hardware; the CPU
simulation validates the methodology end-to-end).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys, time
sys.path.insert(0, "/root/repo")
pid = int(sys.argv[1]); port = sys.argv[2]; q = sys.argv[3]
nprocs = int(sys.argv[4]); corpus = sys.argv[5]
timing = len(sys.argv) > 6 and sys.argv[6] == "time"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={8 // nprocs}")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=pid)
assert jax.process_count() == nprocs and len(jax.devices()) == 8
import numpy as np
from mplan2vdl_tpu import mplan, passes, vir
from mplan2vdl_tpu.engine import datagen
from mplan2vdl_tpu.fe import lexer, plan_parser
from mplan2vdl_tpu.parallel import auto, multihost

legacy = corpus == "monetpch"
sf = float(os.environ.get("MP_SF", "0.005"))
store = datagen.generate(sf=sf, seed=3, legacy_fk_names=legacy)
cfg = store.make_catalog()
mesh = multihost.data_mesh()
text = open(f"/root/reference/tests/{corpus}/{q}.sql.mplan").read()
rel = plan_parser.parse(lexer.strip_plan_comments(text))
m = mplan.fuse_selects(mplan.push_fk_joins(
    mplan.mplan_from_parse_tree(rel, cfg)))
vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
dq = auto.distribute(cfg, store, vexps, mesh)
cols = dq()
rows = [np.asarray(c, np.int64).tolist() for _, _, c in cols]
got = rows if legacy else sorted(zip(*rows))
if timing:
    # warm (compile) done above; barrier-equivalent: every process runs
    # the same program, timing the slowest of R repeats on process 0
    reps = int(os.environ.get("MP_REPS", "3"))
    t0 = time.time()
    for _ in range(reps):
        for _, _, c in dq():
            np.asarray(c)
    dt = (time.time() - t0) / reps
    if pid == 0:
        n_li = store.table_count(("lineitem",))
        print(f"MP-TIME q{q} nprocs={nprocs} s={dt:.4f} rows={n_li}",
              flush=True)
elif pid == 0:
    from mplan2vdl_tpu.engine.lower import CompiledQuery
    want_cols = [np.asarray(c, np.int64).tolist()
                 for c in CompiledQuery(cfg, vexps, store)().columns]
    want = want_cols if legacy else sorted(zip(*want_cols))
    assert got == want, f"q{q}: multiprocess diverges"
    print(f"MP-OK q{q} nprocs={nprocs} rows={len(got[0]) if legacy else len(got)} "
          f"part={bool(dq.part_joins)}", flush=True)
"""


def _run_workers(tmp_path, q, nprocs, corpus, timeout=420):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port), q,
         str(nprocs), corpus],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd="/root/repo") for pid in range(nprocs)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for pp in procs:
                pp.kill()
            pytest.fail(f"multiprocess worker timed out (q{q})")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
    assert any(f"MP-OK q{q}" in out for _, out, _ in outs), outs[0][1]


@pytest.mark.parametrize("q", ["01", "03", "17"])
def test_two_process_distributed_matches_single_chip(tmp_path, q):
    _run_workers(tmp_path, q, 2, "tpch10noorder")


def test_four_process_partitioned_multiway_join(tmp_path):
    """Q21: three lineitem self-instances — the partitioned shuffle join
    exchanges build/probe sides across 4 OS processes."""
    _run_workers(tmp_path, "21", 4, "tpch10noorder")


def test_four_process_ordered_topn(tmp_path):
    """Unmodified monetpch Q3 (ORDER BY + top-10): output order must
    survive the 4-way process split exactly."""
    _run_workers(tmp_path, "03", 4, "monetpch")
