"""TRUE multi-process distributed execution (SURVEY §4: multi-host tests
via multi-process CPU jax.distributed simulation before real pod slices).

Two OS processes, four virtual CPU devices each, wired by
jax.distributed.initialize over localhost — the same code path a real
multi-host pod runs (global jax.Arrays built per-process via
make_array_from_callback, collectives over the full 8-device mesh).
Each process executes the distributed query and process 0 compares
against the single-chip engine.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, "/root/repo")
pid = int(sys.argv[1]); port = sys.argv[2]; q = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8
import numpy as np
from mplan2vdl_tpu import mplan, passes, vir
from mplan2vdl_tpu.engine import datagen
from mplan2vdl_tpu.fe import lexer, plan_parser
from mplan2vdl_tpu.parallel import auto, multihost

store = datagen.generate(sf=0.005, seed=3)
cfg = store.make_catalog()
mesh = multihost.data_mesh()
text = open(f"/root/reference/tests/tpch10noorder/{q}.sql.mplan").read()
rel = plan_parser.parse(lexer.strip_plan_comments(text))
m = mplan.fuse_selects(mplan.push_fk_joins(
    mplan.mplan_from_parse_tree(rel, cfg)))
vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
dq = auto.distribute(cfg, store, vexps, mesh)
cols = dq()
got = sorted(zip(*[np.asarray(c, np.int64).tolist() for _, _, c in cols]))
if pid == 0:
    from mplan2vdl_tpu.engine.lower import CompiledQuery
    want = sorted(zip(*[np.asarray(c, np.int64).tolist()
                        for c in CompiledQuery(cfg, vexps, store)().columns]))
    assert got == want, f"q{q}: multiprocess diverges"
    print(f"MP-OK q{q} rows={len(got)} part={bool(dq.part_joins)}",
          flush=True)
"""


@pytest.mark.parametrize("q", ["01", "03", "17"])
def test_two_process_distributed_matches_single_chip(tmp_path, q):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port), q],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd="/root/repo") for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for pp in procs:
                pp.kill()
            pytest.fail(f"multiprocess worker timed out (q{q})")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
    assert any(f"MP-OK q{q}" in out for _, out, _ in outs), outs[0][1]
