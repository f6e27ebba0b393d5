"""Distributed suite sweep: every plan in a corpus over the virtual
mesh, row-compared against the single-chip engine, with ZERO
single-chip fallbacks allowed (VERDICT r4 item 4 / BASELINE config 5
proxy: the SF100 multi-host suite stands in as an SF1-2 sweep on the
8-device virtual mesh — same partitioning, exchanges, and collectives,
loopback instead of ICI).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/dist_sweep.py [--sf 1.0] [--corpus tpch10noorder]
         [--devices 8] [--queries all] [--ordered]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ap = argparse.ArgumentParser()
ap.add_argument("--sf", type=float, default=1.0)
ap.add_argument("--seed", type=int, default=7)
ap.add_argument("--devices", type=int, default=8)
ap.add_argument("--corpus", default="tpch10noorder",
                choices=["tpch10noorder", "monetpch"])
ap.add_argument("--queries", default="all")
args = ap.parse_args()

os.environ.setdefault(
    "XLA_FLAGS",
    f"--xla_force_host_platform_device_count={args.devices}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from mplan2vdl_tpu import mplan, passes, vir  # noqa: E402
from mplan2vdl_tpu.engine import datagen  # noqa: E402
from mplan2vdl_tpu.engine.lower import CompiledQuery  # noqa: E402
from mplan2vdl_tpu.fe import lexer, plan_parser  # noqa: E402
from mplan2vdl_tpu.parallel import auto, dist  # noqa: E402

store = datagen.generate(sf=args.sf, seed=args.seed,
                         legacy_fk_names=(args.corpus == "monetpch"))
cfg = store.make_catalog()
mesh = dist.make_mesh(jax.devices()[:args.devices])
print(f"# corpus={args.corpus} sf={args.sf:g} "
      f"lineitem={store.table_count(('lineitem',))} "
      f"devices={args.devices}", flush=True)

qs = ([f"{i:02d}" for i in range(1, 23)] if args.queries == "all"
      else [s.strip().zfill(2) for s in args.queries.split(",")])
suffix = ".sql.mplan" if args.corpus == "tpch10noorder" else ".plan"
fallbacks, mismatches = [], []
for q in qs:
    path = f"/root/reference/tests/{args.corpus}/{q}{suffix}"
    if not os.path.exists(path):
        cand = [f"/root/reference/tests/{args.corpus}/{q}{s}"
                for s in (".sql.mplan", ".plan", ".mplan")]
        path = next((c for c in cand if os.path.exists(c)), path)
    with open(path) as f:
        text = f.read()
    rel = plan_parser.parse(lexer.strip_plan_comments(text))
    m = mplan.fuse_selects(mplan.push_fk_joins(
        mplan.mplan_from_parse_tree(rel, cfg)))
    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
    t0 = time.time()
    try:
        dq = auto.distribute(cfg, store, vexps, mesh)
        dcols = dq()
    except auto.NotDistributable as e:
        print(f"Q{q}: FALLBACK ({e})", flush=True)
        fallbacks.append(q)
        continue
    t_dist = time.time() - t0
    single = CompiledQuery(cfg, vexps, store)()
    ordered = args.corpus == "monetpch"

    def rows(cols):
        z = list(zip(*[np.asarray(c, np.int64).tolist() for c in cols]))
        return z if ordered else sorted(z)

    got = rows([c for _, _, c in dcols])
    want = rows(list(single.columns))
    ok = got == want
    if not ok:
        mismatches.append(q)
    print(f"Q{q}: {'EXACT' if ok else 'MISMATCH'} "
          f"rows={len(got)} dist_wall={t_dist:.1f}s"
          f"{' [rowset]' if getattr(dq, 'rowset', False) else ''}",
          flush=True)

print(f"\nfallbacks: {fallbacks or 'NONE'}")
print(f"mismatches: {mismatches or 'NONE'}")
sys.exit(1 if (fallbacks or mismatches) else 0)
