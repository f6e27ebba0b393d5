"""Dev tool: run every TPC-H query through engine + oracle and diff rows.

Usage: python tools/sweep_queries.py [--sf 0.01] [--queries 1,2,...]
       [--tpu]   (default: forced CPU backend)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

ap = argparse.ArgumentParser()
ap.add_argument("--sf", type=float, default=0.01)
ap.add_argument("--seed", type=int, default=7)
ap.add_argument("--queries", type=str, default=",".join(
    str(i) for i in range(1, 23)))
ap.add_argument("--tpu", action="store_true")
args = ap.parse_args()

import jax

if not args.tpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from mplan2vdl_tpu.engine import datagen
from mplan2vdl_tpu.engine.lower import compile_plan_text
from mplan2vdl_tpu.fe import lexer, plan_parser
from mplan2vdl_tpu import mplan as MP
from mplan2vdl_tpu.oracle import relinterp

TPCH10 = "/root/reference/tests/tpch10noorder"


def canon(cols):
    arrs = [np.asarray(c, dtype=np.int64) for c in cols]
    if not arrs or len(arrs[0]) == 0:
        return []
    return sorted(zip(*[a.tolist() for a in arrs]))


store = datagen.generate(sf=args.sf, seed=args.seed)
cfg = store.make_catalog()
ok, bad = [], []
for i in [int(x) for x in args.queries.split(",")]:
    q = f"{i:02d}"
    t0 = time.time()
    try:
        with open(f"{TPCH10}/{q}.sql.mplan") as f:
            text = f.read()
        rel = plan_parser.parse(lexer.strip_plan_comments(text))
        m = MP.mplan_from_parse_tree(rel, cfg)
        oframe = relinterp.run_oracle(store, m)
        t1 = time.time()
        cq = compile_plan_text(text, cfg, store)
        res = cq()
        t2 = time.time()
        g = canon(res.columns)
        e = canon([a for _, a in oframe.cols])
        if g == e:
            ok.append(q)
            print(f"{q} MATCH rows={len(g)} oracle={t1-t0:.1f}s "
                  f"engine={t2-t1:.1f}s", flush=True)
        else:
            bad.append(q)
            print(f"{q} MISMATCH engine={len(g)} oracle={len(e)}", flush=True)
            print("   eng", g[:2])
            print("   ora", e[:2])
    except Exception as ex:
        bad.append(q)
        print(f"{q} ERROR {type(ex).__name__} {str(ex)[:160]}", flush=True)
print("OK:", ok)
print("BAD:", bad)
