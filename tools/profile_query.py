"""Per-HLO-op TIME attribution for one query on the real chip.

The traffic heuristics (engine/hloprof.py) charge bytes, but several
query programs (Q17/Q18) burn 30-50ms while charging <2GB — the time
lives in ops whose cost is NOT bandwidth (serialized gathers, small
pallas launches, reduce-windows).  This tool runs the query under
jax.profiler and parses the xplane.pb with tensorboard_plugin_profile
(available in this image) into a self-time-ranked HLO op table — the
ground truth the traffic model approximates.

Usage:
  python tools/profile_query.py --sf 0.25 --queries 17 [--iters 8]
        [--env MPLAN2VDL_NO_DENSE_JOIN=1]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mplan2vdl_tpu import jaxcfg  # noqa: F401

import jax
import numpy as np


def trace_query(q: str, sf: float, iters: int, outdir: str):
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.columnstore import ColumnStore
    from mplan2vdl_tpu.engine.lower import (chunked_device_put,
                                            compile_plan_text)

    cache = f"/root/.cache/mplan2vdl_store_sf{sf:g}_seed1"
    store = (ColumnStore.load(cache) if os.path.isdir(cache)
             else datagen.generate(sf=sf, seed=1))
    cfg = store.make_catalog()
    with open(f"/root/reference/tests/tpch10noorder/{q}.sql.mplan") as f:
        cq = compile_plan_text(f.read(), cfg, store)
    args = tuple(chunked_device_put(store.columns[n]) for n in cq.loads)
    outs = cq(args)  # warm (compile + first-touch)
    _ = [np.asarray(c[:1]) for c in outs.columns]
    with jax.profiler.trace(outdir):
        for _ in range(iters):
            outs = cq(args)
        _ = [np.asarray(c[:1]) for c in outs.columns]


def summarize(outdir: str, top: int = 25):
    paths = sorted(glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        print("no xplane.pb found under", outdir, file=sys.stderr)
        return None
    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

    for tool in ("hlo_stats", "framework_op_stats", "op_profile"):
        try:
            data, _ = r2t.xspace_to_tool_data(paths, tool, {})
        except Exception as e:
            print(f"# tool {tool} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        return tool, data
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.25)
    ap.add_argument("--queries", default="17")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--keep", metavar="DIR", default=None,
                    help="keep the raw trace under DIR")
    ap.add_argument("--env", metavar="KEY=VALUE", action="append",
                    default=[],
                    help="set an env var before compiling (repeatable; "
                         "e.g. --env MPLAN2VDL_NO_DENSE_JOIN=1)")
    args = ap.parse_args()
    for kv in args.env:
        k, _, v = kv.partition("=")
        os.environ[k] = v
    for q in args.queries.split(","):
        q = q.strip().zfill(2)
        outdir = args.keep or tempfile.mkdtemp(prefix=f"prof_q{q}_")
        trace_query(q, args.sf, args.iters, outdir)
        got = summarize(outdir, args.top)
        if got is None:
            continue
        tool, data = got
        print(f"=== q{q} ({tool})")
        if isinstance(data, bytes):
            data = data.decode(errors="replace")
        if tool == "hlo_stats":
            # tbp returns JSON: {..., "data": [[rank, program, hlo op,
            # category, ..., occurrences, total time, avg, total self,
            # ...]]} — column order per its own header row
            obj = json.loads(data)
            rows = obj if isinstance(obj, list) else obj.get("data", [])
            print(json.dumps(rows[:2])[:800])
            for r in rows[1:args.top + 1]:
                print(r)
        else:
            print(str(data)[:4000])


if __name__ == "__main__":
    main()
