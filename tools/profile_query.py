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

# tensorboard_plugin_profile's generated protos predate this image's
# protobuf; the pure-python parser accepts them (slower, fine for a
# one-shot summary)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mplan2vdl_tpu import jaxcfg  # noqa: F401

import jax
import numpy as np


def trace_query(q: str, sf: float, iters: int, outdir: str):
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.columnstore import ColumnStore
    from mplan2vdl_tpu.engine.lower import (chunked_device_put,
                                            compile_plan_text)

    store = datagen.cached_store(sf, seed=1)
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
    """Self-time table straight from the xplane proto.

    (tensorboard_plugin_profile's converter is broken in this image —
    its generated protos and native pywrap predate the installed
    protobuf/TF — so parse the XSpace directly: the device plane's
    "XLA Ops" line carries one event per HLO op execution with
    duration_ps; summing by op name IS the self-time table, since TPU
    core ops on that line do not overlap.)"""
    paths = sorted(glob.glob(os.path.join(
        outdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        print("no xplane.pb found under", outdir, file=sys.stderr)
        return None
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    rows = []
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        md = plane.event_metadata
        for ln in plane.lines:
            if ln.name not in ("XLA Ops", "Async XLA Ops"):
                continue
            agg = {}
            for ev in ln.events:
                name = md[ev.metadata_id].name
                tot, cnt = agg.get(name, (0, 0))
                agg[name] = (tot + ev.duration_ps, cnt + 1)
            n_mod = sum(len(l2.events) for l2 in plane.lines
                        if l2.name == "XLA Modules") or 1
            for name, (tot, cnt) in agg.items():
                rows.append((tot / 1e6 / n_mod, cnt // n_mod or cnt,
                             ln.name, name))
    rows.sort(reverse=True)
    return rows


def print_table(rows, top: int, iters: int):
    total = sum(r[0] for r in rows if r[2] == "XLA Ops")
    print(f"  device total {total / 1e3:.3f} ms/iter over {iters} iters"
          f" ({len(rows)} distinct ops); top {top} by self time:")
    print(f"  {'us/iter':>10} {'%':>5} {'x':>4}  op")
    for us, cnt, line, name in rows[:top]:
        pct = 100.0 * us / total if total else 0.0
        tag = " [async]" if line != "XLA Ops" else ""
        print(f"  {us:10.1f} {pct:5.1f} {cnt:4d}  {name[:90]}{tag}")


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
        rows = summarize(outdir, args.top)
        if rows is None:
            continue
        print(f"=== q{q} (xplane self-time)")
        print_table(rows, args.top, args.iters)


if __name__ == "__main__":
    main()
