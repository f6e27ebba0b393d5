"""End-to-end query benchmarks on the real chip (tunnel-safe K-pair
timing), with the two per-query traffic fractions of bench.py
(VERDICT r2 item 2: a roofline answer for EVERY query):

  roofline  = speed of light: input columns once + outputs once / time
  bw_frac   = achieved bandwidth: optimized-HLO per-instruction traffic
              (engine/hloprof) / time — with the top-traffic op named,
              so each query says which op owns its gap

Writes one markdown table row per query as it completes (crash-safe).

Usage: python tools/bench_queries.py [--sf 0.25] [--queries all]
       [--iters 64] [--out BENCH_QUERIES.md]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mplan2vdl_tpu import jaxcfg  # noqa: F401

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

ALL = [f"{i:02d}" for i in range(1, 23)]
# per-query loop lengths: enough on-device work to cancel tunnel RTT
# without making slow queries take minutes per rep
ITERS = {"06": 1024, "01": 256, "02": 128, "12": 64, "14": 128, "15": 64,
         "19": 64, "03": 32, "04": 32, "10": 32, "13": 16, "05": 16,
         "07": 16, "08": 16, "09": 8, "17": 16, "18": 8, "21": 8, "22": 32}


def bench_one(store, cfg, q, iters, devcache):
    from mplan2vdl_tpu.engine.hloprof import traffic_report
    from mplan2vdl_tpu.engine.lower import chunked_device_put, \
        compile_plan_text

    with open(f"/root/reference/tests/tpch10noorder/{q}.sql.mplan") as f:
        text = f.read()
    t0 = time.time()
    cq = compile_plan_text(text, cfg, store)
    cq._args = tuple(
        devcache[n] if n in devcache
        else devcache.setdefault(n, chunked_device_put(store.columns[n]))
        for n in cq.loads)
    cargs = cq._args

    def body(acc, a):
        pert = (acc & 1).astype(jnp.int32)
        ap = tuple(x + pert.astype(x.dtype) for x in a)
        outs = cq._run(ap)
        for data, valid in outs:
            acc = (acc + jnp.asarray(valid, jnp.int64)
                   + jnp.asarray(data[0], jnp.int64))
        return acc

    def loop(a, k):
        return lax.fori_loop(0, k, lambda i, acc: body(acc, a),
                             jnp.int64(0))

    jl = jax.jit(loop, static_argnums=1)
    jc = jax.jit(body)
    mode = "loop"

    def timed(k):
        if mode == "loop":
            return np.asarray(jl(cargs, k))
        acc = jnp.int64(0)
        for _ in range(k):
            acc = jc(acc, cargs)
        return np.asarray(acc)

    K1, K2 = 2, 2 + iters
    try:
        timed(K1)
    except Exception as e:
        # the fori_loop TIMING wrapper kills the tunneled compile
        # service on some join-heavy programs while the bare query
        # compiles fine (bench.py CHAIN rationale) — fall back to
        # host-chained dispatches of the bare step
        print(f"Q{q}: loop-mode compile failed ({type(e).__name__}); "
              f"chain-mode fallback", flush=True)
        mode = "chain"
        timed(K1)
    timed(K2)
    rep = traffic_report(cq._jitted.lower(cargs).compile().as_text(), top=1)
    outs = cq(cargs)
    sol = (sum(int(np.asarray(a).dtype.itemsize) * len(a) for a in cargs)
           + sum(c.nbytes for c in outs.columns))
    compile_s = time.time() - t0

    def m(k):
        ts = []
        for _ in range(5):
            t0 = time.time()
            timed(k)
            ts.append(time.time() - t0)
        return float(np.median(ts))

    t = max(m(K2) - m(K1), 1e-9) / iters
    top = rep["top_ops"][0][0] if rep["top_ops"] else "?"
    return dict(q=q, ms=t * 1e3, sol_gb=sol / 1e9,
                hlo_gb=rep["total_bytes"] / 1e9,
                roofline=sol / 819e9 / t,
                bw_frac=rep["total_bytes"] / 819e9 / t,
                top=top, compile_s=compile_s, mode=mode)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.25)
    ap.add_argument("--queries", default="all")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--out", default="BENCH_QUERIES.md")
    args = ap.parse_args()
    qs = ALL if args.queries == "all" else [
        s.strip().zfill(2) for s in args.queries.split(",")]

    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.columnstore import ColumnStore

    store = datagen.cached_store(args.sf, seed=1)
    cfg = store.make_catalog()
    n_li = store.table_count(("lineitem",))

    rows, devcache = [], {}
    for q in qs:
        # the tunneled compile service flakes transiently (HTTP 500
        # tpu_compile_helper, socket drops) — retry ONLY when the error
        # looks transient; a deterministic JaxRuntimeError is recorded on
        # the first attempt (retrying doubles multi-minute compiles)
        for attempt in (0, 1):
            try:
                r = bench_one(store, cfg, q, args.iters or ITERS.get(q, 32),
                              devcache)
                r["grps"] = n_li / r["ms"] / 1e6
                rows.append(r)
                print(f"Q{q}: {r['ms']:.3f}ms {r['grps']:.2f}G rows/s "
                      f"roofline={r['roofline']:.3f} bw={r['bw_frac']:.3f} "
                      f"top={r['top']} (compile {r['compile_s']:.0f}s)",
                      flush=True)
                break
            except Exception as e:
                print(f"Q{q}: attempt {attempt} FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                if attempt or not _transient(e):
                    rows.append(dict(q=q, fail=str(type(e).__name__),
                                     err=str(e)[:400]))
                    break
        _write(args, rows, n_li)


def _transient(e) -> bool:
    s = str(e)
    return any(m in s for m in (
        "tpu_compile_helper", "500", "UNAVAILABLE", "DEADLINE",
        "Socket closed", "Connection reset", "RST_STREAM"))


def _write(args, rows, n_li):
    import json

    dev = jax.devices()[0].device_kind
    when = time.strftime("%Y-%m-%d")
    # merge with the persistent per-query sidecar so a partial run
    # (single query, A/B remeasure) never truncates the 22-row ledger
    # (the r4 regression: the Q17 re-measure deleted the whole table)
    side = args.out + ".json"
    merged = {}
    try:
        with open(side) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        pass
    if str(merged.get("_sf")) != str(args.sf):
        merged = {}  # different scale: fresh ledger
    for r in rows:
        merged[r["q"]] = r
    merged["_sf"] = args.sf
    try:
        with open(side, "w") as f:
            json.dump(merged, f)
    except OSError:
        pass
    rows = [merged[q] for q in sorted(k for k in merged
                                      if not k.startswith("_"))]
    with open(args.out, "w") as f:
        f.write(f"# End-to-end query benchmarks ({dev}, SF{args.sf:g}, "
                f"lineitem={n_li:,}, measured {when}, one session)\n\n")
        f.write(
            "Method: on-device fori_loop K-pair timing (bench.py\n"
            "methodology).  Two fractions per query: `roofline` = speed\n"
            "of light (inputs once + outputs once; no implementation of\n"
            "the query can beat it on this chip) and `bw` = achieved HBM\n"
            "bandwidth against the optimized HLO's charged traffic\n"
            "(engine/hloprof; >1 means XLA kept intermediates on-chip).\n"
            "`top op` = the instruction charging the most traffic — the\n"
            "op that owns the gap.\n\n")
        f.write("| query | ms/run | G lineitem-rows/s | sol GB | hlo GB | "
                "roofline | bw | top op | compile s |\n"
                "|---|---|---|---|---|---|---|---|---|\n")
        fails = [r for r in rows if "fail" in r]
        for r in rows:
            if "fail" in r:
                f.write(f"| Q{r['q']} | FAILED ({r['fail']}) "
                        + "| — " * 7 + "|\n")
                continue
            f.write(f"| Q{r['q']} | {r['ms']:.3f} | {r['grps']:.2f} | "
                    f"{r['sol_gb']:.3f} | {r['hlo_gb']:.2f} | "
                    f"{r['roofline']:.3f} | {r['bw_frac']:.3f} | "
                    f"{r['top']} | {r['compile_s']:.0f} |\n")
        chained = [r["q"] for r in rows if r.get("mode") == "chain"]
        if chained:
            f.write(f"\nChain-mode (host-chained dispatch; loop wrapper "
                    f"failed to compile): {', '.join(chained)}\n")
            f.write(
                "\nChain-mode queries are the r3-FAILED class: their "
                "fori_loop TIMING wrapper kills the tunneled compile "
                "service (flakily — warm compile caches shrink the "
                "set), while the bare query program compiles and runs "
                "row-exact — a measurement-harness limit, not an "
                "engine one (VERDICT r3 item 2 diagnosis).\n")
        f.write("\nAttribution and round-over-round analysis: "
                "BENCH_ANALYSIS_r05.md (hand-written, not "
                "regenerated).\n")
        if fails:
            f.write("\n## Failure diagnoses\n\n")
            for r in fails:
                f.write(f"- **Q{r['q']}** {r['fail']}: `{r['err']}`\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
