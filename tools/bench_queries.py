"""End-to-end query benchmarks on the real chip (tunnel-safe K-pair
timing).  Writes one markdown table row per query.

Usage: python tools/bench_queries.py [--sf 0.5] [--queries 06,01,03]
       [--iters 200] [--out BENCH_QUERIES.md]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.5)
    ap.add_argument("--queries", default="06,01,03,09,12")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--out", default="BENCH_QUERIES.md")
    args = ap.parse_args()

    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.lower import compile_plan_text

    cache = f"/root/.cache/mplan2vdl_store_sf{args.sf:g}_seed1"
    if os.path.isdir(cache):
        from mplan2vdl_tpu.engine.columnstore import ColumnStore

        store = ColumnStore.load(cache)
    else:
        store = datagen.generate(sf=args.sf, seed=1)
        try:
            store.save(cache)
        except Exception:
            pass
    cfg = store.make_catalog()
    n_li = store.table_count(("lineitem",))

    rows = []
    for q in args.queries.split(","):
        q = q.strip().zfill(2)
        with open(f"/root/reference/tests/tpch10noorder/{q}.sql.mplan") as f:
            text = f.read()
        t0 = time.time()
        cq = compile_plan_text(text, cfg, store)
        cargs = cq.device_args()

        def loop(a, k):
            def it(i, acc):
                p = jnp.where(acc < 0, 1, 0)
                ap = tuple(x + p.astype(x.dtype) for x in a)
                outs = cq._run(ap)
                # consume EVERY output so nothing is dead-code-eliminated
                for data, valid in outs:
                    acc = (acc + jnp.asarray(valid, jnp.int64)
                           + jnp.asarray(data[0], jnp.int64))
                return acc

            return lax.fori_loop(0, k, it, jnp.int64(0))

        jl = jax.jit(loop, static_argnums=1)
        try:
            np.asarray(jl(cargs, 2))
            np.asarray(jl(cargs, 2 + args.iters))
            compile_s = time.time() - t0

            def m(k):
                ts = []
                for _ in range(3):
                    t0 = time.time()
                    np.asarray(jl(cargs, k))
                    ts.append(time.time() - t0)
                return sorted(ts)[1]

            t = max(m(2 + args.iters) - m(2), 1e-9) / args.iters
            nbytes = sum(np.asarray(a).dtype.itemsize * len(a)
                         for a in cargs)
            rows.append((q, t * 1e3, n_li / t / 1e9, nbytes / t / 1e9,
                         compile_s))
            print(f"Q{q}: {t*1e3:.3f}ms  {n_li/t/1e9:.1f}G rows/s  "
                  f"{nbytes/t/1e9:.0f}GB/s  (compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"Q{q}: FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
        _write(args, rows, n_li)

    _write(args, rows, n_li)


def _write(args, rows, n_li):
    dev = jax.devices()[0].device_kind
    with open(args.out, "w") as f:
        f.write(f"# End-to-end query benchmarks ({dev}, SF{args.sf:g}, "
                f"lineitem={n_li:,})\n\n")
        f.write("| query | ms/run | G lineitem-rows/s | scanned GB/s | "
                "compile s |\n|---|---|---|---|---|\n")
        for q, ms, rps, gbs, cs in rows:
            f.write(f"| Q{q} | {ms:.3f} | {rps:.1f} | {gbs:.0f} | "
                    f"{cs:.0f} |\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
