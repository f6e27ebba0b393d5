"""Roofline sweep of the Pallas streaming sorted-gather kernel at the
(n_rows, selectivity) shapes the TPC-H join queries actually hit
(VERDICT r3 item 4: pallas_call owned the achieved-bw gap on 8 of 14
measured queries, with only one published shape).

For each (n, selectivity): positions = sorted sample of n*sel row ids
(what a date/filter compaction feeds the column gathers of Q3/Q5/Q7/
Q18).  Measures
  * the kernel at its AUTO window (resolve_fit's smallest covering
    window — what the engine now bakes),
  * the kernel at the legacy fixed W=8192,
  * XLA's dynamic gather,
and reports ns/element plus achieved HBM fraction against the kernel's
own streamed-traffic model (2 windows per block + pos + out).

Usage: python tools/bench_gather.py [--out BENCH_GATHER.md]
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

from mplan2vdl_tpu.engine.kernels.sorted_gather import (BLOCK, W_OPTIONS,
                                                        resolve_fit,
                                                        sorted_gather)

HBM_BW = 819e9  # v5e


def timed_loop(body, args, iters):
    def loop(a, k):
        def it(i, acc):
            p = (acc & 1).astype(jnp.int32)
            ap = [x + p.astype(x.dtype) for x in a]
            return acc + body(ap)

        return lax.fori_loop(0, k, it, jnp.int64(0))

    jl = jax.jit(loop, static_argnums=1)
    np.asarray(jl(args, 4))
    np.asarray(jl(args, 4 + iters))

    def m(k):
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(jl(args, k))
            ts.append(time.time() - t0)
        return sorted(ts)[1]

    return max(m(4 + iters) - m(4), 1e-9) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_GATHER.md")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--ns", default="1500000,6000000")
    ap.add_argument("--sels", default="0.9,0.5,0.25,0.125,0.0625")
    args = ap.parse_args()
    rng = np.random.default_rng(3)
    rows = []
    for n in [int(x) for x in args.ns.split(",")]:
        src = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
        for sel in [float(x) for x in args.sels.split(",")]:
            m = int(n * sel)
            pos_np = np.sort(rng.choice(n, size=m, replace=False)
                             .astype(np.int32))
            pos = jnp.asarray(pos_np)
            fit = resolve_fit(n, pos, m)
            want = np.asarray(src)[pos_np]

            def run(static_fit):
                def body(a):
                    out = sorted_gather(a[0], a[1], m, static_fit=static_fit)
                    return jnp.asarray(out[0], jnp.int64) + out[m - 1]

                got = np.asarray(sorted_gather(src, pos, m,
                                               static_fit=static_fit))[:m]
                np.testing.assert_array_equal(got, want)
                return timed_loop(body, [src, pos], args.iters)

            variants = {}
            if fit is not False:
                variants[f"auto(W={fit})"] = (fit, fit)
            if fit != 8192:
                # legacy fixed window (only when spans fit it)
                if fit is not False:
                    variants["fixed W=8192"] = (8192, 8192)
            variants["xla"] = (False, None)
            for label, (sf, w) in variants.items():
                try:
                    t = run(sf)
                except Exception as e:
                    print(f"n={n} sel={sel} {label}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                    continue
                # streamed-traffic model: every output block reads two
                # W-windows of src + its pos block + writes its out block
                nblk = -(-m // BLOCK)
                bytes_it = (nblk * (2 * (w or 0) + 2 * BLOCK) * 4
                            if w else (n + 2 * m) * 4)
                gbs = bytes_it / t / 1e9
                rows.append((n, sel, label, t / m * 1e9, gbs,
                             gbs * 1e9 / HBM_BW))
                print(f"n={n} sel={sel} {label}: {t/m*1e9:.2f} ns/el "
                      f"{gbs:.0f} GB/s ({gbs*1e9/HBM_BW*100:.0f}% of HBM)",
                      flush=True)

    dev = jax.devices()[0].device_kind
    with open(args.out, "w") as f:
        f.write(f"# Streaming sorted-gather kernel sweep ({dev})\n\n")
        f.write("Positions = sorted row-id sample at the given "
                "selectivity of an n-row int32 column — the shape Q3/Q5/"
                "Q7/Q18's post-compaction column gathers feed the kernel."
                "  auto = the per-site window the engine now bakes "
                "(smallest of "
                f"{list(W_OPTIONS)} covering every 1024-block span); "
                "traffic model = 2 windows + pos + out per block (kernel) "
                "or full column + pos + out (XLA).\n\n")
        f.write("| n | sel | variant | ns/el | GB/s | % HBM |\n")
        f.write("|---|---|---|---|---|---|\n")
        for n, sel, label, nsel, gbs, frac in rows:
            f.write(f"| {n:,} | {sel:g} | {label} | {nsel:.2f} | "
                    f"{gbs:.0f} | {frac*100:.0f}% |\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
