"""Per-op roofline microbenchmarks on the real chip.

Measures the framework's hot operator classes with the fori_loop K-pair
method (the only timing that survives the tunneled device's async
behavior) and reports achieved bytes/s against the HBM roofline.

Usage: python tools/bench_ops.py [--n 3000000] [--out BENCH_OPS.md]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

HBM_BW = 819e9  # v5e


def timed_loop(body, args, iters=600):
    """Per-iteration seconds for ``body(args)`` with all args perturbed by
    a runtime zero (defeats loop hoisting)."""

    def loop(a, k):
        def it(i, acc):
            p = jnp.where(acc < 0, 1, 0)
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
    ap.add_argument("--n", type=int, default=3_000_000)
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--out", default="BENCH_OPS.md")
    args = ap.parse_args()
    n = args.n
    rng = np.random.default_rng(0)
    c32 = [jnp.asarray(rng.integers(0, 10**6, size=n).astype(np.int32))
           for _ in range(4)]
    k64 = jnp.asarray(rng.integers(0, 2**40, size=n).astype(np.int64))
    ids8 = jnp.asarray((np.asarray(c32[0]) % 8).astype(np.int32))

    rows = []

    def bench(label, body, in_args, bytes_per_iter, unit_rows=None):
        t = timed_loop(body, in_args, args.iters)
        gbs = bytes_per_iter / t / 1e9
        rows.append((label, t * 1e6, gbs, gbs * 1e9 / HBM_BW,
                     (unit_rows or n) / t))
        print(f"{label}: {t*1e6:.1f}us {gbs:.0f}GB/s "
              f"({gbs*1e9/HBM_BW*100:.0f}% roofline)", flush=True)

    # 1. raw scan-reduce
    bench("scan_sum_1col_int32",
          lambda a: jnp.sum(a[0].astype(jnp.int64)), c32[:1], 4 * n)
    # 2. predicated filter+aggregate (the Q6 kernel shape)
    bench("filter_agg_4col",
          lambda a: jnp.sum(jnp.where(
              (a[0] > 5) & (a[1] < 10**5) & (a[2] > 7) & (a[3] < 10**5),
              (a[1] * a[2]).astype(jnp.int64), 0)), c32, 16 * n)
    # 3. dense group-by, domain 8 (the Q1 kernel shape: masked reduces)
    def gb8(a):
        ids = a[0] % 8
        acc = jnp.int64(0)
        for g in range(8):
            acc += jnp.sum(jnp.where(ids == g, a[1], 0).astype(jnp.int64))
        return acc

    bench("groupby_dense8_sum", gb8, c32[:2], 8 * n)
    # 4. 64-bit sort (the sparse group-by / join gate)
    bench("sort_int64",
          lambda a: lax.sort(a[0])[0].astype(jnp.int64), [k64], 16 * n)
    # 5. sort-merge join probe (searchsorted both sides)
    srt = lax.sort(k64)

    def probe(a):
        lo = jnp.searchsorted(srt, a[0], side="left")
        hi = jnp.searchsorted(srt, a[0], side="right")
        return jnp.sum(hi - lo)

    bench("join_probe_searchsorted", probe, [k64], 16 * n)
    # 6. compaction (nonzero with static bound)
    def compact(a):
        m = a[0] > 500_000
        (sel,) = jnp.nonzero(m, size=n, fill_value=0)
        return jnp.sum(sel.astype(jnp.int64)[:8])

    bench("compact_nonzero", compact, c32[:1], 12 * n)

    dev = jax.devices()[0].device_kind
    with open(args.out, "w") as f:
        f.write(f"# Per-op microbenchmarks ({dev}, n={n:,})\n\n")
        f.write("Method: on-device fori_loop K-pair timing (tunnel-safe); "
                "bytes counted as algorithmic input+output traffic.\n\n")
        f.write("| op | us/iter | GB/s | % HBM roofline | rows/s |\n")
        f.write("|---|---|---|---|---|\n")
        for label, us, gbs, frac, rps in rows:
            f.write(f"| {label} | {us:.1f} | {gbs:.0f} | {frac*100:.0f}% "
                    f"| {rps:.3g} |\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
