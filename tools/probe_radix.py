"""Measured evaluation of a MULTI-DIGIT LSD radix sort on the real chip
(VERDICT r2 item 3: the r2 sort verdict covered only a *binary* radix).

An LSD radix pass = (a) digit histogram per block, (b) per-element rank
within (block, bucket) — the unavoidable cross-lane data movement, via
one-hot + cumsum in VMEM, (c) applying the resulting permutation.  This
tool measures each component at engine shapes plus lax.sort's 2-operand
int32 argsort baseline at 1.5M / 6M / 24M rows, so the build/refute
decision for the radix kernel is made against numbers, not projections.

Digit width trade-off measured directly: 4-bit (16 lanes of cumsum,
6 passes for 24-bit keys) vs 8-bit (256 lanes, 3 passes).

Usage: python tools/probe_radix.py [--sizes 1572864,6291456,25165824]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8192


def timeit(fn, args, iters=50, reps=5):
    def loop(a, k):
        def body(i, acc):
            pert = (acc & 1).astype(jnp.int32)
            ap = tuple(x + pert.astype(x.dtype) for x in a)
            out = fn(*ap)
            return acc + jnp.asarray(out, jnp.int64)

        return lax.fori_loop(0, k, body, jnp.int64(0))

    jl = jax.jit(loop, static_argnums=1)
    K1, K2 = 2, 2 + iters
    t0 = time.time()
    np.asarray(jl(args, K1)); np.asarray(jl(args, K2))
    compile_s = time.time() - t0

    def m(k):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(jl(args, k))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    t = max(m(K2) - m(K1), 1e-9) / iters
    return t, compile_s


def rank_kernel(nbits):
    """Per-block (64, 128) digit rank: one-hot over 2**nbits buckets,
    two-level inclusive scan in row-major block order via MXU
    lower-triangular matmuls (Pallas TPU has no cumsum lowering; the
    matmul scan IS the idiomatic TPU form), then rank extraction.  This
    is the irreducible per-pass data-movement work of an LSD radix
    pass.  f32 accumulation is exact (counts <= 8192 < 2^24)."""
    R = 1 << nbits
    ROWS, COLS = 64, 128

    def kernel(x_ref, o_ref):
        x = x_ref[...]  # (ROWS, COLS) int32, row-major block order
        d = x & (R - 1)
        # inclusive scan along lanes: m @ T, T[j,i] = 1 iff j <= i
        T = (lax.broadcasted_iota(jnp.int32, (COLS, COLS), 0)
             <= lax.broadcasted_iota(jnp.int32, (COLS, COLS), 1)
             ).astype(jnp.float32)
        # exclusive scan over rows: S2 @ rowtot, S2[i,j] = 1 iff j < i
        S2 = (lax.broadcasted_iota(jnp.int32, (ROWS, ROWS), 1)
              < lax.broadcasted_iota(jnp.int32, (ROWS, ROWS), 0)
              ).astype(jnp.float32)
        rank = jnp.zeros((ROWS, COLS), jnp.float32)
        for r in range(R):  # static unroll, all 2D (Mosaic-friendly)
            m_r = (d == r).astype(jnp.float32)
            c1 = jnp.dot(m_r, T, preferred_element_type=jnp.float32)
            rowtot = c1[:, COLS - 1:COLS]  # (ROWS, 1)
            rowoff = jnp.dot(S2, rowtot,
                             preferred_element_type=jnp.float32)
            rank = rank + m_r * (c1 + rowoff)
        o_ref[...] = rank.astype(jnp.int32)

    def run(x):
        n = x.shape[0]
        with jax.enable_x64(False):  # Mosaic requires i32 index tracing
            y = pl.pallas_call(
                kernel,
                grid=(n // BLK,),
                in_specs=[pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n // BLK * ROWS, COLS),
                                               jnp.int32),
            )(x.reshape(n // BLK * ROWS, COLS))
        return jnp.sum(y[:, 0].astype(jnp.int64)) + jnp.asarray(
            y[0, -1], jnp.int64)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1572864,6291456,25165824")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    rng = np.random.default_rng(0)

    print(f"device={jax.devices()[0].device_kind}")
    rows = []
    for n in sizes:
        keys = jnp.asarray(rng.integers(0, 1 << 24, n, dtype=np.int32))
        idx = jnp.arange(n, dtype=jnp.int32)
        perm = jnp.asarray(rng.permutation(n).astype(np.int32))

        cases = {}

        def sort2(k, i):
            s, p = lax.sort((k, i), num_keys=1, is_stable=True)
            return (s[0] + p[0]).astype(jnp.int64)
        cases["lax_sort2_i32"] = (sort2, (keys, idx))

        def hist16(k):
            d = (k & 15).reshape(-1, BLK)
            h = jnp.stack([jnp.sum((d == r).astype(jnp.int32), axis=1)
                           for r in range(16)], axis=1)
            # weighted sum so no bucket's count is dead code
            w = jnp.arange(1, 17, dtype=jnp.int64)
            return jnp.sum(h.astype(jnp.int64) * w[None, :])
        cases["hist16_xla_per_block"] = (hist16, (keys,))

        cases["rank16_pallas(4bit cumsum)"] = (rank_kernel(4), (keys,))
        cases["rank256_pallas(8bit cumsum)"] = (rank_kernel(8), (keys,))

        def apply_perm(k, p):
            return jnp.asarray(k[p][0], jnp.int64)
        cases["apply_perm_gather_xla"] = (apply_perm, (keys, perm))

        for name, (fn, a) in cases.items():
            try:
                t, cs = timeit(fn, a, iters=args.iters)
                nspel = t / n * 1e9
                rows.append((n, name, nspel, cs))
                print(f"n={n:>9} {name:32s} {t*1e6:10.1f} us  "
                      f"{nspel:7.3f} ns/el  (compile {cs:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"n={n:>9} {name:32s} FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    # decision table: per-pass cost vs lax.sort's total
    print("\nper-pass = rank + hist + apply; passes = ceil(24/digit_bits)")
    for n in sizes:
        r = {name: v for (m, name, v, _) in rows if m == n}
        if "lax_sort2_i32" not in r:
            continue
        base = r["lax_sort2_i32"]
        for bits, rk in ((4, "rank16_pallas(4bit cumsum)"),
                         (8, "rank256_pallas(8bit cumsum)")):
            if rk not in r:
                continue
            passes = -(-24 // bits)
            per = r[rk] + r.get("hist16_xla_per_block", 0) \
                + r.get("apply_perm_gather_xla", 0)
            print(f"n={n:>9} {bits}-bit: {passes} passes x {per:.2f} = "
                  f"{passes*per:.2f} ns/el vs lax.sort {base:.2f} ns/el "
                  f"-> {'RADIX WINS' if passes*per < base else 'refuted'}")


if __name__ == "__main__":
    main()
