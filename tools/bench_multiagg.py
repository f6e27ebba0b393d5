"""TPU measurement of the fused multi-aggregate group-by kernel.

Compares kernels/multiagg.py (one pass, limb-exact) against the XLA
baseline the engine would otherwise emit (one masked segment reduce per
aggregate) on the Q1 aggregate family: 4 input columns, 8 aggregates
(sum qty, sum price, sum disc_price = price*(100-disc), sum charge =
price*(100-disc)*(100+tax), sum disc, count, and two maxes), 4 groups.

Usage: python tools/bench_multiagg.py [--n 4194304] [--iters 200]
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

from mplan2vdl_tpu.engine.kernels.multiagg import (
    AggSpec, BLOCK, fused_group_aggregate, reference_group_aggregate)

HBM_BW = 819e9  # v5e

N_GROUPS = 4
SPECS = [
    AggSpec(base=0, bits=45),                                   # sum qty
    AggSpec(base=1, bits=48),                                   # sum price
    AggSpec(base=1, factors=((100, -1, 2),), bits=55),          # disc_price
    AggSpec(base=1, factors=((100, -1, 2), (100, 1, 3)), bits=62),  # charge
    AggSpec(base=2, bits=40),                                   # sum disc
    AggSpec(base=None, bits=34),                                # count
    AggSpec(base=0, op="max", bits=31),
    AggSpec(base=3, op="max", bits=31),
]


def xla_baseline(cols, gid):
    """What the unfused engine path emits: per-aggregate masked reduces."""
    outs = []
    for spec in SPECS:
        base = (jnp.ones_like(gid, jnp.int64) if spec.base is None
                else cols[spec.base].astype(jnp.int64))
        v = base
        for (c, s, idx) in spec.factors:
            v = v * (c + s * cols[idx].astype(jnp.int64))
        row = []
        for g in range(N_GROUPS):
            sel = gid == g
            if spec.op == "max":
                row.append(jnp.max(jnp.where(sel, v, 0)))
            else:
                row.append(jnp.sum(jnp.where(sel, v, 0)))
        outs.append(jnp.stack(row))
    return jnp.stack(outs, axis=1)  # [groups, aggs]


def time_fn(fn, args, iters):
    jf = jax.jit(fn)
    np.asarray(jf(*args))  # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.time()
        for _ in range(iters):
            r = jf(*args)
        np.asarray(r)
        ts.append((time.time() - t0) / iters)
    return sorted(ts)[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4 * 1024 * 1024)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--blocks", default=str(BLOCK))
    ap.add_argument("--mxu", default="",
                    help="comma list of MXU dot modes to oracle-check + "
                         "time (transpose,abt)")
    args = ap.parse_args()
    n = -(-args.n // BLOCK) * BLOCK

    rng = np.random.default_rng(0)
    cols = [jnp.asarray(rng.integers(0, 10**4, size=n).astype(np.int32))
            for _ in range(4)]
    gid = jnp.asarray(rng.integers(0, N_GROUPS, size=n).astype(np.int32))

    on_tpu = jax.default_backend() != "cpu"
    fused = lambda *a: fused_group_aggregate(
        list(a[:-1]), a[-1], SPECS, N_GROUPS, interpret=not on_tpu)

    # correctness first
    got = np.asarray(fused(*cols, gid))
    want = reference_group_aggregate(
        [np.asarray(c) for c in cols], np.asarray(gid), SPECS, N_GROUPS)
    assert np.array_equal(got, want), (got, want)
    print("exactness: fused == numpy oracle", flush=True)

    nbytes = 5 * 4 * n  # 4 cols + gid, int32
    for blk in [int(b) for b in args.blocks.split(",")]:
        if n % blk:
            continue
        fb = lambda *a: fused_group_aggregate(  # noqa: E731
            list(a[:-1]), a[-1], SPECS, N_GROUPS, block=blk,
            interpret=not on_tpu)
        assert np.array_equal(np.asarray(fb(*cols, gid)), want)
        t_f = time_fn(fb, (*cols, gid), args.iters)
        print(f"fused block={blk}: {t_f*1e6:.1f}us {nbytes/t_f/1e9:.0f}GB/s "
              f"({nbytes/t_f/HBM_BW*100:.0f}% roofline) {n/t_f:.3g} rows/s",
              flush=True)
    if args.mxu:
        # MXU path contract (engine-planned specs, fuse.py): factors and
        # row values NON-NEGATIVE, bits = per-row value bound.  Use
        # Q1-shaped data (discount 0..10, tax 0..8) — the legacy
        # section's 0..10^4 factor columns violate the contract.
        from mplan2vdl_tpu.engine.kernels.multiagg_mxu import \
            fused_group_aggregate_mxu

        mq = [jnp.asarray(rng.integers(0, 5100, size=n).astype(np.int32)),
              jnp.asarray(rng.integers(0, 10**7, size=n).astype(np.int32)),
              jnp.asarray(rng.integers(0, 11, size=n).astype(np.int32)),
              jnp.asarray(rng.integers(0, 9, size=n).astype(np.int32))]
        mspecs = [AggSpec(base=0, bits=13),
                  AggSpec(base=1, bits=24),
                  AggSpec(base=1, factors=((100, -1, 2),), bits=32),
                  AggSpec(base=1, factors=((100, -1, 2), (100, 1, 3)),
                          bits=41),
                  AggSpec(base=2, bits=4),
                  AggSpec(base=None, bits=1)]
        want_s = reference_group_aggregate(
            [np.asarray(c) for c in mq], np.asarray(gid), mspecs,
            N_GROUPS)
        for mode in args.mxu.split(","):
            os.environ["MPLAN2VDL_MXU_DOT"] = mode
            import mplan2vdl_tpu.engine.kernels.multiagg_mxu as mxm
            mxm._build.cache_clear()
            fm = lambda *a: fused_group_aggregate_mxu(  # noqa: E731
                list(a[:-1]), a[-1], mspecs, N_GROUPS,
                interpret=not on_tpu)
            got_m = np.asarray(fm(*mq, gid))
            ok = np.array_equal(got_m, want_s)
            print(f"mxu[{mode}] exactness: "
                  f"{'OK' if ok else 'MISCOMPILE (wrong values)'}",
                  flush=True)
            if not ok:
                continue
            t_m = time_fn(fm, (*mq, gid), args.iters)
            print(f"mxu[{mode}]:      {t_m*1e6:.1f}us "
                  f"{nbytes/t_m/1e9:.0f}GB/s "
                  f"({nbytes/t_m/HBM_BW*100:.0f}% roofline) "
                  f"{n/t_m:.3g} rows/s", flush=True)
    t_x = time_fn(xla_baseline, (cols, gid), args.iters)
    print(f"xla_baseline:   {t_x*1e6:.1f}us {nbytes/t_x/1e9:.0f}GB/s "
          f"({nbytes/t_x/HBM_BW*100:.0f}% roofline) {n/t_x:.3g} rows/s")


if __name__ == "__main__":
    main()
