"""Round-2 measurement probes on the real chip.

1. Q6 SF1 roofline diagnosis: is the 58.6% measurement the query or the
   bench-loop perturbation overhead?
2. Sort primitive costs (lax.sort variants, cumsum, scatter-perm) that
   decide the Pallas sort kernel design.

Usage: python tools/probe_r2.py [q6|sort]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mplan2vdl_tpu import jaxcfg  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BW = 819e9  # v5e HBM


def timeit(fn, *args, iters=128, k1=4):
    """K-pair on-device loop timing (bench.py methodology)."""
    def loop(a, k):
        def body(i, acc):
            out = fn(a, acc)
            return acc + out
        return lax.fori_loop(0, k, body, jnp.int64(0))

    jl = jax.jit(loop, static_argnums=1)
    np.asarray(jl(args, k1))
    np.asarray(jl(args, k1 + iters))

    def measure(k):
        reps = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(jl(args, k))
            reps.append(time.time() - t0)
        return float(np.median(reps))

    return max(measure(k1 + iters) - measure(k1), 1e-9) / iters


def probe_q6():
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.columnstore import ColumnStore
    from mplan2vdl_tpu.engine.lower import compile_plan_text

    cache = "/root/.cache/mplan2vdl_store_sf1_seed1"
    store = ColumnStore.load(cache) if os.path.isdir(cache) else \
        datagen.generate(sf=1.0, seed=1)
    cfg = store.make_catalog()
    with open("/root/reference/tests/tpch10noorder/06.sql.mplan") as f:
        text = f.read()
    cq = compile_plan_text(text, cfg, store)
    args = cq.device_args()
    nbytes = sum(int(np.asarray(a).nbytes) for a in args)
    n = len(args[0])
    print(f"n={n} scanned={nbytes/1e6:.1f}MB roofline={nbytes/BW*1e3:.3f}ms")

    def q6_pert_all(a, acc):
        pert = jnp.where(acc < 0, 1, 0)
        aa = tuple(x + pert.astype(x.dtype) for x in a)
        outs = cq._run(aa)
        return (jnp.asarray(outs[0][1], jnp.int64)
                + jnp.asarray(outs[0][0][0], jnp.int64))

    def q6_pert_one(a, acc):
        pert = jnp.where(acc < 0, 1, 0)
        aa = (a[0] + pert.astype(a[0].dtype),) + tuple(a[1:])
        outs = cq._run(aa)
        return (jnp.asarray(outs[0][1], jnp.int64)
                + jnp.asarray(outs[0][0][0], jnp.int64))

    def scan4_pert_one(a, acc):
        pert = jnp.where(acc < 0, 1, 0)
        s = jnp.sum(a[0] + pert.astype(a[0].dtype), dtype=jnp.int64)
        for x in a[1:]:
            s = s + jnp.sum(x, dtype=jnp.int64)
        return s

    def scan4_pert_all(a, acc):
        pert = jnp.where(acc < 0, 1, 0)
        s = jnp.int64(0)
        for x in a:
            s = s + jnp.sum(x + pert.astype(x.dtype), dtype=jnp.int64)
        return s

    sel = set(sys.argv[2:]) if len(sys.argv) > 2 else None
    for name, f in [("q6_pert_all", q6_pert_all),
                    ("q6_pert_one", q6_pert_one),
                    ("scan4_pert_one", scan4_pert_one),
                    ("scan4_pert_all", scan4_pert_all)]:
        if sel and name not in sel:
            continue
        t = timeit(f, *args, iters=256)
        print(f"{name:18s} t={t*1e3:.3f}ms bw={nbytes/t/1e9:.0f}GB/s "
              f"roofline={nbytes/BW/t:.3f}", flush=True)


def probe_sort():
    rng = np.random.default_rng(0)
    for n in (1_500_000, 6_000_000):
        keys = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))
        vals = jnp.asarray(np.arange(n, dtype=np.int32))
        keys64 = keys.astype(jnp.int64)
        perm = jnp.asarray(rng.permutation(n).astype(np.int32))

        def s_key32(a, acc):
            out = lax.sort(a[0] + jnp.where(acc < 0, 1, 0).astype(jnp.int32))
            return jnp.asarray(out[0], jnp.int64)

        def s_pair32(a, acc):
            k, v = lax.sort((a[0] + jnp.where(acc < 0, 1, 0)
                             .astype(jnp.int32), a[1]), num_keys=1)
            return jnp.asarray(k[0], jnp.int64) + jnp.asarray(v[0], jnp.int64)

        def s_key64(a, acc):
            out = lax.sort(a[2] + jnp.where(acc < 0, 1, 0).astype(jnp.int64))
            return jnp.asarray(out[0], jnp.int64)

        def s_argsort(a, acc):
            out = jnp.argsort(a[0] + jnp.where(acc < 0, 1, 0)
                              .astype(jnp.int32))
            return jnp.asarray(out[0], jnp.int64)

        def s_stable_pair(a, acc):
            k, v = lax.sort((a[0] + jnp.where(acc < 0, 1, 0)
                             .astype(jnp.int32), a[1]), num_keys=1,
                            is_stable=True)
            return jnp.asarray(k[0], jnp.int64) + jnp.asarray(v[0], jnp.int64)

        def s_cumsum(a, acc):
            out = jnp.cumsum(a[0] + jnp.where(acc < 0, 1, 0)
                             .astype(jnp.int32), dtype=jnp.int32)
            return jnp.asarray(out[-1], jnp.int64)

        def s_scatter_perm(a, acc):
            # apply a permutation via scatter (unique indices)
            src = a[1] + jnp.where(acc < 0, 1, 0).astype(jnp.int32)
            out = jnp.zeros_like(src).at[a[3]].set(
                src, unique_indices=True, mode="drop")
            return jnp.asarray(out[0], jnp.int64)

        def s_gather_perm(a, acc):
            src = a[1] + jnp.where(acc < 0, 1, 0).astype(jnp.int32)
            out = jnp.take(src, a[3])
            return jnp.asarray(out[0], jnp.int64)

        its = 16 if n > 2_000_000 else 32
        allf = [("cumsum32", s_cumsum),
                ("scatter_perm32", s_scatter_perm),
                ("gather_perm32", s_gather_perm),
                ("sort_key32", s_key32), ("sort_pair32", s_pair32),
                ("sort_stablepair32", s_stable_pair),
                ("sort_key64", s_key64), ("argsort32", s_argsort)]
        sel = set(sys.argv[2:]) if len(sys.argv) > 2 else None
        for name, f in allf:
            if sel and name not in sel:
                continue
            try:
                t = timeit(f, keys, vals, keys64, perm, iters=its)
                print(f"n={n} {name:18s} t={t*1e3:8.3f}ms "
                      f"{t/n*1e9:7.3f}ns/elem", flush=True)
            except Exception as e:
                print(f"n={n} {name:18s} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "q6"
    if which == "q6":
        probe_q6()
    else:
        probe_sort()
