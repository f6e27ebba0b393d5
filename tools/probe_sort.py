"""Measure the engine's actual sort-path constructs on the real chip.

The round-1 microbench row everyone quotes (sort_int64 = 1% of roofline)
measured a 1-operand int64 lax.sort.  The engine's sorts are 2-operand
int32 (key, row-index) stable sorts plus searchsorted probes — this tool
measures THOSE, at engine shapes, so the Pallas-sort decision is made
against reality (VERDICT r1 item 2: "that projection deserves
adversarial testing").

K-pair fori_loop timing, same methodology as tools/bench_queries.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mplan2vdl_tpu import jaxcfg  # noqa: F401

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


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


def main():
    n = int(os.environ.get("PROBE_N", str(1 << 21)))  # ~2M
    m = int(os.environ.get("PROBE_M", str(n // 4)))
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))
    rkeys = jnp.asarray(rng.integers(0, n, m, dtype=np.int32))
    idx32 = jnp.arange(n, dtype=jnp.int32)
    data = jnp.asarray(rng.integers(0, 1 << 20, n, dtype=np.int32))

    cases = {}

    def sort1(k):
        return lax.sort(k)[0].astype(jnp.int64)
    cases["sort1_i32"] = (sort1, (keys,), 4 * n)

    def sort2(k, i):
        s, p = lax.sort((k, i), num_keys=1)
        return (s[0] + p[0]).astype(jnp.int64)
    cases["sort2_i32_argsort"] = (sort2, (keys, idx32), 8 * n)

    def sort2_stable(k, i):
        s, p = lax.sort((k, i), num_keys=1, is_stable=True)
        return (s[0] + p[0]).astype(jnp.int64)
    cases["sort2_i32_stable"] = (sort2_stable, (keys, idx32), 8 * n)

    def sort3(k, i, d):
        s, p, q = lax.sort((k, i, d), num_keys=1)
        return (s[0] + p[0] + q[0]).astype(jnp.int64)
    cases["sort3_i32"] = (sort3, (keys, idx32, data), 12 * n)

    def group_sparse(k, i, d):
        # the full _group_artifacts sparse path + FSUM fold
        sorted_ids, perm = lax.sort((k, i), num_keys=1)
        prev = jnp.concatenate([sorted_ids[:1] - 1, sorted_ids[:-1]])
        head = sorted_ids != prev
        sd = d[perm]
        cs = jnp.cumsum(sd.astype(jnp.int64))
        return cs[-1] + jnp.sum(head.astype(jnp.int64))
    cases["group_sparse_path"] = (group_sparse, (keys, idx32, data), 16 * n)

    def probe(l, rs):
        lo = jnp.searchsorted(rs, l, side="left")
        hi = jnp.searchsorted(rs, l, side="right")
        return jnp.sum((hi - lo).astype(jnp.int64))
    rs = jnp.sort(rkeys)
    cases["searchsorted_2x"] = (probe, (keys, rs), 8 * n)

    def join_build_probe(l, r):
        ridx = jnp.arange(r.shape[0], dtype=jnp.int32)
        rs, rs_idx = lax.sort((r, ridx), num_keys=1)
        lo = jnp.searchsorted(rs, l, side="left")
        hi = jnp.searchsorted(rs, l, side="right")
        return jnp.sum((hi - lo).astype(jnp.int64)) + rs_idx[0]
    cases["join_build_probe"] = (join_build_probe, (keys, rkeys), 8 * n + 8 * m)

    def gather_rand(d, p):
        return jnp.sum(d[p % n].astype(jnp.int64))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    cases["gather_random_i32"] = (gather_rand, (data, perm), 12 * n)

    from mplan2vdl_tpu.engine.lower import _sel_positions
    def compact(msk):
        return jnp.sum(_sel_positions(msk > 0).astype(jnp.int64))
    msk = jnp.asarray((rng.random(n) < 0.5).astype(np.int32))
    cases["compact_kernel"] = (compact, (msk,), 8 * n)

    print(f"n={n} m={m} device={jax.devices()[0].device_kind}")
    for name, (fn, args, bts) in cases.items():
        try:
            t, cs = timeit(fn, args)
            print(f"{name:24s} {t*1e6:9.1f} us  {t/n*1e9:6.2f} ns/el  "
                  f"{bts/t/1e9:6.0f} GB/s-equiv  (compile {cs:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {str(e)[:90]}",
                  flush=True)


if __name__ == "__main__":
    main()
