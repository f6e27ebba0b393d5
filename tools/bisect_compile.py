"""Per-construct TPU compile-time bisect for the compile wall
(ROADMAP: 100-1000s compiles at SF0.25; tpu_compile_helper crashes on
Q9/Q10/Q13/Q17 at SF>=0.05).

Times AOT lowering+compilation (jax.jit(...).lower(...).compile()) of
one construct at a time at realistic sizes, so the blowup construct is
identified instead of guessed.  Run with --list to see cases.

Usage: python tools/bisect_compile.py [--n 1500000] [--cases a,b,...]
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

jax.config.update("jax_enable_x64", True)


def mk(n, dtype=jnp.int64, lo=0, hi=1 << 40):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(lo, hi, size=n).astype(np.int64)).astype(dtype)


CASES = {}


def case(f):
    CASES[f.__name__] = f
    return f


@case
def sort1_i64(n):
    x = mk(n)
    return (lambda a: lax.sort(a)), (x,)


@case
def sort1_i32(n):
    x = mk(n, jnp.int32, hi=1 << 30)
    return (lambda a: lax.sort(a)), (x,)


@case
def sort2_i64(n):
    x, y = mk(n), mk(n)
    return (lambda a, b: lax.sort((a, b), num_keys=1)), (x, y)


@case
def sort2_i64_i32val(n):
    x, y = mk(n), mk(n, jnp.int32, hi=1 << 30)
    return (lambda a, b: lax.sort((a, b), num_keys=1)), (x, y)


@case
def sort4_i64(n):
    xs = [mk(n) for _ in range(4)]
    return (lambda *a: lax.sort(a, num_keys=1)), tuple(xs)


@case
def argsort_i64(n):
    x = mk(n)
    return (lambda a: jnp.argsort(a)), (x,)


@case
def searchsorted_i64(n):
    x, q = mk(n), mk(n)
    return (lambda a, b: jnp.searchsorted(a, b)), (x, q)


@case
def searchsorted_i32(n):
    x = mk(n, jnp.int32, hi=1 << 30)
    q = mk(n, jnp.int32, hi=1 << 30)
    return (lambda a, b: jnp.searchsorted(a, b)), (x, q)


@case
def cumsum_i64(n):
    x = mk(n, hi=1 << 20)
    return (lambda a: jnp.cumsum(a)), (x,)


@case
def cumsum_i32(n):
    x = mk(n, jnp.int32, hi=1 << 20)
    return (lambda a: jnp.cumsum(a)), (x,)


@case
def gather_i64(n):
    x, i = mk(n), mk(n, jnp.int32, hi=n)
    return (lambda a, idx: a[idx]), (x, i)


@case
def joinish_sort_search_cum(n):
    """The synthetic sort-merge join shape that reproduced >9min."""
    k1, k2 = mk(n), mk(n)

    def f(a, b):
        sa = lax.sort(a)
        pos = jnp.searchsorted(sa, b)
        lo = jnp.searchsorted(sa, b, side="left")
        hi = jnp.searchsorted(sa, b, side="right")
        cnt = hi - lo
        off = jnp.cumsum(cnt)
        return pos, off

    return f, (k1, k2)


@case
def scatter_add_i64(n):
    x = mk(n, hi=1 << 20)
    i = mk(n, jnp.int32, hi=1024)
    z = jnp.zeros(1024, jnp.int64)
    return (lambda a, idx, zz: zz.at[idx].add(a)), (x, i, z)


@case
def nonzero_size_i64(n):
    x = mk(n, jnp.int32, hi=2)
    return (lambda a: jnp.nonzero(a, size=n // 2, fill_value=0)[0]), (x,)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_500_000)
    ap.add_argument("--cases", default=",".join(CASES))
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--timeout-note", default="")
    args = ap.parse_args()
    if args.list:
        print("\n".join(CASES))
        return

    print(f"backend={jax.default_backend()} n={args.n}", flush=True)
    for name in args.cases.split(","):
        f, xs = CASES[name.strip()](args.n)
        t0 = time.time()
        try:
            c = jax.jit(f).lower(*xs).compile()
            tc = time.time() - t0
            t1 = time.time()
            r = jax.block_until_ready(c(*xs))
            tr = time.time() - t1
            print(f"{name:28s} compile {tc:8.1f}s  run {tr*1e3:8.1f}ms",
                  flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED after {time.time()-t0:.1f}s: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
