"""Cumsum strategy shootout on the real chip.

jnp.cumsum lowers to XLA reduce-window on TPU — suspected dominant cost
of the sparse-fold / mergesearch paths (it is a top-traffic op in the
Q15/Q17/Q18 programs).  Candidates:
  * reduce-window (jnp.cumsum — the status quo)
  * lax.associative_scan (work-efficient log-depth scan)
  * manual log-sweep (shift + add, the FMIN/FMAX segmented pattern)

Timing: host-chained dispatches of a bare jitted step (the fori_loop
wrapper hangs the tunneled compile service on reduce-window bodies —
the same harness limit bench.py's chain mode works around).

Usage: python tools/probe_cumsum.py [--n 1500000]
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


def timed_chain(fn, x, iters=30):
    """Median per-call seconds: K chained dispatches, fetch barrier."""

    def step(acc, a):
        p = (acc & 1).astype(a.dtype)
        r = fn(a + p)
        return acc + jnp.asarray(r[r.shape[0] - 1], jnp.int64) \
            + jnp.asarray(r[0], jnp.int64)

    js = jax.jit(step)

    def run(k):
        acc = jnp.int64(0)
        for _ in range(k):
            acc = js(acc, x)
        return np.asarray(acc)

    run(2)
    run(2 + iters)

    def m(k):
        ts = []
        for _ in range(3):
            t0 = time.time()
            run(k)
            ts.append(time.time() - t0)
        return sorted(ts)[1]

    return max(m(2 + iters) - m(2), 1e-9) / iters


def logsweep(x):
    n = x.shape[0]
    shift = 1
    while shift < n:
        x = x + jnp.concatenate(
            [jnp.zeros((shift,), x.dtype), x[:-shift]])
        shift *= 2
    return x


def blocked2(x, B=2048):
    """Two-level scan: lane-axis cumsum per block + tiny offset scan."""
    n = x.shape[0]
    npad = -(-n // B) * B
    xp = jnp.zeros((npad,), x.dtype).at[:n].set(x)
    cs = jnp.cumsum(xp.reshape(-1, B), axis=1)
    tot = cs[:, -1]
    offs = jnp.cumsum(tot) - tot
    return (cs + offs[:, None]).reshape(-1)[:n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_500_000)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    n = args.n
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.integers(0, 100, n).astype(np.int32))
    x64 = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    want = np.cumsum(np.asarray(x32), dtype=np.int64)

    for label, fn in [
        ("reduce_window (jnp.cumsum)", lambda a: jnp.cumsum(a)),
        ("associative_scan", lambda a: lax.associative_scan(jnp.add, a)),
        ("logsweep", lambda a: logsweep(a)),
        ("blocked2level", lambda a: blocked2(a)),
    ]:
        got = np.asarray(jax.jit(fn)(x64.astype(jnp.int64)))
        assert np.array_equal(got[: n], np.cumsum(np.asarray(x64),
                                                  dtype=np.int64)), label
        for dt, x in (("i32", x32), ("i64", x64)):
            t = timed_chain(fn, x, args.iters)
            print(f"{label:28s} {dt} n={n}: {t*1e6:8.1f} us "
                  f"{t/n*1e9:6.3f} ns/el", flush=True)


if __name__ == "__main__":
    main()
