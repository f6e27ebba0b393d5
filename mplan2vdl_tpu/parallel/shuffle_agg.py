"""Distributed sparse-domain group-by: local pre-aggregation + all_to_all
key shuffle + owner-side combine.

The dense-psum path (parallel/auto.py) needs a bounded key domain; sparse
group-bys (Q3's orderkey-keyed aggregation, domain ~2^38) instead follow
the classic distributed hash-aggregation recipe, expressed TPU-natively:

  shard-local:  sort local (key, value) rows -> run-segmented partials
                (each shard's distinct keys <= its row count)
  exchange:     range-partition keys over the mesh's ``d`` axis; ONE
                all_to_all moves every partial to its key's owner shard
  owner-side:   sort received partials -> run-segmented combine

All shapes are static: the exchange uses fixed per-destination bucket
capacities derived from the local distinct-key bound, and a capacity
overflow is detected and reported (skew-aware repartitioning: ROADMAP).
Combination must be associative (sum/min/max — avg is sum/count upstream).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

import jax

from .. import jaxcfg  # noqa: F401  (x64 + persistent compilation cache)

import jax.numpy as jnp

from ..engine import scan
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_SENT = jnp.int64(2**62)  # sorts after every real key


def _run_reduce(keys, vals_list, ops, n_out):
    """Sort rows by key and reduce runs; invalid rows carry _SENT keys.
    Returns (run_keys, reduced values list, with _SENT padding)."""
    order = jnp.argsort(keys)
    ks = keys[order]
    head = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    run_id = scan.cumsum_flags(head) - 1
    run_ok = jnp.where(ks < _SENT, run_id, n_out)
    outs = []
    import jax.ops

    segops = {"sum": jax.ops.segment_sum, "max": jax.ops.segment_max,
              "min": jax.ops.segment_min}
    for v, op in zip(vals_list, ops):
        vs = v[order]
        outs.append(segops[op](vs, run_ok, num_segments=n_out + 1)[:n_out])
    kout = jax.ops.segment_max(jnp.where(ks < _SENT, ks, -1), run_ok,
                               num_segments=n_out + 1)[:n_out]
    kout = jnp.where(kout < 0, _SENT, kout)
    return kout, outs


def shard_shuffle_combine(keys, vals, ops, shard_rows, n_dev, per_owner,
                          cap):
    """The shard-side body: local pre-agg, all_to_all exchange, owner
    combine.  Callable inside any shard_map over axis 'd'.  Returns
    (owner keys, combined values, overflow count); padding keys = _SENT."""
    # 1. local pre-aggregation
    lk, lvals = _run_reduce(keys, vals, ops, shard_rows)
    # 2. route each local group to its key's owner
    dest = jnp.clip(lk // per_owner, 0, n_dev - 1)
    dest = jnp.where(lk < _SENT, dest, n_dev)  # padding: nowhere
    order = jnp.argsort(dest)
    ks, ds = lk[order], dest[order]
    vs = [v[order] for v in lvals]
    onehot = jax.nn.one_hot(jnp.clip(ds, 0, n_dev - 1), n_dev,
                            dtype=jnp.int64)
    within = (scan.cumsum(onehot)
              [jnp.arange(ks.shape[0]), jnp.clip(ds, 0, n_dev - 1)] - 1)
    overflow = jnp.sum((within >= cap) & (ds < n_dev))
    slot = jnp.where(ds < n_dev, ds * cap + jnp.minimum(within, cap - 1),
                     n_dev * cap)
    bk = jnp.full((n_dev * cap + 1,), _SENT, jnp.int64)
    bk = bk.at[slot].set(ks, mode="drop")[:n_dev * cap]
    bvs = []
    for v in vs:
        bv = jnp.zeros((n_dev * cap + 1,), v.dtype)
        bvs.append(bv.at[slot].set(v, mode="drop")[:n_dev * cap])
    rk = lax.all_to_all(bk.reshape(n_dev, cap), "d", 0, 0)
    rvs = [lax.all_to_all(b.reshape(n_dev, cap), "d", 0, 0) for b in bvs]
    # 3. owner-side combine over everything received
    gk, gvals = _run_reduce(rk.reshape(-1), [r.reshape(-1) for r in rvs],
                            ops, n_dev * cap)
    return gk, gvals, overflow


@dataclass
class ShuffleGroupBy:
    """Compiled sparse distributed group-by over pre-sharded inputs.

    ``key_hi``: exclusive upper bound of key values (from catalog bounds).
    ``ops``: per-value associative combiner ("sum" | "min" | "max").
    """

    mesh: Mesh
    shard_rows: int
    key_hi: int
    ops: Sequence[str]

    def __post_init__(self):
        n_dev = self.mesh.devices.size
        per_owner = -(-self.key_hi // n_dev)
        # capacity per destination bucket: assume no shard sends more than
        # cap partials to one owner (uniform-ish keys; overflow detected)
        cap = 2 * (self.shard_rows // n_dev) + 64
        shard_rows, ops = self.shard_rows, tuple(self.ops)

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(P("d"),) * (1 + len(ops)),
                 out_specs=(P("d"),) * (2 + len(ops)),
                 check_vma=False)
        def step(keys, *vals):
            keys = keys.reshape(-1)
            vals = [v.reshape(-1) for v in vals]
            gk, gvals, overflow = shard_shuffle_combine(
                keys, vals, ops, shard_rows, n_dev, per_owner, cap)
            return (gk.reshape(1, -1), jnp.array([overflow]).reshape(1, 1)
                    ) + tuple(v.reshape(1, -1) for v in gvals)

        self._step = jax.jit(step)
        self.cap = cap
        self.n_dev = n_dev

    def __call__(self, keys: jax.Array, vals: Sequence[jax.Array]):
        outs = self._step(keys, *vals)
        gk, overflow = np.asarray(outs[0]).reshape(-1), int(
            np.asarray(outs[1]).sum())
        if overflow:
            raise RuntimeError(
                f"shuffle bucket overflow ({overflow} partials dropped) — "
                "raise capacity or enable skew repartitioning")
        gvals = [np.asarray(o).reshape(-1) for o in outs[2:]]
        keep = gk < int(_SENT)
        return gk[keep], [v[keep] for v in gvals]
