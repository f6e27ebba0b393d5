"""Distributed execution primitives: row-sharded scan/filter/aggregate.

The reference is a single-process compiler whose only "parallel" notions
are hierarchical/shuffled folds (Vlite.hs:1173-1194); everything here is
new TPU-native capability, following the dense-composite-key discipline:

  * fact-table rows are sharded over the mesh's ``d`` axis; each chip owns
    a contiguous padded row range in its HBM
  * predicates / per-row arithmetic are shard-local (zero communication)
  * group-by: each shard computes a *dense* partial aggregate vector over
    the bit-packed bounded key domain; ONE ``psum`` over ICI combines all
    shards (the TPU-native analog of the reference's 2-level fold); the
    tiny combined vector is then compacted to occupied groups
  * ``shuffle_by_key`` is the all_to_all exchange primitive that the
    distributed hash join / large-domain group-by build on (keys are
    range-partitioned across chips; values land on their owner shard)

``DistQuery`` compiles a {filter-mask, keys, per-aggregate data} spec into
one jitted shard_map step.  The single-chip engine handles everything else
this round; ROADMAP.md tracks full distributed planning.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax

from .. import jaxcfg  # noqa: F401  (x64 + persistent compilation cache)

import jax.numpy as jnp

from ..engine import scan
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "d") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


@dataclass
class ShardedTable:
    """Columns of one table, row-sharded over the mesh with padding."""

    mesh: Mesh
    n_rows: int
    shard_rows: int
    columns: Dict[str, jax.Array]

    @classmethod
    def put(cls, mesh: Mesh, columns: Dict[str, np.ndarray]) -> "ShardedTable":
        n = len(next(iter(columns.values())))
        n_dev = mesh.devices.size
        shard_rows = -(-n // n_dev)
        padded = shard_rows * n_dev
        sharding = NamedSharding(mesh, P("d"))
        out = {}
        for name, arr in columns.items():
            buf = np.zeros(padded, dtype=np.asarray(arr).dtype)
            buf[:n] = arr
            out[name] = jax.device_put(buf, sharding)
        return cls(mesh=mesh, n_rows=n, shard_rows=shard_rows, columns=out)


@dataclass
class DistQuery:
    """A distributed scan -> filter -> group-by -> sum query.

    mask_fn(cols)        -> boolean row mask (shard-local)
    key_fn(cols)         -> dense int group ids in [0, domain) (shard-local)
    agg_fns              -> name -> per-row int64 term to sum per group
    The combine is a single psum over ICI; avg-style post-ops divide the
    combined sums host-side with the engine's truncating division.
    """

    table: ShardedTable
    domain: int
    mask_fn: Callable
    key_fn: Callable
    agg_fns: Dict[str, Callable]

    def __post_init__(self):
        mesh = self.table.mesh
        shard_rows = self.table.shard_rows
        n_rows = self.table.n_rows
        names = sorted(self.table.columns)
        aggs = sorted(self.agg_fns)
        domain = self.domain

        @partial(jax.shard_map, mesh=mesh, in_specs=(P("d"),),
                 out_specs=P(), check_vma=False)
        def step(arrays):
            cols = dict(zip(names, arrays))
            shard = lax.axis_index("d")
            start = (shard * shard_rows).astype(jnp.int64)
            local_n = jnp.clip(n_rows - start, 0, shard_rows)
            rowmask = jnp.arange(shard_rows, dtype=jnp.int64) < local_n
            keep = self.mask_fn(cols) & rowmask
            ids = jnp.clip(self.key_fn(cols).astype(jnp.int64), 0, domain - 1)
            ids_ok = jnp.where(keep, ids, domain)
            outs = []
            for a in aggs:
                term = self.agg_fns[a](cols).astype(jnp.int64)
                dense = jax.ops.segment_sum(term, ids_ok,
                                            num_segments=domain + 1)[:domain]
                outs.append(lax.psum(dense, "d"))
            occ = jax.ops.segment_sum(keep.astype(jnp.int64), ids_ok,
                                      num_segments=domain + 1)[:domain]
            return tuple(outs) + (lax.psum(occ, "d"),)

        self._aggs = aggs
        self._names = names
        self._step = jax.jit(step)

    def __call__(self) -> Dict[str, np.ndarray]:
        arrays = tuple(self.table.columns[n] for n in self._names)
        outs = self._step(arrays)
        dense, occ = outs[:-1], np.asarray(outs[-1])
        sel = np.nonzero(occ > 0)[0]
        res = {"__group_id": sel, "__count": occ[sel]}
        for a, d in zip(self._aggs, dense):
            res[a] = np.asarray(d)[sel]
        return res


def shuffle_by_key(mesh: Mesh, keys: jax.Array, values: jax.Array,
                   key_hi: int) -> Tuple[jax.Array, jax.Array]:
    """All-to-all exchange: route each (key, value) pair to the chip that
    owns its key range — the building block of the distributed hash join
    and the sparse-domain distributed group-by.

    Keys are range-partitioned: chip i owns keys in
    [i*ceil(key_hi/n), (i+1)*ceil(...)).  Every shard sends one fixed-size
    bucket to every other shard (2x local size capacity; overflow is a
    compile-time capacity error surfaced as dropped=True rows), so the
    exchange is a single all_to_all over ICI.
    Returns (keys, values) with rows owned by the local chip, padded with
    key_hi sentinels.
    """
    n_dev = mesh.devices.size
    per = -(-key_hi // n_dev)
    cap = 2 * (keys.shape[0] // n_dev) + 8  # per-destination bucket capacity

    @partial(jax.shard_map, mesh=mesh, in_specs=(P("d"), P("d")),
             out_specs=(P("d"), P("d")), check_vma=False)
    def exchange(k, v):
        k = k.reshape(-1)
        v = v.reshape(-1)
        dest = jnp.clip(k // per, 0, n_dev - 1)
        # stable sort by destination, then slot rows into fixed buckets
        order = jnp.argsort(dest, stable=True)
        ks, vs, ds = k[order], v[order], dest[order]
        # position within destination bucket
        onehot_cum = scan.cumsum(
            jax.nn.one_hot(ds, n_dev, dtype=jnp.int64))
        within = onehot_cum[jnp.arange(ks.shape[0]), ds] - 1
        slot = ds * cap + jnp.minimum(within, cap - 1)
        buck_k = jnp.full((n_dev * cap,), key_hi, dtype=k.dtype)
        buck_v = jnp.zeros((n_dev * cap,), dtype=v.dtype)
        buck_k = buck_k.at[slot].set(ks)
        buck_v = buck_v.at[slot].set(vs)
        bk = lax.all_to_all(buck_k.reshape(n_dev, cap), "d", 0, 0,
                            tiled=False)
        bv = lax.all_to_all(buck_v.reshape(n_dev, cap), "d", 0, 0,
                            tiled=False)
        return bk.reshape(1, -1), bv.reshape(1, -1)

    return exchange(keys, values)
