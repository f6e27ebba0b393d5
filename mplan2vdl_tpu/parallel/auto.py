"""Automatic distributed execution of single-fact-table aggregate plans.

Takes a compiled query's vector IR (after the predication pass — the
filter is a fold mask, so the pre-aggregate stage is embarrassingly
row-parallel) and, when the plan qualifies, runs it distributed:

  * qualification: every Load under the terminal Folds belongs to one
    table; all Folds share one group-id vector with a dense (bounded)
    domain
  * each shard evaluates the group-ids/data/mask trees on its row range
    with the ordinary engine Compiler (the full scalar op set works
    shard-locally) and produces a *dense per-domain partial* per Fold
  * one collective per Fold combines partials over ICI: psum for sums /
    counts, pmax/pmin for max/min/choose (empty segments carry the
    segment-reduce identity, which the lattice collectives absorb)
  * the tiny combined vectors are compacted to occupied groups and seeded
    into a fresh Compiler memo, which then evaluates the remaining
    group-level expressions (avg divisions, key reuse) unchanged

This distributes TPC-H Q1/Q6-class queries end-to-end from the same IR the
single-chip engine runs, with no per-query code.  Joins fall back to
single-chip (distributed shuffle join: ROADMAP.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import vir as V
from ..catalog import Config
from ..engine.columnstore import ColumnStore
from ..engine.lower import (Compiler, Val, _children, _mask_tail, dtype_for)
from ..names import Name


class NotDistributable(Exception):
    pass


def _collect_folds(vexps: List[V.Vexp]) -> List[V.Vexp]:
    seen, folds = set(), {}

    def go(v: V.Vexp):
        if v.skey in seen:
            return
        seen.add(v.skey)
        if isinstance(v.vx, V.Fold) and v.vx.foldop != V.FSEL:
            folds[v.skey] = v
            return  # the fold subtree runs shard-side
        for c in _children(v.vx):
            go(c)

    for v in vexps:
        go(v)
    return list(folds.values())


def _loads_under(v: V.Vexp) -> List[Name]:
    seen, out = set(), []

    def go(x: V.Vexp):
        if x.skey in seen:
            return
        seen.add(x.skey)
        if isinstance(x.vx, V.Load):
            out.append(x.vx.name)
        for c in _children(x.vx):
            go(c)

    go(v)
    return out


class _ShardCompiler(Compiler):
    """Loads yield the local row shard with a shard-local valid count."""

    def __init__(self, cfg, store, local_valid, shard_tables):
        super().__init__(cfg, store)
        self.local_valid = local_valid
        self.memo, self.group_cache, self.join_cache = {}, {}, {}
        self.tables = shard_tables

    def _eval(self, v: V.Vexp):
        vx = v.vx
        if isinstance(vx, V.Load):
            arr = self.tables[vx.name]
            return Val(data=_mask_tail(arr, self.local_valid, len(arr)),
                       valid=self.local_valid, length=len(arr))
        if isinstance(vx, V.RangeC):
            # table-row ranges size to the shard
            return Val(data=None, valid=vx.rcount, length=vx.rcount,
                       lazy_range=(vx.rmin, vx.rstep))
        return super()._eval(v)


_SEG_IDENT = {V.FSUM: 0, V.FMAX: None, V.FMIN: None, V.FCHOOSE: None}


@dataclass
class AutoDistributed:
    """A qualifying plan compiled for the mesh."""

    cfg: Config
    store: ColumnStore
    vexps: List[V.Vexp]
    mesh: Mesh

    def __post_init__(self):
        folds = _collect_folds(self.vexps)
        if not folds:
            raise NotDistributable("no aggregate stage")
        g0 = folds[0].vx.fgroups
        if any(f.vx.fgroups.skey != g0.skey for f in folds):
            raise NotDistributable("aggregates use different group keys")
        domain = g0.info.bounds[1] + 1
        if domain > (1 << 20):
            raise NotDistributable("group domain too large for dense combine")
        tables = set()
        for f in folds:
            for nm in _loads_under(f):
                tables.add(nm[0])
        if len(tables) != 1:
            raise NotDistributable(f"aggregate stage reads tables {tables}")
        self.table = (next(iter(tables)),)
        self.folds = folds
        self.domain = domain

        n = self.store.table_count(self.table)
        n_dev = self.mesh.devices.size
        self.shard_rows = -(-n // n_dev)
        self.padded = self.shard_rows * n_dev
        self.n_rows = n
        self.loads = sorted({nm for f in folds for nm in _loads_under(f)})

        shard_rows, domain_, folds_, loads = (self.shard_rows, self.domain,
                                              self.folds, self.loads)
        cfg, store = self.cfg, self.store

        @partial(jax.shard_map, mesh=self.mesh, in_specs=(P("d"), P()),
                 out_specs=P(), check_vma=False)
        def step(arrays, counts):
            local = dict(zip(loads, (a.reshape(-1) for a in arrays)))
            shard = lax.axis_index("d")
            start = (shard * shard_rows).astype(jnp.int64)
            local_valid = jnp.clip(counts[0] - start, 0, shard_rows)
            c = _ShardCompiler(cfg, store, local_valid, local)
            outs = []
            for f in folds_:
                vx = f.vx
                g = c._force(c.eval(vx.fgroups))
                d = c._force(c.eval(vx.fdata))
                dt = dtype_for(f.info)
                nloc = g.length
                idx = jnp.arange(nloc, dtype=jnp.int64)
                valid = idx < jnp.asarray(g.valid, jnp.int64)
                if vx.fmask is not None:
                    m = c._force(c.eval(vx.fmask))
                    valid = valid & (m.data[:nloc] != 0)
                ids = jnp.clip(g.data.astype(jnp.int64), 0, domain_ - 1)
                ids_ok = jnp.where(valid, ids, domain_)
                from ..engine.kernels import segred

                if domain_ <= segred.SMALL_DOMAIN:
                    opname = {V.FSUM: "sum", V.FMAX: "max", V.FMIN: "min",
                              V.FCHOOSE: "max"}[vx.foldop]
                    dense = segred.masked_group_reduce(
                        d.data[:nloc].astype(dt), ids_ok, domain_, opname)
                    occ_local = segred.group_counts(ids_ok, domain_)
                else:
                    import jax.ops

                    segop = {V.FSUM: jax.ops.segment_sum,
                             V.FMAX: jax.ops.segment_max,
                             V.FMIN: jax.ops.segment_min,
                             V.FCHOOSE: jax.ops.segment_max}[vx.foldop]
                    dense = segop(d.data[:nloc].astype(dt), ids_ok,
                                  num_segments=domain_ + 1)[:domain_]
                    occ_local = jax.ops.segment_sum(
                        valid.astype(jnp.int64), ids_ok,
                        num_segments=domain_ + 1)[:domain_]
                comb = {V.FSUM: partial(lax.psum, axis_name="d"),
                        V.FMAX: partial(lax.pmax, axis_name="d"),
                        V.FMIN: partial(lax.pmin, axis_name="d"),
                        V.FCHOOSE: partial(lax.pmax, axis_name="d")}[vx.foldop]
                outs.append(comb(dense))
            occ = lax.psum(occ_local, "d")
            return tuple(outs) + (occ,)

        self._step = jax.jit(step)

    def __call__(self):
        args = tuple(self._shard(self.store.columns[nm]) for nm in self.loads)
        counts = jnp.asarray([self.n_rows], jnp.int64)
        outs = self._step(args, counts)
        dense_list, occ = outs[:-1], outs[-1]

        # compact to occupied groups and seed the fold results into a
        # fresh single-device Compiler that evaluates the rest of the DAG
        occ_np = np.asarray(occ)
        sel = np.nonzero(occ_np > 0)[0]
        ngroups = len(sel)
        c = Compiler(self.cfg, self.store)
        c.memo, c.group_cache, c.join_cache = {}, {}, {}
        c.tables = {}
        for f, dense in zip(self.folds, dense_list):
            L_out = min(self.domain, f.info.count)
            buf = np.zeros(L_out, dtype=np.asarray(dense).dtype)
            take = np.asarray(dense)[sel[:L_out]]
            buf[:len(take)] = take
            c.memo[f.skey] = Val(data=jnp.asarray(buf), valid=ngroups,
                                 length=L_out)
        vals = [c._force(c.eval(v)) for v in self.vexps]
        cols = []
        for v, val in zip(self.vexps, vals):
            nv = int(val.valid) if not isinstance(val.valid, int) else val.valid
            cols.append((v.name, v.info.dtype, np.asarray(val.data)[:nv]))
        return cols

    def _shard(self, arr: np.ndarray) -> jax.Array:
        buf = np.zeros(self.padded, dtype=arr.dtype)
        buf[:len(arr)] = arr
        return jax.device_put(buf, NamedSharding(self.mesh, P("d")))


def distribute(cfg: Config, store: ColumnStore, vexps: List[V.Vexp],
               mesh: Mesh) -> AutoDistributed:
    return AutoDistributed(cfg=cfg, store=store, vexps=vexps, mesh=mesh)
