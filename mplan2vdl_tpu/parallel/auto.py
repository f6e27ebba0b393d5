"""Automatic distributed execution of fact-table aggregate plans.

Takes a compiled query's vector IR (after the predication pass) and, when
the plan qualifies, runs the pre-aggregate stage fully distributed:

  * the FACT table (the one whose row count carries the plan's row axis)
    is row-sharded over the mesh's ``d`` axis; all other (dimension)
    tables are replicated to every shard — so the FK-gather join algebra
    (Vlite.hs:1248-1282), selections, LIKE, and scalar arithmetic all run
    shard-local through the ordinary engine Compiler with zero
    communication
  * every terminal Fold shares one dense-bounded group-id vector; each
    shard produces a dense per-domain partial per Fold, and one lattice
    collective per Fold (psum / pmax / pmin over ICI) combines them —
    the TPU-native analog of the reference's hierarchical fold
    (Vlite.hs:1173-1194)
  * the combined vectors are compacted to occupied groups and seeded into
    a fresh Compiler memo, which evaluates the remaining group-level
    expressions (avg divisions, key reuse) unchanged

Disqualified (single-chip fallback): sparse group domains (> 2^20 —
pending the shuffle-based distributed group-by), JoinIndex general
equijoins (pending the distributed shuffle join), SortPerm ordering.
Identity-keyed group-bys disqualify automatically via the domain bound.
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
from ..engine.kernels import segred
from ..engine.lower import (Compiler, Val, _children, _mask_tail, dtype_for)
from ..names import Name


class NotDistributable(Exception):
    pass


def _collect_folds(vexps: List[V.Vexp]) -> List[V.Vexp]:
    """INNERMOST aggregate folds: the row->group reduction boundary.
    Outer folds over group-level frames (Q15's max-over-revenues) stay in
    the host-side group stage, evaluated from the seeded inner results."""
    seen, folds = set(), {}

    def go(v: V.Vexp):
        if v.skey in seen:
            return
        seen.add(v.skey)
        if isinstance(v.vx, V.Fold) and v.vx.foldop != V.FSEL:
            folds[v.skey] = v
        for c in _children(v.vx):
            go(c)

    for v in vexps:
        go(v)

    def has_nested(v: V.Vexp) -> bool:
        stack, s2 = list(_children(v.vx)), set()
        while stack:
            x = stack.pop()
            if x.skey in s2:
                continue
            s2.add(x.skey)
            if isinstance(x.vx, V.Fold) and x.vx.foldop != V.FSEL:
                return True
            stack.extend(_children(x.vx))
        return False

    return [v for v in folds.values() if not has_nested(v)]


def _subtree_scan(v: V.Vexp, fact_count: int = -1):
    """(loads, flags, fact_scatters) over a fold subtree."""
    seen, loads, scatters = set(), [], {}
    flags = {"join": False, "sort": False, "fact_dim": False}

    def go(x: V.Vexp):
        if x.skey in seen:
            return
        seen.add(x.skey)
        if isinstance(x.vx, V.Load):
            loads.append(x.vx.name)
        if isinstance(x.vx, V.JoinIndex):
            flags["join"] = True
        if isinstance(x.vx, V.SortPerm):
            flags["sort"] = True
        if (isinstance(x.vx, V.Shuffle) and x.vx.shop == V.SCATTER
                and x.vx.shshape is not None
                and x.vx.shshape.info.count == fact_count):
            # a join treats the sharded fact table as its dimension side
            # (Q4's exists-semijoin marks orders rows from lineitem): the
            # mask scatter targets the full fact domain, so it is computed
            # at full width on every shard from replicated inputs and each
            # shard slices its own row window
            flags["fact_dim"] = True
            scatters[x.skey] = x
        if (isinstance(x.vx, V.Shuffle) and x.vx.shop == V.GATHER
                and x.vx.shsource.info.count == fact_count
                and x.vx.shpos.info.count != fact_count):
            # positions live in a REPLICATED frame (e.g. lineitem fk values
            # indexing an orders-sized mask) and carry GLOBAL fact row ids:
            # the shard's row window cannot serve this gather, so the whole
            # node evaluates at full width; its output is replicated-frame
            # and flows into shard-local compute unchanged
            gfulls[x.skey] = x
        for c in _children(x.vx):
            go(c)

    gfulls = {}
    go(v)
    return loads, flags, scatters, gfulls


def _loads_under(*roots: V.Vexp):
    """Every table column read anywhere under the given nodes."""
    seen, out = set(), []

    def go(x: V.Vexp):
        if x.skey in seen:
            return
        seen.add(x.skey)
        if isinstance(x.vx, V.Load):
            out.append(x.vx.name)
        for c in _children(x.vx):
            go(c)

    for r in roots:
        if r is not None:
            go(r)
    return out


class _ShardCompiler(Compiler):
    """Loads of the fact table yield the local row shard; dimension tables
    are replicated.  Fact-sized ranges size to the shard."""

    def __init__(self, cfg, store, local_valid, shard_tables, fact_count):
        super().__init__(cfg, store)
        self.local_valid = local_valid
        self.fact_count = fact_count
        self.memo, self.group_cache, self.join_cache = {}, {}, {}
        self.tables = shard_tables
        self.scatter_skeys = frozenset()
        self.replicate_skeys = frozenset()
        self.full_tables = {}
        self._full_c = None

    def _full_eval(self, v: V.Vexp) -> Val:
        """Evaluate a node at full width from replicated inputs (identical
        on every shard) with a nested ordinary compiler."""
        if self._full_c is None:
            fc = Compiler(self.cfg, self.store)
            fc.memo, fc.group_cache, fc.join_cache = {}, {}, {}
            fc.tables = self.full_tables
            self._full_c = fc
        return self._full_c._force(self._full_c.eval(v))

    def _full_width_window(self, v: V.Vexp) -> Val:
        """Full-width eval of a fact-domain-sized scatter, sliced to this
        shard's row window for fact-frame elementwise consumption."""
        full = self._full_eval(v)
        buf = jnp.zeros((self._padded,), full.data.dtype)
        buf = buf.at[:full.length].set(full.data)
        win = lax.dynamic_slice(buf, (self._start,), (self._shard_rows,))
        return Val(data=_mask_tail(win, self.local_valid, self._shard_rows),
                   valid=self.local_valid, length=self._shard_rows)

    def _eval(self, v: V.Vexp):
        vx = v.vx
        if v.skey in self.scatter_skeys:
            return self._full_width_window(v)
        if v.skey in self.replicate_skeys:
            return self._full_eval(v)
        if isinstance(vx, V.Load):
            arr = self.tables[vx.name]
            n = arr.shape[-1]
            if v.info.count == self.fact_count:  # fact shard
                return Val(data=_mask_tail(arr, self.local_valid, n),
                           valid=self.local_valid, length=n)
            return Val(data=arr, valid=n, length=n)
        if isinstance(vx, V.RangeC) and vx.rcount == self.fact_count:
            # the fact table's row-id range sizes to the shard
            n = next(iter(self.tables.values())).shape[-1] \
                if self.tables else vx.rcount
            shard_rows = self._shard_rows
            return Val(data=None, valid=self.local_valid, length=shard_rows,
                       lazy_range=(vx.rmin, vx.rstep))
        return super()._eval(v)


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
        # single-group folds (bounds (0,0): global sums like Q11's having
        # threshold) coexist with one shared multi-group key; they reduce
        # into slot 0 of the shared domain and seed a 1-row group frame
        multi = [f for f in folds if f.vx.fgroups.info.bounds != (0, 0)]
        g0 = (multi or folds)[0].vx.fgroups
        domain = g0.info.bounds[1] + 1
        self.sparse = domain > (1 << 20)
        same_keys = all(f.vx.fgroups.skey == g0.skey for f in multi)
        # differing key EXPRESSIONS are fine when every fold maps rows into
        # the same dense domain (Q12: the predicated fold keeps raw masked
        # groups while unpredicated folds group compacted rows) — the
        # per-fold occupancy vectors are cross-checked at runtime
        self._check_occ = len(multi) > 0 and not same_keys
        if self._check_occ and (
                self.sparse or any(f.vx.fgroups.info.bounds != g0.info.bounds
                                   for f in multi)):
            raise NotDistributable("aggregates use different group keys")
        if self.sparse and (len(multi) != len(folds) or not same_keys):
            raise NotDistributable(
                "sparse group-by with heterogeneous fold keys")
        if any(f.vx.fgroups.info.count != folds[0].vx.fgroups.info.count
               for f in folds):
            raise NotDistributable("folds on different row frames")
        if self.sparse:
            # the shuffle path combines every fold through one exchange, so
            # all folds must share the same row validity
            masks = {f.vx.fmask.skey if f.vx.fmask is not None else None
                     for f in folds}
            if len(masks) != 1:
                raise NotDistributable(
                    "sparse group-by with differing fold masks")
        # the fact table carries the plan's row axis: its row count equals
        # the fold input length bound
        row_axis = folds[0].vx.fgroups.info.count
        loads, tabs, scatters, gfulls = [], set(), {}, {}
        for f in folds:
            ls, flags, scs, gfs = _subtree_scan(f, row_axis)
            if flags["join"]:
                raise NotDistributable(
                    "general equijoin (distributed shuffle join: ROADMAP)")
            if flags["sort"]:
                raise NotDistributable("ordered aggregate stage")
            scatters.update(scs)
            gfulls.update(gfs)
            loads += ls
            tabs.update(nm[0] for nm in ls)
        if not tabs:
            raise NotDistributable("aggregate stage reads no table")
        if scatters and self.sparse:
            raise NotDistributable(
                "fact-domain scatter in a sparse group-by")

        facts = {t for t in tabs
                 if self.store.table_count((t,)) == row_axis}
        if len(facts) != 1:
            raise NotDistributable(
                f"cannot identify a unique fact table among {tabs}")
        self.fact = next(iter(facts))
        self.fact_count = row_axis
        self.folds = folds
        self.domain = domain

        n = self.fact_count
        n_dev = self.mesh.devices.size
        self.shard_rows = -(-n // n_dev)
        self.padded = self.shard_rows * n_dev
        self.loads = sorted(set(loads))
        self.fact_loads = [nm for nm in self.loads if nm[0] == self.fact]
        self.dim_loads = [nm for nm in self.loads if nm[0] != self.fact]
        # fact columns read inside fact-domain scatter subtrees are ALSO
        # needed at full width (replicated) for the per-shard full-width
        # scatter evaluation; dim columns are replicated anyway
        full_roots = [r for s in scatters.values()
                      for r in (s.vx.shsource, s.vx.shpos, s.vx.shshape)]
        full_roots += [g.vx.shsource for g in gfulls.values()]
        full_roots += [g.vx.shpos for g in gfulls.values()]
        self.extra_full = sorted(
            {nm for nm in _loads_under(*full_roots)
             if nm[0] == self.fact})
        self.scatter_skeys = frozenset(scatters)
        self.replicate_skeys = frozenset(gfulls)

        shard_rows, domain_, folds_ = self.shard_rows, self.domain, self.folds
        fact_loads, dim_loads = self.fact_loads, self.dim_loads
        extra_full, scatter_keys_ = self.extra_full, self.scatter_skeys
        replicate_keys_ = self.replicate_skeys
        padded_ = self.padded
        cfg, store, fact_count = self.cfg, self.store, self.fact_count
        n_dev_ = self.mesh.devices.size
        sparse = self.sparse
        from .shuffle_agg import _SENT, shard_shuffle_combine

        per_owner = -(-domain // n_dev_)
        cap = getattr(self, "cap", None) or 2 * (shard_rows // n_dev_) + 64
        self.cap = cap
        def _rowid_choose(f: V.Vexp) -> bool:
            # FChoose whose data is the ROW INDEX itself (the
            # representative-row pick of handle_gather_join): single-chip
            # takes the FIRST row in row order, so the distributed combine
            # must be min over GLOBAL row ids, not max over local ones
            vx = f.vx
            fd = vx.fdata.vx
            return (vx.foldop == V.FCHOOSE and isinstance(fd, V.RangeV)
                    and fd.rmin == 0 and fd.rstep == 1
                    and fd.rref.info.count == fact_count
                    and vx.fdata.info.bounds == (0, fact_count - 1))

        rowid_ = tuple(_rowid_choose(f) for f in folds_)
        fold_ops = tuple(
            "min" if rid else {V.FSUM: "sum", V.FMAX: "max", V.FMIN: "min",
                               V.FCHOOSE: "max"}[f.vx.foldop]
            for f, rid in zip(folds_, rowid_))

        nf, nd = len(fact_loads), len(dim_loads)
        in_specs = (P("d"),) * nf + (P(),) * (nd + len(extra_full)) \
            + (P(),)

        def make_shard_compiler(arrays, counts):
            local = {}
            for nm, a in zip(fact_loads + dim_loads, arrays[:nf + nd]):
                local[nm] = a.reshape(-1)
            shard = lax.axis_index("d")
            start = (shard * shard_rows).astype(jnp.int64)
            local_valid = jnp.clip(counts[0] - start, 0, shard_rows)
            c = _ShardCompiler(cfg, store, local_valid, local, fact_count)
            c._shard_rows = shard_rows
            c.scatter_skeys = scatter_keys_
            c.replicate_skeys = replicate_keys_
            c.full_tables = {nm: a.reshape(-1) for nm, a in
                             zip(dim_loads + extra_full, arrays[nf:])}
            c._start = start
            c._padded = padded_
            return c

        @partial(jax.shard_map, mesh=self.mesh, in_specs=tuple(in_specs),
                 out_specs=(P("d"),) * (2 + len(folds_)), check_vma=False)
        def sparse_step(*all_in):
            arrays, counts = all_in[:-1], all_in[-1]
            c = make_shard_compiler(arrays, counts)
            f0 = folds_[0].vx
            g = c._force(c.eval(f0.fgroups))
            nloc = g.length
            idx = jnp.arange(nloc, dtype=jnp.int64)
            valid = idx < jnp.asarray(g.valid, jnp.int64)
            if f0.fmask is not None:
                m = c._force(c.eval(f0.fmask))
                valid = valid & (m.data[:nloc] != 0)
            keys = jnp.where(valid, g.data.astype(jnp.int64), _SENT)
            vals = []
            for f, rid in zip(folds_, rowid_):
                d = c._force(c.eval(f.vx.fdata))
                dv = d.data[:nloc].astype(dtype_for(f.info))
                if rid:
                    dv = dv + c._start.astype(dv.dtype)  # globalize row ids
                vals.append(dv)
            gk, gvals, overflow = shard_shuffle_combine(
                keys, vals, fold_ops, shard_rows, n_dev_, per_owner, cap)
            return (gk.reshape(1, -1),
                    jnp.array([overflow]).reshape(1, 1)) + tuple(
                        v.reshape(1, -1) for v in gvals)

        @partial(jax.shard_map, mesh=self.mesh, in_specs=tuple(in_specs),
                 out_specs=P(), check_vma=False)
        def step(*all_in):
            arrays, counts = all_in[:-1], all_in[-1]
            c = make_shard_compiler(arrays, counts)
            outs, occ_locals = [], []
            for f, opname, rid in zip(folds_, fold_ops, rowid_):
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
                data = d.data[:nloc].astype(dt)
                if rid:
                    data = data + c._start.astype(dt)  # globalize row ids
                if domain_ <= segred.SMALL_DOMAIN:
                    dense = segred.masked_group_reduce(
                        data, ids_ok, domain_, opname)
                    occ_local = segred.group_counts(ids_ok, domain_)
                else:
                    import jax.ops

                    segop = {"sum": jax.ops.segment_sum,
                             "max": jax.ops.segment_max,
                             "min": jax.ops.segment_min}[opname]
                    dense = segop(data, ids_ok,
                                  num_segments=domain_ + 1)[:domain_]
                    occ_local = jax.ops.segment_sum(
                        valid.astype(jnp.int64), ids_ok,
                        num_segments=domain_ + 1)[:domain_]
                comb = {"sum": partial(lax.psum, axis_name="d"),
                        "max": partial(lax.pmax, axis_name="d"),
                        "min": partial(lax.pmin, axis_name="d")}[opname]
                outs.append(comb(dense))
                occ_locals.append(occ_local)
            occs = tuple(lax.psum(o, "d") for o in occ_locals)
            return tuple(outs) + occs

        self._step = jax.jit(sparse_step if sparse else step)

    def __call__(self):
        args = [self._shard(self.store.columns[nm]) for nm in self.fact_loads]
        args += [jnp.asarray(self.store.columns[nm])
                 for nm in self.dim_loads + self.extra_full]
        counts = jnp.asarray([self.fact_count], jnp.int64)
        outs = self._step(*args, counts)

        c = Compiler(self.cfg, self.store)
        c.memo, c.group_cache, c.join_cache = {}, {}, {}
        # the group-level stage may gather representative columns through
        # fold-produced masks (Q10's key outputs); bind every referenced
        # column for the host-side combine
        from ..engine.lower import _all_loads

        c.tables = {vx.name: jnp.asarray(self.store.columns[vx.name])
                    for vx in _all_loads(self.vexps)
                    if vx.name in self.store.columns}
        if self.sparse:
            gk = np.asarray(outs[0]).reshape(-1)
            overflow = int(np.asarray(outs[1]).sum())
            if overflow:
                # skew: some owner received more partials than the bucket
                # capacity; rebuild with doubled capacity (bounded retries)
                if getattr(self, "_cap_retries", 0) >= 3:
                    raise RuntimeError(
                        f"shuffle bucket overflow ({overflow} partials) "
                        "after capacity retries — key distribution is "
                        "pathologically skewed")
                self._cap_retries = getattr(self, "_cap_retries", 0) + 1
                self.cap = self.cap * 2
                self.__post_init__()
                return self()
            keep = gk < 2**62
            ngroups = int(keep.sum())
            for f, dense in zip(self.folds, outs[2:]):
                flat = np.asarray(dense).reshape(-1)[keep]
                L_out = min(f.info.count, len(np.asarray(dense).reshape(-1)))
                buf = np.zeros(L_out, dtype=flat.dtype)
                buf[:ngroups] = flat[:L_out]
                c.memo[f.skey] = Val(data=jnp.asarray(buf), valid=ngroups,
                                     length=L_out)
        else:
            k = len(self.folds)
            dense_list, occ_list = outs[:k], outs[k:]
            occ_np = [np.asarray(o) for o in occ_list]
            if self._check_occ:
                # folds used different key expressions over the same dense
                # domain: sound only if they agree on which groups exist
                pats = [o > 0 for f, o in zip(self.folds, occ_np)
                        if f.vx.fgroups.info.bounds != (0, 0)]
                if any(not np.array_equal(pats[0], p) for p in pats[1:]):
                    raise NotDistributable(
                        "folds disagree on occupied groups")
            for f, dense, occ in zip(self.folds, dense_list, occ_np):
                sel = np.nonzero(occ > 0)[0]
                ngroups = len(sel)
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
