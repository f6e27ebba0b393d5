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
    expressions (avg divisions, outer folds, key reuse) unchanged

Equijoins run one of two ways:

  * PARTITIONED SHUFFLE JOIN (default for fact-frame right sides —
    Q2/Q17/Q21-class self-joins; see _plan_part_joins and
    parallel/shuffle_join.py): both sides evaluate shard-locally, rows
    exchange by key range over ICI, matched pairs + right-value payload
    columns route back to the probe shard.  Exchange capacities are
    EXACT, from two small counting rounds (destination histograms, then
    a counts-only exchange).  MPLAN2VDL_NO_PART_JOIN=1 disables.
  * replicated right side (everything else): the right side evaluates at
    full width on every shard and the local probe binary-searches it,
    with expansion buffers sized by a DISTRIBUTED counting pre-pass (one
    shard_map round per join: psum of per-shard local-probe match
    counts) — the full query is never materialized on a single chip.

Other frames that do not shard elementwise are routed through full-width
evaluation (identical on every shard, from replicated columns):
fact-domain mask scatters slice per-shard row windows; gathers whose
positions live in replicated frames evaluate whole.  Fact ROW-POSITION
values (representative-row picks, row-id group keys, rowid join keys,
synthesized row identities over derived frames) evaluate locally and are
globalized by ``rstep * shard_start`` at the fold/join/exchange boundary
— EXCEPT chains passing through full-width or payload nodes, whose
values are global already; positions that leak through unrecognized
shapes disqualify the plan.

All 22 TPC-H noorder queries distribute row-exactly under this algebra
(tests/test_auto_dist.py).  Disqualified (single-chip fallback): plans
with no aggregate stage, SortPerm inside the aggregate stage, sparse
(> 2^20) domains mixing heterogeneous fold keys/masks or scatters.
Equijoins inside sparse group-bys DO distribute (r4): shard-local
probes feed the sparse shuffle-aggregation exchange.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax

from .. import jaxcfg  # noqa: F401  (x64 + persistent compilation cache)

import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import vir as V
from ..catalog import Config
from ..engine.columnstore import ColumnStore
from ..engine.kernels import segred
from ..engine.lower import (Compiler, Val, _children, _mask_tail,
                            _sel_positions, dtype_for)
from ..names import Name
from .shuffle_join import (SENT_L, SENT_R, dest_histogram, key_sents,
                           owner_dest, shard_join_count_stats,
                           shard_shuffle_join, shard_heavy_detect,
                           _member_lohi)


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


def _joins_under(v: V.Vexp):
    seen, out = set(), []

    def go(x: V.Vexp):
        if x.skey in seen:
            return
        seen.add(x.skey)
        if isinstance(x.vx, V.JoinIndex):
            out.append(x)
        for c in _children(x.vx):
            go(c)

    go(v)
    return out


def _contains_right_join(v: V.Vexp) -> bool:
    seen = set()

    def go(x: V.Vexp) -> bool:
        if x.skey in seen:
            return False
        seen.add(x.skey)
        if isinstance(x.vx, V.JoinIndex) and x.vx.jside in (
                V.JRIGHT, V.JOUTER_RIGHT):
            return True
        return any(go(c) for c in _children(x.vx))

    return go(v)


def _rowid_chain(v: V.Vexp, fact_count: int):
    """If this expression's VALUES are fact row positions reached through
    a pure gather/partition chain from ``RangeV(rmin, rstep, RangeC_fact)``
    (representative-row picks, row-id group keys), return ``rstep`` — the
    per-row-position increment.  Shard-local evaluation yields LOCAL
    positions; adding ``rstep * shard_start`` globalizes them.  None when
    values are not row positions."""
    vx = v.vx
    if (isinstance(vx, V.RangeV) and vx.rstep != 0
            and isinstance(vx.rref.vx, V.RangeC)
            and vx.rref.vx.rcount == fact_count):
        return vx.rstep
    if isinstance(vx, V.Shuffle) and vx.shop == V.GATHER:
        return _rowid_chain(vx.shsource, fact_count)
    if isinstance(vx, V.Partition):
        return _rowid_chain(vx.pdata, fact_count)
    return None


def _frame_pos_chain(v: V.Vexp, fact_count: int):
    """Superset of ``_rowid_chain``: also accepts positions of DERIVED
    local frames — ``RangeV(rmin, rstep!=0)`` over ANY fact-frame-bounded
    ref (synthesized row identities over compacted frames, the reference's
    ``identity()`` row-ids).  Globalizing by ``rstep*shard_start`` keeps
    them distinct, in-bounds (local positions < local valid rows), and
    order-isomorphic with the single-chip values — sufficient for GROUP
    IDS and partition keys, NOT for value-exact uses (join keys, values
    gathered through later)."""
    vx = v.vx
    if (isinstance(vx, V.RangeV) and vx.rstep != 0
            and vx.rref.info.count == fact_count):
        return vx.rstep
    if isinstance(vx, V.Fold) and vx.foldop == V.FSEL:
        return 1  # compaction positions ARE local frame positions
    if isinstance(vx, V.Shuffle) and vx.shop == V.GATHER:
        return _frame_pos_chain(vx.shsource, fact_count)
    if isinstance(vx, V.Partition):
        return _frame_pos_chain(vx.pdata, fact_count)
    return None


def _chain_through(v: V.Vexp, skeys) -> bool:
    """True when the position/rowid CHAIN from ``v`` passes through one of
    ``skeys`` (intercepted payload gathers deliver already-globalized
    values — a second rstep*shard_start would corrupt them)."""
    if v.skey in skeys:
        return True
    vx = v.vx
    if isinstance(vx, V.Shuffle) and vx.shop == V.GATHER:
        return _chain_through(vx.shsource, skeys)
    if isinstance(vx, V.Partition):
        return _chain_through(vx.pdata, skeys)
    return False


def _rowid_leaks(v: V.Vexp, fact_count: int, allow_chain: bool = True) -> bool:
    """True if fact row-position VALUES flow into this expression through
    anything other than the pure chain ``_rowid_chain`` recognises (e.g.
    bit-packed composite keys): shard-local evaluation would mix local
    positions across shards, which no single offset can repair."""
    seen = set()

    def go(x: V.Vexp, in_chain: bool) -> bool:
        key = (x.skey, in_chain)
        if key in seen:
            return False
        seen.add(key)
        vx = x.vx
        if (isinstance(vx, V.RangeV) and vx.rstep != 0
                and isinstance(vx.rref.vx, V.RangeC)
                and vx.rref.vx.rcount == fact_count):
            return not in_chain
        if isinstance(vx, V.Fold) and vx.foldop == V.FSEL:
            return False  # selection vectors are index space, not values
        if isinstance(vx, V.JoinIndex):
            # probe keys that are rowid chains are globalized at the join
            # (see _ShardCompiler); rkeys evaluate at full width where
            # rowids are global already; join OUTPUTS are index space
            return go(vx.lkeys, True)
        if isinstance(vx, V.Shuffle) and vx.shop == V.GATHER:
            # positions are index space (selection compositions); only the
            # source carries values onward
            return go(vx.shsource, in_chain)
        if (isinstance(vx, V.Shuffle) and vx.shop == V.SCATTER
                and vx.shshape is not None
                and vx.shshape.info.count == fact_count):
            return False  # full-eval region
        if isinstance(vx, V.Partition):
            return go(vx.pdata, in_chain)
        return any(go(c, False) for c in _children(vx))

    return go(v, allow_chain)


_PART_SIDES = frozenset((V.JLEFT, V.JRIGHT, V.JSEMI, V.JANTI,
                         V.JOUTER_LEFT, V.JOUTER_RIGHT, V.JOUTER_VALID))
_OUTER_SIDES = frozenset((V.JOUTER_LEFT, V.JOUTER_RIGHT, V.JOUTER_VALID))


def _loads_outside_part(folds, part_keys, part_skip):
    """Table columns read OUTSIDE partitioned-join right-side chains (those
    chains' loads ship sharded; anything else still needs replication)."""
    seen, out = set(), []

    def go(x: V.Vexp):
        if x.skey in seen or x.skey in part_skip:
            return
        seen.add(x.skey)
        vx = x.vx
        if isinstance(vx, V.Load):
            out.append(vx.name)
            return
        if isinstance(vx, V.JoinIndex) and (
                vx.lkeys.skey, vx.rkeys.skey) in part_keys:
            go(vx.lkeys)  # the rkeys chain is exchange territory
            return
        for c in _children(vx):
            go(c)

    for f in folds:
        go(f)
    return out


def _plan_part_joins(folds, fact: str, fact_count: int, store=None):
    """Joins whose RIGHT side is a pure fact-frame chain run as DISTRIBUTED
    SHUFFLE JOINS (parallel/shuffle_join.py) instead of replicating the
    right side to every shard: both sides evaluate shard-locally, rows
    exchange by key range, and matches route back to the probe shard.
    This removes the full-width fact-column replication that the Q2/Q17/
    Q21-class self-joins otherwise force (their right sides ARE fact-frame
    expressions).

    Right-side VALUES reach the probe shard as PAYLOAD columns riding the
    exchange.  A consumer gather whose source holds plain values ships
    directly; position-valued sources (FSel compaction positions, RangeV
    row identities — the reference's ``identity()``) are handled by
    GATHER-CHAIN COMPOSITION on the build side — ``S1[s0[jr]]`` becomes
    the shipped value ``(S1 o s0)`` evaluated where both frames are local
    — until the composed value is either plain or consumed only by
    grouping contexts (partition keys / fold group ids), where a
    distinctness-preserving globalization (+rstep*shard_start) suffices.

    RIGHT FRAMES may be the fact frame (Q17/Q21 self-joins) or a single
    partitioned DIM table's frame (Q13's orders side): dim-frame chains
    evaluate in a nested shard compiler over that table's row shard, so
    the dim table is never replicated.  OUTER joins append each probe
    shard's unmatched rows after its matched pairs (the single-chip
    layout), with outer-valid = 1/0 flags and null (0) right payloads.

    Partitionable when the key chains are 'L'-pure and value-exact and
    every 'right' output resolves through the composition rules above.

    Returns (part_joins: key -> spec, part_pay: intercepted gather skey ->
    (key, payload index), part_skip: gather skeys the region planner must
    not classify (their values come from the exchange), part_roots: chain
    sources the region planner still walks for scatter/sort checks).
    """
    nodes_seen, parents, joins_by_key = set(), {}, {}
    order = []  # post-order of join keys (dependency order for sizing)

    def walk(x: V.Vexp):
        if x.skey in nodes_seen:
            return
        nodes_seen.add(x.skey)
        for c in _children(x.vx):
            walk(c)
            parents.setdefault(c.skey, []).append(x)
        if isinstance(x.vx, V.JoinIndex):
            key = (x.vx.lkeys.skey, x.vx.rkeys.skey)
            if key not in joins_by_key:
                joins_by_key[key] = []
                order.append(key)
            joins_by_key[key].append(x)

    for f in folds:
        walk(f)

    def index_space(x: V.Vexp) -> bool:
        """Values are LOCAL row positions of some local frame (selection
        vectors, row identities, and their compositions)."""
        vx = x.vx
        if isinstance(vx, V.Fold) and vx.foldop == V.FSEL:
            return True
        if isinstance(vx, V.RangeV):
            return (vx.rstep == 0) or (vx.rstep == 1 and vx.rmin == 0)
        if isinstance(vx, V.Shuffle) and vx.shop == V.GATHER:
            return index_space(vx.shsource) and index_space(vx.shpos)
        if isinstance(vx, V.JoinIndex):
            return vx.jside in (V.JLEFT, V.JSEMI, V.JANTI)
        return False

    def make_klass(tab: str, cnt: int):
        """Frame classifier over ``tab``'s row frame: 'L' = pure chain
        (shard-local eval == global eval restricted to local rows); 'R' =
        fully replicated; None = neither.  In a partitioned-DIM context
        (tab != fact) fact columns are unavailable — they arrive sharded
        by the FACT layout — so they classify None."""
        kmemo = {}

        def klass(x: V.Vexp):
            if x.skey in kmemo:
                return kmemo[x.skey]
            vx = x.vx
            if isinstance(vx, V.Load):
                if vx.name[0] == tab:
                    r = "L"
                elif tab != fact and vx.name[0] == fact:
                    r = None
                else:
                    r = "R"
            elif isinstance(vx, V.RangeC):
                if vx.rcount == cnt:
                    r = "L"
                elif tab != fact and vx.rcount == fact_count:
                    r = None
                else:
                    r = "R"
            elif isinstance(vx, V.RangeV):
                r = klass(vx.rref)
            elif isinstance(vx, V.Binop):
                kl, kr = klass(vx.left), klass(vx.right)
                r = kl if kl == kr else None
            elif isinstance(vx, V.Shuffle) and vx.shop == V.GATHER:
                ks, kp = klass(vx.shsource), klass(vx.shpos)
                if kp == "L" and ks == "R":
                    r = "L"  # fk gather into a replicated dim frame
                elif kp == "L" and ks == "L" and index_space(vx.shpos):
                    r = "L"  # selection composition within the local frame
                elif kp == "R" and ks == "R":
                    r = "R"
                else:
                    r = None
            elif isinstance(vx, V.Fold) and vx.foldop == V.FSEL:
                r = klass(vx.fdata)
            elif isinstance(vx, V.Partition):
                r = klass(vx.pdata) if klass(vx.pivots) == "R" else None
            elif isinstance(vx, (V.Like, V.DictMap)):
                r = klass(vx.ldata)
            elif isinstance(vx, V.VShuffle):
                r = klass(vx.varg)
            else:  # aggregates, scatters, sorts, joins, cross products
                r = None
            kmemo[x.skey] = r
            return r

        return klass

    def has_pos_values(x: V.Vexp) -> bool:
        """Frame positions buried INSIDE value arithmetic (bit-packed
        composites etc.) — not salvageable by composition/globalization."""
        seen = set()

        def go(y: V.Vexp) -> bool:
            if y.skey in seen:
                return False
            seen.add(y.skey)
            vy = y.vx
            if isinstance(vy, V.RangeV) and vy.rstep != 0:
                return True
            if isinstance(vy, V.Fold) and vy.foldop == V.FSEL:
                return True
            if isinstance(vy, V.Shuffle) and vy.shop == V.GATHER:
                return go(vy.shsource)
            if isinstance(vy, V.JoinIndex):
                return False
            return any(go(c) for c in _children(vy))

        return go(x)

    def value_kind(src: V.Vexp, cnt: int):
        """'value' ships as-is; 'exact' = raw rowid chain (+og exact);
        'pos' = local frame positions (compose deeper, or globalize for
        grouping-only consumers); None = reject."""
        if _rowid_chain(src, cnt) is not None:
            return "exact"
        if index_space(src) or _frame_pos_chain(src, cnt) is not None:
            return "pos"
        if has_pos_values(src):
            return None
        return "value"

    tables_all = {nm[0] for nm in getattr(store, "columns", {})} \
        if store is not None else set()
    counts_all = {t: store.table_count((t,)) for t in tables_all}

    fact_klass = make_klass(fact, fact_count)
    part_joins, part_pay, part_skip, part_roots = {}, {}, set(), []
    for key in order:
        jnodes = joins_by_key[key]
        sides = {n.vx.jside for n in jnodes}
        if not sides <= _PART_SIDES:
            continue
        outer = bool(sides & _OUTER_SIDES)
        j0 = jnodes[0].vx
        lk, rk = j0.lkeys, j0.rkeys
        if lk.info.count != fact_count:
            continue
        # pick the right frame: the fact frame, or ONE partitionable dim
        # table whose row count matches and is unambiguous (RangeC sizing
        # in the dim shard compiler keys on the count)
        rtab, rcnt, klass = fact, fact_count, fact_klass
        if fact_klass(rk) != "L":
            cands = []
            for t in sorted({nm[0] for nm in _loads_under(rk)}):
                tc = counts_all.get(t)
                if (t != fact and tc and tc == rk.info.count
                        and tc != fact_count
                        and sum(1 for c in counts_all.values()
                                if c == tc) == 1):
                    kt = make_klass(t, tc)
                    if kt(rk) == "L":
                        cands.append((t, tc, kt))
            if len(cands) != 1:
                continue
            rtab, rcnt, klass = cands[0]
        # join keys must be VALUE-exact after shard-local eval
        if value_kind(lk, fact_count) not in ("value", "exact") \
                or value_kind(rk, rcnt) not in ("value", "exact"):
            continue

        pays, pay_map = [], {}
        new_pay, new_skip, new_roots = {}, set(), []

        def ship(gnode: V.Vexp, chain: tuple, loose: bool) -> None:
            sig = (chain, loose)
            if sig not in pay_map:
                pay_map[sig] = len(pays)
                pays.append(dict(chain=list(chain), loose=loose))
            new_pay[gnode.skey] = pay_map[sig]
            new_skip.add(gnode.skey)

        def visit(gnode: V.Vexp, chain: tuple) -> bool:
            """gnode's value = composition of ``chain`` at the join's
            right outputs.  Ship it, compose deeper, or reject."""
            src = chain[-1]
            if klass(src) != "L":
                return False
            if len(chain) == 1 and src.info.count != rk.info.count:
                return False
            kind = value_kind(src, rcnt)
            if kind is None:
                return False
            if kind in ("value", "exact"):
                ship(gnode, chain, loose=False)
                return True
            # 'pos': every consumer must compose deeper or only group by it
            shipped_loose = False
            for q in parents.get(gnode.skey, []):
                qx = q.vx
                if (isinstance(qx, V.Shuffle) and qx.shop == V.GATHER
                        and qx.shpos.skey == gnode.skey):
                    new_skip.add(gnode.skey)
                    if not visit(q, chain + (qx.shsource,)):
                        return False
                elif ((isinstance(qx, V.Partition)
                       and qx.pdata.skey == gnode.skey)
                      or (isinstance(qx, V.Fold)
                          and qx.fgroups.skey == gnode.skey)):
                    if not shipped_loose:
                        ship(gnode, chain, loose=True)
                        shipped_loose = True
                else:
                    return False
            return True

        ok = True
        for n in jnodes:
            if n.vx.jside not in (V.JRIGHT, V.JOUTER_RIGHT):
                continue
            for p in parents.get(n.skey, []):
                if not (isinstance(p.vx, V.Shuffle)
                        and p.vx.shop == V.GATHER
                        and p.vx.shpos.skey == n.skey):
                    ok = False
                    break
                if not visit(p, (p.vx.shsource,)):
                    ok = False
                    break
            if not ok:
                break
        if not ok:
            continue
        for spec in pays:
            new_roots.extend(spec["chain"])
        for skey, idx in new_pay.items():
            part_pay[skey] = (key, idx)
        part_skip |= new_skip
        part_roots.extend(new_roots + [lk, rk])
        klo = min(lk.info.bounds[0], rk.info.bounds[0])
        khi = max(lk.info.bounds[1], rk.info.bounds[1]) + 1
        # int32 keys when bounds fit below the int32 sentinels: halves
        # the exchange's key bytes and compiles faster
        k32 = klo > -(2**31) and khi < 2**31 - 2
        part_joins[key] = dict(lkeys=lk, rkeys=rk, pays=pays,
                               bounds=(int(klo), int(khi)), caps=None,
                               table=None if rtab == fact else rtab,
                               t_count=rcnt, outer=outer, k32=k32)
    return part_joins, part_pay, part_skip, part_roots


def _plan_regions(folds, fact: str, fact_count: int,
                  part_keys=frozenset(), part_skip=frozenset(),
                  part_roots=()):
    """Classify each fold-subtree node's FRAME as shard-LOCAL (fact rows,
    or frames derived from them: selections, join expansions of a local
    probe) or REPLICATED (dim tables, and anything forced to full-width
    evaluation), and assign full-width interception sets:

      scatters   — fact-domain-sized scatters: evaluated at full width in
                   the nested compiler, each shard slices its row window
      replicate  — whole nodes evaluated at full width (gathers whose
                   positions live in a replicated frame but index the fact
                   domain; join right-key vectors; joins with replicated
                   probes)
      fullsrc    — gathers whose POSITIONS are local but whose VALUES
                   index the full right frame of a join ('right' outputs):
                   source evaluates full-width, positions locally

    Raises NotDistributable for shapes the shard algebra cannot express.
    """
    scatters, replicate, fullsrc = {}, {}, {}
    loc_memo = {}

    def loc(v: V.Vexp) -> str:
        r = loc_memo.get(v.skey)
        if r is not None:
            return r
        vx = v.vx
        if v.skey in replicate:
            r = "R"
        elif isinstance(vx, V.Load):
            r = "L" if vx.name[0] == fact else "R"
        elif isinstance(vx, V.RangeC):
            r = "L" if vx.rcount == fact_count else "R"
        elif isinstance(vx, V.Shuffle) and vx.shop == V.GATHER:
            r = loc(vx.shpos)
        elif isinstance(vx, V.Shuffle) and vx.shop == V.SCATTER:
            r = ("L" if (vx.shshape is not None
                         and vx.shshape.info.count == fact_count) else "R")
        elif isinstance(vx, V.JoinIndex):
            r = loc(vx.lkeys)
        elif isinstance(vx, V.Fold):
            r = loc(vx.fdata)
        else:
            kids = _children(vx)
            r = "L" if any(loc(c) == "L" for c in kids) else "R"
        loc_memo[v.skey] = r
        return r

    seen = set()

    def walk(x: V.Vexp):
        if x.skey in seen:
            return
        seen.add(x.skey)
        vx = x.vx
        if isinstance(vx, V.SortPerm):
            raise NotDistributable("ordered aggregate stage")
        if isinstance(vx, V.Shuffle) and vx.shop == V.SCATTER:
            if (vx.shshape is not None
                    and vx.shshape.info.count == fact_count):
                # fact-domain mask scatter (Q4's exists marks): full-width
                # eval + per-shard window slice; subtree is full territory
                scatters[x.skey] = x
                return
            if loc(vx.shsource) == "L" or loc(vx.shpos) == "L":
                raise NotDistributable(
                    "scatter from shard-local rows into a replicated frame")
        if isinstance(vx, V.JoinIndex):
            if (vx.lkeys.skey, vx.rkeys.skey) in part_keys:
                # distributed shuffle join: BOTH sides are shard-local
                walk(vx.lkeys)
                walk(vx.rkeys)
                return
            if loc(vx.lkeys) == "R":
                # both sides replicated: the whole join is shard-invariant
                replicate[x.skey] = x
                return
            if vx.lkeys.info.count != fact_count:
                raise NotDistributable(
                    "join probes a derived local frame (not fact rows)")
            # local probe, full right side: rkeys evaluates at full width
            replicate[vx.rkeys.skey] = vx.rkeys
            walk(vx.lkeys)
            return
        if isinstance(vx, V.Shuffle) and vx.shop == V.GATHER:
            if x.skey in part_skip:
                # gather in a partitioned join's right-value composition:
                # its value comes from the exchange (payload column); its
                # chain sources are walked via part_roots
                return
            sl, pl = loc(vx.shsource), loc(vx.shpos)
            if sl == "L" and pl == "R":
                if vx.shsource.info.count != fact_count:
                    raise NotDistributable(
                        "replicated-frame positions index a derived local "
                        "frame")
                # Q4: lineitem-frame fk values into an orders-sized mask —
                # whole gather is replicated-frame
                replicate[x.skey] = x
                return
            if (sl == "L" and pl == "L"
                    and vx.shsource.info.count == fact_count
                    and _contains_right_join(vx.shpos)):
                # positions carry FULL right-frame ids (join 'right'
                # outputs): gather from the full-width source
                fullsrc[x.skey] = x
                walk(vx.shpos)
                return
        for c in _children(vx):
            walk(c)

    for f in folds:
        walk(f)
    for r in part_roots:  # partitioned joins' key/payload chains
        walk(r)
    # full-width columns: every fact column read under a full-eval region
    full_roots = [r for s in scatters.values()
                  for r in (s.vx.shsource, s.vx.shpos, s.vx.shshape)]
    full_roots += list(replicate.values())
    full_roots += [g.vx.shsource for g in fullsrc.values()]
    extra_full = sorted({nm for nm in _loads_under(*full_roots)
                         if nm[0] == fact})
    return scatters, replicate, fullsrc, extra_full, \
        [r for r in full_roots if r is not None]


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
        self.fullsrc_skeys = frozenset()
        self.full_tables = {}
        self.full_fsel_sizes = {}
        self.part_joins, self.part_pay, self.n_dev = {}, {}, 1
        self.part_arrays, self.part_meta = {}, {}
        self._shard_ix = None
        self._dim_cs = {}
        self._full_c = None

    def _full_eval(self, v: V.Vexp) -> Val:
        """Evaluate a node at full width from replicated inputs (identical
        on every shard) with a nested ordinary compiler."""
        if self._full_c is None:
            fc = Compiler(self.cfg, self.store, self.join_sizes,
                          self.full_fsel_sizes)
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

    def _dim_c(self, tab: str) -> "_ShardCompiler":
        """Nested shard compiler over a PARTITIONED dim table's row shard:
        the build side of a dim-frame shuffle join (Q13's orders) — that
        table is never replicated.  Loads of ``tab`` read the local shard;
        other dim tables stay replicated; fact columns are unreachable
        (the classifier forbids them in dim-frame chains)."""
        dc = self._dim_cs.get(tab)
        if dc is None:
            t_count, srt = self.part_meta[tab]
            start = (self._shard_ix * srt).astype(jnp.int64)
            lv = jnp.clip(jnp.asarray(t_count, jnp.int64) - start, 0, srt)
            tables = dict(self.tables)
            tables.update({nm: a for nm, a in self.part_arrays.items()
                           if nm[0] == tab})
            dc = _ShardCompiler(self.cfg, self.store, lv, tables, t_count)
            dc._shard_rows = srt
            dc._start = start
            dc._padded = srt * self.n_dev
            dc.n_dev = self.n_dev
            dc._shard_ix = self._shard_ix
            self._dim_cs[tab] = dc
        return dc

    def _keyed_local(self, vexp: V.Vexp, sent, loose: bool = False,
                     kdt=jnp.int64):
        """Shard-local key vector for the shuffle join: invalid tail ->
        sentinel, rowid chains globalized (``loose`` also globalizes
        derived-frame position chains — distinctness-preserving payloads,
        see _frame_pos_chain).  ``kdt`` narrows exchange keys when the
        classifier proved the bounds fit."""
        skip = (set(self.part_pay) | self.fullsrc_skeys
                | self.replicate_skeys | self.scatter_skeys)
        og = None if _chain_through(vexp, skip) else \
            (_frame_pos_chain if loose else _rowid_chain)(
                vexp, self.fact_count)
        val = self._force(self.eval(vexp))
        data = val.data.astype(jnp.int64)
        if og:
            data = data + og * self._start
        idx = jnp.arange(val.length, dtype=jnp.int64)
        masked = jnp.where(idx < jnp.asarray(val.valid, jnp.int64),
                           data, jnp.int64(sent))
        return masked.astype(kdt)

    def _payload(self, spec) -> jnp.ndarray:
        """One payload column, aligned with the local right frame: the
        gather-chain composition evaluated where all frames are local,
        then (for position-valued results) globalized by rstep*start."""
        chain = spec["chain"]
        val = self._force(self.eval(chain[0]))
        data = val.data
        for s in chain[1:]:
            sv = self._force(self.eval(s))
            data = sv.data[jnp.clip(data.astype(jnp.int64), 0,
                                    sv.length - 1)]
        og = (_frame_pos_chain if spec["loose"] else _rowid_chain)(
            chain[-1], self.fact_count)
        if og:
            data = data.astype(jnp.int64) + og * self._start
            if self.fact_count < 2**31:  # globalized positions stay int32
                data = data.astype(jnp.int32)
        return data

    def _part_join_art(self, key):
        """Run the distributed shuffle join for one (lkeys, rkeys) pair —
        once, shared by every side node and payload gather over it."""
        hit = self.join_cache.get(("part",) + key)
        if hit is not None:
            return hit
        pj = self.part_joins[key]
        caps = pj["caps"]
        rc = self._dim_c(pj["table"]) if pj["table"] else self
        kdt = jnp.int32 if pj.get("k32") else jnp.int64
        sent_r, sent_l = key_sents(kdt)
        lk = self._keyed_local(pj["lkeys"], sent_l, kdt=kdt)
        rk = rc._keyed_local(pj["rkeys"], sent_r, kdt=kdt)
        pays = [rc._payload(spec) for spec in pj["pays"]]
        hv = caps.get("heavy")
        r = shard_shuffle_join(
            lk, rk, pays, key_lo=pj["bounds"][0], key_hi=pj["bounds"][1],
            n_dev=self.n_dev, cap_r=caps["cap_r"], cap_l=caps["cap_l"],
            cap_pairs=caps["cap_pairs"],
            heavy_keys=jnp.asarray(hv["hk"]) if hv else None,
            cap_hb=hv["cap_hb"] if hv else 0,
            cap_hp=hv["cap_hp"] if hv else 0)
        sel = _sel_positions(r["pair_ok"])[:caps["cap_exp"]]
        npair = jnp.sum(r["pair_ok"].astype(jnp.int64))
        lval = self._force(self.eval(pj["lkeys"]))
        art = dict(lidx=r["lidx"][sel], pays=[p[sel] for p in r["payloads"]],
                   cnt=r["cnt"], npair=npair, nl=lval.length,
                   lvalid=lval.valid, cap_exp=caps["cap_exp"],
                   cap_un=caps.get("cap_un", 0), outer=pj["outer"])
        if pj["outer"]:
            # this shard's unmatched probe rows, appended after its pairs
            # (the single-chip outer layout, lower.py _eval_join_index)
            idx = jnp.arange(art["nl"], dtype=jnp.int64)
            lmask = idx < jnp.asarray(lval.valid, jnp.int64)
            un = (r["cnt"] == 0) & lmask
            art["un_sel"] = _sel_positions(un)[:caps["cap_un"]]
            art["n_un"] = jnp.sum(un.astype(jnp.int64))
        self.join_cache[("part",) + key] = art
        return art

    def _outer_concat(self, art, pair_vals, un_vals):
        """[matched pairs | unmatched probe rows] prefix layout: pairs at
        0..npair, unmatched appended at npair..npair+n_un."""
        L = art["cap_exp"] + art["cap_un"]
        npair, n_un = art["npair"], art["n_un"]
        pi = jnp.arange(art["cap_exp"], dtype=jnp.int64)
        buf = jnp.zeros((L,), jnp.int64)
        buf = buf.at[pi].set(
            jnp.where(pi < npair, pair_vals.astype(jnp.int64), 0))
        ui = jnp.arange(art["cap_un"], dtype=jnp.int64)
        buf = buf.at[npair + ui].set(
            jnp.where(ui < n_un, un_vals.astype(jnp.int64), 0),
            mode="drop")
        return buf, npair + n_un, L

    def _eval(self, v: V.Vexp):
        vx = v.vx
        if v.skey in self.scatter_skeys:
            return self._full_width_window(v)
        if v.skey in self.replicate_skeys:
            return self._full_eval(v)
        if v.skey in self.part_pay:
            # right-value gather of a partitioned join: the value arrived
            # as a payload column aligned with the local expansion rows
            key, i = self.part_pay[v.skey]
            art = self._part_join_art(key)
            dt = dtype_for(v.info)
            if art["outer"]:  # unmatched rows carry null (0) right values
                zer = jnp.zeros((art["cap_un"],), jnp.int64)
                data, valid, L = self._outer_concat(art, art["pays"][i],
                                                    zer)
                return Val(data=_mask_tail(data.astype(dt), valid, L),
                           valid=valid, length=L)
            data = _mask_tail(art["pays"][i].astype(dt), art["npair"],
                              art["cap_exp"])
            return Val(data=data, valid=art["npair"],
                       length=art["cap_exp"])
        if (isinstance(vx, V.JoinIndex)
                and (vx.lkeys.skey, vx.rkeys.skey) in self.part_joins):
            key = (vx.lkeys.skey, vx.rkeys.skey)
            art = self._part_join_art(key)
            dt = dtype_for(v.info)
            if vx.jside == V.JLEFT:
                data = _mask_tail(art["lidx"].astype(dt), art["npair"],
                                  art["cap_exp"])
                return Val(data=data, valid=art["npair"],
                           length=art["cap_exp"])
            if vx.jside in (V.JSEMI, V.JANTI):
                idx = jnp.arange(art["nl"], dtype=jnp.int64)
                lmask = idx < jnp.asarray(art["lvalid"], jnp.int64)
                has = art["cnt"] > 0
                keep = (has if vx.jside == V.JSEMI else ~has) & lmask
                sel = _sel_positions(keep)
                nz = jnp.sum(keep.astype(jnp.int64))
                return Val(data=_mask_tail(sel.astype(dt), nz, art["nl"]),
                           valid=nz, length=art["nl"])
            if vx.jside == V.JOUTER_LEFT:
                data, valid, L = self._outer_concat(art, art["lidx"],
                                                    art["un_sel"])
                return Val(data=_mask_tail(data.astype(dt), valid, L),
                           valid=valid, length=L)
            if vx.jside == V.JOUTER_VALID:
                ones = jnp.ones((art["cap_exp"],), jnp.int64)
                zer = jnp.zeros((art["cap_un"],), jnp.int64)
                data, valid, L = self._outer_concat(art, ones, zer)
                return Val(data=_mask_tail(data.astype(dt), valid, L),
                           valid=valid, length=L)
            raise RuntimeError(
                f"partitioned join side {vx.jside} must be consumed "
                "through payload gathers")
        if v.skey in self.fullsrc_skeys:
            # positions are shard-local but their VALUES index the full
            # right frame of a join ('right' outputs): full-width source
            src = self._full_eval(vx.shsource)
            pos = self._force(self.eval(vx.shpos))
            dt = dtype_for(v.info)
            p = jnp.clip(pos.data.astype(jnp.int64), 0, src.length - 1)
            data = _mask_tail(src.data[p].astype(dt), pos.valid, pos.length)
            return Val(data=data, valid=pos.valid, length=pos.length)
        if isinstance(vx, V.Load):
            arr = self.tables[vx.name]
            n = arr.shape[-1]
            if v.info.count == self.fact_count:  # fact shard
                return Val(data=_mask_tail(arr, self.local_valid, n),
                           valid=self.local_valid, length=n)
            return Val(data=arr, valid=n, length=n)
        if isinstance(vx, V.RangeC) and vx.rcount == self.fact_count:
            # the fact table's row-id range sizes to the shard
            return Val(data=None, valid=self.local_valid,
                       length=self._shard_rows,
                       lazy_range=(vx.rmin, vx.rstep))
        if isinstance(vx, V.JoinIndex):
            # probe keys that are fact ROW POSITIONS (Q13 joins orders on
            # the customer rowid) evaluate locally; globalize them for the
            # probe only (the chain nodes keep their LOCAL values for
            # selection-composition uses elsewhere)
            og = _rowid_chain(vx.lkeys, self.fact_count)
            if og:
                lv = self._force(self.eval(vx.lkeys))
                data = lv.data + (og * self._start).astype(lv.data.dtype)
                prev = self.memo.get(vx.lkeys.skey)
                self.memo[vx.lkeys.skey] = Val(
                    data=_mask_tail(data, lv.valid, lv.length),
                    valid=lv.valid, length=lv.length)
                try:
                    return super()._eval(v)
                finally:
                    self.memo[vx.lkeys.skey] = prev if prev is not None \
                        else lv
        return super()._eval(v)


def _rewrite_distinct_folds(vexps: List[V.Vexp]) -> List[V.Vexp]:
    """Decompose ``Fold(FDistinct, g, x)`` into the distributable
    groupby-of-groupby shape (MonetDB's own count(distinct) rewrite, the
    committed Q16 pattern): an inner stage grouped by the (group key,
    distinct values...) composite, then outer folds per group key.

    Because the shard algebra wants ONE shared innermost domain, every
    SIBLING fold on the same group key goes two-level as well — inner
    partial by the composite, outer combine over the inner frame
    (sum-of-sums, min-of-mins, choose-of-chooses; the FDistinct itself
    becomes an outer FDistinct over the per-composite value choices,
    where it deduplicates exactly).  Inner folds shard like any group-by
    (sparse composites ride the all_to_all shuffle-agg path); outer
    folds run in the host-side group stage, whose engine lowers
    FDistinct natively."""
    from .. import passes

    folds = _collect_folds(vexps)
    dists = [f for f in folds if f.vx.foldop == V.FDISTINCT]
    if not dists:
        return vexps
    fams = {}
    for d in dists:
        fams.setdefault(d.vx.fgroups.skey, []).append(d)
    plans = {}
    for gk, ds in fams.items():
        g = ds[0].vx.fgroups
        vals, seen = [], set()
        for d in ds:
            if d.vx.fdata.skey not in seen:
                seen.add(d.vx.fdata.skey)
                vals.append(d.vx.fdata)
        try:
            pair = g
            for vv in vals:
                pair = V.compose_keys(pair, vv)
        except AssertionError:
            raise NotDistributable(
                "count(distinct): composite (group, values) key exceeds "
                "the 64-bit budget")
        plans[gk] = V._group_ids(pair)

    def rule(vx):
        if not (isinstance(vx, V.Fold) and vx.foldop != V.FSEL):
            return None
        pids = plans.get(vx.fgroups.skey)
        if pids is None:
            return None
        base = V.complete(V.Fold(foldop=V.FCHOOSE, fgroups=pids,
                                 fdata=vx.fgroups, fmask=vx.fmask))
        outer_ids = V._group_ids(base)
        inner_op = V.FCHOOSE if vx.foldop == V.FDISTINCT else vx.foldop
        inner = V.complete(V.Fold(foldop=inner_op, fgroups=pids,
                                  fdata=vx.fdata, fmask=vx.fmask))
        return V.complete(V.Fold(foldop=vx.foldop, fgroups=outer_ids,
                                 fdata=inner))

    return passes.xform(rule, vexps)


@dataclass
class AutoDistributed:
    """A qualifying plan compiled for the mesh."""

    cfg: Config
    store: ColumnStore
    vexps: List[V.Vexp]
    mesh: Mesh

    def __post_init__(self):
        self.vexps = _rewrite_distinct_folds(self.vexps)
        folds = _collect_folds(self.vexps)
        # ROWSET mode (r5, VERDICT r4 item 4): plans with no aggregate
        # stage (pure select/project/join) distribute too — every output
        # column evaluates shard-locally over the row-sharded fact, and
        # the edge concatenates each shard's valid prefix in shard order
        # (row frames follow fact row order, so this IS the single-chip
        # row order).  The planning machinery below is root-agnostic:
        # rowset mode plans against the output vexps instead of folds.
        self.rowset = not folds
        if self.rowset:
            terminals = list(self.vexps)
            if not terminals:
                raise NotDistributable("empty plan")
            tcounts = {t.info.count for t in terminals}
            if len(tcounts) != 1:
                raise NotDistributable(
                    "rowset outputs on differing row frames")
            g0 = None
            domain = 1
            self.sparse = False
            multi = []
            roots = terminals
        else:
            roots = folds
        if folds:
            # single-group folds (bounds (0,0): global sums like Q11's
            # having threshold) coexist with one shared multi-group key;
            # they reduce into slot 0 of the shared domain and seed a
            # 1-row group frame
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
        if folds and any(
                f.vx.fgroups.info.count != folds[0].vx.fgroups.info.count
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
        # the fold input length bound (rowset mode: the output row bound);
        # when the row frame is a JOIN EXPANSION (Q13/Q17/Q2), the probe
        # (left) side of that join
        row_axis = (folds[0].vx.fgroups.info.count if folds
                    else roots[0].info.count)
        loads = sorted({nm for f in roots for nm in _loads_under(f)})
        tabs = {nm[0] for nm in loads}
        if not tabs:
            raise NotDistributable("aggregate stage reads no table")
        joins = [x for f in roots for x in _joins_under(f)]
        facts = {t for t in tabs
                 if self.store.table_count((t,)) == row_axis}
        fact_count = row_axis
        if not facts and joins:
            probes = {x.vx.lkeys.info.count for x in joins
                      if x.info.count == row_axis}
            if len(probes) == 1:
                fact_count = next(iter(probes))
                facts = {t for t in tabs
                         if self.store.table_count((t,)) == fact_count}
        if len(facts) != 1:
            raise NotDistributable(
                f"cannot identify a unique fact table among {tabs}")
        self.fact = next(iter(facts))
        self.fact_count = fact_count
        self.folds = folds
        self.domain = domain

        # fact-frame right sides run as distributed shuffle joins (range-
        # partitioned build + probe routing) instead of replicating the
        # right side; MPLAN2VDL_NO_PART_JOIN=1 forces the replicated path
        part_joins, part_pay = {}, {}
        part_skip, part_roots = frozenset(), ()
        if joins and not self.sparse and os.environ.get(
                "MPLAN2VDL_NO_PART_JOIN", "0") in ("", "0"):
            part_joins, part_pay, part_skip, part_roots = _plan_part_joins(
                roots, self.fact, fact_count, self.store)
        self.part_joins, self.part_pay = part_joins, part_pay

        scatters, replicate, fullsrc, extra_full, full_roots = _plan_regions(
            roots, self.fact, fact_count, frozenset(part_joins),
            frozenset(part_skip), tuple(part_roots))
        if scatters and self.sparse:
            raise NotDistributable(
                "fact-domain scatter in a sparse group-by")
        if joins and self.sparse and os.environ.get(
                "MPLAN2VDL_NO_SPARSE_JOIN", "0") not in ("", "0"):
            # r4: equijoins inside sparse group-bys compose with the
            # shuffle-aggregation exchange (shard-local probes against
            # the replicated right side feed locally pre-aggregated
            # partials into the range-partitioned all_to_all) — all 22
            # queries exact at SF0.4 where Q17's rowid-domain fold goes
            # sparse with 6 joins under it.  Opt-out flag only.
            raise NotDistributable("equijoin in a sparse group-by")
        # Dynamic-cardinality sizing (two-phase) WITHOUT materializing the
        # full query on one chip (the distributed counting pre-pass):
        #   * dynamic nodes inside full-width regions evaluate from columns
        #     the plan replicates anyway — a pruned single-chip counting
        #     pass over just those roots (same memory footprint as the
        #     main distributed step)
        #   * joins probed by shard-local rows are counted distributed
        #     below (after the shard-compiler factory exists): one jitted
        #     shard_map round per join, local probe vs the full right
        #     side, match totals combined with psum, in dependency order
        #     so later rounds compile against already-resolved sizes
        if not hasattr(self, "join_sizes"):  # capacity retries keep sizes
            self.join_sizes, self.full_fsel_sizes = {}, {}
        from ..engine.lower import CompiledQuery, dynamic_nodes

        dyn = dynamic_nodes(roots) if joins else []
        if dyn and not self.join_sizes and full_roots:
            pruned = CompiledQuery(self.cfg, full_roots, self.store)
            self.join_sizes.update(pruned.join_sizes)
            self.full_fsel_sizes.update(pruned.fsel_sizes)
        pending_joins: Dict[tuple, tuple] = {}
        for kind, v in dyn:
            if kind != "join":
                continue
            key = (v.vx.lkeys.skey, v.vx.rkeys.skey)
            if key in self.join_sizes or key in part_joins:
                continue
            outer = v.vx.jside in (V.JOUTER_LEFT, V.JOUTER_RIGHT,
                                   V.JOUTER_VALID)
            prev = pending_joins.get(key)
            pending_joins[key] = (v, outer or (prev[1] if prev else False))

        n = self.fact_count
        n_dev = self.mesh.devices.size
        self.shard_rows = -(-n // n_dev)
        self.padded = self.shard_rows * n_dev
        self.loads = loads
        self.fact_loads = [nm for nm in self.loads if nm[0] == self.fact]
        # partitioned dim tables ship SHARDED; drop their replicated
        # copies unless a non-part region still reads them
        part_tabs = {pj["table"] for pj in part_joins.values()
                     if pj["table"]}
        outside = set(_loads_outside_part(
            roots, frozenset(part_joins), frozenset(part_skip))) \
            if part_tabs else set()
        self.part_loads = sorted({nm for nm in self.loads
                                  if nm[0] in part_tabs})
        self.part_meta = {
            pj["table"]: (pj["t_count"], -(-pj["t_count"] // n_dev))
            for pj in part_joins.values() if pj["table"]}
        self.dim_loads = [nm for nm in self.loads
                          if nm[0] != self.fact
                          and (nm[0] not in part_tabs or nm in outside)]
        self.extra_full = extra_full
        self.scatter_skeys = frozenset(scatters)
        self.replicate_skeys = frozenset(replicate)
        self.fullsrc_skeys = frozenset(fullsrc)

        shard_rows, domain_, folds_ = self.shard_rows, self.domain, self.folds
        fact_loads, dim_loads = self.fact_loads, self.dim_loads
        extra_full, scatter_keys_ = self.extra_full, self.scatter_skeys
        replicate_keys_ = self.replicate_skeys
        fullsrc_keys_ = self.fullsrc_skeys
        join_sizes_, full_fsel_ = self.join_sizes, self.full_fsel_sizes
        part_joins_, part_pay_ = self.part_joins, self.part_pay
        part_loads, part_meta_ = self.part_loads, self.part_meta
        padded_ = self.padded
        cfg, store, fact_count = self.cfg, self.store, self.fact_count
        n_dev_ = self.mesh.devices.size
        sparse = self.sparse
        from .shuffle_agg import _SENT, shard_shuffle_combine

        per_owner = -(-domain // n_dev_)
        cap = getattr(self, "cap", None) or 2 * (shard_rows // n_dev_) + 64
        self.cap = cap
        # fold-boundary row-id handling: shard-local evaluation yields
        # LOCAL row positions for rowid-derived chains; the step adds
        # rstep*shard_start.  Representative-row FChoose (single-chip
        # takes the FIRST row in row order) combines with min over the
        # globalized ids.  Row ids leaking through unrecognized shapes
        # (composite bit-packs) disqualify.
        # nodes whose VALUES are already global on every shard: full-width
        # evaluations (scatter windows, replicated frames, fullsrc gather
        # sources) and partitioned-join payload gathers (globalized at the
        # exchange) — position chains passing through them must NOT get a
        # second rstep*shard_start
        global_vals = frozenset(scatter_keys_ | replicate_keys_
                                | fullsrc_keys_ | set(part_pay_))
        off_g, off_d = [], []
        for f in folds_:
            # group keys are a DISTINCTNESS context: derived-frame position
            # chains globalize too (full-width frames are global already)
            full_g = _chain_through(f.vx.fgroups, global_vals)
            og = None if full_g else _frame_pos_chain(f.vx.fgroups,
                                                      fact_count)
            if og is None and not full_g and _rowid_leaks(
                    f.vx.fgroups, fact_count):
                raise NotDistributable("row-id values leak into group keys")
            od = None if _chain_through(f.vx.fdata, global_vals) \
                else _rowid_chain(f.vx.fdata, fact_count)
            if od is None and _rowid_leaks(f.vx.fdata, fact_count):
                raise NotDistributable("row-id values leak into fold data")
            if f.vx.fmask is not None and _rowid_leaks(
                    f.vx.fmask, fact_count, allow_chain=False):
                raise NotDistributable("row-id values inside a fold mask")
            off_g.append(og)
            off_d.append(od)
        off_g, off_d = tuple(off_g), tuple(off_d)
        rowid_ = tuple(od is not None and f.vx.foldop == V.FCHOOSE
                       for f, od in zip(folds_, off_d))
        # FCHOOSE contract is "any value of the group" (Vlite.hs:116); the
        # distributed combine uses max, which may pick a different (equally
        # valid) representative than single-chip first-row order when the
        # chosen column is not functionally dependent on the group key.
        # TPC-H FChoose columns are FD on the key, so outputs still match;
        # row-id chains combine with min to preserve first-row semantics.
        fold_ops = tuple(
            "min" if rid else {V.FSUM: "sum", V.FMAX: "max", V.FMIN: "min",
                               V.FCHOOSE: "max"}[f.vx.foldop]
            for f, rid in zip(folds_, rowid_))

        # rowset mode: per-output row-id globalization multipliers (same
        # chain rules as fold data — local row positions get
        # rstep*shard_start at the output boundary)
        terminals_ = tuple(self.vexps) if self.rowset else ()
        off_t = []
        for t in terminals_:
            ot = None if _chain_through(t, global_vals) \
                else _rowid_chain(t, fact_count)
            if ot is None and _rowid_leaks(t, fact_count):
                raise NotDistributable("row-id values leak into outputs")
            off_t.append(ot)
        off_t = tuple(off_t)

        nf, nd = len(fact_loads), len(dim_loads)
        npart = len(part_loads)
        in_specs = (P("d"),) * (nf + npart) \
            + (P(),) * (nd + len(extra_full)) + (P(),)

        def make_shard_compiler(arrays, counts):
            local = {}
            for nm, a in zip(fact_loads, arrays[:nf]):
                local[nm] = a.reshape(-1)
            for nm, a in zip(dim_loads,
                             arrays[nf + npart:nf + npart + nd]):
                local[nm] = a.reshape(-1)
            shard = lax.axis_index("d")
            start = (shard * shard_rows).astype(jnp.int64)
            local_valid = jnp.clip(counts[0] - start, 0, shard_rows)
            c = _ShardCompiler(cfg, store, local_valid, local, fact_count)
            c._shard_rows = shard_rows
            c.scatter_skeys = scatter_keys_
            c.replicate_skeys = replicate_keys_
            c.fullsrc_skeys = fullsrc_keys_
            c.join_sizes = join_sizes_
            c.full_fsel_sizes = full_fsel_
            c.full_tables = {nm: a.reshape(-1) for nm, a in
                             zip(dim_loads + extra_full,
                                 arrays[nf + npart:])}
            c._start = start
            c._padded = padded_
            c.part_joins = part_joins_
            c.part_pay = part_pay_
            c.n_dev = n_dev_
            c.part_arrays = {nm: a.reshape(-1) for nm, a in
                             zip(part_loads, arrays[nf:nf + npart])}
            c.part_meta = part_meta_
            c._shard_ix = shard
            return c

        def step_inputs():
            args = [self._shard(store.columns[nm]) for nm in fact_loads]
            args += [self._shard(store.columns[nm], part_meta_[nm[0]][1])
                     for nm in part_loads]
            args += [self._replicated(store.columns[nm])
                     for nm in dim_loads + extra_full]
            return args

        def count_join_round(jnode: V.Vexp, outer: bool) -> int:
            """One distributed counting round: the join's global match
            total (psum of per-shard local-probe matches), used as the
            static expansion-buffer bound everywhere the join expands."""
            vxj = jnode.vx

            @partial(jax.shard_map, mesh=self.mesh,
                     in_specs=tuple(in_specs), out_specs=P(),
                     check_vma=False)
            def count(*all_in):
                arrays, counts = all_in[:-1], all_in[-1]
                c = make_shard_compiler(arrays, counts)
                og = None if _chain_through(
                    vxj.lkeys, frozenset(set(fullsrc_keys_)
                                         | set(replicate_keys_)
                                         | set(scatter_keys_))) \
                    else _rowid_chain(vxj.lkeys, fact_count)
                if og:
                    lv = c._force(c.eval(vxj.lkeys))
                    data = lv.data + (og * c._start).astype(lv.data.dtype)
                    c.memo[vxj.lkeys.skey] = Val(
                        data=_mask_tail(data, lv.valid, lv.length),
                        valid=lv.valid, length=lv.length)
                art = c._join_artifacts(vxj.lkeys, vxj.rkeys)
                total = jnp.asarray(art["total"], jnp.int64)
                if outer:
                    lidx = jnp.arange(art["n"], dtype=jnp.int64)
                    lmask = lidx < jnp.asarray(art["lvalid"], jnp.int64)
                    total = total + jnp.sum(
                        ((art["cnt"] == 0) & lmask).astype(jnp.int64))
                return lax.psum(total, "d")

            cts = jnp.asarray([fact_count], jnp.int64)
            return max(int(jax.jit(count)(*step_inputs(), cts)), 1)

        for key, (jnode, outerflag) in pending_joins.items():
            self.join_sizes[key] = count_join_round(jnode, outerflag)

        def part_join_caps(pj) -> dict:
            """Two counting rounds -> EXACT static exchange capacities:
            round A = per-destination histograms of both key vectors
            (cap_l/cap_r); round B = the exchange itself, counts only
            (cap_pairs = largest (owner, source-shard) match block,
            cap_exp = largest per-probe-shard expansion)."""
            lk_v, rk_v, tab_ = pj["lkeys"], pj["rkeys"], pj["table"]
            klo, khi = pj["bounds"]
            kdt = jnp.int32 if pj.get("k32") else jnp.int64
            sent_r_, sent_l_ = key_sents(kdt)
            step_args = step_inputs() + [jnp.asarray([fact_count],
                                                     jnp.int64)]

            # round 0: heavy-hitter detection (skew-aware repartitioning,
            # BASELINE north star).  Heavy keys leave the exchange — their
            # build rows broadcast, their probes match locally — so the
            # exact capacities below stay at uniform-keys size under skew.
            heavy = None
            if os.environ.get("MPLAN2VDL_NO_SKEW_DETECT", "0") in ("", "0"):
                @partial(jax.shard_map, mesh=self.mesh,
                         in_specs=tuple(in_specs), out_specs=(P(),) * 5,
                         check_vma=False)
                def det(*all_in):
                    c = make_shard_compiler(all_in[:-1], all_in[-1])
                    rc = c._dim_c(tab_) if tab_ else c
                    return shard_heavy_detect(
                        c._keyed_local(lk_v, sent_l_, kdt=kdt),
                        rc._keyed_local(rk_v, sent_r_, kdt=kdt), n_dev_)

                hk_, rcnt_, nh_, chb_, chp_ = jax.jit(det)(*step_args)
                if int(nh_) > 0:
                    heavy = dict(hk=np.asarray(hk_), rcnt=np.asarray(rcnt_),
                                 cap_hb=max(int(chb_), 1),
                                 cap_hp=max(int(chp_), 1))
            hk_c = jnp.asarray(heavy["hk"]) if heavy else None
            rcnt_c = jnp.asarray(heavy["rcnt"]) if heavy else None

            def mask_heavy(keys, sent):
                if hk_c is None:
                    return keys
                _, hit = _member_lohi(keys, hk_c)
                return jnp.where(hit, sent, keys)

            @partial(jax.shard_map, mesh=self.mesh,
                     in_specs=tuple(in_specs), out_specs=(P(),) * 2,
                     check_vma=False)
            def hist(*all_in):
                c = make_shard_compiler(all_in[:-1], all_in[-1])
                rc = c._dim_c(tab_) if tab_ else c
                hl = dest_histogram(owner_dest(
                    mask_heavy(c._keyed_local(lk_v, sent_l_, kdt=kdt),
                               sent_l_),
                    klo, khi, n_dev_), n_dev_)
                hr = dest_histogram(owner_dest(
                    mask_heavy(rc._keyed_local(rk_v, sent_r_, kdt=kdt),
                               sent_r_),
                    klo, khi, n_dev_), n_dev_)
                return (jnp.max(lax.pmax(hl, "d")),
                        jnp.max(lax.pmax(hr, "d")))

            cap_l, cap_r = (max(int(x), 1)
                            for x in jax.jit(hist)(*step_args))

            @partial(jax.shard_map, mesh=self.mesh,
                     in_specs=tuple(in_specs), out_specs=(P(),) * 6,
                     check_vma=False)
            def stats(*all_in):
                c = make_shard_compiler(all_in[:-1], all_in[-1])
                rc = c._dim_c(tab_) if tab_ else c
                return shard_join_count_stats(
                    c._keyed_local(lk_v, sent_l_, kdt=kdt),
                    rc._keyed_local(rk_v, sent_r_, kdt=kdt),
                    key_lo=klo, key_hi=khi, n_dev=n_dev_,
                    cap_r=cap_r, cap_l=cap_l,
                    heavy_keys=hk_c, heavy_rcnt=rcnt_c)
            cap_pairs, cap_exp, cap_un, total, total_un, ovf = (
                int(x) for x in jax.jit(stats)(*step_args))
            assert ovf == 0, "exact-capacity exchange overflowed"
            return dict(cap_l=cap_l, cap_r=cap_r,
                        cap_pairs=max(cap_pairs, 1),
                        cap_exp=max(cap_exp, 1),
                        cap_un=max(cap_un, 1) if pj["outer"] else 0,
                        heavy=heavy,
                        total=total + (total_un if pj["outer"] else 0))

        for key, pj in part_joins.items():  # classifier post-order
            if pj["caps"] is None:
                pj["caps"] = part_join_caps(pj)

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
            gk0 = g.data.astype(jnp.int64)
            if off_g[0]:
                gk0 = gk0 + off_g[0] * c._start  # globalize row-id keys
            keys = jnp.where(valid, gk0, _SENT)
            vals = []
            for f, od in zip(folds_, off_d):
                d = c._force(c.eval(f.vx.fdata))
                dv = d.data[:nloc].astype(dtype_for(f.info))
                if od:
                    dv = dv + (od * c._start).astype(dv.dtype)
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
            for f, opname, og, od in zip(folds_, fold_ops, off_g, off_d):
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
                gids = g.data.astype(jnp.int64)
                if og:
                    gids = gids + og * c._start  # globalize row-id keys
                ids = jnp.clip(gids, 0, domain_ - 1)
                ids_ok = jnp.where(valid, ids, domain_)
                data = d.data[:nloc].astype(dt)
                if od:
                    data = data + (od * c._start).astype(dt)
                if domain_ <= segred.SMALL_DOMAIN:
                    # (agg, count) in one fused variadic reduce pass —
                    # separate reduces double the shard's HBM traffic
                    dense, occ_local = \
                        segred.masked_group_reduce_with_counts(
                            data, ids_ok, domain_, opname)
                    # widen before the cross-shard psum: per-shard counts
                    # fit int32, global totals may not
                    occ_local = occ_local.astype(jnp.int64)
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

        @partial(jax.shard_map, mesh=self.mesh, in_specs=tuple(in_specs),
                 out_specs=P("d"), check_vma=False)
        def rowset_step(*all_in):
            arrays, counts = all_in[:-1], all_in[-1]
            c = make_shard_compiler(arrays, counts)
            outs = []
            for t, ot in zip(terminals_, off_t):
                val = c._force(c.eval(t))
                d = val.data
                if ot:
                    d = d + (ot * c._start).astype(d.dtype)
                L = d.shape[0]
                nv = jnp.asarray(val.valid, jnp.int64)
                d = jnp.where(jnp.arange(L, dtype=jnp.int64) < nv, d, 0)
                outs.append(d.reshape(1, -1))
                outs.append(nv.reshape(1, 1))
            return tuple(outs)

        self._step = jax.jit(rowset_step if self.rowset
                             else sparse_step if sparse else step)

    def __call__(self):
        args = [self._shard(self.store.columns[nm]) for nm in self.fact_loads]
        args += [self._shard(self.store.columns[nm],
                             self.part_meta[nm[0]][1])
                 for nm in self.part_loads]
        args += [self._replicated(self.store.columns[nm])
                 for nm in self.dim_loads + self.extra_full]
        counts = self._replicated(np.asarray([self.fact_count], np.int64))
        outs = self._step(*args, counts)
        if self.rowset:
            # sharded per-output (rows, valid) pairs: concatenate each
            # shard's valid prefix in shard order == single-chip row order
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                outs = tuple(multihost_utils.process_allgather(o, tiled=True)
                             for o in outs)
            cols = []
            for i, t in enumerate(self.vexps):
                data = np.asarray(outs[2 * i])
                valids = np.asarray(outs[2 * i + 1]).reshape(-1)
                rows = np.concatenate([data[s, :int(valids[s])]
                                       for s in range(data.shape[0])])
                cols.append((t.name, t.info.dtype, rows))
            return cols
        if jax.process_count() > 1 and self.sparse:
            # sparse-path outputs are row-sharded (P('d')): gather the
            # global view on every host for the group stage
            from jax.experimental import multihost_utils

            outs = tuple(multihost_utils.process_allgather(o, tiled=True)
                         for o in outs)

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

    def describe(self) -> str:
        """Human-readable distribution plan (SURVEY §5 observability):
        what shards, what replicates, which joins exchange."""
        n_dev = self.mesh.devices.size
        lines = [f"fact table: {self.fact} ({self.fact_count} rows, "
                 f"{self.shard_rows} rows/shard x {n_dev} shards)"]
        lines.append("sharded fact columns: "
                     + ", ".join(nm[1] for nm in self.fact_loads))
        if self.part_loads:
            lines.append("sharded (partitioned-join) dim columns: "
                         + ", ".join(f"{nm[0]}.{nm[1]}"
                                     for nm in self.part_loads))
        if self.dim_loads:
            lines.append("replicated dim columns: "
                         + ", ".join(f"{nm[0]}.{nm[1]}"
                                     for nm in self.dim_loads))
        if self.extra_full:
            lines.append("replicated fact columns (full-width regions): "
                         + ", ".join(nm[1] for nm in self.extra_full))
        for key, pj in self.part_joins.items():
            caps = pj["caps"] or {}
            lines.append(
                f"partitioned shuffle join {key}: "
                f"right={'fact frame' if pj['table'] is None else pj['table']}"
                f"{' OUTER' if pj['outer'] else ''}"
                f" keys={'int32' if pj.get('k32') else 'int64'}"
                f" pairs={caps.get('total', '?')}"
                f" caps(l/r/pairs/exp)={caps.get('cap_l', '?')}/"
                f"{caps.get('cap_r', '?')}/{caps.get('cap_pairs', '?')}/"
                f"{caps.get('cap_exp', '?')}")
        lines.append(f"group domain: {self.domain} "
                     f"({'sparse all_to_all shuffle' if self.sparse else 'dense psum partials'}), "
                     f"{len(self.folds)} distributed fold(s)")
        return "\n".join(lines)

    def result(self):
        """Run and wrap the output like the single-chip engine's
        ``QueryResult`` (same decoding / printing surface)."""
        from ..engine.lower import QueryResult

        cols = self()
        return QueryResult(names=[nm for nm, _, _ in cols],
                           dtypes=[dt for _, dt, _ in cols],
                           columns=[c for _, _, c in cols])

    def _shard(self, arr: np.ndarray, shard_rows=None) -> jax.Array:
        padded = self.padded if shard_rows is None \
            else shard_rows * self.mesh.devices.size
        buf = np.zeros(padded, dtype=arr.dtype)
        buf[:len(arr)] = arr
        sharding = NamedSharding(self.mesh, P("d"))
        if jax.process_count() == 1:
            return jax.device_put(buf, sharding)
        # multi-host: every process holds the full table (the store loads
        # host-side); each contributes only its addressable shards
        return jax.make_array_from_callback(buf.shape, sharding,
                                            lambda idx: buf[idx])

    def _replicated(self, arr: np.ndarray) -> jax.Array:
        if jax.process_count() == 1:
            return jnp.asarray(arr)
        sharding = NamedSharding(self.mesh, P())
        a = np.asarray(arr)
        return jax.make_array_from_callback(a.shape, sharding,
                                            lambda idx: a[idx])


def distribute(cfg: Config, store: ColumnStore, vexps: List[V.Vexp],
               mesh: Mesh) -> AutoDistributed:
    return AutoDistributed(cfg=cfg, store=store, vexps=vexps, mesh=mesh)
