"""VIR -> XLA: compile a query's vector-IR DAG into one jitted JAX program.

Execution model (the TPU answer to dynamic cardinality, SURVEY.md §7.3):
every vector is a fixed-size buffer whose length is the node's *static count
bound* from metadata inference, paired with a dynamic ``valid`` scalar; slots
past ``valid`` hold zeros.  All shapes are static, so the whole query traces
and compiles once per (query, dataset) and every op fuses under XLA.

Physical dtypes are chosen per node from the catalog's value bounds: int32
when the bounds fit (halving HBM traffic — the catalog makes this exact),
int64 otherwise.

Op lowering highlights:
  * FoldSelect (compaction)  -> stable argsort of the negated mask
                                (38x faster than XLA scatter-nonzero on TPU)
  * Fold by group ids        -> dense: jax.ops.segment_* over the id domain;
                                sparse: sort + run-segmented reduce; the
                                sort/occupancy work is shared across all
                                aggregates of one group-by via a cache
  * Partition(dense range)   -> a subtraction (pivots never materialize)
  * Like                     -> the pattern is evaluated over the column's
                                (small) string dictionary at trace time and
                                becomes an integer-set membership test
  * Scatter                  -> out-of-range drop semantics; uncovered = 0
"""

from __future__ import annotations

import logging
import os
import re
from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, List, Optional, Tuple, Union

import numpy as np

import jax

from .. import jaxcfg  # noqa: F401  (x64 + persistent compilation cache)

import jax.numpy as jnp
from jax import lax

from .. import mplan as M
from .. import vir as V
from ..catalog import ColInfo, Config
from ..mtypes import DDate, DDecimal, DString, INT32_MAX, INT32_MIN
from ..names import Name, name_str
from .columnstore import ColumnStore
from . import mergesearch, scan
from .kernels import segred

DENSE_DOMAIN_LIMIT = 1 << 20

# Host->device transfers above ~50MB stall nondeterministically through the
# tunneled device runtime (ROADMAP perf notes); ship large columns in
# independently-committed chunks and stitch them on device.
_XFER_CHUNK_BYTES = int(os.environ.get("MPLAN2VDL_XFER_CHUNK_MB", "32")) << 20


def chunked_device_put(arr) -> jnp.ndarray:
    """device_put that splits host arrays into <=32MB chunks so no single
    RPC crosses the tunnel's stall threshold; small arrays go straight
    through."""
    a = np.asarray(arr)
    if a.nbytes <= _XFER_CHUNK_BYTES or a.ndim != 1:
        return jnp.asarray(a)
    per = max(_XFER_CHUNK_BYTES // max(a.dtype.itemsize, 1), 1)
    parts = [jax.device_put(a[i:i + per]) for i in range(0, len(a), per)]
    for p in parts:
        p.block_until_ready()
    return jnp.concatenate(parts)


def dtype_for(info: ColInfo):
    l, u = info.bounds
    if INT32_MIN <= l and u <= INT32_MAX:
        return jnp.int32
    return jnp.int64


@dataclass
class Val:
    """A runtime vector: fixed-size buffer + dynamic valid length."""

    data: Optional[jnp.ndarray]  # None for an unmaterialized RangeC
    valid: Union[int, jnp.ndarray]
    length: int  # static buffer length
    lazy_range: Optional[Tuple[int, int]] = None  # (rmin, rstep) when data is None

    @property
    def full(self) -> bool:
        return isinstance(self.valid, int) and self.valid == self.length


def _vmin(a, b):
    if isinstance(a, int) and isinstance(b, int):
        return min(a, b)
    return jnp.minimum(jnp.asarray(a, jnp.int64), jnp.asarray(b, jnp.int64))


def _compact_kernel_on() -> bool:
    """The Pallas stream-compaction kernel runs on real TPUs (Mosaic) or
    under the interpret-mode hook; MPLAN2VDL_NO_COMPACT_KERNEL=1 forces
    the sort path everywhere."""
    if os.environ.get("MPLAN2VDL_NO_COMPACT_KERNEL", "0") not in ("", "0"):
        return False
    if os.environ.get("MPLAN2VDL_PL_INTERPRET", "0") not in ("", "0"):
        return True
    return jax.default_backend() == "tpu"


def _sel_positions(mask: jnp.ndarray) -> jnp.ndarray:
    """Ascending positions of mask-true rows (the compaction core);
    entries past the true count are unspecified-but-in-range (zero on the
    kernel path, the unselected tail on the sort path) — every caller
    consumes only the selected prefix.

    TPU path: the Pallas stream-compaction kernel (kernels/compact.py),
    0.22-0.29 ns/element = 4.4-9x over the fused sort below (measured on
    v5e at 1.5M/6M rows, tools/probe_r2.py methodology).  Fallback fuses
    the mask bit and row index into ONE int32 sort key so the sort moves
    4 bytes/row instead of argsort's (bool, int64) 9."""
    n = mask.shape[0]
    if (n >= 4096 and n < (1 << 30) and _compact_kernel_on()
            and isinstance(mask, jax.core.Tracer)):  # kernels trace-only
        from .kernels.compact import compact_positions

        return compact_positions(mask)
    if n < (1 << 30):
        fused = (jnp.where(mask, 0, 1 << 30).astype(jnp.int32)
                 + jnp.arange(n, dtype=jnp.int32))
        return lax.sort(fused) & ((1 << 30) - 1)
    return jnp.argsort(~mask, stable=True)


def _take_ascending(src: jnp.ndarray, slots: jnp.ndarray,
                    static_fit=None) -> jnp.ndarray:
    """``src[slots]`` for ascending slots: the streaming sorted-gather
    kernel on TPU when the density gate passes (same 1/8 rule as the
    engine gather path), XLA gather otherwise.  ``static_fit`` bakes the
    kernel/XLA choice (resolved eagerly per join site alongside the
    dynamic sizes) — None keeps the runtime cond."""
    n_out = int(slots.shape[0])
    # kernels are TRACE-only: eager (concrete) calls happen during the
    # counting pre-pass, which may run on the host CPU backend where
    # Mosaic cannot lower — and per-op kernel dispatch buys nothing there
    if (_sorted_gather_on() and n_out >= 4096
            and isinstance(slots, jax.core.Tracer)
            and src.dtype in (jnp.int32, jnp.int64)):
        from .kernels.sorted_gather import BLOCK, sorted_gather

        if n_out * 16384 >= int(src.shape[0]) * BLOCK:
            return sorted_gather(src, slots.astype(jnp.int32), n_out,
                                 static_fit=static_fit)
    return src[slots]


def _resolve_take_fit(fits, fitkey, src_len: int, slots) -> object:
    """Span-fit verdict for an internal _take_ascending site: eager
    values resolve and record it under ``fitkey``; tracers look it up.
    Returns True/False/None (None = keep the runtime cond)."""
    if fits is None:
        return None
    if not isinstance(slots, jax.core.Tracer):
        from .kernels.sorted_gather import resolve_fit

        fit = resolve_fit(src_len, slots, int(slots.shape[0]))
        fits[fitkey] = fit
        return fit
    return fits.get(fitkey)


def _expand_li(cum: jnp.ndarray, k: jnp.ndarray, fits=None,
               fitkey=None) -> jnp.ndarray:
    """``searchsorted(cum, k, 'right')`` for the join-expansion iota
    queries: which left row's output run contains each output slot.
    Large expansions rank via ONE tagged co-sort (mergesearch) instead of
    XLA's serialized binary search; because the iota queries are already
    sorted and distinct, their merged order IS query order, so the
    route-back sort is replaced by a compaction + ascending gather.
    cum <= total <= B so int32 keys are safe below 2^30 for in-contract
    calls; a same-shape recall with larger counts could exceed the
    pre-resolved B, so cum is CLAMPED to 2^30-1 before the int32 cast.
    In-contract values are unchanged (cum <= B < 2^30); out-of-contract
    ones stay monotone and truncate — the engine's capacity semantics
    everywhere — instead of int32-wrapping into garbage.  A lax.cond
    fallback was measured worse than the clamp: the conditional was the
    top HBM-traffic instruction of Q3/Q9 (it materializes both branch
    operands and blocks XLA fusion through the join expansion)."""
    B = int(k.shape[0])
    if mergesearch.use_merge(B) and B < 2**30:
        m = int(cum.shape[0])
        cum32 = jnp.minimum(cum, jnp.asarray(2**30 - 1, cum.dtype))
        t = cum32.astype(jnp.int32) * 2  # side='right': queries after
        q = k.astype(jnp.int32) * 2 + 1  # equal cum entries
        (tagged,) = mergesearch._pad_with(
            [jnp.concatenate([t, q])], [2**31 - 1])
        total = tagged.shape[0]
        origin = lax.iota(jnp.int32, total)
        _, sorg = lax.sort((tagged, origin), num_keys=1)
        is_q = sorg >= m                 # pads rank last: harmless
        pos = (lax.iota(jnp.int32, total) + 1
               - scan.cumsum(is_q.astype(jnp.int32)))
        qslots = _sel_positions(is_q)[:B]
        fit = _resolve_take_fit(fits, fitkey, int(pos.shape[0]), qslots)
        return _take_ascending(pos, qslots, static_fit=fit).astype(jnp.int64)
    return jnp.searchsorted(cum, k, side="right")


def _mask_tail(data: jnp.ndarray, valid, length: int) -> jnp.ndarray:
    """Re-establish the zeros-past-valid invariant."""
    if isinstance(valid, int) and valid == length:
        return data
    idx = jnp.arange(length, dtype=jnp.int32 if length <= INT32_MAX else jnp.int64)
    return jnp.where(idx < valid, data, jnp.zeros((), data.dtype))


def like_to_regex(pattern: str) -> "re.Pattern":
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out) + "$", re.DOTALL)


BLOCK_PAD = 1024  # compacted fold-input lengths round up to this

# dense-domain join: max key-domain width (one D-length int32 packed
# run table -> 256MB transient at the 64M cap) and max build-side rows.
# The cap is 2^16-1 so run start AND run length each fit 16 bits and
# pack into ONE int32 table entry (lo | cnt<<16) — halving the
# per-probe gather work, which self-time profiling showed owns the
# dense join's cost (profiles/summaries_r05.txt: Q17's three ~7ms
# small-table kernel launches).
# MPLAN2VDL_NO_DENSE_JOIN=1 forces sort-merge everywhere (A/B +
# bisection).
DENSE_DOMAIN = 1 << 26
DENSE_RIGHT_MAX = (1 << 16) - 1


def _dense_join_on() -> bool:
    return os.environ.get("MPLAN2VDL_NO_DENSE_JOIN", "0") in ("", "0")


def _dense_tab(r_ok, ridx, m: int, klo: int, D: int):
    """(rs_idx, packed run table) for one dense-join build side: sort
    the small right side (sentinel rows last), scatter run starts and
    lengths over the domain, pack both 16-bit halves into one int32
    entry.  Duplicate-safe (.min/.add); sentinels map past D and drop."""
    rs, rs_idx = lax.sort((r_ok, ridx), num_keys=1)
    pos = jnp.arange(m, dtype=jnp.int32)
    slot = (rs - jnp.asarray(klo, rs.dtype)).astype(jnp.int32)
    lo_tab = jnp.full((D,), m, jnp.int32).at[slot].min(pos, mode="drop")
    cnt_tab = jnp.zeros((D,), jnp.int32).at[slot].add(jnp.int32(1),
                                                      mode="drop")
    return rs_idx, lo_tab | (cnt_tab << jnp.int32(16))


def _monotone_positions(v: V.Vexp) -> bool:
    """Positions known sorted ascending at trace time: selection
    compactions (FSel outputs), non-negative ranges, join-index outputs
    that enumerate the probe side in order (JLEFT = the expansion of
    ascending probe rows, non-decreasing; JSEMI/JANTI = ascending
    kept-row positions — NOT the outer sides, whose appended unmatched
    rows restart low), and their gather compositions (monotone of
    monotone stays monotone).  Q5's join-payload position chains pass
    through JLEFT, which kept four 65%-density gathers on XLA's
    serialized path (lower.py:448 sites in /tmp/q05.hlo, r5)."""
    vx = v.vx
    if isinstance(vx, V.Fold) and vx.foldop == V.FSEL:
        return True
    if isinstance(vx, (V.RangeV, V.RangeC)):
        return vx.rstep >= 0
    if isinstance(vx, V.JoinIndex) and vx.jside in (V.JLEFT, V.JSEMI,
                                                    V.JANTI):
        return True
    if isinstance(vx, V.Shuffle) and vx.shop == V.GATHER:
        return (_monotone_positions(vx.shsource)
                and _monotone_positions(vx.shpos))
    return False


def _sorted_gather_on() -> bool:
    """The Pallas streaming gather runs on real TPUs only (Mosaic);
    MPLAN2VDL_NO_SORTED_GATHER=1 forces the XLA gather everywhere."""
    if os.environ.get("MPLAN2VDL_NO_SORTED_GATHER", "0") not in ("", "0"):
        return False
    return jax.default_backend() == "tpu"


class Compiler:
    """Trace-time evaluator for one query DAG.

    ``join_sizes`` maps a JoinIndex key (lkeys.skey, rkeys.skey) to the
    concrete match count resolved by the counting pre-pass (two-phase
    execution; SURVEY.md §7.3 risk 1)."""

    def __init__(self, cfg: Config, store: ColumnStore,
                 join_sizes: Optional[Dict[tuple, int]] = None,
                 fsel_sizes: Optional[Dict[int, int]] = None,
                 span_fits: Optional[Dict[int, bool]] = None,
                 fold_counts: Optional[Dict[tuple, int]] = None):
        self.fold_counts = fold_counts if fold_counts is not None else {}
        self.cfg = cfg
        self.store = store
        # keep the CALLER's dict objects: the size-resolution loop fills
        # them while this compiler is live (`or {}` would silently detach
        # an initially-empty shared dict)
        self.join_sizes = join_sizes if join_sizes is not None else {}
        self.fsel_sizes = fsel_sizes if fsel_sizes is not None else {}
        # gather skey -> eagerly-resolved span-fit verdict (True: the
        # streaming kernel's windows cover every block; False: XLA
        # gather).  Filled during the eager size-resolution pass; at
        # trace time a hit replaces the runtime lax.cond with a static
        # branch (the cond materializes both branches' operands and was
        # Q3's top-traffic instruction)
        self.span_fits = span_fits if span_fits is not None else {}
        # (fgroups.skey, fmask.skey|None) -> [fdata Vexps] of every Fold
        # sharing that group (filled by CompiledQuery._run): sparse-path
        # artifacts CO-SORT these payloads inside the one lax.sort that
        # builds the permutation (~0.5ns/el/operand) instead of each
        # fold paying a ~7ns/element serialized XLA gather through
        # data[perm] (profiles/summaries_r05.txt: the gathers, not the
        # sorts, owned Q13/Q18-class fold time)
        self.fold_payloads: Dict[tuple, list] = {}
        # pos.skey -> ((gather node, reachability set), ...): gathers
        # sharing positions batch into one kernel launch (gather_many);
        # filled by CompiledQuery._run
        self.gather_mates: Dict[int, tuple] = {}
        # lkeys.skey -> ((lkeys, rkeys), ...): joins sharing probe keys
        # (dense-domain siblings batch their table gathers)
        self.dense_sibs: Dict[int, tuple] = {}

    def _monotone(self, v: V.Vexp) -> bool:
        """Positions/values known non-decreasing: the static rules of
        _monotone_positions plus store-level physical sortedness — FK
        join-index columns of order-major tables (lineitem's %fk into
        orders) are sorted in the data, which the catalog can't express
        but one numpy pass proves (ColumnStore.is_sorted)."""
        vx = v.vx
        if isinstance(vx, V.Load):
            return self.store.is_sorted(vx.name)
        if isinstance(vx, V.Shuffle) and vx.shop == V.GATHER:
            return self._monotone(vx.shsource) and self._monotone(vx.shpos)
        return _monotone_positions(v)

    # ------------------------------------------------------------------ trace
    def trace(self, vexps: List[V.Vexp], tables: Dict[Name, jnp.ndarray]
              ) -> List[Val]:
        self.memo: Dict[int, Val] = {}
        self.group_cache: Dict[tuple, dict] = {}
        self.join_cache: Dict[tuple, dict] = {}
        self.tables = tables
        return [self._force(self.eval(v)) for v in vexps]

    def eval(self, v: V.Vexp) -> Val:
        hit = self.memo.get(v.skey)
        if hit is not None:
            return hit
        out = self._eval(v)
        self.memo[v.skey] = out
        return out

    def _force(self, val: Val) -> Val:
        if val.data is not None:
            return val
        rmin, rstep = val.lazy_range
        dt = jnp.int64 if (abs(rmin) + abs(rstep) * val.length > INT32_MAX) \
            else jnp.int32
        data = rmin + rstep * jnp.arange(val.length, dtype=dt)
        data = _mask_tail(data, val.valid, val.length)
        return Val(data=data, valid=val.valid, length=val.length)

    # ------------------------------------------------------------------- ops
    def _eval(self, v: V.Vexp) -> Val:
        vx = v.vx
        L = v.info.count
        dt = dtype_for(v.info)

        if isinstance(vx, V.Load):
            arr = self.tables.get(vx.name)
            if arr is None:
                raise KeyError(f"column {name_str(vx.name)} not in store")
            assert len(arr) == L, (vx.name, len(arr), L)
            return Val(data=arr, valid=L, length=L)

        if isinstance(vx, V.RangeC):
            return Val(data=None, valid=vx.rcount, length=vx.rcount,
                       lazy_range=(vx.rmin, vx.rstep))

        if isinstance(vx, V.RangeV):
            ref = self.eval(vx.rref)
            data = (vx.rmin
                    + vx.rstep * jnp.arange(ref.length, dtype=jnp.int64)
                    ).astype(dt)
            data = _mask_tail(data, ref.valid, ref.length)
            return Val(data=data, valid=ref.valid, length=ref.length)

        if isinstance(vx, V.Binop):
            return self._eval_binop(v, vx)

        if isinstance(vx, V.Shuffle) and vx.shop == V.GATHER:
            src = self._force(self.eval(vx.shsource))
            pos = self._force(self.eval(vx.shpos))
            from .kernels.sorted_gather import (BLOCK, SMALL_TABLE,
                                                W_OPTIONS)

            # the two-phase sizing already shrank pos.length to the REAL
            # cardinality, so pos.length/src.length is the selectivity:
            # below BLOCK/W_max even the widest window rarely covers a
            # block's span (the runtime cond would fall back to XLA while
            # still blocking XLA's gather fusion — measured -23% on Q19's
            # 0.2%-selective filters), so skip the kernel statically.
            # r5: the menu extends to 64K windows; the floor moves from
            # 12.5% to 6.25% (W=16384 equivalent).  Measured bracketing
            # (profiles/chip_batch2.log): the 6-12%-density gathers win
            # big (Q7 9.6->6.6ms, Q19 2.1->0.9ms, Q10 -15%) but at
            # ~5% density the per-block window DMAs + sub-tile sweeps
            # LOSE to XLA's serialized gather (Q9 22.7->28.9ms), so the
            # widest windows serve only locally-clustered sites that
            # resolve to them organically, not uniform sparse ones.
            use_sorted = (self._monotone(vx.shpos)
                          and src.length >= 4096 and pos.length >= 4096
                          and pos.length * 16384 >= src.length * BLOCK)
            use_small = (src.length <= SMALL_TABLE and pos.length >= 4096)
            if (_sorted_gather_on()
                    and src.data.dtype in (jnp.int32, jnp.int64)
                    and (use_sorted or use_small)):
                # XLA's dynamic gather on TPU is latency-serialized
                # (~7 ns/element); stream source windows for monotone
                # positions (compaction applies) or keep small dim tables
                # VMEM-resident for fk-value gathers (kernels/sorted_gather)
                from .kernels.sorted_gather import (resolve_fit,
                                                    small_table_gather,
                                                    sorted_gather)

                if not isinstance(pos.data, jax.core.Tracer):
                    # eager size-resolution pass (possibly on the host
                    # CPU backend): resolve the span fit, bake the branch
                    # for the main trace, take the value via plain XLA
                    if use_sorted:
                        self.span_fits[v.skey] = resolve_fit(
                            src.length, pos.data, pos.valid)
                    p = jnp.clip(pos.data, 0, src.length - 1)
                    data = src.data[p].astype(dt)
                else:
                    data = self._group_gather(
                        v, vx, src, pos, sorted_mode=use_sorted).astype(dt)
            else:
                p = jnp.clip(pos.data, 0, src.length - 1)
                data = src.data[p].astype(dt)
            # gathering from an empty source yields an empty vector (the
            # broadcast-join path gathers src[0] of a possibly-empty 1-row
            # side, Vlite.hs:694-713)
            if isinstance(src.valid, int) and src.valid > 0:
                valid = pos.valid
            elif isinstance(src.valid, int):
                valid = 0
            else:
                valid = jnp.where(src.valid > 0,
                                  jnp.asarray(pos.valid, jnp.int64), 0)
            data = _mask_tail(data, valid, pos.length)
            return Val(data=data, valid=valid, length=pos.length)

        if isinstance(vx, V.Shuffle) and vx.shop == V.SCATTER:
            src = self._force(self.eval(vx.shsource))
            pos = self._force(self.eval(vx.shpos))
            if vx.shshape is not None:
                L = self.eval(vx.shshape).length
            else:
                L = vx.shpos.info.bounds[1] + 1
            n = min(src.length, pos.length)
            # invalid rows scatter out of range and are dropped
            idx = jnp.arange(n, dtype=jnp.int64)
            limit = _vmin(src.valid, pos.valid)
            p = jnp.where(idx < limit, pos.data[:n].astype(jnp.int64), L)
            if (n >= 4096 and L < (1 << 30) and _compact_kernel_on()
                    and isinstance(p, jax.core.Tracer)  # kernels trace-only
                    and vx.shpos.quant == V.UNIQUE
                    and self._monotone(vx.shpos)):
                # ascending unique positions (FK mask scatters, compaction
                # composition): the Pallas monotone-scatter kernel streams
                # writes instead of XLA's ~7ns/element serialized scatter
                from .kernels.scatter import monotone_scatter

                out = monotone_scatter(p, src.data[:n].astype(dt), L,
                                       out_dtype=dt)
            else:
                out = jnp.zeros((L,), dt).at[p].set(
                    src.data[:n].astype(dt), mode="drop")
            return Val(data=out, valid=L, length=L)

        if isinstance(vx, V.Fold) and vx.foldop == V.FSEL:
            b = self._force(self.eval(vx.fdata))
            L = b.length
            mask = b.data != 0
            # compaction strategy (measured on v5e, 1.5M rows):
            #   nonzero (XLA scatter)        128 ms  (serialized updates)
            #   cumsum + searchsorted        225 ms  (random-gather search)
            #   stable argsort of ~mask      3.4 ms  <- used
            sel = _sel_positions(mask)
            nz = jnp.sum(mask.astype(jnp.int64))
            # the counting pre-pass shrinks the selection buffer to the
            # actual survivor count, so every downstream gather runs at
            # the real cardinality instead of the static bound
            L_out = min(self.fsel_sizes.get(v.skey, L), L)
            sel = _mask_tail(sel[:L_out].astype(dt), nz, L_out)
            return Val(data=sel, valid=nz, length=L_out)

        if isinstance(vx, V.Fold):
            return self._eval_fold(v, vx)

        if isinstance(vx, V.Partition):
            return self._eval_partition(v, vx)

        if isinstance(vx, V.Semisort):
            s = self._force(self.eval(vx.sdata))
            it = jnp.arange(s.length, dtype=jnp.int32
                            if s.length < 2**31 else jnp.int64)
            _, perm = lax.sort((s.data, it), num_keys=1, is_stable=True)
            return Val(data=perm.astype(dt), valid=s.valid, length=s.length)

        if isinstance(vx, V.SortPerm):
            # composed stable sorts, last key first; invalid rows sink to
            # the end regardless of direction
            vals = [self._force(self.eval(k)) for k in vx.keys]
            n = vals[0].length
            idx = jnp.arange(n, dtype=jnp.int64)
            validmask = idx < jnp.asarray(vals[0].valid, jnp.int64)
            perm = idx
            BIG = jnp.int64(2**62)
            for kv, desc in list(zip(vals, vx.descs))[::-1]:
                kd = kv.data.astype(jnp.int64)
                if desc:
                    kd = -kd
                key = jnp.where(validmask, kd, BIG)[perm]
                it = jnp.arange(n, dtype=jnp.int32 if n < 2**31
                                else jnp.int64)
                _, order = lax.sort((key, it), num_keys=1, is_stable=True)
                perm = perm[order]
            data = _mask_tail(perm.astype(dt), vals[0].valid, n)
            return Val(data=data, valid=vals[0].valid, length=n)

        if isinstance(vx, V.Like):
            return self._eval_like(v, vx)

        if isinstance(vx, V.DictMap):
            dval = self._force(self.eval(vx.ldata))
            src = np.asarray([a for a, _ in vx.mapping], dtype=np.int64)
            dstc = np.asarray([b for _, b in vx.mapping], dtype=np.int64)
            if len(src) <= 64:
                # small maps: a fused select chain (one compare+select per
                # entry, fully vectorized) beats any search
                hitv = jnp.zeros(dval.data.shape, jnp.int64)
                for a, b in zip(src, dstc):
                    hitv = jnp.where(dval.data == int(a), jnp.int64(int(b)),
                                     hitv)
            else:
                sarr = jnp.asarray(src)
                darr = jnp.asarray(dstc)
                key_hi = int(max(abs(src).max(),
                                 abs(vx.ldata.info.bounds[0]),
                                 abs(vx.ldata.info.bounds[1]))) + 1
                pos = jnp.clip(
                    mergesearch.searchsorted_fast(
                        sarr, dval.data.astype(jnp.int64), "left",
                        key_hi=key_hi),
                    0, len(src) - 1)
                hitv = jnp.where(sarr[pos] == dval.data, darr[pos], 0)
            out = _mask_tail(hitv.astype(dt), dval.valid, dval.length)
            return Val(data=out, valid=dval.valid, length=dval.length)

        if isinstance(vx, V.VShuffle):
            # any permutation is legal; identity preserves determinism
            return self.eval(vx.varg)

        if isinstance(vx, V.CrossProduct):
            lv = self.eval(vx.left)
            rv = self.eval(vx.right)
            L = lv.length * rv.length
            nv = jnp.asarray(lv.valid, jnp.int64)
            mv = jnp.asarray(rv.valid, jnp.int64)
            total = nv * mv
            i = jnp.arange(L, dtype=jnp.int64)
            mv_safe = jnp.maximum(mv, 1)
            if vx.variant == V.COUTER:
                data = jnp.where(i < total, i // mv_safe, 0)
            else:
                data = jnp.where(i < total, i % mv_safe, 0)
            return Val(data=data.astype(dt), valid=total, length=L)

        if isinstance(vx, V.JoinIndex):
            return self._eval_join_index(v, vx)

        raise TypeError(f"engine cannot lower {type(vx).__name__}")

    # ------------------------------------------------------------- equijoins
    def _join_artifacts(self, lkeys: V.Vexp, rkeys: V.Vexp) -> dict:
        """Equijoin core, shared by every JoinIndex over one key pair.

        Two strategies (BENCH_QUERIES.md r4 sort-bound attribution — the
        tagged-merge co-sorts own ~2/3 of Q17/Q21's time):

        * dense-domain (r4): when the build (right) side is SMALL
          (<= DENSE_RIGHT_MAX rows) and the key domain is a bounded
          int32 range, sort only the tiny right side and scatter its
          run starts/lengths into two domain-length tables (duplicate
          right keys are handled natively by the run lengths — no
          uniqueness assumption); every probe then resolves with
          gathers (VMEM-table kernel for small domains, streaming
          sorted-gather for monotone probe keys).  The n+m co-sorts
          disappear; see ``_dense_join``.
        * sort-merge (general): sort the right keys, locate each left
          key's run via the tagged co-sort (mergesearch)."""
        key = (lkeys.skey, rkeys.skey)
        hit = self.join_cache.get(key)
        if hit is not None:
            return hit
        lv = self._force(self.eval(lkeys))
        rv = self._force(self.eval(rkeys))
        n, m = lv.length, rv.length
        # int32 keys when bounds allow: halves the sort's HBM traffic and
        # sidesteps TPU int64 emulation (sort dominates join cost)
        klo = min(lkeys.info.bounds[0], rkeys.info.bounds[0])
        khi = max(lkeys.info.bounds[1], rkeys.info.bounds[1])
        use32 = (klo > -(2**31) and khi < 2**31 - 3
                 and max(n, m) < 2**31)
        kdt = jnp.int32 if use32 else jnp.int64
        # sentinels sit just above the real key domain (not at dtype max)
        # so the tagged co-sort below can pack key*4+tag into the same
        # dtype whenever the domain allows
        SENT_L = kdt(khi + 1) if use32 else jnp.int64(2**62 - 1)
        SENT_R = kdt(khi + 2) if use32 else jnp.int64(2**62)
        ridx = jnp.arange(m, dtype=kdt)
        r_ok = jnp.where(ridx < jnp.asarray(rv.valid, kdt),
                         rv.data.astype(kdt), SENT_R)
        # probe phase: jnp.searchsorted serializes one ~7ns gather per
        # binary-search step on TPU (~143 ns/probe over a 512K table,
        # tools/probe_sort.py); the tagged co-sort ranks every probe in
        # two 1.6 ns/element sorts — both sides in ONE merge, and the
        # table's sort permutation (rs_idx) falls out of the merged order
        # for free (compaction + ascending gather replaces a third sort)
        lidx = jnp.arange(n, dtype=kdt)
        l_ok = jnp.where(lidx < jnp.asarray(lv.valid, kdt),
                         lv.data.astype(kdt), SENT_L)
        art = self._dense_join(key, lv, rv, l_ok, r_ok, ridx,
                               klo, khi, use32, lkeys)
        if art is not None:
            self.join_cache[key] = art
            return art
        if mergesearch.use_merge(n):
            lo, hi, sorg = mergesearch.merge_lo_hi(
                r_ok, l_ok, key_hi=max(abs(klo), khi + 2) if use32 else None,
                return_merged=True)
            tslots = _sel_positions(sorg < m)[:m]
            fit = _resolve_take_fit(self.span_fits,
                                    ("j_rsidx", lkeys.skey, rkeys.skey),
                                    int(sorg.shape[0]), tslots)
            rs_idx = _take_ascending(sorg, tslots,
                                     static_fit=fit).astype(kdt)
        else:
            rs, rs_idx = lax.sort((r_ok, ridx), num_keys=1)
            lo = jnp.searchsorted(rs, l_ok, side="left")
            hi = jnp.searchsorted(rs, l_ok, side="right")
        cnt = (hi - lo).astype(jnp.int64)
        cum = scan.cumsum(cnt)
        total = cum[-1] if n > 0 else jnp.int64(0)
        art = dict(n=n, m=m, rs_idx=rs_idx, lo=lo, cnt=cnt, cum=cum,
                   total=total, lvalid=lv.valid)
        self.join_cache[key] = art
        return art

    def _dense_sib_ok(self, lkeys: V.Vexp, r2: V.Vexp, klo: int,
                      khi: int) -> bool:
        """A sibling join's build side may batch only when it spans the
        SAME dense domain (same klo/khi -> same table length and decode)
        and its subtree contains no JoinIndex (evaluating it from inside
        another join's artifact build must not recurse into join
        machinery)."""
        klo2 = min(lkeys.info.bounds[0], r2.info.bounds[0])
        khi2 = max(lkeys.info.bounds[1], r2.info.bounds[1])
        if (klo2, khi2) != (klo, khi):
            return False
        seen, stack = set(), [r2]
        while stack:
            y = stack.pop()
            if y.skey in seen:
                continue
            seen.add(y.skey)
            if isinstance(y.vx, V.JoinIndex):
                return False
            stack.extend(_children(y.vx))
        return True

    def _dense_join(self, key, lv, rv, l_ok, r_ok, ridx,
                    klo: int, khi: int, use32: bool, lkeys: V.Vexp):
        """Small-right dense-domain join artifacts, or None if ineligible.

        When the build (right) side is small (<= DENSE_RIGHT_MAX rows)
        and the key domain is a bounded int32 range, the tagged-merge
        co-sorts over n+m elements — the measured 2/3 of Q17/Q21's time
        (BENCH_QUERIES.md) — are unnecessary: sort ONLY the tiny right
        side, scatter its run starts/lengths into two domain-indexed
        tables (O(m), deterministic .at[].min/.add), and resolve every
        probe with gathers through the fast kernels — the VMEM-resident
        table for small domains, the streaming sorted-gather for
        monotone probe keys (span fit resolved eagerly by the counting
        pass, same ``span_fits`` contract as every other kernel site).
        Duplicates on the right are handled natively (run lengths), so
        no uniqueness inference is trusted.  The artifacts keep the
        merge path's exact semantics: ``lo`` = first match position in
        the SORTED right, ``rs_idx`` = the right sort permutation."""
        from .kernels.sorted_gather import (SMALL_TABLE, resolve_fit,
                                            small_table_gather,
                                            sorted_gather)

        n, m = lv.length, rv.length
        D = int(khi) - int(klo) + 1
        mono = self._monotone(lkeys)
        small = D <= SMALL_TABLE
        if not (_dense_join_on() and use32 and 0 < D <= DENSE_DOMAIN
                and 1 <= m <= DENSE_RIGHT_MAX and (mono or small)):
            return None
        fitkey = ("dense_fit", key[0], key[1])
        eager = not (isinstance(l_ok, jax.core.Tracer)
                     or isinstance(r_ok, jax.core.Tracer))
        lk = jnp.clip(l_ok.astype(jnp.int32)
                      - jnp.asarray(klo, jnp.int32), 0, D - 1)
        fit = None
        if not small:
            if eager and fitkey not in self.span_fits:
                self.span_fits[fitkey] = resolve_fit(D, lk, lv.valid)
            fit = self.span_fits.get(fitkey)
            if not fit:  # unresolved or spans exceed every window
                return None
        pre = getattr(self, "dense_pre", None)
        if pre is None:
            pre = self.dense_pre = {}
        hit = pre.pop(key, None)
        if hit is not None:
            rs_idx, lo, cg = hit
        else:
            rs_idx, packed = _dense_tab(r_ok, ridx, m, klo, D)
            tracer = (isinstance(lk, jax.core.Tracer)
                      and _sorted_gather_on())
            # sibling joins probing the SAME keys over the same domain
            # (Q17: both its joins probe l_partkey) stack their packed
            # tables into ONE kernel launch (gather_many) — the probe
            # decode and sweep are shared, so the second join's table
            # gather rides nearly free
            sib_tabs = []
            if tracer:
                for l2, r2 in self.dense_sibs.get(key[0], ()):
                    k2 = (l2.skey, r2.skey)
                    if (k2 == key or k2 in pre
                            or not self._dense_sib_ok(lkeys, r2, klo,
                                                      khi)):
                        continue
                    rv2 = self._force(self.eval(r2))
                    m2 = rv2.length
                    if not (1 <= m2 <= DENSE_RIGHT_MAX):
                        continue
                    ridx2 = jnp.arange(m2, dtype=jnp.int32)
                    r_ok2 = jnp.where(
                        ridx2 < jnp.asarray(rv2.valid, jnp.int32),
                        rv2.data.astype(jnp.int32), jnp.int32(khi + 2))
                    sib_tabs.append(
                        (k2, m2) + _dense_tab(r_ok2, ridx2, m2, klo, D))
            if tracer and sib_tabs:
                from .kernels.sorted_gather import gather_many

                outs = gather_many(
                    [packed] + [t[3] for t in sib_tabs], lk, lv.valid,
                    static_fit=fit, small=small)
                pk = outs[0]
                for (k2, m2, rsi2, _), o in zip(sib_tabs, outs[1:]):
                    pre[k2] = (rsi2, o & jnp.int32(0xFFFF),
                               (o >> jnp.int32(16)) & jnp.int32(0xFFFF))
            elif tracer:
                if small:
                    pk = small_table_gather(packed, lk, lv.valid)
                else:
                    pk = sorted_gather(packed, lk, lv.valid,
                                       static_fit=fit)
            else:
                pk = packed[lk]
            lo = pk & jnp.int32(0xFFFF)
            cg = (pk >> jnp.int32(16)) & jnp.int32(0xFFFF)
        lidx = jnp.arange(n, dtype=jnp.int64)
        in_dom = ((l_ok >= jnp.asarray(klo, l_ok.dtype))
                  & (l_ok <= jnp.asarray(khi, l_ok.dtype))
                  & (lidx < jnp.asarray(lv.valid, jnp.int64)))
        cnt = jnp.where(in_dom, cg, 0).astype(jnp.int64)
        cum = scan.cumsum(cnt)
        total = cum[-1] if n > 0 else jnp.int64(0)
        return dict(n=n, m=m, rs_idx=rs_idx, lo=lo, cnt=cnt, cum=cum,
                    total=total, lvalid=lv.valid)

    def _eval_join_index(self, v: V.Vexp, vx: V.JoinIndex) -> Val:
        art = self._join_artifacts(vx.lkeys, vx.rkeys)
        dt = dtype_for(v.info)
        n = art["n"]
        side = vx.jside
        if side in (V.JSEMI, V.JANTI):
            has = art["cnt"] > 0
            lidx = jnp.arange(n, dtype=jnp.int64)
            lmask = lidx < jnp.asarray(art["lvalid"], jnp.int64)
            keep = (has if side == V.JSEMI else ~has) & lmask
            sel = _sel_positions(keep)  # see FSel strategy note
            nz = jnp.sum(keep.astype(jnp.int64))
            return Val(data=_mask_tail(sel.astype(dt), nz, n), valid=nz,
                       length=n)
        B = self.join_sizes.get((vx.lkeys.skey, vx.rkeys.skey))
        if B is None:
            raise RuntimeError(
                "JoinIndex size not resolved; run the counting pre-pass")
        total = art["total"]
        outer = side in (V.JOUTER_LEFT, V.JOUTER_RIGHT, V.JOUTER_VALID)
        k = jnp.arange(B, dtype=jnp.int64)
        if not outer:
            li = _expand_li(art["cum"], k, self.span_fits,
                            ("j_exp", vx.lkeys.skey, vx.rkeys.skey))
            li_c = jnp.clip(li, 0, n - 1)
            base = art["cum"][li_c] - art["cnt"][li_c]
            rpos = art["lo"][li_c] + (k - base)
            if side == V.JLEFT:
                data = jnp.where(k < total, li_c, 0)
            else:
                data = jnp.where(k < total,
                                 art["rs_idx"][jnp.clip(rpos, 0, art["m"] - 1)],
                                 0)
            return Val(data=_mask_tail(data.astype(dt), total, B),
                       valid=total, length=B)
        # outer: matched pairs first, then one row per unmatched left row
        lidx = jnp.arange(n, dtype=jnp.int64)
        lmask = lidx < jnp.asarray(art["lvalid"], jnp.int64)
        unmatched = (art["cnt"] == 0) & lmask
        n_un = jnp.sum(unmatched.astype(jnp.int64))
        total_outer = total + n_un
        un_sel = _sel_positions(unmatched)[:n]
        li = _expand_li(art["cum"], k, self.span_fits,
                        ("j_exp", vx.lkeys.skey, vx.rkeys.skey))
        li_c = jnp.clip(li, 0, n - 1)
        base = art["cum"][li_c] - art["cnt"][li_c]
        rpos = art["lo"][li_c] + (k - base)
        un_k = jnp.clip(k - total, 0, n - 1)
        if side == V.JOUTER_LEFT:
            data = jnp.where(k < total, li_c, un_sel[un_k])
        elif side == V.JOUTER_RIGHT:
            data = jnp.where(k < total,
                             art["rs_idx"][jnp.clip(rpos, 0, art["m"] - 1)],
                             0)
        else:  # JOUTER_VALID
            data = (k < total).astype(jnp.int64)
        data = jnp.where(k < total_outer, data, 0)
        return Val(data=data.astype(dt), valid=total_outer, length=B)

    # ---------------------------------------------------------------- binops
    def _eval_binop(self, v: V.Vexp, vx: V.Binop) -> Val:
        lv = self._force(self.eval(vx.left))
        rv = self._force(self.eval(vx.right))
        L = min(lv.length, rv.length)
        dt = dtype_for(v.info)
        # compute in a width that holds operands and result
        cdt = jnp.promote_types(jnp.promote_types(lv.data.dtype, rv.data.dtype), dt)
        a = lv.data[:L].astype(cdt)
        b = rv.data[:L].astype(cdt)
        op = vx.binop
        valid = _vmin(lv.valid, rv.valid)
        if op == M.ADD:
            out = a + b
        elif op == M.SUB:
            out = a - b
        elif op == M.MUL:
            out = a * b
        elif op == M.DIV:
            out = lax.div(a, jnp.where(b == 0, jnp.ones((), cdt), b))
        elif op == M.MOD:
            out = lax.rem(a, jnp.where(b == 0, jnp.ones((), cdt), b))
        elif op == M.MIN:
            out = jnp.minimum(a, b)
        elif op == M.MAX:
            out = jnp.maximum(a, b)
        elif op == M.GT:
            out = (a > b).astype(dt)
        elif op == M.LT:
            out = (a < b).astype(dt)
        elif op == M.GEQ:
            out = (a >= b).astype(dt)
        elif op == M.LEQ:
            out = (a <= b).astype(dt)
        elif op == M.EQ:
            out = (a == b).astype(dt)
        elif op == M.NEQ:
            out = (a != b).astype(dt)
        elif op == M.LOGAND:
            out = ((a != 0) & (b != 0)).astype(dt)
        elif op == M.LOGOR:
            out = ((a != 0) | (b != 0)).astype(dt)
        elif op == M.BITAND:
            out = a & b
        elif op == M.BITOR:
            out = a | b
        elif op == M.BITSHIFT:
            # sign of rhs encodes direction: negative shifts left
            # (Vlite.hs:205-208)
            out = jnp.where(b < 0,
                            a << jnp.minimum(-b, 63),
                            a >> jnp.minimum(b, 63))
        else:
            raise ValueError(f"unknown binop {op}")
        out = _mask_tail(out.astype(dt), valid, L)
        return Val(data=out, valid=valid, length=L)

    # ------------------------------------------------------- grouped gathers
    def _group_gather(self, v: V.Vexp, vx, src, pos, sorted_mode: bool):
        """Kernel gather that BATCHES every other gather node sharing
        these positions (same source length, same kernel branch/window)
        into one launch (kernels/sorted_gather.gather_many) — Q21's
        profile counted 95 single-column launches repeating the same
        position decode and window DMAs (profiles/prof_r05.log).
        Results cache per member node; ``gather_mates`` carries
        per-member reachability sets so a mate whose source depends on
        the node being evaluated is never pulled in (no recursion)."""
        from .kernels.sorted_gather import (gather_many,
                                            small_table_gather,
                                            sorted_gather)

        cache = getattr(self, "gather_multi", None)
        if cache is None:
            cache = self.gather_multi = {}
        hit = cache.get(v.skey)
        if hit is not None:
            return hit
        fit = self.span_fits.get(v.skey)
        # batching needs a RESOLVED window verdict in sorted mode (the
        # multi kernel has no runtime-cond fallback); unresolved sites
        # keep the single-source path with its lax.cond
        batch_ok = (not sorted_mode) or fit is True or (
            isinstance(fit, int) and not isinstance(fit, bool))
        mates = []
        seen_src = {vx.shsource.skey}
        for g2, reach in (self.gather_mates.get(vx.shpos.skey, ())
                          if batch_ok else ()):
            if (g2.skey == v.skey or g2.skey in cache
                    or v.skey in reach
                    or g2.vx.shsource.skey in seen_src):
                continue
            if sorted_mode and self.span_fits.get(g2.skey, fit) != fit:
                continue
            m2 = self._force(self.eval(g2.vx.shsource))
            if (m2.length != src.length
                    or m2.data.dtype not in (jnp.int32, jnp.int64)):
                continue
            seen_src.add(g2.vx.shsource.skey)
            mates.append((g2, m2))
        if not mates:
            if sorted_mode:
                return sorted_gather(src.data, pos.data, pos.valid,
                                     static_fit=fit)
            return small_table_gather(src.data, pos.data, pos.valid)
        srcs = [src.data] + [m.data for _, m in mates]
        outs = gather_many(srcs, pos.data, pos.valid, static_fit=fit,
                           small=not sorted_mode)
        for (g2, _), o in zip(mates, outs[1:]):
            cache[g2.skey] = o
        return outs[0]

    # ----------------------------------------------------------------- folds
    def _fold_data(self, fd: V.Vexp, n: int) -> jnp.ndarray:
        """A fold payload as a length-n vector (for co-sorting)."""
        dv = self._force(self.eval(fd))
        d = dv.data[:n]
        if d.shape[0] < n:
            d = jnp.concatenate(
                [d, jnp.zeros((n - d.shape[0],), d.dtype)])
        return d

    def _group_artifacts(self, fgroups: V.Vexp, L_out: int,
                         fmask: Optional[V.Vexp] = None) -> dict:
        key = (fgroups.skey, fmask.skey if fmask is not None else None, L_out)
        hit = self.group_cache.get(key)
        if hit is not None:
            return hit
        g = self._force(self.eval(fgroups))
        gmin, gmax = fgroups.info.bounds
        assert gmin >= 0, "group ids must be non-negative"
        domain = gmax + 1
        n = g.length
        idx = jnp.arange(n, dtype=jnp.int64)
        validmask = idx < jnp.asarray(g.valid, jnp.int64)
        if fmask is not None:
            m = self._force(self.eval(fmask))
            validmask = validmask & (m.data[:n] != 0)
        art: dict = {"n": n, "domain": domain, "validmask": validmask}
        if domain <= segred.SMALL_DOMAIN:
            # unrolled masked reductions: XLA multi-output fusion makes the
            # whole group-by one pass over the input (TPU scatter-add
            # serializes on colliding indices, so segment_sum is unusable).
            # Occupancy counts are NOT reduced here: each fold fuses its own
            # (agg, count) pair into one variadic lax.reduce pass — a
            # standalone count reduce would be a second full pass over the
            # input (see segred.masked_group_reduce_with_counts)
            ids = jnp.clip(g.data.astype(jnp.int64), 0, domain - 1)
            ids_ok = jnp.where(validmask, ids, domain)
            art.update(dense=True, ids_ok=ids_ok)
        else:
            # int32 sort keys when the id domain allows (dump slot included)
            kdt = jnp.int32 if (domain < 2**31 - 1 and n < 2**31) \
                else jnp.int64
            # Fold-input compaction (r4): when the counting pre-pass has
            # resolved this (groups, mask) pair's survivor count and the
            # fold is selective (<= n/4 valid rows), compact the rows
            # FIRST and sort only the survivors — Q15's date filter
            # keeps 3.5% of lineitem, so its suppkey group-by sorts 52K
            # rows instead of 1.5M.  ``perm`` then holds ORIGINAL row
            # ids (perm_space = n) while every positional artifact lives
            # in the compacted space of length n_s.
            fkey = (fgroups.skey, fmask.skey if fmask is not None else None)
            fc, mono = self.fold_counts.get(fkey, (None, False))
            n_s = n
            if fc is not None and fc * 4 <= n:
                n_s = min(-(-max(fc, 1) // BLOCK_PAD) * BLOCK_PAD, n)
            # pre-sorted skip (counting pass proved the masked-valid id
            # sequence monotone — TPC-H clustering makes this common for
            # orderkey/partkey group-bys): the sort AND the random
            # permutation gather both disappear; perm stays ASCENDING,
            # so downstream data gathers are monotone
            # payloads of every fold on this (group, mask): co-sorted
            # with the keys when a sort happens at all (splat-constant
            # payloads are skipped — their permutation is a no-op).
            # Capped: each extra lax.sort operand inflates XLA's sort
            # lowering COMPILE time (the r3 bisect wall; Q10's 6-payload
            # sort compiled 304s vs 56s) while saving one ~7ns/el
            # gather — beyond the cap the remaining folds keep the
            # data[perm] gather.
            cap = int(os.environ.get("MPLAN2VDL_COSORT_CAP", "4"))
            mates = self.fold_payloads.get(
                (fgroups.skey, fmask.skey if fmask is not None else None),
                [])
            mates = [fd for fd in mates if not _is_splat(fd)][:cap]
            if n_s < n:
                nvalid = jnp.sum(validmask.astype(jnp.int64))
                sel = _sel_positions(validmask)[:n_s]
                pdt = jnp.int32 if n < 2**31 else jnp.int64
                sel = jnp.clip(sel, 0, n - 1).astype(pdt)
                ids_c = g.data[sel].astype(kdt)
                validmask_s = (jnp.arange(n_s, dtype=jnp.int64) < nvalid)
                ids_ok = jnp.where(validmask_s, ids_c, kdt(domain))
                if mono:
                    sorted_ids, perm = ids_ok, sel
                else:
                    pay = [self._fold_data(fd, n)[sel] for fd in mates]
                    srt = lax.sort(
                        (ids_ok, jnp.arange(n_s, dtype=kdt), *pay),
                        num_keys=1)
                    sorted_ids, perm_c = srt[0], srt[1]
                    art["sorted_data"] = {
                        fd.skey: s for fd, s in zip(mates, srt[2:])}
                    perm = sel[jnp.clip(perm_c, 0, n_s - 1).astype(pdt)]
            else:
                ids = g.data.astype(kdt)
                ids_ok = jnp.where(validmask, ids, kdt(domain))
                if mono and fmask is None:
                    # no mask: validmask is a prefix, so the sentinel
                    # tail keeps ids_ok sorted; perm is the identity.
                    # Record that STATICALLY: data[perm] with an iota is
                    # NOT free — XLA emits a serialized ~7ns/element
                    # gather for it (Q18: three 9.9ms identity gathers,
                    # profiles/summaries_r05.txt) — so _eval_fold skips
                    # the permutation entirely.
                    sorted_ids, perm = ids_ok, idx.astype(kdt)
                    art["perm_identity"] = True
                else:
                    pay = [self._fold_data(fd, n) for fd in mates]
                    srt = lax.sort((ids_ok, idx.astype(kdt), *pay),
                                   num_keys=1)
                    sorted_ids, perm = srt[0], srt[1]
                    art["sorted_data"] = {
                        fd.skey: s for fd, s in zip(mates, srt[2:])}
            sorted_valid = sorted_ids < domain
            prev = jnp.concatenate([sorted_ids[:1] - 1, sorted_ids[:-1]])
            head = sorted_ids != prev
            run_id = scan.cumsum_flags(head) - 1
            run_ok = jnp.where(sorted_valid, run_id, L_out)
            ngroups = jnp.sum((head & sorted_valid).astype(jnp.int64))
            # run-start positions (ascending) and per-run end positions —
            # the scatter-free segmented-reduce machinery: sums become
            # cumsum differences at run ends, choose reads run starts,
            # min/max use a log-sweep segmented prefix.  Under fold-input
            # compaction n_s may be SMALLER than L_out (fewer survivors
            # than the group domain): pad the length-L_out positional
            # artifacts (entries past ngroups are masked downstream).
            starts = _sel_positions(head)[:L_out]
            if starts.shape[0] < L_out:
                starts = jnp.concatenate(
                    [starts, jnp.zeros((L_out - starts.shape[0],),
                                       starts.dtype)])
            next_start = jnp.concatenate(
                [starts[1:], jnp.full((1,), n_s, starts.dtype)])
            kidx = jnp.arange(L_out, dtype=jnp.int64)
            ends = jnp.where(kidx + 1 < ngroups, next_start - 1, 0)
            last_valid = jnp.sum(sorted_valid.astype(jnp.int64)) - 1
            ends = jnp.where(kidx + 1 == ngroups, last_valid, ends)
            run_start_of_row = starts[jnp.clip(run_ok, 0, L_out - 1)]
            art.update(dense=False, n=n_s, perm_space=n, perm=perm,
                       run_ok=run_ok, ngroups=ngroups, starts=starts,
                       ends=ends, sorted_valid=sorted_valid,
                       run_start_of_row=run_start_of_row)
        self.group_cache[key] = art
        return art

    def _eval_fold(self, v: V.Vexp, vx: V.Fold) -> Val:
        hit = getattr(self, "fold_map", None)
        if hit:
            fam = hit.get(v.skey)
            if fam is not None:
                return self._eval_fused(v, fam)
        dt = dtype_for(v.info)
        g = self.eval(vx.fgroups)
        domain = vx.fgroups.info.bounds[1] + 1
        dval = self._force(self.eval(vx.fdata))
        L_out = min(domain, g.length, dval.length)
        if vx.foldop == V.FDISTINCT:
            return self._eval_fold_distinct(v, vx, dt, domain, L_out)
        art = self._group_artifacts(vx.fgroups, L_out, vx.fmask)
        n = art["n"]
        # under fold-input compaction perm holds ORIGINAL row ids over
        # the full input (perm_space), while n is the compacted length
        data = dval.data[:art.get("perm_space", n)].astype(dt)
        opname = {V.FSUM: "sum", V.FMAX: "max", V.FMIN: "min",
                  V.FCHOOSE: "max"}[vx.foldop]
        if art["dense"]:
            domain = art["domain"]
            agg, counts = segred.masked_group_reduce_with_counts(
                data, art["ids_ok"], domain, opname)
            occ = counts > 0
            ngroups = jnp.sum(occ.astype(jnp.int64))
            sel = _sel_positions(occ)[:L_out]
            # min/max over empty segments yield identity sentinels; the
            # occupancy compaction drops those slots
            out = agg[sel]
            out = _mask_tail(out.astype(dt), ngroups, L_out)
            return Val(data=out, valid=ngroups, length=L_out)
        else:
            cosorted = art.get("sorted_data", {}).get(vx.fdata.skey)
            if cosorted is not None:
                permuted = cosorted.astype(dt)
            elif art.get("perm_identity") or _is_splat(vx.fdata):
                permuted = data[:art["n"]]
            else:
                permuted = data[art["perm"]]
            sorted_data = _mask_tail(permuted,
                                     jnp.sum(art["sorted_valid"]
                                             .astype(jnp.int64)), n)
            kidx = jnp.arange(L_out, dtype=jnp.int64)
            kmask = kidx < art["ngroups"]
            if vx.foldop == V.FSUM:
                # cumsum strategy (measured end-to-end, r4): the manual
                # log-sweep replaces XLA's reduce-window — Q15 (2501
                # groups) 52.6 -> 33.1ms; but on huge-domain folds the
                # sweep's materialized add chain regresses (Q18, domain
                # ~n: 51.7 -> 58.4ms), so it gates on the output domain.
                # Isolated rates: tools/probe_cumsum.py.
                cs64 = sorted_data.astype(jnp.int64)
                cs = (scan._logsweep(cs64) if L_out <= 65536
                      else jnp.cumsum(cs64))
                at_end = cs[jnp.clip(art["ends"], 0, n - 1)]
                start_idx = jnp.clip(art["starts"], 0, n - 1)
                before = jnp.where(start_idx > 0,
                                   cs[jnp.clip(start_idx - 1, 0, n - 1)], 0)
                out = jnp.where(kmask, at_end - before, 0)
            elif vx.foldop == V.FCHOOSE:
                out = jnp.where(
                    kmask, sorted_data[jnp.clip(art["starts"], 0, n - 1)], 0)
            else:  # FMIN / FMAX: segmented prefix via log-sweep
                combine = jnp.minimum if vx.foldop == V.FMIN else jnp.maximum
                pm = sorted_data.astype(jnp.int64)
                pos = jnp.arange(n, dtype=jnp.int64)
                rs = art["run_start_of_row"]
                shift = 1
                while shift < n:
                    prev_vals = jnp.concatenate(
                        [jnp.zeros((shift,), pm.dtype), pm[:-shift]])
                    ok = pos - shift >= rs
                    pm = jnp.where(ok, combine(pm, prev_vals), pm)
                    shift *= 2
                out = jnp.where(kmask, pm[jnp.clip(art["ends"], 0, n - 1)], 0)
        ngroups = art["ngroups"]
        out = _mask_tail(out.astype(dt), ngroups, L_out)
        return Val(data=out, valid=ngroups, length=L_out)

    def _eval_fold_distinct(self, v: V.Vexp, vx: V.Fold, dt, domain: int,
                            L_out: int) -> Val:
        """count(distinct x) per group: sort (group id, value) pairs, then
        count adjacent-unique pairs per group (the sort+adjacent-unique
        strategy; a capability extension over the reference, which has no
        distinct aggregate — src/notes.txt:60-63).

        Output slots align with the other folds on the same group key:
        ascending occupied group ids."""
        gv = self._force(self.eval(vx.fgroups))
        dv = self._force(self.eval(vx.fdata))
        n = min(gv.length, dv.length)
        idx = jnp.arange(n, dtype=jnp.int64)
        validmask = idx < _vmin(gv.valid, dv.valid)
        if vx.fmask is not None:
            m = self._force(self.eval(vx.fmask))
            validmask = validmask & (m.data[:n] != 0)
        # int32 sort keys when bounds allow (halves sort traffic)
        dlo, dhi = vx.fdata.info.bounds
        use32 = (domain < 2**31 - 1 and dlo > -(2**31) + 1
                 and dhi < 2**31 - 1)
        kdt = jnp.int32 if use32 else jnp.int64
        ids = jnp.clip(gv.data[:n].astype(kdt), 0, domain - 1)
        ids_ok = jnp.where(validmask, ids, kdt(domain))
        vals = jnp.where(validmask, dv.data[:n].astype(kdt), kdt(0))
        sid, sval = lax.sort((ids_ok, vals), num_keys=2)
        svalid = sid < domain
        prev_id = jnp.concatenate([sid[:1] - 1, sid[:-1]])
        prev_val = jnp.concatenate([sval[:1] - 1, sval[:-1]])
        new_pair = ((sid != prev_id) | (sval != prev_val)) & svalid
        if domain <= segred.SMALL_DOMAIN:
            agg, counts = segred.masked_group_reduce_with_counts(
                new_pair.astype(jnp.int64), jnp.where(svalid, sid,
                                                      kdt(domain)),
                domain, "sum")
            occ = counts > 0
            ngroups = jnp.sum(occ.astype(jnp.int64))
            sel = _sel_positions(occ)[:L_out]
            out = agg[sel]
        else:
            # run-segmented over the already-sorted stream: group run
            # heads -> cumsum of new-pair flags at run boundaries
            head = (sid != prev_id) & svalid
            ngroups = jnp.sum(head.astype(jnp.int64))
            starts = _sel_positions(head)[:L_out]
            next_start = jnp.concatenate(
                [starts[1:], jnp.full((1,), n, starts.dtype)])
            kidx = jnp.arange(L_out, dtype=jnp.int64)
            ends = jnp.where(kidx + 1 < ngroups, next_start - 1, 0)
            last_valid = jnp.sum(svalid.astype(jnp.int64)) - 1
            ends = jnp.where(kidx + 1 == ngroups, last_valid, ends)
            cs = scan.cumsum_flags(new_pair)
            at_end = cs[jnp.clip(ends, 0, n - 1)]
            start_idx = jnp.clip(starts.astype(jnp.int64), 0, n - 1)
            before = jnp.where(start_idx > 0,
                               cs[jnp.clip(start_idx - 1, 0, n - 1)], 0)
            kmask = kidx < ngroups
            out = jnp.where(kmask, at_end - before, 0)
        out = _mask_tail(out.astype(dt), ngroups, L_out)
        return Val(data=out, valid=ngroups, length=L_out)

    # ----------------------------------------------------------- fused aggs
    def _eval_fused(self, v: V.Vexp, key: tuple) -> Val:
        """One fold of a fused multi-aggregate family: the whole family
        computes in ONE kernel pass over the scan (engine/fuse.py,
        kernels/multiagg.py) and is cached; each fold slices its column
        and compacts to occupied groups exactly like the dense path."""
        from .kernels.multiagg import AggSpec, BLOCK, fused_group_aggregate

        fam_idx, agg_idx = key
        fam = self.families[fam_idx]
        cache = getattr(self, "fused_cache", None)
        if cache is None:
            cache = self.fused_cache = {}
        hit = cache.get(fam_idx)
        if hit is None:
            g = self._force(self.eval(fam.fgroups))
            n = g.length
            idx = jnp.arange(n, dtype=jnp.int64)
            valid = idx < jnp.asarray(g.valid, jnp.int64)
            if fam.fmask is not None:
                m = self._force(self.eval(fam.fmask))
                valid = valid & (m.data[:n] != 0)
            gid = jnp.where(valid, g.data[:n].astype(jnp.int32),
                            jnp.int32(-1))
            cols = []
            for nm in fam.load_names:
                arr = self.tables[nm]
                assert len(arr) == n, (nm, len(arr), n)
                cols.append(arr.astype(jnp.int32))
            # no pad: the kernel's no-pad 1-D block path masks the tail
            # (the pad concatenates were the fused program's top-traffic
            # instructions — 5 full column copies, ~4GB at Q1 SF10)
            specs = list(fam.specs) + [AggSpec(base=None, bits=1)]
            interp = jax.default_backend() != "tpu"
            from .kernels.multiagg_mxu import (fused_group_aggregate_mxu,
                                               mxu_agg_on)

            if mxu_agg_on():
                # MXU-contracted sums (kernels/multiagg_mxu.py); FChoose
                # "max" members (group-key representatives, one narrow
                # column each) keep the VPU kernel
                s_idx = [i for i, s in enumerate(specs) if s.op == "sum"]
                m_idx = [i for i, s in enumerate(specs) if s.op == "max"]
                out_s = fused_group_aggregate_mxu(
                    cols, gid, [specs[i] for i in s_idx], fam.domain,
                    interpret=interp)
                parts = {i: out_s[:, j] for j, i in enumerate(s_idx)}
                if m_idx:
                    out_m = fused_group_aggregate(
                        cols, gid, [specs[i] for i in m_idx], fam.domain,
                        interpret=interp)
                    parts.update(
                        {i: out_m[:, j] for j, i in enumerate(m_idx)})
                out = jnp.stack([parts[i] for i in range(len(specs))],
                                axis=1)
            else:
                out = fused_group_aggregate(cols, gid, specs, fam.domain,
                                            interpret=interp)
            counts = out[:, -1]
            occ = counts > 0
            ngroups = jnp.sum(occ.astype(jnp.int64))
            hit = {"out": out, "occ": occ, "ngroups": ngroups}
            cache[fam_idx] = hit
        dt = dtype_for(v.info)
        L_out = min(fam.domain, v.info.count)
        sel = _sel_positions(hit["occ"])[:L_out]
        vals = hit["out"][sel, agg_idx]
        data = _mask_tail(vals.astype(dt), hit["ngroups"], L_out)
        return Val(data=data, valid=hit["ngroups"], length=L_out)

    # ------------------------------------------------------------- partitions
    def _eval_partition(self, v: V.Vexp, vx: V.Partition) -> Val:
        dval = self._force(self.eval(vx.pdata))
        dt = dtype_for(v.info)
        piv = vx.pivots.vx
        if isinstance(piv, V.RangeC) and piv.rstep == 1:
            out = jnp.clip(dval.data.astype(jnp.int64) - piv.rmin, 0,
                           piv.rcount - 1)
        else:
            pv = self._force(self.eval(vx.pivots))
            key_hi = int(max(abs(vx.pivots.info.bounds[0]),
                             abs(vx.pivots.info.bounds[1]),
                             abs(vx.pdata.info.bounds[0]),
                             abs(vx.pdata.info.bounds[1]))) + 1
            out = mergesearch.searchsorted_fast(pv.data, dval.data, "left",
                                                key_hi=key_hi)
        out = _mask_tail(out.astype(dt), dval.valid, dval.length)
        return Val(data=out, valid=dval.valid, length=dval.length)

    # ------------------------------------------------------------------- like
    def _eval_like(self, v: V.Vexp, vx: V.Like) -> Val:
        dval = self._force(self.eval(vx.ldata))
        dec = self.store.decoders.get(vx.lcol)
        if dec is None:
            raise KeyError(
                f"no string dictionary for column {name_str(vx.lcol)}")
        rx = like_to_regex(vx.lpattern)
        codes = sorted(code for code, s in dec.items() if rx.match(s))
        dt = dtype_for(v.info)
        if not codes:
            out = jnp.zeros((dval.length,), dt)
            return Val(data=out, valid=dval.valid, length=dval.length)
        if len(codes) <= 128:
            # dictionaries are small: a fused OR-chain of equality tests is
            # one vectorized pass (the searchsorted membership probe
            # serializes ~7ns/element/step on TPU)
            found = jnp.zeros(dval.data.shape, jnp.bool_)
            for c in codes:
                found = found | (dval.data == int(c))
        else:
            carr = jnp.asarray(np.asarray(codes, dtype=np.int64))
            key_hi = int(max(abs(codes[0]), abs(codes[-1]),
                             abs(vx.ldata.info.bounds[0]),
                             abs(vx.ldata.info.bounds[1]))) + 1
            pos = mergesearch.searchsorted_fast(
                carr, dval.data.astype(jnp.int64), "left", key_hi=key_hi)
            found = carr[jnp.clip(pos, 0, len(codes) - 1)] == dval.data
        out = _mask_tail(found.astype(dt), dval.valid, dval.length)
        return Val(data=out, valid=dval.valid, length=dval.length)


# ------------------------------------------------------------------ query API
@dataclass
class QueryResult:
    names: List[Optional[Name]]
    dtypes: List[object]
    columns: List[np.ndarray]  # raw encoded values, trimmed to valid length

    def decoded(self, store: ColumnStore) -> List[Tuple[str, np.ndarray]]:
        """Decode raw ints per display type (the resolve.py step)."""
        out = []
        for nm, dt, col in zip(self.names, self.dtypes, self.columns):
            label = name_str(nm) if nm else "val"
            if isinstance(dt, DDecimal) and dt.point > 0:
                out.append((label, col / (10 ** dt.point)))
            elif isinstance(dt, DString):
                dec = store.decoders.get(dt.decoder, {})
                out.append((label,
                            np.array([dec.get(int(c), str(c)) for c in col])))
            elif isinstance(dt, DDate):
                import datetime

                out.append((label, np.array(
                    [datetime.date.fromordinal(int(c) - 365).isoformat()
                     for c in col])))
            else:
                out.append((label, col))
        return out


def dynamic_nodes(roots: List[V.Vexp]):
    """Data-dependent-cardinality nodes (selection compactions and
    join expansions) under ``roots`` in dependency (post-)order.  A join
    key-pair appears once, except that outer variants re-appear so the
    resolver can widen the size to include unmatched rows."""
    seen_nodes = set()
    out = []
    join_keys = set()

    def go(v: V.Vexp):
        if v.skey in seen_nodes:
            return
        seen_nodes.add(v.skey)
        for c in _children(v.vx):
            go(c)
        if isinstance(v.vx, V.Fold) and v.vx.foldop == V.FSEL:
            out.append(("fsel", v))
        if (isinstance(v.vx, V.Fold)
                and v.vx.foldop in (V.FSUM, V.FMAX, V.FMIN, V.FCHOOSE)
                and v.vx.fgroups.info.bounds[1] + 1 > segred.SMALL_DOMAIN):
            # sparse-path folds: the valid-row count gates fold-input
            # compaction (sort survivors, not the static length)
            out.append(("fold", v))
        if isinstance(v.vx, V.JoinIndex) and v.vx.jside not in (
                V.JSEMI, V.JANTI):
            key = (v.vx.lkeys.skey, v.vx.rkeys.skey)
            outer = v.vx.jside in (V.JOUTER_LEFT, V.JOUTER_RIGHT,
                                   V.JOUTER_VALID)
            if key not in join_keys:
                join_keys.add(key)
                out.append(("join", v))
            elif outer:
                out.append(("join", v))  # re-resolve with outer count

    for v in roots:
        go(v)
    return out


def _is_splat(v: V.Vexp) -> bool:
    """Every element equal (broadcast constant): permutation is a no-op."""
    return isinstance(v.vx, (V.RangeV, V.RangeC)) and v.vx.rstep == 0


def gather_mate_map(roots: List[V.Vexp]) -> dict:
    """pos.skey -> [(gather node, reachable-member-skeys)] for every
    GATHER under roots, grouped by shared position vector.  The
    reachability set (which OTHER members of the same group appear in
    this member's source subtree) lets the batched evaluation skip
    mates that would recurse into the node being evaluated."""
    seen, groups = set(), {}

    def go(x: V.Vexp):
        if x.skey in seen:
            return
        seen.add(x.skey)
        for c in _children(x.vx):
            go(c)
        if isinstance(x.vx, V.Shuffle) and x.vx.shop == V.GATHER:
            groups.setdefault(x.vx.shpos.skey, []).append(x)

    for x in roots:
        go(x)
    out = {}
    for pk, nodes in groups.items():
        if len(nodes) < 2:
            continue
        member_keys = {n.skey for n in nodes}
        entries = []
        for n in nodes:
            reach, stack, vis = set(), [n.vx.shsource], set()
            while stack:
                y = stack.pop()
                if y.skey in vis:
                    continue
                vis.add(y.skey)
                if y.skey in member_keys:
                    reach.add(y.skey)
                stack.extend(_children(y.vx))
            entries.append((n, frozenset(reach)))
        out[pk] = tuple(entries)
    return out


def fold_payload_map(roots: List[V.Vexp]) -> dict:
    """(fgroups.skey, fmask.skey|None) -> [fdata Vexps] for every
    aggregating Fold, first occurrence order (FSEL groups positions and
    FDISTINCT sorts (group, value) itself — excluded)."""
    seen, out = set(), {}

    def go(v: V.Vexp):
        if v.skey in seen:
            return
        seen.add(v.skey)
        for c in _children(v.vx):
            go(c)
        vx = v.vx
        if (isinstance(vx, V.Fold)
                and vx.foldop in (V.FSUM, V.FMAX, V.FMIN, V.FCHOOSE)):
            key = (vx.fgroups.skey,
                   vx.fmask.skey if vx.fmask is not None else None)
            lst = out.setdefault(key, [])
            if all(fd.skey != vx.fdata.skey for fd in lst):
                lst.append(vx.fdata)

    for v in roots:
        go(v)
    return out


def gather_nodes(roots: List[V.Vexp]):
    """Shuffle-GATHER nodes under ``roots`` in dependency post-order —
    deterministic for a given plan across processes (skeys are not), so
    span-fit verdicts persist position-aligned over this walk, exactly
    like sizes_record over dynamic_nodes()."""
    seen, out = set(), []

    def go(v: V.Vexp):
        if v.skey in seen:
            return
        seen.add(v.skey)
        for c in _children(v.vx):
            go(c)
        if isinstance(v.vx, V.Shuffle) and v.vx.shop == V.GATHER:
            out.append(v)

    for v in roots:
        go(v)
    return out


def join_key_pairs(roots: List[V.Vexp]):
    """(lkeys, rkeys) Vexp pairs of every JoinIndex under ``roots``,
    first occurrence in dependency post-order — deterministic like
    gather_nodes.  Includes SEMI/ANTI joins: their sort-merge artifacts
    carry internal streaming-gather sites whose span-fit verdicts
    persist aligned over this walk."""
    seen, seenp, out = set(), set(), []

    def go(v: V.Vexp):
        if v.skey in seen:
            return
        seen.add(v.skey)
        for c in _children(v.vx):
            go(c)
        if isinstance(v.vx, V.JoinIndex):
            kp = (v.vx.lkeys.skey, v.vx.rkeys.skey)
            if kp not in seenp:
                seenp.add(kp)
                out.append((v.vx.lkeys, v.vx.rkeys))

    for v in roots:
        go(v)
    return out


def _sample_fp(arrs) -> tuple:
    """Sampled content fingerprint of a tuple of 1-D arrays: first, middle,
    and last element of each.  Cheap (three element fetches per column,
    even for device-resident arrays) and enough to catch "same shapes,
    different dataset" misuse of a CompiledQuery whose span-fit verdicts
    were baked against the construction-time store."""
    out = []
    for a in arrs:
        n = int(a.shape[0]) if getattr(a, "ndim", 0) else 0
        idx = (0, n // 2, n - 1) if n else ()
        out.append(tuple(int(np.asarray(a[i])) for i in idx))
    return tuple(out)


class CompiledQuery:
    """One query compiled against one store: a single jitted XLA program.

    When the DAG contains data-dependent-cardinality joins (JoinIndex
    inner/outer sides), compilation is two-phase: small jitted counting
    programs resolve each join's exact output size against the live data,
    then the main program is traced with those sizes as static shapes."""

    def __init__(self, cfg: Config, vexps: List[V.Vexp], store: ColumnStore,
                 preset_sizes: Optional[list] = None):
        self.cfg = cfg
        self.vexps = vexps
        self.store = store
        self.loads = sorted({vx.name for vx in _all_loads(vexps)})
        self.join_sizes: Dict[tuple, int] = {}
        self.fsel_sizes: Dict[int, int] = {}
        self.fold_counts: Dict[tuple, int] = {}
        self.span_fits: Dict[int, bool] = {}
        self._args = None
        if preset_sizes is None or not self._apply_preset(preset_sizes):
            self._resolve_dynamic_sizes()
        # families of same-(group,mask) dense folds can fuse into one
        # Pallas kernel pass (engine/fuse.py + kernels/multiagg.py).
        # Scale-gated default (r3, measured on v5e): at small scale both
        # paths are VPU-bound and XLA's masked int64 reduces win slightly
        # (Q1 SF1: 1.51ms XLA vs 1.84ms fused), but at large scale the
        # XLA path turns MEMORY-bound on its materialized intermediates
        # (Q1 SF10: 22.5GB charged, 30.6ms at 0.90 of HBM bw) and the
        # one-pass kernel wins 1.46x (21.0ms).  Auto: fuse when any
        # input column is >= 24M rows (between the measured 6M loss and
        # 60M win); MPLAN2VDL_FUSED_AGG=1/0 forces either way.
        self.fold_map, self.families = {}, []
        fused = os.environ.get("MPLAN2VDL_FUSED_AGG", "")
        if fused == "" or fused == "auto":
            use_fused = any(len(store.columns[n]) >= 24_000_000
                            for n in self.loads)
        else:
            use_fused = fused != "0"
        if use_fused:
            from .fuse import plan_fusions

            self.fold_map, self.families = plan_fusions(vexps)
        self._jitted = jax.jit(self._run)

    # ----------------------------------------------------- two-phase sizing
    def _dynamic_nodes(self):
        return dynamic_nodes(self.vexps)

    def sizes_record(self) -> list:
        """The resolved dynamic sizes as a position-aligned list over
        dynamic_nodes() order — a persistable artifact: sizes are match/
        survivor COUNTS, pure functions of (plan, data), so a cache hit
        skips the per-(query, dataset) counting pre-passes entirely
        (their eager op-by-op device dispatch costs minutes through the
        tunnel)."""
        rec = []
        for kind, v in self._dynamic_nodes():
            if kind == "fsel":
                rec.append(["fsel", self.fsel_sizes[v.skey]])
            elif kind == "fold":
                vx = v.vx
                fkey = (vx.fgroups.skey,
                        vx.fmask.skey if vx.fmask is not None else None)
                fc = self.fold_counts.get(fkey)
                rec.append(["fold", None, 0] if fc is None
                           else ["fold", fc[0], int(fc[1])])
            else:
                vx = v.vx
                rec.append(["join", self.join_sizes[(vx.lkeys.skey,
                                                     vx.rkeys.skey)]])
        gs = gather_nodes(self.vexps)

        def _enc_fit(f):
            # 0 = XLA fallback; 1 = kernel at the default window (legacy
            # True); other ints = kernel at that window size
            return None if f is None else int(f)

        if gs:
            # span-fit verdicts ride the same record (same contract:
            # pure functions of (plan, data)); position-aligned over the
            # gather_nodes walk, None where unresolved
            rec.append(["spanfit",
                        [_enc_fit(self.span_fits[g.skey])
                         if g.skey in self.span_fits else None
                         for g in gs]])
        jps = join_key_pairs(self.vexps)
        if jps:
            def enc(key):
                return _enc_fit(self.span_fits.get(key))

            # join-internal sites (merged-order rs_idx gather + pair
            # expansion + dense-domain fit), aligned over the
            # join_key_pairs walk
            rec.append(["jfit",
                        [[enc(("j_rsidx", l.skey, r.skey)),
                          enc(("j_exp", l.skey, r.skey)),
                          enc(("dense_fit", l.skey, r.skey))]
                         for l, r in jps]])
        return rec

    def _apply_preset(self, rec: list) -> bool:
        """Adopt a sizes_record() if its kind sequence matches this DAG's
        dynamic-node order (an engine change that reshapes the plan makes
        it mismatch -> falls back to live counting)."""
        spans, jfits = None, None
        while rec and rec[-1][0] in ("spanfit", "jfit"):
            if rec[-1][0] == "spanfit":
                spans = rec[-1][1]
            else:
                jfits = rec[-1][1]
            rec = rec[:-1]
        dyn = self._dynamic_nodes()
        if len(rec) != len(dyn) or any(
                r[0] != kind for r, (kind, _) in zip(rec, dyn)):
            return False
        def _dec_fit(s):
            # 0 -> False (XLA), 1 -> True (kernel, default window,
            # legacy records), else the per-site window size
            return bool(s) if s in (0, 1) else int(s)

        if spans is not None:
            gs = gather_nodes(self.vexps)
            if len(spans) == len(gs):  # else: stale record — cond fallback
                for s, g in zip(spans, gs):
                    if s is not None:
                        self.span_fits[g.skey] = _dec_fit(s)
        if jfits is not None:
            jps = join_key_pairs(self.vexps)
            if len(jfits) == len(jps):
                for ent, (l, r) in zip(jfits, jps):
                    fr, fe = ent[0], ent[1]
                    if fr is not None:
                        self.span_fits[("j_rsidx", l.skey, r.skey)] = \
                            _dec_fit(fr)
                    if fe is not None:
                        self.span_fits[("j_exp", l.skey, r.skey)] = \
                            _dec_fit(fe)
                    # dense-domain fit verdict: element [2] in current
                    # records; r4-era 4-element records carried a dead
                    # never-written dense_j at [2] with the fit at [3];
                    # 2-element records predate the dense path entirely
                    # (sort-merge, still correct)
                    df = (ent[3] if len(ent) >= 4
                          else ent[2] if len(ent) == 3 else None)
                    if df is not None:
                        self.span_fits[("dense_fit", l.skey,
                                        r.skey)] = _dec_fit(df)
        for r, (kind, v) in zip(rec, dyn):
            if kind == "fsel":
                self.fsel_sizes[v.skey] = int(r[1])
            elif kind == "fold":
                if r[1] is not None:
                    vx = v.vx
                    fkey = (vx.fgroups.skey,
                            vx.fmask.skey if vx.fmask is not None else None)
                    self.fold_counts[fkey] = (
                        int(r[1]), bool(r[2]) if len(r) > 2 else False)
            else:
                vx = v.vx
                self.join_sizes[(vx.lkeys.skey, vx.rkeys.skey)] = int(r[1])
        return True

    def _resolve_dynamic_sizes(self):
        """Counting pre-passes: resolve each selection's survivor count and
        each join's match count against the live data, so the main program
        compiles with real cardinalities instead of static bounds
        (SURVEY.md §7.3 risk 1 — two-phase execution with exact shapes)."""
        dyn = self._dynamic_nodes()
        gs = gather_nodes(self.vexps) if _sorted_gather_on() else []
        if not dyn and not gs:
            return
        # The counting programs run eagerly (op-by-op): once per (query,
        # dataset); per-op dispatch also sidesteps a rare XLA:CPU
        # fused-program stall observed under the test harness.
        # On a TUNNELED TPU, per-op dispatch pays a round trip per op —
        # measured 236s (Q9 SF1) to 829s (Q3 SF0.5) of counting.  Counts,
        # sizes and span fits are integer-exact pure functions of
        # (plan, data), so by default the pass runs on the HOST CPU
        # backend against the store's own arrays instead (seconds, and
        # the multi-GB device transfer is deferred to the first real
        # run).  MPLAN2VDL_HOST_COUNTING=0 restores device counting.
        import contextlib

        host = (os.environ.get("MPLAN2VDL_HOST_COUNTING", "1")
                not in ("", "0")) and jax.default_backend() != "cpu"
        ctx = contextlib.nullcontext()
        if host:
            try:
                ctx = jax.default_device(
                    jax.local_devices(backend="cpu")[0])
            except Exception:
                host = False
        with ctx:
            args = (tuple(jnp.asarray(self.store.columns[n])
                          for n in self.loads)
                    if host else self.device_args())
            self._counting_pass(dyn, gs, args)

    def _counting_pass(self, dyn, gs, args):
        with jax.disable_jit():
            c = Compiler(self.cfg, self.store, self.join_sizes,
                         self.fsel_sizes, self.span_fits, self.fold_counts)
            c.memo, c.group_cache, c.join_cache = {}, {}, {}
            c.tables = dict(zip(self.loads, args))
            for kind, v in dyn:
                if kind == "fold":
                    # resolve the masked fold's survivor count for
                    # fold-input compaction; pop any count already
                    # adopted so the eager eval below does not depend
                    # on its own result
                    vx = v.vx
                    fkey = (vx.fgroups.skey,
                            vx.fmask.skey if vx.fmask is not None else None)
                    if fkey in self.fold_counts:
                        continue
                    gv = c._force(c.eval(vx.fgroups))
                    nn = gv.length
                    vm = (jnp.arange(nn, dtype=jnp.int64)
                          < jnp.asarray(gv.valid, jnp.int64))
                    if vx.fmask is not None:
                        mv = c._force(c.eval(vx.fmask))
                        vm = vm & (mv.data[:nn] != 0)
                    cnt = max(
                        int(np.asarray(jnp.sum(vm.astype(jnp.int64)))), 1)
                    # pre-sorted detection: TPC-H tables are clustered
                    # by their leading key (l_orderkey, o_orderkey,
                    # ps_partkey), so group ids often arrive already
                    # sorted — the main trace can then skip BOTH the
                    # group sort and the random permutation gather
                    ga = np.asarray(gv.data[:nn])
                    va = np.asarray(vm)
                    sel_ids = ga[va]
                    mono = bool(sel_ids.size == 0
                                or np.all(np.diff(sel_ids) >= 0))
                    self.fold_counts[fkey] = (cnt, mono)
                    continue
                if kind == "fsel":
                    val = c.eval(v)
                    nz = int(np.asarray(val.valid))
                    self.fsel_sizes[v.skey] = max(nz, 1)
                    # re-evaluate at the resolved size so downstream
                    # counting sees the small buffers
                    c.memo.pop(v.skey, None)
                    c.fsel_sizes = self.fsel_sizes
                    c.memo[v.skey] = c._eval(v)
                else:
                    vx = v.vx
                    art = c._join_artifacts(vx.lkeys, vx.rkeys)
                    total = art["total"]
                    if vx.jside in (V.JOUTER_LEFT, V.JOUTER_RIGHT,
                                    V.JOUTER_VALID):
                        lidx = jnp.arange(art["n"], dtype=jnp.int64)
                        lmask = lidx < jnp.asarray(art["lvalid"], jnp.int64)
                        total = total + jnp.sum(
                            ((art["cnt"] == 0) & lmask).astype(jnp.int64))
                    self.join_sizes[(vx.lkeys.skey, vx.rkeys.skey)] = \
                        max(int(total), 1)
            # evaluate every gather site once (largely memo-shared with
            # the counting work above) so the streaming-kernel span-fit
            # verdicts are resolved and baked — removing the runtime
            # lax.cond from the main program
            for g in gs:
                try:
                    c.eval(g)
                except Exception as e:
                    # The main trace will surface any real error, but a
                    # host-CPU-only failure here silently leaves span
                    # verdicts unresolved (query stays on the slow
                    # runtime-cond path) — keep it visible.
                    logging.getLogger(__name__).debug(
                        "eager gather-site eval failed (span verdict "
                        "unresolved, runtime-cond fallback): %s: %s",
                        type(e).__name__, e)

    def _run(self, table_arrays: Tuple[jnp.ndarray, ...]):
        tables = dict(zip(self.loads, table_arrays))
        c = Compiler(self.cfg, self.store, self.join_sizes, self.fsel_sizes,
                     self.span_fits, self.fold_counts)
        c.fold_map, c.families = self.fold_map, self.families
        c.fold_payloads = fold_payload_map(self.vexps)
        c.gather_mates = gather_mate_map(self.vexps)
        sibs: Dict[int, list] = {}
        for lk_, rk_ in join_key_pairs(self.vexps):
            sibs.setdefault(lk_.skey, []).append((lk_, rk_))
        c.dense_sibs = {k: tuple(ps) for k, ps in sibs.items()
                        if len(ps) > 1}
        vals = c.trace(self.vexps, tables)
        return tuple((v.data, jnp.asarray(v.valid, jnp.int64)) for v in vals)

    def device_args(self):
        if self._args is None:
            self._args = tuple(chunked_device_put(self.store.columns[n])
                               for n in self.loads)
        return self._args

    def __call__(self, args=None) -> QueryResult:
        if args is None:
            args = self.device_args()
        elif self._args is not None and args is not self._args:
            # join_sizes/fsel_sizes AND streaming-gather span-fit verdicts
            # were resolved against the construction-time store; different
            # table contents could overflow an FSel's resolved buffer
            # (truncation) or run the streaming-gather kernel on positions
            # whose spans were never validated (wrong values).  Shapes must
            # match, and a sampled content fingerprint must too — a cheap
            # best-effort guard; the contract is same-store reuse only.
            ours = self._args
            if (len(args) != len(ours)
                    or any(a.shape != b.shape for a, b in zip(args, ours))):
                raise ValueError(
                    "CompiledQuery called with arrays of different shapes "
                    "than the store it was compiled against; rebuild with "
                    "compile_plan_text on the new store")
            if ((self.span_fits or self.fold_counts)
                    and _sample_fp(args) != _sample_fp(ours)):
                raise ValueError(
                    "CompiledQuery called with arrays whose contents differ "
                    "from the store it was compiled against; gather span-fit "
                    "and fold sortedness/count verdicts are baked per-store "
                    "— rebuild with compile_plan_text on the new store")
        outs = self._jitted(args)
        cols, names, dts = [], [], []
        for v, (data, valid) in zip(self.vexps, outs):
            n = int(valid)
            cols.append(np.asarray(data)[:n])
            names.append(v.name)
            dts.append(v.info.dtype)
        return QueryResult(names=names, dtypes=dts, columns=cols)

    def cost_report(self, hbm_gbps: Optional[float] = None,
                    per_op: bool = False) -> dict:
        """HBM-roofline accounting for the compiled program (the SURVEY §5
        observability requirement: per-query traffic/flops budgeting).

        ``scan_bytes`` is the theoretical minimum (one read of every input
        column); XLA's ``bytes_accessed`` over it is the traffic
        amplification the plan actually incurs (gathers, sorts, multiple
        passes).  With a device bandwidth, reports the roofline floor —
        the time the query CANNOT beat on this chip."""
        args = self.device_args()
        compiled = self._jitted.lower(args).compile()
        ca = compiled.cost_analysis() or {}
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        scan = sum(np.asarray(a).nbytes for a in args)
        out = {
            "scan_bytes": scan,
            "xla_bytes_accessed": ca.get("bytes accessed"),
            "flops": ca.get("flops"),
            "amplification": (ca["bytes accessed"] / scan
                              if ca.get("bytes accessed") and scan else None),
        }
        if hbm_gbps:
            out["roofline_floor_s"] = scan / (hbm_gbps * 1e9)
            if ca.get("bytes accessed"):
                out["xla_traffic_time_s"] = \
                    ca["bytes accessed"] / (hbm_gbps * 1e9)
        if per_op:
            from .hloprof import traffic_report

            out["per_op"] = traffic_report(compiled.as_text())
        return out


def _all_loads(vexps: List[V.Vexp]):
    seen = set()
    out = []

    def go(v: V.Vexp):
        if v.skey in seen:
            return
        seen.add(v.skey)
        if isinstance(v.vx, V.Load):
            out.append(v.vx)
        for c in _children(v.vx):
            go(c)
        if v.lineage is not None:
            go(v.lineage.mask)

    for v in vexps:
        go(v)
    return out


def _children(vx: V.Vx) -> List[V.Vexp]:
    if isinstance(vx, (V.Load, V.RangeC)):
        return []
    if isinstance(vx, V.RangeV):
        return [vx.rref]
    if isinstance(vx, V.Binop):
        return [vx.left, vx.right]
    if isinstance(vx, V.Shuffle):
        out = [vx.shsource, vx.shpos]
        if vx.shshape is not None:
            out.append(vx.shshape)
        return out
    if isinstance(vx, V.Fold):
        out = [vx.fgroups, vx.fdata]
        if vx.fmask is not None:
            out.append(vx.fmask)
        return out
    if isinstance(vx, V.Semisort):
        return [vx.sdata]
    if isinstance(vx, V.SortPerm):
        return list(vx.keys)
    if isinstance(vx, V.Partition):
        return [vx.pivots, vx.pdata]
    if isinstance(vx, V.Like):
        return [vx.ldata]
    if isinstance(vx, V.DictMap):
        return [vx.ldata]
    if isinstance(vx, V.VShuffle):
        return [vx.varg]
    if isinstance(vx, V.CrossProduct):
        return [vx.left, vx.right]
    if isinstance(vx, V.JoinIndex):
        return [vx.lkeys, vx.rkeys]
    raise TypeError(vx)


def plan_to_vexps(text: str, cfg: Config, cleanup: bool = True,
                  push_joins: bool = False) -> List[V.Vexp]:
    """mplan text -> engine vector IR (frontend half of ``compile``,
    MainFuns.hs:172-186), shared by the single-chip and distributed
    execution paths.

    ``push_joins`` mirrors the reference's optional ``-p`` rewrite
    (MainFuns.hs default False).  It hoists selects above FK joins — which
    the lineage-based join classification does not need, and which forces
    join gathers to run at pre-filter width — so the engine defaults to
    filter-early plans."""
    from ..fe import lexer, plan_parser
    from .. import mplan, passes, vir

    rel = plan_parser.parse(lexer.strip_plan_comments(text))
    m = mplan.mplan_from_parse_tree(rel, cfg)
    if push_joins:
        m = mplan.fuse_selects(mplan.push_fk_joins(m))
    vexps = vir.vexps_from_mplan(m, cfg)
    if cleanup:
        vexps = passes.engine_passes(vexps)
    return vexps


def _store_fingerprint(store: ColumnStore) -> str:
    """Cheap content identity for the sizes cache: per-column shape +
    sampled values (16 evenly spaced).  Collisions would need two stores
    with identical samples everywhere — none of our generators can."""
    import hashlib

    h = hashlib.sha256()
    for name in sorted(store.columns):
        a = store.columns[name]
        step = max(len(a) // 16, 1)
        h.update(repr((name, a.dtype.str, len(a),
                       a[::step][:17].tolist())).encode())
    return h.hexdigest()[:24]


def compile_plan_text(text: str, cfg: Config, store: ColumnStore,
                      cleanup: bool = True,
                      push_joins: bool = False) -> CompiledQuery:
    """mplan text -> CompiledQuery (the ``compile`` driver,
    MainFuns.hs:172-188).

    Resolved dynamic sizes persist across processes (keyed by plan text +
    store fingerprint, ~/.cache/mplan2vdl_tpu/sizes) — the counting
    pre-passes rerun only for data the process has not seen before."""
    import hashlib
    import json as _json

    vexps = plan_to_vexps(text, cfg, cleanup, push_joins)
    cache_dir = os.environ.get(
        "MPLAN2VDL_SIZE_CACHE",
        os.path.expanduser("~/.cache/mplan2vdl_tpu/sizes"))
    preset, path = None, None
    if cache_dir and cache_dir != "0":
        # The version string ALSO keys the kernel window menu: span-fit
        # verdicts are only optimal relative to W_OPTIONS, so widening
        # the menu (r5: 16K/32K/64K windows) must miss old records —
        # a replayed False verdict would silently pin the XLA-gather
        # fallback on sites the new windows now cover.
        # ("v2": span-fit verdicts joined the record — old-format
        # entries must miss so fits get resolved at all.)
        from .kernels.sorted_gather import W_OPTIONS

        key = hashlib.sha256(
            repr(("v4", W_OPTIONS, text, cleanup, push_joins,
                  _store_fingerprint(store))).encode()).hexdigest()[:32]
        path = os.path.join(cache_dir, key + ".json")
        try:
            with open(path) as f:
                preset = _json.load(f)
        except (OSError, ValueError):
            preset = None
    cq = CompiledQuery(cfg, vexps, store, preset_sizes=preset)
    if path is not None and preset is None:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            with open(path, "w") as f:
                _json.dump(cq.sizes_record(), f)
        except OSError:
            pass  # cache is best-effort
    return cq
