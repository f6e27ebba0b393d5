"""Scatter-free vectorized searchsorted via tagged co-sort.

``jnp.searchsorted`` lowers on TPU to a while-loop of dynamic gathers —
one serialized ~7 ns gather per binary-search step — measured at
~143 ns/element per probe over a 512K-entry table (tools/probe_sort.py,
v5e).  A 2-operand int32 ``lax.sort`` on the same chip runs at
1.6 ns/element, so ranking by *sorting* beats binary search by ~50-100x
whenever the query set is large:

  positions = searchsorted(sort(table), queries, side)

is computed as ONE co-sort of ``concat(table, queries)`` with a tie-break
tag ordering queries before (side='left') or after (side='right') equal
table keys.  A query's insertion position is then its merged rank minus
the number of queries at or before it.  A second sort on the origin
index routes positions back to query order (the scatter-free inverse-
permutation trick).

Note the table does NOT need to be pre-sorted: the co-sort ranks against
the sorted order implicitly, so callers holding unsorted build keys can
skip their own sort when only positions are needed.

Semantics match ``jnp.searchsorted(sorted_table, queries, side)`` for
integer keys, including sentinel extremes.  Replaces the probe phase of
the sort-merge equijoin (lower.py:_join_artifacts — reference analog:
the FK-join gather algebra at /root/reference/src/Vlite.hs:1248-1282
never needed a probe because MonetDB precomputed the join index; the
general equijoin is a capability the reference lacks) and the Partition
op (searchsorted pivots, /root/reference/src/Vlite.hs:363-366).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# below this many queries the serialized binary search is cheaper than
# paying two extra sort compiles + passes over (m + n) elements
MIN_QUERIES = 4096

_I32MAX = 2**31 - 1


def enabled() -> bool:
    """MPLAN2VDL_NO_MERGE_SEARCH=1 forces jnp.searchsorted everywhere
    (debugging / compile-crash bisection)."""
    import os

    return os.environ.get("MPLAN2VDL_NO_MERGE_SEARCH", "0") in ("", "0")


def use_merge(n_queries: int) -> bool:
    return n_queries >= MIN_QUERIES and enabled()


def _pad_len(ln: int) -> int:
    """Next power of two (min 8192), so every merge in a query — and
    across queries — reuses a handful of sort shapes instead of compiling
    one per (m, n) pair (the lax.sort compile wall: ~20-120 s per cold
    shape on the tunneled TPU compiler)."""
    return max(8192, 1 << (ln - 1).bit_length())


def _pad_with(arrs, fills):
    ln = arrs[0].shape[0]
    target = _pad_len(ln)
    if target == ln:
        return arrs
    return [jnp.concatenate([a, jnp.full((target - ln,), f, a.dtype)])
            for a, f in zip(arrs, fills)]


def _positions_from_merge(operands, num_keys, m, idt):
    """Co-sort tagged keys (pre-padded; pads rank strictly last); return
    per-slot insertion positions and the sorted origin indices
    (origin >= m marks a query)."""
    total = operands[0].shape[0]
    origin = lax.iota(idt, total)
    sorted_ops = lax.sort(tuple(operands) + (origin,), num_keys=num_keys)
    sorg = sorted_ops[-1]
    is_q = (sorg >= m).astype(idt)
    from . import scan
    incq = scan.cumsum(is_q)
    # query at merged rank p has (incq[p]-1) queries strictly before it,
    # so table entries before it = p - (incq[p] - 1)
    pos = lax.iota(idt, total) + 1 - incq
    return pos, sorg


def _route_back(pos, sorg):
    """Inverse permutation by a second sort: positions in origin order."""
    _, rpos = lax.sort((sorg, pos), num_keys=1)
    return rpos


def merge_searchsorted(table, queries, side: str = "left",
                       key_hi: int | None = None):
    """= jnp.searchsorted(sort(table), queries, side) via two co-sorts.

    ``key_hi``: static upper bound on |key| values (sentinels included);
    when ``2*key_hi+1`` fits int32 the tag packs into an int32 key,
    else the key widens to int64 (sorts ~2.6x slower — callers should
    narrow via catalog bounds first).
    """
    m, n = int(table.shape[0]), int(queries.shape[0])
    kdt = jnp.promote_types(table.dtype, queries.dtype)
    idt = jnp.int32 if _pad_len(m + n) < _I32MAX else jnp.int64
    qtag = 0 if side == "left" else 1
    if kdt == jnp.int32 and key_hi is not None and 2 * key_hi + 1 < _I32MAX:
        # pack the tag into the key: 1-operand comparator (strict < so pad
        # sentinels at dtype-max never tie with a real tagged key)
        t = table.astype(kdt) * 2 + (1 - qtag)
        q = queries.astype(kdt) * 2 + qtag
        (tagged,) = _pad_with([jnp.concatenate([t, q])], [_I32MAX])
        ops, nk = (tagged,), 1
    else:
        keys = jnp.concatenate([table.astype(kdt), queries.astype(kdt)])
        tags = jnp.concatenate([jnp.full((m,), 1 - qtag, jnp.int32),
                                jnp.full((n,), qtag, jnp.int32)])
        keys, tags = _pad_with([keys, tags],
                               [jnp.iinfo(kdt).max, 2**31 - 1])
        ops, nk = (keys, tags), 2
    pos, sorg = _positions_from_merge(ops, nk, m, idt)
    rpos = _route_back(pos, sorg)
    return rpos[m:m + n]


def merge_lo_hi(table, queries, key_hi: int | None = None,
                return_merged: bool = False):
    """(searchsorted left, searchsorted right) in ONE tagged co-sort.

    Queries enter twice — tag 0 (before equal table keys, yielding the
    'left' rank) and tag 2 (after, yielding 'right'); table keys carry
    tag 1.  Used by the sort-merge join build (lower.py:_join_artifacts),
    where lo/hi over the same probe keys previously cost two serialized
    binary searches.

    ``return_merged`` additionally returns the merged origin array
    ``sorg`` (origin < m marks a table entry): table origins extracted
    from it in merged order ARE the table's sort permutation, letting the
    caller skip its own table sort.
    """
    m, n = int(table.shape[0]), int(queries.shape[0])
    kdt = jnp.promote_types(table.dtype, queries.dtype)
    idt = jnp.int32 if _pad_len(m + 2 * n) < _I32MAX else jnp.int64
    if kdt == jnp.int32 and key_hi is not None and 4 * key_hi + 3 < _I32MAX:
        t = table.astype(kdt) * 4 + 1
        qlo = queries.astype(kdt) * 4
        qhi = qlo + 2
        (tagged,) = _pad_with([jnp.concatenate([t, qlo, qhi])], [_I32MAX])
        ops, nk = (tagged,), 1
    else:
        q = queries.astype(kdt)
        keys = jnp.concatenate([table.astype(kdt), q, q])
        tags = jnp.concatenate([jnp.full((m,), 1, jnp.int32),
                                jnp.zeros((n,), jnp.int32),
                                jnp.full((n,), 2, jnp.int32)])
        keys, tags = _pad_with([keys, tags],
                               [jnp.iinfo(kdt).max, 2**31 - 1])
        ops, nk = (keys, tags), 2
    pos, sorg = _positions_from_merge(ops, nk, m, idt)
    rpos = _route_back(pos, sorg)
    if return_merged:
        return rpos[m:m + n], rpos[m + n:m + 2 * n], sorg
    return rpos[m:m + n], rpos[m + n:m + 2 * n]


def searchsorted_fast(table, queries, side: str = "left",
                      key_hi: int | None = None):
    """Dispatch: co-sort merge for large query sets, jnp.searchsorted
    for small ones (whose serialized probes are cheaper than two extra
    sort compiles)."""
    if not use_merge(int(queries.shape[0])):
        return jnp.searchsorted(table, queries, side=side)
    return merge_searchsorted(table, queries, side, key_hi=key_hi)
