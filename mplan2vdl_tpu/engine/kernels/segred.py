"""Segmented reductions over group ids.

XLA lowers ``jax.ops.segment_*`` to scatter ops, which TPU executes as a
*serial* loop over updates when indices collide — catastrophic for
aggregation (every row collides by design: a single-group sum over 3M rows
measured ~350ms on v5e).  Group-by domains here are statically bounded by
the catalog, so the engine picks:

  * domain == 1: one fused vector reduction
  * domain <= SMALL_DOMAIN: one masked reduction per group id, emitted
    side by side — XLA multi-output fusion evaluates them in a single
    pass over the input (the composite-key discipline keeps TPC-H
    group-bys in this class: Q1's packed domain is 8)
  * larger domains: callers use the sort-based run-segmented path

Collision-free scatters (compaction, join expansion) remain on XLA
scatter, which is parallel for unique indices.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

SMALL_DOMAIN = 64

def _ident(op: str, dtype):
    if op == "sum":
        return jnp.zeros((), dtype)
    # true dtype extremes: a group whose values legitimately equal the
    # dtype minimum must still max-reduce to that value (empty groups are
    # dropped later by occupancy compaction, so the identity never leaks)
    info = np.iinfo(np.dtype(dtype.name))
    return jnp.asarray(info.min if op == "max" else info.max, dtype)


def _reduce(op: str, x):
    if op == "sum":
        return jnp.sum(x)
    if op == "max":
        return jnp.max(x)
    return jnp.min(x)


def masked_group_reduce(data, ids_ok, domain: int, op: str,
                        abs_bound: int = None):
    """[domain] vector of per-group reductions; rows whose ``ids_ok`` is
    outside [0, domain) are ignored.  Requires domain <= SMALL_DOMAIN.

    ``abs_bound`` (the catalog's |value| bound) enables an exactness-
    preserving optimization for int64 sums of int32-bounded values: the
    inner reduction runs chunked in int32 on the VPU (int64 arithmetic is
    emulated in 32-bit halves on TPU) and only the per-chunk partials
    widen to int64."""
    assert domain <= SMALL_DOMAIN
    # NOTE: a chunked int32 inner-sum variant (_chunked_sum) was measured
    # 5x SLOWER than the straight int64 reduce on v5e — the (n/C, C)
    # reshape breaks the lane layout; int64 emulation is cheaper than the
    # relayout.  Kept for reference, disabled.
    ident = _ident(op, data.dtype)
    outs = []
    for g in range(domain):
        sel = jnp.where(ids_ok == g, data, ident)
        outs.append(_reduce(op, sel))
    return jnp.stack(outs)


def _chunked_sum(data32, ids_ok, domain: int, chunk: int):
    n = data32.shape[0]
    pad = (-n) % chunk
    if pad:
        data32 = jnp.concatenate(
            [data32, jnp.zeros((pad,), data32.dtype)])
        ids_ok = jnp.concatenate(
            [ids_ok, jnp.full((pad,), domain, ids_ok.dtype)])
    d2 = data32.reshape(-1, chunk)
    i2 = ids_ok.reshape(-1, chunk)
    outs = []
    for g in range(domain):
        sel = jnp.where(i2 == g, d2, jnp.zeros((), data32.dtype))
        inner = jnp.sum(sel, axis=1)  # exact in int32 by the chunk bound
        outs.append(jnp.sum(inner.astype(jnp.int64)))
    return jnp.stack(outs)


def group_counts(ids_ok, domain: int):
    """[domain] vector of per-group row counts (same fusion shape)."""
    assert domain <= SMALL_DOMAIN
    outs = [jnp.sum((ids_ok == g).astype(jnp.int64)) for g in range(domain)]
    return jnp.stack(outs)


def masked_group_reduce_with_counts(data, ids_ok, domain: int, op: str):
    """Per-group (reduction, row count) in ONE pass over the input.

    Emitting the aggregate and the occupancy count as separate jnp
    reductions leaves XLA with two sibling reduce fusions it does not
    merge (different reducer regions), so every dense group-by read its
    inputs twice — and XLA's memory-space assignment then inserted full-
    column staging copies between the passes (measured on Q6 SF1: 3.25x
    HBM amplification, 59% of roofline).  A single variadic ``lax.reduce``
    carrying (value, count) pairs forces one fused pass: Q6 SF1 went
    59% -> on-par with the raw scan-filter-agg shape.  Counts accumulate
    in int32 (row counts < 2^31 by the engine's length invariant)."""
    assert domain <= SMALL_DOMAIN
    ident = _ident(op, data.dtype)
    comb = {"sum": lax.add, "max": lax.max, "min": lax.min}[op]

    def computation(acc, val):
        return (comb(acc[0], val[0]), lax.add(acc[1], val[1]))

    aggs, cnts = [], []
    for g in range(domain):
        m = ids_ok == g
        sel = jnp.where(m, data, ident)
        one = m.astype(jnp.int32)
        a, c = lax.reduce((sel, one), (ident, jnp.int32(0)),
                          computation, (0,))
        aggs.append(a)
        cnts.append(c)
    return jnp.stack(aggs), jnp.stack(cnts)
