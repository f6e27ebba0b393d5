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

SMALL_DOMAIN = 64

def _ident(op: str, dtype):
    if op == "sum":
        return jnp.zeros((), dtype)
    info = np.iinfo(np.dtype(dtype.name))
    return jnp.asarray(info.min + 1 if op == "max" else info.max, dtype)


def _reduce(op: str, x):
    if op == "sum":
        return jnp.sum(x)
    if op == "max":
        return jnp.max(x)
    return jnp.min(x)


def masked_group_reduce(data, ids_ok, domain: int, op: str):
    """[domain] vector of per-group reductions; rows whose ``ids_ok`` is
    outside [0, domain) are ignored.  Requires domain <= SMALL_DOMAIN."""
    assert domain <= SMALL_DOMAIN
    ident = _ident(op, data.dtype)
    outs = []
    for g in range(domain):
        sel = jnp.where(ids_ok == g, data, ident)
        outs.append(_reduce(op, sel))
    return jnp.stack(outs)


def group_counts(ids_ok, domain: int):
    """[domain] vector of per-group row counts (same fusion shape)."""
    assert domain <= SMALL_DOMAIN
    outs = [jnp.sum((ids_ok == g).astype(jnp.int64)) for g in range(domain)]
    return jnp.stack(outs)
