"""Fused multi-aggregate dense group-by — the Q1-class kernel.

XLA lowers k independent masked segment sums over the same rows into
~k passes over HBM (measured +20us per extra aggregate on v5e at
SF0.25).  This kernel reads each input column ONCE per block and
produces every aggregate's per-group partial on the VPU, so the whole
multi-aggregate group-by runs near the one-scan HBM floor.

Exactness under Mosaic's "no 64-bit types" restriction (probed on this
toolchain: any i64 in a Pallas TPU kernel is rejected) comes from
16-bit LIMB ACCUMULATION, entirely in int32:

  * each aggregate's per-row value is held in ``ceil(bits/16)`` limbs
    of 16 bits (value = sum_k limb_k << 16k)
  * products are built by `_mul_small`: multiply every limb by a factor
    < 2^15 and renormalize carries — intermediates stay < 2^31
  * a block's (group, agg, limb) partial is a masked sum of <= BLOCK
    16-bit limbs (< 2^27), renormalized before joining the running
    int32 accumulator, which then grows by < 2^17 per block — safe for
    < 2^14 blocks (> 33M rows at BLOCK=2048)
  * the host recombines exactly in int64: sum_k acc_k << 16k

Aggregate spec: ``value = base_col * prod(const_i + sign_i * col_i)``
with non-negative row values, base any int32 column (or 1 for count)
and every factor value in [0, 2^15).  This covers the TPC-H aggregate
shapes (sum, count, sum of price*(100-disc)*(100+tax) products).

The kernel uses only elementwise VPU ops, broadcasted iota and full
reductions — no gather/scatter, no dynamic indexing, no i64: exactly
the Mosaic-supported subset (ROADMAP "measured walls").  Interpret mode
validates semantics on CPU (tests/test_multiagg.py); the TPU build is
the same code with interpret=False.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)  # host-side limb recombination

import jax.numpy as jnp
from jax.experimental import pallas as pl

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
BLOCK = 2048  # rows per grid step = 16 sublanes x 128 lanes of int32
LANES = 128


@dataclass(frozen=True)
class AggSpec:
    """value = base * prod(const_i + sign_i * col_i); see module doc.

    ``base``: input column index, or None for the constant 1 (count).
    ``bits``: upper bound on the per-row value's bit width (from catalog
    bounds); sets the limb count.
    ``op``: "sum" (limb accumulation) or "max" (single int32 lane,
    requires bits <= 31; serves FChoose group-representative picks).
    """

    base: Optional[int]
    factors: Tuple[Tuple[int, int, int], ...] = ()
    bits: int = 32
    op: str = "sum"

    @property
    def nlimb(self) -> int:
        if self.op == "max":
            return 1
        return max(1, -(-self.bits // LIMB_BITS))


def _split_limbs(x, nl):
    return [(x >> (LIMB_BITS * k)) & LIMB_MASK
            if k * LIMB_BITS < 32 else jnp.zeros_like(x)
            for k in range(nl)]


def _renorm(limbs):
    out, carry = [], None
    for k in range(len(limbs)):
        t = limbs[k] if carry is None else limbs[k] + carry
        out.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    return out


def _mul_small(limbs, f):
    # limb < 2^16, factor < 2^15 => product < 2^31
    return _renorm([l * f for l in limbs])


def _kernel(specs, n_groups, out_pad, *refs):
    cols_refs, out_ref = refs[:-1], refs[-1]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    cols = [r[...] for r in cols_refs[:-1]]
    gid = cols_refs[-1][...]  # int32; masked-out rows are < 0

    per_agg = []
    for spec in specs:
        base = jnp.ones_like(gid) if spec.base is None else cols[spec.base]
        if spec.op == "max":
            per_agg.append([base])
            continue
        limbs = _split_limbs(base, spec.nlimb)
        for (c, s, idx) in spec.factors:
            limbs = _mul_small(limbs, c + s * cols[idx])
        per_agg.append(limbs)

    # scalar partials placed into the small output tile by flat index
    sub = jax.lax.broadcasted_iota(jnp.int32, (out_pad, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (out_pad, LANES), 1)
    upd = jnp.zeros((out_pad, LANES), jnp.int32)
    maxmask = jnp.zeros((out_pad, LANES), jnp.bool_)
    flat = 0
    for g in range(n_groups):
        sel = gid == g
        for spec, limbs in zip(specs, per_agg):
            if spec.op == "max":
                part = [jnp.max(jnp.where(sel, limbs[0], 0))]
                slots = part + [jnp.zeros((), jnp.int32)]
            else:
                # block partials are < BLOCK * 2^16 = 2^27; renormalize
                # WITH an extra carry limb so every accumulator slot grows
                # by < 2^16 per block (exact for < 2^15 blocks)
                sums = [jnp.sum(jnp.where(sel, l, 0)) for l in limbs]
                slots = _renorm(sums + [jnp.zeros((), jnp.int32)])
            for v in slots:
                at = (sub == flat // LANES) & (lane == flat % LANES)
                upd = upd + jnp.where(at, v, 0)
                if spec.op == "max":
                    maxmask = maxmask | at
                flat += 1
    acc = out_ref[...]
    out_ref[...] = jnp.where(maxmask, jnp.maximum(acc, upd), acc + upd)


def _flat_layout(specs, n_groups):
    """(group, agg) -> (flat offset, limb count incl. the carry limb)."""
    off, table = 0, {}
    for g in range(n_groups):
        for a, spec in enumerate(specs):
            table[(g, a)] = (off, spec.nlimb + 1)
            off += spec.nlimb + 1
    return table, off


def fused_group_aggregate(cols: Sequence[jax.Array], gid: jax.Array,
                          specs: Sequence[AggSpec], n_groups: int,
                          *, interpret: bool = False) -> jax.Array:
    """[n_groups, n_aggs] exact int64 sums.

    ``cols``: int32 row vectors padded to a BLOCK multiple; ``gid``:
    int32 group ids with every masked-out/padding row negative.
    """
    n = cols[0].shape[0]
    assert n % BLOCK == 0, n
    sub_rows = BLOCK // LANES
    shaped = [c.reshape(-1, LANES) for c in list(cols) + [gid]]
    table, total = _flat_layout(specs, n_groups)
    out_pad = max(8, -(-total // LANES) * 8)

    kernel = partial(_kernel, tuple(specs), n_groups, out_pad)
    out = pl.pallas_call(
        kernel,
        grid=(n // BLOCK,),
        in_specs=[pl.BlockSpec((sub_rows, LANES), lambda i: (i, 0))
                  for _ in shaped],
        out_specs=pl.BlockSpec((out_pad, LANES), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((out_pad, LANES), jnp.int32),
        interpret=interpret,
    )(*shaped)
    flat = out.reshape(-1).astype(jnp.int64)
    res = []
    for g in range(n_groups):
        row = []
        for a, spec in enumerate(specs):
            off, nl = table[(g, a)]
            acc = jnp.int64(0)
            for k in range(nl):
                acc = acc + (flat[off + k] << (LIMB_BITS * k))
            row.append(acc)
        res.append(jnp.stack(row))
    return jnp.stack(res)


def reference_group_aggregate(cols, gid, specs, n_groups):
    """numpy oracle for the kernel."""
    cols = [np.asarray(c, np.int64) for c in cols]
    gid = np.asarray(gid)
    out = np.zeros((n_groups, len(specs)), np.int64)
    for a, spec in enumerate(specs):
        v = (np.ones_like(gid, dtype=np.int64) if spec.base is None
             else cols[spec.base].copy())
        for (c, s, idx) in spec.factors:
            v = v * (c + s * cols[idx])
        for g in range(n_groups):
            sel = v[gid == g]
            if spec.op == "max":
                out[g, a] = sel.max() if len(sel) else 0
            else:
                out[g, a] = sel.sum()
    return out
