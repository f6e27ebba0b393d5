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

Accumulation is PER-LANE: each (group, agg, limb) owns one [1, 128]
output row holding 128 independent lane partials, built with a single
sublane-axis reduction per block.  No cross-lane (scalar-output)
reduction ever runs on-device — Mosaic lowers scalar-output integer
reductions through a re-traced ``jnp.sum`` proxy WITHOUT
``promote_integers=False``, which under x64 injects an int64 convert
it then rejects; and the scalar-extract + mask-placement form it
forces measured 45us/block (0.9 GB/s) on v5e.  Lane partials grow by
<= 16*2^16 = 2^20 per block; an in-kernel carry renormalization every
``RENORM_EVERY`` blocks keeps every int32 accumulator exact.  The host
recombines in int64: for each (group, agg), sum over lanes and limbs
of acc << 16k — exact while the aggregate's true value < 2^62 (the
``bits`` spec bound guarantees it).

Aggregate spec: ``value = base_col * prod(const_i + sign_i * col_i)``
with non-negative row values, base any int32 column (or 1 for count)
and every factor value in [0, 2^15).  This covers the TPC-H aggregate
shapes (sum, count, sum of price*(100-disc)*(100+tax) products).

The kernel uses only elementwise VPU ops, broadcasted iota, sublane
reductions and static concatenation — no gather/scatter, no dynamic
indexing, no i64: exactly the Mosaic-supported subset (ROADMAP
"measured walls").  Interpret mode validates semantics on CPU
(tests/test_multiagg.py); the TPU build is the same code with
interpret=False.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np

import jax

from ... import jaxcfg  # noqa: F401  (x64 + persistent compilation cache)

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
# rows per grid step (sublanes x 128 lanes of int32).  Swept on v5e at
# n=16.7M (tools/bench_multiagg.py --blocks, r4): 2048 -> 3380us,
# 4096 -> 2273, 8192 -> 1821, 16384 -> 1557 (plateau; 32K/64K equal,
# 128K worse).  The per-block fixed cost (one masked reduce per
# group x limb row) dominates at small blocks; 16384 amortizes it
# 2.17x over the old 2048 while VMEM stays ~400KB.
BLOCK = 16384
LANES = 128
RENORM_EVERY = 256  # power of 2; lane acc < 2^16 + 256*2^20 < 2^31 between renorms


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


def _row_layout(specs, n_groups):
    """Row table: (group, agg) -> (first row, row count).

    Sum aggregates first (``nlimb + 1`` rows each — limbs plus a carry
    row the in-kernel renorm can spill into), then max aggregates (one
    row each), so the kernel separates the two combine rules with a
    single row-index compare.  Padded to a multiple of 8 sublanes.
    """
    table, row = {}, 0
    for a, spec in enumerate(specs):
        if spec.op == "max":
            continue
        for g in range(n_groups):
            table[(g, a)] = (row, spec.nlimb + 1)
            row += spec.nlimb + 1
    max_start = row
    for a, spec in enumerate(specs):
        if spec.op != "max":
            continue
        for g in range(n_groups):
            table[(g, a)] = (row, 1)
            row += 1
    total = -(-max(row, 8) // 8) * 8
    return table, max_start, total


def _kernel(specs, n_groups, n_rows, max_start, renorm_every, n_valid,
            block, *refs):
    cols_refs, out_ref = refs[:-1], refs[-1]
    step = pl.program_id(0)
    sub = block // LANES

    @pl.when(step == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    def tile(r):
        x = r[...]
        # flat (no-pad) path: 1-D blocks reshape to the (sub, LANES)
        # tile in-register (row-major view, no relayout)
        return x.reshape(sub, LANES) if x.ndim == 1 else x

    cols = [tile(r) for r in cols_refs[:-1]]
    gid = tile(cols_refs[-1])  # int32; masked-out rows are < 0
    if n_valid:
        # non-divisible input: the LAST grid block reads past the array
        # (Pallas pads block reads with garbage) — force those rows'
        # group id negative so every sel mask / max excludes them.
        # Saves the caller a full pad-copy of every input column
        # (5 x n x 4B of pure HBM traffic at Q1's SF10 shape).
        row = (step * jnp.int32(block)
               + lax.broadcasted_iota(jnp.int32, (sub, LANES), 0)
               * jnp.int32(LANES)
               + lax.broadcasted_iota(jnp.int32, (sub, LANES), 1))
        gid = jnp.where(row < jnp.int32(n_valid), gid, jnp.int32(-1))

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

    # one [1, LANES] lane-partial row per (group, agg, limb); sublane
    # reduction only — never a scalar-output (cross-lane) reduce
    zero_row = jnp.zeros((1, LANES), jnp.int32)
    rows = [None] * n_rows
    row = 0
    for op in ("sum", "max"):
        for spec, limbs in zip(specs, per_agg):
            if spec.op != op:
                continue
            for g in range(n_groups):
                sel = gid == g
                if op == "max":
                    rows[row] = jnp.max(
                        jnp.where(sel, limbs[0], jnp.int32(0)),
                        axis=0, keepdims=True)
                    row += 1
                else:
                    for l in limbs:
                        rows[row] = jnp.sum(
                            jnp.where(sel, l, jnp.int32(0)),
                            axis=0, keepdims=True,
                            promote_integers=False)
                        row += 1
                    rows[row] = zero_row  # carry row
                    row += 1
    for r in range(row, n_rows):
        rows[r] = zero_row
    upd = jnp.concatenate(rows, axis=0)

    acc = out_ref[...]
    is_max = jax.lax.broadcasted_iota(
        jnp.int32, (n_rows, LANES), 0) >= max_start
    out_ref[...] = jnp.where(is_max, jnp.maximum(acc, upd), acc + upd)

    # power-of-2 AND, not %: scalar mod promotes through i64 under x64,
    # which sends Mosaic's convert rule into infinite recursion
    @pl.when(step & (renorm_every - 1) == renorm_every - 1)
    def _carry():
        acc = out_ref[...]
        parts = []
        for r in range(n_rows):
            seg = [(r0, nl) for (r0, nl) in
                   (v for k, v in _iter_sum_rows(specs, n_groups))
                   if r0 <= r < r0 + nl]
            if not seg:
                parts.append(acc[r:r + 1, :])
                continue
            r0, nl = seg[0]
            cur = acc[r:r + 1, :]
            new = cur if r + 1 == r0 + nl else cur & LIMB_MASK
            if r > r0:
                new = new + (acc[r - 1:r, :] >> LIMB_BITS)
            parts.append(new)
        out_ref[...] = jnp.concatenate(parts, axis=0)


def _iter_sum_rows(specs, n_groups):
    """(key, (first row, limb rows incl. carry)) for sum aggregates,
    in kernel row order."""
    row = 0
    for a, spec in enumerate(specs):
        if spec.op == "max":
            continue
        for g in range(n_groups):
            yield (g, a), (row, spec.nlimb + 1)
            row += spec.nlimb + 1


def fused_group_aggregate(cols: Sequence[jax.Array], gid: jax.Array,
                          specs: Sequence[AggSpec], n_groups: int,
                          *, block: int = BLOCK,
                          interpret: bool = False) -> jax.Array:
    """[n_groups, n_aggs] exact int64 sums.

    ``cols``: int32 row vectors padded to a ``block`` multiple; ``gid``:
    int32 group ids with every masked-out/padding row negative.
    ``block`` amortizes the kernel's fixed per-block instruction count
    (one masked reduce per group x limb) over more rows; larger is
    faster until VMEM pressure, measured on v5e in BENCH_OPS.md.
    """
    n = cols[0].shape[0]
    sub_rows = block // LANES
    table, max_start, n_rows = _row_layout(specs, n_groups)

    # lane acc grows by < sub_rows * 2^16 per block; renorm often enough
    # that it stays < 2^30 (power of 2 so the kernel can AND-test)
    renorm_every = 1 << max(0, (30 - LIMB_BITS - sub_rows.bit_length()))

    if n % block == 0:
        # divisible input: classic 2-D tiled blocks
        shaped = [c.reshape(-1, LANES) for c in list(cols) + [gid]]
        in_specs = [pl.BlockSpec((sub_rows, LANES),
                                 lambda i: (i, jnp.int32(0)))
                    for _ in shaped]
        grid, n_valid = n // block, 0
    else:
        # NO-PAD path: 1-D blocks straight over the raw columns — the
        # caller's pad-to-block concatenates were the top-traffic ops of
        # the whole fused Q1 program (5 full column copies; ~4GB at
        # SF10).  The last block reads past the array; the kernel masks
        # those rows via n_valid.
        shaped = list(cols) + [gid]
        in_specs = [pl.BlockSpec((block,), lambda i: (i,))
                    for _ in shaped]
        grid, n_valid = -(-n // block), n

    kernel = partial(_kernel, tuple(specs), n_groups, n_rows, max_start,
                     renorm_every, n_valid, block)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        # index maps return int32 literals: under x64 a bare 0 becomes an
        # i64 constant, which Mosaic refuses to lower
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_rows, LANES),
                               lambda i: (jnp.int32(0), jnp.int32(0))),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.int32),
        interpret=interpret,
    )(*shaped)
    acc = out.astype(jnp.int64)
    res = []
    for g in range(n_groups):
        row = []
        for a, spec in enumerate(specs):
            off, nl = table[(g, a)]
            if spec.op == "max":
                row.append(jnp.max(acc[off]))
            else:
                lane_sums = jnp.sum(acc[off:off + nl], axis=1)
                val = jnp.int64(0)
                for k in range(nl):
                    # rows whose weight exceeds the value bound are
                    # provably zero; shifting >= 63 is UB, skip them
                    if LIMB_BITS * k > 62:
                        continue
                    val = val + (lane_sums[k] << (LIMB_BITS * k))
                row.append(val)
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
