"""MXU-contracted fused multi-aggregate dense group-by (Q1 class).

The VPU limb kernel (multiagg.py) pays ~1 masked-reduce chain per
(group x agg x limb) row per block — measured VPU-bound at SF10
(BENCH ledgers; Q1 roofline 0.204).  The MXU formulation replaces ALL
of that with one small matmul per block:

    partials[limb_plane, group] = LIMBS (L, B) @ ONEHOT (B, G)

where LIMBS stacks every sum-aggregate's per-row value as 8-BIT limb
planes and ONEHOT one-hot-encodes the row's group id.  Exactness on
the MXU (which multiplies bf16 and accumulates f32):

  * 8-bit limbs (0..255) are exact in bf16 (8-bit mantissa)
  * one-hot entries are 0/1, so per-(plane, group) block sums are
    <= 255 * BLOCK = 2^22 < 2^24 — exact in f32
  * block partials convert to int32 and accumulate across blocks in
    TWO int32 planes (lo16/hi): lo <= 2^16 * nblocks, hi <= 2^6 *
    nblocks — both exact; the host recombines hi<<16 + lo and then
    limbs << 8k in int64 (exact while the true value < 2^62, which
    the spec ``bits`` bound guarantees)

Per-row values are built exactly as in the VPU kernel — base *
prod(const + sign * col) via limb multiply with renormalization —
but on 8-bit limbs (factor < 2^15, limb < 2^8, products < 2^23).

The matmul's operand layouts avoid every Mosaic miscompile documented
in tools/probe_mosaic.py: both LIMBS and ONEHOT are assembled as
(rows, B) via the supported (S,128)->(1,S*128) reshape + static
concatenation, and the contraction runs as dot_general on the LANE
dimensions ((1,),(1,)) or via an explicit 2D transpose — selectable
with MPLAN2VDL_MXU_DOT=abt|transpose, chip-probed before enabling.

Only "sum" specs ride the MXU; "max" (FChoose) members of a family
are delegated by the caller to the VPU kernel (they are group-key
representatives — one or two narrow columns).

Same contract as multiagg.fused_group_aggregate: returns int64
``out[n_groups, n_specs]``.  Interpret mode validates semantics on
CPU; Pallas-on-TPU must additionally be oracle-checked on the real
chip before default-on (the r4 wide-gather lesson).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import numpy as np

import jax

from ... import jaxcfg  # noqa: F401

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from .multiagg import AggSpec

BLOCK = 16384
LANES = 128
LB = 8                      # limb bits on the MXU path
LMASK = (1 << LB) - 1


def _nlimb8(spec: AggSpec) -> int:
    return max(1, -(-spec.bits // LB))


def _split8(x, nl):
    return [(x >> (LB * k)) & LMASK if k * LB < 32 else jnp.zeros_like(x)
            for k in range(nl)]


def _renorm8(limbs):
    out, carry = [], None
    for k in range(len(limbs)):
        t = limbs[k] if carry is None else limbs[k] + carry
        out.append(t & LMASK)
        carry = t >> LB
    return out


def _mul_small8(limbs, f):
    # limb < 2^8, factor < 2^15 => product < 2^23
    return _renorm8([l * f for l in limbs])


def _plane_rows(specs):
    """(spec -> (first plane, count), total planes padded to 8)."""
    table, row = {}, 0
    for a, spec in enumerate(specs):
        nl = _nlimb8(spec) + 1  # + carry plane from the last renorm
        table[a] = (row, nl)
        row += nl
    return table, -(-max(row, 8) // 8) * 8


def _kernel(specs, n_groups, n_rows, n_valid, block, plane_tab, n_planes,
            gpad, dot_mode, *refs):
    cols_refs, gid_ref, lo_ref, hi_ref = refs[:-3], refs[-3], refs[-2], \
        refs[-1]
    i32 = jnp.int32
    k = pl.program_id(0)
    S = block // LANES

    @pl.when(k == 0)
    def _init():
        lo_ref[...] = jnp.zeros_like(lo_ref)
        hi_ref[...] = jnp.zeros_like(hi_ref)

    base_row = k * block
    row_iota = (jax.lax.broadcasted_iota(i32, (S, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(i32, (S, LANES), 1)
                + base_row)
    valid = row_iota < i32(n_valid)

    def col(ci):
        return cols_refs[ci][...].reshape(S, LANES)

    gid = gid_ref[...].reshape(S, LANES)
    gid = jnp.where(valid & (gid >= 0) & (gid < n_groups), gid,
                    i32(n_groups))

    planes = []
    for a, spec in enumerate(specs):
        if spec.base is None:
            limbs = [jnp.ones((S, LANES), i32)] + [
                jnp.zeros((S, LANES), i32)] * (_nlimb8(spec) - 1)
        else:
            limbs = _split8(col(spec.base), _nlimb8(spec))
        for (c, sign, ci) in spec.factors:
            f = jnp.full((S, LANES), c, i32)
            if sign:
                f = f + i32(sign) * col(ci)
            limbs = _mul_small8(limbs, f)
        # final carry plane (renorm spill)
        limbs = limbs + [jnp.zeros((S, LANES), i32)]
        planes.extend(limbs)
    while len(planes) < n_planes:
        planes.append(jnp.zeros((S, LANES), i32))
    A = jnp.concatenate(
        [p.reshape(1, block).astype(jnp.bfloat16) for p in planes], axis=0)

    oh_rows = [(gid == g).astype(jnp.bfloat16).reshape(1, block)
               for g in range(n_groups)]
    while len(oh_rows) < gpad:
        oh_rows.append(jnp.zeros((1, block), jnp.bfloat16))
    OHt = jnp.concatenate(oh_rows, axis=0)          # (Gp, block)

    if dot_mode == "abt":
        part = lax.dot_general(A, OHt, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    else:  # explicit 2D transpose then standard matmul
        OH = OHt.T                                   # (block, Gp)
        part = lax.dot_general(A, OH, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    p32 = part.astype(i32)                           # exact: < 2^22
    lo_ref[...] += p32 & i32(0xFFFF)
    hi_ref[...] += p32 >> i32(16)


@functools.cache
def _build(specs, n_groups, n_rows, n_valid, block, n_cols, n_planes,
           gpad, dot_mode, interpret):
    nblocks = -(-n_rows // block)
    plane_tab, _ = _plane_rows(specs)
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_kernel, specs, n_groups, n_rows, n_valid,
                              block, plane_tab, n_planes, gpad, dot_mode),
            grid=(nblocks,),
            in_specs=[pl.BlockSpec((block,), lambda k: (k,))
                      for _ in range(n_cols + 1)],
            out_specs=[pl.BlockSpec((n_planes, gpad), lambda k: (0, 0)),
                       pl.BlockSpec((n_planes, gpad), lambda k: (0, 0))],
            out_shape=[jax.ShapeDtypeStruct((n_planes, gpad), jnp.int32),
                       jax.ShapeDtypeStruct((n_planes, gpad), jnp.int32)],
            interpret=interpret)


def dot_mode() -> str:
    return os.environ.get("MPLAN2VDL_MXU_DOT", "transpose")


def mxu_agg_on() -> bool:
    """MPLAN2VDL_MXU_AGG: 1 force on, 0/unset off.  Stays opt-in until
    the on-chip oracle gate (tools/bench_multiagg.py --mxu) passes on
    the current toolchain — Mosaic has silently miscompiled vector
    patterns before (r4 wide-gather)."""
    return os.environ.get("MPLAN2VDL_MXU_AGG", "0") not in ("", "0")


def fused_group_aggregate_mxu(cols: Sequence[jax.Array], gid: jax.Array,
                              specs: Sequence[AggSpec], n_groups: int,
                              *, block: int = BLOCK,
                              interpret: bool = False) -> jax.Array:
    """int64 out[n_groups, n_specs]; sum specs only."""
    assert all(s.op == "sum" for s in specs), "MXU path sums only"
    specs = tuple(specs)
    n = int(gid.shape[0])
    n_pad = -(-n // block) * block
    plane_tab, n_planes = _plane_rows(specs)
    gpad = -(-max(n_groups, 8) // 8) * 8

    def pad(x):
        x = x.astype(jnp.int32)
        if x.shape[0] < n_pad:
            x = jnp.concatenate(
                [x, jnp.zeros((n_pad - x.shape[0],), jnp.int32)])
        return x

    args = [pad(c) for c in cols] + [pad(gid)]
    f = _build(specs, n_groups, n_pad, n, block, len(cols), n_planes,
               gpad, dot_mode(), interpret)
    with jax.enable_x64(False):
        lo, hi = f(*args)
    tot = lo.astype(jnp.int64) + (hi.astype(jnp.int64) << 16)
    out = []
    for a, spec in enumerate(specs):
        r0, nl = plane_tab[a]
        v = jnp.zeros((gpad,), jnp.int64)
        for k in range(nl):
            v = v + (tot[r0 + k] << jnp.int64(LB * k))
        out.append(v[:n_groups])
    return jnp.stack(out, axis=1)
