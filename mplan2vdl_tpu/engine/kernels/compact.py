"""Stream-compaction kernel: positions of mask-true rows, in order.

``FoldSelect`` (the reference's selection compaction, Vlite.hs:331-335) is
the engine's hottest data-movement op: every Select compacts a boolean
mask into ascending positions, every semijoin/antijoin mark does the same,
and the sparse group-by's run-start extraction is a compaction too
(lower.py:_sel_positions call sites).  Round 1 lowered it to a fused
int32 ``lax.sort`` (~1.8 ns/element at 6M rows, tools/probe_r2.py); XLA's
textbook alternative — cumsum + scatter — is unusable because TPU scatter
serializes at ~7 ns/element even with unique indices (same probe).

This kernel streams the mask once and writes positions at HBM-ish speed:

  phase 1 (XLA, fused):   per-block selected counts -> exclusive prefix
                          ``offs`` (destination of each block's first
                          selected row), passed as scalar prefetch
  phase 2 (Pallas, grid over 8192-element blocks):
      * block-local exclusive rank of each selected row via log-step
        prefix sums over the (64,128) tile (lane cumsum + sublane carry)
      * stable left-packing by LOG-SHIFT: each selected element moves
        left by ``shift = flat_index - rank`` slots; shifts are monotone
        non-decreasing, so applying the set bits of each shift LSB-first
        never collides (verified exhaustively for all 2^14 masks).  Shift
        and flat index pack into one int32 plane (shift<<13 | flat), so
        each of the 13 steps moves a single register plane with a
        cross-row lane roll.
      * the packed window is lane-rotated to its destination alignment
        (offs % 128, bit-decomposed static rolls), merged with a
        persistent carry row (the previous blocks' partial last row),
        and DMA'd to output rows [offs//128, offs//128 + 72).  Windows
        of consecutive non-empty blocks overlap; the TPU grid runs
        sequentially with the DMA awaited in-step, so every garbage tail
        is overwritten by the next non-empty block and the final tail
        past the total count is masked by the wrapper.

Mosaic is 32-bit: construction and invocation run under
``jax.enable_x64(False)`` (same discipline as sorted_gather.py).
"""

from __future__ import annotations

import functools
import os

import jax

from ... import jaxcfg  # noqa: F401  (x64 + persistent compilation cache)

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from .. import scan
from jax.experimental.pallas import tpu as pltpu

BLK = 8192            # elements per grid step
R = BLK // 128        # sublane rows per block (64)
SH_BITS = 13          # shifts are < BLK = 2^13
FLAT_MASK = BLK - 1


def _iotas():
    col = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    row = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    return col, row, row * 128 + col


def _shift_left(x, step: int, col, flat):
    """y[f] = x[f+step] over the flattened (R,128) tile, -1 past the end.
    ``step`` is a static power of two."""
    i32 = jnp.int32
    # pltpu.roll wants non-negative shifts: left-by-k == right-by-(size-k)
    if step % 128 == 0:
        y = pltpu.roll(x, R - step // 128, axis=0)
    else:
        a = pltpu.roll(x, 128 - step, axis=1)
        b = pltpu.roll(a, R - 1, axis=0)
        y = jnp.where(col < 128 - step, a, b)
    return jnp.where(flat < BLK - step, y, i32(-1))


def _block_ranks(m, col, row):
    """Inclusive prefix count of the 0/1 tile in flat (row-major) order:
    lane-wise log-step cumsum + sublane carry."""
    i32 = jnp.int32
    x = m
    for s in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.where(col >= s, pltpu.roll(x, s, axis=1), i32(0))
    rowsum = jnp.broadcast_to(x[:, 127:128], (R, 128))
    rp = rowsum
    s = 1
    while s < R:
        rp = rp + jnp.where(row >= s, pltpu.roll(rp, s, axis=0), i32(0))
        s *= 2
    return x + (rp - rowsum)  # lane cumsum + exclusive row carry


def _kernel(offs_ref, m_ref, o_ref, ext, carry, sem):
    i32 = jnp.int32
    k = pl.program_id(0)
    m = m_ref[...]
    col, row, flat = _iotas()

    incl = _block_ranks(m, col, row)
    cnt = incl[R - 1, 127]

    @pl.when(cnt > 0)
    def _():
        rank = incl - m                   # exclusive rank of each element
        shift = flat - rank               # unselected slots before me
        packed = jnp.where(m > 0, (shift << SH_BITS) | flat, i32(-1))

        step = 1
        while step < BLK:
            src = _shift_left(packed, step, col, flat)
            take = (src >= 0) & ((src & i32(step << SH_BITS)) != 0)
            keep = (packed >= 0) & ((packed & i32(step << SH_BITS)) == 0)
            packed = jnp.where(take, src - i32(step << SH_BITS),
                               jnp.where(keep, packed, i32(-1)))
            step *= 2

        vals = (packed & i32(FLAT_MASK)) + k * i32(BLK)

        # rotate right by rot = offs[k] % 128 (static power-of-2 rolls on
        # the bit decomposition), tracking row wrap
        off = offs_ref[k]
        rot = off % i32(128)
        a = vals
        for s in (1, 2, 4, 8, 16, 32, 64):
            a = jnp.where((rot & i32(s)) != 0, pltpu.roll(a, s, axis=1), a)
        # lanes < rot of each row wrapped from the previous row: in the
        # (R+1)-row extended window, they belong one row lower
        # DMA sublane counts must be multiples of 8: the extended window
        # is R+8 rows (1 wrap row + 7 pad rows of garbage, overwritten by
        # later blocks / masked by the wrapper)
        colx = lax.broadcasted_iota(jnp.int32, (R + 8, 128), 1)
        rowx = lax.broadcasted_iota(jnp.int32, (R + 8, 128), 0)
        z = jnp.zeros((8, 128), i32)
        down = jnp.concatenate([z[:1], a, z[:7]], axis=0)  # a shifted +1 row
        same = jnp.concatenate([a, z], axis=0)
        e = jnp.where(colx >= rot, same, down)
        # row 0 lanes < rot: previously written positions (carry row)
        cbc = jnp.broadcast_to(carry[0:1, :], (R + 8, 128))
        e = jnp.where((rowx == 0) & (colx < rot), cbc, e)
        ext[...] = e

        # persist the new partial last row for the next block
        end = off + cnt
        rel = end // i32(128) - off // i32(128)       # in [0, R]
        carry[...] = ext[pl.ds(rel, 1), :]

        dma = pltpu.make_async_copy(
            ext, o_ref.at[pl.ds(off // i32(128), R + 8), :], sem)
        dma.start()
        dma.wait()


@functools.cache
def _build(nblocks: int, nout_rows: int, interpret: bool = False):
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec((R, 128), lambda k, offs: (k, 0))],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.VMEM((R + 8, 128), jnp.int32),
                            pltpu.VMEM((1, 128), jnp.int32),
                            pltpu.SemaphoreType.DMA(())],
        )
        return pl.pallas_call(
            _kernel, grid_spec=grid_spec, interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            out_shape=jax.ShapeDtypeStruct((nout_rows, 128), jnp.int32))


def compact_positions(mask: jnp.ndarray, n_out: int = None) -> jnp.ndarray:
    """int32 positions of ``mask``'s true rows, ascending; entries past
    the true count are zero.  ``mask`` is 1-D boolean (or 0/1 int).
    ``n_out`` (default len(mask)) trims the output length — FSel's
    two-phase sizing passes the resolved survivor bound."""
    n = mask.shape[0]
    if n_out is None:
        n_out = n
    npad = -(-n // BLK) * BLK
    interp = os.environ.get("MPLAN2VDL_PL_INTERPRET", "0") not in ("", "0")
    with jax.enable_x64(False):
        m32 = jnp.zeros((npad,), jnp.int32).at[:n].set(
            mask.astype(jnp.int32))
        counts = jnp.sum(m32.reshape(-1, BLK), axis=1, dtype=jnp.int32)
        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), scan.cumsum(counts)[:-1]])
        nz = jnp.sum(counts)
        rows = npad // 128 + R + 8
        f = _build(npad // BLK, rows, interp)
        out = f(offs, m32.reshape(-1, 128)).reshape(-1)[:n_out]
        idx = lax.broadcasted_iota(jnp.int32, (n_out,), 0)
        return jnp.where(idx < nz, out, jnp.int32(0))
