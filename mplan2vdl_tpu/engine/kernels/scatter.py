"""Monotone-scatter kernel: ``out[pos[i]] = src[i]`` for ascending positions.

XLA's scatter serializes at ~7 ns/element on TPU even with unique indices
(tools/probe_sort.py: gather_random 7.2 ns/el; scatter measured worse in
round 1), and the engine's hot scatters are all MONOTONE: FK-join mask
deduction scatters ones/positions through an ascending unique dim mask
(vir.py deduce_masks, reference semantics /root/reference/src/Vlite.hs:
1248-1282), and the relational Scatter op usually receives compaction
outputs.  This kernel is the write-side dual of kernels/compact.py.

Contract: ``pos`` strictly increasing over the first ``n_valid`` entries
(the caller maps invalid/dropped rows to an out-of-range position);
``out[j] = src[i]`` where ``pos[i] == j``, zero where no writer exists.

Parallelization is over OUTPUT blocks (8192 elements).  Because positions
are strictly ascending, an output block's writers form one contiguous
source run of at most 8192 elements, located inside two aligned 8192
source windows (scalar-prefetched window ids drive the BlockSpec index
maps, same scheme as kernels/sorted_gather.py).  Each block then needs
two in-register (64..128, 128) tile moves:

  phase A — left-pack this block's writers (compact.py's log-shift:
            shift = flat - rank, applied LSB-first; both the destination
            plane and the value plane ride the same take/keep masks)
  phase B — right-spread the packed run to its destinations:
            shift = dest - rank is non-negative and non-decreasing
            (destinations strictly ascend), and the bits are applied
            MSB-FIRST: at stage ``s`` every remaining shift is < 2s, so
            elements with bit ``s`` set are exactly a SUFFIX of the run
            (non-decreasing shifts) — each stage moves a suffix right by
            ``s``, which can never collide.  (LSB-first WOULD collide
            here: q=(0,1), d=(1,3) overlaps at step 1 — the mirror of
            compact.py's order argument does not transfer.)

No cross-block carry is needed — every output block is fully owned by one
grid step, and uncovered slots are zeroed in-register.

Mosaic is 32-bit: construction and invocation run under
``jax.enable_x64(False)`` (same discipline as compact.py); int64 sources
scatter as two int32 planes (hi/lo) in the wrapper.
"""

from __future__ import annotations

import functools
import os

import jax

from ... import jaxcfg  # noqa: F401  (x64 + persistent compilation cache)

import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8192             # output elements per grid step
R = BLK // 128         # sublane rows per output block (64)
W = BLK                # source window granularity
RW = 2 * R             # rows of the two-window source view
SH_A = 14              # phase-A shifts are < 2*BLK = 2^14
FLAT_A = 2 * BLK - 1
SH_B = 13              # phase-B shifts are < BLK = 2^13
FLAT_B = BLK - 1


def _iotas(rows):
    col = lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    row = lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    return col, row, row * 128 + col


def _shift_left(x, step: int, col, flat, rows):
    """y[f] = x[f+step] over the flattened (rows,128) tile, -1 past the
    end.  ``step`` is a static power of two (compact.py's primitive)."""
    i32 = jnp.int32
    if step % 128 == 0:
        y = pltpu.roll(x, rows - step // 128, axis=0)
    else:
        a = pltpu.roll(x, 128 - step, axis=1)
        b = pltpu.roll(a, rows - 1, axis=0)
        y = jnp.where(col < 128 - step, a, b)
    return jnp.where(flat < rows * 128 - step, y, i32(-1))


def _shift_right(x, step: int, col, flat, rows):
    """y[f] = x[f-step]; -1 before the start."""
    i32 = jnp.int32
    if step % 128 == 0:
        y = pltpu.roll(x, step // 128, axis=0)
    else:
        a = pltpu.roll(x, step, axis=1)
        b = pltpu.roll(a, 1, axis=0)
        y = jnp.where(col >= step % 128, a, b)
    return jnp.where(flat >= step, y, i32(-1))


def _block_ranks(m, col, row, rows):
    """Inclusive prefix count of a 0/1 tile in flat order (compact.py)."""
    i32 = jnp.int32
    x = m
    for s in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.where(col >= s, pltpu.roll(x, s, axis=1), i32(0))
    rowsum = jnp.broadcast_to(x[:, 127:128], (rows, 128))
    rp = rowsum
    s = 1
    while s < rows:
        rp = rp + jnp.where(row >= s, pltpu.roll(rp, s, axis=0), i32(0))
        s *= 2
    return x + (rp - rowsum)


def _kernel(nwin, win_ref, p0_ref, p1_ref, s0_ref, s1_ref, o_ref):
    i32 = jnp.int32
    k = pl.program_id(0)
    base = k * i32(BLK)
    pos = jnp.concatenate([p0_ref[...], p1_ref[...]], axis=0) - base
    val = jnp.concatenate([s0_ref[...], s1_ref[...]], axis=0)
    colA, rowA, flatA = _iotas(RW)

    # when win+1 clamps to the last window, the second half duplicates the
    # first — exclude it or every writer appears twice (phase B requires
    # strictly-ascending destinations)
    w2_ok = win_ref[k] + 1 <= i32(nwin - 1)
    m = ((pos >= 0) & (pos < i32(BLK))
         & ((rowA < i32(R)) | w2_ok)).astype(i32)
    incl = _block_ranks(m, colA, rowA, RW)
    cnt = incl[RW - 1, 127]

    out = jnp.zeros((R, 128), jnp.int32)

    @pl.when(cnt > 0)
    def _():
        # ---- phase A: left-pack writers (control carries shift|flat;
        # dest and value planes ride the same take/keep masks)
        rank = incl - m
        shiftA = flatA - rank
        ctrl = jnp.where(m > 0, (shiftA << i32(SH_A)) | flatA, i32(-1))
        d = jnp.where(m > 0, pos, i32(-1))
        v = val
        step = 1
        while step < 2 * BLK:
            sc = _shift_left(ctrl, step, colA, flatA, RW)
            sd = _shift_left(d, step, colA, flatA, RW)
            sv = _shift_left(v, step, colA, flatA, RW)
            take = (sc >= 0) & ((sc & i32(step << SH_A)) != 0)
            keep = (ctrl >= 0) & ((ctrl & i32(step << SH_A)) == 0)
            ctrl = jnp.where(take, sc - i32(step << SH_A),
                             jnp.where(keep, ctrl, i32(-1)))
            d = jnp.where(take, sd, jnp.where(keep, d, i32(-1)))
            v = jnp.where(take, sv, v)
            step *= 2

        # packed run now occupies flat [0, cnt) — all within the first R
        # rows (cnt <= BLK); drop the top window
        d = d[:R, :]
        v = v[:R, :]
        colB, rowB, flatB = _iotas(R)

        # ---- phase B: right-spread to destinations; shift = d - flat is
        # non-negative and non-decreasing over the packed run
        live = (flatB < cnt) & (d >= 0)
        shiftB = d - flatB
        ctrl2 = jnp.where(live, (shiftB << i32(SH_B)) | flatB, i32(-1))
        step = BLK // 2
        while step >= 1:
            sc = _shift_right(ctrl2, step, colB, flatB, R)
            sv = _shift_right(v, step, colB, flatB, R)
            take = (sc >= 0) & ((sc & i32(step << SH_B)) != 0)
            keep = (ctrl2 >= 0) & ((ctrl2 & i32(step << SH_B)) == 0)
            ctrl2 = jnp.where(take, sc - i32(step << SH_B),
                              jnp.where(keep, ctrl2, i32(-1)))
            v = jnp.where(take, sv, v)
            step //= 2

        out_val = jnp.where(ctrl2 >= 0, v, i32(0))
        o_ref[...] = out_val

    @pl.when(cnt == 0)
    def _():
        o_ref[...] = out


@functools.cache
def _build(nblocks_out: int, nwin: int, interpret: bool = False):
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks_out,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda k, win: (win[k], 0)),
                pl.BlockSpec((R, 128),
                             lambda k, win: (jnp.minimum(win[k] + 1,
                                                         nwin - 1), 0)),
                pl.BlockSpec((R, 128), lambda k, win: (win[k], 0)),
                pl.BlockSpec((R, 128),
                             lambda k, win: (jnp.minimum(win[k] + 1,
                                                         nwin - 1), 0)),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda k, win: (k, 0)),
        )
        return pl.pallas_call(
            functools.partial(_kernel, nwin),
            grid_spec=grid_spec, interpret=interpret,
            out_shape=jax.ShapeDtypeStruct((nblocks_out * R, 128),
                                           jnp.int32))


def _scatter_i32(pos32, src32, L: int) -> jnp.ndarray:
    n = pos32.shape[0]
    npad = -(-n // W) * W
    Lpad = -(-L // BLK) * BLK
    interp = os.environ.get("MPLAN2VDL_PL_INTERPRET", "0") not in ("", "0")
    # pad the tail with out-of-range positions (never match any block)
    OOR = jnp.int32(Lpad + 1)
    # callers mark dropped/invalid rows with any position >= L; remap them
    # all to OOR so they never fall inside a live output block — positions
    # in [L, Lpad) would otherwise land in the last block as a duplicate
    # cluster and break the strictly-ascending contract (phase-B shift
    # collisions silently zero valid slots).  The in-range prefix stays
    # strictly ascending and the >=L suffix collapses to one value, so the
    # array remains sorted for the searchsorted below.
    pos32 = jnp.where(pos32 >= jnp.int32(L), OOR, pos32)
    p = jnp.full((npad,), OOR, jnp.int32).at[:n].set(pos32)
    s = jnp.zeros((npad,), jnp.int32).at[:n].set(src32)
    # per-output-block first-writer index -> aligned source window id
    blk_starts = jnp.searchsorted(
        p, jnp.arange(0, Lpad, BLK, dtype=jnp.int32)).astype(jnp.int32)
    win = jnp.minimum(blk_starts // W, npad // W - 1)
    f = _build(Lpad // BLK, npad // W, interp)
    out = f(win, p.reshape(-1, 128), p.reshape(-1, 128),
            s.reshape(-1, 128), s.reshape(-1, 128))
    return out.reshape(-1)[:L]


def monotone_scatter(pos: jnp.ndarray, src: jnp.ndarray, L: int,
                     out_dtype=None) -> jnp.ndarray:
    """``out[pos[i]] = src[i]`` with ``pos`` strictly ascending over the
    valid prefix (invalid entries must be >= L); uncovered slots are 0.
    int64 sources scatter as hi/lo int32 planes."""
    out_dtype = out_dtype or src.dtype
    pos32 = pos.astype(jnp.int32)
    if src.dtype == jnp.int64:
        # split outside enable_x64(False): the masking needs real int64
        s_lo = (src & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
        s_hi = (src >> jnp.int64(32)).astype(jnp.int32)
        with jax.enable_x64(False):
            lo = _scatter_i32(pos32, s_lo.astype(jnp.int32), L)
            hi = _scatter_i32(pos32, s_hi, L)
        out = (lo.astype(jnp.uint32).astype(jnp.int64)
               | (hi.astype(jnp.int64) << 32))
    else:
        with jax.enable_x64(False):
            out = _scatter_i32(pos32, src.astype(jnp.int32), L)
    return out.astype(out_dtype)
