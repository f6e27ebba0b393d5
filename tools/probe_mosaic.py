"""Probe which Mosaic lowerings this toolchain supports — the feature
set gates the multiagg kernel redesign (MXU-contracted group reduction
needs ONE of: 2D-tile transpose, (S,128)->(1,S*128) reshape, or
multi-dim dot_general).

Each probe builds a tiny Pallas kernel, compiles it for the real chip,
runs it, and checks the result against numpy.  Prints OK/FAIL per
probe; failures print the first line of the Mosaic error.

Usage: python tools/probe_mosaic.py
"""

import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mplan2vdl_tpu import jaxcfg  # noqa: F401

import numpy as np

import jax

if os.environ.get("MPLAN2VDL_PL_INTERPRET", "0") not in ("", "0"):
    # interpret-mode semantics check on the host CPU (the env var alone
    # does not override the axon plugin)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

S, C = 16, 128


INTERPRET = os.environ.get("MPLAN2VDL_PL_INTERPRET", "0") not in ("", "0")


def run_probe(name, kernel, out_shape, want, *args):
    try:
        with jax.enable_x64(False):
            f = pl.pallas_call(
                kernel, interpret=INTERPRET,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32)
                if want.dtype == np.float32
                else jax.ShapeDtypeStruct(out_shape, jnp.int32))
            got = np.asarray(jax.jit(f)(*args))
        ok = np.allclose(got, want)
        print(f"{name}: {'OK' if ok else 'WRONG RESULT'}", flush=True)
        return ok
    except Exception as e:
        msg = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
        print(f"{name}: FAIL {msg}", flush=True)
        return False


def main():
    rng = np.random.default_rng(0)
    x_np = rng.integers(0, 1000, (S, C)).astype(np.int32)
    x = jnp.asarray(x_np)

    # 1. 2D tile transpose (sublane<->lane swap)
    def k_transpose(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    run_probe("transpose_16x128", k_transpose, (C, S), x_np.T, x)

    # 2. reshape (S,128) -> (1, S*128) (merge into lanes)
    def k_reshape(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(1, S * C)

    run_probe("reshape_to_1xSC", k_reshape, (1, S * C),
              x_np.reshape(1, S * C), x)

    # 3. reshape (S,128) -> (S*128, 1)? (merge into sublanes)
    def k_reshape2(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(S * C, 1)

    run_probe("reshape_to_SCx1", k_reshape2, (S * C, 1),
              x_np.reshape(S * C, 1), x)

    # 4. multi-dim dot_general contraction ((1,2),(1,2))
    R, G = 8, 4
    v_np = rng.integers(0, 100, (R, S, C)).astype(np.int32)
    m_np = rng.integers(0, 2, (G, S, C)).astype(np.int32)
    want = np.einsum("rsc,gsc->rg", v_np.astype(np.float32),
                     m_np.astype(np.float32))

    def k_dg(v_ref, m_ref, o_ref):
        o_ref[...] = lax.dot_general(
            v_ref[...].astype(jnp.float32), m_ref[...].astype(jnp.float32),
            dimension_numbers=(((1, 2), (1, 2)), ((), ())),
            preferred_element_type=jnp.float32)

    run_probe("dot_general_2d_contract", k_dg, (R, G), want,
              jnp.asarray(v_np), jnp.asarray(m_np))

    # 5. iota-compare one-hot [C, G] + dot (the group contraction shape)
    gid_np = rng.integers(0, G, (S, C)).astype(np.int32)
    vals_np = rng.integers(0, 1000, (S, C)).astype(np.int32)
    want5 = np.stack([
        (vals_np * (gid_np == g)).sum(axis=1) for g in range(G)],
        axis=1).astype(np.float32)  # [S, G]

    def k_lane_dot(v_ref, g_ref, o_ref):
        v = v_ref[...].astype(jnp.float32)
        acc = jnp.zeros((S, G), jnp.float32)
        for g in range(G):
            m = (g_ref[...] == g).astype(jnp.float32)
            # contract lanes: [S,C] x [C,1] via masked ones
            col = jnp.dot(v * m, jnp.ones((C, 1), jnp.float32),
                          preferred_element_type=jnp.float32)
            acc = acc.at[:, g:g + 1].set(col) if False else (
                acc + col * (lax.broadcasted_iota(jnp.int32, (S, G), 1)
                             == g).astype(jnp.float32))
        o_ref[...] = acc

    run_probe("masked_lane_dot", k_lane_dot, (S, G), want5,
              jnp.asarray(vals_np), jnp.asarray(gid_np))

    # 6. strided sublane slice x[s::S] on a tall tile
    R2 = 4
    tall_np = rng.integers(0, 1000, (R2 * S, C)).astype(np.int32)

    def k_stride(x_ref, o_ref):
        o_ref[...] = x_ref[...][1::S, :]

    run_probe("strided_sublane_slice", k_stride, (R2, C),
              tall_np[1::S, :], jnp.asarray(tall_np))

    # 7. one-hot matmul group contraction via transposed gid
    #    (only meaningful if probe 1 passes): out[r,g] from V_s rows
    def k_full(v_ref, g_ref, o_ref):
        vt = v_ref[...].astype(jnp.float32)          # [S, C]
        gt = g_ref[...]                              # [S, C]
        acc = jnp.zeros((S, G), jnp.float32)
        oh = jnp.stack([(gt == g).astype(jnp.float32)
                        for g in range(G)], axis=0)  # [G, S, C]
        out = lax.dot_general(
            vt[None], oh, (((1, 2), (1, 2)), ((), ())),
            preferred_element_type=jnp.float32)      # [1, G]
        o_ref[...] = acc + out

    want7 = np.stack([
        (vals_np * (gid_np == g)).sum() * np.ones(S) for g in range(G)],
        axis=1).astype(np.float32)

    run_probe("stack_plus_dot_general", k_full, (S, G), want7,
              jnp.asarray(vals_np), jnp.asarray(gid_np))

    # --- patterns for the flattened-matmul multiagg design ------------
    R3 = 8
    flatv_np = rng.integers(0, 1 << 12, (R3, S * C)).astype(np.int32)
    flatm_np = rng.integers(0, 2, (G, S * C)).astype(np.int32)

    # 8. A x B^T via dot_general contracting ((1,),(1,)) — no transpose
    want8 = (flatv_np.astype(np.float32)
             @ flatm_np.astype(np.float32).T)

    def k_abt(a_ref, b_ref, o_ref):
        o_ref[...] = lax.dot_general(
            a_ref[...].astype(jnp.float32), b_ref[...].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    run_probe("dot_abT_contract_lanes", k_abt, (R3, G), want8,
              jnp.asarray(flatv_np), jnp.asarray(flatm_np))

    # 9. wide transpose [G, S*C] -> [S*C, G] then plain matmul
    def k_t_mm(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...].astype(jnp.float32),
                             b_ref[...].astype(jnp.float32).T,
                             preferred_element_type=jnp.float32)

    run_probe("matmul_with_rhs_T", k_t_mm, (R3, G), want8,
              jnp.asarray(flatv_np), jnp.asarray(flatm_np))

    # 10. in-kernel reshape (S,128)->(1,S*C), stack R rows, then matmul
    #     against a G-padded-to-128 one-hot built in flat layout
    vals3_np = rng.integers(0, 1 << 12, (R3, S, C)).astype(np.int32)
    want10 = np.einsum("rsc,sc->r", vals3_np.astype(np.float64),
                       (gid_np == 1).astype(np.float64))
    want10 = np.repeat(want10[:, None], G, axis=1).astype(np.float32)

    def k_flat(v_ref, g_ref, o_ref):
        rows = [v_ref[...][r].reshape(1, S * C).astype(jnp.float32)
                for r in range(R3)]
        a = jnp.concatenate(rows, axis=0)            # [R3, S*C]
        m1 = (g_ref[...] == 1).reshape(1, S * C).astype(jnp.float32)
        mm = jnp.broadcast_to(m1, (G, S * C))        # same mask per col
        o_ref[...] = lax.dot_general(
            a, mm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    run_probe("reshape_stack_dot", k_flat, (R3, G), want10,
              jnp.asarray(vals3_np), jnp.asarray(gid_np))

    # --- patterns for a flatter sorted-gather inner loop --------------
    # 11. take_along_axis across a WIDE (1024-lane) axis: one vector
    #     gather instead of the kernel's 8-row broadcast+mask unroll
    src_np = rng.integers(0, 1 << 20, (8, 128)).astype(np.int32)
    idx_np = rng.integers(0, 1024, (8, 128)).astype(np.int32)
    flat = src_np.reshape(-1)
    want11 = flat[idx_np]

    def k_wide_taa(s_ref, i_ref, o_ref):
        wide = s_ref[...].reshape(1, 1024)
        wide8 = jnp.broadcast_to(wide, (8, 1024))
        o_ref[...] = jnp.take_along_axis(wide8, i_ref[...], axis=1)

    run_probe("take_along_axis_wide1024", k_wide_taa, (8, 128), want11,
              jnp.asarray(src_np), jnp.asarray(idx_np))

    # 12. same through jnp.take of a flattened (1, N) source
    def k_take_flat(s_ref, i_ref, o_ref):
        wide = s_ref[...].reshape(1, 1024)[0]
        o_ref[...] = jnp.take(wide, i_ref[...], axis=0)

    run_probe("take_flat_vector", k_take_flat, (8, 128), want11,
              jnp.asarray(src_np), jnp.asarray(idx_np))


if __name__ == "__main__":
    main()
