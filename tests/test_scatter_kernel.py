"""Monotone-scatter kernel (kernels/scatter.py) in interpret mode.

Property: out[pos[i]] = src[i] for strictly-ascending valid positions,
zero elsewhere — the write-side dual of the compaction kernel.  The
interpret-mode run executes the exact kernel logic (two-phase log-shift:
LSB-first left-pack + MSB-first right-spread) on CPU.
"""

import numpy as np
import pytest

pytest.importorskip("jax")

import jax  # noqa: E402

from mplan2vdl_tpu import jaxcfg  # noqa: F401,E402

import jax.numpy as jnp  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("MPLAN2VDL_PL_INTERPRET", "1")


def _oracle(pos, src, L):
    out = np.zeros(L, np.int64)
    for p, s in zip(pos, src):
        if 0 <= p < L:
            out[p] = s
    return out


def _run(pos, src, L, dtype=np.int32):
    from mplan2vdl_tpu.engine.kernels.scatter import monotone_scatter

    got = monotone_scatter(jnp.asarray(pos), jnp.asarray(src.astype(dtype)),
                           L)
    return np.asarray(got).astype(np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("density", [0.02, 0.3, 0.9, 1.0])
def test_random_monotone(seed, density):
    rng = np.random.default_rng(seed)
    L = int(rng.integers(2000, 40000))
    mask = rng.random(L) < density
    pos = np.flatnonzero(mask).astype(np.int32)
    src = rng.integers(1, 2**20, len(pos)).astype(np.int32)
    got = _run(pos, src, L)
    np.testing.assert_array_equal(_oracle(pos, src, L), got)


def test_adversarial_spread_patterns():
    # the phase-B collision shapes: tight runs mapping to far apart
    # destinations and vice versa (the LSB-first counterexample class)
    L = 3 * 8192
    cases = [
        np.array([0, 1], np.int32),                      # d=(1,3) class
        np.arange(100, dtype=np.int32) * 200,            # uniform spread
        np.concatenate([np.arange(50), L - 50 + np.arange(50)]
                       ).astype(np.int32),               # both extremes
        np.array([8191, 8192], np.int32),                # block boundary
        np.array([8190, 8191, 8192, 8193, 16383, 16384], np.int32),
    ]
    rng = np.random.default_rng(9)
    for pos in cases:
        src = rng.integers(1, 1000, len(pos)).astype(np.int32)
        got = _run(pos, src, L)
        np.testing.assert_array_equal(_oracle(pos, src, L), got)
    # the literal LSB-first counterexample at d=(1,3)
    got = _run(np.array([1, 3], np.int32), np.array([7, 9], np.int32), L)
    np.testing.assert_array_equal(_oracle(np.array([1, 3]),
                                          np.array([7, 9]), L), got)


def test_invalid_tail_positions_dropped():
    L = 10000
    pos = np.array([5, 17, 9000, L, L, L], np.int32)  # 3 valid + sentinels
    src = np.array([1, 2, 3, 4, 5, 6], np.int32)
    got = _run(pos, src, L)
    want = np.zeros(L, np.int64)
    want[[5, 17, 9000]] = [1, 2, 3]
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_large_invalid_cluster_at_L(seed):
    """ADVICE r2 (high): invalid rows clamped to exactly L, with
    L % 8192 != 0, share the last output block with valid writers; before
    the >=L remap the duplicate cluster broke the strictly-ascending
    contract and phase-B collisions zeroed valid slots."""
    rng = np.random.default_rng(seed)
    L = int(rng.integers(8192 + 1, 8192 * 4 - 1))
    n_valid = int(rng.integers(100, 4000))
    pos_valid = np.sort(rng.choice(L, n_valid, replace=False)).astype(np.int32)
    n_invalid = int(rng.integers(2, 12000))  # can exceed one block's BLK
    pos = np.concatenate([pos_valid,
                          np.full(n_invalid, L, np.int32)]).astype(np.int32)
    src = rng.integers(1, 2**20, len(pos)).astype(np.int32)
    got = _run(pos, src, L)
    np.testing.assert_array_equal(_oracle(pos, src, L), got)


def test_valid_positions_past_L_dropped():
    """Drop semantics: in-contract ascending positions that exceed L are
    dropped, including ones inside [L, Lpad) which map onto the padded
    final block."""
    L = 10000  # Lpad = 16384
    pos = np.array([5, 9000, 10500, 12000, 16383, 16385], np.int32)
    src = np.array([1, 2, 3, 4, 5, 6], np.int32)
    got = _run(pos, src, L)
    want = np.zeros(L, np.int64)
    want[[5, 9000]] = [1, 2]
    np.testing.assert_array_equal(want, got)


def test_int64_values_two_planes():
    L = 9000
    rng = np.random.default_rng(3)
    pos = np.sort(rng.choice(L, 500, replace=False)).astype(np.int32)
    src = rng.integers(-2**60, 2**60, 500).astype(np.int64)
    from mplan2vdl_tpu.engine.kernels.scatter import monotone_scatter

    got = np.asarray(monotone_scatter(jnp.asarray(pos), jnp.asarray(src), L))
    want = np.zeros(L, np.int64)
    want[pos] = src
    np.testing.assert_array_equal(want, got)


def test_dense_full_permutation_identity():
    L = 16384
    pos = np.arange(L, dtype=np.int32)
    src = np.arange(L, dtype=np.int32) * 3 + 1
    got = _run(pos, src, L)
    np.testing.assert_array_equal(src.astype(np.int64), got)


def test_engine_query_with_kernel_scatter_matches_plain(monkeypatch):
    """End-to-end: an FK-join query whose mask deduction scatters through
    an ascending unique dim mask runs identically with the Pallas
    monotone-scatter (interpret mode) and the XLA scatter."""
    monkeypatch.delenv("MPLAN2VDL_PL_INTERPRET", raising=False)
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine import lower as L

    store = datagen.generate(sf=0.02, seed=11)
    cfg = store.make_catalog()
    for q in ("12", "04"):
        with open(f"/root/reference/tests/tpch10noorder/{q}.sql.mplan") as f:
            text = f.read()
        plain = L.compile_plan_text(text, cfg, store)()
        want = sorted(zip(*[np.asarray(c, np.int64).tolist()
                            for c in plain.columns]))
        monkeypatch.setenv("MPLAN2VDL_PL_INTERPRET", "1")
        kern = L.compile_plan_text(text, cfg, store)()
        got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                           for c in kern.columns]))
        monkeypatch.delenv("MPLAN2VDL_PL_INTERPRET")
        assert got == want, f"Q{q} diverges under the scatter kernel"
