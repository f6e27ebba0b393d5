"""Stream-compaction kernel (kernels/compact.py) vs the numpy oracle, in
Pallas interpret mode (the real-TPU path is the same trace; on-chip
validation + the 4.4-9x measurement live in tools/probe_r2.py and
BENCH_OPS.md).  Also covers the engine hook: _sel_positions routes to the
kernel under the interpret-mode env, so a full FSel query exercises it."""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setenv("MPLAN2VDL_PL_INTERPRET", "1")


def _run(mask_np, n_out=None):
    import jax.numpy as jnp

    from mplan2vdl_tpu.engine.kernels.compact import compact_positions

    return np.asarray(compact_positions(jnp.asarray(mask_np), n_out))


@pytest.mark.parametrize("n,p", [(100, 0.5), (8192, 0.3), (20000, 0.05),
                                 (16401, 0.9)])
def test_matches_nonzero(n, p):
    rng = np.random.default_rng(1)
    mask = rng.random(n) < p
    got = _run(mask)
    want = np.nonzero(mask)[0]
    nz = len(want)
    assert got.shape == (n,)
    np.testing.assert_array_equal(got[:nz], want)
    assert np.all(got[nz:] == 0)  # masked tail


def test_all_and_none():
    for mask in (np.ones(9000, bool), np.zeros(9000, bool)):
        got = _run(mask)
        want = np.nonzero(mask)[0]
        np.testing.assert_array_equal(got[:len(want)], want)
        assert np.all(got[len(want):] == 0)


def test_n_out_trim():
    rng = np.random.default_rng(2)
    mask = rng.random(20000) < 0.1
    want = np.nonzero(mask)[0]
    got = _run(mask, n_out=4096)
    assert got.shape == (4096,)
    np.testing.assert_array_equal(got[:min(len(want), 4096)],
                                  want[:4096])


def test_block_boundary_carry():
    """Selected counts that leave partial 128-lane rows across many
    consecutive blocks stress the carry-row merge."""
    rng = np.random.default_rng(3)
    n = 8192 * 3 + 1
    mask = np.zeros(n, bool)
    # a few stragglers per block -> every write is carry-dominated
    idx = np.sort(rng.choice(n, 97, replace=False))
    mask[idx] = True
    got = _run(mask)
    np.testing.assert_array_equal(got[:97], idx)
    assert np.all(got[97:] == 0)


def test_engine_fsel_routes_through_kernel():
    """A selective scan query (FSel compaction + gathers) runs the engine
    with the kernel hook live and still matches the oracle."""
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.lower import compile_plan_text
    from mplan2vdl_tpu.oracle import tpch

    store = datagen.generate(sf=0.01, seed=9)
    cfg = store.make_catalog()
    with open("/root/reference/tests/tpch10noorder/06.sql.mplan") as f:
        res = compile_plan_text(f.read(), cfg, store)()
    want = tpch.q6(store)
    assert int(res.columns[0][0]) == int(want["revenue"][0])
