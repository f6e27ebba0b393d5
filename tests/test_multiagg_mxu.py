"""MXU-contracted fused multi-aggregate kernel vs the numpy oracle
(interpret mode; the TPU build additionally requires the on-chip
oracle gate in tools/bench_multiagg.py --mxu before default-on)."""

import os

import numpy as np
import pytest


def _roundtrip(seed, n, G, mode):
    import jax.numpy as jnp

    import mplan2vdl_tpu.engine.kernels.multiagg_mxu as mx
    from mplan2vdl_tpu.engine.kernels.multiagg import (
        AggSpec, reference_group_aggregate)

    os.environ["MPLAN2VDL_MXU_DOT"] = mode
    mx._build.cache_clear()
    rng = np.random.default_rng(seed)
    gid = rng.integers(-1, G, size=n).astype(np.int32)
    qty = rng.integers(0, 5100, size=n).astype(np.int32)
    price = rng.integers(0, 10_000_000, size=n).astype(np.int32)
    disc = rng.integers(0, 11, size=n).astype(np.int32)
    tax = rng.integers(0, 9, size=n).astype(np.int32)
    cols = [qty, price, disc, tax]
    specs = [
        AggSpec(base=0, bits=13),
        AggSpec(base=1, bits=24),
        AggSpec(base=1, factors=((100, -1, 2),), bits=32),
        AggSpec(base=1, factors=((100, -1, 2), (100, 1, 3)), bits=41),
        AggSpec(base=2, bits=4),
        AggSpec(base=None, bits=1),
    ]
    got = np.asarray(mx.fused_group_aggregate_mxu(
        [jnp.asarray(c) for c in cols], jnp.asarray(gid), specs, G,
        interpret=True))
    want = np.asarray(reference_group_aggregate(cols, gid, specs, G))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("mode", ["transpose", "abt"])
def test_q1_shape_exact(mode):
    _roundtrip(0, 60_000, 4, mode)


def test_odd_tail_and_groups():
    _roundtrip(1, 30_001, 7, "transpose")


def test_wide_values_near_bits_bound():
    import jax.numpy as jnp

    import mplan2vdl_tpu.engine.kernels.multiagg_mxu as mx
    from mplan2vdl_tpu.engine.kernels.multiagg import (
        AggSpec, reference_group_aggregate)

    mx._build.cache_clear()
    rng = np.random.default_rng(3)
    n, G = 40_000, 3
    gid = rng.integers(0, G, size=n).astype(np.int32)
    a = np.full(n, 2**31 - 1, dtype=np.int32)  # max base everywhere
    f = np.full(n, 32766, dtype=np.int32)
    cols = [a, f]
    specs = [AggSpec(base=0, bits=31),
             AggSpec(base=0, factors=((1, 1, 1),), bits=46)]
    got = np.asarray(mx.fused_group_aggregate_mxu(
        [jnp.asarray(c) for c in cols], jnp.asarray(gid), specs, G,
        interpret=True))
    want = np.asarray(reference_group_aggregate(cols, gid, specs, G))
    assert np.array_equal(got, want)


def test_fuzz_seeds():
    for seed in range(4, 10):
        _roundtrip(seed, 17_000 + seed * 997, 2 + seed % 6, "transpose")
