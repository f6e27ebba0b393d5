"""Fused multi-aggregate group-by kernel: interpret-mode validation of
the 16-bit-limb exact-int64 accumulation against a numpy oracle."""

import numpy as np
import pytest


def _pad(a, block=None):
    from mplan2vdl_tpu.engine.kernels.multiagg import BLOCK
    block = block or BLOCK
    n = len(a)
    m = -(-n // block) * block
    out = np.zeros(m, a.dtype)
    out[:n] = a
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_group_aggregate_matches_numpy(seed):
    import jax.numpy as jnp

    from mplan2vdl_tpu.engine.kernels import multiagg as MA

    rng = np.random.default_rng(seed)
    n = 5000
    qty = rng.integers(100, 500_000, n).astype(np.int32)
    price = rng.integers(90_000, 11_000_000, n).astype(np.int32)
    disc = rng.integers(0, 11, n).astype(np.int32)
    tax = rng.integers(0, 9, n).astype(np.int32)
    gid = rng.integers(0, 6, n).astype(np.int32)
    gid[rng.random(n) < 0.3] = -1  # masked-out rows

    cols = [qty, price, disc, tax]
    specs = [
        MA.AggSpec(base=0, bits=20),                                  # sum qty
        MA.AggSpec(base=1, bits=24),                                  # sum price
        MA.AggSpec(base=1, factors=((100, -1, 2),), bits=31),         # disc price
        MA.AggSpec(base=1, factors=((100, -1, 2), (100, 1, 3)),
                   bits=38),                                          # charge
        MA.AggSpec(base=2, bits=4),                                   # sum disc
        MA.AggSpec(base=None, bits=1),                                # count
    ]
    got = np.asarray(MA.fused_group_aggregate(
        [jnp.asarray(_pad(c)) for c in cols],
        jnp.asarray(_pad(gid) + np.where(_pad(np.ones(n, np.int32)) == 0,
                                         -1, 0)),
        specs, 6, interpret=True))
    want = MA.reference_group_aggregate(cols, gid, specs, 6)
    assert np.array_equal(got, want), (got, want)


def test_limb_math_extremes():
    """Max-magnitude rows: every limb and carry path saturates."""
    import jax.numpy as jnp

    from mplan2vdl_tpu.engine.kernels import multiagg as MA

    price_n = 2048
    n = price_n
    price = np.full(n, 2**31 - 1, np.int32)   # max int32 base
    disc = np.zeros(n, np.int32)              # factor = 100 (max growth)
    gid = np.zeros(n, np.int32)
    specs = [MA.AggSpec(base=0, factors=((100, -1, 1), (100, 1, 1)),
                        bits=45)]
    got = np.asarray(MA.fused_group_aggregate(
        [jnp.asarray(price), jnp.asarray(disc)], jnp.asarray(gid),
        specs, 1, block=2048, interpret=True))
    want = MA.reference_group_aggregate([price, disc], gid, specs, 1)
    assert np.array_equal(got, want), (got, want)
