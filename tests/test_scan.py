"""Log-sweep prefix sums (engine/scan.py): exact vs jnp.cumsum across
dtypes, shapes, and the int32-sweep flags fast path."""

import numpy as np
import pytest


@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 1000, 4097])
@pytest.mark.parametrize("dt", ["int32", "int64"])
def test_cumsum_matches_jnp(n, dt):
    import jax.numpy as jnp

    from mplan2vdl_tpu.engine import scan

    rng = np.random.default_rng(n + len(dt))
    x = rng.integers(-1000, 1000, n).astype(dt)
    got = np.asarray(scan.cumsum(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x, dtype=dt))


def test_cumsum_2d_axis0():
    import jax.numpy as jnp

    from mplan2vdl_tpu.engine import scan

    rng = np.random.default_rng(3)
    x = rng.integers(0, 10, (1000, 8)).astype(np.int64)
    got = np.asarray(scan.cumsum(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x, axis=0))


def test_cumsum_flags_int64_result():
    import jax.numpy as jnp

    from mplan2vdl_tpu.engine import scan

    rng = np.random.default_rng(5)
    f = (rng.random(100000) < 0.3)
    got = scan.cumsum_flags(jnp.asarray(f))
    assert got.dtype == jnp.int64
    np.testing.assert_array_equal(np.asarray(got),
                                  np.cumsum(f.astype(np.int64)))


def test_cumsum_wraparound_semantics():
    """int32 overflow wraps exactly like jnp.cumsum (callers rely on
    matching XLA semantics, not on saturation)."""
    import jax.numpy as jnp

    from mplan2vdl_tpu.engine import scan

    x = np.full(64, 2**30, np.int32)
    got = np.asarray(scan.cumsum(jnp.asarray(x)))
    want = np.cumsum(x.astype(np.int64)).astype(np.int32)  # wrapped
    np.testing.assert_array_equal(got, want)
