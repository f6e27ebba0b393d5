"""mergesearch: the tagged co-sort searchsorted replacement.

XLA's jnp.searchsorted lowers to a while-loop of serialized dynamic
gathers on TPU (~143 ns/probe over a 512K table, tools/probe_sort.py);
merge_searchsorted ranks all probes in two lax.sort passes.  These tests
pin exact equivalence with numpy.searchsorted across dtypes, sides,
tagged/2-key paths, duplicates, sentinels, and the pad-to-pow2 shapes.
"""

import numpy as np
import pytest

pytest.importorskip("jax")

from mplan2vdl_tpu import jaxcfg  # noqa: F401,E402  (x64 + compile cache)

import jax.numpy as jnp  # noqa: E402

from mplan2vdl_tpu.engine.mergesearch import (  # noqa: E402
    merge_lo_hi, merge_searchsorted, searchsorted_fast)


RNG = np.random.default_rng(42)


def _case(m, n, hi, dtype=np.int32):
    t = np.sort(RNG.integers(0, hi, m)).astype(dtype)
    q = RNG.integers(0, hi, n).astype(dtype)
    return t, q


@pytest.mark.parametrize("side", ["left", "right"])
@pytest.mark.parametrize("key_hi", [None, 100000])
def test_matches_numpy(side, key_hi):
    t, q = _case(3001, 2000, 100000)
    got = np.asarray(merge_searchsorted(jnp.asarray(t), jnp.asarray(q),
                                        side, key_hi=key_hi))
    np.testing.assert_array_equal(np.searchsorted(t, q, side=side), got)


def test_lo_hi_single_merge():
    t, q = _case(5000, 4096, 300)   # heavy duplicates
    lo, hi = merge_lo_hi(jnp.asarray(t), jnp.asarray(q), key_hi=310)
    np.testing.assert_array_equal(np.searchsorted(t, q, "left"),
                                  np.asarray(lo))
    np.testing.assert_array_equal(np.searchsorted(t, q, "right"),
                                  np.asarray(hi))


def test_unsorted_table_ranks_against_sorted_order():
    t, q = _case(777, 900, 5000)
    tu = RNG.permutation(t)
    got = np.asarray(merge_searchsorted(jnp.asarray(tu), jnp.asarray(q),
                                        "left", key_hi=5001))
    np.testing.assert_array_equal(np.searchsorted(t, q, "left"), got)


def test_int64_sentinel_keys_no_overflow():
    # sentinels at 2^62 would overflow a key*4 tagged pack: must take the
    # 2-key comparator path and stay exact
    t = np.sort(RNG.integers(-2**40, 2**40, 2048)).astype(np.int64)
    t[-3:] = 2**62
    q = RNG.integers(-2**40, 2**40, 2048).astype(np.int64)
    q[:5] = 2**62 - 1
    lo, hi = merge_lo_hi(jnp.asarray(t), jnp.asarray(q))
    np.testing.assert_array_equal(np.searchsorted(t, q, "left"),
                                  np.asarray(lo))
    np.testing.assert_array_equal(np.searchsorted(t, q, "right"),
                                  np.asarray(hi))


def test_all_equal_keys():
    t = np.zeros(17, np.int32)
    q = np.zeros(4099, np.int32)
    lo, hi = merge_lo_hi(jnp.asarray(t), jnp.asarray(q), key_hi=1)
    assert (np.asarray(lo) == 0).all() and (np.asarray(hi) == 17).all()


def test_dispatch_small_uses_binary_search():
    t, q = _case(100, 7, 50)
    got = np.asarray(searchsorted_fast(jnp.asarray(t), jnp.asarray(q)))
    np.testing.assert_array_equal(np.searchsorted(t, q, "left"), got)


def test_vmap_batched():
    import jax

    t = np.sort(RNG.integers(0, 1000, (4, 512)), axis=1).astype(np.int32)
    q = RNG.integers(0, 1000, (4, 8192)).astype(np.int32)
    got = np.asarray(jax.vmap(
        lambda tt, qq: merge_searchsorted(tt, qq, "right", key_hi=1001))(
            jnp.asarray(t), jnp.asarray(q)))
    for i in range(4):
        np.testing.assert_array_equal(
            np.searchsorted(t[i], q[i], "right"), got[i])


def test_expand_li_dynamic_overflow_guard():
    """ADVICE r2 (low): _expand_li packs cum into int32*2, so cum entries
    >= 2^30 (out-of-contract: a same-shape recall with more matches than
    the resolved sizes) must not int32-wrap into garbage ranks.  The fix
    CLAMPS cum to 2^30-1 before the cast — in-contract queries are the
    output-slot iota (k < B < 2^30-1), and for those the clamped compare
    is EXACT even against huge cum entries, with no lax.cond in the hot
    path (the conditional was Q3/Q9's top HBM-traffic instruction)."""
    import numpy as np
    import jax.numpy as jnp
    from mplan2vdl_tpu.engine.lower import _expand_li

    B = 8192  # >= MIN_QUERIES so the merge path is considered
    # in-contract: iota queries (sorted, distinct), small cum -> merge path
    cum = jnp.asarray(np.arange(1, 101, dtype=np.int64) * 3)
    k = jnp.arange(B, dtype=jnp.int64)
    want = np.searchsorted(np.asarray(cum), np.asarray(k), side="right")
    got = np.asarray(_expand_li(cum, k))
    np.testing.assert_array_equal(want, got)
    # out-of-contract huge cum, in-contract iota queries: exact ranks
    # (every k < 2^30-1 orders identically against the clamped entries)
    big = jnp.asarray(np.array([7, 2**29, 2**30 + 5, 2**31 + 7,
                                2**34 + 11], np.int64))
    want = np.searchsorted(np.asarray(big), np.asarray(k), side="right")
    got = np.asarray(_expand_li(big, k))
    np.testing.assert_array_equal(want, got)
