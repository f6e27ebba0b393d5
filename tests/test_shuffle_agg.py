"""Sparse distributed group-by: local pre-agg + all_to_all + owner combine
matches a numpy group-by exactly on the 8-device mesh."""

import numpy as np
import pytest


@pytest.fixture(scope="session")
def mesh8b():
    import jax
    from mplan2vdl_tpu.parallel import dist

    return dist.make_mesh(jax.devices()[:8])


def test_shuffle_groupby_sum_min(mesh8b):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mplan2vdl_tpu.parallel.shuffle_agg import ShuffleGroupBy

    rng = np.random.default_rng(5)
    n_dev, shard_rows = 8, 4096
    n = n_dev * shard_rows
    key_hi = 50_000  # sparse domain, most keys absent
    keys = rng.integers(0, key_hi, size=n).astype(np.int64)
    a = rng.integers(-1000, 1000, size=n).astype(np.int64)
    b = rng.integers(0, 10**6, size=n).astype(np.int64)

    sharding = NamedSharding(mesh8b, P("d"))
    gb = ShuffleGroupBy(mesh=mesh8b, shard_rows=shard_rows, key_hi=key_hi,
                        ops=["sum", "min"])
    gk, (gsum, gmin) = gb(jax.device_put(keys, sharding),
                          [jax.device_put(a, sharding),
                           jax.device_put(b, sharding)])

    uniq = np.unique(keys)
    exp_sum = {k: a[keys == k].sum() for k in uniq.tolist()}
    exp_min = {k: b[keys == k].min() for k in uniq.tolist()}
    got = dict(zip(gk.tolist(), zip(gsum.tolist(), gmin.tolist())))
    assert set(got) == set(exp_sum)
    for k in uniq.tolist():
        assert got[k] == (exp_sum[k], exp_min[k]), k


def test_shuffle_groupby_extreme_row_skew(mesh8b):
    """All rows carry ONE key (worst row skew): local pre-aggregation
    collapses each shard's contribution to a single partial before the
    exchange, so no bucket can overflow from row skew — only distinct-key
    clustering can, and that is covered by the capacity-doubling retry."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mplan2vdl_tpu.parallel.shuffle_agg import ShuffleGroupBy

    n_dev, shard_rows = 8, 4096
    n = n_dev * shard_rows
    key_hi = 50_000
    keys = np.full(n, 31_337, np.int64)
    a = np.arange(n, dtype=np.int64)

    sharding = NamedSharding(mesh8b, P("d"))
    gb = ShuffleGroupBy(mesh=mesh8b, shard_rows=shard_rows, key_hi=key_hi,
                        ops=["sum"])
    gk, (gsum,) = gb(jax.device_put(keys, sharding),
                     [jax.device_put(a, sharding)])
    assert gk.tolist() == [31_337]
    assert gsum.tolist() == [a.sum()]


def test_shuffle_groupby_adversarial_key_clustering(mesh8b):
    """Every distinct key lands in ONE owner's range partition: the
    receiving bucket needs capacity for all of them (the true skew case
    the capacity-doubling retry in parallel/auto.py exists for)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mplan2vdl_tpu.parallel.shuffle_agg import ShuffleGroupBy

    rng = np.random.default_rng(9)
    n_dev, shard_rows = 8, 1024
    n = n_dev * shard_rows
    key_hi = 80_000
    per_owner = -(-key_hi // n_dev)
    # all keys inside owner 0's range [0, per_owner)
    keys = rng.integers(0, min(per_owner, 300), size=n).astype(np.int64)
    a = rng.integers(0, 1000, size=n).astype(np.int64)

    sharding = NamedSharding(mesh8b, P("d"))
    gb = ShuffleGroupBy(mesh=mesh8b, shard_rows=shard_rows, key_hi=key_hi,
                        ops=["sum"])
    gk, (gsum,) = gb(jax.device_put(keys, sharding),
                     [jax.device_put(a, sharding)])
    uniq = np.unique(keys)
    got = dict(zip(gk.tolist(), gsum.tolist()))
    assert set(got) == set(uniq.tolist())
    for k in uniq.tolist():
        assert got[k] == a[keys == k].sum(), k
