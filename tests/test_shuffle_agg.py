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
