"""Multi-chip tests on the virtual 8-device CPU mesh: distributed
scan-filter-aggregate matches the oracle exactly; the all_to_all shuffle
routes every row to its key's owner shard."""

import numpy as np
import pytest


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from mplan2vdl_tpu.parallel import dist

    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return dist.make_mesh(jax.devices()[:8])


@pytest.fixture(scope="session")
def small_store():
    from mplan2vdl_tpu.engine import datagen

    return datagen.generate(sf=0.005, seed=11)


def test_distributed_q6(mesh8, small_store):
    from mplan2vdl_tpu.oracle import tpch
    from mplan2vdl_tpu.parallel import dist

    store = small_store
    cols = {c: store.columns[("lineitem", c)]
            for c in ["l_shipdate", "l_discount", "l_quantity",
                      "l_extendedprice"]}
    table = dist.ShardedTable.put(mesh8, cols)
    d94, d95 = tpch.day(1994, 1, 1), tpch.day(1995, 1, 1)

    q = dist.DistQuery(
        table=table, domain=1,
        mask_fn=lambda c: ((c["l_shipdate"] >= d94)
                           & (c["l_shipdate"] < d95)
                           & (c["l_discount"] >= 5) & (c["l_discount"] <= 7)
                           & (c["l_quantity"] < 2400)),
        key_fn=lambda c: c["l_shipdate"] * 0,
        agg_fns={"revenue": lambda c: c["l_extendedprice"] * c["l_discount"]},
    )
    res = q()
    exp = tpch.q6(store)["revenue"]
    assert res["revenue"].tolist() == exp.tolist()


def test_distributed_q1_groupby(mesh8, small_store):
    from mplan2vdl_tpu.oracle import tpch
    from mplan2vdl_tpu.parallel import dist

    store = small_store
    cols = {c: store.columns[("lineitem", c)]
            for c in ["l_shipdate", "l_returnflag", "l_linestatus",
                      "l_quantity", "l_extendedprice"]}
    table = dist.ShardedTable.put(mesh8, cols)
    cutoff = tpch.day(1998, 12, 1) - 90
    nls = int(store.columns[("lineitem", "l_linestatus")].max()) + 1

    q = dist.DistQuery(
        table=table, domain=int(cols["l_returnflag"].max() + 1) * nls,
        mask_fn=lambda c: c["l_shipdate"] <= cutoff,
        key_fn=lambda c: c["l_returnflag"] * nls + c["l_linestatus"],
        agg_fns={"sum_qty": lambda c: c["l_quantity"],
                 "sum_base_price": lambda c: c["l_extendedprice"]},
    )
    res = q()
    exp = tpch.q1(store)
    # compare by (returnflag, linestatus) derived from the dense group id
    got = sorted(zip((res["__group_id"] // nls).tolist(),
                     (res["__group_id"] % nls).tolist(),
                     res["sum_qty"].tolist(),
                     res["sum_base_price"].tolist(),
                     res["__count"].tolist()))
    want = sorted(zip(exp["l_returnflag"].tolist(),
                      exp["l_linestatus"].tolist(),
                      exp["sum_qty"].tolist(),
                      exp["sum_base_price"].tolist(),
                      exp["count_order"].tolist()))
    assert got == want


def test_shuffle_by_key(mesh8):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mplan2vdl_tpu.parallel import dist

    rng = np.random.default_rng(3)
    n, key_hi = 4096, 1000
    keys = rng.integers(0, key_hi, size=n).astype(np.int64)
    vals = rng.integers(0, 10**6, size=n).astype(np.int64)
    sharding = NamedSharding(mesh8, P("d"))
    kd = jax.device_put(keys, sharding)
    vd = jax.device_put(vals, sharding)
    ko, vo = dist.shuffle_by_key(mesh8, kd, vd, key_hi)
    # output is (n_dev, n_dev*cap): row d = what landed on shard d
    ko, vo = np.asarray(ko), np.asarray(vo)
    n_dev = 8
    per = -(-key_hi // n_dev)
    kept = []
    for d in range(n_dev):
        for k, v in zip(ko[d].tolist(), vo[d].tolist()):
            if k < key_hi:
                assert k // per == d
                kept.append((k, v))
    assert sorted(kept) == sorted(zip(keys.tolist(), vals.tolist()))
