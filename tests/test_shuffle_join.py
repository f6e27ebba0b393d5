"""Distributed shuffle equijoin (range-partitioned build + probe routing)
vs a numpy oracle: exact pair multisets, per-row counts (semi/anti/outer
derivation), skew-forced capacity retries, and invalid-row handling."""

import numpy as np
import pytest

N_DEV = 8


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from mplan2vdl_tpu.parallel import dist

    return dist.make_mesh(jax.devices()[:N_DEV])


def _sharded(mesh, arr, shard_rows, fill):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    buf = np.full(N_DEV * shard_rows, fill, dtype=np.int64)
    buf[:len(arr)] = arr
    return jax.device_put(buf, NamedSharding(mesh, P("d")))


def _oracle_pairs(lk, rk):
    from collections import defaultdict

    where = defaultdict(list)
    for j, k in enumerate(rk):
        where[int(k)].append(j)
    pairs = [(i, j) for i, k in enumerate(lk) for j in where.get(int(k), ())]
    cnt = np.array([len(where.get(int(k), ())) for k in lk], np.int64)
    return sorted(pairs), cnt


def _run_join(mesh, lk, rk, shard_rows_l, shard_rows_r, key_bounds,
              heavy=True):
    from mplan2vdl_tpu.parallel.shuffle_join import (SENT_L, SENT_R,
                                                     ShuffleJoin)

    lkeys = _sharded(mesh, lk, shard_rows_l, int(SENT_L))
    rkeys = _sharded(mesh, rk, shard_rows_r, int(SENT_R))
    rpos = _sharded(mesh, np.arange(len(rk)), shard_rows_r, 0)
    sj = ShuffleJoin(mesh=mesh, shard_rows_l=shard_rows_l,
                     shard_rows_r=shard_rows_r, key_bounds=key_bounds,
                     heavy=heavy)
    lidx, ok, cnt, (rpos_out,) = sj(lkeys, rkeys, [rpos])
    got_pairs = sorted(
        (int(s * shard_rows_l + lidx[s, k]), int(rpos_out[s, k]))
        for s in range(N_DEV) for k in np.nonzero(ok[s])[0])
    got_cnt = cnt.reshape(-1)[:len(lk)]
    return got_pairs, got_cnt, sj


def test_random_inner_join_matches_oracle(mesh8):
    rng = np.random.default_rng(0)
    nl, nr, hi = 903, 411, 257
    lk = rng.integers(0, hi, nl).astype(np.int64)
    rk = rng.integers(0, hi, nr).astype(np.int64)
    srl, srr = -(-nl // N_DEV), -(-nr // N_DEV)
    got_pairs, got_cnt, _ = _run_join(mesh8, lk, rk, srl, srr, (0, hi))
    # the contiguous-pad layout makes shard*srl+local == the original index
    want_pairs, want_cnt = _oracle_pairs(lk, rk)
    assert got_pairs == want_pairs
    np.testing.assert_array_equal(got_cnt, want_cnt)


def test_semi_anti_outer_counts(mesh8):
    rng = np.random.default_rng(1)
    nl, nr, hi = 240, 100, 64
    lk = rng.integers(0, hi, nl).astype(np.int64)
    rk = rng.integers(0, hi // 2, nr).astype(np.int64)  # half never match
    srl, srr = nl // N_DEV, -(-nr // N_DEV)
    _, got_cnt, _ = _run_join(mesh8, lk, rk, srl, srr, (0, hi))
    _, want_cnt = _oracle_pairs(lk, rk)
    np.testing.assert_array_equal(got_cnt, want_cnt)
    # semi = rows with matches, anti = without, outer = pairs + unmatched
    assert (got_cnt > 0).sum() == (want_cnt > 0).sum()
    assert (got_cnt == 0).sum() == (want_cnt == 0).sum()


def test_skewed_keys_force_capacity_retry(mesh8):
    """With the heavy path disabled, every key identical means one owner
    receives EVERYTHING — the first capacity guess overflows and the
    doubling retry path (the fallback behind detection) must converge."""
    nl = nr = 160
    lk = np.full(nl, 7, np.int64)
    rk = np.full(nr, 7, np.int64)
    srl = srr = nl // N_DEV
    got_pairs, got_cnt, sj = _run_join(mesh8, lk, rk, srl, srr, (0, 4096),
                                       heavy=False)
    assert sj.cap_scale > 1, "skew should have forced at least one retry"
    assert len(got_pairs) == nl * nr
    np.testing.assert_array_equal(got_cnt, np.full(nl, nr))


# ------------------------------------------------- skew-aware heavy path
# VERDICT r2 item 5 / BASELINE north star "skew-aware repartitioning":
# heavy-hitter keys must not inflate per-shard buffers (no capacity
# retries) and must still produce exact pairs/counts.


def test_hot_probe_key_no_retry(mesh8):
    """60% of probes share one key: without detection this overflows the
    hot owner; with it, those probes match locally against the broadcast
    build rows — capacities stay at the uniform-keys estimate."""
    rng = np.random.default_rng(11)
    nl, nr, hi = 1600, 400, 512
    lk = rng.integers(0, hi, nl).astype(np.int64)
    lk[:960] = 7
    rk = rng.integers(0, hi, nr).astype(np.int64)
    rk[:3] = 7  # a few matching build rows
    srl, srr = nl // N_DEV, nr // N_DEV
    got_pairs, got_cnt, sj = _run_join(mesh8, lk, rk, srl, srr, (0, hi))
    assert sj._heavy_plan, "hot probe key not detected"
    assert sj.cap_scale == 1, "heavy path must not need capacity retries"
    want_pairs, want_cnt = _oracle_pairs(lk, rk)
    assert got_pairs == want_pairs
    np.testing.assert_array_equal(got_cnt, want_cnt)


def test_hot_build_key_no_retry(mesh8):
    """Half the BUILD side shares one key (pair explosion at one owner
    without detection): its rows broadcast, pairs expand where the probes
    live."""
    rng = np.random.default_rng(12)
    nl, nr, hi = 800, 800, 256
    lk = rng.integers(0, hi, nl).astype(np.int64)
    rk = rng.integers(0, hi, nr).astype(np.int64)
    rk[:400] = 9
    srl = srr = nl // N_DEV
    got_pairs, got_cnt, sj = _run_join(mesh8, lk, rk, srl, srr, (0, hi))
    assert sj._heavy_plan, "hot build key not detected"
    assert sj.cap_scale == 1
    want_pairs, want_cnt = _oracle_pairs(lk, rk)
    assert got_pairs == want_pairs
    np.testing.assert_array_equal(got_cnt, want_cnt)


def test_zipf_keys_exact_and_bounded(mesh8):
    """Zipf(1.5) keys on both sides — several heavy hitters of different
    weights plus a long tail; exactness and bounded buffers together."""
    rng = np.random.default_rng(13)
    nl, nr, hi = 2000, 1000, 100_000
    lk = np.minimum(rng.zipf(1.5, nl), hi - 1).astype(np.int64)
    rk = np.minimum(rng.zipf(1.5, nr), hi - 1).astype(np.int64)
    srl, srr = nl // N_DEV, nr // N_DEV
    got_pairs, got_cnt, sj = _run_join(mesh8, lk, rk, srl, srr, (0, hi))
    assert sj._heavy_plan, "zipf head keys not detected"
    assert sj.cap_scale == 1
    want_pairs, want_cnt = _oracle_pairs(lk, rk)
    assert got_pairs == want_pairs
    np.testing.assert_array_equal(got_cnt, want_cnt)


def test_heavy_detect_exact_caps(mesh8):
    """shard_heavy_detect's cap_hb/cap_hp are exact: cap_hb = max local
    heavy build rows on any shard, cap_hp = max local heavy pairs."""
    import jax
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from mplan2vdl_tpu.parallel.shuffle_join import (SENT_L, SENT_R,
                                                     shard_heavy_detect)

    rng = np.random.default_rng(14)
    nl = nr = 640
    srl = srr = nl // N_DEV
    lk = rng.integers(0, 64, nl).astype(np.int64)
    rk = rng.integers(0, 64, nr).astype(np.int64)
    lk[:300] = 5
    rk[:200] = 5
    lkeys = _sharded(mesh8, lk, srl, int(SENT_L))
    rkeys = _sharded(mesh8, rk, srr, int(SENT_R))

    @partial(jax.shard_map, mesh=mesh8, in_specs=(P("d"), P("d")),
             out_specs=(P(),) * 5, check_vma=False)
    def det(l, r):
        return shard_heavy_detect(l.reshape(-1), r.reshape(-1), N_DEV)

    hk, rcnt, n_heavy, cap_hb, cap_hp = det(lkeys, rkeys)
    hk, rcnt = np.asarray(hk), np.asarray(rcnt)
    heavy = set(hk[hk < int(SENT_L)].tolist())
    assert 5 in heavy
    # exact caps vs a numpy recount over the heavy set
    lk_sh = lk.reshape(N_DEV, srl)
    rk_sh = rk.reshape(N_DEV, srr)
    rglob = {k: int((rk == k).sum()) for k in heavy}
    want_hb = max(int(np.isin(s, list(heavy)).sum()) for s in rk_sh)
    want_hp = max(sum(int((s == k).sum()) * rglob[k] for k in heavy)
                  for s in lk_sh)
    assert int(cap_hb) == want_hb
    assert int(cap_hp) == want_hp
    for k in heavy:
        i = np.searchsorted(hk, k)
        assert rcnt[i] == rglob[k]


def test_invalid_rows_are_ignored(mesh8):
    from mplan2vdl_tpu.parallel.shuffle_join import SENT_L, SENT_R

    nl, nr = 80, 80
    lk = np.arange(nl, dtype=np.int64)
    rk = np.arange(nr, dtype=np.int64)
    lk[::3] = int(SENT_L)  # masked probe rows
    rk[::5] = int(SENT_R)  # masked build rows
    srl = srr = nl // N_DEV
    got_pairs, got_cnt, _ = _run_join(mesh8, lk, rk, srl, srr, (0, nl))
    valid = [(i, i) for i in range(nl) if i % 3 != 0 and i % 5 != 0]
    assert got_pairs == sorted(valid)
    want = np.array([1 if (i % 3 and i % 5) else 0 for i in range(nl)])
    np.testing.assert_array_equal(got_cnt, np.where(lk < nl, want, 0))


def test_clustered_keys_spread_across_owners(mesh8):
    """Keys clustered in a narrow band of a huge catalog range: hash
    partitioning must spread them (range splitting would hotspot owner 0
    and serialize every match there)."""
    import jax.numpy as jnp

    from mplan2vdl_tpu.parallel.shuffle_join import dest_histogram, owner_dest

    rng = np.random.default_rng(3)
    keys = jnp.asarray(rng.integers(1000, 1064, 4096), jnp.int32)
    hist = np.asarray(dest_histogram(
        owner_dest(keys, 0, 1_000_000, N_DEV), N_DEV))
    assert hist.sum() == 4096
    assert hist.max() < 4096 // 2, hist  # no owner holds a majority
    # and the join over clustered keys stays exact
    nl = nr = 512
    lk = rng.integers(1000, 1064, nl).astype(np.int64)
    rk = rng.integers(1000, 1064, nr).astype(np.int64)
    srl = srr = nl // N_DEV
    got_pairs, got_cnt, _ = _run_join(mesh8, lk, rk, srl, srr,
                                      (0, 1_000_000))
    want_pairs, want_cnt = _oracle_pairs(lk, rk)
    assert got_pairs == want_pairs
    np.testing.assert_array_equal(got_cnt, want_cnt)


def test_negative_and_offset_key_bounds(mesh8):
    """key_bounds need not start at zero (catalog bounds rarely do)."""
    rng = np.random.default_rng(2)
    nl, nr = 96, 96
    lk = rng.integers(-50, 50, nl).astype(np.int64)
    rk = rng.integers(-50, 50, nr).astype(np.int64)
    srl = srr = nl // N_DEV
    got_pairs, got_cnt, _ = _run_join(mesh8, lk, rk, srl, srr, (-50, 50))
    want_pairs, want_cnt = _oracle_pairs(lk, rk)
    assert got_pairs == want_pairs
    np.testing.assert_array_equal(got_cnt, want_cnt)


def test_pipelined_subrange_exchange_exact(mesh8, monkeypatch):
    """MPLAN2VDL_PIPELINE_EXCHANGE=S splits the exchange into S
    independent hash sub-ranges (overlap of sub-range i's owner sort
    with sub-range i+1's all_to_all on real ICI).  The result multiset
    must be identical — including under a heavy-hitter key riding the
    broadcast path alongside the split exchange."""
    monkeypatch.setenv("MPLAN2VDL_PIPELINE_EXCHANGE", "3")
    rng = np.random.default_rng(11)
    nl, nr, hi = 777, 505, 97
    lk = rng.integers(0, hi, nl).astype(np.int64)
    rk = rng.integers(0, hi, nr).astype(np.int64)
    lk[:200] = 42  # hot probe key: broadcast path engages
    srl, srr = -(-nl // N_DEV), -(-nr // N_DEV)
    got_pairs, got_cnt, sj = _run_join(mesh8, lk, rk, srl, srr, (0, hi))
    want_pairs, want_cnt = _oracle_pairs(lk, rk)
    assert got_pairs == want_pairs
    np.testing.assert_array_equal(got_cnt, want_cnt)
