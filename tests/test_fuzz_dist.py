"""Property-based testing of DISTRIBUTED equijoins: random self-join +
aggregate plans over lineitem run three ways — numpy/pandas oracle,
single-chip engine, 8-device mesh — and must agree row-for-row.

This stresses the auto-distribution join machinery the fixed corpora
exercise only through Q2/Q13/Q17/Q21: the partitioned-shuffle-join
classifier (gather-chain payload composition, value-kind rules, outer
appending) and its replicated-right fallback, across plain / semi /
anti / left-outer variants, filtered build and probe sides, and varied
join-key cardinalities.
"""

import random

import numpy as np
import pytest

from mplan2vdl_tpu import mplan as M
from mplan2vdl_tpu.mtypes import DDecimal

LI = "lineitem"
VALUE_COLS = [
    ("l_quantity", 100, 5000),
    ("l_extendedprice", 90101, 6520000),
    ("l_discount", 0, 10),
    ("l_shipdate", 727564, 729933),
]
KEY_COLS = ["l_returnflag", "l_linestatus", "l_shipmode"]
# join keys with different fan-outs (sf0.002: ~300 orders, ~400 parts)
JOIN_COLS = ["l_orderkey", "l_partkey", "l_suppkey"]


def _lit(v):
    return M.MLiteral(DDecimal(0), int(v))


def _pred(rng, side):
    col, lo, hi = rng.choice(VALUE_COLS)
    op = rng.choice([M.LT, M.GT, M.LEQ, M.GEQ])
    v = rng.randint(lo, hi)
    return M.MBinop(op, M.MRef(name=side(col)), _lit(v))


def _rand_join_plan(rng):
    left_cols = tuple(((LI, c), None) for c, _, _ in VALUE_COLS) \
        + tuple(((LI, c), None) for c in KEY_COLS) \
        + tuple(((LI, c), None) for c in JOIN_COLS)
    right_cols = tuple(((LI, c), ("R9", "r_" + c))
                       for c, _, _ in VALUE_COLS) \
        + tuple(((LI, c), ("R9", "r_" + c)) for c in JOIN_COLS)

    lhs = M.RTable(tablename=(LI,), tablecolumns=left_cols)
    for _ in range(rng.randint(0, 2)):
        lhs = M.RSelect(child=lhs, predicate=_pred(
            rng, lambda c: (LI, c)))
    rhs = M.RTable(tablename=(LI,), tablecolumns=right_cols)
    for _ in range(rng.randint(1, 2)):  # filtered build side
        rhs = M.RSelect(child=rhs, predicate=_pred(
            rng, lambda c: ("R9", "r_" + c)))

    jcol = rng.choice(JOIN_COLS)
    variant = rng.choice([M.PLAIN, M.PLAIN, M.LEFTSEMI, M.LEFTANTI,
                          M.LEFTOUTER])
    cond = M.MBinop(M.EQ, M.MRef(name=(LI, jcol)),
                    M.MRef(name=("R9", "r_" + jcol)))
    rel = M.RJoin(leftch=lhs, rightch=rhs, conds=(cond,),
                  joinvariant=variant)

    nkeys = rng.randint(1, 2)
    keys = tuple(((LI, k), None) for k in rng.sample(KEY_COLS, nkeys))
    aggs = [(M.GCount(), ("cnt",))]
    for i in range(rng.randint(1, 2)):
        col = rng.choice(VALUE_COLS)[0]
        aggs.append((M.GFold(rng.choice([M.FSUM, M.FMAX, M.FMIN]),
                             M.MRef(name=(LI, col))), (f"l{i}",)))
    if variant == M.PLAIN:  # right-side values ride the exchange payload
        for i in range(rng.randint(0, 2)):
            col = rng.choice(VALUE_COLS)[0]
            aggs.append((M.GFold(rng.choice([M.FSUM, M.FMIN]),
                                 M.MRef(name=("R9", "r_" + col))),
                         (f"r{i}",)))
    for k, _ in keys:
        aggs.append((M.GFold(M.FCHOOSE, M.MRef(name=k)), (k[-1],)))
    return M.RGroupBy(child=rel, inputkeys=keys, outputaggs=tuple(aggs))


def _rand_nested_plan(rng):
    """Group-by OF a group-by (Q15/Q16 shape): the inner folds distribute,
    the outer aggregates evaluate in the host-side group stage from the
    seeded partials."""
    cols = tuple(((LI, c), None) for c, _, _ in VALUE_COLS) + tuple(
        ((LI, c), None) for c in KEY_COLS)
    rel = M.RTable(tablename=(LI,), tablecolumns=cols)
    for _ in range(rng.randint(0, 2)):
        rel = M.RSelect(child=rel, predicate=_pred(
            rng, lambda c: (LI, c)))
    k1, k2 = rng.sample(KEY_COLS, 2)
    inner_aggs = [
        (M.GFold(rng.choice([M.FSUM, M.FMAX, M.FMIN]),
                 M.MRef(name=(LI, rng.choice(VALUE_COLS)[0]))), ("a0",)),
        (M.GCount(), ("a1",)),
        (M.GFold(M.FCHOOSE, M.MRef(name=(LI, k1))), (k1,)),
        (M.GFold(M.FCHOOSE, M.MRef(name=(LI, k2))), (k2,)),
    ]
    inner = M.RGroupBy(child=rel,
                       inputkeys=(((LI, k1), None), ((LI, k2), None)),
                       outputaggs=tuple(inner_aggs))
    outer_aggs = [
        (M.GFold(rng.choice([M.FSUM, M.FMAX, M.FMIN]),
                 M.MRef(name=("a0",))), ("s0",)),
        (M.GFold(M.FSUM, M.MRef(name=("a1",))), ("s1",)),
        (M.GFold(M.FCHOOSE, M.MRef(name=(k1,))), (k1,)),
    ]
    return M.RGroupBy(child=inner, inputkeys=(((k1,), None),),
                      outputaggs=tuple(outer_aggs))


@pytest.mark.parametrize("seed", range(8))
def test_random_nested_groupby_three_way(fuzz_setup, seed):
    from mplan2vdl_tpu import passes, vir
    from mplan2vdl_tpu.engine.lower import CompiledQuery
    from mplan2vdl_tpu.oracle import relinterp
    from mplan2vdl_tpu.parallel import auto

    store, cfg, mesh = fuzz_setup
    rng = random.Random(5000 + seed)
    m = _rand_nested_plan(rng)
    oracle = relinterp.run_oracle(store, m)
    want = sorted(zip(*[np.asarray(a, np.int64).tolist()
                        for _, a in oracle.cols]))
    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
    got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                       for c in CompiledQuery(cfg, vexps, store)().columns]))
    assert got == want, f"seed {seed}: single-chip vs oracle"
    try:
        dq = auto.distribute(cfg, store, vexps, mesh)
    except auto.NotDistributable:
        return
    dist_rows = sorted(zip(*[np.asarray(c, np.int64).tolist()
                             for _, _, c in dq()]))
    assert dist_rows == want, f"seed {seed}: distributed vs oracle"


@pytest.fixture(scope="module")
def fuzz_setup():
    import jax

    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.parallel import dist

    store = datagen.generate(sf=0.002, seed=2)
    return store, store.make_catalog(), dist.make_mesh(jax.devices()[:8])


N_SEEDS = 16
_dist_count = {"ok": 0}


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_random_join_plan_three_way(fuzz_setup, seed):
    from mplan2vdl_tpu import passes, vir
    from mplan2vdl_tpu.engine.lower import CompiledQuery
    from mplan2vdl_tpu.oracle import relinterp
    from mplan2vdl_tpu.parallel import auto

    store, cfg, mesh = fuzz_setup
    rng = random.Random(1000 + seed)
    m = _rand_join_plan(rng)

    oracle = relinterp.run_oracle(store, m)
    want = sorted(zip(*[np.asarray(a, np.int64).tolist()
                        for _, a in oracle.cols]))

    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
    res = CompiledQuery(cfg, vexps, store)()
    got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                       for c in res.columns]))
    assert got == want, f"seed {seed}: single-chip vs oracle"

    try:
        dq = auto.distribute(cfg, store, vexps, mesh)
    except auto.NotDistributable:
        return  # fallback is legitimate; coverage asserted below
    dist_rows = sorted(zip(*[np.asarray(c, np.int64).tolist()
                             for _, _, c in dq()]))
    assert dist_rows == want, f"seed {seed}: distributed vs oracle"
    _dist_count["ok"] += 1


def test_distributed_coverage():
    """The generator must actually exercise the distributed join paths —
    if most seeds fall back single-chip, the fuzz is vacuous."""
    assert _dist_count["ok"] >= N_SEEDS // 2, _dist_count


def test_hot_key_join_three_way():
    """Extreme key skew through the WHOLE distributed pipeline (VERDICT
    r2 item 5): 50% of l_suppkey rewritten to one hot supplier, then a
    self-equijoin on it.  The partitioned join must (a) detect the heavy
    key, (b) keep its exchange capacities at the uniform-keys size — the
    broadcast path handles the hot key — and (c) stay row-exact against
    both the numpy oracle and the single-chip engine."""
    import jax

    from mplan2vdl_tpu import passes, vir
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.lower import CompiledQuery
    from mplan2vdl_tpu.oracle import relinterp
    from mplan2vdl_tpu.parallel import auto, dist

    store = datagen.generate(sf=0.002, seed=4)
    rng = np.random.default_rng(99)
    sk = np.asarray(store.columns[(LI, "l_suppkey")]).copy()
    hot = int(sk[0])
    sk[rng.random(len(sk)) < 0.5] = hot  # one supplier owns half the rows
    store.add(LI, "l_suppkey", sk)
    cfg = store.make_catalog()
    mesh = dist.make_mesh(jax.devices()[:8])

    left_cols = (((LI, "l_suppkey"), None), ((LI, "l_quantity"), None),
                 ((LI, "l_returnflag"), None))
    right_cols = (((LI, "l_suppkey"), ("R9", "r_suppkey")),
                  ((LI, "l_extendedprice"), ("R9", "r_price")))
    rhs = M.RSelect(
        child=M.RTable(tablename=(LI,), tablecolumns=right_cols),
        predicate=M.MBinop(M.LT, M.MRef(name=("R9", "r_price")),
                           _lit(200000)))
    rel = M.RJoin(
        leftch=M.RTable(tablename=(LI,), tablecolumns=left_cols),
        rightch=rhs,
        conds=(M.MBinop(M.EQ, M.MRef(name=(LI, "l_suppkey")),
                        M.MRef(name=("R9", "r_suppkey"))),),
        joinvariant=M.PLAIN)
    aggs = ((M.GCount(), ("cnt",)),
            (M.GFold(M.FSUM, M.MRef(name=("R9", "r_price"))), ("sp",)),
            (M.GFold(M.FCHOOSE, M.MRef(name=(LI, "l_returnflag"))),
             ("l_returnflag",)))
    m = M.RGroupBy(child=rel, inputkeys=(((LI, "l_returnflag"), None),),
                   outputaggs=aggs)

    oracle = relinterp.run_oracle(store, m)
    want = sorted(zip(*[np.asarray(a, np.int64).tolist()
                        for _, a in oracle.cols]))
    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
    got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                       for c in CompiledQuery(cfg, vexps, store)().columns]))
    assert got == want, "single-chip vs oracle under skew"

    dq = auto.distribute(cfg, store, vexps, mesh)
    dist_rows = sorted(zip(*[np.asarray(c, np.int64).tolist()
                             for _, _, c in dq()]))
    assert dist_rows == want, "distributed vs oracle under skew"

    pjs = list(dq.part_joins.values())
    assert pjs, "skew test fell back to a replicated join: vacuous"
    n_rows = len(sk)
    for pj in pjs:
        caps = pj["caps"]
        assert caps["heavy"], "hot key not detected by the heavy round"
        # bounded growth: exchange caps stay near uniform (the hot key's
        # ~n/2 probes would otherwise force cap_l >= n/2 at one owner)
        uniform = 2 * -(-dq.shard_rows // 8) + 64
        assert caps["cap_l"] <= 2 * uniform, caps
        assert caps["cap_pairs"] <= 4 * uniform, caps
