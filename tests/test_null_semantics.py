"""NULL semantics beyond count (VERDICT r4 missing #2 / next #5).

Outer-join right columns carry a nullmask; every aggregate and scalar
over them must implement SQL null semantics — not treat the 0-coerced
slots as real zeros:

  * min/max/avg/sum skip nulls (neutral-value substitution keeps the
    occupied-group slot set aligned with sibling folds)
  * all-null groups read 0 under the framework's NULL-encodes-as-0
    output convention (SQLite's NULL maps to 0 for comparison)
  * scalar expressions propagate nullability (arithmetic) or coerce to
    false (comparisons, LIKE, IN — SQL WHERE semantics)
  * isnull() consults the mask
  * LEFT OUTER with non-equality extra ON conditions keeps left rows
    whose every eq-pair fails the predicate, with NULL right payloads
    (the reference has no outer join at all, Vlite.hs:1223-1225)

Ground truth is SQLite — an independent engine — plus the in-house
numpy oracle for the join-shape cases.
"""

import sqlite3

import numpy as np
import pytest

from mplan2vdl_tpu import mplan as M
from mplan2vdl_tpu import passes, vir
from mplan2vdl_tpu.mtypes import DDecimal


@pytest.fixture(scope="module")
def setup():
    from mplan2vdl_tpu.engine import datagen

    store = datagen.generate(sf=0.01, seed=7)
    cfg = store.make_catalog()
    db = sqlite3.connect(":memory:")

    def load(tab, cols):
        arrs = [store.columns[(tab, c)] for c in cols]
        db.execute(f"CREATE TABLE {tab} "
                   f"({', '.join(c + ' INTEGER' for c in cols)})")
        db.executemany(
            f"INSERT INTO {tab} VALUES ({','.join('?' * len(cols))})",
            list(zip(*[[int(v) for v in a] for a in arrs])))

    load("customer", ["c_custkey"])
    load("orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    db.commit()
    return store, cfg, db


def _scan(tab, cols):
    return M.RTable(tablename=(tab,),
                    tablecolumns=tuple(((tab, c), None) for c in cols))


def _lit(v):
    return M.MLiteral(DDecimal(0), int(v))


def _outer(conds):
    return M.RJoin(leftch=_scan("customer", ["c_custkey"]),
                   rightch=_scan("orders", ["o_orderkey", "o_custkey",
                                            "o_totalprice"]),
                   conds=conds, joinvariant=M.LEFTOUTER)


_EQ = M.MBinop(M.EQ, M.MRef(("c_custkey",)), M.MRef(("o_custkey",)))


def _run(store, cfg, m):
    from mplan2vdl_tpu.engine.lower import CompiledQuery

    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
    res = CompiledQuery(cfg, vexps, store)()
    return sorted(zip(*[np.asarray(c, np.int64).tolist()
                        for c in res.columns])) if res.columns else []


def _sql(db, q):
    return sorted(tuple(0 if v is None else int(v) for v in r)
                  for r in db.execute(q))


def _oracle(store, m):
    from mplan2vdl_tpu.oracle import relinterp

    fr = relinterp.run_oracle(store, m)
    return sorted(zip(*[np.asarray(a, np.int64).tolist()
                        for _, a in fr.cols])) if fr.cols else []


def test_null_aware_min_max_sum_avg_count(setup):
    """Per-customer aggregates over the outer-joined order price: each
    no-order customer is an ALL-NULL group — SQLite returns NULL
    (mapped to 0), the engine must not leak the min/max neutral."""
    store, cfg, db = setup
    m = M.RGroupBy(
        child=_outer((_EQ,)),
        inputkeys=(((("c_custkey",)), None),),
        outputaggs=(
            (M.GFold(M.FCHOOSE, M.MRef(("c_custkey",))), ("k",)),
            (M.GFold(M.FMIN, M.MRef(("o_totalprice",))), ("mn",)),
            (M.GFold(M.FMAX, M.MRef(("o_totalprice",))), ("mx",)),
            (M.GFold(M.FSUM, M.MRef(("o_totalprice",))), ("sm",)),
            (M.GAvg(M.MRef(("o_totalprice",))), ("av",)),
            (M.GCount(col=("o_totalprice",)), ("cn",)),
            (M.GCount(), ("call",)),
        ))
    got = _run(store, cfg, m)
    want = _sql(db, """
        SELECT c.c_custkey, MIN(o_totalprice), MAX(o_totalprice),
               SUM(o_totalprice),
               CASE WHEN COUNT(o_totalprice) = 0 THEN 0
                    ELSE SUM(o_totalprice) / COUNT(o_totalprice) END,
               COUNT(o_totalprice), COUNT(*)
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey""")
    assert any(r[5] == 0 for r in want), "no all-null group generated"
    assert got == want


def test_null_aware_aggs_mixed_groups(setup):
    """Coarse key (custkey mod 7) mixes customers with and without
    orders inside one group: partially-null fold inputs."""
    store, cfg, db = setup
    proj = M.RProject(
        child=_outer((_EQ,)),
        projectout=(
            (M.MBinop(M.MOD, M.MRef(("c_custkey",)), _lit(7)), ("g",)),
            (M.MRef(("o_totalprice",)), ("tp",)),
            (M.MRef(("o_orderkey",)), ("ok",)),
        ))
    m = M.RGroupBy(
        child=proj,
        inputkeys=((("g",), None),),
        outputaggs=(
            (M.GFold(M.FCHOOSE, M.MRef(("g",))), ("k",)),
            (M.GFold(M.FMIN, M.MRef(("tp",))), ("mn",)),
            (M.GFold(M.FMAX, M.MRef(("tp",))), ("mx",)),
            (M.GAvg(M.MRef(("tp",))), ("av",)),
            (M.GCount(col=("ok",)), ("cn",)),
        ))
    got = _run(store, cfg, m)
    want = _sql(db, """
        SELECT c.c_custkey % 7, MIN(o_totalprice), MAX(o_totalprice),
               CASE WHEN COUNT(o_totalprice) = 0 THEN 0
                    ELSE SUM(o_totalprice) / COUNT(o_totalprice) END,
               COUNT(o_orderkey)
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY 1""")
    assert got == want


def test_null_arithmetic_propagates_into_agg(setup):
    """sum/avg over an ARITHMETIC expression of a nullable column: null
    slots must not contribute the coerced constant (2*0+5)."""
    store, cfg, db = setup
    expr = M.MBinop(M.ADD,
                    M.MBinop(M.MUL, M.MRef(("o_totalprice",)), _lit(2)),
                    _lit(5))
    m = M.RGroupBy(
        child=_outer((_EQ,)),
        inputkeys=(((("c_custkey",)), None),),
        outputaggs=(
            (M.GFold(M.FCHOOSE, M.MRef(("c_custkey",))), ("k",)),
            (M.GFold(M.FSUM, expr), ("sm",)),
            (M.GAvg(expr), ("av",)),
        ))
    got = _run(store, cfg, m)
    want = _sql(db, """
        SELECT c.c_custkey, SUM(o_totalprice * 2 + 5),
               CASE WHEN COUNT(o_totalprice) = 0 THEN 0
                    ELSE SUM(o_totalprice * 2 + 5)
                         / COUNT(o_totalprice) END
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey""")
    assert got == want


def test_comparison_on_nullable_reads_false(setup):
    """WHERE on a nullable column: NULL < x is not true — the no-order
    rows must drop even though their 0-coerced value passes the
    comparison numerically."""
    store, cfg, db = setup
    tp = np.asarray(setup[0].columns[("orders", "o_totalprice")])
    x = int(np.percentile(tp, 60))
    m = M.RSelect(
        child=_outer((_EQ,)),
        predicate=M.MBinop(M.LT, M.MRef(("o_totalprice",)), _lit(x)))
    m = M.RProject(child=m, projectout=(
        (M.MRef(("c_custkey",)), ("ck",)),
        (M.MRef(("o_orderkey",)), ("ok",))))
    got = _run(store, cfg, m)
    want = _sql(db, f"""
        SELECT c.c_custkey, o_orderkey
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE o_totalprice < {x}""")
    assert got == want


def test_isnull_consults_mask(setup):
    store, cfg, db = setup
    m = M.RProject(child=_outer((_EQ,)), projectout=(
        (M.MRef(("c_custkey",)), ("ck",)),
        (M.MUnary(M.ISNULL, M.MRef(("o_orderkey",))), ("isn",))))
    got = _run(store, cfg, m)
    want = _sql(db, """
        SELECT c.c_custkey,
               CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey""")
    assert any(r[1] == 1 for r in want), "no null rows generated"
    assert got == want


def test_left_outer_with_extra_condition(setup):
    """LEFT OUTER ... ON eq AND o_totalprice > x: left rows whose every
    eq-pair fails the extra predicate surface once with NULL payloads.
    Checked against BOTH SQLite and the numpy oracle."""
    store, cfg, db = setup
    tp = np.asarray(store.columns[("orders", "o_totalprice")])
    x = int(np.percentile(tp, 75))
    join = _outer((_EQ, M.MBinop(M.GT, M.MRef(("o_totalprice",)),
                                 _lit(x))))
    m = M.RProject(child=join, projectout=(
        (M.MRef(("c_custkey",)), ("ck",)),
        (M.MRef(("o_orderkey",)), ("ok",)),
        (M.MRef(("o_totalprice",)), ("tp",))))
    got = _run(store, cfg, m)
    want = _sql(db, f"""
        SELECT c.c_custkey, o_orderkey, o_totalprice
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o_totalprice > {x}""")
    assert got == want
    assert got == _oracle(store, m)


def test_left_outer_extra_condition_then_null_aggs(setup):
    """The two features composed: extra-condition outer join feeding
    null-aware aggregates (the partially-qualified rows produce fresh
    nullmasks through the pair-marking path)."""
    store, cfg, db = setup
    tp = np.asarray(store.columns[("orders", "o_totalprice")])
    x = int(np.percentile(tp, 75))
    join = _outer((_EQ, M.MBinop(M.GT, M.MRef(("o_totalprice",)),
                                 _lit(x))))
    m = M.RGroupBy(
        child=join,
        inputkeys=(((("c_custkey",)), None),),
        outputaggs=(
            (M.GFold(M.FCHOOSE, M.MRef(("c_custkey",))), ("k",)),
            (M.GFold(M.FMIN, M.MRef(("o_totalprice",))), ("mn",)),
            (M.GCount(col=("o_orderkey",)), ("cn",)),
        ))
    got = _run(store, cfg, m)
    want = _sql(db, f"""
        SELECT c.c_custkey, MIN(o_totalprice), COUNT(o_orderkey)
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o_totalprice > {x}
        GROUP BY c.c_custkey""")
    assert any(r[2] == 0 for r in want), "no all-null group generated"
    assert got == want


def test_null_aggs_distribute(setup):
    """The null-aware fold DAG (neutral substitution + count folds +
    group-stage nz masking) distributes through parallel/auto and
    matches the single-chip rows."""
    import jax

    from mplan2vdl_tpu import passes, vir
    from mplan2vdl_tpu.parallel import auto, dist

    store, cfg, db = setup
    m = M.RGroupBy(
        child=_outer((_EQ,)),
        inputkeys=(((("c_custkey",)), None),),
        outputaggs=(
            (M.GFold(M.FCHOOSE, M.MRef(("c_custkey",))), ("k",)),
            (M.GFold(M.FMIN, M.MRef(("o_totalprice",))), ("mn",)),
            (M.GAvg(M.MRef(("o_totalprice",))), ("av",)),
            (M.GCount(col=("o_orderkey",)), ("cn",)),
        ))
    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
    mesh = dist.make_mesh(jax.devices()[:8])
    dq = auto.distribute(cfg, store, vexps, mesh)
    got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                       for _, _, c in dq()]))
    assert got == _run(store, cfg, m)


def test_outer_extra_condition_distributes(setup):
    """The pair-marking outer join (extra ON conditions) is a DAG of
    ordinary gathers/folds/scatters over the JOUTER stream — it must
    ride the distributed planner too (rowset mode: no aggregate
    stage)."""
    import jax

    from mplan2vdl_tpu import passes, vir
    from mplan2vdl_tpu.parallel import auto, dist

    store, cfg, db = setup
    tp = np.asarray(store.columns[("orders", "o_totalprice")])
    x = int(np.percentile(tp, 75))
    join = _outer((_EQ, M.MBinop(M.GT, M.MRef(("o_totalprice",)),
                                 _lit(x))))
    m = M.RProject(child=join, projectout=(
        (M.MRef(("c_custkey",)), ("ck",)),
        (M.MRef(("o_orderkey",)), ("ok",))))
    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
    mesh = dist.make_mesh(jax.devices()[:8])
    try:
        dq = auto.distribute(cfg, store, vexps, mesh)
    except auto.NotDistributable as e:
        pytest.skip(f"planner declines this shape: {e}")
    got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                       for _, _, c in dq()]))
    assert got == _run(store, cfg, m)
