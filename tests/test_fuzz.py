"""Property-based testing: random relational plans executed by the TPU
engine must match the independent numpy/pandas oracle row-for-row.

The generator builds RelExpr trees directly (scan -> selects -> arithmetic
project -> group-by) over the generated TPC-H lineitem table, with literal
operands drawn from the live column ranges so predicates have varied
selectivity.  This covers the inference/compilation surface the fixed
query corpora cannot: arbitrary operator nestings, degenerate predicates
(all rows / no rows), single- and multi-key group-bys, and every fold op.
Replaces the reference's commented-out tasty skeleton (SURVEY.md §4,
tests/Tests.hs:17-18) with an actual property harness.
"""

import random

import numpy as np
import pytest

from mplan2vdl_tpu import mplan as M
from mplan2vdl_tpu.mtypes import DDecimal

LI = "lineitem"
# (column, lo, hi) — value columns for predicates/arithmetic
VALUE_COLS = [
    ("l_quantity", 100, 5000),
    ("l_extendedprice", 90101, 6520000),
    ("l_discount", 0, 10),
    ("l_tax", 0, 8),
    ("l_shipdate", 727564, 729933),
    ("l_linenumber", 1, 7),
]
# low-cardinality columns usable as group keys (composite stays < 65 bits)
KEY_COLS = ["l_returnflag", "l_linestatus", "l_shipmode", "l_shipinstruct"]


def _ref(col):
    return M.MRef(name=(LI, col))


def _lit(v):
    return M.MLiteral(DDecimal(0), int(v))


def _rand_pred(rng):
    if rng.random() < 0.15:
        kcol = rng.choice(KEY_COLS)
        vals = sorted({rng.randint(0, 7) for _ in range(rng.randint(1, 3))})
        return M.MIn(_ref(kcol), tuple(_lit(v) for v in vals))
    col, lo, hi = rng.choice(VALUE_COLS)
    op = rng.choice([M.LT, M.GT, M.LEQ, M.GEQ, M.EQ, M.NEQ])
    # skew literals toward the value range but include out-of-range edges
    v = rng.choice([lo, hi, rng.randint(lo, hi),
                    rng.randint(lo, hi), lo - 1, hi + 1])
    p = M.MBinop(op, _ref(col), _lit(v))
    if rng.random() < 0.4:
        col2, lo2, hi2 = rng.choice(VALUE_COLS)
        q = M.MBinop(rng.choice([M.LT, M.GEQ]), _ref(col2),
                     _lit(rng.randint(lo2, hi2)))
        p = M.MBinop(rng.choice([M.LOGAND, M.LOGOR]), p, q)
    return p


def _rand_expr(rng, depth=0):
    r = rng.random()
    if depth < 2 and r < 0.12:
        return M.MIfThenElse(_rand_pred(rng), _rand_expr(rng, depth + 1),
                             _rand_expr(rng, depth + 1))
    if depth < 2 and r < 0.2:
        # truncating division by a nonzero constant (tdiv semantics)
        return M.MBinop(M.DIV, _rand_expr(rng, depth + 1),
                        _lit(rng.randint(1, 50)))
    if depth < 2 and r < 0.26:
        return M.MUnary(M.NEG, M.MBinop(
            rng.choice([M.LT, M.GEQ]),
            _ref(rng.choice(VALUE_COLS)[0]), _lit(rng.randint(0, 6000))))
    if depth >= 2 or r < 0.55:
        if rng.random() < 0.75:
            return _ref(rng.choice(VALUE_COLS)[0])
        return _lit(rng.randint(1, 100))
    op = rng.choice([M.ADD, M.SUB, M.MUL, M.MIN, M.MAX])
    return M.MBinop(op, _rand_expr(rng, depth + 1),
                    _rand_expr(rng, depth + 1))


def _rand_plan(rng):
    cols = tuple(((LI, c), None) for c, _, _ in VALUE_COLS) + tuple(
        ((LI, c), None) for c in KEY_COLS)
    rel = M.RTable(tablename=(LI,), tablecolumns=cols)
    for _ in range(rng.randint(0, 2)):
        rel = M.RSelect(child=rel, predicate=_rand_pred(rng))
    nkeys = rng.randint(0, 2)
    keys = tuple(((LI, k), None)
                 for k in rng.sample(KEY_COLS, nkeys))
    aggs = []
    for i in range(rng.randint(1, 3)):
        kind = rng.random()
        if kind < 0.2:
            agg = M.GCount()
        elif kind < 0.35:
            agg = M.GAvg(_rand_expr(rng))
        else:
            agg = M.GFold(rng.choice([M.FSUM, M.FMAX, M.FMIN]),
                          _rand_expr(rng))
        aggs.append((agg, ("out%d" % i,)))
    for k, _ in keys:
        aggs.append((M.GFold(M.FCHOOSE, M.MRef(name=k)), (k[-1],)))
    return M.RGroupBy(child=rel, inputkeys=keys, outputaggs=tuple(aggs))


@pytest.fixture(scope="module")
def fuzz_setup():
    from mplan2vdl_tpu.engine import datagen

    store = datagen.generate(sf=0.002, seed=1)
    return store, store.make_catalog()


@pytest.mark.parametrize("seed", range(40))
def test_random_plan_matches_oracle(fuzz_setup, seed):
    from mplan2vdl_tpu import passes, vir
    from mplan2vdl_tpu.engine.lower import CompiledQuery
    from mplan2vdl_tpu.oracle import relinterp

    store, cfg = fuzz_setup
    rng = random.Random(seed)
    m = _rand_plan(rng)

    oracle = relinterp.run_oracle(store, m)
    want = [np.asarray(a, np.int64) for _, a in oracle.cols]

    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
    res = CompiledQuery(cfg, vexps, store)()
    got = [np.asarray(c, np.int64) for c in res.columns]

    assert len(got) == len(want), (len(got), len(want))
    grows = sorted(zip(*[g.tolist() for g in got])) if got else []
    wrows = sorted(zip(*[w.tolist() for w in want])) if want else []
    assert grows == wrows, f"seed {seed}: {grows[:4]} vs {wrows[:4]}"
