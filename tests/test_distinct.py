"""count(distinct) as a first-class fold (VERDICT r1 item 8).

Covers the full stack: the `unique` call-modifier parse, GCountDistinct
lowering to Fold(FDistinct), the engine's sort+adjacent-unique lowering
(dense AND sparse group domains), the numpy oracle, an independent SQLite
cross-check, VDL emission (FoldDistinct extension vocabulary), and the
distributed groupby-of-groupby decomposition on the 8-device mesh.
"""

import numpy as np
import pytest

# group by l_linestatus (dense domain) / l_orderkey (sparse domain),
# counting distinct suppliers and parts per group
PLAN_DENSE = """project (
| group by (
| | table(sys.lineitem) [ lineitem.l_linestatus NOT NULL,
| |   lineitem.l_suppkey NOT NULL, lineitem.l_quantity NOT NULL ] COUNT
| ) [ lineitem.l_linestatus ] [ lineitem.l_linestatus,
|   sys.count unique no nil (lineitem.l_suppkey) NOT NULL as L1.L1,
|   sys.count no nil (lineitem.l_quantity) NOT NULL as L2.L2 ]
) [ lineitem.l_linestatus, L1 NOT NULL, L2 NOT NULL ]
"""

PLAN_SPARSE = """project (
| group by (
| | table(sys.lineitem) [ lineitem.l_orderkey NOT NULL,
| |   lineitem.l_suppkey NOT NULL ] COUNT
| ) [ lineitem.l_orderkey ] [ lineitem.l_orderkey,
|   sys.count unique no nil (lineitem.l_suppkey) NOT NULL as L1.L1 ]
) [ lineitem.l_orderkey, L1 NOT NULL ]
"""


@pytest.fixture(scope="module")
def store_cfg():
    from mplan2vdl_tpu.engine import datagen

    store = datagen.generate(sf=0.02, seed=11)
    return store, store.make_catalog()


def _compile(cfg, text):
    from mplan2vdl_tpu import mplan, passes, vir
    from mplan2vdl_tpu.fe import lexer, plan_parser

    rel = plan_parser.parse(lexer.strip_plan_comments(text))
    m = mplan.fuse_selects(mplan.push_fk_joins(
        mplan.mplan_from_parse_tree(rel, cfg)))
    return passes.engine_passes(vir.vexps_from_mplan(m, cfg))


def _numpy_distinct(store, keycol, valcol):
    k = np.asarray(store.columns[("lineitem", keycol)], np.int64)
    v = np.asarray(store.columns[("lineitem", valcol)], np.int64)
    pairs = np.unique(np.stack([k, v], axis=1), axis=0)
    keys, counts = np.unique(pairs[:, 0], return_counts=True)
    return dict(zip(keys.tolist(), counts.tolist()))


@pytest.mark.parametrize("plan,keycol", [(PLAN_DENSE, "l_linestatus"),
                                         (PLAN_SPARSE, "l_orderkey")])
def test_engine_matches_numpy(store_cfg, plan, keycol):
    from mplan2vdl_tpu.engine.lower import CompiledQuery

    store, cfg = store_cfg
    vexps = _compile(cfg, plan)
    res = CompiledQuery(cfg, vexps, store)()
    got = dict(zip(np.asarray(res.columns[0], np.int64).tolist(),
                   np.asarray(res.columns[1], np.int64).tolist()))
    want = _numpy_distinct(store, keycol, "l_suppkey")
    assert got == want


def test_engine_matches_relinterp_oracle(store_cfg):
    from mplan2vdl_tpu import mplan
    from mplan2vdl_tpu.engine.lower import CompiledQuery
    from mplan2vdl_tpu.fe import lexer, plan_parser
    from mplan2vdl_tpu.oracle.relinterp import run_oracle

    store, cfg = store_cfg
    rel = plan_parser.parse(lexer.strip_plan_comments(PLAN_DENSE))
    m = mplan.fuse_selects(mplan.push_fk_joins(
        mplan.mplan_from_parse_tree(rel, cfg)))
    oracle = run_oracle(store, m)
    ocols = [np.asarray(c, np.int64) for _, c in oracle.cols]

    vexps = _compile(cfg, PLAN_DENSE)
    res = CompiledQuery(cfg, vexps, store)()
    got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                       for c in res.columns]))
    want = sorted(zip(*[c.tolist() for c in ocols]))
    assert got == want


def test_matches_sqlite(store_cfg):
    import sqlite3

    from mplan2vdl_tpu.engine.lower import CompiledQuery

    store, cfg = store_cfg
    db = sqlite3.connect(":memory:")
    k = np.asarray(store.columns[("lineitem", "l_linestatus")]).tolist()
    v = np.asarray(store.columns[("lineitem", "l_suppkey")]).tolist()
    db.execute("CREATE TABLE li (ls INTEGER, sk INTEGER)")
    db.executemany("INSERT INTO li VALUES (?,?)", zip(k, v))
    want = sorted(db.execute(
        "SELECT ls, COUNT(DISTINCT sk) FROM li GROUP BY ls").fetchall())

    vexps = _compile(cfg, PLAN_DENSE)
    res = CompiledQuery(cfg, vexps, store)()
    got = sorted(zip(np.asarray(res.columns[0], np.int64).tolist(),
                     np.asarray(res.columns[1], np.int64).tolist()))
    assert got == want


def test_vdl_emits_folddistinct(store_cfg):
    from mplan2vdl_tpu.vdl_emit import emit_vdl

    store, cfg = store_cfg
    vexps = _compile(cfg, PLAN_DENSE)
    txt = emit_vdl(vexps, cfg)
    assert "FoldDistinct" in txt


@pytest.mark.parametrize("plan,keycol", [(PLAN_DENSE, "l_linestatus"),
                                         (PLAN_SPARSE, "l_orderkey")])
def test_distributed_matches_single_chip(store_cfg, plan, keycol):
    import jax

    from mplan2vdl_tpu.engine.lower import CompiledQuery
    from mplan2vdl_tpu.parallel import auto, dist

    store, cfg = store_cfg
    mesh = dist.make_mesh(jax.devices()[:8])
    vexps = _compile(cfg, plan)
    dq = auto.distribute(cfg, store, vexps, mesh)
    dist_cols = dq()
    single = CompiledQuery(cfg, vexps, store)()
    got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                       for _, _, c in dist_cols]))
    want = sorted(zip(*[np.asarray(c, np.int64).tolist()
                        for c in single.columns]))
    assert got == want


def test_fmask_predication_path(store_cfg):
    """A Select above the group-by: predication folds the filter into the
    FDistinct fmask; the masked distinct count must match numpy."""
    from mplan2vdl_tpu.engine.lower import CompiledQuery

    store, cfg = store_cfg
    plan = """project (
| group by (
| | select (
| | | table(sys.lineitem) [ lineitem.l_linestatus NOT NULL,
| | |   lineitem.l_suppkey NOT NULL, lineitem.l_quantity NOT NULL ] COUNT
| | ) [ lineitem.l_quantity NOT NULL < tinyint "25" ]
| ) [ lineitem.l_linestatus ] [ lineitem.l_linestatus,
|   sys.count unique no nil (lineitem.l_suppkey) NOT NULL as L1.L1 ]
) [ lineitem.l_linestatus, L1 NOT NULL ]
"""
    vexps = _compile(cfg, plan)
    res = CompiledQuery(cfg, vexps, store)()
    got = dict(zip(np.asarray(res.columns[0], np.int64).tolist(),
                   np.asarray(res.columns[1], np.int64).tolist()))
    ls = np.asarray(store.columns[("lineitem", "l_linestatus")], np.int64)
    sk = np.asarray(store.columns[("lineitem", "l_suppkey")], np.int64)
    qt = np.asarray(store.columns[("lineitem", "l_quantity")], np.int64)
    m = qt < 25
    pairs = np.unique(np.stack([ls[m], sk[m]], axis=1), axis=0)
    keys, counts = np.unique(pairs[:, 0], return_counts=True)
    assert got == dict(zip(keys.tolist(), counts.tolist()))
