"""Automatic distributed execution: ALL 22 TPC-H noorder mplans run over
the 8-device mesh straight from the vector IR, matching the single-chip
engine row-exactly."""

import os

import numpy as np
import pytest

TPCH10 = "/root/reference/tests/tpch10noorder"


@pytest.fixture(scope="session")
def dist_setup():
    import jax
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.parallel import dist

    store = datagen.generate(sf=0.01, seed=7)
    cfg = store.make_catalog()
    mesh = dist.make_mesh(jax.devices()[:8])
    return store, cfg, mesh


@pytest.mark.parametrize("q", [f"{i:02d}" for i in range(1, 23)])
def test_auto_distributed_matches_single_chip(dist_setup, q):
    from mplan2vdl_tpu import mplan, passes, vir
    from mplan2vdl_tpu.engine.lower import CompiledQuery
    from mplan2vdl_tpu.fe import lexer, plan_parser
    from mplan2vdl_tpu.parallel import auto

    store, cfg, mesh = dist_setup
    with open(os.path.join(TPCH10, f"{q}.sql.mplan")) as f:
        text = f.read()
    rel = plan_parser.parse(lexer.strip_plan_comments(text))
    m = mplan.fuse_selects(mplan.push_fk_joins(
        mplan.mplan_from_parse_tree(rel, cfg)))
    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))

    dq = auto.distribute(cfg, store, vexps, mesh)  # all 22 must qualify
    dist_cols = dq()

    single = CompiledQuery(cfg, vexps, store)()
    assert len(dist_cols) == len(single.columns)
    got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                       for _, _, c in dist_cols]))
    want = sorted(zip(*[np.asarray(c, np.int64).tolist()
                        for c in single.columns]))
    assert got == want


@pytest.mark.parametrize("q", ["13", "17"])
def test_counting_prepass_is_distributed(dist_setup, monkeypatch, q):
    """Join-expansion buffer bounds come from the distributed counting
    rounds (psum of per-shard local-probe matches), never from running the
    WHOLE query on one chip — and they must equal the single-chip counts.
    Q13 (rowid-probe outer join) and Q17 (join-expansion fold frame)."""
    from mplan2vdl_tpu import mplan, passes, vir
    from mplan2vdl_tpu.engine import lower
    from mplan2vdl_tpu.fe import lexer, plan_parser
    from mplan2vdl_tpu.parallel import auto

    store, cfg, mesh = dist_setup
    with open(os.path.join(TPCH10, f"{q}.sql.mplan")) as f:
        text = f.read()
    rel = plan_parser.parse(lexer.strip_plan_comments(text))
    m = mplan.fuse_selects(mplan.push_fk_joins(
        mplan.mplan_from_parse_tree(rel, cfg)))
    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))

    want = dict(lower.CompiledQuery(cfg, vexps, store).join_sizes)
    assert want, "query must exercise join sizing"

    seen_roots = []
    orig = lower.CompiledQuery.__init__

    def spy(self, cfg_, roots, store_, *a, **k):
        seen_roots.append({v.skey for v in roots})
        return orig(self, cfg_, roots, store_, *a, **k)

    monkeypatch.setattr(lower.CompiledQuery, "__init__", spy)
    dq = auto.distribute(cfg, store, vexps, mesh)

    full_keys = {v.skey for v in vexps}
    assert all(r != full_keys for r in seen_roots), \
        "auto-distribution ran the full query single-chip"
    # sizes live in join_sizes (replicated-right path) or in the
    # partitioned shuffle join's exchange stats (caps["total"])
    got_sizes = dict(dq.join_sizes)
    got_sizes.update({k: pj["caps"]["total"]
                      for k, pj in dq.part_joins.items()})
    shared = set(got_sizes) & set(want)
    assert shared, "distributed plan resolved no join sizes"
    for key in shared:
        assert got_sizes[key] == want[key]


def test_cli_run_devices_matches_single_chip(dist_setup, capsys):
    """`run --devices 8` (the CLI's distributed mode) prints the same rows
    as the single-chip engine."""
    from mplan2vdl_tpu import cli

    plan = os.path.join(TPCH10, "03.sql.mplan")
    cli.main(["run", plan, "--cpu"])
    single = sorted(capsys.readouterr().out.strip().splitlines())
    cli.main(["run", plan, "--cpu", "--devices", "8"])
    dist_rows = sorted(capsys.readouterr().out.strip().splitlines())
    assert dist_rows == single


@pytest.mark.parametrize("q", ["13", "17", "21"])
def test_fact_frame_right_sides_use_shuffle_join(dist_setup, monkeypatch, q):
    """Q17/Q21 self-join right sides are fact-frame chains and Q13's outer
    right side is a dim-frame (orders) chain: they must run as distributed
    shuffle joins (range-partitioned build + probe routing) and replicate
    strictly less than the replicated-right fallback
    (MPLAN2VDL_NO_PART_JOIN=1)."""
    from mplan2vdl_tpu import mplan, passes, vir
    from mplan2vdl_tpu.fe import lexer, plan_parser
    from mplan2vdl_tpu.parallel import auto

    store, cfg, mesh = dist_setup
    with open(os.path.join(TPCH10, f"{q}.sql.mplan")) as f:
        text = f.read()
    rel = plan_parser.parse(lexer.strip_plan_comments(text))
    m = mplan.fuse_selects(mplan.push_fk_joins(
        mplan.mplan_from_parse_tree(rel, cfg)))
    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))

    dq = auto.distribute(cfg, store, vexps, mesh)
    n_part = len(dq.part_joins)
    part_full = [str(nm) for nm in dq.extra_full]

    monkeypatch.setenv("MPLAN2VDL_NO_PART_JOIN", "1")
    dq_repl = auto.distribute(cfg, store, vexps, mesh)
    repl_full = [str(nm) for nm in dq_repl.extra_full]

    assert n_part > 0
    # TPC-H key bounds all fit int32: the exchange must narrow its keys
    assert all(v["k32"] for v in dq.part_joins.values())
    if q == "17":  # the join was Q17's ONLY full-width region: none left
        assert part_full == [] and repl_full != []
    elif q == "13":  # orders ships SHARDED: no replicated dim columns
        assert [v["table"] for v in dq.part_joins.values()] == ["orders"]
        assert all(v["outer"] for v in dq.part_joins.values())
        assert dq.dim_loads == [] and len(dq.part_loads) > 0
        assert any(nm[0] == "orders" for nm in dq_repl.dim_loads)
    else:  # Q21's exists/anti machinery keeps its own full regions
        assert len(part_full) <= len(repl_full), (part_full, repl_full)


@pytest.mark.parametrize("q", ["13", "17", "21"])
def test_non_pushed_plans_distribute_exactly(dist_setup, q):
    """The CLI's default compilation path does NOT apply push_fk_joins:
    those plan shapes route row-identity chains through fullsrc gathers,
    whose values are already global — the fold-boundary globalization
    must not offset them again (regression: Q17 via `run --devices`)."""
    from mplan2vdl_tpu.engine.lower import CompiledQuery, plan_to_vexps
    from mplan2vdl_tpu.parallel import auto

    store, cfg, mesh = dist_setup
    with open(os.path.join(TPCH10, f"{q}.sql.mplan")) as f:
        vexps = plan_to_vexps(f.read(), cfg)
    dq = auto.distribute(cfg, store, vexps, mesh)
    got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                       for _, _, c in dq()]))
    single = CompiledQuery(cfg, vexps, store)()
    want = sorted(zip(*[np.asarray(c, np.int64).tolist()
                        for c in single.columns]))
    assert got == want


@pytest.mark.parametrize("q", ["02", "03", "10", "18"])
def test_ordered_topn_plans_distribute_in_order(dist_setup, q):
    """Unmodified monetpch plans (ORDER BY + top-N) distribute: the sort
    lives in the host-side group stage, so the fold stage shards as usual
    and the ordered output must match the single-chip engine IN ORDER
    (all 22 sweep exact offline; these four cover top-100/10/20 shapes
    with joins and outer aggregates)."""
    import jax

    from mplan2vdl_tpu import mplan, passes, vir
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.lower import CompiledQuery
    from mplan2vdl_tpu.fe import lexer, plan_parser
    from mplan2vdl_tpu.parallel import auto, dist

    _, _, mesh = dist_setup
    store = datagen.generate(sf=0.01, seed=7, legacy_fk_names=True)
    cfg = store.make_catalog()
    with open(f"/root/reference/tests/monetpch/{q}.sql.mplan") as f:
        text = f.read()
    rel = plan_parser.parse(lexer.strip_plan_comments(text))
    m = mplan.fuse_selects(mplan.push_fk_joins(
        mplan.mplan_from_parse_tree(rel, cfg)))
    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
    dq = auto.distribute(cfg, store, vexps, mesh)
    got = [np.asarray(c, np.int64).tolist() for _, _, c in dq()]
    want = [np.asarray(c, np.int64).tolist()
            for c in CompiledQuery(cfg, vexps, store)().columns]
    assert got == want  # ordered comparison — row order must match


def test_describe_distribution_plan(dist_setup, capsys):
    """`run --devices N --explain-dist` prints the distribution plan."""
    from mplan2vdl_tpu import cli

    plan = os.path.join(TPCH10, "13.sql.mplan")
    cli.main(["run", plan, "--cpu", "--devices", "8", "--explain-dist"])
    err = capsys.readouterr().err
    assert "fact table: customer" in err
    assert "partitioned shuffle join" in err and "OUTER" in err
    assert "orders.orders_customer" in err  # sharded, never replicated


def test_no_aggregate_distributes_as_rowset(dist_setup):
    """A pure projection/join plan distributes via ROWSET mode (r5;
    until then it raised NotDistributable) and matches single-chip in
    row order."""
    from mplan2vdl_tpu import mplan, passes, vir
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.lower import CompiledQuery
    from mplan2vdl_tpu.fe import lexer, plan_parser
    from mplan2vdl_tpu.parallel import auto

    _, _, mesh = dist_setup
    store = datagen.generate(sf=0.002, seed=7, legacy_fk_names=True)
    cfg = store.make_catalog()
    with open("/root/reference/tests/simple/simplejoin.mplan") as f:
        text = f.read()
    rel = plan_parser.parse(lexer.strip_plan_comments(text))
    m = mplan.fuse_selects(mplan.push_fk_joins(
        mplan.mplan_from_parse_tree(rel, cfg)))
    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
    dq = auto.distribute(cfg, store, vexps, mesh)
    assert dq.rowset
    got = [np.asarray(c, np.int64).tolist() for _, _, c in dq()]
    want = [np.asarray(c, np.int64).tolist()
            for c in CompiledQuery(cfg, vexps, store)().columns]
    assert got == want


def test_sparse_groupby_with_equijoins_distributes(dist_setup):
    """r4: an equijoin inside a SPARSE (rowid-domain > 2^20) group-by
    distributes through the shuffle-aggregation exchange instead of
    falling back single-chip — Q17's avg-quantity self-join groups by
    fact rowid.  Validated row-exact at a scale where the domain
    actually crosses the sparse threshold."""
    from mplan2vdl_tpu import passes
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.lower import CompiledQuery, plan_to_vexps
    from mplan2vdl_tpu.parallel import auto

    _, _, mesh = dist_setup
    store = datagen.generate(sf=0.2, seed=13)
    cfg = store.make_catalog()
    with open(os.path.join(TPCH10, "17.sql.mplan")) as f:
        text = f.read()
    vexps = passes.engine_passes(plan_to_vexps(text, cfg, True, False))
    dq = auto.distribute(cfg, store, vexps, mesh)
    assert dq.sparse, f"domain {dq.domain} did not cross the sparse gate"
    assert [x for fl in dq.folds for x in auto._joins_under(fl)]
    dist_cols = dq()
    single = CompiledQuery(cfg, vexps, store)()
    got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                       for _, _, c in dist_cols]))
    want = sorted(zip(*[np.asarray(c, np.int64).tolist()
                        for c in single.columns]))
    assert got == want


# ---------------------------------------------------------------- rowset mode
def _rowset_run(dist_setup, m):
    """Distribute a fold-less plan and compare against single chip IN ROW
    ORDER (rowset mode's contract is order preservation, not just set
    equality)."""
    from mplan2vdl_tpu import passes, vir
    from mplan2vdl_tpu.engine.lower import CompiledQuery
    from mplan2vdl_tpu.parallel import auto

    store, cfg, mesh = dist_setup
    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
    dq = auto.distribute(cfg, store, vexps, mesh)
    assert dq.rowset, "plan has no aggregate stage but rowset mode off"
    dist_cols = dq()
    single = CompiledQuery(cfg, vexps, store)()
    assert len(dist_cols) == len(single.columns)
    got = [np.asarray(c, np.int64).tolist() for _, _, c in dist_cols]
    want = [np.asarray(c, np.int64).tolist() for c in single.columns]
    assert got == want
    return got


def test_rowset_select_project(dist_setup):
    """Pure filter+project distributes (VERDICT r4 item 4: no
    'no aggregate stage' fallback): sharded rows, edge concat."""
    from mplan2vdl_tpu import mplan as M
    from mplan2vdl_tpu.mtypes import DDecimal

    li = M.RTable(tablename=("lineitem",),
                  tablecolumns=((("lineitem", "l_orderkey"), None),
                                (("lineitem", "l_quantity"), None),
                                (("lineitem", "l_discount"), None)))
    sel = M.RSelect(child=li, predicate=M.MBinop(
        M.LT, M.MRef(("l_quantity",)), M.MLiteral(DDecimal(0), 1500)))
    m = M.RProject(child=sel, projectout=(
        (M.MRef(("l_orderkey",)), ("ok",)),
        (M.MBinop(M.MUL, M.MRef(("l_quantity",)),
                  M.MRef(("l_discount",))), ("qd",))))
    got = _rowset_run(dist_setup, m)
    assert len(got[0]) > 0


def test_rowset_fk_join(dist_setup):
    """Fold-less FK join (lineitem -> orders): the gather-join algebra
    runs shard-local, outputs stay row-sharded."""
    from mplan2vdl_tpu import mplan as M
    from mplan2vdl_tpu.mtypes import DDecimal

    li = M.RTable(tablename=("lineitem",),
                  tablecolumns=((("lineitem", "l_orderkey"), None),
                                (("lineitem", "l_extendedprice"), None)))
    orders = M.RTable(tablename=("orders",),
                      tablecolumns=((("orders", "o_orderkey"), None),
                                    (("orders", "o_orderdate"), None)))
    join = M.RJoin(leftch=li, rightch=orders,
                   conds=(M.MBinop(M.EQ, M.MRef(("l_orderkey",)),
                                   M.MRef(("o_orderkey",))),),
                   joinvariant=M.PLAIN)
    sel = M.RSelect(child=join, predicate=M.MBinop(
        M.LT, M.MRef(("o_orderdate",)), M.MLiteral(DDecimal(0), 728000)))
    m = M.RProject(child=sel, projectout=(
        (M.MRef(("l_extendedprice",)), ("ep",)),
        (M.MRef(("o_orderdate",)), ("od",))))
    got = _rowset_run(dist_setup, m)
    assert len(got[0]) > 0
