"""The three FK-join corner shapes the reference cannot compile at all
(Vlite.hs:1223-1246) and the FK-gather strategy here declines
(vir.handle_gather_join): each must route to the general JoinIndex
equijoin and match the oracle row-for-row (VERDICT r2 item 9).

Corners:
  1. anti-join keeping the dimension side (LEFTANTI, DIM_FACT order)
  2. an FK join variant with no gather specialization (LEFTOUTER)
  3. self-join on a PK where BOTH children are filtered

Each test asserts two things: the FK-gather path was genuinely attempted
and declined (so the test pins the corner, not some earlier dispatch),
and the fallback's rows equal the independent numpy/pandas oracle.
"""

import numpy as np
import pytest

from mplan2vdl_tpu import mplan as M
from mplan2vdl_tpu import passes, vir
from mplan2vdl_tpu.mtypes import DDecimal


@pytest.fixture(scope="module")
def setup():
    from mplan2vdl_tpu.engine import datagen

    store = datagen.generate(sf=0.002, seed=3)
    return store, store.make_catalog()


def _scan(tab, cols, aliases=None):
    aliases = aliases or {}
    return M.RTable(tablename=(tab,),
                    tablecolumns=tuple(((tab, c), aliases.get(c))
                                       for c in cols))


def _lit(v):
    return M.MLiteral(DDecimal(0), int(v))


class _GatherJoinSpy:
    """Wraps vir.handle_gather_join; records that it was called and raised
    (i.e. the FK strategy was attempted for this plan and declined)."""

    def __init__(self):
        self.calls = 0
        self.declined = 0
        self._orig = vir.handle_gather_join

    def __call__(self, *a, **kw):
        self.calls += 1
        try:
            return self._orig(*a, **kw)
        except vir.VirError:
            self.declined += 1
            raise


def _run_corner(store, cfg, m, monkeypatch):
    from mplan2vdl_tpu.engine.lower import CompiledQuery
    from mplan2vdl_tpu.oracle import relinterp

    spy = _GatherJoinSpy()
    monkeypatch.setattr(vir, "handle_gather_join", spy)
    vexps = passes.engine_passes(vir.vexps_from_mplan(m, cfg))
    assert spy.calls >= 1, "FK-gather strategy never attempted"
    assert spy.declined >= 1, "corner not reached: FK-gather handled it"

    res = CompiledQuery(cfg, vexps, store)()
    got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                       for c in res.columns])) if res.columns else []
    oracle = relinterp.run_oracle(store, m)
    want = sorted(zip(*[np.asarray(a, np.int64).tolist()
                        for _, a in oracle.cols])) if oracle.cols else []
    assert len(got) == len(want), (len(got), len(want))
    assert got == want
    return len(got)


def test_antijoin_keeping_dim_side(setup, monkeypatch):
    """orders ANTIJOIN lineitem on the FK pair, keeping orders (the dim
    side): 'orders no surviving lineitem references' — the reference
    raises at Vlite.hs:1232; here the corner falls back to JANTI."""
    store, cfg = setup
    li = M.RSelect(child=_scan("lineitem", ["l_orderkey", "l_quantity"]),
                   predicate=M.MBinop(M.LT, M.MRef(("lineitem",
                                                    "l_quantity")),
                                      _lit(500)))
    m = M.RJoin(
        leftch=_scan("orders", ["o_orderkey", "o_custkey"]),
        rightch=li,
        conds=(M.MBinop(M.EQ, M.MRef(("orders", "o_orderkey")),
                        M.MRef(("lineitem", "l_orderkey"))),),
        joinvariant=M.LEFTANTI)
    n = _run_corner(store, cfg, m, monkeypatch)
    assert 0 < n < store.table_count(("orders",))


def test_left_outer_on_fk_join(setup, monkeypatch):
    """lineitem LEFT OUTER orders (dim side pre-filtered so unmatched
    rows exist): no FK-gather specialization exists for LeftOuter
    (reference: Vlite.hs:1223-1225 'left outer join unimplemented');
    falls back to the JOUTER_* JoinIndex triple."""
    store, cfg = setup
    od = M.RSelect(child=_scan("orders", ["o_orderkey", "o_custkey"]),
                   predicate=M.MBinop(M.LT, M.MRef(("orders", "o_custkey")),
                                      _lit(200)))
    m = M.RJoin(
        leftch=_scan("lineitem", ["l_orderkey", "l_linenumber"]),
        rightch=od,
        conds=(M.MBinop(M.EQ, M.MRef(("lineitem", "l_orderkey")),
                        M.MRef(("orders", "o_orderkey"))),),
        joinvariant=M.LEFTOUTER)
    n = _run_corner(store, cfg, m, monkeypatch)
    # outer join: every lineitem row survives
    assert n == store.table_count(("lineitem",))


def test_self_join_both_sides_filtered(setup, monkeypatch):
    """orders PK self-join where BOTH children are filtered — the
    reference handles a self-join only when one side is the unfiltered
    identity (Vlite.hs:1234-1246); here it falls back to the general
    equijoin on the PK values."""
    store, cfg = setup
    left = M.RSelect(child=_scan("orders", ["o_orderkey", "o_custkey"]),
                     predicate=M.MBinop(M.LT,
                                        M.MRef(("orders", "o_custkey")),
                                        _lit(400)))
    right = M.RSelect(
        child=_scan("orders", ["o_orderkey", "o_totalprice"],
                    aliases={"o_orderkey": ("O2", "o_orderkey"),
                             "o_totalprice": ("O2", "o_totalprice")}),
        predicate=M.MBinop(M.GT, M.MRef(("O2", "o_totalprice")),
                           _lit(1000)))
    m = M.RJoin(
        leftch=left, rightch=right,
        conds=(M.MBinop(M.EQ, M.MRef(("orders", "o_orderkey")),
                        M.MRef(("O2", "o_orderkey"))),),
        joinvariant=M.PLAIN)
    n = _run_corner(store, cfg, m, monkeypatch)
    assert n > 0
