"""Frontend gates: every committed plan corpus parses; the SF10 catalog
reconstructs; the noorder suites lower to Mplan and VIR (SURVEY.md §7.2
steps 1-3)."""

import glob
import os

import pytest

from mplan2vdl_tpu.fe import lexer, plan_parser, schema_parser
from mplan2vdl_tpu import mplan, vir, passes

REFERENCE = "/root/reference"
TESTS = os.path.join(REFERENCE, "tests")


def _plan_files(corpus):
    pats = [os.path.join(TESTS, corpus, "*.mplan"),
            os.path.join(TESTS, corpus, "*plan")]
    out = []
    for p in pats:
        out += glob.glob(p)
    return sorted(set(f for f in out if not f.endswith(".csv")))


ALL_CORPORA = ["tpch10noorder", "tpchnoorder", "monetpch", "modtpch", "simple"]


@pytest.mark.parametrize("corpus", ALL_CORPORA)
def test_parse_corpus(corpus):
    files = _plan_files(corpus)
    assert files, f"no plan files found in {corpus}"
    for f in files:
        rel = plan_parser.from_file(f)
        assert isinstance(rel, (plan_parser.Leaf, plan_parser.Node)), f


def test_parse_schema():
    tables = schema_parser.from_file(
        os.path.join(TESTS, "tpch10noorder", "schema.msqldump"))
    names = {t.name for t in tables}
    assert ("lineitem",) in names and ("region",) in names
    li = next(t for t in tables if t.name == ("lineitem",))
    assert li.pkey.cols == (("l_orderkey",), ("l_linenumber",))
    assert len(li.fkeys) == 4
    ps = next(t for t in tables if t.name == ("partsupp",))
    assert len(ps.pkey.cols) == 2


def test_catalog(tpch10_config):
    cfg = tpch10_config
    _, info = cfg.col(("lineitem", "l_orderkey"))
    assert info.count == 59986052
    # trailing-zeros / dict-code columns
    _, rf = cfg.col(("lineitem", "l_returnflag"))
    assert rf.trailing_zeros > 0
    # '%'-prefixed constraint alias (Config.hs:146)
    _, fk = cfg.col(("lineitem", "%lineitem_orders"))
    assert fk.bounds[0] == 0
    # dictionary pins
    assert cfg.dictionary["BRAZIL"] == 72
    # fk machinery: implicit pair resolves
    pf = cfg.is_partial_fk((("lineitem", "l_orderkey"), ("orders", "o_orderkey")))
    assert pf is not None and pf[0] == "fact_dim"
    pf2 = cfg.is_partial_fk((("orders", "o_orderkey"), ("lineitem", "l_orderkey")))
    assert pf2 is not None and pf2[0] == "dim_fact"
    # multi-column pk
    assert cfg.is_pkey((("partsupp", "ps_partkey"), ("partsupp", "ps_suppkey"))) \
        is not None


def test_date_encoding():
    import datetime
    # the l_shipdate SF10 bounds are day counts in the 1992-1998 window
    d = mplan.day_count(datetime.date(1992, 1, 1))
    assert 727000 < d < 729000
    assert mplan.day_count(datetime.date(1, 1, 1)) == 366
    assert mplan.add_months_rollover(datetime.date(1994, 1, 1), 12) \
        == datetime.date(1995, 1, 1)
    assert mplan.add_months_rollover(datetime.date(2005, 1, 30), 1) \
        == datetime.date(2005, 3, 2)


QUERIES = [f"{i:02d}" for i in range(1, 23)]

# Queries that cannot lower against the *committed* SF10 metadata snapshot:
#   22 — substring() needs the c_phone column dictionary, which the
#        committed dictionary.csv does not carry (it only pins the 91
#        strings appearing as query literals).
# All other 21 queries now compile here; the reference itself manages at
# most 17 against this snapshot (no general equijoin, no outer join, no
# substring, and it hard-errors on dictionary misses).
KNOWN_GAPS_COMMITTED_META = {"22"}


@pytest.mark.parametrize("q", QUERIES)
def test_mplan_lowering_tpch10(tpch10_config, q):
    f = os.path.join(TESTS, "tpch10noorder", f"{q}.sql.mplan")
    rel = plan_parser.from_file(f)
    try:
        m = mplan.mplan_from_parse_tree(rel, tpch10_config)
    except mplan.LowerError:
        assert q in KNOWN_GAPS_COMMITTED_META, f"{q} regressed"
        return
    m = mplan.fuse_selects(mplan.push_fk_joins(m))
    assert m is not None


@pytest.mark.parametrize("q", QUERIES)
def test_vir_lowering_tpch10(tpch10_config, q):
    f = os.path.join(TESTS, "tpch10noorder", f"{q}.sql.mplan")
    rel = plan_parser.from_file(f)
    try:
        m = mplan.mplan_from_parse_tree(rel, tpch10_config)
        m = mplan.fuse_selects(mplan.push_fk_joins(m))
        vexps = vir.vexps_from_mplan(m, tpch10_config)
    except (mplan.LowerError, vir.VirError):
        assert q in KNOWN_GAPS_COMMITTED_META, f"{q} regressed"
        return
    assert vexps
    cleaned = passes.engine_passes(vexps)
    assert len(cleaned) == len(vexps)
    for v in cleaned:
        assert v.info.count >= 0


def _testcases(path):
    """Split a --TEST-- fixture file into (sql, plan_text) pairs."""
    txt = open(path).read()
    out = []
    for chunk in txt.split("--TEST--")[1:]:
        lines = chunk.splitlines()
        sql, body = lines[0].strip(), "\n".join(lines[1:]).strip()
        if body:
            out.append((sql, body))
    return out


@pytest.mark.parametrize("fixture", ["ad_hoc_tests.txt",
                                     "detailed_tests.txt"])
def test_grammar_corner_case_fixtures(fixture):
    """Every plan in the reference's --TEST-- fixture files parses (the
    reference's intended tasty suite, tests/Tests.hs:20-63 — grammar
    corner cases: OR/FILTER/IN precedence, x<y<z intervals, LIKE forms,
    nested conjunct lists)."""
    from mplan2vdl_tpu.fe import lexer, plan_parser

    cases = _testcases(f"/root/reference/tests/{fixture}")
    assert cases, "fixture file parsed to zero cases"
    for sql, plan in cases:
        rel = plan_parser.parse(lexer.strip_plan_comments(plan))
        assert rel is not None, sql
