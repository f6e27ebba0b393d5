"""Native runtime + kernel unit tests: parallel column stats, FK index
building, store persistence roundtrip, and the masked group-reduce that
replaces TPU's serialized scatter-add."""

import numpy as np
import pytest


def test_native_column_stats_matches_numpy():
    from mplan2vdl_tpu.engine import nativeio

    rng = np.random.default_rng(0)
    for dtype in (np.int32, np.int64):
        arr = (rng.integers(-1000, 10**6, size=100_001) * 4).astype(dtype)
        mn, mx, tz, n = nativeio.column_stats(arr)
        assert mn == arr.min() and mx == arr.max() and n == len(arr)
        g = int(np.bitwise_or.reduce(np.abs(arr).astype(np.int64)))
        assert tz == ((g & -g).bit_length() - 1)


def test_native_fk_index():
    from mplan2vdl_tpu.engine import nativeio

    rng = np.random.default_rng(1)
    dim = rng.permutation(np.arange(10, 5010))
    fact = dim[rng.integers(0, len(dim), size=40_000)]
    idx = nativeio.fk_index(fact, dim)
    assert np.array_equal(dim[idx], fact)
    with pytest.raises(ValueError):
        nativeio.fk_index(np.array([99999]), dim)


def test_store_roundtrip(tmp_path):
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.columnstore import ColumnStore

    store = datagen.generate(sf=0.002, seed=3)
    store.save(str(tmp_path / "s"))
    s2 = ColumnStore.load(str(tmp_path / "s"))
    for k, v in store.columns.items():
        assert np.array_equal(s2.columns[k], v), k
    assert s2.decoders == store.decoders


def test_masked_group_reduce():
    import jax

    from mplan2vdl_tpu.engine.kernels import segred

    rng = np.random.default_rng(2)
    n, domain = 5000, 9
    ids = rng.integers(0, domain + 1, size=n)  # domain = dump slot
    data = rng.integers(-100, 100, size=n).astype(np.int64)
    got_sum = np.asarray(segred.masked_group_reduce(
        jax.numpy.asarray(data), jax.numpy.asarray(ids), domain, "sum"))
    got_max = np.asarray(segred.masked_group_reduce(
        jax.numpy.asarray(data), jax.numpy.asarray(ids), domain, "max"))
    cnt = np.asarray(segred.group_counts(jax.numpy.asarray(ids), domain))
    for g in range(domain):
        m = ids == g
        assert got_sum[g] == data[m].sum()
        assert cnt[g] == m.sum()
        if m.any():
            assert got_max[g] == data[m].max()


def test_explain_smoke(tmp_path):
    from mplan2vdl_tpu import mplan, passes, vir
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.explain import explain_vexps
    from mplan2vdl_tpu.fe import lexer, plan_parser

    store = datagen.generate(sf=0.002, seed=4)
    cfg = store.make_catalog()
    with open("/root/reference/tests/tpch10noorder/06.sql.mplan") as f:
        rel = plan_parser.parse(lexer.strip_plan_comments(f.read()))
    vexps = passes.engine_passes(
        vir.vexps_from_mplan(mplan.mplan_from_parse_tree(rel, cfg), cfg))
    txt = explain_vexps(vexps)
    assert "Fold FSum masked" in txt  # predication fired
    assert "Load lineitem.l_extendedprice" in txt


def test_null_aware_count_q13_semantics():
    """Customers with no orders must appear in Q13's c_count=0 group (SQL
    semantics; the reference counts the null row as 1)."""
    import jax

    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.lower import compile_plan_text

    store = datagen.generate(sf=0.005, seed=9)
    cfg = store.make_catalog()
    with open("/root/reference/tests/tpch10noorder/13.sql.mplan") as f:
        res = compile_plan_text(f.read(), cfg, store)()
    rows = dict(zip(np.asarray(res.columns[0]).tolist(),
                    np.asarray(res.columns[1]).tolist()))
    orderless = len(set(range(1, store.table_count(("customer",)) + 1))
                    - set(store.columns[("orders", "o_custkey")].tolist()))
    assert rows.get(0, 0) == orderless


def test_cli_smoke(tmp_path, capsys):
    from mplan2vdl_tpu import cli

    B = "/root/reference/tests/tpch10noorder"
    meta = ["-b", f"{B}/bounds.csv", "-t", f"{B}/storage.csv",
            "-s", f"{B}/schema.msqldump", "--dictionary",
            f"{B}/dictionary.csv"]
    cli.main(["compile", f"{B}/06.sql.mplan"] + meta)
    out = capsys.readouterr().out
    assert "MaterializeCompact" in out and "FoldSum" in out
    cli.main(["compile", f"{B}/06.sql.mplan"] + meta + ["--vliteformat"])
    assert ",Output,decimal_4," in capsys.readouterr().out
    cli.main(["explain", f"{B}/06.sql.mplan"] + meta)
    assert "Fold FSum" in capsys.readouterr().out
    cli.main(["compile", f"{B}/03.sql.mplan"] + meta + ["--dot"])
    assert "digraph" in capsys.readouterr().out


def test_module_entry(monkeypatch, capsys):
    """``python -m mplan2vdl_tpu`` reaches the CLI (package __main__)."""
    import runpy
    import sys

    B = "/root/reference/tests/tpch10noorder"
    monkeypatch.setattr(sys, "argv", [
        "mplan2vdl_tpu", "compile", f"{B}/06.sql.mplan",
        "-b", f"{B}/bounds.csv", "-t", f"{B}/storage.csv",
        "-s", f"{B}/schema.msqldump", "--dictionary", f"{B}/dictionary.csv"])
    runpy.run_module("mplan2vdl_tpu", run_name="__main__")
    assert "FoldSum" in capsys.readouterr().out


def test_positional_fk_aliases(capsys):
    """MonetDB auto-names FK constraints <tab>_fk<N>; plans generated
    against such a database (the ordered monetpch corpus) must compile
    against a metadata snapshot whose join indexes carry descriptive
    names (lineitem_orders) — the catalog aliases them positionally,
    never shadowing schemas that already use fkN names (datagen's legacy
    mode declares them out of numbering order)."""
    from mplan2vdl_tpu import cli

    B = "/root/reference/tests/tpch10noorder"
    meta = ["-b", f"{B}/bounds.csv", "-t", f"{B}/storage.csv",
            "-s", f"{B}/schema.msqldump", "--dictionary",
            f"{B}/dictionary.csv", "-p"]
    # monetpch Q17 references lineitem.%lineitem_fk3 / fk1 names
    cli.main(["compile", "/root/reference/tests/monetpch/17.sql.mplan"]
             + meta)
    assert "FoldSum" in capsys.readouterr().out


def test_agg_strategies_conformance(capsys):
    """Reference aggregation strategies shape the emitted VDL
    (Vlite.hs:1076-1098, make2LevelFold :1173-1194): --agghierarchical
    doubles the fold chain (partials + combine), --aggshuffle inserts a
    VShuffle permutation, and sparse key domains (> 32000) force the
    shuffle even under the default strategy."""
    from mplan2vdl_tpu import cli

    B = "/root/reference/tests/tpch10noorder"
    meta = ["-b", f"{B}/bounds.csv", "-t", f"{B}/storage.csv",
            "-s", f"{B}/schema.msqldump", "--dictionary",
            f"{B}/dictionary.csv"]
    cli.main(["compile", f"{B}/01.sql.mplan"] + meta)
    serial = capsys.readouterr().out
    cli.main(["compile", f"{B}/01.sql.mplan"] + meta
             + ["--agghierarchical", "-g", "1024"])
    hier = capsys.readouterr().out
    assert hier.count("FoldSum") == 2 * serial.count("FoldSum")
    cli.main(["compile", f"{B}/01.sql.mplan"] + meta + ["--aggshuffle"])
    assert ",Shuffle," in capsys.readouterr().out
    assert ",Shuffle," not in serial
    # Q3's composite key domain exceeds 32000: shuffle is forced
    cli.main(["compile", f"{B}/03.sql.mplan"] + meta)
    assert ",Shuffle," in capsys.readouterr().out


def test_cost_report_roofline():
    """Whole-program HBM accounting: minimum scan bytes, XLA's actual
    bytes accessed, and the roofline floor (SURVEY §5 observability)."""
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.lower import compile_plan_text

    store = datagen.generate(sf=0.002, seed=5)
    cfg = store.make_catalog()
    with open("/root/reference/tests/tpch10noorder/06.sql.mplan") as f:
        cq = compile_plan_text(f.read(), cfg, store)
    rep = cq.cost_report(hbm_gbps=819.0)
    nrows = store.table_count(("lineitem",))
    assert rep["scan_bytes"] == 4 * 4 * nrows  # four int32 columns
    assert rep["roofline_floor_s"] > 0
    if rep["xla_bytes_accessed"]:
        assert rep["amplification"] >= 1.0


def test_cost_report_per_op_attribution():
    """Per-instruction traffic from the optimized HLO (engine/hloprof.py):
    Q3's sort-based join/group-by must show sort traffic, totals must
    cover at least the input scan."""
    from mplan2vdl_tpu.engine import datagen
    from mplan2vdl_tpu.engine.lower import compile_plan_text

    store = datagen.generate(sf=0.002, seed=5)
    cfg = store.make_catalog()
    with open("/root/reference/tests/tpch10noorder/03.sql.mplan") as f:
        cq = compile_plan_text(f.read(), cfg, store)
    rep = cq.cost_report(per_op=True)
    po = rep["per_op"]
    assert po["total_bytes"] > rep["scan_bytes"] / 2
    assert "sort" in po["by_opcode"]
    assert po["top_ops"] and all(b > 0 for _, b, _ in po["top_ops"])
    assert sum(po["by_opcode"].values()) == po["total_bytes"]


def test_vpu_report():
    """The VPU compute-roofline estimator (engine/hloprof.vpu_report)
    charges elementwise work per output element, reduce inputs once,
    and counts gather/sort/custom-call output elements as opaque.
    Checked against a hand-countable jitted program."""
    import jax
    import jax.numpy as jnp

    from mplan2vdl_tpu.engine.hloprof import vpu_report

    n = 4096

    def f(a, b):
        # 3 cheap elementwise ops (mul=2, add=1, compare=1 ≈ 4n min)
        # + one reduce over n elements
        return jnp.sum(jnp.where(a > b, a * 2 + b, b))

    hlo = (jax.jit(f)
           .lower(jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32))
           .compile().as_text())
    rep = vpu_report(hlo)
    assert rep["vpu_ops"] >= 2 * n          # at least mul + reduce
    assert rep["vpu_ops"] <= 64 * n          # and not wildly overcounted
    assert rep["ew_elems"] >= n
    assert rep["opaque_elems"] == 0

    def g(src, idx):
        return jnp.sort(src[idx])

    hlo2 = (jax.jit(g)
            .lower(jnp.zeros((n,), jnp.int32),
                   jnp.zeros((n,), jnp.int32)).compile().as_text())
    rep2 = vpu_report(hlo2)
    assert rep2["opaque_elems"] >= n        # gather + sort outputs
