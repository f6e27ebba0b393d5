"""The persistent dynamic-sizes cache (engine/lower.py): resolved join
match counts and FSel survivor counts are pure functions of
(plan text, store contents), so a second compile of the same pair must
adopt the cached record WITHOUT rerunning the counting pre-passes, and
any change to the data must miss the cache (a wrong size would silently
truncate join output)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    from mplan2vdl_tpu.engine import datagen

    store = datagen.generate(sf=0.005, seed=11)
    return store, store.make_catalog()


Q3 = "/root/reference/tests/tpch10noorder/03.sql.mplan"


def canon(cols):
    return sorted(zip(*[np.asarray(c, np.int64).tolist() for c in cols]))


def test_round_trip_skips_counting(setup, tmp_path, monkeypatch):
    from mplan2vdl_tpu.engine import lower

    store, cfg = setup
    monkeypatch.setenv("MPLAN2VDL_SIZE_CACHE", str(tmp_path))
    with open(Q3) as f:
        text = f.read()
    cq1 = lower.compile_plan_text(text, cfg, store)
    want = canon(cq1().columns)
    assert len(os.listdir(tmp_path)) == 1  # record written

    # a second compile must adopt the record, never count
    def boom(self):
        raise AssertionError("counting pre-pass ran despite a cache hit")

    monkeypatch.setattr(lower.CompiledQuery, "_resolve_dynamic_sizes", boom)
    cq2 = lower.compile_plan_text(text, cfg, store)
    assert cq2.join_sizes == cq1.join_sizes
    assert cq2.fsel_sizes == cq1.fsel_sizes
    assert canon(cq2().columns) == want


def test_data_change_misses_cache(setup, tmp_path, monkeypatch):
    from mplan2vdl_tpu.engine import datagen, lower

    store, cfg = setup
    monkeypatch.setenv("MPLAN2VDL_SIZE_CACHE", str(tmp_path))
    with open(Q3) as f:
        text = f.read()
    lower.compile_plan_text(text, cfg, store)
    assert len(os.listdir(tmp_path)) == 1

    # different data (new seed) -> different fingerprint -> second file,
    # and the recomputed sizes still yield oracle-exact rows
    store2 = datagen.generate(sf=0.005, seed=12)
    cfg2 = store2.make_catalog()
    cq = lower.compile_plan_text(text, cfg2, store2)
    assert len(os.listdir(tmp_path)) == 2

    from mplan2vdl_tpu.fe import lexer, plan_parser
    from mplan2vdl_tpu import mplan
    from mplan2vdl_tpu.oracle import relinterp

    rel = plan_parser.parse(lexer.strip_plan_comments(text))
    m = mplan.mplan_from_parse_tree(rel, cfg2)
    oracle = relinterp.run_oracle(store2, m)
    assert canon(cq().columns) == canon([a for _, a in oracle.cols])


def test_mismatched_record_falls_back(setup, tmp_path, monkeypatch):
    """A preset whose kind sequence no longer matches the DAG (engine
    evolution) must be ignored, not half-applied."""
    from mplan2vdl_tpu.engine import lower

    store, cfg = setup
    with open(Q3) as f:
        text = f.read()
    vexps = lower.plan_to_vexps(text, cfg)
    cq = lower.CompiledQuery(cfg, vexps, store,
                             preset_sizes=[["fsel", 3]])  # wrong shape
    # fell back to live counting: sizes resolved, query exact
    assert cq.join_sizes or cq.fsel_sizes
    r = cq()
    assert len(r.columns[0]) > 0


def test_host_counting_matches_device_counting(setup, monkeypatch):
    """With a non-CPU default backend the counting pre-pass runs on the
    host CPU backend (MPLAN2VDL_HOST_COUNTING default): resolved sizes
    and span fits must be identical to device counting — they are pure
    integer functions of (plan, data).  Simulated here by patching the
    backend probe; kernels are forced off so the trace stays XLA."""
    import jax

    from mplan2vdl_tpu.engine import lower

    store, cfg = setup
    monkeypatch.setenv("MPLAN2VDL_SIZE_CACHE", "0")
    monkeypatch.setenv("MPLAN2VDL_NO_SORTED_GATHER", "1")
    monkeypatch.setenv("MPLAN2VDL_NO_COMPACT_KERNEL", "1")
    with open(Q3) as f:
        text = f.read()
    base = lower.compile_plan_text(text, cfg, store)
    want = canon(base().columns)

    # lower.jax IS the jax module: capture the real function BEFORE
    # patching, else the "restore" below assigns the fake back to itself
    orig_default_backend = jax.default_backend
    monkeypatch.setattr(lower.jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("MPLAN2VDL_HOST_COUNTING", "1")
    hc = lower.compile_plan_text(text, cfg, store)
    assert hc.join_sizes == base.join_sizes
    assert hc.fsel_sizes == base.fsel_sizes
    monkeypatch.setattr(lower.jax, "default_backend",
                        orig_default_backend)  # restore for the run
    assert canon(hc().columns) == want


def test_fold_input_compaction(monkeypatch):
    """Selective masked sparse folds sort only the survivors: the
    counting pre-pass resolves the (groups, mask) valid-row count,
    rides the sizes record, and the compiled program's group sort runs
    at the compacted length (Q15's date filter keeps ~4% of lineitem;
    the suppkey group-by must not sort 1.5M rows)."""
    import re

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import mplan2vdl_tpu.engine.lower as L
    from mplan2vdl_tpu.engine import datagen

    monkeypatch.setenv("MPLAN2VDL_SIZE_CACHE", "0")
    store = datagen.generate(sf=0.02, seed=3)
    cfg = store.make_catalog()
    with open("/root/reference/tests/tpch10noorder/15.sql.mplan") as f:
        text = f.read()
    cq = L.compile_plan_text(text, cfg, store)
    assert cq.fold_counts, "no fold count resolved on Q15"
    n_li = store.table_count(("lineitem",))
    fc = max(c for c, _ in cq.fold_counts.values())
    assert fc < n_li / 4, (fc, n_li)
    hlo = cq._jitted.lower(cq.device_args()).compile().as_text()
    sizes = [int(m.group(1))
             for m in re.finditer(r"s32\[(\d+)\][^\n]*? sort\(", hlo)]
    pad = -(-fc // L.BLOCK_PAD) * L.BLOCK_PAD
    assert pad in sizes, (fc, pad, sorted(set(sizes), reverse=True)[:5])

    # counts ride the sizes record: a preset-built query matches rows
    rec = cq.sizes_record()
    assert any(e[0] == "fold" for e in rec)
    got = cq()
    cq2 = L.CompiledQuery(cfg, L.plan_to_vexps(text, cfg, True, False),
                          store, preset_sizes=rec)
    assert cq2.fold_counts == cq.fold_counts
    got2 = cq2()
    for a, b in zip(got.columns, got2.columns):
        np.testing.assert_array_equal(a, b)
