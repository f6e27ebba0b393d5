"""Dense-domain small-right join (engine/lower.py:_dense_join).

When an equijoin's build side is small and its key domain is a bounded
int32 range, the engine replaces the tagged-merge co-sorts (the measured
~2/3 of Q17/Q21's on-chip time, BENCH_QUERIES.md r4) with run tables
scattered over the key domain + kernel gathers.  These tests pin:

  * engagement: the dense path actually fires on the queries it targets
    (Q17's avg-subquery join, Q2's min-supplycost join) — otherwise the
    A/B silently compares merge with merge;
  * exactness: identical rows vs the sort-merge path (which the exec
    suite already checks against two independent oracles), including
    duplicate right keys (Q17's right side is runs of ~29 rows/key) and
    absent probe keys;
  * the MPLAN2VDL_NO_DENSE_JOIN escape hatch.
"""

import os

import numpy as np
import pytest

TPCH10 = "/root/reference/tests/tpch10noorder"


@pytest.fixture(scope="module")
def sf001():
    from mplan2vdl_tpu.engine import datagen

    store = datagen.generate(sf=0.01, seed=11)
    return store, store.make_catalog()


def _run(store, cfg, q, monkeypatch, dense: bool):
    from mplan2vdl_tpu.engine import lower

    monkeypatch.setenv("MPLAN2VDL_SIZE_CACHE", "0")
    if dense:
        monkeypatch.delenv("MPLAN2VDL_NO_DENSE_JOIN", raising=False)
    else:
        monkeypatch.setenv("MPLAN2VDL_NO_DENSE_JOIN", "1")
    calls = {"dense": 0, "merge": 0}
    orig = lower.Compiler._dense_join

    def spy(self, *a, **kw):
        out = orig(self, *a, **kw)
        calls["dense" if out is not None else "merge"] += 1
        return out

    monkeypatch.setattr(lower.Compiler, "_dense_join", spy)
    with open(os.path.join(TPCH10, f"{q}.sql.mplan")) as f:
        cq = lower.compile_plan_text(f.read(), cfg, store)
    res = cq()
    # keep float columns as floats (rounded) — an int64 cast would hide
    # sub-integer dense-vs-merge divergence in e.g. Q17's avg_yearly
    def _vals(c):
        a = np.asarray(c)
        if np.issubdtype(a.dtype, np.floating):
            return [round(float(x), 6) for x in a.tolist()]
        return np.asarray(a, np.int64).tolist()
    rows = sorted(zip(*[_vals(c) for c in res.columns])) \
        if res.columns else []
    return rows, calls


@pytest.mark.parametrize("q", ["02", "17"])
def test_dense_matches_merge(sf001, q, monkeypatch):
    store, cfg = sf001
    got_d, calls_d = _run(store, cfg, q, monkeypatch, dense=True)
    got_m, calls_m = _run(store, cfg, q, monkeypatch, dense=False)
    # the dense path must actually engage (eager counting + main trace)
    assert calls_d["dense"] > 0, "dense join never fired — gate regressed"
    assert calls_m["dense"] == 0, "escape hatch ignored"
    assert got_d == got_m


def test_dense_handles_duplicate_right_runs(sf001, monkeypatch):
    """Q17's dense join has ~29-row runs per right key at this SF —
    the run-table (lo/cnt) semantics must enumerate every pair.  Cheap
    structural re-check on top of the full-row equality above: the
    dense result is non-empty and row-multiplicities match the merge
    path (already asserted), so here just pin engagement shape."""
    from mplan2vdl_tpu.engine import lower

    monkeypatch.setenv("MPLAN2VDL_SIZE_CACHE", "0")
    seen = []
    orig = lower.Compiler._dense_join

    def spy(self, key, lv, rv, *a, **kw):
        out = orig(self, key, lv, rv, *a, **kw)
        if out is not None:
            seen.append((lv.length, rv.length))
        return out

    monkeypatch.setattr(lower.Compiler, "_dense_join", spy)
    store, cfg = sf001
    with open(os.path.join(TPCH10, "17.sql.mplan")) as f:
        lower.compile_plan_text(f.read(), cfg, store)
    assert seen, "Q17's subquery join should take the dense path"
    # right side is the brand/container-filtered lineitem — small
    assert all(m <= lower.DENSE_RIGHT_MAX for _, m in seen)
