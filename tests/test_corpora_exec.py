"""Execution coverage for the remaining committed plan corpora
(all use the legacy positional fkN constraint names):

  * tests/tpchnoorder — the 22 queries as emitted for SF0.01 metadata
  * tests/modtpch     — hand-modified single-feature variants
  * tests/simple      — minimal agg + FK-join plans

Every plan that the frontend lowers must execute and match the RelExpr
oracle row-exactly (ordered plans are compared as multisets plus a
sortedness check upstream in test_ordered.py)."""

import glob
import os

import numpy as np
import pytest

BASE = "/root/reference/tests"

CASES = sorted(
    glob.glob(os.path.join(BASE, "tpchnoorder", "*.mplan"))
    + glob.glob(os.path.join(BASE, "modtpch", "*.mplan"))
    + glob.glob(os.path.join(BASE, "simple", "*.mplan")))


@pytest.fixture(scope="session")
def legacy_sf001():
    from mplan2vdl_tpu.engine import datagen

    store = datagen.generate(sf=0.01, seed=7, legacy_fk_names=True)
    return store, store.make_catalog()


@pytest.mark.parametrize(
    "path", CASES, ids=[os.path.basename(p) for p in CASES])
def test_corpus_plan_executes(legacy_sf001, path):
    from mplan2vdl_tpu import mplan
    from mplan2vdl_tpu.engine.lower import compile_plan_text
    from mplan2vdl_tpu.fe import lexer, plan_parser
    from mplan2vdl_tpu.oracle import relinterp

    store, cfg = legacy_sf001
    with open(path) as f:
        text = f.read()
    rel = plan_parser.parse(lexer.strip_plan_comments(text))
    m = mplan.mplan_from_parse_tree(rel, cfg)
    oracle = relinterp.run_oracle(store, m)
    res = compile_plan_text(text, cfg, store)()

    got = sorted(zip(*[np.asarray(c, np.int64).tolist()
                       for c in res.columns])) if len(res.columns[0]) else []
    want = sorted(zip(*[np.asarray(a, np.int64).tolist()
                        for _, a in oracle.cols])) \
        if len(oracle.cols[0][1]) else []
    assert got == want, f"{len(got)} vs {len(want)} rows"
