"""Order-by / top-N gates on the tests/monetpch corpus (the *unmodified*
TPC-H plans with ORDER BY and ``top N`` — the reference can parse but not
lower these; SURVEY.md §7.4 reference gaps).

Comparisons are tie-tolerant: row multisets must match for full results;
for top-N the multiset of order-key tuples must match (the set of kept
keys is deterministic even when ties at the cut are resolved
differently); and the engine's output must actually be sorted per spec.
"""

import os

import numpy as np
import pytest

MONETPCH = "/root/reference/tests/monetpch"

# the FULL unmodified corpus: every ordered/top-N TPC-H plan executes
# (group-by+order, top-N with multi-key mixed-direction order, semijoin/
# antijoin + order, correlated shapes)
QUERIES = [f"{i:02d}" for i in range(1, 23)]


@pytest.fixture(scope="session")
def legacy_store():
    from mplan2vdl_tpu.engine import datagen

    store = datagen.generate(sf=0.01, seed=7, legacy_fk_names=True)
    return store, store.make_catalog()


def _order_spec(m):
    """The top-most ordered project's (indices-into-outputs, desc flags)."""
    from mplan2vdl_tpu import mplan as MP

    node = m
    while not (isinstance(node, MP.RProject) and node.order):
        if isinstance(node, (MP.RTopN, MP.RSelect, MP.RProject)):
            node = node.child
        else:
            return None
    names = [nm for _, nm in node.projectout]
    idx = []
    for n, d in node.order:
        # order columns refer to project outputs by (suffix of) name
        hit = None
        for i, nm in enumerate(names):
            if nm is not None and nm[-len(n):] == n:
                hit = i
        assert hit is not None, f"order column {n} not in outputs"
        idx.append((hit, d == "desc"))
    return idx


@pytest.mark.parametrize("q", QUERIES)
def test_monetpch_ordered(legacy_store, q):
    from mplan2vdl_tpu import mplan
    from mplan2vdl_tpu.engine.lower import compile_plan_text
    from mplan2vdl_tpu.fe import lexer, plan_parser
    from mplan2vdl_tpu.oracle import relinterp

    store, cfg = legacy_store
    with open(os.path.join(MONETPCH, f"{q}.sql.mplan")) as f:
        text = f.read()
    rel = plan_parser.parse(lexer.strip_plan_comments(text))
    m = mplan.mplan_from_parse_tree(rel, cfg)
    oracle = relinterp.run_oracle(store, m)
    res = compile_plan_text(text, cfg, store)()

    got = [np.asarray(c, dtype=np.int64) for c in res.columns]
    want = [np.asarray(a, dtype=np.int64) for _, a in oracle.cols]
    assert len(got) == len(want)
    n_got = len(got[0]) if got else 0
    n_want = len(want[0]) if want else 0
    assert n_got == n_want, f"row counts {n_got} vs {n_want}"
    if n_got == 0:
        return

    from mplan2vdl_tpu import mplan as MP

    spec = _order_spec(m)
    is_topn = isinstance(m, MP.RTopN)

    if spec:
        # the engine output must be sorted per the order spec
        keys = np.stack([(-got[i] if desc else got[i]) for i, desc in spec],
                        axis=1)
        for r0, r1 in zip(keys[:-1], keys[1:]):
            assert tuple(r0) <= tuple(r1), "engine output not sorted"

    if is_topn and spec:
        # tie-tolerant: multisets of order-key tuples must agree
        gk = sorted(map(tuple, np.stack(
            [got[i] for i, _ in spec], axis=1).tolist()))
        wk = sorted(map(tuple, np.stack(
            [want[i] for i, _ in spec], axis=1).tolist()))
        assert gk == wk
    else:
        rows_g = sorted(zip(*[c.tolist() for c in got]))
        rows_w = sorted(zip(*[c.tolist() for c in want]))
        assert rows_g == rows_w
