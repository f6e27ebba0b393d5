"""dbgen .tbl ingest (VERDICT r4 item 6, the offline-feasible half).

Official dbgen data cannot be produced in this environment (no network,
no dbgen binary), so the loader is validated by round-trip: the
synthetic store written out in dbgen's exact text format (ISO dates,
fractional decimals, raw strings) must re-ingest to value-identical
columns, and queries over the ingested store must produce the same
decoded answers as over the original."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def stores(tmp_path_factory):
    from mplan2vdl_tpu.engine import datagen, tblingest

    store = datagen.generate(sf=0.005, seed=21)
    d = tmp_path_factory.mktemp("tbl")
    tblingest.to_tbl(store, str(d))
    ingested = tblingest.from_tbl(str(d))
    return store, ingested


def test_roundtrip_columns_identical(stores):
    store, ingested = stores
    assert set(store.columns) == set(ingested.columns)
    for key in store.columns:
        a, b = store.columns[key], ingested.columns[key]
        assert len(a) == len(b), key
        if key in store.decoders:
            # code spaces may differ (sorted-unique vs generator order):
            # compare decoded strings
            da, db = store.decoders[key], ingested.decoders[key]
            sa = [da[int(v)] for v in a[:5000]]
            sb = [db[int(v)] for v in b[:5000]]
            assert sa == sb, key
        else:
            assert np.array_equal(np.asarray(a, np.int64),
                                  np.asarray(b, np.int64)), key


def test_queries_match_across_ingest(stores):
    """Q6 (decimal arithmetic + dates) and Q1 (dictionary group keys)
    agree between the generated store and its .tbl round-trip."""
    from mplan2vdl_tpu.engine.lower import compile_plan_text

    store, ingested = stores

    def run(st, q):
        cfg = st.make_catalog()
        with open(f"/root/reference/tests/tpch10noorder/{q}.sql.mplan") as f:
            res = compile_plan_text(f.read(), cfg, st)()
        return res

    for q in ("06", "01"):
        a = run(store, q)
        b = run(ingested, q)
        # decode dictionary-coded outputs so differing code spaces
        # cannot mask (or fake) agreement
        # group output slots follow code order, and code spaces differ
        # between the stores — compare as row SETS of decoded values
        da = a.decoded(store)
        db = b.decoded(ingested)
        assert [nm for nm, _ in da] == [nm for nm, _ in db], q
        ra = sorted(zip(*[list(arr) for _, arr in da]))
        rb = sorted(zip(*[list(arr) for _, arr in db]))
        assert ra == rb, q


def test_date_encoding_matches_reference_day_counts(stores):
    """.tbl date parsing must hit the Mplan.hs:50-57 day-count encoding
    exactly (cross-check against mplan.day_count)."""
    import datetime

    from mplan2vdl_tpu.engine.tblingest import _encode_date
    from mplan2vdl_tpu.mplan import day_count

    dates = ["1992-01-01", "1996-02-29", "1998-12-01", "2000-01-01"]
    got = _encode_date(dates)
    want = [day_count(datetime.date.fromisoformat(s)) for s in dates]
    assert got.tolist() == want
