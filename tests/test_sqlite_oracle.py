"""External-oracle validation against SQLite (VERDICT r1 item 9).

Every other correctness gate in this repo (relinterp, oracle/tpch.py) is an
in-house implementation consuming the same synthetic store — a shared
misreading of an encoding could pass all of them.  This file closes the
loop with an INDEPENDENT SQL engine: the store's columns are decoded into
an in-memory SQLite database (dates as ISO-8601 text, dictionary columns
as their actual strings) and the TPC-H queries are written as real SQL.
SQLite plans, joins, groups, and aggregates with its own machinery; the
engine's raw integer outputs must match row-exactly.

Date encoding is itself externally validated: the framework's
days-since-0000-01-01 proleptic-Gregorian day counts (Mplan.hs:50-57,
mplan.day_count) are checked against SQLite's julianday() arithmetic.
"""

import datetime
import sqlite3

import numpy as np
import pytest


@pytest.fixture(scope="module")
def store_db():
    from mplan2vdl_tpu.engine import datagen

    store = datagen.generate(sf=0.05, seed=13)
    cfg = store.make_catalog()

    db = sqlite3.connect(":memory:")
    tables = {}
    for (tab, col), data in store.columns.items():
        tables.setdefault(tab, []).append((col, data))

    date_cols = {"l_shipdate", "l_commitdate", "l_receiptdate",
                 "o_orderdate"}
    text_cols = {"c_mktsegment", "o_orderpriority", "l_shipmode",
                 "l_returnflag", "l_linestatus"}

    for tab, cols in tables.items():
        if tab.startswith("%"):
            continue
        names, arrays = [], []
        for col, data in cols:
            if col.startswith("%"):
                continue
            if col in date_cols:
                names.append(f"{col} TEXT")
                arrays.append([datetime.date.fromordinal(int(v) - 365)
                               .isoformat() for v in data])
            elif col in text_cols and (tab, col) in store.decoders:
                dec = store.decoders[(tab, col)]
                names.append(f"{col} TEXT")
                arrays.append([dec[int(v)] for v in data])
            else:
                names.append(f"{col} INTEGER")
                arrays.append([int(v) for v in data])
        db.execute(f"CREATE TABLE {tab} ({', '.join(names)})")
        rows = list(zip(*arrays)) if arrays else []
        ph = ", ".join("?" * len(names))
        db.executemany(f"INSERT INTO {tab} VALUES ({ph})", rows)
    db.commit()
    return store, cfg, db


def _run_engine(store, cfg, qname):
    from mplan2vdl_tpu.engine.lower import compile_plan_text

    with open(f"/root/reference/tests/tpch10noorder/{qname}.sql.mplan") as f:
        return compile_plan_text(f.read(), cfg, store)()


def test_date_encoding_matches_sqlite_julianday():
    """day_count (days since 0000-01-01, proleptic Gregorian) must equal
    SQLite's own julianday() difference — an external check of the
    reference encoding (Mplan.hs:50-57)."""
    from mplan2vdl_tpu.mplan import day_count

    db = sqlite3.connect(":memory:")
    for d in (datetime.date(1992, 1, 1), datetime.date(1994, 1, 1),
              datetime.date(1995, 3, 15), datetime.date(1996, 2, 29),
              datetime.date(1998, 12, 1), datetime.date(2000, 1, 1)):
        (jd,) = db.execute(
            "SELECT CAST(julianday(?) - julianday('0000-01-01') AS INT)",
            (d.isoformat(),)).fetchone()
        assert jd == day_count(d), d


def test_q6_matches_sqlite(store_db):
    store, cfg, db = store_db
    res = _run_engine(store, cfg, "06")
    (got,) = (int(c[0]) for c in res.columns)
    (want,) = db.execute("""
        SELECT SUM(l_extendedprice * l_discount) FROM lineitem
        WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1995-01-01'
          AND l_discount BETWEEN 5 AND 7 AND l_quantity < 2400
    """).fetchone()
    assert got == int(want)


def test_q1_matches_sqlite(store_db):
    """Q1's eight aggregates: sums, truncating-division averages
    (the engine's Div is C-truncating; SQLite's integer / matches),
    count(*).  Dictionary group keys compare as decoded strings."""
    store, cfg, db = store_db
    res = _run_engine(store, cfg, "01")
    dec_rf = store.decoders[("lineitem", "l_returnflag")]
    dec_ls = store.decoders[("lineitem", "l_linestatus")]
    by_name = {("".join(nm[-1:]) if nm else f"col{i}"): col
               for i, (nm, col) in enumerate(zip(res.names, res.columns))}
    # engine column order mirrors the plan's output list
    got = sorted(zip(
        [dec_rf[int(v)] for v in by_name["l_returnflag"]],
        [dec_ls[int(v)] for v in by_name["l_linestatus"]],
        *[np.asarray(by_name[k], np.int64).tolist()
          for k in ("sum_qty", "sum_base_price", "sum_disc_price",
                    "sum_charge", "avg_qty", "avg_price", "avg_disc",
                    "count_order")]))
    want = sorted(tuple(r) for r in db.execute("""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity), SUM(l_extendedprice),
               SUM(l_extendedprice * (100 - l_discount)),
               SUM(l_extendedprice * (100 - l_discount) * (100 + l_tax)),
               SUM(l_quantity) / COUNT(*),
               SUM(l_extendedprice) / COUNT(*),
               SUM(l_discount) / COUNT(*),
               COUNT(*)
        FROM lineitem
        WHERE l_shipdate <= date('1998-12-01', '-90 days')
        GROUP BY l_returnflag, l_linestatus
    """))
    assert got == want


def test_q3_matches_sqlite(store_db):
    """Q3: customer–orders–lineitem FK join chain + sparse group-by.
    SQLite computes the joins and grouping itself; o_orderdate converts
    back to a day count INSIDE SQLite via julianday arithmetic."""
    store, cfg, db = store_db
    res = _run_engine(store, cfg, "03")
    by_name = {("".join(nm[-1:]) if nm else f"col{i}"): col
               for i, (nm, col) in enumerate(zip(res.names, res.columns))}
    got = sorted(zip(*[np.asarray(by_name[k], np.int64).tolist()
                       for k in ("l_orderkey", "revenue", "o_orderdate",
                                 "o_shippriority")]))
    want = sorted(tuple(r) for r in db.execute("""
        SELECT l_orderkey,
               SUM(l_extendedprice * (100 - l_discount)),
               CAST(julianday(o_orderdate) - julianday('0000-01-01') AS INT),
               o_shippriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < '1995-03-15' AND l_shipdate > '1995-03-15'
        GROUP BY l_orderkey, o_orderdate, o_shippriority
    """))
    assert got == want
