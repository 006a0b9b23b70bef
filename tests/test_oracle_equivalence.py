"""Mimic the driver's correctness gate: run every REGISTRY query in Spark
AND its DuckDB oracle on the same parquet, compare row-count + (sorted-column)
values order-insensitively (SURVEY.md §5 item 3).

Runs at sf0.001 for speed; the driver runs sf0.01 — the logic is scale-free.
"""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, cols):
    """Sort columns by name, stringify values with float tolerance-rounding."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if hasattr(v, "item"):  # numpy scalar from the pandas path -> Python
            v = v.item()
        if isinstance(v, bool):
            return str(v).lower()
        if isinstance(v, float):
            # type-tagged: the driver hashes exact strings, so an int column
            # on one side vs float on the other (DuckDB HUGEINT->float64) is
            # a real mismatch even when the values are numerically equal —
            # the "f:" tag keeps that failure visible while still rounding
            # away genuine float summation-order noise between engines.
            if math.isnan(v):
                return "f:nan"
            return f"f:{v:.9g}"
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def _spark_result(spark, fn):
    df = fn(spark, SF_DIR)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return rows, cols


def _duck_result(ddb, sql):
    # Materialize through pandas (.df()), NOT fetchall(): the driver's gate
    # hashes the pandas frame, where DuckDB HUGEINT (SUM of any integer type)
    # becomes float64 — fetchall() hides that as Python int and round 2's four
    # red rows sailed through this test.  Keep norm()'s int/float distinction
    # intact so an un-cast SUM fails here the same way it fails the driver.
    rel = ddb.sql(sql)
    pdf = rel.df()
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    return rows, list(pdf.columns)


def all_query_names():
    # REGISTRY is the 50-entry driver-exposed surface; AUX_REGISTRY keeps the
    # superseded single-operator demos oracle-validated (they are the
    # components of the merged entries).
    from crawler_spark.queries import AUX_REGISTRY, REGISTRY

    return [(n, bool(sql)) for n, (_f, sql) in {**REGISTRY, **AUX_REGISTRY}.items()]


@pytest.mark.parametrize("name", [n for n, has_sql in all_query_names() if has_sql])
def test_query_matches_oracle(spark, ddb, name):
    from crawler_spark.queries import AUX_REGISTRY, REGISTRY

    fn, sql = {**REGISTRY, **AUX_REGISTRY}[name]
    s_rows, s_cols = _spark_result(spark, fn)
    d_rows, d_cols = _duck_result(ddb, sql)
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    assert _normalize(s_rows, s_cols) == _normalize(d_rows, d_cols), f"{name}: values differ"


@pytest.mark.parametrize("name", [n for n, has_sql in all_query_names() if not has_sql])
def test_rows_only_queries_run(spark, name):
    from crawler_spark.queries import AUX_REGISTRY, REGISTRY

    fn, _ = {**REGISTRY, **AUX_REGISTRY}[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
