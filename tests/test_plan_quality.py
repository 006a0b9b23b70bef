"""Plan-quality regression gate over the whole query registry.

Round 1's three bench hot spots (a CartesianProduct self-join, an
O(tokens^2) re-tokenization, an unpersisted recomputed lineage) were all
visible in the *plan*, not the results — correctness stayed green while the
plans quietly stopped scaling.  This module pins the plan properties the
engine promises at 100 TB:

* no CartesianProduct / BroadcastNestedLoopJoin node ever executes for a
  registry query (every join is an equi-join: hash, sort-merge or broadcast);
* parquet scans of the selective analytics queries carry PushedFilters, so
  predicate pushdown reaches the reader at scale;
* scans do not read every column when the query projects a few (column
  pruning is alive).

The checks read the INITIAL physical plan (pre-AQE finalization): join
strategy selection — the thing the forbidden-node gate pins — happens at
initial planning, and AQE only ever *improves* a join (sort-merge →
broadcast), never introduces a CartesianProduct/BNLJ that wasn't planned.
Inspecting the DataFrame's own queryExecution directly avoids executing
every registry query twice (a noop-write materialization inspected a
SEPARATE QueryExecution anyway, so it never saw the finalized plan either).
"""

from __future__ import annotations

import re

import pytest

from crawler_spark.queries import AUX_REGISTRY, REGISTRY

ALL_QUERIES = {**REGISTRY, **AUX_REGISTRY}

SF_DIR = "/root/testdata/sf0.001"

# Physical-plan node names that must never appear for a registry query.
# BroadcastNestedLoopJoin is Spark's fallback for non-equi joins — at
# cluster scale it replicates one whole side to every task; CartesianProduct
# is the explicit all-pairs node.  Both are O(N*M) scans, not joins.
FORBIDDEN_NODES = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_no_allpairs_join_nodes(spark, name):
    fn, _sql = ALL_QUERIES[name]
    plan = _executed_plan(fn(spark, SF_DIR))
    for node in FORBIDDEN_NODES:
        assert node not in plan, f"{name}: {node} in executed plan:\n{plan[:4000]}"
    spark.catalog.clearCache()


# Queries with a base-table predicate that must reach the parquet reader
# (HAVING-style post-aggregate filters are correctly NOT pushable and are
# not listed here).
PUSHDOWN_QUERIES = {
    "q01_pricing_summary",  # lineitem.l_shipdate <= date
    "q04_anti_join",  # orders.o_totalprice > 300000
    "q09_except",  # lineitem.l_shipdate >= date
}


@pytest.mark.parametrize("name", sorted(PUSHDOWN_QUERIES))
def test_filters_pushed_to_scan(spark, name):
    fn, _sql = ALL_QUERIES[name]
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed, f"{name}: no PushedFilters marker on any scan"
    assert any(p.strip() for p in pushed), f"{name}: all PushedFilters empty:\n{plan[:2000]}"


def test_column_pruning_on_wide_table(spark):
    """q13 touches only (doc_id lang-bearing) columns of documents; the scan's
    ReadSchema must not include the heavy text/bytes columns it doesn't use."""
    fn, _sql = ALL_QUERIES["q13_lang_stats"]
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, "no parquet ReadSchema found"
    read_cols = {c.split(":")[0] for s in schemas for c in s.split(",") if c}
    n_doc_cols = len(spark.read.parquet(f"{SF_DIR}/documents.parquet").columns)
    assert len(read_cols) < n_doc_cols, (
        f"scan reads all {n_doc_cols} columns: {sorted(read_cols)}"
    )
