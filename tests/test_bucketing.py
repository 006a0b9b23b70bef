"""Bucketed co-located joins: the 100 TB join strategy the engine's state
tables are designed for (SURVEY.md §4) — writing both sides bucketed on the
join key lets sort-merge join run with ZERO Exchange (no shuffle at all),
verified here on the physical plan, with results identical to the plain join.
"""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    frontier = spark.range(0, 5000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 37), F.lit(".example.com/p/"), "id").alias("url"),
        (F.col("id") % 97).alias("host_id"),
        F.col("id").alias("priority"),
    )
    seen = frontier.sample(0.5, seed=7).select("url", F.lit(0).alias("round"))
    # external-table paths: the warehouse dir is a static config in a shared
    # test session, so each table pins its own location instead
    frontier.write.bucketBy(8, "url").sortBy("url").option(
        "path", os.path.join(wh, "b_frontier")
    ).mode("overwrite").saveAsTable("b_frontier")
    seen.write.bucketBy(8, "url").sortBy("url").option(
        "path", os.path.join(wh, "b_seen")
    ).mode("overwrite").saveAsTable("b_seen")
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_frontier")
    spark.sql("DROP TABLE IF EXISTS b_seen")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    f = spark.table("b_frontier")
    s = spark.table("b_seen")
    with _aqe_off(spark):
        joined = f.join(s, "url", "left_anti")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        n = joined.count()
    # identical result via plain (shuffling) dataframes
    plain = (
        f.join(s.select("url").withColumn("_m", F.lit(1)), "url", "left")
        .filter(F.col("_m").isNull())
        .count()
    )
    assert n == plain


class _aqe_off:
    """Scoped configs for the plan assertion: AQE off (it wraps the static
    plan in AdaptiveSparkPlan) and auto-broadcast off (tiny test tables would
    otherwise take a BroadcastHashJoin and skip the bucketed SMJ path this
    test exists to demonstrate)."""

    _KEYS = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = {k: self.spark.conf.get(k) for k in self._KEYS}
        for k, v in self._KEYS.items():
            self.spark.conf.set(k, v)
        return self

    def __exit__(self, *exc):
        for k, v in self.prev.items():
            self.spark.conf.set(k, v)


def test_bucket_pruning_filter_pushdown(warehouse):
    """A bucket-key equality filter prunes to one bucket's files and pushes
    the predicate into the scan."""
    spark = warehouse
    f = spark.table("b_frontier")
    plan = _plan(f.filter(F.col("url") == "https://h3.example.com/p/40"))
    assert "PushedFilters: [IsNotNull(url), EqualTo(url" in plan or "SelectedBucketsCount: 1" in plan, plan
