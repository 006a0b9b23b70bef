"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query logic lives in crawler_spark.queries (REGISTRY); this module is
the thin contract shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: politeness-ranked crawl frontier over sf0.001 (O1/T4) joined
    back to order revenue — the engine's core operator on driver testdata."""
    from pyspark.sql import functions as F

    from crawler_spark.queries import _synth_url, q22_frontier_rank, t

    sf_dir = "/root/testdata/sf0.001"
    batch = q22_frontier_rank(spark, sf_dir)
    orders = t(spark, sf_dir, "orders").withColumn("url", _synth_url())
    return (
        batch.join(orders.select("url", "o_totalprice"), "url")
        .groupBy("host")
        .agg(
            F.count("*").alias("n_selected"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("batch_value"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    from crawler_spark.queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; keys without SQL (non-relational ops) are omitted and
    get the driver's rows-only check."""
    from crawler_spark.queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
