"""global_row_number must equal the single-partition window row_number while
actually distributing the work (O2 scale path)."""

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_global_row_number_matches_window(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("k"), F.col("id").alias("payload")
    )
    from crawler_spark.operators.ordering import global_row_number

    got = global_row_number(df, ["k"], num_partitions=7)
    want = df.withColumn("rn", F.row_number().over(Window.orderBy("k")))
    assert got.count() == 1000
    g = {r.k: r.rn for r in got.collect()}
    w = {r.k: r.rn for r in want.collect()}
    assert g == w
    # the numbering pass runs on the range partitioning, not one task
    assert got.rdd.getNumPartitions() == 7


def test_global_row_number_empty_and_skewed(spark):
    from crawler_spark.operators.ordering import global_row_number

    empty = spark.range(0).select(F.col("id").alias("k"))
    assert global_row_number(empty, ["k"]).count() == 0

    # heavy duplication in the range key still yields a dense 1..N numbering
    skew = spark.range(0, 500).select((F.col("id") % 3).alias("k"), "id")
    rows = global_row_number(skew, ["k", "id"], num_partitions=5).collect()
    assert sorted(r.rn for r in rows) == list(range(1, 501))
    by_rn = sorted(rows, key=lambda r: r.rn)
    assert [r.k for r in by_rn] == sorted(r.k for r in rows)


def test_global_prefix_sum_matches_window(spark):
    from pyspark.sql import Window

    from crawler_spark.operators.ordering import global_prefix_sum

    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("k"), (F.col("id") % 17 + 1).alias("v")
    )
    got = global_prefix_sum(df, ["k"], "v", sum_col="cs", num_partitions=7)
    want = df.withColumn(
        "cs", F.sum("v").over(Window.orderBy("k").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
    assert {r.k: r.cs for r in got.collect()} == {r.k: r.cs for r in want.collect()}
    assert got.rdd.getNumPartitions() == 7


def test_global_prefix_sum_empty_and_zero_values(spark):
    from crawler_spark.operators.ordering import global_prefix_sum

    empty = spark.range(0).select(F.col("id").alias("k"), F.col("id").alias("v"))
    assert global_prefix_sum(empty, ["k"], "v").count() == 0

    zeros = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(0).alias("v"))
    rows = global_prefix_sum(zeros, ["k"], "v", num_partitions=5).collect()
    assert all(r.cumsum == 0 for r in rows)
