"""Scale-safe total ordering: global row numbers without the
single-partition WindowExec.

``Window.orderBy(...)`` with no partition key funnels the ENTIRE dataset
through one task (Spark logs "No Partition Defined for Window operation") —
fine for a broadcast-sized proxy pool, fatal for 3×10⁸ seeds or an orders
table at 100 TB.  The distributed classic is two passes (what RDD
``zipWithIndex`` does, re-expressed for DataFrames):

1. ``repartitionByRange`` on the order keys + ``sortWithinPartitions`` —
   a range shuffle gives a total order ACROSS partitions with every
   partition still parallel;
2. count rows per partition (cheap agg job), turn the counts into
   per-partition starting offsets (a tiny driver list);
3. one ``mapInPandas`` pass adds ``offset + local_index`` — narrow, keeps
   the partitioning and order, Arrow-batched.

The order key must be a total order (include a unique tiebreaker) or row
numbers within ties are partition-placement-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["global_prefix_sum", "global_row_number", "seed_contract_table"]


def seed_contract_table(
    picks: DataFrame, order_cols: list[str], *, minimal: bool = False,
) -> DataFrame:
    """Ranked URL picks → the fixture ``seeds.parquet`` contract the engine
    reads back (``seed_id`` = string global rank as the priority key, plus
    ``story_seq`` 0 / empty ``cookies`` unless ``minimal``).

    The contract lives HERE and nowhere else — ``warc.refetch_seeds``,
    ``freshness.revisit_seeds`` and ``sitemaps.seeds_from_sitemaps`` all
    emit through this helper, so a contract change (a new required column)
    has one home instead of three silently-diverging copies.  ``picks``
    must carry ``url`` plus the order columns; numbering is the scale-safe
    total order below (range shuffle + offsets, never a single-partition
    window).
    """
    numbered = global_row_number(picks, list(order_cols), rn_col="_rn")
    cols = [(F.col("_rn") - 1).cast("string").alias("seed_id"), F.col("url")]
    if not minimal:
        cols += [F.lit(0).alias("story_seq"), F.lit("").alias("cookies")]
    return numbered.select(*cols)


def global_row_number(
    df: DataFrame, order_cols: list[str], rn_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """1-based dense global row number over ``order_cols`` order.

    The range-partitioned input is MATERIALIZED (eager localCheckpoint)
    before the count pass: RangePartitioner's boundary sampling is seeded
    by the RDD id, which changes per execution, so two independent
    executions of the same plan can land rows in different partitions — the
    offsets would then be wrong (measured: silent gaps/overlaps in the
    numbering).  Checkpointing once pins the partitioning for both passes.
    localCheckpoint (not ``persist``) on purpose: a persisted plan is held
    by the cache manager until someone calls unpersist — in a long-lived
    driver session the blocks accumulate — while checkpoint blocks are
    released by the ContextCleaner as soon as the numbered output's
    references drop (the same lifetime discipline as the LSH band-table
    checkpoints).
    """
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    sdf = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=True)
    )

    counts = (
        sdf.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    sizes = {int(r["_pid"]): int(r["count"]) for r in counts}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    # build a NEW StructType — .add() would mutate the cached input schema
    out_schema = StructType(list(sdf.schema.fields) + [StructField(rn_col, LongType())])

    def number(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for pdf in it:
            pdf = pdf.copy()
            pdf[rn_col] = range(base + seen + 1, base + seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf

    return sdf.mapInPandas(number, schema=out_schema)


def global_prefix_sum(
    df: DataFrame, order_cols: list[str], value_col: str,
    sum_col: str = "cumsum", num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive global running sum of ``value_col`` in ``order_cols`` order
    — ``global_row_number``'s shape with the count pass generalized to a
    sum: range shuffle + per-partition totals (tiny driver list) + one
    narrow Arrow pass adding ``offset + local cumsum``.  Never a
    single-partition WindowExec, so it holds at any row count; the offsets
    job sums ``num_partitions`` longs.  ``value_col`` must be integral
    (accumulated exactly as int64); ``order_cols`` must be a total order.
    The same localCheckpoint pins the range partitioning across both passes
    (see ``global_row_number``'s rationale).
    """
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    sdf = (
        df.withColumn(value_col, F.col(value_col).cast("long"))
        .repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=True)
    )

    totals = (
        sdf.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.sum(value_col).alias("_s"))
        .collect()
    )
    sums = {int(r["_pid"]): int(r["_s"] or 0) for r in totals}
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(list(sdf.schema.fields) + [StructField(sum_col, LongType())])

    def running(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        for pdf in it:
            pdf = pdf.copy()
            c = pdf[value_col].to_numpy(dtype="int64").cumsum()
            pdf[sum_col] = base + c
            base += int(c[-1]) if len(c) else 0
            yield pdf

    return sdf.mapInPandas(running, schema=out_schema)
