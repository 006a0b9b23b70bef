"""Relational + crawl operators (SURVEY.md §2)."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_scan_parallelism"]


def ensure_scan_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Small-input guard for CPU-heavy downstream stages: a few-file parquet
    scan yields as few splits as files, serializing per-row work on tiny
    inputs.  Repartition to the cluster's core count when the FILE count is
    below it — a no-op at real scale, where inputs carry many files (and any
    over-``maxPartitionBytes`` file splits further on its own).

    The probe is ``df.inputFiles()`` — a catalog listing, O(ms).  The
    previous per-operator guard used ``df.rdd.getNumPartitions()``, whose
    Python-RDD conversion costs seconds of driver time on FIRST use per
    session (measured 1.4–6 s) — a fixed tax on every small-sf query.
    """
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file-backed plan: nothing to infer, leave as-is
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df
