"""Temporal joins Spark lacks as built-ins: as-of join and banded range join.

Reference parity: none — the reference has no temporal joins at all
(SURVEY.md §2.3: "No theta/range/as-of/interval joins exist in the
reference").  These are training-data-pipeline operators: attaching the
latest-known state to each observation (as-of) and windowed event
correlation (range join) are the two standard shapes over 100 TB event
logs, and BOTH have naive formulations that go quadratic per key.  The
implementations here are the linear-shuffle forms:

* ``asof_join`` — backward as-of via **union + one window** instead of a
  per-row inequality join: tag both sides, union, and carry the right
  side's values forward with ``last(..., ignorenulls=True)`` over
  ``(keys, ORDER BY ts, seq)``.  One sort-shuffle partitioned by key,
  O(N log N) per partition, no join fan-out at all — the plan scales with
  the UNION's row count regardless of how many right rows precede each
  left row (a correlated/range formulation re-scans them per left row).
  Determinism: the as-of predicate is lexicographic
  ``(right.ts, right.seq) < (left.ts, left.seq)`` with a globally unique
  ``seq``, so equal timestamps cannot produce engine-dependent results.

* ``banded_range_join`` — pairs within ``±band`` via **bucketed
  equi-join**: right rows land in bucket ``ts // band``; left rows probe
  their own bucket and both neighbors (explode ×3), then the exact
  ``|Δts| ≤ band`` predicate filters.  Every true pair shares one of the
  three probed buckets, so the result is EXACT; the shuffle is an
  equi-join on ``(keys, bucket)`` — never a cartesian or a broadcast
  nested loop, which is what Spark plans for a raw inequality join.
  Fan-out is bounded by per-(key, bucket) density, the same skew contract
  as the LSH bucket joins (operators/dedup_text, operators/image_dedup).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "banded_range_join"]


def _check_reserved(reserved: Sequence[str], *frames: DataFrame) -> None:
    """Internal scratch columns must not shadow user columns — a collision
    would produce ambiguous-column errors or silently wrong selects, so fail
    loudly up front instead."""
    for df in frames:
        hit = sorted(set(reserved) & set(df.columns))
        if hit:
            raise ValueError(
                f"input columns {hit} collide with internal scratch names; rename them"
            )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    seq_col: str,
    value_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, the latest right row with
    ``(ts, seq) < (left.ts, left.seq)`` per key — NULLs when none precedes.

    ``ts_col``/``seq_col`` must exist on both sides; ``seq_col`` must be
    unique across the union (an event id).  Right ``value_cols`` come back
    prefixed.  Output = all left columns + prefixed value columns.
    """
    keys = list(keys)
    value_cols = list(value_cols)
    left_cols = left.columns
    _check_reserved(["_side", "_rvals", "_asof"], left, right)
    lhs = left.select(
        *left_cols,
        F.lit(1).alias("_side"),
        F.lit(None)
        .cast(f"struct<{', '.join(f'{c}: {right.schema[c].dataType.simpleString()}' for c in value_cols)}>")
        .alias("_rvals"),
    )
    rhs = right.select(
        *[
            F.col(c) if c in (*keys, ts_col, seq_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_rvals"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, seq_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ONE struct carry (not per-column lasts): a right row with NULLs in
    # some value columns must still win as a whole — independent carries
    # could mix values from different right rows (a torn as-of row).
    carried = lhs.unionByName(rhs).select(
        "*",
        F.last(F.when(F.col("_side") == 0, F.col("_rvals")), ignorenulls=True)
        .over(w)
        .alias("_asof"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *left_cols, *[F.col(f"_asof.{c}").alias(f"{prefix}{c}") for c in value_cols]
    )


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    band: int,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
) -> DataFrame:
    """Exact pairs with ``|left.ts − right.ts| ≤ band`` per key, as a
    bucketed equi-join (left probes 3 adjacent ``band``-wide buckets).

    ``left_ts``/``right_ts`` are NON-NEGATIVE integer columns (e.g. epoch
    micros); ``band`` shares their unit.  Bucketing uses integer ``div`` —
    no double round-trip, exact at any magnitude.  Each right row lands in
    ONE bucket and the left probes 3 distinct buckets, so no pair is
    emitted twice and no ``distinct`` pass is needed.  Output = selected
    left cols + right cols + ``delta`` (right − left, signed).
    """
    keys = list(keys)
    _check_reserved(["_b", "_lts", "_rts", "delta"], left, right)
    lb = F.expr(f"{left_ts} div {band}")
    l2 = left.select(
        *keys,
        *left_cols,
        F.col(left_ts).alias("_lts"),
        F.explode(F.array(lb - 1, lb, lb + 1)).alias("_b"),
    )
    r2 = right.select(
        *keys,
        *right_cols,
        F.col(right_ts).alias("_rts"),
        F.expr(f"{right_ts} div {band}").alias("_b"),
    )
    return (
        l2.join(r2, [*keys, "_b"])
        .filter(F.abs(F.col("_rts") - F.col("_lts")) <= band)
        .select(
            *keys,
            *left_cols,
            *right_cols,
            (F.col("_rts") - F.col("_lts")).alias("delta"),
        )
    )
