"""Deterministic sketch aggregates: HyperLogLog distinct counting and
count-min frequency sketching.

Reference parity: none — the reference never estimates cardinalities (its
per-story URL sets fit a Redis map).  At 100 TB, exact COUNT(DISTINCT) is a
full shuffle of every distinct value; the HLL sketch replaces it with a
fixed ``m``-register state that merges associatively — partial-agg
(map-side combine) all the way, O(m) final state, mergeable across
partitions, days, and clusters by register-wise MAX.

This implementation is the Flajolet–Fure–Gandouet–Meunier HLL with an
**md5-derived hash split** (register = first byte mod m, rank = leading
zeros of the next 40 bits + 1) so the whole sketch is deterministic and
engine-portable: a DuckDB oracle can recompute the registers from the same
formula and match the estimate BIT-EXACTLY (the estimator divides one
exact scaled-integer harmonic sum into one literal double — a single IEEE
division, no float accumulation, no libm transcendentals).  The classic
linear-counting small-range correction needs ``ln`` — whose libm/JVM
implementations are NOT bit-identical across engines — so this operator
deliberately reports the raw HLL estimate plus the zero-register count
``v_zero`` and leaves the correction to callers (`v_zero > 0` flags the
small-range regime; the demo query's cardinalities sit safely above it).

Rank is computed without loops or UDFs: ``41 − length(bin(w))`` — both
Spark's and DuckDB's ``bin()`` render integers without leading zeros, so
``length(bin(w)) = floor(log2(w)) + 1`` exactly, JVM-side.

The count-min sketch (Cormode–Muthukrishnan) is the frequency companion:
a fixed ``d × w`` counter grid (cell = md5("row:value") mod w), built by
one groupBy — cell-wise SUM, map-side combinable and mergeable across
partitions/streams.  Point estimate = MIN over a value's ``d`` cells,
always an overcount, never an undercount.  Everything is integer, so the
oracle twin is exact with no float care at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ALPHA",
    "hll_register_table",
    "hll_estimate",
    "hll_distinct",
    "cms_table",
    "cms_lookup",
    "hdr_bucket_table",
    "hdr_quantiles",
]

# Flajolet et al. bias constants: literals for small m, the paper's
# 0.7213 / (1 + 1.079 / m) pre-evaluated for m = 256 (a single double
# literal keeps the oracle twin bit-identical — both engines consume the
# same constant instead of re-folding the expression).
ALPHA = {16: 0.673, 32: 0.697, 64: 0.709, 256: 0.7182725932495458}

_WINDOW_BITS = 40  # rank window: md5 hex chars 3..12


def _check_reserved(reserved: Sequence[str], cols: Sequence[str], what: str) -> None:
    """Scratch/output names must not shadow caller columns — a collision
    would silently mis-wire the aggregate, so fail loudly up front."""
    hit = sorted(set(reserved) & set(cols))
    if hit:
        raise ValueError(f"{what} {hit} collide with reserved sketch columns; rename them")


def hll_register_table(
    df: DataFrame, value_col: str, group_cols: Sequence[str] = (), m: int = 64
) -> DataFrame:
    """(group_cols..., reg, max_rank) — the mergeable HLL state.

    Merging two state tables = union + groupBy(reg).max(max_rank); both
    this build and the merge are map-side-combinable aggregates.
    """
    if m not in ALPHA:
        raise ValueError(f"m must be one of {sorted(ALPHA)}, got {m}")
    group_cols = list(group_cols)
    _check_reserved(["reg", "rank", "max_rank"], group_cols, "group columns")
    # NULL values are never part of a distinct count (SQL COUNT(DISTINCT)
    # semantics): a NULL would hash to a NULL register row whose rank drops
    # out of the harmonic sum while still bumping _n_present — filter here
    # so the state is correct whatever the caller feeds in.
    df = df.filter(F.col(value_col).isNotNull())
    h = F.md5(F.col(value_col).cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % m
    w = F.conv(F.substring(h, 3, 10), 16, 10).cast("long")
    rank = (
        F.when(w == 0, F.lit(_WINDOW_BITS + 1))
        .otherwise(F.lit(_WINDOW_BITS + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.select(*group_cols, reg.alias("reg"), rank.alias("rank"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate(
    state: DataFrame, group_cols: Sequence[str] = (), m: int = 64
) -> DataFrame:
    """(group_cols..., v_zero, sum_scaled, n_hll) from a register STATE
    table — possibly the merge of many ``hll_register_table`` outputs
    (union + groupBy max; the caller may also just pass finer-grained
    states directly, since MAX is associative).

    ``sum_scaled`` is the harmonic denominator in exact integer units of
    2^-(WINDOW_BITS+1): present registers contribute ``2^(41 − max_rank)``,
    absent ones ``2^41`` each (max 256·2^41 = 2^49 — BIGINT-safe).  The
    estimate is then ONE double division of two exact numbers:
    ``alpha·m²·2^41 / sum_scaled`` — bit-portable across engines.
    """
    if m not in ALPHA:
        raise ValueError(f"m must be one of {sorted(ALPHA)}, got {m}")
    group_cols = list(group_cols)
    _check_reserved(["v_zero", "sum_scaled", "n_hll", "_n_present", "_s"], group_cols, "group columns")
    regs = state.groupBy(*group_cols, "reg").agg(F.max("max_rank").alias("max_rank"))
    scale = 1 << (_WINDOW_BITS + 1)
    numerator = ALPHA[m] * float(m * m) * float(scale)
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("_n_present"),
        # coalesce: an EMPTY state with group_cols=() still yields the one
        # global-aggregate row (count=0, SUM=NULL) — degrade it to the
        # all-registers-absent estimate instead of NULLs.
        F.coalesce(
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_WINDOW_BITS + 1} - max_rank)")),
            F.lit(0),
        )
        .cast("long")
        .alias("_s"),
    )
    return agg.select(
        *group_cols,
        (F.lit(m) - F.col("_n_present")).cast("long").alias("v_zero"),
        (F.col("_s") + (F.lit(m) - F.col("_n_present")) * F.lit(scale))
        .cast("long")
        .alias("sum_scaled"),
        (F.lit(numerator) / (F.col("_s") + (F.lit(m) - F.col("_n_present")) * F.lit(scale))).alias(
            "n_hll"
        ),
    )


def hll_distinct(
    df: DataFrame, value_col: str, group_cols: Sequence[str] = (), m: int = 64
) -> DataFrame:
    """Convenience: build the register state and estimate it in one call.

    Production splits the two stages — persist ``hll_register_table``
    per ingest window, answer range queries with ``hll_estimate`` over the
    unioned states (see q66).
    """
    return hll_estimate(hll_register_table(df, value_col, group_cols, m), group_cols, m)


def _cms_cell(row_col, value_col, w: int):
    """Cell index for one (hash row, value): first 32 md5 bits of
    ``"row:value"`` mod ``w`` — deterministic, engine-portable."""
    h = F.md5(F.concat(row_col.cast("string"), F.lit(":"), F.col(value_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % w


def cms_table(
    df: DataFrame, value_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """(row, idx, cnt) — the d×w count-min state (≤ d·w rows total).

    Build = ONE groupBy over d×N exploded cell assignments (cell-wise SUM,
    map-side combinable).  Merging two sketches = union + groupBy SUM.
    """
    _check_reserved(["row", "idx", "cnt"], [value_col], "value column")
    rows = df.select(
        F.col(value_col),
        F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("row"),
    )
    return (
        rows.select("row", _cms_cell(F.col("row"), value_col, w).alias("idx"))
        .groupBy("row", "idx")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_lookup(
    cms: DataFrame, probes: DataFrame, value_col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Point-estimate each probe value: MIN over its d cells.

    The state is ≤ d·w rows, so the join side is broadcast — a probe scan
    never shuffles.  Missing cells count 0 (value never seen).
    """
    _check_reserved(["row", "idx", "cnt", "n_cms"], probes.columns, "probe columns")
    p = probes.select(
        "*", F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("row")
    ).withColumn("idx", _cms_cell(F.col("row"), value_col, w))
    out_cols = [c for c in probes.columns]
    return (
        p.join(F.broadcast(cms), ["row", "idx"], "left")
        .groupBy(*out_cols)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("n_cms"))
    )


# ---------------------------------------------------------------------------
# HDR-histogram quantile sketch (log-linear buckets).
#
# Public design: Gil Tene's HdrHistogram (exact integer bucketing) — the
# same bounded-relative-error quantile model as DDSketch (Masson, Rim &
# Lee, VLDB 2019) but with bucket indices computed in EXACT integer
# arithmetic instead of log()/pow() (whose libm implementations are not
# bit-identical across engines, the same reason hll_estimate avoids ln).
# Values are non-negative BIGINTs; with ``sub_bits = j``:
#
#   v < 2^(j+1)        -> bucket = v                       (exact)
#   v >= 2^(j+1)       -> e = floor(log2 v) = length(bin(v)) - 1
#                         bucket = (e - j)*2^j + (v div 2^(e-j))
#
# The log region packs 2^j sub-buckets per power of two, so every bucket's
# width/lower-bound ratio is <= 2^-j: any quantile read off the state is
# within relative error 2^-j of the exact nearest-rank answer.  Bucket
# indices are monotone in v and contiguous across the exact/log boundary
# (v = 2^(j+1) lands exactly on bucket 2^(j+1)).
#
# The state (group..., bkt, cnt) is a plain counter table: build = ONE
# map-side-combinable groupBy; merging states across partitions, days, or
# clusters = union + groupBy SUM — the quantile companion to hll (MAX
# merge) and cms (SUM merge).  State size is O((64 - j) * 2^j) per group
# regardless of input rows.  Everything is integer, so the DuckDB oracle
# twin recomputes buckets and quantiles bit-exactly.
# ---------------------------------------------------------------------------


def _hdr_bucket_expr(value_sql: str, sub_bits: int) -> str:
    """SQL bucket index for one non-negative BIGINT expression (valid in
    both Spark SQL and DuckDB modulo the div operator — Spark uses ``div``,
    DuckDB ``//``; callers of the oracle twin substitute accordingly)."""
    j = sub_bits
    return (
        f"CASE WHEN {value_sql} < {1 << (j + 1)} THEN {value_sql} "
        f"ELSE (length(bin({value_sql})) - 1 - {j}) * {1 << j} "
        f"+ {value_sql} div shiftleft(cast(1 as bigint), length(bin({value_sql})) - 1 - {j}) END"
    )


def _hdr_bound_expr(bkt_sql: str, sub_bits: int, upper: bool) -> str:
    """Exact lower bound (or exclusive upper bound) of a bucket, inverting
    ``_hdr_bucket_expr``: log-region bucket b = (e-j+1)*2^j + s covers
    [(2^j + s) << (e-j), (2^j + s + 1) << (e-j))."""
    j = sub_bits
    plus = " + 1" if upper else ""
    exact = f"{bkt_sql} + 1" if upper else bkt_sql
    return (
        # the shift base MUST be BIGINT: an INT literal would make shiftleft
        # a 32-bit shift (amount taken mod 32) and silently wrap for e >= 27
        f"CASE WHEN {bkt_sql} < {1 << (j + 1)} THEN {exact} "
        f"ELSE shiftleft(cast({1 << j} as bigint) + {bkt_sql} % {1 << j}{plus}, "
        f"cast({bkt_sql} div {1 << j} as int) - 1) END"
    )


def hdr_bucket_table(
    df: DataFrame, value_col: str, group_cols: Sequence[str] = (), sub_bits: int = 4
) -> DataFrame:
    """(group_cols..., bkt, cnt) — the mergeable quantile state.

    ``value_col`` must be castable to non-negative BIGINT; NULLs and
    negative values are excluded (SQL-aggregate NULL semantics; negatives
    are outside the sketch's domain — scale/offset them first).
    """
    if not 1 <= sub_bits <= 16:
        raise ValueError(f"sub_bits must be 1..16, got {sub_bits}")
    group_cols = list(group_cols)
    _check_reserved(["_v", "bkt", "cnt"], group_cols, "group columns")
    v = F.col(value_col).cast("long")
    return (
        df.filter(v.isNotNull() & (v >= 0))
        .select(*group_cols, v.alias("_v"))
        .select(*group_cols, F.expr(_hdr_bucket_expr("_v", sub_bits)).alias("bkt"))
        .groupBy(*group_cols, "bkt")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def hdr_quantiles(
    state: DataFrame,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    group_cols: Sequence[str] = (),
    sub_bits: int = 4,
) -> DataFrame:
    """(group_cols..., pq, n_rows, q_value, q_ub) from a bucket STATE table
    — possibly the union of many ``hdr_bucket_table`` outputs (SUM merge is
    folded in here, so finer-grained states can be passed directly).

    Quantile definition: nearest-rank — the value at row ``ceil(q * n)`` of
    the sorted input.  ``q_value`` is the exact lower bound of the bucket
    holding that row and ``q_ub`` its exclusive upper bound, so the true
    nearest-rank value lies in ``[q_value, q_ub)`` with
    ``(q_ub - q_value) / q_value <= 2^-sub_bits`` in the log region (exact
    below ``2^(sub_bits+1)``).  ``ceil(q * n)`` is ONE IEEE multiply of a
    literal double by an exact integer — bit-portable across engines.

    Plan: SUM-merge groupBy, one cumulative-sum window per group (state is
    O(2^sub_bits · 64) rows per group — never a wide partition), a ×len(qs)
    explode, and a MIN groupBy.  No joins.
    """
    from pyspark.sql import Window

    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError("qs must be non-empty with every q in (0, 1]")
    group_cols = list(group_cols)
    _check_reserved(
        ["bkt", "cnt", "_cum", "_n", "_q", "pq", "n_rows", "q_value", "q_ub"],
        group_cols,
        "group columns",
    )
    merged = state.groupBy(*group_cols, "bkt").agg(F.sum("cnt").alias("cnt"))
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    expanded = (
        merged.withColumn("_cum", F.sum("cnt").over(w_cum))
        .withColumn("_n", F.sum("cnt").over(w_all))
        .select(
            *group_cols,
            "bkt",
            "_cum",
            "_n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(f"p{q * 100:g}").alias("pq"), F.lit(float(q)).alias("qv")
                        )
                        for q in qs
                    ]
                )
            ).alias("_q"),
        )
    )
    hit = expanded.filter(
        F.col("_cum") >= F.ceil(F.col("_q.qv") * F.col("_n")).cast("long")
    )
    picked = hit.groupBy(*group_cols, F.col("_q.pq").alias("pq")).agg(
        F.max("_n").cast("long").alias("n_rows"),
        F.min("bkt").alias("bkt"),
    )
    return picked.select(
        *group_cols,
        "pq",
        "n_rows",
        F.expr(_hdr_bound_expr("bkt", sub_bits, upper=False)).cast("long").alias("q_value"),
        F.expr(_hdr_bound_expr("bkt", sub_bits, upper=True)).cast("long").alias("q_ub"),
    )
