"""Seed planners S1/S2 + seed templating F7/F8 + story slicing O2.

The reference has two planners:

* LocalFilePlanner (S1, LocalFilePlanner.java:55-81) — read an id-per-line
  seed file (split on CR/LF) and feed plan execution.
* JssPlanner (S2, JssPlanner.java:56-102) — poll an object-store bucket's
  ``seed/`` prefix, load each NEW seed object (dedupe against a processed-
  file registry), then plan it like the local path.

Plan execution (SavePointPlanner.java:53-85) slices seed ids into stories of
``planner.step`` (200) and builds each arg URL via
``String.format(template, URLEncoder.encode(id))`` (F7,
SavePointPlanner.java:70-77).  Story preparation can also expand an
``argsEL`` range ``"start,end"`` into one URL per integer (F8,
StoryWorker.java:225-235; the unseeded shuffle at :237 is disabled in
exact-match mode — documented deviation, plans/policy.py).

Spark-first: the registry dedupe is a LEFT ANTI join on file name; slicing
is a row_number window; templating is ``format_string`` + ``url_encode``;
EL expansion is ``explode(sequence(...))`` — all JVM-side.

Ordering note: story slicing needs the seed file's LINE ORDER.  Seed objects
are small id lists (one Redis push each in the reference), so each file is a
single scan split and Arrow batch order == file order; ``line_idx`` is
assigned per-file under that assumption (a multi-split seed file would need
a file_row_index-capable source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "scan_seed_objects",
    "unprocessed_objects",
    "apply_seed_template",
    "expand_el_range",
    "slice_stories",
    "plan_seed_dir",
    "mark_plan_done",
]

SEEDS_PER_STORY = 200  # planner.step (crawler-planner application.properties:18)


def scan_seed_objects(spark: SparkSession, seed_dir: str, pattern: str = "*.txt") -> DataFrame:
    """Scan a seed 'bucket' prefix → (file_name, line_idx, seed_id).

    Blank lines are dropped (the reference splits on CR/LF and skips empty
    ids, LocalFilePlanner.java:70-74)."""
    import os

    raw = spark.read.text(os.path.join(seed_dir, pattern)).select(
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file_name"),
        F.col("value").alias("seed_id"),
    )

    def _number(pdf):
        pdf = pdf.copy()
        pdf["line_idx"] = range(len(pdf))
        return pdf[["file_name", "line_idx", "seed_id"]]

    numbered = raw.groupBy("file_name").applyInPandas(
        _number, "file_name string, line_idx long, seed_id string"
    )
    return numbered.filter(F.trim(F.col("seed_id")) != "").withColumn(
        "seed_id", F.regexp_replace(F.col("seed_id"), "\r$", "")
    )


def unprocessed_objects(seed_rows: DataFrame, registry: DataFrame | None) -> DataFrame:
    """S2 dedupe: drop rows of already-processed files (anti-join on name,
    JssPlanner.java:63-70 checks the registry before loading)."""
    if registry is None:
        return seed_rows
    return seed_rows.join(registry.select("file_name"), "file_name", "left_anti")


def apply_seed_template(seeds: DataFrame, template: str) -> DataFrame:
    """F7: url = format_string(template, url_encode(seed_id))
    (SavePointPlanner.java:70-77)."""
    return seeds.withColumn(
        "url", F.format_string(template, F.url_encode(F.col("seed_id")))
    )


def expand_el_range(spark: SparkSession, arg_template: str, start: int, end: int) -> DataFrame:
    """F8: argsEL "start,end" → one URL per i (StoryWorker.java:225-235).

    ``explode(sequence(start, end))`` + ``format_string`` — the reference's
    ``String.format(arg, i)`` per integer, end-inclusive."""
    return (
        spark.range(1)
        .select(F.explode(F.sequence(F.lit(start), F.lit(end))).alias("i"))
        .select(
            F.col("i").cast("long").alias("el_idx"),
            F.format_string(arg_template, F.col("i")).alias("url"),
        )
    )


def slice_stories(seeds: DataFrame, step: int = SEEDS_PER_STORY) -> DataFrame:
    """O2: savepoint slicing — global seed order → (story_seq, arg_idx).

    story_seq = rn // step over (file_name, line_idx) order; the savepoint
    offset is story_seq * step (SavePointPlanner.java:53-85,174-183).

    Uses the range-partitioned global_row_number operator — at north-rule
    seed counts (3×10⁸) a bare ``Window.orderBy`` would collapse the whole
    seed set into one task."""
    from crawler_spark.operators.ordering import global_row_number

    numbered = global_row_number(seeds, ["file_name", "line_idx"], rn_col="_rn")
    return (
        numbered.withColumn("_rn", F.col("_rn") - 1)
        .withColumn("story_seq", (F.col("_rn") / step).cast("long"))
        .withColumn("arg_idx", F.col("_rn") % step)
        .drop("_rn")
    )


def plan_seed_dir(
    spark: SparkSession,
    seed_dir: str,
    template: str,
    registry: DataFrame | None = None,
    step: int = SEEDS_PER_STORY,
) -> tuple[DataFrame, DataFrame]:
    """Full S2 planning pass: scan → registry dedupe → template → slice.

    Returns (planned seeds, new registry rows).  The caller commits the new
    registry rows with the same snapshot the seeds enter (exactly-once
    planning = T7; the reference marks the bucket object processed after
    submitting the plan, JssPlanner.java:96-101)."""
    rows = scan_seed_objects(spark, seed_dir)
    fresh = unprocessed_objects(rows, registry)
    planned = slice_stories(apply_seed_template(fresh, template), step)
    new_registry = fresh.select("file_name").distinct()
    return planned, new_registry


def mark_plan_done(
    seed_dir: str, file_names: list[str], recyclebin: bool = False
) -> list[str]:
    """Mark seed objects consumed once their plan has COMPLETED its crawl.

    The reference's two lifecycles, both driver-side metadata moves:
    * local: rename ``<f>`` → ``<f>.done`` (LocalFilePlanner.java:96-102)
    * object store: move the object under ``recyclebin/`` so a re-drive can
      find it (JssPlanner.java:118-128 copy + delete)

    Either way the next ``scan_seed_objects`` pass (``*.txt`` glob) no longer
    lists the object, so completion survives a registry loss.  Idempotent:
    already-moved / missing files are skipped.  Returns the files moved.
    """
    import os

    done = []
    for fn in sorted(set(file_names)):
        src = os.path.join(seed_dir, fn)
        if not os.path.exists(src):
            continue
        if recyclebin:
            bin_dir = os.path.join(seed_dir, "recyclebin")
            os.makedirs(bin_dir, exist_ok=True)
            os.replace(src, os.path.join(bin_dir, fn))
        else:
            os.replace(src, src + ".done")
        done.append(fn)
    return done
