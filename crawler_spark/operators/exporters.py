"""Exporter family K1-K5 + registry (SURVEY.md §2.1/§2.9).

The reference routes each completed task's accumulated structdata to an
exporter bean named by ``Task.landing`` (TaskWorker.java:222-226):

* ``file``         — header (``====…`` + the task's URLs + ``====…``) then
  every record field as its own line, written to
  ``<dir>/<story>/<mangled-url>`` (FileTaskResultExporter.java:35-113);
  empty extraction ⇒ status ``NO_EXPORTED``, no file.
* ``puretextfile`` — same, but every line is Jsoup-cleaned to pure text
  first (PureTextFileTaskResultExporter.java:21-39).
* ``html``         — filename gets ``.html``; NOTE the reference's
  ``pushHeader(List, List)`` (HtmlFileTaskResultExporter.java:13-16) is an
  OVERLOAD, not an override of ``pushHeader(List, Collection)``, so at
  runtime html files STILL carry the header — we replicate the actual
  behavior, not the intent.
* ``jssfile``      — the same lines put to an object-store bucket path
  (JssFileTaskResultExporter.java:46-65); we write plain text objects under
  ``objectstore/`` instead of Java-serialized blobs (documented deviation).
* ``no``           — drop results (BlankTaskResultExporter.java:17-22).
* ``pipeline``     — frontier feedback; handled inside the crawl round
  (plans/engine._expand, K6), not here.

Result accumulation (A1): the reference merges all page-results of a task
and flattens their structdata (TaskWorker.java:57-133,
AbstractResultExporter.java:24-41).  Spark-first: ``groupBy(task_url)`` +
``collect_list(struct(round, url, records))`` + ``flatten`` — one shuffle on
the task key, all line-building in JVM higher-order expressions.  The only
Python is the pure-text tag-stripper (Arrow-batched pandas UDF) and the
filename quirk UDF.  File materialization is a ``foreachPartition`` writer:
each executor writes its partition's files — no driver collect.

The pure-Python twins (``export_story_python``) are the golden oracle: the
simulator's story results run through them and pytest byte-compares the
files (the reference's PureTextFileTaskResultExporterTest vectors pin the
tag-stripper).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.urlnorm import url_to_filename

__all__ = [
    "HEADER",
    "FILE_LANDINGS",
    "strip_tags_line",
    "file_name_of",
    "build_lines",
    "export_story_python",
    "export_table",
    "write_export_files",
]

HEADER = "===================="  # FileTaskResultExporter.java HEADER constant
FILE_LANDINGS = ("file", "puretextfile", "html", "jssfile")
ST_EXPORTED = "EXPORTED"
ST_NO_EXPORTED = "NO_EXPORTED"

_SCRIPT_RE = re.compile(r"<(script|style)[^>]*>.*?</\1>", re.S | re.I)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_TAG_RE = re.compile(r"<[^>]+>")


def strip_tags_line(line: str) -> str:
    """Jsoup.clean(Whitelist.none, prettyPrint=false) analog for one line
    (PureTextFileTaskResultExporter.java:28-38): drop script/style/comments,
    strip all tags, keep text (whitespace preserved)."""
    if not isinstance(line, str):
        return line
    line = _SCRIPT_RE.sub("", line)
    line = _COMMENT_RE.sub("", line)
    return _TAG_RE.sub("", line)


def file_name_of(task_url: str, landing: str) -> str:
    """F5 mangling (FileTaskResultExporter.java:102-113) + the html suffix.

    The reference falls back to ``UUID.randomUUID()`` for malformed URLs —
    non-deterministic, so we substitute a content hash (documented
    deviation, urlnorm.url_to_filename docstring)."""
    name = url_to_filename(task_url)
    if name is None:
        name = "u-" + hashlib.md5(task_url.encode("utf-8", "replace")).hexdigest()
    if landing == "html":
        name += ".html"  # convertUrlToFileName IS overridden (same signature)
    return name


def build_lines(urls: list[str], record_rows: list[list[str]], landing: str):
    """(status, lines) for one task: header + body per the landing's rules.

    ``record_rows`` is the flattened structdata of all the task's pages in
    (round, url) order (the reference iterates a HashMap — order
    unspecified; we pin a deterministic one).  Non-empty extraction ⇒
    EXPORTED; otherwise NO_EXPORTED and no file
    (FileTaskResultExporter.java:44-58)."""
    lines = [HEADER] + list(urls) + [HEADER]
    for row in record_rows:
        lines.extend(row)
    needs_write = any(len(row) > 0 for row in record_rows)
    if landing == "puretextfile":
        lines = [strip_tags_line(x) for x in lines]
    return (ST_EXPORTED if needs_write else ST_NO_EXPORTED), lines


def export_story_python(story_results: list[dict]) -> dict[str, dict]:
    """Golden twin: simulator story results → {(landing, file_name): export}.

    Returns per-file dicts {landing, file_name, task_url, status, lines};
    on file-name collisions (80-char truncation) the lexicographically
    largest task_url wins — the batch analog of the reference's
    delete-then-rewrite last-writer-wins."""
    tasks: dict[str, list[dict]] = {}
    for r in story_results:
        if r["landing"] in FILE_LANDINGS:
            tasks.setdefault(r["task_url"], []).append(r)
    out: dict[str, dict] = {}
    for task_url, rows in tasks.items():
        rows = sorted(rows, key=lambda r: (r["round"], r["url"]))
        landing = rows[0]["landing"]
        urls = [r["url"] for r in rows]
        record_rows = [row for r in rows for row in r["records"]]
        status, lines = build_lines(urls, record_rows, landing)
        fname = file_name_of(task_url, landing)
        key = (landing, fname)
        if key in out and out[key]["task_url"] > task_url:
            continue
        out[key] = {
            "landing": landing,
            "file_name": fname,
            "task_url": task_url,
            "status": status,
            "lines": lines,
        }
    return out


def _strip_lines_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _f(col):
        return pd.Series(
            [None if v is None else [strip_tags_line(x) for x in v] for v in col]
        )

    return pandas_udf(_f, "array<string>")


def _file_name_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _f(task_urls, landings):
        return pd.Series(
            [file_name_of(u, l) for u, l in zip(task_urls, landings)], dtype="object"
        )

    return pandas_udf(_f, "string")


def export_table(story_results: DataFrame) -> DataFrame:
    """Spark exporter stage: story_results Δ → one row per exported file.

    Output: (task_url, landing, file_name, status, lines array<string>).
    Plan shape: one shuffle (groupBy task_url), JVM collect_list/flatten
    line-building (A1), pandas UDFs only for the tag-stripper and the
    filename quirks; collision winner via a window over (landing, file_name)
    — identical semantics to export_story_python.
    """
    sr = story_results.filter(F.col("landing").isin(*FILE_LANDINGS))
    agg = sr.groupBy("task_url", "landing").agg(
        F.sort_array(F.collect_list(F.struct("round", "url", "records"))).alias("pages")
    )
    urls = F.transform(F.col("pages"), lambda p: p["url"])
    record_rows = F.flatten(F.transform(F.col("pages"), lambda p: p["records"]))
    body = F.flatten(record_rows)
    lines = F.concat(F.array(F.lit(HEADER)), urls, F.array(F.lit(HEADER)), body)
    needs = F.exists(record_rows, lambda row: F.size(row) > 0)
    built = (
        agg.withColumn(
            "lines",
            F.when(F.col("landing") == "puretextfile", _strip_lines_udf()(lines)).otherwise(
                lines
            ),
        )
        .withColumn("status", F.when(needs, F.lit(ST_EXPORTED)).otherwise(F.lit(ST_NO_EXPORTED)))
        .withColumn("file_name", _file_name_udf()(F.col("task_url"), F.col("landing")))
        .select("task_url", "landing", "file_name", "status", "lines")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("landing", "file_name").orderBy(F.col("task_url").desc())
    return (
        built.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def write_export_files(exports: DataFrame, out_dir: str, story: str = "story") -> None:
    """K1-K4 materialization: write each EXPORTED row as a text file.

    Layout mirrors the reference: ``<out_dir>/<story>/<file_name>`` for
    file/puretextfile/html landings (exporter.story.dir), and
    ``<out_dir>/objectstore/<story>/<file_name>`` for jssfile (bucket path).
    Distributed: each executor partition writes its own files.
    """
    import os

    rows = exports.filter(F.col("status") == ST_EXPORTED).select(
        "landing", "file_name", "lines"
    )

    def _write(it):
        import uuid

        for r in it:
            if r["landing"] == "jssfile":
                d = os.path.join(out_dir, "objectstore", story)
            else:
                d = os.path.join(out_dir, story)
            os.makedirs(d, exist_ok=True)
            # write-then-rename: a task killed mid-write must never leave a
            # torn export visible (rename is atomic on a POSIX filesystem;
            # the uuid keeps speculative/retried attempts from colliding)
            final = os.path.join(d, r["file_name"])
            tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write("\n".join(r["lines"]) + "\n")
            os.replace(tmp, final)

    rows.foreachPartition(_write)
