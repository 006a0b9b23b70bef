"""WebDataset sharded-tar export (operators/webdataset.py).

Pins: sample-exact roundtrip through a stdlib tar reader, byte-identical
re-runs (the determinism claim), the manifest-last seal, a DuckDB twin for
the md5 shard assignment, and the image+caption path (real PNG bytes decode
back pixel-exact after the tar roundtrip).
"""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.webdataset import (
    read_webdataset_dir,
    shard_assignments,
    write_webdataset,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("caption for "), F.col("id")).alias("caption"),
        F.encode(
            F.concat(F.lit("payload:"), F.md5(F.col("id").cast("string"))),
            "utf-8",
        ).cast("binary").alias("bytes"),
    )


def test_roundtrip_and_manifest(spark, tmpdir_path):
    df = _docs(spark)
    out = os.path.join(tmpdir_path, "wds")
    manifest = write_webdataset(
        df, out, key_col="doc_id",
        parts={"bin": "bytes", "txt": "caption"}, n_shards=8,
    )
    assert manifest["n_samples"] == 200
    assert len(manifest["shards"]) <= 8  # empty shards produce no tar
    # per-shard md5 in the manifest matches the file on disk
    for s in manifest["shards"]:
        p = os.path.join(out, s["name"])
        with open(p, "rb") as f:
            assert hashlib.md5(f.read()).hexdigest() == s["md5"]
        assert os.path.getsize(p) == s["bytes"]
    samples = read_webdataset_dir(out)
    assert len(samples) == 200
    want = {r["doc_id"]: r for r in df.collect()}
    for smp in samples:
        w = want[smp["key"]]
        assert smp["bin"] == bytes(w["bytes"])
        assert smp["txt"].decode() == w["caption"]


def test_byte_identical_reruns(spark, tmpdir_path):
    df = _docs(spark, n=150)
    outs = [os.path.join(tmpdir_path, d) for d in ("a", "b")]
    manifests = [
        write_webdataset(df, o, key_col="doc_id",
                         parts={"txt": "caption"}, n_shards=4)
        for o in outs
    ]
    assert manifests[0] == manifests[1]
    for s in manifests[0]["shards"]:
        with open(os.path.join(outs[0], s["name"]), "rb") as fa, \
                open(os.path.join(outs[1], s["name"]), "rb") as fb:
            assert fa.read() == fb.read(), s["name"]


def test_unsealed_export_refused(spark, tmpdir_path):
    df = _docs(spark, n=20)
    out = os.path.join(tmpdir_path, "wds")
    write_webdataset(df, out, key_col="doc_id",
                     parts={"txt": "caption"}, n_shards=2)
    os.remove(os.path.join(out, "_manifest.json"))
    with pytest.raises(FileNotFoundError):
        read_webdataset_dir(out)


def test_duplicate_keys_refused(spark, tmpdir_path):
    df = _docs(spark, n=10).union(_docs(spark, n=10))
    with pytest.raises(Exception, match="duplicate sample key"):
        write_webdataset(df, os.path.join(tmpdir_path, "wds"),
                         key_col="doc_id", parts={"txt": "caption"},
                         n_shards=1)


def test_null_part_skipped(spark, tmpdir_path):
    df = _docs(spark, n=12).withColumn(
        "caption",
        F.when(F.col("doc_id") == "doc-3", F.lit(None)).otherwise(F.col("caption")),
    )
    out = os.path.join(tmpdir_path, "wds")
    write_webdataset(df, out, key_col="doc_id",
                     parts={"bin": "bytes", "txt": "caption"}, n_shards=2)
    samples = {s["key"]: s for s in read_webdataset_dir(out)}
    assert "txt" not in samples["doc-3"] and "bin" in samples["doc-3"]
    assert "txt" in samples["doc-4"]


def test_shard_assignment_duckdb_twin(spark):
    """The md5 shard formula is engine-portable: DuckDB reproduces it."""
    duckdb = pytest.importorskip("duckdb")
    df = shard_assignments(_docs(spark, n=300), "doc_id", 16)
    got = {r["doc_id"]: r["shard"] for r in df.select("doc_id", "shard").collect()}
    want = dict(duckdb.sql(
        "SELECT d, CAST(CAST(('0x' || substr(md5('wds:' || d), 1, 15)) AS BIGINT)"
        " % 16 AS INT) AS shard "
        "FROM (SELECT 'doc-' || CAST(range AS VARCHAR) AS d FROM range(300))"
    ).fetchall())
    assert got == want


@pytest.fixture(scope="module")
def crawl_export(spark, tmp_path_factory):
    """Small mixed-codec crawl + its WebDataset export (module-shared)."""
    from crawler_spark.fixtures import generate
    from crawler_spark.plans.engine import CrawlEngine
    from crawler_spark.plans.policy import CrawlConfig

    fix = str(tmp_path_factory.mktemp("wds_fix"))
    generate(fix, n_pages=96, n_hosts=4, seed=7, image_shards=3,
             fmts=["png", "jpeg", "bmp"])
    eng = CrawlEngine(spark, fix, str(tmp_path_factory.mktemp("wds_ckpt")),
                      CrawlConfig(max_rounds=8))
    eng.run()
    out = str(tmp_path_factory.mktemp("wds_out"))
    manifest = eng.export_webdataset(out, n_shards=4)
    return eng, out, manifest


def test_engine_export_roundtrip(crawl_export, spark):
    """Crawl → WebDataset handoff: every fetched image+caption pair lands in
    the shards with the ORIGINAL stored bytes (stronger than PSNR) and the
    table's caption; json metadata carries w/h/fmt/phash."""
    import json as _json

    from pyspark.sql import functions as F
    from crawler_spark.plans.policy import ST_FETCHED

    eng, out, manifest = crawl_export
    fetched = {
        r.image_id for r in
        eng.fetch_log().filter(F.col("status") == ST_FETCHED)
        .select("url").distinct()
        .join(eng.pages.select("url", "image_id"), "url")
        .select("image_id").distinct().collect()
    }
    samples = {s["key"]: s for s in read_webdataset_dir(out)}
    assert set(samples) == fetched
    assert manifest["n_samples"] == len(fetched)
    table = {r.image_id: r for r in eng.images.collect()}
    for key, smp in samples.items():
        row = table[key]
        assert smp[row.fmt] == bytes(row.bytes)
        assert smp["txt"].decode() == row.caption
        meta = _json.loads(smp["json"])
        assert meta == {"fmt": row.fmt, "h": row.h, "phash": row.phash,
                        "w": row.w}


def test_resize_area_exact():
    """Integer-factor downscale == exact block mean; identity == copy;
    mass conserved for awkward ratios; upscale replicates area shares."""
    np = pytest.importorskip("numpy")
    from crawler_spark.functions.imaging import resize_area

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    # 2x/4x block mean (floor(x+.5) rounding)
    want = np.floor(
        img.astype(np.float64).reshape(8, 2, 6, 2, 3).mean(axis=(1, 3)) + 0.5
    ).astype(np.uint8)
    assert (resize_area(img, 8, 6) == want).all()
    assert (resize_area(img, 16, 12) == img).all()
    # non-integer ratio: global mean preserved within rounding
    small = resize_area(img, 7, 5)
    assert small.shape == (7, 5, 3)
    assert abs(small.astype(float).mean() - img.astype(float).mean()) < 1.0
    # upscale of a constant image stays constant
    const = np.full((4, 4, 3), 200, dtype=np.uint8)
    assert (resize_area(const, 9, 10) == 200).all()


def test_engine_export_training_prep(crawl_export, spark, tmp_path_factory):
    """resize_px mode: every sample is a resize_px×resize_px thumb_fmt image
    equal to resize_area(decode(original)) exactly, metadata carries source
    dims, re-runs byte-identical."""
    np = pytest.importorskip("numpy")
    import json as _json

    from crawler_spark.functions.imaging import decode_image, resize_area

    eng, _, _ = crawl_export
    out = str(tmp_path_factory.mktemp("wds_thumb"))
    m = eng.export_webdataset(out, n_shards=3, resize_px=8)
    assert m["parts"] == ["png", "txt", "json"]
    table = {r.image_id: r for r in eng.images.collect()}
    samples = read_webdataset_dir(out)
    assert len(samples) == m["n_samples"] > 0
    for smp in samples:
        row = table[smp["key"]]
        got = decode_image(smp["png"], "png")
        want = resize_area(decode_image(bytes(row.bytes), row.fmt), 8, 8)
        assert (got == want).all()
        meta = _json.loads(smp["json"])
        assert meta == {"fmt": "png", "h": 8, "phash": row.phash,
                        "src_fmt": row.fmt, "src_h": row.h, "src_w": row.w,
                        "w": 8}
    out2 = str(tmp_path_factory.mktemp("wds_thumb2"))
    assert eng.export_webdataset(out2, n_shards=3, resize_px=8) == m


def test_engine_export_rerun_byte_identical(crawl_export, tmp_path_factory):
    """Same crawl ⇒ byte-identical shards (md5s match shard-for-shard)."""
    eng, _, manifest = crawl_export
    out2 = str(tmp_path_factory.mktemp("wds_out2"))
    m2 = eng.export_webdataset(out2, n_shards=4)
    assert m2 == manifest


def test_engine_export_layouts_same_samples(crawl_export, tmp_path_factory):
    """layout='hash' (deterministic global mixing) carries the identical
    sample set and bytes as the default source-aligned layout — only the
    file layout differs."""
    eng, out_source, _ = crawl_export
    out_hash = str(tmp_path_factory.mktemp("wds_hash"))
    mh = eng.export_webdataset(out_hash, n_shards=4, layout="hash")
    assert all(s["name"].startswith("shard-") and s["name"].endswith(".tar")
               for s in mh["shards"])
    def flat(d):
        return {s["key"]: {k: v for k, v in s.items() if k != "_shard"}
                for s in read_webdataset_dir(d)}
    assert flat(out_hash) == flat(out_source)


def test_source_layout_chunking(spark, tmpdir_path):
    """source layout: one task per payload file, tars capped at
    samples_per_shard, every sample covered exactly once."""
    import os as _os

    import numpy as np

    from crawler_spark.functions.imaging import encode_png
    from crawler_spark.operators.webdataset import export_image_captions

    rows = []
    for i in range(23):
        img = np.full((4, 4, 3), i, dtype=np.uint8)
        rows.append((f"im{i:03d}", encode_png(img), 4, 4, "png",
                     f"cap {i}", i))
    src = _os.path.join(tmpdir_path, "payload.parquet")
    spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long").coalesce(1).write.parquet(src)
    samples = (
        spark.read.parquet(src)
        .select("image_id", "caption", "w", "h", "fmt", "phash")
        .withColumn("path", F.input_file_name())
    )
    out = _os.path.join(tmpdir_path, "wds")
    m = export_image_captions(samples, out, layout="source",
                              samples_per_shard=5)
    assert [s["n_samples"] for s in m["shards"]] == [5, 5, 5, 5, 3]
    got = read_webdataset_dir(out)
    assert sorted(s["key"] for s in got) == sorted(r[0] for r in rows)


def test_export_plan_single_exchange(crawl_export):
    """Both layouts shuffle the narrow sample strings exactly ONCE — the
    groupBy.applyInPandas exchange is the only Exchange in the plan (no
    redundant pre-repartition)."""
    from pyspark.sql import functions as F
    from crawler_spark.operators.webdataset import shard_assignments

    eng, _, _ = crawl_export
    samples = (
        eng.images.select("image_id", "caption", "w", "h", "fmt", "phash")
        .withColumn("path", F.input_file_name())
    )

    def n_exchanges(rows, group_col):
        df = rows.groupBy(group_col).applyInPandas(
            lambda pdf: pdf.iloc[:0][["path"]].rename(columns={"path": "name"}),
            schema="name string")
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange ")

    src_rows = samples.select(
        F.md5(F.concat(F.lit("wds:"), F.col("image_id"))).alias("skey"),
        F.col("image_id").alias("_key"), F.col("path"))
    assert n_exchanges(src_rows, "path") == 1
    hash_rows = shard_assignments(samples, "image_id", 4).select(
        "shard", "skey", F.col("image_id").alias("_key"), "path")
    assert n_exchanges(hash_rows, "shard") == 1


def test_engine_export_plan_sheds_bytes(crawl_export):
    """The JVM side of the export never scans the payload column: the only
    reads are bytes-pruned (ReadSchema without `bytes`)."""
    from pyspark.sql import functions as F
    from crawler_spark.operators.webdataset import shard_assignments

    eng, _, _ = crawl_export
    samples = (
        eng.fetch_log().select("url").distinct()
        .join(eng.pages.select("url", "image_id"), "url")
        .select("image_id").distinct()
        .join(eng.images.select("image_id", "caption", "w", "h", "fmt",
                                "phash"), "image_id")
        .join(eng.images_index, "image_id")
    )
    plan = shard_assignments(samples, "image_id", 4)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "bytes" not in line, line


def test_image_caption_pairs_survive_tar(spark, tmpdir_path):
    """North-rule payload shape: PNG bytes + caption, pixel-exact readback."""
    np = pytest.importorskip("numpy")
    from crawler_spark.functions.imaging import decode_image, encode_png

    rows, pixels = [], {}
    for i in range(24):
        rng = np.random.default_rng(seed=1000 + i)
        img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        key = f"img-{i:03d}"
        pixels[key] = img
        rows.append((key, encode_png(img), f"caption {i}"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, caption string")
    out = os.path.join(tmpdir_path, "wds")
    write_webdataset(df, out, key_col="image_id",
                     parts={"png": "bytes", "txt": "caption"}, n_shards=3)
    samples = read_webdataset_dir(out)
    assert len(samples) == 24
    for smp in samples:
        arr = decode_image(smp["png"], "png")
        assert (arr == pixels[smp["key"]]).all()
        assert smp["txt"].decode() == f"caption {int(smp['key'].split('-')[1])}"
