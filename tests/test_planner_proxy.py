"""Unit tests: S2 object-store seed planner (+F7/F8/O2 templating/slicing)
and the proxy-pool family S5/J6/A5/T5."""

import os

from pyspark.sql import functions as F


def _write_seed_file(d, name, ids):
    with open(os.path.join(d, name), "w") as f:
        f.write("\r\n".join(ids) + "\n")


class TestSeedPlanner:
    def test_scan_splits_crlf_and_numbers_lines(self, spark, tmpdir_path):
        from crawler_spark.sources.seed_planner import scan_seed_objects

        _write_seed_file(tmpdir_path, "a.txt", ["id one", "id2", "", "id3"])
        rows = scan_seed_objects(spark, tmpdir_path).orderBy("line_idx").collect()
        assert [(r.seed_id, r.line_idx) for r in rows] == [
            ("id one", 0), ("id2", 1), ("id3", 3)]
        assert all(r.file_name == "a.txt" for r in rows)

    def test_registry_anti_join_skips_processed(self, spark, tmpdir_path):
        from crawler_spark.sources.seed_planner import plan_seed_dir

        _write_seed_file(tmpdir_path, "a.txt", ["1", "2"])
        _write_seed_file(tmpdir_path, "b.txt", ["3"])
        registry = spark.createDataFrame([("a.txt",)], "file_name string")
        planned, new_reg = plan_seed_dir(
            spark, tmpdir_path, "http://s.example.com/q?id=%s", registry
        )
        assert {r.seed_id for r in planned.collect()} == {"3"}
        assert [r.file_name for r in new_reg.collect()] == ["b.txt"]
        # second pass with the merged registry plans nothing (exactly-once)
        merged = registry.unionByName(new_reg)
        planned2, _ = plan_seed_dir(spark, tmpdir_path, "x%s", merged)
        assert planned2.count() == 0

    def test_template_url_encodes_ids(self, spark, tmpdir_path):
        from crawler_spark.sources.seed_planner import (
            apply_seed_template,
            scan_seed_objects,
        )

        _write_seed_file(tmpdir_path, "a.txt", ["id one", "x&y"])
        out = apply_seed_template(
            scan_seed_objects(spark, tmpdir_path), "http://h/s?kw=%s"
        ).orderBy("line_idx")
        assert [r.url for r in out.collect()] == [
            "http://h/s?kw=id+one", "http://h/s?kw=x%26y"]

    def test_slice_stories_step(self, spark, tmpdir_path):
        from crawler_spark.sources.seed_planner import scan_seed_objects, slice_stories

        _write_seed_file(tmpdir_path, "a.txt", [str(i) for i in range(450)])
        out = slice_stories(scan_seed_objects(spark, tmpdir_path), step=200)
        got = {(r.story_seq, r.arg_idx) for r in out.collect()}
        assert max(s for s, _ in got) == 2
        assert (0, 0) in got and (0, 199) in got and (1, 0) in got and (2, 49) in got

    def test_mark_plan_done_lifecycle(self, spark, tmpdir_path):
        """Plan completion marks seed objects consumed: rename to .done
        (local mode) or move to recyclebin/ (object-store mode); the next
        scan no longer lists them even without the registry."""
        import os

        from crawler_spark.sources.seed_planner import (
            mark_plan_done,
            plan_seed_dir,
            scan_seed_objects,
        )

        _write_seed_file(tmpdir_path, "a.txt", ["1"])
        _write_seed_file(tmpdir_path, "b.txt", ["2"])
        _, new_reg = plan_seed_dir(spark, tmpdir_path, "x%s")
        files = [r.file_name for r in new_reg.collect()]
        done = mark_plan_done(tmpdir_path, ["a.txt"])
        assert done == ["a.txt"]
        assert os.path.exists(os.path.join(tmpdir_path, "a.txt.done"))
        assert {r.file_name for r in scan_seed_objects(spark, tmpdir_path).collect()} == {"b.txt"}
        assert mark_plan_done(tmpdir_path, ["a.txt"]) == []  # idempotent
        assert mark_plan_done(tmpdir_path, ["b.txt"], recyclebin=True) == ["b.txt"]
        assert os.path.exists(os.path.join(tmpdir_path, "recyclebin", "b.txt"))
        assert sorted(files) == ["a.txt", "b.txt"]

    def test_el_range_expansion(self, spark):
        from crawler_spark.sources.seed_planner import expand_el_range

        out = expand_el_range(spark, "http://h/list?page=%d", 2, 5).orderBy("el_idx")
        assert [r.url for r in out.collect()] == [
            f"http://h/list?page={i}" for i in (2, 3, 4, 5)]


class TestProxyPool:
    def test_parse_and_dedupe(self, spark):
        from crawler_spark.operators.proxy import parse_pool_text, pool_df

        ips = parse_pool_text("1.1.1.1:80\r\n2.2.2.2:80\n\n1.1.1.1:80\n")
        pool = pool_df(spark, ips)
        rows = pool.orderBy("idx").collect()
        assert [(r.ip, r.idx) for r in rows] == [("1.1.1.1:80", 0), ("2.2.2.2:80", 1)]

    def test_assign_is_deterministic_and_total(self, spark):
        from crawler_spark.operators.proxy import assign_proxy, pool_df

        pool = pool_df(spark, [f"10.0.0.{i}:80" for i in range(4)])
        urls = spark.createDataFrame(
            [(f"http://h{i}.example.com/p/{i}",) for i in range(50)], "url string"
        )
        a = {(r.url, r.proxy_ip) for r in assign_proxy(urls, pool).collect()}
        b = {(r.url, r.proxy_ip) for r in assign_proxy(urls, pool).collect()}
        assert a == b  # seed-deterministic pick (documented deviation from RandomUtils)
        assert all(ip is not None for _, ip in a)
        assert len({ip for _, ip in a}) == 4  # spread across the pool

    def test_assign_empty_pool_gives_null(self, spark):
        from crawler_spark.operators.proxy import assign_proxy, pool_df

        urls = spark.createDataFrame([("http://h/x",)], "url string")
        out = assign_proxy(urls, pool_df(spark, [])).collect()
        assert out[0].proxy_ip is None

    def test_evict_respects_min_size(self, spark):
        from crawler_spark.operators.proxy import evict_anti, pool_df

        pool = pool_df(spark, [f"10.0.0.{i}:80" for i in range(12)])
        anti = spark.createDataFrame(
            [(f"10.0.0.{i}:80",) for i in range(5)], "ip string"
        )
        kept = evict_anti(pool, anti, min_size=10)
        assert kept.count() == 10  # only 2 evictable of the 5 reported
        # pool already at the floor: nothing evicted
        kept2 = evict_anti(kept, anti, min_size=10)
        assert kept2.count() == 10

    def test_refresh_replaces_pool(self, spark):
        from crawler_spark.operators.proxy import refresh_pool

        pool = refresh_pool(spark, "3.3.3.3:80\n4.4.4.4:80\n")
        assert {r.ip for r in pool.collect()} == {"3.3.3.3:80", "4.4.4.4:80"}
