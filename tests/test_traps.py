"""Spider-trap detection: template collapse, per-host explosion profile,
hostile-input tolerance (operators/traps)."""

from pyspark.sql import functions as F

from crawler_spark.operators.traps import trap_hosts, url_path_template


def test_url_path_template_collapse(spark):
    rows = spark.createDataFrame(
        [
            ("http://h.example/cal/2024/11/30",),
            ("http://h.example/cal/1999/1/1",),
            ("http://h.example/about",),
            ("http://h.example/",),
            ("http://h.example",),          # no path
            ("not a url at all",),          # parse_url -> NULL -> ''
            (None,),
        ],
        "url string",
    )
    got = [r.t for r in rows.select(url_path_template(F.col("url")).alias("t")).collect()]
    assert got[0] == got[1] == "/cal/{n}/{n}/{n}"
    assert got[2] == "/about"
    assert got[3] == "/"
    assert got[4] in ("", "/")   # host-only URL degrades, never raises
    assert got[5] == "" and got[6] == ""


def test_trap_hosts_flags_exploding_template(spark):
    # trap host: 200 calendar URLs, one template; bounded host: 5 pages
    # fetched 40x each (re-crawls must NOT look like a trap)
    urls = (
        [(f"http://trap.example/cal/{y}/{m}",) for y in range(2000, 2020) for m in range(1, 11)]
        + [(f"http://ok.example/p{i}",) for i in range(5)] * 40
    )
    df = spark.createDataFrame(urls, "url string")
    got = {r.host: r for r in trap_hosts(df, max_urls_per_template=100).collect()}
    t, ok = got["trap.example"], got["ok.example"]
    assert t.trap and t.n_templates == 1 and t.max_template_urls == 200
    # p0..p4 collapse to ONE template p{n} with 5 distinct urls
    assert not ok.trap and ok.max_template_urls == 5 and ok.n_urls == 5
    # null / hostless rows are dropped, not raised
    messy = df.unionByName(spark.createDataFrame([(None,), ("::::",)], "url string"))
    assert {r.host for r in trap_hosts(messy).collect()} == {"trap.example", "ok.example"}


def test_trap_hosts_plan_has_no_join(spark):
    df = spark.createDataFrame([("http://h.example/a/1",)], "url string")
    plan = trap_hosts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_engine_trap_report(spark, tmp_path_factory):
    """trap_report runs over the committed url_seen set: fixture URLs are
    numeric-id pages, so with a tight budget every crawled host flags and
    with a loose one none do."""
    from crawler_spark.fixtures import generate
    from crawler_spark.plans.engine import CrawlEngine
    from crawler_spark.plans.policy import CrawlConfig

    fix = str(tmp_path_factory.mktemp("trap_fix"))
    generate(fix, n_pages=64, n_hosts=4, seed=7)
    eng = CrawlEngine(spark, fix, str(tmp_path_factory.mktemp("trap_ck")),
                      CrawlConfig(max_rounds=4))
    eng.run()
    tight = eng.trap_report(max_urls_per_template=2).collect()
    assert tight and all(r.trap for r in tight if r.max_template_urls > 2)
    assert any(r.trap for r in tight)
    loose = eng.trap_report(max_urls_per_template=10**6).collect()
    assert not any(r.trap for r in loose)
    assert {r.host for r in loose} == {r.host for r in tight}
