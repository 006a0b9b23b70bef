"""Unit tests pinning the reference URL quirks (SURVEY.md §5.1).

Cases come from the reference's own test + main methods:
NextPageTest.java:12-80 and Crawlers.java:354-372 (main).
"""

from crawler_spark.functions.urlnorm import (
    append_params,
    java_split,
    java_url_parse,
    parse_params,
    prepare_url,
    url_host,
    url_to_filename,
)


class TestJavaUrlParse:
    # NextPageTest.java test(): URL decomposition
    def test_decompose_with_path_and_query(self):
        u = java_url_parse("https://book.douban.com/tag/%E5%B0%8F%E8%AF%B4?abc=133&456")
        assert u.protocol == "https"
        assert u.host == "book.douban.com"
        assert u.port == -1
        assert u.path == "/tag/%E5%B0%8F%E8%AF%B4"
        assert u.query == "abc=133&456"

    def test_empty_path_with_query(self):
        u = java_url_parse("https://book.douban.com?abc=133&456")
        assert u.path == ""
        assert u.query == "abc=133&456"

    def test_no_query_is_none(self):
        u = java_url_parse("https://book.douban.com")
        assert u.path == ""
        assert u.query is None

    # NextPageTest.java testUrl()
    def test_query_extraction(self):
        u = java_url_parse("http://www.baidu.com/redirect.html?abc=23r&dsfsf=3r2432")
        assert u.query == "abc=23r&dsfsf=3r2432"

    # NextPageTest.java test302(): host/path equivalence across encodings
    def test_302_host_path_match(self):
        u1 = java_url_parse("https://search.smzdm.com/?c=home&s=送妈妈&order=time&v=b")
        u2 = java_url_parse(
            "https://search.smzdm.com/?c=home&s=%E9%80%81%E5%A6%88%E5%A6%88&order=time&v=b"
        )
        assert u1.host == u2.host
        assert u1.path == u2.path

    def test_malformed(self):
        assert java_url_parse("//no.protocol/x") is None
        assert java_url_parse("/relative") is None
        assert java_url_parse("notaproto://x.com/") is None
        assert java_url_parse("http://h:notaport/x") is None

    def test_explicit_port(self):
        u = java_url_parse("http://example.com:8080/a?b=1")
        assert u.host == "example.com"
        assert u.port == 8080


class TestPrepareUrl:
    # NextPageTest.java testPrepareUrl(): protocol-relative repair
    def test_protocol_relative(self):
        part = "//post.smzdm.com/p/aqnl5x3k/"
        full = "https://search.smzdm.com/?c=post&s=送妈妈&order=time&v=b"
        assert prepare_url(full, part) == "https:" + part

    # Crawlers.java main(): the two printed examples
    def test_main_example_protocol_relative(self):
        assert (
            prepare_url("https://www.baidu.com?a=1", "//www.baidu.com/b=2")
            == "https://www.baidu.com/b=2"
        )

    def test_main_example_absolute_path(self):
        assert prepare_url("https://www.baidu.com?a=1", "/b=2") == "https://www.baidu.com/b=2"

    def test_already_absolute_part_returned(self):
        assert prepare_url("http://a.com/x", "http://b.com/y") == "http://b.com/y"

    def test_malformed_base_returns_part(self):
        assert prepare_url("nope", "/x") == "/x"

    def test_port_colon_dropped_quirk(self):
        # Crawlers.java:299: domain = proto://host + port  (no ':' separator!)
        assert prepare_url("http://h.com:8080/a", "/b") == "http://h.com8080/b"

    def test_host_substring_splice(self):
        # Crawlers.java:303-306: part containing base host is spliced at index
        assert prepare_url("http://h.com/a", "see h.com/deep/page") == "http://h.com/deep/page"


class TestParseParams:
    # Crawlers.java main(): parseParams("http://www.baidu.com/redirect.html?a=1&b=2")
    def test_main_example(self):
        assert parse_params("http://www.baidu.com/redirect.html?a=1&b=2") == {"a": "1", "b": "2"}

    def test_valueless_param_dropped(self):
        # "456" has no '=' → kv.length==1 → skipped (Crawlers.java:325-327)
        assert parse_params("https://book.douban.com?abc=133&456") == {"abc": "133"}

    def test_trailing_equals_java_split(self):
        # Java split drops trailing empties: "a=" → ["a"] → skipped
        assert parse_params("http://x.com?a=&b=2") == {"b": "2"}

    def test_empty_key_kept(self):
        assert parse_params("http://x.com?=v") == {"": "v"}

    def test_multi_equals_takes_second_field_only(self):
        assert parse_params("http://x.com?a=1=2") == {"a": "1"}

    def test_malformed_url(self):
        assert parse_params("not a url") == {}


class TestAppendParams:
    # Crawlers.java main(): appendParams("http://www.baidu.com?a=b", {1:2})
    def test_with_existing_query(self):
        assert append_params("http://www.baidu.com?a=b", {"1": "2"}) == "http://www.baidu.com?a=b&1=2"

    # Crawlers.java main(): appendParams("http://www.baidu.com", {1:2}) → "?&"
    def test_without_query_quirk(self):
        assert append_params("http://www.baidu.com", {"1": "2"}) == "http://www.baidu.com?&1=2"

    def test_malformed_returned_unchanged(self):
        assert append_params("nope", {"a": "b"}) == "nope"


class TestJavaSplit:
    def test_trailing_empties_removed(self):
        assert java_split("a==", "=") == ["a"]
        assert java_split("a=1", "=") == ["a", "1"]
        assert java_split("=b", "=") == ["", "b"]
        assert java_split("a&&b", "&") == ["a", "", "b"]


class TestFilename:
    def test_mangle(self):
        # FileTaskResultExporter.java:102-113
        assert url_to_filename("http://h.com/a/b/c?x=1") == "abc-x=1"
        assert url_to_filename("http://h.com/a/b/c") == "abc"

    def test_cap_80(self):
        long_url = "http://h.com/" + "p" * 200
        assert len(url_to_filename(long_url)) == 80

    def test_malformed_none(self):
        assert url_to_filename("::nope") is None


class TestHost:
    def test_host(self):
        assert url_host("http://h7.example.com/p/3") == "h7.example.com"
        assert url_host("garbage") is None


def test_pandas_udf_roundtrip(spark):
    from pyspark.sql import functions as F

    from crawler_spark.functions.urlnorm import prepare_url_udf, url_host_udf

    df = spark.createDataFrame(
        [
            ("https://search.smzdm.com/?c=post", "//post.smzdm.com/p/1/"),
            ("https://www.baidu.com?a=1", "/b=2"),
            ("http://h.com:8080/a", "/b"),
        ],
        ["base", "href"],
    )
    out = df.select(
        prepare_url_udf()(F.col("base"), F.col("href")).alias("resolved")
    ).collect()
    assert [r.resolved for r in out] == [
        "https://post.smzdm.com/p/1/",
        "https://www.baidu.com/b=2",
        "http://h.com8080/b",
    ]
    hosts = df.select(url_host_udf()(F.col("base")).alias("h")).collect()
    assert hosts[0].h == "search.smzdm.com"


class Test302:
    """P7 detection/repair (reference BackLogFetcher.java:164-205)."""

    def test_detects_host_and_path_mismatch(self):
        from crawler_spark.functions.urlnorm import detect_302

        assert detect_302("http://a.com/p/1", "http://b.com/p/1") is True
        assert detect_302("http://a.com/p/1", "http://a.com/p/2") is True
        # same host+path, different query ⇒ NOT a 302 event
        assert detect_302("http://a.com/p/1", "http://a.com/p/1?x=1") is False
        assert detect_302("http://a.com/p/1", None) is False
        # parse failure on either side is ignored (reference catches)
        assert detect_302("http://a.com/p/1", "::bad::") is False
        assert detect_302("::bad::", "http://a.com/p/1") is False

    def test_repair_appends_missing_params_with_quirks(self):
        from crawler_spark.functions.urlnorm import repair_302

        # no query on the original → '?&k=v' (F3 quirk)
        assert repair_302("http://a.com/p", "http://b.com/p?sid=9") == "http://a.com/p?&sid=9"
        # existing query → bare '&'
        assert (
            repair_302("http://a.com/p?x=1", "http://b.com/p?x=2&sid=9")
            == "http://a.com/p?x=1&sid=9"
        )
        # no param delta → no repair even though redirected
        assert repair_302("http://a.com/p", "http://b.com/p") is None
        # not a 302 → no repair
        assert repair_302("http://a.com/p", "http://a.com/p?sid=9") is None
