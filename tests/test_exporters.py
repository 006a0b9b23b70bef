"""Unit tests for the exporter family K1-K5 (operators.exporters).

The pure-text vectors come from the reference's own test
(PureTextFileTaskResultExporterTest.java:13-28) — they pin the Jsoup
Whitelist.none() cleaning semantics our tag-stripper replicates.  The
Spark-vs-python export equivalence and the file byte-compare run in
tests/test_crawl_golden.py against the engine's story results.
"""

from crawler_spark.operators.exporters import (
    HEADER,
    ST_EXPORTED,
    ST_NO_EXPORTED,
    build_lines,
    export_story_python,
    file_name_of,
    strip_tags_line,
)

# PureTextFileTaskResultExporterTest.java:13-28 inputs → Jsoup.clean outputs
REFERENCE_VECTORS = [
    ("=====", "====="),
    ("http://www.baidu.com", "http://www.baidu.com"),
    ("<body>1</body>", "1"),
    ("<body>\r\n2<span>3</span></body>", "\r\n23"),
    ("<body>2\r\n<span><font>4</font>3</span></body>", "2\r\n43"),
    ("<span>3-1</span>", "3-1"),
    ("2<span><font>4</font>3</span>", "243"),
]


def test_strip_tags_reference_vectors():
    for raw, expected in REFERENCE_VECTORS:
        assert strip_tags_line(raw) == expected


def test_strip_tags_drops_script_style_comments():
    assert strip_tags_line("a<script>x=1</script>b<!-- c -->d<style>e</style>f") == "abdf"


def test_build_lines_file_header_and_body():
    status, lines = build_lines(
        ["http://h/p/1", "http://h/p/1?page=1"], [["f1", "f2"], ["g1"]], "file"
    )
    assert status == ST_EXPORTED
    assert lines == [HEADER, "http://h/p/1", "http://h/p/1?page=1", HEADER, "f1", "f2", "g1"]


def test_build_lines_empty_extraction_no_export():
    status, lines = build_lines(["http://h/p/1"], [], "file")
    assert status == ST_NO_EXPORTED
    assert lines == [HEADER, "http://h/p/1", HEADER]
    # a row of empty lists still counts as empty
    status2, _ = build_lines(["u"], [[], []], "html")
    assert status2 == ST_NO_EXPORTED


def test_build_lines_puretext_cleans_every_line():
    status, lines = build_lines(["http://h/p/1"], [["<b>x</b>", "y"]], "puretextfile")
    assert status == ST_EXPORTED
    assert lines == [HEADER, "http://h/p/1", HEADER, "x", "y"]


def test_html_landing_keeps_header_quirk_and_suffix():
    # HtmlFileTaskResultExporter.pushHeader(List, List) OVERLOADS (does not
    # override) pushHeader(List, Collection): html files carry the header.
    status, lines = build_lines(["u1"], [["<p>b</p>"]], "html")
    assert lines[0] == HEADER and lines[-1] == "<p>b</p>"
    assert file_name_of("http://h.example.com/a/b?q=1", "html") == "ab-q=1.html"


def test_file_name_mangles_and_falls_back_deterministically():
    assert file_name_of("http://h.example.com/p/7", "file") == "p7"
    n1 = file_name_of("notaurl", "file")
    n2 = file_name_of("notaurl", "file")
    assert n1 == n2 and n1.startswith("u-")  # md5 fallback, not a random UUID


def test_export_story_python_groups_by_task_and_resolves_collisions():
    rows = [
        {"round": 1, "url": "http://h/t?page=1", "task_url": "http://h/t",
         "landing": "file", "records": [["b"]]},
        {"round": 0, "url": "http://h/t", "task_url": "http://h/t",
         "landing": "file", "records": [["a"]]},
        {"round": 0, "url": "http://h/x", "task_url": "http://h/x",
         "landing": "no", "records": [["dropped"]]},
    ]
    out = export_story_python(rows)
    assert set(out) == {("file", "t")}
    exp = out[("file", "t")]
    # pages ordered by (round, url): base page's records come first
    assert exp["lines"] == [HEADER, "http://h/t", "http://h/t?page=1", HEADER, "a", "b"]
    assert exp["status"] == ST_EXPORTED
