"""Unit tests for the extraction operators P1/P2 + registry dispatch
(functions.extract) — selector semantics, paging-bar discovery, anti
detection, and malformed-input robustness (executors must never raise)."""

from crawler_spark.fixtures import ANTI_MARKER, DEFAULT_RULES, page_html
from crawler_spark.functions.extract import (
    extract_all,
    extract_content,
    extract_records,
    find_next_url,
    parse_html,
    select,
)

RULES = {r["extractor"]: r for r in DEFAULT_RULES}

HTML = (
    '<html><body><div class="caption">hello <b>world</b></div>'
    '<ul class="links">'
    '<li><a href="http://a.com/1"><b>one</b></a></li>'
    '<li><a href="//b.com/2">two</a></li>'
    "</ul>"
    '<div class="pager"><a href="/prev">prev</a>'
    '<a rel="next" href="/page2">next</a></div></body></html>'
)


def test_select_descendants_in_document_order():
    root = parse_html(HTML)
    hrefs = [n.attrs.get("href") for n in select(root, "ul.links li a")]
    assert hrefs == ["http://a.com/1", "//b.com/2"]


def test_extract_records_fields_and_nested_text():
    root = parse_html(HTML)
    recs = extract_records(root, "ul.links li a", ["self@href", "self:text"])
    assert recs == [["http://a.com/1", "one"], ["//b.com/2", "two"]]


def test_extract_content_concats_node_text():
    root = parse_html(HTML)
    assert extract_content(root, ["div.caption"]) == ["hello world"]


def test_find_next_prefers_rel_next():
    root = parse_html(HTML)
    assert find_next_url(root, "div.pager a") == "/page2"


def test_find_next_falls_back_to_first_anchor():
    root = parse_html('<div class="pager"><a href="/only">x</a></div>')
    assert find_next_url(root, "div.pager a") == "/only"


def test_extract_all_paging_dispatch():
    links, nxt, anti, recs = extract_all(HTML, "paging", RULES)
    assert links == ["http://a.com/1", "//b.com/2"]
    assert nxt == "/page2"
    assert anti is False
    assert recs[0] == ["http://a.com/1", "one"]


def test_extract_all_content_dispatch():
    links, nxt, anti, recs = extract_all(HTML, "content", RULES)
    assert recs == [["hello world"]]
    assert links == ["hello world"]  # first-field pipeline contract (P4 drops it)
    assert nxt is None and anti is False


def test_anti_requires_empty_extraction_and_marker():
    denial = page_html(7, "paging", [], None, True, "img0000000007")
    assert ANTI_MARKER in denial
    _, _, anti, recs = extract_all(denial, "paging", RULES)
    assert anti is True and recs == []
    # marker present but extraction non-empty ⇒ not anti
    mixed = HTML.replace("</body>", f"<p>{ANTI_MARKER}</p></body>")
    _, _, anti2, recs2 = extract_all(mixed, "paging", RULES)
    assert anti2 is False and len(recs2) == 2
    # empty extraction without marker (e.g. chain page) ⇒ not anti
    chain = page_html(5, "paging", [], "http://h/p/5?page=2", False, "img0000000005")
    links3, nxt3, anti3, recs3 = extract_all(chain, "paging", RULES)
    assert anti3 is False and recs3 == [] and nxt3 == "http://h/p/5?page=2"


def test_malformed_inputs_never_raise():
    for bad in [None, "", "<a href=", "<<<>>>", "<ul><li>x", "plain text", 123]:
        links, nxt, anti, recs = extract_all(bad, "paging", RULES)
        assert links == [] and recs == []
    assert extract_all(HTML, "nope", RULES) == ([], None, False, [])
    assert extract_all(HTML, None, RULES) == ([], None, False, [])


def test_unclosed_tags_partial_tree():
    root = parse_html('<ul class="links"><li><a href="/x">x')
    recs = extract_records(root, "ul.links li a", ["self@href", "self:text"])
    assert recs == [["/x", "x"]]


def test_missing_field_projects_empty_string():
    root = parse_html('<ul class="links"><li><a>noref</a></li></ul>')
    recs = extract_records(root, "ul.links li a", ["self@href", "self:text"])
    assert recs == [["", "noref"]]
