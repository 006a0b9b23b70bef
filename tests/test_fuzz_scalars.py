"""Hypothesis fuzz: every pure-Python scalar that runs inside an executor
must follow the never-raise contract — arbitrary (malformed, adversarial,
unicode) input yields a value or None, never an exception.  A scalar that
throws inside a pandas UDF kills the whole Arrow batch and fails the stage;
these properties are the safety net behind the per-row try/excepts NOT
existing in the scalar layer.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

text_s = st.text(max_size=80)
weird = st.one_of(
    st.none(),
    st.text(max_size=120),
    st.text(alphabet="/:?&=#%. ", max_size=60),
    st.just(""),
)


@settings(max_examples=300, deadline=None)
@given(full=weird, part=weird)
def test_prepare_url_never_raises(full, part):
    from crawler_spark.functions.urlnorm import prepare_url

    if isinstance(full, str) and isinstance(part, str):
        prepare_url(full, part)


@settings(max_examples=300, deadline=None)
@given(url=text_s)
def test_url_scalars_never_raise(url):
    from crawler_spark.functions import urlnorm as u

    u.parse_params(url)
    u.url_host(url)
    u.url_path(url)
    u.url_to_filename(url)
    u.detect_302(url, url[::-1])
    u.repair_302(url, url[::-1])
    u.append_params(url, {"a": "1"})


@settings(max_examples=300, deadline=None)
@given(body=weird)
def test_robots_parser_never_raises(body):
    from crawler_spark.functions.robots import parse_robots_txt

    prefixes, delay = parse_robots_txt(body)
    assert isinstance(prefixes, list)
    assert delay is None or isinstance(delay, float)


@settings(max_examples=200, deadline=None)
@given(html=st.one_of(st.none(), st.text(alphabet="<>ab c/=\"'!-", max_size=200)))
def test_extract_all_never_raises(html):
    from crawler_spark.functions.extract import extract_all

    rules = {
        "paging": {
            "list_sel": "ul.links li",
            "field_sels": ["a@href", "b:text"],
            "next_sel": "div.pager a",
            "anti_marker": "blocked",
        }
    }
    links, nxt, anti, recs = extract_all(html, "paging", rules)
    assert isinstance(links, list) and isinstance(recs, list)


@settings(max_examples=300, deadline=None)
@given(line=text_s)
def test_strip_tags_never_raises(line):
    from crawler_spark.operators.exporters import strip_tags_line

    out = strip_tags_line(line)
    assert "<script" not in out.lower()


@settings(max_examples=200, deadline=None)
@given(url=text_s)
def test_emulator_scalars_never_raise(url):
    from crawler_spark.functions.emulator import emulate_search_html, is_emulator_url, search_keyword

    is_emulator_url(url)
    search_keyword(url)
    emulate_search_html(url)
