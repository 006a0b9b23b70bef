"""Extraction operators P1/P2 and the extractor registry (SURVEY.md §2.9).

The reference dispatches per-task extractor beans by name
(RawDataExtractor.java:100-103, interface Extractor.java:9-20):

* ``paging``  — a list XPath selects record nodes, then ``|``-separated
  field XPaths project each node into a row of strings; the paging bar
  yields the next-page URL (PagingExtractor.java:64-87).
* ``content`` — multiple XPaths select nodes over the whole document and
  their text is concatenated into a single structdata row
  (ContentExtractor.java:35-59).
* anti-crawl detection — empty extraction + anti marker hit flags the URL
  (ContentExtractor.java:62-80, raw-substring variant).

Spark-first re-expression: extraction is a vectorized pandas UDF over the
fetched ``content`` column, dispatched by the ``extractor`` column, returning
``struct<links, next_url, anti, records>`` in one Arrow pass.  The frontier
feedback (K6, PipelineResultExporter.java:29-59) takes the FIRST FIELD of
each record row as the next-wave URL — exactly the reference's pipeline
contract — gated on the task's ``landing`` being ``pipeline``.

The selector engine is a deliberate XPath-lite (no lxml in the container):
``tag.class`` steps with descendant combinators over a stdlib-html.parser
DOM, field specs ``self@attr`` / ``self:text`` / ``sub sel@attr``.  The
pure-Python scalars are shared with the golden simulator so Spark and the
reference replay extract with ONE implementation.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Optional

__all__ = [
    "parse_html",
    "select",
    "node_text",
    "extract_records",
    "extract_content",
    "find_next_url",
    "extract_all",
    "extract_all_udf",
    "fetch_parse_udf",
    "parse_cookie_header",
    "render_cookie_markers",
    "EXTRACT_SCHEMA",
    "FETCH_PARSE_SCHEMA",
]

_VOID_TAGS = frozenset({"img", "br", "hr", "meta", "link", "input", "area", "base", "col"})


class _Node:
    __slots__ = ("tag", "attrs", "children", "text")

    def __init__(self, tag: str, attrs) -> None:
        self.tag = tag
        self.attrs = dict(attrs)
        self.children: list[_Node] = []
        self.text: list[str] = []


class _DomBuilder(HTMLParser):
    """Forgiving tree builder: unclosed/mismatched tags never raise."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, attrs)
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, attrs))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        self.stack[-1].text.append(data)


def parse_html(html: str) -> _Node:
    b = _DomBuilder()
    try:
        b.feed(html)
        b.close()
    except Exception:  # malformed input yields a partial tree, never an error
        pass
    return b.root


def _match(node: _Node, step: str) -> bool:
    tag, _, cls = step.partition(".")
    if tag and node.tag != tag:
        return False
    if cls and cls not in (node.attrs.get("class") or "").split():
        return False
    return True


def _descendants(n: _Node):
    for c in n.children:
        yield c
        yield from _descendants(c)


def select(root: _Node, sel: str) -> list[_Node]:
    """Descendant-combinator selector: ``"ul.links li a"`` (document order)."""
    cur = [root]
    for step in sel.split():
        cur = [d for n in cur for d in _descendants(n) if _match(d, step)]
    return cur


def node_text(n: _Node) -> str:
    return "".join(n.text) + "".join(node_text(c) for c in n.children)


def _field(node: _Node, spec: str) -> str:
    """Project one field from a record node.

    ``self@href`` / ``self:text`` read the node itself; ``a.cls@href`` /
    ``span.cls:text`` read the first matching descendant.  Missing targets
    project to "" (the reference emits empty strings for missed XPaths).
    """
    if "@" in spec:
        selpart, _, attr = spec.rpartition("@")
        kind, arg = "attr", attr
    elif spec.endswith(":text"):
        selpart, kind, arg = spec[:-5], "text", ""
    else:
        selpart, kind, arg = spec, "text", ""
    if selpart in ("", "self"):
        targets = [node]
    else:
        targets = select(node, selpart)
    if not targets:
        return ""
    t = targets[0]
    return (t.attrs.get(arg) or "") if kind == "attr" else node_text(t).strip()


def extract_records(root: _Node, list_sel: str, field_sels: list[str]) -> list[list[str]]:
    """P1 (PagingExtractor.java:64-87): list node → field projections per row."""
    return [[_field(n, f) for f in field_sels] for n in select(root, list_sel)]


def extract_content(root: _Node, sels: list[str]) -> list[str]:
    """P2 (ContentExtractor.java:35-59): per selector, concat all node texts."""
    return [" ".join(node_text(n).strip() for n in select(root, s)) for s in sels]


def find_next_url(root: _Node, next_sel: str) -> Optional[str]:
    """Paging-bar discovery: first ``rel=next`` anchor under the selector
    (falls back to the first anchor — the reference's pager heuristic)."""
    nodes = select(root, next_sel)
    for n in nodes:
        if n.attrs.get("rel") == "next" and n.attrs.get("href"):
            return n.attrs["href"]
    for n in nodes:
        if n.attrs.get("href"):
            return n.attrs["href"]
    return None


def extract_all(
    html: Optional[str], extractor: Optional[str], rules: dict
) -> tuple[list[str], Optional[str], bool, list[list[str]]]:
    """Registry dispatch: (links, next_url, anti, records) for one page.

    * records — extractor-specific structdata rows
    * links   — first field of each record row (the pipeline contract,
      PipelineResultExporter.java:29-59); downstream valid-URL filtering
      (P4) drops non-URL fields
    * anti    — empty extraction AND anti-marker hit (P3)
    """
    if not isinstance(html, str) or html == "":
        return [], None, False, []
    r = rules.get(extractor)
    if r is None:
        return [], None, False, []
    root = parse_html(html)
    if r.get("list_sel"):
        records = extract_records(root, r["list_sel"], list(r.get("field_sels") or []))
    elif r.get("content_sels"):
        row = extract_content(root, list(r["content_sels"]))
        records = [row] if any(f != "" for f in row) else []
    else:
        records = []
    next_url = find_next_url(root, r["next_sel"]) if r.get("next_sel") else None
    marker = r.get("anti_marker")
    anti = bool(marker) and not records and marker in html
    links = [row[0] for row in records if row and row[0]]
    return links, next_url, anti, records


def parse_cookie_header(cookies: Optional[str]) -> dict:
    """Canonical task-cookie string ``"k=v; k2=v2"`` → dict.

    The reference carries per-task cookies as a map and builds the request's
    Cookie header from it (Task.cookies, BackLogFetcher.java:122-127); the
    frontier stores the header form because it is orderable (it rides the
    first-submission-wins tie-break struct) and parquet-friendly."""
    out: dict = {}
    if not cookies:
        return out
    for part in cookies.split(";"):
        k, sep, v = part.strip().partition("=")
        if sep and k:
            out[k] = v
    return out


_COOKIE_RE = re.compile(r"\{\{cookie:([^}]*)\}\}")


def render_cookie_markers(html: str, cookies: Optional[str]) -> str:
    """Server-side cookie echo for the synthetic web: ``{{cookie:NAME}}``
    markers render as the task's cookie value (missing cookie → "").  This is
    the deterministic stand-in for cookie-dependent responses; the Spark
    fetch UDF and the golden simulator share this one scalar."""
    if "{{cookie:" not in html:
        return html
    jar = parse_cookie_header(cookies)
    return _COOKIE_RE.sub(lambda m: jar.get(m.group(1), ""), html)


EXTRACT_SCHEMA = (
    "links array<string>, next_url string, anti boolean, records array<array<string>>"
)

FETCH_PARSE_SCHEMA = (
    "known boolean, extractor string, links array<string>, next_url string, "
    "anti boolean, records array<array<string>>, redirected boolean, repaired_url string"
)


def fetch_parse_udf(rules: dict):
    """The round's ENTIRE per-row Python in one Arrow pass:
    (url, redirect_url, content, extractor, cookies) → FETCH_PARSE_SCHEMA.

    Fuses emulator rendering (S4, functions.emulator), the task-cookie echo
    (render_cookie_markers — the reference builds each request with
    Task.cookies, BackLogFetcher.java:122-127), extraction dispatch (P1/P2),
    and 302 detect/repair (P7, functions.urlnorm) — one pandas-UDF stage
    instead of three.  Three separate UDF projections measurably cost
    ~serial driver/plan overhead per round at bench scale (each stage is its
    own exec node, plan subtree, and Python round-trip); the fetch loop is
    latency-critical, so the hot path gets exactly one Python hop.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from crawler_spark.functions.emulator import emulator_script
    from crawler_spark.functions.urlnorm import detect_302, repair_302

    def _f(urls, redirects, contents, extractors, cookies):
        out = {k: [] for k in (
            "known", "extractor", "links", "next_url", "anti", "records",
            "redirected", "repaired_url",
        )}
        for u, rd, html, ex, ck in zip(urls, redirects, contents, extractors, cookies):
            scr = emulator_script(u) if isinstance(u, str) else None
            if scr is not None:  # registry dispatch: (extractor, renderer)
                html, ex, rd = scr[1](u), scr[0], None
            known = isinstance(html, str)
            if known:
                html = render_cookie_markers(html, ck if isinstance(ck, str) else None)
            links, nxt, anti, recs = extract_all(html, ex, rules) if known else ([], None, False, [])
            out["known"].append(known)
            out["extractor"].append(ex)
            out["links"].append(links)
            out["next_url"].append(nxt)
            out["anti"].append(anti)
            out["records"].append(recs)
            out["redirected"].append(detect_302(u, rd) if isinstance(u, str) else False)
            out["repaired_url"].append(repair_302(u, rd) if isinstance(u, str) else None)
        return pd.DataFrame(out)

    return pandas_udf(_f, FETCH_PARSE_SCHEMA)


def extract_all_udf(rules: dict):
    """Vectorized extraction stage: (content, extractor) → EXTRACT_SCHEMA.

    ``rules`` is a plain dict (tiny — per-story templates in the reference,
    J1 rule lookup); it rides the UDF closure to the executors.  One Arrow
    batch in, one struct column out — the per-document parse runs inside the
    batch, the pattern SURVEY.md allows for genuinely Python work.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _f(content, extractor):
        links, nexts, antis, recs = [], [], [], []
        for html, ex in zip(content, extractor):
            l, n, a, rr = extract_all(html, ex, rules)
            links.append(l)
            nexts.append(n)
            antis.append(a)
            recs.append(rr)
        return pd.DataFrame(
            {"links": links, "next_url": nexts, "anti": antis, "records": recs}
        )

    return pandas_udf(_f, EXTRACT_SCHEMA)
