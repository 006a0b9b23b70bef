"""robots.txt ingestion: raw fetched bodies → the structured politeness table.

The engine's politeness stage (operators/politeness.py, T4) consumes a
broadcast table ``(host, disallow_prefixes, crawl_delay_s)``.  Fixtures emit
that table directly; a real deployment fetches ``/robots.txt`` bodies and
parses them.  This module is that ingestion step — an RFC 9309-lite parser
(the reference has NO robots support; robots politeness is the north-rule
addition, so there is no reference file to cite):

* lines are ``key: value`` with ``#`` comments, keys case-insensitive
* consecutive ``User-agent`` lines open one group; a group's rules apply to
  all its agents
* group selection: the longest agent token that is a substring of our agent
  name wins; ``*`` matches with specificity 0; no match ⇒ no rules
* ``Disallow:`` with an empty value allows everything (ignored)
* ``Crawl-delay`` (non-standard but ubiquitous) parses as float seconds

Spark-side: one vectorized pandas UDF over (host, body) rows — parsing is
per-row pure Python on a tiny table (one row per HOST, not per URL), then
the result broadcasts exactly like the fixture table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_robots_txt", "write_robots_txt", "robots_table_from_bodies"]

DEFAULT_AGENT = "crawler-spark"

ROBOTS_SCHEMA = "disallow_prefixes array<string>, crawl_delay_s double"


def parse_robots_txt(text: str | None, agent: str = DEFAULT_AGENT):
    """→ (disallow_prefixes: list[str], crawl_delay_s: float | None).

    Malformed input never raises: unparseable lines are skipped, a missing
    or empty body yields ([], None) — the executor-safety contract every
    scalar in this package follows.
    """
    if not isinstance(text, str) or not text.strip():
        return [], None
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    in_agents = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agents = True
            cur_agents.append(val.lower())
        else:
            in_agents = False
            if cur_agents:
                cur_rules.append((key, val))
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    agent_l = agent.lower()
    best_spec, best_rules = -1, None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                spec = 0
            elif a and a in agent_l:
                spec = len(a)
            else:
                continue
            if spec > best_spec:
                best_spec, best_rules = spec, rules
    if best_rules is None:
        return [], None

    prefixes: list[str] = []
    delay = None
    for key, val in best_rules:
        if key == "disallow" and val:
            prefixes.append(val)
        elif key == "crawl-delay":
            try:
                delay = float(val)
            except ValueError:
                pass
    return prefixes, delay


def robots_sitemaps(text: str | None) -> list[str]:
    """Extract ``Sitemap:`` directive URLs from a robots.txt body.

    RFC 9309 §2.3 scopes the directive OUTSIDE user-agent groups (it applies
    to all agents), so this is a flat scan independent of group matching;
    order preserved, duplicates dropped, malformed input → [] (the
    executor-safety contract).  Feeds ``sources.sitemaps`` as the discovery
    path real crawls use.
    """
    if not isinstance(text, str) or not text.strip():
        return []
    out: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, sep, val = line.partition(":")
        if sep and key.strip().lower() == "sitemap":
            val = val.strip()
            if val and val not in out:
                out.append(val)
    return out


def write_robots_txt(
    disallow_prefixes: list[str], crawl_delay_s: float | None,
    agent: str = "*", sitemaps: list[str] | tuple[str, ...] = (),
) -> str:
    """Inverse of the parser (test roundtrip + fixture raw-body generation).

    ``sitemaps`` emits RFC 9309 §2.3 ``Sitemap:`` directives ahead of the
    group (they are group-independent) — the discovery hook
    ``robots_sitemaps``/``sources.sitemaps`` consumes.
    """
    lines = [f"Sitemap: {u}" for u in sitemaps]
    lines += [f"User-agent: {agent}"]
    lines += [f"Disallow: {p}" for p in disallow_prefixes]
    if crawl_delay_s is not None:
        lines.append(f"Crawl-delay: {crawl_delay_s}")
    return "\n".join(lines) + "\n"


def robots_table_from_bodies(
    bodies: DataFrame, agent: str = DEFAULT_AGENT,
    host_col: str = "host", body_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) → (host, disallow_prefixes, crawl_delay_s).

    One row per host — broadcast-sized by construction; the parse UDF runs
    once per host, never per URL.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _parse(col):
        rows = []
        for body in col:
            pfx, delay = parse_robots_txt(body, agent)
            rows.append({"disallow_prefixes": pfx, "crawl_delay_s": delay})
        return pd.DataFrame(rows)

    udf = pandas_udf(_parse, ROBOTS_SCHEMA)
    return bodies.select(
        F.col(host_col).alias("host"), udf(F.col(body_col)).alias("_r")
    ).select("host", "_r.disallow_prefixes", "_r.crawl_delay_s")
