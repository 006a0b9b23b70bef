"""Pure-Python golden-reference simulator (SURVEY.md §5 item 2).

Replays the reference crawler's observable semantics — FIFO-per-host fetch
order under politeness budgets, URL-seen membership, retry/anti caps, paging
bound, robots filtering, recycle-bin re-drive — single-threaded over the
fixtures, producing the golden fetch log + URL-seen set the Spark engine
must reproduce EXACTLY (north_rule invariant).

All policy comes from crawler_spark.plans.policy (shared with the engine);
URL resolution comes from crawler_spark.functions.urlnorm (the same scalars
the engine's pandas UDFs wrap).  The simulator is therefore an executable
spec, not a second implementation of the rules.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from crawler_spark.fixtures import load_tables
from crawler_spark.functions.emulator import emulator_script
from crawler_spark.functions.extract import extract_all, render_cookie_markers
from crawler_spark.functions.urlnorm import (
    detect_302,
    prepare_url,
    repair_302,
    url_host,
    url_path,
)
from crawler_spark.plans.policy import (
    MAX_BIN_GENERATIONS,
    CrawlConfig,
    child_priority,
    child_priority_indegree,
    classify_fetch,
    is_disallowed,
    order_key,
    proxy_index,
    seed_priority,
    ST_FETCHED,
)

__all__ = ["SimResult", "simulate"]


@dataclass
class _Entry:
    wave: int
    priority: int
    page_idx: int
    attempt: int
    generation: int
    task_url: str
    cookies: str = ""  # task Cookie header ("" = none); chains/children inherit


@dataclass
class SimResult:
    fetch_log: list = field(default_factory=list)  # dicts: round, host, rank, url, status, attempt
    url_seen: set = field(default_factory=set)
    dead: list = field(default_factory=list)  # dicts: url, reason, generation, round
    lineage: list = field(default_factory=list)  # per-round counters
    story_results: list = field(default_factory=list)  # round, url, extractor, landing, records
    rounds: int = 0

    def fetched_urls(self) -> list:
        return [e["url"] for e in self.fetch_log if e["status"] == ST_FETCHED]

    def per_host_fetch_order(self) -> dict:
        out: dict[str, list] = {}
        for e in self.fetch_log:
            if e["status"] == ST_FETCHED:
                out.setdefault(e["host"], []).append(e["url"])
        return out


def simulate(
    fix_dir: str, cfg: CrawlConfig | None = None, proxy_ips: list | None = None
) -> SimResult:
    cfg = cfg or CrawlConfig()
    # J6 proxy pick mirror: same sorted pool + same md5 index as the engine
    pool = sorted(set(proxy_ips)) if proxy_ips else []
    tables = load_tables(fix_dir)
    pages, robots, seeds = tables["pages"], tables["robots"], tables["seeds"]
    rules = tables["rules"]
    landing_of = {name: (r.get("landing") or "no") for name, r in rules.items()}

    res = SimResult()
    pending: dict[str, _Entry] = {}

    def admit(
        url: str, wave: int, priority: int, page_idx: int, generation: int,
        task_url: str, cookies: str = "",
    ) -> bool:
        """First-submission-wins membership (U2); returns True if admitted."""
        if url in res.url_seen:
            return False
        host = url_host(url)
        if host is None:
            return False
        rb = robots.get(host)
        if rb is not None and is_disallowed(url_path(url) or "", rb["disallow_prefixes"]):
            return False
        res.url_seen.add(url)
        pending[url] = _Entry(wave, priority, page_idx, 0, generation, task_url, cookies)
        return True

    for idx, s in enumerate(seeds):
        admit(s["url"], 0, seed_priority(idx), 0, 0, s["url"], s.get("cookies") or "")

    rnd = 0
    while rnd < cfg.max_rounds:
        if not pending:
            # recycle-bin re-drive (U1): resubmit retriable dead tasks as the
            # next generation, ≤ MAX_BIN_GENERATIONS (SavePointPlanner.java:106-126)
            redrive = [
                d
                for d in res.dead
                if d["reason"] in ("fetch_retries_exhausted", "anti_retries_exhausted", "timeout")
                and d["generation"] < MAX_BIN_GENERATIONS
                and d["url"] not in pending
                and not d.get("redriven")
            ]
            if not redrive:
                break
            for d in sorted(redrive, key=lambda d: d["url"]):
                d["redriven"] = True
                # the bin stores (url, reason, generation) only — a re-driven
                # task restarts without cookies (mirrors engine._redrive)
                pending[d["url"]] = _Entry(
                    rnd, child_priority(), 0, 0, d["generation"] + 1, d["url"], ""
                )
        # --- politeness-ranked fetch batch (O1/T4) -------------------------
        by_host: dict[str, list] = {}
        for url, e in pending.items():
            if e.wave > rnd:
                continue  # admitted for a later wave
            by_host.setdefault(url_host(url), []).append(order_key(e.wave, e.priority, url))
        batch: list[tuple[str, str, int]] = []  # (host, url, rank)
        for host in sorted(by_host):
            rb = robots.get(host)
            delay = rb["crawl_delay_s"] if rb is not None else None
            budget = cfg.host_budget(delay)
            ordered = sorted(by_host[host])
            for rank, (_, _, url) in enumerate(ordered[:budget], start=1):
                batch.append((host, url, rank))
        if not batch:
            rnd += 1
            continue
        # T2 round deadline (mirrors the engine: swept only on non-empty
        # rounds): eligible rows the budget passed over for max_wait_rounds
        # rounds die TIMEOUTED (→ recycle bin)
        if cfg.max_wait_rounds is not None:
            selected_urls = {url for _, url, _ in batch}
            for url in sorted(pending):
                e = pending[url]
                if (
                    e.wave <= rnd
                    and url not in selected_urls
                    and rnd - e.wave >= cfg.max_wait_rounds
                ):
                    del pending[url]
                    res.dead.append(
                        {"url": url, "reason": "timeout", "generation": e.generation, "round": rnd}
                    )
        # --- fetch + classify (S3/P3/J4) ------------------------------------
        admitted = {}  # url -> candidate (priority, page_idx, generation)
        # priority_mode="indegree": child discoveries collect here first —
        # (bases that cited the child, min (generation, cookies)) — because a
        # child's priority depends on ALL of this round's discoveries
        # (engine's countDistinct(src_page) groupBy)
        child_disc: dict[str, tuple[set, tuple]] = {}
        n_fetched = n_failed = n_dead = 0
        for host, url, rank in batch:
            e = pending[url]
            # fetch: emulator path (S4, scripted browser) or page-table join
            page = pages.get(url)
            scr = emulator_script(url)
            if scr is not None:  # registry dispatch: (extractor, renderer)
                content = scr[1](url)
                extractor = scr[0]
                known = content is not None
                fail_count, redirect = 0, None
            elif page is not None:
                content, extractor = page["content"], page["extractor"]
                known = True
                fail_count, redirect = int(page["fail_count"]), page["redirect_url"]
            else:
                content, extractor, known, fail_count, redirect = None, None, False, 0, None
            # extraction (P1/P2): same scalars the engine's pandas UDF wraps,
            # after the task-cookie echo (render_cookie_markers)
            if known:
                content = render_cookie_markers(content, e.cookies)
                links, next_url, anti, records = extract_all(content, extractor, rules)
            else:
                links, next_url, anti, records = [], None, False, []
            out = classify_fetch(
                known_page=known,
                anti_flag=anti,
                fail_count=fail_count,
                attempt=e.attempt,
                cfg=cfg,
            )
            res.fetch_log.append(
                {
                    "round": rnd,
                    "host": host,
                    "rank": rank,
                    "url": url,
                    "status": out.status,
                    "attempt": e.attempt,
                    "redirected": detect_302(url, redirect),
                    "repaired_url": repair_302(url, redirect),
                    "proxy_ip": pool[proxy_index(url, len(pool))] if pool else None,
                }
            )
            if out.status == ST_FETCHED:
                n_fetched += 1
                del pending[url]
                landing = landing_of.get(extractor, "no")
                res.story_results.append(
                    {
                        "round": rnd,
                        "url": url,
                        "task_url": e.task_url,
                        "extractor": extractor,
                        "landing": landing,
                        "records": records,
                    }
                )
                # frontier expansion: pipeline-landing out-links (K6/J2) +
                # paging chain (O3); candidate tie-break mirrors the engine's
                # min(struct(priority, page_idx, generation, task_url))
                if landing == "pipeline":
                    for href in links:
                        child = prepare_url(url, href)
                        if cfg.priority_mode == "indegree":
                            bases, meta = child_disc.get(child, (set(), None))
                            bases.add(url)
                            m = (e.generation, e.cookies)
                            child_disc[child] = (bases, m if meta is None else min(meta, m))
                        else:
                            cand = (child_priority(), 0, e.generation, child, e.cookies)
                            if child not in admitted or cand < admitted[child]:
                                admitted[child] = cand
                if next_url is not None and e.page_idx < cfg.page_down_count:
                    cand = (e.priority, e.page_idx + 1, e.generation, e.task_url, e.cookies)
                    if next_url not in admitted or cand < admitted[next_url]:
                        admitted[next_url] = cand
            elif out.retry:
                n_failed += 1
                e.attempt += 1
            else:
                n_dead += 1
                del pending[url]
                res.dead.append(
                    {"url": url, "reason": out.dead_reason, "generation": e.generation, "round": rnd}
                )
        # indegree mode: fold the round's child discoveries into the shared
        # candidate min (mirrors the engine's children-groupBy → union →
        # min(struct) dedup; next-page candidates already sit in `admitted`)
        for child, (bases, (gen, cookies)) in child_disc.items():
            cand = (child_priority_indegree(len(bases)), 0, gen, child, cookies)
            if child not in admitted or cand < admitted[child]:
                admitted[child] = cand
        n_admitted = 0
        for child in sorted(admitted):
            prio, pidx, gen, task_url, cookies = admitted[child]
            if admit(child, rnd + 1, prio, pidx, gen, task_url, cookies):
                n_admitted += 1
        res.lineage.append(
            {
                "round": rnd,
                "selected": len(batch),
                "fetched": n_fetched,
                "failed": n_failed,
                "dead": n_dead,
                "admitted": n_admitted,
                "frontier_after": len(pending),
            }
        )
        rnd += 1
    res.rounds = rnd
    return res
