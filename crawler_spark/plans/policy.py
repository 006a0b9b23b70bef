"""Deterministic crawl policy shared by the engine and the golden simulator.

The reference's observable semantics (SURVEY.md §3.2) are FIFO fetch order
(reference TaskWorker.java:160 enqueue / BackLogFetcher.java:107 dequeue),
retry caps (fetch 20, reference BackLogFetcher.java:268-276; anti 6,
TaskWorker.java:248-258; recycle-bin 5, SavePointPlanner.java:117), a paging
bound (TaskWorker.java:92-104) and a global 1 req/s politeness delay
(BackLogFetcher.java:45).  We re-express the infinite poll loops as
deterministic batch ROUNDS; within a round each host gets
``floor(round_seconds / crawl_delay)`` fetches, ordered by a total
per-host ordering key.  Both the Spark engine (plans/engine.py) and the
pure-Python simulator (simulator.py) derive their behavior from THIS module,
so the golden comparison pins one shared policy rather than two parallel
implementations of it.

Ordering key (total order per host): ``(wave, priority, url)``

* ``wave``      — round the URL was admitted to the frontier (seeds: 0).
  FIFO analog: earlier-discovered fetches first.
* ``priority``  — seeds carry their seed index (story_seq * step + arg_idx,
  reference SavePointPlanner.java:53-85 slicing); discovered out-links carry
  ``PRIORITY_CHILD`` (they rank after any seed of the same wave); next-page
  fetches inherit the parent's priority (the reference follows a page chain
  inside one task, TaskWorker.java:92-104 — within the round model the chain
  keeps its task's rank).
* ``url``       — final lexicographic tie-break (ASCII fixtures ⇒ identical
  ordering in Python and the JVM).

Documented deviations from the reference (SURVEY.md §7 hard parts):
* unseeded ``Collections.shuffle`` of args (StoryWorker.java:237) is disabled
  — exact-match mode keeps seed order.
* a retried URL keeps its original ordering key and becomes eligible again
  next round (the reference re-offers to the queue tail; a round model has
  no "tail").
"""

from __future__ import annotations

from dataclasses import dataclass, field

PRIORITY_CHILD = 1 << 40  # discovered links rank after all seeds in a wave

# OPIC-lite in-degree prioritization (priority_mode="indegree"): a child's
# priority is PRIORITY_CHILD minus its capped per-round in-degree, so heavily
# linked-to pages fetch earlier WITHIN the child band.  The cap keeps every
# child priority >= PRIORITY_CHILD - (1<<20) >> any seed priority, preserving
# the seeds-before-children invariant the reference ordering relies on.
INDEGREE_PRIORITY_CAP = 1 << 20

# TTL recrawl (freshness refresh — the reference re-crawls by re-running
# plans on a quartz schedule, Crawlers.java planner cron; our deterministic
# round-based analog): refreshed members rank after ALL new work, seeds and
# children alike, so recrawl never starves discovery.
PRIORITY_RECRAWL = 1 << 41

# Retry / loop caps, straight from the reference configs (BASELINE.md)
MAX_FETCH_RETRIES = 20  # backlog.repush.maxcount
MAX_ANTI_RETRIES = 6  # worker.runner.anti.retry
MAX_BIN_GENERATIONS = 5  # planner.recyclebin.maxtry
PAGE_DOWN_COUNT = 3  # paging bound (Task.pageDownCount analog)
SEEDS_PER_STORY = 200  # planner.step

# Fetch statuses (reference Crawlers.java:225-227 status enum analog)
ST_FETCHED = "FETCHED"
ST_FAILED = "FAILED"  # transient fetch error → repush
ST_ANTI = "ANTIED"
ST_NO_CONTENT = "NO_CONTENT"  # sentinel, reference BackLogFetcher.java:152

DEFAULT_CRAWL_DELAY_S = 1.0  # reference @Crawler(delay=1), BackLogFetcher.java:45


@dataclass(frozen=True)
class CrawlConfig:
    """Knobs shared by engine + simulator; defaults mirror the reference."""

    round_seconds: float = 8.0  # wall-clock a round models
    max_burst_per_host: int = 64  # budget cap when crawl_delay == 0
    max_rounds: int = 64
    page_down_count: int = PAGE_DOWN_COUNT
    max_fetch_retries: int = MAX_FETCH_RETRIES
    max_anti_retries: int = MAX_ANTI_RETRIES
    salt_buckets: int = 8  # phase-1 salted ranking fan-out (skew axis B)
    # T2 await-timeout analog (reference worker.wait.timeout=300 s,
    # TaskWorker.java:200-205): an ELIGIBLE task passed over by the
    # politeness budget for this many consecutive rounds dies TIMEOUTED into
    # the recycle bin (late-data policy).  None disables the deadline.
    max_wait_rounds: int | None = None
    # "fifo" = reference-parity child ordering (all children share
    # PRIORITY_CHILD; per-host order is admission wave then URL).
    # "indegree" = OPIC-lite frontier prioritization: children discovered by
    # more distinct pages in the round fetch earlier within the child band
    # (priority = PRIORITY_CHILD - min(indegree, INDEGREE_PRIORITY_CAP)).
    # Recycle-bin re-drives keep PRIORITY_CHILD in both modes.
    priority_mode: str = "fifo"
    # TTL recrawl, 0 = off (reference parity: plans re-run on a cron
    # schedule; here a member whose last admission round is >= this many
    # rounds old is resubmitted at PRIORITY_RECRAWL and its url_seen round
    # re-stamped).  Sweeps ride the engine's url_seen compaction rounds so
    # the re-stamp is a snapshot rewrite, never an append-history conflict.
    recrawl_ttl_rounds: int = 0

    def __post_init__(self):
        if self.priority_mode not in ("fifo", "indegree"):
            raise ValueError(f"unknown priority_mode: {self.priority_mode!r}")
        if self.recrawl_ttl_rounds < 0:
            raise ValueError("recrawl_ttl_rounds must be >= 0")

    def host_budget(self, crawl_delay_s: float) -> int:
        """Fetches allowed for one host in one round (politeness, T4)."""
        if crawl_delay_s is None:
            crawl_delay_s = DEFAULT_CRAWL_DELAY_S
        if crawl_delay_s <= 0:
            return self.max_burst_per_host
        return max(1, min(self.max_burst_per_host, int(self.round_seconds / crawl_delay_s)))


def seed_priority(seed_idx: int) -> int:
    """Seed ordering: story slicing then arg index (both = seed index order)."""
    return seed_idx


def child_priority() -> int:
    return PRIORITY_CHILD


def child_priority_indegree(indegree: int) -> int:
    """OPIC-lite child priority (priority_mode="indegree"): shared scalar so
    the engine's Column expression and the simulator move together."""
    return PRIORITY_CHILD - min(indegree, INDEGREE_PRIORITY_CAP)


def order_key(wave: int, priority: int, url: str) -> tuple:
    """Canonical per-host selection order (O1): FIFO by admission wave, then
    priority, then URL as the deterministic tiebreak.  The politeness
    window's ORDER BY (operators/politeness.py) and the golden simulator
    both derive from this single definition."""
    return (wave, priority, url)


def proxy_index(url: str, n: int) -> int:
    """J6 deterministic proxy pick: index into the sorted pool.

    The reference draws ``RandomUtils.nextInt(poolsize)`` per fetch
    (BackLogFetcher.java:292-318); exact-match mode replaces the draw with a
    url-keyed md5 hash (documented deviation, SURVEY §2.3 J6) so the engine,
    the golden simulator, and any SQL twin pick the SAME pool member.  15 hex
    chars = 60 bits, inside int64 for the Spark mirror
    (``pmod(conv(substring(md5(url),1,15),16,10), n)``)."""
    import hashlib

    return int(hashlib.md5(url.encode()).hexdigest()[:15], 16) % n


def is_disallowed(path: str, disallow_prefixes: list[str]) -> bool:
    """robots.txt Disallow check (north_rule addition; no reference analog)."""
    if not disallow_prefixes:
        return False
    return any(path.startswith(p) for p in disallow_prefixes)


@dataclass
class FetchOutcome:
    """Result classification for one fetched URL — one rule, two callers."""

    status: str
    retry: bool = False
    dead_reason: str | None = None


def classify_fetch(
    known_page: bool,
    anti_flag: bool,
    fail_count: int,
    attempt: int,
    cfg: CrawlConfig,
) -> FetchOutcome:
    """Classify a fetch attempt. ``attempt`` is 0-based (prior tries).

    - unknown URL → NO_CONTENT (non-text sentinel path, P5/P6): give up, no retry
    - transient failure while ``attempt < fail_count`` → FAILED; repush until
      the fetch-retry cap (reference BackLogFetcher.java:262-280)
    - anti-crawl page → ANTIED; retried up to the anti cap
      (reference TaskWorker.java:248-258)
    - otherwise FETCHED
    """
    if not known_page:
        return FetchOutcome(ST_NO_CONTENT, retry=False, dead_reason="no_content")
    if attempt < fail_count:
        if attempt + 1 >= cfg.max_fetch_retries:
            return FetchOutcome(ST_FAILED, retry=False, dead_reason="fetch_retries_exhausted")
        return FetchOutcome(ST_FAILED, retry=True)
    if anti_flag:
        if attempt + 1 >= cfg.max_anti_retries:
            return FetchOutcome(ST_ANTI, retry=False, dead_reason="anti_retries_exhausted")
        return FetchOutcome(ST_ANTI, retry=True)
    return FetchOutcome(ST_FETCHED)
