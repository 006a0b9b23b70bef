"""Deterministic synthetic fixtures (FIXTURES.md §1-4): image+caption table,
link graph ("the web") served as real HTML, extraction rules, seed list,
robots rules.

Everything is a pure function of (n_pages, n_hosts, seed) using numpy PCG64 —
no external data, no network (sandbox rule).  Written as parquet via pyarrow
so both Spark (engine) and plain Python (simulator) read the same bytes.

Pages carry HTML ``content`` — out-links, the paging bar, captions, and
anti-crawl markers all live INSIDE the markup and are recovered by the
extraction stage (functions.extract, P1/P2), exactly as the reference parses
fetched bodies (round 1 pre-extracted them in the generator, assuming the
extractor family away).  A ``rules`` table holds the per-extractor selector
config + landing (the reference's per-story rule maps, J1).

The graph is engineered to exercise every reference code path:
* Zipf(1.3) host assignment → hot-host skew (salting axis B)
* out-links in two href forms (absolute / protocol-relative) → prepare_url
  quirks on the hot path (reference Crawlers.java:271-311)
* deterministic duplicate link targets → URL-seen dedup (U2)
* ``?page=N`` chains of length 3 → paging bound (O3,
  reference TaskWorker.java:92-104)
* anti pages (empty extraction + marker) → anti-crawl retry loop (P3/T8)
* ``fail_count`` rows → transient-failure repush (J4,
  reference BackLogFetcher.java:262-280)
* ``/private`` links + per-host disallow prefixes → robots filtering
  (north_rule addition)
* ``content``-extractor pages (landing=file) → structdata without frontier
  feedback; ``paging`` pages (landing=pipeline) drive expansion (K6)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawler_spark.functions.imaging import LOSSY_FMTS, decode_image, encode_image, phash64

_ADJ = ["quick", "lazy", "bright", "dark", "tiny", "huge", "odd"]
_NOUN = ["fox", "dog", "sun", "moon", "tree", "rock", "bird", "fish", "cat", "ant", "bee"]
_COLOR = ["red", "blue", "green", "white", "black"]
_FMTS = ["png", "ppm", "bmp"]
_W = [16, 32, 64]
_H = [16, 24, 48]

LINK_MULT = 2654435761  # Knuth multiplicative constant (FIXTURES.md §2)

ANTI_MARKER = "Robot check: access denied"

# Extractor registry config (functions.extract dispatch; the reference's
# per-story rule maps, TaskWorker.java:142-150 write / RawDataExtractor read).
# landing picks the exporter (TaskWorker.java:222-226); only `pipeline`
# results feed the frontier (PipelineResultExporter.java:29-59).
def _content_rule(name: str, landing: str) -> dict:
    return {
        "extractor": name,
        "list_sel": None,
        "field_sels": None,
        "content_sels": ["div.caption"],
        "next_sel": None,
        "anti_marker": "Robot check",
        "landing": landing,
    }


DEFAULT_RULES = [
    {
        "extractor": "paging",
        "list_sel": "ul.links li a",
        "field_sels": ["self@href", "self:text"],
        "content_sels": None,
        "next_sel": "div.pager a",
        "anti_marker": "Robot check",
        "landing": "pipeline",
    },
    # content tasks cycle through the file-sink landings (K1-K5 coverage;
    # the reference picks the exporter bean by Task.landing,
    # TaskWorker.java:222-226)
    _content_rule("content", "file"),
    _content_rule("content_pure", "puretextfile"),
    _content_rule("content_html", "html"),
    _content_rule("content_jss", "jssfile"),
    _content_rule("content_blank", "no"),
    # emulator search flow (S4): rendered by the scripted browser
    # (functions/emulator.py), extracted like a paging task
    {
        "extractor": "search",
        "list_sel": "ul.links li a",
        "field_sels": ["self@href", "self:text"],
        "content_sels": None,
        "next_sel": "div.pager a",
        "anti_marker": "Robot check",
        "landing": "pipeline",
    },
    # second emulator script family (infinite-scroll feed): same rule shape,
    # its own renderer in the script registry (functions/emulator
    # .EMULATOR_SCRIPTS) — proves the Task.emulator map dispatch generalizes
    {
        "extractor": "feed",
        "list_sel": "ul.links li a",
        "field_sels": ["self@href", "self:text"],
        "content_sels": None,
        "next_sel": "div.pager a",
        "anti_marker": "Robot check",
        "landing": "pipeline",
    },
]

# The e2e cycle uses the four file-sink variants.  With m = i // max_links,
# eligible pages have m % 5 != 0 AND (empirically, under the 49i+j mod N link
# map) the crawl never reaches m ≡ 0 (mod 4) — so neither m%5 nor m%4 covers
# every variant.  (m % 7) % 4 does: the golden fixture reaches all four
# landings.  The blank landing (K5) is registry-complete, pinned by unit tests.
_CONTENT_EXTRACTORS = ["content", "content_pure", "content_html", "content_jss"]


def caption_of(i: int) -> str:
    return f"caption {i}: {_ADJ[i % 7]} {_NOUN[i % 11]} on {_COLOR[i % 5]}"


def page_html(
    i: int,
    extractor: str,
    links: list[str],
    next_url: str | None,
    anti: bool,
    image_id: str,
    cookie_marker: bool = False,
) -> str:
    """Deterministic page markup; everything extraction recovers lives here.

    ``cookie_marker`` appends a ``{{cookie:sid}}`` echo marker to the caption
    div: the synthetic server renders the fetching task's ``sid`` cookie into
    the body (functions.extract.render_cookie_markers), so cookie-carrying
    tasks observably extract different structdata than cookie-less ones —
    the testable analog of the reference's per-task request cookies."""
    if anti:
        return (
            "<html><body><div class=\"denial\">" + ANTI_MARKER + "</div></body></html>"
        )
    caption = caption_of(i) + (" [sid={{cookie:sid}}]" if cookie_marker else "")
    parts = [
        f"<html><head><title>p{i}</title></head><body>",
        f'<div class="caption">{caption}</div>',
        f'<img src="/img/{image_id}.png"/>',
    ]
    if extractor == "paging":
        parts.append('<ul class="links">')
        for j, href in enumerate(links):
            parts.append(f'<li><a href="{href}">out {j}</a></li>')
        parts.append("</ul>")
        if next_url:
            parts.append(f'<div class="pager"><a rel="next" href="{next_url}">next</a></div>')
    parts.append("</body></html>")
    return "".join(parts)


def host_of(z: int) -> str:
    return f"h{z}.example.com"


def page_url(i: int, host_z: np.ndarray) -> str:
    return f"http://{host_of(int(host_z[i]))}/p/{i}"


def zipf_hosts(n_pages: int, n_hosts: int, seed: int) -> np.ndarray:
    """Host index per page, Zipf(a=1.3) over n_hosts — deterministic."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    p = ranks**-1.3
    p /= p.sum()
    return rng.choice(n_hosts, size=n_pages, p=p)


def make_image(
    i: int, px: list[int] | None = None, fmts: list[str] | None = None
) -> tuple[bytes, int, int, str, str, int]:
    """Deterministic image row for page i; ``px``/``fmts`` override the edge
    sizes (square images) and codec mix for bench fixtures — captions stay
    the same function of i either way."""
    if px is None:
        w, h = _W[i % 3], _H[i % 3]
    else:
        w = h = px[i % len(px)]
    fmt = (fmts or _FMTS)[i % len(fmts or _FMTS)]
    rng = np.random.default_rng(i)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = encode_image(arr, fmt)
    if fmt in LOSSY_FMTS:
        # lossy codec: the table's phash is of the DECODED pixels (what an
        # ingest pipeline actually hashes), so the exact phash invariant
        # holds; the PSNR>=40dB gate covers pixel fidelity separately
        arr = decode_image(data, fmt)
    return data, w, h, fmt, caption_of(i), phash64(arr)


def _image_table(lo: int, hi: int, px: list[int] | None, fmts: list[str] | None = None) -> pa.Table:
    cols = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    for i in range(lo, hi):
        b, w, h, fmt, caption, ph = make_image(i, px, fmts)
        cols["image_id"].append(f"img{i:010d}")
        cols["bytes"].append(b)
        cols["w"].append(w)
        cols["h"].append(h)
        cols["fmt"].append(fmt)
        cols["caption"].append(caption)
        cols["phash"].append(ph)
    return pa.table(
        {
            "image_id": pa.array(cols["image_id"], pa.string()),
            "bytes": pa.array(cols["bytes"], pa.binary()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "fmt": pa.array(cols["fmt"], pa.string()),
            "caption": pa.array(cols["caption"], pa.string()),
            "phash": pa.array(cols["phash"], pa.int64()),
        }
    )


def _write_image_shard(job: tuple[str, int, int, list[int] | None, list[str] | None]) -> str:
    path, lo, hi, px, fmts = job
    pq.write_table(_image_table(lo, hi, px, fmts), path, row_group_size=2048)
    return path


def out_links_of(i: int, n_pages: int, host_z: np.ndarray, max_links: int = 4) -> list[str]:
    """Deterministic hrefs; j alternates absolute / protocol-relative forms."""
    links = []
    for j in range(i % max_links):
        t = (i * LINK_MULT + j) % n_pages
        tz = int(host_z[t])
        if j % 2 == 0:
            links.append(f"http://{host_of(tz)}/p/{t}")
        else:
            links.append(f"//{host_of(tz)}/p/{t}")
    if i % 7 == 0:
        links.append(f"http://{host_of(int(host_z[i]))}/private/{i}")
    return links


def generate(
    out_dir: str,
    n_pages: int = 512,
    n_hosts: int = 16,
    seed: int = 42,
    n_seeds: int | None = None,
    img_px: list[int] | None = None,
    image_shards: int = 1,
    max_links: int = 4,
    fmts: list[str] | None = None,
    n_search_seeds: int = 2,
    n_feed_seeds: int = 2,
    n_cookie_pages: int = 0,
) -> dict:
    """Write images/pages/seeds/robots parquet under out_dir; return paths.

    ``image_shards > 1`` writes the payload table as a directory of part
    files (generated in parallel) — the realistic many-files layout that
    also gives Spark scan splits ≥ shards.  ``img_px``/``n_seeds`` scale the
    payload weight and the wave-0 frontier for bench fixtures."""
    os.makedirs(out_dir, exist_ok=True)
    host_z = zipf_hosts(n_pages, n_hosts, seed)

    # --- images ------------------------------------------------------------
    img_path = os.path.join(out_dir, "images.parquet")
    if image_shards <= 1:
        pq.write_table(_image_table(0, n_pages, img_px, fmts), img_path)
    else:
        from concurrent.futures import ProcessPoolExecutor

        if os.path.exists(img_path) and not os.path.isdir(img_path):
            os.remove(img_path)
        os.makedirs(img_path, exist_ok=True)
        step = (n_pages + image_shards - 1) // image_shards
        jobs = [
            (os.path.join(img_path, f"part-{s:05d}.parquet"), s * step, min(n_pages, (s + 1) * step), img_px, fmts)
            for s in range(image_shards)
            if s * step < n_pages
        ]
        with ProcessPoolExecutor(max_workers=min(16, len(jobs))) as ex:
            list(ex.map(_write_image_shard, jobs))

    # --- pages (base + ?page= chain rows), HTML content + extractor ---------
    # two passes: page parameters first, so a 302 page can serve its
    # redirect TARGET's markup (the fetcher follows the redirect and hands
    # the real URL's content to extraction under the ORIGINAL url,
    # BackLogFetcher.java:158-219)
    def params_of(i: int) -> dict:
        anti = i % 97 == 0
        has_chain = i % 5 == 0
        if i % max_links == 0 and not has_chain and not anti:
            extractor = _CONTENT_EXTRACTORS[(i // max_links) % 7 % len(_CONTENT_EXTRACTORS)]
        else:
            extractor = "paging"
        links = out_links_of(i, n_pages, host_z, max_links) if extractor == "paging" else []
        nxt = f"{page_url(i, host_z)}?page=1" if has_chain else None
        # sparse 302 pages (P7): redirect to another page plus a session param
        # the request URL lacks → host/path mismatch + a repairable query
        # delta (i % 17 == 4 lands on pages the golden crawl actually reaches)
        redirect = None
        if i % 17 == 4 and not anti and not has_chain and extractor == "paging":
            t = (i + 3) % n_pages
            redirect = f"{page_url(t, host_z)}?sid={i % 13}"
        return {
            "anti": anti, "has_chain": has_chain, "extractor": extractor,
            "links": links, "next": nxt, "redirect": redirect,
        }

    page_params = [params_of(i) for i in range(n_pages)]
    urls, image_ids, contents, extractors, fails, redirects = [], [], [], [], [], []

    def add(u, img, content, extractor, fail, redirect=None):
        urls.append(u)
        image_ids.append(img)
        contents.append(content)
        extractors.append(extractor)
        fails.append(fail)
        redirects.append(redirect)

    def html_of(i: int) -> str:
        p = page_params[i]
        return page_html(
            i, p["extractor"], p["links"], p["next"], p["anti"], f"img{i:010d}",
            cookie_marker=i < n_cookie_pages,
        )

    for i in range(n_pages):
        base = page_url(i, host_z)
        img = f"img{i:010d}"
        p = page_params[i]
        if p["redirect"] is not None:
            t = (i + 3) % n_pages
            content = html_of(t)  # the fetch lands on the target's markup
        else:
            content = html_of(i)
        add(base, img, content, p["extractor"], 2 if i % 101 == 0 else 0, p["redirect"])
        if p["has_chain"]:
            for pg in (1, 2, 3):
                pnxt = f"{base}?page={pg + 1}" if pg < 3 else None
                add(f"{base}?page={pg}", img, page_html(i, "paging", [], pnxt, False, img),
                    "paging", 0)
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "image_id": pa.array(image_ids, pa.string()),
            "content": pa.array(contents, pa.string()),
            "extractor": pa.array(extractors, pa.string()),
            "fail_count": pa.array(fails, pa.int32()),
            "redirect_url": pa.array(redirects, pa.string()),
        }
    )
    pq.write_table(pages, os.path.join(out_dir, "pages.parquet"))

    # --- extraction rules (per-extractor selector config + landing) ----------
    rules = pa.table(
        {
            "extractor": pa.array([r["extractor"] for r in DEFAULT_RULES], pa.string()),
            "list_sel": pa.array([r["list_sel"] for r in DEFAULT_RULES], pa.string()),
            "field_sels": pa.array(
                [r["field_sels"] for r in DEFAULT_RULES], pa.list_(pa.string())
            ),
            "content_sels": pa.array(
                [r["content_sels"] for r in DEFAULT_RULES], pa.list_(pa.string())
            ),
            "next_sel": pa.array([r["next_sel"] for r in DEFAULT_RULES], pa.string()),
            "anti_marker": pa.array([r["anti_marker"] for r in DEFAULT_RULES], pa.string()),
            "landing": pa.array([r["landing"] for r in DEFAULT_RULES], pa.string()),
        }
    )
    pq.write_table(rules, os.path.join(out_dir, "rules.parquet"))

    # --- seeds (page seeds + emulator search seeds, S4/F9) -------------------
    if n_seeds is None:
        n_seeds = max(8, n_pages // 16)
    seed_urls = [page_url(i, host_z) for i in range(n_seeds)]
    for k, word in enumerate(("fox", "moon")[: max(0, n_search_seeds)]):
        seed_urls.append(f"http://{host_of(k % n_hosts)}/search?_kw_={word}&page=0")
    if n_search_seeds > 0:
        # tools sub-step seed (SeleniumFetcher.java:193-212): same keyword,
        # time-range filter clicked — narrows results, rides the pagination
        seed_urls.append(f"http://{host_of(2 % n_hosts)}/search?_kw_=fox&page=0&_tools_=1m")
    # second emulator script family: infinite-scroll feed seeds (registry
    # dispatch + cursor-chained continuation through the same frontier)
    for k, word in enumerate(("tree", "rock")[: max(0, n_feed_seeds)]):
        seed_urls.append(f"http://{host_of((3 + k) % n_hosts)}/feed?_kw_={word}&cursor=0")
    # per-task cookies (Task.cookies analog): seeds of cookie-marked pages
    # carry the sid cookie their pages echo; everyone else crawls cookie-less
    seed_cookies = [
        f"sid=s{i}" if i < min(n_cookie_pages, n_seeds) else ""
        for i in range(len(seed_urls))
    ]
    seeds = pa.table(
        {
            "seed_id": pa.array([str(i) for i in range(len(seed_urls))], pa.string()),
            "url": pa.array(seed_urls, pa.string()),
            "story_seq": pa.array([i // 200 for i in range(len(seed_urls))], pa.int64()),
            "cookies": pa.array(seed_cookies, pa.string()),
        }
    )
    pq.write_table(seeds, os.path.join(out_dir, "seeds.parquet"))

    # --- sitemaps (web-native discovery twin of seeds.parquet) -------------
    # Per-host <urlset> documents (chunked at the spec's 50k cap) under one
    # root <sitemapindex>; global seed order rides <lastmod> (base − seed_id
    # seconds, so lastmod DESC == seed order) — sources.sitemaps resolves
    # these back to EXACTLY the seeds table (pinned in tests), making the
    # sitemap path a drop-in engine seed source.  Every third host's doc is
    # gzip-compressed (the spec allows .xml.gz).
    import datetime as _dt
    import gzip as _gzip
    from xml.sax.saxutils import escape as _xesc

    _SMNS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    base_epoch = 1577836800  # 2020-01-01T00:00:00Z

    def _w3c(e: int) -> str:
        return _dt.datetime.fromtimestamp(
            e, tz=_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")

    by_host: dict[str, list[tuple[int, str]]] = {}
    for i, u in enumerate(seed_urls):
        by_host.setdefault(u.split("/")[2], []).append((i, u))
    sm_urls, sm_bodies, child_locs = [], [], []
    for hz, h in enumerate(sorted(by_host)):
        rows = by_host[h]
        for k in range(0, len(rows), 50_000):
            loc = f"http://{h}/sitemap-{k // 50_000}.xml"
            entries = "".join(
                f"<url><loc>{_xesc(u)}</loc>"
                f"<lastmod>{_w3c(base_epoch - i)}</lastmod></url>"
                for i, u in rows[k:k + 50_000])
            body = f"<urlset {_SMNS}>{entries}</urlset>".encode()
            sm_urls.append(loc)
            sm_bodies.append(_gzip.compress(body, 6) if hz % 3 == 2 else body)
            child_locs.append(loc)
    index_body = ("<sitemapindex " + _SMNS + ">" + "".join(
        f"<sitemap><loc>{_xesc(l)}</loc></sitemap>" for l in child_locs
    ) + "</sitemapindex>").encode()
    root_loc = f"http://{host_of(0)}/sitemap-index.xml"
    pq.write_table(
        pa.table({"url": pa.array([root_loc] + sm_urls, pa.string()),
                  "body": pa.array([index_body] + sm_bodies, pa.binary())}),
        os.path.join(out_dir, "sitemaps.parquet"))

    # --- robots ---------------------------------------------------------------
    delays = [0.0, 0.5, 1.0, 2.0]
    robots = pa.table(
        {
            "host": pa.array([host_of(z) for z in range(n_hosts)], pa.string()),
            "crawl_delay_s": pa.array([delays[z % 4] for z in range(n_hosts)], pa.float64()),
            "disallow_prefixes": pa.array(
                [["/private"] if z % 13 == 0 else [] for z in range(n_hosts)],
                pa.list_(pa.string()),
            ),
        }
    )
    pq.write_table(robots, os.path.join(out_dir, "robots.parquet"))

    return {
        "images": os.path.join(out_dir, "images.parquet"),
        "pages": os.path.join(out_dir, "pages.parquet"),
        "rules": os.path.join(out_dir, "rules.parquet"),
        "seeds": os.path.join(out_dir, "seeds.parquet"),
        "sitemaps": os.path.join(out_dir, "sitemaps.parquet"),
        "robots": os.path.join(out_dir, "robots.parquet"),
        "n_pages": n_pages,
        "n_hosts": n_hosts,
    }


def ensure_cached(
    root: str,
    n_pages: int,
    n_hosts: int,
    seed: int = 42,
    n_seeds: int | None = None,
    img_px: list[int] | None = None,
    image_shards: int = 1,
    max_links: int = 4,
    fmts: list[str] | None = None,
) -> str:
    """Generate-once fixture cache keyed by parameters (bench reuse).

    A ``_DONE`` marker written last makes partial generations self-healing.
    """
    # v3: HTML content + extractor + redirects + emulator seeds (cache key
    # invalidates older layouts)
    tag = f"fix3_p{n_pages}_h{n_hosts}_s{seed}"
    if n_seeds is not None:
        tag += f"_sd{n_seeds}"
    if img_px is not None:
        tag += "_px" + "-".join(str(p) for p in img_px)
    if image_shards > 1:
        tag += f"_sh{image_shards}"
    if max_links != 4:
        tag += f"_ml{max_links}"
    if fmts is not None:
        tag += "_f" + "-".join(fmts)
    d = os.path.join(root, tag)
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        generate(
            d,
            n_pages=n_pages,
            n_hosts=n_hosts,
            seed=seed,
            n_seeds=n_seeds,
            img_px=img_px,
            image_shards=image_shards,
            max_links=max_links,
            fmts=fmts,
        )
        with open(marker, "w") as f:
            f.write("ok\n")
    return d


def load_tables(fix_dir: str) -> dict:
    """Load fixtures into plain-Python structures for the simulator."""
    pages_t = pq.read_table(os.path.join(fix_dir, "pages.parquet")).to_pylist()
    robots_t = pq.read_table(os.path.join(fix_dir, "robots.parquet")).to_pylist()
    seeds_t = pq.read_table(os.path.join(fix_dir, "seeds.parquet")).to_pylist()
    rules_t = pq.read_table(os.path.join(fix_dir, "rules.parquet")).to_pylist()
    return {
        "pages": {r["url"]: r for r in pages_t},
        "robots": {r["host"]: r for r in robots_t},
        "seeds": sorted(seeds_t, key=lambda r: int(r["seed_id"])),
        "rules": {r["extractor"]: r for r in rules_t},
    }
