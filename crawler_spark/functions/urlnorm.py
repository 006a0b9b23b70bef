"""URL algebra replicating the reference's exact quirks (SURVEY.md §2.7 F1-F5).

The reference manipulates URLs with ``java.net.URL`` plus hand-rolled string
splicing (reference: crawler-common/src/main/java/github/totyumengr/crawler/
Crawlers.java:271-352).  Byte-compatible behavior is required because fetch
ordering and URL-seen membership are checked invariants, so we replicate the
quirks instead of using ``urllib.parse.urljoin``:

* ``prepare_url`` (Crawlers.java:271-311) drops the ``:`` separator before an
  explicit port when rebuilding the base domain, and splices host-containing
  relative paths by substring index.
* ``append_params`` (Crawlers.java:335-352) emits ``?&k=v`` when the URL had
  no query, and a bare leading ``&`` when it did.
* ``parse_params`` (Crawlers.java:313-333) uses Java ``String.split`` which
  removes *trailing* empty fields, so ``a=`` parses to nothing.

Pure-Python scalars live here (shared with the reference simulator); the
Spark-facing vectorized wrappers are pandas UDFs over the same functions
(Arrow-batched — no per-row Python in the JVM loop, per BASELINE.json
input_hint).  Where a built-in exists (``parse_url``, ``str_to_map``) the
engine uses it and the pandas UDF is only the quirk-compatible fallback.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

__all__ = [
    "JavaUrl",
    "java_split",
    "java_url_parse",
    "prepare_url",
    "parse_params",
    "append_params",
    "detect_302",
    "repair_302",
    "url_to_filename",
    "url_host",
    "url_path",
    "pandas_prepare_url",
    "pandas_url_host",
    "pandas_url_to_filename",
    "prepare_url_udf",
    "url_host_udf",
    "url_to_filename_udf",
]

# Protocols with registered handlers in a stock JVM — anything else makes
# ``new URL(s)`` throw MalformedURLException (Crawlers.java catches + ignores).
_KNOWN_PROTOCOLS = frozenset({"http", "https", "ftp", "file", "mailto", "jar"})
_HIERARCHICAL = frozenset({"http", "https", "ftp", "file"})


class JavaUrl(NamedTuple):
    """Decomposition matching java.net.URL accessors for http-like URLs."""

    protocol: str
    host: str
    port: int  # -1 when absent, like URL.getPort()
    path: str  # "" when absent, like URL.getPath() (NextPageTest.java:27-31)
    query: Optional[str]  # None when absent (NextPageTest.java:32)


def java_split(s: str, sep: str) -> list[str]:
    """Java ``String.split(sep, 0)``: trailing empty strings removed."""
    parts = s.split(sep)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def java_url_parse(s: str) -> Optional[JavaUrl]:
    """``new URL(s)`` → parts, or None where Java throws MalformedURLException.

    Mirrors java.net.URL: a known protocol is required; authority ends at the
    first ``/``, ``?`` or ``#``; the query ends at ``#``; a non-numeric or
    empty explicit port is malformed.
    """
    if not isinstance(s, str):
        return None
    colon = s.find(":")
    if colon <= 0:
        return None
    protocol = s[:colon].lower()
    if protocol not in _KNOWN_PROTOCOLS:
        return None
    if not all(c.isalnum() or c in "+-." for c in s[:colon]):
        return None
    rest = s[colon + 1 :]
    if protocol not in _HIERARCHICAL:
        # mailto:, jar: — opaque; host/path/query not used by the reference.
        return JavaUrl(protocol, "", -1, "", None)
    if not rest.startswith("//"):
        # java.net.URL tolerates scheme:path for known protocols; the
        # reference only ever feeds http(s) URLs, treat as host-less.
        return JavaUrl(protocol, "", -1, rest.split("#", 1)[0], None)
    rest = rest[2:]
    # authority ends at first of / ? #
    end = len(rest)
    for ch in "/?#":
        i = rest.find(ch)
        if i != -1:
            end = min(end, i)
    authority = rest[:end]
    tail = rest[end:]
    # strip userinfo
    if "@" in authority:
        authority = authority.rsplit("@", 1)[1]
    host, port = authority, -1
    if ":" in authority and not authority.startswith("["):
        host, port_s = authority.rsplit(":", 1)
        if port_s == "":
            port = -1
        elif port_s.isdigit():
            port = int(port_s)
        else:
            return None  # malformed port
    frag = tail.find("#")
    if frag != -1:
        tail = tail[:frag]
    q = tail.find("?")
    if q != -1:
        path, query = tail[:q], tail[q + 1 :]
    else:
        path, query = tail, None
    return JavaUrl(protocol, host, port, path, query)


def prepare_url(full_path: str, part_path: str) -> str:
    """Resolve ``part_path`` against ``full_path`` with the reference's quirks.

    Replicates Crawlers.java:271-311 exactly, including:
    - malformed base → return part unchanged
    - already-absolute part → returned unchanged
    - ``//host/...`` protocol-relative repair (NextPageTest.java:75-83)
    - base rebuild ``proto://host`` + port *without* the ``:`` separator
    - host-substring splice when the part mentions the base host
    """
    base = java_url_parse(full_path)
    if base is None:
        return part_path
    if java_url_parse(part_path) is not None:
        return part_path
    if part_path.startswith("//"):
        return base.protocol + ":" + part_path
    domain = base.protocol + "://" + base.host + ("" if base.port < 0 else str(base.port))
    if base.host not in part_path:
        return domain + part_path
    idx = part_path.index(base.host)
    return domain + part_path[idx + len(base.host) :]


def parse_params(url: str) -> Dict[str, str]:
    """Query string → dict, replicating Crawlers.java:313-333.

    Java semantics: ``split("&")`` then ``split("=")`` keeping pairs with
    ≥2 fields only; trailing empty fields dropped (Java split), so ``a=``
    contributes nothing while ``=b`` maps ``"" → "b"``; later duplicate keys
    overwrite earlier ones (HashMap.put).
    """
    params: Dict[str, str] = {}
    u = java_url_parse(url)
    if u is None or u.query is None:
        return params
    for p in java_split(u.query, "&"):
        kv = java_split(p, "=")
        if len(kv) > 1:
            params[kv[0]] = kv[1]
    return params


def append_params(url: str, need_append: Dict[str, str]) -> str:
    """Append params, replicating Crawlers.java:335-352.

    Quirks preserved: when the URL has no query the result is
    ``url?&k=v`` (a ``?`` then an unconditional leading ``&``); when it has
    one, ``url&k=v`` is appended directly with no ``?`` check.
    """
    u = java_url_parse(url)
    if u is None:
        return url
    append = "" if u.query is not None else "?"
    for k, v in need_append.items():
        append += "&" + str(k) + "=" + str(v)
    return url + append


def url_host(url: str) -> Optional[str]:
    """URL.getHost() or None when malformed (politeness grouping key)."""
    u = java_url_parse(url)
    return u.host if u is not None else None


def url_path(url: str) -> Optional[str]:
    """URL.getPath() ("" when absent) or None when malformed."""
    u = java_url_parse(url)
    return u.path if u is not None else None


def detect_302(url: str, redirect_url: Optional[str]) -> bool:
    """P7 predicate (BackLogFetcher.java:164-174): a fetch is a 302 event iff
    request and real URL differ in host OR path; parse failures are ignored
    (the reference catches and logs)."""
    if not isinstance(redirect_url, str):
        return False
    o, r = java_url_parse(url), java_url_parse(redirect_url)
    if o is None or r is None:
        return False
    return o.host != r.host or o.path != r.path


def repair_302(url: str, redirect_url: Optional[str]) -> Optional[str]:
    """302 repair (BackLogFetcher.java:176-205): params present on the real
    URL but missing from the request URL are appended via append_params.

    The reference computes this (``needAppendParams``) but the resubmit
    branch is dead code — it never acts on it; we record the repaired URL in
    the fetch log without resubmitting, replicating observable behavior.
    Returns None when not a 302 or no params to append.
    """
    if not detect_302(url, redirect_url):
        return None
    ori = parse_params(url)
    extra = {k: v for k, v in parse_params(redirect_url).items() if k not in ori}
    return append_params(url, extra) if extra else None


def url_to_filename(url: str) -> Optional[str]:
    """Export filename mangling (FileTaskResultExporter.java:102-113).

    ``path`` with ``/`` stripped, ``-query`` appended when present, capped at
    80 chars.  The reference falls back to ``UUID.randomUUID()`` on malformed
    URLs — non-deterministic, so we return None and let the caller decide
    (the engine substitutes a content hash; documented deviation).
    """
    u = java_url_parse(url)
    if u is None:
        return None
    path = u.path.replace("/", "")
    query = u.query if u.query is not None else ""
    name = path + ("-" + query if query != "" else "")
    return name[:80] if len(name) > 80 else name


# ---------------------------------------------------------------------------
# Vectorized (Arrow-batched) wrappers.  These are the ONLY way the quirks
# above enter a Spark plan — pandas in, pandas out, no per-row Python rows.
# ---------------------------------------------------------------------------


def pandas_prepare_url(full: "pd.Series", part: "pd.Series") -> "pd.Series":  # noqa: F821
    import pandas as pd

    return pd.Series(
        [
            prepare_url(f, p) if isinstance(p, str) and isinstance(f, str) else None
            for f, p in zip(full, part)
        ],
        dtype="object",
    )


def pandas_url_host(urls: "pd.Series") -> "pd.Series":  # noqa: F821
    import pandas as pd

    return pd.Series([url_host(u) if isinstance(u, str) else None for u in urls], dtype="object")


def pandas_url_to_filename(urls: "pd.Series") -> "pd.Series":  # noqa: F821
    import pandas as pd

    return pd.Series(
        [url_to_filename(u) if isinstance(u, str) else None for u in urls], dtype="object"
    )


def prepare_url_udf():
    """pandas_udf resolving link columns: prepare_url(base_url, href)."""
    from pyspark.sql.functions import pandas_udf

    def _f(full, part):
        return pandas_prepare_url(full, part)

    return pandas_udf(_f, "string")


def url_host_udf():
    from pyspark.sql.functions import pandas_udf

    def _f(urls):
        return pandas_url_host(urls)

    return pandas_udf(_f, "string")


def url_to_filename_udf():
    from pyspark.sql.functions import pandas_udf

    def _f(urls):
        return pandas_url_to_filename(urls)

    return pandas_udf(_f, "string")


# NOTE: detect_302/repair_302 enter Spark plans through the fused
# fetch-parse UDF (functions/extract.fetch_parse_udf) — one Python hop per
# round, no standalone wrapper.
