"""Unit tests for the corpus-curation operators (SURVEY.md §2.10): n-gram
decontamination and the deterministic hash-routed source mixing — each
cross-checked against an independent brute-force Python computation (the SQL
twins are checked separately in test_oracle_equivalence)."""

import hashlib

from pyspark.sql import functions as F

from crawler_spark.operators.curation import decontaminate_stats, ngram_hash_table


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def _grams(text, n):
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()


def test_ngram_hash_table_matches_brute_force(spark):
    rows = [
        (0, "a b c d e f g", "s0"),
        (1, "a b c", "s0"),  # shorter than n=5 -> zero grams
        (2, "x x x x x x", "s1"),  # repeated gram collapses to one distinct
        (3, "a b c d e a b c d e", "s1"),  # overlapping repeat
    ]
    got = {
        (r.doc_id, r.h)
        for r in ngram_hash_table(_docs_df(spark, rows), n=5).collect()
    }
    want = {
        (doc_id, hashlib.md5(g.encode()).hexdigest())
        for doc_id, text, _src in rows
        for g in _grams(text, 5)
    }
    assert got == want


def test_decontaminate_flags_verbatim_overlap(spark):
    # doc 0 is the eval doc (0 % 97 == 0); doc 1 shares a verbatim 5-gram
    # with it, doc 2 shares only a 4-gram (must stay clean), doc 3 disjoint
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "eval"),
        (1, "prefix words the quick brown fox jumps suffix", "sA"),
        (2, "the quick brown fox sleeps all day long here", "sA"),
        (3, "completely different text with no shared grams at all", "sB"),
    ]
    out = {
        r.source: (r.n_train, r.n_contaminated)
        for r in decontaminate_stats(_docs_df(spark, rows), n=5, eval_mod=97).collect()
    }
    assert out == {"sA": (2, 1), "sB": (1, 0)}


def test_source_mixing_is_reproducible_and_hash_routed(spark, tmpdir_path):
    """q38's keep decision must be a pure function of (doc_id, source):
    replicate it in Python and require exact agreement, then require the
    aggregate to be identical across two independent runs."""
    from crawler_spark.queries import q38_source_mixing

    docs = spark.createDataFrame(
        [(i, f"tok{i}", "xx", f"src{i % 20}", 10 + i) for i in range(400)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.mode("overwrite").parquet(f"{tmpdir_path}/documents.parquet")

    def keep(doc_id, source):
        h = int(hashlib.md5(f"{doc_id}:{source}".encode()).hexdigest()[:4], 16)
        rate_num = int(source[3:]) % 4 + 1
        return h * 4 < rate_num * 65536

    want = {}
    for i in range(400):
        src = f"src{i % 20}"
        n_docs, n_kept, kept_chars = want.get(src, (0, 0, 0))
        k = keep(i, src)
        want[src] = (n_docs + 1, n_kept + int(k), kept_chars + (10 + i) * int(k))

    r1 = q38_source_mixing(spark, tmpdir_path).collect()
    r2 = q38_source_mixing(spark, tmpdir_path).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    got = {r.source: (r.n_docs, r.n_kept, r.kept_chars) for r in r1}
    assert got == want
    # rates genuinely differ across sources: 25/50/75/100 pct all present
    assert {r.rate_pct for r in r1} == {25, 50, 75, 100}


# ---------------------------------------------------------------------------
# DSIR importance resampling (operators/curation.py)
# ---------------------------------------------------------------------------


def _brute_dsir(rows, target_ids, m):
    """Independent Python replica of hashed counts + smoothed log-ratios +
    integer dot-product scores (DSIR §3 with the repo's scaled-int exactness
    discipline)."""
    import math
    from collections import Counter

    def grams(text):
        w = (text or "").split(" ")
        return w + [f"{a} {b}" for a, b in zip(w, w[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % m

    per_doc = {
        i: Counter(bucket(g) for g in grams(t)) for i, t, _s in rows
    }
    tgt, raw = Counter(), Counter()
    for i, _t, _s in rows:
        (tgt if i in target_ids else raw).update(per_doc[i])
    t_tot, r_tot = sum(tgt.values()), sum(raw.values())
    slr = {
        b: round(
            math.log(
                ((tgt.get(b, 0) + 1) * (r_tot + m))
                / ((raw.get(b, 0) + 1) * (t_tot + m))
            )
            * 1_000_000
        )
        for b in set(tgt) | set(raw)
    }
    return {
        i: sum(c * slr[b] for b, c in per_doc[i].items())
        for i in per_doc
        if i not in target_ids
    }


def test_dsir_scores_match_brute_force(spark):
    from crawler_spark.operators.curation import (
        dsir_bucket_logratios,
        dsir_scores,
        hashed_gram_counts,
    )

    rows = [
        (0, "the cat sat on the mat", "tgt"),
        (1, "the dog sat on the rug", "tgt"),
        (2, "the cat sat on the mat today", "raw"),  # target-like
        (3, "xs qq zz ww vv kk jj", "raw"),  # nothing shared
        (4, "the the the the", "raw"),  # repeated gram counts, not distinct
        (5, None, "raw"),  # NULL text degrades to one '' token
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    m = 64  # small bucket count to force hash collisions through the math
    counts = hashed_gram_counts(df, m=m)
    ratios = dsir_bucket_logratios(
        counts, df.filter(F.col("source") == "tgt").select("doc_id"), m=m
    )
    got = {
        r.doc_id: r.dsir_score
        for r in dsir_scores(counts, ratios)
        .join(df.filter(F.col("source") == "raw").select("doc_id"), "doc_id")
        .collect()
    }
    want = _brute_dsir(rows, {0, 1}, m)
    assert got == want
    # the target-like doc outranks the disjoint one
    assert got[2] > got[3]


# ---------------------------------------------------------------------------
# PII scrub (functions/pii.py)
# ---------------------------------------------------------------------------


def test_pii_scrub_and_counts(spark):
    from pyspark.sql import functions as F

    from crawler_spark.functions.pii import pii_counts, scrub_pii

    rows = [
        ("a", "mail bob.s+1@sub.example.co.uk now"),
        ("b", "call +4915112345678 or +1234567"),  # 2nd too short (<8 digits)
        ("c", "host 10.2.0.4 and 255.255.255.255"),
        ("d", "mixed u1@ex.com +12345678 1.2.3.4"),
        ("e", "clean text, nothing here"),
    ]
    df = spark.createDataFrame(rows, ["k", "txt"])
    counts = dict(pii_counts(F.col("txt")))
    got = {
        r.k: (r.e, r.p, r.i, r.red)
        for r in df.select(
            "k",
            counts["email"].alias("e"),
            counts["phone"].alias("p"),
            counts["ipv4"].alias("i"),
            scrub_pii(F.col("txt")).alias("red"),
        ).collect()
    }
    assert got["a"] == (1, 0, 0, "mail [EMAIL] now")
    assert got["b"] == (0, 1, 0, "call [PHONE] or +1234567")
    assert got["c"] == (0, 0, 2, "host [IP] and [IP]")
    assert got["d"] == (1, 1, 1, "mixed [EMAIL] [PHONE] [IP]")
    assert got["e"] == (0, 0, 0, "clean text, nothing here")


def test_pii_overlap_attributed_to_email_only(spark):
    # a phone-like run inside an email local part must count once, as email
    from pyspark.sql import functions as F

    from crawler_spark.functions.pii import pii_counts

    df = spark.createDataFrame([("x+12345678@ex.com",)], ["txt"])
    counts = dict(pii_counts(F.col("txt")))
    r = df.select(
        counts["email"].alias("e"), counts["phone"].alias("p")
    ).collect()[0]
    assert (r.e, r.p) == (1, 0)


# ---------------------------------------------------------------------------
# Token-window chunking (operators/chunking.py)
# ---------------------------------------------------------------------------


def test_chunking_windows_and_tail(spark):
    import pytest as _pytest

    from crawler_spark.operators.chunking import chunk_documents

    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, window=4, stride=3).collect(),
        key=lambda r: r.chunk_start,
    )
    # starts 1,4,7,10; window 4, overlap 1; tail chunk has 1 token
    assert [(r.chunk_start, r.chunk_tokens) for r in rows] == [
        (1, 4), (4, 4), (7, 4), (10, 1),
    ]
    # every token covered; consecutive chunks overlap by window - stride
    import hashlib

    def h(ws):
        return hashlib.md5(" ".join(ws).encode()).hexdigest()

    assert [r.chunk_hash for r in rows] == [
        h(words[0:4]), h(words[3:7]), h(words[6:10]), h(words[9:10]),
    ]
    with _pytest.raises(ValueError):
        chunk_documents(df, window=4, stride=5)


def test_chunking_single_token_and_exact_fit(spark):
    from crawler_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(
        [(1, "only"), (2, " ".join(f"t{i}" for i in range(6)))],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_id, r.chunk_start): r.chunk_tokens
        for r in chunk_documents(df, window=3, stride=3).collect()
    }
    assert got == {(1, 1): 1, (2, 1): 3, (2, 4): 3}


def _brute_pack(doc_tokens: dict, block: int):
    """Reference packing: concat docs in md5('pack:'+id) order, split at
    block boundaries; returns {(block_id, doc_id): (tok_start, tok_end)}."""
    import hashlib

    order = sorted(doc_tokens, key=lambda i: (
        hashlib.md5(f"pack:{i}".encode()).hexdigest(), i))
    out, off = {}, 0
    for i in order:
        n = doc_tokens[i]
        start, end = off, off + n
        for b in range(start // block, (end - 1) // block + 1):
            lo, hi = max(b * block, start), min((b + 1) * block, end)
            out[(b, i)] = (lo - start, hi - start)
        off = end
    return out


def test_token_blocks_matches_brute_force(spark):
    from crawler_spark.operators.chunking import token_blocks

    doc_tokens = {i: (i * 7) % 40 + 1 for i in range(60)}
    doc_tokens[7] = 300  # straddles several 64-token blocks
    df = spark.createDataFrame(
        [(i, n) for i, n in doc_tokens.items()], "doc_id long, n_tokens long")
    got = {(r.block_id, r.doc_id): (r.tok_start, r.tok_end)
           for r in token_blocks(df, block_size=64).collect()}
    assert got == _brute_pack(doc_tokens, 64)


def test_token_blocks_invariants(spark):
    """Span lengths per doc sum to n_tokens; every block except the last is
    exactly full; zero-token docs are dropped."""
    from crawler_spark.operators.chunking import token_blocks

    df = spark.createDataFrame(
        [(i, (i * 13) % 50) for i in range(80)], "doc_id long, n_tokens long")
    rows = token_blocks(df, block_size=128).collect()
    per_doc = {}
    per_block = {}
    for r in rows:
        assert 0 <= r.tok_start < r.tok_end
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + (r.tok_end - r.tok_start)
        per_block[r.block_id] = per_block.get(r.block_id, 0) + (r.tok_end - r.tok_start)
    want = {i: (i * 13) % 50 for i in range(80) if (i * 13) % 50 > 0}
    assert per_doc == want
    last = max(per_block)
    assert all(v == 128 for b, v in per_block.items() if b != last)
    assert 0 < per_block[last] <= 128
