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
