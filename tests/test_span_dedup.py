"""Repeated-span detection (operators/span_dedup.py).

Pins: exact spans vs a brute-force Python oracle (hand corpus + hypothesis-
generated corpora), maximal-extent merging, NULL/short-doc degradation,
scrubbing semantics (every occurrence removed, pass-through rows untouched),
the winnowing detection guarantee (every duplicated run of ≥ w + k - 1
tokens is flagged; winnowed spans never invent positions outside exact
islands' neighborhoods), reserved-name guards, and plan shape (no
cartesian/BNLJ, window text absent from shuffles).
"""

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.operators.span_dedup import duplicated_spans, remove_spans


def brute_spans(docs: dict[int, str], k: int) -> set[tuple[int, int, int]]:
    """(doc_id, span_start, span_end) by literal window counting."""
    wins = {
        d: [" ".join(tk[i:i + k]) for i in range(len(tk) - k + 1)]
        for d, t in docs.items() if t is not None
        for tk in [t.split(" ")]
        if len(tk) >= k
    }
    cnt = Counter(w for ws in wins.values() for w in ws)
    out = set()
    for d, ws in wins.items():
        dup = [i + 1 for i, w in enumerate(ws) if cnt[w] >= 2]  # 1-based
        run: list[int] = []
        for s in dup:
            if run and s - run[-1] > 1:
                out.add((d, run[0], run[-1] + k - 1))
                run = []
            run.append(s)
        if run:
            out.add((d, run[0], run[-1] + k - 1))
    return out


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog today",
    2: "intro text then the quick brown fox jumps over the lazy dog today and more",
    3: "a totally different document with no shared runs at all",
    4: "x x x the quick brown fox jumps over the lazy dog today y",
    5: None,
    6: "too short",
}
K = 4


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        list(CORPUS.items()), "doc_id long, text string"
    )


def test_exact_spans_match_brute_force(spark, corpus_df):
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(corpus_df, k=K).collect()
    }
    assert got == brute_spans(CORPUS, K)
    assert got  # the shared sentence is actually detected


def test_span_row_invariants(spark, corpus_df):
    for r in duplicated_spans(corpus_df, k=K).collect():
        assert r.span_tokens == r.span_end - r.span_start + 1 >= K
        assert r.n_windows == r.span_tokens - K + 1  # exact mode: stride-1
        assert r.doc_id not in (5, 6)  # NULL + short degrade to no rows


def test_same_doc_repetition_counts(spark):
    # One doc repeating its own k-gram is a duplicate (paper semantics).
    df = spark.createDataFrame(
        [(1, "a b c d z z z a b c d")], "doc_id long, text string")
    got = {(r.span_start, r.span_end)
           for r in duplicated_spans(df, k=4).collect()}
    assert got == {(1, 4), (8, 11)}


def test_remove_spans_scrubs_every_occurrence(spark, corpus_df):
    spans = duplicated_spans(corpus_df, k=K)
    out = {r.doc_id: r for r in remove_spans(corpus_df, spans).collect()}
    brute = brute_spans(CORPUS, K)
    for d, t in CORPUS.items():
        if t is None:
            assert out[d].clean_text is None and out[d].removed_tokens == 0
            continue
        tk = t.split(" ")
        drop = {
            i for (dd, s, e) in brute if dd == d for i in range(s - 1, e)
        }
        want = " ".join(w for i, w in enumerate(tk) if i not in drop)
        assert out[d].clean_text == want
        assert out[d].removed_tokens == len(drop)
    # Docs 1/2/4 share the sentence: every copy must be gone.
    assert "quick brown fox" not in (
        out[1].clean_text + out[2].clean_text + out[4].clean_text)


def test_reserved_name_guard(spark):
    df = spark.createDataFrame([(1, "a b", 0)], "doc_id long, text string, _s int")
    with pytest.raises(ValueError, match="_s"):
        duplicated_spans(df)
    df2 = spark.createDataFrame(
        [(1, "a b", "x")], "doc_id long, text string, clean_text string")
    with pytest.raises(ValueError, match="clean_text"):
        remove_spans(df2, df2.selectExpr(
            "doc_id", "1 as span_start", "1 as span_end"))


def test_parameter_validation(spark, corpus_df):
    with pytest.raises(ValueError):
        duplicated_spans(corpus_df, k=1)
    with pytest.raises(ValueError):
        duplicated_spans(corpus_df, winnow=1)


def test_plan_no_join_blowup_and_no_text_shuffle(spark, corpus_df):
    plan = duplicated_spans(corpus_df, k=K)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # The hash-count exchange must move (_wh, doc_id, _s) only — never _tk.
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "_tk" not in line, line


# ---------------------------------------------------------------------------
# Hypothesis: random corpora over a tiny alphabet (maximizes collisions and
# run-merging edge cases) agree with the brute-force oracle exactly.
# ---------------------------------------------------------------------------

_doc = st.lists(
    st.sampled_from("abc"), min_size=0, max_size=30).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(texts=st.lists(_doc, min_size=1, max_size=8), k=st.integers(2, 5))
def test_fuzz_exact_matches_brute(spark, texts, k):
    docs = dict(enumerate(texts))
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {(r.doc_id, r.span_start, r.span_end)
           for r in duplicated_spans(df, k=k).collect()}
    assert got == brute_spans(docs, k)


# ---------------------------------------------------------------------------
# Winnowing guarantee: a planted shared run of exactly w + k - 1 tokens is
# flagged in every document that carries it, and winnowed span extents stay
# inside the exact-mode island extents (no invented duplication).
# ---------------------------------------------------------------------------

@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10_000), w=st.integers(2, 5), k=st.integers(2, 4))
def test_winnow_guarantee_planted_run(spark, seed, w, k):
    import random

    rng = random.Random(seed)
    run = [f"r{seed}n{i}" for i in range(w + k - 1)]  # unique planted tokens
    def noise(n, tag):
        return [f"{tag}{rng.randrange(10**9)}" for _ in range(n)]
    docs = {
        1: " ".join(noise(rng.randrange(0, 8), "a") + run + noise(rng.randrange(0, 8), "b")),
        2: " ".join(noise(rng.randrange(0, 8), "c") + run + noise(rng.randrange(0, 8), "d")),
        3: " ".join(noise(12, "e")),
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    winnowed = duplicated_spans(df, k=k, winnow=w).collect()
    assert {r.doc_id for r in winnowed} >= {1, 2}
    exact = duplicated_spans(df, k=k).collect()
    ex_by_doc = {}
    for r in exact:
        ex_by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for r in winnowed:
        # Every winnowed span lies inside some exact island (boundary slack
        # is toward the inside: fingerprints are a subset of dup windows).
        assert any(s <= r.span_start and r.span_end <= e
                   for s, e in ex_by_doc.get(r.doc_id, [])), (r, ex_by_doc)
