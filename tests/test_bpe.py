"""BPE tokenizer (operators/bpe.py) — the q72 exactness evidence.

q72 rides the rows-only oracle gate (an iterative lowest-rank merge loop is
not ANSI-SQL-expressible), so these tests carry the exactness burden:
the incremental trainer equals a naive full-recount reference, the Arrow
encode column equals the scalar encode path row-for-row, and both are
deterministic pure functions of the corpus.
"""

from __future__ import annotations

import re

import pytest

from crawler_spark.functions.textops import BPE_PATTERN
from crawler_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    bpe_vocab,
    encode_word,
    word_frequencies,
)

CORPUS = [
    "the lower the newer the lowest",
    "lower and lower, newer and newer!",
    "low low low low low",
    "widest wider wide",
    "newest newest newest newest",
    "the 1920s were wide; the 1990s wider",
]


def _pretokens(text: str) -> list[str]:
    # re.ASCII mirrors the training side (java.util.regex, where \s is
    # ASCII-only) — see bpe_encode's pattern flag
    return re.findall(BPE_PATTERN, text.lower(), re.ASCII)


def _word_counts(corpus: list[str]) -> list[tuple[str, int]]:
    counts: dict[str, int] = {}
    for line in corpus:
        for w in _pretokens(line):
            counts[w] = counts.get(w, 0) + 1
    # the operator returns (count DESC, word ASC) order; the trainer must
    # not depend on input order, but match it for like-for-like comparison
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))


def naive_train(word_counts, n_merges):
    """Reference trainer: full pair recount every iteration (Sennrich's
    learn_bpe shape) — O(merges × corpus), no incremental bookkeeping."""
    words = [(list(w) + [EOW], c) for w, c in word_counts if w and c > 0]
    merges = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for pair in zip(syms, syms[1:]):
                pair_counts[pair] = pair_counts.get(pair, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        nxt = []
        for syms, c in words:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, c))
        words = nxt
    return merges


def test_incremental_trainer_equals_naive_reference():
    wc = _word_counts(CORPUS)
    assert bpe_train(wc, 50) == naive_train(wc, 50)


def test_trainer_matches_naive_on_adversarial_overlaps():
    # overlapping pairs ("aaaa"), single-char words, punctuation, digits
    wc = [("aaaa", 7), ("aaa", 5), ("aa", 3), ("a", 9), ("!", 4),
          ("abab", 6), ("bab", 2), ("1919", 3), ("9191", 3)]
    assert bpe_train(wc, 30) == naive_train(wc, 30)


def test_trainer_order_invariant_and_deterministic():
    wc = _word_counts(CORPUS)
    assert bpe_train(list(reversed(wc)), 40) == bpe_train(wc, 40)
    assert bpe_train(wc, 40) == bpe_train(wc, 40)


def test_trainer_stops_at_hapax_pairs():
    # every pair unique -> nothing occurs twice -> no merges learned
    assert bpe_train([("abcd", 1)], 10) == []


def test_encode_reproduces_trained_segmentation():
    """Encoding a training word must yield the segmentation the trainer
    left it with — the defining property of rank-ordered BPE encode."""
    wc = _word_counts(CORPUS)
    merges = bpe_train(wc, 50)
    ranks = {p: i for i, p in enumerate(merges)}
    # replay the trainer's segmentation
    words = {w: list(w) + [EOW] for w, _ in wc}
    for a, b in merges:
        new_sym = a + b
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    for w, expect in words.items():
        assert encode_word(w, ranks) == expect, w


def test_encode_roundtrips_unseen_words():
    wc = _word_counts(CORPUS)
    ranks = {p: i for i, p in enumerate(bpe_train(wc, 50))}
    for w in ("lowering", "widening", "zzz", "x"):
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW  # lossless
        assert all(t for t in toks)


def test_vocab_is_deterministic_and_covers_merges():
    wc = _word_counts(CORPUS)
    merges = bpe_train(wc, 50)
    vocab = bpe_vocab(wc, merges)
    assert vocab == bpe_vocab(wc, merges)
    assert len(set(vocab.values())) == len(vocab)  # ids unique
    for a, b in merges:
        assert a + b in vocab
    assert EOW in vocab


def test_word_frequencies_matches_pandas(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS] + [(None,)], ["text"])
    got = word_frequencies(df, "text", max_types=1000)
    assert got == _word_counts(CORPUS)


def test_word_frequencies_cap_keeps_highest_counts(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    full = word_frequencies(df, "text", max_types=1000)
    top3 = word_frequencies(df, "text", max_types=3)
    assert top3 == full[:3]


def test_encode_column_equals_scalar_path(spark):
    wc = _word_counts(CORPUS)
    merges = bpe_train(wc, 50)
    ranks = {p: i for i, p in enumerate(merges)}
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)] + [(99, None)], ["i", "text"]
    )
    rows = {r["i"]: r["bpe_tokens"]
            for r in bpe_encode(df, "text", merges).collect()}
    for i, text in enumerate(CORPUS):
        expect = [tok for w in _pretokens(text) for tok in encode_word(w, ranks)]
        assert rows[i] == expect, text
    assert rows[99] is None  # NULL text -> NULL tokens


def test_q72_runs_and_profiles_per_source(spark):
    from crawler_spark.queries import q72_bpe_tokens

    out = q72_bpe_tokens(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        # merges only ever compress the pre-token stream (plus EOW word
        # merges can't grow it): bpe_tokens <= pre_tokens is NOT guaranteed
        # (EOW adds one symbol per word pre-merge) — but with 200 merges on
        # this corpus the trained stream must be strictly finite & positive
        assert r["n_docs"] > 0 and r["bpe_tokens"] > 0 and r["token_types"] > 0


@pytest.mark.parametrize("word", ["", "a"])
def test_degenerate_words(word):
    ranks = {}
    toks = encode_word(word, ranks)
    assert "".join(toks) == word + EOW


def test_unicode_whitespace_train_encode_agreement(spark):
    """U+00A0 (&nbsp;) is [^a-z0-9\\s] under JVM/RE2 \\s (ASCII-only) but
    whitespace under Python's default \\s — training and encode must agree
    it is a TOKEN, or trained types are never emitted at encode time."""
    text = "a\u00a0b"
    df = spark.createDataFrame([(0, text)], ["i", "text"])
    wf = word_frequencies(df, "text", max_types=100)
    assert ("\u00a0", 1) in wf  # training sees the nbsp as a word type
    merges = bpe_train(wf, 5)
    ranks = {p: i for i, p in enumerate(merges)}
    toks = bpe_encode(df, "text", merges).collect()[0]["bpe_tokens"]
    assert toks == [t for w in _pretokens(text) for t in encode_word(w, ranks)]
    assert "".join(toks) == "a" + EOW + "\u00a0" + EOW + "b" + EOW
