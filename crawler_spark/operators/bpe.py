"""Byte-pair-encoding tokenizer — train + encode for training-data prep.

The classic subword algorithm (Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016): learn merge rules
from a word-frequency table, encode by applying merges lowest-rank-first.
The registry's ``bpe_token_count`` (functions/textops.py) is the regex
*approximation* of this; this module is the real tokenizer a training
pipeline ships alongside its shards.

Scale design — what runs where at 100 TB:

* The ONLY corpus-sized pass is the word-frequency aggregation
  (``word_frequencies``): one map-side-combinable ``groupBy(word).count()``
  over the same regex pre-tokens the registry's token counts use
  (textops.BPE_PATTERN), then top-K types by ``(count DESC, word)`` via
  ``orderBy + limit`` — Spark plans that as TakeOrderedAndProject (per-
  partition partial top-K + driver merge), never a single-partition window.
* Merge TRAINING is driver-side over that bounded table.  This mirrors how
  production BPE trainers actually work (they train on a word-TYPE frequency
  dict, not the raw corpus): Heaps' law keeps the type table sublinear in
  corpus size, and capping at the top K types drops only tail types whose
  pair mass is negligible at any K large enough to matter.  The trainer is
  incremental — a merge updates pair counts only for the words that contain
  the merged pair — so 32k merges over 256k types is seconds of driver CPU.
* ENCODING is Arrow-batched (``pandas_udf``), with the merge-rank dict
  carried in the closure (a merge table is ≤ a few MB — broadcast-sized by
  construction) and a per-executor word→tokens memo: Zipf means almost every
  word is a repeat, so the amortized cost per token is a dict hit, not a
  merge loop.

Determinism: pair-count ties break on the lexicographically SMALLEST pair,
so the merge list — and therefore every encoding — is a pure function of
the corpus.  No reference analog (the reference crawler is transport-only);
this is a north-rule training-pipeline addition.
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.textops import BPE_PATTERN

__all__ = [
    "EOW",
    "word_frequencies",
    "bpe_train",
    "bpe_vocab",
    "encode_word",
    "bpe_encode",
]

# End-of-word sentinel appended to every word's symbol sequence (Sennrich
# §3.2): it lets the trainer learn word-final subwords ("est</w>" vs "est")
# and makes token sequences losslessly invertible to words.
EOW = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", max_types: int = 1 << 18
) -> list[tuple[str, int]]:
    """Top-``max_types`` word types by frequency — the trainer's input.

    Distributed part: explode the regex pre-tokens, one partial-agg count,
    top-K by ``(count DESC, word ASC)`` (deterministic under ties).  Returns
    a driver list: bounded at ``max_types`` rows BY CONSTRUCTION — this is
    the documented driver-side budget, not an unbounded collect.
    """
    rows = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(BPE_PATTERN), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word")
        .count()
        .orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_types)
        .collect()
    )
    return [(r["word"], int(r["count"])) for r in rows]


def bpe_train(
    word_counts: Iterable[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from ``(word, count)`` pairs.

    Incremental trainer: full pair-count pass once, then each merge updates
    counts only through the words that contain the merged pair (tracked in
    an inverted index).  Ties break on the lexicographically smallest pair.
    Stops early when no pair occurs twice (merging hapax pairs memorizes
    the corpus instead of learning units).
    """
    words: list[list[str]] = []
    counts: list[int] = []
    for w, c in word_counts:
        if not w or c <= 0:
            continue
        words.append(list(w) + [EOW])
        counts.append(int(c))

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        c = counts[i]
        for pair in zip(syms, syms[1:]):
            pair_counts[pair] = pair_counts.get(pair, 0) + c
            where.setdefault(pair, set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # max by count, tie-break min pair: one O(P) scan per merge.
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        touched = where.pop(best, set())
        pair_counts.pop(best, None)
        for i in touched:
            syms, c = words[i], counts[i]
            # subtract the word's current pair contributions…
            for pair in zip(syms, syms[1:]):
                if pair in pair_counts:
                    pair_counts[pair] -= c
                    if pair_counts[pair] <= 0:
                        del pair_counts[pair]
                        where.pop(pair, None)
                else:
                    w_set = where.get(pair)
                    if w_set is not None:
                        w_set.discard(i)
            merged = _merge_once(syms, best, new_sym)
            words[i] = merged
            # …and re-add the merged word's.
            for pair in zip(merged, merged[1:]):
                pair_counts[pair] = pair_counts.get(pair, 0) + c
                where.setdefault(pair, set()).add(i)
    return merges


def _merge_once(syms: Sequence[str], pair: tuple[str, str], new_sym: str) -> list[str]:
    """Replace every non-overlapping occurrence of ``pair``, left to right."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(new_sym)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_vocab(
    word_counts: Iterable[tuple[str, int]], merges: Sequence[tuple[str, str]]
) -> dict[str, int]:
    """Deterministic token → id table: sorted base alphabet (every character
    seen in the type table, plus EOW), then merge outputs in merge order."""
    alphabet: set[str] = {EOW}
    for w, _c in word_counts:
        alphabet.update(w)
    vocab: dict[str, int] = {}
    for sym in sorted(alphabet):
        vocab[sym] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in vocab:  # distinct merges can collide on concatenation
            vocab[tok] = len(vocab)
    return vocab


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges lowest-rank-first (the canonical BPE encode loop).

    Each step merges ALL non-overlapping occurrences of the best-ranked
    pair, exactly like the trainer did — so encoding a training word
    reproduces its trained segmentation.
    """
    syms: list[str] = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        syms = _merge_once(syms, best_pair, best_pair[0] + best_pair[1])
    return syms


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]],
    out_col: str = "bpe_tokens",
    memo_cap: int = 1 << 16,
) -> DataFrame:
    """Add ``out_col: array<string>`` — the BPE token stream of ``text_col``.

    Arrow-batched scalar pandas_udf; NULL text → NULL tokens.  The word memo
    lives on the UDF closure per executor process and is cleared at
    ``memo_cap`` entries (bounded memory; Zipf keeps the hit rate high long
    before the cap).
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}
    # re.ASCII: \s in java.util.regex (training, bpe_token_count) and RE2
    # (the DuckDB twin) is ASCII-only, but Python's default is Unicode —
    # without the flag U+00A0 in web text matches [^a-z0-9\s] at train time
    # yet is skipped at encode time, so trained types are never emitted
    pattern = re.compile(BPE_PATTERN, re.ASCII)
    memo: dict[str, list[str]] = {}

    def _enc_text(text: str) -> list[str]:
        out: list[str] = []
        for w in pattern.findall(text.lower()):
            toks = memo.get(w)
            if toks is None:
                toks = encode_word(w, ranks)
                if len(memo) >= memo_cap:
                    memo.clear()
                memo[w] = toks
            out.extend(toks)
        return out

    @pandas_udf("array<string>")
    def _enc(s):
        import pandas as pd

        return pd.Series(
            [_enc_text(x) if isinstance(x, str) else None for x in s],
            dtype="object",
        )

    return df.withColumn(out_col, _enc(F.col(text_col)))
