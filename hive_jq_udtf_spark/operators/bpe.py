"""Byte-pair-encoding: learn merges (driver-side, on a bounded
sample) and APPLY them to a corpus (distributed, Arrow-batched).

`bpe_merge_candidates` (plans/queries_r4.py) is the TRAINING-side
pair-count stage expressed relationally; this module completes the
tokenizer loop:

* :func:`learn_bpe` — the classic greedy merge loop (count adjacent
  symbol pairs over the word histogram, merge the most frequent,
  repeat) run DRIVER-SIDE on a corpus SAMPLE.  A merge table is
  O(num_merges) — corpus-size-independent — so at 100 TB the sample
  collect is the same few thousand words it is at sf0.001; ties
  break lexicographically so the table is a deterministic function
  of the sample.
* :func:`bpe_encode` — apply a merge table to every document with
  one Arrow ``mapInPandas`` pass: per word, greedily merge the
  LOWEST-RANK adjacent pair until none applies (the standard
  GPT-2-style algorithm), with a per-batch word cache (Zipf makes
  the cache hit rate ~90%+ on natural text).  The ranks dict rides
  the closure (broadcast by Spark's task serializer); the corpus
  never leaves the executors and the op is embarrassingly parallel.

Reference parity: the reference engine ships no tokenizer; this is
part of the training-data-pipeline mandate (driver brief: "token
counting (whitespace + a BPE-ish regex)" — this upgrades the
BPE-ish regex to a real learned-merge tokenizer).  Pinned by a
differential against an independent step-by-step reference
implementation in tests/test_operators.py.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# end-of-word marker (GPT-2 uses a leading space convention; the
# suffix marker keeps word boundaries reversible: join tokens, strip
# the marker, and the original word returns)
_EOW = "</w>"


def _word_symbols(word: str) -> tuple:
    return tuple(word[:-1]) + (word[-1] + _EOW,)


def learn_bpe(sample_texts: list, num_merges: int = 200) -> list:
    """Greedy BPE training on a list of texts (driver-side).

    Returns the ordered merge table ``[(left, right), ...]`` —
    rank = list position.  Deterministic: pair counts tie-break
    lexicographically; words come from whitespace splitting (the
    repo-wide tokenization convention).
    """
    from collections import Counter

    words = Counter()
    for t in sample_texts:
        for w in (t or "").split():
            words[w] += 1
    vocab = {_word_symbols(w): c for w, c in words.items()}
    merges: list = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # most frequent; ties to the lexicographically smallest pair
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        if pairs[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """Encode ONE word with rank-greedy merging: repeatedly merge the
    adjacent pair with the LOWEST rank until no pair is in the table
    (the GPT-2 reference algorithm)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: list | None = None,
) -> DataFrame:
    """Apply a merge table to every document (Arrow mapInPandas).

    Returns (id_col, *carry_cols, n_words, n_tokens, n_chars,
    compression) — n_chars counts word characters (whitespace
    excluded), so ``n_tokens/n_chars`` is the tokenizer's compression
    ratio and joining each word's tokens (marker stripped) reproduces
    the word exactly (pinned by the roundtrip test).  ``carry_cols``
    are string metadata columns passed through the Arrow batch so
    downstream group-bys need no corpus-sized join back to the
    source frame.
    """
    carry = list(carry_cols or [])
    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = T.StructType(
        [T.StructField(id_col, T.LongType())]
        + [T.StructField(c, docs.schema[c].dataType) for c in carry]
        + [
            T.StructField("n_words", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("compression", T.DoubleType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict = {}
        for pdf in batches:
            out = {id_col: [], "n_words": [], "n_tokens": [], "n_chars": [], "compression": []}
            for c in carry:
                out[c] = pdf[c]
            for did, text in zip(pdf[id_col], pdf[text_col]):
                nw = nt = nc = 0
                for w in (text or "").split():
                    toks = cache.get(w)
                    if toks is None:
                        toks = encode_word(w, ranks)
                        cache[w] = toks
                    nw += 1
                    nt += len(toks)
                    nc += len(w)
                out[id_col].append(did)
                out["n_words"].append(nw)
                out["n_tokens"].append(nt)
                out["n_chars"].append(nc)
                out["compression"].append(round(nt / nc, 6) if nc else 0.0)
            yield pd.DataFrame(out)[[f.name for f in schema.fields]]

    return docs.select(id_col, *carry, text_col).mapInPandas(run, schema=schema)
