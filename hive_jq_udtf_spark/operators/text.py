"""Text-analysis operators (SURVEY §2.6): token stats, quality
scoring, fingerprinting, language-ID heuristic, token counting.

Everything except language-ID is pure built-in expressions.  The
oracle-checked shapes (token_stats / quality_scores /
doc_fingerprints) mirror the DuckDB SQL in plans/queries.py
term-for-term, including rounding order."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-language corpus statistics."""
    toks = F.size(F.split(F.col("text"), " "))
    return (
        docs.withColumn("n_tokens", toks)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length/density-based quality gate per language; density is
    rounded per-doc BEFORE averaging (matches oracle)."""
    n_tokens = F.size(F.split(F.col("text"), " "))
    density = F.round(n_tokens / F.nullif(F.col("n_chars"), F.lit(0)), 4)
    passes = F.when(
        (n_tokens >= 20) & F.col("n_chars").between(50, 5000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        docs.select(F.col("lang"), density.alias("tok_density"), passes.alias("passes"))
        .groupBy("lang")
        .agg(
            F.sum("passes").alias("n_pass"),
            (F.count("*") - F.sum("passes")).alias("n_fail"),
            F.round(F.avg("tok_density"), 4).alias("avg_density"),
        )
        .orderBy("lang")
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Content + prefix hashes and token count per document."""
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_hash"),
        F.md5(F.substring(F.col("text"), 1, 64)).alias("prefix_hash"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------

# GPT-2-style pretokenizer shape: word pieces, numbers, punctuation
# runs, whitespace runs (public BPE pretokenization pattern family)
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish token counts per document — the cheap
    pre-tokenization estimate used for budget planning.

    Column-API regexp (NOT F.expr) so backslashes survive — SQL
    string literals would swallow the \\s escape."""
    ws = F.size(F.split(F.col(text_col), r"\s+"))
    bpe = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0))
    )
    return docs.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_ish_tokens")
    )


# ---------------------------------------------------------------------------
# language identification (character n-gram heuristic)
# ---------------------------------------------------------------------------

# tiny per-language profiles: characteristic words / character
# patterns with weights; scored by summed match counts.  This is a
# deterministic heuristic (real pipelines plug fastText etc. here).
_LANG_PROFILES: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is ", "th", "he", "ing "],
    "de": [" der ", " die ", " und ", " ist ", " das ", "ch", "ei", "sch"],
    "fr": [" le ", " la ", " et ", " est ", " les ", "ou", "qu", "tion"],
    "es": [" el ", " la ", " y ", " es ", " los ", "ción", "qu", "ll"],
    "zh": ["的", "是", "了", "在", "我"],
}


def _language_scores(text_col: str) -> dict[str, Column]:
    """Per-language profile-hit score Columns (pure codegen).

    Occurrence count per pattern is ``size(split(padded, pat)) - 1``
    (split on the LITERAL pattern), which equals the replace-and-
    length-diff formula the SQL oracle uses — both count
    non-overlapping left-to-right occurrences — while referencing the
    padded text ONCE per pattern instead of twice.  Expression size
    matters here: this column is inlined into whatever codegen stage
    consumes it, and the earlier form pushed the training-pipeline
    sort stage past what janino can compile (see language_id_col)."""
    import re as _re

    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    return {
        lang: sum(
            (F.size(F.split(padded, _re.escape(pat), -1)) - F.lit(1)).cast(
                "double"
            )
            for pat in pats
        )
        for lang, pats in _LANG_PROFILES.items()
    }


def language_id_col(text_col: str = "text") -> Column:
    """Predicted language as a single Column expression (argmax of the
    profile scores; ties resolve to the first profile).  A plain
    projection — composes into pipelines with NO join or shuffle.

    Formulated as array_position(scores, array_max(scores)) so every
    score expression appears ONCE.  The earlier greatest + chained
    when() form re-inlined each score ~(n_langs+1) times; fused into a
    downstream sort stage that generated a >10k-line Java method that
    janino failed to compile, silently falling the whole stage back to
    interpreted execution (BENCH_r03 stderr).  Semantics are
    identical: first-index ties, exact double equality, NULL text →
    NULL prediction — the SQL oracle fragments are unchanged."""
    scores = _language_scores(text_col)
    langs = list(scores)
    sarr = F.array(*scores.values())
    larr = F.array(*[F.lit(lang) for lang in langs])
    idx = F.array_position(sarr, F.array_max(sarr))
    return F.element_at(larr, F.when(idx > 0, idx).cast("int"))


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language-ID: per-language profile hit counts via
    string-replace counting, argmax via greatest + chained when.  All
    codegen; extendable profile table."""
    scores = _language_scores(text_col)
    scored = docs.select(
        "doc_id", *[c.alias(f"score_{lang}") for lang, c in scores.items()]
    )
    langs = list(_LANG_PROFILES)
    # same single-occurrence argmax as language_id_col (ties → first)
    sarr = F.array(*[F.col(f"score_{l}") for l in langs])
    larr = F.array(*[F.lit(l) for l in langs])
    idx = F.array_position(sarr, F.array_max(sarr))
    pred = F.element_at(larr, F.when(idx > 0, idx).cast("int"))
    return scored.withColumn("pred_lang", pred).select("doc_id", "pred_lang", *[f"score_{l}" for l in langs])


# ---------------------------------------------------------------------------
# deterministic hash sampling / train-test split
# ---------------------------------------------------------------------------


def hash_bucket(col: Column, buckets: int = 100, salt: str = "") -> Column:
    """Stable, engine-portable sampling bucket in [0, buckets): the
    first 15 hex chars of md5(salt || id) as an integer, mod buckets.
    Unlike rand()/sampleBy this is reproducible across engines, runs,
    partitionings, and cluster sizes — the property a training-data
    split must have (a re-run of the pipeline keeps every example in
    the same split)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    return (h % buckets).cast("int")


def hash_sample(
    df: DataFrame, id_col: str, pct: int, buckets: int = 100, salt: str = ""
) -> DataFrame:
    """Deterministic ~pct% sample: rows whose hash bucket < pct."""
    return df.where(hash_bucket(F.col(id_col), buckets, salt) < pct)


def train_test_split(
    df: DataFrame, id_col: str, test_pct: int = 10, salt: str = "split"
) -> DataFrame:
    """Adds a 'split' column ('test' for test_pct% of ids, else
    'train') — single projection, no shuffle, reproducible."""
    return df.withColumn(
        "split",
        F.when(
            hash_bucket(F.col(id_col), 100, salt) < test_pct, F.lit("test")
        ).otherwise(F.lit("train")),
    )


# ---------------------------------------------------------------------------
# sequence packing (training-batch assembly)
# ---------------------------------------------------------------------------


def pack_documents(
    docs: DataFrame,
    budget_chars: int = 2000,
    shard_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Contiguous sequence packing: within each shard (documents
    ordered by id), assign each doc to bin floor(prefix_size /
    budget) — the deterministic streaming-packing rule (a doc may
    straddle its bin's budget; bins are contiguous and stable).

    Scale shape: the window partitions by ``shard_col`` so packing
    parallelizes across shards — never a global single-task sort.
    One shuffle (the window partition)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return docs.withColumn(
        "pack_bin", F.floor(cum_before / budget_chars).cast("long")
    )


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    pcts: dict,
    id_col: str = "doc_id",
    buckets: int = 100,
    salt: str = "strat",
    default_pct: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep ~pcts[stratum]% of
    each stratum's rows, chosen by stable hash bucket (reproducible
    across runs/engines/partitionings — the rebalancing primitive for
    skewed training mixes).  Single projection + filter, no shuffle."""
    b = hash_bucket(F.col(id_col), buckets, salt)
    pct = F.lit(default_pct)
    for stratum, p in sorted(pcts.items()):
        pct = F.when(F.col(strata_col) == stratum, F.lit(p)).otherwise(pct)
    return df.where(b < pct)


# ---------------------------------------------------------------------------
# repetition-based quality filtering (Gopher-style)
# ---------------------------------------------------------------------------


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals from the public Gopher /
    MassiveText filtering recipe, over word unigrams and bigrams:

    - ``top_bigram_frac``: occurrences of the most frequent bigram /
      total bigrams (0.0 when the doc has < 2 words),
    - ``dup_word_frac``: 1 − distinct/total words — the bulk
      repetition signal.

    Shape: ZERO shuffles — a pure map stage.  dup_word_frac is a
    codegen array expression; top_bigram_frac is an Arrow-batched
    pandas UDF (per-batch Counter over word pairs).  Two rejected
    alternatives, both measured at sf0.1: explode-per-bigram into a
    two-level groupBy shuffles O(total tokens) rows (~4.4 s), and an
    aggregate() HOF longest-run over the sorted bigram array stays
    shuffle-free but Spark evaluates HOF lambdas INTERPRETED
    per-element (~1.5 M lambda evals, ~6.4 s).  The vectorized UDF
    does the same work in ~0.1 s of Python across the executor cores
    and scales as a map stage at 100 TB.  Rounding happens JVM-side
    (F.round is HALF_UP; Python's round is banker's — they differ on
    exact .xxxx5 doubles like 1/32)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def _top_bigram_frac(texts):
        from collections import Counter

        import pandas as pd

        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            ws = t.split(" ")
            if len(ws) < 2:
                out.append(0.0)
                continue
            c = Counter(zip(ws, ws[1:]))
            out.append(max(c.values()) / (len(ws) - 1))
        return pd.Series(out, dtype="float64")

    words = F.split(F.col(text_col), " ")
    return docs.select(
        F.col(id_col),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(words)) / F.size(words), 4
        ).alias("dup_word_frac"),
        F.coalesce(
            F.round(_top_bigram_frac(F.col(text_col)), 4), F.lit(0.0)
        ).alias("top_bigram_frac"),
    )


def repetition_filter(
    docs: DataFrame,
    max_top_bigram_frac: float = 0.10,
    max_dup_word_frac: float = 0.90,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gate documents on the repetition signals; adds ``rep_pass``."""
    stats = repetition_stats(docs, text_col, id_col)
    return stats.withColumn(
        "rep_pass",
        (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("dup_word_frac") <= max_dup_word_frac),
    )


# ---------------------------------------------------------------------------
# PII redaction (regex scrubbing, pure codegen)
# ---------------------------------------------------------------------------

# Patterns restricted to the regex core shared by Java (Catalyst
# rlike/regexp_replace), Python re, and RE2 (the DuckDB oracle) —
# char classes, bounded repetition, \b — so the operator is
# engine-portable (same J22 dialect discipline as the native tier).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_redact(
    df: DataFrame,
    text_col: str,
    patterns: dict[str, str] | None = None,
    token: str = "[PII]",
) -> DataFrame:
    """Scrub PII-shaped spans from ``text_col``: per-pattern match
    counts (``n_<name>`` columns, counted on the text as each pattern
    sees it, i.e. after the previous patterns' redactions) plus the
    fully redacted text in ``redacted``.  Patterns apply in dict
    order — order matters when patterns overlap (emails are consumed
    before their digit runs could look like phones).

    A single projection — no shuffle, no Python; regexp_replace and
    regexp_extract_all are whole-stage-codegen expressions, so this
    runs at scan speed at any scale."""
    pats = PII_PATTERNS if patterns is None else patterns
    c = F.col(text_col)
    out = df
    for name, pat in pats.items():
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        )
        c = F.regexp_replace(c, pat, token)
    return out.withColumn("redacted", c)


# ---------------------------------------------------------------------------
# domain-mixture sampling (downsample-to-target-weights)
# ---------------------------------------------------------------------------


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict,
    id_col: str = "doc_id",
    buckets: int = 10_000,
    salt: str = "mix",
) -> DataFrame:
    """Downsample a corpus so domain proportions match ``weights``
    (the training-mix rebalancing step: e.g. web 50% / books 30% /
    code 20%).  No domain is UPsampled: the binding domain (largest
    count/weight deficit) is kept whole and every other domain is
    thinned to match, yielding the largest achievable corpus with the
    exact target mix.  Selection is by stable md5 bucket (same
    engine-portable determinism as hash_sample) so re-runs keep the
    identical subset at any partitioning or cluster size.

    100 TB shape: one tiny groupBy(domain) aggregate (rows =
    |domains|), a 1x1 global min, and a broadcast join of the
    per-domain threshold back onto the corpus — the corpus itself is
    never shuffled, just scanned and filtered."""
    w = F.lit(None).cast("double")
    for dom, p in sorted(weights.items()):
        w = F.when(F.col(domain_col) == dom, F.lit(float(p))).otherwise(w)
    counts = (
        df.groupBy(domain_col)
        .agg(F.count("*").alias("_cnt"))
        .withColumn("_w", w)
        .where(F.col("_w").isNotNull())
    )
    scale = counts.select(F.min(F.col("_cnt") / F.col("_w")).alias("_scale"))
    thresh = counts.crossJoin(scale).select(
        F.col(domain_col),
        F.floor(F.lit(float(buckets)) * F.col("_w") * F.col("_scale") / F.col("_cnt"))
        .alias("_th"),
    )
    b = hash_bucket(F.col(id_col), buckets, salt)
    return (
        df.join(F.broadcast(thresh), domain_col)
        .where(b < F.col("_th"))
        .drop("_th")
    )


# ---------------------------------------------------------------------------
# linear quality classifier (fixed public-recipe weights, pure codegen)
# ---------------------------------------------------------------------------

# A tiny function-word list: the classifier signal is "does the text
# look like running prose", per the public fastText/CCNet-style
# quality-filter recipes.  Deliberately short and frozen so the
# feature is cheap and the oracle can restate it verbatim.
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document prose-likeness features, all whole-stage codegen:

    - ``log_n_words``: ln(word count),
    - ``stop_frac``: fraction of words in the frozen STOPWORDS list,
    - ``avg_word_len``: mean word length,
    - ``digit_frac``: digit characters / total characters.
    """
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda x: x.isin(*STOPWORDS)))
    n_chars = F.length(F.col(text_col))
    n_digit = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", ""))
    return docs.select(
        F.col(id_col),
        F.round(F.log(n_words.cast("double")), 6).alias("log_n_words"),
        F.round(n_stop / n_words, 6).alias("stop_frac"),
        F.round(
            (n_chars - (n_words - F.lit(1))) / n_words.cast("double"), 6
        ).alias("avg_word_len"),
        F.round(n_digit / n_chars.cast("double"), 6).alias("digit_frac"),
    )


# Frozen linear model: bias + w . features, squashed by a logistic.
# Weights are illustrative constants (prose-positive: stopwords up,
# digit soup down), NOT trained on anything — the operator under
# test is the scoring plan, not the model.
QUALITY_WEIGHTS = {
    "bias": -1.0,
    "log_n_words": 0.25,
    "stop_frac": 6.0,
    "avg_word_len": -0.10,
    "digit_frac": -8.0,
}


def quality_classify(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with the frozen logistic model and gate
    at ``threshold``; adds ``q_score`` (rounded to 6) and ``q_pass``.
    Scoring is a single projection over the feature expressions —
    no shuffle, no Python, runs at scan speed."""
    f = quality_features(docs, text_col, id_col)
    z = (
        F.lit(QUALITY_WEIGHTS["bias"])
        + F.lit(QUALITY_WEIGHTS["log_n_words"]) * F.col("log_n_words")
        + F.lit(QUALITY_WEIGHTS["stop_frac"]) * F.col("stop_frac")
        + F.lit(QUALITY_WEIGHTS["avg_word_len"]) * F.col("avg_word_len")
        + F.lit(QUALITY_WEIGHTS["digit_frac"]) * F.col("digit_frac")
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return f.withColumn("q_score", score).withColumn(
        "q_pass", F.col("q_score") >= F.lit(threshold)
    )


def sliding_chunks(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping sliding-window chunking — the RAG / embedding-prep
    shape: windows of ``chunk_tokens`` whitespace tokens starting
    every ``stride`` tokens (overlap = chunk_tokens − stride), plus a
    short tail chunk so every token lands in ≥1 chunk.

    Pure codegen: tokenize once, generate the start offsets with
    ``sequence`` and slice per start — one narrow projection and one
    explode, no Python worker and no shuffle at all (chunking is
    embarrassingly parallel; the explode multiplies rows ~n/stride,
    which the downstream consumer controls via stride).  Start
    offsets beyond the first are dropped when they'd produce a chunk
    fully contained in the previous one (start ≥ n_tokens ⇒ no new
    tokens).

    Returns (id, chunk_id, start_tok, n_toks, chunk_text).
    """
    if stride <= 0 or chunk_tokens <= 0 or stride > chunk_tokens:
        raise ValueError("require 0 < stride <= chunk_tokens")
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    d = docs.select(F.col(id_col), toks.alias("__toks")).withColumn(
        "__n", F.size("__toks")
    )
    # starts: 0, stride, 2·stride, … while start < n (never empty:
    # an empty document still yields start 0 with an empty chunk,
    # filtered below)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("__n") - 1, F.lit(0)),
        F.lit(stride),
    )
    ch = d.select(
        id_col,
        "__n",
        "__toks",
        F.posexplode(starts).alias("chunk_id", "start_tok"),
    )
    piece = F.slice(F.col("__toks"), F.col("start_tok") + 1, chunk_tokens)
    return (
        ch.where(F.col("__n") > 0)
        .select(
            id_col,
            "chunk_id",
            "start_tok",
            F.size(piece).alias("n_toks"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )
