"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side Catalyst expressions (no Python in the hot path): language-ID by
stopword-hit heuristic, quality scoring (length / punctuation / stopword
ratios), token counting (whitespace + BPE-ish regex), and rolling-hash document
fingerprinting. Designed for the ``documents`` table shape
(doc_id, text, lang, source, n_chars) but generic over any text column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword seeds for the n-gram/stopword heuristic; fixed
# vocab keeps the operator deterministic and broadcast-free
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "und", "das", "ist"],
}


def _hits(col, words):
    # marker-token hits with multiplicity (filter keeps duplicates,
    # unlike array_intersect which dedups)
    toks = F.split(F.lower(col), r"\s+")
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Language-ID heuristic: argmax of stopword-marker hits; 'und' when no
    marker hits at all."""
    scores = [(_hits(F.col(text_col), ws)).alias(f"__s_{lg}") for lg, ws in _LANG_MARKERS.items()]
    tmp = df.select("*", *scores)
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"__s_{lg}") for lg in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lg in langs:
        pred = pred.when(F.col(f"__s_{lg}") == best, F.lit(lg))
    return tmp.withColumn(out_col, pred).drop(*[f"__s_{lg}" for lg in langs])


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish sub-token estimate (words + punctuation
    runs + ~1 token per 4 chars of long words)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    ws = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(ws)
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^!-/:-@\\\[-`{-~]", ""))
    bpe_ish = (F.length(F.col(text_col)) / F.lit(4.0)).cast("long") + punct
    return df.withColumn("n_tokens_ws", ws.cast("long")).withColumn(
        "n_tokens_bpe", F.greatest(ws.cast("long"), bpe_ish)
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score from length, punctuation ratio, stopword
    ratio, and mean word length — the standard cheap pre-filter stack."""
    # The stopword filter is a Catalyst higher-order function — interpreted,
    # not codegen'd — at ~60+ us/doc, so a narrow input (single-row-group
    # file => one scan task) serializes the whole op on one core. Widen
    # first (no-op on already-parallel inputs; per-row expressions, so the
    # result is partitioning-invariant).
    from pitfeat.ops.util import widen_partitions

    df = widen_partitions(df)
    length = F.length(F.col(text_col))
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    n_tok = F.greatest(F.size(toks), F.lit(1))
    stop_arr = F.array(*[F.lit(w) for ws in _LANG_MARKERS.values() for w in ws])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / n_tok
    punct_ratio = F.length(F.regexp_replace(F.col(text_col), r"[^!-/:-@\\\[-`{-~]", "")) / F.greatest(length, F.lit(1))
    mean_wlen = length / n_tok
    len_score = F.least(length / F.lit(500.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))
    stop_score = F.least(stop_ratio * 4.0, F.lit(1.0))
    wlen_score = F.when((mean_wlen >= 3) & (mean_wlen <= 10), 1.0).otherwise(0.3)
    return (
        df.withColumn("q_len", len_score.cast("double"))
        .withColumn("q_punct", punct_score.cast("double"))
        .withColumn("q_stop", stop_score.cast("double"))
        .withColumn("q_wlen", wlen_score.cast("double"))
        .withColumn(
            "quality",
            ((len_score + punct_score + stop_score + wlen_score) / 4.0).cast("double"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp64") -> DataFrame:
    """Order-sensitive document fingerprint over the whitespace-normalized,
    lowercased text: ``out_col`` (64-bit xxhash64, fine for CANDIDATE
    buckets) plus ``{out_col}b`` (a second, independently-seeded hash).

    Identity decisions must key on BOTH columns: a single 64-bit key expects
    n^2/2^65 collisions — ≈2.7x10^4 silently-merged distinct docs at n=10^12;
    the 128-bit pair expects ≈1.5x10^-15 (zero for any physical corpus)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    # lit FIRST: xxhash64 folds left-to-right with the running hash as seed,
    # so lit-last would make this column a pure function of out_col (collides
    # exactly when it does); lit-first = a genuinely different fixed seed
    return df.withColumn(out_col, F.xxhash64(norm)).withColumn(
        f"{out_col}b", F.xxhash64(F.lit(0x9E3779B9).cast("long"), norm)
    )
