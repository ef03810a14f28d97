"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Column math (JVM codegen) — these run inside the ingest scan at
full I/O speed; none require Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bayesian_bm25_spark.functions import columns as C

# small per-language stopword profiles (n-gram-free heuristic language ID)
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "on", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "des"],
}


def _ratio_for(tokens: F.Column, words: list[str]) -> F.Column:
    sw = F.array(*[F.lit(w) for w in words])
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(tokens), F.lit(1)).cast("double")


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """+lang_pred, +lang_score: argmax stopword-profile ratio, 'und' when
    no profile fires."""
    tokens = C.tokenize(F.col(text_col))
    out = docs.withColumn("_toks", tokens)
    for lang, words in STOPWORDS.items():
        out = out.withColumn(f"_r_{lang}", _ratio_for(F.col("_toks"), words))
    pairs = F.array(
        *[F.struct(F.col(f"_r_{lg}").alias("score"), F.lit(lg).alias("lang")) for lg in STOPWORDS]
    )
    best = F.array_max(pairs)
    out = (
        out.withColumn("lang_score", best["score"])
        .withColumn(
            "lang_pred", F.when(best["score"] > 0.0, best["lang"]).otherwise(F.lit("und"))
        )
    )
    return out.drop("_toks", *[f"_r_{lg}" for lg in STOPWORDS])


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """+n_tokens, +n_distinct, +ttr, +avg_token_len, +punct_ratio,
    +digit_ratio, +quality_score ∈ [0,1].

    The score is a smooth heuristic: length band (prefer 20..2000
    tokens), lexical diversity, and low punctuation/digit noise —
    the standard pretraining-corpus quality gates."""
    tokens = C.tokenize(F.col(text_col))
    text = F.col(text_col)
    n_tok = F.size(tokens).cast("double")
    n_dist = F.size(F.array_distinct(tokens)).cast("double")
    n_chars = F.length(text).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^\.,;:!\?\"'()\[\]{}]", "")).cast("double")
    digits = F.length(F.regexp_replace(text, r"[^0-9]", "")).cast("double")
    ttr = n_dist / F.greatest(n_tok, F.lit(1.0))
    avg_len = (n_chars - (n_tok - 1)) / F.greatest(n_tok, F.lit(1.0))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    digit_ratio = digits / F.greatest(n_chars, F.lit(1.0))
    length_band = F.least(n_tok / 20.0, F.lit(1.0)) * F.least(F.lit(2000.0) / F.greatest(n_tok, F.lit(1.0)), F.lit(1.0))
    score = (
        0.4 * length_band
        + 0.3 * F.least(ttr * 2.0, F.lit(1.0))
        + 0.2 * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0)))
        + 0.1 * (1.0 - F.least(digit_ratio * 5.0, F.lit(1.0)))
    )
    return (
        docs.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("n_distinct", n_dist.cast("long"))
        .withColumn("ttr", ttr)
        .withColumn("avg_token_len", avg_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("digit_ratio", digit_ratio)
        .withColumn("quality_score", score)
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """+ws_tokens (whitespace) and +bpe_est (BPE-ish estimate from a
    word/number/punct regex split — the usual ~chars/4 proxy refined by
    token class)."""
    tokens = C.tokenize(F.col(text_col))
    pieces = F.filter(
        F.split(F.lower(F.col(text_col)), r"([^\w]|_)+"), lambda t: F.length(t) > 0
    )
    # BPE-ish: each word contributes ceil(len/4) subword units
    bpe = F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, wrd: acc + F.ceil(F.length(wrd) / 4.0).cast("int"),
    )
    return docs.withColumn("ws_tokens", F.size(tokens).cast("long")).withColumn(
        "bpe_est", bpe.cast("long")
    )


def fingerprint(docs: DataFrame, text_col: str = "text",
                prefix_chars: int = 64) -> DataFrame:
    """+fp: deterministic rolling-style fingerprint — md5 over the
    normalized text prefix, plus a 64-bit integer form for joins."""
    norm = F.concat_ws(" ", C.tokenize(F.col(text_col)))
    fp_hex = F.md5(F.substring(norm, 1, prefix_chars))
    fp64 = F.conv(F.substring(fp_hex, 1, 15), 16, 10).cast("long")
    return docs.withColumn("fp", fp_hex).withColumn("fp64", fp64)
