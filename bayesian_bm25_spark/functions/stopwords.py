"""English stopword filtering for the BEIR-protocol tokenizer.

The reference's published quality numbers tokenize with
``bm25s.tokenize(..., stemmer=<Snowball>, stopwords="english")``
(reference benchmarks/hybrid_beir.py:288-296): tokens are lowercased,
stopwords removed on the UNSTEMMED surface form, and the survivors
stemmed.  bm25s's ``STOPWORDS_EN`` is the standard NLTK-derived English
list reproduced below (public domain word list; bm25s ships it
verbatim) — dependency-free here, since neither bm25s nor nltk is in
the container.

Filtering is a JVM-side higher-order ``filter(tokens, t -> NOT
t IN (...))`` — no Python in the hot path, duplicates among surviving
tokens preserved (``array_except`` would dedup and corrupt tf).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS_EN: tuple[str, ...] = (
    "a", "about", "above", "after", "again", "against", "all", "am", "an",
    "and", "any", "are", "as", "at", "be", "because", "been", "before",
    "being", "below", "between", "both", "but", "by", "can", "did", "do",
    "does", "doing", "don", "down", "during", "each", "few", "for", "from",
    "further", "had", "has", "have", "having", "he", "her", "here", "hers",
    "herself", "him", "himself", "his", "how", "i", "if", "in", "into",
    "is", "it", "its", "itself", "just", "me", "more", "most", "my",
    "myself", "no", "nor", "not", "now", "of", "off", "on", "once", "only",
    "or", "other", "our", "ours", "ourselves", "out", "over", "own", "s",
    "same", "she", "should", "so", "some", "such", "t", "than", "that",
    "the", "their", "theirs", "them", "themselves", "then", "there",
    "these", "they", "this", "those", "through", "to", "too", "under",
    "until", "up", "very", "was", "we", "were", "what", "when", "where",
    "which", "while", "who", "whom", "why", "will", "with", "you", "your",
    "yours", "yourself", "yourselves",
)

_SETS: dict[str, frozenset[str]] = {"english": frozenset(STOPWORDS_EN)}


def resolve_stopwords(stopwords: str | list[str] | tuple[str, ...] | None) -> frozenset[str] | None:
    """Named set ("english") or an explicit word list; None → no filter."""
    if stopwords is None:
        return None
    if isinstance(stopwords, str):
        try:
            return _SETS[stopwords]
        except KeyError:
            raise ValueError(
                f"unknown stopword set {stopwords!r} (have: {sorted(_SETS)}); "
                "pass an explicit list for other languages"
            ) from None
    return frozenset(stopwords)


def remove_stopwords(tokens: Column, stopwords: str | list[str] | tuple[str, ...] | None) -> Column:
    """Filter a token-array Column; surviving duplicates are preserved."""
    words = resolve_stopwords(stopwords)
    if not words:
        return tokens
    return F.filter(tokens, lambda t: ~t.isin(*sorted(words)))


def filter_tokens_driver(tokens: list[str], stopwords: str | list[str] | tuple[str, ...] | None) -> list[str]:
    """Driver-side twin of ``remove_stopwords`` for facade query lists."""
    words = resolve_stopwords(stopwords)
    if not words:
        return list(tokens)
    return [t for t in tokens if t not in words]
