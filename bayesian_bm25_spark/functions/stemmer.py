"""Pure-Python Porter stemmer (Porter 1980) + Arrow-batched token UDF.

The reference's published BEIR quality numbers use a stemming tokenizer
(reference benchmarks/hybrid_beir.py:288-296, Snowball English); this
module provides the dependency-free classic Porter algorithm behind an
opt-in flag so those experiments are reproducible in principle.  NOTE:
Porter1 and Snowball (Porter2) differ on a small fraction of words —
exact-number reproduction needs Snowball; the pipeline shape (stem at
index AND query time with the same flag) is what matters here.

The stemmer is pure string logic; the Spark stage is an Arrow pandas UDF
over the token array with a per-batch memo (Zipf token distribution →
the memo hit-rate is ~99%, so per-batch work is ~|distinct tokens|).

NOTE: no ``from __future__ import annotations`` here — pyspark resolves
pandas_udf type hints at decoration time and stringified annotations
break that resolution (see functions/pudfs.py).
"""

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in the stem ([C](VC)^m[V])."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        if _is_cons(stem, i):
            if prev_vowel:
                m += 1
            prev_vowel = False
        else:
            prev_vowel = True
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If word ends with suffix and measure(stem) > min_m, replace."""
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return word  # suffix matched but condition failed: rule consumed


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Stem one lowercase word with the classic Porter algorithm."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w = w + "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suffix, repl in _STEP2:
        out = _replace(w, suffix, repl, 0)
        if out is not None:
            w = out
            break

    # Step 3
    for suffix, repl in _STEP3:
        out = _replace(w, suffix, repl, 0)
        if out is not None:
            w = out
            break

    # Step 4
    for suffix in _STEP4:
        if w.endswith(suffix):
            stem = w[: len(w) - len(suffix)]
            if suffix == "ion":
                if stem and stem[-1] in "st" and _measure(stem) > 1:
                    w = stem
            elif _measure(stem) > 1:
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def stem_tokens_udf(algorithm: str = "porter"):
    """pandas UDF: array<string> tokens → array<string> stems, memoized
    per batch (Zipf distribution → near-total hit rate).

    ``algorithm``: "porter" (classic 1980) or "porter2"/"snowball"
    (Snowball English — the reference's BEIR-baseline stemmer)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    stem_fn = resolve_stemmer(algorithm)

    @pandas_udf("array<string>")
    def stem_arr(tokens: pd.Series) -> pd.Series:
        memo: dict[str, str] = {}

        def one(toks):
            out = []
            for t in toks:
                s = memo.get(t)
                if s is None:
                    s = stem_fn(t)
                    memo[t] = s
                out.append(s)
            return out

        return tokens.map(one)

    return stem_arr


def resolve_stemmer(algorithm: str):
    """Name → stem function ('porter' | 'porter2' | 'snowball')."""
    try:
        return {
            "porter": porter_stem,
            "porter2": porter2_stem,
            "snowball": porter2_stem,
        }[algorithm]
    except KeyError:
        raise ValueError(
            f"unknown stemmer {algorithm!r} "
            "(supported: 'porter', 'porter2'/'snowball')"
        ) from None


def stem_terms(queries, col: str = "terms", algorithm: str = "porter"):
    """Stem a query DataFrame's token-array column — apply whenever the
    index was built with the same stemmer flag."""
    from pyspark.sql import functions as F

    return queries.withColumn(col, stem_tokens_udf(algorithm)(F.col(col)))


# ---------------------------------------------------------------------
# Porter2 (Snowball English) — snowballstem.org/algorithms/english/
# ---------------------------------------------------------------------
# Dependency-free implementation of the published spec.  This is the
# stemmer behind the reference's BEIR quality baselines (reference
# benchmarks/hybrid_beir.py:288-296 uses Snowball English), so quality
# numbers are reproducible with IndexConfig(stemmer="porter2").

_V2 = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXC2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)

_STEP2_SUFFIXES = [
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"),
]

_STEP3_SUFFIXES = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ful", ""), ("ness", ""),
]

_STEP4_SUFFIXES = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic",
]


def _is_v2(word: str, i: int) -> bool:
    return word[i] in "aeiouy"  # Y (marked consonant) is uppercase


def _r1_start(word: str) -> int:
    """R1 = region after the first non-vowel following a vowel; words
    beginning gener-/commun-/arsen- pin R1 to the prefix end."""
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            return len(pre)
    for i in range(len(word) - 1):
        if _is_v2(word, i) and not _is_v2(word, i + 1):
            return i + 2
    return len(word)


def _r_start_from(word: str, start: int) -> int:
    for i in range(start, len(word) - 1):
        if _is_v2(word, i) and not _is_v2(word, i + 1):
            return i + 2
    return len(word)


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return _is_v2(word, 0) and not _is_v2(word, 1)
    if n >= 3:
        # non-vowel, vowel, non-vowel (not w/x/Y)
        return (
            not _is_v2(word, n - 3)
            and _is_v2(word, n - 2)
            and not _is_v2(word, n - 1)
            and word[n - 1] not in "wxY"
        )
    return False


def porter2_stem(word: str) -> str:
    w = word
    if w.startswith("'"):
        w = w[1:]
    if len(w) <= 2:
        return w
    if w in _EXC1:
        return _EXC1[w]
    # mark consonant-y: initial y, or y after a vowel — sequential
    # left-to-right so a just-marked Y counts as a consonant for the
    # next letter
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in "aeiouy":
            chars[i] = "Y"
    w = "".join(chars)
    r1 = _r1_start(w)
    r2 = _r_start_from(w, r1)

    # Step 0: 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith("s") and not w.endswith("us") and not w.endswith("ss"):
        # delete if the preceding part has a vowel NOT immediately
        # before the s
        if any(_is_v2(w, i) for i in range(len(w) - 2)):
            w = w[:-1]

    if w in _EXC2:
        return w

    # Step 1b
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + "ee"
            break
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(_is_v2(stem, i) for i in range(len(stem))):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w = w + "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif _ends_short_syllable(w) and r1 >= len(w):
                        w = w + "e"
                break

    # Step 1c: y/Y → i after a non-vowel that isn't the first letter
    if (
        len(w) > 2
        and w[-1] in "yY"
        and not _is_v2(w, len(w) - 2)
    ):
        w = w[:-1] + "i"

    # Step 2 (longest suffix, in R1)
    for suf, repl in _STEP2_SUFFIXES:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + repl
            break
    else:
        if w.endswith("ogi"):
            if len(w) - 3 >= r1 and len(w) >= 4 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if len(w) - 2 >= r1 and len(w) >= 3 and w[-3] in _LI_ENDING:
                w = w[:-2]

    # Step 3 (longest suffix, in R1)
    for suf, repl in _STEP3_SUFFIXES:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + repl
            break
    else:
        if w.endswith("ative") and len(w) - 5 >= r2:
            w = w[:-5]

    # Step 4 (longest suffix, in R2)
    for suf in _STEP4_SUFFIXES:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) - 3 >= r2 and len(w) >= 4 and w[-4] in "st":
            w = w[:-3]

    # Step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")
