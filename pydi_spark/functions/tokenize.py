"""Tokenization as native Column expressions.

Reference strategies {char, word, ngram_2, ngram_3, callable}
(PyDI/utils/similarity_registry.py:120-125,173-224). All JVM-side:
``split`` for words, ``sequence`` + ``substring`` for char n-grams —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_tokens(col: Column | str, lowercase: bool = True) -> Column:
    """Whitespace/punctuation word tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    toks = F.split(c, r"[^\p{L}\p{N}#']+")
    return F.filter(toks, lambda x: x != F.lit(""))


def char_tokens(col: Column | str, lowercase: bool = True) -> Column:
    """Single characters as tokens."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.split(c, "")


def char_ngrams(col: Column | str, n: int = 3, lowercase: bool = True) -> Column:
    """Character n-grams via sequence+substring (pure expression, codegen'd).

    Strings shorter than ``n`` yield the whole string as a single gram
    (so similarity on short strings is defined, matching common practice).
    """
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    length = F.length(c)
    return F.when(length <= n, F.array(c)).otherwise(
        F.transform(
            F.sequence(F.lit(1), length - F.lit(n - 1)),
            lambda i: c.substr(i, F.lit(n)),
        )
    )


def tokens_for(col: Column | str, tokenization: str, ngram_size: int = 3) -> Column:
    """Dispatch on the reference's tokenization names."""
    if tokenization == "word":
        return word_tokens(col)
    if tokenization == "char":
        return char_tokens(col)
    if tokenization == "ngram_2":
        return char_ngrams(col, 2)
    if tokenization == "ngram_3":
        return char_ngrams(col, 3)
    if tokenization == "ngram":
        return char_ngrams(col, ngram_size)
    raise ValueError(f"unknown tokenization: {tokenization}")
