"""Similarity registry: native Column expressions first, pandas UDF fallback.

Mirrors the reference's two-tier design (SimilarityRegistry wrapping 27
textdistance metrics, PyDI/utils/similarity_registry.py:27-125; callables
accepted everywhere). Here:

- **Native tier** compiles to JVM expressions inside whole-stage codegen:
  levenshtein (built-in), jaccard/dice/overlap/cosine as array-set algebra
  over token arrays, prefix/postfix/length/identity as string exprs.
  These are the hot path at 100 TB — no Python, no serialization.
- **Fallback tier** wraps the pure-Python metrics (metrics_py.REGISTRY) in
  an Arrow-batched pandas UDF — parity for exotic metrics (gotoh, editex,
  monge_elkan, ...). ~10-100x faster than row-at-a-time UDFs, still slower
  than native; the registry picks native automatically when available.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from pydi_spark.functions import metrics_py
from pydi_spark.functions.tokenize import tokens_for

PY_METRICS = metrics_py.REGISTRY

# ----------------------------------------------------------- native builders


def _both_empty_guard(a: Column, b: Column, expr: Column) -> Column:
    """textdistance convention: two empty strings are identical (sim=1)."""
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
        .when((F.length(a) == 0) & (F.length(b) == 0), F.lit(1.0))
        .otherwise(expr)
    )


def _native_levenshtein(a: Column, b: Column) -> Column:
    m = F.greatest(F.length(a), F.length(b))
    return _both_empty_guard(
        a, b, F.lit(1.0) - F.levenshtein(a, b).cast("double") / m
    )


def _set_sizes(a: Column, b: Column, tokenization: str):
    ta = F.array_distinct(tokens_for(a, tokenization))
    tb = F.array_distinct(tokens_for(b, tokenization))
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    na = F.size(ta).cast("double")
    nb = F.size(tb).cast("double")
    return inter, na, nb


def _guard_tokens(na: Column, nb: Column, expr: Column) -> Column:
    return (
        F.when((na == 0) & (nb == 0), F.lit(1.0))
        .when((na == 0) | (nb == 0), F.lit(0.0))
        .otherwise(expr)
    )


def _native_jaccard(a: Column, b: Column, tokenization: str = "word") -> Column:
    inter, na, nb = _set_sizes(a, b, tokenization)
    return _both_empty_guard(
        a, b, _guard_tokens(na, nb, inter / (na + nb - inter))
    )


def _native_dice(a: Column, b: Column, tokenization: str = "word") -> Column:
    inter, na, nb = _set_sizes(a, b, tokenization)
    return _both_empty_guard(a, b, _guard_tokens(na, nb, F.lit(2.0) * inter / (na + nb)))


def _native_overlap(a: Column, b: Column, tokenization: str = "word") -> Column:
    inter, na, nb = _set_sizes(a, b, tokenization)
    return _both_empty_guard(a, b, _guard_tokens(na, nb, inter / F.least(na, nb)))


def _native_set_cosine(a: Column, b: Column, tokenization: str = "word") -> Column:
    inter, na, nb = _set_sizes(a, b, tokenization)
    return _both_empty_guard(a, b, _guard_tokens(na, nb, inter / F.sqrt(na * nb)))


def _native_prefix(a: Column, b: Column) -> Column:
    # case-sensitive, matching metrics_py.prefix and textdistance.prefix
    la, lb = a, b
    minlen = F.least(F.length(la), F.length(lb))
    # longest common prefix length via aggregate over positions
    eq = F.transform(
        F.sequence(F.lit(1), F.greatest(minlen, F.lit(1))),
        lambda i: (la.substr(i, F.lit(1)) == lb.substr(i, F.lit(1))).cast("int"),
    )
    # stop at first mismatch: cumulative product trick
    lcp = F.aggregate(
        eq,
        F.struct(F.lit(1).alias("alive"), F.lit(0).alias("n")),
        lambda acc, x: F.struct(
            (acc["alive"] * x).alias("alive"), (acc["n"] + acc["alive"] * x).alias("n")
        ),
        lambda acc: acc["n"],
    )
    return _both_empty_guard(
        a, b,
        F.when(minlen == 0, F.lit(0.0)).otherwise(lcp.cast("double") / minlen),
    )


def _native_postfix(a: Column, b: Column) -> Column:
    return _native_prefix(F.reverse(a), F.reverse(b))


def _native_length(a: Column, b: Column) -> Column:
    m = F.greatest(F.length(a), F.length(b))
    return _both_empty_guard(
        a, b, F.least(F.length(a), F.length(b)).cast("double") / m
    )


def _native_identity(a: Column, b: Column) -> Column:
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")).otherwise(
        (a == b).cast("double")
    )


NATIVE_METRICS: dict[str, Callable[..., Column]] = {
    "levenshtein": _native_levenshtein,
    "jaccard": _native_jaccard,
    "tanimoto": _native_jaccard,
    "sorensen_dice": _native_dice,
    "overlap": _native_overlap,
    "cosine": _native_set_cosine,
    "prefix": _native_prefix,
    "postfix": _native_postfix,
    "length": _native_length,
    "identity": _native_identity,
}

_TOKEN_METRICS = {"jaccard", "tanimoto", "sorensen_dice", "overlap", "cosine",
                  "tversky", "monge_elkan", "bag"}


# ------------------------------------------------------------- fallback tier

def _pandas_udf_metric(name: str) -> Callable[[Column, Column], Column]:
    fn = PY_METRICS[name]

    @F.pandas_udf(DoubleType())
    def _sim(a: pd.Series, b: pd.Series) -> pd.Series:
        def one(x, y):
            if x is None or y is None:
                return None
            return fn(str(x), str(y))

        return pd.Series([one(x, y) for x, y in zip(a, b)], dtype="float64")

    return _sim


def similarity(
    name_or_fn: str | Callable[[str, str], float],
    left: Column | str,
    right: Column | str,
    tokenization: str | None = None,
    force_python: bool = False,
) -> Column:
    """Similarity column for a named metric or arbitrary Python callable.

    Named built-ins use the native expression tier when available (unless
    ``force_python`` asks for exact textdistance-parity semantics);
    callables always go through the pandas-UDF tier.
    """
    a = F.col(left) if isinstance(left, str) else left
    b = F.col(right) if isinstance(right, str) else right

    if callable(name_or_fn) and not isinstance(name_or_fn, str):
        fn = name_or_fn

        @F.pandas_udf(DoubleType())
        def _custom(s1: pd.Series, s2: pd.Series) -> pd.Series:
            return pd.Series(
                [None if x is None or y is None else float(fn(str(x), str(y)))
                 for x, y in zip(s1, s2)],
                dtype="float64",
            )

        return _custom(a, b)

    name = name_or_fn
    if not force_python and name in NATIVE_METRICS:
        if name in _TOKEN_METRICS:
            return NATIVE_METRICS[name](a, b, tokenization or "word")
        return NATIVE_METRICS[name](a, b)
    if name in PY_METRICS:
        return _pandas_udf_metric(name)(a, b)
    raise ValueError(f"unknown similarity metric: {name}")


def best_match_similarity(
    name_or_fn: str | Callable[[str, str], float],
    left: Column | str,
    right: Column | str,
    tokenization: str | None = None,
) -> Column:
    """Max pairwise similarity between two ``array<string>`` columns.

    Native metrics compose inside nested ``transform`` lambdas (JVM-side);
    Python-tier metrics and callables route through ONE Arrow-batched
    pandas UDF over both arrays (a pandas UDF cannot be embedded in a
    ``transform`` lambda — Spark rejects it at analysis time).
    """
    a = F.col(left) if isinstance(left, str) else left
    b = F.col(right) if isinstance(right, str) else right
    if isinstance(name_or_fn, str) and name_or_fn in NATIVE_METRICS:
        pair_sims = F.flatten(
            F.transform(
                a,
                lambda x: F.transform(
                    b, lambda y: similarity(name_or_fn, x, y, tokenization)
                ),
            )
        )
        return F.array_max(pair_sims)
    if callable(name_or_fn) and not isinstance(name_or_fn, str):
        fn = name_or_fn
    elif name_or_fn in PY_METRICS:
        fn = PY_METRICS[name_or_fn]
    else:
        raise ValueError(f"unknown similarity metric: {name_or_fn}")

    @F.pandas_udf(DoubleType())
    def _best(s1: pd.Series, s2: pd.Series) -> pd.Series:
        out = []
        for xs, ys in zip(s1, s2):
            if xs is None or ys is None:
                out.append(None)
                continue
            best = None
            for x in xs:
                if x is None:
                    continue
                for y in ys:
                    if y is None:
                        continue
                    v = float(fn(str(x), str(y)))
                    if best is None or v > best:
                        best = v
            out.append(best)
        return pd.Series(out, dtype="float64")

    return _best(a, b)


def token_similarity(
    name: str, left_tokens: Column, right_tokens: Column
) -> Column:
    """Set similarity directly over pre-tokenized ArrayType columns."""
    ta = F.array_distinct(left_tokens)
    tb = F.array_distinct(right_tokens)
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    na, nb = F.size(ta).cast("double"), F.size(tb).cast("double")
    if name in ("jaccard", "tanimoto"):
        expr = inter / (na + nb - inter)
    elif name == "sorensen_dice":
        expr = F.lit(2.0) * inter / (na + nb)
    elif name == "overlap":
        expr = inter / F.least(na, nb)
    elif name == "cosine":
        expr = inter / F.sqrt(na * nb)
    else:
        raise ValueError(f"not a token set metric: {name}")
    return _guard_tokens(na, nb, expr)


def list_metrics() -> dict[str, str]:
    """name -> tier ('native' | 'python')."""
    out = {n: "python" for n in PY_METRICS}
    out.update({n: "native" for n in NATIVE_METRICS})
    return out
