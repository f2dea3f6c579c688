"""Phonetic keys (Soundex) as portable, codegen'd SQL expressions.

Phonetic blocking is a data-integration staple the reference leaves to
its string-similarity tier (PyDI/utils/similarity_registry.py groups
textdistance's phonetic class but never wires a blocker). Spark ships a
JVM ``soundex()``, but its edge-case behavior (H/W rule, non-ASCII) is
not reproducible in DuckDB SQL — so this module *builds the classic US
Census Soundex out of portable scalar functions* (upper / translate /
regexp_replace / substr / replace / rpad) and emits the SAME expression
text for Spark SQL and DuckDB (only the regexp_replace global-flag
spelling differs). One builder feeds both engines: the operator and its
oracle cannot drift.

Algorithm (standard Soundex with the H/W collapse rule):
1. strip non-letters, uppercase;
2. code every letter: AEIOUY->0 (separators), BFPV->1, CGJKQSXZ->2,
   DT->3, L->4, MN->5, R->6; H/W deleted in the tail (they do NOT
   separate duplicate codes) but the head letter maps to sentinel 9;
3. collapse runs of each digit (RE2-safe ``d+`` per digit — no
   backreferences), drop the head's digit, strip the 0 separators;
4. first letter + first 3 digits, right-padded with 0.

Everything is whole-stage-codegen scalar work — no UDF, no shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pydi_spark.blocking.standard import StandardBlocker
from pydi_spark.core.dataset import Dataset

_FROM = "AEIOUYBFPVCGJKQSXZDTLMNRHW"
_TO_HEAD = "00000011112222222233455699"  # head H/W -> sentinel 9 (dropped later)
_TO_TAIL = "000000111122222222334556"  # tail H/W deleted (the collapse rule)


def _rr(dialect: str, s: str, pat: str, rep: str) -> str:
    """regexp_replace-all in either dialect (DuckDB needs the 'g' flag)."""
    if dialect == "duckdb":
        return f"regexp_replace({s}, '{pat}', '{rep}', 'g')"
    return f"regexp_replace({s}, '{pat}', '{rep}')"


def soundex_sql(col: str, dialect: str = "spark") -> str:
    """Soundex of ``col`` as an SQL expression string for ``dialect``
    (``spark`` | ``duckdb``). Null / letter-free input yields NULL."""
    cast_t = "STRING" if dialect == "spark" else "VARCHAR"
    s0 = f"upper({_rr(dialect, f'CAST({col} AS {cast_t})', '[^A-Za-z]', '')})"
    head = f"translate(substr({s0}, 1, 1), '{_FROM}', '{_TO_HEAD}')"
    tail = f"translate(substr({s0}, 2), '{_FROM}', '{_TO_TAIL}')"
    digits = f"concat({head}, {tail})"
    for d in "0123456":  # 9 occurs at most once (tail deletes H/W)
        digits = _rr(dialect, digits, f"{d}+", d)
    body = f"replace(substr({digits}, 2), '0', '')"
    code = f"concat(substr({s0}, 1, 1), rpad(substr({body}, 1, 3), 3, '0'))"
    return f"(CASE WHEN length({s0}) >= 1 THEN {code} END)"


def soundex_key(col: str) -> Column:
    """Soundex as a Spark Column (same expression text as the oracle)."""
    return F.expr(soundex_sql(col, "spark"))


@dataclass
class PhoneticBlocker:
    """Equi-block on the Soundex of ``column`` (optionally of its first
    token only — surnames vs full strings). Delegates pair generation,
    dedup, and the skew cap to StandardBlocker."""

    column: str
    first_token_only: bool = False
    max_block_size: int | None = None

    def _with_key(self, df: DataFrame) -> DataFrame:
        src = F.col(self.column)
        if self.first_token_only:
            src = F.split(F.trim(src), r"\s+").getItem(0)
        return df.withColumn("_phonetic", soundex_key_from(src))

    def block(
        self,
        left: Dataset | DataFrame,
        right: Dataset | DataFrame | None = None,
        id_column: str | None = None,
    ) -> DataFrame:
        from pydi_spark.blocking.base import resolve_side

        dl, idl = resolve_side(left, id_column)
        # repartition_probe: Soundex collapses any vocabulary onto few
        # fat codes, so pair emission needs explicit probe width (the
        # quadratic join output inherits the probe's partitioning)
        inner = StandardBlocker(
            on=["_phonetic"], max_block_size=self.max_block_size,
            repartition_probe=True,
        )
        if right is None:
            return inner.block(
                Dataset.wrap(self._with_key(dl), "l", id_column=idl)
            )
        dr, idr = resolve_side(right, id_column)
        return inner.block(
            Dataset.wrap(self._with_key(dl), "l", id_column=idl),
            Dataset.wrap(self._with_key(dr), "r", id_column=idr),
        )


def soundex_key_from(col: Column) -> Column:
    """Soundex of an arbitrary Column expression (Column-input variant;
    routes through the same builder via a temp projection trick)."""
    # Column objects have no stable SQL text; re-express the builder
    # with Column ops 1:1 (kept in lockstep with soundex_sql — the
    # property test pins equality between the two paths).
    s0 = F.upper(F.regexp_replace(col.cast("string"), "[^A-Za-z]", ""))
    head = F.translate(F.substring(s0, 1, 1), _FROM, _TO_HEAD)
    tail = F.translate(s0.substr(F.lit(2), F.length(s0)), _FROM, _TO_TAIL)
    digits = F.concat(head, tail)
    for d in "0123456":
        digits = F.regexp_replace(digits, f"{d}+", d)
    body = F.regexp_replace(digits.substr(F.lit(2), F.length(digits)), "0", "")
    code = F.concat(
        F.substring(s0, 1, 1), F.rpad(F.substring(body, 1, 3), 3, "0")
    )
    return F.when(F.length(s0) >= 1, code)
