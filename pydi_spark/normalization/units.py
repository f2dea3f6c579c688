"""Unit system: a broadcast dimension table + conversion expressions.

Reference: PyDI/normalization/units.py — 18 UnitCategories (:22-42),
quantity modifiers hundred..quadrillion (:45-56), a 500+ unit registry
with base-conversion factors (:105-345), QuantityParser (:347-425),
UnitNormalizer with per-category targets (:527-650), header unit
extraction "Speed (km/h)" (:653-726).

Spark shape (SURVEY §2.9): ``regexp_extract`` the (number, modifier,
unit) parts, broadcast-join a units dimension table
[alias, category, factor, base_unit], multiply. Temperature is affine —
special-cased expression. The dimension table is data, not code: easy to
extend and the join broadcasts for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (alias, category, factor_to_base, base_unit); affine units handled below
UNITS_TABLE: list[tuple[str, str, float, str]] = [
    # length -> m
    ("mm", "length", 0.001, "m"), ("cm", "length", 0.01, "m"),
    ("m", "length", 1.0, "m"), ("km", "length", 1000.0, "m"),
    ("in", "length", 0.0254, "m"), ("inch", "length", 0.0254, "m"),
    ("ft", "length", 0.3048, "m"), ("feet", "length", 0.3048, "m"),
    ("yd", "length", 0.9144, "m"), ("mi", "length", 1609.344, "m"),
    ("mile", "length", 1609.344, "m"), ("miles", "length", 1609.344, "m"),
    # mass -> kg
    ("mg", "mass", 1e-6, "kg"), ("g", "mass", 0.001, "kg"),
    ("kg", "mass", 1.0, "kg"), ("t", "mass", 1000.0, "kg"),
    ("lb", "mass", 0.45359237, "kg"), ("lbs", "mass", 0.45359237, "kg"),
    ("oz", "mass", 0.028349523125, "kg"),
    # volume -> l
    ("ml", "volume", 0.001, "l"), ("cl", "volume", 0.01, "l"),
    ("l", "volume", 1.0, "l"), ("gal", "volume", 3.785411784, "l"),
    # time -> s
    ("ms", "time", 0.001, "s"), ("s", "time", 1.0, "s"),
    ("sec", "time", 1.0, "s"), ("min", "time", 60.0, "s"),
    ("h", "time", 3600.0, "s"), ("hr", "time", 3600.0, "s"),
    ("d", "time", 86400.0, "s"), ("day", "time", 86400.0, "s"),
    # speed -> m/s
    ("m/s", "speed", 1.0, "m/s"), ("km/h", "speed", 1 / 3.6, "m/s"),
    ("kmh", "speed", 1 / 3.6, "m/s"), ("mph", "speed", 0.44704, "m/s"),
    ("kn", "speed", 0.514444, "m/s"),
    # data -> b
    ("b", "data", 1.0, "b"), ("kb", "data", 1e3, "b"),
    ("mb", "data", 1e6, "b"), ("gb", "data", 1e9, "b"),
    ("tb", "data", 1e12, "b"), ("kib", "data", 1024.0, "b"),
    ("mib", "data", 1048576.0, "b"), ("gib", "data", 1073741824.0, "b"),
    # frequency -> hz
    ("hz", "frequency", 1.0, "hz"), ("khz", "frequency", 1e3, "hz"),
    ("mhz", "frequency", 1e6, "hz"), ("ghz", "frequency", 1e9, "hz"),
    # power -> w
    ("w", "power", 1.0, "w"), ("kw", "power", 1e3, "w"),
    ("mw", "power", 1e6, "w"), ("hp", "power", 745.699872, "w"),
    # area -> m2
    ("m2", "area", 1.0, "m2"), ("km2", "area", 1e6, "m2"),
    ("ha", "area", 1e4, "m2"), ("acre", "area", 4046.8564224, "m2"),
    ("sqft", "area", 0.09290304, "m2"),
    # temperature (affine; factor unused)
    ("°c", "temperature", 1.0, "°c"), ("c", "temperature", 1.0, "°c"),
    ("celsius", "temperature", 1.0, "°c"),
    ("°f", "temperature", 1.0, "°c"), ("f", "temperature", 1.0, "°c"),
    ("fahrenheit", "temperature", 1.0, "°c"),
    ("k", "temperature", 1.0, "°c"), ("kelvin", "temperature", 1.0, "°c"),
    # currency-ish magnitudes excluded (not physical units)
]

QUANTITY_MODIFIERS: dict[str, float] = {
    "hundred": 1e2, "thousand": 1e3, "k": 1e3, "million": 1e6, "m": 1e6,
    "mio": 1e6, "billion": 1e9, "bn": 1e9, "b": 1e9, "trillion": 1e12,
    "quadrillion": 1e15,
}

_NUM = r"([+-]?[0-9]+(?:[.,][0-9]+)?)"
_MOD = r"\s*(hundred|thousand|million|billion|trillion|quadrillion|k|mio|bn)?"
_UNIT = r"\s*([a-zA-Z°/%][a-zA-Z°/0-9²³]*)?\s*$"
QUANTITY_RE = r"^\s*" + _NUM + _MOD + _UNIT


def units_dim(spark) -> DataFrame:
    return spark.createDataFrame(
        UNITS_TABLE, "alias string, category string, factor double, base_unit string"
    )


def parse_quantity_expr(col: Column | str) -> Column:
    """struct(value double, modifier string, unit string) via one regex."""
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    num = F.regexp_extract(c, QUANTITY_RE, 1)
    mod = F.lower(F.regexp_extract(c, QUANTITY_RE, 2))
    unit = F.lower(F.regexp_extract(c, QUANTITY_RE, 3))
    value = (F.regexp_replace(num, ",", ".")).try_cast("double")
    mod_factor = F.lit(1.0)
    for k, v in QUANTITY_MODIFIERS.items():
        mod_factor = F.when(mod == k, F.lit(v)).otherwise(mod_factor)
    return F.struct(
        (value * mod_factor).alias("value"),
        F.nullif(mod, F.lit("")).alias("modifier"),
        F.nullif(unit, F.lit("")).alias("unit"),
    )


def _temperature_to_c(value: Column, unit: Column) -> Column:
    return (
        F.when(unit.isin("°f", "f", "fahrenheit"), (value - 32.0) * 5.0 / 9.0)
        .when(unit.isin("k", "kelvin"), value - 273.15)
        .otherwise(value)
    )


def normalize_units(
    df: DataFrame, column: str, out_prefix: str | None = None
) -> DataFrame:
    """Adds {col}_value (base units), {col}_unit (base unit), {col}_category.

    Plan: regexp parse -> broadcast join units dim on alias -> multiply
    (affine for temperature). Unknown units keep the raw value with null
    category.
    """
    spark = df.sparkSession
    p = out_prefix or column
    parsed = df.withColumn("__q", parse_quantity_expr(column))
    dim = F.broadcast(units_dim(spark))
    joined = parsed.join(
        dim, F.col("__q.unit") == F.col("alias"), "left"
    )
    val = F.col("__q.value")
    unit = F.col("__q.unit")
    base_value = F.when(
        F.col("category") == "temperature", _temperature_to_c(val, unit)
    ).otherwise(val * F.coalesce(F.col("factor"), F.lit(1.0)))
    return (
        joined.withColumn(f"{p}_value", base_value)
        .withColumn(f"{p}_unit", F.coalesce(F.col("base_unit"), unit))
        .withColumn(f"{p}_category", F.col("category"))
        .drop("__q", "alias", "category", "factor", "base_unit")
    )


def normalize_units_expr(col: Column | str) -> Column:
    """Pure-expression variant (no join): struct(value, unit, category)
    with the units table folded into when-chains — handy inside other
    expressions; the join variant is preferred for wide use."""
    q = parse_quantity_expr(col)
    val, unit = q["value"], q["unit"]
    factor = F.lit(None).cast("double")
    category = F.lit(None).cast("string")
    base = F.lit(None).cast("string")
    for alias, cat, f, b in UNITS_TABLE:
        factor = F.when(unit == alias, F.lit(f)).otherwise(factor)
        category = F.when(unit == alias, F.lit(cat)).otherwise(category)
        base = F.when(unit == alias, F.lit(b)).otherwise(base)
    value = F.when(category == "temperature", _temperature_to_c(val, unit)).otherwise(
        val * F.coalesce(factor, F.lit(1.0))
    )
    return F.struct(value.alias("value"), F.coalesce(base, unit).alias("unit"),
                    category.alias("category"))


def _temperature_from_c(value: Column, unit: Column) -> Column:
    return (
        F.when(unit.isin("°f", "f", "fahrenheit"), value * 9.0 / 5.0 + 32.0)
        .when(unit.isin("k", "kelvin"), value + 273.15)
        .otherwise(value)
    )


def convert_units(
    df: DataFrame,
    value_col: str,
    from_unit_col: str,
    to_unit_col: str,
    out_col: str = "converted",
) -> DataFrame:
    """Direct unit-to-unit conversion (reference ``UnitConverter``,
    PyDI/normalization/units.py:483-524, and ``convert_units``
    :729-765): converts ``value_col`` from the unit named in
    ``from_unit_col`` to the unit in ``to_unit_col``, composing the
    dimension table both directions — value * factor_from / factor_to
    for linear categories, the affine °C pivot for temperature.

    Adds ``out_col`` (double; null for unknown units or a category
    mismatch) and ``{out_col}_ok`` (int 1/0). Plan: two broadcast
    joins against the ~70-row units dim — the fact side never
    shuffles, so this composes with 100 TB scans.
    """
    spark = df.sparkSession
    dim = units_dim(spark)
    f_dim = F.broadcast(
        dim.select(
            F.col("alias").alias("__f_alias"),
            F.col("category").alias("__f_cat"),
            F.col("factor").alias("__f_factor"),
        )
    )
    t_dim = F.broadcast(
        dim.select(
            F.col("alias").alias("__t_alias"),
            F.col("category").alias("__t_cat"),
            F.col("factor").alias("__t_factor"),
        )
    )
    joined = df.join(
        f_dim, F.lower(F.col(from_unit_col)) == F.col("__f_alias"), "left"
    ).join(t_dim, F.lower(F.col(to_unit_col)) == F.col("__t_alias"), "left")
    v = F.col(value_col).cast("double")
    ok = (
        F.col("__f_cat").isNotNull()
        & F.col("__t_cat").isNotNull()
        & (F.col("__f_cat") == F.col("__t_cat"))
    )
    as_c = _temperature_to_c(v, F.lower(F.col(from_unit_col)))
    temp_out = _temperature_from_c(as_c, F.lower(F.col(to_unit_col)))
    linear_out = v * F.col("__f_factor") / F.col("__t_factor")
    out = F.when(~ok, F.lit(None).cast("double")).otherwise(
        F.when(F.col("__f_cat") == "temperature", temp_out).otherwise(linear_out)
    )
    return (
        joined.withColumn(out_col, out)
        .withColumn(f"{out_col}_ok", ok.cast("int"))
        .drop("__f_alias", "__f_cat", "__f_factor",
              "__t_alias", "__t_cat", "__t_factor")
    )


def convert_units_expr(
    value: Column, from_unit: Column | str, to_unit: Column | str
) -> Column:
    """Pure-expression unit-to-unit conversion (no join): the dim table
    folded into when-chains, affine for temperature. Null for unknown
    units or a category mismatch. Mirrors :func:`convert_units` —
    handy inside other expressions on small when-chain budgets."""
    f_u = F.lower(F.lit(from_unit) if isinstance(from_unit, str) else from_unit)
    t_u = F.lower(F.lit(to_unit) if isinstance(to_unit, str) else to_unit)
    v = value.cast("double")

    def lookup(unit: Column):
        cat = F.lit(None).cast("string")
        fac = F.lit(None).cast("double")
        for alias, c, f, _b in UNITS_TABLE:
            cat = F.when(unit == alias, F.lit(c)).otherwise(cat)
            fac = F.when(unit == alias, F.lit(f)).otherwise(fac)
        return cat, fac

    f_cat, f_fac = lookup(f_u)
    t_cat, t_fac = lookup(t_u)
    ok = f_cat.isNotNull() & t_cat.isNotNull() & (f_cat == t_cat)
    temp_out = _temperature_from_c(_temperature_to_c(v, f_u), t_u)
    linear_out = v * f_fac / t_fac
    return F.when(~ok, F.lit(None).cast("double")).otherwise(
        F.when(f_cat == "temperature", temp_out).otherwise(linear_out)
    )


def parse_unit_from_header(header: str) -> str | None:
    """'Speed (km/h)' -> 'km/h' (reference: units.py:653-726)."""
    import re

    m = re.search(r"[([]\s*([^)\]]+?)\s*[)\]]\s*$", header)
    if not m:
        return None
    cand = m.group(1).strip().lower()
    known = {alias for alias, *_ in UNITS_TABLE}
    return cand if cand in known else None
