"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin, sorts
columns by name, compares row multisets (order-insensitive), and prints
per-query PASS/FAIL with first differing rows. Usage:

    python3 tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# Queries inside the driver's 50-entry CORRECTNESS window must emit
# only hash-safe values: ints, doubles, and newline-free strings.
# Arrays error the driver's pandas hashtable, booleans and embedded
# newlines silently flip its content hash (CORRECTNESS_r03) — reject
# them here so a hash-unsafe output never reaches a driver round.
HASH_SAFETY_EXEMPT = {"canary_hash_risky", "canary_hugeint"}  # risky probes

# Round-5 root cause of the r03/r04 reds: DuckDB types an uncast
# integer SUM as HUGEINT (int128); its pandas conversion renders that
# float64 while Spark's bigint stays int64, and the driver's
# pandas-based hasher is dtype-class-sensitive (float 3.0 != int 3).
# fetchall() below returns Python ints, so THIS replica can't see the
# divergence — forbid the dtype classes at the relation level instead.
# All 7 r04 reds (and only them) carried a HUGEINT output column.
# Int WIDTH is fine (INTEGER/TINYINT oracles have always been green);
# the forbidden classes are the ones pandas renders as float64,
# uint64, or object.
FORBIDDEN_ORACLE_TYPES = (
    "HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT", "UINTEGER",
    "USMALLINT", "UTINYINT", "BLOB", "INTERVAL",
)


def forbidden_type_violations(types, cols):
    bad = {}
    for c, t in zip(cols, types):
        tu = str(t).upper()
        if any(tu.startswith(f) for f in FORBIDDEN_ORACLE_TYPES):
            bad[c] = str(t)
    return bad


def _dtype_class(dtype) -> str:
    """Collapse a pandas dtype into the classes the driver's hasher
    distinguishes: int-like widths all hash alike, but int vs float vs
    bool vs object do NOT (the r03/r04 HUGEINT->float64 lesson)."""
    import pandas as pd

    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    return "object"


def dtype_class_mismatches(spark_rows, spark_cols, duck_rel):
    """Build both sides the way the driver does (Spark rows -> pandas,
    DuckDB .df()) and compare per-column dtype CLASSES. A mismatch
    means the driver's hasher will see different value types even when
    fetchall() values compare equal."""
    import pandas as pd

    sdf = pd.DataFrame(spark_rows, columns=spark_cols)
    odf = duck_rel.df()
    if len(sdf) == 0 or len(odf) == 0:
        # an empty Spark frame types every column object while the
        # DuckDB relation keeps its declared types — no values exist to
        # hash differently, so dtype classes carry no signal here (the
        # row-count compare still flags empty-vs-non-empty)
        return {}
    bad = {}
    for c in spark_cols:
        if c not in odf.columns:
            continue
        s_cls = _dtype_class(sdf[c].dtype)
        o_cls = _dtype_class(odf[c].dtype)
        # nullable columns convert version-dependently (duckdb may
        # render int-with-NULL as float64 OR masked Int; the driver is
        # GREEN on them — canary_hash_safe's c_null_int) — only the
        # null-free case is a reliable signal
        if sdf[c].isna().any() or odf[c].isna().any():
            continue
        # Spark rows arrive as Python objects: a str column is object
        # on the spark side but object on the duck side too; int/float
        # infer natively on both. Compare the classes directly.
        if s_cls != o_cls:
            bad[c] = f"spark={sdf[c].dtype}({s_cls}) duckdb={odf[c].dtype}({o_cls})"
    return bad


def hash_safety_violations(rows, cols):
    bad = {}
    for r in rows[:2000]:
        for c, v in zip(cols, r):
            if c in bad:
                continue
            if isinstance(v, bool):
                bad[c] = "boolean"
            elif isinstance(v, (list, tuple, dict, set, bytes, bytearray)):
                bad[c] = type(v).__name__
            elif isinstance(v, str) and ("\n" in v or "\r" in v):
                bad[c] = "embedded newline"
    return bad


def rotation_queue() -> set[str]:
    """The pinned rotation queue from tests/roster.py (the single
    roster source of truth — pure data, no imports, so loading it runs
    no test-module code; ADVICE r8). Queue entries are FUTURE window
    members — gate them with the same hash-safety rules so a
    hash-unsafe output can never sit waiting in the queue (VERDICT r7
    #5: r8's rotation would have been the first time the r7 queue hit
    the window check)."""
    import importlib.util

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "roster.py",
    )
    spec = importlib.util.spec_from_file_location("_roster", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return set(mod.ROTATION_QUEUE)


def gated_names(query_names) -> set[str]:
    """Names subject to the hash-safe output convention: the driver's
    50-entry window plus every rotation-queue entry, minus the
    deliberately-risky probes."""
    return (
        set(list(query_names)[:50]) | rotation_queue()
    ) - HASH_SAFETY_EXEMPT


def check_query(spark, con, name, fn, sql, sf_dir, gated):
    """Run one query against its oracle the way the driver does.
    Returns None on PASS or a failure-description string (first line is
    the category). Extracted from main() so tests can drive the gate
    end-to-end on a synthetic hash-unsafe query."""
    try:
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        snorm, sorted_cols = normalize(srows, scols)
    except Exception as e:
        return f"spark error: {type(e).__name__}: {str(e)[:300]}"
    if name in gated:
        bad = hash_safety_violations(srows, scols)
        if bad:
            return f"hash-unsafe window/queue output: {bad}"
    if sql is None:
        return None  # rows-only op: driver records a weaker check
    try:
        res = con.sql(sql)
        ocols = res.columns
        if name not in HASH_SAFETY_EXEMPT:
            tbad = forbidden_type_violations(res.types, ocols)
            if tbad:
                return f"driver-unportable oracle dtypes (cast them): {tbad}"
        orows = res.fetchall()
        onorm, _ = normalize(orows, ocols)
    except Exception as e:
        return f"duckdb error: {type(e).__name__}: {str(e)[:300]}"
    if sorted(scols) != sorted(ocols):
        return f"schema mismatch spark={sorted(scols)} duckdb={sorted(ocols)}"
    if name not in HASH_SAFETY_EXEMPT:
        dbad = dtype_class_mismatches(srows, scols, res)
        if dbad:
            return f"driver-hasher dtype-class mismatch: {dbad}"
    if snorm == onorm:
        return None
    lines = [
        f"rows spark={len(snorm)} duckdb={len(onorm)}; cols={sorted_cols}"
    ]
    sset, oset = set(snorm), set(onorm)
    for r in list(sset - oset)[:3]:
        lines.append(f"   spark-only:  {r}")
    for r in list(oset - sset)[:3]:
        lines.append(f"   duckdb-only: {r}")
    return "\n".join(lines)


def normalize(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in idx]


def main() -> int:
    # WINDOW may appear anywhere (incl. as the first arg with sf_dir
    # omitted) — pull it out BEFORE positional assignment, and only
    # treat the first remaining arg as sf_dir when it IS a directory
    # (otherwise it's a query name and the default sf_dir applies)
    args = [a for a in sys.argv[1:] if a != "WINDOW"]
    want_window = len(args) != len(sys.argv) - 1
    if args and (os.sep in args[0] or os.path.isdir(args[0])):
        sf_dir, only = args[0], set(args[1:])
    else:
        sf_dir, only = "/root/testdata/sf0.001", set(args)

    import duckdb

    import __spark_entry__ as entry

    if want_window:
        # shorthand for the driver's 50-query correctness window
        only |= set(list(entry.queries())[:50])

    if os.environ.get("VANILLA"):
        # driver-like session: no engine configs at all
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .appName("check_oracle_vanilla")
            .getOrCreate()
        )
    else:
        from pydi_spark import get_spark

        spark = get_spark("check_oracle")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    gated = gated_names(qs)
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        err = check_query(
            spark, con, name, fn, oracles.get(name), sf_dir, gated
        )
        if err is not None:
            print(f"FAIL {name}: {err}")
            failed.append(name)
        elif name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only check)")
        else:
            print(f"PASS {name}")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
