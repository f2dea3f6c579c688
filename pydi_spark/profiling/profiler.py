"""Profiling: distributed stats + driver-side rendering.

Reference: PyDI/profiling/profiler.py — profile (ydata HTML, :30-67),
compare (sweetviz, :69-106), summary (:108-156), analyze_coverage
(:158-216). The heavy libs aren't available (and wouldn't scale);
the stats themselves are computed as Spark aggregates and rendered to a
plain dict / simple HTML on the driver.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pydi_spark.core.dataset import Dataset, as_dataframe


class DataProfiler:
    def summary(self, data: Dataset | DataFrame) -> dict[str, Any]:
        """rows/cols/null counts/dtypes (reference: profiler.py:108-156) —
        ONE aggregate pass."""
        df = as_dataframe(data)
        aggs = [F.count("*").alias("__n")]
        for c in df.columns:
            aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__nd_{c}"))
        row = df.agg(*aggs).collect()[0]
        n = row["__n"]
        columns = {}
        for c, t in df.dtypes:
            columns[c] = {
                "dtype": t,
                "non_null": row[f"__nn_{c}"],
                "nulls": n - row[f"__nn_{c}"],
                "approx_distinct": row[f"__nd_{c}"],
            }
        return {
            "dataset": data.name if isinstance(data, Dataset) else None,
            "rows": n,
            "n_columns": len(df.columns),
            "columns": columns,
        }

    def profile(self, data: Dataset | DataFrame, out_dir: str | None = None) -> dict:
        """Extended per-column stats (numeric five-number summary,
        string length stats, top values) + optional HTML artifact."""
        df = as_dataframe(data)
        base = self.summary(data)
        numeric = [c for c, t in df.dtypes
                   if t in ("int", "bigint", "double", "float", "decimal")]
        aggs = []
        for c in numeric:
            col = F.col(c).cast("double")
            aggs += [
                F.min(col).alias(f"__min_{c}"), F.max(col).alias(f"__max_{c}"),
                F.avg(col).alias(f"__avg_{c}"),
                F.expr(f"percentile_approx({c}, array(0.25, 0.5, 0.75))").alias(f"__q_{c}"),
                F.stddev_pop(col).alias(f"__sd_{c}"),
            ]
        strings = [c for c, t in df.dtypes if t == "string"]
        for c in strings:
            aggs.append(F.avg(F.length(F.col(c))).alias(f"__len_{c}"))
        if aggs:
            row = df.agg(*aggs).collect()[0]
            for c in numeric:
                q = row[f"__q_{c}"]
                base["columns"][c].update(
                    min=row[f"__min_{c}"], max=row[f"__max_{c}"],
                    mean=row[f"__avg_{c}"], stddev=row[f"__sd_{c}"],
                    q25=q[0] if q else None, median=q[1] if q else None,
                    q75=q[2] if q else None,
                )
            for c in strings:
                base["columns"][c]["avg_length"] = row[f"__len_{c}"]
        # top values for low-cardinality strings (one pass per candidate)
        for c in strings:
            if base["columns"][c]["approx_distinct"] <= 25:
                top = (
                    df.groupBy(c).count().orderBy(F.desc("count"), F.col(c))
                    .limit(10).collect()
                )
                base["columns"][c]["top_values"] = [
                    {"value": r[c], "count": r["count"]} for r in top
                ]
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            name = base.get("dataset") or "profile"
            with open(os.path.join(out_dir, f"{name}_profile.json"), "w") as fh:
                json.dump(base, fh, indent=2, default=str)
            with open(os.path.join(out_dir, f"{name}_profile.html"), "w") as fh:
                fh.write(self._render_html(base))
        return base

    def compare(self, a: Dataset | DataFrame, b: Dataset | DataFrame) -> dict:
        """Two-sided comparison (reference: profiler.py:69-106)."""
        pa, pb = self.summary(a), self.summary(b)
        shared = sorted(set(pa["columns"]) & set(pb["columns"]))
        return {
            "a": pa, "b": pb,
            "shared_columns": shared,
            "only_a": sorted(set(pa["columns"]) - set(pb["columns"])),
            "only_b": sorted(set(pb["columns"]) - set(pa["columns"])),
        }

    def analyze_coverage(self, datasets: list[Dataset]) -> DataFrame:
        """Cross-dataset attribute coverage matrix
        (reference: profiler.py:158-216 -> fusion/analysis.py:22)."""
        from pydi_spark.fusion.evaluation import coverage_metrics

        return coverage_metrics(datasets)

    @staticmethod
    def _render_html(profile: dict) -> str:
        rows = []
        for c, st in profile["columns"].items():
            rows.append(
                f"<tr><td>{c}</td><td>{st['dtype']}</td><td>{st['non_null']}</td>"
                f"<td>{st['nulls']}</td><td>{st['approx_distinct']}</td></tr>"
            )
        return (
            "<html><body><h1>Profile: "
            f"{profile.get('dataset') or ''}</h1>"
            f"<p>{profile['rows']} rows, {profile['n_columns']} columns</p>"
            "<table border=1><tr><th>column</th><th>dtype</th><th>non-null</th>"
            "<th>nulls</th><th>~distinct</th></tr>"
            + "".join(rows)
            + "</table></body></html>"
        )
