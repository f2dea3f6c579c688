from pydi_spark.profiling.profiler import DataProfiler, key_skew_report

__all__ = ["DataProfiler", "key_skew_report"]
