from pydi_spark.profiling.profiler import DataProfiler

__all__ = ["DataProfiler"]
