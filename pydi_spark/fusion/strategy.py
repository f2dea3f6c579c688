"""Fusion strategy: attribute -> resolver registry.

Reference: DataFusionStrategy.add_attribute_fuser(attr, resolver, ...)
(PyDI/fusion/strategy.py:43-83) and per-attribute evaluation functions
(:116-154). Named resolvers compile to native aggregates
(resolvers.RESOLVERS); arbitrary Python callables fall back to a grouped
pandas UDF receiving (values, sources, trust) — the reference's
pluggable-callable contract (strategy.py:70-74) preserved.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pydi_spark.fusion.resolvers import RESOLVERS, AggBuilder


@dataclass
class AttributeFuser:
    attribute: str
    builder: AggBuilder | None  # native tier
    py_resolver: Callable | None = None  # fallback tier
    evaluation_function: Callable | None = None
    params: dict[str, Any] = field(default_factory=dict)


class DataFusionStrategy:
    def __init__(self, name: str = "default"):
        self.name = name
        self.fusers: dict[str, AttributeFuser] = {}
        self.evaluation_functions: dict[str, Callable] = {}

    def add_attribute_fuser(
        self,
        attribute: str,
        resolver: str | Callable,
        evaluation_function: Callable | None = None,
        **kwargs: Any,
    ) -> "DataFusionStrategy":
        if isinstance(resolver, str):
            if resolver not in RESOLVERS:
                raise ValueError(
                    f"unknown resolver '{resolver}'; known: {sorted(RESOLVERS)}"
                )
            builder = RESOLVERS[resolver]
            # parameterized resolvers (favour_sources, random_value,
            # intersection_k_sources) are factories: call with kwargs
            if kwargs:
                builder = builder(**kwargs)
            self.fusers[attribute] = AttributeFuser(
                attribute, builder, None, evaluation_function, kwargs
            )
        else:
            self.fusers[attribute] = AttributeFuser(
                attribute, None, resolver, evaluation_function, kwargs
            )
        if evaluation_function is not None:
            self.evaluation_functions[attribute] = evaluation_function
        return self

    def add_evaluation_function(
        self, attribute: str, fn: Callable, **params: Any
    ) -> "DataFusionStrategy":
        import functools

        self.evaluation_functions[attribute] = (
            functools.partial(fn, **params) if params else fn
        )
        return self
