"""Record-to-text serialization for PLM/LLM matchers.

Reference: TextFormatter (PyDI/entitymatching/text_formatting.py:16-309)
serializes records to "{field}: {value}" strings with missing-value
policies. Native ``concat_ws``/``format_string`` expressions here.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class TextFormatter:
    text_fields: list[str]
    template: str | None = None  # e.g. "{title} by {director}"
    separator: str = " "
    handle_missing: str = "skip"  # skip | empty | placeholder
    placeholder: str = "[MISSING]"
    max_length: int | None = None

    def _field(self, name: str) -> Column:
        c = F.col(name).cast("string")
        if self.handle_missing == "placeholder":
            return F.coalesce(c, F.lit(self.placeholder))
        if self.handle_missing == "empty":
            return F.coalesce(c, F.lit(""))
        return c  # skip: concat_ws drops nulls natively

    def expr(self, prefix: str = "") -> Column:
        p = (lambda n: f"{prefix}{n}") if prefix else (lambda n: n)
        if self.template:
            fmt = self.template
            cols = []
            import re

            fields = re.findall(r"\{(\w+)\}", fmt)
            java_fmt = re.sub(r"\{\w+\}", "%s", fmt)
            for name in fields:
                cols.append(F.coalesce(F.col(p(name)).cast("string"),
                                       F.lit(self.placeholder
                                             if self.handle_missing == "placeholder"
                                             else "")))
            out = F.format_string(java_fmt, *cols)
        else:
            parts = [self._field(p(n)) for n in self.text_fields]
            out = F.concat_ws(self.separator, *parts)
        if self.max_length:
            out = F.substring(out, 1, self.max_length)
        return out


def pair_text_expr(fmt: TextFormatter, sep_token: str = " [SEP] ") -> Column:
    """"{left} [SEP] {right}" pair serialization for cross-encoders
    (reference: plm_based.py:103-160)."""
    return F.concat(fmt.expr("l."), F.lit(sep_token), fmt.expr("r."))
