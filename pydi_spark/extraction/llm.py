"""LLM extraction: schema-guided structured extraction per value.

Reference: LLMExtractor (PyDI/informationextraction/llm.py:35-606):
schema-guided prompts per value, JSON validated against a schema,
retries. Spark shape: one ``mapInPandas`` stage; the client comes from
an injectable zero-arg factory (constructed per executor); the output
schema is a real StructType so downstream plans stay typed.
``fake_extraction_client`` gives deterministic offline behavior.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from pydi_spark.core.dataset import Dataset, as_dataframe

DEFAULT_EXTRACT_PROMPT = """Extract the following fields from the text as JSON.
Fields: {fields}
Text: <text>{value}</text>
Answer with only a JSON object."""


def fake_extraction_client() -> Callable[[str], str]:
    """Deterministic stand-in: pulls naive field values by keyword regex."""
    import re

    def complete(prompt: str) -> str:
        fields = re.search(r"Fields: ([^\n]+)", prompt).group(1).split(", ")
        text = re.search(r"<text>(.*)</text>", prompt, re.S).group(1)
        out = {}
        for f_ in fields:
            m = re.search(rf"{re.escape(f_)}\s*[:=]\s*([^,;\n]+)", text, re.I)
            out[f_] = m.group(1).strip() if m else None
        return json.dumps(out)

    return complete


@dataclass
class LLMExtractor:
    """fields: list of output field names (all string-typed; cast after).
    ``client_factory``: zero-arg factory -> (prompt -> completion)."""

    fields: list[str]
    client_factory: Callable[[], Callable[[str], str]] = fake_extraction_client
    prompt_template: str = DEFAULT_EXTRACT_PROMPT
    max_retries: int = 2

    def extract(self, data: Dataset | DataFrame, source_column: str) -> DataFrame:
        df = as_dataframe(data)
        fields = list(self.fields)
        out_schema = StructType(
            [StructField(c, df.schema[c].dataType) for c in df.columns]
            + [StructField(f_, StringType()) for f_ in fields]
        )
        factory, template, retries = self.client_factory, self.prompt_template, self.max_retries

        def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            client = factory()
            for pdf in batches:
                cols: dict[str, list] = {f_: [] for f_ in fields}
                for v in pdf[source_column]:
                    parsed: dict = {}
                    if v is not None:
                        prompt = template.format(fields=", ".join(fields), value=v)
                        for _ in range(retries + 1):
                            try:
                                raw = client(prompt)
                                parsed = json.loads(
                                    raw[raw.find("{"): raw.rfind("}") + 1]
                                )
                                break
                            except Exception:
                                parsed = {}
                    for f_ in fields:
                        val = parsed.get(f_)
                        cols[f_].append(None if val is None else str(val))
                for f_ in fields:
                    pdf = pdf.assign(**{f_: cols[f_]})
                yield pdf

        return df.mapInPandas(infer, out_schema)
