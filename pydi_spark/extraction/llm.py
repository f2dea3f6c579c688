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

    def _extracted(
        self, data: Dataset | DataFrame, source_column: str, capture: bool
    ) -> DataFrame:
        from pydi_spark.core.llmcalls import (
            CALL_LOG_COLUMN,
            CALL_LOG_TYPE,
            CallRecorder,
            unpack_response,
        )

        df = as_dataframe(data)
        fields = list(self.fields)
        out_schema = StructType(
            [StructField(c, df.schema[c].dataType) for c in df.columns]
            + [StructField(f_, StringType()) for f_ in fields]
            + ([StructField(CALL_LOG_COLUMN, CALL_LOG_TYPE)] if capture else [])
        )
        factory, template, retries = self.client_factory, self.prompt_template, self.max_retries

        def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            client = factory()
            recorder = CallRecorder() if capture else None
            for pdf in batches:
                cols: dict[str, list] = {f_: [] for f_ in fields}
                logs = []
                for v in pdf[source_column]:
                    parsed: dict = {}
                    if v is not None:
                        prompt = template.format(fields=", ".join(fields), value=v)
                        for attempt in range(retries + 1):
                            try:
                                if recorder is not None:
                                    raw = recorder.call(client, prompt, attempt)
                                else:
                                    raw, _ = unpack_response(client(prompt))
                                parsed = json.loads(
                                    raw[raw.find("{"): raw.rfind("}") + 1]
                                )
                                break
                            except Exception as exc:
                                parsed = {}
                                if recorder is not None:
                                    recorder.record_parse_error(exc)
                    for f_ in fields:
                        val = parsed.get(f_)
                        cols[f_].append(None if val is None else str(val))
                    if recorder is not None:
                        logs.append(recorder.row())
                for f_ in fields:
                    pdf = pdf.assign(**{f_: cols[f_]})
                if capture:
                    pdf = pdf.assign(**{CALL_LOG_COLUMN: logs})
                yield pdf

        return df.mapInPandas(infer, out_schema)

    def extract(self, data: Dataset | DataFrame, source_column: str) -> DataFrame:
        return self._extracted(data, source_column, capture=False)

    def extract_with_log(
        self,
        data: Dataset | DataFrame,
        source_column: str,
        id_column: str | None = None,
    ) -> "tuple[DataFrame, DataFrame]":
        """``(extracted, call_log)`` — reference parity with the LLM
        prompt/response persistence in PyDI/informationextraction/llm.py
        and the always-written llm_calls artifacts (base.py:108-160).
        The log keys on ``id_column`` when given; previews inside each
        record identify the row otherwise. Checkpointed once so both
        outputs come from the SAME inference run."""
        from pydi_spark.core.llmcalls import CALL_LOG_COLUMN, explode_call_log

        out = self._extracted(
            data, source_column, capture=True
        ).localCheckpoint(eager=True)
        keys = [id_column] if id_column else []
        log = explode_call_log(out, keys, "llm_extractor")
        return out.drop(CALL_LOG_COLUMN), log
