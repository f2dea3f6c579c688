"""PLM- and LLM-based matching: batched model inference over pair text.

Reference: PLMBasedMatcher (PyDI/entitymatching/plm_based.py:39-612,
"{left} [SEP] {right}" serialization :103-160, batch inference) and
LLMBasedMatcher (llm_based.py:28-534: per-pair JSON prompt, zero/few-
shot, retries/rate-limit, parse {match, score, explanation}).

Spark shape: serialize pairs with TextFormatter expressions (JVM-side),
then ONE ``mapInPandas`` stage per matcher:

- the model/client is constructed *lazily inside the task* via an
  injectable zero-arg factory — loaded once per executor process, never
  shipped from the driver (transformer weights don't pickle well and
  LLM clients hold sockets);
- inference sees Arrow-sized batches (vectorized for PLMs, one retryable
  call loop for LLMs);
- deterministic fakes (`fake_cross_encoder`, `fake_llm_client`) make
  pipelines testable offline — the reference has the same injectable
  hook for its embedder (blocking/embedding.py:78-80).

Heavy deps (torch/transformers, API SDKs) are NOT imported here; the
factory the caller passes owns them.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from pydi_spark.core.dataset import Dataset
from pydi_spark.matching.rule_based import join_pairs_to_records
from pydi_spark.matching.text_formatting import TextFormatter, pair_text_expr

SCORED_SCHEMA = StructType(
    [
        StructField("id1", StringType()),
        StructField("id2", StringType()),
        StructField("score", DoubleType()),
        StructField("notes", StringType()),
    ]
)


# ------------------------------------------------------------ fakes

def fake_cross_encoder() -> Callable[[list[str]], list[float]]:
    """Deterministic stand-in for a HF cross-encoder: token-overlap score
    of the two [SEP]-separated sides."""

    def score(texts: list[str]) -> list[float]:
        out = []
        for t in texts:
            left, _, right = t.partition(" [SEP] ")
            a, b = set(left.lower().split()), set(right.lower().split())
            out.append(len(a & b) / len(a | b) if (a or b) else 0.0)
        return out

    return score


def fake_llm_client() -> Callable[[str], str]:
    """Deterministic stand-in for a chat model: answers match-judgement
    prompts with JSON based on token overlap of quoted record texts."""

    def complete(prompt: str) -> str:
        parts = prompt.split("<record>")
        texts = [p.split("</record>")[0] for p in parts[1:]]
        if len(texts) >= 2:
            a, b = set(texts[0].lower().split()), set(texts[1].lower().split())
            sim = len(a & b) / len(a | b) if (a or b) else 0.0
            return json.dumps(
                {"match": sim >= 0.5, "score": round(sim, 4),
                 "explanation": "token overlap (fake client)"}
            )
        return json.dumps({"match": False, "score": 0.0, "explanation": "unparseable"})

    return complete


# ------------------------------------------------ real backends (optional)

def sentence_transformer_cross_encoder(
    model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2", **kwargs
) -> Callable[[], Callable[[list[str]], list[float]]]:
    """Factory-of-factory for a real HF cross-encoder (reference:
    plm_based.py:39-612 wires sentence-transformers directly). The heavy
    import happens lazily INSIDE the task factory — once per executor,
    never on the driver — and pairs are re-split on the same ``[SEP]``
    marker the TextFormatter emits. Raises ImportError at task time when
    sentence-transformers isn't installed; the deterministic
    ``fake_cross_encoder`` stays the tested default."""

    def factory() -> Callable[[list[str]], list[float]]:
        from sentence_transformers import CrossEncoder  # heavy, lazy

        model = CrossEncoder(model_name, **kwargs)

        def score(texts: list[str]) -> list[float]:
            pairs = [t.partition(" [SEP] ")[::2] for t in texts]
            return [float(s) for s in model.predict(pairs)]

        return score

    return factory


def openai_compatible_client(
    base_url: str,
    model: str,
    api_key_env: str = "OPENAI_API_KEY",
    temperature: float = 0.0,
    timeout: float = 60.0,
) -> Callable[[], Callable[[str], str]]:
    """Factory-of-factory for any OpenAI-compatible ``/chat/completions``
    endpoint (reference: llm_based.py:28-534 wires LangChain clients).
    Stdlib-urllib only — no SDK import to guard — so the HTTP path is
    fully testable against a local fake server. One client closure per
    executor; retries/parsing stay in LLMBasedMatcher."""
    import os as _os

    def factory() -> Callable[[str], str]:
        import urllib.request

        url = base_url.rstrip("/") + "/chat/completions"
        key = _os.environ.get(api_key_env, "")

        def complete(prompt: str) -> str:
            body = json.dumps(
                {
                    "model": model,
                    "temperature": temperature,
                    "messages": [{"role": "user", "content": prompt}],
                }
            ).encode()
            req = urllib.request.Request(
                url,
                data=body,
                headers={
                    "Content-Type": "application/json",
                    "Authorization": f"Bearer {key}",
                },
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                payload = json.loads(resp.read().decode())
            return payload["choices"][0]["message"]["content"]

        return complete

    return factory


# ------------------------------------------------------------ PLM

@dataclass
class PLMBasedMatcher:
    """Cross-encoder style matcher; ``model_factory`` returns a callable
    ``list[str] -> list[float]`` (scores in [0,1]); constructed once per
    executor."""

    text_formatter: TextFormatter
    model_factory: Callable[[], Callable[[list[str]], list[float]]] = fake_cross_encoder
    batch_size: int = 64

    def match(
        self,
        left: Dataset | DataFrame,
        right: Dataset | DataFrame,
        candidates: DataFrame,
        threshold: float = 0.5,
        id_column: str | None = None,
    ) -> DataFrame:
        joined = join_pairs_to_records(candidates, left, right, id_column)
        pairs_text = joined.select(
            F.col("p.id1").alias("id1"),
            F.col("p.id2").alias("id2"),
            pair_text_expr(self.text_formatter).alias("pair_text"),
        )
        factory, batch_size = self.model_factory, self.batch_size

        def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            model = factory()  # once per task/executor
            for pdf in batches:
                scores: list[float] = []
                for i in range(0, len(pdf), batch_size):
                    scores.extend(model(pdf["pair_text"].iloc[i:i + batch_size].tolist()))
                yield pd.DataFrame(
                    {"id1": pdf["id1"], "id2": pdf["id2"],
                     "score": scores, "notes": "plm_based"}
                )

        out = pairs_text.mapInPandas(infer, SCORED_SCHEMA)
        return out.where(F.col("score") >= F.lit(float(threshold)))


# ------------------------------------------------------------ LLM

DEFAULT_MATCH_PROMPT = """Do these two records refer to the same real-world entity?
<record>{left}</record>
<record>{right}</record>
Answer with JSON: {{"match": bool, "score": float, "explanation": str}}"""


@dataclass
class LLMBasedMatcher:
    """Per-pair prompt matcher; ``client_factory`` returns a callable
    ``prompt -> completion`` (one per executor). Retries with fallback
    parsing mirror the reference (llm_based.py:75-137); per-call
    prompt/response/usage capture (``match_with_log``) mirrors its
    LLMCallLogger wiring (llm_based.py:72, 213-214, 348)."""

    text_formatter: TextFormatter
    client_factory: Callable[[], Callable[[str], str]] = fake_llm_client
    prompt_template: str = DEFAULT_MATCH_PROMPT
    few_shot_examples: list[dict] = field(default_factory=list)
    max_retries: int = 2

    def _render(self, left_text: str, right_text: str) -> str:
        shots = "".join(
            f"Example: {json.dumps(ex)}\n" for ex in self.few_shot_examples
        )
        return shots + self.prompt_template.format(left=left_text, right=right_text)

    def _scored(
        self,
        left: Dataset | DataFrame,
        right: Dataset | DataFrame,
        candidates: DataFrame,
        id_column: str | None,
        capture: bool,
    ) -> DataFrame:
        from pydi_spark.core.llmcalls import (
            CALL_LOG_COLUMN,
            CALL_LOG_TYPE,
            CallRecorder,
            unpack_response,
        )
        from pyspark.sql.types import StructField, StructType

        joined = join_pairs_to_records(candidates, left, right, id_column)
        pairs_text = joined.select(
            F.col("p.id1").alias("id1"),
            F.col("p.id2").alias("id2"),
            self.text_formatter.expr("l.").alias("lt"),
            self.text_formatter.expr("r.").alias("rt"),
        )
        factory, render, retries = self.client_factory, self._render, self.max_retries
        schema = SCORED_SCHEMA
        if capture:
            schema = StructType(
                schema.fields + [StructField(CALL_LOG_COLUMN, CALL_LOG_TYPE)]
            )

        def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            client = factory()
            recorder = CallRecorder() if capture else None
            for pdf in batches:
                scores, notes, logs = [], [], []
                for lt, rt in zip(pdf["lt"], pdf["rt"]):
                    score, note = 0.0, "llm_error"
                    for attempt in range(retries + 1):
                        try:
                            prompt = render(lt, rt)
                            if recorder is not None:
                                raw = recorder.call(client, prompt, attempt)
                            else:
                                raw, _ = unpack_response(client(prompt))
                            obj = json.loads(raw[raw.find("{"): raw.rfind("}") + 1])
                            score = float(obj.get("score", 1.0 if obj.get("match") else 0.0))
                            note = str(obj.get("explanation", ""))[:200]
                            break
                        except Exception as exc:  # retry, then record failure
                            note = f"llm_error: {type(exc).__name__}"
                            if recorder is not None:
                                recorder.record_parse_error(exc)
                    scores.append(score)
                    notes.append(note)
                    if recorder is not None:
                        logs.append(recorder.row())
                out = pd.DataFrame(
                    {"id1": pdf["id1"], "id2": pdf["id2"],
                     "score": scores, "notes": notes}
                )
                if capture:
                    out[CALL_LOG_COLUMN] = logs
                yield out

        return pairs_text.mapInPandas(infer, schema)

    def match(
        self,
        left: Dataset | DataFrame,
        right: Dataset | DataFrame,
        candidates: DataFrame,
        threshold: float = 0.5,
        id_column: str | None = None,
    ) -> DataFrame:
        out = self._scored(left, right, candidates, id_column, capture=False)
        return out.where(F.col("score") >= F.lit(float(threshold)))

    def match_with_log(
        self,
        left: Dataset | DataFrame,
        right: Dataset | DataFrame,
        candidates: DataFrame,
        threshold: float = 0.5,
        id_column: str | None = None,
    ) -> "tuple[DataFrame, DataFrame]":
        """``(matches, call_log)`` — matches as ``match()``; call_log
        has one row per LLM call (all attempts, including calls for
        below-threshold pairs), keyed by (id1, id2). The scored frame is
        checkpointed once so both outputs come from the SAME inference
        run — without it, lazy evaluation would re-invoke the client per
        consumer."""
        from pydi_spark.core.llmcalls import CALL_LOG_COLUMN, explode_call_log

        scored = self._scored(
            left, right, candidates, id_column, capture=True
        ).localCheckpoint(eager=True)
        log = explode_call_log(scored, ["id1", "id2"], "llm_matcher")
        matches = scored.drop(CALL_LOG_COLUMN).where(
            F.col("score") >= F.lit(float(threshold))
        )
        return matches, log
