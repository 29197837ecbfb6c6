"""Batched NLP inference operators (U3/U4/U5) — the notebook model
pipelines as Arrow-batched Spark stages.

Reference behavior (all eager pandas in notebooks):
- QA over abstracts, keeping the best-scoring of N questions
  (reference notebooks/optimus.ipynb cells 3-9)            -> ask()
- zero-shot topic classification, multi-label scores
  (notebooks/optimus.ipynb cells 12-14)                    -> classify()
- spaCy NER extracting GPE entities from abstracts
  (notebooks/nlp.ipynb cells 5-9)                          -> entities()
  (an alternative implementation of the J6 country tagging)

Spark-first design: model inference is the canonical pandas-UDF workload —
Arrow hands the executor a batch of strings, the model scores the whole
batch, never row-at-a-time pickle. Backends are INJECTED callables
(model_fn(texts: list[str]) -> list[...]): the transformer/spaCy libraries
are not in this environment, so production backends are stubbed behind
NotImplementedError while tests inject deterministic fakes — the Spark
plumbing (schemas, batching, map building) is the real, exercised surface.

Scale notes: batch size is the memory knob
(spark.sql.execution.arrow.maxRecordsPerBatch); models load once per
Python worker (closure capture), not per batch; GPU scheduling would hang
off spark.task.resource.gpu.amount — out of scope here.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _require(fn, what: str):
    if fn is None:
        raise NotImplementedError(
            f"no {what} backend available in this environment — inject one "
            f"(e.g. a transformers pipeline wrapper)")


def ask(df: DataFrame, text_col: str, id_col: str, questions: list[str],
        qa_fn: Callable[[list[str], str], list[tuple[str, float]]] | None = None,
        ) -> DataFrame:
    """U3: QA over a text column, best-of-N questions by model score.

    qa_fn(texts, question) -> [(answer, score)] per text. Output: one row
    per input with the winning (question, answer, score).
    """
    _require(qa_fn, "question-answering")
    schema = StructType([
        StructField("id", StringType()),
        StructField("question", StringType()),
        StructField("answer", StringType()),
        StructField("score", DoubleType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = list(pdf[text_col])
            best = [("", "", float("-inf"))] * len(texts)
            for q in questions:  # batch per question — model sees the batch
                for i, (ans, score) in enumerate(qa_fn(texts, q)):
                    if score > best[i][2]:
                        best[i] = (q, ans, score)
            yield pd.DataFrame({
                "id": pdf[id_col].astype(str),
                "question": [b[0] for b in best],
                "answer": [b[1] for b in best],
                "score": [b[2] for b in best],
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


def classify(df: DataFrame, text_col: str, id_col: str, labels: list[str],
             clf_fn: Callable[[list[str], list[str]], list[dict]] | None = None,
             ) -> DataFrame:
    """U4: zero-shot multi-label classification -> map<label,double>.

    clf_fn(texts, labels) -> [{label: score}] per text.
    """
    _require(clf_fn, "zero-shot classification")
    schema = StructType([
        StructField("id", StringType()),
        StructField("scores", MapType(StringType(), DoubleType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            score_maps = clf_fn(list(pdf[text_col]), labels)
            yield pd.DataFrame({
                "id": pdf[id_col].astype(str),
                "scores": score_maps,
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)


def entities(df: DataFrame, text_col: str, id_col: str,
             ner_fn: Callable[[list[str]], list[list[str]]] | None = None,
             ) -> DataFrame:
    """U5: NER -> array<string> of extracted entities per row."""
    _require(ner_fn, "NER")
    schema = StructType([
        StructField("id", StringType()),
        StructField("entities", ArrayType(StringType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ents = ner_fn(list(pdf[text_col]))
            yield pd.DataFrame({
                "id": pdf[id_col].astype(str),
                "entities": ents,
            })

    return df.select(id_col, text_col).mapInPandas(run, schema)
