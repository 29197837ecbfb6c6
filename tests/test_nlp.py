"""U3/U4/U5 inference operators: deterministic fake backends exercise the
real Arrow/mapInPandas plumbing; missing backends raise NotImplementedError
(the documented stub contract)."""

from __future__ import annotations

import pytest

from research_index_backend_spark.operators.nlp import ask, classify, entities


@pytest.fixture()
def abstracts(spark):
    return spark.createDataFrame([
        (1, "Energy systems modelling in Kenya and Ghana"),
        (2, "A starter data kit for Liberia"),
    ], ["doc_id", "abstract"])


def test_ask_best_of_n(spark, abstracts):
    def fake_qa(texts, question):
        # score favors the question whose last word appears in the text
        key = question.split()[-1].rstrip("?")
        return [(key, 1.0 if key.lower() in t.lower() else 0.1)
                for t in texts]

    out = {r["id"]: r for r in
           ask(abstracts, "abstract", "doc_id",
               ["Which country? Kenya", "Which dataset? kit"],
               qa_fn=fake_qa).collect()}
    assert out["1"]["question"].endswith("Kenya")
    assert out["1"]["score"] == 1.0
    assert out["2"]["question"].endswith("kit")


def test_classify_score_map(spark, abstracts):
    def fake_clf(texts, labels):
        return [{lab: (1.0 if lab.lower() in t.lower() else 0.0)
                 for lab in labels} for t in texts]

    out = {r["id"]: r["scores"] for r in
           classify(abstracts, "abstract", "doc_id",
                    ["Kenya", "Liberia"], clf_fn=fake_clf).collect()}
    assert out["1"] == {"Kenya": 1.0, "Liberia": 0.0}
    assert out["2"] == {"Kenya": 0.0, "Liberia": 1.0}


def test_entities_array(spark, abstracts):
    def fake_ner(texts):
        gpes = ["Kenya", "Ghana", "Liberia"]
        return [[g for g in gpes if g in t] for t in texts]

    out = {r["id"]: r["entities"] for r in
           entities(abstracts, "abstract", "doc_id",
                    ner_fn=fake_ner).collect()}
    assert out["1"] == ["Kenya", "Ghana"]
    assert out["2"] == ["Liberia"]


def test_missing_backend_raises(spark, abstracts):
    with pytest.raises(NotImplementedError):
        ask(abstracts, "abstract", "doc_id", ["q?"], qa_fn=None)
    with pytest.raises(NotImplementedError):
        classify(abstracts, "abstract", "doc_id", ["x"], clf_fn=None)
    with pytest.raises(NotImplementedError):
        entities(abstracts, "abstract", "doc_id", ner_fn=None)


class TestRealBackends:
    """The optional public-model adapters: fail fast with a clear error
    when the extra dependency is absent; run for real when present
    (skipped in this container, which bundles neither)."""

    def test_missing_dependency_raises_driver_side(self):
        from research_index_backend_spark.operators import nlp_backends
        for factory, module in (
                (nlp_backends.hf_qa_backend, "transformers"),
                (nlp_backends.hf_zero_shot_backend, "transformers"),
                (nlp_backends.spacy_ner_backend, "spacy")):
            try:
                __import__(module)
            except ImportError:
                with pytest.raises(ImportError, match="pip install"):
                    factory()
            else:  # dependency present: the factory must return a callable
                assert callable(factory())

    def test_real_qa_if_transformers_installed(self, spark):
        pytest.importorskip("transformers")
        from research_index_backend_spark.operators.nlp import ask
        from research_index_backend_spark.operators.nlp_backends import (
            hf_qa_backend)
        df = spark.createDataFrame(
            [("d1", "Solar capacity in Kenya reached 400 MW in 2023.")],
            ["doc_id", "abstract"])
        rows = ask(df, "abstract", "doc_id",
                   ["What country is mentioned?"],
                   qa_fn=hf_qa_backend()).collect()
        assert rows and rows[0]["answer"]
