"""Optional real-model backends for the NLP operators (U3/U4/U5).

The reference notebooks run actual models — HuggingFace QA and zero-shot
pipelines (reference notebooks/optimus.ipynb cells 3-14) and spaCy NER
(notebooks/nlp.ipynb cells 5-9). operators/nlp.py ships the Spark
plumbing with injectable backends; this module provides the public
default backends behind import guards (transformers / spacy are extras,
not bundled — same guard pattern as ingest.fetch.default_transport).

Executor-side laziness: a factory validates the dependency DRIVER-side
(fail fast, readable error) but the model itself loads lazily INSIDE the
Python worker on first batch and is cached per worker process — a
transformers pipeline must never ride the closure pickle to executors
(it's hundreds of MB and not reliably picklable). One model per worker,
reused across batches, is exactly the mapInPandas memory model
(nlp.py module docstring).
"""

from __future__ import annotations

from collections.abc import Callable

#: per-worker model cache: (kind, model_name) -> loaded pipeline/model.
#: Lives in the Python worker process that runs the UDF batches.
_MODEL_CACHE: dict = {}


def _require_import(module: str, extra_hint: str) -> None:
    import importlib.util
    if importlib.util.find_spec(module) is None:
        raise ImportError(
            f"the '{module}' package is required for this backend and is "
            f"not installed; install it with `pip install {extra_hint}` "
            f"(driver AND executors need it)")


def _hf_pipeline(kind: str, model: str,
                 pipeline_factory: Callable | None = None):
    key = (kind, model)
    if key not in _MODEL_CACHE:
        if pipeline_factory is not None:
            _MODEL_CACHE[key] = pipeline_factory(kind, model)
        else:
            from transformers import pipeline  # noqa: PLC0415 — worker-side lazy
            _MODEL_CACHE[key] = pipeline(kind, model=model)
    return _MODEL_CACHE[key]


def hf_qa_backend(model: str = "distilbert-base-cased-distilled-squad",
                  pipeline_factory: Callable | None = None) -> Callable:
    """qa_fn for nlp.ask(): HuggingFace extractive QA
    (reference optimus.ipynb cell 3 uses the same pipeline kind).
    Returns [(answer, score)] per text for one question.

    pipeline_factory(kind, model) -> pipeline overrides how the model
    loads (quantized/local checkpoints — or a dependency-free object
    honoring the HF call contract, which is how the adapter itself is
    tested without transformers installed). The returned object must be
    callable as pipe(question=[...], context=[...]) -> list[{"answer",
    "score"}] (bare dict for a 1-item batch, as HF does). Without a
    factory, transformers is validated driver-side and loaded lazily
    per worker."""
    if pipeline_factory is None:
        _require_import("transformers", "transformers")

    def qa_fn(texts: list[str], question: str) -> list[tuple[str, float]]:
        pipe = _hf_pipeline("question-answering", model, pipeline_factory)
        outs = pipe(question=[question] * len(texts), context=list(texts))
        if isinstance(outs, dict):  # single-item batches come back bare
            outs = [outs]
        return [(o["answer"], float(o["score"])) for o in outs]

    return qa_fn


def hf_zero_shot_backend(model: str = "facebook/bart-large-mnli",
                         pipeline_factory: Callable | None = None,
                         ) -> Callable:
    """clf_fn for nlp.classify(): HuggingFace zero-shot classification
    (reference optimus.ipynb cell 12). Returns [{label: score}] per
    text. The pipeline contract is pipe(texts, candidate_labels=...,
    multi_label=True) -> list[{"labels": [...], "scores": [...]}];
    pipeline_factory as in hf_qa_backend."""
    if pipeline_factory is None:
        _require_import("transformers", "transformers")

    def clf_fn(texts: list[str], labels: list[str]) -> list[dict]:
        pipe = _hf_pipeline("zero-shot-classification", model,
                            pipeline_factory)
        outs = pipe(list(texts), candidate_labels=list(labels),
                    multi_label=True)
        if isinstance(outs, dict):
            outs = [outs]
        return [dict(zip(o["labels"], map(float, o["scores"])))
                for o in outs]

    return clf_fn


def spacy_ner_backend(model: str = "en_core_web_sm",
                      entity_label: str = "GPE",
                      model_factory: Callable | None = None) -> Callable:
    """ner_fn for nlp.entities(): spaCy NER keeping one entity label
    (reference nlp.ipynb cells 5-9 extract GPE — geopolitical entities —
    as the alternative country tagger). model_factory(model) overrides
    spacy.load — the returned object needs .pipe(texts) yielding docs
    whose .ents carry .text/.label_ (the spaCy Language contract)."""
    if model_factory is None:
        _require_import("spacy", "spacy && python -m spacy download "
                                 "en_core_web_sm")

    def ner_fn(texts: list[str]) -> list[list[str]]:
        key = ("spacy", model)
        if key not in _MODEL_CACHE:
            if model_factory is not None:
                _MODEL_CACHE[key] = model_factory(model)
            else:
                import spacy  # noqa: PLC0415 — worker-side lazy
                _MODEL_CACHE[key] = spacy.load(model)
        nlp_model = _MODEL_CACHE[key]
        return [[ent.text for ent in doc.ents
                 if ent.label_ == entity_label]
                for doc in nlp_model.pipe(list(texts))]

    return ner_fn
