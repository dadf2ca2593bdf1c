"""Seeded offline training pipelines (SURVEY §2 F6/O8/A11) — the Ray
re-derivation of the reference's training scripts:

- content-type model: ``ml/training/train_content_model.py:85-135``
  (synthetic Persian samples built from the content-type keyword
  dictionaries with per-type sentence templates, seeded; 80/20 split;
  train; evaluate).
- legal-domain model: ``ml/training/train_domain_model.py:88-127``
  (1-3 domains per sample, 3-10 keywords each, multi-label).
- doc-class model: the engine-side analog over the English
  ``DOC_CLASS_KEYWORDS`` families so the model-backed path can score the
  sandbox ``documents`` table.

Everything is seeded (numpy ``RandomState``) and the TF-IDF fit runs as
Ray Dataset aggregates (``ml/tfidf.py``), so re-training with the same
parameters reproduces the artifact bit-for-bit.  Evaluation reuses the
sklearn-free metrics in ``functions/mlmetrics.py`` (A11).
"""

from __future__ import annotations

import numpy as np

from crawler_ray.functions.classify import (CONTENT_TYPE_KEYWORDS,
                                            LEGAL_DOMAINS_KEYWORDS)
from crawler_ray.functions.mlmetrics import evaluate_classification
from crawler_ray.ml.model import (save_model, train_ovr_sigmoid,
                                  train_softmax)
from crawler_ray.ml.tfidf import TfidfVectorizer
from crawler_ray.ops.textstats import DOC_CLASS_KEYWORDS

__all__ = ["synth_content_data", "synth_domain_data",
           "synth_doc_class_data", "train_content_model",
           "train_domain_model", "train_doc_class_model"]

_CONTENT_TEMPLATES = {
    # per-type sentence templates mirroring
    # ``ml/training/train_content_model.py:109-120``
    "question": "{kw} مربوط به موضوع حقوقی چیست؟",
    "answer": "{kw} در این مورد حقوقی قابل استناد است.",
    "article": "در این مقاله به بررسی {kw} می‌پردازیم.",
    "profile": "{kw} از ویژگی‌های تخصصی این وکیل است.",
}
_OTHER_TEXT = "این یک متن عمومی است که هیچ ویژگی خاصی ندارد."


def synth_content_data(num_samples: int = 1000, seed: int = 42
                       ) -> tuple[list[str], list[str], list[str]]:
    """(texts, labels, classes): single-label content-type samples
    (keyword-templated sentences; 'other' is the fixed generic text)."""
    rng = np.random.RandomState(seed)
    classes = list(CONTENT_TYPE_KEYWORDS) + ["other"]
    texts, labels = [], []
    for _ in range(num_samples):
        ct = classes[rng.randint(len(classes))]
        if ct == "other":
            texts.append(_OTHER_TEXT)
        else:
            kws = CONTENT_TYPE_KEYWORDS[ct]
            k = min(rng.randint(3, 8), len(kws))
            chosen = rng.choice(len(kws), size=k, replace=False)
            texts.append(" ".join(
                _CONTENT_TEMPLATES[ct].format(kw=kws[i])
                for i in chosen))
        labels.append(ct)
    return texts, labels, classes


def synth_domain_data(num_samples: int = 1000, seed: int = 42
                      ) -> tuple[list[str], list[list[str]], list[str]]:
    """(texts, label-lists, classes): multi-label legal-domain samples
    (1-3 domains per text, 3-10 keywords each)."""
    rng = np.random.RandomState(seed)
    classes = list(LEGAL_DOMAINS_KEYWORDS)
    texts, labels = [], []
    for _ in range(num_samples):
        nd = rng.randint(1, 4)
        picked = rng.choice(len(classes), size=nd, replace=False)
        parts = []
        for di in picked:
            kws = LEGAL_DOMAINS_KEYWORDS[classes[di]]
            k = min(rng.randint(3, 10), len(kws))
            chosen = rng.choice(len(kws), size=k, replace=False)
            parts.append(" ".join(kws[i] for i in chosen))
        texts.append(" ".join(parts))
        labels.append(sorted(classes[i] for i in picked))
    return texts, labels, classes


def synth_doc_class_data(num_samples: int = 1000, seed: int = 42
                         ) -> tuple[list[str], list[str], list[str]]:
    """English analog over DOC_CLASS_KEYWORDS (sql/streaming/ml/other)
    so a model can score the sandbox documents table: class keywords
    mixed with neutral filler tokens."""
    rng = np.random.RandomState(seed)
    classes = list(DOC_CLASS_KEYWORDS) + ["other"]
    filler = ["the", "a", "of", "runs", "with", "fast", "small", "part",
              "first", "next", "and", "then", "uses", "very", "old"]
    texts, labels = [], []
    for _ in range(num_samples):
        ct = classes[rng.randint(len(classes))]
        words = [filler[i] for i in rng.randint(0, len(filler), size=20)]
        if ct != "other":
            kws = DOC_CLASS_KEYWORDS[ct]
            k = min(rng.randint(3, 8), len(kws))
            chosen = rng.choice(len(kws), size=k, replace=False)
            pos = rng.randint(0, len(words) + 1, size=k)
            for p, i in zip(sorted(pos, reverse=True), chosen):
                words.insert(p, kws[i])
        texts.append(" ".join(words))
        labels.append(ct)
    return texts, labels, classes


def _split(n: int, seed: int, test_frac: float = 0.2
           ) -> tuple[np.ndarray, np.ndarray]:
    """Seeded 80/20 split (the reference uses sklearn train_test_split
    with a fixed random_state; a seeded permutation is the sklearn-free
    equivalent)."""
    perm = np.random.RandomState(seed + 1).permutation(n)
    n_test = max(1, int(n * test_frac))
    return perm[n_test:], perm[:n_test]


def _fit_vectorizer(texts: list[str], token_mode: str,
                    max_features: int, ngram_range: tuple[int, int]
                    ) -> TfidfVectorizer:
    """TF-IDF fit as a Ray Dataset aggregation when a session is up
    (the scale path); plain local fit otherwise (identical vocabulary —
    the unit tests pin that equivalence)."""
    vec = TfidfVectorizer(max_features=max_features, min_df=2,
                          max_df=0.95, ngram_range=ngram_range,
                          token_mode=token_mode)
    try:
        import ray
        import ray.data as rd
        if ray.is_initialized():
            return vec.fit(rd.from_items([{"text": t} for t in texts]))
    except ImportError:  # pragma: no cover
        pass
    return vec.fit(texts)


def train_content_model(model_dir: str, num_samples: int = 1000,
                        seed: int = 42, max_features: int = 5000
                        ) -> tuple[str, dict]:
    """Seeded end-to-end: synthesize -> split -> TF-IDF -> softmax ->
    eval -> save ``content_type_classifier_*.npz``.  Returns
    (artifact path, eval metrics)."""
    texts, labels, classes = synth_content_data(num_samples, seed)
    idx = {c: i for i, c in enumerate(classes)}
    y = np.array([idx[c] for c in labels])
    tr, te = _split(len(texts), seed)
    vec = _fit_vectorizer([texts[i] for i in tr], "persian",
                          max_features, (1, 2))
    w, b = train_softmax(vec.transform([texts[i] for i in tr]), y[tr],
                         len(classes))
    from crawler_ray.ml.model import TextModel
    model = TextModel(vec, w, b, classes, "softmax", {})
    pred = model.predict_label([texts[i] for i in te])
    metrics = evaluate_classification([labels[i] for i in te], pred)
    path = save_model(model_dir, "content_type_classifier_", vec, w, b,
                      classes, "softmax",
                      meta={"seed": seed, "num_samples": num_samples,
                            "accuracy": metrics["accuracy"]})
    return path, metrics


def train_domain_model(model_dir: str, num_samples: int = 1000,
                       seed: int = 42, max_features: int = 8000
                       ) -> tuple[str, dict]:
    """Multi-label domain head (``domain_classifier_*.npz``); eval is
    per-label micro accuracy over the held-out split."""
    texts, labels, classes = synth_domain_data(num_samples, seed)
    idx = {c: i for i, c in enumerate(classes)}
    y = np.zeros((len(texts), len(classes)))
    for i, ls in enumerate(labels):
        for c in ls:
            y[i, idx[c]] = 1.0
    tr, te = _split(len(texts), seed)
    # the reference's DomainFeatures uses 1-3 grams (ml/features.py:1022)
    vec = _fit_vectorizer([texts[i] for i in tr], "persian",
                          max_features, (1, 3))
    w, b = train_ovr_sigmoid(vec.transform([texts[i] for i in tr]),
                             y[tr])
    from crawler_ray.ml.model import TextModel
    model = TextModel(vec, w, b, classes, "sigmoid", {})
    pred = model.predict_multilabel([texts[i] for i in te])
    pred_y = np.zeros_like(y[te])
    for i, ls in enumerate(pred):
        for c in ls:
            pred_y[i, idx[c]] = 1.0
    micro_acc = float((pred_y == y[te]).mean())
    path = save_model(model_dir, "domain_classifier_", vec, w, b,
                      classes, "sigmoid",
                      meta={"seed": seed, "num_samples": num_samples,
                            "micro_accuracy": micro_acc})
    return path, {"micro_accuracy": micro_acc}


def train_doc_class_model(model_dir: str, num_samples: int = 1000,
                          seed: int = 42, max_features: int = 2000
                          ) -> tuple[str, dict]:
    """English doc-class head (``doc_class_classifier_*.npz``) for the
    sandbox documents table."""
    texts, labels, classes = synth_doc_class_data(num_samples, seed)
    idx = {c: i for i, c in enumerate(classes)}
    y = np.array([idx[c] for c in labels])
    tr, te = _split(len(texts), seed)
    vec = _fit_vectorizer([texts[i] for i in tr], "ascii",
                          max_features, (1, 2))
    w, b = train_softmax(vec.transform([texts[i] for i in tr]), y[tr],
                         len(classes))
    from crawler_ray.ml.model import TextModel
    model = TextModel(vec, w, b, classes, "softmax", {})
    pred = model.predict_label([texts[i] for i in te])
    metrics = evaluate_classification([labels[i] for i in te], pred)
    path = save_model(model_dir, "doc_class_classifier_", vec, w, b,
                      classes, "softmax",
                      meta={"seed": seed, "num_samples": num_samples,
                            "accuracy": metrics["accuracy"]})
    return path, metrics
