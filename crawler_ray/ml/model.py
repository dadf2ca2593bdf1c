"""Numpy logistic models + on-disk artifact store (SURVEY §2 F6/O8).

The reference trains sklearn models offline and discovers the newest
pickled artifact by mtime at classifier startup
(``core/classifier.py:154-179`` ``_find_latest_model``;
``core/classifier.py:268-293`` predict).  sklearn is unavailable here,
so the models are plain numpy: full-batch gradient-descent softmax
regression for single-label heads and one-vs-rest sigmoid heads for
multi-label, both deterministic (zero init, fixed iteration count — no
RNG in training itself).  Artifacts are ``.npz`` files
(``allow_pickle=False`` — no code execution on load, unlike pickle)
holding the weight matrices, the TF-IDF vocabulary/idf, the class names
and a meta record; discovery keeps the reference's newest-by-mtime rule.
"""

from __future__ import annotations

import json
import os

import numpy as np

from crawler_ray.ml.tfidf import TfidfVectorizer

__all__ = ["train_softmax", "train_ovr_sigmoid", "save_model",
           "load_model", "find_latest_model", "TextModel",
           "ModelClassifier"]


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def train_softmax(x: np.ndarray, y: np.ndarray, n_classes: int,
                  iters: int = 300, lr: float = 2.0,
                  l2: float = 1e-4) -> tuple[np.ndarray, np.ndarray]:
    """Multinomial logistic regression, full-batch GD.  Deterministic:
    zero init, fixed step count.  Returns (W (k, d), b (k,))."""
    n, d = x.shape
    w = np.zeros((n_classes, d))
    b = np.zeros(n_classes)
    onehot = np.zeros((n, n_classes))
    onehot[np.arange(n), y] = 1.0
    for _ in range(iters):
        p = _softmax(x @ w.T + b)
        g = (p - onehot) / n              # (n, k)
        w -= lr * (g.T @ x + l2 * w)
        b -= lr * g.sum(axis=0)
    return w, b


def train_ovr_sigmoid(x: np.ndarray, y: np.ndarray,
                      iters: int = 300, lr: float = 2.0,
                      l2: float = 1e-4) -> tuple[np.ndarray, np.ndarray]:
    """One-vs-rest sigmoid heads for multi-label targets
    (y is (n, k) in {0,1}).  Returns (W (k, d), b (k,))."""
    n, d = x.shape
    k = y.shape[1]
    w = np.zeros((k, d))
    b = np.zeros(k)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(x @ w.T + b)))
        g = (p - y) / n
        w -= lr * (g.T @ x + l2 * w)
        b -= lr * g.sum(axis=0)
    return w, b


# -- artifacts ----------------------------------------------------------------

def save_model(model_dir: str, prefix: str, vec: TfidfVectorizer,
               w: np.ndarray, b: np.ndarray, classes: list[str],
               head: str, meta: dict | None = None,
               tag: str | None = None) -> str:
    """Write ``<prefix><tag>.npz`` atomically.  ``head`` is ``softmax``
    (single-label argmax) or ``sigmoid`` (multi-label thresholds)."""
    os.makedirs(model_dir, exist_ok=True)
    if tag is None:
        # max existing numeric tag + 1 (NOT a count: with gaps or
        # explicit tags a count would collide and os.replace would
        # silently clobber the surviving artifact)
        taken = -1
        for f in os.listdir(model_dir):
            if f.startswith(prefix) and f.endswith(".npz"):
                stem = f[len(prefix):-len(".npz")]
                if stem.isdigit():
                    taken = max(taken, int(stem))
        tag = f"{taken + 1:04d}"
    payload = dict(vec.state())
    payload.update({
        "w": w, "b": b,
        "classes": np.array(classes, dtype=np.str_),
        "meta_json": np.array([json.dumps(
            {"head": head, **(meta or {})}, sort_keys=True)],
            dtype=np.str_),
    })
    path = os.path.join(model_dir, f"{prefix}{tag}.npz")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)
    return path


def load_model(path: str) -> "TextModel":
    with np.load(path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    vec = TfidfVectorizer.from_state(arrays)
    meta = json.loads(str(arrays["meta_json"][0]))
    return TextModel(vec=vec,
                     w=np.asarray(arrays["w"], dtype=np.float64),
                     b=np.asarray(arrays["b"], dtype=np.float64),
                     classes=[str(c) for c in arrays["classes"]],
                     head=meta["head"], meta=meta)


def find_latest_model(model_dir: str, prefix: str) -> str | None:
    """Newest artifact with the prefix, by file mtime descending —
    exactly the reference's discovery rule
    (``core/classifier.py:154-179``)."""
    if not os.path.isdir(model_dir):
        return None
    matching = [f for f in os.listdir(model_dir)
                if f.startswith(prefix) and f.endswith(".npz")]
    if not matching:
        return None
    matching.sort(key=lambda f: os.path.getmtime(
        os.path.join(model_dir, f)), reverse=True)
    return os.path.join(model_dir, matching[0])


class TextModel:
    """A loaded artifact: featurize + score in one call."""

    def __init__(self, vec: TfidfVectorizer, w: np.ndarray, b: np.ndarray,
                 classes: list[str], head: str, meta: dict):
        self.vec = vec
        self.w = w
        self.b = b
        self.classes = classes
        self.head = head
        self.meta = meta

    def scores(self, texts: list[str]) -> np.ndarray:
        x = self.vec.transform(texts)
        z = x @ self.w.T + self.b
        if self.head == "softmax":
            return _softmax(z)
        return 1.0 / (1.0 + np.exp(-z))

    def predict_label(self, texts: list[str]) -> list[str]:
        """Single label per text: argmax probability, first-index wins
        ties (class order is the training-time dictionary order, same
        tie-break as the keyword scorer)."""
        p = self.scores(texts)
        return [self.classes[i] for i in p.argmax(axis=1)]

    def predict_multilabel(self, texts: list[str],
                           threshold: float = 0.5
                           ) -> list[list[str]]:
        """Labels over threshold, ranked by probability descending then
        name (the reference sorts predictions by probability,
        ``core/classifier.py:242-243``)."""
        p = self.scores(texts)
        out = []
        for row in p:
            hits = [(float(row[i]), self.classes[i])
                    for i in range(len(self.classes))
                    if row[i] > threshold]
            hits.sort(key=lambda sv: (-sv[0], sv[1]))
            out.append([name for _, name in hits])
        return out


class ModelClassifier:
    """Actor-pool scoring stage: loads the artifact ONCE per actor in
    ``__init__`` (F5/F6 pattern), scores batches in ``__call__``.
    ``model_path`` may be a concrete artifact or ``(model_dir, prefix)``
    discovery (newest by mtime, O8)."""

    def __init__(self, model_path: str | None = None,
                 model_dir: str | None = None,
                 prefix: str | None = None,
                 text_col: str = "text", out_col: str = "pred_class"):
        if model_path is None:
            model_path = find_latest_model(model_dir, prefix)
            if model_path is None:
                raise FileNotFoundError(
                    f"no model artifact matching {prefix!r} in "
                    f"{model_dir!r}")
        self.model = load_model(model_path)
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch):
        import pyarrow as pa
        preds = self.model.predict_label(
            batch[self.text_col].to_pylist())
        return batch.append_column(self.out_col,
                                   pa.array(preds, pa.string()))
