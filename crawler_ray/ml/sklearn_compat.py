"""sklearn ``.pkl`` artifact import — migration path for reference users.

The reference trains sklearn models offline and persists them as
pickles: a ``model_package`` dict holding the estimator, a
LabelEncoder and the class names (``ml/training/train_content_model.py
:304-320``, ``train_domain_model.py:288-306``), plus a separately
pickled TF-IDF feature extractor (``ml/features.py``).  This engine's
model format is the no-code-execution ``.npz`` artifact
(``ml/model.py``); a reference user migrating real ``.pkl`` artifacts
needs a converter — and sklearn is not installable here, so the
converter CANNOT unpickle the real classes.

Instead ``load_sklearn_pickle`` runs a RESTRICTED unpickler:

- ``sklearn.*`` / ``scipy.*`` classes resolve to attribute-bag stubs
  (their pickled ``__setstate__`` dicts / reduce args are captured,
  never executed),
- the exact numpy array-reconstruction globals / stdlib container
  names that such pickles emit are allowed (that is how the weight
  arrays are stored),
- anything else raises — a hostile pickle cannot import arbitrary
  modules through this loader (unlike the reference's bare
  ``pickle.load``).

``convert_linear_model`` then walks the captured object graph for the
linear-estimator attributes (``coef_``, ``intercept_``, class names)
and maps them onto this engine's ``softmax`` head: for single-label
prediction ``argmax(W x + b)`` is invariant under the softmax, so a
converted LogisticRegression / LinearSVC predicts the same label the
sklearn estimator's decision rule picks (binary estimators are
expanded to two rows with the sklearn sign convention: zero margin
predicts ``classes_[0]``).  RandomForest artifacts are rejected with
``NotImplementedError`` — there is no linear equivalent.

``convert_vectorizer`` maps a pickled sklearn TfidfVectorizer's
``vocabulary_`` + idf vector onto this engine's ``TfidfVectorizer``
state.  NOTE: transform parity then depends on tokenization parity —
sklearn's default analyzer differs from this engine's tokenizer, so
the import preserves the vocabulary and idf weights (the learned
state) while tokenization follows the target ``token_mode``.
"""

from __future__ import annotations

import io
import pickle

import numpy as np

__all__ = ["load_sklearn_pickle", "convert_linear_model",
           "convert_vectorizer", "import_sklearn_artifact"]

_STUB_PREFIXES = ("sklearn.", "scipy.")
# exact (module, name) pairs that may load for real.  No whole module
# roots: builtins holds eval/exec/__import__, and even numpy holds
# file-touching callables (numpy.save / numpy.load / numpy.fromfile)
# a hostile REDUCE opcode could invoke — only the array-reconstruction
# globals that numpy pickles actually emit are allowed (verified by
# capturing find_class over ndarray/scalar/dtype/structured pickles at
# protocols 2-5; the ``_core`` spellings cover numpy >= 2 artifacts).
_ALLOWED_GLOBALS = {
    ("builtins", n) for n in
    ("set", "frozenset", "complex", "bytearray", "range", "slice",
     "bool", "int", "float", "str", "bytes", "list", "tuple", "dict")
} | {
    ("collections", "OrderedDict"), ("collections", "defaultdict"),
    ("collections", "Counter"), ("datetime", "datetime"),
    ("datetime", "date"), ("datetime", "timedelta"),
    ("copyreg", "_reconstructor"), ("_codecs", "encode"),
    ("numpy", "ndarray"), ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy.core.numeric", "_frombuffer"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("numpy._core.numeric", "_frombuffer"),
}


class _Stub:
    """Attribute bag standing in for an sklearn/scipy class: captures
    constructor args and pickled state, executes nothing."""

    def __init__(self, *args, **kwargs):
        self._args = args
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self._state = state

    # scipy sparse matrices unpickle via obj.__dict__ updates only; a
    # few sklearn objects call methods post-restore — fail loudly if so
    def __getattr__(self, name):  # only fires when attribute is absent
        raise AttributeError(name)


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if any(module == p[:-1] or module.startswith(p)
               for p in _STUB_PREFIXES):
            return type(name, (_Stub,), {"_module": module})
        if (module, name) in _ALLOWED_GLOBALS:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name}: only numpy "
            f"array reconstruction, an explicit container/codec "
            f"allowlist, and sklearn/scipy stubs are allowed")


def load_sklearn_pickle(path_or_bytes) -> object:
    """Unpickle a reference artifact with sklearn/scipy classes
    replaced by attribute-bag stubs (see module docstring)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return _RestrictedUnpickler(io.BytesIO(path_or_bytes)).load()
    with open(path_or_bytes, "rb") as f:
        return _RestrictedUnpickler(f).load()


def _walk(obj, seen=None):
    """Yield every stub / dict node in the captured object graph."""
    if seen is None:
        seen = set()
    if id(obj) in seen:
        return
    seen.add(id(obj))
    if isinstance(obj, _Stub):
        yield obj
        yield from _walk(obj.__dict__, seen)
    elif isinstance(obj, dict):
        yield obj
        for v in obj.values():
            yield from _walk(v, seen)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            yield from _walk(v, seen)


def _class_names(pkg) -> list[str] | None:
    """Class names IN COEF ROW ORDER.  The reference trains on
    ``label_encoder.transform(y)``, so ``coef_`` row ``i`` is
    ``label_encoder.classes_[i]`` — the encoder's (sorted) order is
    authoritative, never the stored ``content_types`` list's order.
    We prefer a STRING-dtype ``classes_`` (the encoder's; the
    estimator's own ``classes_`` is the integer-transformed one), fall
    back to the stored list, and fail loudly if the two disagree as
    SETS (a mismatched artifact)."""
    stored = None
    if isinstance(pkg, dict):
        for key in ("content_types", "domains", "classes"):
            val = pkg.get(key)
            if val is not None:
                stored = [str(c) for c in val]
                break
    encoder = None
    for node in _walk(pkg):
        if isinstance(node, _Stub) and hasattr(node, "classes_"):
            arr = np.asarray(node.classes_)
            if arr.dtype.kind in ("U", "S", "O"):
                encoder = [str(c) for c in arr]
                break
    if encoder is not None:
        if stored is not None and set(stored) != set(encoder):
            raise ValueError(
                f"stored class list {stored} does not match the "
                f"LabelEncoder's classes_ {encoder}")
        return encoder
    return stored


def convert_linear_model(pkg) -> tuple[np.ndarray, np.ndarray,
                                       list[str]]:
    """(W, b, classes) from a captured reference model package (or a
    bare estimator stub).  Binary estimators expand to two softmax
    rows with the sklearn sign convention."""
    est = pkg.get("model") if isinstance(pkg, dict) else pkg
    for node in _walk(est):
        if isinstance(node, _Stub) and hasattr(node, "coef_"):
            est = node
            break
    else:
        mod = getattr(est, "_module", type(pkg).__name__)
        if "forest" in str(mod).lower() or (
                isinstance(pkg, dict)
                and str(pkg.get("type", "")).lower() == "forest"):
            raise NotImplementedError(
                "RandomForest artifacts have no linear-head equivalent; "
                "retrain with crawler_ray.ml.training instead")
        raise ValueError("no linear estimator (coef_) found in pickle")

    w = np.asarray(est.coef_, dtype=np.float64)
    b = np.asarray(est.intercept_, dtype=np.float64).ravel()
    classes = _class_names(pkg)
    if classes is None and hasattr(est, "classes_"):
        classes = [str(c) for c in np.asarray(est.classes_)]
    if classes is None:
        raise ValueError("no class names found in pickle")
    if w.ndim == 1:
        w = w[None, :]
    if w.shape[0] == 1 and len(classes) == 2:
        # sklearn binary rule: decision > 0 -> classes_[1]; argmax with
        # first-index tie-break gives classes_[0] at zero margin — same
        w = np.vstack([np.zeros_like(w[0]), w[0]])
        b = np.array([0.0, float(b[0])])
    if w.shape[0] != len(classes):
        raise ValueError(
            f"coef_ rows ({w.shape[0]}) != classes ({len(classes)})")
    return w, b, classes


def convert_vectorizer(vec_pkg, token_mode: str = "word",
                       ngram_range: tuple[int, int] = (1, 1)):
    """Engine TfidfVectorizer from a pickled sklearn TfidfVectorizer's
    learned state (``vocabulary_`` + idf vector; the idf lives either
    on ``idf_`` or inside the TfidfTransformer's ``_idf_diag`` sparse
    diagonal, whose pickled data array we captured)."""
    from crawler_ray.ml.tfidf import TfidfVectorizer

    vocab = None
    idf = None
    for node in _walk(vec_pkg):
        if isinstance(node, _Stub):
            if vocab is None and hasattr(node, "vocabulary_"):
                vocab = {str(k): int(v)
                         for k, v in dict(node.vocabulary_).items()}
            if idf is None and hasattr(node, "idf_"):
                idf = np.asarray(node.idf_, dtype=np.float64)
    if vocab is None:
        raise ValueError("no vocabulary_ found in vectorizer pickle")
    if idf is None:
        # sklearn stores idf as a sparse diagonal: find a float array
        # of exactly vocab size in the captured graph
        for node in _walk(vec_pkg):
            if isinstance(node, _Stub):
                data = getattr(node, "data", None)
                if (isinstance(data, np.ndarray)
                        and data.dtype.kind == "f"
                        and data.size == len(vocab)):
                    idf = np.asarray(data, dtype=np.float64).ravel()
                    break
    if idf is None:
        raise ValueError("no idf vector of vocabulary size found")

    v = TfidfVectorizer(max_features=len(vocab), min_df=1, max_df=1.0,
                        ngram_range=ngram_range, token_mode=token_mode)
    v.vocab = vocab
    v.idf = idf
    v.n_docs = -1  # unknown from the artifact; transform never uses it
    return v


def import_sklearn_artifact(model_pkl: str, features_pkl: str,
                            model_dir: str, prefix: str,
                            token_mode: str = "word") -> str:
    """One-call migration: reference ``.pkl`` pair -> engine ``.npz``
    artifact (discoverable by ``find_latest_model``, scoreable by
    ``ModelClassifier``).  Returns the written artifact path."""
    from crawler_ray.ml.model import save_model

    pkg = load_sklearn_pickle(model_pkl)
    w, b, classes = convert_linear_model(pkg)
    vec = convert_vectorizer(load_sklearn_pickle(features_pkl),
                             token_mode=token_mode)
    if w.shape[1] != len(vec.vocab):
        raise ValueError(
            f"model expects {w.shape[1]} features, vectorizer has "
            f"{len(vec.vocab)} — mismatched artifact pair")
    return save_model(model_dir, prefix, vec, w, b, classes,
                      head="softmax",
                      meta={"imported_from": "sklearn-pkl"})
