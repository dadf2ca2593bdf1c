"""sklearn ``.pkl`` artifact import (``ml/sklearn_compat.py``).

sklearn is not installed here (that is the point of the converter), so
the tests manufacture pickles with the exact module paths and attribute
layout the reference's training scripts persist
(``ml/training/train_content_model.py:304-320``): fake ``sklearn.*`` /
``scipy.*`` modules are registered only while PICKLING, then removed —
loading must succeed with no sklearn anywhere.
"""

from __future__ import annotations

import pickle
import sys
import types

import numpy as np
import pytest

from crawler_ray.ml.sklearn_compat import (convert_linear_model,
                                           convert_vectorizer,
                                           import_sklearn_artifact,
                                           load_sklearn_pickle)


def _fake_modules():
    """Register fake sklearn/scipy modules; returns the class map."""
    spec = {
        "sklearn.linear_model._logistic": ["LogisticRegression"],
        "sklearn.svm._classes": ["LinearSVC"],
        "sklearn.ensemble._forest": ["RandomForestClassifier"],
        "sklearn.preprocessing._label": ["LabelEncoder"],
        "sklearn.feature_extraction.text": ["TfidfVectorizer",
                                            "TfidfTransformer"],
        "scipy.sparse._csr": ["csr_matrix"],
    }
    classes = {}
    for modname, names in spec.items():
        parts = modname.split(".")
        for i in range(1, len(parts) + 1):
            prefix = ".".join(parts[:i])
            if prefix not in sys.modules:
                sys.modules[prefix] = types.ModuleType(prefix)
        mod = sys.modules[modname]
        for name in names:
            cls = type(name, (), {"__module__": modname})
            setattr(mod, name, cls)
            classes[name] = cls
    return classes


def _cleanup_modules():
    for m in list(sys.modules):
        if m == "sklearn" or m.startswith("sklearn.") \
                or m == "scipy" or m.startswith("scipy."):
            del sys.modules[m]


@pytest.fixture()
def artifacts(tmp_path):
    """(model_pkl, features_pkl, W, b, classes, vocab, idf) built with
    fake sklearn modules that are GONE by the time the test body runs."""
    classes_map = _fake_modules()
    try:
        rng = np.random.RandomState(5)
        vocab = {t: i for i, t in enumerate(
            ["alpha", "beta", "gamma", "delta", "epsilon"])}
        idf = rng.uniform(1.0, 3.0, size=len(vocab))
        w = rng.randn(3, len(vocab))
        b = rng.randn(3)
        names = ["news", "law", "qa"]

        lr = classes_map["LogisticRegression"]()
        lr.coef_, lr.intercept_ = w, b
        lr.classes_ = np.arange(3)
        le = classes_map["LabelEncoder"]()
        le.classes_ = np.array(names)
        package = {
            "model": lr, "params": {"C": 1.0}, "cv_results": None,
            "type": "logistic", "label_encoder": le,
            "content_types": names, "timestamp": "t",
        }
        diag = classes_map["csr_matrix"]()
        diag.data = idf.copy()
        diag.indices = np.arange(len(vocab), dtype=np.int32)
        tfidf = classes_map["TfidfTransformer"]()
        tfidf._idf_diag = diag
        vec = classes_map["TfidfVectorizer"]()
        vec.vocabulary_ = {k: np.int64(v) for k, v in vocab.items()}
        vec._tfidf = tfidf

        model_pkl = tmp_path / "content_type_classifier_x.pkl"
        features_pkl = tmp_path / "content_type_features.pkl"
        model_pkl.write_bytes(pickle.dumps(package))
        features_pkl.write_bytes(pickle.dumps(vec))
    finally:
        _cleanup_modules()
    return (str(model_pkl), str(features_pkl), w, b, names, vocab, idf)


def test_loads_without_sklearn(artifacts):
    model_pkl, _, w, b, names, _, _ = artifacts
    assert not any(m.startswith("sklearn") for m in sys.modules)
    pkg = load_sklearn_pickle(model_pkl)
    got_w, got_b, got_classes = convert_linear_model(pkg)
    np.testing.assert_array_equal(got_w, w)
    np.testing.assert_array_equal(got_b, b)
    assert got_classes == names


def test_vectorizer_state_recovered(artifacts):
    _, features_pkl, _, _, _, vocab, idf = artifacts
    vec = convert_vectorizer(load_sklearn_pickle(features_pkl))
    assert vec.vocab == vocab
    np.testing.assert_allclose(vec.idf, idf)


def test_end_to_end_artifact_predicts_like_sklearn_head(artifacts,
                                                        tmp_path):
    model_pkl, features_pkl, w, b, names, _, _ = artifacts
    out = import_sklearn_artifact(model_pkl, features_pkl,
                                  str(tmp_path / "models"), "imported_")
    from crawler_ray.ml.model import ModelClassifier, load_model
    model = load_model(out)
    texts = ["alpha beta beta", "gamma delta", "epsilon epsilon alpha",
             ""]
    # parity claim: given the same features, argmax(Wx+b) == sklearn's
    # multi-class decision rule
    x = model.vec.transform(texts)
    want = [names[i] for i in (x @ w.T + b).argmax(axis=1)]
    assert model.predict_label(texts) == want
    # and the artifact is discoverable + scoreable as a stage
    clf = ModelClassifier(model_dir=str(tmp_path / "models"),
                          prefix="imported_")
    import pyarrow as pa
    got = clf(pa.table({"text": pa.array(texts, pa.string())}))
    assert got["pred_class"].to_pylist() == want


def test_binary_estimator_expands_with_sign_convention(tmp_path):
    classes_map = _fake_modules()
    try:
        svc = classes_map["LinearSVC"]()
        svc.coef_ = np.array([[1.0, -2.0]])
        svc.intercept_ = np.array([0.5])
        svc.classes_ = np.array(["neg", "pos"])
        raw = pickle.dumps({"model": svc, "type": "svm"})
    finally:
        _cleanup_modules()
    w, b, classes = convert_linear_model(load_sklearn_pickle(raw))
    assert classes == ["neg", "pos"]
    # decision f(x) = x@coef + intercept: f>0 -> pos, f<=0 -> neg
    for x, want in [(np.array([2.0, 0.0]), "pos"),
                    (np.array([0.0, 1.0]), "neg"),
                    (np.array([-0.5, 0.0]), "neg")]:  # f == 0: ties -> neg
        z = w @ x + b
        assert classes[int(z.argmax())] == want


def test_forest_rejected(tmp_path):
    classes_map = _fake_modules()
    try:
        rf = classes_map["RandomForestClassifier"]()
        rf.n_estimators = 100
        raw = pickle.dumps({"model": rf, "type": "forest"})
    finally:
        _cleanup_modules()
    with pytest.raises(NotImplementedError, match="RandomForest"):
        convert_linear_model(load_sklearn_pickle(raw))


def test_hostile_pickle_rejected():
    import posixpath
    hostile = pickle.dumps(posixpath.join)  # non-allowlisted module
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        load_sklearn_pickle(hostile)
    # builtins is NOT wholesale-allowed: eval/exec/__import__ must be
    # refused (a hand-built GLOBAL opcode for builtins.eval)
    for name in (b"eval", b"exec", b"__import__", b"getattr"):
        payload = b"cbuiltins\n" + name + b"\n."
        with pytest.raises(pickle.UnpicklingError, match="refusing"):
            load_sklearn_pickle(payload)
    # numpy is NOT wholesale-allowed either: its file-touching
    # callables (save/load/fromfile) must be refused even though the
    # array-reconstruction globals next to them are allowed
    for mod, name in ((b"numpy", b"save"), (b"numpy", b"load"),
                      (b"numpy", b"fromfile"),
                      (b"numpy.core.multiarray", b"fromfile"),
                      (b"numpy.lib.npyio", b"save")):
        payload = b"c" + mod + b"\n" + name + b"\n."
        with pytest.raises(pickle.UnpicklingError, match="refusing"):
            load_sklearn_pickle(payload)


def test_encoder_order_wins_over_stored_list(tmp_path):
    """coef_ rows follow LabelEncoder order (sorted), not the stored
    content_types order — a permuted stored list must not permute
    predictions, and a mismatched SET must raise."""
    classes_map = _fake_modules()
    try:
        lr = classes_map["LogisticRegression"]()
        lr.coef_ = np.eye(3)
        lr.intercept_ = np.zeros(3)
        lr.classes_ = np.arange(3)
        le = classes_map["LabelEncoder"]()
        le.classes_ = np.array(["law", "news", "qa"])  # sorted (sklearn)
        raw = pickle.dumps({"model": lr, "label_encoder": le,
                            "content_types": ["news", "law", "qa"]})
        bad = pickle.dumps({"model": lr, "label_encoder": le,
                            "content_types": ["news", "OTHER", "qa"]})
    finally:
        _cleanup_modules()
    _, _, classes = convert_linear_model(load_sklearn_pickle(raw))
    assert classes == ["law", "news", "qa"]  # encoder order, not stored
    with pytest.raises(ValueError, match="does not match"):
        convert_linear_model(load_sklearn_pickle(bad))
