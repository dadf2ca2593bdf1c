"""Model-backed classification (SURVEY §2 F6/O8/A11): TF-IDF semantics,
seeded end-to-end training, newest-artifact discovery, and the
model-backed classify_docs variant."""

from __future__ import annotations

import math
import os
import time

import numpy as np
import pytest

from crawler_ray.ml.model import (ModelClassifier, find_latest_model,
                                  load_model, save_model, train_softmax)
from crawler_ray.ml.tfidf import TfidfVectorizer
from crawler_ray.ml.training import (synth_doc_class_data,
                                     train_content_model,
                                     train_doc_class_model,
                                     train_domain_model)

pytestmark = pytest.mark.usefixtures("ray_session")


# -- TF-IDF semantics ---------------------------------------------------------

def test_tfidf_hand_computed():
    """Pin the sklearn-default math on a tiny corpus: smooth idf
    ln((1+n)/(1+df)) + 1, raw-count tf, l2 row normalization."""
    texts = ["a b a", "a c", "b c c"]
    vec = TfidfVectorizer(max_features=10, min_df=1, max_df=1.0,
                          ngram_range=(1, 1), token_mode="ascii")
    vec.fit(texts)
    assert set(vec.vocab) == {"a", "b", "c"}
    # indices are sorted-term order
    assert vec.vocab == {"a": 0, "b": 1, "c": 2}
    n = 3
    idf = {t: math.log((1 + n) / (1 + df)) + 1
           for t, df in {"a": 2, "b": 2, "c": 2}.items()}
    x = vec.transform(["a b a"])
    raw = np.array([2 * idf["a"], 1 * idf["b"], 0.0])
    expect = raw / np.linalg.norm(raw)
    assert np.allclose(x[0], expect)


def test_tfidf_min_df_max_features_and_ngrams():
    texts = ["x y", "x y", "x z", "x w"]
    vec = TfidfVectorizer(max_features=2, min_df=2, max_df=1.0,
                          ngram_range=(1, 2), token_mode="ascii")
    vec.fit(texts)
    # df: x=4, y=2, 'x y'=2, z/w/x-z/x-w=1 (dropped by min_df);
    # max_features=2 keeps the top-2 by corpus frequency: x (4), then
    # tie y vs 'x y' (both 2) -> term-ascending keeps 'x y'
    assert set(vec.vocab) == {"x", "x y"}


def test_tfidf_distributed_fit_matches_local():
    """The Ray-aggregate fit and the local fit must produce the same
    vocabulary and idf (partitioning cannot change the model)."""
    import ray.data as rd

    texts, _, _ = synth_doc_class_data(num_samples=200, seed=5)
    local = TfidfVectorizer(max_features=300, ngram_range=(1, 2),
                            token_mode="ascii").fit(texts)
    ds = rd.from_items([{"text": t} for t in texts]).repartition(7)
    dist = TfidfVectorizer(max_features=300, ngram_range=(1, 2),
                           token_mode="ascii").fit(ds)
    assert local.vocab == dist.vocab
    assert np.allclose(local.idf, dist.idf)


# -- training end-to-end ------------------------------------------------------

def test_train_content_model_accuracy_and_determinism(tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    path1, metrics1 = train_content_model(d1, num_samples=400, seed=42)
    path2, metrics2 = train_content_model(d2, num_samples=400, seed=42)
    assert metrics1["accuracy"] >= 0.9, metrics1
    m1, m2 = load_model(path1), load_model(path2)
    # same seed -> bit-identical artifact contents
    assert m1.classes == m2.classes
    assert m1.vec.vocab == m2.vec.vocab
    assert np.array_equal(m1.w, m2.w)


def test_train_domain_model_multilabel(tmp_path):
    path, metrics = train_domain_model(str(tmp_path), num_samples=400,
                                       seed=42)
    assert metrics["micro_accuracy"] >= 0.9, metrics
    m = load_model(path)
    # a civil-keywords text must rank 'civil' first
    pred = m.predict_multilabel(["قرارداد عقد معامله ارث وصیت"])
    assert pred[0] and pred[0][0] == "civil", pred


def test_find_latest_model_picks_newest(tmp_path):
    """O8 parity: newest artifact by mtime wins
    (``core/classifier.py:154-179``)."""
    d = str(tmp_path)
    texts = ["a b", "a c", "b c"]
    vec = TfidfVectorizer(max_features=5, min_df=1,
                          token_mode="ascii").fit(texts)
    x = vec.transform(texts)
    w, b = train_softmax(x, np.array([0, 1, 1]), 2, iters=5)
    p1 = save_model(d, "m_", vec, w, b, ["x", "y"], "softmax",
                    tag="0000")
    p2 = save_model(d, "m_", vec, w, b, ["x", "y"], "softmax",
                    tag="0001")
    now = time.time()
    os.utime(p1, (now, now))
    os.utime(p2, (now - 100, now - 100))
    assert find_latest_model(d, "m_") == p1
    os.utime(p2, (now + 100, now + 100))
    assert find_latest_model(d, "m_") == p2
    assert find_latest_model(d, "nope_") is None


def test_save_model_auto_tag_never_clobbers(tmp_path):
    """Auto tags continue past the max existing tag — a surviving
    higher-numbered artifact (gap from a deleted 0000, or an explicit
    tag) must not be silently overwritten."""
    d = str(tmp_path)
    texts = ["a b", "a c", "b c"]
    vec = TfidfVectorizer(max_features=5, min_df=1,
                          token_mode="ascii").fit(texts)
    x = vec.transform(texts)
    w, b = train_softmax(x, np.array([0, 1, 1]), 2, iters=5)
    p1 = save_model(d, "m_", vec, w, b, ["x", "y"], "softmax",
                    tag="0001")
    p2 = save_model(d, "m_", vec, w, b, ["x", "y"], "softmax")
    assert p2 != p1 and p2.endswith("m_0002.npz")
    os.remove(p1)
    p3 = save_model(d, "m_", vec, w, b, ["x", "y"], "softmax")
    assert p3.endswith("m_0003.npz")
    # non-numeric stems are ignored, not crashed on
    open(os.path.join(d, "m_custom.npz"), "wb").close()
    p4 = save_model(d, "m_", vec, w, b, ["x", "y"], "softmax")
    assert p4.endswith("m_0004.npz")


def test_model_classifier_batch_and_agreement(tmp_path):
    """The trained doc-class model must agree with the keyword-count
    argmax on keyword-dominated synthetic docs (the two paths share
    semantics when the signal is unambiguous)."""
    import pyarrow as pa

    path, metrics = train_doc_class_model(str(tmp_path),
                                          num_samples=600, seed=42)
    assert metrics["accuracy"] >= 0.9, metrics
    clf = ModelClassifier(model_path=path)
    batch = pa.table({"text": pa.array([
        "query table join scan filter sort query table",
        "stream window watermark event batch state stream",
        "vector model train embed feature label vector",
        # keyword-free filler drawn from the training distribution
        "the a of runs with fast small part first next and then",
    ])})
    out = clf(batch)
    assert out["pred_class"].to_pylist() == ["sql", "streaming", "ml",
                                             "other"]


def test_classify_docs_model_query(tmp_path):
    """Driver-facing operator: trains on first use into model_dir, then
    scores the documents table distributed; one row per doc, stable
    schema, deterministic across runs."""
    from crawler_ray.ops.textstats import classify_docs_model

    sf = "/root/testdata/sf0.001"
    d = str(tmp_path)
    df1 = (classify_docs_model(sf, model_dir=d).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(df1.columns) == ["doc_id", "pred_class"]
    import pyarrow.parquet as pq
    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert len(df1) == n_docs
    assert set(df1["pred_class"]) <= {"sql", "streaming", "ml", "other"}
    # second call reuses the artifact (no retrain) and reproduces output
    df2 = (classify_docs_model(sf, model_dir=d).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert df1.equals(df2)
    assert len([f for f in os.listdir(d)
                if f.startswith("doc_class_classifier_")]) == 1


def test_keyword_classifier_model_backed(tmp_path):
    """KeywordClassifier with artifact paths swaps in the model heads
    (the crawl-facing F6 surface)."""
    import pyarrow as pa

    from crawler_ray.functions.classify import KeywordClassifier

    cpath, _ = train_content_model(str(tmp_path), num_samples=400,
                                   seed=42)
    dpath, _ = train_domain_model(str(tmp_path), num_samples=400,
                                  seed=42)
    clf = KeywordClassifier(content_model_path=cpath,
                            domain_model_path=dpath)
    batch = pa.table({"content": pa.array(
        ["سوال مربوط به موضوع حقوقی چیست؟ چرا و چگونه؟",
         "قرارداد عقد معامله ارث وصیت مهریه طلاق"])})
    out = clf(batch)
    assert out["content_type"].to_pylist()[0] == "question"
    assert "civil" in out["domains"].to_pylist()[1]


def test_classify_docs_model_planted_labels(tmp_path):
    """Content-level twin for the driver's rows-only
    ``classify_docs_model`` entry: the seeded model trained at fixture
    scale must produce EXACT labels for planted keyword-dominated docs
    THROUGH the driver op itself (not just the bare classifier), so the
    CORRECTNESS row has a value-level pytest pin."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.ops.textstats import classify_docs_model

    sf = tmp_path / "sf"
    sf.mkdir()
    texts = [
        "query table join scan filter sort query table",      # sql
        "stream window watermark event batch state stream",   # streaming
        "vector model train embed feature label vector",      # ml
        "the a of runs with fast small part first next and then",  # other
        "join join scan scan filter table query sort",        # sql
        "embed embed feature label train model",              # ml
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(sf / "documents.parquet"))

    out = (classify_docs_model(str(sf), model_dir=str(tmp_path / "m"))
           .to_pandas().sort_values("doc_id"))
    assert out["pred_class"].tolist() == [
        "sql", "streaming", "ml", "other", "sql", "ml"]
