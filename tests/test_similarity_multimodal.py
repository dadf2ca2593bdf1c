"""ANN recall vs the brute-force baseline (the measured claim in
``ops/similarity.py``) and the multimodal plumbing contracts."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def _recalls(bf, ivf) -> list[float]:
    out = []
    for q in bf["query_id"].unique():
        a = set(bf[bf.query_id == q]["vec_id"])
        b = set(ivf[ivf.query_id == q]["vec_id"])
        out.append(len(a & b) / len(a))
    return out


class TestANN:
    def test_ivf_recall_vs_bruteforce(self):
        from crawler_ray.ops import similarity
        bf = similarity.knn_bruteforce(SF, k=10, n_queries=4).to_pandas()
        ivf = similarity.knn_ivf(SF, k=10, n_queries=4, n_centroids=16,
                                 nprobe=4).to_pandas()
        rec = _recalls(bf, ivf)
        # deterministic fixture: measured 0.7 mean at nprobe=4/16
        assert sum(rec) / len(rec) >= 0.6

    def test_full_probe_equals_bruteforce(self):
        from crawler_ray.ops import similarity
        bf = similarity.knn_bruteforce(SF, k=10, n_queries=4).to_pandas()
        ivf = similarity.knn_ivf(SF, k=10, n_queries=4, n_centroids=16,
                                 nprobe=16).to_pandas()
        key = ["query_id", "rank"]
        assert (bf.sort_values(key).reset_index(drop=True)[
                    ["query_id", "vec_id", "rank"]].equals(
                ivf.sort_values(key).reset_index(drop=True)[
                    ["query_id", "vec_id", "rank"]]))

    def test_recall_monotone_in_nprobe(self):
        from crawler_ray.ops import similarity
        bf = similarity.knn_bruteforce(SF, k=10, n_queries=4).to_pandas()
        means = []
        for nprobe in (2, 8):
            ivf = similarity.knn_ivf(SF, k=10, n_queries=4,
                                     n_centroids=16,
                                     nprobe=nprobe).to_pandas()
            rec = _recalls(bf, ivf)
            means.append(sum(rec) / len(rec))
        assert means[1] >= means[0]


class TestMultimodal:
    def test_payload_meta_counts_bytes(self):
        import pyarrow.parquet as pq

        from crawler_ray.ops import multimodal
        out = multimodal.payload_meta(SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        truth = {r.doc_id: len(r.text.encode("utf-8"))
                 for r in docs.itertuples()}
        assert len(out) == len(docs)
        assert all(truth[r.doc_id] == r.n_bytes
                   for r in out.itertuples())

    def test_fake_decode_deterministic(self):
        from crawler_ray.ops import multimodal
        a = multimodal.payload_features(SF).to_pandas()
        b = multimodal.payload_features(SF).to_pandas()
        cols = sorted(c for c in a.columns if c != "features")
        assert a[cols].sort_values("doc_id").reset_index(drop=True).equals(
            b[cols].sort_values("doc_id").reset_index(drop=True))
        assert (a["width"] > 0).all() and (a["height"] > 0).all()

    def test_real_decode_is_marked_stub(self):
        from crawler_ray.ops.multimodal import RealImageDecode
        with pytest.raises(NotImplementedError):
            RealImageDecode()
