"""Near-dup detection quality: the LSH/SimHash internals are
engine-internal (rows-only in the driver gate), so this locks their
*behavior* — planted near-duplicates must be found, unrelated docs must
not collide."""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.ops import dedup

pytestmark = pytest.mark.usefixtures("ray_session")

VOCAB = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
         "psi omega").split()


@pytest.fixture(scope="module")
def planted_corpus(tmp_path_factory):
    """60 random docs + 12 near-dup copies (2 words swapped out of ~120)
    + 3 exact copies.  Near-dup pairs are (i, 1000+i)."""
    rng = random.Random(7)
    docs: list[tuple[int, str]] = []
    for i in range(60):
        words = [rng.choice(VOCAB) for _ in range(120)]
        docs.append((i, " ".join(words)))
    near_pairs = []
    for i in range(12):
        words = docs[i][1].split()
        for _ in range(2):
            words[rng.randrange(len(words))] = rng.choice(VOCAB)
        docs.append((1000 + i, " ".join(words)))
        near_pairs.append((i, 1000 + i))
    exact_pairs = []
    for i in range(12, 15):
        docs.append((2000 + i, docs[i][1]))
        exact_pairs.append((i, 2000 + i))
    out = str(tmp_path_factory.mktemp("planted"))
    pq.write_table(
        pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([t for _, t in docs], pa.string())}),
        os.path.join(out, "documents.parquet"))
    return out, set(near_pairs), set(exact_pairs)


def test_minhash_finds_planted_near_dups(planted_corpus):
    sf_dir, near, exact = planted_corpus
    pairs = dedup.minhash_lsh_pairs(sf_dir, threshold=0.5).to_pandas()
    found = set(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    hits = sum(1 for p in near | exact if p in found)
    assert hits >= 0.8 * len(near | exact), (hits, found)
    # no collisions between unrelated random docs
    planted_ids = {b for _, b in near | exact}
    for a, b in found:
        assert b in planted_ids or a in planted_ids, (a, b)


def test_simhash_finds_exact_and_near(planted_corpus):
    sf_dir, near, exact = planted_corpus
    pairs = dedup.simhash_pairs(sf_dir, max_hamming=6).to_pandas()
    found = set(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    assert exact <= found, (exact, found)
    ham = dict(zip(zip(pairs["doc_a"].astype(int),
                       pairs["doc_b"].astype(int)),
                   pairs["hamming"].astype(int)))
    for p in exact:
        assert ham[p] == 0


def test_ngram_jaccard_scores_planted(planted_corpus):
    sf_dir, near, exact = planted_corpus
    pairs = dedup.ngram_jaccard_pairs(sf_dir, threshold_milli=500).to_pandas()
    found = dict(zip(zip(pairs["doc_a"].astype(int),
                         pairs["doc_b"].astype(int)),
                     pairs["jaccard_milli"].astype(int)))
    for p in exact:
        assert found.get(p) == 1000  # identical gram sets
    hits = sum(1 for p in near if p in found)
    assert hits >= 0.8 * len(near)


def test_minhash_dedup_keep_components(planted_corpus):
    sf_dir, near, exact = planted_corpus
    keep = dedup.minhash_dedup_keep(sf_dir).to_pandas()
    km = dict(zip(keep["doc_id"].astype(int), keep["keep"]))
    # in every planted pair the min id is kept, the copy dropped
    for a, b in exact:
        assert km.get(a, True) and km.get(b) is False  # noqa: E712
