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


def test_pairs_memoized_within_session(planted_corpus):
    """The keep family reuses the pair graph its *_pairs sibling just
    materialized: same (args, source fingerprint, job) -> the SAME
    Dataset object; different params miss."""
    sf_dir, _, _ = planted_corpus
    a = dedup.simhash_pairs(sf_dir)
    assert a is dedup.simhash_pairs(sf_dir)
    assert a is dedup.simhash_pairs(sf_dir, max_hamming=3)  # defaults
    assert dedup.simhash_pairs(sf_dir, max_hamming=2) is not a
    # the keep's resolved join_partitions and a caller's None share an
    # entry (normalized through _join_partitions)
    b = dedup.ngram_jaccard_pairs(sf_dir)
    jp = dedup._join_partitions(None)
    assert dedup.ngram_jaccard_pairs(sf_dir, join_partitions=jp) is b
    # a rewritten source file invalidates
    path = os.path.join(sf_dir, "documents.parquet")
    t = pq.read_table(path)
    pq.write_table(t, path)  # new mtime/identity
    assert dedup.simhash_pairs(sf_dir) is not a


def test_ngram_cap_noop_when_no_hot_grams(planted_corpus):
    """A cap no gram exceeds must be a no-op — and must not crash on
    the empty hot set (Dataset.to_pandas loses columns when empty)."""
    sf_dir, _, _ = planted_corpus
    base = dedup.ngram_jaccard_pairs(sf_dir).to_pandas()
    capped = dedup.ngram_jaccard_pairs(sf_dir,
                                       max_gram_df=10**9).to_pandas()
    key = ["doc_a", "doc_b"]
    assert (base.sort_values(key).reset_index(drop=True)
            .equals(capped.sort_values(key).reset_index(drop=True)))


def test_components_keep_paths_identical(planted_corpus):
    """The driver-side fast path and the distributed propagation must
    produce the identical (node, keep) table."""
    sf_dir, _, _ = planted_corpus
    pairs = (dedup.simhash_pairs(sf_dir)
             .select_columns(["doc_a", "doc_b"]).materialize())

    def as_df(res):
        df = res.to_pandas().sort_values("doc_id").reset_index(drop=True)
        return df.astype({"doc_id": "int64", "keep": "bool"})

    fast = as_df(dedup._components_keep(pairs, None, 64))
    dist = as_df(dedup._components_keep(pairs, None, 64,
                                        broadcast_threshold=0))
    assert len(fast) > 0
    assert fast.equals(dist)


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


def test_minhash_pairs_shard_invariant(planted_corpus):
    """The banding group key shards by band_hash prefix so group sizes
    stay bounded at corpus scale; the pair set must be invariant under
    any shard_bits (equal band_hash => equal shard by construction)."""
    sf_dir, near, exact = planted_corpus

    def pairset(**kw):
        df = dedup.minhash_lsh_pairs(sf_dir, threshold=0.5,
                                     **kw).to_pandas()
        return set(zip(df["doc_a"].astype(int), df["doc_b"].astype(int),
                       df["est_jaccard_milli"].astype(int)))

    base = pairset(shard_bits=0)
    assert pairset(shard_bits=6) == base
    assert pairset(shard_bits=24) == base

    def sim_pairset(**kw):
        df = dedup.simhash_pairs(sf_dir, max_hamming=6,
                                 **kw).to_pandas()
        return set(zip(df["doc_a"].astype(int), df["doc_b"].astype(int),
                       df["hamming"].astype(int)))

    sim_base = sim_pairset(shard_bits=0)
    assert sim_pairset(shard_bits=5) == sim_base
    assert sim_pairset(shard_bits=16) == sim_base


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


def test_simhash_dedup_keep_components(planted_corpus):
    """Keep decision over SimHash pairs: exactly one keeper (the min
    doc_id) per connected component of the pair graph."""
    sf_dir, near, exact = planted_corpus
    pairs = dedup.simhash_pairs(sf_dir, max_hamming=6).to_pandas()
    keep = dedup.simhash_dedup_keep(sf_dir, max_hamming=6).to_pandas()
    keep_of = dict(zip(keep["doc_id"].astype(int), keep["keep"]))
    # union-find ground truth over the same pairs
    parent: dict[int, int] = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in zip(pairs["doc_a"].astype(int),
                    pairs["doc_b"].astype(int)):
        parent[find(a)] = find(b)
    comps: dict[int, list[int]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    assert set(keep_of) == set(parent)
    for members in comps.values():
        keepers = [m for m in members if keep_of[m]]
        assert keepers == [min(members)]


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


def test_ngram_jaccard_join_path_equivalent(planted_corpus):
    """broadcast_threshold=0 forces the at-scale doc_id-keyed size joins;
    the scored pair set must be identical to the broadcast path."""
    sf_dir, near, exact = planted_corpus
    bc = dedup.ngram_jaccard_pairs(sf_dir, threshold_milli=500).to_pandas()
    jn = dedup.ngram_jaccard_pairs(sf_dir, threshold_milli=500,
                                   broadcast_threshold=0).to_pandas()
    key = ["doc_a", "doc_b", "jaccard_milli"]
    assert (sorted(map(tuple, bc[key].astype(int).values.tolist()))
            == sorted(map(tuple, jn[key].astype(int).values.tolist())))


def test_minhash_dedup_keep_components(planted_corpus):
    sf_dir, near, exact = planted_corpus
    keep = dedup.minhash_dedup_keep(sf_dir).to_pandas()
    km = dict(zip(keep["doc_id"].astype(int), keep["keep"]))
    # in every planted pair the min id is kept, the copy dropped
    for a, b in exact:
        assert km.get(a, True) and km.get(b) is False  # noqa: E712


def test_minhash_dedup_keep_chain_components(tmp_path):
    """Chain-shaped component A~B~C~D~E (adjacent overlap only): min-label
    propagation needs multiple rounds (component diameter 4) and the pair
    graph/labels live in datasets end-to-end (no driver union-find).  Every
    chain member must resolve to the chain minimum; the isolated dup pair
    must resolve independently."""
    rng = random.Random(13)
    # doc i = 5 consecutive 25-token blocks from a 9-block stream:
    # adjacent docs share 4/5 of their text (shingle jaccard ~0.66),
    # distance-2 ~0.42 (below threshold after verify), the chain ends
    # (10 vs 14) share one block (~0.1) — so the component's diameter
    # forces multiple propagation rounds
    blocks = [" ".join(rng.choice(VOCAB) for _ in range(25))
              for _ in range(9)]
    docs = [(10 + i, " ".join(blocks[i:i + 5])) for i in range(5)]
    # isolated exact-dup pair far from the chain
    iso = " ".join(rng.choice(VOCAB) for _ in range(150))
    docs.append((500, iso))
    docs.append((501, iso))
    out = str(tmp_path)
    pq.write_table(
        pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([t for _, t in docs], pa.string())}),
        os.path.join(out, "documents.parquet"))
    # broadcast_threshold=0 forces the at-scale doc_id-keyed join path
    pairs = dedup.minhash_lsh_pairs(out, threshold=0.5,
                                    broadcast_threshold=0).to_pandas()
    found = set(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    # the chain edges must be present for the component test to mean much
    assert {(10, 11), (11, 12), (12, 13), (13, 14)} <= found, found
    assert (500, 501) in found
    # no chain<->iso edge, and the chain ends don't connect directly
    assert not any(a < 500 <= b for a, b in found), found
    assert (10, 14) not in found, found
    keep = dedup.minhash_dedup_keep(out, threshold=0.5,
                                    broadcast_threshold=0).to_pandas()
    km = dict(zip(keep["doc_id"].astype(int), keep["keep"].astype(bool)))
    assert km == {10: True, 11: False, 12: False, 13: False, 14: False,
                  500: True, 501: False}


def test_ngram_max_gram_df_caps_hot_grams(tmp_path):
    """A stopword-gram shared by every doc must not drive O(n^2) pair
    emission when the cap is on: docs overlapping ONLY in the hot gram
    produce no pair, while genuinely-duplicate docs still score."""
    hot = "lorem ipsum dolor"  # one 3-gram present in every doc
    docs = []
    for i in range(20):
        filler = " ".join(f"unique{i}w{j}" for j in range(30))
        docs.append((i, f"{hot} {filler}"))
    # one true dup pair
    docs.append((100, docs[0][1]))
    out = str(tmp_path)
    pq.write_table(
        pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                  "text": pa.array([t for _, t in docs], pa.string())}),
        os.path.join(out, "documents.parquet"))
    # exact mode: the hot gram alone scores well under the threshold, but
    # it IS counted (doc 0 vs doc 100 share everything -> 1000)
    exact = dedup.ngram_jaccard_pairs(out, threshold_milli=10).to_pandas()
    exact_pairs = set(zip(exact["doc_a"].astype(int),
                          exact["doc_b"].astype(int)))
    assert (0, 100) in exact_pairs
    # every doc pair shares >= the hot grams -> O(n^2) low-score pairs
    assert len(exact_pairs) > 100
    # capped mode: grams in more than 3 docs are dropped before pair
    # emission -> only the true dup pair survives, even at threshold 10
    capped = dedup.ngram_jaccard_pairs(out, threshold_milli=10,
                                       max_gram_df=3).to_pandas()
    capped_pairs = set(zip(capped["doc_a"].astype(int),
                           capped["doc_b"].astype(int)))
    assert capped_pairs == {(0, 100)}, capped_pairs
    # the dup pair's score is a lower bound (hot grams stay in the
    # denominator sizes but not the intersection)
    score = int(capped.set_index(["doc_a", "doc_b"])
                .loc[(0, 100), "jaccard_milli"])
    assert score < 1000


def test_broadcast_ops_handle_empty_corpus(tmp_path, ray_session):
    """The zero-copy broadcast paths must survive an EMPTY documents
    table (no signatures / winners to ship) — regression for
    np.concatenate([]) / pa.concat_tables([]) raising on empty."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.ops.dedup import minhash_lsh_pairs
    from crawler_ray.ops.textstats import curate_corpus

    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64()),
    }), f"{sf}/documents.parquet")
    assert minhash_lsh_pairs(sf).count() == 0
    assert curate_corpus(sf).count() == 0


def test_simhash_guard_rejects_low_entropy(tmp_path, ray_session):
    """A degenerate corpus (every doc identical => one corpus-sized
    band bucket per band) must fail in seconds with the exact candidate
    estimate, not hang emitting a quadratic pair set; an explicit
    higher ceiling re-enables the (intentionally quadratic) run."""
    n = 120
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(["accept all cookies to continue"] * n,
                         pa.string()),
    }), os.path.join(sf, "documents.parquet"))
    # candidates = 4 bands * C(120, 2) = 28,560
    with pytest.raises(ValueError, match=r"28,560 candidate"):
        dedup.simhash_pairs(sf, max_candidate_pairs=1_000)
    out = dedup.simhash_pairs(sf, max_candidate_pairs=10**8).to_pandas()
    assert len(out) == n * (n - 1) // 2  # all-pairs at hamming 0
    assert (out["hamming"] == 0).all()


def test_simhash_guard_noop_on_normal_corpus(planted_corpus):
    """The default ceiling (max(10M, 50/doc)) must not fire on a
    normal mixed corpus — the pair set is unchanged vs an explicit
    huge ceiling."""
    sf_dir, _, _ = planted_corpus
    base = dedup.simhash_pairs(sf_dir, max_hamming=6).to_pandas()
    huge = dedup.simhash_pairs(sf_dir, max_hamming=6,
                               max_candidate_pairs=10**15).to_pandas()
    key = ["doc_a", "doc_b"]
    assert (base.sort_values(key).reset_index(drop=True)
            .equals(huge.sort_values(key).reset_index(drop=True)))
