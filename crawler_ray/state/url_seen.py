"""Sharded URL-seen membership filter (actor pool).

Replaces the reference's RLock-guarded in-process ``visited_urls`` set
(``core/crawler.py:155-351``) with S independent shards keyed by
``host_hash % S`` (per the north rule: a 10^10-URL frontier dedupes in a
sharded approximate filter keyed by hash(host)).  Two modes:

- ``exact``: a set of 20-byte SHA-1 URL digests.  Zero false positives —
  used for conformance runs and as the test oracle.  ~50 B/key of Python
  overhead, fine up to ~10^7 keys/shard.
- ``bloom``: a double-hashing Bloom filter sized at ``bits_per_key`` (12
  default -> ~0.03% fpp at 8 hashes).  At 10^10 keys / 256 shards ≈ 5.9
  GB/shard of flat numpy bits; a false positive drops a frontier URL
  (never duplicates work), matching crawl-frontier practice.

All membership traffic is batched: one ``check_and_add`` RPC per shard per
frontier batch (amortizing actor-call overhead), first-wins semantics are
atomic per shard because each actor processes its mailbox serially.
Shards snapshot/restore to files for checkpoint-resume lineage.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

__all__ = ["BloomFilter", "CuckooFilter", "make_filter",
           "URLSeenShardCore", "URLSeenPool"]


class BloomFilter:
    """Double-hashing Bloom filter over 20-byte digests (h1 + i*h2 from the
    two 64-bit halves of the SHA-1, the standard Kirsch-Mitzenmacher
    construction)."""

    def __init__(self, expected_keys: int, bits_per_key: int = 12,
                 num_hashes: int = 8):
        self.m = max(64, expected_keys * bits_per_key)
        self.k = num_hashes
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def _positions(self, digest: bytes) -> np.ndarray:
        h1 = int.from_bytes(digest[:8], "big")
        h2 = int.from_bytes(digest[8:16], "big") | 1
        return np.array([(h1 + i * h2) % self.m for i in range(self.k)],
                        dtype=np.int64)

    def check_and_add(self, digest: bytes) -> bool:
        """True if the key was new (first insertion)."""
        pos = self._positions(digest)
        byte_idx, bit = pos >> 3, (pos & 7).astype(np.uint8)
        masks = np.left_shift(np.uint8(1), bit)
        present = bool(np.all(self.bits[byte_idx] & masks))
        if not present:
            # fancy-indexed |= silently drops duplicate byte indices;
            # bitwise_or.at applies every (index, mask) pair
            np.bitwise_or.at(self.bits, byte_idx, masks)
        return not present

    def state(self) -> dict:
        return {"m": self.m, "k": self.k, "bits": self.bits}

    @classmethod
    def from_state(cls, state: dict) -> "BloomFilter":
        bf = cls.__new__(cls)
        bf.m, bf.k, bf.bits = state["m"], state["k"], state["bits"]
        return bf


class CuckooFilter:
    """Cuckoo filter over 20-byte digests (Fan et al. 2014): buckets of
    4 16-bit fingerprints, two candidate buckets via partial-key cuckoo
    hashing ``i2 = i1 XOR hash(fp)``.  ~2.1 B/key at 95% load with
    ~0.03% false-positive rate — the north-star's URL-seen structure
    (a false positive drops a frontier URL, never duplicates work).

    All hashing is derived from the SHA-1 digest halves, so behavior is
    deterministic across processes.  Insert uses bounded eviction
    (``max_kicks``); when an eviction chain fails (table effectively
    full) the displaced fingerprint goes to a stash that membership
    checks consult — no false negatives ever, graceful degradation."""

    SLOTS = 4

    def __init__(self, expected_keys: int, max_kicks: int = 500):
        # size to ~95% target load, power-of-two buckets for cheap masks
        need = max(16, int(expected_keys / (self.SLOTS * 0.95)) + 1)
        m = 1
        while m < need:
            m <<= 1
        self.m = m
        self.max_kicks = max_kicks
        self.table = np.zeros((m, self.SLOTS), dtype=np.uint16)
        self.stash: list[tuple[int, int]] = []  # (bucket, fingerprint)
        self.n_keys = 0

    @staticmethod
    def _fingerprint(digest: bytes) -> int:
        fp = int.from_bytes(digest[16:18], "big")
        return fp or 1  # 0 means empty slot

    def _buckets(self, digest: bytes, fp: int) -> tuple[int, int]:
        i1 = int.from_bytes(digest[:8], "big") & (self.m - 1)
        # partial-key displacement hash of the fingerprint
        h_fp = (fp * 0x5BD1E995) & 0xFFFFFFFF
        i2 = (i1 ^ h_fp) & (self.m - 1)
        return i1, i2

    def _in_stash(self, fp: int, i1: int, i2: int) -> bool:
        return any(f == fp and b in (i1, i2) for b, f in self.stash)

    def contains(self, digest: bytes) -> bool:
        fp = self._fingerprint(digest)
        i1, i2 = self._buckets(digest, fp)
        return (fp in self.table[i1] or fp in self.table[i2]
                or self._in_stash(fp, i1, i2))

    def check_and_add(self, digest: bytes) -> bool:
        """True if the key was new (now inserted)."""
        fp = self._fingerprint(digest)
        i1, i2 = self._buckets(digest, fp)
        if fp in self.table[i1] or fp in self.table[i2] \
                or self._in_stash(fp, i1, i2):
            return False
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.n_keys += 1
                return True
        # evict: deterministic slot choice derived from the digest
        i = i1
        cur = fp
        seed = int.from_bytes(digest[8:16], "big")
        for kick in range(self.max_kicks):
            slot = (seed + kick) % self.SLOTS
            cur, self.table[i][slot] = int(self.table[i][slot]), cur
            h_fp = (cur * 0x5BD1E995) & 0xFFFFFFFF
            i = (i ^ h_fp) & (self.m - 1)
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.n_keys += 1
                return True
        # eviction chain failed: the NEW key was placed on the first
        # swap; the homeless item is the last displaced fingerprint —
        # stash it (its legal buckets are i and i ^ hash(fp))
        self.stash.append((int(i), int(cur)))
        self.n_keys += 1
        return True

    def state(self) -> dict:
        return {"m": self.m, "max_kicks": self.max_kicks,
                "table": self.table, "stash": self.stash,
                "n_keys": self.n_keys}

    @classmethod
    def from_state(cls, state: dict) -> "CuckooFilter":
        cf = cls.__new__(cls)
        cf.m = state["m"]
        cf.max_kicks = state["max_kicks"]
        cf.table = state["table"]
        cf.stash = state["stash"]
        cf.n_keys = state["n_keys"]
        return cf


def make_filter(mode: str, expected_keys: int, bits_per_key: int = 12):
    """Approximate-membership factory for the 'bloom'/'cuckoo' modes."""
    if mode == "bloom":
        return BloomFilter(expected_keys, bits_per_key)
    if mode == "cuckoo":
        return CuckooFilter(expected_keys)
    raise ValueError(f"unknown filter mode {mode!r}")


class URLSeenShardCore:
    """One shard's logic (plain Python; wrapped by ray.remote in the pool)."""

    def __init__(self, mode: str = "exact", expected_keys: int = 1 << 20,
                 bits_per_key: int = 12):
        self.mode = mode
        self._set: set[bytes] | None = set() if mode == "exact" else None
        self._bloom = (BloomFilter(expected_keys, bits_per_key)
                       if mode == "bloom" else None)
        self.n_added = 0

    def check_and_add(self, digests: list[bytes]) -> list[bool]:
        """First-wins batch admission: True where the digest was unseen
        (now marked seen).  Duplicates *within* the batch: first True,
        rest False (serial in-batch order)."""
        out = []
        if self.mode == "exact":
            seen = self._set
            for d in digests:
                if d in seen:
                    out.append(False)
                else:
                    seen.add(d)
                    out.append(True)
        else:
            bloom = self._bloom
            out = [bloom.check_and_add(d) for d in digests]
        self.n_added += sum(out)
        return out

    def contains(self, digests: list[bytes]) -> list[bool]:
        if self.mode == "exact":
            return [d in self._set for d in digests]
        # membership-only probe for bloom: positions check without insert
        bloom = self._bloom
        res = []
        for d in digests:
            pos = bloom._positions(d)
            masks = np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8))
            res.append(bool(np.all(bloom.bits[pos >> 3] & masks)))
        return res

    def count(self) -> int:
        return self.n_added

    # -- checkpoint ---------------------------------------------------------
    def snapshot(self, path: str) -> str:
        state = {"mode": self.mode, "n_added": self.n_added}
        if self.mode == "exact":
            state["set"] = self._set
        else:
            state["bloom"] = self._bloom.state()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f, protocol=4)
        os.replace(tmp, path)
        return path

    def restore(self, path: str) -> int:
        with open(path, "rb") as f:
            state = pickle.load(f)
        self.mode = state["mode"]
        self.n_added = state["n_added"]
        if self.mode == "exact":
            self._set = state["set"]
            self._bloom = None
        else:
            self._bloom = BloomFilter.from_state(state["bloom"])
            self._set = None
        return self.n_added


class URLSeenPool:
    """S-shard pool.  Routing key = ``host_hash % S`` so a host's URLs land
    on one shard (aligned with the politeness shards).  ``num_cpus`` is
    fractional: membership work is tiny per call; the shards must never
    starve the extract stage of CPU slots."""

    def __init__(self, num_shards: int = 8, mode: str = "exact",
                 expected_keys_per_shard: int = 1 << 20,
                 bits_per_key: int = 12, num_cpus: float = 0.1):
        import ray
        self.num_shards = num_shards
        actor_cls = ray.remote(num_cpus=num_cpus)(URLSeenShardCore)
        self.shards = [
            actor_cls.remote(mode=mode,
                             expected_keys=expected_keys_per_shard,
                             bits_per_key=bits_per_key)
            for _ in range(num_shards)
        ]

    def shard_of(self, host_hash: int) -> int:
        return int(host_hash) % self.num_shards

    def check_and_add(self, digests: list[bytes],
                      host_hashes) -> np.ndarray:
        """Batched first-wins admission across shards.  One RPC per shard
        touched by this batch; results reassembled in input order."""
        import ray
        by_shard: dict[int, list[int]] = {}
        for i, hh in enumerate(host_hashes):
            by_shard.setdefault(int(hh) % self.num_shards, []).append(i)
        refs, index_groups = [], []
        for shard_id, idxs in by_shard.items():
            refs.append(self.shards[shard_id].check_and_add.remote(
                [digests[i] for i in idxs]))
            index_groups.append(idxs)
        out = np.zeros(len(digests), dtype=bool)
        for idxs, result in zip(index_groups, ray.get(refs)):
            out[idxs] = result
        return out

    def counts(self) -> list[int]:
        import ray
        return ray.get([s.count.remote() for s in self.shards])

    def snapshot(self, directory: str) -> list[str]:
        import ray
        os.makedirs(directory, exist_ok=True)
        return ray.get([
            s.snapshot.remote(os.path.join(directory, f"seen-{i:04d}.pkl"))
            for i, s in enumerate(self.shards)
        ])

    def restore(self, directory: str) -> int:
        import ray
        return sum(ray.get([
            s.restore.remote(os.path.join(directory, f"seen-{i:04d}.pkl"))
            for i, s in enumerate(self.shards)
        ]))

    def shutdown(self) -> None:
        import ray
        for s in self.shards:
            ray.kill(s)
        self.shards = []
