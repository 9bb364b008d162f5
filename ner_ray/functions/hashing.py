"""Hashing/sketching kernels: MinHash, SimHash, shingles, Jaccard.

Vectorized numpy implementations used by the near-duplicate stages
(stages.text_dedup).  All deterministic (fixed seed-derived permutation
parameters), so near-dup outputs are stable across runs/shardings.
"""

from __future__ import annotations

import hashlib

import numpy as np

# Mersenne prime 2^31-1: with 31-bit shingle values and a,b < p, the
# universal-hash product a*x+b fits exactly in uint64 — fully vectorized
# exact modular arithmetic, no object-dtype fallback.
_MERSENNE = (1 << 31) - 1


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def word_shingles(text: str, k: int = 3) -> set[int]:
    """Hashed word k-gram shingle set."""
    toks = text.split()
    if len(toks) < k:
        return {_hash64(" ".join(toks))} if toks else set()
    return {_hash64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)}


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


class MinHasher:
    """n-permutation MinHash via universal hashing (a*x+b mod p).

    Deterministic: the (a, b) parameters derive from ``seed``.  Signatures
    are mergeable (elementwise min), so per-batch partial sketches combine in
    a second tiny stage — the sketch pattern for distributed dedup.
    """

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def signature(self, shingles: set[int]) -> np.ndarray:
        """uint64[num_perm] signature; empty set -> all MAX."""
        if not shingles:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles)) % _MERSENNE
        # (a*x + b) mod p, vectorized over (perm, shingle); exact in uint64.
        prod = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return np.min(prod, axis=1)

    @staticmethod
    def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float(np.mean(sig_a == sig_b))

    @staticmethod
    def shingle_hashes(token_hashes: np.ndarray, k: int = 3) -> np.ndarray:
        """Word-k-gram shingle hashes from per-token hashes, fully vectorized:
        a mod-p linear combination of k consecutive token hashes (uniform like
        the join+blake2b form, ~100x cheaper).  <k tokens -> one shingle."""
        h = token_hashes.astype(np.uint64) % _MERSENNE
        n = len(h)
        if n == 0:
            return h
        kk = min(k, n)
        coef = (np.arange(1, kk + 1, dtype=np.uint64) * np.uint64(2654435761)) % _MERSENNE
        m = max(1, n - kk + 1)
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(kk):
            acc = (acc + h[j : j + m] * (coef[j] % (1 << 30))) % _MERSENNE
        return acc


_BAND_PRIME = (1 << 61) - 1


def band_keys_vectorized(sigs: np.ndarray, bands: int, seed: int = 42) -> np.ndarray:
    """Band bucket keys for a signature matrix [N, num_perm] -> int64 [N, bands].

    Arithmetic (multiply-sum mod Mersenne-61) instead of per-band blake2b —
    the whole batch hashes in a few numpy ops.  Band index is mixed in so
    equal chunks in different bands don't collide."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    rng = np.random.default_rng(seed ^ 0xBA4D)
    coef = rng.integers(1, _BAND_PRIME, size=(bands, rows), dtype=np.uint64)
    salt = rng.integers(1, _BAND_PRIME, size=bands, dtype=np.uint64)
    chunks = sigs[:, : bands * rows].reshape(n, bands, rows).astype(np.uint64)
    # exact mod-p dot product without overflow: values < 2^31, coefs reduced
    acc = np.zeros((n, bands), dtype=np.uint64)
    for r in range(rows):
        acc = (acc + (chunks[:, :, r] % _BAND_PRIME) * (coef[None, :, r] % (1 << 30))) % _BAND_PRIME
    acc = (acc + salt[None, :]) % _BAND_PRIME
    return acc.astype(np.int64)


def lsh_band_keys(sig: np.ndarray, bands: int, doc_salt: str = "") -> list[int]:
    """Split a signature into ``bands`` bands; hash each band -> bucket key.
    Docs sharing any band key are near-dup candidates."""
    rows = len(sig) // bands
    keys = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows]
        h = hashlib.blake2b(chunk.tobytes() + str(b).encode(), digest_size=8).digest()
        keys.append(int.from_bytes(h, "big") >> 1)
    return keys


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token features (Charikar'02 / Manku et al. WWW'07)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = _hash64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_blocks(h: int, n_blocks: int = 4) -> list[tuple[int, int]]:
    """Split a 64-bit simhash into blocks for blocked candidate generation:
    two hashes within hamming distance < n_blocks share at least one block
    (pigeonhole) — each (block_idx, block_value) is a grouping key."""
    w = 64 // n_blocks
    mask = (1 << w) - 1
    return [(i, (h >> (i * w)) & mask) for i in range(n_blocks)]
