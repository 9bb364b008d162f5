"""Batched numpy Viterbi decode (reference M5 semantics, SURVEY.md §2).

Re-implements the semantics of ``tf.contrib.crf.viterbi_decode`` as used by
the reference's ``predict_one_batch`` (reference ``model.py:~180-195`` (R)):
for one sequence with unary ``logits[L, T]`` and a learned transition matrix
``transitions[T, T]``,

    score(y) = sum_t logits[t, y_t] + sum_t transitions[y_{t-1}, y_t]

and the decode is the argmax path via dynamic programming.  Deterministic:
ties break toward the lowest tag index (numpy argmax convention), which is
also TF's convention — required for the reproducible P/R gate.

This implementation is vectorized across the **batch** dimension: one DP
sweep over time steps handles all sequences at once using a length mask, so
the scorer actor decodes a whole Arrow batch with no per-row Python loop.
"""

from __future__ import annotations

import numpy as np


def viterbi_decode_batch(
    logits: np.ndarray, seq_lens: np.ndarray, transitions: np.ndarray
) -> np.ndarray:
    """Decode a padded batch.

    Args:
        logits: float array [B, Lmax, T] (padding positions ignored).
        seq_lens: int array [B], true lengths (>=1 for non-empty rows; a row
            with length 0 yields an all -1 row).
        transitions: float [T, T]; transitions[i, j] = score of i -> j.

    Returns:
        int32 array [B, Lmax]; positions >= seq_len are -1.
    """
    B, Lmax, T = logits.shape
    out = np.full((B, Lmax), -1, dtype=np.int32)
    if Lmax == 0 or B == 0:
        return out

    # score[b, j] = best score of any path ending in tag j at current step.
    score = logits[:, 0, :].astype(np.float64).copy()
    # backptr[b, t, j] = argmax_i (score_i + trans[i, j]) at step t.
    backptr = np.zeros((B, Lmax, T), dtype=np.int32)
    # Track the best final state at each row's last valid step.
    final_tag = np.argmax(score, axis=1).astype(np.int32)

    for t in range(1, Lmax):
        # cand[b, i, j] = score[b, i] + trans[i, j]
        cand = score[:, :, None] + transitions[None, :, :]
        best_prev = np.argmax(cand, axis=1)  # [B, T]
        new_score = np.take_along_axis(cand, best_prev[:, None, :], axis=1)[:, 0, :]
        new_score = new_score + logits[:, t, :]
        active = seq_lens > t  # rows still inside their sequence
        score = np.where(active[:, None], new_score, score)
        backptr[:, t, :] = best_prev
        ends_here = seq_lens == t + 1
        if ends_here.any():
            final_tag[ends_here] = np.argmax(score[ends_here], axis=1).astype(np.int32)

    # Backtrack per row, vectorized across the batch.
    last_idx = np.clip(seq_lens - 1, 0, None)
    tag = final_tag.copy()
    rows = np.arange(B)
    valid = seq_lens > 0
    out[rows[valid], last_idx[valid]] = tag[valid]
    for t in range(Lmax - 1, 0, -1):
        inside = seq_lens > t
        prev = backptr[rows, t, tag]
        tag = np.where(inside, prev, tag).astype(np.int32)
        write = seq_lens > t  # position t-1 exists for these rows
        out[rows[write], t - 1] = tag[write]
    return out


def viterbi_decode_single(logits: np.ndarray, transitions: np.ndarray) -> list[int]:
    """Single-sequence convenience wrapper (reference-style signature)."""
    L = logits.shape[0]
    res = viterbi_decode_batch(logits[None, :, :], np.array([L]), transitions)
    return res[0, :L].tolist()


def brute_force_decode(logits: np.ndarray, transitions: np.ndarray) -> list[int]:
    """Exponential exact argmax over all paths — test oracle for <=6 steps."""
    import itertools

    L, T = logits.shape
    best, best_score = None, -np.inf
    for path in itertools.product(range(T), repeat=L):
        s = logits[0, path[0]]
        for t in range(1, L):
            s += transitions[path[t - 1], path[t]] + logits[t, path[t]]
        if s > best_score + 1e-12:
            best, best_score = path, s
    return list(best)
