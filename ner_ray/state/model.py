"""Frozen model artifacts for the neural tagger path (M1-M6, M9-M10).

The reference loads trained TF-1.x checkpoints (BiLSTM-CRF ``model.py`` /
BERT ``modeling.py``, reconstructed — SURVEY.md §2).  This sandbox has no
trained weights, no TF/torch and no network, so the neural path ships a
**pinned deterministic substitute** (SURVEY.md §0 checklist item 5):

- real embedding lookup (M1), real numpy BiLSTM forward (M2, vectorized over
  the batch dimension), real projection (M3) and real batched Viterbi decode
  over a CRF transition matrix (M5) — the full inference machinery;
- the *learned knowledge* is injected as a per-char emission prior derived
  from the fixture gazetteer (an HMM-style stand-in for trained weights),
  plus BIO-validity-constrained transitions.  On CJK text this decodes the
  planted entities; on ASCII text the reference's own ``<ENG>`` collapsing
  makes char-level tagging uninformative (as in the reference, which targets
  Chinese corpora).

Everything is a pure function of the seed: same weights in every actor, every
run.  Real trained weights drop in through ``state.checkpoint``
(``save_bilstm`` / ``load_bilstm``; taggers take ``weights_path=``) — the
actor/stage plumbing is identical.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ner_ray.fixtures import gazetteer as gz
from ner_ray.functions.normalize import normalize_char
from ner_ray.schemas import NUM_TAGS, TAG2LABEL
from ner_ray.state.vocab import finalize_vocab, vocab_codepoint_arrays

NEG = -1e4  # soft -inf for disallowed transitions


def gazetteer_vocab() -> dict[str, int]:
    """Deterministic vocab over the gazetteer + template alphabet."""
    counts: dict[str, int] = {}
    corpus = list(gz.ALL_SURFACES) + [
        "works at visited met to review the plan is based in joined after leaving "
        "announced a partnership with said the office reports confirmed meeting "
        "shipping package tomorrow please run search summarize results ok done "
        "anything else searching archive requested records last week. ,"
    ]
    for s in corpus:
        for ch in s:
            c = normalize_char(ch)
            counts[c] = counts.get(c, 0) + 1
    return finalize_vocab(counts, min_count=1)


def _bio_transitions() -> np.ndarray:
    """CRF transition matrix enforcing BIO validity (M4's learned matrix,
    substituted by its hard-constraint skeleton)."""
    T = np.zeros((NUM_TAGS, NUM_TAGS), dtype=np.float64)
    for prev_tag, i in TAG2LABEL.items():
        for next_tag, j in TAG2LABEL.items():
            if next_tag.startswith("I-"):
                typ = next_tag[2:]
                if prev_tag not in (f"B-{typ}", f"I-{typ}"):
                    T[i, j] = NEG  # I-X only after B-X / I-X
    return T


def _gazetteer_priors(word2id: dict[str, int]) -> np.ndarray:
    """Per-char-id emission priors from planted entity surfaces."""
    prior = np.zeros((len(word2id), NUM_TAGS), dtype=np.float64)
    prior[:, TAG2LABEL["O"]] = 2.0
    for surface, typ in gz.SURFACE2TYPE.items():
        chars = [normalize_char(c) for c in surface]
        for pos, c in enumerate(chars):
            cid = word2id.get(c)
            if cid is None:
                continue
            tag = f"B-{typ}" if pos == 0 else f"I-{typ}"
            prior[cid, TAG2LABEL[tag]] += 4.0
    return prior


@dataclass
class FrozenBiLSTM:
    """Weights for embedding -> BiLSTM -> projection (+prior) -> CRF."""

    word2id: dict[str, int]
    embed: np.ndarray  # [V, d]
    wx_f: np.ndarray  # [d, 4h]
    wh_f: np.ndarray  # [h, 4h]
    b_f: np.ndarray  # [4h]
    wx_b: np.ndarray
    wh_b: np.ndarray
    b_b: np.ndarray
    proj_w: np.ndarray  # [2h, T]
    proj_b: np.ndarray  # [T]
    prior: np.ndarray  # [V, T]
    transitions: np.ndarray  # [T, T]
    cp_sorted: np.ndarray  # vectorized vocab lookup tables
    cp_ids: np.ndarray

    dim: int = 16
    hidden: int = 16

    @classmethod
    def create(cls, seed: int = 42, dim: int = 16, hidden: int = 16) -> "FrozenBiLSTM":
        word2id = gazetteer_vocab()
        V = len(word2id)
        rng = np.random.default_rng(seed)
        # Reference init: uniform(-0.25, 0.25) embeddings (data.py:~85 (R)).
        embed = rng.uniform(-0.25, 0.25, size=(V, dim))
        scale = 0.05  # small so the gazetteer prior dominates emissions
        mk = lambda *shape: rng.normal(0, scale, size=shape)
        cps, ids = vocab_codepoint_arrays(word2id)
        return cls(
            word2id=word2id,
            embed=embed,
            wx_f=mk(dim, 4 * hidden),
            wh_f=mk(hidden, 4 * hidden),
            b_f=np.zeros(4 * hidden),
            wx_b=mk(dim, 4 * hidden),
            wh_b=mk(hidden, 4 * hidden),
            b_b=np.zeros(4 * hidden),
            proj_w=mk(2 * hidden, NUM_TAGS),
            proj_b=np.zeros(NUM_TAGS),
            prior=_gazetteer_priors(word2id),
            transitions=_bio_transitions(),
            cp_sorted=cps,
            cp_ids=ids,
            dim=dim,
            hidden=hidden,
        )

    # ---- vectorized vocab lookup (exact P1 semantics) ----

    def ids_for_codepoints(self, cps: np.ndarray) -> np.ndarray:
        """Map unicode codepoints -> vocab ids.

        Exactness: every *distinct* codepoint in the batch is resolved through
        the scalar reference function ``normalize_char`` (so <NUM>/<ENG>/<UNK>
        semantics are bit-identical to P1); the per-position application is a
        vectorized take over the distinct set.
        """
        uniq, inv = np.unique(cps, return_inverse=True)
        unk = self.word2id["<UNK>"]
        uniq_ids = np.array(
            [self.word2id.get(normalize_char(chr(int(cp))), unk) for cp in uniq],
            dtype=np.int64,
        )
        return uniq_ids[inv]

    # ---- forward (M1-M3) ----

    @staticmethod
    def _sigmoid(x: np.ndarray) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-x))

    def _lstm_dir(self, x: np.ndarray, wx, wh, b, reverse: bool) -> np.ndarray:
        B, L, d = x.shape
        h = self.hidden
        hs = np.zeros((B, L, h))
        ht = np.zeros((B, h))
        ct = np.zeros((B, h))
        steps = range(L - 1, -1, -1) if reverse else range(L)
        for t in steps:
            g = x[:, t, :] @ wx + ht @ wh + b
            i, f, c_in, o = np.split(g, 4, axis=1)
            i, f, o = self._sigmoid(i), self._sigmoid(f), self._sigmoid(o)
            ct = f * ct + i * np.tanh(c_in)
            ht = o * np.tanh(ct)
            hs[:, t, :] = ht
        return hs

    def emissions(self, ids: np.ndarray, lengths: np.ndarray | None = None) -> np.ndarray:
        """ids [B, L] -> logits [B, L, T] (padding id 0 rows are junk; callers
        mask by length).

        With ``lengths`` the backward LSTM starts at each row's TRUE last
        character (per-row reversal) instead of at the padded tail, so a
        row's emissions no longer depend on how the batch was packed —
        required for trained weights, where pad-state leakage into the
        backward direction would make decoding batch-composition-dependent
        (the frozen substitute is prior-dominated, so its decoded tags are
        unaffected either way)."""
        x = self.embed[ids]  # M1 lookup
        fwd = self._lstm_dir(x, self.wx_f, self.wh_f, self.b_f, reverse=False)
        if lengths is None:
            bwd = self._lstm_dir(x, self.wx_b, self.wh_b, self.b_b, reverse=True)
        else:
            rev = reverse_by_length(x, np.asarray(lengths, dtype=np.int64))
            bwd_r = self._lstm_dir(rev, self.wx_b, self.wh_b, self.b_b, reverse=False)
            bwd = reverse_by_length(bwd_r, np.asarray(lengths, dtype=np.int64))
        hcat = np.concatenate([fwd, bwd], axis=2)  # M2 concat
        logits = hcat @ self.proj_w + self.proj_b  # M3 projection
        return logits + self.prior[ids]  # trained-knowledge stand-in


def reverse_by_length(x: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Flip each row's first ``lengths[b]`` positions of a [B, L, ...] array,
    leaving the padded tail in place (vectorized take_along_axis)."""
    B, L = x.shape[0], x.shape[1]
    idx = np.broadcast_to(np.arange(L, dtype=np.int64), (B, L))
    lens = lengths[:, None]
    rev = np.where(idx < lens, lens - 1 - idx, idx)
    if x.ndim == 3:
        rev = rev[:, :, None]
        rev = np.broadcast_to(rev, x.shape)
    return np.take_along_axis(x, rev, axis=1)
