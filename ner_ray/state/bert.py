"""Frozen tiny-BERT artifact for the BERT tagger path (M8-M10).

The reference fine-tunes Google's public ``chinese_L-12_H-768_A-12`` with an
NER head (``BERT_NER.py`` + ``bert/modeling.py``, reconstructed — SURVEY.md
§2 M9/M10).  As with ``FrozenBiLSTM`` (state.model), this sandbox has no
trained weights or TF, so the path ships a pinned deterministic substitute:

- a REAL numpy transformer encoder forward — word+position embeddings,
  multi-head scaled-dot-product self-attention with padding mask, residual +
  layer-norm, GELU FFN — at toy dimensions (2 layers, hidden 32, 2 heads);
- the reference BERT-NER label scheme: ``X`` for continuation subtokens,
  ``[CLS]``/``[SEP]`` labels at the special positions, label 0 reserved for
  padding (``BERT_NER.py get_labels`` / ``convert_single_example`` (R));
- learned knowledge injected as a per-token-id emission prior derived from
  the fixture gazetteer, so decode finds the planted entities.

Pure function of the seed; swap ``create`` for a checkpoint loader to use
real weights — the actor/stage plumbing stays identical.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ner_ray.fixtures import gazetteer as gz
from ner_ray.functions import wordpiece as wp

# Reference BERT-NER label list: 0 is padding; X marks continuation
# subtokens; [CLS]/[SEP] label the special positions.
BERT_LABELS = (
    "[PAD]", "O", "B-PER", "I-PER", "B-LOC", "I-LOC", "B-ORG", "I-ORG",
    "X", "[CLS]", "[SEP]",
)
BERT_LABEL2ID = {t: i for i, t in enumerate(BERT_LABELS)}

_TEMPLATE_WORDS = (
    "works at visited met to review the plan is based in joined after leaving "
    "announced a partnership with said the office reports confirmed meeting "
    "shipping the package tomorrow please run the search and summarize the "
    "results ok done anything else searching the archive for the requested "
    "records last week"
).split()


def corpus_words() -> list[str]:
    words: list[str] = list(_TEMPLATE_WORDS)
    for s in gz.ALL_SURFACES:
        words.extend(s.split())
    return words


def _token_priors(vocab_list: list[str]) -> np.ndarray:
    """Per-token-id label priors from the planted gazetteer surfaces: the
    first piece of a surface's first word gets B-typ, every other piece of
    the surface gets I-typ (continuation pieces still get tagged here — the
    head's X prior handles them).

    Two deterministic disambiguation rules (they resolve the CJK
    prefix-surface ties, e.g. LOC 南京 inside ORG 南京大学):

    - **presence, not accumulation**: a piece shared by several surfaces of
      one label (京 ends both 南京 and 北京) must not outweigh the same
      piece's other labels by mere repetition, so the prior is set, not
      summed;
    - **end-of-surface bonus** (+0.5 on the surface's final piece): Viterbi
      then prefers the path that COMPLETES the longest planted surface —
      standalone 南京 decodes LOC (12.5 vs 12), while 南京大学 decodes as
      one ORG (24.5 vs 19), matching the rule tagger's leftmost-longest
      semantics.  The margins dwarf the 0.02-scale random-head noise.
    """
    tok2id = {t: i for i, t in enumerate(vocab_list)}
    vocab = set(vocab_list)
    prior = np.zeros((len(vocab_list), len(BERT_LABELS)), dtype=np.float64)
    prior[:, BERT_LABEL2ID["O"]] = 2.0
    bonus = np.zeros_like(prior)
    for surface, typ in gz.SURFACE2TYPE.items():
        toks = wp.tokenize(surface, vocab)
        last_word_pos = max(
            (pos for pos, t in enumerate(toks) if not t.is_continuation), default=None
        )
        for pos, t in enumerate(toks):
            if t.is_continuation:
                lab = "X"
            elif pos == 0:
                lab = f"B-{typ}"
            else:
                lab = f"I-{typ}"
            tid = tok2id.get(t.piece)
            if tid is None:
                continue
            prior[tid, BERT_LABEL2ID[lab]] = 6.0
            if pos == last_word_pos and lab != "X":
                bonus[tid, BERT_LABEL2ID[lab]] = 0.5
    return prior + bonus


def bert_bio_transitions() -> np.ndarray:
    """BIO-validity transition skeleton over the BERT label set (the M10
    ``BLSTM_CRF`` head's learned matrix, substituted by its hard constraints):
    ``I-typ`` is reachable only from ``B-typ``/``I-typ``/``X``; ``X``
    (continuation-piece label) is transparent."""
    NEG = -1e4
    n = len(BERT_LABELS)
    T = np.zeros((n, n), dtype=np.float64)
    for nxt, j in BERT_LABEL2ID.items():
        if not nxt.startswith("I-"):
            continue
        typ = nxt[2:]
        for prev, i in BERT_LABEL2ID.items():
            if prev not in (f"B-{typ}", f"I-{typ}", "X"):
                T[i, j] = NEG
    return T


def _layernorm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-12) * g + b


def _gelu(x: np.ndarray) -> np.ndarray:
    # tanh-GELU, computed IN PLACE on one scratch array: the naive expression
    # materializes ~7 temporaries over the [B, L, 4H] FFN activation and was
    # the single hottest line of the encoder (memory bandwidth, not FLOPs) —
    # 5.8s of a 14s tagger profile.  x + 0.044715 x^3 is factored as
    # x (1 + 0.044715 x^2); same math, two fewer passes.
    y = np.square(x)
    y *= 0.044715
    y += 1.0
    y *= x
    y *= 0.7978845608028654  # sqrt(2/pi)
    np.tanh(y, out=y)
    y += 1.0
    y *= x
    y *= 0.5
    return y


@dataclass
class FrozenTinyBert:
    vocab_list: list[str]
    tok2id: dict[str, int]
    word_emb: np.ndarray  # [V, H]
    pos_emb: np.ndarray  # [max_pos, H]
    layers: list  # per layer: dict of weight arrays
    head_w: np.ndarray  # [H, n_labels]
    head_b: np.ndarray
    prior: np.ndarray  # [V, n_labels]
    hidden: int = 32
    n_heads: int = 2
    max_position: int = 512

    @classmethod
    def create(cls, seed: int = 42, hidden: int = 32, n_heads: int = 2, n_layers: int = 2):
        vocab_list = [wp.PAD_TOKEN] + sorted(
            wp.build_wordpiece_vocab(corpus_words()) - {wp.PAD_TOKEN}
        )
        V = len(vocab_list)
        rng = np.random.default_rng(seed)
        s = 0.02  # BERT's truncated-normal init scale; small so prior dominates
        # float32 everywhere: halves memory traffic and roughly doubles the
        # tanh/GELU throughput of the encoder hot path
        mk = lambda *shape: rng.normal(0, s, size=shape).astype(np.float32)
        layers = []
        for _ in range(n_layers):
            layers.append(
                {
                    "wq": mk(hidden, hidden), "wk": mk(hidden, hidden),
                    "wv": mk(hidden, hidden), "wo": mk(hidden, hidden),
                    "ln1_g": np.ones(hidden, np.float32), "ln1_b": np.zeros(hidden, np.float32),
                    "w1": mk(hidden, 4 * hidden), "b1": np.zeros(4 * hidden, np.float32),
                    "w2": mk(4 * hidden, hidden), "b2": np.zeros(hidden, np.float32),
                    "ln2_g": np.ones(hidden, np.float32), "ln2_b": np.zeros(hidden, np.float32),
                }
            )
        return cls(
            vocab_list=vocab_list,
            tok2id={t: i for i, t in enumerate(vocab_list)},
            word_emb=mk(V, hidden),
            pos_emb=mk(512, hidden),
            layers=layers,
            head_w=mk(hidden, len(BERT_LABELS)),
            head_b=np.zeros(len(BERT_LABELS), np.float32),
            prior=_token_priors(vocab_list).astype(np.float32),
            hidden=hidden,
            n_heads=n_heads,
        )

    @property
    def vocab(self) -> set[str]:
        return set(self.tok2id)

    def _attention(self, x: np.ndarray, lw: dict, mask: np.ndarray) -> np.ndarray:
        B, L, H = x.shape
        nh, dh = self.n_heads, H // self.n_heads
        # Fused QKV as ONE 2-D GEMM: numpy broadcasts a [B,L,H] @ [H,H]
        # matmul as B small batched GEMMs — three of those on skinny (L,H)
        # tiles ran ~30% slower than a single (B*L, 3H) GEMM (measured; the
        # fused weight is derived lazily and memoized on the layer dict so a
        # loaded checkpoint's wq/wk/wv stay the source of truth).
        wqkv = lw.get("_wqkv")
        if wqkv is None:
            wqkv = lw["_wqkv"] = np.ascontiguousarray(
                np.concatenate([lw["wq"], lw["wk"], lw["wv"]], axis=1)
            )
        qkv = (x.reshape(B * L, H) @ wqkv).reshape(B, L, 3, nh, dh)
        q = np.ascontiguousarray(qkv[:, :, 0].transpose(0, 2, 1, 3))
        k = np.ascontiguousarray(qkv[:, :, 1].transpose(0, 2, 1, 3))
        v = np.ascontiguousarray(qkv[:, :, 2].transpose(0, 2, 1, 3))
        scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh)  # [B, nh, L, L]
        scores += np.where(mask[:, None, None, :], 0.0, -1e9)
        scores -= scores.max(-1, keepdims=True)
        np.exp(scores, out=scores)
        scores /= scores.sum(-1, keepdims=True)
        ctx = (scores @ v).transpose(0, 2, 1, 3).reshape(B * L, H)
        return (ctx @ lw["wo"]).reshape(B, L, H)

    def encode(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """ids [B, L] + bool mask -> sequence output [B, L, H] (M9).

        FFN matmuls run 2-D over (B*L, H): same math as the [B,L,H] @ W
        broadcast, but one large GEMM instead of B batched skinny ones."""
        B, L = ids.shape
        H = self.hidden
        x = self.word_emb[ids] + self.pos_emb[:L][None, :, :]
        for lw in self.layers:
            x = _layernorm(x + self._attention(x, lw, mask), lw["ln1_g"], lw["ln1_b"])
            x2 = x.reshape(B * L, H)
            ff = _gelu(x2 @ lw["w1"] + lw["b1"]) @ lw["w2"]
            ff += lw["b2"]
            x = _layernorm(x + ff.reshape(B, L, H), lw["ln2_g"], lw["ln2_b"])
        return x

    def emissions(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """[B, L] -> label logits [B, L, n_labels] (M10 head + prior)."""
        B, L = ids.shape
        seq = self.encode(ids, mask).reshape(B * L, self.hidden)
        out = seq @ self.head_w
        out += self.head_b
        return out.reshape(B, L, -1) + self.prior[ids]
