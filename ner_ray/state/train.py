"""BiLSTM-CRF training on a synthetic BIO corpus — real trained weights for
the neural tagger path (closes the "frozen seeded-random substitute"
asterisk on SURVEY.md §2 M1–M5/M4 within this sandbox's constraints: no
network, no TF/torch, so the trainer is pure-numpy SGD over the exact
inference machinery ``state.model.FrozenBiLSTM`` runs).

What is trained: embeddings (M1), both LSTM directions (M2, full BPTT),
the projection (M3) and the CRF transition matrix (M4 — learned on top of
the hard BIO-validity skeleton: invalid transitions stay pinned at NEG, the
gradient only moves the allowed entries).  The emission prior is ZERO for a
trained model — all knowledge lives in the weights, unlike the frozen
substitute whose knowledge is the injected gazetteer prior.

Why the corpus is CJK: the reference targets Chinese corpora and its P1
normalization collapses every ASCII letter to one ``<ENG>`` id, which makes
English char-level tagging structurally uninformative (SURVEY.md §2 P1) —
CJK chars keep distinct ids, so context is learnable.  The generator plants
entity surfaces into cue-bearing templates ("…在{LOC}工作", "{PER}加入了
{ORG}"…) with DISJOINT train/held-out surface sets; beating the rule tagger
on held-out sentences therefore requires genuine contextual generalization
to unseen surfaces, not gazetteer recall (the rule tagger knows only the
fixture gazetteer and scores near-zero recall there).

Checkpoints save through ``state.checkpoint.save_bilstm`` and load through
the production ``NeuralTagger(weights_path=...)`` path — the same artifact
layout a converted real-world checkpoint ships in.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ner_ray.functions.viterbi import viterbi_decode_batch
from ner_ray.schemas import LABEL2TAG, NUM_TAGS, TAG2LABEL
from ner_ray.state.model import NEG, FrozenBiLSTM, _bio_transitions
from ner_ray.state.vocab import finalize_vocab, vocab_codepoint_arrays

# --------------------------------------------------------------------------
# Synthetic CJK corpus with disjoint train / held-out entity surfaces
# --------------------------------------------------------------------------

_SURNAME = "赵钱孙李周吴郑王冯陈褚卫蒋沈韩杨朱秦尤许"
_GIVEN = "伟芳娜敏静丽强磊军洋勇艳杰涛明超霞平刚桂英"
_LOC_CHARS = "京沪宁杭苏锡常温福厦汉湘渝蓉昆贵兰银川西"
_LOC_SUFFIX = ("市", "州", "城", "县")
_ORG_CHARS = "华泰恒安信达兴盛隆丰瑞祥凯润鸿嘉伟业宏远"
_ORG_SUFFIX = ("公司", "大学", "集团", "银行")

# templates: cue context AROUND the slots is the learnable signal
_TEMPLATES = (
    ("P", "在", "L", "工作"),
    ("P", "去了", "L"),
    ("P", "加入了", "O"),
    ("O", "位于", "L"),
    ("P", "和", "P", "见了面"),
    ("O", "与", "O", "达成合作"),
    ("P", "访问了", "O"),
    ("P", "来自", "L"),
    ("O", "在", "L", "设立分部"),
    ("P", "离开了", "O"),
)


def _make_surface(rng: np.random.Generator, kind: str) -> str:
    if kind == "P":
        n = int(rng.integers(1, 3))
        return rng.choice(list(_SURNAME)) + "".join(
            rng.choice(list(_GIVEN), size=n)
        )
    if kind == "L":
        n = int(rng.integers(1, 3))
        return "".join(rng.choice(list(_LOC_CHARS), size=n)) + str(
            rng.choice(_LOC_SUFFIX)
        )
    n = int(rng.integers(1, 3))
    return "".join(rng.choice(list(_ORG_CHARS), size=n)) + str(
        rng.choice(_ORG_SUFFIX)
    )


_KIND2TYPE = {"P": "PER", "L": "LOC", "O": "ORG"}


def make_corpus(
    n_sents: int, surfaces: dict[str, list[str]], seed: int
) -> list[tuple[list[str], list[str]]]:
    """``[(chars, tags)]`` sentences from templates + the given surface
    inventory (deterministic in seed)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_sents):
        tpl = _TEMPLATES[int(rng.integers(0, len(_TEMPLATES)))]
        chars: list[str] = []
        tags: list[str] = []
        for part in tpl:
            if part in _KIND2TYPE:
                pool = surfaces[part]
                s = pool[int(rng.integers(0, len(pool)))]
                typ = _KIND2TYPE[part]
                for i, ch in enumerate(s):
                    chars.append(ch)
                    tags.append(f"B-{typ}" if i == 0 else f"I-{typ}")
            else:
                for ch in part:
                    chars.append(ch)
                    tags.append("O")
        out.append((chars, tags))
    return out


def make_surface_splits(
    n_per_type: int = 40, seed: int = 17
) -> tuple[dict[str, list[str]], dict[str, list[str]]]:
    """Disjoint train / held-out surface inventories (held-out surfaces are
    never seen in training; chars mostly shared so the signal is context)."""
    rng = np.random.default_rng(seed)
    all_s: dict[str, list[str]] = {"P": [], "L": [], "O": []}
    for kind in all_s:
        seen: set[str] = set()
        while len(seen) < 2 * n_per_type:
            seen.add(_make_surface(rng, kind))
        all_s[kind] = sorted(seen)
    train = {k: v[:n_per_type] for k, v in all_s.items()}
    heldout = {k: v[n_per_type:] for k, v in all_s.items()}
    return train, heldout


def corpus_vocab(corpus: list[tuple[list[str], list[str]]]) -> dict[str, int]:
    from ner_ray.functions.normalize import normalize_char

    counts: dict[str, int] = {}
    for chars, _tags in corpus:
        for ch in chars:
            c = normalize_char(ch)
            counts[c] = counts.get(c, 0) + 1
    return finalize_vocab(counts, min_count=1)


# --------------------------------------------------------------------------
# Linear-chain CRF: loss + gradients (log-space forward/backward)
# --------------------------------------------------------------------------


def _logsumexp(a: np.ndarray, axis: int) -> np.ndarray:
    m = a.max(axis=axis, keepdims=True)
    return (m + np.log(np.exp(a - m).sum(axis=axis, keepdims=True))).squeeze(axis)


def crf_nll_grad(
    emis: np.ndarray, tags: np.ndarray, T: np.ndarray
) -> tuple[float, np.ndarray, np.ndarray]:
    """CRF negative log-likelihood over a same-length batch.

    emis [B, L, K], tags [B, L] int — returns (sum NLL, d_emis, d_T) where
    the gradients are marginal-minus-empirical expectations (the standard
    forward-backward result)."""
    B, L, K = emis.shape
    # forward
    alpha = np.empty((B, L, K))
    alpha[:, 0] = emis[:, 0]
    for t in range(1, L):
        alpha[:, t] = _logsumexp(alpha[:, t - 1][:, :, None] + T[None], axis=1) + emis[:, t]
    logZ = _logsumexp(alpha[:, -1], axis=1)  # [B]
    # backward
    beta = np.zeros((B, L, K))
    for t in range(L - 2, -1, -1):
        beta[:, t] = _logsumexp(
            T[None] + (emis[:, t + 1] + beta[:, t + 1])[:, None, :], axis=2
        )
    # node marginals -> emission grad
    mu = np.exp(alpha + beta - logZ[:, None, None])  # [B, L, K]
    d_emis = mu.copy()
    rows = np.arange(B)[:, None]
    cols = np.arange(L)[None, :]
    d_emis[rows, cols, tags] -= 1.0
    # pairwise marginals -> transition grad
    d_T = np.zeros((K, K))
    for t in range(L - 1):
        xi = np.exp(
            alpha[:, t][:, :, None]
            + T[None]
            + (emis[:, t + 1] + beta[:, t + 1])[:, None, :]
            - logZ[:, None, None]
        )
        d_T += xi.sum(axis=0)
    np.add.at(d_T, (tags[:, :-1].ravel(), tags[:, 1:].ravel()), -1.0)
    # gold-path score
    score = emis[rows, cols, tags].sum(axis=1) + T[tags[:, :-1], tags[:, 1:]].sum(axis=1)
    nll = float((logZ - score).sum())
    return nll, d_emis, d_T


# --------------------------------------------------------------------------
# BiLSTM forward with cache + BPTT
# --------------------------------------------------------------------------


def _lstm_forward_cached(x, wx, wh, b, hidden: int):
    B, L, _ = x.shape
    hs = np.zeros((B, L, hidden))
    cache = []
    ht = np.zeros((B, hidden))
    ct = np.zeros((B, hidden))
    for t in range(L):
        g = x[:, t, :] @ wx + ht @ wh + b
        gi, gf, gc, go = np.split(g, 4, axis=1)
        i = 1.0 / (1.0 + np.exp(-gi))
        f = 1.0 / (1.0 + np.exp(-gf))
        o = 1.0 / (1.0 + np.exp(-go))
        cin = np.tanh(gc)
        c_prev = ct
        ct = f * c_prev + i * cin
        tc = np.tanh(ct)
        h_prev = ht
        ht = o * tc
        hs[:, t, :] = ht
        cache.append((x[:, t, :], h_prev, c_prev, i, f, o, cin, tc))
    return hs, cache


def _lstm_backward(d_hs, cache, wx, wh):
    B, L, _ = d_hs.shape
    d_wx = np.zeros_like(wx)
    d_wh = np.zeros_like(wh)
    d_b = np.zeros(wx.shape[1])
    d_x = np.zeros((B, L, wx.shape[0]))
    dh_next = np.zeros((B, d_hs.shape[2]))
    dc_next = np.zeros((B, d_hs.shape[2]))
    for t in range(L - 1, -1, -1):
        xt, h_prev, c_prev, i, f, o, cin, tc = cache[t]
        dh = d_hs[:, t, :] + dh_next
        do = dh * tc
        dc = dh * o * (1.0 - tc * tc) + dc_next
        di = dc * cin
        df = dc * c_prev
        dcin = dc * i
        dgi = di * i * (1.0 - i)
        dgf = df * f * (1.0 - f)
        dgo = do * o * (1.0 - o)
        dgc = dcin * (1.0 - cin * cin)
        dg = np.concatenate([dgi, dgf, dgc, dgo], axis=1)
        d_wx += xt.T @ dg
        d_wh += h_prev.T @ dg
        d_b += dg.sum(axis=0)
        d_x[:, t, :] = dg @ wx.T
        dh_next = dg @ wh.T
        dc_next = dc * f
    return d_wx, d_wh, d_b, d_x


# --------------------------------------------------------------------------
# Trainer
# --------------------------------------------------------------------------


@dataclass
class TrainedBiLSTM:
    """Parameter container during training (same fields the checkpoint
    persists; ``to_frozen`` emits the production inference object)."""

    word2id: dict[str, int]
    dim: int
    hidden: int
    params: dict[str, np.ndarray] = field(default_factory=dict)

    @classmethod
    def create(cls, word2id: dict[str, int], dim=16, hidden=16, seed=0):
        V = len(word2id)
        rng = np.random.default_rng(seed)
        g = 1.0 / np.sqrt(hidden)
        p = {
            "embed": rng.uniform(-0.25, 0.25, size=(V, dim)),
            "wx_f": rng.normal(0, g, size=(dim, 4 * hidden)),
            "wh_f": rng.normal(0, g, size=(hidden, 4 * hidden)),
            "b_f": np.zeros(4 * hidden),
            "wx_b": rng.normal(0, g, size=(dim, 4 * hidden)),
            "wh_b": rng.normal(0, g, size=(hidden, 4 * hidden)),
            "b_b": np.zeros(4 * hidden),
            "proj_w": rng.normal(0, g, size=(2 * hidden, NUM_TAGS)),
            "proj_b": np.zeros(NUM_TAGS),
            "transitions": _bio_transitions(),
        }
        return cls(word2id=word2id, dim=dim, hidden=hidden, params=p)

    def to_frozen(self) -> FrozenBiLSTM:
        cps, ids = vocab_codepoint_arrays(self.word2id)
        p = self.params
        return FrozenBiLSTM(
            word2id=self.word2id,
            embed=p["embed"],
            wx_f=p["wx_f"], wh_f=p["wh_f"], b_f=p["b_f"],
            wx_b=p["wx_b"], wh_b=p["wh_b"], b_b=p["b_b"],
            proj_w=p["proj_w"], proj_b=p["proj_b"],
            # trained model: knowledge is in the weights, prior is zero
            prior=np.zeros((len(self.word2id), NUM_TAGS)),
            transitions=p["transitions"],
            cp_sorted=cps, cp_ids=ids,
            dim=self.dim, hidden=self.hidden,
        )


def _encode(corpus, word2id) -> dict[int, tuple[np.ndarray, np.ndarray]]:
    """Group sentences by length -> {L: (ids [N, L], tags [N, L])} — same-
    length batches need no padding, so the BPTT has no mask logic at all."""
    from ner_ray.functions.normalize import chars_to_ids

    by_len: dict[int, list[tuple[list[int], list[int]]]] = {}
    for chars, tags in corpus:
        ids = chars_to_ids(chars, word2id)
        labs = [TAG2LABEL[t] for t in tags]
        by_len.setdefault(len(ids), []).append((ids, labs))
    out = {}
    for L, rows in by_len.items():
        out[L] = (
            np.array([r[0] for r in rows], dtype=np.int64),
            np.array([r[1] for r in rows], dtype=np.int64),
        )
    return out


def train_bilstm(
    corpus: list[tuple[list[str], list[str]]],
    dim: int = 16,
    hidden: int = 16,
    epochs: int = 12,
    lr: float = 0.02,
    batch_size: int = 32,
    seed: int = 0,
    word2id: dict[str, int] | None = None,
) -> TrainedBiLSTM:
    """Full-BPTT CRF training (Adam).  Deterministic in (corpus, seed)."""
    word2id = word2id or corpus_vocab(corpus)
    m = TrainedBiLSTM.create(word2id, dim=dim, hidden=hidden, seed=seed)
    p = m.params
    trans_mask = (p["transitions"] > NEG / 2).astype(np.float64)

    adam_m = {k: np.zeros_like(v) for k, v in p.items()}
    adam_v = {k: np.zeros_like(v) for k, v in p.items()}
    b1, b2, eps = 0.9, 0.999, 1e-8
    step = 0

    grouped = _encode(corpus, word2id)
    rng = np.random.default_rng(seed + 1)
    batches = []
    for L, (ids, tags) in grouped.items():
        for s in range(0, len(ids), batch_size):
            batches.append((ids[s : s + batch_size], tags[s : s + batch_size]))

    for _epoch in range(epochs):
        order = rng.permutation(len(batches))
        for bi in order:
            ids, tags = batches[bi]
            x = p["embed"][ids]
            fwd, cache_f = _lstm_forward_cached(x, p["wx_f"], p["wh_f"], p["b_f"], hidden)
            xr = x[:, ::-1, :]
            bwd_r, cache_b = _lstm_forward_cached(xr, p["wx_b"], p["wh_b"], p["b_b"], hidden)
            bwd = bwd_r[:, ::-1, :]
            hcat = np.concatenate([fwd, bwd], axis=2)
            emis = hcat @ p["proj_w"] + p["proj_b"]
            _nll, d_emis, d_T = crf_nll_grad(emis, tags, p["transitions"])
            n_tok = float(ids.size)
            d_emis /= n_tok
            d_T /= n_tok
            grads: dict[str, np.ndarray] = {}
            grads["transitions"] = d_T * trans_mask
            grads["proj_w"] = hcat.reshape(-1, 2 * hidden).T @ d_emis.reshape(-1, NUM_TAGS)
            grads["proj_b"] = d_emis.sum(axis=(0, 1))
            d_hcat = d_emis @ p["proj_w"].T
            dwx_f, dwh_f, db_f, dx_f = _lstm_backward(
                d_hcat[:, :, :hidden], cache_f, p["wx_f"], p["wh_f"]
            )
            dwx_b, dwh_b, db_b, dx_br = _lstm_backward(
                d_hcat[:, ::-1, hidden:], cache_b, p["wx_b"], p["wh_b"]
            )
            grads.update(
                wx_f=dwx_f, wh_f=dwh_f, b_f=db_f,
                wx_b=dwx_b, wh_b=dwh_b, b_b=db_b,
            )
            dx = dx_f + dx_br[:, ::-1, :]
            d_embed = np.zeros_like(p["embed"])
            np.add.at(d_embed, ids, dx)
            grads["embed"] = d_embed

            step += 1
            for k, g in grads.items():
                adam_m[k] = b1 * adam_m[k] + (1 - b1) * g
                adam_v[k] = b2 * adam_v[k] + (1 - b2) * g * g
                mhat = adam_m[k] / (1 - b1**step)
                vhat = adam_v[k] / (1 - b2**step)
                p[k] -= lr * mhat / (np.sqrt(vhat) + eps)
            # keep the BIO-validity skeleton hard
            p["transitions"] = np.where(trans_mask > 0, p["transitions"], NEG)
    return m


# --------------------------------------------------------------------------
# Evaluation + artifact builder
# --------------------------------------------------------------------------


def span_f1(model: FrozenBiLSTM, corpus) -> dict:
    """Span-level P/R/F1 of a model's Viterbi decode over a corpus."""
    from ner_ray.functions.metrics import SpanEval
    from ner_ray.functions.normalize import chars_to_ids

    ev = SpanEval()
    lab = [LABEL2TAG[i] for i in range(NUM_TAGS)]
    for chars, tags in corpus:
        ids = np.array([chars_to_ids(chars, model.word2id)], dtype=np.int64)
        lens = np.array([len(chars)], dtype=np.int64)
        emis = model.emissions(ids, lengths=lens)
        path = viterbi_decode_batch(emis, lens, model.transitions)[0]
        ev.update(list(tags), [lab[int(i)] for i in path[: len(chars)]])
    return ev.report()


def rule_tagger_f1(corpus) -> dict:
    """The fixture rule tagger's span F1 on the same corpus (the baseline
    the trained model must beat on held-out surfaces)."""
    from ner_ray.functions.bio import fold_bio
    from ner_ray.functions.metrics import SpanEval
    from ner_ray.stages.tagger import RuleTagger

    rt = RuleTagger(output="tags")
    ev = SpanEval()
    for chars, tags in corpus:
        text = "".join(chars)
        spans = rt._spans(text)
        pred = ["O"] * len(chars)
        for surface, typ, s, e in spans:
            pred[s] = f"B-{typ}"
            for i in range(s + 1, e):
                pred[i] = f"I-{typ}"
        ev.update(list(tags), pred)
    return ev.report()


def build_eval_assets(
    root: str,
    n_train: int = 2400,
    n_eval: int = 400,
    epochs: int = 16,
    seed: int = 17,
) -> dict:
    """Idempotent cached build of the trained-tagger evaluation assets:
    ``<root>/checkpoint`` (state.checkpoint layout) + ``<root>/heldout_bio``
    (the held-out corpus as S1 BIO text shards) + ``<root>/metrics.json``.
    Safe to call from any process; keyed by the _SUCCESS marker."""
    import json
    import os

    import pyarrow as pa

    ckpt = os.path.join(root, "checkpoint")
    bio_dir = os.path.join(root, "heldout_bio")
    marker = os.path.join(root, "_SUCCESS")
    mpath = os.path.join(root, "metrics.json")
    if not os.path.exists(marker):
        from ner_ray.sources.bio_corpus import format_bio_text

        os.makedirs(bio_dir, exist_ok=True)
        metrics = build_trained_checkpoint(
            ckpt, n_train=n_train, n_eval=n_eval, epochs=epochs, seed=seed
        )
        # the SAME held-out corpus build_trained_checkpoint scored
        # (deterministic seeds), written as S1 shards for the distributed path
        held_s = make_surface_splits(seed=seed)[1]
        held = make_corpus(n_eval, held_s, seed=seed + 2)
        shards = 4
        per = (len(held) + shards - 1) // shards
        for si in range(shards):
            part = held[si * per : (si + 1) * per]
            t = pa.table(
                {
                    "chars": pa.array([c for c, _ in part], pa.list_(pa.string())),
                    "tags": pa.array([t_ for _, t_ in part], pa.list_(pa.string())),
                }
            )
            with open(os.path.join(bio_dir, f"part-{si}.txt"), "w") as f:
                f.write(format_bio_text(t))
        with open(mpath, "w") as f:
            json.dump(metrics, f)
        with open(marker, "w") as f:
            f.write("ok")
    with open(mpath) as f:
        metrics = json.load(f)
    metrics["checkpoint"] = ckpt
    metrics["heldout_bio"] = bio_dir
    return metrics


def build_trained_checkpoint(
    out_path: str,
    n_train: int = 1200,
    n_eval: int = 300,
    epochs: int = 12,
    seed: int = 17,
) -> dict:
    """Train on the synthetic corpus, save through ``state.checkpoint``, and
    return ``{"train_f1", "heldout_f1", "rule_heldout_f1", "path"}``.
    Deterministic in seed; cached by callers via the checkpoint dir."""
    from ner_ray.state.checkpoint import save_bilstm

    train_s, held_s = make_surface_splits(seed=seed)
    train_corpus = make_corpus(n_train, train_s, seed=seed + 1)
    held_corpus = make_corpus(n_eval, held_s, seed=seed + 2)
    m = train_bilstm(train_corpus, epochs=epochs, seed=seed + 3)
    frozen = m.to_frozen()
    save_bilstm(frozen, out_path)
    return {
        "path": out_path,
        "train_f1": span_f1(frozen, train_corpus[: min(300, n_train)])["overall"]["f1"],
        "heldout_f1": span_f1(frozen, held_corpus)["overall"]["f1"],
        "rule_heldout_f1": rule_tagger_f1(held_corpus)["overall"]["f1"],
        "n_train": n_train,
        "n_eval": n_eval,
        "epochs": epochs,
        "seed": seed,
    }
