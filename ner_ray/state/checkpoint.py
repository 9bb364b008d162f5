"""Checkpoint save/load for the tagger models — the real trained-weights
path the frozen substitutes were designed to swap into (SURVEY.md §0
checklist item 5; ``state/model.py`` / ``state/bert.py`` docstrings).

The reference loads TF-1.x ``tf.train.Saver`` checkpoints (reconstructed —
SURVEY.md §2 S4/M9); this engine's equivalent is a plain directory:

    <path>/weights.npz   every weight array (numpy, no pickle)
    <path>/meta.json     format tag + dims + vocabulary (written LAST — its
                         presence is the commit marker, so a torn write is
                         never loadable)

Why a *path* and not an ObjectRef: a string constructor argument keeps the
tagger actors restartable — Ray can rebuild a lost actor from the task spec
alone and the actor re-reads the checkpoint in ``__init__``, whereas an
ObjectRef in ``fn_constructor_kwargs`` makes restart fail if the ref's owner
dies (ray#53727, the round-2 flagship hazard).  On a multi-node cluster the
path would be shared storage (NFS/S3 via pyarrow.fs), exactly how real
checkpoints ship.

No torch/TF in this container, so checkpoints hold the same numpy arrays
the frozen models use; converting a real trained checkpoint is a one-time
export into this layout (key names below match the dataclass fields).
"""

from __future__ import annotations

import json
import os

import numpy as np

_BILSTM_FORMAT = "ner_ray-bilstm-v1"
_BERT_FORMAT = "ner_ray-bert-v1"

# per-layer weight keys of state.bert.FrozenTinyBert.layers (the memoized
# "_wqkv" fusion is derived state and never persisted)
_BERT_LAYER_KEYS = (
    "wq", "wk", "wv", "wo", "ln1_g", "ln1_b",
    "w1", "b1", "w2", "b2", "ln2_g", "ln2_b",
)


def _write(path: str, arrays: dict[str, np.ndarray], meta: dict) -> None:
    """Crash-safe save, safe for RE-saves too: the whole checkpoint is staged
    in a fresh sibling temp dir and swapped in, so new weights are never
    visible next to old meta (the in-place variant only guaranteed
    torn-write safety for the FIRST save).  meta embeds a weights digest
    verified at load, so any torn mix that does survive a crash is rejected
    rather than silently loaded."""
    import hashlib
    import shutil

    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    stage = f"{path}.tmp.{os.getpid()}"
    if os.path.exists(stage):
        shutil.rmtree(stage)
    os.makedirs(stage)
    wpath = os.path.join(stage, "weights.npz")
    with open(wpath, "wb") as f:
        np.savez(f, **arrays)
    with open(wpath, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    meta = dict(meta, weights_sha256=digest)
    with open(os.path.join(stage, "meta.json"), "w") as f:
        json.dump(meta, f)
    if os.path.exists(path):
        # uncommit the old checkpoint FIRST (meta.json is the commit
        # marker), then drop it — at no instant is a mixed old/new pair
        # loadable
        old_meta = os.path.join(path, "meta.json")
        if os.path.exists(old_meta):
            os.remove(old_meta)
        shutil.rmtree(path)
    os.replace(stage, path)


def _read(path: str, expect_format: str) -> tuple[dict, dict]:
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"no checkpoint at {path!r} (meta.json missing — torn or absent write)"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("format") != expect_format:
        raise ValueError(
            f"checkpoint at {path!r} has format {meta.get('format')!r}, "
            f"expected {expect_format!r}"
        )
    wpath = os.path.join(path, "weights.npz")
    want = meta.get("weights_sha256")
    if want is not None:
        import hashlib

        with open(wpath, "rb") as f:
            got = hashlib.sha256(f.read()).hexdigest()
        if got != want:
            raise ValueError(
                f"checkpoint at {path!r} is corrupt: weights.npz digest "
                f"{got[:12]}… != meta.json's {want[:12]}… (torn overwrite)"
            )
    arrays = dict(np.load(wpath))
    return arrays, meta


def save_bilstm(model, path: str) -> None:
    """Persist a ``state.model.FrozenBiLSTM`` (trained or frozen)."""
    arrays = {
        k: getattr(model, k)
        for k in (
            "embed", "wx_f", "wh_f", "b_f", "wx_b", "wh_b", "b_b",
            "proj_w", "proj_b", "prior", "transitions",
        )
    }
    meta = {
        "format": _BILSTM_FORMAT,
        "dim": model.dim,
        "hidden": model.hidden,
        "vocab": list(model.word2id.keys()),
        "vocab_ids": [int(i) for i in model.word2id.values()],
    }
    _write(path, arrays, meta)


def load_bilstm(path: str):
    from ner_ray.state.model import FrozenBiLSTM
    from ner_ray.state.vocab import vocab_codepoint_arrays

    arrays, meta = _read(path, _BILSTM_FORMAT)
    word2id = dict(zip(meta["vocab"], meta["vocab_ids"]))
    cps, ids = vocab_codepoint_arrays(word2id)
    return FrozenBiLSTM(
        word2id=word2id,
        cp_sorted=cps,
        cp_ids=ids,
        dim=int(meta["dim"]),
        hidden=int(meta["hidden"]),
        **arrays,
    )


def save_bert(model, path: str) -> None:
    """Persist a ``state.bert.FrozenTinyBert`` (trained or frozen)."""
    arrays = {
        "word_emb": model.word_emb,
        "pos_emb": model.pos_emb,
        "head_w": model.head_w,
        "head_b": model.head_b,
        "prior": model.prior,
    }
    for i, lw in enumerate(model.layers):
        for k in _BERT_LAYER_KEYS:
            arrays[f"l{i}.{k}"] = lw[k]
    meta = {
        "format": _BERT_FORMAT,
        "hidden": model.hidden,
        "n_heads": model.n_heads,
        "n_layers": len(model.layers),
        "max_position": model.max_position,
        "vocab": model.vocab_list,
    }
    _write(path, arrays, meta)


def load_bert(path: str):
    from ner_ray.state.bert import FrozenTinyBert

    arrays, meta = _read(path, _BERT_FORMAT)
    layers = [
        {k: arrays[f"l{i}.{k}"] for k in _BERT_LAYER_KEYS}
        for i in range(int(meta["n_layers"]))
    ]
    vocab_list = list(meta["vocab"])
    return FrozenTinyBert(
        vocab_list=vocab_list,
        tok2id={t: i for i, t in enumerate(vocab_list)},
        word_emb=arrays["word_emb"],
        pos_emb=arrays["pos_emb"],
        layers=layers,
        head_w=arrays["head_w"],
        head_b=arrays["head_b"],
        prior=arrays["prior"],
        hidden=int(meta["hidden"]),
        n_heads=int(meta["n_heads"]),
        max_position=int(meta["max_position"]),
    )
