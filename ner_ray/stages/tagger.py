"""B3 — mention detection: the flagship stateful actor-pool stage.

Turns ``(conv_id, turn_idx, ..., text)`` rows into a **mentions** table
(schemas.MENTIONS) or a reference-style per-turn **tags** table
(schemas.TAGS).  Two interchangeable taggers behind one interface
(SURVEY.md §7 step 3):

- ``RuleTagger`` — deterministic gazetteer tagger (leftmost-longest match,
  compiled alternation).  This is the pinned stand-in for the reference NER
  predictions (the reference mount was empty — SURVEY.md §0): it produces the
  golden output the P/R >= 0.95 gate compares against.
- ``NeuralTagger`` — the reference BiLSTM-CRF inference path re-implemented
  in numpy (M1 embedding lookup -> M2 BiLSTM -> M3 projection -> M5 batched
  Viterbi over CRF transitions -> E1 span folding), with frozen deterministic
  weights (state.model).  Proves the stateful-actor + padded-batch +
  batch-vectorized-decode machinery that a real trained model would use
  (swap ``FrozenBiLSTM.create`` for a checkpoint loader; nothing else
  changes).

Ray Data mapping: ``ds.map_batches(TaggerCls, concurrency=N, batch_size=B,
batch_format="pyarrow", zero_copy_batch=True)`` — model/vocab/regex state is
built ONCE per actor in ``__init__`` (reference loads its checkpoint once per
process the same way; ``model.py:~60`` saver (R)), work happens per Arrow
batch in ``__call__``.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ner_ray import schemas
from ner_ray.fixtures import gazetteer as gz
from ner_ray.functions.bio import fold_bio, spans_to_bio
from ner_ray.functions.viterbi import viterbi_decode_batch
from ner_ray.schemas import LABEL2TAG
from ner_ray.state.model import FrozenBiLSTM
from ner_ray.utils import heavy_pool_size

_ASCII_WORD = re.compile(r"[A-Za-z0-9]")


def stable_mention_id(conv_id: str, turn_idx: int, start: int) -> int:
    """Deterministic 63-bit mention id (stable across runs and shardings)."""
    h = hashlib.blake2b(f"{conv_id}:{turn_idx}:{start}".encode(), digest_size=8).digest()
    return int.from_bytes(h, "big") >> 1


def _mentions_table(rows: dict[str, list]) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "mention_id": pa.array(rows["mention_id"], pa.int64()),
            "surface": pa.array(rows["surface"], pa.string()),
            "type": pa.array(rows["type"], pa.string()),
            "start": pa.array(rows["start"], pa.int32()),
            "end": pa.array(rows["end"], pa.int32()),
        },
        schema=schemas.MENTIONS,
    )


class RuleTagger:
    """Gazetteer tagger: leftmost-longest match over planted surfaces.

    ``__init__`` compiles the pattern once per actor.  Matching itself runs in
    the C regex engine per row; for gazetteers beyond ~10^4 surfaces swap the
    alternation for an Aho-Corasick automaton (same actor interface).
    """

    def __init__(self, surface2type: dict[str, str] | None = None, output: str = "mentions"):
        self.surface2type = dict(surface2type or gz.SURFACE2TYPE)
        # Longest-first alternation => leftmost-longest semantics.
        pats = sorted(self.surface2type, key=len, reverse=True)
        self.pattern = re.compile("|".join(re.escape(s) for s in pats))
        self.output = output

    def _spans(self, text: str) -> list[tuple[str, str, int, int]]:
        out = []
        for m in self.pattern.finditer(text):
            s, e = m.span()
            # ASCII word-boundary guard: don't match "Lima" inside "climate".
            if s > 0 and _ASCII_WORD.match(text[s - 1]) and _ASCII_WORD.match(text[s]):
                continue
            if e < len(text) and _ASCII_WORD.match(text[e - 1]) and _ASCII_WORD.match(text[e]):
                continue
            out.append((m.group(), self.surface2type[m.group()], s, e))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()
        if self.output == "tags":
            return _tags_table(conv, turn, texts, [self._spans(t) for t in texts])
        if self.output == "turn_mentions":
            return _turn_mentions_table(conv, turn, texts, [self._spans(t) for t in texts])
        rows: dict[str, list] = {
            k: [] for k in ("conv_id", "turn_idx", "mention_id", "surface", "type", "start", "end")
        }
        for c, ti, text in zip(conv, turn, texts):
            for surface, typ, s, e in self._spans(text):
                rows["conv_id"].append(c)
                rows["turn_idx"].append(ti)
                rows["mention_id"].append(stable_mention_id(c, ti, s))
                rows["surface"].append(surface)
                rows["type"].append(typ)
                rows["start"].append(s)
                rows["end"].append(e)
        return _mentions_table(rows)


def _turn_mentions_table(conv, turn, texts, spans_per_row) -> pa.Table:
    structs = [
        [{"surface": s, "type": t, "start": st, "end": en} for s, t, st, en in spans]
        for spans in spans_per_row
    ]
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "text": pa.array(texts, pa.string()),
            "mentions": pa.array(structs, pa.list_(schemas.MENTION_STRUCT)),
        },
        schema=schemas.TURN_MENTIONS,
    )


def _tags_table(conv, turn, texts, spans_per_row) -> pa.Table:
    chars_col, tags_col = [], []
    for text, spans in zip(texts, spans_per_row):
        chars_col.append(list(text))
        tags_col.append(spans_to_bio(len(text), [(s, e, t) for _, t, s, e in spans]))
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "chars": pa.array(chars_col, pa.list_(pa.string())),
            "tags": pa.array(tags_col, pa.list_(pa.string())),
        },
        schema=schemas.TAGS,
    )


class NeuralTagger:
    """BiLSTM-CRF inference actor (reference M1-M5 machinery, numpy).

    Model state arrives one of four ways (first match wins):

    - ``weights_path`` (str): load a TRAINED checkpoint from
      ``state.checkpoint`` layout (weights.npz + meta.json on shared
      storage).  A plain string keeps the actor restartable — the restarted
      actor just re-reads the path (no ObjectRef in the task spec,
      ray#53727); on a real cluster this is NFS/S3 via pyarrow.fs.
    - ``model_spec`` (dict of ``FrozenBiLSTM.create`` kwargs): the model is
      REBUILT deterministically inside ``__init__`` — constructor args stay
      plain values, so Ray can restart a lost actor from the task spec alone
      (an ObjectRef in ``fn_constructor_kwargs`` makes restart fail if the
      ref's owner dies, ray#53727).  Preferred for the frozen substitutes.
    - ``model_ref`` (``ray.ObjectRef`` from ``ray.put``): one shared
      object-store copy — the pattern for a real multi-GB trained checkpoint
      that cannot be rebuilt per actor (accepting the restart caveat).
    - none of the above: build the default frozen model in-actor.

    Long turns are processed in segments of ``max_seq_len`` and the decoded
    tags stitched (chunk-and-stitch; the reference instead TRUNCATES at
    max_seq_length=128 — enable ``strict_reference_mode`` to reproduce that
    divergence exactly; SURVEY.md §7 hard part 2).
    """

    def __init__(
        self,
        model_ref=None,
        model_spec: dict | None = None,
        output: str = "mentions",
        max_seq_len: int = 256,
        strict_reference_mode: bool = False,
        weights_path: str | None = None,
    ):
        if weights_path is not None:
            from ner_ray.state.checkpoint import load_bilstm

            self.model = load_bilstm(weights_path)
        elif model_spec is not None:
            self.model = FrozenBiLSTM.create(**model_spec)
        elif model_ref is not None:
            import ray

            self.model = ray.get(model_ref)
        else:
            self.model = FrozenBiLSTM.create()
        self.output = output
        self.max_seq_len = max_seq_len
        self.strict = strict_reference_mode
        self.tag_lookup = np.array([LABEL2TAG[i] for i in range(len(LABEL2TAG))], dtype=object)

    def _decode_texts(self, texts: list[str]) -> list[list[str]]:
        # Segment long texts (or truncate in strict mode), keep a row map.
        seg_cps: list[np.ndarray] = []
        seg_owner: list[int] = []
        for r, text in enumerate(texts):
            cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            if self.strict:
                cps = cps[: self.max_seq_len]
                segs = [cps] if len(cps) else []
            else:
                segs = [
                    cps[i : i + self.max_seq_len] for i in range(0, len(cps), self.max_seq_len)
                ]
            for s in segs:
                seg_cps.append(s)
                seg_owner.append(r)
        tags_per_row: list[list[str]] = [[] for _ in texts]
        if not seg_cps:
            return tags_per_row
        lens = np.array([len(s) for s in seg_cps], dtype=np.int64)
        Lmax = int(lens.max())
        ids = np.zeros((len(seg_cps), Lmax), dtype=np.int64)  # 0 == <PAD>
        for i, s in enumerate(seg_cps):
            ids[i, : len(s)] = self.model.ids_for_codepoints(s)
        logits = self.model.emissions(ids, lengths=lens)  # M1-M3 (+prior)
        paths = viterbi_decode_batch(logits, lens, self.model.transitions)  # M5
        for i, owner in enumerate(seg_owner):
            tags_per_row[owner].extend(self.tag_lookup[paths[i, : lens[i]]].tolist())
        return tags_per_row

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()
        tags_per_row = self._decode_texts(texts)
        if self.output == "tags":
            chars_col = [list(t) if not self.strict else list(t)[: self.max_seq_len] for t in texts]
            return pa.table(
                {
                    "conv_id": pa.array(conv, pa.string()),
                    "turn_idx": pa.array(turn, pa.int32()),
                    "chars": pa.array(chars_col, pa.list_(pa.string())),
                    "tags": pa.array(tags_per_row, pa.list_(pa.string())),
                },
                schema=schemas.TAGS,
            )
        if self.output == "turn_mentions":
            spans_per_row = [
                fold_bio(list(t)[: len(tags)], tags) for t, tags in zip(texts, tags_per_row)
            ]
            return _turn_mentions_table(conv, turn, texts, spans_per_row)
        rows: dict[str, list] = {
            k: [] for k in ("conv_id", "turn_idx", "mention_id", "surface", "type", "start", "end")
        }
        for c, ti, text, tags in zip(conv, turn, texts, tags_per_row):
            for surface, typ, s, e in fold_bio(list(text)[: len(tags)], tags):  # E1
                rows["conv_id"].append(c)
                rows["turn_idx"].append(ti)
                rows["mention_id"].append(stable_mention_id(c, ti, s))
                rows["surface"].append(surface)
                rows["type"].append(typ)
                rows["start"].append(s)
                rows["end"].append(e)
        return _mentions_table(rows)


def _word_boundary_chunks(toks: list, cap: int) -> list[list]:
    """Split a wordpiece sequence into <=cap segments WITHOUT splitting a
    word: a fixed-stride ``toks[i:i+cap]`` chunking can land the boundary
    mid-word, which (a) truncates the mention surface — the word-end
    extension loop only scans within its segment — and (b) silently drops
    the continuation pieces opening the next segment.  Segments break at
    word starts; a degenerate single word longer than ``cap`` pieces is
    hard-split (its tail pieces decode as X/O, matching the old behavior
    for that pathological case only)."""
    segs: list[list] = []
    cur: list = []
    i, n = 0, len(toks)
    while i < n:
        j = i + 1
        while j < n and toks[j].is_continuation:
            j += 1
        wlen = j - i
        if wlen > cap:
            if cur:
                segs.append(cur)
                cur = []
            for k in range(i, j, cap):
                segs.append(list(toks[k : min(k + cap, j)]))
            i = j
            continue
        if len(cur) + wlen > cap:
            segs.append(cur)
            cur = []
        cur.extend(toks[i:j])
        i = j
    if cur:
        segs.append(cur)
    return segs


class BertTagger:
    """BERT-path inference actor (reference M7-M10 machinery, numpy).

    Per turn: WordPiece tokenize with offsets (M7) -> ``[CLS] pieces [SEP]``
    feature rows at ``max_seq_length`` (M8; reference truncates at 128 —
    ``strict_reference_mode`` reproduces that, default chunks-and-stitches;
    SURVEY.md §7 hard part 2) -> batched transformer encode + NER head
    (M9/M10, ``state.bert.FrozenTinyBert``) -> per-token argmax with the
    reference's X/[CLS]/[SEP] label scheme -> word-level BIO folding back to
    char spans via token offsets (E1).

    Same actor-pool interface as the other taggers; model state arrives via
    ``weights_path`` (a TRAINED ``state.checkpoint`` directory on shared
    storage — restart-safe, see ``NeuralTagger``), ``model_spec``
    (``FrozenTinyBert.create`` kwargs, rebuilt in-actor — restart-safe),
    ``model_ref`` (one object-store copy for a real non-rebuildable
    checkpoint), or none of them (frozen default).
    """

    def __init__(
        self,
        model_ref=None,
        model_spec: dict | None = None,
        output: str = "mentions",
        max_seq_length: int = 128,
        strict_reference_mode: bool = False,
        decode: str = "crf",  # "crf" (BLSTM_CRF head, Viterbi) | "softmax" (argmax)
        weights_path: str | None = None,
    ):
        from ner_ray.state.bert import BERT_LABELS, FrozenTinyBert, bert_bio_transitions

        if weights_path is not None:
            from ner_ray.state.checkpoint import load_bert

            self.model = load_bert(weights_path)
        elif model_spec is not None:
            self.model = FrozenTinyBert.create(**model_spec)
        elif model_ref is not None:
            import ray

            self.model = ray.get(model_ref)
        else:
            self.model = FrozenTinyBert.create()
        self.labels = BERT_LABELS
        self.vocab = self.model.vocab
        self.output = output
        self.max_seq = max_seq_length
        self.strict = strict_reference_mode
        self.decode = decode
        self.transitions = bert_bio_transitions()
        # actor-lifetime wordpiece memo (Zipfian word distribution)
        self._wp_cache: dict = {}

    def _word_tags_and_spans(self, texts: list[str]) -> list[list[tuple[str, str, int, int]]]:
        from ner_ray.functions import wordpiece as wp

        cap = self.max_seq - 2  # room for [CLS] / [SEP] (M8)
        seg_rows: list[list] = []  # token lists per segment
        seg_owner: list[int] = []
        toks_per_row = wp.tokenize_batch(texts, self.vocab, cache=self._wp_cache)
        for r, toks in enumerate(toks_per_row):
            if self.strict:
                segs = [toks[:cap]] if toks else []
            else:
                segs = _word_boundary_chunks(toks, cap)
            for s in segs:
                seg_rows.append(s)
                seg_owner.append(r)
        spans_per_row: list[list[tuple[str, str, int, int]]] = [[] for _ in texts]
        if not seg_rows:
            return spans_per_row
        cls_id = self.model.tok2id[wp.CLS_TOKEN]
        sep_id = self.model.tok2id[wp.SEP_TOKEN]
        unk_id = self.model.tok2id[wp.UNK_TOKEN]
        lens = np.array([len(s) + 2 for s in seg_rows], dtype=np.int64)
        # length-bucketed micro-batches: sort by length, pad each chunk to its
        # OWN max — padding everything to the batch max makes the transformer
        # pay max-len cost for typical short turns (the M8 fixed-128 padding
        # the reference uses, which we deliberately avoid)
        order = np.argsort(lens, kind="stable")
        pred = [None] * len(seg_rows)
        # 128 beats 512 by ~14% under 32-way parallelism (smaller padded
        # [CHUNK, Lmax, H] working set stays cache-resident; measured with
        # the multiprocessing ceiling bench, eff 0.78 at both sizes)
        CHUNK = int(os.environ.get("NER_RAY_BERT_CHUNK", "128"))
        for c0 in range(0, len(order), CHUNK):
            sel = order[c0 : c0 + CHUNK]
            Lmax = int(lens[sel].max())
            ids = np.zeros((len(sel), Lmax), dtype=np.int64)  # 0 == [PAD]
            mask = np.zeros((len(sel), Lmax), dtype=bool)
            for r, i in enumerate(sel):
                toks = seg_rows[i]
                row = [cls_id] + [self.model.tok2id.get(t.piece, unk_id) for t in toks] + [sep_id]
                ids[r, : len(row)] = row
                mask[r, : len(row)] = True
            logits = self.model.emissions(ids, mask)
            logits[:, :, 0] = -1e9  # [PAD] label never decodes on real positions
            if self.decode == "crf":  # M10 BLSTM_CRF head: batched Viterbi
                chunk_pred = viterbi_decode_batch(logits, lens[sel], self.transitions)
            else:  # softmax path (M6-style argmax head)
                chunk_pred = logits.argmax(axis=2)
            for r, i in enumerate(sel):
                pred[i] = chunk_pred[r]
        # token labels -> word-level BIO -> char spans, stitched across segments
        word_seq: list[list[tuple[str, int, int]]] = [[] for _ in texts]  # (tag, start, end)
        for i, toks in enumerate(seg_rows):
            owner = seg_owner[i]
            for j, t in enumerate(toks):
                if t.is_continuation:
                    continue  # continuation pieces carry X by convention
                lab = self.labels[pred[i][j + 1]]  # +1 skips [CLS]
                if lab in ("X", "[CLS]", "[SEP]", "[PAD]"):
                    lab = "O"
                # extend word end over its continuation pieces
                end = t.end
                for t2 in toks[j + 1 :]:
                    if not t2.is_continuation:
                        break
                    end = t2.end
                word_seq[owner].append((lab, t.start, end))
        for r, words in enumerate(word_seq):
            spans_per_row[r] = self._fold_words(texts[r], words)
        return spans_per_row

    @staticmethod
    def _fold_words(
        text: str, words: list[tuple[str, int, int]]
    ) -> list[tuple[str, str, int, int]]:
        """Word-level BIO folding (same pinned edge semantics as
        functions.bio.fold_bio, applied over word offsets)."""
        spans = []
        open_type: str | None = None
        start = end = 0
        for tag, ws, we in words:
            if tag.startswith("B-") or (tag.startswith("I-") and open_type != tag[2:]):
                if open_type is not None:
                    spans.append((text[start:end], open_type, start, end))
                open_type = tag[2:]
                start, end = ws, we
            elif tag.startswith("I-"):
                end = we
            else:
                if open_type is not None:
                    spans.append((text[start:end], open_type, start, end))
                    open_type = None
        if open_type is not None:
            spans.append((text[start:end], open_type, start, end))
        return spans

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()
        spans_per_row = self._word_tags_and_spans(texts)
        if self.output == "tags":
            return _tags_table(
                conv, turn, texts,
                [[(s, t, st, en) for s, t, st, en in spans] for spans in spans_per_row],
            )
        if self.output == "turn_mentions":
            return _turn_mentions_table(conv, turn, texts, spans_per_row)
        rows: dict[str, list] = {
            k: [] for k in ("conv_id", "turn_idx", "mention_id", "surface", "type", "start", "end")
        }
        for c, ti, spans in zip(conv, turn, spans_per_row):
            for surface, typ, s, e in spans:
                rows["conv_id"].append(c)
                rows["turn_idx"].append(ti)
                rows["mention_id"].append(stable_mention_id(c, ti, s))
                rows["surface"].append(surface)
                rows["type"].append(typ)
                rows["start"].append(s)
                rows["end"].append(e)
        return _mentions_table(rows)


TAGGERS = {"rule": RuleTagger, "bilstm": NeuralTagger, "bert": BertTagger}


def tag_transcripts(
    ds: Dataset,
    tagger: str = "rule",
    output: str = "mentions",
    batch_size: int = 4096,
    concurrency: int | tuple[int, int] | None = None,
    num_cpus: float = 1,
    num_gpus: float | None = None,
    **tagger_kwargs,
) -> Dataset:
    """Run mention detection as an actor-pool ``map_batches`` stage.

    ``num_gpus`` maps the pool onto GPU workers (the north star's deployment
    shape for the BERT encoder — e.g. ``num_gpus=0.25`` packs 4 tagger actors
    per device); None (default) requests CPU-only actors.  The frozen numpy
    encoders themselves are device-agnostic — a real torch checkpoint would
    pick up ``ray.get_gpu_ids()`` in its ``__init__``."""
    cls = TAGGERS[tagger]
    kwargs = dict(
        fn_constructor_kwargs={"output": output, **tagger_kwargs},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency if concurrency is not None else heavy_pool_size(),
        num_cpus=num_cpus,
    )
    if num_gpus is not None:
        kwargs["num_gpus"] = num_gpus
    return ds.map_batches(cls, **kwargs)
