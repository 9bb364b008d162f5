"""Canonical Arrow schemas for every logical table in the engine.

One ``pyarrow.Schema`` per logical dataset (SURVEY.md §1.2).  The
``transcripts`` shape is mandated verbatim by ``BASELINE.json`` ``input_hint``.
All stages declare their output schema here so tests can assert schema
stability and the driver smoke check sees a fixed shape.
"""

from __future__ import annotations

import pyarrow as pa

# Mandated input shape (BASELINE.json:15 input_hint).
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Tagger-level golden I/O: the Arrow form of the reference's BIO corpus
# (reference data.py read_corpus / BERT_NER.py NerProcessor — SURVEY.md §2
# S1/S2, reconstructed; the char<TAB>tag blank-line-separated file format).
BIO_CORPUS = pa.schema(
    [
        ("sentence_id", pa.int64()),
        ("chars", pa.list_(pa.string())),
        ("tags", pa.list_(pa.string())),
    ]
)

# Per-turn tag output of the tagger stage (before span folding).
TAGS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("chars", pa.list_(pa.string())),
        ("tags", pa.list_(pa.string())),
    ]
)

# Mention spans produced by BIO->span folding (reference utils.get_entity
# semantics — SURVEY.md §2 E1).
MENTIONS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("mention_id", pa.int64()),
        ("surface", pa.string()),
        ("type", pa.string()),  # PER | LOC | ORG
        ("start", pa.int32()),
        ("end", pa.int32()),  # exclusive
    ]
)

# Per-turn mentions in nested form: the compact unit that flows into the
# windowed triple extractor (text retained for same-turn pattern matching,
# dropped before the cross-turn shuffle).
MENTION_STRUCT = pa.struct(
    [
        ("surface", pa.string()),
        ("type", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]
)
TURN_MENTIONS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("text", pa.string()),
        ("mentions", pa.list_(MENTION_STRUCT)),
    ]
)

# Linked mentions (after B5): entity_id == -1 means unlinked.
LINKED_MENTIONS = pa.schema(
    list(MENTIONS)
    + [
        ("entity_id", pa.int64()),
        ("link_score", pa.float32()),
    ]
)

ENTITIES = pa.schema(
    [
        ("entity_id", pa.int64()),
        ("canonical", pa.string()),
        ("type", pa.string()),
        ("aliases", pa.list_(pa.string())),
    ]
)

TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("confidence", pa.float32()),
    ]
)

# Deduplicated graph edge table with provenance (B7/B8).
DEDUP_TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("confidence", pa.float32()),  # max over provenance
        ("n_support", pa.int64()),  # number of supporting extractions
        ("conv_ids", pa.list_(pa.string())),  # provenance sample
    ]
)

ALIAS_DICT = pa.schema(
    [
        ("entity_id", pa.int64()),
        ("canonical", pa.string()),
        ("alias", pa.string()),
        ("type", pa.string()),
        ("embedding", pa.list_(pa.float32())),
    ]
)

# Multimodal media table: image/audio/video payloads as opaque binary columns
# with typed metadata (the 100TB-pipeline pattern: payloads never leave Arrow,
# decode happens inside actor-pool map_batches stages with small batch sizes).
MEDIA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("doc_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),  # image/video frame dims; 0 for audio
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),  # audio; 0 otherwise
        ("n_frames", pa.int32()),  # video; 1 for image, 0 for audio
        ("duration_ms", pa.int32()),  # audio/video; 0 for image
    ]
)

IMAGE_FEATURES = pa.schema(
    [
        ("media_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("mean_lum", pa.float32()),
        ("std_lum", pa.float32()),
        ("phash", pa.int64()),  # 64-bit difference-hash packed to int64
        ("histogram", pa.list_(pa.float32(), 16)),
    ]
)

AUDIO_FEATURES = pa.schema(
    [
        ("media_id", pa.int64()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("rms_mean", pa.float32()),
        ("rms_max", pa.float32()),
        ("zero_cross_rate", pa.float32()),
    ]
)

FRAMES = pa.schema(
    [
        ("media_id", pa.int64()),
        ("frame_idx", pa.int32()),
        ("ts_ms", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("frame", pa.binary()),
    ]
)

# Fixed BIO tag set of the reference family (reference data.py tag2label,
# SURVEY.md §2 — 7-tag PER/LOC/ORG BIO set).
TAG2LABEL = {
    "O": 0,
    "B-PER": 1,
    "I-PER": 2,
    "B-LOC": 3,
    "I-LOC": 4,
    "B-ORG": 5,
    "I-ORG": 6,
}
LABEL2TAG = {v: k for k, v in TAG2LABEL.items()}
NUM_TAGS = len(TAG2LABEL)
ENTITY_TYPES = ("PER", "LOC", "ORG")
