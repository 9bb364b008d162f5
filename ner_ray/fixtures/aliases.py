"""Alias-dictionary fixture with deterministic embeddings (FIXTURES.md §3).

Embedding model stand-in: no trained context encoder exists in this sandbox,
so embeddings are deterministic unit vectors composed of a **type prototype**
plus a **name-hash perturbation**:

    emb(type, name) = unit(0.75 * proto[type] + 0.45 * unit(h(name)))

A mention embedding (stages.linker) is built with the same recipe from the
mention's (tagger-assigned type, surface), so cosine similarity resolves the
fixture's ambiguous alias ("Lima" the LOC vs "Lima Systems" the ORG) by type
agreement and name agreement — exercising exactly the plumbing a trained
bi-encoder would use (swap ``pseudo_embedding`` for the real encoder).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ner_ray import schemas
from ner_ray.fixtures.gazetteer import ALIASES

DIM = 64


def _unit(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _hash_vec(key: str, dim: int = DIM) -> np.ndarray:
    seed = int.from_bytes(hashlib.blake2b(key.encode(), digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return _unit(rng.standard_normal(dim))


_PROTOS = {t: _hash_vec(f"__type_proto__:{t}") for t in ("PER", "LOC", "ORG")}


def pseudo_embedding(typ: str, name: str, dim: int = DIM) -> np.ndarray:
    proto = _PROTOS.get(typ, _hash_vec(f"__type_proto__:{typ}"))
    return _unit(0.75 * proto + 0.45 * _hash_vec(name, dim)).astype(np.float32)


def make_alias_table() -> pa.Table:
    """Alias dict as an Arrow table (schemas.ALIAS_DICT)."""
    rows = {
        "entity_id": [],
        "canonical": [],
        "alias": [],
        "type": [],
        "embedding": [],
    }
    for eid, canonical, alias, typ in ALIASES:
        rows["entity_id"].append(eid)
        rows["canonical"].append(canonical)
        rows["alias"].append(alias)
        rows["type"].append(typ)
        rows["embedding"].append(pseudo_embedding(typ, canonical).tolist())
    return pa.table(
        {
            "entity_id": pa.array(rows["entity_id"], pa.int64()),
            "canonical": pa.array(rows["canonical"], pa.string()),
            "alias": pa.array(rows["alias"], pa.string()),
            "type": pa.array(rows["type"], pa.string()),
            "embedding": pa.array(rows["embedding"], pa.list_(pa.float32())),
        },
        schema=schemas.ALIAS_DICT,
    )
