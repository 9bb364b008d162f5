"""The flagship pipeline: transcripts Parquet -> knowledge-graph triples.

Full dataflow (SURVEY.md §3.4):

    read_parquet(transcripts, columns=conv_id,turn_idx,text)     [B1]
    -> map_batches(Tagger actor pool)      -> turn mentions      [B3: M1-M10+E1]
    -> pattern triples (stateless map)  ∪                        [B4a]
       salted-chunk window triples (groupby-sort shuffle)        [B2+B4b]
    -> link mentions (broadcast alias dict actor pool)           [B5]
    -> canonicalize (distributed union-find)                     [B6]
    -> rewrite triples to canonical entities (broadcast map)     [B6]
    -> dedup (combiner + keyed shuffle)                          [B7]
    -> partitioned Parquet + lineage manifests (+ checkpoints)   [B8-B10]

``build_kg`` returns lazy Datasets (for tests / composition);
``run_kg`` executes with per-stage checkpoints + metrics (resumable).
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict, dataclass, field

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from ner_ray import schemas
from ner_ray.fixtures.aliases import make_alias_table
from ner_ray.utils import configure_context

configure_context()
from ner_ray.stages.canonicalize import canonicalize, rewrite_triples
from ner_ray.stages.dedup import dedup_triples
from ner_ray.stages.linker import link_mentions
from ner_ray.stages.materialize import (
    add_subject_partition,
    input_signature,
    parquet_files_signature,
    run_stage,
)
from ner_ray.stages.tagger import _mentions_table, stable_mention_id, tag_transcripts
from ner_ray.stages.triples import extract_triples


@dataclass
class KGConfig:
    tagger: str = "rule"  # "rule" (reference stand-in) | "bilstm" (neural path)
    window: int = 3  # co-mention window in turns
    chunk_turns: int = 256  # salt-chunk size for mega-conversation fanout
    link_tau: float = 0.6  # cosine threshold for entity linking
    tagger_batch_size: int = 4096
    tagger_concurrency: tuple | None = None  # None -> pool_size() (cluster-wide)
    graph_partitions: int = 16  # hash(subj) partitions of the final graph
    rewrite: str = "broadcast"  # or "join" for non-broadcastable mappings
    uf_rounds: int = 8

    def sig(self) -> dict:
        return asdict(self)


@dataclass
class KGResult:
    triples: Dataset
    mentions_linked: Dataset | None = None
    entities: Dataset | None = None
    mapping: Dataset | None = None
    metrics: dict = field(default_factory=dict)


def read_transcripts(path: str, num_blocks: int | None = None) -> Dataset:
    """B1 — pruned transcript read (only the columns the KG build touches).

    Block count IS the parallelism ceiling of every downstream map stage
    (``batch_size`` only slices within a task), so the read is split to
    ~16 blocks per CPU.  Finer matters twice: a small corpus would otherwise
    collapse to a handful of blocks and idle the tagger actor pool, and ONE
    task per block means the block holding the mega-conversation becomes the
    stage's end tail — at 4 blocks/CPU that block was 4x the mean and its
    straggler task left half the cluster idle for the last ~10s of the
    flagship tagger stage.  (Shuffle stages coalesce back to ~1 block/CPU
    before their exchange — see extract_triples — so fine map blocks don't
    tax the sort.)
    """
    from ner_ray.utils import pool_size

    if num_blocks is None:
        num_blocks = pool_size()[1] * 16
    return rd.read_parquet(
        path, columns=["conv_id", "turn_idx", "text"], override_num_blocks=num_blocks
    )


def explode_mentions(batch: pa.Table) -> pa.Table:
    """turn_mentions (nested) -> flat mentions table (schemas.MENTIONS).

    Vectorized: the nested struct list flattens with Arrow kernels and the
    parent (conv_id, turn_idx) columns fan out via ``take`` over repeated
    indices; only the blake2b mention ids remain a per-mention Python loop."""
    import numpy as np
    import pyarrow.compute as pc

    ments = batch["mentions"]
    if isinstance(ments, pa.ChunkedArray):
        ments = ments.combine_chunks()
    flat = ments.values
    lens = pc.list_value_length(ments).to_numpy(zero_copy_only=False).astype(np.int64)
    parent = pa.array(np.repeat(np.arange(len(lens)), lens))
    conv = pc.take(batch["conv_id"], parent)
    turn = pc.take(batch["turn_idx"], parent)
    starts = pc.struct_field(flat, "start")
    mids = [
        stable_mention_id(c, ti, s)
        for c, ti, s in zip(conv.to_pylist(), turn.to_pylist(), starts.to_pylist())
    ]
    return pa.table(
        {
            "conv_id": pc.cast(conv, pa.string()),
            "turn_idx": pc.cast(turn, pa.int32()),
            "mention_id": pa.array(mids, pa.int64()),
            "surface": pc.cast(pc.struct_field(flat, "surface"), pa.string()),
            "type": pc.cast(pc.struct_field(flat, "type"), pa.string()),
            "start": pc.cast(starts, pa.int32()),
            "end": pc.cast(pc.struct_field(flat, "end"), pa.int32()),
        },
        schema=schemas.MENTIONS,
    )


def build_kg(
    transcripts: Dataset,
    cfg: KGConfig | None = None,
    alias_table: pa.Table | None = None,
) -> KGResult:
    """Assemble the lazy KG dataflow (no checkpoints; single execution graph)."""
    import ray

    cfg = cfg or KGConfig()
    alias_table = alias_table if alias_table is not None else make_alias_table()
    alias_ref = ray.put(alias_table)

    turn_mentions = tag_transcripts(
        transcripts,
        tagger=cfg.tagger,
        output="turn_mentions",
        batch_size=cfg.tagger_batch_size,
        concurrency=cfg.tagger_concurrency,
    ).materialize()  # consumed by BOTH the triples and the linking branch —
    # pin it once instead of re-running the tagger per branch.  (run_kg gets
    # the same effect from its parquet stage checkpoint.)
    raw_triples = extract_triples(
        turn_mentions, window=cfg.window, chunk_turns=cfg.chunk_turns
    )
    mentions = turn_mentions.drop_columns(["text"]).map_batches(
        explode_mentions, batch_format="pyarrow"
    )
    linked = link_mentions(mentions, alias_ref=alias_ref, tau=cfg.link_tau)
    mapping, entities = canonicalize(linked, alias_table, max_rounds=cfg.uf_rounds)
    canon_triples = rewrite_triples(raw_triples, mapping, how=cfg.rewrite)
    deduped = dedup_triples(canon_triples)
    return KGResult(
        triples=deduped, mentions_linked=linked, entities=entities, mapping=mapping
    )


def run_kg(
    input_path: str,
    out_root: str,
    cfg: KGConfig | None = None,
    alias_table: pa.Table | None = None,
) -> dict:
    """Execute the KG build with checkpointed, resumable stages (B10).

    Stage boundaries (each a Parquet dataset + lineage manifest under
    ``out_root``): ``turn_mentions`` (B3), ``linked_mentions`` (B5),
    ``mapping``+``entities`` (B6), ``graph`` (B4+rewrite+B7, partitioned by
    subject hash — B8).  Returns the metrics dict (B9) assembled from stage
    manifests; re-running with unchanged inputs/config skips finished stages.
    """
    import ray

    cfg = cfg or KGConfig()
    alias_table = alias_table if alias_table is not None else make_alias_table()
    alias_ref = ray.put(alias_table)
    base_sig = {
        "input": parquet_files_signature([input_path]),
        "config": cfg.sig(),
        "engine": "ner_ray-0.1",
    }
    metrics: dict = {"stages": {}}
    t0 = time.perf_counter()

    def stage(name: str, build, partition_cols=None) -> Dataset:
        sig = input_signature({**base_sig, "stage": name})
        ds, manifest = run_stage(name, out_root, sig, build, partition_cols=partition_cols)
        metrics["stages"][name] = {
            "rows": manifest["row_count"],
            "skipped": manifest["skipped"],
            "write_seconds": manifest.get("write_seconds"),
        }
        return ds

    tm = stage(
        "turn_mentions",
        lambda: tag_transcripts(
            read_transcripts(input_path),
            tagger=cfg.tagger,
            output="turn_mentions",
            batch_size=cfg.tagger_batch_size,
            concurrency=cfg.tagger_concurrency,
        ),
    )
    linked = stage(
        "linked_mentions",
        lambda: link_mentions(
            tm.drop_columns(["text"]).map_batches(explode_mentions, batch_format="pyarrow"),
            alias_ref=alias_ref,
            tau=cfg.link_tau,
        ),
    )

    canon_cache: dict = {}

    def get_canon() -> dict:
        if "mapping" not in canon_cache:
            m, e = canonicalize(linked, alias_table, max_rounds=cfg.uf_rounds)
            canon_cache["mapping"], canon_cache["entities"] = m, e
        return canon_cache

    mapping = stage("mapping", lambda: get_canon()["mapping"])
    stage("entities", lambda: get_canon()["entities"])

    stage(
        "graph",
        lambda: add_subject_partition(
            dedup_triples(
                rewrite_triples(
                    extract_triples(tm, window=cfg.window, chunk_turns=cfg.chunk_turns),
                    mapping,
                    how=cfg.rewrite,
                )
            ),
            cfg.graph_partitions,
        ),
        partition_cols=["part"],
    )

    metrics["total_seconds"] = round(time.perf_counter() - t0, 3)
    metrics["output"] = os.path.join(out_root, "graph", "data")
    return metrics
