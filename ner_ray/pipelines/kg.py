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

import numpy as np
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
from ner_ray.stages.tagger import stable_mention_id, tag_transcripts
from ner_ray.stages.triples import extract_triples


# Stamped into every checkpoint signature. BUMP whenever tagging, linking,
# extraction, canonicalization, rewrite or dedup SEMANTICS change: signatures
# hash only inputs + config, so a stale /tmp checkpoint from an older engine
# would otherwise be served as current (and diverge from the SQL twins,
# which always recompute).
ENGINE_SIG = "ner_ray-0.2"


@dataclass
class KGConfig:
    tagger: str = "rule"  # "rule" (reference stand-in) | "bilstm" (neural path)
    window: int = 3  # co-mention window in turns
    chunk_turns: int = 256  # salt-chunk size for mega-conversation fanout
    link_tau: float = 0.6  # cosine threshold for entity linking
    tagger_batch_size: int = 4096
    tagger_concurrency: tuple | None = None  # None -> fixed heavy_pool_size() pool
    # GPUs per tagger actor (north-star deployment: BERT encoding on GPU
    # actor pools; e.g. 0.25 packs 4 actors/device).  None = CPU-only.
    tagger_num_gpus: float | None = None
    # Trained-checkpoint directory for the neural taggers
    # (state/checkpoint.py layout).  A plain string, so it participates in
    # sig() — swapping weights correctly invalidates resumable stage
    # checkpoints — and keeps the actors restartable (ray#53727).
    tagger_weights_path: str | None = None
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
    # pre-dedup canonicalized stream (one row per supporting extraction,
    # with conv_id/turn_idx) — the provenance grain (stages.dedup
    # .triple_provenance consumes it)
    canon_triples: Dataset | None = None
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


# Unified fan-out row set: the tagger pass emits pattern triples (kind 0),
# salted+keyed window rows (kind 1) and linked mentions (kind 2) in ONE
# table, so ONE streaming pass over the corpus feeds all three downstream
# branches and the wide ``text`` column never materializes.
_FANOUT = pa.schema(
    [
        ("kind", pa.int8()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        # kind 0 — pattern triples (schemas.TRIPLES)
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("confidence", pa.float32()),
        # kind 1 — window-shuffle rows (input of make_window_extractor)
        ("mentions", pa.list_(schemas.MENTION_STRUCT)),
        ("gkey", pa.int64()),
        ("bucket", pa.int64()),
        ("owned", pa.bool_()),
        # kind 2 — linked mentions (schemas.LINKED_MENTIONS)
        ("mention_id", pa.int64()),
        ("surface", pa.string()),
        ("type", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("entity_id", pa.int64()),
        ("link_score", pa.float32()),
    ]
)


def _align_fanout(t: pa.Table, kind: int) -> pa.Table:
    n = t.num_rows
    cols = [pa.array(np.full(n, kind, dtype=np.int8), pa.int8())]
    for f in list(_FANOUT)[1:]:
        if f.name in t.column_names:
            col = t[f.name]
            cols.append(col if col.type == f.type else pa.compute.cast(col, f.type))
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.table(dict(zip(_FANOUT.names, cols)), schema=_FANOUT)


def make_fanout(window: int, chunk_turns: int, linker):
    """Per-batch fused fan-out: turn_mentions batch -> _FANOUT rows."""
    from ner_ray.stages.order_restore import salt_chunk_batch
    from ner_ray.stages.triples import add_group_key, extract_pattern_triples

    def fanout(batch: pa.Table) -> pa.Table:
        pat = extract_pattern_triples(batch)
        narrow = batch.drop_columns(["text"])
        parts = [_align_fanout(pat, 0)]
        if window > 1:
            # window <= 1 emits pattern triples only (matching the unfused
            # extract_triples guard): salting would raise for window < 1 and
            # materialize never-consumed kind-1 rows for window == 1
            keyed = add_group_key(salt_chunk_batch(narrow, chunk_turns, window))
            parts.append(_align_fanout(keyed, 1))
        linked = linker(explode_mentions(narrow))
        parts.append(_align_fanout(linked, 2))
        return pa.concat_tables(parts)

    return fanout


def _alias_ipc(table: pa.Table) -> bytes:
    """Serialize the (small) alias table to Arrow IPC bytes so it rides into
    actor constructors BY VALUE.  An ``ObjectRef`` in ``fn_constructor_kwargs``
    makes the actor unrestartable if the ref's owner dies (ray#53727: actor
    'has constructor arguments in the object store and max_restarts > 0 ...
    restart will fail'); alias dictionaries are dwarfed by the corpus, so the
    by-value copy is cheap insurance for multi-node fault tolerance.

    NOTE the core_worker warning itself still prints once per pool in ray
    2.49: Ray Data's ActorPoolMapOperator passes its OWN ``map_transformer``
    (which wraps this class + kwargs) into every ``MapWorker`` constructor,
    and that framework payload is what lands in the object store — a bare
    identity class with no kwargs reproduces the warning verbatim.  With
    USER state by value (this function), an actor restart re-fetches only
    the driver-owned transformer ref; the driver dying loses the job anyway,
    so the residual warning is benign and not silenceable from user code
    short of ``max_restarts=0`` (which would give up fault tolerance)."""
    import pyarrow.ipc as ipc

    sink = pa.BufferOutputStream()
    with ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def _alias_from_ipc(buf: bytes) -> pa.Table:
    import pyarrow.ipc as ipc

    with ipc.open_stream(pa.py_buffer(buf)) as r:
        return r.read_all()


class TaggerFanout:
    """Tagger + fan-out in ONE actor: Ray fuses task maps only INTO a
    following actor operator, not out of one, so a ``map_batches(fanout)``
    after the tagger stage would run as a second full-stream task stage
    (measured: re-serializing every block).  Composing them in the actor's
    ``__call__`` keeps the whole pass zero-intermediate.

    Constructor args are plain values (the alias dict arrives as IPC bytes,
    see ``_alias_ipc``) so Ray can restart a lost actor from the task spec
    alone — no object-store dependency."""

    def __init__(self, tagger, tagger_kwargs, window, chunk_turns, alias_ipc, tau):
        from ner_ray.stages.linker import LinkerActor
        from ner_ray.stages.tagger import TAGGERS

        self.tagger = TAGGERS[tagger](output="turn_mentions", **(tagger_kwargs or {}))
        linker = LinkerActor(alias_table=_alias_from_ipc(alias_ipc), tau=tau)
        self.fanout = make_fanout(window, chunk_turns, linker)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.fanout(self.tagger(batch))


def _select_kind(fan: Dataset, kind: int, schema: pa.Schema) -> Dataset:
    """One cheap zero-copy-read pass over the materialized fan-out blocks."""
    import pyarrow.compute as pc

    names = schema.names

    def pick(batch: pa.Table) -> pa.Table:
        # select BEFORE filter: filter copies every column it sees, and the
        # fan-out union schema is ~3x wider than any one kind's projection
        mask = pc.equal(batch["kind"], kind)
        t = batch.select(names).filter(mask)
        return t if t.schema.equals(schema) else t.cast(schema)

    return fan.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


_WINDOW_ROWS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("mentions", pa.list_(schemas.MENTION_STRUCT)),
        ("gkey", pa.int64()),
        ("bucket", pa.int64()),
        ("owned", pa.bool_()),
    ]
)


def build_kg(
    transcripts: Dataset,
    cfg: KGConfig | None = None,
    alias_table: pa.Table | None = None,
    tagger_kwargs: dict | None = None,
) -> KGResult:
    """Assemble the KG dataflow: ONE fused streaming pass (tag -> pattern
    extract + window salt/key + mention link, all inside the tagger actor
    stage) materializes the compact ``_FANOUT`` row set; the window shuffle,
    canonicalization and dedup then run over that narrow artifact.  Compared
    to materializing ``turn_mentions`` and re-reading it per branch, this
    drops two full passes AND keeps the wide ``text`` column out of the
    object store — the difference between pinning the corpus and pinning only
    its mention-bearing derivative at 100 TB.

    ``tagger_kwargs`` forwards to the tagger constructor (e.g. a broadcast
    ``model_ref`` for the neural paths); kept out of ``KGConfig`` because an
    ObjectRef does not belong in the resumable-checkpoint signature."""
    from ner_ray.stages.triples import make_window_extractor
    from ner_ray.utils import pool_size

    cfg = cfg or KGConfig()
    alias_table = alias_table if alias_table is not None else make_alias_table()
    if cfg.tagger_weights_path is not None:
        tagger_kwargs = {
            **(tagger_kwargs or {}),
            "weights_path": cfg.tagger_weights_path,
        }

    from ner_ray.utils import heavy_pool_size

    pool_kwargs: dict = dict(
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.tagger_batch_size,
        concurrency=(
            cfg.tagger_concurrency
            if cfg.tagger_concurrency is not None
            else heavy_pool_size()
        ),
        num_cpus=1,
    )
    if cfg.tagger_num_gpus is not None:
        pool_kwargs["num_gpus"] = cfg.tagger_num_gpus
    # Coalesce the fan-out to ~one block per CPU INSIDE the materialize plan:
    # the tagger stage emits one block per input block (16/CPU for straggler
    # smoothing of the heavy actor pool), but every tail stage pays per-block
    # task-launch/scheduling cost for EACH pass over the fan.  Measured on the
    # 216k-conv H=128 bench payload (32 CPUs): tail with 512 fan blocks =
    # 23.6 s wall (canonicalize 7.7, window+union 10.3, rewrite+dedup 5.6) vs
    # 7.3 s after a repartition to 32 — and at 8 CPUs the 512-block tail was
    # FASTER (10.9 s) than at 32, i.e. the tail anti-scaled on pure task
    # overhead, which is exactly what the N-vs-4N efficiency ratio punishes.
    # Folding the repartition into the streaming plan overlaps the coalesce
    # with tagger compute (51.7 s vs 55.0 + 2.9 s as a separate barrier).
    fan = (
        transcripts.map_batches(
            TaggerFanout,
            fn_constructor_kwargs={
                "tagger": cfg.tagger,
                "tagger_kwargs": tagger_kwargs,
                "window": cfg.window,
                "chunk_turns": cfg.chunk_turns,
                "alias_ipc": _alias_ipc(alias_table),
                "tau": cfg.link_tau,
            },
            **pool_kwargs,
        )
        .repartition(pool_size()[1])
        .materialize()
    )

    pattern = _select_kind(fan, 0, schemas.TRIPLES)
    if cfg.window > 1:
        # fan blocks are already coalesced to ~one per CPU (above), so the
        # window branch selects straight into the groupby shuffle
        win = _select_kind(fan, 1, _WINDOW_ROWS)
        cross = win.groupby("bucket").map_groups(
            make_window_extractor(cfg.window), batch_format="pyarrow"
        )
        raw_triples = pattern.union(cross)
    else:
        raw_triples = pattern
    linked = _select_kind(fan, 2, schemas.LINKED_MENTIONS)
    mapping, entities = canonicalize(linked, alias_table, max_rounds=cfg.uf_rounds)
    canon_triples = rewrite_triples(raw_triples, mapping, how=cfg.rewrite)
    deduped = dedup_triples(canon_triples)
    return KGResult(
        triples=deduped,
        mentions_linked=linked,
        entities=entities,
        mapping=mapping,
        canon_triples=canon_triples,
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
        "engine": ENGINE_SIG,
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
            num_gpus=cfg.tagger_num_gpus,
            **(
                {"weights_path": cfg.tagger_weights_path}
                if cfg.tagger_weights_path is not None
                else {}
            ),
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


def update_kg(
    out_root: str,
    input_paths: list[str],
    cfg: KGConfig | None = None,
    alias_table: pa.Table | None = None,
    check_boundaries: bool = True,
    prune: bool = False,
) -> dict:
    """Incremental KG build (B10+): each transcript directory is an INCREMENT
    whose expensive stages (tagging, linking, extraction, per-increment
    dedup) run once and checkpoint under ``out_root/inc_*``; re-running with
    an extended ``input_paths`` list pays tagging cost ONLY for the new
    increments, then re-derives the global graph (plus the ``mapping`` and
    ``entities`` artifacts run_kg also writes) from the increments' compact
    artifacts.  Increment signatures hash only the config fields that feed
    tagging/linking/extraction, so graph-layout knobs (partitions, rewrite
    strategy, uf_rounds) never invalidate tagged increments.

    Output is provably identical to a from-scratch ``run_kg`` over the
    concatenated corpus, PROVIDED increments split on conversation
    boundaries (windows never cross increments).  ``check_boundaries=True``
    enforces this with a narrow distinct-conv_id groupby over the increments'
    linked checkpoints (rows = distinct conversations, not mentions) and
    raises on any conversation that appears in two increments.

    Why it is exact: canonicalization consumes the UNION of the increments'
    linked-mention sets — the same mention multiset the full build sees;
    rewrite is a stateless surface map given that mapping; and rewriting
    per-increment DEDUPED triples commutes with aggregation because every
    dedup aggregate is distributive (sum n_support / max confidence / min-5
    provenance — ``dedup.merge_dedup_partials``).

    ``prune=True`` deletes ``inc_*`` checkpoint trees not referenced by the
    current ``input_paths``+config (stale increments from earlier configs
    otherwise accumulate; never enabled implicitly).
    """
    import ray

    from ner_ray.stages.dedup import merge_dedup_partials

    if not input_paths:
        raise ValueError("update_kg: input_paths is empty")
    cfg = cfg or KGConfig()
    alias_table = alias_table if alias_table is not None else make_alias_table()
    alias_ref = ray.put(alias_table)
    metrics: dict = {"increments": {}, "stages": {}}
    t0 = time.perf_counter()

    # only the fields that feed tagging/linking/extraction key an increment
    inc_cfg = {
        "tagger": cfg.tagger,
        "window": cfg.window,
        "chunk_turns": cfg.chunk_turns,
        "link_tau": cfg.link_tau,
    }

    linked_sets, raw_sets, input_sigs, inc_names = [], [], [], []
    for path in input_paths:
        # snapshot each input's file list ONCE; the graph signature below
        # reuses it so a dir mutated mid-run cannot sign the graph manifest
        # with files the increment checkpoints never saw
        files_sig = parquet_files_signature([path])
        inc_sig_src = {
            "input": files_sig,
            "config": inc_cfg,
            "engine": ENGINE_SIG,
        }
        inc = f"inc_{input_signature(inc_sig_src)[:16]}"
        if inc in inc_names:
            raise ValueError(
                f"update_kg: duplicate increment {path!r} (same files + config "
                f"as an earlier --input)"
            )
        inc_names.append(inc)
        input_sigs.append(files_sig)

        # tag once per increment; the checkpoint feeds both the linking and
        # extraction consumers from parquet (no live dual-consumer pool)
        tm, m0 = run_stage(
            os.path.join(inc, "turn_mentions"),
            out_root,
            input_signature({**inc_sig_src, "stage": "turn_mentions"}),
            lambda path=path: tag_transcripts(
                read_transcripts(path),
                tagger=cfg.tagger,
                output="turn_mentions",
                batch_size=cfg.tagger_batch_size,
                concurrency=cfg.tagger_concurrency,
                num_gpus=cfg.tagger_num_gpus,
                **(
                    {"weights_path": cfg.tagger_weights_path}
                    if cfg.tagger_weights_path is not None
                    else {}
                ),
            ),
        )
        linked, m1 = run_stage(
            os.path.join(inc, "linked_mentions"),
            out_root,
            input_signature({**inc_sig_src, "stage": "linked"}),
            lambda tm=tm: link_mentions(
                tm.drop_columns(["text"]).map_batches(
                    explode_mentions, batch_format="pyarrow"
                ),
                alias_ref=alias_ref,
                tau=cfg.link_tau,
            ),
        )
        raw, m2 = run_stage(
            os.path.join(inc, "raw_triples"),
            out_root,
            input_signature({**inc_sig_src, "stage": "raw"}),
            lambda tm=tm: dedup_triples(
                extract_triples(tm, window=cfg.window, chunk_turns=cfg.chunk_turns)
            ),
        )
        metrics["increments"][inc] = {
            "input": path,
            "turn_rows": m0["row_count"],
            "linked_rows": m1["row_count"],
            "raw_rows": m2["row_count"],
            "skipped": m0["skipped"] and m1["skipped"] and m2["skipped"],
        }
        linked_sets.append(linked)
        raw_sets.append(raw)

    # boundary check BEFORE pruning: a rejected input layout (conversations
    # split across shards) must not have already destroyed the previous
    # layout's still-valid increment checkpoints
    if check_boundaries and len(linked_sets) > 1:
        _check_conv_boundaries(linked_sets, input_paths)

    if prune:
        import shutil as _shutil

        for d in os.listdir(out_root):
            if d.startswith("inc_") and d not in inc_names:
                _shutil.rmtree(os.path.join(out_root, d))

    all_linked = linked_sets[0]
    for d in linked_sets[1:]:
        all_linked = all_linked.union(d)
    all_raw = raw_sets[0]
    for d in raw_sets[1:]:
        all_raw = all_raw.union(d)

    base_sig = {
        "inputs": input_sigs,
        "config": cfg.sig(),
        "engine": ENGINE_SIG,
    }
    canon_cache: dict = {}

    def get_canon() -> dict:
        if "mapping" not in canon_cache:
            m, e = canonicalize(all_linked, alias_table, max_rounds=cfg.uf_rounds)
            canon_cache["mapping"], canon_cache["entities"] = m, e
        return canon_cache

    def stage(name: str, build, partition_cols=None):
        sig = input_signature({**base_sig, "stage": name})
        ds, manifest = run_stage(name, out_root, sig, build, partition_cols=partition_cols)
        metrics["stages"][name] = {
            "rows": manifest["row_count"],
            "skipped": manifest["skipped"],
        }
        return ds

    mapping = stage("mapping", lambda: get_canon()["mapping"])
    stage("entities", lambda: get_canon()["entities"])
    stage(
        "graph",
        lambda: add_subject_partition(
            merge_dedup_partials(rewrite_triples(all_raw, mapping, how=cfg.rewrite)),
            cfg.graph_partitions,
        ),
        partition_cols=["part"],
    )
    metrics["total_seconds"] = round(time.perf_counter() - t0, 3)
    metrics["output"] = os.path.join(out_root, "graph", "data")
    return metrics


def _check_conv_boundaries(linked_sets: list[Dataset], input_paths: list[str]) -> None:
    """Raise if any conv_id appears in more than one increment (windows would
    silently be lost at the split).  Narrow by construction: each increment
    contributes its per-block DISTINCT conv_ids tagged with the increment
    index, and the groupby moves one row per (conv, increment)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    def distinct_convs(i: int):
        def fn(batch: pa.Table) -> pa.Table:
            u = pc.unique(batch["conv_id"])
            return pa.table(
                {
                    "conv_id": u,
                    "inc": pa.array([i] * len(u), pa.int64()),
                }
            )

        return fn

    tagged = None
    for i, d in enumerate(linked_sets):
        t = d.map_batches(distinct_convs(i), batch_format="pyarrow")
        tagged = t if tagged is None else tagged.union(t)
    spans = (
        tagged.groupby("conv_id")
        .aggregate(Min("inc", alias_name="lo"), Max("inc", alias_name="hi"))
        .map_batches(
            lambda b: b.filter(pc.not_equal(b["lo"], b["hi"])),
            batch_format="pyarrow",
        )
        .limit(5)
        .to_pandas()
    )
    if len(spans):
        pairs = [
            f"{r.conv_id} (in {input_paths[int(r.lo)]} and {input_paths[int(r.hi)]})"
            for r in spans.itertuples()
        ]
        raise ValueError(
            "update_kg: conversations span increment boundaries — windowed "
            "triples would silently be lost at the split. Re-shard increments "
            "on whole conversations. Examples: " + "; ".join(pairs)
        )
