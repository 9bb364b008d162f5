"""Resumable curation runs — the B8/B10 checkpoint + lineage contract
applied to the corpus-curation side of the engine.

The KG build has had checkpointed stages and signature-keyed resume since
round 2 (`pipelines/kg.run_kg`); this module gives the CURATION pipelines
the same operational story: a curation output materializes as a
partitioned parquet stage with a lineage manifest, a re-run with the same
input signature is a no-op read, and any input-file or parameter change
invalidates exactly the affected stage (`stages/materialize.run_stage` —
the identical machinery, not a parallel implementation).
"""

from __future__ import annotations

import os

from ray.data import Dataset

from ner_ray.stages import materialize as M


def run_sft_curation(sf_dir: str, out_root: str) -> tuple[Dataset, dict]:
    """Checkpointed run of the composed SFT-curation chain (q102):
    transcripts -> boilerplate removal -> QA gate -> prompt/response
    pairs, persisted as a parquet stage under ``out_root/sft_pairs`` with
    a lineage manifest.  The signature covers the input parquet
    fragments (path + size) and every semantic parameter, so a re-run
    over unchanged input resumes (``manifest["skipped"] is True``)
    without executing the pipeline, while new/changed transcript shards
    or a threshold change rebuild."""
    from ner_ray.pipelines.queries import (
        _BOILER_MIN_CONVS,
        _SFT_BOILER_MIN_CONVS,
        q102_sft_clean,
        transcripts_path_for,
    )

    tx = transcripts_path_for(sf_dir)
    sig = M.input_signature(
        {
            "op": "q102_sft_clean",
            "files": M.parquet_files_signature([tx]),
            "sft_boiler_min_convs": _SFT_BOILER_MIN_CONVS,
            "boiler_min_convs": _BOILER_MIN_CONVS,
        }
    )
    os.makedirs(out_root, exist_ok=True)
    return M.run_stage("sft_pairs", out_root, sig, lambda: q102_sft_clean(sf_dir))
