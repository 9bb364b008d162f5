"""Benchmark harness (driver-run per round; see BASELINE.md protocol).

Default mode: one fresh Ray session at ``RAY_GRAFT_CPUS`` (default 32) runs
the headline pipelines — the flagship KG build over a cached deterministic
synthetic transcript corpus (BENCH_N_CONVS conversations, seed 42), plus a
representative slice of the relational/dedup/ANN operators over
``GRAFT_SF_DIR`` (default /root/testdata/sf0.1) — and prints ONE JSON line.

``--scaling`` mode: reruns this script in two fresh processes at
SCALE_LOW / SCALE_HIGH CPUs (default 8 / 32) on the SAME inputs and reports
both KG throughputs + the scaling efficiency (the sandbox substitute for the
N-node vs 4N-node cluster criterion — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# 216k convs ≈ 1.57M turns: sized so the 8-CPU scaling leg runs >60s and the
# serial floor (driver combine steps, stage launches ~6-8s) stays under ~10%
# of the low-leg wall time, per the BASELINE.md protocol.
N_CONVS = int(os.environ.get("BENCH_N_CONVS", "216000"))
BENCH_TX = f"/tmp/ner_ray_cache/bench_tx_n{N_CONVS}"


def _ensure_bench_transcripts() -> str:
    marker = os.path.join(BENCH_TX, "_SUCCESS")
    if not os.path.exists(marker):
        from ner_ray.fixtures.transcripts import TranscriptConfig, write_transcripts

        write_transcripts(BENCH_TX, TranscriptConfig(n_convs=N_CONVS, seed=42), shards=32)
        with open(marker, "w") as f:
            f.write("ok")
    return BENCH_TX


def run_bench() -> dict:
    import logging

    import ray

    ray.init(
        address="local",
        num_cpus=N_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    import pyarrow.parquet as pq

    from ner_ray.pipelines.kg import KGConfig, build_kg, read_transcripts
    from ner_ray.pipelines.queries import RAY_QUERIES

    tx_path = _ensure_bench_transcripts()
    n_turns = pq.ParquetDataset(tx_path).files and sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in pq.ParquetDataset(tx_path).files
    )
    # warm the page cache so scaling runs measure compute, not first-read I/O
    read_transcripts(tx_path).count()

    queries: dict[str, float] = {}
    extras: dict = {}

    t0 = time.perf_counter()
    res = build_kg(read_transcripts(tx_path), KGConfig())
    support = res.triples.map_batches(
        lambda t: {"s": [__import__("pyarrow").compute.sum(t["n_support"]).as_py() or 0]}, batch_format="pyarrow"
    ).sum("s")
    kg_secs = time.perf_counter() - t0
    queries["kg_build"] = round(kg_secs, 3)
    extras["kg_turns"] = int(n_turns)
    extras["kg_raw_triples"] = int(support)
    extras["kg_triples_per_sec"] = round(support / kg_secs, 1)
    extras["kg_turns_per_sec"] = round(n_turns / kg_secs, 1)

    for name in [
        "q01_pricing_summary",
        "q03_revenue_by_nation",
        "q07_events_tumbling",
        "q08_sessionize",
        "q13_dedup_exact",
        "q15_token_stats",
        "q18_ann_topk",
        "q22_minhash_near_dup",
        # round-3 additions: sketch, decontamination, retrieval, quality
        "q49_approx_distinct_users",
        "q55_decontaminate",
        "q56_bm25_topk",
        "q57_repetition_filter",
        # late-round-3 additions: windows, pivot, skew-safe join, classifier
        "q60_window_funcs",
        "q61_pivot",
        "q63_quality_classifier",
        "q64_salted_join",
        "q65_dup_ngram_spans",
        # final round-3 additions: text hygiene + domain rollup
        "q69_normalize_text",
        "q70_domain_rollup",
        # round-4 additions: LM perplexity, quota sampling, conv stats,
        # weighted sampling, watermark late-data
        "q71_lm_perplexity",
        "q72_domain_quota_sample",
        "q73_conv_stats",
        "q74_weighted_sample",
        "q75_late_events",
        "q76_dsir_select",
        "q77_mg_top_terms",
        "q78_url_dedup",
        "q79_length_histogram",
        "q80_sft_pairs",
        "q81_conv_dedup",
        # round-5 additions: composed curation mega-pipeline + trained tagger
        "q87_curation_e2e",
        "kg_trained_tagger_eval",
        # round-5: KG analytics over the SHARED flagship-triples cache (the
        # first of these pays the one flagship build; the rest reuse it) +
        # the composed quota->weighted-sample plan
        "q82_kg_negative_samples",
        "q83_kg_triangles",
        "q84_kg_link_features",
        "q85_kg_neighbor_agg",
        "q88_quota_weighted_sample",
        "q89_sliding_chunks",
        # round-5: histogram-quantile sketch, corpus JS divergence, split,
        # tool transitions, grouped percentiles, PQ encode + ADC search
        "q90_histogram_quantiles",
        "q91_js_divergence",
        "q92_train_test_split",
        "q93_tool_transitions",
        "q95_grouped_length_quantiles",
        "q96_pq_encode",
        "q97_pq_adc_topk",
        # final-session round-5 additions: transcript hygiene QA,
        # boilerplate-turn detection, temperature mixture sampling
        "q99_conv_qa",
        "q100_boilerplate_turns",
        "q101_mixture_sample",
        "q102_sft_clean",
        "q103_token_budget_cut",
        "q104_corpus_report",
        "q105_corpus_diff",
        "q106_tool_latency",
        "q107_preference_pairs",
        "q108_rare_entity_suppression",
        "q109_conv_group_split",
        "q110_epoch_shuffle_orders",
        "q111_skew_report",
        "q112_contrastive_pairs",
    ]:
        t0 = time.perf_counter()
        out = RAY_QUERIES[name](SF_DIR)
        if isinstance(out, ray.data.Dataset):
            out.to_pandas()  # consume: a Dataset is lazy until read
        queries[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "e2e_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": N_CPUS,
        **extras,
    }
    ray.shutdown()
    # Machine-phase stamp: this shared VM drifts between multi-minute phases
    # where even the pure-multiprocessing ceiling of the tagging payload
    # swings ~0.74-0.89 in 8->32 scaling and ±20% in absolute rate.  A short
    # no-Ray probe (run_mp_probe) right after the bench records the phase so
    # cross-round BENCH comparisons can separate engine regressions from box
    # phases (see BASELINE.md "Variance").
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mp-probe", str(N_CPUS)],
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=120,
        )
        result["machine_probe_turns_per_sec"] = json.loads(
            proc.stdout.strip().splitlines()[-1]
        )["turns_per_sec"]
    except Exception:
        pass  # the probe is context, never a bench failure
    return result


def run_kg_only(tagger: str, n_convs: int) -> dict:
    """One fresh-session KG build (the scaling-leg payload): the flagship
    neural (BERT-path) pipeline by default — compute-dense like the north
    star's 'batched BERT encoding' stage, so the measurement reflects the
    engine's partitioning rather than single-box memory-bandwidth limits."""
    import logging

    import ray

    ray.init(
        address="local",
        num_cpus=N_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    from ner_ray.fixtures.transcripts import TranscriptConfig, write_transcripts
    from ner_ray.pipelines.kg import KGConfig, build_kg, read_transcripts

    path = f"/tmp/ner_ray_cache/bench_tx_n{n_convs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_transcripts(path, TranscriptConfig(n_convs=n_convs, seed=42), shards=32)
        open(os.path.join(path, "_SUCCESS"), "w").write("ok")
    n_turns = read_transcripts(path).count()  # also warms the page cache

    # Scaling legs run the BERT path with a MID-SIZE frozen encoder
    # (SCALE_BERT_DIMS="hidden,layers,heads", default 128,2,4): the default
    # micro substitute (H=32) has so little compute per byte that on ONE
    # shared-DRAM box its skinny GEMMs are memory-bandwidth-bound — measured
    # multiprocessing ceiling 0.775 at H=32 vs 0.886 at H=128 — which a real
    # N-node vs 4N-node cluster (private DRAM per node) does not suffer.  The
    # mid-size dims match the arithmetic intensity of the north star's
    # BERT-base stage; correctness fixtures keep the tiny default.
    tagger_kwargs = {}
    dims = os.environ.get("SCALE_BERT_DIMS", "128,2,4")
    if tagger == "bert" and dims:
        h, nl, nh = (int(x) for x in dims.split(","))
        # model_spec (rebuilt deterministically per actor) rather than a
        # ray.put ref: keeps the flagship actors restartable (ray#53727)
        tagger_kwargs["model_spec"] = {"hidden": h, "n_layers": nl, "n_heads": nh}
    # Warm the Ray worker pool: a small actor-pool pass pre-spawns worker
    # processes with ner_ray imported, so the measured window reflects
    # steady-state pipeline throughput (a standing cluster's workers exist
    # before the job), not one-time process fork + import cost — which would
    # otherwise penalize the wide leg of the scaling ratio ~proportionally
    # to its worker count.
    from ner_ray.stages.tagger import tag_transcripts

    tag_transcripts(
        read_transcripts(path).limit(5000),
        tagger=tagger,
        output="turn_mentions",
        **tagger_kwargs,
    ).materialize()
    # Tagger batch size is overridable for granularity experiments; default
    # stays the library's 4096.  (Probed during round 2: the PLAIN tagger
    # stage prefers small batches on a wide cluster — 51.6s at bs=512 vs
    # 60.0s at bs=4096, 32 CPUs, pool ramp/tail waves — and big batches on a
    # narrow one — 158s at bs=4096 vs 221s at bs=1024, 8 pinned cores — but
    # the FUSED fan-out e2e showed no robust gain (72.2s vs 74.0s at
    # 4096/1024, same box window), so the default is left alone.)
    batch_size = int(os.environ.get("SCALE_BATCH", "4096"))
    t0 = time.perf_counter()
    res = build_kg(
        read_transcripts(path),
        KGConfig(tagger=tagger, tagger_batch_size=batch_size),
        tagger_kwargs=tagger_kwargs,
    )
    support = res.triples.map_batches(
        lambda t: {"s": [__import__("pyarrow").compute.sum(t["n_support"]).as_py() or 0]}, batch_format="pyarrow"
    ).sum("s")
    secs = time.perf_counter() - t0
    out = {
        "kg_seconds": round(secs, 3),
        "kg_turns": int(n_turns),
        "kg_raw_triples": int(support),
        "kg_triples_per_sec": round(support / secs, 1),
        "num_cpus": N_CPUS,
        "tagger": tagger,
    }
    ray.shutdown()
    return out


def _mp_probe_worker(args):
    """One fully independent tagging process for the machine-ceiling probe:
    no Ray, no shared state — just the scaling payload's BertTagger over a
    fixed shard slice.  Worker i reads shard i % 8 so the 8-proc and 32-proc
    probes tag the IDENTICAL content mix (4 copies per shard at 32)."""
    idx, hidden, n_layers, n_heads, n_batches, path = args
    import glob

    import pyarrow.parquet as pq

    from ner_ray.stages.tagger import BertTagger

    fs = sorted(glob.glob(os.path.join(path, "*.parquet")))
    t = pq.read_table(fs[idx % min(8, len(fs))], columns=["conv_id", "turn_idx", "text"])
    batch = t.slice(0, 4096)
    tg = BertTagger(
        output="turn_mentions",
        model_spec={"hidden": hidden, "n_layers": n_layers, "n_heads": n_heads},
    )
    tg(batch.slice(0, 512))  # warm: JIT-ish numpy alloc paths, page-in weights
    t0 = time.perf_counter()
    for _ in range(n_batches):
        tg(batch)
    # batch.num_rows, NOT 4096: a shard smaller than the slice must not
    # inflate the measured rate
    return batch.num_rows * n_batches / (time.perf_counter() - t0)


def run_mp_probe(nproc: int) -> dict:
    """Machine-ceiling probe: aggregate turns/s of ``nproc`` INDEPENDENT
    tagger processes (multiprocessing, no Ray, no shuffles, no coordination).
    The (probe@hi / probe@lo) / (hi/lo) ratio is the best 8->32 scaling this
    box can physically deliver for the scaling payload's compute *in the
    current machine phase* — the single-shared-DRAM VM drifts between phases
    where even this embarrassingly-parallel ceiling swings 0.78-0.89
    (measured), which a real N vs 4N-node cluster (private DRAM per node)
    does not suffer.  run_scaling interleaves this probe with each leg so
    every pair carries its own same-phase ceiling."""
    import multiprocessing as mp

    # a fresh /tmp (rebooted box) has no fixture yet — build it here too, so
    # a standalone `bench.py --mp-probe N` works before any bench/scaling run
    if not os.path.exists(os.path.join(BENCH_TX, "_SUCCESS")):
        _ensure_bench_transcripts()  # Ray Data generation auto-inits Ray...
        import ray

        ray.shutdown()  # ...shut it down: the probe must measure a no-Ray box
    dims = os.environ.get("SCALE_BERT_DIMS", "128,2,4")
    h, nl, nh = (int(x) for x in dims.split(","))
    n_batches = int(os.environ.get("SCALE_PROBE_BATCHES", "3"))
    with mp.Pool(nproc) as p:
        rates = p.map(
            _mp_probe_worker,
            [(i, h, nl, nh, n_batches, BENCH_TX) for i in range(nproc)],
        )
    return {"turns_per_sec": round(sum(rates), 1), "nproc": nproc}


def run_scaling() -> dict:
    lo = int(os.environ.get("SCALE_LOW", "8"))
    hi = int(os.environ.get("SCALE_HIGH", "32"))
    tagger = os.environ.get("SCALE_TAGGER", "bert")
    # 216k convs ≈ 1.58M turns: low leg ≥100s so fixed stage-launch cost is
    # <10% of the ratio's numerator (BASELINE.md protocol)
    n_convs = int(os.environ.get("SCALE_N_CONVS", "216000"))
    reps = int(os.environ.get("SCALE_REPS", "2"))

    settle = int(os.environ.get("SCALE_SETTLE", "45"))
    probe_on = os.environ.get("SCALE_PROBE", "1") != "0"
    if probe_on and not os.path.exists(os.path.join(BENCH_TX, "_SUCCESS")):
        # the first ceiling probe runs before any leg has built the fixture
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--ensure-tx"],
            check=True,
            capture_output=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )

    def probe(n: int) -> float:
        cmd = [sys.executable, os.path.abspath(__file__), "--mp-probe", str(n)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["/usr/bin/taskset", "-c", f"0-{n - 1}"] + cmd
        proc = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])["turns_per_sec"]

    def leg(n: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
        cmd = [sys.executable, os.path.abspath(__file__), "--kg-only", tagger, str(n_convs)]
        # Pin each leg to exactly n physical cores: ray.init(num_cpus=n)
        # limits scheduling slots but NOT cpu affinity, so an unpinned
        # "8-CPU" leg would silently spread its workers over every core of
        # the box and understate real N-node vs 4N-node scaling.
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["/usr/bin/taskset", "-c", f"0-{n - 1}"] + cmd
        proc = subprocess.run(
            cmd,
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # PAIRED reps: this shared VM drifts ±20% on ~10-minute scales
    # (thermal/neighbour effects), so "best low over k" and "best high over
    # k" can come from different machine conditions and bias the ratio
    # either way.  Running each rep as a back-to-back (low, high) PAIR keeps
    # the two legs of one comparison under matched conditions, with a settle
    # sleep before each leg (a leg started in the previous leg's trail
    # measures the trail, not the engine), and — unless SCALE_PROBE=0 — a
    # short machine-ceiling probe (run_mp_probe) pinned to the same cores
    # right before each leg.  The probe pair gives the box's OWN 8->32
    # scaling for the payload's compute in that phase (no Ray, no engine);
    # efficiency_normalized = raw pair efficiency / probe-pair ceiling is the
    # engine's scaling net of the single-shared-DRAM artifact that a real
    # N vs 4N-node cluster does not have.  Every pair is recorded.
    pairs = []
    for _ in range(reps):
        time.sleep(settle)
        p_lo = probe(lo) if probe_on else None
        r_lo = leg(lo)
        time.sleep(settle)
        p_hi = probe(hi) if probe_on else None
        r_hi = leg(hi)
        t_lo, t_hi = r_lo["kg_seconds"], r_hi["kg_seconds"]
        eff = round((t_lo / t_hi) / (hi / lo), 3)
        rec = {
            "kg_seconds_low": t_lo,
            "kg_seconds_high": t_hi,
            "efficiency": eff,
            "kg_triples_per_sec_low": r_lo["kg_triples_per_sec"],
            "kg_triples_per_sec_high": r_hi["kg_triples_per_sec"],
            "kg_turns": r_hi.get("kg_turns"),
        }
        if probe_on:
            ceiling = round((p_hi / p_lo) / (hi / lo), 3)
            rec["probe_turns_per_sec_low"] = p_lo
            rec["probe_turns_per_sec_high"] = p_hi
            rec["ceiling_efficiency"] = ceiling
            rec["efficiency_normalized"] = round(eff / ceiling, 3)
        pairs.append(rec)
    # headline "value" is the MEDIAN pair: the best pair is upward selection
    # bias under the documented ±20% box drift (it survives as value_best)
    ranked = sorted(pairs, key=lambda p: p["efficiency"])
    median = ranked[len(ranked) // 2] if len(ranked) % 2 else ranked[len(ranked) // 2 - 1]
    best = ranked[-1]
    out = {
        "metric": "scaling_efficiency",
        "value": median["efficiency"],
        "value_best": best["efficiency"],
        "unit": "ratio",
        "cpus_low": lo,
        "cpus_high": hi,
        "tagger": tagger,
        "kg_seconds_low": median["kg_seconds_low"],
        "kg_seconds_high": median["kg_seconds_high"],
        "kg_triples_per_sec_low": median["kg_triples_per_sec_low"],
        "kg_triples_per_sec_high": median["kg_triples_per_sec_high"],
        "kg_turns": median["kg_turns"],
        "pairs": [p["efficiency"] for p in pairs],
    }
    if probe_on:
        normed = sorted(p["efficiency_normalized"] for p in pairs)
        out["value_normalized"] = (
            normed[len(normed) // 2]
            if len(normed) % 2
            else round((normed[len(normed) // 2 - 1] + normed[len(normed) // 2]) / 2, 3)
        )
        out["ceiling_pairs"] = [p["ceiling_efficiency"] for p in pairs]
        out["normalized_pairs"] = [p["efficiency_normalized"] for p in pairs]
        out["pairs_detail"] = pairs
    return out


def run_ensure_tx() -> dict:
    """Materialize the bench transcript fixture (own short Ray session), so
    run_scaling's first ceiling probe has shards to read before any leg."""
    import ray

    ray.init(
        address="local",
        num_cpus=max(4, min(N_CPUS, 8)),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    path = _ensure_bench_transcripts()
    ray.shutdown()
    return {"path": path}


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--kg-only" in sys.argv:
        i = sys.argv.index("--kg-only")
        print(json.dumps(run_kg_only(sys.argv[i + 1], int(sys.argv[i + 2]))))
    elif "--mp-probe" in sys.argv:
        i = sys.argv.index("--mp-probe")
        print(json.dumps(run_mp_probe(int(sys.argv[i + 1]))))
    elif "--ensure-tx" in sys.argv:
        print(json.dumps(run_ensure_tx()))
    else:
        print(json.dumps(run_bench()))
