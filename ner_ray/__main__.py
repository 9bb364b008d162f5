"""CLI entry point — the ``ray job submit`` launch path of the north rule:

    ray job submit --working-dir . -- python -m ner_ray \
        --input /data/transcripts --out /data/kg --tagger rule

Runs the checkpointed, resumable KG build (``pipelines.kg.run_kg``) and
prints the metrics JSON.  Owns a Ray session only when launched standalone
(``ray job submit`` / terminal); inside an existing session it reuses it.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ner_ray", description="Ray-Data-native KG construction")
    ap.add_argument(
        "--input",
        required=True,
        action="append",
        help="transcripts Parquet dir/file; repeat for an INCREMENTAL build "
        "(each dir is a checkpointed increment — pipelines.kg.update_kg; a "
        "re-run with the same multi-dir list plus new dirs only pays for the "
        "new ones; increments must split on conversation boundaries — "
        "enforced). NOTE: single-input runs use run_kg's stage layout; the "
        "first multi-input run under the same --out re-tags that input once "
        "into increment form.",
    )
    ap.add_argument("--out", required=True, help="output root (stage checkpoints + graph)")
    ap.add_argument("--tagger", default="rule", choices=["rule", "bilstm", "bert"])
    ap.add_argument(
        "--weights-path",
        default=None,
        help="trained-checkpoint dir for the neural taggers "
        "(state/checkpoint.py layout; part of the resume signature)",
    )
    ap.add_argument("--window", type=int, default=3)
    ap.add_argument("--chunk-turns", type=int, default=256)
    ap.add_argument("--link-tau", type=float, default=0.6)
    ap.add_argument("--graph-partitions", type=int, default=16)
    ap.add_argument("--num-cpus", type=int, default=None, help="standalone ray.init size")
    ap.add_argument(
        "--compact",
        type=int,
        default=None,
        metavar="ROWS_PER_FILE",
        help="after the build, compact each checkpointed stage's parquet "
        "into ~ROWS_PER_FILE-row files (materialize.compact_checkpoint: "
        "preserves rows, hive layout, and the resume signature) — the "
        "small-file maintenance pass for long incremental runs",
    )
    args = ap.parse_args(argv)
    if args.weights_path and args.tagger == "rule":
        # fail fast at the CLI: RuleTagger takes no weights_path, and the
        # combination would otherwise surface late as a TypeError inside a
        # Ray actor constructor
        ap.error("--weights-path requires a neural tagger (--tagger bilstm|bert)")

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        init_kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            init_kwargs["num_cpus"] = args.num_cpus
        ray.init(**init_kwargs)

    try:
        from ner_ray.pipelines.kg import KGConfig, run_kg, update_kg

        cfg = KGConfig(
            tagger=args.tagger,
            tagger_weights_path=args.weights_path,
            window=args.window,
            chunk_turns=args.chunk_turns,
            link_tau=args.link_tau,
            graph_partitions=args.graph_partitions,
        )
        if len(args.input) == 1:
            metrics = run_kg(args.input[0], args.out, cfg)
        else:
            metrics = update_kg(args.out, args.input, cfg)
        if args.compact:
            import os

            from ner_ray.stages.materialize import compact_checkpoint, read_manifest

            compacted = {}
            for name in sorted(os.listdir(args.out)):
                stage = os.path.join(args.out, name)
                if os.path.isdir(stage) and read_manifest(stage) is not None:
                    m = compact_checkpoint(stage, target_rows_per_file=args.compact)
                    compacted[name] = {
                        "files_before": m.get("files_before"),
                        "files_after": len(m.get("files", [])),
                    }
            metrics["compacted"] = compacted
        print(json.dumps(metrics))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
