"""Two-node localhost Ray cluster smoke: the one scaling evidence flavor the
single-process protocol can't produce — cross-node object transfer through
the B2/B4/B6 shuffles of the flagship build.

Starts `ray start --head` (16 CPUs) plus one worker node (16 CPUs) on
localhost, runs the FULL flagship KG build against the 2-node cluster, and
compares the canonical triples hash against a fresh single-node session on
the same input — the build must be bit-identical across topologies.

Prints ONE JSON line:
  {"metric": "two_node_smoke", "nodes": 2, "identical": true,
   "n_triples": N, "kg_seconds_2node": s, "kg_seconds_1node": s}

Run standalone (owns its Ray lifecycles; never run inside another session):
  python tools/two_node_smoke.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 63791

_RUN_SNIPPET = r"""
import hashlib, json, os, sys, time
import ray

addr = sys.argv[1]
init_kwargs = dict(include_dashboard=False, logging_level="ERROR")
if addr == "local":
    init_kwargs.update(address="local", num_cpus=32)
else:
    init_kwargs.update(address=addr)
ray.init(**init_kwargs)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

n_nodes = len([n for n in ray.nodes() if n.get("Alive")])
from ner_ray.pipelines.kg import KGConfig, build_kg, read_transcripts
from ner_ray.pipelines.queries import transcripts_path_for

tx_path = transcripts_path_for("/root/testdata/sf0.01")
t0 = time.perf_counter()
res = build_kg(read_transcripts(tx_path), KGConfig())
df = res.triples.to_pandas()
secs = time.perf_counter() - t0
df["conv_ids"] = df["conv_ids"].map(lambda v: ",".join(sorted(v)))
df = df.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
blob = df.to_csv(index=False, float_format="%.6f").encode()

# also cross-topology-check the composed SFT-curation chain (q102): its
# broadcast flag + conv-hash segmented kernel must be partition- and
# node-placement-independent too
from ner_ray.pipelines.queries import q102_sft_clean
pairs = q102_sft_clean("/root/testdata/sf0.01").to_pandas()
pairs = pairs.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
pairs_blob = pairs.to_csv(index=False).encode()

print(json.dumps({
    "nodes": n_nodes,
    "n_triples": int(len(df)),
    "hash": hashlib.sha256(blob).hexdigest(),
    "n_pairs": int(len(pairs)),
    "pairs_hash": hashlib.sha256(pairs_blob).hexdigest(),
    "secs": round(secs, 2),
}))
ray.shutdown()
"""


def _run_leg(addr: str, env: dict) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _RUN_SNIPPET, addr],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=900,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"leg {addr} failed:\n{proc.stdout}\n{proc.stderr}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> dict:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # preset =local would hijack ray.init(address=...)
    subprocess.run(["ray", "stop", "--force"], capture_output=True, env=env)
    try:
        head = subprocess.run(
            [
                "ray", "start", "--head",
                f"--port={PORT}",
                "--num-cpus=16",
                "--include-dashboard=false",
            ],
            capture_output=True,
            text=True,
            env=env,
            timeout=120,
        )
        if head.returncode != 0:
            raise RuntimeError(f"head start failed: {head.stderr}")
        worker = subprocess.run(
            ["ray", "start", f"--address=127.0.0.1:{PORT}", "--num-cpus=16"],
            capture_output=True,
            text=True,
            env=env,
            timeout=120,
        )
        if worker.returncode != 0:
            raise RuntimeError(f"worker start failed: {worker.stderr}")
        time.sleep(3)
        two = _run_leg(f"127.0.0.1:{PORT}", env)
    finally:
        subprocess.run(["ray", "stop", "--force"], capture_output=True, env=env)
    one = _run_leg("local", env)
    out = {
        "metric": "two_node_smoke",
        "nodes": two["nodes"],
        "identical": two["hash"] == one["hash"],
        "n_triples": two["n_triples"],
        "hash_2node": two["hash"][:16],
        "hash_1node": one["hash"][:16],
        "pairs_identical": two["pairs_hash"] == one["pairs_hash"],
        "n_pairs": two["n_pairs"],
        "kg_seconds_2node": two["secs"],
        "kg_seconds_1node": one["secs"],
    }
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
