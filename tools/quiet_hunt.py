"""Quiet-phase scaling-pair hunter.

BASELINE.md's scaling protocol observes that this shared VM cycles
between hypervisor phases: a degraded band (machine probe 29–42k
turns/s, where the box's OWN zero-coordination 8→32 ceiling is
0.55–0.83) and a quiet band (probe ≥55k, ceiling ~1.0) in which the
raw pair efficiency is the meaningful N-vs-4N datum.  Quiet windows are
rare and short, so catching one by hand means babysitting a probe loop.

This tool automates the documented recipe: probe the machine ceiling
(``bench.py --mp-probe``) every ``--interval`` seconds and, whenever the
probe reads at least ``--threshold`` turns/s, immediately launch one full
probed scaling session (``bench.py --scaling`` with ``SCALE_REPS=1`` —
each pair re-probes both legs itself, so a phase shift mid-pair is still
visible in the recorded ceiling).  Results append as JSON lines to
``--out`` for later transcription into BASELINE.md.  It never runs a
pair while another bench/scaling process is alive (the measurement would
be contention, not the engine).

Run it nohup'd for hours; stop with SIGTERM.  Probes are ~10 s of CPU
every interval — cheap enough to leave running behind other work, and
the pair itself only launches when the box is otherwise idle.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def other_bench_running() -> bool:
    """True if any bench.py / pytest process besides ourselves is alive
    (their CPU use would contaminate both the probe and the pair)."""
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    me = str(os.getpid())
    for line in out.splitlines():
        pid = line.strip().split(None, 1)[0]
        if pid == me:
            continue
        if ("bench.py" in line or "pytest" in line) and "ps -eo" not in line:
            return True
    return False


def probe(n: int) -> float:
    proc = subprocess.run(
        [sys.executable, BENCH, "--mp-probe", str(n)],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    if proc.returncode != 0:
        return 0.0
    try:
        return json.loads(proc.stdout.strip().splitlines()[-1])["turns_per_sec"]
    except Exception:
        return 0.0


def run_pair() -> dict | None:
    env = dict(os.environ, SCALE_REPS="1")
    proc = subprocess.run(
        [sys.executable, BENCH, "--scaling"],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
    )
    if proc.returncode != 0:
        return {"error": proc.stderr[-500:]}
    try:
        return json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception:
        return {"error": "unparseable", "tail": proc.stdout[-500:]}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--threshold", type=float, default=50000.0,
                    help="probe turns/s that counts as a quiet phase")
    ap.add_argument("--interval", type=float, default=300.0,
                    help="seconds between probes")
    ap.add_argument("--max-pairs", type=int, default=3,
                    help="stop after this many quiet-phase pairs")
    ap.add_argument("--max-hours", type=float, default=6.0)
    ap.add_argument("--out", default="/tmp/quiet_hunt.jsonl")
    args = ap.parse_args()

    deadline = time.time() + args.max_hours * 3600
    pairs_done = 0
    while time.time() < deadline and pairs_done < args.max_pairs:
        if other_bench_running():
            time.sleep(args.interval)
            continue
        tps = probe(32)
        rec = {"ts": time.time(), "probe_turns_per_sec": tps}
        if tps >= args.threshold:
            rec["quiet"] = True
            result = run_pair()
            rec["pair"] = result
            if result and "pairs" in (result or {}):
                pairs_done += 1
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        sys.stdout.write(json.dumps(rec) + "\n")
        sys.stdout.flush()
        if tps < args.threshold:
            time.sleep(args.interval)
    print(f"done: {pairs_done} quiet-phase pairs recorded")


if __name__ == "__main__":
    main()
