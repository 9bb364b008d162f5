"""Localhost two-node Ray cluster smoke (VERDICT r4 "What's missing" #5):
cross-node object transfer through the flagship's B2/B4/B6 shuffles, with a
bit-identical-triples gate against a single-node session.

Env-gated: the harness starts/stops its OWN `ray start` cluster, which must
never race the test session's `ray.init(address="local")` — run explicitly:

    NER_RAY_TWO_NODE=1 python -m pytest tests/test_two_node.py -q

The per-round stamp lives in BASELINE.md ("Two-node topology smoke").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("NER_RAY_TWO_NODE") != "1",
    reason="owns its own Ray clusters; run with NER_RAY_TWO_NODE=1 "
    "(stamp recorded in BASELINE.md)",
)
def test_two_node_flagship_bit_identical():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "two_node_smoke.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1800,
    )
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["nodes"] == 2, out
    assert out["identical"] is True, out
    assert out["n_triples"] > 0, out
