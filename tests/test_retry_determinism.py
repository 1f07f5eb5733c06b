"""Determinism under task retries (VERDICT r05 #5): every probed query
must produce bit-identical output when every scan-stage task FAILS its
first attempt and recomputes (local[8,2] master, fail-once mapInPandas
identity injected ahead of each table read — see tools/retry_determinism).
The stderr assertion proves the injection actually fired; without it a
wiring bug would make the equality vacuous. Runs as a subprocess because
maxFailures is fixed at SparkContext construction."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_retried_tasks_reproduce_results(sf_dir):
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "retry_determinism.py"),
            sf_dir,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"harness failed:\n{proc.stderr[-3000:]}"
    assert "injected fail-once" in proc.stderr, (
        "no injected task failure reached the logs — the retry probe "
        "did not actually exercise recomputation"
    )
    got = json.loads(proc.stdout.strip().splitlines()[-1])
    assert len(got) >= 5
    # VERDICT r06 #7: at least one probe must inject BELOW an exchange
    # (post-shuffle recompute on a banded dedup query), not only in scans
    assert any(name.startswith("shuffle_stage:") for name in got), (
        "no shuffle-stage retry probe ran"
    )
    for name, hashes in got.items():
        assert hashes["wrapped"] == hashes["retried"], (
            f"{name}: retry changed the result (order-dependent operator?)"
        )
        assert hashes["clean"] == hashes["wrapped"], (
            f"{name}: identity wrapper altered values"
        )
