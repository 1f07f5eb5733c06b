"""Multi-JVM execution smoke (VERDICT r04 #7, extended r06 #2): the same
queries must produce the same results under local-cluster[2,4,...] —
separate executor JVMs with real closure serialization and broadcast
transport — as under the in-process local[*] master every other test uses.
Covers the flagship, the banded dedup components, the driver-gather ANN
paths (SparkContext numpy broadcast read inside Arrow workers, VALUE-level
via row hash), and an applyInPandasWithState stateful stream. Runs as a
subprocess because one python process can hold only one SparkContext."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_local_cluster_matches_local(spark, sf_dir):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from local_cluster_smoke import collect_results

    want = collect_results(spark, sf_dir)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "local_cluster_smoke.py"),
            sf_dir,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"smoke failed:\n{proc.stderr[-3000:]}"
    got = json.loads(proc.stdout.strip().splitlines()[-1])
    assert got == want
