"""Multi-JVM execution smoke (VERDICT r04 #7): the same queries must
produce the same results under local-cluster[2,4,...] — separate executor
JVMs with real closure serialization and broadcast transport — as under
the in-process local[*] master every other test uses. Runs as a
subprocess because one python process can hold only one SparkContext."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_local_cluster_matches_local(spark, sf_dir):
    from aim357_2019_etl_and_ml_workshop_spark import queries as q

    reg = q.queries()
    want = {
        "flagship_rows": reg["flagship_daily_type_counts"](spark, sf_dir).count(),
        "component_rows": reg["neardup_clusters_banded"](spark, sf_dir).count(),
        "recall_rows": reg["minhash_recall_check"](spark, sf_dir).count(),
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "local_cluster_smoke.py"), sf_dir],
        capture_output=True,
        text=True,
        timeout=360,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"smoke failed:\n{proc.stderr[-3000:]}"
    got = json.loads(proc.stdout.strip().splitlines()[-1])
    assert got == want
