"""A/B harness for the ivf_ann_topk sf0.1 bench drift (VERDICT r05 #1).

Runs ivf_ann_topk (and optionally its neighbours) N times in THIS process's
environment and prints per-run wall times. Launch it twice with different
BLAS env to isolate the session-wide worker-BLAS=1 pin:

    OPENBLAS_NUM_THREADS=1  python tools/ab_ivf.py          # pinned (current)
    OPENBLAS_NUM_THREADS=32 OMP_NUM_THREADS=32 MKL_NUM_THREADS=32 \
        python tools/ab_ivf.py                               # unpinned

session.py uses os.environ.setdefault, so a pre-set value wins — this is the
same mechanism an operator would use to override the pin.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aim357_2019_etl_and_ml_workshop_spark.session import get_spark
from aim357_2019_etl_and_ml_workshop_spark import queries as Q


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = (sys.argv[1] if len(sys.argv) > 1 else "ivf_ann_topk").split(",")
    runs = int(os.environ.get("AB_RUNS", "4"))
    spark = get_spark("ab-ivf")
    out = {"env": {k: os.environ.get(k) for k in
                   ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS")},
           "sf_dir": sf_dir, "times": {}}
    for name in names:
        fn = Q._REGISTRY[name]
        ts = []
        for i in range(runs):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            n = df.count()
            ts.append(round(time.monotonic() - t0, 3))
        out["times"][name] = {"runs": ts, "min": min(ts[1:]) if len(ts) > 1 else ts[0],
                              "rows": n}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
