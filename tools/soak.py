"""Spark-only registry soak at big SFs (VERDICT r03 #7): execute EVERY
queries() entry end-to-end (noop sink — full plan execution, no driver
collect bandwidth) at sf1 and sf10, record wall seconds, and flag any
query whose sf10 time exceeds 2x its linear sf1 extrapolation
(sf1_sec x 10) — the quadratic-tail detector the sf1 soak is too small
to expose. Correctness at these SFs is covered separately (full oracle
gate at sf1 in SOAK_r03; sf0.3 full-oracle for the quadratic-oracle
family); this run proves the Spark side completes, and scales, on the
whole registry.

Usage: python tools/soak.py [out.json]
Env: SPARK_GRAFT_SOAK_SF1_DIR / SPARK_GRAFT_SOAK_SF10_DIR override the
.localdata defaults; SPARK_GRAFT_SOAK_SKIP names comma-separated queries
to skip (with reasons recorded).

Long soaks survive process churn via a JSONL checkpoint
(SPARK_GRAFT_SOAK_CKPT, default .localdata/soak_ckpt.jsonl): one line per
completed query per sweep; a rerun loads it and skips what's already
timed, so an external kill mid-sweep costs only the in-flight query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aim357_2019_etl_and_ml_workshop_spark import queries as q
from aim357_2019_etl_and_ml_workshop_spark.session import get_spark

# Documented exclusions: quadratic-BY-DESIGN baselines whose cost is the
# spec, not a plan defect. Each entry names the registered scale-path twins
# that DO run ("twins" — machine-checked by tests/test_soak_exclusions.py:
# every twin must stay registered and docstring-cross-referenced) plus the
# measured reason.
EXCLUDE = {
    "embedding_cosine_topk": {
        "twins": ["lsh_ann_topk", "ivf_ann_topk"],
        "reason": (
            "exact brute-force ANN baseline: one full (N x Q) matmul pass; "
            "~3 min at sf10 and Spark WINS it 3-4x vs DuckDB (PERF.md) — "
            "measured once in BENCH/PERF, not re-paid per soak; scale twins "
            "lsh_ann_topk / ivf_ann_topk run here"
        ),
    },
    "embedding_neardup_blocked": {
        "twins": ["embedding_neardup_lsh"],
        "reason": (
            "exact BLOCKED all-pairs baseline (quadratic per label block by "
            "contract; ~4G pairs at sf10). Runs full-oracle at sf0.3 in "
            "SOAK_r03; the corpus-scale twin embedding_neardup_lsh runs here"
        ),
    },
    "ngram_jaccard_pairs": {
        "twins": ["minhash_near_duplicates", "simhash_near_duplicates"],
        "reason": (
            "exact shingle-join all-pairs baseline: its Spark side IS the "
            "quadratic ground truth (pair explosion OOMed an 8g heap at sf10 "
            "in the first r04 soak attempt). Full-oracle at sf0.3 in "
            "SOAK_r03; banded scale twins minhash_near_duplicates / "
            "simhash_near_duplicates run here"
        ),
    },
    "minhash_recall_check": {
        "twins": ["minhash_near_duplicates"],
        "reason": (
            "recall contract whose denominator IS the excluded "
            "ngram_jaccard_pairs exact join (inlined on the Spark side by "
            "definition of recall) — same quadratic-by-design cost, same "
            "OOM at sf10. Verified full-oracle at sf0.3 in SOAK_r03 and at "
            "every conformance SF; minhash_near_duplicates itself runs here"
        ),
    },
    "neardup_clusters": {
        "twins": ["neardup_clusters_banded"],
        "reason": (
            "component labels over the exact ngram_jaccard_pairs pair set BY "
            "ORACLE CONTRACT (the recursive-CTE oracle recomputes the exact "
            "pairs, so a banded source cannot be substituted) — the shingle "
            "self-join filled ~90 GB of shuffle spill at sf10 in the second "
            "r04 attempt. Full-oracle at sf0.3 in SOAK_r03 and at conformance "
            "SFs; the scale twin neardup_clusters_banded (same component "
            "operator over the verified MinHash pair set) runs here"
        ),
    },
    "semantic_dedup_cells": {
        "twins": ["semantic_dedup_tiled", "semantic_dedup_blocked"],
        "reason": (
            "SemDeDup-shaped exact baseline: within-cell all-pairs cosine is "
            "quadratic per cell BY ORACLE CONTRACT (the DuckDB twin recomputes "
            "every within-cell pair), and the declarative zip_with/aggregate "
            "fold is interpreted per pair — 312M pairs at sf10 runs to hours. "
            "Full-oracle at sf0.01/sf0.1 in the conformance gate, 50 s at sf1 "
            "measured once (PERF.md r7); the scale twin with IDENTICAL "
            "cell-constrained semantics AND the identical oracle — "
            "semantic_dedup_tiled (r8, VERDICT r07 #1) — runs here"
        ),
    },
    "neardup_representatives": {
        "twins": ["neardup_clusters_banded"],
        "reason": (
            "representative election over neardup_clusters' labels — "
            "inherits the exact quadratic pair source above. Full-oracle at "
            "sf0.3 in SOAK_r03 (5.3 s Spark vs 414 s DuckDB) and at "
            "conformance SFs; neardup_clusters_banded covers the scale path"
        ),
    },
    "semantic_dedup_fitted": {
        "twins": ["semantic_dedup_tiled", "semantic_dedup_blocked"],
        "reason": (
            "fitted-cell composition contract (r9): re-derives the JOINED "
            "quadratic-by-contract form as in-query ground truth for the "
            "tiled kernel on k-means cells, so it inherits "
            "semantic_dedup_cells' per-cell all-pairs cost at soak SFs. "
            "Full-oracle at sf0.01 in the conformance gate; the fitted-cell "
            "plumbing is scale-invariant (cells enter as a column) and the "
            "kernels it exercises soak via semantic_dedup_tiled / "
            "semantic_dedup_blocked"
        ),
    },
}


def _ckpt_path() -> str:
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.environ.get(
        "SPARK_GRAFT_SOAK_CKPT",
        os.path.join(base, ".localdata", "soak_ckpt.jsonl"),
    )


def _ckpt_load(sweep: str) -> tuple[dict, dict]:
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    path = _ckpt_path()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("sweep") != sweep:
                    continue
                if "sec" in rec:
                    times[rec["name"]] = rec["sec"]
                else:
                    errors[rec["name"]] = rec.get("err", "?")
    return times, errors


def _ckpt_append(rec: dict) -> None:
    path = _ckpt_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")


def _drain_session_pressure(spark, done: int) -> None:
    """Between-query hygiene for a several-hundred-query single-JVM
    session (VERDICT r09 next #2: substring_dedup_rewrite hit a one-shot
    'Not enough memory to build and broadcast' after ~170 prior queries —
    accumulated DRIVER pressure, not a plan defect; the query passed
    standalone and on resume). clearCache drops persisted relations;
    the periodic paired GC is what actually releases broadcast blocks:
    a Python gc pass drops py4j handles to dead DataFrames/broadcasts,
    then a JVM System.gc() lets ContextCleaner observe the now-unreferenced
    broadcast ids and evict their driver-side blocks. Every query would
    be wasteful (full GC pauses); every 20 keeps the resident broadcast
    set bounded by one window's worth instead of the whole sweep's."""
    spark.catalog.clearCache()
    if done % 20 == 0:
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass  # py4j hiccup: hygiene only, never fail the sweep


def run_suite(spark, registry, sf_dir: str, sweep: str) -> tuple[dict, dict, object]:
    times, errors = _ckpt_load(sweep)
    if times or errors:
        print(
            f"  [resume] {len(times)} timed + {len(errors)} errored "
            f"loaded from checkpoint",
            file=sys.stderr,
        )
    for name, fn in registry.items():
        if name in times or name in errors:
            continue
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 2)
            _ckpt_append({"sweep": sweep, "name": name, "sec": times[name]})
            _drain_session_pressure(spark, len(times))
        except Exception as exc:  # record, restart the session, keep going
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            _ckpt_append({"sweep": sweep, "name": name, "err": errors[name]})
            # an executor/driver OOM poisons the single-JVM local session —
            # every later query would fail spuriously (r04 attempt #1:
            # one heap blowout turned 70 green queries into ERRORs).
            # Restart and re-derive the registry's session-bound state.
            try:
                spark.stop()
            except Exception:
                pass
            spark = get_spark("registry-soak")
        print(
            f"  {name}: {times.get(name, 'ERROR')}s", file=sys.stderr, flush=True
        )
    return times, errors, spark


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SOAK_r05.json"
    m = re.search(r"_r0*(\d+)", os.path.basename(out_path))
    round_no = int(m.group(1)) if m else 0
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SOAK_SF1_DIR", os.path.join(base, ".localdata", "sf1")
    )
    sf10_dir = os.environ.get(
        "SPARK_GRAFT_SOAK_SF10_DIR", os.path.join(base, ".localdata", "sf10")
    )
    skip = {
        s for s in os.environ.get("SPARK_GRAFT_SOAK_SKIP", "").split(",") if s
    }
    spark = get_spark("registry-soak")
    registry = {
        n: f
        for n, f in q.queries().items()
        if n not in EXCLUDE and n not in skip
    }
    print(f"sf1 sweep ({len(registry)} queries)", file=sys.stderr)
    t1, e1, spark = run_suite(spark, registry, sf1_dir, "sf1")
    print(f"sf10 sweep ({len(registry)} queries)", file=sys.stderr)
    t10, e10, spark = run_suite(spark, registry, sf10_dir, "sf10")

    flags = {}
    for name, s10 in t10.items():
        s1 = t1.get(name)
        if s1 is None:
            continue
        # fixed-cost floor: ignore anything that finishes sf10 in <5 s or
        # is under 2x the linear extrapolation of max(sf1, floor).
        budget = 2 * 10 * max(s1, 0.5)
        if s10 > max(budget, 5.0):
            flags[name] = {"sf1_sec": s1, "sf10_sec": s10, "budget": budget}

    out = {
        "round": round_no,
        "what": (
            "full-registry spark-only soak (noop sink, single run per "
            "query per SF); excluded queries are quadratic-by-design "
            "baselines documented in EXCLUDE with their scale twins"
        ),
        "excluded": EXCLUDE,
        "sf1": {"dir": sf1_dir, "total_sec": round(sum(t1.values()), 1),
                "queries": t1, "errors": e1},
        "sf10": {"dir": sf10_dir, "total_sec": round(sum(t10.values()), 1),
                 "queries": t10, "errors": e10},
        "superlinear_flags": flags,
        "summary": {
            "queries_run": len(registry),
            "sf1_errors": len(e1),
            "sf10_errors": len(e10),
            "flags": len(flags),
        },
    }
    with open(os.path.join(base, out_path), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out["summary"]))


if __name__ == "__main__":
    main()
