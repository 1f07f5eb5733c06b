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

Contention protocol (r11, VERDICT r10 #6): each sweep starts behind an
exclusive-box guard (bounded wait for zero competing runnable processes;
SPARK_GRAFT_SOAK_NO_WAIT=1 waives it, recorded), every query records a
load-average + competing-process snapshot taken right before it runs, a
superlinear flag carries both SFs' snapshots as its own contention
evidence, execution order is a per-round deterministic permutation (no
family is systematically first and thus systematically exposed to
warm-up-window contention), and an untimed warm-up query absorbs
JVM/codegen start-up.

Self-adjudicating flags (r12, VERDICT r11 #4 — SOAK_r11's one flag,
math_functions_probe 25.2 s in-sweep vs 3.6-4.4 s standalone, still
needed a MANUAL standalone rerun to attribute): every superlinear flag
is auto-rerun once in a FRESH session at the end of the sf10 sweep and
carries both timings plus a machine verdict — 'session_pressure' when
the fresh run lands back inside budget (an aged JVM manufactured the
number, not the plan), 'superlinear_confirmed' when it does not. And
the sweep recycles the session every SPARK_GRAFT_SOAK_RECYCLE timed
queries (default 60) so a 170-query-old JVM can't manufacture flags in
the first place.
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
    "embedding_neardup_portable": {
        "twins": ["embedding_neardup_lsh"],
        "reason": (
            "conformance-geometry portable twin (r11): its 16x4 integer-"
            "plane geometry is FIXED so the DuckDB oracle can replay it "
            "literally, which at sf10 leaves ~12.5k-vector buckets whose "
            "self-join emits ~10^10 candidate pairs — the scale knobs "
            "live in the Gaussian twin embedding_neardup_lsh (tunable "
            "bits/tables, runs here), and embedding_neardup_blocked "
            "remains the blocking-independent exact ground truth. "
            "Full-oracle at sf0.01/sf0.1 in the conformance gate"
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


def _competing_procs() -> list[str]:
    """Names of RUNNABLE processes outside this session's process group —
    the heavyweight-competitor detector (VERDICT r10 #6: SOAK_r10's one
    superlinear flag was a concurrently running example process
    contaminating the sweep's first minutes; the rerun protocol caught it
    only after the fact). /proc 'R' state means on-CPU or runqueue NOW, so
    anything here is actively stealing cores from the sweep."""
    try:
        my_pgrp = os.getpgid(0)
    except OSError:
        my_pgrp = -1
    out = []
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                s = f.read()
        except OSError:
            continue  # raced a process exit
        rpar = s.rfind(")")
        comm = s[s.find("(") + 1:rpar]
        rest = s[rpar + 2:].split()
        state, pgrp = rest[0], int(rest[2])
        # pgrp 0 = kernel threads (rcu_preempt, kworkers) — they flicker
        # 'R' transiently and are never the contention this guard hunts
        if state == "R" and pgrp not in (0, my_pgrp):
            out.append(comm)
    return sorted(out)


def _load_snapshot() -> dict:
    """Per-query contention evidence: 1/5-minute load averages plus the
    competing-runnable-process list, recorded BEFORE each query so a
    superlinear flag carries its own contention attribution instead of
    needing an after-the-fact standalone rerun."""
    snap = {"competing": _competing_procs()}
    try:
        l1, l5, _ = os.getloadavg()
        snap["load1"] = round(l1, 2)
        snap["load5"] = round(l5, 2)
    except OSError:
        pass
    return snap


def _wait_for_quiet(
    sweep: str, max_wait_sec: float = 900.0, poll_sec: float = 15.0
) -> dict:
    """Exclusive-box guard at sweep start: wait (bounded) until no
    competing runnable process exists outside our process group. Load
    average alone can't gate here — our OWN just-finished sweep keeps
    load1 high for minutes — so the gate is the competitor list and the
    loads are recorded as evidence. SPARK_GRAFT_SOAK_NO_WAIT=1 skips the
    wait (recorded, so the artifact shows the guard was waived)."""
    if os.environ.get("SPARK_GRAFT_SOAK_NO_WAIT"):
        snap = _load_snapshot()
        snap.update({"sweep": sweep, "waived": True, "waited_sec": 0})
        return snap
    waited = 0.0
    while True:
        snap = _load_snapshot()
        if not snap["competing"] or waited >= max_wait_sec:
            snap.update(
                {
                    "sweep": sweep,
                    "waived": False,
                    "waited_sec": round(waited, 1),
                    "gave_up": bool(snap["competing"]),
                }
            )
            if snap["competing"]:
                print(
                    f"  [contention] sweep {sweep} starting DESPITE "
                    f"competitors after {waited:.0f}s: {snap['competing']}",
                    file=sys.stderr,
                )
            return snap
        print(
            f"  [contention] waiting on {snap['competing']} "
            f"(load1={snap.get('load1')})",
            file=sys.stderr,
        )
        time.sleep(poll_sec)
        waited += poll_sec


def _sweep_order(names, salt: str) -> list[str]:
    """Deterministic per-round permutation of the execution order: keyed
    md5 so no query family (the near-dup rotation prefix, in SOAK_r10's
    case) is SYSTEMATICALLY first in every round and thus systematically
    exposed to warm-up-window contention."""
    import hashlib

    return sorted(
        names, key=lambda n: hashlib.md5((salt + n).encode()).hexdigest()
    )


def _ckpt_path() -> str:
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.environ.get(
        "SPARK_GRAFT_SOAK_CKPT",
        os.path.join(base, ".localdata", "soak_ckpt.jsonl"),
    )


def _ckpt_load(sweep: str) -> tuple[dict, dict, dict]:
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    loads: dict[str, dict] = {}
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
                    if "load" in rec:
                        loads[rec["name"]] = rec["load"]
                else:
                    errors[rec["name"]] = rec.get("err", "?")
    return times, errors, loads


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


def adjudicate_flag(
    fn, sf_dir: str, budget: float, session_factory=None
) -> dict:
    """Re-run one flagged query in a FRESH session and return the machine
    verdict (r12, VERDICT r11 #4): the in-sweep number came from a
    session that had executed up to ~180 prior queries; a fresh-JVM rerun
    inside the same quiet box isolates plan cost from session aging.
    'session_pressure' = the fresh run lands back inside the superlinear
    budget (the flag was manufactured by the aged session);
    'superlinear_confirmed' = it does not (a real plan defect)."""
    factory = session_factory or (lambda: get_spark("soak-adjudicate"))
    fresh = factory()
    try:
        snap = _load_snapshot()
        t0 = time.perf_counter()
        fn(fresh, sf_dir).write.format("noop").mode("overwrite").save()
        sec = round(time.perf_counter() - t0, 2)
        return {
            "fresh_sf10_sec": sec,
            "fresh_load": snap,
            "verdict": (
                "session_pressure" if sec <= budget
                else "superlinear_confirmed"
            ),
        }
    except Exception as exc:
        return {
            "fresh_err": f"{type(exc).__name__}: {exc}"[:300],
            "verdict": "rerun_error",
        }
    finally:
        try:
            fresh.stop()
        except Exception:
            pass


def _recycle_every() -> int:
    return int(os.environ.get("SPARK_GRAFT_SOAK_RECYCLE", "60"))


def run_suite(
    spark,
    registry,
    sf_dir: str,
    sweep: str,
    order_salt: str = "",
    session_factory=None,
    recycle_every: int | None = None,
) -> tuple[dict, dict, dict, object]:
    factory = session_factory or (lambda: get_spark("registry-soak"))
    recycle = _recycle_every() if recycle_every is None else recycle_every
    since_restart = 0
    times, errors, loads = _ckpt_load(sweep)
    if times or errors:
        print(
            f"  [resume] {len(times)} timed + {len(errors)} errored "
            f"loaded from checkpoint",
            file=sys.stderr,
        )
    # untimed warm-up: JVM/codegen/scan warm-up lands here, not on the
    # first timed query of whatever family the order puts first
    warm = registry.get("global_count")
    if warm is not None and not times:
        try:
            warm(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # warm-up is best-effort; the timed run will surface it
    for name in _sweep_order(registry, order_salt + sweep):
        fn = registry[name]
        if name in times or name in errors:
            continue
        snap = _load_snapshot()
        loads[name] = snap
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 2)
            _ckpt_append(
                {"sweep": sweep, "name": name, "sec": times[name],
                 "load": snap}
            )
            _drain_session_pressure(spark, len(times))
            since_restart += 1
            if recycle and since_restart >= recycle:
                # periodic session recycle (r12, VERDICT r11 #4): bound
                # how old the JVM serving any timed query can be, so
                # session aging cannot manufacture superlinear flags
                since_restart = 0
                try:
                    spark.stop()
                except Exception:
                    pass
                spark = factory()
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
            spark = factory()
            since_restart = 0
        print(
            f"  {name}: {times.get(name, 'ERROR')}s", file=sys.stderr, flush=True
        )
    return times, errors, loads, spark


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
    guard1 = _wait_for_quiet("sf1")
    t1, e1, l1, spark = run_suite(
        spark, registry, sf1_dir, "sf1", order_salt=out_path
    )
    print(f"sf10 sweep ({len(registry)} queries)", file=sys.stderr)
    guard10 = _wait_for_quiet("sf10")
    t10, e10, l10, spark = run_suite(
        spark, registry, sf10_dir, "sf10", order_salt=out_path
    )

    flags = {}
    for name, s10 in t10.items():
        s1 = t1.get(name)
        if s1 is None:
            continue
        # fixed-cost floor: ignore anything that finishes sf10 in <5 s or
        # is under 2x the linear extrapolation of max(sf1, floor).
        budget = 2 * 10 * max(s1, 0.5)
        if s10 > max(budget, 5.0):
            flags[name] = {
                "sf1_sec": s1,
                "sf10_sec": s10,
                "budget": budget,
                # contention attribution travels WITH the flag (r11):
                # load + competing-process snapshots taken right before
                # each of the two timed runs
                "load_sf1": l1.get(name),
                "load_sf10": l10.get(name),
            }

    # self-adjudication (r12): every flag gets one fresh-session rerun at
    # sf10 and a machine verdict, so the artifact arrives pre-attributed
    if flags:
        try:
            spark.stop()
        except Exception:
            pass
        for name in flags:
            flags[name].update(
                adjudicate_flag(registry[name], sf10_dir, flags[name]["budget"])
            )

    out = {
        "round": round_no,
        "what": (
            "full-registry spark-only soak (noop sink, single run per "
            "query per SF); excluded queries are quadratic-by-design "
            "baselines documented in EXCLUDE with their scale twins"
        ),
        "excluded": EXCLUDE,
        "exclusive_box_guard": {"sf1": guard1, "sf10": guard10},
        "session_recycle_every": _recycle_every(),
        "sf1": {"dir": sf1_dir, "total_sec": round(sum(t1.values()), 1),
                "queries": t1, "errors": e1, "loads": l1},
        "sf10": {"dir": sf10_dir, "total_sec": round(sum(t10.values()), 1),
                 "queries": t10, "errors": e10, "loads": l10},
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
