"""Broadcast-hygiene regression guard (VERDICT r06 #5).

The r6 bug class: code paths that ``sc.broadcast`` a gather per INVOCATION
leak abandoned Broadcast objects whose cyclic-GC/py4j-finalizer cleanup
lands in the middle of the NEXT query (PERF.md r6 autopsy — ivf_ann_topk
1.2 -> 3 s). The fix is the memoized ``similarity._gather_broadcast``.
These tests fail fast if a future code path bypasses the memo (re-runs of
the same query must NOT mint new broadcasts) and pin the memo's lifecycle
contract (LRU -> graveyard -> destroy, dead-app purge, thread safety).
"""

from __future__ import annotations

import threading

import numpy as np
import pytest

from aim357_2019_etl_and_ml_workshop_spark.operators import similarity as S
from aim357_2019_etl_and_ml_workshop_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _gather(seed: int, n: int = 8, dim: int = 4):
    rng = np.random.RandomState(seed)
    ids = np.arange(n, dtype=np.int64)
    mat = rng.rand(n, dim).astype(np.float64)
    return ids, mat, np.linalg.norm(mat, axis=1)


@pytest.fixture(autouse=True)
def _clean_cache():
    S.clear_gather_cache(destroy=True)
    yield
    S.clear_gather_cache(destroy=True)


def test_rerun_does_not_mint_new_broadcasts(spark):
    """Running the same gather-backed query twice must reuse ONE broadcast:
    this is the guard that fails if the memo is reverted to per-call
    sc.broadcast (each bench run would then abandon broadcasts that
    degrade the following query)."""
    sc = spark.sparkContext
    calls = []
    orig = sc.broadcast

    def counting(value):
        calls.append(1)
        return orig(value)

    sc.broadcast = counting
    try:
        r1 = sorted(map(tuple, Q._REGISTRY["lsh_ann_topk"](spark, SF).collect()))
        first = len(calls)
        assert first >= 1  # the gather rode sc.broadcast at least once
        r2 = sorted(map(tuple, Q._REGISTRY["lsh_ann_topk"](spark, SF).collect()))
        assert r1 == r2
        # No NEW gather broadcast on the re-run; memoized entries reused.
        assert len(calls) == first, (
            f"re-run minted {len(calls) - first} new broadcast(s) — "
            "a code path is bypassing similarity._gather_broadcast"
        )
    finally:
        sc.broadcast = orig
    # and the memo is bounded
    assert len(S._GATHER_BC_CACHE) <= S._GATHER_BC_CACHE_MAX
    assert len(S._GATHER_BC_GRAVE) <= S._GATHER_BC_GRAVE_MAX


def test_memo_identity_and_lru_graveyard(spark):
    """Same content -> same Broadcast object; eviction parks in the
    graveyard (still usable); a re-requested evicted gather RESURRECTS
    the parked broadcast instead of minting a new one; graveyard
    overflow destroys the oldest."""
    g = _gather(0)
    bc1 = S._gather_broadcast(spark, g)
    bc2 = S._gather_broadcast(spark, g)
    assert bc1 is bc2
    assert len(S._GATHER_BC_CACHE) == 1

    # push CACHE_MAX distinct gathers through: bc1 gets LRU-evicted but
    # must remain readable (graveyard holds it; unpersist only drops
    # executor copies, the value is re-fetchable)
    for i in range(1, S._GATHER_BC_CACHE_MAX + 1):
        S._gather_broadcast(spark, _gather(i))
    assert len(S._GATHER_BC_CACHE) == S._GATHER_BC_CACHE_MAX
    assert bc1 in S._GATHER_BC_GRAVE.values()
    assert np.allclose(bc1.value[1], g[1])  # still alive after eviction

    # re-requesting the evicted gather resurrects the SAME broadcast —
    # no re-serialization, and the graveyard slot frees up
    bc3 = S._gather_broadcast(spark, g)
    assert bc3 is bc1
    assert bc1 not in S._GATHER_BC_GRAVE.values()

    # overflow the graveyard -> the oldest evictee is finally destroyed
    for i in range(100, 100 + S._GATHER_BC_CACHE_MAX + S._GATHER_BC_GRAVE_MAX + 1):
        S._gather_broadcast(spark, _gather(i))
    assert bc1 not in S._GATHER_BC_GRAVE.values()
    assert len(S._GATHER_BC_GRAVE) <= S._GATHER_BC_GRAVE_MAX


def test_dead_app_entries_are_purged(spark):
    """Entries keyed by a stopped/replaced SparkContext's applicationId
    must not occupy LRU slots (ADVICE r06)."""
    S._gather_broadcast(spark, _gather(0))
    real_key = next(iter(S._GATHER_BC_CACHE))
    fake_key = ("dead-app-id", "deadbeef", (8, 4))

    class _FakeBc:
        destroyed = False

        def destroy(self):
            self.destroyed = True

    fake = _FakeBc()
    with S._GATHER_BC_LOCK:
        S._GATHER_BC_CACHE[fake_key] = fake
    S._gather_broadcast(spark, _gather(1))
    assert fake_key not in S._GATHER_BC_CACHE
    assert fake.destroyed
    assert real_key in S._GATHER_BC_CACHE


def test_concurrent_access_is_safe(spark):
    """Racing driver threads must not corrupt the cache bookkeeping
    (ADVICE r06: pop/insert/evict on a plain dict is not thread-safe).
    Scope honesty: 12 distinct keys < CACHE_MAX, so no eviction/destroy
    fires here — this test exercises the LOCKED dict paths plus the
    race where two threads build the same gather concurrently (the
    loser's never-exposed broadcast is destroyed); eviction, graveyard
    resurrection, and overflow-destroy are pinned single-threaded above
    (a driver-created Broadcast's .value reads its local dump even
    after destroy, so a reader probe could not detect a destroy race
    anyway)."""
    errors: list[Exception] = []

    def worker(tid: int):
        try:
            for i in range(30):
                bc = S._gather_broadcast(spark, _gather((tid * 31 + i) % 12))
                _ = bc.value[0][0]
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(S._GATHER_BC_CACHE) <= S._GATHER_BC_CACHE_MAX
    assert len(S._GATHER_BC_GRAVE) <= S._GATHER_BC_GRAVE_MAX
