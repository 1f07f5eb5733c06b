"""The soak exclusion ledger is a promise: every quadratic-by-contract
baseline we skip at soak SFs has a registered scale twin that DOES run
there. Promote that promise from SOAK artifact prose to a test (VERDICT
r08 next #6, same spirit as test_doc_counts): if a twin is ever renamed
or dropped, or the cross-reference rots, this fails the suite instead of
silently weakening the soak's coverage claim.
"""

import importlib.util
import os

import pytest

from aim357_2019_etl_and_ml_workshop_spark import queries as q

_SOAK = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "soak.py",
)


def _exclude():
    spec = importlib.util.spec_from_file_location("_soak_ledger", _SOAK)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.EXCLUDE


def test_every_exclusion_names_registered_twins():
    registry = q.queries()
    excl = _exclude()
    assert excl, "exclusion ledger vanished — soak.py refactor?"
    for name, entry in excl.items():
        assert name in registry, f"excluded query {name!r} is not registered"
        twins = entry.get("twins")
        assert twins, f"exclusion {name!r} names no scale twin"
        assert entry.get("reason"), f"exclusion {name!r} has no reason"
        for t in twins:
            assert t in registry, (
                f"exclusion {name!r} names twin {t!r}, which is not a "
                "registered query"
            )
            assert t not in excl, (
                f"exclusion {name!r} names twin {t!r}, which is itself "
                "excluded — the scale path would never soak"
            )


def test_every_exclusion_is_docstring_cross_referenced():
    """Each excluded query and at least one of its twins must reference
    each other by name in a docstring, so a reader landing on either side
    finds the pairing without opening the soak ledger."""
    registry = q.queries()
    for name, entry in _exclude().items():
        exdoc = registry[name].__doc__ or ""
        for t in entry["twins"]:
            tdoc = registry[t].__doc__ or ""
            assert (t in exdoc) or (name in tdoc), (
                f"no docstring cross-reference between excluded {name!r} "
                f"and twin {t!r}"
            )


def test_soak_contention_protocol_helpers():
    """The r11 exclusive-box protocol's pure pieces (VERDICT r10 #6):
    the competing-process scan excludes our own process group (this test
    process is busy RIGHT NOW and must not flag itself), the per-query
    snapshot carries the fields a flag needs for attribution, and the
    sweep order is a deterministic permutation that varies with the
    round salt (no family systematically first)."""
    spec = importlib.util.spec_from_file_location("_soak_mod", _SOAK)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    comp = mod._competing_procs()
    assert isinstance(comp, list)
    assert "pytest" not in " ".join(comp)  # never flags our own tree

    snap = mod._load_snapshot()
    assert "competing" in snap and "load1" in snap

    names = sorted(q.queries())
    o1 = mod._sweep_order(names, "SOAK_r11.jsonsf1")
    assert o1 == mod._sweep_order(names, "SOAK_r11.jsonsf1")  # stable
    assert sorted(o1) == names  # a permutation, nothing dropped
    o2 = mod._sweep_order(names, "SOAK_r12.jsonsf1")
    assert o1 != o2  # rotates across rounds

    # waived guard returns immediately and says so
    os.environ["SPARK_GRAFT_SOAK_NO_WAIT"] = "1"
    try:
        g = mod._wait_for_quiet("sf1")
        assert g["waived"] is True and g["waited_sec"] == 0
    finally:
        del os.environ["SPARK_GRAFT_SOAK_NO_WAIT"]


def test_soak_artifact_exclusions_match_ledger():
    """The most recent committed SOAK artifact must carry exactly the
    ledger's exclusion keys (stale artifacts are allowed to lag only by
    queries added since — never to contain unknown exclusions)."""
    import glob
    import json

    base = os.path.dirname(_SOAK).replace("/tools", "")
    arts = sorted(glob.glob(os.path.join(base, "SOAK_r*.json")))
    if not arts:
        pytest.skip("no soak artifact committed")
    with open(arts[-1]) as fh:
        art = json.load(fh)
    recorded = set(art.get("excluded", {}))
    assert recorded <= set(_exclude()), (
        "latest soak artifact excludes queries the ledger no longer "
        f"documents: {recorded - set(_exclude())}"
    )
