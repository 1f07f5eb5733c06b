"""Doc-count invariants (VERDICT r07 #6): the registry counts quoted in
API.md / SCALE.md and the soak counts quoted in PERF.md drifted twice in
two rounds of being written — assert them against the registry and the
SOAK artifacts so staleness fails CI instead of surfacing in a verdict.

No Spark session needed: queries() is a pure dict constructor.
"""

from __future__ import annotations

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name: str) -> str:
    with open(os.path.join(REPO, name)) as f:
        return f.read()


def _registry_size() -> int:
    from aim357_2019_etl_and_ml_workshop_spark.queries import queries

    return len(queries())


def test_api_md_registry_count_is_current():
    m = re.search(r"`queries\(\)` \((\d+) named", _read("API.md"))
    assert m, "API.md no longer documents the queries() count"
    assert int(m.group(1)) == _registry_size(), (
        f"API.md says {m.group(1)} queries; registry has {_registry_size()}"
    )


def test_scale_md_registry_count_is_current():
    text = _read("SCALE.md")
    counts = re.findall(r"over (\d+) queries|Summary: (\d+) queries", text)
    found = [int(a or b) for a, b in counts]
    assert found, "SCALE.md no longer states its query count"
    assert all(c == _registry_size() for c in found), (
        f"SCALE.md states {found}; registry has {_registry_size()} — "
        "regenerate with tools/scale_report.py"
    )


def test_perf_md_soak_counts_match_artifacts():
    """Every 'SOAK_rNN (K queries' claim in PERF.md must equal that
    artifact's summary.queries_run."""
    text = _read("PERF.md")
    for rn, k in re.findall(r"SOAK_r(\d+) \((\d+) queries", text):
        path = os.path.join(REPO, f"SOAK_r{rn}.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            ran = json.load(f)["summary"]["queries_run"]
        assert int(k) == ran, (
            f"PERF.md says SOAK_r{rn} ran {k} queries; artifact says {ran}"
        )
