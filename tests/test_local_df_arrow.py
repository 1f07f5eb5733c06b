"""Pin local_df's Arrow path (VERDICT r12 #6): the function silently falls
back to the slow pickled-row `createDataFrame(list)` path on ANY conversion
error, which is correct but invisible — a regression in the Arrow branch
would hide behind the fallback and quietly re-add a ~0.3 s Python-runner
scan job to every driver-local frame. These tests spy on the session's
createDataFrame to assert the pandas/Arrow branch is actually TAKEN for
every frame shape the registry builds, and that values survive exactly
(in particular: a None in a double column must stay a SQL NULL, not NaN).
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from aim357_2019_etl_and_ml_workshop_spark.sources.io import local_df

# (rows, schema) — one entry per frame shape family the registry routes
# through local_df: ANN probe tables, centroid state, contract result rows,
# lexicons, component labels, tile indices, merge tables, replay frames.
REGISTRY_SHAPES = [
    ([(1, 3), (2, 0)], "q_id bigint, cell int"),                 # ANN probe
    ([(0, [0.1, 0.2]), (1, [1.0, -2.5])],
     "cell int, centroid array<double>"),                        # IVF state
    ([(5, 5, True)], "n_queries bigint, k int, recall_ge_09 boolean"),
    ([("en", 120, True), ("de", 3, False)],
     "lang string, n_total bigint, frac_ok boolean"),            # lexicon-ish
    ([(1, 1), (2, 1), (3, 3)], "id bigint, comp bigint"),        # CC labels
    ([(0, 1), (1, 0)], "ti int, tj int"),                        # tile index
    ([(0, "a", "b", "ab")],
     "rank int, left string, right string, merged string"),      # BPE merges
    ([(1, datetime.datetime(2019, 1, 1, 12, 0, 0), 2.5)],
     "id bigint, ts timestamp, val double"),                     # replay frame
]


def _spy(spark, monkeypatch):
    calls = []
    orig = spark.createDataFrame

    def wrapper(data, schema=None, **kw):
        calls.append(type(data))
        return orig(data, schema, **kw)

    monkeypatch.setattr(spark, "createDataFrame", wrapper)
    return calls


@pytest.mark.parametrize("rows,schema", REGISTRY_SHAPES)
def test_registry_shapes_take_arrow_path_and_roundtrip(
    spark, monkeypatch, rows, schema
):
    calls = _spy(spark, monkeypatch)
    df = local_df(spark, rows, schema)
    # the Arrow branch hands createDataFrame a pandas frame, the fallback a
    # list — exactly one call, and it must be the pandas one
    assert calls == [pd.DataFrame], (
        f"local_df fell back to the pickled-row path for shape {schema!r}"
    )
    got = [tuple(r) for r in df.collect()]
    assert got == [tuple(r) for r in rows]


def test_none_in_double_column_stays_null(spark, monkeypatch):
    """Default pandas float64 inference would turn None into NaN — a value
    change the oracle would catch; the object-dtype frame must keep NULL."""
    calls = _spy(spark, monkeypatch)
    df = local_df(
        spark, [(1, None), (2, 0.5)], "id bigint, score double"
    )
    assert calls == [pd.DataFrame]
    rows = {r["id"]: r["score"] for r in df.collect()}
    assert rows[1] is None  # NULL, not NaN
    assert rows[2] == 0.5


def test_empty_rows_use_fallback_without_error(spark):
    # empty input cannot drive Arrow inference; the pickled path with an
    # explicit schema is the designed fallback
    df = local_df(spark, [], "id bigint, score double")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["id", "score"]
