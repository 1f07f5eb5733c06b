"""Persisted ANN index state (VERDICT r08 next #3): provided-state probe
paths must equal the derived (fit-in-line) paths, state must be
appendable per ingested batch, and malformed state must fail fast —
the banding-state test pattern applied to the ANN side.
"""

import pytest
from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.operators.similarity import (
    _centroids_from_state,
    as_double_vec,
    ivf_assign_batch,
    ivf_centroid_state,
    ivf_centroids,
    ivf_topk,
    ivf_topk_from_state,
    lsh_bucket_state,
    lsh_topk,
)


def _emb(spark, sf_dir):
    from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata

    return read_testdata(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_vec("embedding").alias("v")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_state_probe_equals_derived(spark, sf_dir):
    """ivf_topk_from_state over (centroid_state, assignments) built from
    the same fit returns exactly what the in-line ivf_topk returns —
    including after the centroids round-trip through a DataFrame (the
    parquet-store shape)."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") % 10 == 0)
    kw = dict(n_centroids=8, n_iters=2)
    derived = _rows(ivf_topk(emb, q, k=3, n_probe=4, **kw))

    state = ivf_centroid_state(emb, "v", "vec_id", **kw)
    assignments = ivf_assign_batch(emb, state)
    via_state = _rows(
        ivf_topk_from_state(assignments, state, q, k=3, n_probe=4)
    )
    assert via_state == derived and len(derived) > 0


def test_ivf_assignments_append_incrementally(spark, sf_dir):
    """The inverted file built as a UNION of per-batch ivf_assign_batch
    calls (the nightly-append lifecycle) probes identically to one built
    in a single shot — assignment is per-row against fixed centroids, so
    batching cannot change it."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") % 10 == 0)
    state = ivf_centroid_state(emb, "v", "vec_id", n_centroids=8, n_iters=1)

    one_shot = ivf_assign_batch(emb, state)
    b1 = ivf_assign_batch(emb.where(F.col("vec_id") % 2 == 0), state)
    b2 = ivf_assign_batch(emb.where(F.col("vec_id") % 2 == 1), state)
    appended = b1.unionByName(b2)
    assert _rows(appended) == _rows(one_shot)
    assert _rows(
        ivf_topk_from_state(appended, state, q, k=3, n_probe=4)
    ) == _rows(ivf_topk_from_state(one_shot, state, q, k=3, n_probe=4))


def test_ivf_centroid_state_roundtrip_and_validation(spark, sf_dir):
    """State -> list round-trip is exact (float64 through createDataFrame),
    and a state table with non-contiguous cells fails fast instead of
    silently shifting every assignment."""
    emb = _emb(spark, sf_dir)
    cents = ivf_centroids(emb, "v", n_centroids=4, n_iters=1, id_col="vec_id")
    state = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    )
    assert _centroids_from_state(state) == [list(map(float, c)) for c in cents]

    bad = spark.createDataFrame(
        [(0, [0.0, 1.0]), (2, [1.0, 0.0])], "cell int, centroid array<double>"
    )
    with pytest.raises(ValueError, match="contiguous"):
        _centroids_from_state(bad)


def test_lsh_bucket_state_probe_equals_derived(spark, sf_dir):
    """lsh_topk(bucket_state=) over a persisted (c_id, table, bucket)
    index returns exactly the in-line result for the same
    (n_tables, n_bits, seed) — the corpus is never re-hashed at probe
    time."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") % 10 == 0)
    kw = dict(k=3, n_tables=8, n_bits=4, seed=42, multiprobe=1)
    derived = _rows(lsh_topk(emb, q, **kw))
    state = lsh_bucket_state(emb, "vec_id", "v", n_tables=8, n_bits=4, seed=42)
    via_state = _rows(lsh_topk(emb, q, bucket_state=state, **kw))
    assert via_state == derived and len(derived) > 0
