"""MLlib pipeline surface + custom stateful streaming operator."""

import os
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from aim357_2019_etl_and_ml_workshop_spark.operators.mlpipeline import (
    tfidf_features,
    train_lang_classifier,
)
from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata


def test_tfidf_features(spark, sf_dir):
    docs = read_testdata(spark, sf_dir, "documents")
    out = tfidf_features(docs, "text", "doc_id")
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert r.n_terms >= 0
        assert r.weight_sum >= r.top_weight >= 0


def test_lang_classifier_learns_separable_data(spark):
    """The driver's documents carry lang labels UNCORRELATED with their text
    (one shared vocabulary), so that task is unlearnable by construction —
    verified: training there scores ~the majority prior. The estimator
    contract is therefore tested on a separable corpus where vocabulary
    determines the label."""
    vocab = {
        "en": "the quick brown fox jumps over lazy dog river stone",
        "de": "der schnelle braune fuchs springt ueber faulen hund fluss stein",
        "es": "el rapido zorro marron salta sobre perro perezoso rio piedra",
    }
    rows = []
    for li, (lang, words) in enumerate(sorted(vocab.items())):
        ws = words.split()
        for i in range(40):
            text = " ".join(ws[(i + j) % len(ws)] for j in range(6))
            rows.append(Row(doc_id=li * 100 + i, text=text, lang=lang))
    docs = spark.createDataFrame(rows)
    model = train_lang_classifier(docs)
    pred = model.transform(docs)
    acc = pred.where(F.col("label") == F.col("prediction")).count() / docs.count()
    assert acc >= 0.95, f"train accuracy too low on separable data: {acc}"


def test_stateful_running_counts(spark, tmp_path):
    """Custom stateful streaming operator via applyInPandasWithState:
    per-key RUNNING event count maintained in GroupState across
    micro-batches (SURVEY.md §2.9 'applyInPandasWithState for custom
    stateful operators')."""
    src = str(tmp_path / "st_src")
    os.makedirs(src)
    schema = "k string, ts timestamp"

    def batch(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)

    batch([Row(k="a", ts=datetime(2024, 1, 1, 0, 0)),
           Row(k="a", ts=datetime(2024, 1, 1, 0, 1)),
           Row(k="b", ts=datetime(2024, 1, 1, 0, 2))])

    from aim357_2019_etl_and_ml_workshop_spark.streaming.stateful import (
        running_counts,
    )

    stream = spark.readStream.schema(schema).parquet(src)
    out = running_counts(stream, "k")
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_counts")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        batch([Row(k="a", ts=datetime(2024, 1, 1, 0, 5))])
        q.processAllAvailable()
        rows = spark.sql(
            "select k, max(total) as total from stateful_counts group by k"
        ).collect()
        totals = {r.k: r.total for r in rows}
    finally:
        q.stop()
        spark.catalog.dropTempView("stateful_counts")
    assert totals == {"a": 3, "b": 1}  # state carried across micro-batches


def test_stateful_running_stats(spark, tmp_path):
    """running_stats keeps per-key (n, sum, min, max) in GroupState; values
    accumulate across micro-batches and min/max survive batch boundaries."""
    from aim357_2019_etl_and_ml_workshop_spark.streaming.stateful import (
        running_stats,
    )

    src = str(tmp_path / "rs_src")
    os.makedirs(src)
    schema = "k string, v double"

    def batch(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)

    batch([Row(k="a", v=1.0), Row(k="a", v=5.0), Row(k="b", v=-2.0)])
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        running_stats(stream, "k", "v")
        .writeStream.format("memory")
        .queryName("stateful_stats")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        batch([Row(k="a", v=0.5)])
        q.processAllAvailable()
        rows = spark.sql(
            "select k, max(n) n, max(v_max) mx, min(v_min) mn, "
            "max(total) s from stateful_stats group by k"
        ).collect()
        got = {r.k: (r.n, r.mn, r.mx, r.s) for r in rows}
    finally:
        q.stop()
        spark.catalog.dropTempView("stateful_stats")
    assert got["a"] == (3, 0.5, 5.0, 6.5)
    assert got["b"] == (1, -2.0, -2.0, -2.0)


def test_cluster_embeddings(spark, sf_dir):
    """Seeded KMeans assigns every embedding to one of k clusters and is
    reproducible run-to-run with the same seed."""
    from aim357_2019_etl_and_ml_workshop_spark.operators.mlpipeline import (
        cluster_embeddings,
    )
    from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata

    emb = read_testdata(spark, sf_dir, "embeddings")
    a = cluster_embeddings(emb, k=4)
    n = emb.count()
    assert a.count() == n
    assert a.select("cluster").distinct().count() <= 4
    b = cluster_embeddings(emb, k=4)
    joined = a.withColumnRenamed("cluster", "c1").join(b, "vec_id")
    assert joined.where(F.col("c1") != F.col("cluster")).count() == 0


def test_stateful_sessionize_stream(spark, tmp_path):
    """Closed sessions are emitted once a later event proves the gap; the
    open tail session stays in state across micro-batches."""
    from aim357_2019_etl_and_ml_workshop_spark.streaming.stateful import (
        sessionize_stream,
    )

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    schema = "k string, ts timestamp"

    def batch(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)

    # session 1: two events 10 min apart; gap of 2h to the next
    batch([Row(k="a", ts=datetime(2024, 1, 1, 0, 0)),
           Row(k="a", ts=datetime(2024, 1, 1, 0, 10))])
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        sessionize_stream(stream, "k", "ts", gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("sessions_out").count() == 0  # still open
        batch([Row(k="a", ts=datetime(2024, 1, 1, 2, 0))])  # proves the gap
        q.processAllAvailable()
        rows = spark.table("sessions_out").collect()
    finally:
        q.stop()
        spark.catalog.dropTempView("sessions_out")
    assert len(rows) == 1
    r = rows[0]
    assert r.k == "a" and r.n_events == 2
    assert r.session_start == datetime(2024, 1, 1, 0, 0)
    assert r.session_end == datetime(2024, 1, 1, 0, 10)
