"""Parity extras: make_struct ResolveChoice, catalog registration (S5/S6),
salted skew join, forecast evaluation metrics."""

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import Window

from aim357_2019_etl_and_ml_workshop_spark.forecast import (
    SeasonalQuantileForecaster,
    evaluate,
)
from aim357_2019_etl_and_ml_workshop_spark.operators.canonicalize import (
    resolve_choice_struct,
)
from aim357_2019_etl_and_ml_workshop_spark.operators.timeseries import salted_join
from aim357_2019_etl_and_ml_workshop_spark.sources.io import register_catalog_table


def test_resolve_choice_struct_branches(spark):
    df = spark.createDataFrame([Row(v="12"), Row(v="abc"), Row(v=None)])
    out = resolve_choice_struct(df, "v").collect()
    assert out[0].v.bigint == 12 and out[0].v.string is None
    assert out[1].v.bigint is None and out[1].v.string == "abc"
    assert out[2].v.bigint is None and out[2].v.string is None


def test_catalog_registration_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame([Row(a=1), Row(a=2)]).write.parquet(path)
    register_catalog_table(spark, "engdb", "t_cat", path)
    assert spark.table("engdb.t_cat").count() == 2
    assert "t_cat" in [t.name for t in spark.catalog.listTables("engdb")]


def test_events_range_scan_pushdown(spark, sf_dir):
    """read_events_ts_range translates ts bounds to the raw bigint nanos
    column (monotone floor-div), so the range predicate reaches the parquet
    reader — PushedFilters on the events scan — while plain read_testdata's
    derived-column filter cannot push down."""
    from aim357_2019_etl_and_ml_workshop_spark.plans import formatted_plan
    from aim357_2019_etl_and_ml_workshop_spark.sources.io import (
        read_events_ts_range,
        read_testdata,
    )

    pushed = read_events_ts_range(spark, sf_dir, "2024-01-10", "2024-01-12")
    plan = formatted_plan(pushed)
    assert "PushedFilters: [" in plan
    # the range bounds (not just IsNotNull) must be in the pushed set; the
    # spelling depends on the testdata encoding: raw-nanos bigint translates
    # to >= / <, a native timestamp column pushes the strict > / < directly
    assert ("GreaterThan(ts" in plan or "GreaterThanOrEqual(ts" in plan)
    assert "LessThan(ts" in plan
    # identical semantics to the naive post-conversion filter
    naive = read_testdata(spark, sf_dir, "events").where(
        (F.col("ts") > F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-12").cast("timestamp"))
    )
    assert pushed.count() == naive.count()


def test_salted_join_equivalence(spark):
    big = spark.createDataFrame(
        [Row(k="hot", x=i) for i in range(50)] + [Row(k="cold", x=-1)]
    )
    small = spark.createDataFrame([Row(k="hot", tag="H"), Row(k="cold", tag="C")])
    plain = {(r.k, r.x, r.tag) for r in big.join(small, "k").collect()}
    salted = {(r.k, r.x, r.tag) for r in salted_join(big, small, "k", 4).collect()}
    assert salted == plain


def test_forecast_evaluate_metrics(spark):
    daily = spark.createDataFrame(
        [
            Row(series="s", day=datetime(2018, 1, 1 + d), n=float(10 + d % 7))
            for d in range(28)
        ]
    )
    fc = SeasonalQuantileForecaster(prediction_length=7)
    pred = fc.predict(daily, "series", "day", "n")
    # actuals: continue the same weekly pattern -> small errors
    actuals = spark.createDataFrame(
        [
            Row(series="s", ts=datetime(2018, 1, 29) + (datetime(2018, 1, 30) - datetime(2018, 1, 29)) * d, y=float(10 + (28 + d) % 7))
            for d in range(7)
        ]
    )
    m = evaluate(pred, actuals)
    rows = m.collect()
    metrics = {(r.metric, r.quantile): r.value for r in rows}
    assert ("rmse", None) in metrics
    assert metrics[("rmse", None)] >= 0
    for q in (0.1, 0.5, 0.9):
        assert metrics[("wQuantileLoss", q)] >= 0


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Both sides bucketed 8-ways on the join key -> the join plan contains
    NO Exchange on either input (co-located join), vs the unbucketed plan
    which shuffles both sides."""
    from aim357_2019_etl_and_ml_workshop_spark.plans import formatted_plan
    from aim357_2019_etl_and_ml_workshop_spark.sources.io import (
        read_testdata,
        write_bucketed_table,
    )

    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed_table(li, "b_lineitem", ["l_orderkey"], 8)
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 8)
    try:
        bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
            plan = formatted_plan(joined)
            assert "Exchange" not in plan, "bucketed join still shuffles"
            assert joined.count() == li.count()  # inner FK join keeps all items
            plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
            assert "Exchange" in formatted_plan(plain)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_catalog_partitioned_registration(spark, tmp_path):
    """Partitioned external table: partition recovery (MSCK) makes the
    catalog table see the partition-dir rows; bare registration would
    read zero."""
    from pyspark.sql import Row as R

    path = str(tmp_path / "ptbl")
    spark.createDataFrame(
        [R(a=1, part="x"), R(a=2, part="y")]
    ).write.partitionBy("part").parquet(path)
    register_catalog_table(spark, "engdb", "t_part", path, ["part"])
    got = spark.table("engdb.t_part")
    assert got.count() == 2
    assert set(got.columns) == {"a", "part"}
    spark.sql("DROP TABLE engdb.t_part")


def test_permissive_csv_corrupt_records(spark, tmp_path):
    """Schema-on-read tolerance: malformed CSV rows land in the
    _corrupt_record column instead of failing the scan (the crawler-era
    'dirty data still loads' behavior, cf. the reference's year-2088 rows
    surviving ingestion)."""
    p = tmp_path / "dirty.csv"
    p.write_text(
        "a,b\n1,x\nnot-enough-columns\n3,z\n"
    )
    df = (
        spark.read.option("header", True)
        .schema("a string, b string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
    )
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 1 and bad[0]._corrupt_record == "not-enough-columns"


def test_session_window_batch(spark):
    """session_window: gap-based session assignment as a native operator
    (the streaming-native sibling of the lag-gap sessionization query)."""
    from datetime import datetime, timedelta
    from pyspark.sql import Row as R
    from pyspark.sql import functions as F2

    base = datetime(2024, 1, 1)
    rows = [
        R(k="u1", ts=base),
        R(k="u1", ts=base + timedelta(minutes=3)),   # same session (gap<5m)
        R(k="u1", ts=base + timedelta(minutes=30)),  # new session
        R(k="u2", ts=base + timedelta(minutes=1)),
    ]
    df = spark.createDataFrame(rows)
    out = (
        df.groupBy(F2.session_window("ts", "5 minutes").alias("w"), "k")
        .count()
        .select("k", F2.col("w.start").alias("start"), "count")
        .orderBy("k", "start")
        .collect()
    )
    assert [(r.k, r["count"]) for r in out] == [("u1", 2), ("u1", 1), ("u2", 1)]


def test_dynamic_partition_pruning(spark, sf_dir):
    """DPP: joining a date-partitioned fact with a selectively-filtered dim
    on the partition column injects a runtime `dynamicpruning` subquery
    into the fact scan, so only matching partitions are read — the
    mechanism that makes dim-filtered scans of a 100 TB partitioned
    canonical table touch only the needed dates."""
    import tempfile

    from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata

    with tempfile.TemporaryDirectory() as td:
        ev = read_testdata(spark, sf_dir, "events")
        fact_path, dim_path = f"{td}/ev_part", f"{td}/day_dim"
        ev.withColumn("day", F.to_date("ts")).write.partitionBy("day").parquet(
            fact_path
        )
        # dim: one row per day with a selective flag column on disk, so the
        # optimizer sees a filtered scan (DPP requires a selective predicate
        # on the filtering side)
        ev.select(F.to_date("ts").alias("d_day")).distinct().withColumn(
            "keep", (F.dense_rank().over(Window.orderBy("d_day")) <= 2).cast("int")
        ).write.parquet(dim_path)
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path).where(F.col("keep") == 1)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # keep the fact from being the broadcast/build side at toy scale
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = fact.join(F.broadcast(dim), fact.day == dim.d_day)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "dynamicpruning" in plan.lower(), plan[:2000]
            keep_days = [r.d_day for r in dim.select("d_day").collect()]
            expect = fact.where(F.col("day").isin(keep_days)).count()
            assert joined.count() == expect and expect > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_redact_pii_semantics(spark):
    """PII scrub masks emails, phones, IPs, and residual digit runs while
    leaving clean text untouched."""
    from aim357_2019_etl_and_ml_workshop_spark.operators.textanalysis import redact_pii

    rows = [
        ("mail me at jane.doe+x@example.co.uk today", "mail me at [EMAIL] today"),
        ("call +1-555-123-4567 now", "call [PHONE] now"),
        ("server 10.0.12.7 down", "server [IP] down"),
        ("acct 123456789", "acct [NUM]"),
        ("clean text stays", "clean text stays"),
    ]
    df = spark.createDataFrame(rows, "raw string, want string")
    got = df.select("want", redact_pii("raw").alias("got")).collect()
    for r in got:
        assert r.got == r.want, (r.got, r.want)


def test_json_orc_and_schema_evolution(spark, tmp_path):
    """Source-format breadth: JSON Lines with corrupt-record capture, ORC
    roundtrip, and parquet mergeSchema across file generations (the
    fhv->fhvhv column-addition shape)."""
    from aim357_2019_etl_and_ml_workshop_spark.sources.io import (
        read_json_lines,
        read_orc,
        read_parquet_evolved,
        write_orc,
    )
    from pyspark.sql.types import StructType

    # JSON lines with one malformed row
    jpath = str(tmp_path / "j")
    with open(str(tmp_path / "data.jsonl"), "w") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n{not json\n')
    import shutil, os
    os.makedirs(jpath)
    shutil.move(str(tmp_path / "data.jsonl"), jpath + "/data.jsonl")
    schema = StructType.fromDDL("a long, b string, _corrupt_record string")
    j = read_json_lines(spark, jpath, schema).cache()
    j.count()  # materialize before filtering on corrupt col (Spark requires)
    assert j.where(F.col("_corrupt_record").isNotNull()).count() == 1
    assert j.where(F.col("a").isNotNull()).count() == 2

    # ORC roundtrip preserves schema + values
    opath = str(tmp_path / "o")
    src = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    write_orc(src, opath)
    back = read_orc(spark, opath)
    assert back.schema == src.schema
    assert sorted(r.k for r in back.collect()) == [1, 2]

    # schema evolution: generation 2 adds a column; mergeSchema unions
    ppath = str(tmp_path / "p")
    spark.createDataFrame([(1,)], "k int").write.parquet(ppath + "/gen=1")
    spark.createDataFrame([(2, "new")], "k int, extra string").write.parquet(
        ppath + "/gen=2"
    )
    ev = read_parquet_evolved(spark, [ppath + "/gen=1", ppath + "/gen=2"])
    assert set(ev.columns) == {"k", "extra"}
    rows = {r.k: r.extra for r in ev.collect()}
    assert rows == {1: None, 2: "new"}


def test_observe_metrics(spark, sf_dir):
    """df.observe(): accumulator-style pipeline metrics (row counts, sums)
    collected DURING an action with zero extra passes — the production
    pattern for data-quality counters on a 100 TB ETL job, replacing the
    reference's separate count() queries (its golden-count eyeballing,
    SURVEY.md §5.1)."""
    from pyspark.sql import Observation
    from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata

    obs = Observation("etl_metrics")
    ev = read_testdata(spark, sf_dir, "events")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.count(F.when(F.col("value") < 0, 1)).alias("neg_values"),
    )
    n = observed.count()
    assert obs.get["rows_seen"] == n > 0
    assert obs.get["neg_values"] >= 0


def test_write_parquet_clustered_orders_rows_within_files(spark, tmp_path):
    """Every output file must be internally sorted on the cluster key (the
    property that makes row-group min/max stats selective)."""
    import glob

    from aim357_2019_etl_and_ml_workshop_spark.sources.io import (
        write_parquet_clustered,
    )

    df = spark.range(0, 10_000).select(
        (F.col("id") * 7919 % 10_000).alias("k"), F.col("id").alias("v")
    ).repartition(4)
    out = str(tmp_path / "clustered")
    write_parquet_clustered(df, out, ["k"])
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 2  # parallel write preserved
    for f in files:
        ks = [r.k for r in spark.read.parquet(f).collect()]
        assert ks == sorted(ks), f"file not internally sorted: {f}"
    # nothing lost
    assert spark.read.parquet(out).count() == 10_000


def test_pandas_api_plane(spark, sf_dir):
    """The reference pulls aggregates into pandas for its local analysis
    plane (%%local + pd.read_sql). pyspark.pandas provides that DataFrame
    idiom WITHOUT leaving the cluster — verify the notebook-style
    pivot/index workflow runs distributed and matches the SQL result."""
    import pyspark.pandas as ps

    from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata

    ev = read_testdata(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
        )
        .count()
    )
    import pandas as pd

    pdf = daily.pandas_api()  # stays distributed (no toPandas collect)
    wide = pdf.pivot_table(
        index=["day"], columns="event_type", values="count", aggfunc="sum"
    ).sort_index()
    # same numbers as the SQL twin
    expect = {
        (r["day"], r["event_type"]): r["count"] for r in daily.collect()
    }
    got = wide.to_pandas()  # small aggregate — safe to localize, as in ref
    assert len(got) == daily.select("day").distinct().count()
    for day, row in got.iterrows():
        for et, v in row.items():
            if not pd.isna(v):
                assert expect[(day.to_pydatetime(), et)] == int(v)


def test_runtime_bloom_filter_join(spark, sf_dir):
    """Runtime bloom-filter join pruning: with a selective dim filter and
    broadcast disabled, Catalyst injects a bloom filter built from the dim
    side into the fact scan — rows that cannot join are dropped BEFORE the
    shuffle (the row-level sibling of dynamic partition pruning). At 100TB
    this cuts shuffle volume by the dim's selectivity."""
    from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = read_testdata(spark, sf_dir, "lineitem")
        sel = read_testdata(spark, sf_dir, "orders").where(
            F.col("o_totalprice") > 400000
        )
        j = li.join(sel, li.l_orderkey == sel.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower(), "bloom filter not injected"
        # pruning must not change results
        for k, v in confs.items():
            spark.conf.set(k, "false" if k.endswith("enabled") else v)
        plain = li.join(sel, li.l_orderkey == sel.o_orderkey)
        assert j.count() == plain.count()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_word_runs_udtf_reconstructs_sequence(spark, sf_dir):
    """The RLE generator must be lossless: expanding (word, run_len) runs
    in run_idx order reproduces each document's exact token sequence, and
    adjacent runs never share a word (runs are maximal)."""
    from aim357_2019_etl_and_ml_workshop_spark import queries as q

    out = q.queries()["word_runs_udtf"](spark, sf_dir)
    runs = out.orderBy("doc_id", "run_idx").collect()
    by_doc: dict[int, list] = {}
    for r in runs:
        by_doc.setdefault(r.doc_id, []).append(r)
    docs = {
        r.doc_id: r.text
        for r in q.queries()["token_count"](spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 25 == 0)
        .select("doc_id", "text")
        .collect()
    }
    assert set(by_doc) == set(docs)
    for doc_id, doc_runs in by_doc.items():
        assert [r.run_idx for r in doc_runs] == list(range(len(doc_runs)))
        for a, b in zip(doc_runs, doc_runs[1:]):
            assert a.word != b.word, "non-maximal adjacent runs"
        expanded = [w for r in doc_runs for w in [r.word] * r.run_len]
        assert expanded == docs[doc_id].split(" ")


def test_variant_stats_agree_with_string_path(spark, sf_dir):
    """VARIANT typed extraction and get_json_object string extraction must
    agree on the aggregate (same keys, same sums) — two independent parse
    paths over the same props column."""
    from aim357_2019_etl_and_ml_workshop_spark import queries as q

    reg = q.queries()
    v = {
        r.event_type: (r.k_sum, r.n_valid)
        for r in reg["variant_extract_stats"](spark, sf_dir).collect()
    }
    s = {
        r.event_type: r.k_sum
        for r in reg["json_extract_sum"](spark, sf_dir).collect()
    }
    assert set(v) == set(s)
    for et, (k_sum, _n) in v.items():
        assert k_sum == s[et]


def test_compact_parquet_small_files(spark, tmp_path):
    """Compaction reduces file count without changing content, sized by
    total bytes / target."""
    from aim357_2019_etl_and_ml_workshop_spark.sources.io import (
        compact_parquet,
    )

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(src)  # fragment into 40 small files
    n_in, n_out = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n_in >= 40 and n_out == 1
    a = sorted(r.id for r in spark.read.parquet(dst).collect())
    assert a == list(range(10_000))


def test_python_datasource_fakecorpus(spark):
    """Spark 4 Python DataSource API: custom format reads in parallel
    (one task per planned partition) and rows are hashlib-deterministic."""
    import hashlib

    from aim357_2019_etl_and_ml_workshop_spark.sources.pydatasource import (
        _doc_text,
        register_fakecorpus,
    )

    register_fakecorpus(spark)
    df = spark.read.format("fakecorpus").option("rows", 100).option(
        "partitions", 4
    ).load()
    assert df.rdd.getNumPartitions() == 4
    rows = {r.doc_id: r.text for r in df.collect()}
    assert len(rows) == 100
    # reproducible outside Spark: recompute row 7 from hashlib directly
    assert rows[7] == _doc_text(7)
    assert hashlib.md5(b"7").digest()  # sanity: same primitive the source uses


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """DSIR contract (r7): documents made of target-exclusive tokens must
    outscore documents made of raw-only tokens, and the smoothed ratio is
    finite for tokens unseen in the target slice."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from aim357_2019_etl_and_ml_workshop_spark.operators.textanalysis import (
        dsir_importance_weights,
    )

    rows = [
        Row(doc_id=0, lang="en", text="alpha beta alpha beta alpha"),
        Row(doc_id=1, lang="en", text="alpha beta gamma alpha beta"),
        Row(doc_id=2, lang="xx", text="zeta eta zeta eta zeta"),
        Row(doc_id=3, lang="xx", text="zeta eta theta zeta eta"),
        Row(doc_id=4, lang="xx", text="alpha beta alpha beta alpha"),
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["doc_id"]: r["log_ratio"]
        for r in dsir_importance_weights(
            df, "text", "doc_id", target=F.col("lang") == "en"
        ).collect()
    }
    assert len(got) == 5 and all(v is not None for v in got.values())
    # target-token docs beat raw-only docs; identical text gets an
    # identical weight regardless of which slice the doc itself sits in
    assert got[0] > got[2] and got[1] > got[3]
    assert got[4] == got[0]


def test_adaptive_quality_gate_keeps_per_group_quantile(spark):
    """Each group's keep-rate is governed by its OWN p25 — a group whose
    scores all sit below another group's threshold still keeps ~75%."""
    from pyspark.sql import Row

    from aim357_2019_etl_and_ml_workshop_spark.operators.curation import (
        adaptive_quality_gate,
    )

    rows = []
    # lang A: long tokens (score ~8); lang B: short tokens (score ~2)
    for i in range(8):
        rows.append(Row(doc_id=i, lang="A", text=" ".join(["longword"] * (i + 2))))
    for i in range(8):
        rows.append(Row(doc_id=100 + i, lang="B", text=" ".join(["ab"] * (i + 2))))
    out = adaptive_quality_gate(
        spark.createDataFrame(rows), "text", "doc_id", "lang", pct=0.25
    ).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        kept = sum(1 for r in rs if r["kept"])
        # p25 threshold with >= keeps at least 75% of each group
        assert kept >= 6, f"{lang}: kept {kept}/8"
        ths = {r["thresh"] for r in rs}
        assert len(ths) == 1  # one threshold per group
    # the short-token group's threshold is far below the long-token one,
    # yet it still keeps docs — a global cutoff would have dropped all of B
    assert min(r["thresh"] for r in by_lang["B"]) < min(
        r["score"] for r in by_lang["A"]
    )


def test_adaptive_quality_gate_null_group_and_text(spark, tmp_path):
    """Code-review r7: NULL-group docs must get a verdict row (their own
    bucket), and NULL text yields kept=false, not a NULL verdict —
    checked on BOTH engines via the registry oracle."""
    import os

    import duckdb
    from pyspark.sql import Row

    from aim357_2019_etl_and_ml_workshop_spark import queries as Q

    rows = [
        Row(doc_id=0, text="alpha beta gamma delta", lang="en"),
        Row(doc_id=1, text="a b", lang="en"),
        Row(doc_id=2, text="unlabeled doc text here", lang=None),
        Row(doc_id=3, text="xx yy", lang=None),
        Row(doc_id=4, text=None, lang="en"),
    ]
    sf_dir = str(tmp_path / "sf_nullgate")
    os.makedirs(sf_dir)
    spark.createDataFrame(rows, "doc_id bigint, text string, lang string").write.parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    out = {
        r["doc_id"]: r
        for r in Q._REGISTRY["adaptive_quality_gate"](spark, sf_dir).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4}  # nobody vanishes
    assert out[2]["lang"] is None and out[2]["kept"] is not None
    assert out[4]["kept"] is False  # NULL text -> explicit reject
    # oracle agrees row-for-row
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf_dir, 'documents.parquet')}/*.parquet')"
    )
    oracle = sorted(
        map(tuple, con.execute(Q._ORACLE["adaptive_quality_gate"]).fetchall())
    )
    got = sorted(
        (r["doc_id"], r["lang"], r["score"], r["thresh"], r["kept"])
        for r in out.values()
    )
    assert got == oracle


def test_adaptive_quality_gate_validates_pct(spark):
    """ADVICE r07: an out-of-range / NaN pct must fail at the call site
    (ValueError), not as a runtime AnalysisException inside the percentile
    aggregate; in-range boundary values still work."""
    import pytest
    from pyspark.sql import Row

    from aim357_2019_etl_and_ml_workshop_spark.operators.curation import (
        adaptive_quality_gate,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma", lang="en")]
    )
    for bad in (-0.1, 1.5, float("nan")):
        with pytest.raises(ValueError, match="pct"):
            adaptive_quality_gate(docs, pct=bad)
    # boundaries are legal: p0 = min, p1 = max — one doc keeps itself
    for ok in (0.0, 1.0):
        got = adaptive_quality_gate(docs, pct=ok).collect()
        assert len(got) == 1 and got[0]["kept"]


def test_embedding_neardup_empty_vs_null_first_vector(spark):
    """ADVICE r07: a corpus whose FIRST scanned row holds a NULL vector
    must not short-circuit to zero pairs — the dim probe skips nulls —
    and the empty-input frame must carry the caller's id type so empty
    and non-empty results are schema-identical (string ids included)."""
    from pyspark.sql import Row

    from aim357_2019_etl_and_ml_workshop_spark.operators.dedup import (
        embedding_near_duplicates,
    )

    rows = [
        Row(vec_id=1, v=None),
        Row(vec_id=2, v=[1.0, 0.0]),
        Row(vec_id=3, v=[1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, v array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(df, threshold=0.9).collect()
    }
    assert got == {(2, 3)}

    empty = spark.createDataFrame([], "vec_id string, v array<double>")
    out = embedding_near_duplicates(empty, threshold=0.9)
    assert out.collect() == []
    assert out.schema["id_a"].dataType.simpleString() == "string"
    # all-null vectors == genuinely empty: no pairs, same schema rule
    nulls = spark.createDataFrame(
        [Row(vec_id="a", v=None)], "vec_id string, v array<double>"
    )
    assert embedding_near_duplicates(nulls, threshold=0.9).collect() == []


def test_dsir_resample_gumbel_topk_matches_python_reference(spark):
    """DSIR selection (VERDICT r07 #5): the selected set is exactly the
    python re-derivation of Gumbel-top-k over the operator's own weights
    — seeded md5 hash -> u -> -ln(-ln(u)) -> top-k by rounded priority
    with id tie-break — deterministic across calls, and k<1 fails fast."""
    import hashlib
    import math

    import pytest
    from pyspark.sql import Row

    from aim357_2019_etl_and_ml_workshop_spark.operators.textanalysis import (
        dsir_importance_weights,
        dsir_resample,
    )

    rows = [
        Row(doc_id=i, text=t, lang=("en" if i % 2 == 0 else "de"))
        for i, t in enumerate(
            [
                "the quick brown fox jumps over the lazy dog",
                "der schnelle braune fuchs springt",
                "the cat sat on the mat with the dog",
                "ein hund und eine katze",
                "dogs and cats are the best friends",
                "das ist ein ganz anderer text",
                "the dog the cat the fox the mat",
                "noch mehr deutsche worte hier",
            ]
        )
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    target = F.col("lang") == "en"

    def priority(doc_id: int, log_ratio: float) -> float:
        h = int(hashlib.md5(f"dsir-v1{doc_id}".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        return round(log_ratio + (-math.log(-math.log(u))), 6)

    weights = {
        r["doc_id"]: r["log_ratio"]
        for r in dsir_importance_weights(df, "text", "doc_id", target).collect()
    }
    k = 3
    expected = sorted(
        weights, key=lambda d: (-priority(d, weights[d]), d)
    )[:k]
    got = dsir_resample(df, "text", "doc_id", target, k=k)
    sel = {r["doc_id"]: r["priority"] for r in got.collect()}
    assert sorted(sel) == sorted(expected)
    for d in sel:
        assert abs(sel[d] - priority(d, weights[d])) < 1e-9
    # deterministic: second run selects the identical set
    again = {r["doc_id"] for r in dsir_resample(
        df, "text", "doc_id", target, k=k).collect()}
    assert again == set(sel)

    with pytest.raises(ValueError, match="k must be"):
        dsir_resample(df, "text", "doc_id", target, k=0)


def test_remove_repeated_spans_hash_mode_equals_string_mode(spark, sf_dir):
    """The removal half wired through hash_spans=True (VERDICT r07 #2)
    must rewrite every document identically to the string mode on the
    real documents table — positions, counts, and the md5 of each
    rewritten text."""
    from aim357_2019_etl_and_ml_workshop_spark.operators.dedup import (
        remove_repeated_spans,
    )
    from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata

    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    kw = dict(n=5, min_docs=2)
    string_rows = sorted(
        tuple(r)
        for r in remove_repeated_spans(docs, "text", "doc_id", **kw).collect()
    )
    hash_rows = sorted(
        tuple(r)
        for r in remove_repeated_spans(
            docs, "text", "doc_id", hash_spans=True, **kw
        ).collect()
    )
    assert hash_rows == string_rows and len(hash_rows) == docs.count()


def test_dsir_resample_fraction_threshold_semantics(spark, sf_dir):
    """Fraction-shaped DSIR selection: validates fraction, realizes at
    least the requested fraction (ties kept by >=), agrees with a python
    re-derivation of the exact interpolated percentile threshold, and
    the approx=True corpus-scale swap lands within tolerance of the
    exact selection on the same corpus."""
    import numpy as np
    import pytest

    from aim357_2019_etl_and_ml_workshop_spark.operators.textanalysis import (
        dsir_resample_fraction,
    )
    from aim357_2019_etl_and_ml_workshop_spark.sources.io import read_testdata

    docs = read_testdata(spark, sf_dir, "documents")
    target = F.col("lang") == "en"

    for bad in (0.0, -0.2, 1.5):
        with pytest.raises(ValueError, match="fraction"):
            dsir_resample_fraction(docs, "text", "doc_id", target, bad)

    exact = dsir_resample_fraction(
        docs, "text", "doc_id", target, fraction=0.2
    ).collect()
    n_docs = docs.count()
    assert len(exact) >= 0.2 * n_docs  # ties kept
    assert len(exact) <= 0.25 * n_docs  # but not wildly more
    # threshold re-derivation: numpy's linear interpolation == Spark
    # percentile == DuckDB quantile_cont on the same rounded priorities
    pris = np.array([r["priority"] for r in exact])
    thresh = {round(float(r["thresh"]), 6) for r in exact}
    assert len(thresh) == 1 and pris.min() >= next(iter(thresh))

    approx = dsir_resample_fraction(
        docs, "text", "doc_id", target, fraction=0.2, approx=True
    ).collect()
    ex_ids = {r["doc_id"] for r in exact}
    ap_ids = {r["doc_id"] for r in approx}
    overlap = len(ex_ids & ap_ids) / len(ex_ids)
    assert overlap >= 0.9, f"approx selection diverged: {overlap}"


def test_avro_capability_gate(spark, tmp_path):
    """Avro is an external Spark module not deployed here: the entry
    points must fail with the engine's clear capability error (naming the
    module to deploy), never Spark's generic deployment-guide message —
    and must WORK unchanged if the module ever appears (probed via the
    same DataSource lookup the reader/writer performs)."""
    import pytest

    from aim357_2019_etl_and_ml_workshop_spark.sources.io import (
        read_avro,
        write_avro,
    )

    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        deployed = True
    except Exception:
        deployed = False
    df = spark.range(3).selectExpr("id", "cast(id as string) AS s")
    if deployed:
        write_avro(df, str(tmp_path / "a"))
        assert read_avro(spark, str(tmp_path / "a")).count() == 3
    else:
        with pytest.raises(NotImplementedError, match="spark-avro"):
            write_avro(df, str(tmp_path / "a"))
        with pytest.raises(NotImplementedError, match="spark-avro"):
            read_avro(spark, str(tmp_path / "a"))


def test_avro_roundtrip_when_deployed(spark, tmp_path):
    """VERDICT r09 next #8: value-level Avro round-trip coverage that
    ACTIVATES the day the environment gains spark-avro, and reports a
    clean SKIP until then (runtime skip rather than skipif: the probe
    needs the live session's DataSource resolution, which doesn't exist
    at collection time). test_avro_capability_gate pins the error path;
    this pins the data path — schemas, values, append mode."""
    import pytest

    from aim357_2019_etl_and_ml_workshop_spark.sources.io import (
        read_avro,
        write_avro,
    )

    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
    except Exception:
        pytest.skip(
            "spark-avro not deployed in this runtime (io._require_avro "
            "gate covers the error path)"
        )
    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", -0.25, False), (3, None, None, None)],
        "k bigint, s string, x double, f boolean",
    )
    path = str(tmp_path / "avro_rt")
    write_avro(df, path)
    back = read_avro(spark, path)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
    write_avro(df.where("k = 1"), path, mode="append")
    assert read_avro(spark, path).count() == 4
