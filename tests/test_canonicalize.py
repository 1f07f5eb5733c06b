"""Canonicalize operator semantics (SURVEY.md P1-P4) on taxi-shaped fixtures
(FIXTURES.md §A): tolerant casts, all-null column drop, provenance tags,
including the reference's deliberate quirks (vendorid long->string; fhv
vendorid overwritten with lit('fhv'), fhv.py:44-45)."""

import pytest
from pyspark.sql import Row

from aim357_2019_etl_and_ml_workshop_spark.operators.canonicalize import (
    CANONICAL_SCHEMA,
    canonicalize,
    drop_null_fields,
    find_all_null_columns,
    try_cast_columns,
)


@pytest.fixture(scope="module")
def yellow_raw(spark):
    rows = [
        Row(
            vendorid="1",
            tpep_pickup_datetime="2018-03-01 08:15:00",
            tpep_dropoff_datetime="2018-03-01 08:40:00",
            pulocationid="41",
            dolocationid="24",
            fare_amount="12.5",
            congestion_surcharge=None,
        ),
        Row(
            vendorid="2",
            tpep_pickup_datetime="2088-01-24 00:25:00",  # future-dated anomaly
            tpep_dropoff_datetime="2088-01-24 00:28:00",
            pulocationid="151",
            dolocationid="151",
            fare_amount="5.0",
            congestion_surcharge=None,
        ),
        Row(
            vendorid="1",
            tpep_pickup_datetime="not-a-timestamp",  # unparseable -> NULL
            tpep_dropoff_datetime="2018-03-02 10:00:00",
            pulocationid="7",
            dolocationid="x9",  # unparseable long -> NULL
            fare_amount="3.0",
            congestion_surcharge=None,
        ),
    ]
    return spark.createDataFrame(
        rows,
        "vendorid string, tpep_pickup_datetime string, "
        "tpep_dropoff_datetime string, pulocationid string, "
        "dolocationid string, fare_amount string, congestion_surcharge string",
    )


def test_yellow_canonical_schema_and_casts(yellow_raw):
    out = canonicalize(yellow_raw, "yellow", drop_all_null=False)
    assert [(f.name, f.dataType.simpleString()) for f in out.schema.fields] == [
        (c, t) for c, t in CANONICAL_SCHEMA
    ]
    rows = out.orderBy("pulocationid").collect()
    # tolerant casts: bad ts and bad long -> NULL, good rows typed
    by_pu = {r.pulocationid: r for r in rows}
    assert by_pu[41].vendorid == "1"  # long -> string cast (yellow.py:28)
    assert by_pu[41].pickup_datetime.year == 2018
    assert by_pu[7].pickup_datetime is None
    assert by_pu[7].dolocationid is None
    assert all(r.type == "yellow" for r in rows)


def test_fhv_vendorid_overwrite(spark):
    raw = spark.createDataFrame(
        [
            Row(
                pickup_datetime="2019-02-01 00:00:00",
                dropoff_datetime="2019-02-01 00:30:00",
                pulocationid="1",
                dolocationid="2",
            )
        ]
    )
    out = canonicalize(raw, "fhv", drop_all_null=False).collect()
    assert out[0].vendorid == "fhv"
    assert out[0].type == "fhv"


def test_green_renames_lpep(spark):
    raw = spark.createDataFrame(
        [
            Row(
                vendorid="2",
                lpep_pickup_datetime="2018-06-05 12:00:00",
                lpep_dropoff_datetime="2018-06-05 12:20:00",
                pulocationid="10",
                dolocationid="20",
            )
        ]
    )
    out = canonicalize(raw, "green", drop_all_null=False)
    assert "pickup_datetime" in out.columns
    assert out.first().type == "green"


def test_drop_null_fields_scope(spark):
    """DropNullFields drops all-null COLUMNS, never rows (yellow.py:38)."""
    df = spark.createDataFrame(
        [Row(a=1, b=None, c="x"), Row(a=2, b=None, c=None)],
        "a int, b string, c string",
    )
    assert find_all_null_columns(df) == ["b"]
    out = drop_null_fields(df)
    assert out.columns == ["a", "c"]
    assert out.count() == 2  # partially-null column c survives


def test_try_cast_columns_null_on_error(spark):
    df = spark.createDataFrame([Row(v="12"), Row(v="nope")])
    out = try_cast_columns(df, {"v": "bigint"}).collect()
    assert [r.v for r in out] == [12, None]


def test_fhvhv_generation_and_aggregate_harmonization(spark):
    """4th schema generation: fhvhv keeps its own schema (sr_flag all-null
    dropped), vendorid from hvfhs_license_num; harmonization happens at the
    AGGREGATE level (full_fhv = fhv + fhvhv,
    GluePySparkMLFeatureEngineering.rst:460-469,632)."""
    from aim357_2019_etl_and_ml_workshop_spark.operators.timeseries import (
        combine_columns_sum,
    )

    raw = spark.createDataFrame(
        [
            Row(
                hvfhs_license_num="HV0003",
                dispatching_base_num="B02867",
                pickup_datetime="2019-02-01 10:00:00",
                dropoff_datetime="2019-02-01 10:20:00",
                pulocationid="5",
                dolocationid="6",
                sr_flag=None,
            )
        ],
        "hvfhs_license_num string, dispatching_base_num string, "
        "pickup_datetime string, dropoff_datetime string, "
        "pulocationid string, dolocationid string, sr_flag string",
    )
    out = canonicalize(raw, "fhvhv").collect()
    assert out[0].vendorid == "HV0003"
    assert out[0].type == "fhvhv"
    # aggregate-level harmonization
    daily = spark.createDataFrame(
        [Row(day=1, fhv=10, fhvhv=32), Row(day=2, fhv=7, fhvhv=None)]
    )
    full = {r.day: r.full_fhv for r in combine_columns_sum(
        daily, "full_fhv", ["fhv", "fhvhv"]).collect()}
    assert full == {1: 42, 2: 7}


def test_snapshot_diff_change_types(spark):
    from pyspark.sql import Row

    from aim357_2019_etl_and_ml_workshop_spark.operators.canonicalize import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    new = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="B"), Row(k=4, v="d")]
    )
    got = {
        r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {2: "update", 3: "delete", 4: "insert"}  # k=1 unchanged


def test_quality_expectations_failures_flagged(spark):
    from pyspark.sql import Row

    from aim357_2019_etl_and_ml_workshop_spark.operators.canonicalize import (
        quality_expectations,
    )

    df = spark.createDataFrame(
        [Row(k=1, v=5.0, s="ok"), Row(k=1, v=-1.0, s="bad"), Row(k=None, v=2.0, s="ok")]
    )
    out = {
        r.check: (r.metric, r.passed)
        for r in quality_expectations(
            df,
            [
                {"name": "k_not_null", "not_null": "k"},
                {"name": "k_unique", "unique": "k"},
                {"name": "v_min", "min": "v", "value": 0},
                {"name": "s_in_set", "in_set": "s", "values": ["ok"]},
            ],
        ).collect()
    }
    assert out["k_not_null"] == (1.0, False)   # one null key
    assert out["k_unique"] == (1.0, False)     # k=1 duplicated
    assert out["v_min"] == (-1.0, False)       # negative value
    assert out["s_in_set"] == (1.0, False)     # one 'bad'
