"""Forecast contract tests (SURVEY.md §5.2): JSON Lines byte format, cutoff
split, monotone quantiles, horizon length. Conformance is on the data
contract, not learned weights (SURVEY.md §4.3)."""

import json
from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.forecast import (
    SeasonalQuantileForecaster,
    cutoff_split,
    to_deepar_jsonlines,
)


def _daily(spark, n_days=40):
    rows = [
        Row(
            series="yellow",
            day=datetime(2018, 1, 1 + d) if d < 30 else datetime(2018, 1 + d // 30, 1 + d % 30),
            n=float(100 + (d % 7) * 10),
        )
        for d in range(n_days)
    ]
    return spark.createDataFrame(rows)


def test_deepar_jsonline_format(spark):
    df = spark.createDataFrame(
        [
            Row(series="a", day=datetime(2018, 1, 2), n=2.0),
            Row(series="a", day=datetime(2018, 1, 1), n=1.0),
            Row(series="b", day=datetime(2018, 1, 1), n=5.0),
        ]
    )
    out = {
        r.series: r.jsonline
        for r in to_deepar_jsonlines(df, "series", "day", "n").collect()
    }
    obj = json.loads(out["a"])
    # start = FIRST timestamp even though input rows were unordered
    assert obj == {"start": "2018-01-01 00:00:00", "target": [1.0, 2.0]}
    assert json.loads(out["b"])["target"] == [5.0]


def test_deepar_jsonline_cat_field(spark):
    df = spark.createDataFrame([Row(series="a", day=datetime(2018, 1, 1), n=1.0)])
    out = to_deepar_jsonlines(df, "series", "day", "n", cat=True).first()
    assert json.loads(out.jsonline)["cat"] == "a"


def test_cutoff_split_is_temporal(spark):
    df = _daily(spark)
    train, test = cutoff_split(df, "day", "2018-01-20")
    assert train.agg(F.max("day")).first()[0] < datetime(2018, 1, 20)
    assert test.agg(F.min("day")).first()[0] >= datetime(2018, 1, 20)
    assert train.count() + test.count() == df.count()


def test_forecast_contract(spark):
    df = _daily(spark)
    fc = SeasonalQuantileForecaster(
        time_freq="D", context_length=14, prediction_length=14
    )
    out = fc.predict(df, "series", "day", "n").collect()
    # horizon: 14 steps x 3 quantiles per series
    assert len(out) == 14 * 3
    by_ts = {}
    for r in out:
        by_ts.setdefault(r.ts, {})[r.quantile] = r.value
    for ts, qv in by_ts.items():
        assert qv[0.1] <= qv[0.5] <= qv[0.9], f"non-monotone quantiles at {ts}"
    # forecast starts the day after the last observation
    last_day = max(r.day for r in df.collect())
    assert min(by_ts) > last_day


def test_meanmodel_contract_and_python_reference(spark):
    """r12 quality forecaster (VERDICT r11 #6): same contract as the
    naive model (horizon x quantiles, monotone, starts day after last
    obs), values equal to a pure-Python reference of the seasonal-mean +
    pooled-residual-quantile arithmetic."""
    import numpy as np

    from aim357_2019_etl_and_ml_workshop_spark.forecast import (
        SeasonalMeanQuantileForecaster,
    )

    df = _daily(spark)
    fc = SeasonalMeanQuantileForecaster(
        time_freq="D", context_length=28, prediction_length=14
    )
    out = fc.predict(df, "series", "day", "n").collect()
    assert len(out) == 14 * 3
    by_ts = {}
    for r in out:
        by_ts.setdefault(r.ts, {})[r.quantile] = r.value
    for ts, qv in by_ts.items():
        assert qv[0.1] <= qv[0.5] <= qv[0.9], f"non-monotone at {ts}"
    rows = sorted(df.collect(), key=lambda r: r.day)
    vals = np.array([float(r.n) for r in rows])
    n_total = len(vals)
    hist = vals[-28:]
    offset = n_total - len(hist)
    smean = {}
    for d in range(7):
        xs = [v for j, v in enumerate(hist) if (offset + j) % 7 == d]
        if xs:
            smean[d] = float(np.mean(xs))
    resid = np.array(
        [v - smean[(offset + j) % 7] for j, v in enumerate(hist)]
    )
    rq = {q: float(np.quantile(resid, q)) for q in (0.1, 0.5, 0.9)}
    last_day = max(r.day for r in rows)
    for ts, qv in by_ts.items():
        h = (ts - last_day).days
        base = smean.get((n_total + h - 1) % 7, float(hist.mean()))
        for q in (0.1, 0.5, 0.9):
            assert abs(qv[q] - (base + rq[q])) < 1e-9
