"""Forecasting surface (SURVEY.md §2.11, M1-M4) — in-process replacement for
the reference's SageMaker DeepAR estimator/endpoint.

Contract parity, not weight parity (SURVEY.md §4.3): same data contracts as
GluePySparkMLFeatureEngineering.rst —
- JSON Lines export ``{"start": "...", "target": [...]}`` (.rst:718-742);
- time-cutoff train/test split, never random (.rst:350-363);
- hyperparameter names ``time_freq/context_length/prediction_length``
  (.rst:808-820);
- quantile predictions (p10/p50/p90) in long format (.rst:1779-1783).

Model: per-series seasonal-naive + empirical residual quantiles, run as one
``applyInPandas`` over series groups — each series fits in one pandas batch
(series are post-aggregation, ~hundreds of points), while the series
DIMENSION scales horizontally across executors: 10M series parallelize as
10M groups, which is exactly how a 100TB training-data pipeline forecasts
per-entity series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cutoff_split(
    df: DataFrame, ts_col: str, cutoff: str
) -> tuple[DataFrame, DataFrame]:
    """M1: train/test by timestamp cutoff (train < cutoff <= test)."""
    ts = F.col(ts_col)
    lim = F.lit(cutoff).cast("timestamp")
    return df.where(ts < lim), df.where(ts >= lim)


def to_deepar_jsonlines(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    cat: bool = False,
) -> DataFrame:
    """S7/F13: one JSON object per series, values ordered by timestamp:
    ``{"start": "<first ts>", "target": [v0, v1, ...]}`` (+``"cat"``),
    byte-format matching series_to_jsonline (.rst:718-733). Ordering comes
    from sort_array over (ts, value) structs — no global sort, one groupBy."""
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(value_col).alias("v")))
    )
    agg = df.groupBy(series_col).agg(pairs.alias("pairs"))
    start = F.date_format(F.col("pairs")[0]["t"], "yyyy-MM-dd HH:mm:ss")
    target = F.transform(F.col("pairs"), lambda p: p["v"].cast("double"))
    fields = [start.alias("start"), target.alias("target")]
    if cat:
        fields.append(F.col(series_col).cast("string").alias("cat"))
    return agg.select(
        F.col(series_col),
        F.to_json(F.struct(*fields)).alias("jsonline"),
    )


class SeasonalQuantileForecaster:
    """M2/M3: quantile forecaster with the reference's hyperparameter
    names (time_freq, context_length, prediction_length; .rst:808-820).

    fit+predict in one distributed pass: ``applyInPandas`` per series —
    seasonal-naive point forecast + empirical residual quantiles, so
    emitted quantiles are monotone by construction (sorted residual
    quantiles added to a common base)."""

    def __init__(
        self,
        time_freq: str = "D",
        context_length: int = 14,
        prediction_length: int = 14,
        season: int = 7,
        quantiles: tuple[float, ...] = (0.1, 0.5, 0.9),
    ) -> None:
        if time_freq != "D":
            raise NotImplementedError("only daily frequency (time_freq='D')")
        self.context_length = context_length
        self.prediction_length = prediction_length
        self.season = season
        self.quantiles = tuple(sorted(quantiles))

    def predict(
        self,
        df: DataFrame,
        series_col: str,
        ts_col: str,
        value_col: str,
    ) -> DataFrame:
        """Long-format forecast: (series, ts, quantile, value) for
        prediction_length steps after each series' last observation."""
        season = self.season
        horizon = self.prediction_length
        context = max(self.context_length, season)
        qs = self.quantiles

        def forecast(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("_ts")
            vals = pdf["_v"].to_numpy(dtype=float)
            last_ts = pdf["_ts"].iloc[-1]
            series = pdf["_series"].iloc[0]
            hist = vals[-max(context, 2 * season):]
            # seasonal-naive residuals over the context window
            if len(hist) > season:
                resid = hist[season:] - hist[:-season]
            else:
                resid = np.zeros(1)
            rq = {q: float(np.quantile(resid, q)) for q in qs}
            pattern = vals[-season:] if len(vals) >= season else vals
            rows = []
            for h in range(1, horizon + 1):
                base = float(pattern[(h - 1) % len(pattern)])
                ts = last_ts + pd.Timedelta(days=h)
                for q in qs:
                    rows.append((series, ts, float(q), base + rq[q]))
            return pd.DataFrame(
                rows, columns=["series", "ts", "quantile", "value"]
            )

        prepared = df.select(
            F.col(series_col).cast("string").alias("_series"),
            F.col(ts_col).alias("_ts"),
            F.col(value_col).cast("double").alias("_v"),
        )
        return prepared.groupBy("_series").applyInPandas(
            forecast, "series string, ts timestamp, quantile double, value double"
        )


class SeasonalMeanQuantileForecaster(SeasonalQuantileForecaster):
    """The quality rung above seasonal-naive (r12, VERDICT r11 #6): same
    contract, hyperparameter names, and applyInPandas shape as
    SeasonalQuantileForecaster, but the point forecast is the SEASONAL
    MEAN (average of the context's same-weekday observations — averaging
    k same-season samples cuts base noise ~sqrt(k) where naive carries
    one sample's noise whole) and the quantile spread comes from POOLED
    residuals of that fit (every context day contributes, 7x the
    residual sample the per-season split would give). Deterministic —
    no RNG, no fitted weights — so the seasonal-naive model stays the
    oracle path while this one is the quality path:
    FORECAST_QUALITY.md backtest mean_wQL 0.0293 vs naive's 0.0375 and
    the reference DeepAR's 0.0362 on its own data (target <= 0.0362 per
    VERDICT r11 #6), better at every quantile, RMSE 33.5 vs 50.0.

    Quantiles stay monotone by construction: one shared base plus
    np.quantile of one residual sample at sorted q."""

    def predict(
        self,
        df: DataFrame,
        series_col: str,
        ts_col: str,
        value_col: str,
    ) -> DataFrame:
        season = self.season
        horizon = self.prediction_length
        context = max(self.context_length, 2 * season)
        qs = self.quantiles

        def forecast(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("_ts")
            vals = pdf["_v"].to_numpy(dtype=float)
            last_ts = pdf["_ts"].iloc[-1]
            series = pdf["_series"].iloc[0]
            n_total = len(vals)
            hist = vals[-context:]
            offset = n_total - len(hist)  # absolute-position alignment
            overall = float(hist.mean())
            by_season: dict[int, list[float]] = {}
            for j, v in enumerate(hist):
                by_season.setdefault((offset + j) % season, []).append(v)
            smean = {
                d: float(np.mean(xs)) for d, xs in by_season.items()
            }
            resid = np.array(
                [
                    v - smean[(offset + j) % season]
                    for j, v in enumerate(hist)
                ]
            )
            rq = {q: float(np.quantile(resid, q)) for q in qs}
            rows = []
            for h in range(1, horizon + 1):
                base = smean.get((n_total + h - 1) % season, overall)
                ts = last_ts + pd.Timedelta(days=h)
                for q in qs:
                    rows.append((series, ts, float(q), base + rq[q]))
            return pd.DataFrame(
                rows, columns=["series", "ts", "quantile", "value"]
            )

        prepared = df.select(
            F.col(series_col).cast("string").alias("_series"),
            F.col(ts_col).alias("_ts"),
            F.col(value_col).cast("double").alias("_v"),
        )
        return prepared.groupBy("_series").applyInPandas(
            forecast,
            "series string, ts timestamp, quantile double, value double",
        )


def evaluate(
    predictions: DataFrame,
    actuals: DataFrame,
    series_col: str = "series",
    ts_col: str = "ts",
    value_col: str = "value",
    actual_col: str = "y",
) -> DataFrame:
    """M-quality metrics matching the reference's evaluation surface
    (test RMSE + wQuantileLoss[q], GluePySparkMLFeatureEngineering.rst:
    1571-1581): join forecasts to actuals on (series, ts) and compute

    - rmse over the median (q=0.5) forecast;
    - weighted quantile loss per q: 2*sum(P_q(y, yhat)) / sum(|y|) with
      P_q = q*(y-yhat) if y >= yhat else (1-q)*(yhat-y).

    Output long format: (metric string, quantile double|null, value double).
    """
    joined = predictions.join(
        actuals.select(
            F.col(series_col).alias("series"),
            F.col(ts_col).alias("ts"),
            F.col(actual_col).cast("double").alias("y"),
        ),
        ["series", "ts"],
    )
    yhat = F.col(value_col)
    q = F.col("quantile")
    pinball = F.when(F.col("y") >= yhat, q * (F.col("y") - yhat)).otherwise(
        (1 - q) * (yhat - F.col("y"))
    )
    wql = joined.groupBy("quantile").agg(
        (2 * F.sum(pinball) / F.sum(F.abs(F.col("y")))).alias("value")
    ).select(
        F.lit("wQuantileLoss").alias("metric"),
        F.col("quantile"),
        F.round("value", 6).alias("value"),
    )
    rmse = (
        joined.where(F.col("quantile") == 0.5)
        .agg(F.sqrt(F.avg(F.pow(F.col("y") - yhat, 2))).alias("value"))
        .select(
            F.lit("rmse").alias("metric"),
            F.lit(None).cast("double").alias("quantile"),
            F.round("value", 6).alias("value"),
        )
    )
    return wql.unionByName(rmse)
