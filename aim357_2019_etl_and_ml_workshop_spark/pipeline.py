"""Pipeline runner + threshold alerting (SURVEY.md M5/M6).

Replaces the reference's Step Functions -> Lambda -> SageMaker -> SNS loop
(etl-cfn-2am-trigger.json:86; step_function_workflow_steps.rst:78-101) with
an in-process runner: ordered named stages, per-stage timing, and an alert
hook that fires a callback for values outside [lo, hi] ("send an alert if
value is outside specified range", doc/index.rst:14). Scheduling itself
(the 2am cron) stays external — cron/airflow invoke ``run_pipeline``.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class StageResult:
    name: str
    seconds: float
    rows: int | None = None


@dataclass
class PipelineReport:
    stages: list[StageResult] = field(default_factory=list)
    alerts: list[dict] = field(default_factory=list)

    @property
    def total_seconds(self) -> float:
        return sum(s.seconds for s in self.stages)


def run_pipeline(
    stages: list[tuple[str, Callable[[], DataFrame | None]]],
    count_rows: bool = False,
) -> PipelineReport:
    """Run named stages in order; each returns a DataFrame (materialized
    lazily by its own sink/action) or None."""
    report = PipelineReport()
    for name, fn in stages:
        t0 = time.perf_counter()
        out = fn()
        rows = out.count() if (count_rows and out is not None) else None
        report.stages.append(
            StageResult(name, round(time.perf_counter() - t0, 4), rows)
        )
    return report


def alert_check(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    callback: Callable[[dict], None] | None = None,
    max_alerts: int = 100,
) -> list[dict]:
    """M5: rows whose value falls outside [lo, hi]; fires ``callback`` per
    offending row (the SNS-publish equivalent). The filter runs
    distributed; only the capped offender set reaches the driver."""
    offenders = (
        df.where((F.col(value_col) < lo) | (F.col(value_col) > hi))
        .limit(max_alerts)
        .collect()
    )
    alerts = [r.asDict() for r in offenders]
    if callback:
        for a in alerts:
            callback(a)
    return alerts
