"""PySpark-native analytics engine with the query/data-processing surface of
bsnively/AIM357-2019-ETL-and-ML-Workshop (NYC-taxi ETL + time-series pipeline),
re-expressed Spark-first.

Architecture: the only IR is the Catalyst logical plan. Every operator is a
DataFrame transformation; Catalyst/Tungsten/AQE pick physical strategies.
See SURVEY.md for the operator inventory this package implements.
"""

from .session import get_spark, pin_session_conf

__all__ = ["get_spark", "pin_session_conf"]
