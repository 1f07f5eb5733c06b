"""PySpark-native analytics engine with the query/data-processing surface of
bsnively/AIM357-2019-ETL-and-ML-Workshop (NYC-taxi ETL + time-series pipeline),
re-expressed Spark-first, plus the large-scale training-data-pipeline
operator families (dedup, ANN, curation, text analysis, multimodal).

Architecture: the only IR is the Catalyst logical plan. Every operator is a
DataFrame transformation; Catalyst/Tungsten/AQE pick physical strategies.
See SURVEY.md for the operator inventory this package implements and API.md
for the consumer-facing surface.

Library use (VERDICT r05 #8) — the operator families are importable as
namespaces without reading queries.py:

    from aim357_2019_etl_and_ml_workshop_spark import (
        get_spark, dedup, ann, curate, text, forecast,
    )

    spark = get_spark()
    docs = spark.read.parquet(".../documents.parquet")
    uniq = dedup.canonical_dedup(docs, "text", "doc_id")
    funnel, curated = curate.curate_corpus(uniq)

Every namespace below is a plain module re-export; the full per-function
docs live on the functions themselves.
"""

import sys as _sys

from . import forecast, pipeline, sql_surface
from .operators import (
    analytics,
    bpe,
    curation as curate,
    dedup,
    mlpipeline,
    multimodal,
    similarity as ann,
    temporal_joins,
    textanalysis as text,
    timeseries,
    udtfs,
)

# operators/__init__ re-exports a FUNCTION named `canonicalize` that
# shadows the submodule attribute of the same name — resolve the facade
# name to the MODULE via sys.modules (it is guaranteed loaded: the
# operators package imports from it), so `engine.canonicalize` is the
# documented namespace, not one verb (caught by tests/test_api_facade.py).
canonicalize = _sys.modules[__name__ + ".operators.canonicalize"]
from .session import get_spark, pin_session_conf
from .sources import io, manifest
from .streaming import incremental, stateful, windows as stream_windows

__version__ = "0.9.0"  # bumped per build round

__all__ = [
    # session
    "get_spark",
    "pin_session_conf",
    "__version__",
    # reference-surface namespaces
    "canonicalize",
    "timeseries",
    "forecast",
    "pipeline",
    "sql_surface",
    "io",
    # training-data-pipeline namespaces
    "dedup",
    "ann",
    "curate",
    "text",
    "bpe",
    "mlpipeline",
    "multimodal",
    "analytics",
    "temporal_joins",
    "udtfs",
    # streaming namespaces
    "manifest",
    "incremental",
    "stateful",
    "stream_windows",
]
