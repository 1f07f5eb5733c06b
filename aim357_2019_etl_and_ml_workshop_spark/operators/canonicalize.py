"""Canonicalization operators (SURVEY.md P1-P4, §3.1).

The reference's three Glue ETL jobs (etl/2019reinvent_yellow.py,
2019reinvent_green.py, 2019reinvent_fhv.py) normalize heterogeneous raw CSV
schemas into one canonical table:

    vendorid string, pickup_datetime ts, dropoff_datetime ts,
    pulocationid long, dolocationid long, type string

Here that is a single declarative DataFrame plan — no DynamicFrame IR switch.
Each Glue transform maps to a Catalyst-friendly equivalent:

- ApplyMapping (yellow.py:28)      -> ``apply_mapping`` (select + cast + alias;
  column pruning is explicit AND Catalyst-pushed to the scan)
- ResolveChoice make_struct (yellow.py:33) -> ``try_cast_columns``: tolerant
  cast, bad values -> NULL. The reference's choice-struct is immediately
  flattened to the declared canonical schema anyway
  (GluePySparkMLFeatureEngineering.rst:75-81), so null-on-error casting is
  behaviorally equivalent on the canonical path; divergence documented here.
- DropNullFields (yellow.py:38)    -> ``drop_null_fields``: drop columns that
  are null in ALL rows (one extra agg job; at 100TB gate it behind a flag or
  run it on a sample — it exists for schema-hygiene parity, not correctness).
- withColumn(type, lit) (yellow.py:43) -> ``tag``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Output contract: GluePySparkMLFeatureEngineering.rst:75-81.
CANONICAL_SCHEMA = [
    ("vendorid", "string"),
    ("pickup_datetime", "timestamp"),
    ("dropoff_datetime", "timestamp"),
    ("pulocationid", "bigint"),
    ("dolocationid", "bigint"),
    ("type", "string"),
]

# (source column, canonical column, canonical type) per source kind, mirroring
# the ApplyMapping tuples at yellow.py:28 / green.py:29 / fhv.py:29.
SOURCE_MAPPINGS: dict[str, list[tuple[str, str, str]]] = {
    "yellow": [
        ("vendorid", "vendorid", "string"),  # deliberate long->string cast
        ("tpep_pickup_datetime", "pickup_datetime", "timestamp"),
        ("tpep_dropoff_datetime", "dropoff_datetime", "timestamp"),
        ("pulocationid", "pulocationid", "bigint"),
        ("dolocationid", "dolocationid", "bigint"),
    ],
    "green": [
        ("vendorid", "vendorid", "string"),
        ("lpep_pickup_datetime", "pickup_datetime", "timestamp"),
        ("lpep_dropoff_datetime", "dropoff_datetime", "timestamp"),
        ("pulocationid", "pulocationid", "bigint"),
        ("dolocationid", "dolocationid", "bigint"),
    ],
    "fhv": [
        # fhv has no vendorid; canonicalize() overwrites with lit('fhv')
        # (fhv.py:44-45).
        ("pickup_datetime", "pickup_datetime", "timestamp"),
        ("dropoff_datetime", "dropoff_datetime", "timestamp"),
        ("pulocationid", "pulocationid", "bigint"),
        ("dolocationid", "dolocationid", "bigint"),
    ],
    # 4th schema generation (GluePySparkMLFeatureEngineering.rst:460-469):
    # the reference keeps fhvhv as its OWN table (separate schema, sr_flag
    # mostly null -> DropNullFields candidate) and harmonizes only at the
    # aggregate level (full_fhv = fhv + fhvhv, .rst:632) — reproduced by
    # operators.timeseries.combine_columns_sum.
    "fhvhv": [
        ("hvfhs_license_num", "vendorid", "string"),
        ("pickup_datetime", "pickup_datetime", "timestamp"),
        ("dropoff_datetime", "dropoff_datetime", "timestamp"),
        ("pulocationid", "pulocationid", "bigint"),
        ("dolocationid", "dolocationid", "bigint"),
    ],
}


def apply_mapping(df: DataFrame, mapping: list[tuple[str, str, str]]) -> DataFrame:
    """Project + rename + tolerant cast in one select (P1+P2).

    With ANSI off, ``cast`` nulls unparseable values — Glue ApplyMapping /
    DuckDB TRY_CAST semantics. One select keeps the plan a single Project
    node over the scan, so Catalyst prunes unused source columns at the
    reader (ReadSchema shows only mapped columns)."""
    exprs = [F.col(src).cast(typ).alias(dst) for src, dst, typ in mapping]
    return df.select(*exprs)


def try_cast_columns(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """ResolveChoice-equivalent (P2) as a standalone op: cast named columns
    to declared types, bad values -> NULL, other columns untouched."""
    return df.select(
        *[
            F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c)
            for c in df.columns
        ]
    )


def find_all_null_columns(df: DataFrame) -> list[str]:
    """One aggregation pass: count(col) == 0 -> column is entirely null.
    count() ignores nulls, so this is exactly Glue's DropNullFields scope
    (all-null COLUMNS, not rows). Single job, map-side partial agg."""
    if not df.columns:
        return []
    counts = df.agg(
        *[F.count(F.col(c)).alias(c) for c in df.columns]
    ).first()
    return [c for c in df.columns if counts[c] == 0]


def drop_null_fields(df: DataFrame) -> DataFrame:
    """DropNullFields (P3): drop columns whose values are null in all rows
    (yellow.py:38). Costs one extra pass over the data; at 100TB prefer
    running it on a bounded sample or pre-known schema."""
    null_cols = find_all_null_columns(df)
    return df.drop(*null_cols) if null_cols else df


def tag(df: DataFrame, column: str, value: str) -> DataFrame:
    """Constant-literal provenance column, overwriting if present (P4;
    yellow.py:43, fhv.py:44-45)."""
    return df.withColumn(column, F.lit(value))


def canonicalize(df: DataFrame, source_kind: str, drop_all_null: bool = True) -> DataFrame:
    """Full per-source canonicalize plan (SURVEY.md §3.1 new-engine mapping):
    select/cast/alias -> [drop all-null cols] -> tag type -> canonical order.

    For fhv, ``vendorid`` is the literal 'fhv' (fhv.py:45)."""
    if source_kind not in SOURCE_MAPPINGS:
        raise ValueError(f"unknown source kind {source_kind!r}")
    out = apply_mapping(df, SOURCE_MAPPINGS[source_kind])
    if drop_all_null:
        out = drop_null_fields(out)
    if source_kind == "fhv":
        out = tag(out, "vendorid", "fhv")
    out = tag(out, "type", source_kind)
    # Stable canonical column order; tolerate columns removed by
    # drop_null_fields (they were all-null anyway).
    cols = [c for c, _ in CANONICAL_SCHEMA if c in out.columns]
    return out.select(*cols)


def resolve_choice_struct(df: DataFrame, column: str, cast_type: str = "bigint") -> DataFrame:
    """Faithful ResolveChoice(choice='make_struct') (yellow.py:33): expand an
    ambiguously-typed column into struct<{cast_type}, string> where each
    value lands in exactly ONE branch — the cast branch if it parses, else
    the string branch. The canonical pipeline uses the flat try-cast
    (``apply_mapping``) since the reference immediately flattens to a flat
    schema (GluePySparkMLFeatureEngineering.rst:75-81); this operator exists
    for standalone make_struct parity."""
    casted = F.col(column).cast(cast_type)
    return df.withColumn(
        column,
        F.struct(
            casted.alias(cast_type),
            F.when(casted.isNull(), F.col(column)).alias("string"),
        ),
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Crawler-style profiling (S5 companion): one row of per-table stats —
    row count plus per-column non-null counts and distinct counts. One
    aggregation pass (map-side partials); the schema-hygiene sibling of
    drop_null_fields."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
    return df.agg(*aggs)


def upsert_snapshot(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Latest-wins MERGE/upsert for snapshot tables (the maintenance step
    the reference's nightly append never needed — appends duplicate on
    reprocess; real canonical tables take keyed updates).

    Copy-on-write shape: anti-join current against the update key set, then
    union the updates — the same plan a Delta/Iceberg MERGE lowers to for
    full-snapshot rewrite. The anti-join shuffles on the key (or broadcasts
    when the update batch is small — the common case — left to AQE/auto-
    broadcast); the union is shuffle-free."""
    upd_keys = updates.select(*key_cols).distinct()
    kept = current.join(upd_keys, key_cols, "left_anti")
    return kept.unionByName(updates)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Change-data-capture between two snapshots of the same schema:
    one row per differing key with change_type in
    ('insert', 'delete', 'update'). Unchanged rows are dropped.

    Single full-outer join on the key; change detection compares the
    md5 of the JSON-encoded non-key columns (one hash per side instead of
    N column comparisons — and map/array columns compare correctly).
    Shuffles once on the key; at 100TB bucket both snapshots on the key
    and the join is co-located."""
    non_key = [c for c in old.columns if c not in key_cols]
    def fp(df: DataFrame) -> Column:
        return F.md5(F.to_json(F.struct(*[F.col(c) for c in non_key])))

    o = old.select(*key_cols, fp(old).alias("_old_fp"))
    n = new.select(*key_cols, fp(new).alias("_new_fp"))
    joined = o.join(n, key_cols, "full_outer")
    return joined.select(
        *key_cols,
        F.when(F.col("_old_fp").isNull(), F.lit("insert"))
        .when(F.col("_new_fp").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
    ).where(
        F.col("_old_fp").isNull()
        | F.col("_new_fp").isNull()
        | (F.col("_old_fp") != F.col("_new_fp"))
    )


def quality_expectations(
    df: DataFrame,
    rules: list[dict],
) -> DataFrame:
    """Declarative data-quality checks (the Deequ/expectations pattern) in
    ONE aggregation pass: every rule lowers to a conditional aggregate over
    the same scan, so N checks cost one job, not N.

    Each rule is a dict with ``name`` plus one of:
      - ``{"not_null": col}``            -> null fraction must be 0
      - ``{"unique": col}``              -> no duplicate values
      - ``{"min": col, "value": v}``     -> min(col) >= v
      - ``{"max": col, "value": v}``     -> max(col) <= v
      - ``{"in_set": col, "values": [..]}`` -> all values in the set

    Output: (check string, metric double, passed boolean) — one row per
    rule, emitted via a single stack() over the aggregated scalars."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    metric_expr: dict[str, tuple[str, str]] = {}
    for i, r in enumerate(rules):
        a = f"_m{i}"
        if "not_null" in r:
            aggs.append(
                F.sum(F.col(r["not_null"]).isNull().cast("long")).alias(a)
            )
            metric_expr[r["name"]] = (a, f"{a} = 0")
        elif "unique" in r:
            c = r["unique"]
            aggs.append(
                (F.count(c) - F.countDistinct(c)).cast("long").alias(a)
            )
            metric_expr[r["name"]] = (a, f"{a} = 0")
        elif "min" in r:
            aggs.append(F.min(r["min"]).cast("double").alias(a))
            metric_expr[r["name"]] = (a, f"{a} >= {float(r['value'])}")
        elif "max" in r:
            aggs.append(F.max(r["max"]).cast("double").alias(a))
            metric_expr[r["name"]] = (a, f"{a} <= {float(r['value'])}")
        elif "in_set" in r:
            c = r["in_set"]
            vals = ", ".join(f"'{v}'" for v in r["values"])
            aggs.append(
                F.sum((~F.col(c).isin(r["values"])).cast("long")).alias(a)
            )
            metric_expr[r["name"]] = (a, f"{a} = 0")
        else:
            raise ValueError(f"unknown rule shape: {r}")
    agg = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', CAST({a} AS DOUBLE), {cond}"
        for name, (a, cond) in metric_expr.items()
    )
    return agg.selectExpr(
        f"stack({len(metric_expr)}, {stack_args}) AS (check, metric, passed)"
    )
