"""Local stand-in for the driver's t2 correctness gate: run every
queries() entry on Spark AND its oracle_sql() on DuckDB over the same
parquet, then compare row count, column names, and values order-insensitively.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
       python tools/compare_oracle.py [sf_dir] --exclude [query ...]

With ``--exclude`` the named queries are skipped instead of selected —
used by the big-SF soaks to split the registry into the linear-oracle
bulk and the deliberately all-pairs (quadratic ground-truth) oracles,
which get their own budgeted run.

With ``--spark-only`` (may precede a query list) the DuckDB side is
skipped entirely: every query is executed and reported rows-only. Used
to prove the Spark path at SFs where the naive all-pairs oracle is
intractable (its full-oracle proof then runs at a smaller SF).
"""

from __future__ import annotations

import math
import os
import sys
import time
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from aim357_2019_etl_and_ml_workshop_spark.session import get_spark
from aim357_2019_etl_and_ml_workshop_spark.sources.io import TESTDATA_TABLES

import __spark_entry__ as entrymod


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    # value-normalized scalars: integer/float/bool width and numpy-vs-
    # python flavor must not affect the canonical form (Spark and DuckDB
    # legitimately disagree on e.g. int32 vs int64 for the same value)
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        return "NULL" if math.isnan(float(v)) else f"f:{float(v)!r}"
    if isinstance(v, pd.Timestamp):
        return f"ts:{v.isoformat()}"
    return f"{type(v).__name__}:{v}"


def canon_frame(df: pd.DataFrame) -> list[tuple]:
    # column-wise canonicalization (identical per-cell results to the
    # original row-wise loop, ~30x faster — iterrows() built a Series per
    # row, which dominated wall time on 1M-row frames at sf1)
    cols = sorted(df.columns)
    col_vals = [[canon_cell(v) for v in df[c]] for c in cols]
    out = [tuple(t) for t in zip(*col_vals)]
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rest = sys.argv[2:]
    exclude: set[str] = set()
    spark_only = False
    if rest and rest[0] == "--spark-only":
        spark_only, rest = True, rest[1:]
    if rest and rest[0] == "--exclude":
        exclude, rest = set(rest[1:]), []
    only = set(rest)
    spark = get_spark("compare-oracle")
    con = duck_connect(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures, passed, skipped = [], 0, 0
    for name, fn in qs.items():
        if (only and name not in only) or name in exclude:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            continue
        t_spark = time.monotonic() - t0
        if spark_only or name not in oracles:
            print(f"  ~ {name}: rows-only ({len(sdf)} rows) [spark {t_spark:.1f}s]")
            skipped += 1
            continue
        t0 = time.monotonic()
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            continue
        t_duck = time.monotonic() - t0
        if len(sdf) != len(ddf):
            failures.append((name, f"row count {len(sdf)} vs {len(ddf)}"))
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            failures.append(
                (name, f"columns {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
            )
            continue
        # dtype drift is a warning (pandas-level), the driver may normalize
        # differently; values are the hard gate
        for c in sdf.columns:
            a, b = str(sdf[c].dtype), str(ddf[c].dtype)
            if a != b and {a, b} not in ({"int32", "int64"}, {"datetime64[ns]", "datetime64[us]"}):
                print(f"    ! {name}.{c}: dtype {a} vs {b}")
        a, b = canon_frame(sdf), canon_frame(ddf)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ; first diffs: {diff}"))
            continue
        passed += 1
        print(
            f"  ✓ {name} ({len(sdf)} rows)"
            f" [spark {t_spark:.1f}s, duckdb {t_duck:.1f}s]"
        )
    print(f"\n{passed} passed, {len(failures)} failed, {skipped} rows-only")
    for name, msg in failures:
        print(f"  ✗ {name}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
