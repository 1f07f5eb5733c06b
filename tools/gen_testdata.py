"""Synthetic testdata generator for bigger-SF scale soaks (VERDICT r02 #1).

Reproduces the driver's TPC-H-ish star schema + events/documents/embeddings
tables (TESTDATA.md) at arbitrary scale factors, matching the sf0.1 files'
schemas (column names, arrow types, naive microsecond timestamps) and value
universes (brands, types, nations, event types, document vocabulary,
cluster-structured unit-norm embeddings) so every registry query stays
non-trivial. Distributions are measured from /root/testdata/sf0.1 —
independent uniform/exponential draws, same categorical sets, same
near-dup/exact-dup document structure.

NOT a byte-for-byte reproduction of the driver's seed-42 stream: the oracle
gate compares Spark vs DuckDB on the SAME files, so only schema and
distribution shape matter, not the exact rows.

Usage: python tools/gen_testdata.py <sf> [outdir]
  e.g. python tools/gen_testdata.py 1 .localdata/sf1

Writes one parquet per table, chunked (512k-row groups) so generation is
O(chunk) memory at any sf and Spark gets row-group scan parallelism.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["small", "large", "red", "blue", "hot", "cold", "new", "old"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]

CHUNK = 512_000

US_PER_DAY = 86_400_000_000


def _ts_us(base: str) -> int:
    return np.datetime64(base, "us").astype(np.int64)


# Cap parquet row groups at 32k rows (~16 MB for the text/vector tables,
# aligned with the local-mode maxPartitionBytes): the generator's 512k-row
# write batches previously left small-but-compute-heavy tables (documents,
# embeddings) as a SINGLE row group, and a one-row-group file scans as ONE
# Spark task no matter the split count — at sf10 every documents scan ran
# single-threaded while 31 cores idled (DuckDB parallelizes inside a row
# group, so only the Spark side was handicapped). A real corpus at scale is
# thousands of files/groups; bounded groups make the local proxy behave
# like that. Values are untouched — generation batching (CHUNK) and seeds
# are unchanged; only the writer's group layout differs.
ROW_GROUP_ROWS = 32_768


def _write(outdir: str, name: str, schema: pa.Schema, batches) -> None:
    path = os.path.join(outdir, f"{name}.parquet")
    with pq.ParquetWriter(path, schema, compression="snappy") as w:
        for cols in batches:
            w.write_table(pa.Table.from_arrays(
                [pa.array(cols[f.name], type=f.type) for f in schema],
                schema=schema,
            ), row_group_size=ROW_GROUP_ROWS)
    meta = pq.ParquetFile(path).metadata
    print(f"  {name}: {meta.num_rows} rows, {meta.num_row_groups} row groups")


def _chunks(n: int):
    for lo in range(0, n, CHUNK):
        yield lo, min(n, lo + CHUNK)


def gen(sf: float, outdir: str, seed: int = 4242) -> None:
    os.makedirs(outdir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_user = max(1, int(15_000 * sf))
    print(f"generating sf={sf} into {outdir}")

    rng = np.random.default_rng(seed)

    _write(outdir, "region", pa.schema(
        [("r_regionkey", pa.int32()), ("r_name", pa.string())]
    ), [{"r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS}])

    _write(outdir, "nation", pa.schema(
        [("n_nationkey", pa.int32()), ("n_name", pa.string()),
         ("n_regionkey", pa.int32())]
    ), [{
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    }])

    cust_schema = pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ])

    def cust_batches():
        for lo, hi in _chunks(n_cust):
            ids = np.arange(lo, hi, dtype=np.int64)
            yield {
                "c_custkey": ids,
                "c_name": [f"Customer#{i:09d}" for i in ids],
                "c_nationkey": rng.integers(0, 25, hi - lo).astype(np.int32),
                "c_acctbal": np.round(
                    rng.uniform(-999.99, 9999.99, hi - lo), 2),
                "c_mktsegment": np.array(SEGMENTS)[
                    rng.integers(0, 5, hi - lo)],
            }

    _write(outdir, "customer", cust_schema, cust_batches())

    supp_schema = pa.schema([
        ("s_suppkey", pa.int64()), ("s_name", pa.string()),
        ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64()),
    ])

    def supp_batches():
        for lo, hi in _chunks(n_supp):
            ids = np.arange(lo, hi, dtype=np.int64)
            yield {
                "s_suppkey": ids,
                "s_name": [f"Supplier#{i:09d}" for i in ids],
                "s_nationkey": rng.integers(0, 25, hi - lo).astype(np.int32),
                "s_acctbal": np.round(
                    rng.uniform(-999.99, 9999.99, hi - lo), 2),
            }

    _write(outdir, "supplier", supp_schema, supp_batches())

    part_schema = pa.schema([
        ("p_partkey", pa.int64()), ("p_name", pa.string()),
        ("p_brand", pa.string()), ("p_type", pa.string()),
        ("p_size", pa.int32()), ("p_retailprice", pa.float64()),
    ])

    def part_batches():
        adj = np.array(ADJS)
        noun = np.array(NOUNS)
        for lo, hi in _chunks(n_part):
            m = hi - lo
            a = adj[rng.integers(0, len(ADJS), m)]
            b = noun[rng.integers(0, len(NOUNS), m)]
            yield {
                "p_partkey": np.arange(lo, hi, dtype=np.int64),
                "p_name": np.char.add(np.char.add(a, " "), b),
                "p_brand": [
                    f"Brand#{i}" for i in rng.integers(1, 26, m)],
                "p_type": np.array(PTYPES)[rng.integers(0, 6, m)],
                "p_size": rng.integers(1, 51, m).astype(np.int32),
                "p_retailprice": np.round(rng.uniform(900.0, 1000.0, m), 1),
            }

    _write(outdir, "part", part_schema, part_batches())

    ord_schema = pa.schema([
        ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
        ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
        ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string()),
    ])
    od_lo, od_hi = _ts_us("1995-01-01"), _ts_us("2001-08-01")

    def ord_batches():
        for lo, hi in _chunks(n_ord):
            m = hi - lo
            # orderdate at day granularity (matches the sf0.1 files)
            days = rng.integers(0, (od_hi - od_lo) // US_PER_DAY + 1, m)
            yield {
                "o_orderkey": np.arange(lo, hi, dtype=np.int64),
                "o_custkey": rng.integers(0, n_cust, m).astype(np.int64),
                "o_orderstatus": np.array(["O", "P", "F"])[
                    rng.integers(0, 3, m)],
                "o_totalprice": np.round(
                    rng.uniform(1000.0, 500000.0, m), 2),
                "o_orderdate": (od_lo + days * US_PER_DAY),
                "o_orderpriority": np.array(PRIOS)[rng.integers(0, 5, m)],
            }

    _write(outdir, "orders", ord_schema, ord_batches())

    li_schema = pa.schema([
        ("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
        ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
        ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
        ("l_discount", pa.float64()), ("l_tax", pa.float64()),
        ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
        ("l_shipdate", pa.timestamp("us")),
    ])
    sd_lo, sd_hi = _ts_us("1995-01-02"), _ts_us("2001-11-04")

    def li_batches():
        for lo, hi in _chunks(n_li):
            m = hi - lo
            days = rng.integers(0, (sd_hi - sd_lo) // US_PER_DAY + 1, m)
            yield {
                "l_orderkey": rng.integers(0, n_ord, m).astype(np.int64),
                "l_partkey": rng.integers(0, n_part, m).astype(np.int64),
                "l_suppkey": rng.integers(0, n_supp, m).astype(np.int64),
                "l_linenumber": rng.integers(1, 8, m).astype(np.int32),
                "l_quantity": rng.integers(1, 51, m).astype(np.float64),
                "l_extendedprice": np.round(
                    rng.uniform(900.0, 105000.0, m), 2),
                "l_discount": np.round(rng.integers(0, 11, m) * 0.01, 2),
                "l_tax": np.round(rng.integers(0, 9, m) * 0.01, 2),
                "l_returnflag": np.array(["A", "N", "R"])[
                    rng.integers(0, 3, m)],
                "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, m)],
                "l_shipdate": (sd_lo + days * US_PER_DAY),
            }

    _write(outdir, "lineitem", li_schema, li_batches())

    ev_schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ])
    ev_lo, ev_hi = _ts_us("2024-01-01"), _ts_us("2024-01-31")
    # event_id is the rank of ts (sf0.1 files are ts-sorted with sequential
    # ids) — generate all timestamps, sort once, then stream chunks.
    all_ts = np.sort(rng.integers(ev_lo, ev_hi, n_ev))

    def ev_batches():
        for lo, hi in _chunks(n_ev):
            m = hi - lo
            yield {
                "event_id": np.arange(lo, hi, dtype=np.int64),
                "ts": all_ts[lo:hi],
                "user_id": rng.integers(0, n_user, m).astype(np.int64),
                "event_type": np.array(ETYPES)[rng.integers(0, 5, m)],
                "value": np.round(rng.exponential(50.0, m), 2),
                "props": [
                    '{"k": %d}' % k for k in rng.integers(0, 100, m)],
            }

    _write(outdir, "events", ev_schema, ev_batches())

    doc_schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64()),
    ])
    vocab = np.array(VOCAB)

    def doc_batches():
        texts_sofar: list[str] = []
        for lo, hi in _chunks(n_doc):
            m = hi - lo
            lens = rng.integers(10, 101, m)
            flat = vocab[rng.integers(0, len(VOCAB), int(lens.sum()))]
            bounds = np.concatenate([[0], np.cumsum(lens)])
            texts = [
                " ".join(flat[bounds[i]:bounds[i + 1]]) for i in range(m)
            ]
            # near-dup structure (feeds minhash/simhash/jaccard queries):
            # ~0.4% of docs are 1-3 word mutations of an earlier doc,
            # ~0.16% are exact copies — the sf0.1 ratio.
            for i in range(m):
                if not texts_sofar and i == 0:
                    texts_sofar.append(texts[0])
                    continue
                r = rng.random()
                if r < 0.0016:
                    texts[i] = texts_sofar[
                        int(rng.integers(0, len(texts_sofar)))]
                elif r < 0.0056:
                    w = texts_sofar[
                        int(rng.integers(0, len(texts_sofar)))].split(" ")
                    for _ in range(int(rng.integers(1, 4))):
                        w[int(rng.integers(0, len(w)))] = "dup"
                    texts[i] = " ".join(w)
                texts_sofar.append(texts[i])
            # bound the mutation-source pool so memory stays O(chunk)
            texts_sofar = texts_sofar[-20_000:]
            yield {
                "doc_id": np.arange(lo, hi, dtype=np.int64),
                "text": texts,
                "lang": np.array(LANGS)[
                    rng.choice(5, m, p=[0.4, 0.15, 0.15, 0.15, 0.15])],
                "source": [f"src{s}" for s in rng.integers(0, 20, m)],
                "n_chars": np.array(
                    [len(t) for t in texts], dtype=np.int64),
            }

    _write(outdir, "documents", doc_schema, doc_batches())

    emb_schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ])
    dim, k = 64, 10
    centers = rng.standard_normal((k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def emb_batches():
        for lo, hi in _chunks(n_emb):
            m = hi - lo
            labels = rng.integers(0, k, m)
            pts = centers[labels] + 0.35 * rng.standard_normal((m, dim))
            pts /= np.linalg.norm(pts, axis=1, keepdims=True)
            yield {
                "vec_id": np.arange(lo, hi, dtype=np.int64),
                "embedding": list(pts.astype(np.float32)),
                "label": labels.astype(np.int32),
            }

    _write(outdir, "embeddings", emb_schema, emb_batches())


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    default_out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", f"sf{sf:g}")
    outdir = sys.argv[2] if len(sys.argv) > 2 else default_out
    gen(sf, outdir)
