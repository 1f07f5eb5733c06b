"""Learned byte-pair-encoding tokenizer (r12 — VERDICT r11 task #1).

The engine's token accounting was regex-class segmentation
(``textanalysis.bpe_token_count`` — honest "BPE-ish"); a real training
pipeline budgets packing/sharding in LEARNED tokenizer tokens. This
module trains an actual BPE merge table from the corpus and encodes
documents with it, with every stage deterministic and SQL-replayable so
a DuckDB oracle can re-derive the merge table itself AND the per-doc
token counts (the portable-twin pattern of minhash_portable_signatures,
SURVEY §2.13).

Algorithm (classic Sennrich-style BPE over word types, made
engine-portable):

1. **Pre-tokenize** text into words with ``WORD_PATTERN`` (lowercased
   letter runs / digit runs / non-alnum runs — the same segmentation
   classes as ``bpe_token_count``, minus the leading-space variant so
   symbols never contain the ``' '`` separator).
2. **Word-type counts** — the only distributed-heavy stage: ONE
   shuffle (groupBy word). At scale the vocabulary is capped
   deterministically (ORDER BY count DESC, word LIMIT max_word_types —
   ties lexical), so the driver-side state is bounded; word-type counts
   grow sublinearly (Heaps' law), and SentencePiece-class trainers cap
   candidates the same way.
3. **Merge loop (driver-side, pure arithmetic)**: per iteration, count
   adjacent symbol pairs weighted by word frequency (overlapping
   adjacencies each count, the classic convention), pick the
   highest-count pair with ties broken by (left, right) code-point
   order, merge it greedily left-to-right in every word state. Every
   pick is replayable in SQL: pair counts are GROUP BY sums, the pick
   is ORDER BY count DESC, a, b LIMIT 1, and greedy left-to-right merge
   application is a string fold (see ``_apply_merge``) DuckDB expresses
   with ``list_reduce``.
4. **Encode** applies the merges in rank order, each greedy
   left-to-right — the IDENTICAL process the trainer runs, so a word
   seen in training encodes to exactly its final training state. (GPT-2
   style min-rank-iterate encoding can diverge from the training
   states; this sequential-in-rank semantics makes train/encode
   agreement hold BY CONSTRUCTION, which is what lets the oracle encode
   via a join against the replayed final word states.)

Scale shape of encode: explode words -> encode only DISTINCT words in
an Arrow pandas_udf (Python cost is per word TYPE, not per token) ->
equi-join counts back -> per-doc sum. No driver materialization; the
merge list rides the UDF closure (it is n_merges rows).

Reference parity: replaces the reference's regex-approximate token
accounting for packing budgets (VERDICT r11 #1); the reference repo has
no tokenizer of its own (its notebooks count rows, not tokens).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..sources.io import local_df

# Lowercased letter/digit/other runs; whitespace excluded so the ' '
# symbol separator can never appear inside a symbol. Kept to constructs
# Java regex, RE2 (DuckDB) and Python `re` interpret identically.
WORD_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"

MERGE_SCHEMA = (
    "merge_rank int, l_sym string, r_sym string, merged string, "
    "pair_count bigint"
)


def _apply_merge(syms: list[str], a: str, b: str, ab: str) -> list[str]:
    """Greedy left-to-right merge of adjacent (a, b) -> ab: a left fold
    where the merged token becomes the new left context (so 'a a a a'
    under (a,a) gives [aa, aa], never the overlap [aa, a, a]). DuckDB
    replays it as list_reduce over ' '-joined states; the Spark engine
    never needs the fold (training is driver-side, encode is this same
    Python in an Arrow UDF)."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = ab
        else:
            out.append(x)
    return out


def train_bpe_merges_py(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Pure-Python deterministic BPE trainer over (word, freq) types.
    Returns [(rank, left, right, merged, pair_count)]; stops early when
    no adjacent pair remains. Pair counts include overlapping
    adjacencies; ties break by (left, right) code-point order — both
    conventions mirrored exactly in the SQL replay."""
    states: dict[str, list[str]] = {w: list(w) for w, _ in word_counts}
    freq = dict(word_counts)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in states.items():
            f = freq[w]
            for j in range(len(syms) - 1):
                pair = (syms[j], syms[j + 1])
                pc[pair] = pc.get(pair, 0) + f
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        ab = a + b
        merges.append((rank, a, b, ab, c))
        for w in states:
            states[w] = _apply_merge(states[w], a, b, ab)
    return merges


def train_bpe_merges_incremental(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Output-identical fast twin of :func:`train_bpe_merges_py` (the
    naive recount-everything trainer stays as the pytest reference).

    The naive loop recounts every adjacent pair of every word type at
    every rank — O(n_merges x vocabulary x word length) pure-Python
    bytecode, which was the ~20 s FIXED driver cost of every BPE query
    at sf1+ (SOAK r12: bpe_encode_tokens 23.2 s at sf1, dominated by
    training, not encode). This trainer maintains the pair-count table
    and a pair -> {words with that adjacency} inverted index
    incrementally: after picking a merge, only the words that actually
    contain the merged pair are re-segmented and their old/new
    adjacencies subtracted/added. The invariant (pc == full recount,
    zero entries deleted) makes every rank's pick — same
    (-count, (left, right)) min — bit-identical to the naive trainer's,
    including the early stop on an empty table."""
    states: dict[str, list[str]] = {w: list(w) for w, _ in word_counts}
    freq = dict(word_counts)
    pc: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[str]] = {}
    for w, syms in states.items():
        f = freq[w]
        for j in range(len(syms) - 1):
            p = (syms[j], syms[j + 1])
            pc[p] = pc.get(p, 0) + f
            index.setdefault(p, set()).add(w)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        ab = a + b
        merges.append((rank, a, b, ab, c))
        for w in list(index.get((a, b), ())):
            old = states[w]
            new = _apply_merge(old, a, b, ab)
            f = freq[w]
            for j in range(len(old) - 1):
                p = (old[j], old[j + 1])
                n = pc[p] - f
                if n:
                    pc[p] = n
                else:
                    del pc[p]
            for j in range(len(new) - 1):
                p = (new[j], new[j + 1])
                pc[p] = pc.get(p, 0) + f
            old_pairs = {(old[j], old[j + 1]) for j in range(len(old) - 1)}
            new_pairs = {(new[j], new[j + 1]) for j in range(len(new) - 1)}
            for p in old_pairs - new_pairs:
                s = index.get(p)
                if s is not None:
                    s.discard(w)
            for p in new_pairs - old_pairs:
                index.setdefault(p, set()).add(w)
            states[w] = new
    return merges


def word_type_counts(
    df: DataFrame, text_col: str = "text", max_word_types: int | None = None
) -> DataFrame:
    """Distributed word-type frequency table — the heavy stage of BPE
    training (one shuffle on word; partial aggregation map-side). The
    optional cap is the 100 TB contract: ORDER BY (count DESC, word)
    LIMIT k is deterministic, so a capped vocabulary is still
    engine-portable."""
    wc = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    if max_word_types is not None:
        wc = wc.orderBy(F.col("cnt").desc(), F.col("w")).limit(max_word_types)
    return wc


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 16,
    max_word_types: int | None = None,
) -> list[tuple[int, str, str, str, int]]:
    """Learn a BPE merge table from the corpus: distributed word-type
    counts, then the deterministic driver-side merge loop (pure
    aggregation arithmetic over the bounded type table — NOT the
    corpus; always pass ``max_word_types`` at scale)."""
    rows = word_type_counts(df, text_col, max_word_types).collect()
    # incremental trainer: output-identical to train_bpe_merges_py
    # (pytest-pinned on the full sf0.01 corpus), ~10x less driver CPU
    return train_bpe_merges_incremental(
        [(r["w"], r["cnt"]) for r in rows], n_merges
    )


def merge_table_df(
    spark: SparkSession, merges: list[tuple[int, str, str, str, int]]
) -> DataFrame:
    return local_df(spark, merges, MERGE_SCHEMA)


def bpe_encode_counts(
    df: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document learned-BPE token counts under a pinned merge table:
    (id, n_bpe). Encode work is proportional to DISTINCT words (encoded
    once each in an Arrow UDF, merge list in the closure), then an
    equi-join attaches counts and a groupBy sums per doc — docs with no
    words keep n_bpe = 0 via explode_outer + coalesce."""
    from ..sources.io import spread_for_cpu

    merge_list = [(a, b, ab) for _, a, b, ab, _ in merges]

    @pandas_udf("bigint")
    def ntok_of(words: pd.Series) -> pd.Series:
        def enc(w: str) -> int:
            syms = list(w)
            for a, b, ab in merge_list:
                # a state's symbols concatenate to w, so an (a, b)
                # adjacency implies ab is a substring of w — C-level
                # skip for the (common) merges a word can't contain
                if ab in w:
                    syms = _apply_merge(syms, a, b, ab)
            return len(syms)

        return words.map(enc)

    # corpus entry point spread to core count (no-op once the scan has
    # enough splits — exploded_shingles' posture): the regex word explode
    # and the count-attach join probe otherwise run on the documents
    # file's 1-2 row-group splits (r12 interleaved A/B at sf1:
    # 2.50 -> 1.90 s); doc-sized rows move, not exploded words
    words = spread_for_cpu(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode_outer(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
            )
        ).alias("w"),
    )
    wtok = (
        words.where(F.col("w").isNotNull())
        .select("w")
        .distinct()
        .select("w", ntok_of(F.col("w")).alias("ntok"))
    )
    return (
        words.join(wtok, "w", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("ntok"), F.lit(0)).cast("bigint").alias("n_bpe")
        )
    )


def bpe_encode_tokens(
    df: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document learned-BPE TOKEN STREAMS under a pinned merge table:
    (id, tokens array<string>) in document word order — the training-
    export companion to bpe_encode_counts (counts budget the packing;
    streams are what a tokenizing exporter actually writes). Same scale
    shape: distinct words encode once in an Arrow UDF, an equi-join
    attaches the per-word token arrays, and an order-preserving
    collect_list(struct(wpos, ...)) + sort + flatten rebuilds each doc's
    stream (no window, one shuffle on the id). Docs with no words get
    an empty array."""
    from ..sources.io import spread_for_cpu

    merge_list = [(a, b, ab) for _, a, b, ab, _ in merges]

    @pandas_udf("array<string>")
    def toks_of(words: pd.Series) -> pd.Series:
        def enc(w: str) -> list[str]:
            syms = list(w)
            for a, b, ab in merge_list:
                # substring pre-check: no (a, b) adjacency is possible
                # unless ab is a substring of w (see ntok_of)
                if ab in w:
                    syms = _apply_merge(syms, a, b, ab)
            return syms

        return words.map(enc)

    # spread before the explode — same rationale as bpe_encode_counts
    # (r12 interleaved A/B at sf1: 3.42 -> 2.20 s)
    words = spread_for_cpu(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.posexplode_outer(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
            )
        ).alias("wpos", "w"),
    )
    wtok = (
        words.where(F.col("w").isNotNull())
        .select("w")
        .distinct()
        .select("w", toks_of(F.col("w")).alias("wtoks"))
    )
    joined = words.join(wtok, "w", "left").select(
        id_col,
        "wpos",
        F.coalesce(F.col("wtoks"), F.array().cast("array<string>")).alias(
            "wtoks"
        ),
    )
    ordered = F.transform(
        F.sort_array(
            F.collect_list(F.struct(F.col("wpos"), F.col("wtoks")))
        ),
        lambda s: s["wtoks"],
    )
    return joined.groupBy(id_col).agg(F.flatten(ordered).alias("tokens"))


def encode_word_py(
    word: str, merges: list[tuple[int, str, str, str, int]]
) -> list[str]:
    """Pure-Python single-word encode (test reference / driver-side
    probes): apply merges sequentially in rank order, each greedy
    left-to-right — identical to the trainer's state updates."""
    syms = list(word)
    for _, a, b, ab, _ in merges:
        syms = _apply_merge(syms, a, b, ab)
    return syms


# --- DuckDB oracle SQL generators -------------------------------------
# The oracle replays the ENTIRE training loop: word counts, per-step
# pair counts, the (count DESC, a, b) pick, and greedy merge application
# as a list_reduce string fold. One CTE pair per merge step, generated
# programmatically (the merge count is a query parameter, so the SQL is
# data-independent). Precondition: the corpus admits >= n_merges merges
# (a step with no pairs left would empty the state CTE); the trainer
# stops early instead, so callers pin n_merges well under the corpus's
# merge capacity (sf0.01 documents: 31 word types, ~130 capacity,
# queries pin 16).

def _merge_step_sql(i: int) -> str:
    # every multiply-referenced CTE is MATERIALIZED: w{i} feeds both
    # p{i+1} and w{i+1}, so default inlining would expand the chain
    # exponentially (2^n scans of the corpus)
    m = f"m{i}"
    return f"""
    p{i} AS MATERIALIZED (
        SELECT sym[j] AS a, sym[j + 1] AS b, sum(cnt) AS c
        FROM (SELECT unnest(generate_series(1, len(sym) - 1)) AS j, sym, cnt
              FROM (SELECT string_split(s, ' ') AS sym, cnt FROM w{i - 1}))
        GROUP BY 1, 2
    ), {m} AS MATERIALIZED (
        SELECT {i} AS merge_rank, a, b, a || b AS ab, CAST(c AS BIGINT) AS c
        FROM p{i} ORDER BY c DESC, a, b LIMIT 1
    ), w{i} AS MATERIALIZED (
        SELECT word,
               list_reduce(list_prepend('', string_split(s, ' ')),
                 (acc, x) -> CASE
                   WHEN x = {m}.b
                        AND (acc = {m}.a OR ends_with(acc, ' ' || {m}.a))
                   THEN substr(acc, 1, len(acc) - len({m}.a)) || {m}.ab
                   WHEN acc = '' THEN x
                   ELSE acc || ' ' || x END) AS s,
               cnt
        FROM w{i - 1}, {m}
    )"""


def bpe_base_ctes(
    n_merges: int,
    table: str = "documents",
    max_word_types: int | None = None,
) -> str:
    steps = ",".join(_merge_step_sql(i) for i in range(1, n_merges + 1))
    cap = (
        f"ORDER BY cnt DESC, word LIMIT {max_word_types}"
        if max_word_types is not None
        else ""
    )
    return f"""
    wt AS MATERIALIZED (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(regexp_extract_all(lower(text),
                  '{WORD_PATTERN}')) AS w
              FROM {table})
        GROUP BY 1
        {cap}
    ), w0 AS MATERIALIZED (
        SELECT word, array_to_string(regexp_split_to_array(word, ''), ' ') AS s,
               cnt
        FROM wt
    ),{steps}"""


def bpe_train_oracle_sql(
    n_merges: int, max_word_types: int | None = None
) -> str:
    union = "\n        UNION ALL ".join(
        f"SELECT merge_rank, a, b, ab, c FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""
    WITH {bpe_base_ctes(n_merges, max_word_types=max_word_types)}
    SELECT CAST(merge_rank AS INTEGER) AS merge_rank, a AS l_sym, b AS r_sym,
           ab AS merged, c AS pair_count
    FROM ({union})
    """


def bpe_tokens_oracle_sql(n_merges: int) -> str:
    """Token-STREAM oracle: encode every doc by joining its ordered
    words to the replayed final states and flattening, emitted as a
    ' '-joined string (a plain string column hashes identically across
    engines; nested arrays would ride each engine's repr)."""
    return f"""
    WITH {bpe_base_ctes(n_merges)},
    docw AS (
        SELECT doc_id, arr[i] AS w, i AS wpos
        FROM (SELECT doc_id, regexp_extract_all(lower(text),
                  '{WORD_PATTERN}') AS arr
              FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) s
    ), enc AS (
        SELECT d.doc_id,
               flatten(list(string_split(wn.s, ' ') ORDER BY d.wpos))
                   AS toks
        FROM docw d JOIN w{n_merges} wn ON wn.word = d.w
        GROUP BY d.doc_id
    )
    SELECT doc_id,
           coalesce(array_to_string(enc.toks, ' '), '') AS token_stream,
           CAST(coalesce(len(enc.toks), 0) AS BIGINT) AS n_tokens
    FROM documents LEFT JOIN enc USING (doc_id)
    """


def bpe_encode_oracle_sql(n_merges: int) -> str:
    return f"""
    WITH {bpe_base_ctes(n_merges)},
    docw AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text),
                   '{WORD_PATTERN}')) AS w
        FROM documents
    ), enc AS (
        SELECT d.doc_id, CAST(len(string_split(wn.s, ' ')) AS BIGINT) AS ntok
        FROM docw d JOIN w{n_merges} wn ON wn.word = d.w
    )
    SELECT doc_id, CAST(coalesce(sum(enc.ntok), 0) AS BIGINT) AS n_bpe
    FROM documents LEFT JOIN enc USING (doc_id)
    GROUP BY doc_id
    """
