"""Learned-BPE tokenizer tests (r12 — VERDICT r11 #1): merge-application
semantics, trainer determinism vs a pure-Python reference on the FULL
sf0.01 corpus, encode/train agreement by construction, the word-type
cap, early stop, and the pack_sequences(n_tok_col=) wiring."""

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.operators.bpe import (
    WORD_PATTERN,
    _apply_merge,
    bpe_encode_counts,
    encode_word_py,
    train_bpe_merges,
    train_bpe_merges_py,
    word_type_counts,
)

SF001 = "/root/testdata/sf0.01"


def _read_docs_pandas(sf: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])


def _py_word_counts(texts) -> list:
    pat = re.compile(WORD_PATTERN)
    counts: dict = {}
    for t in texts:
        for w in pat.findall(t.lower()):
            counts[w] = counts.get(w, 0) + 1
    return list(counts.items())


def test_apply_merge_is_greedy_left_to_right():
    # the merged token becomes the new left context: overlaps collapse
    # pairwise, never chain
    assert _apply_merge(list("aaaa"), "a", "a", "aa") == ["aa", "aa"]
    assert _apply_merge(list("aaa"), "a", "a", "aa") == ["aa", "a"]
    # a merge output does NOT immediately re-merge with the next symbol
    assert _apply_merge(["a", "b", "b"], "a", "b", "ab") == ["ab", "b"]
    # but a previously-merged token can be the left side of a later merge
    assert _apply_merge(["ab", "b"], "ab", "b", "abb") == ["abb"]
    assert _apply_merge([], "a", "b", "ab") == []
    assert _apply_merge(["x"], "a", "b", "ab") == ["x"]


def test_trainer_tiebreak_and_counts():
    # 'abab': pairs (a,b)x2 overlapping-counted, (b,a)x1 -> pick (a,b)
    merges = train_bpe_merges_py([("abab", 1)], 1)
    assert merges == [(1, "a", "b", "ab", 2)]
    # exact tie on count -> lexical (left, right)
    merges = train_bpe_merges_py([("ba", 1), ("ab", 1)], 1)
    assert merges[0][1:4] == ("a", "b", "ab")


def test_trainer_early_stop():
    # 'ab' admits exactly one merge; asking for 10 stops at capacity
    merges = train_bpe_merges_py([("ab", 5)], 10)
    assert len(merges) == 1
    # fully-merged single symbols admit none
    assert train_bpe_merges_py([("a", 3)], 4) == []


def test_train_matches_python_reference_full_sf001(spark):
    """The distributed trainer (Spark word counts + driver merge loop)
    must equal the pure-Python reference run over independently-derived
    word counts — on the FULL sf0.01 corpus (the VERDICT r11 #1 'done'
    bar)."""
    pdf = _read_docs_pandas(SF001)
    want = train_bpe_merges_py(_py_word_counts(pdf["text"]), 32)
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    got = train_bpe_merges(docs, "text", n_merges=32)
    assert got == want
    assert len(got) == 32
    # ranks contiguous, counts positive and non-increasing is NOT
    # required by BPE (later merges can beat earlier residual counts),
    # but ranks and arithmetic must be self-consistent
    assert [m[0] for m in got] == list(range(1, 33))
    assert all(m[3] == m[1] + m[2] for m in got)


def test_encode_counts_match_python_reference_full_sf001(spark):
    pdf = _read_docs_pandas(SF001)
    merges = train_bpe_merges_py(_py_word_counts(pdf["text"]), 16)
    pat = re.compile(WORD_PATTERN)
    want = {
        int(r.doc_id): sum(
            len(encode_word_py(w, merges)) for w in pat.findall(r.text.lower())
        )
        for r in pdf.itertuples()
    }
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    got = {
        r["doc_id"]: r["n_bpe"]
        for r in bpe_encode_counts(docs, merges, "text", "doc_id").collect()
    }
    assert got == want


def test_encode_equals_final_training_state():
    """Sequential-in-rank encode reproduces the trainer's final word
    states exactly — the property that lets the DuckDB oracle encode via
    a join against replayed states."""
    wc = [("banana", 3), ("bandana", 2), ("nab", 5), ("an", 7)]
    merges = train_bpe_merges_py(wc, 6)
    # re-run the trainer tracking final states
    states = {w: list(w) for w, _ in wc}
    for _, a, b, ab, _ in merges:
        for w in states:
            states[w] = _apply_merge(states[w], a, b, ab)
    for w, final in states.items():
        assert encode_word_py(w, merges) == final


def test_max_word_types_cap_is_deterministic(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    capped = word_type_counts(docs, "text", max_word_types=10).collect()
    assert len(capped) == 10
    # python reference of the cap: count desc, word asc
    full = sorted(_py_word_counts(_read_docs_pandas(SF001)["text"]),
                  key=lambda t: (-t[1], t[0]))[:10]
    assert sorted((r["w"], r["cnt"]) for r in capped) == sorted(full)
    # merges from the capped vocabulary equal the python reference on it
    got = train_bpe_merges(docs, "text", n_merges=8, max_word_types=10)
    assert got == train_bpe_merges_py(full, 8)


def test_encode_counts_empty_and_unseen(spark):
    merges = train_bpe_merges_py([("hello", 2)], 3)
    df = spark.createDataFrame(
        [(1, "hello hello"), (2, ""), (3, None), (4, "zzz 42!")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["n_bpe"]
        for r in bpe_encode_counts(df, merges, "text", "doc_id").collect()
    }
    pat = re.compile(WORD_PATTERN)
    assert got[1] == 2 * len(encode_word_py("hello", merges))
    assert got[2] == 0 and got[3] == 0
    # unseen words still encode (merges simply don't fire)
    assert got[4] == sum(
        len(encode_word_py(w, merges)) for w in pat.findall("zzz 42!")
    )


def test_pack_sequences_with_bpe_budget(spark):
    from aim357_2019_etl_and_ml_workshop_spark.operators.mlpipeline import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(i, "en", 30) for i in range(10)],
        "doc_id bigint, lang string, n_bpe bigint",
    )
    out = pack_sequences(
        df, "doc_id", "text", "lang", budget_tokens=100, shard_size=1000,
        n_tok_col="n_bpe",
    ).collect()
    bins = {r["doc_id"]: r["bin"] for r in out}
    # cumulative-preceding 0,30,...,270 over budget 100:
    assert bins == {i: (i * 30) // 100 for i in range(10)}
    assert all(r["n_tok"] == 30 for r in out)


def test_multimodal_packed_sequences_vs_python_reference(spark):
    """r12 (VERDICT r11 #5): the interleaved multimodal packing query
    equals a pure-Python reference — fake-decoder dims, patch-token
    arithmetic, and the (lang, shard, doc_id) running-sum bins."""
    from aim357_2019_etl_and_ml_workshop_spark.queries import queries

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def cost(text):
        raw = text.encode()
        head = raw[:8].ljust(8, b"\0")
        w, h = 1 + head[0] % 64, 1 + head[1] % 64
        frames = 1 + len(raw) % 7
        patches = ((w + 15) // 16) * ((h + 15) // 16) * frames
        return len(text.split(" ")), patches

    rows = []
    for r in pdf.itertuples():
        t, p = cost(r.text)
        rows.append((int(r.doc_id), r.lang, int(r.doc_id) // 1000, t, p))
    want = {}
    cum: dict = {}
    for doc_id, lang, shard, t, p in sorted(rows):
        key = (lang, shard)
        pre = cum.get(key, 0)
        want[doc_id] = (lang, shard, t, p, t + p, pre // 512)
        cum[key] = pre + t + p

    out = queries()["multimodal_packed_sequences"](spark, sf).collect()
    got = {
        r["doc_id"]: (
            r["lang"], r["shard"], r["n_text_tok"], r["patch_tok"],
            r["n_tok"], r["bin"],
        )
        for r in out
    }
    assert got == want


def test_encode_tokens_match_python_reference(spark):
    """r12 token streams: engine's distinct-word encode + positional
    reassembly must reproduce each doc's exact token sequence."""
    from aim357_2019_etl_and_ml_workshop_spark.operators.bpe import (
        bpe_encode_tokens,
    )

    sf = "/root/testdata/sf0.001"
    pdf = _read_docs_pandas(sf)
    merges = train_bpe_merges_py(_py_word_counts(pdf["text"]), 16)
    pat = re.compile(WORD_PATTERN)
    want = {
        int(r.doc_id): [
            tok
            for w in pat.findall(r.text.lower())
            for tok in encode_word_py(w, merges)
        ]
        for r in pdf.itertuples()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode_tokens(docs, merges, "text", "doc_id").collect()
    }
    assert got == want


def test_encode_tokens_empty_doc(spark):
    from aim357_2019_etl_and_ml_workshop_spark.operators.bpe import (
        bpe_encode_tokens,
    )

    merges = train_bpe_merges_py([("hi", 1)], 1)
    df = spark.createDataFrame(
        [(1, "hi hi yo"), (2, ""), (3, None)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode_tokens(df, merges, "text", "doc_id").collect()
    }
    assert got == {1: ["hi", "hi", "y", "o"], 2: [], 3: []}
