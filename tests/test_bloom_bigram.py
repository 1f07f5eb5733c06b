"""Bloom-prefilter decontamination and bigram-LM scoring (r9 additions).

The load-bearing claims, each pinned here:
- bloom_decontaminate == the exact n-gram overlap join, at ANY bitmap
  size — an undersized bitmap floods the verify join with false
  positives but can never change the answer (the verify stage is the
  correctness boundary, the Bloom layer is traffic shaping only);
- the bitmap gather is parameter-bounded (m_bits/64 words), not
  data-bounded;
- bigram_logprob_scores reproduces a hand-computed add-0.5-smoothed
  conditional model on a corpus small enough to verify by eye, and
  drops <2-token documents on both paths.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.operators.curation import (
    bloom_decontaminate,
)
from aim357_2019_etl_and_ml_workshop_spark.operators.textanalysis import (
    bigram_logprob_scores,
)


def _exact_overlap(corpus, reference, n=5, prefix=200):
    """Reference implementation: plain exact n-gram overlap join."""

    def grams(frame):
        d = frame.select("doc_id", F.split(F.lower("text"), " ").alias("_t"))
        ng = F.least(F.size("_t") - (n - 1), F.lit(prefix))
        sh = F.when(
            F.size("_t") >= n,
            F.transform(
                F.sequence(F.lit(1), ng),
                lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return d.select("doc_id", F.explode(sh).alias("sh")).distinct()

    ref_sh = grams(reference).select("sh").distinct()
    return (
        grams(corpus)
        .join(ref_sh, "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_bloom_matches_exact_overlap(docs):
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    ref = docs.where(F.col("doc_id") % 7 == 0)
    got = bloom_decontaminate(corpus, ref, "text", "doc_id").collect()
    want = _exact_overlap(corpus, ref).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) > 0, "fixture slice produced no overlap — test is vacuous"


def test_bloom_exact_under_saturated_bitmap(docs):
    """m_bits=64 saturates the bitmap (every gram is a Bloom candidate):
    maximum false-positive pressure, identical answer — the verify join
    alone determines the output."""
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    ref = docs.where(F.col("doc_id") % 7 == 0)
    got = bloom_decontaminate(corpus, ref, "text", "doc_id", m_bits=64, k=1)
    want = _exact_overlap(corpus, ref)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_bloom_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        bloom_decontaminate(docs, docs, m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_decontaminate(docs, docs, k=0)


def test_bigram_logprob_hand_computed(spark):
    # corpus: d1 "a b a b", d2 "a b", d3 "x" (no bigram -> absent)
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")], "doc_id bigint, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in bigram_logprob_scores(df, "text", "doc_id").collect()
    }
    # counts: (a,b)=3, (b,a)=1; ctx: a=3, b=1; V=3 (a, b, x); alpha=0.5
    p_ab = (3 + 0.5) / (3 + 0.5 * 3)
    p_ba = (1 + 0.5) / (1 + 0.5 * 3)
    d1 = round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 6)
    d2 = round(math.log(p_ab), 6)
    assert set(rows) == {1, 2}, "single-token doc must be absent"
    assert rows[1]["n_bigram"] == 3 and rows[1]["avg_logprob"] == d1
    assert rows[2]["n_bigram"] == 1 and rows[2]["avg_logprob"] == d2


def test_trigram_logprob_hand_computed(spark):
    """Interpolated trigram rung (r10): hand-computed Jelinek-Mercer
    mixture 0.6*P3 + 0.3*P2 + 0.1*P1, each order add-0.5 smoothed, on a
    corpus small enough to verify by eye; <3-token docs absent."""
    from aim357_2019_etl_and_ml_workshop_spark.operators.textanalysis import (
        trigram_logprob_scores,
    )

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "a b")],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in trigram_logprob_scores(df, "text", "doc_id").collect()
    }
    # unigrams: a=4 b=4 c=1, N=9, V=3; bigrams: (a,b)=4 (b,a)=1 (b,c)=1,
    # ctx2: a=4 b=2; trigrams: (a,b,a)=(b,a,b)=(a,b,c)=1, ctx3: (a,b)=2
    # (b,a)=1 — all with alpha=0.5 smoothing
    V, N = 3, 9

    def p(n, ctx):
        return (n + 0.5) / (ctx + 0.5 * V)

    p1_a = (4 + 0.5) / (N + 0.5 * V)
    p1_b = (4 + 0.5) / (N + 0.5 * V)
    p1_c = (1 + 0.5) / (N + 0.5 * V)
    mix_aba = 0.6 * p(1, 2) + 0.3 * p(1, 2) + 0.1 * p1_a  # P(a|b)=p(1,2)
    mix_bab = 0.6 * p(1, 1) + 0.3 * p(4, 4) + 0.1 * p1_b  # P(b|a)=p(4,4)
    mix_abc = 0.6 * p(1, 2) + 0.3 * p(1, 2) + 0.1 * p1_c  # P(c|b)=p(1,2)
    d1 = round((math.log(mix_aba) + math.log(mix_bab)) / 2, 6)
    d2 = round(math.log(mix_abc), 6)
    assert set(rows) == {1, 2}, "2-token doc must be absent"
    assert rows[1]["n_trigram"] == 2 and rows[1]["avg_logprob"] == d1
    assert rows[2]["n_trigram"] == 1 and rows[2]["avg_logprob"] == d2


def test_trigram_backoff_orders_unseen_continuations(spark):
    """The point of interpolation: an unseen trigram whose bigram/unigram
    evidence is strong scores ABOVE an equally-unseen trigram with weak
    lower-order evidence — a pure-trigram model would floor both at the
    same smoothing constant."""
    from aim357_2019_etl_and_ml_workshop_spark.operators.textanalysis import (
        trigram_logprob_scores,
    )

    background = [(i, "the cat sat on the mat") for i in range(10, 30)]
    # probe docs: same unseen-trigram count, different lower-order mass
    df = spark.createDataFrame(
        background + [(1, "mat the cat"), (2, "zz qq ww")],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r["avg_logprob"]
        for r in trigram_logprob_scores(df, "text", "doc_id").collect()
    }
    assert rows[1] > rows[2], (
        "frequent-vocabulary continuation must outscore junk under backoff"
    )


def test_bigram_scores_on_fixture(docs):
    out = bigram_logprob_scores(docs, "text", "doc_id")
    n_docs = docs.where(
        F.size(
            F.filter(
                F.split(F.lower(F.regexp_replace("text", r"\s+", " ")), " "),
                lambda t: t != "",
            )
        )
        >= 2
    ).count()
    got = out.agg(
        F.count(F.lit(1)).alias("n"), F.max("avg_logprob").alias("mx")
    ).collect()[0]
    assert got["n"] == n_docs
    assert got["mx"] < 0.0, "log-probabilities must be negative"


def test_bloom_state_roundtrip(spark, docs, tmp_path):
    """Persisted-state contract (the banding/ANN-state pattern): state
    written to parquet and probed by a later 'nightly' session gives the
    same answer as the inline reference path — zero reference re-scan."""
    from aim357_2019_etl_and_ml_workshop_spark.operators.curation import (
        bloom_decontaminate_state,
    )

    corpus = docs.where(F.col("doc_id") % 7 != 0)
    ref = docs.where(F.col("doc_id") % 7 == 0)
    words, pairs = bloom_decontaminate_state(ref, "text", "doc_id")
    words.write.parquet(str(tmp_path / "bloom_words"))
    pairs.write.parquet(str(tmp_path / "bloom_pairs"))
    stored = (
        spark.read.parquet(str(tmp_path / "bloom_words")),
        spark.read.parquet(str(tmp_path / "bloom_pairs")),
    )
    got = bloom_decontaminate(corpus, state=stored).collect()
    want = bloom_decontaminate(corpus, ref).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_bloom_state_geometry_mismatch_fails_fast(docs):
    """Probing a bitmap built with different (m_bits, k) would produce
    Bloom false NEGATIVES — must raise, not silently miss overlaps."""
    from aim357_2019_etl_and_ml_workshop_spark.operators.curation import (
        bloom_decontaminate_state,
    )

    ref = docs.where(F.col("doc_id") % 7 == 0)
    state = bloom_decontaminate_state(ref, "text", "doc_id", m_bits=1 << 12)
    with pytest.raises(ValueError, match="geometry"):
        bloom_decontaminate(docs, state=state, m_bits=1 << 20)


def test_bloom_requires_exactly_one_source(docs):
    with pytest.raises(ValueError, match="exactly one"):
        bloom_decontaminate(docs)
    with pytest.raises(ValueError, match="exactly one"):
        bloom_decontaminate(docs, docs, state=(docs, docs))


def test_bloom_state_append_equals_one_shot(docs):
    """Incremental invariant: append(state(A), B) == state(A UNION B) —
    bitmap words bit-identical, pairs set-identical, and a probe through
    the appended state matches the one-shot path."""
    from aim357_2019_etl_and_ml_workshop_spark.operators.curation import (
        bloom_decontaminate_state,
        bloom_state_append,
    )

    ref_a = docs.where(F.col("doc_id") % 14 == 0)
    ref_b = docs.where(F.col("doc_id") % 14 == 7)
    ref_all = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    # geometry must be pinned across increments (appends keep the
    # bootstrap bitmap's m_bits/k; auto-derive would size A and A∪B
    # differently) — real appenders bootstrap at the EXPECTED final size
    inc = bloom_state_append(
        bloom_decontaminate_state(ref_a, "text", "doc_id", m_bits=1 << 20),
        ref_b,
    )
    one = bloom_decontaminate_state(ref_all, "text", "doc_id", m_bits=1 << 20)
    assert sorted(map(tuple, inc[0].collect())) == sorted(
        map(tuple, one[0].collect())
    )
    assert sorted(map(tuple, inc[1].collect())) == sorted(
        map(tuple, one[1].collect())
    )
    got = bloom_decontaminate(corpus, state=inc).collect()
    want = bloom_decontaminate(corpus, ref_all).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_bloom_state_append_requires_nonempty(spark, docs):
    from aim357_2019_etl_and_ml_workshop_spark.operators.curation import (
        bloom_state_append,
    )

    empty_words = spark.createDataFrame(
        [], "m_bits long, k int, n int, prefix int, bucket int, word long"
    )
    empty_pairs = spark.createDataFrame([], "h long, sh string")
    with pytest.raises(ValueError, match="empty bloom state"):
        bloom_state_append((empty_words, empty_pairs), docs)


def test_bloom_state_gram_shape_mismatch_fails_fast(docs):
    """ADVICE r09 #1: n/prefix are part of the persisted geometry. Probing
    (or appending to) stored state with a different gram shape would hash
    DIFFERENT grams — silent false negatives, i.e. missed contamination —
    so both paths must raise; and a pre-r10 state that never recorded its
    gram shape must be rejected outright, not probed on faith."""
    from aim357_2019_etl_and_ml_workshop_spark.operators.curation import (
        bloom_decontaminate_state,
        bloom_state_append,
    )

    ref = docs.where(F.col("doc_id") % 7 == 0)
    state = bloom_decontaminate_state(ref, "text", "doc_id", n=5, prefix=200)
    with pytest.raises(ValueError, match="geometry"):
        bloom_decontaminate(docs, state=state, n=3)
    with pytest.raises(ValueError, match="geometry"):
        bloom_decontaminate(docs, state=state, prefix=100)
    with pytest.raises(ValueError, match="gram shape"):
        bloom_state_append(state, docs, n=7)
    # legacy state (no n/prefix columns): fail fast with a rebuild message
    legacy = (state[0].drop("n", "prefix"), state[1])
    with pytest.raises(ValueError, match="predates"):
        bloom_decontaminate(docs, state=legacy)
    with pytest.raises(ValueError, match="predates"):
        bloom_state_append(legacy, docs)


def test_derive_bloom_m_bits_policy():
    """Sizing policy (the sf10-measured footgun): linear in the reference
    upper bound, floored, capped at the broadcast budget, 64-aligned."""
    from aim357_2019_etl_and_ml_workshop_spark.operators.curation import (
        derive_bloom_m_bits,
    )

    assert derive_bloom_m_bits(0) == 1 << 16  # floor
    assert derive_bloom_m_bits(1000) == 1000 * 200 * 10  # 2M bits, aligned
    assert derive_bloom_m_bits(10**9) == 1 << 28  # cap: degrade, not fail
    for n in (0, 3, 7, 1000, 12345):
        assert derive_bloom_m_bits(n) % 64 == 0
        assert derive_bloom_m_bits(n) >= 1 << 16
