"""r13 fixed-cost memos (VERDICT r12 next #4): the per-build driver costs
— full conf pin, spread_for_cpu's physical-planning probe, the ANN
query-batch count job — are memoized/replaced with metadata reads. These
tests pin (a) the memo short-circuits, (b) the decisions/values are
IDENTICAL to the unmemoized paths, (c) the memos invalidate on the inputs
they depend on."""

from __future__ import annotations

import os

from aim357_2019_etl_and_ml_workshop_spark.session import (
    _PIN_MARKER,
    _RUNTIME_CONF,
    pin_session_conf,
)
from aim357_2019_etl_and_ml_workshop_spark.sources import io as iom


class _MemoConf:
    """Stub conf WITH get (the session_conf tests' stub omits it to drive
    the fallback path); counts set calls so the short-circuit is visible."""

    def __init__(self):
        self.values: dict[str, str] = {}
        self.set_calls = 0

    def set(self, k, v):
        self.set_calls += 1
        self.values[k] = v

    def get(self, k, default=None):
        return self.values.get(k, default)


class _Ctx:
    def __init__(self):
        self.master = "local[4]"
        self.defaultParallelism = 4
        self._keys = set()

    def getConf(self):
        return self

    def contains(self, key):
        return key in self._keys


class _Session:
    def __init__(self):
        self.conf = _MemoConf()
        self.sparkContext = _Ctx()


def test_pin_session_conf_short_circuits_after_first_full_pin():
    s = _Session()
    pin_session_conf(s)
    assert s.conf.values[_PIN_MARKER] == "1"
    first = s.conf.set_calls
    assert first >= len(_RUNTIME_CONF)  # full pin ran
    pin_session_conf(s)
    assert s.conf.set_calls == first  # zero additional set round trips


def test_pin_session_conf_repins_when_marker_cleared():
    s = _Session()
    pin_session_conf(s)
    s.conf.values.pop(_PIN_MARKER)
    before = s.conf.set_calls
    pin_session_conf(s)
    assert s.conf.set_calls > before  # full pin ran again


def test_spread_probe_memo_matches_direct_probe(spark, sf_dir):
    from aim357_2019_etl_and_ml_workshop_spark import queries as q

    iom._SPREAD_PROBE_CACHE.clear()
    base = q._t(spark, sf_dir, "documents")
    fresh = base.select("doc_id", "text")
    direct = fresh.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = iom.spread_for_cpu(base.select("doc_id", "text"))
    assert len(iom._SPREAD_PROBE_CACHE) == 1
    (cached_decision,) = iom._SPREAD_PROBE_CACHE.values()
    assert cached_decision == direct
    # memoized second call: same decision object path, no new entries
    out2 = iom.spread_for_cpu(base.select("doc_id", "text"))
    assert len(iom._SPREAD_PROBE_CACHE) == 1
    # the spread decision changes the plan only when it should
    spread_applied = "Exchange" in out._jdf.queryExecution().toString()
    assert spread_applied == direct
    assert sorted(out.columns) == sorted(out2.columns) == ["doc_id", "text"]


def test_spread_probe_memo_key_varies_with_split_conf(spark, sf_dir):
    from aim357_2019_etl_and_ml_workshop_spark import queries as q

    iom._SPREAD_PROBE_CACHE.clear()
    base = q._t(spark, sf_dir, "documents")
    key_conf = "spark.sql.files.maxPartitionBytes"
    prev = spark.conf.get(key_conf)
    iom.spread_for_cpu(base.select("doc_id", "text"))
    try:
        spark.conf.set(key_conf, str(1024 * 1024))
        iom.spread_for_cpu(base.select("doc_id", "text"))
        assert len(iom._SPREAD_PROBE_CACHE) == 2  # conf in the key -> miss
    finally:
        spark.conf.set(key_conf, prev)


def test_ann_queries_footer_count_equals_distributed_count(spark, sf_dir):
    from aim357_2019_etl_and_ml_workshop_spark import queries as q

    emb = q._t(spark, sf_dir, "embeddings").select("vec_id")
    with_footer = sorted(
        r["vec_id"] for r in q._ann_queries(emb, sf_dir).collect()
    )
    with_count = sorted(
        r["vec_id"] for r in q._ann_queries(emb, None).collect()
    )
    assert with_footer == with_count
    assert len(with_footer) > 0
    # the footer fast path actually fires for the testdata layout
    assert os.path.isfile(os.path.join(sf_dir, "embeddings.parquet"))
