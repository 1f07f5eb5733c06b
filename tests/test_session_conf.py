"""Deployment-guard tests for session conf (VERDICT r03 #8): the 16 MB
scan splits and 64 KB AQE minPartitionSize are LOCAL-mode ergonomics;
a cluster session must keep its cluster-sized defaults. The non-local
branch can't be executed against a real cluster here, so it is driven
through a stub session exposing exactly the surface pin_session_conf
touches (conf.set + sparkContext.master)."""

from __future__ import annotations

from aim357_2019_etl_and_ml_workshop_spark.session import (
    _RUNTIME_CONF,
    pin_session_conf,
)

SPLIT_KEY = "spark.sql.files.maxPartitionBytes"
MINPART_KEY = "spark.sql.adaptive.coalescePartitions.minPartitionSize"


class _StubConf:
    def __init__(self):
        self.set_calls: dict[str, str] = {}

    def set(self, k, v):
        self.set_calls[k] = v


class _StubContext:
    def __init__(self, master):
        self.master = master


class _StubSession:
    def __init__(self, master):
        self.conf = _StubConf()
        self.sparkContext = _StubContext(master)


def test_cluster_master_keeps_cluster_scan_and_coalesce_defaults():
    for master in ("spark://host:7077", "yarn", "k8s://https://api:6443"):
        s = _StubSession(master)
        pin_session_conf(s)
        assert SPLIT_KEY not in s.conf.set_calls, master
        assert MINPART_KEY not in s.conf.set_calls, master
        # the portable runtime conf is still applied everywhere
        for k, v in _RUNTIME_CONF.items():
            assert s.conf.set_calls[k] == v


def test_local_master_gets_small_splits_and_min_partition_size():
    for master in ("local[32]", "local[*]", "local"):
        s = _StubSession(master)
        pin_session_conf(s)
        assert s.conf.set_calls[SPLIT_KEY] == str(16 * 1024 * 1024), master
        assert s.conf.set_calls[MINPART_KEY] == str(64 * 1024), master


def test_real_local_session_conf_applied(spark):
    """End-to-end on the live test session: the local branch actually
    landed in the JVM conf."""
    pin_session_conf(spark)
    assert spark.conf.get(SPLIT_KEY) == str(16 * 1024 * 1024)
    assert spark.conf.get(MINPART_KEY) == str(64 * 1024)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
