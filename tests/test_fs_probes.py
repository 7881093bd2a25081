"""Shared Hadoop-FS state probe (functions/fs.py) + replay-harness
landing helpers (streaming/landing.py) — the r11 port of the streaming
state probes off os.path (VERDICT r10 next #2b: a driver-local isdir
silently reports "no state" on HDFS/object stores, making a restarted
stream rebuild from scratch; the defect class ann.py cured in r9)."""

from __future__ import annotations

import os

import pytest


def test_parquet_state_exists_lifecycle(spark, tmp_path):
    from knowledge_graph_system_spark.functions.fs import parquet_state_exists

    d = str(tmp_path / "state")
    # missing dir: no state
    assert not parquet_state_exists(spark, d)
    # empty dir: no state
    os.makedirs(d)
    assert not parquet_state_exists(spark, d)
    # _SUCCESS-only (aborted first write): still no state
    open(os.path.join(d, "_SUCCESS"), "w").close()
    assert not parquet_state_exists(spark, d)
    # a real parquet write: state
    spark.range(3).coalesce(1).write.mode("overwrite").parquet(d)
    assert parquet_state_exists(spark, d)
    # explicit file: scheme resolves identically (the same API call a
    # production hdfs:// or s3a:// path would take)
    assert parquet_state_exists(spark, f"file://{d}")


def test_probe_fails_loudly_on_unsupported_scheme(spark):
    """An unregistered scheme must raise, not degrade to 'no state' —
    silently rebuilding a stream's accumulated index from scratch is
    the failure the probe exists to prevent."""
    from knowledge_graph_system_spark.functions.fs import parquet_state_exists

    with pytest.raises(Exception) as exc:
        parquet_state_exists(spark, "nosuchscheme://bucket/state")
    assert "nosuchscheme" in str(exc.value).lower()


def test_ann_aliases_share_the_util(spark, tmp_path):
    """ann.py's module-local _hadoop_fs/_fs_delete now delegate to the
    shared util — same FileSystem resolution, delete still recursive."""
    from knowledge_graph_system_spark.operators.ann import _fs_delete, _hadoop_fs

    d = str(tmp_path / "idx")
    os.makedirs(os.path.join(d, "sub"))
    fs, jpath = _hadoop_fs(spark, d)
    assert fs.exists(jpath)
    _fs_delete(spark, d)
    assert not fs.exists(jpath)


def test_dedup_cuts():
    from knowledge_graph_system_spark.streaming.landing import dedup_cuts

    assert dedup_cuts([1.0, 2.0, 3.0]) == [1.0, 2.0, 3.0]
    # duplicates collapse (the ADVICE r10 degenerate-replay case)
    assert dedup_cuts([5.0, 5.0, 9.0]) == [5.0, 9.0]
    assert dedup_cuts([5.0, 5.0, 5.0]) == [5.0]
    assert dedup_cuts([]) == []
    # non-monotone input (defensive): keeps the increasing subsequence
    assert dedup_cuts([3.0, 2.0, 4.0]) == [3.0, 4.0]


def test_stamp_landing_mtimes(tmp_path):
    from knowledge_graph_system_spark.streaming.landing import stamp_landing_mtimes

    a, b = tmp_path / "batch0", tmp_path / "batch1"
    for d in (a, b):
        os.makedirs(d)
        (d / "part-0.parquet").write_bytes(b"x")
    # stamp in REVERSE order: the stamped sequence, not write order,
    # must decide the file-source processing order
    stamp_landing_mtimes(str(b), 1)
    stamp_landing_mtimes(str(a), 0)
    assert (
        os.path.getmtime(a / "part-0.parquet")
        < os.path.getmtime(b / "part-0.parquet")
    )
