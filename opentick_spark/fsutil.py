"""Hadoop-FileSystem probes for paths Spark writes (r13, generalizing
the r12 ADVICE fence fix): any state a sink lands via
``df.write.parquet(path)`` lives on whatever filesystem the path's
scheme names (hdfs:, s3a:, file:, bare local) — so existence checks on
that state MUST go through the Hadoop FileSystem API. ``os.path``
probes silently answer "missing" for every non-local URI, which turns
a fence into a no-op (streaming_cms_build's double-count hazard) or an
empty-state fabrication (stream_neardup_lsh's prior-state read).

Paths written with plain ``open()``/``os.link`` (the engine warehouse,
IVF staged-publish markers) are deliberate LOCAL designs and keep
using ``os`` — mixing is the bug, not ``os`` itself.
"""

from __future__ import annotations


def hadoop_fs(spark, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def fs_exists(spark, path: str) -> bool:
    fs, jpath = hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def fs_has_child_with_prefix(spark, path: str, prefix: str) -> bool:
    """True iff ``path`` exists and directly contains an entry named
    ``prefix*`` — the partial-state probes' shape (batch=N / batch-N)."""
    fs, jpath = hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return False
    return any(
        st.getPath().getName().startswith(prefix)
        for st in fs.listStatus(jpath)
    )
