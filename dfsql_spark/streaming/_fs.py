"""Minimal filesystem adapter for sink metadata I/O.

The snapshot+marker commit protocol (sinks.py) needs five tiny
operations — exists / list / touch / delete-tree / is-dir — on the
same storage system the snapshot parquet lands on.  Driver-local
``os``/``shutil`` only covers local paths; for any scheme'd URI
(``hdfs://``, ``s3a://``, ``file://``) the operations must go through
Hadoop's ``FileSystem`` API or the markers silently land on the
driver's own disk and every batch looks uncommitted.

Two adapters, one contract:

* :class:`LocalFS` — ``os``/``shutil``; scheme-less paths (the test/CI
  hot path, no JVM round-trips).
* :class:`HadoopFS` — ``FileSystem.get`` via the session's JVM
  gateway; any URI Hadoop has a connector for.  ``file://`` URIs
  exercise this adapter against real storage in the test suite.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


class LocalFS:
    """Driver-local filesystem operations for scheme-less paths."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def touch(self, path: str) -> None:
        with open(path, "w", encoding="utf-8"):
            pass

    def delete(self, path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)


class HadoopFS:
    """Hadoop ``FileSystem`` operations for scheme'd URIs, via the
    active session's JVM gateway (no extra dependency: the classes ship
    with Spark)."""

    def __init__(self, spark: SparkSession, uri: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(uri).getFileSystem(spark._jsc.hadoopConfiguration())

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._Path(path))

    def isdir(self, path: str) -> bool:
        p = self._Path(path)
        return self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory()

    def listdir(self, path: str) -> list[str]:
        return [
            status.getPath().getName()
            for status in self._fs.listStatus(self._Path(path))
        ]

    def touch(self, path: str) -> None:
        self._fs.create(self._Path(path), True).close()

    def delete(self, path: str) -> None:
        self._fs.delete(self._Path(path), True)

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._Path(path))


def fs_for(path: str, spark: SparkSession | None = None):
    """Adapter for ``path``: LocalFS for scheme-less paths, HadoopFS
    for URIs.  A URI needs a live SparkSession (for the JVM gateway);
    ``spark`` falls back to the active session."""
    if "://" not in path:
        return LocalFS()
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"A SparkSession is required for filesystem operations on "
            f"URI {path!r} (Hadoop FileSystem API); start one first."
        )
    return HadoopFS(spark, path)
