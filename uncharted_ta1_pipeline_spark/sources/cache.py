"""Executor-local data cache + broadcast dimension helpers (SURVEY.md §2.1).

The reference keeps remote images and model weights on local disk via
``ImageCache`` / ``S3DataCache`` (/root/reference/tasks/common/image_cache.py,
s3_data_cache.py; tests tasks/common/test/test_s3_data_cache.py:27-63):
an id-keyed download-once cache so every task on a host reuses one copy.

Spark-first the same need splits into two mechanisms:

- **LocalDataCache** — a content-keyed, download-once, atomic local-disk
  cache for side data a Python worker must open as a FILE (model weights,
  codec tables).  Safe under concurrent executors on one host: writers
  land on a tmp name and ``os.replace`` in; losers of the race just see
  the winner's file.  At cluster scale the cache directory is per-host
  scratch (or ``SparkFiles.getRootDirectory()``), so each host pays one
  fetch regardless of task count — exactly the reference's semantics.

- **broadcast_dim** — for side data that is a TABLE, the right transport
  is a broadcast join, not files: ``F.broadcast`` ships the dim once per
  executor via the torrent broadcast.  The guard enforces the smallness
  assumption with a bounded probe (``limit(n+1).count()`` — never a full
  count of an unboundedly large dim).

- **distribute_file** — ``SparkContext.addFile`` + ``SparkFiles.get``:
  the built-in per-host file distribution, for when the artifact already
  exists on the driver.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class LocalDataCache:
    """Download-once local cache: ``fetch(key, producer)`` returns a local
    path, invoking ``producer() -> bytes`` only if the key is absent."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def path_for(self, key: str) -> str:
        digest = hashlib.sha256(key.encode()).hexdigest()[:32]
        return os.path.join(self.cache_dir, digest)

    def contains(self, key: str) -> bool:
        return os.path.exists(self.path_for(key))

    def fetch(self, key: str, producer: Callable[[], bytes]) -> str:
        dst = self.path_for(key)
        if not os.path.exists(dst):
            payload = producer()
            tmp = f"{dst}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, dst)  # atomic: concurrent fetchers converge
        return dst


def broadcast_dim(df: DataFrame, max_rows: int = 1_000_000) -> DataFrame:
    """Broadcast-hint a dimension after a BOUNDED smallness probe (reads at
    most ``max_rows + 1`` rows, never the full dim)."""
    probe = df.limit(max_rows + 1).count()
    if probe > max_rows:
        raise ValueError(
            f"broadcast_dim: dimension exceeds {max_rows} rows — use a "
            "shuffle join (or bucketing) instead of broadcasting"
        )
    return F.broadcast(df)


def distribute_file(spark: SparkSession, path: str) -> str:
    """Ship a driver-local artifact to every executor host once; returns the
    basename to resolve worker-side via ``SparkFiles.get(name)``."""
    spark.sparkContext.addFile(path)
    return os.path.basename(path)
