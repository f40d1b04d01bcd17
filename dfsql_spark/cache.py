"""Table-cache policy objects, mirroring the reference's cache API.

Reference surface (dfsql/cache.py:5-26): ``DataSource`` takes a cache
object — ``MemoryCache(maxsize)`` (an lru_cache over table fetches) or
``DoNothingCache`` — swappable at runtime via ``set_cache``.  Here the
storage layer is Spark's block manager: "caching a table" means
``spark.catalog.cacheTable`` (distributed, spillable, columnar), so
the policy object decides *which* tables stay pinned and the LRU
bookkeeping tracks usage the same way the reference's lru_cache did.

At scale: Spark caching is per-partition and memory-pressure-aware
(StorageLevel MEMORY_AND_DISK by default for SQL caches), so an
"eviction" here merely unpins — blocks are dropped lazily by the
block manager, never copied to the driver.
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import SparkSession


class DoNothingCache:
    """Never caches (reference: dfsql/cache.py:5-13)."""

    def touch(self, spark: SparkSession, name: str) -> None:
        return None

    def evict(self, spark: SparkSession, name: str) -> None:
        return None

    def clear(self, spark: SparkSession) -> None:
        return None

    @property
    def currsize(self) -> int:
        return 0


class MemoryCache:
    """Pin up to ``maxsize`` tables in Spark's block manager, LRU
    eviction on overflow (reference: dfsql/cache.py:16-26, where the
    same policy wrapped ``functools.lru_cache``).

    ``touch(name)`` marks a table used: caches it if new, refreshes
    recency if known, and unpins the least-recently-used table when
    the pin count exceeds ``maxsize``.
    """

    def __init__(self, maxsize: int = 32):
        self.maxsize = maxsize
        self._lru: OrderedDict[str, None] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def touch(self, spark: SparkSession, name: str) -> None:
        if name in self._lru:
            self._lru.move_to_end(name)
            self.hits += 1
            return
        self.misses += 1
        spark.catalog.cacheTable(name)
        self._lru[name] = None
        while len(self._lru) > self.maxsize:
            victim, _ = self._lru.popitem(last=False)
            self._safe_uncache(spark, victim)

    def evict(self, spark: SparkSession, name: str) -> None:
        if name in self._lru:
            del self._lru[name]
        self._safe_uncache(spark, name)

    def clear(self, spark: SparkSession) -> None:
        for name in list(self._lru):
            self.evict(spark, name)

    @property
    def currsize(self) -> int:
        return len(self._lru)

    @staticmethod
    def _safe_uncache(spark: SparkSession, name: str) -> None:
        try:
            if spark.catalog.isCached(name):
                spark.catalog.uncacheTable(name)
        except Exception:
            pass  # table may have been dropped already
