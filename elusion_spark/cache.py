"""Result cache + TTL materialized views.

Parity target: features/cashandview.rs — query cache (LRU max 100 entries,
TTL 3600 s, key = hash of the generated SQL; cashandview.rs:36-100,
239-242) and materialized views (max 50, per-view TTL;
cashandview.rs:102-242).

Spark mapping: the cache key is the canonical *analyzed plan* string (the
Spark analogue of the reference's SQL string); a hit returns the already
``.cache()``-ed DataFrame so repeated actions reuse in-memory columnar
blocks across queries — the same observable effect as the reference's
RecordBatch cache.
"""

from __future__ import annotations

import time
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession

from .errors import ElusionError

MAX_CACHE = 100   # cashandview.rs:239-242
CACHE_TTL = 3600.0
MAX_VIEWS = 50

_query_cache: "OrderedDict[str, tuple[DataFrame, float]]" = OrderedDict()
_views: dict[str, dict] = {}
_stats = {"hits": 0, "misses": 0}


def configure_cache(max_queries: int | None = None,
                    ttl_seconds: float | None = None,
                    max_views: int | None = None) -> dict:
    """Runtime cache configuration (cashandview.rs:239-242).

    Any argument left ``None`` keeps its current value.  Shrinking
    ``max_queries`` evicts (and unpersists) LRU entries immediately.
    Returns the effective configuration.
    """
    global MAX_CACHE, CACHE_TTL, MAX_VIEWS
    if max_queries is not None:
        if max_queries < 1:
            raise ElusionError("max_queries must be >= 1",
                               "Use clear_cache() to empty the cache instead.")
        MAX_CACHE = int(max_queries)
        while len(_query_cache) > MAX_CACHE:
            _, (old, _t) = _query_cache.popitem(last=False)
            old.unpersist()
    if ttl_seconds is not None:
        CACHE_TTL = float(ttl_seconds)
    if max_views is not None:
        MAX_VIEWS = int(max_views)
    return cache_config()


def cache_config() -> dict:
    return {"max_queries": MAX_CACHE, "ttl_seconds": CACHE_TTL,
            "max_views": MAX_VIEWS}


def _plan_key(df: DataFrame) -> str:
    """Canonicalized analyzed-plan string: attribute/expression IDs
    (``#123``) are minted fresh per DataFrame construction, so two
    separately-built but identical queries would never collide without
    canonicalizing them — the reference's SQL-string hash has exactly the
    same same-text-same-key semantics (cashandview.rs:36-100).

    IDs are renumbered sequentially in order of first appearance (NOT
    erased): erasing made ``a.join(b,'k').select('a.x')`` and
    ``.select('b.x')`` collide even though they reference different
    attribute instances; first-appearance renumbering keeps rebuilt
    identical plans equal while distinguishing which instance each
    reference resolves to."""
    import re

    plan = df._jdf.queryExecution().analyzed().toString()
    ids: dict[str, int] = {}

    def _renumber(m: "re.Match[str]") -> str:
        idx = ids.setdefault(m.group(1), len(ids))
        return f"#{idx}{m.group(2)}"

    return re.sub(r"#(\d+)(L?)", _renumber, plan)


def cached_elusion(cdf, alias: str):
    """elusion_with_cache (elusion.rs:554-637)."""
    from .dataframe import CustomDataFrame

    out = cdf._assemble()
    key = _plan_key(out)
    now = time.time()
    hit = _query_cache.get(key)
    if hit is not None and now - hit[1] < CACHE_TTL:
        _stats["hits"] += 1
        _query_cache.move_to_end(key)
        cached = hit[0]
    else:
        _stats["misses"] += 1
        if hit is not None:  # TTL-expired: release old blocks before overwrite
            hit[0].unpersist()
        cached = out.cache()
        _query_cache[key] = (cached, now)
        _query_cache.move_to_end(key)
        while len(_query_cache) > MAX_CACHE:
            _, (old, _t) = _query_cache.popitem(last=False)
            old.unpersist()
    cached.createOrReplaceTempView(alias)
    return CustomDataFrame(cached, alias)


def cache_stats() -> dict:
    total = _stats["hits"] + _stats["misses"]
    return {
        **_stats,
        "hit_rate": (_stats["hits"] / total) if total else 0.0,
        "entries": len(_query_cache),
    }


def clear_cache() -> None:
    for df, _ in _query_cache.values():
        df.unpersist()
    _query_cache.clear()


def invalidate_cache(_table: str | None = None) -> None:
    """Table-based invalidation clears the whole cache — the reference
    does the same coarse clear (cashandview.rs:93-99)."""
    clear_cache()


# ------------------------------------------------------------------- views

def create_view(cdf, name: str, ttl_seconds: float = 3600.0):
    """Materialized view = cached DataFrame + temp view + TTL metadata
    (elusion.rs:465-551)."""
    if len(_views) >= MAX_VIEWS and name not in _views:
        raise ElusionError(
            f"View limit reached ({MAX_VIEWS})",
            "Drop unused views with drop_view() (cashandview.rs:239-242).",
        )
    df = cdf._assemble().cache()
    df.createOrReplaceTempView(name)
    _views[name] = {"df": df, "created": time.time(), "ttl": ttl_seconds,
                    "source": cdf}
    return from_view(name, df.sparkSession)


def from_view(name: str, spark: SparkSession | None = None):
    from .dataframe import CustomDataFrame

    meta = _views.get(name)
    if meta is None:
        raise ElusionError(
            f"Unknown view {name!r}",
            f"Known views: {sorted(_views)} (elusion.rs:489-526).",
        )
    if time.time() - meta["created"] > meta["ttl"]:
        drop_view(name)
        raise ElusionError(
            f"View {name!r} expired",
            "Recreate it with create_view() (TTL semantics, cashandview.rs).",
        )
    return CustomDataFrame(meta["df"], name)


def refresh_view(name: str):
    meta = _views.get(name)
    if meta is None:
        raise ElusionError(f"Unknown view {name!r}")
    src = meta["source"]
    meta["df"].unpersist()
    df = src._assemble().cache()
    df.createOrReplaceTempView(name)
    _views[name] = {"df": df, "created": time.time(), "ttl": meta["ttl"],
                    "source": src}
    return from_view(name)


def drop_view(name: str) -> bool:
    meta = _views.pop(name, None)
    if meta is None:
        return False
    meta["df"].unpersist()
    spark = meta["df"].sparkSession
    spark.catalog.dropTempView(name)
    return True


def list_views() -> list[dict]:
    return [
        {"name": n, "created": m["created"], "ttl": m["ttl"],
         "expired": time.time() - m["created"] > m["ttl"]}
        for n, m in _views.items()
    ]


# ----------------------------------------------------------------- redis

class ElusionRedisCache:
    """Distributed result cache — parity with features/redis.rs (1191 LoC;
    README.md:118-123 claims 6-10x on repeated queries).

    Design (implemented when a redis client is present): results are
    serialized as Arrow IPC stream bytes (pyarrow) keyed by the
    canonicalized logical-plan string — the same key ``_plan_key`` uses —
    with a TTL; readers deserialize straight into a DataFrame via
    ``spark.createDataFrame(table.to_pandas())``.  Cache the AGGREGATED
    result, never raw scans: the value must fit a Redis string (512 MB).
    """

    def __init__(self, host: str = "localhost", port: int = 6379,
                 ttl_seconds: int = 3600):
        try:
            import redis

            self._client = redis.Redis(host=host, port=port)
        except ImportError:
            # redis-py is convenience, not capability: the stdlib RESP
            # client (resp.py) speaks the same wire protocol to any
            # standard Redis server — GET/SETEX are all this cache needs.
            from .resp import RespClient

            try:
                self._client = RespClient(host=host, port=port)
            except OSError as e:
                from .errors import FeatureNotAvailable

                raise FeatureNotAvailable(
                    f"no Redis server reachable at {host}:{port} ({e})",
                    "start a Redis server (any standard endpoint works — "
                    "the stdlib RESP client needs no redis-py install).",
                )
        self.ttl = ttl_seconds
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, cdf, alias: str):
        import io

        import pyarrow as pa

        key = "elusion:" + _plan_key(cdf._assemble())
        blob = self._client.get(key)
        if blob is not None:
            self.hits += 1
            reader = pa.ipc.open_stream(io.BytesIO(blob))
            table = reader.read_all()
            spark = cdf.df.sparkSession
            out = spark.createDataFrame(table.to_pandas())
        else:
            self.misses += 1
            out = cdf._assemble()
            pdf = out.toPandas()
            table = pa.Table.from_pandas(pdf)
            sink = io.BytesIO()
            with pa.ipc.new_stream(sink, table.schema) as w:
                w.write_table(table)
            self._client.setex(key, self.ttl, sink.getvalue())
        from .dataframe import CustomDataFrame

        out.createOrReplaceTempView(alias)
        return CustomDataFrame(out, alias)

    def stats(self) -> dict:
        total = self.hits + self.misses
        return {
            "hits": self.hits,
            "misses": self.misses,
            "hit_rate": (self.hits / total) if total else 0.0,
        }
