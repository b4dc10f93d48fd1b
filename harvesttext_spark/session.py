"""SparkSession factory with the engine's standard configuration.

All knobs chosen for correctness-vs-oracle and 100TB-scale hygiene:
  * Arrow exchange on (every Python stage is Arrow-batched, never per-row).
  * AQE on (runtime coalescing + skew-join splitting).
  * UTC session timezone (parity with DuckDB oracle timestamps).
  * shuffle partitions sized to cores for local mode; a real cluster job
    overrides via ``spark-submit --conf`` (we never hardcode 200).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "harvesttext_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver convention);
    on a real cluster, pass ``None`` and let spark-submit own the master.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # one shuffle partition per core locally; clusters override.
        n = master.split("[")[-1].rstrip("]") if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def read_scaled(spark: SparkSession, path: str, key: str | None = None):
    """Parquet scan that guarantees at least default-parallelism partitions.

    The driver's test parquet files are single row groups, so a plain scan
    yields ONE partition and serializes every CPU-bound expression/UDF.  On
    a real 100TB table (thousands of row groups) the condition is false and
    this is a zero-cost no-op — the repartition only fires for degenerate
    small scans.

    ``key``: hash-partition on this column instead of round-robin.  Two
    wins, both measured (guide §2.4/§2.5): (a) a keyless repartition(n)
    first LOCAL-SORTS its input rows so retried tasks reproduce the same
    assignment (SPARK-23207) — hashing a deterministic unique id needs no
    sort; (b) HashPartitioning(key) satisfies ClusteredDistribution for
    every downstream groupBy/window whose keys include ``key`` (explode
    and aliasing Projects preserve it), so per-doc aggregations run in
    place with ZERO further exchange.  Unique ids spread uniformly, so
    balance matches round-robin."""
    df = spark.read.parquet(path)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        from pyspark.sql import functions as F

        df = (
            df.repartition(target, F.col(key))
            if key is not None
            else df.repartition(target)
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Read the driver's parquet tables and register temp views.

    Returns dict name -> DataFrame. Columns are pruned/pushed down by
    Catalyst at use-sites; this only declares scans.
    """
    out = {}
    for name in names or TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out


# --- plan-keyed LRU-1 persist ----------------------------------------------

_persist_slots: dict = {}
_persist_lock = threading.Lock()


def plan_keyed_persist(df, slot: str):
    """Persist ``df`` under a named slot with LRU-1 eviction keyed by PLAN
    identity: a repeated call with the same analyzed plan reuses the
    already-materialized cache (no double-persist, stays warm); a call
    with a different plan unpersists the previous occupant first.  One
    cached table per slot bounds executor memory in long-lived sessions;
    unpersisting a frame a caller still holds only costs recompute, never
    correctness.  Used by the minhash signature table, the LM count
    tables, the langid weight table, and the word-discovery candidate
    stream.

    The sameResult probe and the unpersist are guarded SEPARATELY: a
    Py4J failure in the probe must not skip the eviction — otherwise the
    slot is overwritten while the old table stays persisted and the
    LRU-1 memory bound silently degrades.  A lock serializes concurrent
    callers (threaded jobs share the module-level slot dict)."""
    with _persist_lock:
        prev = _persist_slots.get(slot)
        if prev is not None:
            try:
                same = prev._jdf.queryExecution().analyzed().sameResult(
                    df._jdf.queryExecution().analyzed()
                )
            except Exception:
                same = False
            if same:
                return prev
            try:
                prev.unpersist()
            except Exception:
                pass
        df = df.persist()
        _persist_slots[slot] = df
        return df


def clear_persist_slots() -> int:
    """Evict every plan-keyed persist slot (best-effort unpersist).
    Used by tools/check_contract.py --determinism so the second run is a
    true plan re-execution instead of a read from the first run's cache,
    and available to tests that need a cold engine.  Returns the number
    of slots evicted."""
    with _persist_lock:
        n = len(_persist_slots)
        for df in _persist_slots.values():
            try:
                df.unpersist()
            except Exception:
                pass
        _persist_slots.clear()
        return n
