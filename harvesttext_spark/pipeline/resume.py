"""Idempotent batch resume with per-partition lineage (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

Layout (parquet as the Iceberg stand-in — no Iceberg jars in this image;
the commit protocol below is exactly what an Iceberg snapshot would give us
for free, and the code isolates it in one module):

    out_dir/data/bucket=<b>/...   labeled output, partitioned by bucket
    out_dir/manifest/...          one row per COMMITTED bucket:
                                  (bucket, n_docs, n_keep, sum_clean_len)

Work unit = url-hash bucket (deterministic: crc32(url) % n_buckets), so any
re-run maps the same documents to the same bucket.  Resume = anti-join the
manifest's committed buckets from the input, process the remainder, write
data FIRST (dynamic partition overwrite: re-writing a half-written bucket
is safe because bucket content is deterministic), then append the manifest
rows — a bucket is committed only when its manifest row lands, so a crash
between the two writes just reprocesses that bucket."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesttext_spark.pipeline.quality_filter import quality_filter

N_BUCKETS = 64


def _with_bucket(pages: DataFrame, n_buckets: int) -> DataFrame:
    return pages.withColumn("bucket", F.crc32(F.col("url")) % n_buckets)


def committed_buckets(spark: SparkSession, out_dir: str) -> list[int]:
    manifest = os.path.join(out_dir, "manifest")
    try:
        return [r["bucket"] for r in spark.read.parquet(manifest).select("bucket").distinct().collect()]
    except Exception:
        return []


def run_with_resume(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = N_BUCKETS,
    max_buckets_this_run: int | None = None,
    filter_fn=None,
) -> dict:
    """Process all not-yet-committed buckets (optionally capped, to simulate
    / bound a run).  Returns {'processed': [...], 'skipped': n}.

    ``filter_fn`` (default ``quality_filter``) must be PER-ROW
    deterministic — bucket idempotency means a crashed run's tail
    buckets reprocess on the next run and must label identically.
    Corpus-dependent stages (the self-trained LM of
    quality_filter_full) are excluded by design: their output depends
    on which buckets are in the batch.  The fast_path variant is fine
    (byte-equivalent per row, tests/test_fast_path.py)."""
    done = set(committed_buckets(spark, out_dir))
    bucketed = _with_bucket(pages, n_buckets)
    if done:
        # anti-join the manifest rather than a driver-side isin list —
        # with thousands of committed buckets the literal list bloats the
        # plan; the manifest side is tiny and broadcasts
        done_df = spark.createDataFrame([(b,) for b in sorted(done)], "bucket bigint")
        todo_df = bucketed.join(F.broadcast(done_df), "bucket", "left_anti")
    else:
        todo_df = bucketed

    todo = sorted(
        r["bucket"] for r in todo_df.select("bucket").distinct().collect()
    )
    if max_buckets_this_run is not None:
        todo = todo[:max_buckets_this_run]
    if not todo:
        # keep the result contract uniform: the normal path returns
        # snapshot_id, so an already-complete resume must too (current
        # snapshot if one exists, else None)
        snaps = list_snapshots(out_dir)
        cur = snaps[-1]["snapshot_id"] if snaps else None
        return {"processed": [], "skipped": len(done), "snapshot_id": cur}

    batch = bucketed.filter(F.col("bucket").isin(todo))
    labeled = (filter_fn or quality_filter)(batch).select(
        "url", "warc_ts", "lang", "lang_pred", "text_clean", "keep", "drop_reason", "bucket"
    )

    data_path = os.path.join(out_dir, "data")
    (
        labeled.repartition("bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(data_path)
    )

    metrics = (
        spark.read.parquet(data_path)
        .filter(F.col("bucket").isin(todo))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.sum(F.length("text_clean")).alias("sum_clean_len"),
        )
    )
    metrics.write.mode("append").parquet(os.path.join(out_dir, "manifest"))
    snap_id = _commit_snapshot(out_dir, done, todo)
    return {"processed": todo, "skipped": len(done), "snapshot_id": snap_id}


# --- snapshot log (the Iceberg commit protocol, isolated here) --------------
#
# After every successful run a snapshot JSON lands via write-temp + atomic
# os.rename:  out_dir/snapshots/v<N>.json
#     {"snapshot_id", "parent_id", "buckets_added", "buckets_total"}
# plus a "current" pointer file (same atomic rename).  Readers get snapshot
# ISOLATION and TIME TRAVEL: read_as_of(spark, out, snapshot_id) sees
# exactly the buckets committed as of that snapshot — concurrent/partial
# writes of later buckets are invisible because the reader filters on the
# snapshot's bucket list, and bucket contents are deterministic.  A crash
# after the manifest append but before the snapshot rename just reprocesses
# the tail buckets (idempotent by bucket determinism).


def _snap_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "snapshots")


def _commit_snapshot(out_dir: str, done: set[int], added: list[int]) -> int:
    import json

    snaps = list_snapshots(out_dir)
    parent = snaps[-1]["snapshot_id"] if snaps else None
    snap_id = (parent or 0) + 1
    total = sorted({int(b) for b in done} | {int(b) for b in added})
    payload = {
        "snapshot_id": snap_id,
        "parent_id": parent,
        "buckets_added": [int(b) for b in added],
        "buckets_total": total,
    }
    d = _snap_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".v{snap_id}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.rename(tmp, os.path.join(d, f"v{snap_id}.json"))
    cur_tmp = os.path.join(d, ".current.tmp")
    with open(cur_tmp, "w") as f:
        f.write(str(snap_id))
    os.rename(cur_tmp, os.path.join(d, "current"))
    return snap_id


def list_snapshots(out_dir: str) -> list[dict]:
    import json
    import re

    d = _snap_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        m = re.fullmatch(r"v(\d+)\.json", name)
        if m:
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return sorted(out, key=lambda s: s["snapshot_id"])


def read_as_of(
    spark: SparkSession, out_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """Time-travel read: the labeled output as of ``snapshot_id`` (default:
    the current snapshot).  Buckets committed later are invisible."""
    snaps = list_snapshots(out_dir)
    if not snaps:
        raise FileNotFoundError(f"no snapshots under {out_dir}")
    by_id = {s["snapshot_id"]: s for s in snaps}
    snap = by_id[snapshot_id] if snapshot_id is not None else snaps[-1]
    data = spark.read.parquet(os.path.join(out_dir, "data"))
    return data.filter(F.col("bucket").isin(snap["buckets_total"]))


def expire_snapshots(out_dir: str, keep_last: int = 3) -> list[int]:
    """Snapshot-log maintenance (the Iceberg expire_snapshots analog):
    delete snapshot files older than the newest ``keep_last``, never the
    current pointer's target.  Returns the expired snapshot ids.

    Safe by construction: bucket DATA is never touched (every surviving
    snapshot's ``buckets_total`` is self-contained — the log is a chain
    of cumulative states, not deltas — so expiring ancestors cannot
    orphan data a survivor needs), and the current pointer is re-read
    after the deletes to assert it still resolves."""
    snaps = list_snapshots(out_dir)
    if len(snaps) <= keep_last:
        return []
    d = _snap_dir(out_dir)
    with open(os.path.join(d, "current")) as f:
        current = int(f.read().strip())
    keep_ids = {s["snapshot_id"] for s in snaps[-keep_last:]} | {current}
    expired = []
    for s in snaps:
        sid = s["snapshot_id"]
        if sid in keep_ids:
            continue
        os.remove(os.path.join(d, f"v{sid}.json"))
        expired.append(sid)
    # postcondition: the pointer still resolves to an existing snapshot
    names = set(os.listdir(d))
    assert f"v{current}.json" in names, "current snapshot must survive expiry"
    return expired
