#!/usr/bin/env python
"""Two-cluster-size scaling pairs for a SECOND and THIRD op family
(VERDICT r3 next-round #8): shuffle-path MERGE and the storage-
partitioned join, alongside tools/bench_scaling.py's Z-order rewrite.

Protocol identical to the r2/r3 study: run THIS script once per
parallelism level (SPARK_GRAFT_CPUS=1 then =4) in interleaved pairs,
same input per JVM, zstd (prod-like CPU-per-byte so core scaling is
measurable on one box), R rounds per op with round 0 absorbing
JIT/page-cache warmup, report per-round walls + the min over rounds
>= 1. Efficiency = T(1) / (4 * T(4)) pooled over the per-level minima.

- MERGE rounds: a 10%-of-keys COW upsert forced down the SHUFFLE path
  (strategy="shuffle" — one hash exchange per side, the 10^12-row
  plan), identical cost per round (same key set, same touched-file
  volume; snapshots expired between rounds to cap disk).
- SPJ rounds: bucket(16, clip_id) clips table joined to a same-bucketed
  derived side, full payload decode + pandas merge per bucket task,
  reduced by a count+sum so every byte is produced.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
N_CLIPS = int(os.environ.get("SPARK_GRAFT_SCALE_CLIPS", "16384"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "3"))
TARGET_MB = int(os.environ.get("SPARK_GRAFT_SCALE_TARGET_MB", "64"))
N_BUCKETS = 16
# which op families to run this invocation (comma list) — a large-N
# merge-only pair needn't pay for the SPJ rounds
OPS = set(
    s.strip()
    for s in os.environ.get("SPARK_GRAFT_SCALE_OPS", "merge,spj").split(",")
    if s.strip()
)
_unknown = OPS - {"merge", "spj"}
if _unknown or not OPS:
    # a typo must not silently emit a value=null run into the jsonl
    raise SystemExit(
        f"SPARK_GRAFT_SCALE_OPS: unknown op(s) {sorted(_unknown)} "
        "(valid: merge, spj)"
    )


def main() -> None:
    from pyspark.sql import functions as F

    from lakehouse import Table
    from lakehouse.schema import CLIPS_SCHEMA
    from lakehouse.session import build_session
    from lakehouse.spj import storage_partitioned_join
    from lakehouse.synth import synth_clips_df

    spark = build_session(
        "lakehouse-scaling-ops",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    codec = os.environ.get("SPARK_GRAFT_SCALE_CODEC", "zstd")
    spark.conf.set("spark.sql.parquet.compression.codec", codec)
    level = os.environ.get("SPARK_GRAFT_SCALE_ZSTD_LEVEL", "9")
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.compression.codec.zstd.level", level
    )
    work = tempfile.mkdtemp(prefix="lh_scale_ops_")
    out: dict = {
        "metric": "merge_spj_scaling",
        "unit": "sec",
        "cpus": CPUS,
        "clips": N_CLIPS,
        "codec": codec,
        "zstd_level": int(level),
    }
    try:
        bucket_spec = [
            {
                "name": "cid_bucket",
                "transform": "bucket",
                "source": "clip_id",
                "n": N_BUCKETS,
            }
        ]
        t = Table.create(
            spark, os.path.join(work, "clips"), CLIPS_SCHEMA,
            partition_spec=bucket_spec,
        )
        t0 = time.time()
        for i in range(8):
            t.append(
                synth_clips_df(
                    spark, N_CLIPS // 8, start=i * (N_CLIPS // 8),
                    seed=42, n_days=4, num_partitions=max(CPUS, 4),
                ),
                target_file_count=4,
            )
        out["synth_secs"] = round(time.time() - t0, 2)
        t0 = time.time()
        t.compact(target_file_size=TARGET_MB * 1024 * 1024)
        out["compact_secs"] = round(time.time() - t0, 2)
        out["table_gb"] = round(
            sum(e.file_size_bytes for e in t.live_files()) / 1e9, 3
        )

        # --- shuffle-path MERGE rounds ---------------------------------
        merge_secs = []
        for r in range(ROUNDS if "merge" in OPS else 0):
            src = (
                t.scan()
                .filter(F.xxhash64("clip_id") % 10 == 0)
                .withColumn(
                    "transcript",
                    F.concat(F.col("transcript"), F.lit(f" [m{r}]")),
                )
            )
            t0 = time.time()
            t.merge(src, key="clip_id", strategy="shuffle")
            merge_secs.append(round(time.time() - t0, 2))
            t.expire_snapshots(keep_last=1)
            t.remove_orphan_files(
                older_than_ms=int(time.time() * 1000) + 60_000
            )
        if merge_secs:
            out["merge_secs"] = merge_secs
            out["merge_best"] = (
                min(merge_secs[1:]) if len(merge_secs) > 1 else merge_secs[0]
            )

        # --- SPJ rounds -------------------------------------------------
        # same-bucketed derived side (transcript projection re-tabled);
        # the join decodes every clips payload bucket-locally
        if "spj" not in OPS:
            out["value"] = out.get("merge_best")
            print(json.dumps(out))
            return
        side = Table.create(
            spark, os.path.join(work, "side"),
            t.scan().select("clip_id", "transcript").schema,
            partition_spec=bucket_spec,
        )
        side.append(
            t.scan().select(
                "clip_id",
                F.upper(F.col("transcript")).alias("transcript"),
            ),
            target_file_count=max(CPUS, 4),
        )
        spj_secs = []
        for r in range(ROUNDS):
            t0 = time.time()
            row = (
                storage_partitioned_join(
                    t, side, on="clip_id",
                    select_a=["bytes", "dur_ms"],
                    select_b=["transcript"],
                )
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.length("bytes")).alias("b"),
                )
                .collect()[0]
            )
            assert row["n"] == N_CLIPS, row
            spj_secs.append(round(time.time() - t0, 2))
        out["spj_secs"] = spj_secs
        out["spj_best"] = min(spj_secs[1:]) if ROUNDS > 1 else spj_secs[0]
        out["value"] = out.get("merge_best", out["spj_best"])
        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
