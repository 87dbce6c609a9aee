#!/usr/bin/env python
"""Pure-JVM CPU scaling control: zero engine code, zero IO.

Chained xxhash64 over ``spark.range`` — embarrassingly parallel compute
with no shuffle and no disk — bounds what ANY workload can achieve on
this box at a given parallelism pair. Run it interleaved with the
engine study on the same day: the engine's efficiency is judged against
THIS ceiling, not against an ideal 4.0x the hardware never delivers.

Usage: SPARK_GRAFT_CPUS=4 python tools/cpu_control.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
ROWS = int(os.environ.get("SPARK_GRAFT_CONTROL_ROWS", str(20_000_000)))
# deep chains overflow the column-conversion stack; 120 is safe
CHAIN = int(os.environ.get("SPARK_GRAFT_CONTROL_CHAIN", "120"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_CONTROL_ROUNDS", "3"))


def main() -> None:
    from pyspark.sql import functions as F

    from lakehouse.session import build_session

    spark = build_session(
        "cpu-control", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    expr = F.col("id")
    for i in range(CHAIN):
        expr = F.xxhash64(expr, F.lit(i))
    walls = []
    for _ in range(ROUNDS):
        t0 = time.time()
        spark.range(ROWS, numPartitions=CPUS * 4).select(
            expr.alias("h")
        ).agg(F.sum(F.expr("h % 1000000"))).collect()
        walls.append(round(time.time() - t0, 2))
    best = min(walls[1:]) if len(walls) > 1 else walls[0]
    print(
        json.dumps(
            {
                "metric": "pure_cpu_control",
                "value": best,
                "unit": "sec",
                "cpus": CPUS,
                "rows": ROWS,
                "chain": CHAIN,
                "walls": walls,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
