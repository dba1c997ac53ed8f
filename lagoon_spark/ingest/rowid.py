"""Deterministic 1-based row identity in file order (`ix`).

The reference zips the ingest stream with [1..]
(`src/backend/src/Lagoon/Util/Conduit.hs:37-60`, used at
`Ingest.hs:192,243`). Golden outputs and the multi-part (foreign-key)
ingest depend on this numbering, so it must be deterministic — and at
100 TB it must not involve a global sort or a driver collect of data.

Implementation: ``monotonically_increasing_id()`` is
``(partition_id << 33) + row_index_in_partition`` with a *dense*
per-partition index, and Spark's file-scan partition order is
deterministic for a given file listing. So:

1. one tiny job collects per-partition row counts (counts only — bytes
   proportional to #partitions, not #rows);
2. a broadcast offset map turns (partition_id, local_index) into the
   global 1-based ix.

Two narrow scans, no shuffle, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_ix(df: DataFrame, ix_col: str = "ix") -> DataFrame:
    tagged = df.withColumn("__mid", F.monotonically_increasing_id())
    tagged = tagged.withColumn("__pid", F.spark_partition_id())
    counts = (
        tagged.groupBy("__pid").count().collect()
    )  # #partitions rows — metadata-sized
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["count"]
    mapping = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    local = F.col("__mid") - (F.col("__pid").cast("long") * F.lit(1 << 33))
    return (
        tagged.withColumn(ix_col, (mapping[F.col("__pid")] + local + 1).cast("long"))
        .drop("__mid", "__pid")
    )
