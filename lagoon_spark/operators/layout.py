"""Partitioned table layout: the partition-pruning half of the
storage-layout story (bucketing.py is the co-located-join half).

At 100 TB the cheapest query is the one that never reads the data:
hive-style directory partitioning on a low-cardinality predicate
column (date, source, language) lets Catalyst prune entire partitions
at planning time — `PartitionFilters` in the scan node, zero I/O for
excluded partitions. Within each partition, sorting by a secondary key
tightens parquet rowgroup min/max bounds so predicate pushdown skips
rowgroups too (poor-man's Z-order; real multi-dim clustering would use
Delta/Iceberg OPTIMIZE ZORDER).

The reference's analog is Postgres indexing (`DB/Indices.hs:48-86` —
b-tree per scalar column); SURVEY §2 A13 maps that to partitioning /
layout, implemented here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet with one writer per partition.

    The ``repartition(*partition_cols)`` aligns task boundaries with
    directory boundaries — without it every task writes a sliver of
    every partition and the layout degrades into small files (the #1
    operational failure of partitioned lakes). AQE coalesces tiny
    partitions; skewed partition values are split by AQE skew handling
    on the shuffle. ``sort_within`` orders rows inside each file so
    rowgroup min/max statistics become selective for that key.
    """
    out = df.repartition(*partition_cols)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset (partition columns recovered from the
    directory structure by Spark's partition discovery)."""
    return spark.read.parquet(path)


def scan_partition_filters(df: DataFrame) -> str:
    """The PartitionFilters clause of the scan node — empty string when
    no pruning applies. Test/diagnostic helper: asserts pruning
    actually reached the scan instead of trusting that it should."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            start = line.index("PartitionFilters")
            return line[start:].split("]", 1)[0] + "]"
    return ""
