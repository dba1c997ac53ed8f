"""Bucketed storage for co-located joins.

At 100 TB the biggest recurring cost is shuffling fact tables for
joins on a stable key (orders ⋈ lineitem on orderkey, any
signature/bucket table from the dedup pipeline). Writing both sides
bucketed by the join key lets every subsequent join run with NO
exchange on either side — the classic storage-for-shuffle trade the
reference delegates to Postgres indexes and Spark expresses as
bucketed tables (or Delta/Iceberg clustering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed managed table.

    ``num_buckets`` should track cluster parallelism and per-bucket
    size (≤ ~200 MB per bucket-file at the target scale); ``sort_by``
    additionally sorts within buckets so sort-merge joins skip their
    sort phase too.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-key bucketed tables (exchange-free when bucket
    specs line up; verified in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
