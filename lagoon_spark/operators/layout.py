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


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out_col: str = "zorder",
) -> DataFrame:
    """Append a Z-order (Morton) key interleaving ``bits``-wide rank
    buckets of each column — multi-dimensional clustering so a later
    range-partition + sort tightens parquet min/max bounds in EVERY
    listed dimension at once (single-column sort helps only its own
    column; public technique, the one behind Delta/Iceberg
    OPTIMIZE ZORDER).

    Buckets are order-preserving and row-local: numeric columns scale
    by the (metadata-sized, one tiny aggregate) global min/max; string
    columns use the first four bytes as a base-256 code — order-exact
    for ASCII prefixes. Bit interleaving is a pure integer expression:
    bit k of column i lands at position k·ncols + i.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import NumericType, StringType

    levels = (1 << bits) - 1
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs = []
    for c in cols:
        if isinstance(schema[c], NumericType):
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    stats = df.agg(*aggs).collect()[0].asDict() if aggs else {}

    buckets = []
    for c in cols:
        if isinstance(schema[c], NumericType):
            raw_mn, raw_mx = stats[f"__mn_{c}"], stats[f"__mx_{c}"]
            if raw_mn is None or raw_mx is None:
                # empty table / all-NULL column: every row lands in
                # bucket 0 (a constant dimension), instead of a
                # TypeError three frames away from the real cause
                buckets.append(F.lit(0).cast("long"))
                continue
            mn, mx = float(raw_mn), float(raw_mx)
            span = (mx - mn) or 1.0
            b = F.least(
                F.lit(levels),
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * levels
                ).cast("long"),
            )
        elif isinstance(schema[c], StringType):
            code = F.lit(0).cast("long")
            for i in range(1, 5):
                code = code * 256 + F.coalesce(
                    F.ascii(F.substring(F.col(c), i, 1)), F.lit(0)
                )
            # 4 bytes → 32 bits; keep the top `bits`
            b = F.shiftright(code, 32 - bits).cast("long")
        else:
            raise TypeError(f"zorder_key: unsupported column type for {c}")
        buckets.append(F.coalesce(b, F.lit(0)))

    n = len(cols)
    z = F.lit(0).cast("long")
    for k in range(bits):
        for i, b in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(b, k).bitwiseAND(F.lit(1)), k * n + i
            )
    return df.withColumn(out_col, z)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Z-order of ``cols``: range
    partition on the key (parallel, sampled boundaries — no global
    sort), sort within each file, drop the key. Every listed column's
    per-file/rowgroup min-max becomes selective, so point/range
    predicates on ANY of them skip most files at scan time."""
    keyed = zorder_key(df, cols, bits=bits)
    part = (
        keyed.repartitionByRange(num_files, "zorder")
        if num_files
        else keyed.repartitionByRange("zorder")
    )
    part.sortWithinPartitions("zorder").drop("zorder").write.mode(mode).parquet(
        path
    )
