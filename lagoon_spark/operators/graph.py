"""Link-graph operators: PageRank over the (domain) link graph.

Crawl pipelines weight documents by the authority of their source
domain (PageRank / harmonic centrality over the host graph — the
public Common Crawl ranking methodology). This is the canonical
ITERATIVE fixpoint on Spark: each iteration is one edge-scale join +
one map-side-combinable aggregate, state is pinned between iterations
(``checkpointing.pin``) so the lineage never re-derives the whole
chain, and every floating sum accumulates FIXED-POINT integers
(``floor(x * 2^40 + 0.5)`` as BIGINT — associative, so shuffle order
cannot change a rank), the same trick as the k-means trainer. The
DuckDB oracle unrolls the identical recipe, so ranks hash-match
bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_FP = 1 << 40


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    *,
    iters: int = 3,
    damping: float = 0.85,
    out_col: str = "pagerank",
) -> DataFrame:
    """PageRank over a directed edge list (multi-edges = weight).

    * nodes = distinct src ∪ dst; initial rank 1/N;
    * edge weight = multiplicity / source out-degree;
    * dangling mass (nodes with no outlinks) redistributes uniformly;
    * rank' = (1-d)/N + d · (Σ in-rank·w + dangling/N).

    Scale shape: per iteration ONE (src)-keyed join edge×rank and one
    (dst)-keyed fixed-point aggregate — both shuffles on graph keys,
    never on pairs; the dangling mass rides a one-row broadcast frame;
    N is counted ONCE before the loop (one node-scale aggregate) and
    enters every iteration as a literal, so no per-iteration broadcast
    of it exists at all; state is ``localCheckpoint``-pinned. Hot
    (celebrity) dst keys partial-aggregate map-side because the sum is
    a plain BIGINT SUM.

    Round-13 shape note: each iteration REBUILDS the rank state from
    the persisted ``flagged`` frame (node, has-outlinks) joined with
    that iteration's contributions, rather than chaining ``pr`` through
    its own previous checkpoint. The round-12 chained shape referenced
    the lazily-checkpointed previous state three times per iteration
    (dangling aggregate, contribution join, rebuild base) and regressed
    6× at local[32] under load (driver PERF_r12: 2.3→14.5 s, 8-core/
    32-core ratio 0.16); rebuilding from the cached invariant keeps the
    loop-invariant dangling flag (no per-iteration anti-join) with only
    two readers of the previous checkpoint, and drops the per-lane job
    count 43→27 (plans/r13/q129 evidence).
    """
    from lagoon_spark.checkpointing import pin, pin_handles

    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
    )
    # weight: multiplicity / out-degree, exact ints → one double division
    cnt = e.groupBy("__s", "__d").agg(F.count(F.lit(1)).alias("__c"))
    outd = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__o"))
    # loop-invariant frames persist once: every iteration's plan
    # references ew/flagged, and without a cache each reference
    # recomputes the whole derivation from the raw edges
    ew = cnt.join(outd, "__s").select(
        "__s", "__d", (F.col("__c") / F.col("__o")).alias("__w")
    ).persist()
    srcs = e.select(F.col("__s").alias("node")).distinct()
    # the dangling SET is loop-invariant: flag it once and carry the
    # flag through the rank state, so each iteration's dangling-mass
    # term is a filter+aggregate instead of a per-iteration anti-join
    # (round 12; guide §2.4 — one exchange per iteration removed)
    flagged = (
        nodes.join(srcs.withColumn("__has_out", F.lit(True)), "node", "left")
        .select(
            "node", F.coalesce("__has_out", F.lit(False)).alias("__out")
        )
        .persist()
    )
    # N is loop-invariant and scalar: one count materializes `flagged`
    # and replaces a per-iteration one-row broadcast exchange (and its
    # job) with a literal. Arithmetic is unchanged: the oracle divides
    # by the same integer count cast to double.
    n_nodes = flagged.count()
    # clamp 0→1 so constant folding never divides by zero on an empty
    # graph (the rank frame has no rows then; values are unreachable)
    ncol = F.lit(n_nodes or 1).cast("long")
    pr = flagged.select(
        "node", "__out", (F.lit(1.0) / ncol).alias("__pr")
    )
    fp = F.lit(float(PR_FP))
    for _ in range(iters):
        dang = (
            pr.filter(~F.col("__out"))
            .agg(
                F.coalesce(
                    F.sum(
                        F.floor(F.col("__pr") * fp + F.lit(0.5)).cast("long")
                    ),
                    F.lit(0).cast("long"),
                ).alias("__dangfp")
            )
        )
        contrib = (
            ew.join(pr, ew["__s"] == pr["node"])
            .select(
                F.col("__d").alias("node"),
                F.floor(F.col("__pr") * F.col("__w") * fp + F.lit(0.5))
                .cast("long")
                .alias("__cfp"),
            )
            .groupBy("node")
            .agg(F.sum("__cfp").alias("__cfp"))
        )
        pr = pin(
            flagged.crossJoin(F.broadcast(dang))
            .join(contrib, "node", "left")
            .select(
                "node",
                "__out",
                (
                    F.lit(1.0 - damping) / ncol
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__cfp"), F.lit(0)).cast("double")
                        / fp
                        + (F.col("__dangfp").cast("double") / fp)
                        / ncol
                    )
                ).alias("__pr"),
            ),
            eager=False,
        )
    # materialize the node-scale result once, then free the persisted
    # loop invariants — callers get a pinned frame with no cache debt;
    # intermediate lazy checkpoints are GC-reclaimed by ContextCleaner
    out = pin(pr.select("node", F.round("__pr", 9).alias(out_col)))
    for invariant in (flagged, ew):
        invariant.unpersist()
    # the result IS a checkpoint: hand it to the caller as its own
    # handle so checkpointing.release(out) can free the blocks (plain
    # DataFrame.unpersist cannot reach localCheckpoint block storage)
    return pin_handles(out, out)


def pagerank_oracle_sql(
    edges_sql: str,
    *,
    iters: int = 3,
    damping: float = 0.85,
    final_select: str | None = None,
) -> str:
    """The identical unrolled recipe as DuckDB SQL. ``edges_sql`` must
    yield (src, dst) rows; ``damping`` literals are rendered with repr
    so both engines parse the identical doubles."""
    fp = float(PR_FP)
    ctes = [
        f"e AS ({edges_sql})",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION SELECT dst FROM e))",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "cnt AS (SELECT src, dst, COUNT(*) AS c FROM e GROUP BY src, dst)",
        "outd AS (SELECT src, COUNT(*) AS o FROM e GROUP BY src)",
        "ew AS (SELECT cnt.src, cnt.dst, cnt.c / outd.o AS w"
        " FROM cnt JOIN outd ON outd.src = cnt.src)",
        "srcs AS (SELECT DISTINCT src FROM e)",
        "pr0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn)",
    ]
    for t in range(1, iters + 1):
        p = f"pr{t - 1}"
        ctes.append(
            f"d{t} AS (SELECT COALESCE(CAST(SUM(CAST(floor(pr * {fp!r} + 0.5)"
            f" AS BIGINT)) AS BIGINT), 0) AS dangfp"
            f" FROM {p} LEFT JOIN srcs ON {p}.node = srcs.src"
            " WHERE srcs.src IS NULL)"
        )
        ctes.append(
            f"c{t} AS (SELECT dst AS node,"
            f" CAST(SUM(CAST(floor(pr * w * {fp!r} + 0.5) AS BIGINT))"
            f" AS BIGINT) AS cfp"
            f" FROM ew JOIN {p} ON {p}.node = ew.src GROUP BY dst)"
        )
        ctes.append(
            f"pr{t} AS (SELECT nodes.node,"
            f" {1.0 - damping!r} / nn.n"
            f" + {damping!r} * (CAST(COALESCE(c{t}.cfp, 0) AS DOUBLE)"
            f" / {fp!r}"
            f" + (CAST(d{t}.dangfp AS DOUBLE) / {fp!r}) / nn.n) AS pr"
            f" FROM nodes CROSS JOIN nn CROSS JOIN d{t}"
            f" LEFT JOIN c{t} ON c{t}.node = nodes.node)"
        )
    body = ",\n".join(ctes)
    tail = final_select or (
        f"SELECT node, round(pr, 9) AS pagerank FROM pr{iters}"
    )
    return f"WITH {body}\n{tail}"
