"""Portable HyperLogLog: accuracy and cross-engine-exactness properties."""

from __future__ import annotations

import duckdb
import pytest

from lagoon_spark.operators.sketches import hll_distinct, hll_oracle_sql


@pytest.mark.parametrize("n_distinct", [30, 500, 5000])
def test_hll_accuracy(spark, n_distinct):
    df = spark.range(n_distinct * 3).selectExpr(
        "'g' AS g", f"id % {n_distinct} AS v"
    )
    est = hll_distinct(df, ["g"], "v", p=8).collect()[0]["approx_distinct"]
    # p=8 → standard error 1.04/sqrt(256) ≈ 6.5% (3σ ≈ 20%); n ≈ 2m sits
    # in the classic linear-counting↔raw crossover where plain HLL is
    # biased high (the gap HLL++'s empirical bias tables close) — 25%
    # bounds all three regimes without bias correction
    assert abs(est - n_distinct) / n_distinct < 0.25


def test_hll_matches_duckdb_exactly(spark, tmp_path):
    """The whole point: identical estimate bits from both engines."""
    out = str(tmp_path / "vals.parquet")
    spark.range(10_000).selectExpr(
        "CAST(id % 7 AS STRING) AS g", "id * 13 % 4096 AS v"
    ).write.parquet(out)
    got = {
        r["g"]: r["approx_distinct"]
        for r in hll_distinct(
            spark.read.parquet(out), ["g"], "v", p=8
        ).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{out}/*.parquet'")
    want = dict(
        con.execute(
            hll_oracle_sql("t", ["g"], "v", p=8) + ""
        ).fetchall()
    )
    assert got == want  # bit-identical, not approximately equal


def test_hll_negative_values_match_duckdb(spark, tmp_path):
    """Negative inputs exercise the pmod fold: Spark's truncating and
    DuckDB's flooring division diverge on negative hashes, so the
    non-negative residue mapping is what keeps the bits identical."""
    out = str(tmp_path / "negs.parquet")
    spark.range(5_000).selectExpr(
        "CAST(id % 3 AS STRING) AS g", "(id * 13 % 4096) - 2048 AS v"
    ).write.parquet(out)
    got = {
        r["g"]: r["approx_distinct"]
        for r in hll_distinct(spark.read.parquet(out), ["g"], "v", p=8).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{out}/*.parquet'")
    want = dict(con.execute(hll_oracle_sql("t", ["g"], "v", p=8)).fetchall())
    assert got == want


def test_hll_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", None), ("g", 2)], ["g", "v"]
    )
    est = hll_distinct(df, ["g"], "v", p=8).collect()[0]["approx_distinct"]
    assert est == pytest.approx(2.0, abs=0.1)


def test_histogram_quantiles_error_bound(spark, sf_small):
    from lagoon_spark.operators.sketches import histogram_quantiles
    from lagoon_spark.session import register_views
    import pyspark.sql.functions as F

    register_views(spark, sf_small)
    li = spark.table("lineitem")
    step = 64
    est = {
        r["l_returnflag"]: r
        for r in histogram_quantiles(
            li, ["l_returnflag"], "l_extendedprice", step=step, pcts=[50, 90]
        ).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").alias("e50"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)").alias("e90"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for flag, row in est.items():
        assert row["n_rows"] == exact[flag]["n"]
        # the sketch's integer rank crossing IS percentile_disc's
        # definition (smallest v with CDF >= p), so the disc value lies
        # inside the crossing bin: lower-edge estimate within one step
        assert row["p50"] <= exact[flag]["e50"] <= row["p50"] + step
        assert row["p90"] <= exact[flag]["e90"] <= row["p90"] + step
