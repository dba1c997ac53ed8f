"""SQL-UDF surface of the text-pipeline scalars: values must be
bit-identical to the DataFrame operators, and the functions must be
reachable (and pass the fail-closed security walk) through the
engine's `/sql` passthrough."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_sql_udfs_match_dataframe_operators(spark, sf_small):
    from lagoon_spark.functions.text_sql import register_text_sql_functions
    from lagoon_spark.operators import text
    from lagoon_spark.operators.dedup import minhash_signature
    from lagoon_spark.session import register_views

    register_text_sql_functions(spark)
    register_views(spark, sf_small)

    sql_side = spark.sql(
        """
        SELECT doc_id,
               lagoon_token_count(text) AS tc,
               lagoon_fingerprint(text) AS fp,
               lagoon_lang_id(text) AS lang,
               lagoon_stopword_ratio(text) AS swr,
               lagoon_mean_token_len(text) AS mtl,
               lagoon_normalize(text) AS norm,
               lagoon_minhash16(text) AS mh
        FROM documents
        """
    )
    docs = spark.table("documents")
    df_side = minhash_signature(
        docs, "text", num_hashes=16, method="portable", out_col="mh"
    ).select(
        "doc_id",
        text.token_count("text").cast("long").alias("tc"),
        text.fingerprint("text").alias("fp"),
        text.lang_id("text").alias("lang"),
        text.stopword_ratio("text").alias("swr"),
        text.mean_token_len("text").alias("mtl"),
        text.normalize_text("text").alias("norm"),
        "mh",
    )
    a = {r["doc_id"]: tuple(r)[1:] for r in sql_side.collect()}
    b = {r["doc_id"]: tuple(r)[1:] for r in df_side.collect()}
    assert a == b


def test_sql_udfs_stay_jvm_side(spark, sf_small):
    from lagoon_spark.functions.text_sql import register_text_sql_functions
    from lagoon_spark.session import register_views

    register_text_sql_functions(spark)
    register_views(spark, sf_small)
    plan = (
        spark.sql("SELECT lagoon_minhash16(text) AS mh FROM documents")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_text_udfs_callable_through_sql_passthrough(lagoon, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "id,body\n"
        "1,the cat and the dog is here\n"
        "2,le chat est la et le chien est la\n"
    )
    info = lagoon.ingest(str(p), "textdocs")
    view = info.view_name
    rows = lagoon.sql(
        f"SELECT lagoon_lang_id(body) AS lang, lagoon_token_count(body) AS n "
        f"FROM {view} ORDER BY n"
    ).collect()
    assert [(r["lang"], r["n"]) for r in rows] == [("en", 7), ("fr", 9)]


def test_denied_user_cannot_reach_text_udfs(lagoon, tmp_path):
    from lagoon_spark.security import QueryDenied

    p = tmp_path / "docs2.csv"
    p.write_text("id,body\n1,hello world\n")
    info = lagoon.ingest(str(p), "privdocs")
    with pytest.raises(QueryDenied):
        lagoon.sql(
            f"SELECT lagoon_token_count(body) FROM {info.view_name}",
            user="mallory",
        )


def test_c4_and_gopher_sql_match_dataframe(spark):
    """lagoon_c4_clean / lagoon_c4_keep / lagoon_gopher_keep must agree
    with the operator-library columns on multi-line bodies."""
    from pyspark.sql import functions as F

    from lagoon_spark.operators.corpus import c4_clean
    from lagoon_spark.operators.text import gopher_keep, gopher_signals

    bodies = [
        "the quick brown fox jumps over the dog.\nshort.\nno punct here",
        "lorem ipsum dolor sit amet.\na good long sentence with words here.",
        "a good long sentence with many fine words.\n"
        "is this a second good sentence right here?\n"
        "yes it is a third good sentence here!",
        "function() { return; }\nthe code page is dropped entirely.",
        "- bullet one\n- bullet two\nthe only real sentence is this one.",
        "to be continued...\nanother fine sentence with the many words.",
        "",
    ]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(bodies)], "id long, t string"
    )
    from lagoon_spark.functions.text_sql import register_text_sql_functions

    df.createOrReplaceTempView("bodies_sql_test")
    register_text_sql_functions(spark)
    got = {
        r["id"]: r
        for r in spark.sql(
            "SELECT id, lagoon_c4_clean(t) AS c, lagoon_c4_keep(t) AS k, "
            "lagoon_gopher_keep(t, 5, 1000) AS g FROM bodies_sql_test"
        ).collect()
    }
    cleaned = {r["id"]: r for r in c4_clean(df, "id", "t").collect()}
    sig = gopher_signals("t")
    gk = {
        r["id"]: r["g"]
        for r in df.select(
            "id",
            gopher_keep(sig, min_words=5, max_words=1000).alias("g"),
        ).collect()
    }
    for i in range(len(bodies)):
        assert got[i]["c"] == cleaned[i]["clean_text"], i
        assert got[i]["k"] == cleaned[i]["keep"], i
        assert got[i]["g"] == gk[i], i
