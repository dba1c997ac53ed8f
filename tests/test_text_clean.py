"""Corpus-cleaning operators: PII redaction, normalization, boilerplate
line removal, embedding quantization, count-min sketch properties."""

from __future__ import annotations

from lagoon_spark.operators import text
from lagoon_spark.operators.corpus import remove_boilerplate_lines
from lagoon_spark.operators.similarity import quantize_embeddings
from lagoon_spark.operators.sketches import cms_token_estimates


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "ssn 123-45-6789 phone 555-123-4567 done"),
            (3, "host 192.168.0.1 up"),
            (4, "clean text stays"),
        ],
        "id long, t string",
    )
    got = {r["id"]: r["r"] for r in df.select("id", text.redact_pii("t").alias("r")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "ssn <SSN> phone <PHONE> done"
    assert got[3] == "host <IP> up"
    assert got[4] == "clean text stays"


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co c@d.io and 10.0.0.1")], "id long, t string"
    )
    counts = text.pii_counts("t")
    row = df.select(
        *[c.alias(k) for k, c in counts.items()]
    ).collect()[0]
    assert row["email"] == 2
    assert row["ipv4"] == 1
    assert row["ssn"] == 0


def test_normalize_text(spark):
    df = spark.createDataFrame([(1, "  MiXeD   Case\t\ttabs  ")], "id long, t string")
    got = df.select(text.normalize_text("t").alias("n")).collect()[0]["n"]
    assert got == "mixed case tabs"


def test_boilerplate_removal_multiline(spark):
    footer = "all rights reserved"
    docs = [
        (1, "alpha body\n" + footer),
        (2, "beta body\n" + footer),
        (3, "gamma body\n" + footer),
        (4, footer),  # all-boilerplate doc -> empty
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(
            df, "doc_id", "text", max_docs=2
        ).collect()
    }
    assert out[1] == "alpha body"
    assert out[2] == "beta body"
    assert out[3] == "gamma body"
    assert out[4] == ""


def test_boilerplate_line_order_preserved(spark):
    df = spark.createDataFrame(
        [(1, "z last\ncommon\na first"), (2, "common\nmid"), (3, "common\nother")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(df, "doc_id", "text", max_docs=2).collect()
    }
    # surviving lines keep original document order, not sorted order
    assert out[1] == "z last\na first"


def test_quantize_embeddings_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df, "embedding").collect()}
    q1, s1 = rows[1]["quantized"], rows[1]["scale"]
    # absmax element maps to ±127 exactly; others reconstruct within 1/scale
    assert min(q1) == -127
    for orig, q in zip([0.5, -1.0, 0.25], q1):
        assert abs(q / s1 - orig) <= 0.5 / s1 + 1e-12
    # zero vector: scale 1.0, all-zero codes (no div-by-zero)
    assert rows[2]["quantized"] == [0, 0, 0]
    assert rows[2]["scale"] == 1.0


def test_cms_upper_bound_property(spark):
    # tiny width forces collisions: estimates must stay >= exact, and
    # equal exact when width is ample
    df = spark.createDataFrame(
        [(i, "alpha beta gamma " + ("alpha" if i % 2 else "delta")) for i in range(40)],
        "doc_id long, text string",
    )
    probes = ["alpha", "beta", "delta", "absent_tok"]
    tight = {
        r["token"]: r
        for r in cms_token_estimates(df, "text", probes, depth=2, width=8).collect()
    }
    for t in probes:
        assert tight[t]["est_count"] >= tight[t]["exact_count"]
    wide = {
        r["token"]: r
        for r in cms_token_estimates(df, "text", probes, depth=4, width=4096).collect()
    }
    assert all(wide[t]["est_count"] == wide[t]["exact_count"] for t in probes)
    assert wide["absent_tok"]["exact_count"] == 0


def test_kmeans_deterministic_and_improving(spark, sf_small):
    from lagoon_spark.operators.similarity import ivf_assign, kmeans_fit_predict
    from lagoon_spark.session import register_views

    register_views(spark, sf_small)
    emb = spark.table("embeddings")

    def sse(centroids, assigned):
        # per-row distance to its assigned centroid
        rows = assigned.join(emb, "vec_id").collect()
        tot = 0.0
        for r in rows:
            c = centroids[r["cell"]]
            tot += sum(
                (float(x) - y) ** 2 for x, y in zip(r["embedding"], c)
            )
        return tot

    a1, c1 = kmeans_fit_predict(emb, "vec_id", "embedding", k=8, iters=1, dim=64)
    a2, c2 = kmeans_fit_predict(emb, "vec_id", "embedding", k=8, iters=2, dim=64)
    a2b, c2b = kmeans_fit_predict(emb, "vec_id", "embedding", k=8, iters=2, dim=64)

    # determinism: identical assignments and centroids across runs
    assert c2 == c2b
    assert sorted(map(tuple, a2.collect())) == sorted(map(tuple, a2b.collect()))
    # Lloyd monotonicity: SSE after 2 rounds <= after 1 round
    assert sse(c2, a2) <= sse(c1, a1) + 1e-9
    # every vector assigned to a valid cell
    cells = {r["cell"] for r in a2.select("cell").distinct().collect()}
    assert cells <= set(range(8))


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd"), (4, ""), (5, "aab")],
        "id long, t string",
    )
    got = {
        r["id"]: r["e"]
        for r in df.select("id", text.char_entropy("t").alias("e")).collect()
    }
    assert got[1] == 0.0  # single symbol: no information
    assert got[2] == 1.0  # two equiprobable symbols: 1 bit
    assert got[3] == 2.0  # four equiprobable symbols: 2 bits
    assert got[4] == 0.0  # empty: defined as 0
    assert got[5] == 0.918296  # -(2/3 log2 2/3 + 1/3 log2 1/3)


def test_canonicalize_url_cases(spark):
    cases = {
        "HTTPS://Host.Example.COM:443/Path/Sub/?q=1#frag":
            "https://host.example.com/Path/Sub/?q=1",
        "http://EX.com:80/": "http://ex.com",
        "http://ex.com:8080/a": "http://ex.com:8080/a",  # non-default port kept
        "https://ex.com": "https://ex.com",
        "https://ex.com/A/B//": "https://ex.com/A/B",  # path case preserved
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = [
        r["c"]
        for r in df.select(text.canonicalize_url("u").alias("c")).collect()
    ]
    assert got == list(cases.values())


def test_extract_urls_order_and_case(spark):
    df = spark.createDataFrame(
        [("see http://a.com/x and HTTPS://B.org/#z end",)], "t string"
    )
    assert df.select(text.extract_urls("t").alias("u")).collect()[0]["u"] == [
        "http://a.com/x",
        "HTTPS://B.org/#z",
    ]


# --- Gopher / C4 cleaners: python-reference fuzz --------------------------


def _py_gopher(body, stops=("the", "be", "to", "of", "and", "that", "have", "with")):
    import re as _re

    w = [x for x in _re.split(r"[ \n]", body) if x]
    lines = [x for x in body.split("\n") if x]
    nw1 = max(len(w), 1)
    nl1 = max(len(lines), 1)
    hashes = body.count("#")
    ells = (len(body) - len(body.replace("...", ""))) / 3
    return {
        "n_words": len(w),
        "mean_word_len": round(sum(len(x) for x in w) / nw1, 6),
        "alpha_word_frac": round(
            sum(1 for x in w if _re.search("[a-z]", x.lower())) / nw1, 6
        ),
        "n_stopwords": sum(1 for x in w if x.lower() in stops),
        "symbol_word_ratio": round((hashes + ells) / nw1, 6),
        "bullet_line_frac": round(
            sum(1 for x in lines if x.startswith(("- ", "* "))) / nl1, 6
        ),
        "ellipsis_line_frac": round(
            sum(1 for x in lines if x.endswith("...")) / nl1, 6
        ),
    }


def _py_c4(body):
    lines = [x for x in body.split("\n") if x]
    kept = [
        l
        for l in lines
        if l.endswith((".", "!", "?", '"'))
        and len([w for w in l.split(" ") if w]) >= 5
        and "javascript" not in l.lower()
    ]
    clean = "\n".join(kept)
    n_sent = sum(clean.count(c) for c in ".!?")
    bad = "lorem ipsum" in body.lower() or "{" in body.lower()
    return {
        "n_lines": len(lines),
        "n_kept_lines": len(kept),
        "n_sentences": n_sent,
        "keep": (not bad) and n_sent >= 3,
        "clean_text": clean,
    }


def test_gopher_and_c4_match_python_reference_on_fuzzed_bodies(spark):
    """Randomized multi-line bodies (bullets, ellipses, symbols, short
    and unpunctuated lines, lorem ipsum, braces, unicode) — the Spark
    JVM expressions must agree with a direct python implementation."""
    import random

    rng = random.Random(7)
    frags = [
        "the quick brown fox jumps over it.",
        "- bullet item one",
        "* starred item",
        "to be continued...",
        "short.",
        "no terminal punctuation here",
        "lorem ipsum dolor sit amet.",
        "function() { return; }",
        "numbers 123 456 789 here too.",
        "### ## #",
        "is that a question with many words inside?",
        'he said "quoted words are fine too."',
        "THE LOUD HEADING WITH The Mixed Case.",
        "éléphant café touché.",
        "the of and with that have be to.",
    ]
    bodies = []
    for i in range(60):
        n = rng.randint(1, 7)
        bodies.append("\n".join(rng.choice(frags) for _ in range(n)))
    bodies += ["", " ", "\n\n", "...", "#"]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(bodies)], "id long, body string"
    )

    sig = text.gopher_signals("body")
    got = {
        r["id"]: r
        for r in df.select(
            "id", *[c.alias(k) for k, c in sig.items()]
        ).collect()
    }
    for i, b in enumerate(bodies):
        want = _py_gopher(b)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v, b)

    from lagoon_spark.operators.corpus import c4_clean

    got4 = {r["id"]: r for r in c4_clean(df, "id", "body").collect()}
    for i, b in enumerate(bodies):
        want = _py_c4(b)
        for k, v in want.items():
            assert got4[i][k] == v, (i, k, got4[i][k], v, b)
