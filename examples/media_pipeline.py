"""Multimodal + vector-index tour: real media bytes, no codec library.

Demonstrates round 7's real-bytes media plane and the persisted vector
index at demo scale:

1. synthesize REAL containers (PNG / WAV / animated GIF) from the
   documents table with the engine's stdlib encoders;
2. decode them back through the Arrow-batched operators (stdlib
   decoders — the same seam picks PIL/librosa automatically where
   installed) and verify the round trip;
3. ingest an embedding corpus, build the persisted IVF ANN index, run
   a probe search (reads only nprobe cell directories — never the
   source table), then rebuild it as IVFADC (residual PQ codes) and
   probe through the ADC-shortlist + exact-re-rank path;
4. dedup the corpus into a survivor version with ``reindex=True`` so
   the new version is searchable immediately.

Run: ``python examples/media_pipeline.py [sf_dir]`` (default
``/root/testdata/sf0.001``).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lagoon_spark.engine import Lagoon
from lagoon_spark.multimodal_queries import m06, m07, m08
from lagoon_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lagoon_media_pipeline", cpus="4")

    # -- 1+2. real-bytes codec round-trips (each is a registry query) -----
    for name, fn, cols in (
        ("PNG", m06, ("width", "height")),
        ("WAV", m07, ("n_frames", "sample_rate")),
        ("GIF", m08, ("n_frames", "width")),
    ):
        out = fn(spark, sf_dir)
        n = out.count()
        sample = out.orderBy("id").first()
        digest_col = out.columns[-1]  # *_digest by construction
        print(f"{name}: decoded {n} real containers; first asset "
              + ", ".join(f"{c}={sample[c]}" for c in cols)
              + f", {digest_col}={sample[digest_col][:12]}…")

    # -- 3. persisted ANN index over an ingested embedding source ---------
    wh = tempfile.mkdtemp(prefix="lagoon_media_wh_")
    eng = Lagoon(spark, wh, user="demo")
    eng.init_db()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = emb.select("embedding").limit(64).collect()
    src = os.path.join(wh, "emb.jsonl")
    with open(src, "w") as f:
        for r in rows:
            f.write(json.dumps([round(float(x), 6) for x in r["embedding"]]) + "\n")
    info = eng.ingest(src, "vectors", file_type="json")
    meta = eng.build_ann_index("vectors", "data", k=4, iters=2)
    query_vec = [float(x) for x in rows[0]["embedding"]]
    hits = eng.ann_search("vectors", "data", query_vec, topk=3, nprobe=1)
    print(f"ANN: index dim={meta['dim']} k={meta['k']}; top-3 for row 1:")
    for r in hits.collect():
        print(f"   ix={r['ix']} cosine={r['cosine']:.6f}")

    # -- 3b. IVFADC: residual PQ codes in the index -----------------------
    meta3 = eng.build_ann_index(
        "vectors", "data", k=4, iters=2, pq_m=4, pq_k=8
    )
    adc_hits = eng.ann_search("vectors", "data", query_vec, topk=3, nprobe=1)
    print(f"IVFADC: format={meta3['format']} pq_m={meta3['pq_m']} — "
          "ADC shortlist over 4-byte codes, exact re-rank of the "
          "shortlist only:")
    for r in adc_hits.collect():
        print(f"   ix={r['ix']} cosine={r['cosine']:.6f}")

    # -- 4. content maintenance keeps the index lifecycle coherent --------
    docs = os.path.join(wh, "docs.csv")
    base = "the quick brown fox jumps over the lazy dog " * 3
    with open(docs, "w") as f:
        f.write("txt\n" + base + "one\n" + base + "one\n" + "other text entirely ok\n")
    eng.ingest(docs, "corpus")
    v2 = eng.dedup_source("corpus", "txt", min_matches=6)
    print(f"dedup_source: v{v2.version} keeps {v2.row_count} of 3 rows "
          f"(parent auto-deprecated: "
          f"{eng.catalog.get_source('corpus', 1).deprecated})")
    spark.stop()


if __name__ == "__main__":
    main()
