"""Hybrid (filtered) vector search — the retrieval-pipeline shape.

A real retrieval query is "nearest neighbors of q AMONG the documents
matching a metadata predicate" (language, license, date). Post-
filtering a plain top-k under-retrieves: if only 1-in-10 rows match,
a top-10 probe leaves ~1 usable hit. This walkthrough:

1. ingests a corpus with metadata columns + an embedding column,
2. builds the self-contained IVF index with
   ``include_columns=["lang", "year"]`` — the typed metadata is baked
   INTO the index's cell partitions (and, with ``pq_m=``, into the PQ
   codes partitions),
3. runs ``ann_search(where="lang = 'de' AND year >= 2021")`` — the
   predicate evaluates inside the probed cells (pushed to the parquet
   scan; the source table is never touched), BEFORE the top-k, so the
   result is the true filtered top-k,
4. shows the fallback for a column that was NOT baked in (one
   column-pruned source pass + semi-join).

Run: ``python examples/hybrid_search.py``
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lagoon_spark.engine import Lagoon
from lagoon_spark.session import get_spark


def main() -> None:
    spark = get_spark("lagoon_hybrid_search", cpus="4")
    tmp = tempfile.mkdtemp(prefix="lagoon_hybrid_")
    lagoon = Lagoon(spark, os.path.join(tmp, "warehouse"), user="demo")
    lagoon.init_db()

    # -- 1. a corpus with metadata + a 4-dim embedding column
    src = os.path.join(tmp, "docs.csv")
    with open(src, "w") as f:
        f.write("lang,year,title,vec\n")
        for i in range(200):
            lang = ["en", "de", "fr"][i % 3]
            year = 2018 + i % 6
            vec = [1.0 - (i % 40) / 80, (i % 40) / 80, (i % 7) / 10, 0.1]
            f.write(f'{lang},{year},doc {i},"{json.dumps(vec)}"\n')
    lagoon.ingest(src, "corpus")

    # -- 2. index with the filterable metadata baked into the cells
    meta = lagoon.build_ann_index(
        "corpus", "vec", k=8, iters=2, include_columns=["lang", "year"]
    )
    print(f"index: k={meta['k']} cells, include_columns={meta['include_columns']}")

    q = [0.9, 0.1, 0.3, 0.1]

    # -- 3. filtered search: predicate inside the probed cells
    hits = lagoon.ann_search(
        "corpus", "vec", q, topk=5, nprobe=4,
        where="lang = 'de' AND year >= 2021",
    )
    print("filtered top-5 (index-resident predicate):")
    hits.show()

    # plan proof: the source table never appears — only the index's
    # cell partitions, with the predicate pushed into their scan
    plan = hits._jdf.queryExecution().executedPlan().toString()
    info = lagoon.catalog.get_source("corpus")
    print("source table scanned:", info.table_name in plan)

    # -- 4. fallback: 'title' was not baked in — still the correct
    # filtered top-k, via one column-pruned source pass + semi-join
    fb = lagoon.ann_search(
        "corpus", "vec", q, topk=3, nprobe=4,
        where="title IN ('doc 7', 'doc 43', 'doc 91', 'doc 115')",
    )
    print("fallback top-3 (source-side predicate):")
    fb.show()
    spark.stop()


if __name__ == "__main__":
    main()
