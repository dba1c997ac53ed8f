"""Quickstart — the reference's GETTING_STARTED flow, library-style.

The reference walks a user through: ingest a JSON document as
``things_purchased``, ingest a second version, query it over `/sql`,
and download a specific version back out byte-identically
(`/root/reference/docs/GETTING_STARTED.md`). Same flow here against a
local warehouse; no server needed.

Run: ``python examples/quickstart.py``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lagoon_spark.engine import Lagoon
from lagoon_spark.session import get_spark


def main() -> None:
    spark = get_spark("lagoon_quickstart", cpus="4")
    tmp = tempfile.mkdtemp(prefix="lagoon_quickstart_")
    lagoon = Lagoon(spark, os.path.join(tmp, "warehouse"), user="demo")
    lagoon.init_db()

    # -- ingest v1 (JSON type is inferred, incl. the array element type)
    v1 = os.path.join(tmp, "demo.json")
    with open(v1, "w") as f:
        f.write('{"place": "Switzerland", "transaction": 100.00, "items": ["chocolate", "wine"]}\n')
    info = lagoon.ingest(v1, "things_purchased")
    print(f"v{info.version}: {info.row_count} row(s), JSON type {info.json_type}")

    # -- ingest v2 under the same name (auto-versioned, v1 deprecated)
    v2 = os.path.join(tmp, "demo2.json")
    with open(v2, "w") as f:
        f.write('{"place": "Switzerland", "transaction": 10.00, "items": ["cheese"]}\n')
    info2 = lagoon.ingest(v2, "things_purchased")
    print(f"v{info2.version}: {info2.row_count} row(s), JSON type {info2.json_type}")

    # -- catalog search
    infos, total = lagoon.catalog.search(ts_query="things")
    print(f"search 'things' → {total} hit(s): "
          + ", ".join(f"{i.name} v{i.version}" for i in infos))

    # -- arbitrary SQL over the friendly views (security-checked)
    rows = lagoon.sql(
        "SELECT get_json_object(data, '$.place') AS place, "
        "       CAST(get_json_object(data, '$.transaction') AS DOUBLE) AS amount "
        "FROM things_purchased_v2"
    ).collect()
    print("sql:", [(r.place, r.amount) for r in rows])

    # -- download v1 byte-identically
    downloaded = "".join(lagoon.download(lagoon.catalog.get_source("things_purchased", 1)))
    assert downloaded == open(v1).read(), "download must byte-roundtrip"
    print("download v1 roundtrips byte-identically")

    # -- the catalog dump (the golden-test artifact)
    print()
    print(lagoon.dump_db_info())


if __name__ == "__main__":
    main()
