"""REST facade + HTTP client tour: the reference's deployment shape.

Starts a LagoonServer with cookie-session auth over a scratch
warehouse, then drives it with the HTTP-backed PyLagoon client: login,
ingest, filtered listing, SQL query, DataFrame download, logout.

Run: ``python examples/server_demo.py``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lagoon_spark.engine import Lagoon
from lagoon_spark.pylagoon import LagoonHTTP
from lagoon_spark.server import LagoonServer
from lagoon_spark.session import get_spark


def main() -> None:
    spark = get_spark("lagoon_server_demo", cpus="4")
    tmp = tempfile.mkdtemp(prefix="lagoon_server_demo_")
    engine = Lagoon(spark, os.path.join(tmp, "warehouse"), user="admin")
    engine.init_db()

    srv = LagoonServer(engine, port=0, auth={"alice": "wonderland"})
    port = srv.start()
    print(f"server up on 127.0.0.1:{port} (cookie-session auth)")

    cli = LagoonHTTP(port=port, user="alice", password="wonderland")
    print(f"logged in: {cli.is_authenticated}")

    csv = os.path.join(tmp, "cities.csv")
    with open(csv, "w") as f:
        f.write("city,population\nbasel,178000\nzurich,421000\ngeneva,203000\n")
    src = cli.ingest(csv, "cities", tags=["demo"])
    print(f"ingested: {src}")

    [listed] = cli.sources(tags=["demo"])
    print(f"listed by tag: {listed}")

    df = cli.download_query(
        "SELECT city FROM cities_v1_typed WHERE population > 200000 "
        "ORDER BY population DESC"
    )
    print("over 200k:", ", ".join(df["city"]))

    whole = cli.download_source(src)
    print(f"downloaded {len(whole)} rows with columns {list(whole.columns)}")

    cli.logout()
    print(f"logged out: {not cli.is_authenticated}")
    srv.stop()
    spark.stop()


if __name__ == "__main__":
    main()
