"""lagoon_spark — a PySpark-native analytics/data-centralization engine.

A from-scratch rebuild of the capabilities of tweag/lagoon (reference at
/root/reference, studied for behavior only): ingest with streaming-style
type inference, a versioned metadata catalog with search, a security-
checked SQL passthrough surface, CSV/JSON export — plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Architecture: the relational plane is delegated wholesale to Spark SQL /
Catalyst (the reference delegates it to Postgres); lagoon_spark itself
implements the ingest / catalog / lifecycle / security plane as plain
PySpark + small pure-Python logic.
"""

__version__ = "0.1.0"

from lagoon_spark.session import get_spark, register_views  # noqa: F401


def __getattr__(name):
    # lazy: importing the engine/query registry pulls in pyspark.sql
    # machinery that light-weight consumers of get_spark don't need
    if name == "Lagoon":
        from lagoon_spark.engine import Lagoon

        return Lagoon
    if name == "registry":
        from lagoon_spark.queries import registry

        return registry
    raise AttributeError(name)
