"""Scalar-function shims beyond Spark's built-ins.

The reference delegates scalar functions to Postgres; its R client
installs infix translations for the Postgres JSON operator family
(`clients/RLagoon/R/dplyrlagoon.r:88-100`), which defines the surface
users rely on. ``json_ops`` re-expresses that family over Spark.
"""

from lagoon_spark.functions.json_ops import (
    json_get,
    jsonb_concat,
    jsonb_delete_key,
    jsonb_delete_path,
    json_get_text,
    json_path,
    json_path_text,
    jsonb_contained,
    jsonb_contains,
    jsonb_exists,
    jsonb_exists_all,
    jsonb_exists_any,
)

__all__ = [
    "json_get",
    "jsonb_concat",
    "jsonb_delete_key",
    "jsonb_delete_path",
    "json_get_text",
    "json_path",
    "json_path_text",
    "jsonb_contained",
    "jsonb_contains",
    "jsonb_exists",
    "jsonb_exists_all",
    "jsonb_exists_any",
]
