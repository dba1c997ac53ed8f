"""Oracle-SQL fragments and constants shared across query-registry
modules. A leaf module (no lagoon_spark imports) so pipeline_queries
and streaming_queries can both use them without an import cycle
through queries.py."""

from __future__ import annotations

from lagoon_spark.operators.text import MOD as _MOD
from lagoon_spark.operators.text import MULT as _MULT

# per-token portable rolling-hash fingerprints, DuckDB side — the twin
# of operators/text.word_fingerprints
D27_FPS = (
    "list_transform(list_filter(string_split(text, ' '), w -> w <> ''), "
    "w -> list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, length(w) + 1), "
    "i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))), "
    f"(a, b) -> (a * {_MULT} + b) % {_MOD}))"
)

# the d28/st09 trained-style coefficient table: multiples of 1/64
# (binary-exact, so the DuckDB literal list converts to DOUBLE
# losslessly and order-pinned folds hash-match)
D28_F = 64
D28_WEIGHTS = [((i * 37 + 11) % 129 - 64) / 64 for i in range(D28_F)]


# planted multi-line page body shared by d33 / st10 (same expression
# in both engines)
D33_PLANT_SPARK = (
    "concat(text, '.',"
    " chr(10), 'short line.',"
    " chr(10), 'no terminal punctuation on this line',"
    " CASE WHEN doc_id % 4 = 0 THEN concat(chr(10),"
    "   'links need the javascript runtime enabled to work.') ELSE '' END,"
    " CASE WHEN doc_id % 6 = 0 THEN concat(chr(10),"
    "   'is this a well formed question sentence?', chr(10),"
    "   'yes it is a well formed sentence!') ELSE '' END,"
    " CASE WHEN doc_id % 9 = 0 THEN concat(chr(10),"
    "   'lorem ipsum dolor sit amet.') ELSE '' END,"
    " CASE WHEN doc_id % 11 = 0 THEN concat(chr(10),"
    "   'function() { return; }') ELSE '' END)"
)
D33_PLANT_DUCK = (
    "text || '.'"
    " || chr(10) || 'short line.'"
    " || chr(10) || 'no terminal punctuation on this line'"
    " || CASE WHEN doc_id % 4 = 0 THEN chr(10)"
    "      || 'links need the javascript runtime enabled to work.' ELSE '' END"
    " || CASE WHEN doc_id % 6 = 0 THEN chr(10)"
    "      || 'is this a well formed question sentence?' || chr(10)"
    "      || 'yes it is a well formed sentence!' ELSE '' END"
    " || CASE WHEN doc_id % 9 = 0 THEN chr(10)"
    "      || 'lorem ipsum dolor sit amet.' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN chr(10)"
    "      || 'function() { return; }' ELSE '' END"
)
