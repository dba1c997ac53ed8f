"""Ingest plane: CSV/JSON acquisition, type inference, row identity.

Reimplements the reference's ingest semantics (tweag/lagoon,
`src/backend/src/Lagoon/Ingest*`) as two-pass Spark jobs: pass 1 scans
for structure (width, types), pass 2 writes the untyped + typed tables.
"""
