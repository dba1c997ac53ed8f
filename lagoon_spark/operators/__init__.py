"""Training-data pipeline operators (beyond the reference's inventory).

Exact/near dedup, similarity search, text analysis, multimodal column
plumbing — each designed as partition-parallel DataFrame transformations
with no driver-side collects, so they survive a 1000-executor / 100 TB
deployment. See the per-module docstrings for the scale story.
"""
