"""Structured Streaming surface: windowed aggregation, watermark/late-data
policy, streaming dedup, and custom stateful operators over the ``events``
stream shape (SURVEY.md §2B — the reference is batch-polling only, see
dashboard/dashboard.js:9-12)."""
