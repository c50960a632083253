"""Structured Streaming surface (SURVEY.md §2.7, M4).

The reference is batch-only; its partition-then-merge word count is
the canonical Structured Streaming example, so the same logical
queries run in both modes here. Batch/stream parity is the test
oracle: a file-source stream over the same parquet, run to
completion, must equal the batch result.
"""
