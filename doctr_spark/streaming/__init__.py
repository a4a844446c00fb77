"""Incremental execution.

The reference is strictly batch (SURVEY.md §2.10: no watermarks, windows,
or state stores anywhere in docTR), and the north rule asks for *resumable
batch*, not streaming. This package therefore implements checkpointed
incremental batch: a manifest of completed input partitions with an
anti-join on restart (`incremental.py`).
"""
