"""Batch-equivalent window queries over `events` (tumbling / sliding /
session), oracle-checked; the true Structured Streaming forms live in
transcript_analysis_spark/streaming/.
"""

from __future__ import annotations
