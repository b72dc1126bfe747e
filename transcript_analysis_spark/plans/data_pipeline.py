"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing. Filled in incrementally; every query
registers with a DuckDB oracle unless genuinely non-SQL-expressible.
"""

from __future__ import annotations
