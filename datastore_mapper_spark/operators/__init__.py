"""Reusable operators beyond the SQL surface — the LLM-training-data
pipeline layer (dedup, similarity, text analysis, multimodal) plus the
reference's counter surface.

Each module documents its 100 TB scale path; the oracle-checkable
projections of these operators are registered as queries in
``queries/llm_extra.py``.
"""

from . import (  # noqa: F401
    counters,
    dedup,
    graph,
    multimodal,
    scale,
    similarity,
    text,
)
