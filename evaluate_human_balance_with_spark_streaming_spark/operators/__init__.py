"""Relational operators beyond the reference's surface: the
LLM-training-data pipeline suite (dedup family, similarity search,
text analysis, multimodal columns) plus streaming aggregates.

Each operator is a DataFrame-in/DataFrame-out function designed for the
100 TB execution model (blocked/bucketed candidate generation instead
of quadratic self-joins, broadcast for small sides, built-in
expressions instead of Python in the hot path), with a registered
oracle-checked query instantiation on the synthetic test tables.
"""
