"""Relational + pipeline operators (SURVEY.md §2.3-§2.9) and the
LLM-data-pipeline extensions (dedup, similarity, multimodal)."""
