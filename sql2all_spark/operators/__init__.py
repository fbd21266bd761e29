"""Operator library: the SQL surface the reference delegates to its source
database (SURVEY.md §2.B), re-expressed as idiomatic DataFrame builders, plus
the LLM-data-pipeline extension operators (dedup, similarity, text analysis,
multimodal)."""
