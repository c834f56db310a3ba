"""Compound/domain operators (SURVEY.md §2.10): SCD2 merge, QC gates,
dedup suite, similarity search, text analysis, multimodal plumbing."""
