"""Enrichment operators (the reference's five ingest processors,
SURVEY.md §2.1 P1-P6) plus the training-data-pipeline operator set
(dedup, ANN similarity, media plumbing, text analysis)."""
