from .ingest import enrich_stream, flat_docs_schema  # noqa: F401
