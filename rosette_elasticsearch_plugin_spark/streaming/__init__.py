from .ingest import checkpoint_run_id, enrich_stream, flat_docs_schema  # noqa: F401
from .resolve import resolve_stream  # noqa: F401
