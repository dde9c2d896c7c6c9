from .ingest import stream_extract_triples  # noqa: F401
