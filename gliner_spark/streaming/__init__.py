from .ingest import run_streaming_extraction, stream_pages  # noqa: F401
