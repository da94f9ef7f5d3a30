from .ingest import run_streaming_extraction, run_streaming_kg, stream_pages  # noqa: F401
from .stateful import streaming_exact_dedup, streaming_first_seen  # noqa: F401
from .neardup import incremental_minhash_dedup  # noqa: F401
from .sessions import streaming_sessionize  # noqa: F401
