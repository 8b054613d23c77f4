from .stream import (
    stream_pages,
    windowed_page_metrics,
    streaming_url_dedup,
    run_streaming_ingest,
)
from .stateful import budget_gate, trap_gate

__all__ = [
    "stream_pages",
    "windowed_page_metrics",
    "streaming_url_dedup",
    "run_streaming_ingest",
    "budget_gate",
    "trap_gate",
]
