from .ingest import enrich, read_document_stream, stream_ingest, stream_spine, stream_tile_counts
from .stateful import stream_dedup_exact

__all__ = [
    "enrich",
    "read_document_stream",
    "stream_dedup_exact",
    "stream_ingest",
    "stream_spine",
    "stream_tile_counts",
]
