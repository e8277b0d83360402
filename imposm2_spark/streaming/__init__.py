from .ingest import (
    enrich,
    read_document_stream,
    stream_curated_spine,
    stream_ingest,
    stream_spine,
    stream_tile_counts,
)
from .stateful import stream_dedup_exact, stream_dedup_first_seen

__all__ = [
    "enrich",
    "read_document_stream",
    "stream_dedup_exact",
    "stream_ingest",
    "stream_spine",
    "stream_curated_spine",
    "stream_dedup_first_seen",
    "stream_tile_counts",
]
