from .ingest import enrich, read_document_stream, stream_ingest, stream_tile_counts

__all__ = ["enrich", "read_document_stream", "stream_ingest", "stream_tile_counts"]
