from .ingest import ingest_seed_stream, read_seed_sink

__all__ = ["ingest_seed_stream", "read_seed_sink"]
