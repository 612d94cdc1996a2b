from .ingest import ingest_seed_stream

__all__ = ["ingest_seed_stream"]
