from .ingest import ingest_seed_stream, read_seed_sink
from .stateful import budget_gate_stream, read_gated_sink
from .windowed import run_windowed_metrics_stream, windowed_fetch_metrics
from .corpus import corpus_ingest_stream, read_corpus
from .dedup import dedup_stream, read_deduped
from .sessions import run_session_stream, session_rollup_stream
from .neardup import compact_index, neardup_stream, read_dups, read_index_docs

__all__ = ["ingest_seed_stream", "read_seed_sink", "budget_gate_stream", "read_gated_sink", "run_windowed_metrics_stream", "windowed_fetch_metrics", "dedup_stream", "read_deduped", "corpus_ingest_stream", "read_corpus", "run_session_stream", "session_rollup_stream", "neardup_stream", "read_dups", "read_index_docs", "compact_index"]
