from .ingest import start_indexing_stream, stream_corpus_source  # noqa: F401
