"""O-28: Structured Streaming ingest (optional extension — the reference
is a single-shot library with no streaming semantics; SURVEY.md §2.B)."""
