"""Input sources: deterministic synthetic transcripts + parquet readers."""
