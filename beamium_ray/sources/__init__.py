"""Sources: tokenized-sequence Parquet (primary input) + text-line ingest."""
