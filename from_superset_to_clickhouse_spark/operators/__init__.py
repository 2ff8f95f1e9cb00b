"""Engine operators: ingest, dedup stores, document dedup, similarity,
text analysis, multimodal column plumbing."""
