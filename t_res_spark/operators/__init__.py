"""Pipeline operators: extraction, blocking, ranking, linking, clustering,
dedup, similarity search, text analysis, multimodal plumbing."""
