"""Dataset-level operators: point-in-time layer, dedup, similarity, text ops."""
