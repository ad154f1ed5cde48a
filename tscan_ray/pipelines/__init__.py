"""End-to-end pipelines composed from sources, stages and ops."""
