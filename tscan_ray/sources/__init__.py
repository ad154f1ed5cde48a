"""Sources & sinks: image codecs, synthetic image-table generation, IO helpers."""
