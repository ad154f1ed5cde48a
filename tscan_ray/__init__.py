"""tscan_ray — a Ray-Data-native point-in-time feature-engineering engine.

Recomputes T-scan-style per-document complexity feature vectors
(reference: CentreForDigitalHumanities/tscan, surveyed in SURVEY.md) as
windowed as-of features over tables of image+caption pairs, keyed by
entity (phash-bucketed image lineage) x event timestamp.

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines,
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages (lexicons loaded once per actor), ``groupby`` only where the
semantics genuinely require an all-to-all exchange (the point-in-time
layer), and streaming execution everywhere else.

This package NEVER calls ``ray.init()`` / ``ray.shutdown()`` — session
ownership belongs to the caller (bench.py, CLI entry points, the test
fixture, or the external driver).
"""

from tscan_ray.config import EngineConfig

__version__ = "0.1.0"

__all__ = ["EngineConfig", "__version__"]
