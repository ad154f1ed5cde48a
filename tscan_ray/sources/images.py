"""Synthetic image+caption table generation (the BASELINE.json input_hint
shape), derived deterministically from the driver's `documents` table.

Produces exactly the north-rule input schema:

    image_id:string  bytes:binary  w:int32  h:int32  fmt:string
    caption:string   phash:int64

plus the engine's event columns ``entity_id:int64`` (phash-bucketed
lineage) and ``ts:timestamp[us]`` (per-entity increasing with jittered
gaps, deliberate session gaps, and duplicate-ts tie-break pairs).

Determinism: every value is a pure function of ``doc_id`` (no RNG state
shared across rows), so regeneration under task retries is idempotent —
the property the resumable-output design relies on.

Lance note: the north rule names Lance tables; this container has no
lance package, so IO is Parquet with the identical schema.  ``read_images``
tries Lance first and falls back (import-gated).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from tscan_ray.config import DEFAULT_CONFIG, EngineConfig
from tscan_ray.sources import codecs

_SIZES = ((32, 32), (64, 32), (48, 48), (32, 24))
_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big")


def make_pixels(doc_id: int, entity_k: int, w: int, h: int) -> np.ndarray:
    """Deterministic tile: per-entity base pattern + per-image noise.
    Images of one entity are near-duplicates (the phash lineage)."""
    base_rng = np.random.default_rng(_h64(f"entity:{entity_k}") % (2**32))
    base = base_rng.integers(0, 256, size=(h, w, 3))
    img_rng = np.random.default_rng(_h64(f"img:{doc_id}") % (2**32))
    noise = img_rng.integers(-8, 9, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


# per-process prefix cache: event_time_us is called once per row with
# monotonically growing seq; recomputing the gap prefix from scratch made
# synthesis O(seq) per row (quadratic per entity timeline).  Values are
# identical to the direct recurrence.  Assumes cfg.session_gap_us is
# constant within a process (it is — EngineConfig is module-level).
_TIME_PREFIX: dict[int, list[int]] = {}


def event_time_us(entity_k: int, seq: int, cfg: EngineConfig = DEFAULT_CONFIG) -> int:
    """Per-entity strictly-increasing-ish event time with:
    - jittered ~5 min gaps,
    - a session-sized gap every 7th event (drives sessionize tests),
    - duplicate timestamps every 11th event (tie-break tests).
    Amortized O(1) per call via a per-entity prefix cache."""
    prefix = _TIME_PREFIX.get(entity_k)
    if prefix is None:
        prefix = [_EPOCH_US + (_h64(f"ent_t0:{entity_k}") % 86_400_000_000)]
        _TIME_PREFIX[entity_k] = prefix
    while len(prefix) <= seq:
        i = len(prefix)
        if i % 11 == 0:
            gap = 0  # duplicate-ts pair with the previous event
        elif i % 7 == 0:
            gap = cfg.session_gap_us + 60_000_000  # force a session break
        else:
            gap = 120_000_000 + (_h64(f"gap:{entity_k}:{i}") % 360_000_000)
        prefix.append(prefix[-1] + gap)
    return prefix[seq]


def synthesize_row(doc_id: int, caption: str, n_entities: int,
                   cfg: EngineConfig = DEFAULT_CONFIG) -> dict:
    entity_k = doc_id % n_entities
    seq = doc_id // n_entities
    w, h = _SIZES[doc_id % len(_SIZES)]
    fmt = "png" if doc_id % 3 else "jpeg"
    pixels = make_pixels(doc_id, entity_k, w, h)
    data = codecs.encode_image(pixels, fmt)
    # phash: entity lineage base in the high bits, per-image perturbation low
    # (FIXTURES.md §1); entity_id = phash >> phash_bucket_bits recovers it.
    base = _h64(f"ent_phash:{entity_k}") % (1 << 40)
    perturb = codecs.ahash64(pixels) & 0xFFFF
    phash = (base << cfg.phash_bucket_bits) | perturb
    return {
        "image_id": f"img-{doc_id:08d}",
        "bytes": data,
        "w": np.int32(w),
        "h": np.int32(h),
        "fmt": fmt,
        "caption": caption,
        "phash": np.int64(phash),
        "entity_id": np.int64(phash >> cfg.phash_bucket_bits),
        "ts": np.int64(event_time_us(entity_k, seq)),
    }


IMAGE_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
    ("entity_id", pa.int64()),
    ("ts", pa.timestamp("us")),
])


def synth_images_batch(batch: pa.Table, n_entities: int,
                       cfg: EngineConfig = DEFAULT_CONFIG,
                       id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """documents batch -> images batch (vectorizable codec work per row)."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    rows = [synthesize_row(i, t or "", n_entities, cfg) for i, t in zip(ids, texts)]
    cols = {name: [r[name] for r in rows] for name in IMAGE_SCHEMA.names}
    arrays = []
    for field in IMAGE_SCHEMA:
        if field.name == "ts":
            arrays.append(pa.array(np.asarray(cols["ts"], dtype="datetime64[us]"),
                                   type=field.type))
        else:
            arrays.append(pa.array(cols[field.name], type=field.type))
    return pa.Table.from_arrays(arrays, schema=IMAGE_SCHEMA)


def synth_images(docs_ds, n_entities: int = 50,
                 cfg: EngineConfig = DEFAULT_CONFIG,
                 id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of documents -> Dataset of image+caption rows (stateless
    vectorized stage; heavy pixel/codec work parallelizes per batch)."""
    return docs_ds.select_columns([id_col, text_col]).map_batches(
        lambda b: synth_images_batch(b, n_entities, cfg, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.decode_batch_size,
    )

