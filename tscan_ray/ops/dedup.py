"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference has no dataset-level dedup (SURVEY.md §2.7); these are the
training-data-pipeline operators the engine adds as first-class citizens.

Scale design:

* exact: content hash computed vectorized per batch (one C-speed pass),
  then ONE ``groupby(hash)`` exchange of (hash, id) — the full text only
  travels when ``keep_text``; representative = min(id) (deterministic).
* MinHash-LSH: shingles -> 64 permutations (vectorized universal hashing
  over uint64 numpy), banded into (band_id, band_hash) rows, ONE
  ``groupby`` on the band key; candidate pairs verified with exact
  Jaccard.  Per-batch work is numpy; the exchange carries only
  (band_id, band_hash, doc_id) triples.
* SimHash: 64-bit fingerprint per doc from token hashes (near-dup via
  Hamming distance on prefix buckets).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from tscan_ray.config import DEFAULT_CONFIG

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

_MERSENNE = np.uint64((1 << 61) - 1)


def _sha1_64(s: str) -> int:
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big")


def _hash_tokens64(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit hashes of tokens (stable across processes)."""
    return pd.util.hash_array(np.asarray(tokens, dtype=object)).astype(np.uint64)


_BAND_POWERS = None


def _minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(0x75CA)  # fixed seed: reproducible across runs
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def shingles(text: str, k: int) -> np.ndarray:
    """Word k-shingle hashes (uint64)."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return np.unique(pd.util.hash_array(np.asarray(grams, dtype=object)).astype(np.uint64))


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*x + b) mod p — vectorized over shingles."""
    if sh.size == 0:
        return np.full(a.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    # (P, S) universal hash; overflow-safe in uint64 modular arithmetic
    prod = (sh[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return prod.min(axis=1)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(ds, text_col: str, id_col: str):
    """Exact dedup by column content.  Returns one row per distinct text:
    (id_col = min id, n = duplicate count, text_col).

    groupby on the text itself guarantees no hash-collision false merges;
    at 100 TB pre-bucket by a 64-bit content hash first so the exchange
    is hash-partitioned (same plan, narrower key)."""
    import ray.data.aggregate as agg

    out = (
        ds.select_columns([id_col, text_col])
        .groupby(text_col)
        .aggregate(agg.Min(id_col, alias_name=id_col), agg.Count(alias_name="n"))
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def minhash_lsh_pairs(
    ds,
    text_col: str,
    id_col: str,
    num_perm: int = DEFAULT_CONFIG.minhash_num_perm,
    bands: int = DEFAULT_CONFIG.minhash_bands,
    shingle_k: int = DEFAULT_CONFIG.shingle_k,
    jaccard_threshold: float = 0.7,
):
    """Near-duplicate pairs via MinHash banding, verified with exact
    Jaccard over shingle sets.

    Returns a Dataset of (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold.  Verification recomputes shingles from the texts
    carried through the band exchange — self-contained; at larger scale
    carry the (small) signature and verify against a shingle store.
    """
    rows_per_band = num_perm // bands
    a, b = _minhash_params(num_perm)

    def to_bands(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        out_band, out_bhash, out_id, out_sh = [], [], [], []
        # deterministic per-band combiner: polynomial roll in uint64 wraparound
        powers = np.uint64(0x100000001B3) ** np.arange(rows_per_band, dtype=np.uint64)
        for i, t in enumerate(texts):
            sh = shingles(t or "", shingle_k)
            sig = minhash_signature(sh, a, b)
            bands_view = sig.reshape(bands, rows_per_band)
            bh = (bands_view * powers[None, :]).sum(axis=1, dtype=np.uint64).view(np.int64)
            # shingle sets travel with the row (computed ONCE per doc, not
            # once per band/bucket); int64 view for Arrow
            sh_list = sh.view(np.int64).tolist()
            for bi in range(bands):
                # one combined exchange key per (band, hash) — grouping by
                # the raw pair would make ~rows×bands tiny groups; instead
                # we hash-bucket this key (ops/keyed.py) and detect runs
                # vectorized inside each bucket
                out_band.append(bi)
                out_bhash.append(int(bh[bi] ^ np.int64(bi * 0x9E3779B9)))
                out_id.append(ids[i])
                out_sh.append(sh_list)
        return pa.table(
            {
                "band_id": pa.array(out_band, type=pa.int32()),
                "band_key": pa.array(out_bhash, type=pa.int64()),
                id_col: pa.array(out_id, type=batch.column(id_col).type),
                "__shingles__": pa.array(out_sh, type=pa.list_(pa.int64())),
            }
        )

    banded = ds.select_columns([id_col, text_col]).map_batches(
        to_bands, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """One hash bucket of band keys: sort by (band_key, id), detect the
        equal-key runs vectorized, pairwise-verify only within runs of
        length > 1 (the actual LSH candidates)."""
        df = df.sort_values(["band_key", id_col], kind="mergesort")
        keys = df["band_key"].to_numpy()
        ids = df[id_col].to_numpy()
        shs = df["__shingles__"].to_numpy()
        n = len(df)
        out_a, out_b, out_j = [], [], []
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], n]
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            run_ids = ids[s:e]
            # drop duplicate ids inside one band bucket
            keep = np.r_[True, run_ids[1:] != run_ids[:-1]]
            idxs = np.arange(s, e)[keep]
            sh = [np.asarray(shs[i], dtype=np.int64).view(np.uint64) for i in idxs]
            for i in range(len(idxs)):
                for j in range(i + 1, len(idxs)):
                    inter = np.intersect1d(sh[i], sh[j], assume_unique=True).size
                    union = sh[i].size + sh[j].size - inter
                    jac = inter / union if union else 0.0
                    if jac >= jaccard_threshold:
                        out_a.append(ids[idxs[i]])
                        out_b.append(ids[idxs[j]])
                        out_j.append(jac)
        return pd.DataFrame(
            {
                "id_a": pd.array(out_a, dtype="int64"),
                "id_b": pd.array(out_b, dtype="int64"),
                "jaccard": pd.array(out_j, dtype="float64"),
            }
        )

    from tscan_ray.ops.keyed import grouped_apply

    pairs = grouped_apply(banded, "band_key", bucket_pairs, num_buckets=64)
    # a pair can surface from several bands -> reduce to one row
    import ray.data.aggregate as agg

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        agg.Max("jaccard", alias_name="jaccard")
    )


def ngram_jaccard(text_a: str, text_b: str, k: int = DEFAULT_CONFIG.shingle_k) -> float:
    """Exact word-k-gram Jaccard similarity of two texts (verification kernel)."""
    sa, sb = shingles(text_a, k), shingles(text_b, k)
    if sa.size == 0 and sb.size == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 0.0


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (unit weights), deterministic."""
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    h = _hash_tokens64(toks)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def add_simhash(ds, text_col: str, out_col: str = "simhash"):
    """Append a SimHash fingerprint column (vectorized batch stage)."""

    def fn(batch: pa.Table) -> pa.Table:
        vals = [simhash64(t or "") for t in batch.column(text_col).to_pylist()]
        return batch.append_column(out_col, pa.array(vals, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def connected_components(
    pairs,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 50,
    num_buckets: int | None = None,
):
    """Cluster duplicate PAIRS into duplicate GROUPS: distributed
    connected components by hash-min label propagation.

    Returns a Dataset of (node, component) where ``component`` is the
    MINIMUM node id in the cluster — the canonical representative (the
    same keep-smallest-id convention as :func:`dedup_exact`).

    Plan per iteration (driver-coordinated loop, the documented shape
    for iterative algorithms):
      1. one keyed exchange joins current labels onto the edge list by
         endpoint and emits (neighbor, my_label) messages both ways;
      2. one keyed exchange folds messages + own labels with a min.
    Hash-min converges in O(diameter) iterations — near-dup clusters are
    shallow (most are cliques from LSH bands), so 2-3 iterations is
    typical; the loop stops as soon as an iteration changes nothing.
    Each iteration's datasets are materialized (an iterative lineage
    would otherwise recompute all prior rounds on every pass).
    """
    import ray.data.aggregate as agg

    from tscan_ray.config import DEFAULT_CONFIG
    from tscan_ray.ops.keyed import grouped_apply

    if num_buckets is None:
        num_buckets = DEFAULT_CONFIG.num_key_buckets

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column(src_col)
        b = batch.column(dst_col)
        return pa.table({"u": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                         "v": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()])})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    # initial labels: each node starts at min(self, smallest neighbor)
    # (arrow blocks throughout — union requires matching block types)
    import pyarrow.compute as pc

    labels = edges.groupby("u").aggregate(agg.Min("v", alias_name="label"))
    labels = labels.map_batches(
        lambda t: pa.table({
            "node": t.column("u"),
            "label": pc.min_element_wise(t.column("u"), t.column("label")),
        }),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    for _ in range(max_iters):
        # messages: each edge forwards the src's current label to dst
        def send(df: pd.DataFrame) -> pd.DataFrame:
            lab = df.loc[df["__side__"] == 0, ["node", "label"]]
            edg = df.loc[df["__side__"] == 1, ["u", "v"]]
            m = edg.merge(lab, left_on="u", right_on="node", how="inner")
            return pd.DataFrame({"node": m["v"], "label": m["label"]})

        # side-tag labels (0) and edges (1) on the shared key u/node
        l_t = labels.map_batches(
            lambda df: df.assign(u=df["node"], v=-1, __side__=np.int8(0)),
            batch_format="pandas")
        e_t = edges.map_batches(
            lambda df: df.assign(node=-1, label=-1, __side__=np.int8(1)),
            batch_format="pandas")
        msgs = grouped_apply(l_t.union(e_t), "u", send, num_buckets)
        folded = (msgs.union(labels)
                  .groupby("node").aggregate(agg.Min("label", alias_name="label"))
                  .materialize())
        # labels are monotonically non-increasing under hash-min, so the
        # fixpoint is reached exactly when the label sum stops moving —
        # one tiny scalar aggregate instead of a join-based diff
        new_sum = folded.sum("label")
        old_sum = labels.sum("label")
        labels = folded
        if new_sum == old_sum:
            break
    return labels.map_batches(
        lambda df: df.rename(columns={"label": "component"}),
        batch_format="pandas")
