"""Similarity search over an embedding column (list<float>).

* Brute-force cosine top-k: the baseline — numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once; fetched per actor,
  never re-shipped per batch), per-batch partial top-k, tiny final merge.
* LSH-bucketed variant: random-hyperplane signatures route vectors into
  buckets; queries search only their bucket (+ optional multiprobe) —
  the 100 TB path where a full scan per query is off the table.
* Embedding-cosine near-dup: pairs within a cosine threshold, via the
  same LSH bucket exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from tscan_ray.config import DEFAULT_CONFIG


def _as_matrix(col) -> np.ndarray:
    """Embedding column -> (n, d) float64 matrix.

    Handles Arrow list<float> / fixed_size_list (zero-copy flatten) and
    Ray's ArrowTensorArray extension type."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        values = np.asarray(col.flatten(), dtype=np.float64)
        return values.reshape(len(col), -1)
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype == object:
        return np.stack(arr).astype(np.float64)
    return np.asarray(arr, dtype=np.float64).reshape(len(col), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def topk_cosine(
    ds,
    query: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = DEFAULT_CONFIG.ann_top_k,
    round_to: int | None = 6,
):
    """Exact top-k by cosine similarity to ``query``.

    Per-batch: one matmul + argpartition (partial top-k) — each batch
    emits at most k candidate rows, so the final global sort/limit is
    over ~k × num_batches rows, not the dataset.  The query vector is
    broadcast via the object store.
    """
    q = np.asarray(query, dtype=np.float64).ravel()
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _normalize(_as_matrix(batch.column(vec_col)))
        sims = m @ qv
        if round_to is not None:
            sims = np.round(sims, round_to)
        kk = min(k, len(sims))
        idx = np.argpartition(-sims, kk - 1)[:kk]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[idx]
        return pa.table({id_col: pa.array(ids), "cosine": pa.array(sims[idx], type=pa.float64())})

    partials = ds.select_columns([id_col, vec_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    # deterministic global top-k: sort by (-cosine, id) then limit
    return partials.sort(["cosine", id_col], descending=[True, False]).limit(k)


def _hyperplanes(dim: int, nbits: int, seed: int = 0xA11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def lsh_bucket_ids(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane signature -> int64 bucket id per row."""
    bits = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def add_lsh_bucket(ds, vec_col: str = "embedding", nbits: int = 8,
                   out_col: str = "lsh_bucket", dim: int | None = None,
                   seed: int = 0xA11):
    """Append the LSH bucket id column (stateless vectorized stage; the
    plane matrix is tiny and closure-captured — serialized once per task)."""
    planes_holder = {}

    def fn(batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch.column(vec_col))
        if "p" not in planes_holder:
            planes_holder["p"] = _hyperplanes(m.shape[1], nbits, seed)
        b = lsh_bucket_ids(_normalize(m), planes_holder["p"])
        return batch.append_column(out_col, pa.array(b, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def topk_cosine_lsh(
    ds,
    query: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = DEFAULT_CONFIG.ann_top_k,
    nbits: int = 8,
    multiprobe: int = 1,
):
    """Approximate top-k: scan only rows whose LSH bucket is within
    ``multiprobe`` bit flips of the query's bucket.  Trades recall for a
    ~2^nbits reduction in scanned rows; same per-batch kernel as the
    exact path afterwards."""
    q = np.asarray(query, dtype=np.float64).ravel()
    qn = q / (np.linalg.norm(q) or 1.0)

    def probe_buckets(planes: np.ndarray) -> set[int]:
        base = int(lsh_bucket_ids(qn[None, :], planes)[0])
        buckets = {base}
        if multiprobe >= 1:
            for i in range(planes.shape[0]):
                buckets.add(base ^ (1 << i))
        return buckets

    planes = None

    def fn(batch: pa.Table) -> pa.Table:
        nonlocal planes
        m = _as_matrix(batch.column(vec_col))
        if planes is None:
            planes = _hyperplanes(m.shape[1], nbits)
        bs = lsh_bucket_ids(_normalize(m), planes)
        mask = np.isin(bs, list(probe_buckets(planes)))
        return batch.filter(pa.array(mask))

    filtered = ds.select_columns([id_col, vec_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
    return topk_cosine(filtered, query, vec_col=vec_col, id_col=id_col, k=k)


def cosine_neardup_pairs(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    nbits: int = 10,
):
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    One groupby exchange on the LSH bucket; exact cosine verification per
    bucket (vectorized gram matrix).  Pairs split across buckets are
    missed with probability falling with nbits — the standard LSH recall
    trade; run with multiple seeds and union for higher recall."""
    bucketed = add_lsh_bucket(ds.select_columns([id_col, vec_col]), vec_col,
                              nbits=nbits)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        m = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        sims = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        mask = sims[iu, ju] >= threshold
        ia, jb = ids[iu[mask]], ids[ju[mask]]
        lo, hi = np.minimum(ia, jb), np.maximum(ia, jb)
        return pd.DataFrame({"id_a": lo.astype(np.int64),
                             "id_b": hi.astype(np.int64),
                             "cosine": sims[iu, ju][mask].astype(np.float64)})

    return bucketed.groupby("lsh_bucket").map_groups(verify, batch_format="pandas")
