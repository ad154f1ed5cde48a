"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference has no dataset-level dedup (SURVEY.md §2.7); these are the
training-data-pipeline operators the engine adds as first-class citizens.

Scale design:

* exact: content hash computed vectorized per batch (one C-speed pass),
  then ONE ``groupby(hash)`` exchange of (hash, id) — the full text only
  travels when ``keep_text``; representative = min(id) (deterministic).
* MinHash-LSH: shingles -> 64 permutations -> 16 banded Horner hashes;
  the exchange carries ONLY (band_key:int64, doc_id) pairs — 20 bytes ×
  bands per doc, no shingle/signature payload (the r01 design shipped
  the full shingle set into every band row, a bands× amplification of
  the pipeline's largest intermediate).  Candidate pairs come out of
  the band groupby; exact-Jaccard verification recomputes shingles for
  the CANDIDATE docs only (broadcast semi-filter + small shingle map).
* SimHash: 64-bit fingerprint per doc from token hashes (near-dup via
  Hamming distance on prefix buckets).

Cross-engine verifiability: every hash in the MinHash/SimHash path is
md5-derived with arithmetic confined to [0, 2^31-1) (products < 2^62,
exact in uint64 AND in SQL hugeint), so a DuckDB oracle can reproduce
the exact pair set — see ``oracle_sql()['dedup_minhash']``.  Swap
``_md5_u64`` for a faster vectorized hash (xxhash) at production scale
if oracle parity is not needed.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from tscan_ray.config import DEFAULT_CONFIG

# ASCII token class, lowercased input: identical semantics in Python re
# and RE2/DuckDB (`\w` is unicode-aware in Python but ASCII in RE2 —
# an ASCII class keeps the two tokenizers bit-identical).
_TOKEN_RE = re.compile(r"[0-9a-z_]+")

_P31 = np.uint64((1 << 31) - 1)  # modulus: keeps all products < 2^62
_HORNER_K = np.uint64(1_000_003)


def _md5_u64(strs: list[str]) -> np.ndarray:
    """First 8 bytes of md5 as uint64 (big-endian) — matches DuckDB's
    ('0x' || substr(md5(s), 1, 16))::ubigint exactly."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
         for s in strs),
        np.uint64, len(strs))


def _hash_tokens64(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit hashes of tokens (stable across processes
    and reproducible in SQL)."""
    return _md5_u64(tokens)


def _minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(0x75CA)  # fixed seed: reproducible across runs
    a = rng.integers(1, int(_P31), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_P31), size=num_perm, dtype=np.uint64)
    return a, b


def shingles(text: str, k: int) -> np.ndarray:
    """Word k-shingle hashes: distinct md5-u64 mod 2^31-1 (uint64)."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return np.unique(_md5_u64(grams) % _P31)


# fast-path token-hash memo: natural text reuses a small vocabulary, so
# md5 runs once per DISTINCT token per worker; gram hashing is then a
# k-step vectorized rolling Horner over the token-hash array (no
# per-gram Python hashing).  Bounded to keep worker heaps flat on
# open-vocabulary corpora.
_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_LIMIT = 1_000_000


def shingles_fast(text: str, k: int) -> np.ndarray:
    """Vectorized word k-shingle hashes (production path).

    Same output SHAPE and modulus as :func:`shingles` but a different
    (still deterministic, process-independent) hash function: per-token
    md5 (memoized) combined per-gram with the Horner rolling hash.
    Jaccard over these hashes equals Jaccard over the md5-gram hashes
    up to mod-P collisions, so the verified pair set matches the md5
    path in practice; the DuckDB oracle pins the md5 path, which stays
    the default for oracle-checked queries.

    Collision/equivalence bound (property-tested in
    tests/test_property.py::TestFastHashDedupEquivalence): both hash
    functions map distinct grams ~uniformly into [0, P), P = 2^31-1.
    For a candidate pair with U distinct grams in the union, the exact
    verify-stage Jaccard differs between the paths only if some pair of
    distinct grams collides mod P under one hash but not the other:
    probability <= 2*C(U,2)/P ~ U^2/2^31 per pair (~5e-4 at U=10^3),
    and a collision perturbs Jaccard by at most 1/U, so a pair can flip
    across the threshold only when its exact Jaccard lies within 1/U of
    it — combined flip probability < 1e-6 per candidate pair.  The LSH
    CANDIDATE sample (r = num_perm/bands rows per band) is drawn from
    the same distribution but with different randomness under the two
    hashes, so for r > 1 near-threshold pairs may appear in one path's
    candidate set and not the other's; with r = 1 banding both paths
    reach recall ~1 (miss <= (1-J)^num_perm) and the verified pair sets
    coincide, which is the regime the property test asserts."""
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return np.empty(0, dtype=np.uint64)
    h = np.empty(len(toks), dtype=np.uint64)
    cache = _TOKEN_HASH_CACHE
    for i, t in enumerate(toks):
        v = cache.get(t)
        if v is None:
            v = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            if len(cache) >= _TOKEN_HASH_CACHE_LIMIT:
                cache.clear()
            cache[t] = v
        h[i] = v
    h %= _P31
    if len(toks) < k:
        acc = np.uint64(0)
        for v in h:
            acc = (acc * _HORNER_K + v) % _P31
        return np.array([acc], dtype=np.uint64)
    m = len(toks) - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        acc = (acc * _HORNER_K + h[j:j + m]) % _P31
    return np.unique(acc)


def _shingle_fn(hash_impl: str):
    if hash_impl == "md5":
        return shingles
    if hash_impl == "fast":
        return shingles_fast
    raise ValueError(f"hash_impl must be 'md5' or 'fast', got {hash_impl!r}")


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a*x + b) mod (2^31-1) — vectorized over
    shingles; a, x < 2^31 so products stay < 2^62 (exact in uint64)."""
    if sh.size == 0:
        return np.full(a.shape[0], _P31, dtype=np.uint64)
    prod = (sh[None, :] * a[:, None] + b[:, None]) % _P31
    return prod.min(axis=1)


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """Fold a (num_perm,) signature into ``bands`` int64 keys: Horner
    hash of each band's rows mod 2^31-1, offset by band_id*(2^31-1) so
    keys never collide across bands (single-column exchange key)."""
    rows = sig.shape[0] // bands
    view = sig.reshape(bands, rows)
    bh = np.zeros(bands, dtype=np.uint64)
    for j in range(rows):
        bh = (bh * _HORNER_K + view[:, j]) % _P31
    return (np.arange(bands, dtype=np.uint64) * _P31 + bh).astype(np.int64)


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
    broadcast_max_ids: int = 500_000,
    hash_impl: str = "md5",
):
    """Near-duplicate pairs via MinHash banding, verified with exact
    Jaccard over shingle sets.

    Returns a Dataset of (id_a, id_b, jaccard) with id_a < id_b, pairs
    restricted to band collisions (standard LSH recall trade) and
    jaccard >= threshold (exact, over distinct shingle hashes).

    Plan (the de-amplified r02 design):
      1. one pass over the corpus emits (band_key:int64, id) rows —
         bands × 20 bytes per doc, no shingle/signature payload;
      2. ONE exchange on band_key; equal-key runs yield candidate pairs;
      3. candidate ids (≪ corpus under any sane threshold — the LSH
         assumption) are broadcast as a semi-filter; shingle sets are
         recomputed for candidate docs ONLY and broadcast as a map;
      4. a distributed map over the pair list computes exact Jaccard.
    When the distinct-candidate-id count exceeds ``broadcast_max_ids``
    (adversarial corpora: low threshold, boilerplate-heavy web text),
    steps 3-4 cut over to :func:`_verify_pairs_exchange` — a doc-keyed
    exchange join of the pair list against the corpus with NO driver
    materialization and NO broadcast; same pair set bit-exactly.
    Docs with zero shingles never enter the banding (a doc with no
    tokens has no similarity evidence).
    """
    import ray

    sh_fn = _shingle_fn(hash_impl)
    a, b = _minhash_params(num_perm)
    docs = ds.select_columns([id_col, text_col])

    def to_bands(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        shs, keep = [], []
        for i, t in enumerate(texts):
            sh = sh_fn(t or "", shingle_k)
            if sh.size:
                shs.append(sh)
                keep.append(i)
        if not shs:
            return pa.table({
                "band_key": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=batch.column(id_col).type),
            })
        # ONE (num_perm, total_shingles) pass for the whole batch, then
        # segment-minima per doc — no per-doc numpy dispatch overhead
        lens = np.fromiter((s.size for s in shs), np.int64, len(shs))
        offsets = np.zeros(len(shs), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        sh_all = np.concatenate(shs)
        prod = (sh_all[None, :] * a[:, None] + b[:, None]) % _P31
        sigs = np.minimum.reduceat(prod, offsets, axis=1).T  # (docs, perm)
        # banded Horner keys, vectorized across docs
        rows = sigs.shape[1] // bands
        view = sigs.reshape(len(shs), bands, rows)
        bh = np.zeros((len(shs), bands), dtype=np.uint64)
        for j in range(rows):
            bh = (bh * _HORNER_K + view[:, :, j]) % _P31
        keys = (np.arange(bands, dtype=np.uint64)[None, :] * _P31
                + bh).astype(np.int64)
        return pa.table({
            "band_key": pa.array(keys.ravel(), type=pa.int64()),
            id_col: pa.array(np.repeat(ids[keep], bands),
                             type=batch.column(id_col).type),
        })

    banded = docs.map_batches(to_bands, batch_format="pyarrow",
                              zero_copy_batch=True)

    def bucket_candidates(df: pd.DataFrame) -> pd.DataFrame:
        """One hash bucket of band keys: sort, detect equal-key runs
        vectorized, emit unique (id_a < id_b) candidate pairs."""
        df = df.sort_values(["band_key", id_col], kind="mergesort")
        keys = df["band_key"].to_numpy()
        ids = df[id_col].to_numpy()
        n = len(df)
        out_a, out_b = [], []
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], n]
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            # a doc_id repeated in the corpus would otherwise self-pair
            # (id_a == id_b), violating the id_a < id_b contract
            run = np.unique(ids[s:e])
            if len(run) < 2:
                continue
            for i in range(len(run)):
                for j in range(i + 1, len(run)):
                    out_a.append(run[i])
                    out_b.append(run[j])
        return pd.DataFrame({"id_a": pd.array(out_a, dtype="int64"),
                             "id_b": pd.array(out_b, dtype="int64")})

    from tscan_ray.ops.keyed import grouped_apply

    cand = grouped_apply(banded, "band_key", bucket_candidates, num_buckets=64)
    # a pair can collide in several bands -> one candidate row
    import ray.data as rd
    import ray.data.aggregate as agg

    cand = (cand.groupby(["id_a", "id_b"])
            .aggregate(agg.Count(alias_name="__nb__"))
            .select_columns(["id_a", "id_b"])
            .materialize())
    empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                      "id_b": pa.array([], type=pa.int64()),
                      "jaccard": pa.array([], type=pa.float64())})
    n_pairs = cand.count()
    if n_pairs == 0:
        return rd.from_arrow(empty)
    if 2 * n_pairs > broadcast_max_ids:
        # adversarial candidate volume: no driver/broadcast involvement
        return _verify_pairs_exchange(docs, cand, text_col, id_col,
                                      shingle_k, jaccard_threshold,
                                      sh_fn=sh_fn)
    cand_df = cand.to_pandas()  # candidate pairs only — broadcast-small

    # shingle sets for candidate docs only (semi-filter streams the
    # corpus once; only matching docs' texts reach the compute)
    from tscan_ray.ops.join import broadcast_join

    ids = pd.unique(np.concatenate([cand_df["id_a"].to_numpy(),
                                    cand_df["id_b"].to_numpy()]))
    cand_docs = broadcast_join(
        docs, pd.DataFrame({id_col: ids}), on=id_col, how="semi")

    def to_shingle_rows(batch: pa.Table) -> pa.Table:
        sh = [sh_fn(t or "", shingle_k).view(np.int64).tolist()
              for t in batch.column(text_col).to_pylist()]
        return pa.table({id_col: batch.column(id_col),
                         "__sh__": pa.array(sh, type=pa.list_(pa.int64()))})

    sh_df = cand_docs.map_batches(to_shingle_rows, batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas()
    shmap = {i: np.asarray(s, dtype=np.int64).view(np.uint64)
             for i, s in zip(sh_df[id_col], sh_df["__sh__"])}
    sh_ref = ray.put(shmap)

    def verify(batch: pa.Table) -> pa.Table:
        from tscan_ray.ops.rounding import round_half_away_scalar

        m = ray.get(sh_ref)
        out_a, out_b, out_j = [], [], []
        for ia, ib in zip(batch.column("id_a").to_pylist(),
                          batch.column("id_b").to_pylist()):
            sa, sb = m.get(ia), m.get(ib)
            if sa is None or sb is None:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            jac = inter / union if union else 0.0
            if jac >= jaccard_threshold:
                out_a.append(ia)
                out_b.append(ib)
                out_j.append(round_half_away_scalar(jac, 6))
        return pa.table({"id_a": pa.array(out_a, type=pa.int64()),
                         "id_b": pa.array(out_b, type=pa.int64()),
                         "jaccard": pa.array(out_j, type=pa.float64())})

    return rd.from_pandas(cand_df[["id_a", "id_b"]]).map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True)


def _verify_pairs_exchange(docs, cand, text_col: str, id_col: str,
                           shingle_k: int, jaccard_threshold: float,
                           sh_fn=shingles):
    """Exact-Jaccard verification of candidate pairs with NO driver
    materialization and NO broadcast — the scale path for adversarial
    candidate volumes (``ops/dedup.py`` plan step 3-4 fallback).

    Two keyed exchanges:
      1. key = doc id: pair-endpoint rows (2 per pair) union corpus rows;
         each bucket joins endpoints to texts and computes shingles for
         the candidate docs it holds ONLY (non-candidate texts are
         dropped inside the bucket kernel) — emits one
         (pair_key, slot, shingles:bytes) row per endpoint;
      2. key = pair_key: buckets pair up slot-0/slot-1 shingle sets and
         compute exact Jaccard.
    Shingle sets travel as uint64 bytes; the pair key is a
    ``\\x1f``-joined string (NUL-safe for pandas group hashing).  On a
    repeated doc id the lexicographically smallest text wins
    (deterministic; the broadcast path's dict keeps an arbitrary one).
    """
    import ray.data as rd

    from tscan_ray.config import DEFAULT_CONFIG as _CFG
    from tscan_ray.ops.keyed import grouped_apply

    num_buckets = _CFG.num_key_buckets

    def pair_to_endpoints(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        key = np.concatenate([a, b])
        slot = np.concatenate([np.zeros(len(a), np.int8),
                               np.ones(len(b), np.int8)])
        return pa.table({
            "__k__": pa.array(key, type=pa.int64()),
            "id_a": pa.array(np.concatenate([a, a]), type=pa.int64()),
            "id_b": pa.array(np.concatenate([b, b]), type=pa.int64()),
            "__slot__": pa.array(slot, type=pa.int8()),
            "__txt__": pa.nulls(2 * len(a), type=pa.string()),
        })

    def doc_to_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "__k__": batch.column(id_col).cast(pa.int64()),
            "id_a": pa.array(np.full(n, -1), type=pa.int64()),
            "id_b": pa.array(np.full(n, -1), type=pa.int64()),
            "__slot__": pa.array(np.full(n, -1, np.int8), type=pa.int8()),
            "__txt__": batch.column(text_col).cast(pa.string()),
        })

    tagged = (cand.map_batches(pair_to_endpoints, batch_format="pyarrow",
                               zero_copy_batch=True)
              .union(docs.map_batches(doc_to_rows, batch_format="pyarrow",
                                      zero_copy_batch=True)))

    def join_shingles(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas(types_mapper=None)
        is_doc = df["__slot__"].to_numpy() < 0
        endp = df.loc[~is_doc, ["__k__", "id_a", "id_b", "__slot__"]]
        out_schema = {"pair_key": pd.Series(dtype=object),
                      "__slot__": pd.Series(dtype=np.int8),
                      "id_a": pd.Series(dtype=np.int64),
                      "id_b": pd.Series(dtype=np.int64),
                      "__sh__": pd.Series(dtype=object)}
        if endp.empty:
            return pd.DataFrame(out_schema)
        txt = (df.loc[is_doc, ["__k__", "__txt__"]]
               .sort_values(["__k__", "__txt__"], kind="mergesort")
               .drop_duplicates("__k__", keep="first"))
        # shingle only the docs an endpoint actually references
        txt = txt[txt["__k__"].isin(endp["__k__"].unique())]
        sh_by_key = {k: sh_fn(t or "", shingle_k).tobytes()
                     for k, t in zip(txt["__k__"], txt["__txt__"])}
        m = endp[endp["__k__"].isin(txt["__k__"])]
        return pd.DataFrame({
            "pair_key": (m["id_a"].astype(str) + "\x1f"
                         + m["id_b"].astype(str)).to_numpy(object),
            "__slot__": m["__slot__"].to_numpy(np.int8),
            "id_a": m["id_a"].to_numpy(np.int64),
            "id_b": m["id_b"].to_numpy(np.int64),
            "__sh__": np.array([sh_by_key[k] for k in m["__k__"]],
                               dtype=object),
        })

    sides = grouped_apply(tagged, "__k__", join_shingles, num_buckets,
                          batch_format="pyarrow")

    def verify_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from tscan_ray.ops.rounding import round_half_away_scalar

        out = {"id_a": pd.Series(dtype=np.int64),
               "id_b": pd.Series(dtype=np.int64),
               "jaccard": pd.Series(dtype=np.float64)}
        if df.empty:
            return pd.DataFrame(out)
        df = df.sort_values(["pair_key", "__slot__"], kind="mergesort")
        keys = df["pair_key"].to_numpy()
        both = (keys[:-1] == keys[1:]) if len(keys) > 1 else np.array([], bool)
        idx = np.flatnonzero(both)
        out_a, out_b, out_j = [], [], []
        sh = df["__sh__"].to_numpy()
        ia_all = df["id_a"].to_numpy()
        ib_all = df["id_b"].to_numpy()
        for i in idx:
            sa = np.frombuffer(sh[i], dtype=np.uint64)
            sb = np.frombuffer(sh[i + 1], dtype=np.uint64)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            jac = inter / union if union else 0.0
            if jac >= jaccard_threshold:
                out_a.append(ia_all[i])
                out_b.append(ib_all[i])
                out_j.append(round_half_away_scalar(jac, 6))
        return pd.DataFrame({"id_a": pd.array(out_a, dtype="int64"),
                             "id_b": pd.array(out_b, dtype="int64"),
                             "jaccard": pd.array(out_j, dtype="float64")})

    return grouped_apply(sides, "pair_key", verify_bucket, num_buckets)


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
