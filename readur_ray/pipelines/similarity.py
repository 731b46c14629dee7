"""Similarity search over the `embeddings` table (list<float> column).

- ``ann_topk`` — brute-force cosine top-k: per-batch float64 matmul
  against a broadcast query matrix, batch-local top-k, exact global
  top-k via a groupby(query_id) reduce. The baseline every ANN variant
  is measured against.
- ``lsh_buckets`` — random-hyperplane LSH using anchor embeddings as
  hyperplanes (deterministic, SQL-mirrorable: sign of cosine vs each
  anchor); the bucketed scale path.
- ``ann_topk_lsh`` — top-k restricted to same-bucket candidates.

Scale notes: the query matrix / anchor matrix are ``ray.put`` once and
read inside ``map_batches`` (never re-shipped per batch). The top-k
reduce shuffles only (query_id, neighbor_id, sim) rows — k per query
per *batch*, not per row. Outputs carry only integer ids and ranks so
float summation order never crosses the comparison boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .dedup import _emb_np

N_QUERIES = 16            # queries = vec_id < N_QUERIES
TOP_K = 5
N_ANCHORS = 8             # hyperplanes = embeddings with vec_id in [16, 24)
ANCHOR_LO = 16


def _normalized(table: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = table.column("vec_id").to_numpy(zero_copy_only=False)
    emb = _emb_np(table.column("embedding"))
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, emb / norms


def _load_rows(sf_dir: str, lo: int, hi: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.dataset as pads

    dset = pads.dataset(f"{sf_dir}/embeddings.parquet")
    t = dset.to_table(
        columns=["vec_id", "embedding"],
        filter=(pads.field("vec_id") >= lo) & (pads.field("vec_id") < hi),
    )
    ids, mat = _normalized(t)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _read_embeddings(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _topk_groups(k: int):
    def fn(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group,
            sort_keys=[("sim", "descending"), ("neighbor_id", "ascending")],
        )
        g = group.take(idx[:k])
        n = g.num_rows
        return pa.table(
            {
                "query_id": g.column("query_id"),
                "neighbor_id": g.column("neighbor_id"),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int64), pa.int64()),
            }
        )

    return fn


def ann_topk(
    sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K
) -> "ray.data.Dataset":
    """Exact cosine top-k per query (query_id, neighbor_id, rank)."""
    qids, qmat = _load_rows(sf_dir, 0, n_queries)
    ref = ray.put((qids, qmat))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(ref)
        ids, mat = _normalized(batch)
        sims = q_mat @ mat.T                       # (nq, batch)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q_ids)):
            row = sims[qi]
            mask = ids != q_ids[qi]               # exclude self
            cand = np.flatnonzero(mask)
            if cand.size == 0:
                continue
            take = cand[np.argsort(-row[cand], kind="stable")[:k]]
            out_q.extend([q_ids[qi]] * len(take))
            out_n.extend(ids[take].tolist())
            out_s.extend(row[take].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return (
        _read_embeddings(sf_dir)
        .map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_topk_groups(k), batch_format="pyarrow")
    )


def ann_topk_ivf(
    sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K
) -> "ray.data.Dataset":
    """IVF-style ANN: the `label` column acts as the coarse quantizer
    (inverted file list); each query probes ONLY its own list's
    vectors. At scale this is the partition-pruned path: lists are
    hash-partitioned by label, a query touches 1/nlist of the data.
    Output (query_id, neighbor_id, rank) like ann_topk."""
    import pyarrow.dataset as pads

    dset = pads.dataset(f"{sf_dir}/embeddings.parquet")
    qt = dset.to_table(
        columns=["vec_id", "embedding", "label"],
        filter=pads.field("vec_id") < n_queries,
    )
    qids, qmat = _normalized(qt.select(["vec_id", "embedding"]))
    order = np.argsort(qids)
    qids, qmat = qids[order], qmat[order]
    qlabels = np.array(qt.column("label").to_pylist())[
        np.argsort(qt.column("vec_id").to_numpy(zero_copy_only=False))
    ]
    ref = ray.put((qids, qmat, qlabels))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, q_labels = ray.get(ref)
        ids, mat = _normalized(batch.select(["vec_id", "embedding"]))
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        sims = q_mat @ mat.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q_ids)):
            mask = (labels == q_labels[qi]) & (ids != q_ids[qi])
            cand = np.flatnonzero(mask)
            if cand.size == 0:
                continue
            row = sims[qi]
            take = cand[np.argsort(-row[cand], kind="stable")[:k]]
            out_q.extend([q_ids[qi]] * len(take))
            out_n.extend(ids[take].tolist())
            out_s.extend(row[take].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_topk_groups(k), batch_format="pyarrow")
    )


def bucket_strings(bits: np.ndarray) -> np.ndarray:
    """Vectorized '0101…' bucket strings from an (n, b) bool matrix: a
    U1 char matrix viewed as U<b> rows — no per-row Python join."""
    n, b = bits.shape
    if n == 0:
        return np.empty(0, dtype=f"<U{b}")
    chars = np.where(bits, "1", "0").astype("<U1")
    return np.ascontiguousarray(chars).view(f"<U{b}").ravel()


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """Sign bits → one int64 per row (for comparisons; string form is
    only for SQL-mirrorable output)."""
    b = bits.shape[1]
    weights = (1 << np.arange(b - 1, -1, -1)).astype(np.int64)
    return bits.astype(np.int64) @ weights


def lsh_buckets(sf_dir: str) -> "ray.data.Dataset":
    """(vec_id, bucket): bucket = sign bits of cosine vs the anchor
    embeddings, most-significant anchor first (anchor order = vec_id)."""
    aids, amat = _load_rows(sf_dir, ANCHOR_LO, ANCHOR_LO + N_ANCHORS)
    ref = ray.put(amat)

    def fn(batch: pa.Table) -> pa.Table:
        anchors = ray.get(ref)
        ids, mat = _normalized(batch)
        bits = (mat @ anchors.T) > 0               # (batch, n_anchors)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(bucket_strings(bits), pa.string()),
            }
        )

    return _read_embeddings(sf_dir).map_batches(fn, batch_format="pyarrow")


def ann_topk_lsh(
    sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K
) -> "ray.data.Dataset":
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Same output shape as ann_topk (query_id, neighbor_id,
    rank); recall < 1 by construction — the tradeoff the bucketed
    path buys at scale."""
    qids, qmat = _load_rows(sf_dir, 0, n_queries)
    aids, amat = _load_rows(sf_dir, ANCHOR_LO, ANCHOR_LO + N_ANCHORS)
    qbuckets = pack_bits((qmat @ amat.T) > 0)
    ref = ray.put((qids, qmat, qbuckets, amat))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, q_buckets, anchors = ray.get(ref)
        ids, mat = _normalized(batch)
        ebuckets = pack_bits((mat @ anchors.T) > 0)
        sims = q_mat @ mat.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q_ids)):
            mask = (ebuckets == q_buckets[qi]) & (ids != q_ids[qi])
            cand = np.flatnonzero(mask)
            if cand.size == 0:
                continue
            row = sims[qi]
            take = cand[np.argsort(-row[cand], kind="stable")[:k]]
            out_q.extend([q_ids[qi]] * len(take))
            out_n.extend(ids[take].tolist())
            out_s.extend(row[take].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return (
        _read_embeddings(sf_dir)
        .map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_topk_groups(k), batch_format="pyarrow")
    )


QUANT = 1_000_000   # fixed-point grid for the exact-integer k-means
KM_K = N_ANCHORS    # k = 8 cells, seeded from the anchor vectors
KM_ITERS = 2        # exact-integer k-means refinement passes


def _quantize(mat: np.ndarray) -> np.ndarray:
    """float → int64 fixed-point (floor(x*1e6 + 0.5)) — every distance
    and centroid below is EXACT integer math, so the DuckDB oracle
    reproduces the whole clustering bit-for-bit."""
    return np.floor(mat * QUANT + 0.5).astype(np.int64)


# float64 holds every integer below 2^53 exactly, and adding exactly-
# representable integers whose running sums stay below 2^53 is exact in
# ANY order — so for unit-norm quantized vectors (|coord| ≤ QUANT=1e6,
# products ≤ 1e12, d² ≤ 4·dim·1e12) the whole distance computation is
# bit-identical in float64 up to dim 2251. BLAS dgemm is ~40× numpy's
# naive int64 matmul, which was semdedup's 1.34×-linear term in the 2M
# scale run (assignment is O(n·nlist) and nlist grows with the corpus).
_EXACT_F64_DIM = 2048


def _assign(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest centroid by squared L2 (ties → lower centroid index).

    Exact integer semantics (the DuckDB oracles pin the clustering
    bit-for-bit); the arithmetic runs in float64 BLAS when the
    exactness bound above holds, falling back to int64 beyond it."""
    if q.shape[1] <= _EXACT_F64_DIM:
        qf = q.astype(np.float64)
        cf = cents.astype(np.float64)
        d2 = (
            (qf * qf).sum(axis=1, keepdims=True)
            - 2.0 * (qf @ cf.T)
            + (cf * cf).sum(axis=1)[None, :]
        )
    else:
        d2 = (
            (q * q).sum(axis=1, keepdims=True)
            - 2 * (q @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
    return np.argmin(d2, axis=1)  # argmin takes the FIRST min → lower c


# Session-scoped memo for the trained quantizer: semdedup,
# prototype_score, knn_graph and the kmeans-IVF rankers all train the
# IDENTICAL centroids for a given (corpus, nlist) — the training passes
# (KM_ITERS full scans) dominated each query's cost when swept
# back-to-back. Keyed like dedup._FUNNEL_CACHE: (abspath, mtime, job,
# k); the value is a k×dim int64 array (KBs on the driver heap).
_CENTROID_CACHE: dict[tuple, np.ndarray] = {}


def _train_centroids(
    ds: "ray.data.Dataset", sf_dir: str, k: int = KM_K
) -> np.ndarray:
    """KM_ITERS exact-integer k-means passes (seed = anchor vectors,
    assign by squared L2, centroid update = truncating integer division
    of coordinate sums — matches DuckDB's `//`). Each pass is a
    fixed-size (k × dim) integer aggregate: per-batch partial sums,
    tiny driver reduce holding k·dim ints — NOT O(n) state.

    ``k`` is the nlist dial: the oracle queries train the default
    KM_K(=8)-cell quantizer seeded from the anchor block; a scale run
    passes k ~ corpus_size / target_cell_size (SemDeDup used 50k cells
    for 100M items) and seeds from the k vec_ids starting at
    ANCHOR_LO, which stays deterministic for any k."""
    import os as _os

    import pyarrow.parquet as _pq

    emb_path = _os.path.join(sf_dir, "embeddings.parquet")
    try:
        session = ray.get_runtime_context().get_job_id()
    except Exception:
        session = None
    scope = (_os.path.abspath(sf_dir), _os.path.getmtime(emb_path), session)
    key = (*scope, k)
    hit = _CENTROID_CACHE.get(key)
    if hit is not None:
        return hit

    seed_tbl = _pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", ">=", ANCHOR_LO), ("vec_id", "<", ANCHOR_LO + k)],
    ).sort_by("vec_id")
    cents = _quantize(_emb_np(seed_tbl.column("embedding")))
    dim = cents.shape[1]

    for _ in range(KM_ITERS):
        cur_ref = ray.put(cents)

        def partial_sums(batch: pa.Table, _ref=cur_ref) -> pa.Table:
            cn = ray.get(_ref)
            q = _quantize(
                _emb_np(batch.column("embedding"))
            )
            a = _assign(q, cn)
            rows_c, rows_n, rows_s = [], [], []
            for c in np.unique(a):
                m = a == c
                rows_c.append(int(c))
                rows_n.append(int(m.sum()))
                rows_s.append(q[m].sum(axis=0))
            return pa.table(
                {
                    "c": pa.array(rows_c, pa.int64()),
                    "n": pa.array(rows_n, pa.int64()),
                    "s": pa.array([s.tolist() for s in rows_s],
                                  pa.list_(pa.int64())),
                }
            )

        parts = ds.map_batches(partial_sums, batch_format="pyarrow").take_all()
        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["c"]] += np.array(r["s"], dtype=np.int64)
            counts[r["c"]] += r["n"]
        # empty cells keep their previous centroid (counts guard)
        prev = cents
        counts_safe = np.maximum(counts, 1)
        cents = (np.sign(sums) * (np.abs(sums) // counts_safe[:, None])).astype(np.int64)
        cents[counts == 0] = prev[counts == 0]
    # one corpus+session at a time: evict other scopes, keep this
    # scope's other k values (the dial queries share a sweep)
    for stale in [c for c in _CENTROID_CACHE if c[:3] != scope]:
        del _CENTROID_CACHE[stale]
    _CENTROID_CACHE[key] = cents
    return cents


def _ann_ivf_kmeans(sf_dir: str, k: int, nprobe: int) -> "ray.data.Dataset":
    """k-means IVF ranking, STREAMED: after training, the queries (a
    constant-size set) are quantized, assigned their nprobe nearest
    cells, and broadcast with the centroids. One map_batches pass then
    does batch-local candidate selection (rows whose cell is among the
    query's probe cells) + batch-local top-k by (d2, id); a tiny
    groupby(query_id) reduce merges k-per-query-per-batch rows into the
    global top-k — the same shape as ann_topk. No task ever
    materializes a whole cell (the round-2 groupby("cell") plan held
    ~n/nlist rows per map_groups task, an OOM at 10^12 vectors)."""
    ds = _read_embeddings(sf_dir)
    cents = _train_centroids(ds, sf_dir)

    import pyarrow.parquet as _pq

    qt = _pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", N_QUERIES)],
    ).sort_by("vec_id")
    qids = qt.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    qint = _quantize(_emb_np(qt.column("embedding")))
    qd2 = (
        (qint * qint).sum(axis=1, keepdims=True)
        - 2 * (qint @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )
    qprobe = np.argsort(qd2, axis=1, kind="stable")[:, :nprobe]
    ref = ray.put((qids, qint, qprobe, cents))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_int, q_probe, cn = ray.get(ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        v = _quantize(_emb_np(batch.column("embedding")))
        cells = _assign(v, cn)
        d2 = (
            (q_int * q_int).sum(axis=1, keepdims=True)
            - 2 * (q_int @ v.T)
            + (v * v).sum(axis=1)[None, :]
        )
        out_q, out_n, out_d = [], [], []
        for qi in range(len(q_ids)):
            mask = np.isin(cells, q_probe[qi]) & (ids != q_ids[qi])
            cand = np.flatnonzero(mask)
            if cand.size == 0:
                continue
            take = cand[np.lexsort((ids[cand], d2[qi][cand]))[:k]]
            out_q.extend([q_ids[qi]] * len(take))
            out_n.extend(ids[take].tolist())
            out_d.extend(d2[qi][take].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "d2": pa.array(np.array(out_d, dtype=np.int64), pa.int64()),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("d2", "ascending"), ("neighbor_id", "ascending")]
        )
        g = group.take(idx[:k])
        return pa.table(
            {
                "query_id": g.column("query_id"),
                "neighbor_id": g.column("neighbor_id"),
                "rank": pa.array(
                    np.arange(1, g.num_rows + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pyarrow")
    )


def ann_topk_ivf_kmeans(
    sf_dir: str, k: int = TOP_K, nprobe: int = 1
) -> "ray.data.Dataset":
    """IVF with LEARNED centroids (FAISS-style construction, kept
    bit-reproducible): exact-integer k-means training, then each query
    probes its own cell. See _ann_ivf_kmeans for the streamed ranking
    plan — batch-local top-k + per-query merge, never a whole-cell
    materialization."""
    return _ann_ivf_kmeans(sf_dir, k, 1)


def ann_topk_ivf_kmeans_probe2(
    sf_dir: str, k: int = TOP_K, nprobe: int = 2
) -> "ray.data.Dataset":
    """Multi-probe k-means IVF: each query probes its nprobe=2 nearest
    cells (data vectors still live in exactly one cell) — the standard
    recall lever over single-probe IVF; measured recall@5 roughly
    doubles at nprobe=2 on the synthetic embeddings."""
    return _ann_ivf_kmeans(sf_dir, k, 2)


SEMDEDUP_BLOCK = 1024   # pairwise tile width — caps the sim matrix
                        # at block² floats regardless of cell size


def semdedup(
    sf_dir: str, nlist: int = KM_K, block: int = SEMDEDUP_BLOCK
) -> "ray.data.Dataset":
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public): cluster the embedding space with the
    SAME exact-integer k-means quantizer the IVF index trains, then
    within each cluster connect vectors whose cosine ≥
    EMBED_COS_THRESHOLD and keep one representative (min vec_id) per
    within-cell component. Output per vector: (vec_id, cell, rep_id,
    kept) — ``kept == 0`` rows are the semantic duplicates a curation
    pass drops.

    Scale shape: training is KM_ITERS fixed-size (nlist × dim) integer
    aggregates (never O(n) driver state); assignment is one vectorized
    pass; the only shuffle is groupby(cell). Two explicit dials keep
    the within-cell stage bounded at 10^12 rows:

    - ``nlist`` — cells scale with corpus size so E[cell size] stays
      fixed (the paper used 50k clusters for 100M items; the default
      mirrors the 8-cell oracle). A cell must fit one map_groups task:
      nlist ≈ corpus_size / target_cell_rows.
    - ``block`` — the within-cell pairwise runs as block × block
      TILES over the id-sorted cell matrix, feeding a running
      union-find; peak memory is block² floats + the cell's own
      embeddings, never cell² (the round-3 dense `mat @ mat.T` OOMed
      at 100× cell growth). Tiling visits the identical i<j edge set,
      so components and min-id reps are bit-equal to the dense path.
    """
    from .dedup import EMBED_COS_THRESHOLD, _normalized_matrix, _UnionFind

    ds = _read_embeddings(sf_dir)
    cents = _train_centroids(ds, sf_dir, nlist)
    cref = ray.put(cents)

    def assign_rows(batch: pa.Table) -> pa.Table:
        cn = ray.get(cref)
        q = _quantize(
            _emb_np(batch.column("embedding"))
        )
        cells = _assign(q, cn).astype(np.int64)
        return batch.append_column("cell", pa.array(cells, pa.int64()))

    def cell_dedup(group: pa.Table) -> pa.Table:
        ids, mat = _normalized_matrix(group)
        order = np.argsort(ids)         # deterministic tiling order
        ids, mat = ids[order], mat[order]
        m = len(ids)
        uf = _UnionFind()
        for a0 in range(0, m, block):
            a1 = min(a0 + block, m)
            left = mat[a0:a1]
            # j tiles start at the i tile: ids are sorted, so every
            # i<j pair lives in the upper triangle of some tile pair
            for b0 in range(a0, m, block):
                b1 = min(b0 + block, m)
                sims = left @ mat[b0:b1].T
                ii, jj = np.nonzero(
                    (sims >= EMBED_COS_THRESHOLD)
                    & (ids[a0:a1, None] < ids[None, b0:b1])
                )
                for a, b in zip(
                    ids[a0 + ii].tolist(), ids[b0 + jj].tolist()
                ):
                    uf.union(a, b)
        rep = np.array([uf.find(int(i)) for i in ids], dtype=np.int64)
        cells = group.column("cell").to_numpy(zero_copy_only=False)[order]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cell": pa.array(cells, pa.int64()),
                "rep_id": pa.array(rep, pa.int64()),
                "kept": pa.array((rep == ids).astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(assign_rows, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_dedup, batch_format="pyarrow")
    )


def prototype_score(sf_dir: str, nlist: int = KM_K) -> "ray.data.Dataset":
    """Prototypicality scoring for data pruning (Sorscher et al. 2022,
    arXiv:2206.14486 "Beyond neural scaling laws", SSL-prototypes —
    public): cluster the embedding space with the SAME exact-integer
    k-means quantizer the IVF index trains, then score every vector by
    its squared distance to its own cell centroid and rank vectors
    within each cell hardest-first. ``hardness_rank == 1`` is the
    cell's most atypical example — the rank a pruning pass thresholds
    (keep hard examples when data is abundant, easy ones when scarce).

    Scale shape: training is KM_ITERS fixed-size (nlist × dim) integer
    aggregates; scoring is one vectorized streaming pass. The ONLY
    shuffle is groupby(cell) over (vec_id, cell, d2) int64 triples —
    24 B/row, embeddings never ride the wire — and the in-cell rank
    sort holds just those triples, so even a 10^8-row cell is ~2.4 GB;
    ``nlist`` scales with corpus size to bound E[cell size] (same dial
    and contract as semdedup). All distances are exact int64 on the
    QUANT fixed-point grid, so the DuckDB oracle reproduces cell
    assignment, distance and rank bit-for-bit.
    """
    ds = _read_embeddings(sf_dir)
    cents = _train_centroids(ds, sf_dir, nlist)
    cref = ray.put(cents)

    def score_rows(batch: pa.Table) -> pa.Table:
        cn = ray.get(cref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        q = _quantize(
            _emb_np(batch.column("embedding"))
        )
        d2 = (
            (q * q).sum(axis=1, keepdims=True)
            - 2 * (q @ cn.T)
            + (cn * cn).sum(axis=1)[None, :]
        )
        cells = np.argmin(d2, axis=1)  # first min → lower centroid id
        dmin = d2[np.arange(len(ids)), cells]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cell": pa.array(cells.astype(np.int64), pa.int64()),
                "d2_centroid": pa.array(dmin.astype(np.int64), pa.int64()),
            }
        )

    def rank_cell(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        d2 = group.column("d2_centroid").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -d2))  # hardest first, vec_id tiebreak
        rank = np.empty(len(ids), dtype=np.int64)
        rank[order] = np.arange(1, len(ids) + 1)
        return pa.table(
            {
                "vec_id": group.column("vec_id"),
                "cell": group.column("cell"),
                "d2_centroid": group.column("d2_centroid"),
                "hardness_rank": pa.array(rank, pa.int64()),
            }
        )

    return (
        ds.map_batches(score_rows, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(rank_cell, batch_format="pyarrow")
    )


KNN_K = 3   # neighbors per vector in the cell-local kNN graph


def knn_graph(sf_dir: str, k: int = KNN_K, nlist: int = KM_K,
              block: int = SEMDEDUP_BLOCK) -> "ray.data.Dataset":
    """Cell-local kNN-graph construction: for EVERY vector, its k
    nearest same-cell neighbors by exact int64 squared L2 on the
    QUANT fixed-point grid — the all-vectors graph that SemDeDup-family
    curation, density filtering and graph-based near-dup clustering
    consume (vs ann_topk's fixed query set). Output: (vec_id,
    neighbor_id, d2, rank), rank 1..k ordered by (d2, neighbor_id).

    Scale shape: same contract as semdedup — one groupby(cell) shuffle,
    ``nlist`` scales with corpus size to bound E[cell size], and the
    in-cell pairwise runs as block × block tiles carrying a RUNNING
    top-k per row (k ints per row, never the cell² distance matrix).
    Tiles see the identical candidate set as a dense pass, so the graph
    is bit-equal to the oracle's full within-cell ranking."""
    ds = _read_embeddings(sf_dir)
    cents = _train_centroids(ds, sf_dir, nlist)
    cref = ray.put(cents)

    def assign_rows(batch: pa.Table) -> pa.Table:
        cn = ray.get(cref)
        q = _quantize(
            _emb_np(batch.column("embedding"))
        )
        cells = _assign(q, cn).astype(np.int64)
        return batch.append_column("cell", pa.array(cells, pa.int64()))

    SENT = np.iinfo(np.int64).max  # pads rows with < k real neighbors

    def _rowwise_topk(cand_d: np.ndarray, cand_i: np.ndarray, keep: int):
        """Per-row exact (d2, neighbor_id)-ordered first ``keep``
        columns: two stable argsorts (id then d2) give the row-wise
        two-key order fully vectorized — no per-row Python."""
        o1 = np.argsort(cand_i, axis=1, kind="stable")
        cand_d = np.take_along_axis(cand_d, o1, axis=1)
        cand_i = np.take_along_axis(cand_i, o1, axis=1)
        o2 = np.argsort(cand_d, axis=1, kind="stable")
        return (
            np.take_along_axis(cand_d, o2, axis=1)[:, :keep],
            np.take_along_axis(cand_i, o2, axis=1)[:, :keep],
        )

    def cell_knn(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _quantize(
            _emb_np(group.column("embedding"))
        )
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        m = len(ids)
        sq = (mat * mat).sum(axis=1)
        src_parts, dst_parts, d2_parts, rank_parts = [], [], [], []
        for a0 in range(0, m, block):
            a1 = min(a0 + block, m)
            # running best-k per row: exact (d2, id) order maintained
            # tile by tile, width ≤ k + block, never the cell² matrix
            best_d = np.empty((a1 - a0, 0), dtype=np.int64)
            best_i = np.empty((a1 - a0, 0), dtype=np.int64)
            for b0 in range(0, m, block):
                b1 = min(b0 + block, m)
                d2 = (
                    sq[a0:a1, None]
                    - 2 * (mat[a0:a1] @ mat[b0:b1].T)
                    + sq[None, b0:b1]
                )
                # self-pairs leave the candidate set via the sentinel
                d2[ids[a0:a1, None] == ids[None, b0:b1]] = SENT
                best_d, best_i = _rowwise_topk(
                    np.concatenate([best_d, d2], axis=1),
                    np.concatenate(
                        [best_i, np.broadcast_to(ids[b0:b1], d2.shape)], axis=1
                    ),
                    min(k, best_d.shape[1] + d2.shape[1]),
                )
            valid = best_d != SENT  # rows already (d2, id)-ordered
            counts = valid.sum(axis=1)
            src_parts.append(np.repeat(ids[a0:a1], counts))
            dst_parts.append(best_i[valid])
            d2_parts.append(best_d[valid])
            # sentinels sort last, so valid entries fill the leading
            # columns and the column index IS the (rank - 1)
            rank_parts.append(
                np.broadcast_to(
                    np.arange(1, best_d.shape[1] + 1, dtype=np.int64),
                    best_d.shape,
                )[valid]
            )
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(src_parts), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(dst_parts), pa.int64()),
                "d2": pa.array(np.concatenate(d2_parts), pa.int64()),
                "rank": pa.array(np.concatenate(rank_parts), pa.int64()),
            }
        )

    return (
        ds.map_batches(assign_rows, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_knn, batch_format="pyarrow")
    )


PQ_M = 4                 # subspaces (64 dims → 4 × 16)
PQ_SUB = 64 // PQ_M      # dims per subspace
PQ_K = KM_K              # codes per subspace, seeded from the anchors


def _train_pq_codebooks(
    ds: "ray.data.Dataset", sf_dir: str, m: int = PQ_M, k: int = PQ_K
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search", IEEE TPAMI — public):
    split each vector into ``m`` contiguous subvectors and train an
    INDEPENDENT exact-integer k-means per subspace — same grid
    (QUANT), seeds (anchor block), iteration count (KM_ITERS), tie
    rule (lower code) and truncating centroid division as
    `_train_centroids`, so the DuckDB oracle replays every subspace
    bit-for-bit with one extra `dim // PQ_SUB` grouping key.

    One full pass per iteration trains ALL subspaces at once: a batch
    emits per-(subspace, code) counts + coordinate sums (m × k rows of
    PQ_SUB ints — fixed size, never O(n)); the driver reduce holds an
    (m, k, PQ_SUB) int64 array. Memoized like `_CENTROID_CACHE`
    (same scope key, "pq" tag) — the ADC query below and any IVF-PQ
    composition share one training run per sweep."""
    import os as _os

    import pyarrow.parquet as _pq

    emb_path = _os.path.join(sf_dir, "embeddings.parquet")
    try:
        session = ray.get_runtime_context().get_job_id()
    except Exception:
        session = None
    scope = (_os.path.abspath(sf_dir), _os.path.getmtime(emb_path), session)
    key = (*scope, ("pq", m, k))
    hit = _CENTROID_CACHE.get(key)
    if hit is not None:
        return hit

    seed_tbl = _pq.read_table(
        emb_path, columns=["vec_id", "embedding"],
        filters=[("vec_id", ">=", ANCHOR_LO), ("vec_id", "<", ANCHOR_LO + k)],
    ).sort_by("vec_id")
    seeds = _quantize(
        _emb_np(seed_tbl.column("embedding"))
    )
    sub = seeds.shape[1] // m
    # (m, k, sub): codebook[s][c] = centroid c of subspace s
    books = np.stack([seeds[:, s * sub:(s + 1) * sub] for s in range(m)])

    for _ in range(KM_ITERS):
        cur_ref = ray.put(books)

        def partial_sums(batch: pa.Table, _ref=cur_ref) -> pa.Table:
            bk = ray.get(_ref)
            q = _quantize(
                _emb_np(batch.column("embedding"))
            )
            rows_s, rows_c, rows_n, rows_sum = [], [], [], []
            for s in range(bk.shape[0]):
                qs = q[:, s * sub:(s + 1) * sub]
                a = _assign(qs, bk[s])
                for c in np.unique(a):
                    msk = a == c
                    rows_s.append(s)
                    rows_c.append(int(c))
                    rows_n.append(int(msk.sum()))
                    rows_sum.append(qs[msk].sum(axis=0).tolist())
            return pa.table(
                {
                    "s": pa.array(rows_s, pa.int64()),
                    "c": pa.array(rows_c, pa.int64()),
                    "n": pa.array(rows_n, pa.int64()),
                    "sum": pa.array(rows_sum, pa.list_(pa.int64())),
                }
            )

        parts = ds.map_batches(partial_sums, batch_format="pyarrow").take_all()
        sums = np.zeros((m, k, sub), dtype=np.int64)
        counts = np.zeros((m, k), dtype=np.int64)
        for r in parts:
            sums[r["s"], r["c"]] += np.array(r["sum"], dtype=np.int64)
            counts[r["s"], r["c"]] += r["n"]
        prev = books
        safe = np.maximum(counts, 1)[:, :, None]
        books = (np.sign(sums) * (np.abs(sums) // safe)).astype(np.int64)
        books[counts == 0] = prev[counts == 0]

    for stale in [c for c in _CENTROID_CACHE if c[:3] != scope]:
        del _CENTROID_CACHE[stale]
    _CENTROID_CACHE[key] = books
    return books


def pq_topk(
    sf_dir: str, n_queries: int = N_QUERIES, k: int = TOP_K, m: int = PQ_M
) -> "ray.data.Dataset":
    """PQ-ADC approximate top-k (query_id, neighbor_id, rank): every
    data vector is compressed to ``m`` one-byte codes (its nearest
    codebook entry per subspace); a query's distance to a data vector
    is the ASYMMETRIC distance — exact query subvector vs the data
    vector's reconstructed codes — computed as m table lookups into
    the query's precomputed (m × PQ_K) distance table, never a d-dim
    matmul against the corpus. All distances are exact int64 on the
    QUANT grid, so the oracle replays them bit-for-bit.

    Scale shape: this is the memory-side scale lever the rest of the
    ANN family lacks — at 10^12 vectors the corpus no longer fits the
    object store as floats (64 dims × f32 = 256 B/vec → 256 TB), but
    PQ codes are m bytes/vec (4 TB at m=4), and the scan is a pure
    table-lookup gather. Training is KM_ITERS fixed-size (m × PQ_K ×
    PQ_SUB) integer aggregates; the query tables (n_queries × m ×
    PQ_K ints) broadcast once via ray.put; per batch: encode
    (batch × m argmins over PQ_K) + gather + batch-local top-k; the
    only shuffle is the tiny k-per-query-per-batch merge, identical
    to ann_topk's. Recall is tuned by m and PQ_K (and an IVF coarse
    stage composes in front exactly like ann_topk_ivf_kmeans)."""
    ds = _read_embeddings(sf_dir)
    books = _train_pq_codebooks(ds, sf_dir, m)
    sub = books.shape[2]

    import pyarrow.parquet as _pq

    qt = _pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    ).sort_by("vec_id")
    qids = qt.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    qint = _quantize(_emb_np(qt.column("embedding")))
    # ADC tables: dtab[qi, s, c] = ||q_s - books[s, c]||² (exact int64)
    dtab = np.zeros((len(qids), books.shape[0], books.shape[1]), dtype=np.int64)
    for s in range(books.shape[0]):
        qs = qint[:, s * sub:(s + 1) * sub]
        diff = qs[:, None, :] - books[s][None, :, :]
        dtab[:, s, :] = (diff * diff).sum(axis=2)
    ref = ray.put((qids, dtab, books))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_tab, bk = ray.get(ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        v = _quantize(_emb_np(batch.column("embedding")))
        n, mm = len(ids), bk.shape[0]
        codes = np.empty((n, mm), dtype=np.int64)
        for s in range(mm):
            codes[:, s] = _assign(v[:, s * sub:(s + 1) * sub], bk[s])
        # adc[qi, i] = Σ_s dtab[qi, s, codes[i, s]] — pure gather
        adc = np.zeros((len(q_ids), n), dtype=np.int64)
        for s in range(mm):
            adc += q_tab[:, s, codes[:, s]]
        out_q, out_n, out_d = [], [], []
        for qi in range(len(q_ids)):
            mask = ids != q_ids[qi]
            cand = np.flatnonzero(mask)
            if cand.size == 0:
                continue
            take = cand[np.lexsort((ids[cand], adc[qi][cand]))[:k]]
            out_q.extend([q_ids[qi]] * len(take))
            out_n.extend(ids[take].tolist())
            out_d.extend(adc[qi][take].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "d2": pa.array(np.array(out_d, dtype=np.int64), pa.int64()),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("d2", "ascending"), ("neighbor_id", "ascending")]
        )
        g = group.take(idx[:k])
        return pa.table(
            {
                "query_id": g.column("query_id"),
                "neighbor_id": g.column("neighbor_id"),
                "rank": pa.array(
                    np.arange(1, g.num_rows + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pyarrow")
    )


GRAM_DIMS = 64  # embedding width of the fixture table


def gram_matrix(sf_dir: str) -> "ray.data.Dataset":
    """Exact second-moment (Gram) sufficient statistics of the
    embedding column: one row per dim pair i <= j carrying
    (n, sum_i, sum_j, dot = sum over vectors of q_i*q_j) on the QUANT
    fixed-point grid — the inputs to covariance / PCA / whitening /
    linear probes (mean-center and eigendecompose the tiny d x d
    matrix on the driver; LeCun et al. "Efficient BackProp" whitening,
    the SemDeDup/SSL-prototypes preprocessing step at corpus scale).

    The linear-algebra moment-REDUCE class: unlike trend_slopes'
    per-group scalar (x, y) moments, the reduced object is the vector
    OUTER PRODUCT over a list column — d(d+1)/2 pair statistics from
    one pass.

    Scale shape: each batch folds into ONE d x d int64 partial
    (q.T @ q) plus a d-vector of coordinate sums — fixed size
    regardless of batch rows — emitted as d(d+1)/2 partial rows; a
    single groupby((i, j)).Sum() reduce over #batches x 2,080 integer
    rows finishes. No data-row shuffle, no driver state. int64 stays
    exact to ~3.7e7 rows per partial at |q| <= 5e5 (5e5^2 * 3.7e7 <
    2^63); beyond, insert one more partial level (the partials are
    mergeable) or move the dot column to the oracle's HUGEINT via
    per-shard splits. Mirrors the reference's aggregate-statistics
    surface (metrics collection) on the vector table."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )
    iu, ju = np.triu_indices(GRAM_DIMS)

    def partial(batch: pa.Table) -> pa.Table:
        q = _quantize(
            _emb_np(batch.column("embedding"))
        )
        g = q.T @ q
        s = q.sum(axis=0)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64), pa.int64()),
                "j": pa.array(ju.astype(np.int64), pa.int64()),
                "n_p": pa.array(
                    np.full(iu.size, q.shape[0], np.int64), pa.int64()
                ),
                "si_p": pa.array(s[iu], pa.int64()),
                "sj_p": pa.array(s[ju], pa.int64()),
                "dot_p": pa.array(g[iu, ju], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(
            Sum("n_p", alias_name="n"),
            Sum("si_p", alias_name="sum_i"),
            Sum("sj_p", alias_name="sum_j"),
            Sum("dot_p", alias_name="dot"),
        )
    )
    return agg.sort(["i", "j"])


def knn_label_vote(sf_dir: str, k: int = KNN_K) -> "ray.data.Dataset":
    """Graph-based semi-supervised inference — one round of kNN
    majority-vote label propagation over the `knn_graph` edges: every
    vector's predicted label is the most frequent label among its k
    nearest same-cell neighbors (ties → min label) — the
    nearest-neighbor classifier / label-propagation seed step (Zhu &
    Ghahramani 2002) that curation uses to audit label noise (a vector
    whose vote disagrees with its own label is a mislabel candidate).

    Scale shape: the label side is vector-cardinality, so it is NEVER
    broadcast — neighbor labels attach via a co-partitioned union join
    (label rows and edge rows share one coarse shuffle keyed on the
    labeled vector id), votes pre-reduce per partition, and a second
    vec_id-keyed shuffle runs the argmax-per-group kernel. Two coarse
    exchanges of int64 triples total, on top of knn_graph's one
    cell shuffle. Output: (vec_id, pred_label, n_votes)."""
    from ..stages.shuffle import N_COARSE_PARTS

    edges = knn_edges_materialized(sf_dir)
    labels = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    )

    def label_side(batch: pa.Table) -> pa.Table:
        key = batch.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "val": batch.column("label").cast(pa.int64()),
                "side": pa.array(np.zeros(len(key), np.int64), pa.int64()),
                "part": pa.array(key % N_COARSE_PARTS, pa.int64()),
            }
        )

    def edge_side(batch: pa.Table) -> pa.Table:
        key = batch.column("neighbor_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "val": batch.column("vec_id").cast(pa.int64()),
                "side": pa.array(np.ones(len(key), np.int64), pa.int64()),
                "part": pa.array(key % N_COARSE_PARTS, pa.int64()),
            }
        )

    def attach(part_tbl: pa.Table) -> pa.Table:
        key = part_tbl.column("key").to_numpy(zero_copy_only=False)
        val = part_tbl.column("val").to_numpy(zero_copy_only=False)
        side = part_tbl.column("side").to_numpy(zero_copy_only=False)
        lk, lv = key[side == 0], val[side == 0]
        ek, ev = key[side == 1], val[side == 1]  # ev = voting vec_id
        order = np.argsort(lk, kind="stable")
        lk, lv = lk[order], lv[order]
        pos = np.searchsorted(lk, ek)
        lab = lv[np.minimum(pos, max(len(lk) - 1, 0))]
        # pre-reduce votes per (vec_id, label) before shuffle 2
        t = pa.table(
            {
                "vec_id": pa.array(ev, pa.int64()),
                "lab": pa.array(lab, pa.int64()),
                "one": pa.array(np.ones(len(ev), np.int64), pa.int64()),
            }
        ).group_by(["vec_id", "lab"]).aggregate([("one", "sum")])
        v = t.column("vec_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vec_id": pa.array(v, pa.int64()),
                "lab": t.column("lab"),
                "n": t.column("one_sum").cast(pa.int64()),
                "part": pa.array(v % N_COARSE_PARTS, pa.int64()),
            }
        )

    def vote(part_tbl: pa.Table) -> pa.Table:
        t = part_tbl.select(["vec_id", "lab", "n"]).group_by(
            ["vec_id", "lab"]
        ).aggregate([("n", "sum")])
        v = t.column("vec_id").to_numpy(zero_copy_only=False)
        lab = t.column("lab").to_numpy(zero_copy_only=False)
        n = t.column("n_sum").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((lab, -n, v))  # per vec: n DESC, label ASC
        vs, ls, ns = v[order], lab[order], n[order]
        first = np.empty(len(vs), dtype=bool)
        if len(vs):
            first[0] = True
            first[1:] = vs[1:] != vs[:-1]
        return pa.table(
            {
                "vec_id": pa.array(vs[first], pa.int64()),
                "pred_label": pa.array(ls[first], pa.int64()),
                "n_votes": pa.array(ns[first], pa.int64()),
            }
        )

    return (
        labels.map_batches(label_side, batch_format="pyarrow")
        .union(edges.map_batches(edge_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(attach, batch_format="pyarrow")
        .groupby("part")
        .map_groups(vote, batch_format="pyarrow")
    )


def kmeans_inertia(sf_dir: str, nlist: int = KM_K) -> "ray.data.Dataset":
    """Clustering-quality report — per k-means cell, the member count
    and EXACT within-cluster inertia Σ‖q − c‖² on the QUANT integer
    grid: the elbow/convergence metric every IVF/semdedup deployment
    monitors (a cell whose inertia per member explodes needs a larger
    nlist — the dial the semdedup docstring points at, now measured
    instead of guessed).

    Scale shape: centroids come from the shared memoized trainer
    (fixed nlist × dim integer aggregates); ONE streaming pass assigns
    each batch and folds it into nlist partial rows (count, inertia —
    int64-exact: d2 ≤ dim·(2·QUANT)² ≈ 2.6e14 per vector, 3.5e4
    vectors per unit before any risk at 2^63, and the per-batch
    partial sums are mergeable); a tiny groupby(cell) Sum finishes.
    No shuffle of data rows at all. Output:
    (cell, n_vectors, inertia)."""
    from ray.data.aggregate import Sum

    ds = _read_embeddings(sf_dir)
    cents = _train_centroids(ds, sf_dir, nlist)
    cref = ray.put(cents)

    def partial(batch: pa.Table) -> pa.Table:
        cn = ray.get(cref)
        q = _quantize(
            _emb_np(batch.column("embedding"))
        )
        cells = _assign(q, cn).astype(np.int64)
        # exact d2 to the OWN centroid per row
        diff = q - cn[cells]
        d2 = (diff * diff).sum(axis=1)
        t = pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "one": pa.array(np.ones(len(cells), np.int64), pa.int64()),
                "d2": pa.array(d2.astype(np.int64), pa.int64()),
            }
        ).group_by("cell").aggregate([("one", "sum"), ("d2", "sum")])
        return pa.table(
            {
                "cell": t.column("cell"),
                "n_p": t.column("one_sum").cast(pa.int64()),
                "i_p": t.column("d2_sum").cast(pa.int64()),
            }
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell": batch.column("cell"),
                "n_vectors": batch.column("n"),
                "inertia": batch.column("i"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_p", alias_name="n"), Sum("i_p", alias_name="i"))
        .map_batches(rename, batch_format="pyarrow")
    )


_MUTUAL_EDGES_CACHE: dict[tuple, "ray.data.Dataset"] = {}


def mutual_knn(sf_dir: str) -> "ray.data.Dataset":
    """Registry entry for mutual-kNN edges — memoized per (corpus,
    session) with the knn_edges_materialized discipline, because three
    consumers share it (the registry entry, label propagation's edge
    list, community_modularity's scoring pass); see _mutual_build for
    the algorithm."""
    import os as _os

    emb_path = _os.path.join(sf_dir, "embeddings.parquet")
    try:
        session = ray.get_runtime_context().get_job_id()
    except Exception:
        session = None
    key = (_os.path.abspath(sf_dir), _os.path.getmtime(emb_path), session)
    ds = _MUTUAL_EDGES_CACHE.get(key)
    if ds is None:
        ds = _mutual_build(sf_dir).materialize()
        for stale in [k for k in _MUTUAL_EDGES_CACHE if k != key]:
            del _MUTUAL_EDGES_CACHE[stale]
        _MUTUAL_EDGES_CACHE[key] = ds
    return ds


def _mutual_build(sf_dir: str) -> "ray.data.Dataset":
    """Reciprocal (mutual) nearest neighbors — the pairs (a, b) where
    b is in a's kNN list AND a is in b's: the alignment-mining filter
    (margin-based bitext mining, mutual-NN image matching) that cuts
    the hub-dominated false matches a one-directional kNN keeps. A
    hub vector near many others appears in thousands of kNN lists but
    reciprocates only a few — mutuality is the cheap exact filter.

    Scale shape: one pass over the knn_graph edges emits each edge
    keyed by its CANONICAL (min, max) pair; one coarse shuffle on the
    packed pair key, and a pair is mutual iff both directions landed
    (edges are unique per direction, so count == 2 — the
    dedup_simhash verify shape). Output: (vec_a, vec_b, d2) with
    vec_a < vec_b."""
    from ..stages.shuffle import N_COARSE_PARTS

    edges = knn_edges_materialized(sf_dir)

    def canon(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column("neighbor_id").to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "d2": batch.column("d2"),
                "part": pa.array((lo * 31 + hi) % N_COARSE_PARTS, pa.int64()),
            }
        )

    def mutual(part_tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        t = part_tbl.select(["lo", "hi", "d2"]).group_by(
            ["lo", "hi"]
        ).aggregate([("d2", "count"), ("d2", "max")])
        t = t.filter(_pc.equal(t.column("d2_count"), 2))
        return pa.table(
            {
                "vec_a": t.column("lo"),
                "vec_b": t.column("hi"),
                "d2": t.column("d2_max").cast(pa.int64()),
            }
        )

    return (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(mutual, batch_format="pyarrow")
    )


HUB_TOP = 20


_KNN_EDGES_CACHE: dict[tuple, "ray.data.Dataset"] = {}


def knn_edges_materialized(sf_dir: str) -> "ray.data.Dataset":
    """The memoized knn_graph edge set — shared root for the three
    registry consumers (knn_label_vote, mutual_knn, knn_hubness) and
    the registry's knn_graph entry itself: one materialized build per
    (corpus, session), the pairs_materialized/_CENTROID_CACHE
    discipline, so the cell shuffle + in-cell tiling run once."""
    import os as _os

    emb_path = _os.path.join(sf_dir, "embeddings.parquet")
    try:
        session = ray.get_runtime_context().get_job_id()
    except Exception:
        session = None
    key = (_os.path.abspath(sf_dir), _os.path.getmtime(emb_path), session)
    ds = _KNN_EDGES_CACHE.get(key)
    if ds is None:
        ds = knn_graph(sf_dir).materialize()
        for stale in [k for k in _KNN_EDGES_CACHE if k != key]:
            del _KNN_EDGES_CACHE[stale]
        _KNN_EDGES_CACHE[key] = ds
    return ds


def knn_hubness(sf_dir: str) -> "ray.data.Dataset":
    """Hubness audit — the in-degree distribution head of the kNN
    graph: the HUB_TOP vectors appearing in the most OTHER vectors'
    k-NN lists (Radovanović et al., JMLR 2010 — high-dimensional
    hubness is the failure mode that motivates `mutual_knn`'s
    reciprocity filter; a monitoring-grade embedding-quality metric).
    Output: (vec_id, in_degree, rnk), rank by (degree DESC, id ASC).

    Scale shape: per-batch in-degree partial counts over the
    knn_graph edges → one tiny groupby(vec_id) Sum → per-partition
    top-HUB_TOP prune → a ≤ parts×HUB_TOP-row final reduce (the
    grouped_topk merge discipline on the global group)."""
    from ray.data.aggregate import Sum

    edges = knn_edges_materialized(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.column("neighbor_id").to_numpy(zero_copy_only=False)
        u, c = np.unique(n, return_counts=True)
        return pa.table(
            {
                "vec_id": pa.array(u, pa.int64()),
                "d_p": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def local_top(batch: pa.Table) -> pa.Table:
        v = batch.column("vec_id").to_numpy(zero_copy_only=False)
        d = batch.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -d))[:HUB_TOP]
        return pa.table(
            {
                "k": pa.array(np.zeros(len(order), np.int64), pa.int64()),
                "vec_id": pa.array(v[order], pa.int64()),
                "d": pa.array(d[order], pa.int64()),
            }
        )

    def final_top(tbl: pa.Table) -> pa.Table:
        v = tbl.column("vec_id").to_numpy(zero_copy_only=False)
        d = tbl.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -d))[:HUB_TOP]
        return pa.table(
            {
                "vec_id": pa.array(v[order], pa.int64()),
                "in_degree": pa.array(d[order], pa.int64()),
                "rnk": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    return (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("vec_id")
        .aggregate(Sum("d_p", alias_name="d"))
        .map_batches(local_top, batch_format="pyarrow")
        .groupby("k")
        .map_groups(final_top, batch_format="pyarrow")
    )


def ann_recall_report(sf_dir: str) -> "ray.data.Dataset":
    """Recall@k monitoring as a first-class query — per query vector,
    how many of the exact cosine top-TOP_K neighbors the IVF-kmeans
    index actually returned (the operational ANN quality gauge;
    `tests/test_recall.py` pins the aggregate ≥ 0.8, this exposes the
    per-query breakdown the index operator watches when tuning
    nlist/probes). Output: (query_id, n_hits) with n_hits ≤ TOP_K —
    recall@k = n_hits / TOP_K derives downstream.

    Scale shape: both rankings are the head-checked streamed top-k
    plans; the intersection is one tiny groupby over 2·N_QUERIES·k
    tagged (query, neighbor) rows — a pair appears twice iff both
    lists contain it (the mutual_knn count==2 shape on the
    query-neighbor axis)."""
    from ray.data.aggregate import Count, Sum

    exact = ann_topk(sf_dir)
    approx = ann_topk_ivf_kmeans(sf_dir)

    def tag(which: int):
        def fn(batch: pa.Table) -> pa.Table:
            q = batch.column("query_id").cast(pa.int64())
            n = batch.column("neighbor_id").cast(pa.int64())
            return pa.table(
                {
                    "query_id": q,
                    "neighbor_id": n,
                    "one": pa.array(
                        np.ones(len(batch), np.int64), pa.int64()
                    ),
                }
            )

        return fn

    def hits(part_tbl: pa.Table) -> pa.Table:
        t = part_tbl.group_by(["query_id", "neighbor_id"]).aggregate(
            [("one", "sum")]
        )
        import pyarrow.compute as _pc

        both = t.filter(_pc.equal(t.column("one_sum"), 2))
        g = both.group_by("query_id").aggregate([([], "count_all")])
        return pa.table(
            {
                "query_id": g.column("query_id"),
                "n_hits": g.column("count_all").cast(pa.int64()),
            }
        )

    # the union is 2 * N_QUERIES * TOP_K rows — one tiny single-group
    # fold (bounded by the fixed query set, the ann_topk contract)
    return (
        exact.map_batches(tag(0), batch_format="pyarrow")
        .union(approx.map_batches(tag(1), batch_format="pyarrow"))
        .map_batches(
            lambda b: b.append_column(
                "k", pa.array(np.zeros(len(b), np.int64), pa.int64())
            ),
            batch_format="pyarrow",
        )
        .groupby("k")
        .map_groups(hits, batch_format="pyarrow")
    )


def pq_distortion(sf_dir: str, m: int = PQ_M) -> "ray.data.Dataset":
    """Product-quantizer quality report — per (subspace, code) the
    member count and EXACT integer distortion Σ‖q_s − c_{s,code}‖²
    (Jégou 2011's training objective, surfaced as a monitor):
    `kmeans_inertia` watches the COARSE quantizer, this watches the
    PQ codebooks — together the two dials (nlist, PQ_K) an ANN
    deployment tunes get measured, not guessed.

    Scale shape: codebooks come from the memoized trainer (fixed
    m × k × sub integer aggregates); one streaming pass encodes each
    batch against the broadcast books and folds to ≤ m × k partial
    rows; a tiny groupby finishes. No data-row shuffle. Output:
    (subspace, code, n_vectors, distortion)."""
    from ray.data.aggregate import Sum

    ds = _read_embeddings(sf_dir)
    books = _train_pq_codebooks(ds, sf_dir, m)
    sub = books.shape[2]
    bref = ray.put(books)

    def partial(batch: pa.Table) -> pa.Table:
        bk = ray.get(bref)
        q = _quantize(
            _emb_np(batch.column("embedding"))
        )
        out_s, out_c, out_n, out_d = [], [], [], []
        for s in range(bk.shape[0]):
            qs = q[:, s * sub : (s + 1) * sub]
            # exact int64 distances to the k codes of this subspace
            d2 = (
                (qs[:, None, :].astype(np.int64) - bk[s][None, :, :]) ** 2
            ).sum(axis=2)
            # argmin returns the FIRST min — the oracle's
            # (d2 ASC, code ASC) tie rule
            code = np.argmin(d2, axis=1)
            own = d2[np.arange(len(qs)), code]
            u, inv = np.unique(code, return_inverse=True)
            out_s.extend([s] * len(u))
            out_c.extend(u.tolist())
            out_n.extend(np.bincount(inv).astype(np.int64).tolist())
            out_d.extend(
                np.bincount(inv, weights=own).astype(np.int64).tolist()
            )
        return pa.table(
            {
                "subspace": pa.array(out_s, pa.int64()),
                "code": pa.array(out_c, pa.int64()),
                "n_p": pa.array(out_n, pa.int64()),
                "d_p": pa.array(out_d, pa.int64()),
            }
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subspace": batch.column("subspace"),
                "code": batch.column("code"),
                "n_vectors": batch.column("n"),
                "distortion": batch.column("d"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["subspace", "code"])
        .aggregate(Sum("n_p", alias_name="n"), Sum("d_p", alias_name="d"))
        .map_batches(rename, batch_format="pyarrow")
    )


CLUSTER_STOP_S = 25   # corpus-global stopword gate for cluster labels
CLUSTER_TOP_T = 5     # keywords kept per cell


def cluster_top_terms(sf_dir: str, nlist: int = KM_K) -> "ray.data.Dataset":
    """Cluster LABELING — the topic-model readout over the k-means
    cells (the BERTopic / c-TF-IDF step, in an exact-integer variant):
    per cell, the top-CLUSTER_TOP_T terms by member-document term
    count, after removing the corpus-global top-CLUSTER_STOP_S
    stopwords (the integer-safe stand-in for the idf damping — the
    gate kills exactly the terms idf would zero out). Membership is
    the shared memoized quantizer's assignment; a doc joins through
    doc_id = vec_id (the fixture's embedding table covers a prefix of
    the corpus — the inner join scopes labeling to embedded docs).

    Scale shape — text is tokenized ONCE and never shuffles raw:
    (1) docs fold to (doc_id, term, tf) combiner rows and embeddings
    to (vec_id, cell) rows from the broadcast centroids, co-partitioned
    on id % P and joined in-partition to (cell, term, tf) partials;
    in parallel the same tf rows carry per-term marginal partials;
    (2) both grids re-key by crc32(term): partition-exact term
    marginals give a per-partition top-S stopword prune (disjoint
    term sets make the global top-S a subset of survivors; driver
    folds ≤ P·S rows and broadcasts S strings) and partition-exact
    (cell, term) totals — the ≤ nlist × vocab grid; (3) the bounded
    grid drops gated terms against the broadcast set and shuffles
    ONCE by cell for the per-cell top-T. Centroid training is the
    fixed nlist × dim integer aggregate (_train_centroids); ``nlist``
    scales with corpus size exactly as semdedup's docstring
    prescribes."""
    import zlib

    from collections import Counter

    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.textstats import words_of
    from ..stages.shuffle import N_COARSE_PARTS

    # ---- stage 0: centroids (memoized, fixed-size) ------------------
    cents = _train_centroids(
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["embedding"]
        ),
        sf_dir,
        nlist,
    )
    cents_ref = ray.put(cents)

    def member_rows(batch: pa.Table) -> pa.Table:
        cn = ray.get(cents_ref)
        q = _quantize(
            _emb_np(batch.column("embedding"))
        )
        a = _assign(q, cn)
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id": pa.array(vid.astype(np.int64), pa.int64()),
                "cell": pa.array(a.astype(np.int64), pa.int64()),
                "term": pa.array([""] * len(vid), pa.string()),
                "tf": pa.array(np.zeros(len(vid), np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(vid), np.int64), pa.int64()),
                "part": pa.array(vid.astype(np.int64) % N_COARSE_PARTS, pa.int64()),
            }
        )

    def tf_rows(batch: pa.Table) -> pa.Table:
        out_id, out_term, out_tf = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            cnt = Counter(words_of(text or ""))
            out_id.extend([doc_id] * len(cnt))
            out_term.extend(cnt.keys())
            out_tf.extend(cnt.values())
        ids = np.array(out_id, dtype=np.int64)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "cell": pa.array(np.full(len(ids), -1, np.int64), pa.int64()),
                "term": pa.array(out_term, pa.string()),
                "tf": pa.array(np.array(out_tf, np.int64), pa.int64()),
                "side": pa.array(np.ones(len(ids), np.int64), pa.int64()),
                "part": pa.array(ids % N_COARSE_PARTS, pa.int64()),
            }
        )

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(member_rows, batch_format="pyarrow")
    tfs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(tf_rows, batch_format="pyarrow")

    # ---- stage 1: id-co-partitioned join → term-keyed twin grids ----
    def join_in_part(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        cells = df[df["side"] == 0][["id", "cell"]]
        terms = df[df["side"] == 1][["id", "term", "tf"]]
        m = terms.merge(cells, on="id")
        g = m.groupby(["cell", "term"], sort=False)["tf"].sum().reset_index()
        # marginal lane: per-term counts over ALL docs (gate basis)
        marg = terms.groupby("term", sort=False)["tf"].sum().reset_index()
        marg["cell"] = np.int64(-1)
        out = pd.concat(
            [g[["cell", "term", "tf"]], marg[["cell", "term", "tf"]]],
            ignore_index=True,
        )
        part = np.array(
            [zlib.crc32(t.encode()) for t in out["term"]], dtype=np.int64
        ) % N_COARSE_PARTS
        return pa.table(
            {
                "cell": pa.array(out["cell"].to_numpy().astype(np.int64), pa.int64()),
                "term": pa.array(out["term"].to_numpy(), pa.string()),
                "tf": pa.array(out["tf"].to_numpy().astype(np.int64), pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    # ---- stage 2: partition-exact totals; marginal lane → top-S -----
    def totals(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["cell", "term", "tf"]).to_pandas()
        g = df.groupby(["cell", "term"], sort=False)["tf"].sum().reset_index()
        marg = g[g["cell"] == -1].sort_values(
            ["tf", "term"], ascending=[False, True]
        ).head(CLUSTER_STOP_S)
        out = pd.concat(
            [g[g["cell"] >= 0], marg], ignore_index=True
        )
        return pa.table(
            {
                "cell": pa.array(out["cell"].to_numpy().astype(np.int64), pa.int64()),
                "term": pa.array(out["term"].to_numpy(), pa.string()),
                "tf": pa.array(out["tf"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = (
        emb.union(tfs)
        .groupby("part")
        .map_groups(join_in_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(totals, batch_format="pyarrow")
        .materialize()
    )

    # driver reads ONLY the pruned marginal lane: ≤ P·S rows
    cand: dict[str, int] = {}
    for b in grid.iter_batches(batch_format="pyarrow"):
        m = b.filter(pc.equal(b.column("cell"), -1))
        for t, c in zip(m.column("term").to_pylist(), m.column("tf").to_pylist()):
            cand[t] = cand.get(t, 0) + c  # disjoint keys: never both>0
    stop = frozenset(
        t
        for t, _ in sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[
            :CLUSTER_STOP_S
        ]
    )
    stop_ref = ray.put(stop)

    # ---- stage 3: gate the bounded grid, per-cell top-T -------------
    def gate(batch: pa.Table) -> pa.Table:
        keep = ray.get(stop_ref)
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        terms = batch.column("term").to_pylist()
        mask = np.array(
            [c >= 0 and t not in keep for c, t in zip(cell, terms)], dtype=bool
        )
        return batch.filter(pa.array(mask))

    def per_cell_topt(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["tf", "term"], ascending=[False, True]
        ).head(CLUSTER_TOP_T)
        return pa.table(
            {
                "cell": pa.array(df["cell"].to_numpy().astype(np.int64), pa.int64()),
                "term": pa.array(df["term"].to_numpy(), pa.string()),
                "tf": pa.array(df["tf"].to_numpy().astype(np.int64), pa.int64()),
                "rnk": pa.array(
                    np.arange(1, len(df) + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    return (
        grid.map_batches(gate, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(per_cell_topt, batch_format="pyarrow")
    )


def cluster_purity(sf_dir: str, nlist: int = KM_K) -> "ray.data.Dataset":
    """EXTERNAL clustering validity — per k-means cell, the member
    count and the majority ground-truth label with its count (ties:
    smaller label), so purity = top_count / n_members is exact
    integer arithmetic downstream. kmeans_inertia measures internal
    cohesion (does the geometry tighten); this measures agreement
    with labels (does the geometry mean anything) — the pair every
    clustering eval reports. Labels ride in the embeddings table, so
    no join leaves the row.

    Scale shape: ONE streaming pass — each batch assigns against the
    broadcast memoized centroids and folds to (cell, label) count
    partials (≤ nlist × |labels| rows); a tiny Sum exchange and a
    per-cell argmax (grouped_topk's K=1 merge) finish. No data-row
    shuffle; ``nlist`` scales with corpus size as the semdedup
    docstring prescribes."""
    from ray.data.aggregate import Sum as _Sum

    cents = _train_centroids(
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["embedding"]
        ),
        sf_dir,
        nlist,
    )
    cents_ref = ray.put(cents)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cn = ray.get(cents_ref)
        q = _quantize(
            _emb_np(batch.column("embedding"))
        )
        a = _assign(q, cn)
        lab = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pd.DataFrame({"cell": a.astype(np.int64), "label": lab})
            .groupby(["cell", "label"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "cell": pa.array(g["cell"].to_numpy().astype(np.int64), pa.int64()),
                "label": pa.array(g["label"].to_numpy().astype(np.int64), pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def per_cell(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(
            ["cnt", "label"], ascending=[False, True]
        )
        n = int(df["cnt"].sum())
        return pa.table(
            {
                "cell": pa.array([int(df["cell"].iloc[0])], pa.int64()),
                "n_members": pa.array([n], pa.int64()),
                "top_label": pa.array([int(df["label"].iloc[0])], pa.int64()),
                "top_count": pa.array([int(df["cnt"].iloc[0])], pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["cell", "label"])
        .aggregate(_Sum("cnt", alias_name="cnt"))
        .groupby("cell")
        .map_groups(per_cell, batch_format="pyarrow")
    )


def ivf_probe_cost(sf_dir: str) -> "ray.data.Dataset":
    """IVF probe COST accounting — per query the probed cells and the
    exact number of candidate vectors a 1-probe and a 2-probe search
    scans: the second dial of the ANN tuning loop. ann_recall_report
    measures what multi-probe BUYS (recall); this measures what it
    COSTS (candidates scanned ∝ latency), and together they are the
    recall-vs-cost curve an index operator actually tunes nlist and
    nprobe against. Tail-seated by design: the trained quantizer, the
    assignment fold and the probe-order tie-break are all the
    head-checked ann/semdedup machinery re-pointed at accounting.

    Scale shape: cell sizes come from one streaming assignment fold
    (per-batch bincount partials, one ≤ nlist-row Sum); the k-entry
    size map rides the same broadcast as the centroids, and the
    queries (a fixed constant-size set) resolve their probe list and
    costs in one vectorized pass. The query's own vector always lives
    in its nearest cell, so cost_p1 = n(cell1) − 1 and
    cost_p2 = n(cell1) + n(cell2) − 1 exactly. Output: (query_id,
    cell1, cell2, cost_p1, cost_p2)."""
    from ray.data.aggregate import Sum as _Sum

    ds = _read_embeddings(sf_dir)
    cents = _train_centroids(ds, sf_dir, KM_K)
    cref = ray.put(cents)

    def size_partials(batch: pa.Table) -> pa.Table:
        cn = ray.get(cref)
        q = _quantize(
            _emb_np(batch.column("embedding"))
        )
        cells = _assign(q, cn)
        cnt = np.bincount(cells, minlength=len(cn))
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "cell": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    sizes = {
        int(r["cell"]): int(r["n_p"])
        for r in ds.map_batches(size_partials, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(_Sum("n", alias_name="n_p"))
        .take_all()
    }
    sref = ray.put(sizes)

    def probe_rows(batch: pa.Table) -> pa.Table:
        cn = ray.get(cref)
        sz = ray.get(sref)
        vid = batch.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = vid < N_QUERIES
        if not keep.any():
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "cell1": pa.array([], pa.int64()),
                    "cell2": pa.array([], pa.int64()),
                    "cost_p1": pa.array([], pa.int64()),
                    "cost_p2": pa.array([], pa.int64()),
                }
            )
        q = _quantize(
            _emb_np(batch.column("embedding"))
        )[keep]
        d2 = (
            (q * q).sum(axis=1, keepdims=True)
            - 2 * (q @ cn.T)
            + (cn * cn).sum(axis=1)[None, :]
        )
        order = np.argsort(d2, axis=1, kind="stable")  # ties → lower c
        c1, c2 = order[:, 0], order[:, 1]
        n1 = np.array([sz.get(int(c), 0) for c in c1], dtype=np.int64)
        n2 = np.array([sz.get(int(c), 0) for c in c2], dtype=np.int64)
        return pa.table(
            {
                "query_id": pa.array(vid[keep], pa.int64()),
                "cell1": pa.array(c1.astype(np.int64), pa.int64()),
                "cell2": pa.array(c2.astype(np.int64), pa.int64()),
                "cost_p1": pa.array(n1 - 1, pa.int64()),
                "cost_p2": pa.array(n1 + n2 - 1, pa.int64()),
            }
        )

    return ds.map_batches(probe_rows, batch_format="pyarrow")


SQ8_LEVELS = 255  # codes 0..255 → 255 intervals, Faiss SQ8 layout


def sq8_distortion(sf_dir: str) -> "ray.data.Dataset":
    """Scalar-quantization (SQ8) distortion audit — the OTHER
    standard vector codec next to pq_distortion's product quantizer:
    per dimension, train the affine int8 range [min, max] on the
    exact 1e-6 fixed-point grid, encode code = (q−min)·255 //
    (max−min), decode deq = min + code·(max−min) // 255, and report
    the EXACT per-dimension SSE and max |error| on that grid (plus
    the trained range). SQ8 keeps per-dim resolution where PQ shares
    a codebook across dims — these two rows of dials are what an
    index builder compares before picking a codec. Tail-seated by
    design: profile_columns' min/max fold + one vectorized re-pass.

    Scale shape: pass 1 folds per-batch per-dim min/max partials to a
    64-row grid (broadcast back as 128 ints); pass 2 encodes/decodes
    each batch vectorized and folds (dim, sse, maxabs) partials into
    the same bounded grid. Output: (dim, min_q, max_q, sse,
    max_abs_err)."""
    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    ds = _read_embeddings(sf_dir)

    def mm_partials(batch: pa.Table) -> pa.Table:
        mat = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False))
        q = _quantize(mat)
        dims = np.arange(q.shape[1], dtype=np.int64)
        return pa.table(
            {
                "dim": pa.array(dims, pa.int64()),
                "mn": pa.array(q.min(axis=0), pa.int64()),
                "mx": pa.array(q.max(axis=0), pa.int64()),
            }
        )

    mm: dict[int, tuple[int, int]] = {}
    for b in (
        ds.map_batches(mm_partials, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(_Min("mn", alias_name="mn"), _Max("mx", alias_name="mx"))
        .iter_batches(batch_format="pyarrow")
    ):
        for d, lo, hi in zip(
            b.column("dim").to_pylist(),
            b.column("mn").to_pylist(),
            b.column("mx").to_pylist(),
        ):
            mm[d] = (lo, hi)
    n_dim = len(mm)
    lo_vec = np.array([mm[d][0] for d in range(n_dim)], np.int64)
    hi_vec = np.array([mm[d][1] for d in range(n_dim)], np.int64)
    span = np.maximum(hi_vec - lo_vec, 1)  # degenerate dim → code 0

    def err_partials(batch: pa.Table) -> pa.Table:
        mat = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False))
        q = _quantize(mat)
        code = (q - lo_vec) * SQ8_LEVELS // span
        deq = lo_vec + code * span // SQ8_LEVELS
        err = q - deq
        return pa.table(
            {
                "dim": pa.array(np.arange(n_dim, dtype=np.int64), pa.int64()),
                "sse": pa.array((err * err).sum(axis=0), pa.int64()),
                "maxabs": pa.array(np.abs(err).max(axis=0), pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        d = batch.column("dim").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dim": pa.array(d, pa.int64()),
                "min_q": pa.array(lo_vec[d], pa.int64()),
                "max_q": pa.array(hi_vec[d], pa.int64()),
                "sse": batch.column("sse_p"),
                "max_abs_err": batch.column("maxabs_p"),
            }
        )

    return (
        ds.map_batches(err_partials, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            _Sum("sse", alias_name="sse_p"),
            _Max("maxabs", alias_name="maxabs_p"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def two_hop_reach(sf_dir: str) -> "ray.data.Dataset":
    """Two-hop neighborhood size over the kNN graph — the
    friends-of-friends reach that governs how fast label propagation
    / graph diffusion mixes: per vector, n1 (direct kNN out-degree),
    reach2 (distinct nodes within ≤2 directed hops, self excluded)
    and n2_new = reach2 − n1 (nodes ONLY reachable through a hop).
    Built on the memoized knn_graph edge set, so the expensive cell
    shuffle + in-cell tiling are shared with the graph's four other
    consumers. Tail-seated by design: one middle-vertex co-partition
    (the edge set joined to itself on v = u′) + dedup_exact's
    distinct fold.

    Scale shape: the edge set is n·k rows (k = 3); the self-join on
    the middle vertex is ONE co-partition keyed by that vertex
    emitting ≤ n·k² candidate pairs, deduped by a (u, w) groupby;
    counts complete per u. Output: (vec_id, n1, reach2, n2_new)."""
    from ray.data.aggregate import Sum as _Sum

    edges = knn_edges_materialized(sf_dir)

    def first_hop(batch: pa.Table) -> pa.Table:
        u = batch.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        v = batch.column("neighbor_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "mid": pa.array(v, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "w": pa.array(np.zeros(len(u), np.int64), pa.int64()),
                "side": pa.array(np.ones(len(u), np.int64), pa.int64()),
            }
        )

    def second_hop(batch: pa.Table) -> pa.Table:
        u = batch.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        v = batch.column("neighbor_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "mid": pa.array(u, pa.int64()),
                "u": pa.array(np.zeros(len(u), np.int64), pa.int64()),
                "w": pa.array(v, pa.int64()),
                "side": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            }
        )

    def compose(grp: pa.Table) -> pa.Table:
        side = grp.column("side").to_numpy(zero_copy_only=False)
        u = grp.column("u").to_numpy(zero_copy_only=False)[side == 1]
        w = grp.column("w").to_numpy(zero_copy_only=False)[side == 0]
        if len(u) == 0 or len(w) == 0:
            return pa.table(
                {"u": pa.array([], pa.int64()), "w": pa.array([], pa.int64())}
            )
        uu = np.repeat(u, len(w))
        ww = np.tile(w, len(u))
        keep = uu != ww
        return pa.table(
            {
                "u": pa.array(uu[keep], pa.int64()),
                "w": pa.array(ww[keep], pa.int64()),
            }
        )

    pairs2 = (
        edges.map_batches(first_hop, batch_format="pyarrow")
        .union(edges.map_batches(second_hop, batch_format="pyarrow"))
        .groupby("mid")
        .map_groups(compose, batch_format="pyarrow")
    )
    direct = edges.map_batches(
        lambda t: pa.table(
            {
                "u": t.column("vec_id").cast(pa.int64()),
                "w": t.column("neighbor_id").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def reach_partials(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        uu, cnt = np.unique(u, return_counts=True)
        n = len(uu)
        return pa.table(
            {
                "vec_id": pa.array(uu, pa.int64()),
                "reach2": pa.array(cnt.astype(np.int64), pa.int64()),
                "n1": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def n1_partials(batch: pa.Table) -> pa.Table:
        u = batch.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        uu, cnt = np.unique(u, return_counts=True)
        n = len(uu)
        return pa.table(
            {
                "vec_id": pa.array(uu, pa.int64()),
                "reach2": pa.array(np.zeros(n, np.int64), pa.int64()),
                "n1": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        r = batch.column("reach2_p").to_numpy(zero_copy_only=False)
        n1 = batch.column("n1_p").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "n1": pa.array(n1.astype(np.int64), pa.int64()),
                "reach2": pa.array(r.astype(np.int64), pa.int64()),
                "n2_new": pa.array((r - n1).astype(np.int64), pa.int64()),
            }
        )

    return (
        pairs2.union(direct)
        .groupby(["u", "w"])
        .aggregate(_Sum("w", alias_name="dummy"))
        .map_batches(reach_partials, batch_format="pyarrow")
        .union(edges.map_batches(n1_partials, batch_format="pyarrow"))
        .groupby("vec_id")
        .aggregate(
            _Sum("reach2", alias_name="reach2_p"),
            _Sum("n1", alias_name="n1_p"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def _train_pq_residual_codebooks(
    ds: "ray.data.Dataset", sf_dir: str, cents: np.ndarray,
    m: int = PQ_M, k: int = PQ_K,
) -> np.ndarray:
    """Residual PQ codebooks — _train_pq_codebooks re-run on r = q −
    centroid[assign(q)] (the FAISS IVF-PQ layout: PQ prices the
    RESIDUAL after the coarse quantizer, which is what makes the
    codes cell-local and small). Same grid, seeds (anchor residuals),
    iteration count, tie rule and truncating centroid division, so
    the oracle replays every subspace bit-for-bit. Memoized with the
    "pqres" tag beside the raw-PQ and coarse-centroid caches."""
    import os as _os

    import pyarrow.parquet as _pq

    emb_path = _os.path.join(sf_dir, "embeddings.parquet")
    try:
        session = ray.get_runtime_context().get_job_id()
    except Exception:
        session = None
    scope = (_os.path.abspath(sf_dir), _os.path.getmtime(emb_path), session)
    key = (*scope, ("pqres", m, k))
    hit = _CENTROID_CACHE.get(key)
    if hit is not None:
        return hit

    seed_tbl = _pq.read_table(
        emb_path, columns=["vec_id", "embedding"],
        filters=[("vec_id", ">=", ANCHOR_LO), ("vec_id", "<", ANCHOR_LO + k)],
    ).sort_by("vec_id")
    seeds_q = _quantize(
        _emb_np(seed_tbl.column("embedding"))
    )
    seeds = seeds_q - cents[_assign(seeds_q, cents)]
    sub = seeds.shape[1] // m
    books = np.stack([seeds[:, s * sub:(s + 1) * sub] for s in range(m)])

    for _ in range(KM_ITERS):
        cur_ref = ray.put((books, cents))

        def partial_sums(batch: pa.Table, _ref=cur_ref) -> pa.Table:
            bk, cn = ray.get(_ref)
            q = _quantize(
                _emb_np(batch.column("embedding"))
            )
            r = q - cn[_assign(q, cn)]
            rows_s, rows_c, rows_n, rows_sum = [], [], [], []
            for s in range(bk.shape[0]):
                rs = r[:, s * sub:(s + 1) * sub]
                a = _assign(rs, bk[s])
                for c in np.unique(a):
                    msk = a == c
                    rows_s.append(s)
                    rows_c.append(int(c))
                    rows_n.append(int(msk.sum()))
                    rows_sum.append(rs[msk].sum(axis=0).tolist())
            return pa.table(
                {
                    "s": pa.array(rows_s, pa.int64()),
                    "c": pa.array(rows_c, pa.int64()),
                    "n": pa.array(rows_n, pa.int64()),
                    "sum": pa.array(rows_sum, pa.list_(pa.int64())),
                }
            )

        parts = ds.map_batches(partial_sums, batch_format="pyarrow").take_all()
        sums = np.zeros((m, k, sub), dtype=np.int64)
        counts = np.zeros((m, k), dtype=np.int64)
        for row in parts:
            sums[row["s"], row["c"]] += np.array(row["sum"], dtype=np.int64)
            counts[row["s"], row["c"]] += row["n"]
        prev = books
        safe = np.maximum(counts, 1)[:, :, None]
        books = (np.sign(sums) * (np.abs(sums) // safe)).astype(np.int64)
        books[counts == 0] = prev[counts == 0]

    for stale in [c for c in _CENTROID_CACHE if c[:3] != scope]:
        del _CENTROID_CACHE[stale]
    _CENTROID_CACHE[key] = books
    return books


def ann_topk_ivfpq(
    sf_dir: str, k: int = TOP_K, m: int = PQ_M
) -> "ray.data.Dataset":
    """IVF-PQ approximate top-k — the full FAISS index layout, kept
    bit-reproducible: coarse exact-integer k-means picks the cell,
    product quantization prices the RESIDUAL (q − centroid), and each
    query scans only its own cell by ADC (a (m × k)-entry distance
    table between the query's residual and the residual codebooks —
    one add per candidate per subspace, never a full vector). This
    closes the ANN family: exact → grid-IVF → LSH → kmeans-IVF →
    PQ-ADC → IVF-PQ, each one dial further down the recall-vs-cost
    curve that ann_recall_report / ivf_probe_cost / pq_distortion
    measure. Tail-seated by design: the memoized coarse quantizer +
    a residual re-run of the memoized PQ trainer + the streamed
    batch-local-top-k ranking of _ann_ivf_kmeans.

    Scale shape: training passes are fixed-size integer aggregates;
    ranking is ONE map_batches pass (queries + centroids + codebooks
    + the 16×m×k ADC table broadcast once) with batch-local top-k
    and a tiny per-query merge — no whole-cell materialization."""
    ds = _read_embeddings(sf_dir)
    cents = _train_centroids(ds, sf_dir)
    books = _train_pq_residual_codebooks(ds, sf_dir, cents, m)
    sub = cents.shape[1] // m

    import pyarrow.parquet as _pq

    qt = _pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", N_QUERIES)],
    ).sort_by("vec_id")
    qids = qt.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    qint = _quantize(_emb_np(qt.column("embedding")))
    qcell = _assign(qint, cents)
    qres = qint - cents[qcell]
    # qtab[qi, s, c] = || r_q[subspace s] − books[s][c] ||²
    qtab = np.stack(
        [
            (
                (qres[:, s * sub:(s + 1) * sub][:, None, :] - books[s][None, :, :])
                ** 2
            ).sum(axis=2)
            for s in range(m)
        ],
        axis=1,
    )
    ref = ray.put((qids, qcell, qtab, cents, books))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_cell, q_tab, cn, bk = ray.get(ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        v = _quantize(_emb_np(batch.column("embedding")))
        cells = _assign(v, cn)
        r = v - cn[cells]
        codes = np.stack(
            [_assign(r[:, s * sub:(s + 1) * sub], bk[s]) for s in range(m)],
            axis=1,
        )  # (n, m)
        out_q, out_n, out_d = [], [], []
        for qi in range(len(q_ids)):
            mask = (cells == q_cell[qi]) & (ids != q_ids[qi])
            cand = np.flatnonzero(mask)
            if cand.size == 0:
                continue
            adc = q_tab[qi][np.arange(m)[None, :], codes[cand]].sum(axis=1)
            take = cand[np.lexsort((ids[cand], adc))[:k]]
            adc_take = q_tab[qi][
                np.arange(m)[None, :], codes[take]
            ].sum(axis=1)
            out_q.extend([q_ids[qi]] * len(take))
            out_n.extend(ids[take].tolist())
            out_d.extend(adc_take.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "d2": pa.array(np.array(out_d, dtype=np.int64), pa.int64()),
            }
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("d2", "ascending"), ("neighbor_id", "ascending")]
        )
        g = group.take(idx[:k])
        return pa.table(
            {
                "query_id": g.column("query_id"),
                "neighbor_id": g.column("neighbor_id"),
                "rank": pa.array(
                    np.arange(1, g.num_rows + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pyarrow")
    )


def ivfpq_recall_report(sf_dir: str) -> "ray.data.Dataset":
    """Recall@k of the IVF-PQ index against the exact ranking — the
    quality dial for the compressed end of the ANN family (next to
    ann_recall_report's kmeans-IVF dial): the residual-PQ codes cost
    recall twice, once from the cell restriction and once from ADC
    quantization, and this query is where that price reads out.
    Same plan as ann_recall_report: both rankings are the streamed
    top-k pipelines, the intersection is one bounded fold over
    2·N_QUERIES·k tagged pairs. Output: (query_id, n_hits)."""
    exact = ann_topk(sf_dir)
    approx = ann_topk_ivfpq(sf_dir)

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": batch.column("query_id").cast(pa.int64()),
                "neighbor_id": batch.column("neighbor_id").cast(pa.int64()),
                "one": pa.array(np.ones(len(batch), np.int64), pa.int64()),
            }
        )

    def hits(part_tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        t = part_tbl.group_by(["query_id", "neighbor_id"]).aggregate(
            [("one", "sum")]
        )
        both = t.filter(_pc.equal(t.column("one_sum"), 2))
        g = both.group_by("query_id").aggregate([([], "count_all")])
        return pa.table(
            {
                "query_id": g.column("query_id"),
                "n_hits": g.column("count_all").cast(pa.int64()),
            }
        )

    return (
        exact.map_batches(tag, batch_format="pyarrow")
        .union(approx.map_batches(tag, batch_format="pyarrow"))
        .map_batches(
            lambda b: b.append_column(
                "k", pa.array(np.zeros(len(b), np.int64), pa.int64())
            ),
            batch_format="pyarrow",
        )
        .groupby("k")
        .map_groups(hits, batch_format="pyarrow")
    )


KCENTER_K = 8


def kcenter_seeds(sf_dir: str, k: int = KCENTER_K) -> "pa.Table":
    """Farthest-point (k-center / Gonzalez) diversity seeding over
    the exact integer-grid embeddings — the coreset selector a
    training-data pipeline uses to pick maximally-diverse exemplars
    (and the deterministic cousin of kmeans++ seeding): start from
    vec 0, repeatedly take the vector farthest (exact int64 squared
    L2) from the chosen set, ties to the lower id. Output per step:
    the pick and its distance-to-set at selection time — the k-center
    radius curve, which is ALSO the 2-approximation certificate for
    the k-center objective. Tail-seated by design: k bounded
    max-reduce passes over the gram_matrix read pattern.

    Scale shape: each of the k−1 selection rounds is ONE map_batches
    pass (chosen set ≤ k vectors broadcast) folding to a per-batch
    (max d2min, argmin id) candidate, reduced on the driver — no
    shuffle, driver state O(k·dim) ints."""
    ds = _read_embeddings(sf_dir)

    import pyarrow.parquet as _pq

    seed_tbl = _pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)],
    )
    chosen_vecs = _quantize(
        _emb_np(seed_tbl.column("embedding"))
    )
    chosen_ids = [0]
    steps = [(0, 0, 0)]

    for step in range(1, k):
        ref = ray.put((np.array(chosen_ids, np.int64), chosen_vecs))

        def far_partial(batch: pa.Table, _ref=ref) -> pa.Table:
            cids, cvecs = ray.get(_ref)
            ids = batch.column("vec_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            v = _quantize(
                _emb_np(batch.column("embedding"))
            )
            d2 = (
                (v * v).sum(axis=1, keepdims=True)
                - 2 * (v @ cvecs.T)
                + (cvecs * cvecs).sum(axis=1)[None, :]
            )
            dmin = d2.min(axis=1)
            mask = ~np.isin(ids, cids)
            if not mask.any():
                return pa.table(
                    {"vec_id": pa.array([], pa.int64()),
                     "d2": pa.array([], pa.int64())}
                )
            cand = np.flatnonzero(mask)
            best = cand[np.lexsort((ids[cand], -dmin[cand]))[0]]
            return pa.table(
                {
                    "vec_id": pa.array([int(ids[best])], pa.int64()),
                    "d2": pa.array([int(dmin[best])], pa.int64()),
                }
            )

        cands = ds.map_batches(far_partial, batch_format="pyarrow").take_all()
        best = max(cands, key=lambda r: (r["d2"], -r["vec_id"]))
        steps.append((step, int(best["vec_id"]), int(best["d2"])))
        row = _pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
            filters=[("vec_id", "=", int(best["vec_id"]))],
        )
        chosen_vecs = np.vstack(
            [
                chosen_vecs,
                _quantize(
                    _emb_np(row.column("embedding"))
                ),
            ]
        )
        chosen_ids.append(int(best["vec_id"]))

    return pa.table(
        {
            "step": pa.array([s[0] for s in steps], pa.int64()),
            "vec_id": pa.array([s[1] for s in steps], pa.int64()),
            "d2_to_set": pa.array([s[2] for s in steps], pa.int64()),
        }
    )


def knn_label_noise(sf_dir: str) -> "ray.data.Dataset":
    """Label-noise estimate per class — the aggregate the
    knn_label_vote docstring promises: per TRUE label, how many
    vectors' kNN majority vote disagrees with their own label (the
    mislabel-candidate rate curation triages by class). Tail-seated
    by design: knn_label_vote's output joined back to the label
    column through one more vec_id co-partition, folded to a
    ≤|labels|-row grid.

    Scale shape: the vote pipeline is the memoized-edge path; the
    disagreement join is one tagged-union groupby on vec_id (labels
    are vector-cardinality — never broadcast); the grid is bounded
    by the label alphabet. Output: (label, n_vecs, n_disagree,
    noise_bp)."""
    from ray.data.aggregate import Max as _Max, Sum as _Sum

    votes = knn_label_vote(sf_dir)
    labels = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    )

    def vote_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "pred": batch.column("pred_label").cast(pa.int64()),
                "true_l": pa.array(
                    np.full(batch.num_rows, -1, np.int64), pa.int64()
                ),
            }
        )

    def label_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "pred": pa.array(
                    np.full(batch.num_rows, -1, np.int64), pa.int64()
                ),
                "true_l": batch.column("label").cast(pa.int64()),
            }
        )

    def grid_fold(batch: pa.Table) -> pa.Table:
        import pandas as pd

        pred = batch.column("pred_p").to_numpy(zero_copy_only=False)
        true_l = batch.column("true_p").to_numpy(zero_copy_only=False)
        keep = pred >= 0  # vectors with a vote (all, by construction)
        g = (
            pd.DataFrame(
                {
                    "label": true_l[keep],
                    "n": 1,
                    "d": (pred[keep] != true_l[keep]).astype(np.int64),
                }
            )
            .groupby("label", sort=False)
            .agg(n=("n", "sum"), d=("d", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "label": pa.array(
                    g["label"].to_numpy().astype(np.int64), pa.int64()
                ),
                "n_vecs": pa.array(
                    g["n"].to_numpy().astype(np.int64), pa.int64()
                ),
                "n_disagree": pa.array(
                    g["d"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n_vecs_p").to_numpy(zero_copy_only=False)
        d = batch.column("n_disagree_p").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "label": batch.column("label"),
                "n_vecs": pa.array(n.astype(np.int64), pa.int64()),
                "n_disagree": pa.array(d.astype(np.int64), pa.int64()),
                "noise_bp": pa.array(d * 10000 // n, pa.int64()),
            }
        )

    return (
        votes.map_batches(vote_side, batch_format="pyarrow")
        .union(labels.map_batches(label_side, batch_format="pyarrow"))
        .groupby("vec_id")
        .aggregate(
            _Max("pred", alias_name="pred_p"),
            _Max("true_l", alias_name="true_p"),
        )
        .map_batches(grid_fold, batch_format="pyarrow")
        .groupby("label")
        .aggregate(
            _Sum("n_vecs", alias_name="n_vecs_p"),
            _Sum("n_disagree", alias_name="n_disagree_p"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


EDRIFT_OFF = QUANT  # shift keeps every floor-division numerator ≥ 0


def embedding_drift(sf_dir: str) -> "pa.Table":
    """Embedding distribution drift monitor — per dimension, the
    exact fixed-point mean of the even-vec_id half vs the odd half
    (two interleaved snapshots of the same corpus) and their
    absolute gap in milli-quanta: the per-dim mean-shift check run
    before trusting a refreshed embedding table (collapsed or
    shifted dims shout here long before recall drops). Means are
    (Σq + n·OFF)·1000 // n − OFF·1000 with OFF = QUANT so the
    floor-division numerator stays non-negative (DuckDB `//`
    truncates toward zero; numpy floors — the shift makes them
    agree). Tail-seated by design: gram_matrix's moment fold split
    by vec_id parity.

    Scale shape: each batch folds to TWO d-vector int64 partials
    (n, Σq per half) — fixed size regardless of rows — emitted as
    2·d partial rows; one groupby((half, dim)).Sum() reduce and the
    driver reads ≤ 2·d rows. int64 exact to ~4.6e9 rows per half at
    |q| ≤ QUANT; beyond, split the ·1000 into the oracle's HUGEINT.
    Output: (dim, n_even, n_odd, sum_even, sum_odd, mean_even_milli,
    mean_odd_milli, drift_milli)."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        q = _quantize(
            _emb_np(batch.column("embedding"))
        )
        halves, dims, ns, ss = [], [], [], []
        for h in (0, 1):
            sel = q[vid % 2 == h]
            if not len(sel):
                continue
            d = sel.shape[1]
            halves += [h] * d
            dims += list(range(d))
            ns += [len(sel)] * d
            ss += sel.sum(axis=0, dtype=np.int64).tolist()
        return pa.table(
            {
                "half": pa.array(halves, pa.int64()),
                "dim": pa.array(dims, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "s": pa.array(ss, pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["half", "dim"])
        .aggregate(_Sum("n", alias_name="n"), _Sum("s", alias_name="s"))
        .take_all()  # bounded: 2 × d rows
    )
    acc: dict[int, dict[int, tuple[int, int]]] = {0: {}, 1: {}}
    for r in rows:
        acc[int(r["half"])][int(r["dim"])] = (int(r["n"]), int(r["s"]))
    dims = sorted(set(acc[0]) & set(acc[1]))

    def mean_milli(n: int, s: int) -> int:
        return (s + n * EDRIFT_OFF) * 1000 // n - EDRIFT_OFF * 1000

    me = [mean_milli(*acc[0][d]) for d in dims]
    mo = [mean_milli(*acc[1][d]) for d in dims]
    return pa.table(
        {
            "dim": pa.array(dims, pa.int64()),
            "n_even": pa.array([acc[0][d][0] for d in dims], pa.int64()),
            "n_odd": pa.array([acc[1][d][0] for d in dims], pa.int64()),
            "sum_even": pa.array([acc[0][d][1] for d in dims], pa.int64()),
            "sum_odd": pa.array([acc[1][d][1] for d in dims], pa.int64()),
            "mean_even_milli": pa.array(me, pa.int64()),
            "mean_odd_milli": pa.array(mo, pa.int64()),
            "drift_milli": pa.array(
                [abs(a - b) for a, b in zip(me, mo)], pa.int64()
            ),
        }
    )


LP_ROUNDS = 3   # synchronized label-propagation rounds
LP_LOCAL_MAX = 2_000_000  # directed rows below which LP runs width-1


def _lp_local_rounds(tbl: "pa.Table") -> "pa.Table":
    """All LP_ROUNDS synchronized rounds over the whole directed edge
    list in one vectorized task — the width-1 leg of _lp_build's
    size-adaptive plan. Identical fold: each node adopts the most
    frequent label among its neighbors, ties broken by the smallest
    label."""
    v = tbl.column("v").to_numpy(zero_copy_only=False)
    u = tbl.column("u").to_numpy(zero_copy_only=False)
    nodes = np.unique(v)  # every non-isolated node appears as v
    vi = np.searchsorted(nodes, v)
    ui = np.searchsorted(nodes, u)
    lab = nodes.copy()
    for _ in range(LP_ROUNDS):
        nl = lab[ui]  # the neighbor's current label, per directed edge
        order = np.lexsort((nl, vi))
        sv, sl = vi[order], nl[order]
        new_grp = np.r_[True, (sv[1:] != sv[:-1]) | (sl[1:] != sl[:-1])]
        gv, gl = sv[new_grp], sl[new_grp]
        starts = np.nonzero(new_grp)[0]
        counts = np.diff(np.r_[starts, len(sv)])
        # argmax per node by (count desc, label asc)
        o2 = np.lexsort((gl, -counts, gv))
        gv2 = gv[o2]
        first = np.r_[True, gv2[1:] != gv2[:-1]]
        new_lab = lab.copy()
        new_lab[gv2[first]] = gl[o2][first]
        lab = new_lab
    return pa.table(
        {
            "vec_id": pa.array(nodes, pa.int64()),
            "community": pa.array(lab, pa.int64()),
        }
    )


_LP_LABELS_CACHE: dict[tuple, "ray.data.Dataset"] = {}


def lp_labels_materialized(sf_dir: str) -> "ray.data.Dataset":
    """The memoized label-propagation assignment (vec_id, community) —
    shared root for the registry's label_propagation entry and
    community_modularity's scoring pass, the knn_edges_materialized /
    pairs_materialized discipline: the LP_ROUNDS exchange rounds run
    ONCE per (corpus, session); modularity only pays its own two
    co-partitions."""
    import os as _os

    emb_path = _os.path.join(sf_dir, "embeddings.parquet")
    try:
        session = ray.get_runtime_context().get_job_id()
    except Exception:
        session = None
    key = (_os.path.abspath(sf_dir), _os.path.getmtime(emb_path), session)
    ds = _LP_LABELS_CACHE.get(key)
    if ds is None:
        ds = _lp_build(sf_dir).materialize()
        for stale in [k for k in _LP_LABELS_CACHE if k != key]:
            del _LP_LABELS_CACHE[stale]
        _LP_LABELS_CACHE[key] = ds
    return ds


def label_propagation(sf_dir: str) -> "ray.data.Dataset":
    """Registry entry for LP communities — returns the memoized
    assignment (see lp_labels_materialized for the build/cache
    contract and _lp_build for the algorithm)."""
    return lp_labels_materialized(sf_dir)


def _lp_build(sf_dir: str) -> "ray.data.Dataset":
    """Community detection by synchronized label propagation over the
    mutual-kNN graph (Raghavan et al. 2007, made deterministic): every
    node starts labeled with its own vec_id; each round it adopts the
    most frequent label among its NEIGHBORS, ties broken by the
    smallest label; LP_ROUNDS synchronized rounds. Where
    dedup_components answers "which nodes are connected at all", LP
    answers "which DENSE pocket does a node sit in" — hub bridges
    don't glue communities the way they glue components. Isolated
    vectors (no mutual edge) are excluded, mirrored in the oracle.
    Tail-seated by design: mutual_knn's edge list driven through
    pagerank's unrolled-iteration discipline.

    Scale shape: the mutual edge list materializes ONCE in the object
    store (n·k int64 rows); each round is two coarse exchanges — a
    tagged-union co-partition attaching the endpoint's current label
    to each directed edge (labels are node-cardinality, never
    broadcast), then a groupby(node) whose group is one node's
    neighbor multiset (≤ degree rows) for the argmax fold. Labels and
    edges stay int64-only end to end. Output: (vec_id, community)."""
    import pandas as pd

    from ..stages.shuffle import N_COARSE_PARTS

    edges = mutual_knn(sf_dir)

    def directed(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column("vec_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "v": pa.array(np.concatenate([a, b]), pa.int64()),
                "u": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    dir_ds = edges.map_batches(directed, batch_format="pyarrow").materialize()

    # Size-adaptive exchange width: the per-round exchanges carry only
    # int64 edge/label rows, so tiny graphs use few partitions (the
    # all-to-all fixed cost dominates below ~1M edges) while big
    # graphs keep the full coarse width.
    n_dir = dir_ds.count()
    lp_parts = N_COARSE_PARTS if n_dir >= 1_000_000 else 8

    # Width-1 escape (the size-adaptive discipline taken to its
    # floor): below LP_LOCAL_MAX directed rows the whole graph is a
    # few MB of int64 — the exchange plan's 2·LP_ROUNDS all-to-alls
    # are pure fixed cost, so run every synchronized round inside ONE
    # worker task with the identical (most-frequent, tie-smallest)
    # fold vectorized in numpy. Same semantics, same oracle;
    # test_lp_exchange_parity pins exchange-plan == local-plan.
    if n_dir < LP_LOCAL_MAX:
        return dir_ds.repartition(1).map_batches(
            _lp_local_rounds, batch_format="pyarrow", batch_size=None
        )

    from ray.data.aggregate import Min as _Min

    labels = dir_ds.groupby("v").aggregate(_Min("v", alias_name="lab"))
    # (v, lab) — initial label is the node id itself

    def lab_side(batch: pa.Table) -> pa.Table:
        node = batch.column("v").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        lab = batch.column("lab").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(node)
        return pa.table(
            {
                "key": pa.array(node, pa.int64()),
                "v": pa.array(np.zeros(n, np.int64), pa.int64()),
                "lab": pa.array(lab, pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(node % lp_parts, pa.int64()),
            }
        )

    def edge_side(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        n = len(v)
        return pa.table(
            {
                "key": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "lab": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(u % lp_parts, pa.int64()),
            }
        )

    def attach(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["key", "v", "lab", "side"]).to_pandas()
        build = df[df["side"] == 0].set_index("key")["lab"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="key", how="inner", rsuffix="_b")
        v = m["v"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "v": pa.array(v, pa.int64()),
                "nlab": pa.array(
                    m["lab_b"].to_numpy().astype(np.int64), pa.int64()
                ),
                "vpart": pa.array(v % lp_parts, pa.int64()),
            }
        )

    def tally_part(part_tbl: pa.Table) -> pa.Table:
        # one vectorized argmax per partition: (count desc, label asc)
        df = part_tbl.select(["v", "nlab"]).to_pandas()
        c = (
            df.groupby(["v", "nlab"], sort=False)
            .size()
            .reset_index(name="c")
            .sort_values(
                ["v", "c", "nlab"], ascending=[True, False, True]
            )
            .drop_duplicates("v")
        )
        return pa.table(
            {
                "v": pa.array(c["v"].to_numpy().astype(np.int64), pa.int64()),
                "lab": pa.array(
                    c["nlab"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    for _ in range(LP_ROUNDS):
        labels = (
            labels.map_batches(lab_side, batch_format="pyarrow")
            .union(dir_ds.map_batches(edge_side, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(attach, batch_format="pyarrow")
            .groupby("vpart")
            .map_groups(tally_part, batch_format="pyarrow")
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": batch.column("v"),
                "community": batch.column("lab"),
            }
        )

    return labels.map_batches(rename, batch_format="pyarrow")


def community_modularity(sf_dir: str) -> "pa.Table":
    """Newman modularity of the label-propagation partition, exact —
    Q = Σ_c [e_c/m − (d_c/2m)²] over the mutual-kNN graph, scored in
    millionths as (Σ_c(4m·e_c − d_c²) + 4m²)·10⁶ // 4m² − 10⁶ (the
    +4m² shift keeps the floor-division numerator ≥ 0 since Q ≥ −½):
    the number that says whether label_propagation found structure
    or noise (Q ≈ 0), the eval-of-the-eval cluster_purity cannot
    play because it needs ground-truth labels and modularity needs
    none. Per community the exact intra-edge count, degree mass and
    node count are emitted alongside. Tail-seated by design:
    label_propagation's output scored against mutual_knn's edges.

    Scale shape: ONE tagged-union co-partition attaches each
    endpoint's community (labels are node-cardinality, never
    broadcast) and — since d_c is just the count of directed
    endpoint rows labeled c — yields the degree mass for free; a
    second co-partition on the packed edge key reassembles (c_a,
    c_b) pairs for intra counts; Q folds from the ≤|communities|
    grid on the driver. Output: (community, n_nodes, intra_edges,
    degree_sum, q_x1e6)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    labels = lp_labels_materialized(sf_dir)
    edges = mutual_knn(sf_dir)  # memoized, already materialized
    m_edges = edges.count()
    # Size-adaptive exchange width (the _lp_build discipline): the
    # scoring co-partitions move only int64 rows, so tiny graphs use
    # few partitions — the all-to-all fixed cost dominates below ~1M
    # directed rows — while big graphs keep the full coarse width.
    md_parts = N_COARSE_PARTS if 2 * m_edges >= 1_000_000 else 8

    # Width-1 escape: below LP_LOCAL_MAX tagged rows, score the whole
    # graph in ONE worker task (a few MB of int64) instead of paying
    # five all-to-alls of pure fixed cost; identical grid + fold,
    # pinned by test_modularity_exchange_parity.
    if 2 * m_edges < LP_LOCAL_MAX:

        def lab_tag(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "a": batch.column("vec_id").cast(pa.int64()),
                    "b": batch.column("community").cast(pa.int64()),
                    "side": pa.array(
                        np.zeros(batch.num_rows, np.int64), pa.int64()
                    ),
                }
            )

        def edge_tag(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "a": batch.column("vec_a").cast(pa.int64()),
                    "b": batch.column("vec_b").cast(pa.int64()),
                    "side": pa.array(
                        np.ones(batch.num_rows, np.int64), pa.int64()
                    ),
                }
            )

        grid = (
            labels.map_batches(lab_tag, batch_format="pyarrow")
            .union(edges.map_batches(edge_tag, batch_format="pyarrow"))
            .repartition(1)
            .map_batches(
                _md_score_local, batch_format="pyarrow", batch_size=None
            )
            .take_all()  # bounded: one row per community
        )
        deg = {int(r["comm"]): int(r["d"]) for r in grid}
        intra = {
            int(r["comm"]): int(r["e"]) for r in grid if int(r["e"]) > 0
        }
        n_nodes = {int(r["comm"]): int(r["n"]) for r in grid}
        return _md_fold(deg, intra, n_nodes, m_edges)

    def lab_rows(batch: pa.Table) -> pa.Table:
        node = batch.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        comm = batch.column("community").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(node)
        return pa.table(
            {
                "key": pa.array(node, pa.int64()),
                "ekey": pa.array(np.zeros(n, np.int64), pa.int64()),
                "pos": pa.array(np.zeros(n, np.int64), pa.int64()),
                "comm": pa.array(comm, pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(node % md_parts, pa.int64()),
            }
        )

    def end_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column("vec_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ekey = (a << 32) + b
        node = np.concatenate([a, b])
        ek2 = np.concatenate([ekey, ekey])
        pos = np.concatenate(
            [np.zeros(len(a), np.int64), np.ones(len(b), np.int64)]
        )
        n = len(node)
        return pa.table(
            {
                "key": pa.array(node, pa.int64()),
                "ekey": pa.array(ek2, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "comm": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(node % md_parts, pa.int64()),
            }
        )

    def attach(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["key", "ekey", "pos", "comm", "side"]).to_pandas()
        build = df[df["side"] == 0].set_index("key")["comm"]
        probe = df[df["side"] == 1]
        mm = probe.join(build, on="key", how="inner", rsuffix="_b")
        ek = mm["ekey"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "ekey": pa.array(ek, pa.int64()),
                "pos": pa.array(
                    mm["pos"].to_numpy().astype(np.int64), pa.int64()
                ),
                "comm": pa.array(
                    mm["comm_b"].to_numpy().astype(np.int64), pa.int64()
                ),
                "epart": pa.array(ek % md_parts, pa.int64()),
            }
        )

    attached = (
        labels.map_batches(lab_rows, batch_format="pyarrow")
        .union(edges.map_batches(end_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(attach, batch_format="pyarrow")
        .materialize()
    )

    # degree mass per community: count of directed endpoint rows
    deg = {
        int(r["comm"]): int(r["d"])
        for r in attached.map_batches(
            lambda b: pa.table(
                {
                    "comm": b.column("comm"),
                    "one": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("comm")
        .aggregate(_Sum("one", alias_name="d"))
        .take_all()  # bounded: one row per community
    }

    def pair_fold(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["ekey", "pos", "comm"]).to_pandas()
        p = df.pivot_table(
            index="ekey", columns="pos", values="comm", aggfunc="first"
        )
        intra = p[p[0] == p[1]].groupby(0).size()
        return pa.table(
            {
                "comm": pa.array(
                    intra.index.to_numpy().astype(np.int64), pa.int64()
                ),
                "e": pa.array(
                    intra.to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    intra = {
        int(r["comm"]): int(r["e"])
        for r in attached.groupby("epart")
        .map_groups(pair_fold, batch_format="pyarrow")
        .groupby("comm")
        .aggregate(_Sum("e", alias_name="e"))
        .take_all()  # bounded: one row per community
    }
    n_nodes = {
        int(r["community"]): int(r["n"])
        for r in labels.map_batches(
            lambda b: pa.table(
                {
                    "community": b.column("community"),
                    "one": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("community")
        .aggregate(_Sum("one", alias_name="n"))
        .take_all()  # bounded: one row per community
    }
    return _md_fold(deg, intra, n_nodes, m_edges)


def _md_score_local(tbl: "pa.Table") -> "pa.Table":
    """Whole-graph modularity grid in one vectorized task — the
    width-1 leg of community_modularity: per community the node
    count, intra-edge count and directed-endpoint degree mass, from
    the tagged union of (vec_id, community, side=0) label rows and
    (vec_a, vec_b, side=1) edge rows."""
    side = tbl.column("side").to_numpy(zero_copy_only=False)
    a = tbl.column("a").to_numpy(zero_copy_only=False)
    b = tbl.column("b").to_numpy(zero_copy_only=False)
    lab_mask = side == 0
    nodes, comm = a[lab_mask], b[lab_mask]
    order = np.argsort(nodes)
    nodes, comm = nodes[order], comm[order]
    ea, eb = a[~lab_mask], b[~lab_mask]
    ca = comm[np.searchsorted(nodes, ea)]
    cb = comm[np.searchsorted(nodes, eb)]
    comms = np.unique(comm)
    ci = np.searchsorted(comms, comm)
    cia = np.searchsorted(comms, ca)
    cib = np.searchsorted(comms, cb)
    n_nodes = np.bincount(ci, minlength=len(comms))
    deg = np.bincount(cia, minlength=len(comms)) + np.bincount(
        cib, minlength=len(comms)
    )
    intra = np.bincount(
        cia[cia == cib], minlength=len(comms)
    )
    return pa.table(
        {
            "comm": pa.array(comms, pa.int64()),
            "n": pa.array(n_nodes.astype(np.int64), pa.int64()),
            "e": pa.array(intra.astype(np.int64), pa.int64()),
            "d": pa.array(deg.astype(np.int64), pa.int64()),
        }
    )


def _md_fold(
    deg: dict, intra: dict, n_nodes: dict, m_edges: int
) -> "pa.Table":
    """Shared final Q fold over the per-community grid (exact shifted
    floor division; Q ≥ −½ keeps the numerator non-negative)."""
    comms = sorted(n_nodes)
    num = sum(
        4 * m_edges * intra.get(c, 0) - deg[c] * deg[c] for c in comms
    )
    q_x1e6 = (num + 4 * m_edges * m_edges) * 1_000_000 // (
        4 * m_edges * m_edges
    ) - 1_000_000
    return pa.table(
        {
            "community": pa.array(comms, pa.int64()),
            "n_nodes": pa.array([n_nodes[c] for c in comms], pa.int64()),
            "intra_edges": pa.array(
                [intra.get(c, 0) for c in comms], pa.int64()
            ),
            "degree_sum": pa.array([deg[c] for c in comms], pa.int64()),
            "q_x1e6": pa.array([q_x1e6] * len(comms), pa.int64()),
        }
    )


def embedding_norm_profile(sf_dir: str) -> "pa.Table":
    """Per-label profile of exact quantized norm² — each embedding's
    Σq² (QUANT fixed-point, exact int) folded into log2 bands per
    label, with per-(label, band) counts and the band's exact norm²
    mass: the embedding-health check run before any cosine pipeline
    (a label whose mass pools in low bands is collapsing toward the
    origin; cosine there is noise — the failure mode embedding_drift's
    per-dim means can miss because collapse preserves the mean).
    Tail-seated by design: gram_matrix's diagonal folded through
    conversion_by_engagement's banding.

    Scale shape: each batch folds rows to (label, band) partials —
    norm² is a row-local dot product, the band a bit-length — and ONE
    bounded groupby (≤ labels × 64 cells) finishes; the driver reads
    the grid. Output: (label, band, n_vectors, norm2_sum)."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lab = batch.column("label").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        q = _quantize(
            _emb_np(batch.column("embedding"))
        )
        norm2 = (q * q).sum(axis=1)
        band = np.zeros(len(norm2), np.int64)
        nn = norm2.copy()
        while (nn > 0).any():
            band[nn > 0] += 1
            nn >>= 1
        g = (
            pd.DataFrame({"l": lab, "b": band, "c": 1, "m": norm2})
            .groupby(["l", "b"], sort=False)
            .agg(c=("c", "sum"), m=("m", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "label": pa.array(
                    g["l"].to_numpy().astype(np.int64), pa.int64()
                ),
                "band": pa.array(
                    g["b"].to_numpy().astype(np.int64), pa.int64()
                ),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
                "m": pa.array(g["m"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "band"])
        .aggregate(_Sum("c", alias_name="c"), _Sum("m", alias_name="m"))
        .take_all()  # bounded: labels × log2 bands
    )
    out = sorted(
        (int(r["label"]), int(r["band"]), int(r["c"]), int(r["m"]))
        for r in rows
    )
    return pa.table(
        {
            "label": pa.array([r[0] for r in out], pa.int64()),
            "band": pa.array([r[1] for r in out], pa.int64()),
            "n_vectors": pa.array([r[2] for r in out], pa.int64()),
            "norm2_sum": pa.array([r[3] for r in out], pa.int64()),
        }
    )


def degree_assortativity(sf_dir: str) -> "pd.DataFrame":
    """Exact degree-assortativity sufficient statistics of the
    mutual-kNN graph (Newman 2002): the Pearson correlation of the
    degrees at the two ends of every edge, the one-number answer to
    "do hubs link to hubs?" that community_modularity cannot give
    (modularity scores a PARTITION; assortativity scores the raw
    mixing). Disassortative (r < 0) is the expected signature of a
    mutual-kNN graph — hub vectors reciprocate mostly with low-degree
    satellites — so r near 0 or positive flags a clustered corpus.
    Output is ONE integer row (m, s_sum, s_sq, s_prod): m edges,
    Σ(d_a + d_b), Σ(d_a² + d_b²), Σ d_a·d_b, from which
    r = (4m·s_prod − s_sum²) / (2m·s_sq − s_sum²) is exact rational
    arithmetic downstream (spearman_corr's sufficient-statistic
    contract). Tail-seated by design: mutual_knn's edge list driven
    through corr_moments' fold.

    Scale shape: the memoized mutual edge list (built once per
    session, shared with label_propagation and community_modularity)
    unrolls to directed endpoint rows; ONE co-partition on node
    computes degrees with a vectorized np.unique inside each part (a
    node's rows never straddle parts) and re-emits (eid, deg) int64
    rows; a SECOND co-partition on the packed edge key folds each
    edge's two degree rows via pyarrow group_by — per-edge product
    recovered as ((d_a+d_b)² − (d_a²+d_b²))/2, so only sums cross
    the exchange — then per-part moment partials Sum-fold to the one
    output row. Two int64-only exchanges, width size-adaptive on the
    community_modularity discipline; int64 headroom: s_prod ≤ m·d²
    with d ≤ 2k, safe through ~10^14 edges."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    edges = mutual_knn(sf_dir)  # memoized, already materialized
    m_edges = edges.count()
    parts = N_COARSE_PARTS if 2 * m_edges >= 1_000_000 else 8
    PACK = 1 << 32

    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column("vec_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = a * PACK + b
        node = np.concatenate([a, b])
        eid2 = np.concatenate([eid, eid])
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "eid": pa.array(eid2, pa.int64()),
                "part": pa.array(node % parts, pa.int64()),
            }
        )

    def node_degrees(part_tbl: pa.Table) -> pa.Table:
        node = part_tbl.column("node").to_numpy(zero_copy_only=False)
        eid = part_tbl.column("eid").to_numpy(zero_copy_only=False)
        uniq, inv, cnt = np.unique(
            node, return_inverse=True, return_counts=True
        )
        deg = cnt.astype(np.int64)[inv]
        return pa.table(
            {
                "eid": pa.array(eid, pa.int64()),
                "deg": pa.array(deg, pa.int64()),
                "part": pa.array(eid % parts, pa.int64()),
            }
        )

    def edge_moments(part_tbl: pa.Table) -> pa.Table:
        t = (
            part_tbl.select(["eid", "deg"])
            .append_column(
                "deg2",
                pa.array(
                    part_tbl.column("deg").to_numpy(zero_copy_only=False)
                    ** 2,
                    pa.int64(),
                ),
            )
            .group_by("eid")
            .aggregate([("deg", "sum"), ("deg2", "sum")])
        )
        sd = t.column("deg_sum").to_numpy(zero_copy_only=False)
        sd2 = t.column("deg2_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "m": pa.array([len(sd)], pa.int64()),
                "s_sum": pa.array([int(sd.sum())], pa.int64()),
                "s_sq": pa.array([int(sd2.sum())], pa.int64()),
                "s_prod": pa.array(
                    [int(((sd * sd - sd2) // 2).sum())], pa.int64()
                ),
            }
        )

    folded = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("part")
        .map_groups(node_degrees, batch_format="pyarrow")
        .groupby("part")
        .map_groups(edge_moments, batch_format="pyarrow")
        .aggregate(
            _Sum("m", alias_name="m"),
            _Sum("s_sum", alias_name="s_sum"),
            _Sum("s_sq", alias_name="s_sq"),
            _Sum("s_prod", alias_name="s_prod"),
        )
    )
    return pd.DataFrame([{k: int(v) for k, v in folded.items()}])[
        ["m", "s_sum", "s_sq", "s_prod"]
    ]


def _triangle_census_over(
    edges: "ray.data.Dataset", ca: str, cb: str
) -> "pd.DataFrame":
    """The degree-ordered-orientation census of `triangle_census`,
    parameterized over any canonical (a < b) edge list — shared with
    linkage_transitivity_audit."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    m_edges = edges.count()
    parts = N_COARSE_PARTS if 2 * m_edges >= 1_000_000 else 8
    PACK = 1 << 32

    # Width-1 escape: below CENSUS_LOCAL_MAX directed rows the four
    # exchanges are pure fixed cost — the identical census in one
    # vectorized task.
    if 2 * m_edges < CENSUS_LOCAL_MAX:
        def _census_local(tbl: pa.Table) -> pa.Table:
            a = tbl.column(ca).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            b = tbl.column(cb).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            node = np.concatenate([a, b])
            uniq, inv, cnt = np.unique(
                node, return_inverse=True, return_counts=True
            )
            c = cnt.astype(np.int64)
            n_nodes = len(uniq)
            wedges = int((c * (c - 1) // 2).sum())
            deg = c[inv]
            da, db = deg[: len(a)], deg[len(a):]
            na, nb = a, b
            # orient from lower (deg, node)
            a_first = (da < db) | ((da == db) & (na < nb))
            src = np.where(a_first, na, nb)
            dst = np.where(a_first, nb, na)
            order = np.lexsort((dst, src))
            src_s, dst_s = src[order], dst[order]
            _, start, scnt = np.unique(
                src_s, return_index=True, return_counts=True
            )
            keys = []
            for k in np.unique(scnt):
                if k < 2:
                    continue
                starts = start[scnt == k]
                mat = dst_s[starts[:, None] + np.arange(k)[None, :]]
                ii, jj = np.triu_indices(int(k), 1)
                lo = np.minimum(mat[:, ii], mat[:, jj]).ravel()
                hi = np.maximum(mat[:, ii], mat[:, jj]).ravel()
                keys.append(lo * PACK + hi)
            wk = (
                np.concatenate(keys) if keys else np.empty(0, np.int64)
            )
            ek = np.sort(a * PACK + b)
            tri = int(np.isin(wk, ek).sum()) if len(wk) else 0
            return pa.table(
                {
                    "n_nodes": pa.array([n_nodes], pa.int64()),
                    "m_edges": pa.array([len(a)], pa.int64()),
                    "wedges": pa.array([wedges], pa.int64()),
                    "triangles": pa.array([tri], pa.int64()),
                }
            )

        local = edges.repartition(1).map_batches(
            _census_local, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        for col in local.columns:
            local[col] = local[col].astype("int64")
        return local[["n_nodes", "m_edges", "wedges", "triangles"]]

    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch.column(ca).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column(cb).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = a * PACK + b
        node = np.concatenate([a, b])
        eid2 = np.concatenate([eid, eid])
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "eid": pa.array(eid2, pa.int64()),
                "part": pa.array(node % parts, pa.int64()),
            }
        )

    def node_degrees(part_tbl: pa.Table) -> pa.Table:
        node = part_tbl.column("node").to_numpy(zero_copy_only=False)
        eid = part_tbl.column("eid").to_numpy(zero_copy_only=False)
        uniq, inv, cnt = np.unique(
            node, return_inverse=True, return_counts=True
        )
        deg = cnt.astype(np.int64)[inv]
        return pa.table(
            {
                "eid": pa.array(eid, pa.int64()),
                "deg": pa.array(deg, pa.int64()),
                "part": pa.array(eid % parts, pa.int64()),
            }
        )

    def edge_moments(part_tbl: pa.Table) -> pa.Table:
        t = (
            part_tbl.select(["eid", "deg"])
            .append_column(
                "deg2",
                pa.array(
                    part_tbl.column("deg").to_numpy(zero_copy_only=False)
                    ** 2,
                    pa.int64(),
                ),
            )
            .group_by("eid")
            .aggregate([("deg", "sum"), ("deg2", "sum")])
        )
        sd = t.column("deg_sum").to_numpy(zero_copy_only=False)
        sd2 = t.column("deg2_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "m": pa.array([len(sd)], pa.int64()),
                "s_sum": pa.array([int(sd.sum())], pa.int64()),
                "s_sq": pa.array([int(sd2.sum())], pa.int64()),
                "s_prod": pa.array(
                    [int(((sd * sd - sd2) // 2).sum())], pa.int64()
                ),
            }
        )

    folded = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("part")
        .map_groups(node_degrees, batch_format="pyarrow")
        .groupby("part")
        .map_groups(edge_moments, batch_format="pyarrow")
        .aggregate(
            _Sum("m", alias_name="m"),
            _Sum("s_sum", alias_name="s_sum"),
            _Sum("s_sq", alias_name="s_sq"),
            _Sum("s_prod", alias_name="s_prod"),
        )
    )
    return pd.DataFrame([{k: int(v) for k, v in folded.items()}])[
        ["m", "s_sum", "s_sq", "s_prod"]
    ]


def triangle_census(sf_dir: str) -> "pd.DataFrame":
    """Exact triangle census of the mutual-kNN graph: ONE integer row
    (n_nodes, m_edges, wedges, triangles) — the sufficient statistics
    of the global clustering coefficient C = 3·triangles / wedges,
    the third classical one-number graph health check next to
    community_modularity (partition quality) and degree_assortativity
    (degree mixing). High C with low modularity flags a corpus whose
    near-duplicate structure is local cliques rather than broad
    communities — exactly the shape where SemDeDup outperforms
    connected-component fuzzy dedup.

    Scale shape (degree-ordered orientation, the classical
    distributed triangle-count trick): each triangle has exactly ONE
    vertex with out-edges to the other two once every edge is
    oriented from its lower (degree, id) endpoint, so wedges are
    generated only at that vertex and out-degree is bounded by
    O(sqrt(2m)) regardless of hubs. Four int64-only co-partition
    exchanges, none carrying payload: (1) endpoint rows -> node parts
    (a node's rows never straddle parts) compute degrees with one
    np.unique and ride per-part (n_nodes, wedge) partials as columns
    on the first row — wedges = Σ d(d−1)/2 needs no extra pass; (2)
    (eid, node, deg) rows -> edge parts orient each edge at its
    lexicographically smaller (deg, node) endpoint; (3) oriented
    edges -> source parts emit each out-neighbor pair ONCE as a
    packed (lo, hi) int64 key, vectorized by looping only over
    DISTINCT out-degree values (each k handled as a (groups, k)
    matrix under np.triu_indices); (4) wedge keys union edge keys ->
    key parts, per-part triangles = np.isin(wedge, edge).sum() with
    multiplicity (distinct sources = distinct triangles), Sum-folded.
    The stage-2 input is materialized once and feeds both the
    (n_nodes, wedges) fold and the orientation pass. int64 headroom:
    keys pack two 32-bit ids; wedges ≤ n·d²/2 safe past 10^14."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    return _triangle_census_over(mutual_knn(sf_dir), "vec_a", "vec_b")


def _triangle_census_over(
    edges: "ray.data.Dataset", ca: str, cb: str
) -> "pd.DataFrame":
    """The degree-ordered-orientation census of `triangle_census`,
    parameterized over any canonical (a < b) edge list — shared with
    linkage_transitivity_audit."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    m_edges = edges.count()
    parts = N_COARSE_PARTS if 2 * m_edges >= 1_000_000 else 8
    PACK = 1 << 32

    # Width-1 escape: below CENSUS_LOCAL_MAX directed rows the four
    # exchanges are pure fixed cost — the identical census in one
    # vectorized task.
    if 2 * m_edges < CENSUS_LOCAL_MAX:
        def _census_local(tbl: pa.Table) -> pa.Table:
            a = tbl.column(ca).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            b = tbl.column(cb).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            node = np.concatenate([a, b])
            uniq, inv, cnt = np.unique(
                node, return_inverse=True, return_counts=True
            )
            c = cnt.astype(np.int64)
            n_nodes = len(uniq)
            wedges = int((c * (c - 1) // 2).sum())
            deg = c[inv]
            da, db = deg[: len(a)], deg[len(a):]
            na, nb = a, b
            # orient from lower (deg, node)
            a_first = (da < db) | ((da == db) & (na < nb))
            src = np.where(a_first, na, nb)
            dst = np.where(a_first, nb, na)
            order = np.lexsort((dst, src))
            src_s, dst_s = src[order], dst[order]
            _, start, scnt = np.unique(
                src_s, return_index=True, return_counts=True
            )
            keys = []
            for k in np.unique(scnt):
                if k < 2:
                    continue
                starts = start[scnt == k]
                mat = dst_s[starts[:, None] + np.arange(k)[None, :]]
                ii, jj = np.triu_indices(int(k), 1)
                lo = np.minimum(mat[:, ii], mat[:, jj]).ravel()
                hi = np.maximum(mat[:, ii], mat[:, jj]).ravel()
                keys.append(lo * PACK + hi)
            wk = (
                np.concatenate(keys) if keys else np.empty(0, np.int64)
            )
            ek = np.sort(a * PACK + b)
            tri = int(np.isin(wk, ek).sum()) if len(wk) else 0
            return pa.table(
                {
                    "n_nodes": pa.array([n_nodes], pa.int64()),
                    "m_edges": pa.array([len(a)], pa.int64()),
                    "wedges": pa.array([wedges], pa.int64()),
                    "triangles": pa.array([tri], pa.int64()),
                }
            )

        local = edges.repartition(1).map_batches(
            _census_local, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        for col in local.columns:
            local[col] = local[col].astype("int64")
        return local[["n_nodes", "m_edges", "wedges", "triangles"]]

    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch.column(ca).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column(cb).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = a * PACK + b
        node = np.concatenate([a, b])
        eid2 = np.concatenate([eid, eid])
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "eid": pa.array(eid2, pa.int64()),
                "part": pa.array(node % parts, pa.int64()),
            }
        )

    def node_degrees(part_tbl: pa.Table) -> pa.Table:
        node = part_tbl.column("node").to_numpy(zero_copy_only=False)
        eid = part_tbl.column("eid").to_numpy(zero_copy_only=False)
        uniq, inv, cnt = np.unique(
            node, return_inverse=True, return_counts=True
        )
        deg = cnt.astype(np.int64)[inv]
        n = len(node)
        nn = np.zeros(n, np.int64)
        wd = np.zeros(n, np.int64)
        if n:
            c = cnt.astype(np.int64)
            nn[0] = len(uniq)
            wd[0] = int((c * (c - 1) // 2).sum())
        return pa.table(
            {
                "eid": pa.array(eid, pa.int64()),
                "node": pa.array(node, pa.int64()),
                "deg": pa.array(deg, pa.int64()),
                "part": pa.array(eid % parts, pa.int64()),
                "nn": pa.array(nn, pa.int64()),
                "wd": pa.array(wd, pa.int64()),
            }
        )

    def orient(part_tbl: pa.Table) -> pa.Table:
        eid = part_tbl.column("eid").to_numpy(zero_copy_only=False)
        node = part_tbl.column("node").to_numpy(zero_copy_only=False)
        deg = part_tbl.column("deg").to_numpy(zero_copy_only=False)
        order = np.lexsort((node, deg, eid))
        node_s = node[order]
        src = node_s[0::2]
        dst = node_s[1::2]
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "part": pa.array(src % parts, pa.int64()),
            }
        )

    def make_wedges(part_tbl: pa.Table) -> pa.Table:
        src = part_tbl.column("src").to_numpy(zero_copy_only=False)
        dst = part_tbl.column("dst").to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src_s, dst_s = src[order], dst[order]
        uniq, start, cnt = np.unique(
            src_s, return_index=True, return_counts=True
        )
        keys = []
        for k in np.unique(cnt):
            if k < 2:
                continue
            starts = start[cnt == k]
            # (groups, k) matrix of each size-k group's out-neighbors
            mat = dst_s[starts[:, None] + np.arange(k)[None, :]]
            ii, jj = np.triu_indices(int(k), 1)
            lo = np.minimum(mat[:, ii], mat[:, jj]).ravel()
            hi = np.maximum(mat[:, ii], mat[:, jj]).ravel()
            keys.append(lo * PACK + hi)
        wk = (
            np.concatenate(keys)
            if keys
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                "key": pa.array(wk, pa.int64()),
                "kind": pa.array(np.ones(len(wk), np.int64)),
                "part": pa.array(wk % parts, pa.int64()),
            }
        )

    def edge_keys(batch: pa.Table) -> pa.Table:
        a = batch.column(ca).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column(cb).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        key = a * PACK + b
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "kind": pa.array(np.zeros(len(key), np.int64)),
                "part": pa.array(key % parts, pa.int64()),
            }
        )

    def match_part(part_tbl: pa.Table) -> pa.Table:
        key = part_tbl.column("key").to_numpy(zero_copy_only=False)
        kind = part_tbl.column("kind").to_numpy(zero_copy_only=False)
        ek = key[kind == 0]
        wk = key[kind == 1]
        tri = int(np.isin(wk, ek).sum()) if len(wk) and len(ek) else 0
        return pa.table({"triangles": pa.array([tri], pa.int64())})

    degrows = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("part")
        .map_groups(node_degrees, batch_format="pyarrow")
        .materialize()
    )
    stats = degrows.aggregate(
        _Sum("nn", alias_name="n_nodes"),
        _Sum("wd", alias_name="wedges"),
    )
    wedge_rows = (
        degrows.groupby("part")
        .map_groups(orient, batch_format="pyarrow")
        .groupby("part")
        .map_groups(make_wedges, batch_format="pyarrow")
    )
    tri = (
        wedge_rows.union(
            edges.map_batches(edge_keys, batch_format="pyarrow")
        )
        .groupby("part")
        .map_groups(match_part, batch_format="pyarrow")
        .aggregate(_Sum("triangles", alias_name="triangles"))
    )
    return pd.DataFrame(
        [
            {
                "n_nodes": int(stats["n_nodes"]),
                "m_edges": int(m_edges),
                "wedges": int(stats["wedges"]),
                "triangles": int(tri["triangles"]),
            }
        ]
    )


WL_ROUNDS = 2  # color-refinement rounds past the degree coloring
WL_LOCAL_MAX = 2_000_000  # directed rows below which WL runs width-1
CENSUS_LOCAL_MAX = 1_000_000  # directed rows below which the census runs width-1


def _wl_local_rounds(tbl: "pa.Table") -> "pa.Table":
    """All WL rounds + per-round color stats over the whole directed
    edge list in one vectorized task — the width-1 leg of
    wl_refinement's size-adaptive plan (the LP_LOCAL_MAX discipline:
    below ~2M int64 rows the exchange plan's per-round all-to-alls
    are pure fixed cost). Neighbor multisets order by np.unique's
    lexicographic string sort — identical to the oracle's string_agg
    ORDER BY — and the only per-node Python is the join+md5 loop the
    distributed leg performs anyway."""
    import hashlib

    v = tbl.column("v").to_numpy(zero_copy_only=False)
    u = tbl.column("u").to_numpy(zero_copy_only=False)
    nodes = np.unique(v)
    vi = np.searchsorted(nodes, v)
    ui = np.searchsorted(nodes, u)
    deg = np.bincount(vi, minlength=len(nodes))
    labs = np.array([str(int(d)) for d in deg], dtype=object)

    def stats(rnd: int) -> tuple:
        _, cnt = np.unique(labs, return_counts=True)
        return (rnd, len(cnt), int(cnt.max()))

    out = [stats(0)]
    for rnd in range(1, WL_ROUNDS + 1):
        nl = labs[ui]
        uniq, code = np.unique(nl, return_inverse=True)
        order = np.lexsort((code, vi))
        sv, sc = vi[order], code[order]
        starts = np.r_[0, 1 + np.nonzero(sv[1:] != sv[:-1])[0]]
        ends = np.r_[starts[1:], len(sv)]
        new_labs = np.empty(len(nodes), dtype=object)
        for gi in range(len(starts)):
            nd = sv[starts[gi]]
            joined = ",".join(uniq[sc[starts[gi]: ends[gi]]])
            new_labs[nd] = hashlib.md5(
                (labs[nd] + "|" + joined).encode()
            ).hexdigest()
        labs = new_labs
        out.append(stats(rnd))
    return pa.table(
        {
            "round": pa.array([r[0] for r in out], pa.int64()),
            "n_colors": pa.array([r[1] for r in out], pa.int64()),
            "max_class": pa.array([r[2] for r in out], pa.int64()),
        }
    )


def wl_refinement(sf_dir: str) -> "pd.DataFrame":
    """Weisfeiler-Leman color refinement over the mutual-kNN graph —
    the canonical graph-fingerprinting algorithm (1-WL: each round
    recolors every node by the hash of its own color plus the SORTED
    multiset of neighbor colors) and the convergence readout the
    graph triad lacks: round 0 is the degree coloring, and the speed
    at which n_colors grows toward n across rounds measures how much
    local structure distinguishes nodes — a corpus of templated
    near-dups plateaus early (many nodes stay indistinguishable,
    exactly the symmetry class 1-WL cannot break), a diverse corpus
    individualizes by round 2. Output per round r ∈ {0, 1, 2}:
    (round, n_colors, max_class) — max_class is the largest set of
    still-indistinguishable nodes, the direct upper bound on what any
    message-passing model (GNNs are bounded by 1-WL) can separate.

    Scale shape: labels are (node, color) rows; each round is TWO
    co-partitions of int64/md5-string rows — attach the neighbor's
    color by grouping directed edges with the label rows on the
    NEIGHBOR key (a tagged union join, never a broadcast), then
    regroup on the node to hash color || sorted neighbor colors
    (md5 per NODE, the stratified_sample md5 discipline; sorting is
    plain ASCII on hex strings so the oracle's string_agg ORDER BY
    mirrors it byte-for-byte). Per-round color stats are a
    value-counts fold: n_colors = rows, max_class = Max."""
    import hashlib

    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    edges = mutual_knn(sf_dir)

    def directed(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column("vec_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "v": pa.array(np.concatenate([a, b]), pa.int64()),
                "u": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    ed = edges.map_batches(directed, batch_format="pyarrow").materialize()

    # Width-1 escape: below WL_LOCAL_MAX directed rows the per-round
    # exchanges are pure fixed cost — run every round in ONE task.
    if ed.count() < WL_LOCAL_MAX:
        local = (
            ed.repartition(1)
            .map_batches(
                _wl_local_rounds, batch_format="pyarrow", batch_size=None
            )
            .to_pandas()
        )
        for c in local.columns:
            local[c] = local[c].astype("int64")
        return local[["round", "n_colors", "max_class"]]

    def degree_labels(part_tbl: pa.Table) -> pa.Table:
        v = part_tbl.column("v").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {
                "node": pa.array(uniq, pa.int64()),
                "lab": pa.array([str(int(c)) for c in cnt], pa.string()),
            }
        )

    def part_on(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch.column(col).to_numpy(zero_copy_only=False)
            return batch.append_column(
                "part", pa.array(k % N_COARSE_PARTS, pa.int64())
            )

        return fn

    labels = (
        ed.map_batches(part_on("v"), batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: degree_labels(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def color_stats(lab_ds, rnd: int) -> dict:
        def vc(batch: pa.Table) -> pa.Table:
            t = batch.select(["lab"]).group_by("lab").aggregate(
                [([], "count_all")]
            )
            return pa.table(
                {
                    "lab": t.column("lab"),
                    "n": t.column("count_all").cast(pa.int64()),
                }
            )

        def stat_partial(batch: pa.Table) -> pa.Table:
            n = batch.column("n").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "nc": pa.array([len(n)], pa.int64()),
                    "mx": pa.array(
                        [int(n.max()) if len(n) else 0], pa.int64()
                    ),
                }
            )

        agg = (
            lab_ds.map_batches(vc, batch_format="pyarrow")
            .groupby("lab")
            .aggregate(_Sum("n", alias_name="n"))
            .map_batches(stat_partial, batch_format="pyarrow")
            .aggregate(
                _Sum("nc", alias_name="nc"), _Max("mx", alias_name="mx")
            )
        )
        return {
            "round": rnd,
            "n_colors": int(agg["nc"]),
            "max_class": int(agg["mx"]),
        }

    out = [color_stats(labels, 0)]
    for rnd in range(1, WL_ROUNDS + 1):
        # attach each neighbor's label: union-join on the neighbor key
        lab_side = labels.map_batches(
            lambda b: pa.table(
                {
                    "key": b.column("node").cast(pa.int64()),
                    "v": pa.array(
                        np.full(b.num_rows, -1, np.int64), pa.int64()
                    ),
                    "lab": b.column("lab"),
                }
            ),
            batch_format="pyarrow",
        )
        edge_side = ed.map_batches(
            lambda b: pa.table(
                {
                    "key": b.column("u").cast(pa.int64()),
                    "v": b.column("v").cast(pa.int64()),
                    "lab": pa.array([""] * b.num_rows, pa.string()),
                }
            ),
            batch_format="pyarrow",
        )

        def attach(part_tbl: pa.Table) -> pa.Table:
            df = part_tbl.to_pandas()
            labs = df[df["v"] < 0].set_index("key")["lab"]
            e = df[df["v"] >= 0]
            return pa.table(
                {
                    "v": pa.array(e["v"].to_numpy(np.int64), pa.int64()),
                    "nlab": pa.array(
                        e["key"].map(labs).to_numpy(dtype=object),
                        pa.string(),
                    ),
                }
            )

        neigh = (
            lab_side.union(edge_side)
            .map_batches(part_on("key"), batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                lambda g: attach(g.drop_columns(["part"])),
                batch_format="pyarrow",
            )
        )

        own_side = labels.map_batches(
            lambda b: pa.table(
                {
                    "v": b.column("node").cast(pa.int64()),
                    "nlab": pa.array([""] * b.num_rows, pa.string()),
                    "own": b.column("lab"),
                }
            ),
            batch_format="pyarrow",
        )
        neigh_side = neigh.map_batches(
            lambda b: pa.table(
                {
                    "v": b.column("v"),
                    "nlab": b.column("nlab"),
                    "own": pa.array([""] * b.num_rows, pa.string()),
                }
            ),
            batch_format="pyarrow",
        )

        def rehash(part_tbl: pa.Table) -> pa.Table:
            df = part_tbl.to_pandas()
            own = df[df["own"] != ""].set_index("v")["own"]
            nb = df[df["own"] == ""]
            agg = nb.groupby("v")["nlab"].apply(
                lambda s: ",".join(sorted(s))
            )
            nodes = agg.index.to_numpy()
            labs = [
                hashlib.md5(
                    (own[nd] + "|" + agg[nd]).encode()
                ).hexdigest()
                for nd in nodes
            ]
            return pa.table(
                {
                    "node": pa.array(nodes.astype(np.int64), pa.int64()),
                    "lab": pa.array(labs, pa.string()),
                }
            )

        labels = (
            own_side.union(neigh_side)
            .map_batches(part_on("v"), batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                lambda g: rehash(g.drop_columns(["part"])),
                batch_format="pyarrow",
            )
            .materialize()
        )
        out.append(color_stats(labels, rnd))

    df = pd.DataFrame(out)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["round", "n_colors", "max_class"]]


def ann_margin_profile(sf_dir: str) -> "pd.DataFrame":
    """Lowe's-ratio margin profile of the kNN graph — the matching-
    confidence histogram (SIFT matching, margin-based bitext mining)
    none of the recall reports give: per vector, the banded ratio of
    its second- to first-neighbor squared distance,
    band = min(10·d2₂ // max(d2₁, 1), 50), so band 10 means the two
    nearest neighbors are equidistant (ambiguous match — the classic
    reject) and high bands mean a dominant, trustworthy nearest
    neighbor. Output: (band, n_vecs) plus the exact tie count at
    band 10 folded in. The curve's mass below ~13 is the fraction of
    the corpus where ANN 'top-1' answers are effectively coin flips.

    Scale shape: ranks 1-2 project out of the memoized knn edge set,
    ONE vec-keyed co-partition pivots the two rows per vector and
    emits banded counts, folding in a ≤51-row band grid."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    edges = knn_edges_materialized(sf_dir)

    def keep12(batch: pa.Table) -> pa.Table:
        r = batch.column("rank").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(r <= 2))
        v = t.column("vec_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vec": pa.array(v, pa.int64()),
                "rank": t.column("rank").cast(pa.int64()),
                "d2": t.column("d2").cast(pa.int64()),
                "part": pa.array(v % N_COARSE_PARTS, pa.int64()),
            }
        )

    def band_part(part_tbl: pa.Table) -> pa.Table:
        v = part_tbl.column("vec").to_numpy(zero_copy_only=False)
        r = part_tbl.column("rank").to_numpy(zero_copy_only=False)
        d2 = part_tbl.column("d2").to_numpy(zero_copy_only=False)
        order = np.lexsort((r, v))
        vs, rs, ds_ = v[order], r[order], d2[order]
        uniq, start, cnt = np.unique(vs, return_index=True, return_counts=True)
        has2 = cnt >= 2
        d1 = ds_[start[has2]]
        d2_ = ds_[start[has2] + 1]
        band = np.minimum(d2_ * 10 // np.maximum(d1, 1), 50)
        ub, bc = np.unique(band, return_counts=True)
        return pa.table(
            {
                "band": pa.array(ub, pa.int64()),
                "n_vecs": pa.array(bc.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        edges.map_batches(keep12, batch_format="pyarrow")
        .groupby("part")
        .map_groups(band_part, batch_format="pyarrow")
        .groupby("band")
        .aggregate(_Sum("n_vecs", alias_name="n_vecs"))
        .take_all()  # bounded: <= 51 rows
    )
    df = pd.DataFrame(rows).sort_values("band", ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["band", "n_vecs"]]


BFS_SEEDS = 8  # smallest node ids seed the traversal
BFS_HOPS = 3
BFS_LOCAL_MAX = 2_000_000  # directed rows below which BFS runs width-1


def bfs_layers(sf_dir: str) -> "pd.DataFrame":
    """Exact BFS layer sizes from a fixed seed set over the
    mutual-kNN graph — the diameter/expansion probe the per-node
    two_hop_reach histogram doesn't give: seeding at the BFS_SEEDS
    smallest node ids, (hop, n_nodes) counts nodes FIRST reached at
    each hop ≤ 3. Fast layer decay means the reciprocal graph is
    fragmented (near-dup islands); sustained growth means one giant
    component — the cheap connectivity readout before paying for full
    components.

    Scale shape: width-1 escape below BFS_LOCAL_MAX directed rows
    (one vectorized frontier loop); above it, each hop is two
    tagged-union co-partitions of int64 rows — edges grouped with the
    current distance rows on the NEIGHBOR-source key emit candidate
    nodes, then candidates merge with distance rows on the node key
    taking the minimum hop (the WL/LP exchange discipline; never a
    broadcast frontier). Layer sizes fold from the final distance
    rows in one bounded ≤(hops+2)-cell aggregate."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    edges = mutual_knn(sf_dir)

    def directed(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column("vec_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "v": pa.array(np.concatenate([a, b]), pa.int64()),
                "u": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    ed = edges.map_batches(directed, batch_format="pyarrow").materialize()

    def finish(dist: "np.ndarray") -> "pd.DataFrame":
        hops, counts = np.unique(dist[dist >= 0], return_counts=True)
        df = pd.DataFrame(
            {
                "hop": hops.astype("int64"),
                "n_nodes": counts.astype("int64"),
            }
        )
        return df.sort_values("hop", ignore_index=True)

    if ed.count() < BFS_LOCAL_MAX:

        def local(tbl: pa.Table) -> pa.Table:
            v = tbl.column("v").to_numpy(zero_copy_only=False)
            u = tbl.column("u").to_numpy(zero_copy_only=False)
            nodes = np.unique(v)
            vi = np.searchsorted(nodes, v)
            ui = np.searchsorted(nodes, u)
            dist = np.full(len(nodes), -1, np.int64)
            dist[: min(BFS_SEEDS, len(nodes))] = 0  # smallest ids seed
            for hop in range(1, BFS_HOPS + 1):
                reach = np.zeros(len(nodes), bool)
                src_on = dist[vi] == hop - 1
                reach[ui[src_on]] = True
                new = reach & (dist < 0)
                dist[new] = hop
            h, c = np.unique(dist[dist >= 0], return_counts=True)
            return pa.table(
                {
                    "hop": pa.array(h, pa.int64()),
                    "n_nodes": pa.array(c.astype(np.int64), pa.int64()),
                }
            )

        out = (
            ed.repartition(1)
            .map_batches(local, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out.sort_values("hop", ignore_index=True)

    # exchange plan: dist rows (node, d); seeds = BFS_SEEDS smallest
    def part_on(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch.column(col).to_numpy(zero_copy_only=False)
            return batch.append_column(
                "part", pa.array(k % N_COARSE_PARTS, pa.int64())
            )

        return fn

    def node_rows(part_tbl: pa.Table) -> pa.Table:
        v = part_tbl.column("v").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.unique(v), pa.int64())})

    nodes_ds = (
        ed.map_batches(part_on("v"), batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: node_rows(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .materialize()
    )
    seed_rows = nodes_ds.sort("node").limit(BFS_SEEDS).take_all()
    seeds = {int(r["node"]) for r in seed_rows}
    seeds_ref = ray.put(np.array(sorted(seeds), np.int64))

    def init_dist(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_numpy(zero_copy_only=False)
        sd = ray.get(seeds_ref)
        d = np.where(np.isin(n, sd), 0, -1).astype(np.int64)
        return pa.table(
            {"node": pa.array(n, pa.int64()), "d": pa.array(d, pa.int64())}
        )

    dist = nodes_ds.map_batches(init_dist, batch_format="pyarrow").materialize()

    for hop in range(1, BFS_HOPS + 1):
        dist_side = dist.map_batches(
            lambda b: pa.table(
                {
                    "key": b.column("node").cast(pa.int64()),
                    "v": pa.array(np.full(b.num_rows, -1, np.int64),
                                  pa.int64()),
                    "d": b.column("d").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        edge_side = ed.map_batches(
            lambda b: pa.table(
                {
                    "key": b.column("u").cast(pa.int64()),
                    "v": b.column("v").cast(pa.int64()),
                    "d": pa.array(np.full(b.num_rows, -2, np.int64),
                                  pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

        def expand(part_tbl: pa.Table, h=hop) -> pa.Table:
            v = part_tbl.column("v").to_numpy(zero_copy_only=False)
            key = part_tbl.column("key").to_numpy(zero_copy_only=False)
            d = part_tbl.column("d").to_numpy(zero_copy_only=False)
            lab = d[v == -1]
            lkey = key[v == -1]
            frontier = np.sort(lkey[lab == h - 1])
            e_mask = v != -1
            hit = np.isin(key[e_mask], frontier)
            cand = np.unique(v[e_mask][hit])
            return pa.table({"node": pa.array(cand, pa.int64())})

        cand = (
            dist_side.union(edge_side)
            .map_batches(part_on("key"), batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                lambda g, h=hop: expand(g.drop_columns(["part"]), h),
                batch_format="pyarrow",
            )
        )

        cand_side = cand.map_batches(
            lambda b: pa.table(
                {
                    "node": b.column("node").cast(pa.int64()),
                    "d": pa.array(np.full(b.num_rows, -3, np.int64),
                                  pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

        def merge(part_tbl: pa.Table, h=hop) -> pa.Table:
            n = part_tbl.column("node").to_numpy(zero_copy_only=False)
            d = part_tbl.column("d").to_numpy(zero_copy_only=False)
            is_c = d == -3
            order = np.argsort(n[~is_c], kind="stable")
            base_n = n[~is_c][order]
            base_d = d[~is_c][order]
            cpos = np.searchsorted(base_n, np.unique(n[is_c]))
            newly = np.unique(n[is_c])[base_d[cpos] < 0]
            upd = base_d.copy()
            upd[np.searchsorted(base_n, newly)] = h
            return pa.table(
                {
                    "node": pa.array(base_n, pa.int64()),
                    "d": pa.array(upd, pa.int64()),
                }
            )

        dist = (
            dist.map_batches(
                lambda b: pa.table(
                    {
                        "node": b.column("node").cast(pa.int64()),
                        "d": b.column("d").cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .union(cand_side)
            .map_batches(part_on("node"), batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                lambda g, h=hop: merge(g.drop_columns(["part"]), h),
                batch_format="pyarrow",
            )
            .materialize()
        )

    def layer_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("d").to_numpy(zero_copy_only=False)
        h, c = np.unique(d[d >= 0], return_counts=True)
        return pa.table(
            {
                "hop": pa.array(h, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        dist.map_batches(layer_partial, batch_format="pyarrow")
        .groupby("hop")
        .aggregate(_Sum("n", alias_name="n_nodes"))
        .take_all()  # bounded: <= hops + 1 rows
    )
    df = pd.DataFrame(rows).sort_values("hop", ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["hop", "n_nodes"]]


MAT_PREFIX_DIMS = 16  # truncated prefix for the matryoshka audit
MAT_K = 10


def matryoshka_recall(sf_dir: str) -> "pd.DataFrame":
    """Dimension-truncation (matryoshka) retrieval audit — per probe
    query, the exact overlap between the top-10 neighbors under the
    FULL 64-dim quantized L2² and under only the FIRST 16 dims: the
    feasibility test for MRL-style truncated serving and for IVF
    coarse quantizers built on prefixes (overlap ≈ 10 → truncate and
    serve 4× cheaper; low overlap → the tail dims carry the
    geometry). Distances are exact integers on the e6-quantized
    grid with the (d2, id) tie-break — both rankings and the overlap
    are bit-deterministic. Output per probe: (query_id, n_overlap).

    Scale shape: the ann_topk streamed pattern twice in ONE pass —
    each batch emits its local top-10 per (query, metric) against
    the broadcast 16-query matrix (never the corpus against itself),
    one query-keyed co-partition merges exact global top-10s for
    both metrics and counts the set overlap; ≤ 16 rows reach the
    driver."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    rows = _read_embeddings(sf_dir)

    def quantize(batch: pa.Table):
        ids = batch.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        emb = _emb_np(batch.column("embedding"))
        q = np.floor(emb * 1_000_000 + 0.5).astype(np.int64)
        return ids, q

    # broadcast the quantized probe matrix (vec_id < N_QUERIES) via a
    # PUSHDOWN-filtered read — never a full scan on the driver
    import pyarrow.dataset as pads

    dset = pads.dataset(f"{sf_dir}/embeddings.parquet")
    qt = dset.to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < N_QUERIES,
    )
    qids, qmat = quantize(qt)
    order = np.argsort(qids)
    qids, qmat = qids[order], qmat[order]
    ref = ray.put((qids, qmat))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(ref)
        ids, x = quantize(batch)
        out = {"query_id": [], "metric": [], "nid": [], "d2": []}
        for metric, dims in (("full", 64), ("pre", MAT_PREFIX_DIMS)):
            qm = q_mat[:, :dims]
            xm = x[:, :dims]
            # exact integer d2 via (a-b)^2 expansion per query row
            for qi in range(len(q_ids)):
                diff = xm - qm[qi][None, :]
                d2 = (diff * diff).sum(axis=1)
                mask = ids != q_ids[qi]
                cand = np.flatnonzero(mask)
                o2 = np.lexsort((ids[cand], d2[cand]))[:MAT_K]
                take = cand[o2]
                out["query_id"].extend([int(q_ids[qi])] * len(take))
                out["metric"].extend([metric] * len(take))
                out["nid"].extend(ids[take].tolist())
                out["d2"].extend(d2[take].tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "metric": pa.array(out["metric"], pa.string()),
                "nid": pa.array(out["nid"], pa.int64()),
                "d2": pa.array(out["d2"], pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        qid = int(group.column("query_id")[0].as_py())
        met = group.column("metric").to_pandas().to_numpy(dtype=object)
        nid = group.column("nid").to_numpy(zero_copy_only=False)
        d2 = group.column("d2").to_numpy(zero_copy_only=False)
        tops = {}
        for m in ("full", "pre"):
            sel = met == m
            o = np.lexsort((nid[sel], d2[sel]))[:MAT_K]
            tops[m] = set(nid[sel][o].tolist())
        return pa.table(
            {
                "query_id": pa.array([qid], pa.int64()),
                "n_overlap": pa.array(
                    [len(tops["full"] & tops["pre"])], pa.int64()
                ),
            }
        )

    out = (
        rows.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()  # bounded: <= N_QUERIES rows
    )
    df = pd.DataFrame(out).sort_values("query_id", ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["query_id", "n_overlap"]]


K_CORE_KS = (2, 3)         # peel thresholds reported
K_CORE_ROUNDS = 6          # fixed unrolled rounds (oracle-matched)
K_CORE_LOCAL_MAX = 2_000_000  # directed rows below which peel runs width-1
K_CORE_PARTS = 16          # peel-round exchange fan (see PR_PARTS)


def k_core_peel(sf_dir: str) -> "pd.DataFrame":
    """Exact k-core PEELING CASCADE of the mutual-kNN graph — for
    k ∈ {2, 3} and K_CORE_ROUNDS simultaneous-removal rounds, the
    per-round census (k, round, n_nodes, n_survivors): round r drops
    every node whose degree in the current graph is < k, then drops
    edges incident to dropped nodes; n_nodes counts the endpoints of
    the current edge list, n_survivors the nodes meeting the degree
    bar. The converged tail is the k-CORE — the maximal subgraph of
    minimum degree ≥ k, the classical density skeleton that
    `triangle_census` (closure) and `rich_club` (hub interlinking)
    don't expose: a corpus whose 3-core is tiny has near-dup
    structure made of trees/chains (safe to keep representatives); a
    giant 3-core means dense clique mass where fuzzy dedup must cut
    deeper. Fixed rounds keep the result exact and layout-free even
    when peeling hasn't converged (the cascade profile itself is the
    signal: how fast the periphery burns off).

    Scale shape: width-1 escape below K_CORE_LOCAL_MAX directed rows
    (one vectorized searchsorted/bincount peel); above it each round
    is the WL/LP exchange discipline — one node-key co-partition
    computes exact degrees and survivor rows (a node's directed rows
    never straddle partitions), then two tagged-union co-partitions
    drop edges whose v / u endpoint fell (never a broadcast removal
    set); the 4-column census rides per-round driver ints bounded by
    2·K_CORE_ROUNDS·|ks| rows. Edge payload is two int64 columns
    throughout."""
    import pandas as pd

    # Narrow fan (the PR_PARTS rationale): a peel round's cost is the
    # fixed all-to-all barrier, not data volume — 16-way keeps the
    # 3-exchange rounds from paying 64 map_groups tasks each; at
    # 100 TB this is the dial to raise toward #cores (results are
    # partitioning-invariant).
    N_COARSE_PARTS = K_CORE_PARTS

    edges = mutual_knn(sf_dir)

    def directed(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column("vec_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "v": pa.array(np.concatenate([a, b]), pa.int64()),
                "u": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    ed0 = edges.map_batches(directed, batch_format="pyarrow").materialize()
    out_rows: list[dict] = []

    if ed0.count() < K_CORE_LOCAL_MAX:

        def local(tbl: pa.Table) -> pa.Table:
            v0 = tbl.column("v").to_numpy(zero_copy_only=False)
            u0 = tbl.column("u").to_numpy(zero_copy_only=False)
            rows = []
            for k in K_CORE_KS:
                v, u = v0, u0
                for rnd in range(1, K_CORE_ROUNDS + 1):
                    nodes, deg = np.unique(v, return_counts=True)
                    keep_nodes = nodes[deg >= k]
                    rows.append((k, rnd, len(nodes), len(keep_nodes)))
                    vk = np.isin(v, keep_nodes)
                    uk = np.isin(u, keep_nodes)
                    m = vk & uk
                    v, u = v[m], u[m]
            arr = np.array(rows, np.int64).reshape(-1, 4)
            return pa.table(
                {
                    "k": pa.array(arr[:, 0], pa.int64()),
                    "round": pa.array(arr[:, 1], pa.int64()),
                    "n_nodes": pa.array(arr[:, 2], pa.int64()),
                    "n_survivors": pa.array(arr[:, 3], pa.int64()),
                }
            )

        df = (
            ed0.repartition(1)
            .map_batches(local, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        for c in df.columns:
            df[c] = df[c].astype("int64")
        return df.sort_values(["k", "round"], ignore_index=True)

    # grid plan: per round one degree co-partition + two edge-drop
    # co-partitions (tagged unions; never a broadcast removal set)
    def part_on(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            kk = batch.column(col).to_numpy(zero_copy_only=False)
            return batch.append_column(
                "part", pa.array(kk % N_COARSE_PARTS, pa.int64())
            )

        return fn

    for k in K_CORE_KS:
        ed = ed0
        for rnd in range(1, K_CORE_ROUNDS + 1):

            def surv_rows(part_tbl: pa.Table, _k=k) -> pa.Table:
                v = part_tbl.column("v").to_numpy(zero_copy_only=False)
                nodes, deg = np.unique(v, return_counts=True)
                return pa.table(
                    {
                        "node": pa.array(nodes, pa.int64()),
                        "ok": pa.array(
                            (deg >= _k).astype(np.int64), pa.int64()
                        ),
                    }
                )

            nd = (
                ed.map_batches(part_on("v"), batch_format="pyarrow")
                .groupby("part")
                .map_groups(
                    lambda g: surv_rows(g.drop_columns(["part"])),
                    batch_format="pyarrow",
                )
                .materialize()
            )
            n_nodes = nd.count()
            surv = nd.map_batches(
                lambda b: b.filter(
                    pa.compute.equal(b.column("ok"), pa.scalar(1, pa.int64()))
                ),
                batch_format="pyarrow",
            ).materialize()
            n_surv = surv.count()
            out_rows.append(
                {
                    "k": k,
                    "round": rnd,
                    "n_nodes": n_nodes,
                    "n_survivors": n_surv,
                }
            )

            keep = surv.map_batches(
                lambda b: pa.table(
                    {
                        "key": b.column("node").cast(pa.int64()),
                        "v": pa.array(
                            np.full(b.num_rows, -1, np.int64), pa.int64()
                        ),
                        "u": pa.array(
                            np.full(b.num_rows, -1, np.int64), pa.int64()
                        ),
                        "side": pa.array(
                            np.ones(b.num_rows, np.int64), pa.int64()
                        ),
                    }
                ),
                batch_format="pyarrow",
            )

            def drop_end(col: str, keep_ds, ed_ds):
                tagged = ed_ds.map_batches(
                    lambda b, _c=col: pa.table(
                        {
                            "key": b.column(_c).cast(pa.int64()),
                            "v": b.column("v").cast(pa.int64()),
                            "u": b.column("u").cast(pa.int64()),
                            "side": pa.array(
                                np.zeros(b.num_rows, np.int64), pa.int64()
                            ),
                        }
                    ),
                    batch_format="pyarrow",
                ).union(keep_ds)

                def filt(part_tbl: pa.Table) -> pa.Table:
                    key = part_tbl.column("key").to_numpy(
                        zero_copy_only=False
                    )
                    side = part_tbl.column("side").to_numpy(
                        zero_copy_only=False
                    )
                    kept = np.unique(key[side == 1])
                    em = side == 0
                    ok = np.isin(key[em], kept)
                    return pa.table(
                        {
                            "v": pa.array(
                                part_tbl.column("v").to_numpy(
                                    zero_copy_only=False
                                )[em][ok],
                                pa.int64(),
                            ),
                            "u": pa.array(
                                part_tbl.column("u").to_numpy(
                                    zero_copy_only=False
                                )[em][ok],
                                pa.int64(),
                            ),
                        }
                    )

                return (
                    tagged.map_batches(part_on("key"), batch_format="pyarrow")
                    .groupby("part")
                    .map_groups(
                        lambda g: filt(g.drop_columns(["part"])),
                        batch_format="pyarrow",
                    )
                )

            ed = drop_end("v", keep, ed)
            ed = drop_end("u", keep, ed).materialize()

    df = pd.DataFrame(out_rows)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values(["k", "round"], ignore_index=True)


BIP_LOCAL_MAX = 2_000_000  # directed rows below which parity-UF runs width-1
BIP_BRIDGE_CAP = 5_000_000  # driver cap for the parity bridge graph
BIP_PARTS = 16              # contraction fan


class _ParityUF:
    """Union-find with edge parity (weighted UF over GF(2)): find(x)
    returns (root, parity of the x→root path); union(x, y, p) merges
    under the constraint par(x) ⊕ par(y) = p and reports False when
    the constraint CONFLICTS with an existing relation (an odd cycle
    when p = 1 on a same-color merge)."""

    def __init__(self) -> None:
        self.parent: dict = {}
        self.par: dict = {}

    def find(self, x):
        if x not in self.parent:
            self.parent[x] = x
            self.par[x] = 0
            return x, 0
        path = []
        while self.parent[x] != x:
            path.append(x)
            x = self.parent[x]
        root = x
        # compress: walking the path from nearest-to-root outward, the
        # running XOR after absorbing a node's edge parity IS that
        # node's parity to the root (its own edge was still original
        # when absorbed; nearer nodes were rewritten already).
        p = 0
        for y in reversed(path):
            p ^= self.par[y]
            self.parent[y] = root
            self.par[y] = p
        return root, p

    def union(self, x, y, p: int) -> bool:
        rx, px = self.find(x)
        ry, py = self.find(y)
        if rx == ry:
            return (px ^ py) == p
        self.parent[rx] = ry
        self.par[rx] = px ^ py ^ p
        return True


def bipartiteness_audit(sf_dir: str) -> "pd.DataFrame":
    """ODD-CYCLE census of the mutual-kNN graph — per connected
    component, is it 2-COLORABLE, folded to one row: (n_components,
    n_odd_components, n_nodes, n_nodes_in_odd). A bipartite near-dup
    component is chain/star/grid structure (pairwise similarity that
    never closes a triangle — safe to keep one representative per
    side); odd components contain odd cycles, i.e. clique-like mass
    where `triangle_census` counts closures and SemDeDup-style
    cutting applies. Read with `k_core_peel` this completes the
    structure portfolio: core depth (density), triangles (closure),
    2-colorability (chain-vs-clique dichotomy).

    Scale shape: width-1 escape below BIP_LOCAL_MAX directed rows —
    a parity union-find (weighted UF over GF(2), odd cycle = parity
    conflict) in one task. Above it, a ONE-LEVEL parity contraction
    (the `dedup_threshold_curve` plan carrying parities): local
    parity-UF per 16-way edge partition emits (node, local-root,
    parity) rows plus local odd-root flags; a node-key co-partition
    turns multi-label nodes into parity bridge edges; the driver
    runs parity-UF ONLY on the capped bridge graph (conflict ⇒ odd
    root), broadcasts the root/parity/odd map, and sizes + odd flags
    fold back through one root-key exchange — per-component rows
    never sit on the driver."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    edges = mutual_knn(sf_dir)

    def directed(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column("vec_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "a": pa.array(np.concatenate([a, b]), pa.int64()),
                "b": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    ed = edges.map_batches(directed, batch_format="pyarrow").materialize()

    def stats_from(comp_rows) -> "pd.DataFrame":
        # comp_rows: iterable of (size, odd) per component
        n_comp = n_odd = n_nodes = n_in_odd = 0
        for sz, odd in comp_rows:
            n_comp += 1
            n_nodes += sz
            if odd:
                n_odd += 1
                n_in_odd += sz
        return pd.DataFrame(
            [
                {
                    "n_components": n_comp,
                    "n_odd_components": n_odd,
                    "n_nodes": n_nodes,
                    "n_nodes_in_odd": n_in_odd,
                }
            ]
        ).astype("int64")

    if ed.count() < BIP_LOCAL_MAX:
        uf = _ParityUF()
        odd_roots: set = set()
        for bt in edges.iter_batches(batch_format="pyarrow"):
            a = bt.column("vec_a").to_numpy(zero_copy_only=False)
            b = bt.column("vec_b").to_numpy(zero_copy_only=False)
            for x, y in zip(a.tolist(), b.tolist()):
                if not uf.union(x, y, 1):
                    odd_roots.add(uf.find(x)[0])
        comp: dict = {}
        odd_final: set = set()
        for v in list(uf.parent):
            r, _ = uf.find(v)
            comp[r] = comp.get(r, 0) + 1
        for r0 in odd_roots:
            odd_final.add(uf.find(r0)[0])
        return stats_from(
            (sz, r in odd_final) for r, sz in comp.items()
        )

    # grid plan: one-level parity contraction
    def local_uf(part_tbl: pa.Table) -> pa.Table:
        a = part_tbl.column("a").to_numpy(zero_copy_only=False)
        b = part_tbl.column("b").to_numpy(zero_copy_only=False)
        uf = _ParityUF()
        odd: set = set()
        for x, y in zip(a.tolist(), b.tolist()):
            if not uf.union(x, y, 1):
                odd.add(uf.find(x)[0])
        odd = {uf.find(r)[0] for r in odd}
        nodes = sorted(uf.parent)
        roots, pars = [], []
        for v in nodes:
            r, p = uf.find(v)
            roots.append(r)
            pars.append(p)
        n = len(nodes)
        rset = sorted({*roots})
        return pa.table(
            {
                "kind": pa.array(
                    [0] * n + [1] * len(rset), pa.int64()
                ),
                "node": pa.array(
                    nodes + rset, pa.int64()
                ),
                "root": pa.array(
                    roots + rset, pa.int64()
                ),
                "par": pa.array(
                    pars + [1 if r in odd else 0 for r in rset],
                    pa.int64(),
                ),
            }
        )

    nl = (
        ed.map_batches(
            lambda b: b.append_column(
                "part",
                pa.array(
                    b.column("a").to_numpy(zero_copy_only=False)
                    % BIP_PARTS,
                    pa.int64(),
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: local_uf(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .materialize()
    )

    node_rows = nl.map_batches(
        lambda b: b.filter(
            pa.compute.equal(b.column("kind"), pa.scalar(0, pa.int64()))
        ).drop_columns(["kind"]),
        batch_format="pyarrow",
    ).materialize()
    oddroot_rows = nl.map_batches(
        lambda b: b.filter(
            pa.compute.equal(b.column("kind"), pa.scalar(1, pa.int64()))
        ).drop_columns(["kind"]),
        batch_format="pyarrow",
    )

    def bridge_rows(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = pd.DataFrame(
            {
                "node": part_tbl.column("node").to_numpy(
                    zero_copy_only=False
                ),
                "root": part_tbl.column("root").to_numpy(
                    zero_copy_only=False
                ),
                "par": part_tbl.column("par").to_numpy(
                    zero_copy_only=False
                ),
            }
        ).sort_values(["node", "root", "par"])
        ra, rb, pp = [], [], []
        for _, g in df.groupby("node", sort=False):
            rows = g[["root", "par"]].to_numpy()
            r0, p0 = int(rows[0][0]), int(rows[0][1])
            for r1, p1 in rows[1:]:
                ra.append(r0)
                rb.append(int(r1))
                pp.append(p0 ^ int(p1))
        return pa.table(
            {
                "ra": pa.array(ra, pa.int64()),
                "rb": pa.array(rb, pa.int64()),
                "p": pa.array(pp, pa.int64()),
            }
        )

    bridges = (
        node_rows.map_batches(
            lambda b: b.append_column(
                "part",
                pa.array(
                    b.column("node").to_numpy(zero_copy_only=False)
                    % BIP_PARTS,
                    pa.int64(),
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: bridge_rows(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .materialize()
    )
    if bridges.count() > BIP_BRIDGE_CAP:
        raise RuntimeError(
            "bipartiteness_audit: bridge graph exceeds BIP_BRIDGE_CAP; "
            "recurse the contraction (dedup_components plan)"
        )
    uf = _ParityUF()
    odd_roots = set()
    for bt in bridges.iter_batches(batch_format="pyarrow"):
        for x, y, p in zip(
            bt.column("ra").to_numpy(zero_copy_only=False).tolist(),
            bt.column("rb").to_numpy(zero_copy_only=False).tolist(),
            bt.column("p").to_numpy(zero_copy_only=False).tolist(),
        ):
            if not uf.union(x, y, p):
                odd_roots.add(uf.find(x)[0])
    gmap = {}
    for v in list(uf.parent):
        r, p = uf.find(v)
        gmap[v] = r
    odd_global = {uf.find(r)[0] for r in odd_roots}
    gmap_ref = ray.put((gmap, odd_global))

    def node_comp(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        gm, _og = ray.get(gmap_ref)
        df = (
            pd.DataFrame(
                {
                    "node": part_tbl.column("node").to_numpy(
                        zero_copy_only=False
                    ),
                    "root": part_tbl.column("root").to_numpy(
                        zero_copy_only=False
                    ),
                }
            )
            .groupby("node", sort=False)["root"]
            .min()
            .reset_index()
        )
        groot = np.array(
            [gm.get(int(r), int(r)) for r in df["root"]], np.int64
        )
        t = pa.table(
            {
                "groot": pa.array(groot, pa.int64()),
                "sz": pa.array(np.ones(len(groot), np.int64), pa.int64()),
            }
        ).group_by("groot").aggregate([("sz", "sum")])
        return pa.table(
            {
                "groot": t.column("groot"),
                "sz": t.column("sz_sum").cast(pa.int64()),
                "odd": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            }
        )

    def oddflag_map(batch: pa.Table) -> pa.Table:
        gm, og = ray.get(gmap_ref)
        roots = batch.column("node").to_numpy(zero_copy_only=False)
        odd = batch.column("par").to_numpy(zero_copy_only=False)
        groot = np.array([gm.get(int(r), int(r)) for r in roots], np.int64)
        gflag = np.array(
            [
                1 if (o == 1 or g in og) else 0
                for o, g in zip(odd.tolist(), groot.tolist())
            ],
            np.int64,
        )
        return pa.table(
            {
                "groot": pa.array(groot, pa.int64()),
                "sz": pa.array(np.zeros(len(groot), np.int64), pa.int64()),
                "odd": pa.array(gflag, pa.int64()),
            }
        )

    per_root = (
        node_rows.map_batches(
            lambda b: b.append_column(
                "part",
                pa.array(
                    b.column("node").to_numpy(zero_copy_only=False)
                    % BIP_PARTS,
                    pa.int64(),
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: node_comp(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .union(oddroot_rows.map_batches(oddflag_map, batch_format="pyarrow"))
        .groupby("groot")
        .aggregate(
            _Sum("sz", alias_name="sz"),
            _Max("odd", alias_name="odd"),
        )
        .materialize()
    )
    agg = per_root.aggregate(
        _Sum("sz", alias_name="n_nodes"),
        _Sum("odd", alias_name="n_odd"),
    )
    n_comp = per_root.count()
    odd_nodes = per_root.map_batches(
        lambda b: pa.table(
            {
                "x": pa.array(
                    [
                        int(
                            (
                                b.column("sz").to_numpy(
                                    zero_copy_only=False
                                )
                                * b.column("odd").to_numpy(
                                    zero_copy_only=False
                                )
                            ).sum()
                        )
                    ],
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).aggregate(_Sum("x", alias_name="x"))
    return pd.DataFrame(
        [
            {
                "n_components": int(n_comp),
                "n_odd_components": int(agg["n_odd"]),
                "n_nodes": int(agg["n_nodes"]),
                "n_nodes_in_odd": int(odd_nodes["x"]),
            }
        ]
    ).astype("int64")


ATK_GRID = (0, 1, 2, 4, 8, 16)   # hubs removed per curve point
ATK_LOCAL_MAX = 2_000_000        # directed rows below which UF runs width-1


def attack_robustness_curve(sf_dir: str) -> "pd.DataFrame":
    """Targeted-ATTACK robustness curve of the mutual-kNN graph —
    remove the top-k degree hubs (ties → smaller node id) for
    k ∈ {0,1,2,4,8,16} and census what remains: (k_removed,
    n_nodes, n_edges, n_components, largest_component). The
    scale-free literature's signature experiment (Albert-Barabási
    attack tolerance): a giant component that collapses after
    removing a handful of hubs means the near-dup mass is glued by
    a few boilerplate-heavy documents — remove THOSE and fuzzy
    dedup decomposes into cheap islands; robustness to hub removal
    means the density is intrinsic and SemDeDup-style cutting is
    needed. The operational complement to `k_core_peel` (which
    peels the periphery; this decapitates the core).

    Scale shape: degrees fold from one node-key co-partition; the
    top-16 hub set is a bounded sort-limit broadcast in-closure;
    per curve point the filtered edge census is width-1 union-find
    below ATK_LOCAL_MAX directed rows, else the SHARED one-level
    contraction (`one_level_component_sizes`, the
    dedup_threshold_curve plan) whose driver state is bounded by
    the bridge graph."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..pipelines.dedup import _UnionFind, one_level_component_sizes
    from ..stages.shuffle import N_COARSE_PARTS

    edges = mutual_knn(sf_dir).materialize()

    def endpoint_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column("vec_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        v = np.concatenate([a, b])
        return pa.table(
            {
                "node": pa.array(v, pa.int64()),
                "part": pa.array(v % N_COARSE_PARTS, pa.int64()),
            }
        )

    def deg_rows(part_tbl: pa.Table) -> pa.Table:
        v = part_tbl.column("node").to_numpy(zero_copy_only=False)
        nodes, deg = np.unique(v, return_counts=True)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "deg": pa.array(deg.astype(np.int64), pa.int64()),
            }
        )

    hubs = (
        edges.map_batches(endpoint_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: deg_rows(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .sort(["deg", "node"], descending=[True, False])
        .limit(max(ATK_GRID))
        .take_all()  # bounded: the 16 hub rows
    )
    hub_ids = [int(r["node"]) for r in hubs]

    n_directed = 2 * edges.count()
    rows = []
    for k in ATK_GRID:
        rm = np.array(sorted(hub_ids[:k]), np.int64)

        def filt(batch: pa.Table, _rm=rm) -> pa.Table:
            a = batch.column("vec_a").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            b = batch.column("vec_b").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            keep = ~(np.isin(a, _rm) | np.isin(b, _rm))
            return pa.table(
                {
                    "a": pa.array(a[keep], pa.int64()),
                    "b": pa.array(b[keep], pa.int64()),
                }
            )

        ed_k = edges.map_batches(filt, batch_format="pyarrow").materialize()
        n_edges = ed_k.count()
        if n_directed < ATK_LOCAL_MAX:
            uf = _UnionFind()
            for bt in ed_k.iter_batches(batch_format="pyarrow"):
                for x, y in zip(
                    bt.column("a").to_numpy(zero_copy_only=False).tolist(),
                    bt.column("b").to_numpy(zero_copy_only=False).tolist(),
                ):
                    uf.union(x, y)
            comp: dict = {}
            for v in list(uf.parent):
                r = uf.find(v)
                comp[r] = comp.get(r, 0) + 1
            n_c, n_n, mx = (
                len(comp),
                sum(comp.values()),
                max(comp.values()) if comp else 0,
            )
        else:
            n_c, n_n, mx = one_level_component_sizes(ed_k)
        rows.append((k, n_n, n_edges, n_c, mx))

    df = pd.DataFrame(
        rows,
        columns=[
            "k_removed", "n_nodes", "n_edges", "n_components",
            "largest_component",
        ],
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def knn_reciprocity(sf_dir: str) -> "pd.DataFrame":
    """kNN RECIPROCITY rate — of all directed kNN edges, how many
    belong to a mutual pair: one exact row (n_nodes, n_directed,
    n_mutual_pairs, reciprocity_bp = 2·mutual·10⁴/directed). The
    scalar behind `mutual_knn`'s filter choice: low reciprocity
    means the kNN graph is hub-dominated (most edges point AT a few
    vectors that don't point back — `knn_hubness`' distribution
    collapsed to its policy number) and mutual filtering will cut
    aggressively; reciprocity near 10⁴ means the embedding space is
    locally symmetric and mutual-kNN keeps almost everything.

    Scale shape: two counts over already-memoized datasets (the
    directed kNN edge list and the mutual pair list) plus the
    embeddings row count — no new exchange at all."""
    import pandas as pd

    n_nodes = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).count()
    n_directed = knn_edges_materialized(sf_dir).count()
    n_mutual = mutual_knn(sf_dir).count()
    df = pd.DataFrame(
        [
            {
                "n_nodes": int(n_nodes),
                "n_directed": int(n_directed),
                "n_mutual_pairs": int(n_mutual),
                "reciprocity_bp": 2 * int(n_mutual) * 10000
                // int(n_directed)
                if n_directed
                else 0,
            }
        ]
    ).astype("int64")
    return df


RF_DENS = (1, 2, 4)        # edge-survival denominators
RF_LOCAL_MAX = 2_000_000   # directed rows below which UF runs width-1


def random_failure_curve(sf_dir: str) -> "pd.DataFrame":
    """RANDOM-FAILURE robustness of the mutual-kNN graph — keep each
    edge with deterministic probability 1, 1/2, 1/4 (md5 of the
    canonical pair) and census the survivors: (survive_den,
    n_edges, n_nodes, n_components, largest_component). The classic
    Albert-Barabási CONTRAST to `attack_robustness_curve`: heavy-
    tailed graphs are robust to random failure yet fragile to
    targeted hub removal — reading the two curves together
    diagnoses whether near-dup connectivity lives in hubs or in the
    bulk, which decides hub-doc removal vs global thinning as the
    dedup strategy.

    Scale shape: per level one streaming md5-threshold filter over
    the canonical pairs; census via width-1 union-find below
    RF_LOCAL_MAX directed rows, else the SHARED one-level
    contraction (`one_level_component_sizes`)."""
    import hashlib as _hashlib

    import pandas as pd

    from ..pipelines.dedup import _UnionFind, one_level_component_sizes

    edges = mutual_knn(sf_dir).materialize()
    n_directed = 2 * edges.count()
    SPACE = 1 << 60
    rows = []
    for den in RF_DENS:
        thr = SPACE // den

        def filt(batch: pa.Table, _t=thr) -> pa.Table:
            a = batch.column("vec_a").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            b = batch.column("vec_b").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            u = np.array(
                [
                    int(
                        _hashlib.md5(f"{x}:{y}".encode()).hexdigest()[:15],
                        16,
                    )
                    for x, y in zip(a.tolist(), b.tolist())
                ],
                np.int64,
            )
            keep = u < _t
            return pa.table(
                {
                    "a": pa.array(a[keep], pa.int64()),
                    "b": pa.array(b[keep], pa.int64()),
                }
            )

        ed_k = edges.map_batches(filt, batch_format="pyarrow").materialize()
        n_edges = ed_k.count()
        if n_directed < RF_LOCAL_MAX:
            uf = _UnionFind()
            for bt in ed_k.iter_batches(batch_format="pyarrow"):
                for x, y in zip(
                    bt.column("a").to_numpy(zero_copy_only=False).tolist(),
                    bt.column("b").to_numpy(zero_copy_only=False).tolist(),
                ):
                    uf.union(x, y)
            comp: dict = {}
            for v in list(uf.parent):
                r = uf.find(v)
                comp[r] = comp.get(r, 0) + 1
            n_c, n_n, mx = (
                len(comp),
                sum(comp.values()),
                max(comp.values()) if comp else 0,
            )
        else:
            n_c, n_n, mx = one_level_component_sizes(ed_k)
        rows.append((den, n_edges, n_n, n_c, mx))

    df = pd.DataFrame(
        rows,
        columns=[
            "survive_den", "n_edges", "n_nodes", "n_components",
            "largest_component",
        ],
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("survive_den", ignore_index=True)
