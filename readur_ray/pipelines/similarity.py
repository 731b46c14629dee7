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

N_QUERIES = 16            # queries = vec_id < N_QUERIES
TOP_K = 5
N_ANCHORS = 8             # hyperplanes = embeddings with vec_id in [16, 24)
ANCHOR_LO = 16


def _normalized(table: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = table.column("vec_id").to_numpy(zero_copy_only=False)
    emb = np.array(table.column("embedding").to_pylist(), dtype=np.float64)
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


def lsh_buckets(sf_dir: str) -> "ray.data.Dataset":
    """(vec_id, bucket): bucket = sign bits of cosine vs the anchor
    embeddings, most-significant anchor first (anchor order = vec_id)."""
    aids, amat = _load_rows(sf_dir, ANCHOR_LO, ANCHOR_LO + N_ANCHORS)
    ref = ray.put(amat)

    def fn(batch: pa.Table) -> pa.Table:
        anchors = ray.get(ref)
        ids, mat = _normalized(batch)
        bits = (mat @ anchors.T) > 0               # (batch, n_anchors)
        buckets = ["".join("1" if b else "0" for b in row) for row in bits]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(buckets, pa.string()),
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
    qbits = (qmat @ amat.T) > 0
    qbuckets = np.array(
        ["".join("1" if b else "0" for b in row) for row in qbits]
    )
    ref = ray.put((qids, qmat, qbuckets, amat))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, q_buckets, anchors = ray.get(ref)
        ids, mat = _normalized(batch)
        bits = (mat @ anchors.T) > 0
        ebuckets = np.array(
            ["".join("1" if b else "0" for b in row) for row in bits]
        )
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
