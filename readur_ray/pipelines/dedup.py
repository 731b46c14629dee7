"""Deduplication suite over the `documents` / `embeddings` tables.

Five near/exact-dup operators, each Ray-Data-first and mirrored by a
DuckDB oracle in ``__ray_entry__`` (md5/sha256 + integer arithmetic
only, so values match bit-for-bit):

- ``exact_dedup``      — md5(content) hash-groups, keep-first (min
  doc_id), the D1 analog of the reference's SHA-256 policy dedup
  (/root/reference/src/ingestion/document_ingestion.rs:121-169).
- ``minhash_lsh_pairs``— word-3-shingles → 16 minhashes → 16 1-row
  bands; candidate pair iff ≥1 shared band; emits shared-band counts.
- ``simhash_fingerprints`` / ``simhash_pairs`` — 64-bit simhash over
  token md5s; pairs with hamming distance ≤ k.
- ``ngram_jaccard_pairs`` — shingle inverted index self-join; pairs
  with integer-threshold Jaccard (inter*10 ≥ union).
- ``embedding_neardup_pairs`` — cosine ≥ threshold over the embedding
  column (brute force per batch against a broadcast matrix).

Scale notes (explicit, per north_rule):
- All pair generation goes through hash buckets (band key / shingle),
  i.e. a groupby shuffle on a *small projection* (ids + 60-bit hashes)
  — payload text never enters a shuffle.
- Hot buckets (boilerplate shingles / degenerate bands) explode
  quadratically; both the Ray path and the oracle DROP buckets larger
  than ``MAX_BUCKET`` — standard LSH practice; at 100 TB this is what
  keeps the skew bounded (salting is not needed because oversized
  buckets carry no near-dup signal).
- Doc-level lookup tables (shingle-set sizes, simhash fingerprints,
  query matrices) are broadcast via ``ray.put`` once and read inside
  ``map_batches`` — never re-shipped per batch, never a shuffle join.
  At 10^12 docs the fingerprint table no longer fits one node; the
  same plan then becomes a hash-join keyed on doc_id, which Ray
  expresses as a groupby over the union of both sides (documented
  here; the broadcast path is correct for the ≤10^8-doc per-job shards
  this engine processes per partition).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum

from ..functions.textstats import md5_hex, md5_int60, md5_int64, shingles_of, words_of

NUM_MINHASH = 16          # 16 bands × 1 row
MAX_BUCKET = 128          # LSH band buckets larger than this are dropped
MAX_SHINGLE_DOCS = 32     # shingles appearing in more docs are dropped
JACCARD_NUM = 1           # Jaccard threshold = NUM/DEN as exact int math
JACCARD_DEN = 10
SIMHASH_MAX_HAMMING = 3
EMBED_COS_THRESHOLD = 0.4


def _read_docs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


# ---------------------------------------------------------------------------
# exact dedup (D1)
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Hash-partition on md5(text); keep-first = min doc_id per group.

    Plan: vectorized hash → per-batch partial (hash → min_id) →
    small groupby(hash) final → broadcast winner map → mark pass.
    The full rows are never shuffled — only (hash, doc_id)."""
    docs = _read_docs(sf_dir)

    def hashed(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "content_hash": pa.array(
                    [md5_hex(t or "") for t in texts], pa.string()
                ),
            }
        )

    proj = docs.map_batches(hashed, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("content_hash").aggregate([("doc_id", "min")])
        return pa.table(
            {"content_hash": g.column("content_hash"),
             "winner": g.column("doc_id_min")}
        )

    winners = (
        proj.map_batches(partial, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("winner", alias_name="winner_doc_id"))
    )
    winner_map = {
        r["content_hash"]: r["winner_doc_id"] for r in winners.take_all()
    }
    ref = ray.put(winner_map)

    def mark(batch: pa.Table) -> pa.Table:
        wm = ray.get(ref)
        hashes = batch.column("content_hash").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        win = [wm[h] for h in hashes]
        status = ["kept" if w == i else "skipped_duplicate" for w, i in zip(win, ids)]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "content_hash": batch.column("content_hash"),
                "dedup_status": pa.array(status, pa.string()),
                "winner_doc_id": pa.array(win, pa.int64()),
            }
        )

    return proj.map_batches(mark, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _signature_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, band, minhash) rows — NUM_MINHASH per doc with ≥1 shingle."""
    out_id, out_band, out_mh = [], [], []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        sh = shingles_of(text or "", 3)
        if not sh:
            continue
        for b in range(NUM_MINHASH):
            out_id.append(doc_id)
            out_band.append(b)
            out_mh.append(min(md5_int60(f"{b}:{s}") for s in sh))
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int64()),
            "minhash": pa.array(out_mh, pa.int64()),
        }
    )


def _pairs_in_groups(key_cols: list[str]):
    """map_groups fn: emit all (doc_a < doc_b) pairs within a bucket,
    dropping buckets larger than MAX_BUCKET."""

    def fn(group: pa.Table) -> pa.Table:
        ids = sorted(group.column("doc_id").to_pylist())
        if len(ids) < 2 or len(ids) > MAX_BUCKET:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
        )

    return fn


def minhash_lsh_pairs(sf_dir: str) -> "ray.data.Dataset":
    """Candidate near-dup pairs: docs sharing ≥1 of 16 minhash bands.

    shingle→minhash (map_batches) → groupby(band, minhash) bucket →
    per-bucket pairs → groupby(pair) count = shared-band count."""
    sig = _read_docs(sf_dir).map_batches(_signature_rows, batch_format="pyarrow")
    pairs = (
        sig.groupby(["band", "minhash"])
        .map_groups(_pairs_in_groups(["band", "minhash"]), batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_shared_bands"))
    )
    return pairs


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

@__import__("functools").lru_cache(maxsize=65536)
def _token_pm_bits(t: str) -> np.ndarray:
    """±1 per bit of md5_int64(token) (cached — vocabularies are small
    relative to corpus size, so this amortizes to ~zero per token)."""
    h = md5_int64(t)
    bits = np.array([(h >> b) & 1 for b in range(64)], dtype=np.int64)
    return 2 * bits - 1


def _simhash64(text: str) -> int:
    """64-bit simhash over token md5s (multiplicity-weighted); bit set
    iff the signed bit-sum is strictly positive."""
    toks = words_of(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        acc += _token_pm_bits(t)
    fp = 0
    for bit in np.flatnonzero(acc > 0):
        fp |= 1 << int(bit)
    return fp


def simhash_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, simhash as 16-char lowercase hex)."""

    def fn(batch: pa.Table) -> pa.Table:
        fps = [
            format(_simhash64(t or ""), "016x")
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "simhash": pa.array(fps, pa.string())}
        )

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def simhash_pairs(sf_dir: str, max_hamming: int = SIMHASH_MAX_HAMMING) -> pa.Table:
    """Pairs with hamming(simhash) ≤ max_hamming.

    The fingerprint table is tiny (8 bytes/doc); it is broadcast and
    each batch popcounts itself against the whole table (vectorized
    uint64 xor). At 10^12 docs this becomes banded-bit LSH (split the
    64 bits into max_hamming+1 bands; exact-match groupby per band
    guarantees recall) — the band path reuses minhash_lsh machinery."""
    fp_ds = simhash_fingerprints(sf_dir)
    fps = fp_ds.to_pandas()
    all_ids = fps["doc_id"].to_numpy()
    all_fp = np.array([int(s, 16) for s in fps["simhash"]], dtype=np.uint64)
    ref = ray.put((all_ids, all_fp))

    def fn(batch: pa.Table) -> pa.Table:
        ids_g, fp_g = ray.get(ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        fp = np.array(
            [int(s, 16) for s in batch.column("simhash").to_pylist()], dtype=np.uint64
        )
        x = fp[:, None] ^ fp_g[None, :]
        # vectorized popcount on uint64 via byte view
        ham = np.unpackbits(x.view(np.uint8).reshape(x.shape[0], x.shape[1], 8), axis=2).sum(axis=2)
        ii, jj = np.nonzero((ham <= max_hamming) & (ids[:, None] < ids_g[None, :]))
        return pa.table(
            {
                "doc_a": pa.array(ids[ii], pa.int64()),
                "doc_b": pa.array(ids_g[jj], pa.int64()),
                "hamming": pa.array(ham[ii, jj].astype(np.int64), pa.int64()),
            }
        )

    return fp_ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

def _shingle_rows(batch: pa.Table) -> pa.Table:
    out_id, out_sh = [], []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        for s in shingles_of(text or "", 3):
            out_id.append(doc_id)
            out_sh.append(md5_int60(s))
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "shingle": pa.array(out_sh, pa.int64()),
        }
    )


def ngram_jaccard_pairs(sf_dir: str) -> "ray.data.Dataset":
    """Pairs with Jaccard(3-shingles) ≥ JACCARD_NUM/JACCARD_DEN,
    computed exactly with integer arithmetic.

    Inverted-index plan: explode (shingle, doc_id) → drop shingles in
    > MAX_SHINGLE_DOCS docs (hot-key guard) → per-shingle pairs →
    groupby(pair) count = |A∩B| → attach broadcast set sizes →
    integer-threshold filter."""
    docs = _read_docs(sf_dir)
    sh = docs.map_batches(_shingle_rows, batch_format="pyarrow")

    sizes = {
        r["doc_id"]: r["count()"] for r in sh.groupby("doc_id").count().take_all()
    }
    sizes_ref = ray.put(sizes)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group.column("doc_id").to_pylist())
        if len(ids) < 2 or len(ids) > MAX_SHINGLE_DOCS:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
        )

    inter = (
        sh.groupby("shingle")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="intersection"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = batch.column("doc_a").to_pylist()
        b = batch.column("doc_b").to_pylist()
        inter_n = batch.column("intersection").to_pylist()
        size_a = [sz[i] for i in a]
        size_b = [sz[i] for i in b]
        union = [sa + sb - n for sa, sb, n in zip(size_a, size_b, inter_n)]
        keep = [
            n * JACCARD_DEN >= u * JACCARD_NUM for n, u in zip(inter_n, union)
        ]
        t = pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "intersection": pa.array(inter_n, pa.int64()),
                "size_a": pa.array(size_a, pa.int64()),
                "size_b": pa.array(size_b, pa.int64()),
            }
        )
        return t.filter(pa.array(keep, pa.bool_()))

    return inter.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def _normalized_matrix(table: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = table.column("vec_id").to_numpy(zero_copy_only=False)
    emb = np.array(table.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, emb / norms


def embedding_neardup_pairs(
    sf_dir: str, threshold: float = EMBED_COS_THRESHOLD
) -> "ray.data.Dataset":
    """Pairs with cosine ≥ threshold: per-batch float64 matmul against
    the broadcast normalized matrix (brute-force baseline; the LSH
    scale path is similarity.lsh_buckets)."""
    import pyarrow.parquet as pq

    full = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids_g, mat_g = _normalized_matrix(full)
    ref = ray.put((ids_g, mat_g))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def fn(batch: pa.Table) -> pa.Table:
        gids, gmat = ray.get(ref)
        ids, mat = _normalized_matrix(batch)
        sims = mat @ gmat.T
        ii, jj = np.nonzero((sims >= threshold) & (ids[:, None] < gids[None, :]))
        return pa.table(
            {
                "vec_a": pa.array(ids[ii], pa.int64()),
                "vec_b": pa.array(gids[jj], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
