"""Deduplication suite over the `documents` / `embeddings` tables.

Exact + near-dup operators (plus banded/bucketed scale variants), each Ray-Data-first and mirrored by a
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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Min

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

    # materialized: the 2-column (hash, id) projection is read twice
    # (winner aggregation + mark pass) — ~48 B/doc, never the text
    proj = docs.map_batches(hashed, batch_format="pyarrow").materialize()

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

@__import__("functools").lru_cache(maxsize=262144)
def _band_hashes(s: str) -> np.ndarray:
    """The NUM_MINHASH per-band hashes of one shingle (cached per
    worker process — shingle vocabularies repeat heavily across docs)."""
    return np.array(
        [md5_int60(f"{b}:{s}") for b in range(NUM_MINHASH)], dtype=np.int64
    )


def _signature_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, band, minhash) rows — NUM_MINHASH per doc with ≥1 shingle."""
    out_id, out_band, out_mh = [], [], []
    bands = list(range(NUM_MINHASH))
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        sh = shingles_of(text or "", 3)
        if not sh:
            continue
        sig = np.min(np.stack([_band_hashes(s) for s in sh]), axis=0)
        out_id.extend([doc_id] * NUM_MINHASH)
        out_band.extend(bands)
        out_mh.extend(sig.tolist())
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int64()),
            "minhash": pa.array(out_mh, pa.int64()),
        }
    )


N_COARSE_PARTS = 64  # buckets are coarse-hashed into this many shuffle keys


def _bucket_pairs_fn(key_cols: list[str], max_bucket: int):
    """Vectorized pair emission over a COARSE partition that contains
    many buckets: one pandas groupby per partition (not one Python call
    per bucket — that is what makes this scale: a naive
    groupby(bucket).map_groups costs a Python invocation per bucket,
    ~100k of them per million docs)."""

    def fn(part: pa.Table) -> pa.Table:
        empty = pa.table({"pair_key": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        df = part.select([*key_cols, "doc_id"]).to_pandas()
        df = df.sort_values([*key_cols, "doc_id"], ignore_index=True)
        sizes = df.groupby(key_cols, sort=False)["doc_id"].transform("size").to_numpy()
        keep = (sizes >= 2) & (sizes <= max_bucket)
        if not keep.any():
            return empty
        ids_all = df["doc_id"].to_numpy()[keep]
        sz = sizes[keep]
        # groups are contiguous (sorted) and id-sorted within; emit pairs
        # per SIZE CLASS with one reshape + triu each (≤ max_bucket numpy
        # ops total — no Python loop over the ~#buckets groups). Pairs
        # are PACKED into one int64 (a<<32 | b) so the downstream count
        # shuffles a single fixed-width key; ids ≥ 2^31 would switch to
        # the two-column key (assert guards the assumption).
        keys = []
        for s in np.unique(sz):
            mat = ids_all[sz == s].reshape(-1, s)
            ii, jj = np.triu_indices(int(s), 1)
            a = mat[:, ii].ravel()
            b = mat[:, jj].ravel()
            keys.append((a << np.int64(32)) | b)
        out = np.concatenate(keys)
        assert ids_all.size == 0 or ids_all.max() < 2**31
        return pa.table({"pair_key": pa.array(out, pa.int64())})

    return fn


def _unpack_pairs(batch: pa.Table, count_name: str) -> pa.Table:
    k = batch.column("pair_key").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_a": pa.array(k >> np.int64(32), pa.int64()),
            "doc_b": pa.array(k & np.int64(0xFFFFFFFF), pa.int64()),
            count_name: batch.column("count()").cast(pa.int64()),
        }
    )


def minhash_lsh_pairs(sf_dir: str) -> "ray.data.Dataset":
    """Candidate near-dup pairs: docs sharing ≥1 of 16 minhash bands.

    shingle→minhash (map_batches) → shuffle on a coarse hash of the
    (band, minhash) bucket → vectorized per-partition pair emission →
    groupby(pair) count = shared-band count. Only (doc_id, band,
    minhash) rows are shuffled — never text."""
    sig = _read_docs(sf_dir).map_batches(_signature_rows, batch_format="pyarrow")

    def add_part(batch: pa.Table) -> pa.Table:
        mh = batch.column("minhash").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((mh % N_COARSE_PARTS).astype(np.int64), pa.int64())
        )

    pairs = (
        sig.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_bucket_pairs_fn(["band", "minhash"], MAX_BUCKET),
                    batch_format="pyarrow")
        .groupby("pair_key")
        .count()
        .map_batches(lambda b: _unpack_pairs(b, "n_shared_bands"),
                     batch_format="pyarrow")
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


def _simhash_batch(texts: list[str]) -> list[str]:
    """Vectorized simhash for a batch: ±1 bit rows for the batch's
    UNIQUE tokens once, then per-doc segment sums (np.add.reduceat) —
    identical output to _simhash64 per doc."""
    toks_per_doc = [words_of(t or "") for t in texts]
    vocab = {t: None for toks in toks_per_doc for t in toks}
    if not vocab:
        return ["0" * 16] * len(texts)
    idx = {t: i for i, t in enumerate(vocab)}
    bitmat = np.stack([_token_pm_bits(t) for t in vocab])  # (V, 64)
    flat = np.fromiter(
        (idx[t] for toks in toks_per_doc for t in toks), dtype=np.int64
    )
    counts = np.array([len(toks) for toks in toks_per_doc], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    sums = np.zeros((len(texts), 64), dtype=np.int64)
    nz = counts > 0
    if nz.any():
        # starts[nz] is strictly increasing (zero-count docs excluded),
        # which reduceat requires for correct segment sums
        sums[nz] = np.add.reduceat(bitmat[flat], starts[nz], axis=0)
    powers = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    fps = np.where(sums > 0, powers, np.uint64(0)).sum(axis=1, dtype=np.uint64)
    return [format(int(f), "016x") for f in fps]


def simhash_fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, simhash as 16-char lowercase hex)."""

    def fn(batch: pa.Table) -> pa.Table:
        fps = _simhash_batch(batch.column("text").to_pylist())
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
    fp_ds = simhash_fingerprints(sf_dir).materialize()  # tiny: 8B+id per doc
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


def simhash_pairs_banded(
    sf_dir: str, max_hamming: int = SIMHASH_MAX_HAMMING
) -> "ray.data.Dataset":
    """Scale path for simhash near-dup: split the 64-bit fingerprint
    into max_hamming+1 bands; by pigeonhole, any pair within
    max_hamming differs in at most max_hamming bands, so it matches
    EXACTLY on ≥1 band → candidates = exact-match groupby per band
    (same machinery as MinHash LSH), then popcount-verify. Identical
    output to simhash_pairs (and the same SQL oracle) with no O(n²)
    comparison — the plan that survives 10^12 docs."""
    n_bands = max_hamming + 1
    band_bits = 64 // n_bands
    mask = (1 << band_bits) - 1

    fp_ds = simhash_fingerprints(sf_dir).materialize()
    fps = fp_ds.to_pandas()
    fp_map = dict(zip(fps["doc_id"], (int(s, 16) for s in fps["simhash"])))
    fp_ref = ray.put(fp_map)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_id, out_band, out_key = [], [], []
        for i, s in zip(ids, batch.column("simhash").to_pylist()):
            f = int(s, 16)
            for b in range(n_bands):
                out_id.append(i)
                out_band.append(b)
                out_key.append((f >> (b * band_bits)) & mask)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int64()),
                "key": pa.array(out_key, pa.int64()),
            }
        )

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((k % N_COARSE_PARTS).astype(np.int64), pa.int64())
        )

    def verify(batch: pa.Table) -> pa.Table:
        fm = ray.get(fp_ref)
        keys = batch.column("pair_key").to_numpy(zero_copy_only=False)
        a = keys >> np.int64(32)
        b = keys & np.int64(0xFFFFFFFF)
        ham = np.array(
            [bin(fm[int(x)] ^ fm[int(y)]).count("1") for x, y in zip(a, b)],
            dtype=np.int64,
        )
        keep = ham <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    return (
        fp_ds.map_batches(band_rows, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_bucket_pairs_fn(["band", "key"], 4096),
                    batch_format="pyarrow")
        .groupby("pair_key")
        .count()
        .map_batches(verify, batch_format="pyarrow")
    )


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

    # set sizes per doc: one (doc_id, n) row per doc from a shuffle-free
    # second pass over the pruned read (cheaper than a groupby sort)
    def _size_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        ns = [len(shingles_of(t or "", 3)) for t in batch.column("text").to_pylist()]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "n": pa.array(ns, pa.int64())}
        )

    sizes: dict[int, int] = {}
    for b in docs.map_batches(_size_rows, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        sizes.update(zip(b.column("doc_id").to_pylist(), b.column("n").to_pylist()))
    sizes_ref = ray.put(sizes)

    def add_part(batch: pa.Table) -> pa.Table:
        s = batch.column("shingle").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((s % N_COARSE_PARTS).astype(np.int64), pa.int64())
        )

    inter = (
        sh.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_bucket_pairs_fn(["shingle"], MAX_SHINGLE_DOCS),
                    batch_format="pyarrow")
        .groupby("pair_key")
        .count()
        .map_batches(lambda b: _unpack_pairs(b, "intersection"),
                     batch_format="pyarrow")
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


def embedding_neardup_lsh(
    sf_dir: str, threshold: float = EMBED_COS_THRESHOLD
) -> "ray.data.Dataset":
    """Scale path for embedding near-dup: candidates restricted to the
    same random-hyperplane LSH bucket (similarity.lsh_buckets sign
    bits), then exact cosine ≥ threshold. At 10^12 rows the bucket
    groupby replaces the all-pairs matmul — each bucket holds ~n/2^k
    rows; recall < 1 is the documented tradeoff (mitigated by
    multi-probe in practice)."""
    from .similarity import ANCHOR_LO, N_ANCHORS, _load_rows, lsh_buckets

    aids, amat = _load_rows(sf_dir, ANCHOR_LO, ANCHOR_LO + N_ANCHORS)
    ref = ray.put(amat)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def with_bucket(batch: pa.Table) -> pa.Table:
        anchors = ray.get(ref)
        ids, mat = _normalized_matrix(batch)
        bits = (mat @ anchors.T) > 0
        buckets = ["".join("1" if b else "0" for b in row) for row in bits]
        return batch.append_column("bucket", pa.array(buckets, pa.string()))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids, mat = _normalized_matrix(group)
        if len(ids) < 2:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
            )
        sims = mat @ mat.T
        ii, jj = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
        return pa.table(
            {
                "vec_a": pa.array(ids[ii], pa.int64()),
                "vec_b": pa.array(ids[jj], pa.int64()),
            }
        )

    return (
        ds.map_batches(with_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )


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
