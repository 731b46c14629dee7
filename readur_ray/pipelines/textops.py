"""Text-analysis query pipelines over the `documents` table.

Each function takes ``sf_dir`` (a directory of parquet tables) and
returns a lazy ``ray.data.Dataset``. All are single-pass vectorized
``map_batches`` stages over a column-pruned read — no shuffle, no
driver-side loops — so they stream at any scale.

The matching DuckDB oracle SQL lives in ``__ray_entry__.oracle_sql``;
every kernel here uses RE2 regexes / md5 / sha256 / integer arithmetic
only, so the SQL reproduces each value bit-for-bit.

Reference analogs: M9 text metadata
(/root/reference/src/metadata_extraction.rs:139-178), M10 plain-text
extraction (/root/reference/src/ocr/enhanced.rs:1441-1480), M17 word
count (enhanced.rs:1487-1558), M18 quality gate (enhanced.rs:1562-1597).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.textstats import (
    fingerprint_batch,
    predict_lang,
    quality_scores,
    stopword_hits,
    token_stats,
    words_of,
)

ALNUM_PATTERN = r"[\pL\pN]"  # RE2 unicode classes — identical in DuckDB


def read_documents(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def plaintext_extract(sf_dir: str) -> "ray.data.Dataset":
    """M10 + M17 over documents.text: trimmed text, word/char/byte
    counts, sha256 content hash (the file_hash analog)."""

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        extracted = pc.utf8_trim_whitespace(text)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "extracted": extracted,
                "word_count": pc.count_substring_regex(
                    extracted, pattern=r"\S+"
                ).cast(pa.int64()),
                "char_count": pc.utf8_length(extracted).cast(pa.int64()),
                "byte_len": pc.binary_length(extracted).cast(pa.int64()),
                "text_sha256": pa.array(
                    [hashlib.sha256(s.encode()).hexdigest()
                     for s in extracted.to_pylist()],
                    pa.string(),
                ),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def extract_status(sf_dir: str) -> "ray.data.Dataset":
    """The text-branch quality gate (M18) as integer arithmetic:
    fail iff empty, zero words, or alnum_chars*10 < bytes*3 (<30%)."""

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.utf8_trim_whitespace(
            pc.fill_null(batch.column("text").combine_chunks(), "")
        )
        wc = pc.count_substring_regex(text, pattern=r"\S+").cast(pa.int64())
        byte_len = pc.binary_length(text).cast(pa.int64())
        alnum = pc.count_substring_regex(text, pattern=ALNUM_PATTERN).cast(pa.int64())
        failed = pc.or_(
            pc.or_(pc.equal(byte_len, 0), pc.equal(wc, 0)),
            pc.less(pc.multiply(alnum, 10), pc.multiply(byte_len, 3)),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "status": pc.if_else(failed, "failed", "completed"),
                "failure_reason": pc.if_else(failed, "low_ocr_confidence", ""),
                "word_count": pc.if_else(failed, pa.scalar(0, pa.int64()), wc),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def doc_metadata(sf_dir: str) -> "ray.data.Dataset":
    """M9 text metadata: char/word/line counts + token stats."""

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        ts = token_stats(text)
        newlines = pc.count_substring(text, pattern="\n").cast(pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "char_count": ts["chars"],
                "word_count": ts["ws_tokens"],
                "bpe_tokens": ts["bpe_tokens"],
                "line_count": pc.add(newlines, 1).cast(pa.int64()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def lang_id(sf_dir: str) -> "ray.data.Dataset":
    """Language-ID by per-language stopword hit counts (argmax with
    fixed priority; zero hits → 'unknown')."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text").combine_chunks()
        hits = stopword_hits(text)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": predict_lang(hits),
                **hits,
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def quality_score(sf_dir: str) -> "ray.data.Dataset":
    """Quality scoring: integer length/punct/digit/stopword components
    plus the 0-4 composite score."""

    def fn(batch: pa.Table) -> pa.Table:
        cols = quality_scores(batch.column("text").combine_chunks())
        return pa.table({"doc_id": batch.column("doc_id"), **cols})

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """Document fingerprinting: md5 over the normalized word sequence +
    min-shingle-hash (winnowing floor) + shingle count."""

    def fn(batch: pa.Table) -> pa.Table:
        cols = fingerprint_batch(batch.column("text").combine_chunks())
        return pa.table({"doc_id": batch.column("doc_id"), **cols})

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def html_extract(sf_dir: str) -> "ray.data.Dataset":
    """North-star HTML branch as a standalone query: wrap each doc's
    text into a deterministic boilerplate page (header/nav/aside/footer
    link blocks around one main paragraph), strip it with the DOM
    text-density heuristic, and emit the recovered main content —
    the recovery property (main == trim(text) for texts ≥ the block
    threshold) is the SQL oracle."""
    from ..functions.html import extract_main_content, wrap_boilerplate

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        mains = [
            extract_main_content(wrap_boilerplate(t or "", str(i)))
            for i, t in zip(ids, texts)
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "main_text": pa.array(mains, pa.string()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


TFIDF_TOP_K = 3
TFIDF_SCALE = 1_000_000
_N_TF_PARTS = 64


def tfidf_top_terms(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc top-K terms by an integer tf-idf proxy
    (score = tf × 10^6 // df, ties → term asc) — the inverted-index +
    document-frequency join + per-group top-k composite a retrieval /
    data-curation pipeline needs (the reference's tsvector ranking,
    /root/reference/src/db/documents/search.rs:147-151, done batch).

    Plan (two coarse-hash shuffles, all int64/string columns):
      1. per-batch term counts → (doc_id, term, tf) rows partitioned by
         crc32(term) — a TERM's rows are co-located, so document
         frequency is a per-partition vectorized transform (no driver
         state, no broadcast vocab);
      2. re-partition by doc_id → per-partition vectorized top-K.
    Payload text never shuffles; the tf rows are the index."""
    import zlib

    import numpy as np

    ds = read_documents(sf_dir, ["doc_id", "text"])

    def tf_rows(batch: pa.Table) -> pa.Table:
        out_doc, out_term, out_tf = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            ws = words_of(text or "")
            if not ws:
                continue
            terms, counts = np.unique(np.array(ws, dtype=object), return_counts=True)
            out_doc.append(np.full(len(terms), doc_id, dtype=np.int64))
            out_term.append(terms)
            out_tf.append(counts.astype(np.int64))
        if not out_doc:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "term": pa.array([], pa.string()),
                 "tf": pa.array([], pa.int64()),
                 "part": pa.array([], pa.int64())}
            )
        terms = np.concatenate(out_term)
        part = np.array([zlib.crc32(t.encode()) % _N_TF_PARTS for t in terms],
                        dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(np.concatenate(out_tf), pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    def score_part(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["doc_id", "term", "tf"]).to_pandas()
        dfreq = df.groupby("term", sort=False)["doc_id"].transform("size").to_numpy()
        df["df"] = dfreq.astype(np.int64)
        df["score"] = (df["tf"].to_numpy() * TFIDF_SCALE // dfreq).astype(np.int64)
        # prune BEFORE the doc shuffle: a doc's global top-K is a
        # subset of the union of its per-partition top-Ks, so keeping
        # K rows per (doc, partition) is lossless and cuts the second
        # shuffle from |vocab explosion| to ≤ K rows per doc per part
        df = df.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True],
            ignore_index=True,
        )
        df = df[df.groupby("doc_id", sort=False).cumcount() < TFIDF_TOP_K]
        docs = df["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "term": pa.array(df["term"], pa.string()),
                "tf": pa.array(df["tf"].to_numpy(), pa.int64()),
                "df": pa.array(df["df"].to_numpy(), pa.int64()),
                "score": pa.array(df["score"].to_numpy(), pa.int64()),
                "part2": pa.array(docs % _N_TF_PARTS, pa.int64()),
            }
        )

    def topk_part(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["doc_id", "term", "tf", "df", "score"]).to_pandas()
        df = df.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True],
            ignore_index=True,
        )
        rnk = df.groupby("doc_id", sort=False).cumcount().to_numpy() + 1
        keep = rnk <= TFIDF_TOP_K
        out = df[keep]
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
                "term": pa.array(out["term"], pa.string()),
                "tf": pa.array(out["tf"].to_numpy(), pa.int64()),
                "df": pa.array(out["df"].to_numpy(), pa.int64()),
                "score": pa.array(out["score"].to_numpy(), pa.int64()),
                "rnk": pa.array(rnk[keep].astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(tf_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(score_part, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(topk_part, batch_format="pyarrow")
    )


EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUM_PATTERN = r"[0-9]{7,}"


def normalize_text(sf_dir: str) -> "ray.data.Dataset":
    """Unicode NFC normalization + whitespace collapse — the first
    stage of any text-training-data cleanup. NFC via unicodedata
    (pyarrow's utf8_normalize leaves combining sequences uncomposed in
    this build — verified — while unicodedata matches DuckDB's
    nfc_normalize exactly); whitespace collapse is a vectorized RE2
    pass shared with the oracle."""
    import unicodedata

    ds = read_documents(sf_dir, ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        nfc = [unicodedata.normalize("NFC", t or "") for t in texts]
        arr = pa.array(nfc, pa.string())
        collapsed = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
        # trim ASCII space only — matches SQL trim(); RE2 \s is ASCII so
        # the collapse leaves a single leading/trailing space at most
        stripped = pc.utf8_trim(collapsed, characters=" ")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "norm_text": stripped,
                "changed": pc.not_equal(stripped, pc.fill_null(batch.column("text"), "")),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def redact_pii(sf_dir: str) -> "ray.data.Dataset":
    """PII scrubbing: emails → [EMAIL], digit runs ≥ 7 → [NUM] —
    vectorized RE2 replacements (identical engine and patterns in the
    DuckDB oracle), plus per-doc redaction counts. The pattern set is
    deliberately small/deterministic: the contract is exact-parity
    scrubbing plumbing, not NER coverage."""
    ds = read_documents(sf_dir, ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        n_email = pc.count_substring_regex(text, pattern=EMAIL_PATTERN).cast(pa.int64())
        step1 = pc.replace_substring_regex(
            text, pattern=EMAIL_PATTERN, replacement="[EMAIL]"
        )
        n_num = pc.count_substring_regex(step1, pattern=LONG_NUM_PATTERN).cast(pa.int64())
        out = pc.replace_substring_regex(
            step1, pattern=LONG_NUM_PATTERN, replacement="[NUM]"
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "redacted": out,
                "n_emails": n_email,
                "n_numbers": n_num,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


EMBED_DIM = 16  # feature-hashing dimensionality (the scale dial)


class HashEmbedder:
    """Document → sparse embedding GENERATION via the signed hashing
    trick (Weinberger et al. 2009, arXiv:0902.2206 — public): token t
    contributes sign(md5(t)) to dimension md5(t) % dim. Emitted LONG
    (doc_id, bucket, value) with exact-integer values, so the DuckDB
    oracle reproduces the whole featurization bit-for-bit.

    Stateful actor-pool stage: the token → (bucket, sign) map is a
    per-actor cache (a Zipfian corpus re-hashes the same head tokens
    ~every batch; the cache turns md5 calls into dict hits). At 10^12
    docs this is a single embarrassingly-parallel pass — no shuffle —
    and dim is the only scale knob (the paper's setting: dim 2^18+ for
    real models; 16 here keeps the oracle's cross join tiny)."""

    def __init__(self, dim: int = EMBED_DIM):
        import re as _re

        from ..functions.textstats import BPE_TOKEN_PATTERN

        self.dim = dim
        self._re = _re.compile(BPE_TOKEN_PATTERN)
        self._cache: dict[str, tuple[int, int]] = {}

    def _tok(self, t: str) -> tuple[int, int]:
        r = self._cache.get(t)
        if r is None:
            h = hashlib.md5(t.encode()).hexdigest()
            r = (int(h[:8], 16) % self.dim, 1 if int(h[8], 16) % 2 == 0 else -1)
            if len(self._cache) < 1_000_000:  # bound actor heap
                self._cache[t] = r
        return r

    def __call__(self, batch: pa.Table) -> pa.Table:
        take_idx: list[int] = []
        out_b: list[int] = []
        out_v: list[int] = []
        for i, text in enumerate(batch.column("text").to_pylist()):
            acc: dict[int, int] = {}
            for t in self._re.findall(text or ""):
                b, s = self._tok(t)
                acc[b] = acc.get(b, 0) + s
            for b in sorted(acc):
                take_idx.append(i)
                out_b.append(b)
                out_v.append(acc[b])
        return pa.table(
            {
                # doc_id keeps the source column's type (int or string)
                "doc_id": batch.column("doc_id").take(pa.array(take_idx)),
                "bucket": pa.array(out_b, pa.int64()),
                "value": pa.array(out_v, pa.int64()),
            }
        )


def embed_documents(sf_dir: str, dim: int = EMBED_DIM) -> "ray.data.Dataset":
    """The documents → embeddings production stage (what populated an
    `embeddings` table in the first place), as an actor-pool
    map_batches over (doc_id, text)."""
    from ..stages.tuning import tuned_executor

    # the read captures the tuned context COPY → scoped to this DAG
    with tuned_executor():
        ds = read_documents(sf_dir, ["doc_id", "text"])
        return ds.map_batches(
            HashEmbedder, fn_constructor_args=(dim,), batch_format="pyarrow",
            concurrency=(2, 8), num_cpus=0.5,
        )


CHUNK_TOKENS = 64   # tokens per chunk
CHUNK_STRIDE = 48   # stride (CHUNK_TOKENS - stride = 16-token overlap)


def chunk_documents(
    sf_dir: str, chunk: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> "ray.data.Dataset":
    """Overlapping token-window chunking (the RAG / context-window prep
    staple): split each doc's BPE-ish token sequence into windows of
    ``chunk`` tokens every ``stride`` tokens; the final window is
    short. Token-space chunking on purpose — chunk_text re-joins with
    single spaces, identically to the SQL oracle's
    ``array_to_string(list_slice(...), ' ')``, so the whole operator
    is bit-reproducible.

    Scale shape: one embarrassingly-parallel pass, no shuffle; output
    is ~len/stride rows per doc. Zero-token docs emit no chunks."""
    import re as _re

    from ..functions.textstats import BPE_TOKEN_PATTERN

    rex = _re.compile(BPE_TOKEN_PATTERN)

    def fn(batch: pa.Table) -> pa.Table:
        take_idx: list[int] = []
        c_id: list[int] = []
        c_start: list[int] = []
        c_len: list[int] = []
        c_text: list[str] = []
        for i, text in enumerate(batch.column("text").to_pylist()):
            toks = rex.findall(text or "")
            n = len(toks)
            for k, s in enumerate(range(0, n, stride)):
                e = min(s + chunk, n)
                take_idx.append(i)
                c_id.append(k)
                c_start.append(s)
                c_len.append(e - s)
                c_text.append(" ".join(toks[s:e]))
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(pa.array(take_idx)),
                "chunk_id": pa.array(c_id, pa.int64()),
                "start_tok": pa.array(c_start, pa.int64()),
                "n_tokens": pa.array(c_len, pa.int64()),
                "chunk_text": pa.array(c_text, pa.string()),
            }
        )

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def token_diversity(sf_dir: str) -> "ray.data.Dataset":
    """Exact lexical-diversity sufficient statistics per source — the
    diversity-measurement class (Simpson / Gini-Simpson index,
    type-token ratio): per source, total tokens N, distinct tokens D,
    and Σ n_t² over per-token counts, from which Simpson diversity
    1 − Σ n²/N² (and TTR D/N) follow in exact integer arithmetic —
    no logs, no floats, unlike Shannon entropy (the transcendental
    sibling this surrogate replaces for oracle-exactness; Simpson is
    the standard diversity index with the same ordering behavior on
    skewed vocabularies). The curation signal: a source whose Σ n²
    approaches N² is template spam even when its quality ratios pass.

    Scale shape: per-batch (source, token) partial counts (pyarrow
    group_by combiner — bounds the shuffle at one row per distinct
    pair per batch) → ONE coarse shuffle on crc32(source|token) so
    every copy of a pair lands together (a hot token spreads by
    source, a hot source by token — neither melts a partition) →
    per-partition exact per-pair totals fold immediately into
    per-source (N, D, Σn²) partials → tiny groupby(source) Sum.
    Token strings cross the wire once, pre-reduced."""
    import re
    import zlib

    import numpy as np

    from ..stages.shuffle import N_COARSE_PARTS
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    word_re = re.compile(r"[a-z0-9]+")

    def pair_counts(batch: pa.Table) -> pa.Table:
        srcs, toks, cnts = [], [], []
        for s, text in zip(
            batch.column("source").to_pylist(), batch.column("text").to_pylist()
        ):
            from collections import Counter

            c = Counter(word_re.findall((text or "").lower()))
            srcs.extend([s] * len(c))
            toks.extend(c.keys())
            cnts.extend(c.values())
        # batch-local combine across docs of the same source
        t = pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "token": pa.array(toks, pa.string()),
                "n": pa.array(cnts, pa.int64()),
            }
        ).group_by(["source", "token"]).aggregate([("n", "sum")])
        part = pa.array(
            np.array(
                [
                    zlib.crc32(f"{s}|{w}".encode()) % N_COARSE_PARTS
                    for s, w in zip(
                        t.column("source").to_pylist(),
                        t.column("token").to_pylist(),
                    )
                ],
                dtype=np.int64,
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "source": t.column("source"),
                "token": t.column("token"),
                "n": t.column("n_sum").cast(pa.int64()),
                "part": part,
            }
        )

    def per_part(part_tbl: pa.Table) -> pa.Table:
        # exact per-(source, token) totals, folded straight into
        # per-source partials — token strings never leave this task
        tot = part_tbl.select(["source", "token", "n"]).group_by(
            ["source", "token"]
        ).aggregate([("n", "sum")])
        n = tot.column("n_sum").cast(pa.int64())
        sq = pc.multiply_checked(n, n)
        agg = pa.table(
            {
                "source": tot.column("source"),
                "n_tok": n,
                "one": pa.array(
                    np.ones(tot.num_rows, dtype=np.int64), pa.int64()
                ),
                "sq": sq,
            }
        ).group_by("source").aggregate(
            [("n_tok", "sum"), ("one", "sum"), ("sq", "sum")]
        )
        return pa.table(
            {
                "source": agg.column("source"),
                "nt_p": agg.column("n_tok_sum").cast(pa.int64()),
                "nd_p": agg.column("one_sum").cast(pa.int64()),
                "sq_p": agg.column("sq_sum").cast(pa.int64()),
            }
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch.column("source"),
                "n_tokens": batch.column("nt"),
                "n_distinct": batch.column("nd"),
                "sum_sq": batch.column("sq"),
            }
        )

    return (
        ds.map_batches(pair_counts, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("nt_p", alias_name="nt"),
            Sum("nd_p", alias_name="nd"),
            Sum("sq_p", alias_name="sq"),
        )
        .map_batches(rename, batch_format="pyarrow")
    )


POSTING_MIN_DF = 100  # report tokens appearing in >= this many docs


def posting_sizes(sf_dir: str) -> "ray.data.Dataset":
    """Inverted-index compression planning — for every token with
    document frequency ≥ POSTING_MIN_DF, the exact byte cost of its
    posting list stored raw (8 B per doc id) vs delta-encoded LEB128
    varints (1 B per 7 significant bits of each gap, first id kept
    absolute): the storage-engineering accounting a search/index tier
    runs before choosing codecs — sizes are deterministic integers,
    so the DuckDB oracle matches bit-for-bit via a base-128
    length ladder.

    Scale shape: per-batch DISTINCT (token, doc_id) pairs (the
    combiner) → ONE coarse token-keyed shuffle → per-partition each
    token's sorted doc ids yield gaps and varint lengths in one
    vectorized pass (log2 via bit_length on int64 gaps); only tokens
    clearing the df floor are emitted, bounding output at the
    heavy-tail vocabulary. Output:
    (token, n_docs, raw_bytes, varint_bytes)."""
    import re
    import zlib

    import numpy as np

    from ..stages.shuffle import N_COARSE_PARTS

    word_re = re.compile(r"[a-z0-9]+")

    def pairs(batch: pa.Table) -> pa.Table:
        out_t, out_d = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for t in set(word_re.findall((text or "").lower())):
                out_t.append(t)
                out_d.append(doc_id)
        part = np.array(
            [zlib.crc32(t.encode()) % N_COARSE_PARTS for t in out_t],
            dtype=np.int64,
        )
        return pa.table(
            {
                "token": pa.array(out_t, pa.string()),
                "doc": pa.array(out_d, pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    def sizes(part_tbl: pa.Table) -> pa.Table:
        toks = np.asarray(part_tbl.column("token").to_pylist(), dtype=object)
        docs = part_tbl.column("doc").to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, toks))
        toks, docs = toks[order], docs[order]
        flags = np.empty(len(toks), dtype=bool)
        if len(toks):
            flags[0] = True
            flags[1:] = toks[1:] != toks[:-1]
        starts = np.flatnonzero(flags)
        ends = np.concatenate((starts[1:], [len(toks)]))
        # per-element gap (first element of each run keeps absolute id)
        gaps = np.empty(len(docs), dtype=np.int64)
        if len(docs):
            gaps[1:] = docs[1:] - docs[:-1]
            gaps[starts] = docs[starts]
        # LEB128 length: 1 byte per started 7-bit group; gap 0 -> 1 B.
        # bit_length via log2 — exact for ids < 2^53 (powers of two hit
        # exact float64 values; everything else lands strictly between
        # integers), the documented id-width precondition.
        g = np.maximum(gaps, 1)
        bl = np.floor(np.log2(g.astype(np.float64))).astype(np.int64) + 1
        vbytes = -(-bl // 7)
        vbytes[gaps == 0] = 1
        out_t, out_n, out_raw, out_v = [], [], [], []
        for s, e in zip(starts, ends):
            n = int(e - s)
            if n >= POSTING_MIN_DF:
                out_t.append(toks[s])
                out_n.append(n)
                out_raw.append(8 * n)
                out_v.append(int(vbytes[s:e].sum()))
        return pa.table(
            {
                "token": pa.array(out_t, pa.string()),
                "n_docs": pa.array(out_n, pa.int64()),
                "raw_bytes": pa.array(out_raw, pa.int64()),
                "varint_bytes": pa.array(out_v, pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sizes, batch_format="pyarrow")
    )


def kappa_agreement(sf_dir: str) -> "ray.data.Dataset":
    """Classifier-agreement audit — Cohen's kappa sufficient
    statistics for the lang_id heuristic against the corpus's
    ground-truth ``lang`` column, in exact integers: one row with n,
    n_agree (observed agreement), pe_num = Σ_c row_c·col_c (the
    chance-agreement numerator from the confusion-matrix marginals),
    and the assembled kappa_num = n·n_agree − pe_num /
    kappa_den = n² − pe_num, so κ = kappa_num / kappa_den is exact
    rational arithmetic — the model-vs-truth readout that tells a
    curation pipeline whether its cheap classifier can be trusted to
    gate data (accuracy alone flatters under class imbalance; kappa
    discounts it).

    Scale shape: ONE streaming pass — each batch predicts in-batch
    (the lang_id kernel, no second scan) and folds to
    (pred, true) confusion cells (≤ L² rows); a tiny Sum exchange
    and a single-row finish compute the marginal products. No
    data-row shuffle; the driver never sees per-doc rows."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import predict_lang, stopword_hits

    ds = read_documents(sf_dir, ["text", "lang"])

    def cells(batch: pa.Table) -> pa.Table:
        text = batch.column("text").combine_chunks()
        pred = predict_lang(stopword_hits(text)).to_pylist()
        true = batch.column("lang").to_pylist()
        g = (
            pd.DataFrame({"pred": pred, "true": true})
            .groupby(["pred", "true"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {
                "pred": pa.array(g["pred"], pa.string()),
                "true": pa.array(g["true"], pa.string()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = int(df["c"].sum())
        n_agree = int(df.loc[df["pred"] == df["true"], "c"].sum())
        rows = df.groupby("pred")["c"].sum()
        cols = df.groupby("true")["c"].sum()
        pe_num = int(
            sum(int(rows[k]) * int(cols[k]) for k in rows.index if k in cols.index)
        )
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "n_agree": pa.array([n_agree], pa.int64()),
                "pe_num": pa.array([pe_num], pa.int64()),
                "kappa_num": pa.array([n * n_agree - pe_num], pa.int64()),
                "kappa_den": pa.array([n * n - pe_num], pa.int64()),
            }
        )

    return (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["pred", "true"])
        .aggregate(_Sum("c", alias_name="c"))
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
    )


def vocab_overlap(sf_dir: str) -> "ray.data.Dataset":
    """Pairwise source-vocabulary overlap — for every source pair the
    exact intersection size |V_a ∩ V_b| plus both vocabulary sizes,
    so Jaccard = inter / (n_a + n_b − inter) is exact integer
    arithmetic: the corpus-comparison readout (two scrapes of the
    same site overlap near 1; a source whose vocabulary drifts from
    its siblings signals a domain shift). The unbounded-domain
    generalization of audience_overlap's pairwise intersection — a
    term vocabulary does not fit a bitmask rollup.

    Scale shape: rows fold to distinct (source, term) pairs per batch
    and shuffle ONCE on crc32(term), so a term's sources co-locate:
    per partition one sorted self-merge emits (source_a, source_b)
    co-occurrence partials (≤ |sources|² per term) AND per-source
    distinct-term marginal partials ((source, term) lives in exactly
    one partition, so partition counts sum globally); a tiny pair-
    keyed Sum plus the broadcast |sources|-entry marginal map finish.
    Pairs sharing zero terms emit nothing on either side."""
    import zlib

    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import words_of
    from ..stages.shuffle import N_COARSE_PARTS

    ds = read_documents(sf_dir, ["source", "text"])

    def st_rows(batch: pa.Table) -> pa.Table:
        seen: set[tuple[str, str]] = set()
        for src, text in zip(
            batch.column("source").to_pylist(), batch.column("text").to_pylist()
        ):
            for t in set(words_of(text or "")):
                seen.add((src, t))
        srcs = [s for s, _ in seen]
        terms = [t for _, t in seen]
        part = np.array(
            [zlib.crc32(t.encode()) for t in terms], dtype=np.int64
        ) % N_COARSE_PARTS
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "term": pa.array(terms, pa.string()),
                "part": pa.array(part, pa.int64()),
            }
        )

    def pair_partials(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["source", "term"]).to_pandas().drop_duplicates()
        m = df.merge(df, on="term")
        m = m[m["source_x"] < m["source_y"]]
        g = (
            m.groupby(["source_x", "source_y"], sort=False)
            .size()
            .reset_index(name="inter")
        )
        marg = df.groupby("source", sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "source_a": pa.array(
                    list(g["source_x"]) + list(marg["source"]), pa.string()
                ),
                "source_b": pa.array(
                    list(g["source_y"]) + [""] * len(marg), pa.string()
                ),
                "c": pa.array(
                    np.concatenate(
                        [
                            g["inter"].to_numpy().astype(np.int64),
                            marg["n"].to_numpy().astype(np.int64),
                        ]
                    )
                    if len(g) or len(marg)
                    else np.array([], np.int64),
                    pa.int64(),
                ),
            }
        )

    cells = (
        ds.map_batches(st_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_partials, batch_format="pyarrow")
        .groupby(["source_a", "source_b"])
        .aggregate(_Sum("c", alias_name="c"))
        .materialize()
    )

    # marginal lane (source_b == "") → broadcast |sources| ints
    marg_map: dict[str, int] = {}
    for b in cells.iter_batches(batch_format="pyarrow"):
        for a, bb, c in zip(
            b.column("source_a").to_pylist(),
            b.column("source_b").to_pylist(),
            b.column("c").to_pylist(),
        ):
            if bb == "":
                marg_map[a] = marg_map.get(a, 0) + c
    marg_ref = ray.put(marg_map)

    def finish(batch: pa.Table) -> pa.Table:
        mm = ray.get(marg_ref)
        a = batch.column("source_a").to_pylist()
        bb = batch.column("source_b").to_pylist()
        c = batch.column("c").to_numpy(zero_copy_only=False)
        keep = np.array([x != "" for x in bb], dtype=bool)
        a = [x for x, k in zip(a, keep) if k]
        bb = [x for x, k in zip(bb, keep) if k]
        c = c[keep]
        return pa.table(
            {
                "source_a": pa.array(a, pa.string()),
                "source_b": pa.array(bb, pa.string()),
                "inter": pa.array(c, pa.int64()),
                "n_a": pa.array([mm[x] for x in a], pa.int64()),
                "n_b": pa.array([mm[x] for x in bb], pa.int64()),
            }
        )

    return cells.map_batches(finish, batch_format="pyarrow")


def front_coding_audit(sf_dir: str) -> "ray.data.Dataset":
    """Front-coding (prefix-compression) audit of the corpus term
    dictionary — per leading character, the exact bytes a sorted
    string dictionary saves by storing only each term's suffix after
    its longest common prefix with the PREVIOUS term: the
    dictionary-encoding planner for any sorted term index (parquet
    dictionary pages, FST/trie term indexes, posting dictionaries).
    Output: (first_char, n_terms, total_bytes, saved_bytes).

    Scale shape: per-batch distinct-term partials fold before ONE
    shuffle whose key is the term's FIRST BYTE — an ORDER-ALIGNED
    partition: terms in different buckets share a zero-length prefix
    by construction, so each bucket's sorted scan is globally exact
    with no halo exchange (the bucket boundary pair saves 0 bytes on
    both sides). Inside a bucket np.unique re-dedups and sorts once,
    and the consecutive-pair LCP is fully vectorized: terms become a
    zero-padded byte matrix, one shifted equality + a cumulative
    product along the char axis yields every pair's prefix length in
    two numpy passes (distinct terms always differ at or before the
    shorter one's end+1, so zero padding never overcounts)."""
    import numpy as np

    from ..functions.textstats import words_of

    ds = read_documents(sf_dir, ["text"])

    def term_partials(batch: pa.Table) -> pa.Table:
        seen: set[str] = set()
        for text in batch.column("text").to_pylist():
            seen.update(words_of(text or ""))
        terms = sorted(seen)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "b0": pa.array(
                    [ord(t[0]) for t in terms], pa.int64()
                ),
            }
        )

    def bucket_scan(group: pa.Table) -> pa.Table:
        terms = np.unique(
            np.asarray(group.column("term").to_pylist(), dtype=object)
        )
        c0 = chr(int(group.column("b0")[0].as_py()))
        blen = np.array([len(t) for t in terms], dtype=np.int64)
        if len(terms) > 1:
            width = int(blen.max())
            mat = (
                np.array(terms, dtype=f"S{width}")
                .view(np.uint8)
                .reshape(len(terms), width)
            )
            eq = mat[1:] == mat[:-1]
            lcp = np.cumprod(eq, axis=1).sum(axis=1).astype(np.int64)
            saved = int(lcp.sum())
        else:
            saved = 0
        return pa.table(
            {
                "first_char": pa.array([c0], pa.string()),
                "n_terms": pa.array([len(terms)], pa.int64()),
                "total_bytes": pa.array([int(blen.sum())], pa.int64()),
                "saved_bytes": pa.array([saved], pa.int64()),
            }
        )

    return (
        ds.map_batches(term_partials, batch_format="pyarrow")
        .groupby("b0")
        .map_groups(bucket_scan, batch_format="pyarrow")
    )


ROARING_CHUNK_BITS = 16
ROARING_ARRAY_MAX = 4096  # entries; above this a chunk flips to bitmap


def bitmap_index_audit(sf_dir: str) -> "ray.data.Dataset":
    """Roaring-bitmap container accounting for the doc-id posting
    bitmaps a faceted index keeps per (dimension, key) — lang and
    source here: per 2^16-doc-id chunk the container is an array
    (2 bytes/entry) below 4096 entries and a fixed 8 KiB bitmap at or
    above, exactly Roaring's layout rule. Reports, per (dim, key,
    kind), the exact container count, entries, and byte cost — the
    sizing dial for a bitmap index, and the structural complement of
    posting_sizes' varint-codec accounting (delta-varint postings vs
    chunked bitmap containers over the SAME posting sets).
    Tail-seated by design: source_facets' fold with a chunk key.

    Scale shape: doc_ids are unique, so per-batch (dim, key, chunk,
    n) partials → ONE groupby on (dim, key, chunk) completes each
    container → per-batch kind classification folds to the bounded
    (dim, key, kind) grid. Output: (dim, key, kind, n_containers,
    n_entries, bytes_est)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )

    def chunk_partials(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        chunk = ids >> ROARING_CHUNK_BITS
        frames = []
        for dim in ("lang", "source"):
            key = np.asarray(batch.column(dim).to_pylist(), dtype=object)
            frames.append(
                pd.DataFrame(
                    {"dim": dim, "key": key, "chunk": chunk, "n": 1}
                )
            )
        g = (
            pd.concat(frames)
            .groupby(["dim", "key", "chunk"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "dim": pa.array(g["dim"], pa.string()),
                "key": pa.array(g["key"], pa.string()),
                "chunk": pa.array(g["chunk"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def classify(batch: pa.Table) -> pa.Table:
        import pandas as pd

        n = batch.column("n_p").to_numpy(zero_copy_only=False).astype(np.int64)
        kind = np.where(n < ROARING_ARRAY_MAX, "array", "bitmap")
        bytes_est = np.where(n < ROARING_ARRAY_MAX, 2 * n, 8192).astype(
            np.int64
        )
        g = (
            pd.DataFrame(
                {
                    "dim": np.asarray(
                        batch.column("dim").to_pylist(), dtype=object
                    ),
                    "key": np.asarray(
                        batch.column("key").to_pylist(), dtype=object
                    ),
                    "kind": kind,
                    "c": 1,
                    "n": n,
                    "b": bytes_est,
                }
            )
            .groupby(["dim", "key", "kind"], sort=False)
            .agg(c=("c", "sum"), n=("n", "sum"), b=("b", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "dim": pa.array(g["dim"], pa.string()),
                "key": pa.array(g["key"], pa.string()),
                "kind": pa.array(g["kind"], pa.string()),
                "n_containers": pa.array(
                    g["c"].to_numpy().astype(np.int64), pa.int64()
                ),
                "n_entries": pa.array(
                    g["n"].to_numpy().astype(np.int64), pa.int64()
                ),
                "bytes_est": pa.array(
                    g["b"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(chunk_partials, batch_format="pyarrow")
        .groupby(["dim", "key", "chunk"])
        .aggregate(_Sum("n", alias_name="n_p"))
        .map_batches(classify, batch_format="pyarrow")
        .groupby(["dim", "key", "kind"])
        .aggregate(
            _Sum("n_containers", alias_name="n_containers"),
            _Sum("n_entries", alias_name="n_entries"),
            _Sum("bytes_est", alias_name="bytes_est"),
        )
    )


RAKE_STOPWORDS = (
    "a an and are as at be by for from in is it of on or that the this",
    "to was were with",
)
RAKE_STOPSET = frozenset((RAKE_STOPWORDS[0] + " " + RAKE_STOPWORDS[1]).split())
RAKE_TOP = 50


def rake_keywords(sf_dir: str) -> "ray.data.Dataset":
    """RAKE keyword extraction (Rose et al. 2010) over the corpus —
    candidate phrases are maximal stopword-free token runs, each word
    scores freq (occurrences) and degree (sum of its phrases'
    lengths, self included), and the RAKE score degree/freq is
    emitted as the exact integer degree·1000 // freq: words that
    live in long multi-word phrases rank above bare frequent words.
    Top-50 by (score, freq, word) — a total order, so the cut is
    deterministic. The oracle rebuilds the phrase segmentation with
    the gaps-and-islands trick (pos − row_number over non-stopword
    tokens). Tail-seated by design: top_ngrams' token fold with a
    phrase-run accumulator.

    Scale shape: ONE text pass folds per-batch (word, freq, degree)
    partials → one word-keyed groupby → score arithmetic per batch →
    the 50-row sort-limit is the only global step."""
    import re

    import numpy as np

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    tok_re = re.compile(r"[a-z0-9]+")

    def partials(batch: pa.Table) -> pa.Table:
        freq: dict[str, int] = {}
        deg: dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            ws = tok_re.findall((text or "").lower())
            phrase: list[str] = []
            for w in ws + [None]:
                if w is None or w in RAKE_STOPSET:
                    if phrase:
                        plen = len(phrase)
                        for p in phrase:
                            freq[p] = freq.get(p, 0) + 1
                            deg[p] = deg.get(p, 0) + plen
                        phrase = []
                else:
                    phrase.append(w)
        words = sorted(freq)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "freq": pa.array([freq[w] for w in words], pa.int64()),
                "degree": pa.array([deg[w] for w in words], pa.int64()),
            }
        )

    def score(batch: pa.Table) -> pa.Table:
        f = batch.column("freq_p").to_numpy(zero_copy_only=False)
        d = batch.column("degree_p").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "word": batch.column("word"),
                "freq": pa.array(f.astype(np.int64), pa.int64()),
                "degree": pa.array(d.astype(np.int64), pa.int64()),
                "score_x1000": pa.array(d * 1000 // f, pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("word")
        .aggregate(
            _Sum("freq", alias_name="freq_p"),
            _Sum("degree", alias_name="degree_p"),
        )
        .map_batches(score, batch_format="pyarrow")
        .sort(["score_x1000", "freq", "word"], descending=[True, True, False])
        .limit(RAKE_TOP)
    )


def langid_confusion(sf_dir: str) -> "ray.data.Dataset":
    """Confusion matrix of the lang_id heuristic against the labeled
    ``lang`` column — the eval that closes the language-ID loop
    (bloom_fpr_eval's role for Bloom, minhash_eval's for MinHash):
    per (true_lang, pred_lang) the exact document count; the diagonal
    over the total is the accuracy, the off-diagonal cells say WHICH
    languages the stopword heuristic confuses (the dial that decides
    whether to grow a language's stopword list). Tail-seated by
    design: lang_id's per-batch predictor with the grid fold of
    contingency_grid.

    Scale shape: ONE text pass — the predictor and the ground-truth
    label live in the same batch, so each batch folds straight to
    (true, pred, n) partials and the shuffle carries at most
    |langs|² rows per batch. Output: (true_lang, pred_lang, n)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import predict_lang, stopword_hits

    ds = read_documents(sf_dir, ["doc_id", "text", "lang"])

    def fold(batch: pa.Table) -> pa.Table:
        hits = stopword_hits(batch.column("text").combine_chunks())
        pred = np.asarray(predict_lang(hits).to_pylist(), dtype=object)
        true = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        g = (
            pd.DataFrame({"true_lang": true, "pred_lang": pred, "n": 1})
            .groupby(["true_lang", "pred_lang"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "true_lang": pa.array(g["true_lang"], pa.string()),
                "pred_lang": pa.array(g["pred_lang"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["true_lang", "pred_lang"])
        .aggregate(_Sum("n", alias_name="n"))
    )


FUNNEL_GATES = ("min_length", "stopword_density", "punct_ratio", "digit_ratio")


def filter_funnel(sf_dir: str) -> "ray.data.Dataset":
    """Curation-filter funnel — the observability panel every
    Gopher/C4-style quality pipeline needs before anyone trusts its
    survivor set: for each gate, how many documents fail it ALONE
    (its marginal bite) and how many survive the pipeline UP TO and
    including it in fixed order (its cumulative position). A gate
    whose fail-alone count is high but whose cumulative bite is ~0
    is redundant with an earlier gate; that's the decision this
    table drives. Gates are quality_score's four integer predicates
    verbatim. Tail-seated by design: quality_score's component fold
    emitting a 4-row grid instead of per-doc scores.

    Scale shape: ONE text pass; each batch folds its four flag
    vectors into (gate, n_fail_alone, n_survivors_cum, n_total)
    partials; the global stage sums a 4-row grid. Output: (stage,
    gate, n_fail_alone, n_survivors_cum, n_total)."""
    import numpy as np

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import quality_scores

    ds = read_documents(sf_dir, ["doc_id", "text"])

    def fold(batch: pa.Table) -> pa.Table:
        cols = quality_scores(batch.column("text").combine_chunks())
        tok = cols["ws_tokens"].to_numpy(zero_copy_only=False)
        ch = cols["chars"].to_numpy(zero_copy_only=False)
        en = cols["hits_en"].to_numpy(zero_copy_only=False)
        pu = cols["punct"].to_numpy(zero_copy_only=False)
        dg = cols["digits"].to_numpy(zero_copy_only=False)
        passes = np.stack(
            [
                tok >= 20,
                10 * en >= tok,
                5 * pu <= ch,
                10 * dg <= ch,
            ]
        )
        cum = np.cumprod(passes, axis=0).astype(bool)
        n = passes.shape[1]
        return pa.table(
            {
                "stage": pa.array(
                    np.arange(1, 5, dtype=np.int64), pa.int64()
                ),
                "gate": pa.array(list(FUNNEL_GATES), pa.string()),
                "n_fail_alone": pa.array(
                    (~passes).sum(axis=1).astype(np.int64), pa.int64()
                ),
                "n_survivors_cum": pa.array(
                    cum.sum(axis=1).astype(np.int64), pa.int64()
                ),
                "n_total": pa.array(np.full(4, n, np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["stage", "gate"])
        .aggregate(
            _Sum("n_fail_alone", alias_name="n_fail_alone"),
            _Sum("n_survivors_cum", alias_name="n_survivors_cum"),
            _Sum("n_total", alias_name="n_total"),
        )
    )


VOCAB_COVERAGE_KS = (100, 1_000, 10_000)


def vocab_coverage(sf_dir: str) -> "pa.Table":
    """Vocabulary coverage curve — what fraction of the corpus token
    stream the top-k vocabulary covers, at k ∈ {100, 1k, 10k}: the
    dial a tokenizer/vocab designer reads before fixing a vocab size
    (the knee of this curve IS the vocab-size decision), exact basis
    points under a total (count desc, token asc) order. Tail-seated
    by design: top_ngrams' token fold with a constant-k sort-limit
    and three prefix sums.

    Scale shape: per-batch token-count partials → ONE groupby(token)
    → a max(K)-row sort-limit (bounded by the constant, not the
    vocab) + a 2-int total aggregate; the prefix arithmetic touches
    only the 10k driver rows. Output: (k, top_total, corpus_total,
    coverage_bp)."""
    import re

    import numpy as np

    from ray.data.aggregate import Sum as _Sum

    ds = read_documents(sf_dir, ["text"])
    tok_re = re.compile(r"[a-z0-9]+")

    def partials(batch: pa.Table) -> pa.Table:
        freq: dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            for w in tok_re.findall((text or "").lower()):
                freq[w] = freq.get(w, 0) + 1
        words = sorted(freq)
        return pa.table(
            {
                "token": pa.array(words, pa.string()),
                "n": pa.array([freq[w] for w in words], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("token")
        .aggregate(_Sum("n", alias_name="n"))
        .materialize()
    )
    total = int(counts.aggregate(_Sum("n"))["sum(n)"])
    top = counts.sort(["n", "token"], descending=[True, False]).limit(
        max(VOCAB_COVERAGE_KS)
    ).take_all()
    ns = np.array([int(r["n"]) for r in top], np.int64)
    cum = np.cumsum(ns)
    rows = []
    for k in VOCAB_COVERAGE_KS:
        t = int(cum[min(k, len(cum)) - 1]) if len(cum) else 0
        rows.append((k, t, total, t * 10000 // total if total else 0))
    return pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "top_total": pa.array([r[1] for r in rows], pa.int64()),
            "corpus_total": pa.array([r[2] for r in rows], pa.int64()),
            "coverage_bp": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def readability_stats(sf_dir: str) -> "ray.data.Dataset":
    """Readability profile per language — the surface statistics
    behind Flesch-style scores, kept exact: per lang the document,
    word ([a-z0-9]+ on lowercased text), sentence ([.!?]+ runs) and
    character totals, with chars-per-word and words-per-sentence in
    exact milli-units (Σ·1000 // Σ — corpus-level ratios, not means
    of per-doc ratios, so they merge associatively). The dashboard
    row a curation team reads next to quality_score's gate counts.
    Tail-seated by design: token_diversity's per-lang fold with a
    sentence-run counter.

    Scale shape: ONE text pass folds per-batch per-lang partials →
    a ≤|langs|-row grid; ratios are grid-side floor divisions.
    Output: (lang, n_docs, words, sentences, chars,
    chars_per_word_x1000, words_per_sentence_x1000)."""
    import re

    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = read_documents(sf_dir, ["text", "lang"])
    word_re = re.compile(r"[a-z0-9]+")
    sent_re = re.compile(r"[.!?]+")

    def partials(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        texts = batch.column("text").to_pylist()
        words = np.array(
            [len(word_re.findall((t or "").lower())) for t in texts], np.int64
        )
        sents = np.array(
            [len(sent_re.findall(t or "")) for t in texts], np.int64
        )
        chars = np.array([len(t or "") for t in texts], np.int64)
        g = (
            pd.DataFrame(
                {"lang": lang, "n": 1, "w": words, "s": sents, "c": chars}
            )
            .groupby("lang", sort=False)
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
                "w": pa.array(g["w"].to_numpy().astype(np.int64), pa.int64()),
                "s": pa.array(g["s"].to_numpy().astype(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        w = batch.column("w_p").to_numpy(zero_copy_only=False)
        s = batch.column("s_p").to_numpy(zero_copy_only=False)
        c = batch.column("c_p").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lang": batch.column("lang"),
                "n_docs": batch.column("n_p"),
                "words": pa.array(w.astype(np.int64), pa.int64()),
                "sentences": pa.array(s.astype(np.int64), pa.int64()),
                "chars": pa.array(c.astype(np.int64), pa.int64()),
                "chars_per_word_x1000": pa.array(
                    c * 1000 // np.maximum(w, 1), pa.int64()
                ),
                "words_per_sentence_x1000": pa.array(
                    w * 1000 // np.maximum(s, 1), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            _Sum("n", alias_name="n_p"),
            _Sum("w", alias_name="w_p"),
            _Sum("s", alias_name="s_p"),
            _Sum("c", alias_name="c_p"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


LSC_BUCKETS = 256   # hashed char-trigram signature width
LSC_P = 31          # polynomial rolling-hash base (codepoints)


def lang_signature_cosine(sf_dir: str) -> "pa.Table":
    """Pairwise language similarity from hashed char-trigram
    profiles — per lang, counts of lower(text) char trigrams hashed
    to LSC_BUCKETS by the polynomial (c₀·31² + c₁·31 + c₂) mod 256
    over Unicode codepoints; per lang pair the exact signature dot
    product and cos² in 1e-8 units (dot²·10⁸ // (‖a‖²·‖b‖²) — the
    square dodges the irrational norm, and counts are non-negative
    so no sign is lost). The DATA-DRIVEN language affinity matrix
    (es↔fr close, en↔de mid) that langid_confusion (classifier
    errors) only shows where the classifier is wrong. Tail-seated by
    design: fingerprints' hashing discipline folded into
    source_shape_overlap's pairwise kernel.

    Scale shape: per-batch (lang, bucket) Counter partials — a doc
    contributes its trigram multiset via one vectorized codepoint
    convolution, no per-trigram Python hash — ONE bounded groupby
    (langs × 256), pairwise fold on the driver over that grid.
    Output: (lang_a, lang_b, dot, cos2_x1e8)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        texts = batch.column("text").to_pylist()
        acc: dict[str, np.ndarray] = {}
        for lang, text in zip(langs, texts):
            t = (text or "").lower()
            if len(t) < 3:
                continue
            cp = np.fromiter(map(ord, t), dtype=np.int64, count=len(t))
            h = (
                cp[:-2] * (LSC_P * LSC_P) + cp[1:-1] * LSC_P + cp[2:]
            ) % LSC_BUCKETS
            vec = acc.setdefault(lang, np.zeros(LSC_BUCKETS, np.int64))
            vec += np.bincount(h, minlength=LSC_BUCKETS)
        out_l, out_b, out_c = [], [], []
        for lang, vec in acc.items():
            nz = np.nonzero(vec)[0]
            out_l += [lang] * len(nz)
            out_b += nz.tolist()
            out_c += vec[nz].tolist()
        return pa.table(
            {
                "lang": pa.array(out_l, pa.string()),
                "bucket": pa.array(out_b, pa.int64()),
                "c": pa.array(out_c, pa.int64()),
            }
        )

    grid = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "bucket"])
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: langs × LSC_BUCKETS cells
    )
    sig: dict[str, np.ndarray] = {}
    for r in grid:
        sig.setdefault(r["lang"], np.zeros(LSC_BUCKETS, np.int64))[
            int(r["bucket"])
        ] = int(r["c"])
    langs = sorted(sig)
    out_a, out_b2, out_d, out_q = [], [], [], []
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            dot = int((sig[la] * sig[lb]).sum())
            na = int((sig[la] * sig[la]).sum())
            nb = int((sig[lb] * sig[lb]).sum())
            out_a.append(la)
            out_b2.append(lb)
            out_d.append(dot)
            out_q.append(dot * dot * 100_000_000 // (na * nb))
    return pa.table(
        {
            "lang_a": pa.array(out_a, pa.string()),
            "lang_b": pa.array(out_b2, pa.string()),
            "dot": pa.array(out_d, pa.int64()),
            "cos2_x1e8": pa.array(out_q, pa.int64()),
        }
    )


HEAPS_FRACS = (64, 16, 4, 1)  # prefix denominators: n/64, n/16, n/4, all


def heaps_curve(sf_dir: str) -> "pa.Table":
    """Heaps'-law vocabulary-growth curve — |V| and token count over
    deterministic doc-id-ordered corpus prefixes (first n/64, n/16,
    n/4, all docs): the dial that says whether a corpus is still
    discovering vocabulary (V ~ N^β, β ≈ 0.5) or has saturated —
    complementary to vocab_coverage (which fixes the vocab and asks
    how much stream it covers; this fixes the stream order and asks
    how fast the vocab grows). Output per checkpoint:
    (cutoff_docs, n_tokens_seen, vocab_size), all exact.

    Scale shape: vocabulary growth needs NO prefix re-scan — a token
    is in V(cutoff) iff its FIRST-occurrence doc id is below the
    cutoff, so one groupby(token) Min(doc_id) plus a per-batch
    ≤4-cell indicator fold answers every checkpoint at once; token
    counts per prefix are a second per-batch ≤4-cell fold over doc
    rows. Two bounded folds, one token exchange."""
    from ..functions.textstats import words_of

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    from ray.data.aggregate import Min as _Min, Sum as _Sum

    n_docs = int(docs.count())
    cutoffs = sorted({max(1, n_docs // f) for f in HEAPS_FRACS})
    cut_arr = np.array(cutoffs, np.int64)

    def token_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_t, out_d = [], []
        for did, tx in zip(ids, texts):
            ws = set(words_of(tx or ""))
            out_t.extend(ws)
            out_d.extend([did] * len(ws))
        return pa.table(
            {
                "token": pa.array(out_t, pa.string()),
                "doc": pa.array(out_d, pa.int64()),
            }
        )

    first = (
        docs.map_batches(token_rows, batch_format="pyarrow")
        .groupby("token")
        .aggregate(_Min("doc", alias_name="first_doc"))
    )

    def vocab_partial(batch: pa.Table) -> pa.Table:
        fd = batch.column("first_doc").to_numpy(zero_copy_only=False)
        # vocab(cutoff) counts first_doc < cutoff (doc ids are ranks
        # in the deterministic order)
        counts = np.searchsorted(np.sort(fd), cut_arr, side="left")
        return pa.table(
            {
                "ci": pa.array(np.arange(len(cut_arr)), pa.int64()),
                "v": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    vgrid = (
        first.map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("ci")
        .aggregate(_Sum("v", alias_name="v"))
        .take_all()  # bounded: <= 4 rows
    )
    vocab = {int(r["ci"]): int(r["v"]) for r in vgrid}

    def tok_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        ntok = np.array(
            [len(words_of(t or "")) for t in texts], np.int64
        )
        out = []
        for i, c in enumerate(cutoffs):
            out.append(int(ntok[ids < c].sum()))
        return pa.table(
            {
                "ci": pa.array(np.arange(len(cut_arr)), pa.int64()),
                "t": pa.array(out, pa.int64()),
            }
        )

    tgrid = (
        docs.map_batches(tok_partial, batch_format="pyarrow")
        .groupby("ci")
        .aggregate(_Sum("t", alias_name="t"))
        .take_all()  # bounded: <= 4 rows
    )
    toks = {int(r["ci"]): int(r["t"]) for r in tgrid}
    return pa.table(
        {
            "cutoff_docs": pa.array(cutoffs, pa.int64()),
            "n_tokens_seen": pa.array(
                [toks[i] for i in range(len(cutoffs))], pa.int64()
            ),
            "vocab_size": pa.array(
                [vocab[i] for i in range(len(cutoffs))], pa.int64()
            ),
        }
    )


TRIE_MAX_LEN = 16  # prefix depth cap for the trie audit


def vocab_trie_audit(sf_dir: str) -> "pd.DataFrame":
    """Exact trie/FST sizing of the corpus vocabulary — the
    shared-prefix audit that prices a prefix-compressed term
    dictionary (FST term index, radix-tree router): over the distinct
    token set (tokens truncated to TRIE_MAX_LEN chars), the number of
    trie NODES is exactly the number of distinct prefixes, and
    saved_chars = total_chars − trie_nodes is the exact character
    count prefix sharing removes. Complements front_coding_audit
    (which prices the SORTED-adjacent sharing; the trie shares across
    ALL tokens). Output one row: (n_tokens, total_chars, trie_nodes,
    saved_chars).

    Scale shape: per-batch distinct-token partials → ONE
    groupby(token) makes the vocabulary (materialized once — the
    vocab, not the corpus); character totals fold per batch; prefix
    rows (≤ TRIE_MAX_LEN per token) flow through ONE
    groupby(prefix) distinct fold whose row count IS the node count.
    Two token-keyed exchanges, strings never longer than the cap."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import words_of

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def tok_rows(batch: pa.Table) -> pa.Table:
        toks = set()
        for t in batch.column("text").to_pylist():
            toks.update(words_of(t or ""))
        return pa.table({"token": pa.array(sorted(toks), pa.string())})

    vocab = (
        docs.map_batches(tok_rows, batch_format="pyarrow")
        .groupby("token")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )
    n_tokens = vocab.count()

    def char_partial(batch: pa.Table) -> pa.Table:
        toks = batch.column("token").to_pylist()
        return pa.table(
            {
                "chars": pa.array(
                    [sum(len(t[:TRIE_MAX_LEN]) for t in toks)], pa.int64()
                )
            }
        )

    total_chars = int(
        vocab.map_batches(char_partial, batch_format="pyarrow").aggregate(
            _Sum("chars", alias_name="chars")
        )["chars"]
    )

    def prefix_rows(batch: pa.Table) -> pa.Table:
        out = set()
        for t in batch.column("token").to_pylist():
            tt = t[:TRIE_MAX_LEN]
            for i in range(1, len(tt) + 1):
                out.add(tt[:i])
        return pa.table({"p": pa.array(sorted(out), pa.string())})

    trie_nodes = (
        vocab.map_batches(prefix_rows, batch_format="pyarrow")
        .groupby("p")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .count()
    )
    df = pd.DataFrame(
        [
            {
                "n_tokens": n_tokens,
                "total_chars": total_chars,
                "trie_nodes": trie_nodes,
                "saved_chars": total_chars - trie_nodes,
            }
        ]
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


DF_DRIFT_K = 20  # top drifting tokens reported


def token_df_drift(sf_dir: str) -> "pd.DataFrame":
    """Top lexical drift — the tokens whose DOCUMENT FREQUENCY moved
    most between the first and second half of the corpus (doc_id
    order): the vocabulary-drift monitor embedding_drift's geometric
    readout can't localize ('which words changed'). Drift is scored
    cross-normalized and exactly integer:
    score = |df_h1·N2 − df_h2·N1| (the common-denominator numerator
    of |df1/N1 − df2/N2|), top DF_DRIFT_K under the deterministic
    (score DESC, token ASC) order. Output:
    (token, df_h1, df_h2, drift_score).

    Scale shape: per-batch distinct (token, half) partials → ONE
    groupby(token) pivots both halves' dfs (a token's two rows never
    straddle groups) and scores; per-partition top-K prune then a
    K-bounded global sort-limit — the top_ngrams driver-read
    contract (≤ partitions·K rows ever sorted)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import words_of

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = int(docs.count())
    cut = n_docs // 2  # first half: doc_id < cut
    n1, n2 = cut, n_docs - cut

    def tok_half(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_t, out_h = [], []
        for did, tx in zip(ids, texts):
            h = 0 if did < cut else 1
            for w in set(words_of(tx or "")):
                out_t.append(w)
                out_h.append(h)
        return pa.table(
            {
                "token": pa.array(out_t, pa.string()),
                "h": pa.array(out_h, pa.int64()),
            }
        )

    def df_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["token", "h"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "token": g.column("token"),
                "h": g.column("h"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    def widen(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "token": batch.column("token"),
                "d1": pa.array(np.where(h == 0, n, 0), pa.int64()),
                "d2": pa.array(np.where(h == 1, n, 0), pa.int64()),
            }
        )

    def score_prune(batch: pa.Table) -> pa.Table:
        d1 = batch.column("d1").to_numpy(zero_copy_only=False)
        d2 = batch.column("d2").to_numpy(zero_copy_only=False)
        tok = batch.column("token").to_pandas().to_numpy(dtype=object)
        sc = np.abs(d1 * n2 - d2 * n1)
        # per-batch prune: the K best under (score desc, token asc),
        # so the global sort-limit touches K rows per block
        order = np.lexsort((tok, -sc))[:DF_DRIFT_K]
        keep = np.sort(order)
        return pa.table(
            {
                "token": pa.array(tok[keep], pa.string()),
                "df_h1": pa.array(d1[keep], pa.int64()),
                "df_h2": pa.array(d2[keep], pa.int64()),
                "drift_score": pa.array(sc[keep], pa.int64()),
            }
        )

    top = (
        docs.map_batches(tok_half, batch_format="pyarrow")
        .map_batches(df_partial, batch_format="pyarrow")
        .groupby(["token", "h"])
        .aggregate(_Sum("n", alias_name="n"))
        .map_batches(widen, batch_format="pyarrow")
        .groupby("token")
        .aggregate(
            _Sum("d1", alias_name="d1"), _Sum("d2", alias_name="d2")
        )
        .map_batches(score_prune, batch_format="pyarrow")
        .sort(["drift_score", "token"], descending=[True, False])
        .limit(DF_DRIFT_K)
        .take_all()
    )
    df = pd.DataFrame(top)
    for c in ["df_h1", "df_h2", "drift_score"]:
        df[c] = df[c].astype("int64")
    return df[["token", "df_h1", "df_h2", "drift_score"]]


def vocab_attribution(sf_dir: str) -> "pd.DataFrame":
    """Vocabulary attribution by source — which source CONTRIBUTES
    the corpus' vocabulary: per source, the number of tokens whose
    FIRST occurrence (min doc_id, the heaps_curve identity) lands in
    that source's documents, normalized per thousand docs. A source
    with high tokens-per-kdoc is where novel language enters
    (keep it); one near zero is pure repetition of vocabulary other
    sources already introduced. Output per source:
    (source, n_docs, n_first_tokens, tokens_per_kdoc).

    Scale shape: one groupby(token) Min(first doc) (the heaps fold),
    then the slim (first_doc) rows co-partition with the documents'
    (doc_id, source) projection on the doc key (tagged union, never
    a broadcast) and collapse to per-source counts; a second bounded
    fold adds per-source doc totals."""
    import pandas as pd

    from ray.data.aggregate import Min as _Min, Sum as _Sum

    from ..functions.textstats import words_of
    from ..stages.shuffle import N_COARSE_PARTS

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    def token_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_t, out_d = [], []
        for did, tx in zip(ids, texts):
            ws = set(words_of(tx or ""))
            out_t.extend(ws)
            out_d.extend([did] * len(ws))
        return pa.table(
            {
                "token": pa.array(out_t, pa.string()),
                "doc": pa.array(out_d, pa.int64()),
            }
        )

    firsts = (
        docs.map_batches(token_rows, batch_format="pyarrow")
        .groupby("token")
        .aggregate(_Min("doc", alias_name="fd"))
    )

    def first_side(batch: pa.Table) -> pa.Table:
        fd = batch.column("fd").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(fd, pa.int64()),
                "source": pa.array([""] * len(fd), pa.string()),
                "side": pa.array(np.ones(len(fd), np.int64), pa.int64()),
                "part": pa.array(fd % N_COARSE_PARTS, pa.int64()),
            }
        )

    def doc_side(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "key": pa.array(d, pa.int64()),
                "source": batch.column("source"),
                "side": pa.array(np.zeros(len(d), np.int64), pa.int64()),
                "part": pa.array(d % N_COARSE_PARTS, pa.int64()),
            }
        )

    def attribute(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        key = part_tbl.column("key").to_numpy(zero_copy_only=False)
        side = part_tbl.column("side").to_numpy(zero_copy_only=False)
        src = part_tbl.column("source").to_pandas().to_numpy(dtype=object)
        dkey = key[side == 0]
        dsrc = src[side == 0]
        order = np.argsort(dkey, kind="stable")
        dkey_s, dsrc_s = dkey[order], dsrc[order]
        fkey = key[side == 1]
        pos = np.searchsorted(dkey_s, fkey)
        srcs = dsrc_s[pos]  # every first-doc exists in documents
        g = (
            pd.Series(srcs).value_counts().rename_axis("source")
            .reset_index(name="n")
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    per_src = (
        docs.map_batches(doc_side, batch_format="pyarrow")
        .union(firsts.map_batches(first_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(attribute, batch_format="pyarrow")
        .groupby("source")
        .aggregate(_Sum("n", alias_name="n_first_tokens"))
        .take_all()  # bounded: <= n_sources rows
    )
    fmap = {r["source"]: int(r["n_first_tokens"]) for r in per_src}

    def src_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["source"]).group_by("source").aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "source": g.column("source"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    dmap_rows = (
        docs.map_batches(src_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(_Sum("n", alias_name="n_docs"))
        .take_all()  # bounded: <= n_sources rows
    )
    out = [
        {
            "source": r["source"],
            "n_docs": int(r["n_docs"]),
            "n_first_tokens": fmap.get(r["source"], 0),
            "tokens_per_kdoc": fmap.get(r["source"], 0) * 1000
            // int(r["n_docs"]),
        }
        for r in dmap_rows
    ]
    df = pd.DataFrame(out).sort_values("source", ignore_index=True)
    for c in ["n_docs", "n_first_tokens", "tokens_per_kdoc"]:
        df[c] = df[c].astype("int64")
    return df[["source", "n_docs", "n_first_tokens", "tokens_per_kdoc"]]


ZIPF_HEAD_K = 32  # head ranks audited


def zipf_head_audit(sf_dir: str) -> "pd.DataFrame":
    """Zipf head audit — the top-ZIPF_HEAD_K tokens by frequency with
    the exact banded Zipf ratio f_k·k·1000 // f_1 per rank: under a
    perfect Zipf law every ratio is ~1000, a head that decays faster
    (ratios ≪ 1000) is stopword-dominated, slower (≫ 1000) is
    template repetition — the log-free power-law check (fitting a
    slope needs logs; the head RATIOS need only integer products).
    Ranks order by (count DESC, token ASC), deterministic. Output:
    (rank, token, freq, zipf_ratio_milli).

    Scale shape: the top_ngrams token fold (per-batch Counter
    combiner → one token groupby) then a K-bounded sort-limit; the
    ratio arithmetic touches only the K driver rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import words_of

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def tok_partial(batch: pa.Table) -> pa.Table:
        import collections

        c: collections.Counter = collections.Counter()
        for t in batch.column("text").to_pylist():
            c.update(words_of(t or ""))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(
                    np.fromiter(c.values(), np.int64, len(c)), pa.int64()
                ),
            }
        )

    top = (
        docs.map_batches(tok_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(_Sum("n", alias_name="freq"))
        .sort(["freq", "token"], descending=[True, False])
        .limit(ZIPF_HEAD_K)
        .take_all()
    )
    f1 = int(top[0]["freq"])
    out = [
        {
            "rank": i + 1,
            "token": r["token"],
            "freq": int(r["freq"]),
            "zipf_ratio_milli": int(r["freq"]) * (i + 1) * 1000 // f1,
        }
        for i, r in enumerate(top)
    ]
    df = pd.DataFrame(out)
    for c in ["rank", "freq", "zipf_ratio_milli"]:
        df[c] = df[c].astype("int64")
    return df[["rank", "token", "freq", "zipf_ratio_milli"]]


HEAD_CHURN_K = 32


def head_churn(sf_dir: str) -> "pd.DataFrame":
    """Heavy-hitter churn — how stable is the token HEAD between the
    two corpus halves: the top-HEAD_CHURN_K tokens per half (by
    half-local frequency, (count DESC, token ASC) order), their
    overlap, and the exact total rank displacement of the common
    tokens — the one-row stability readout token_df_drift's per-token
    list doesn't summarize (a stable head with churn in the tail is
    healthy drift; head churn means the domain mix moved). Output:
    (k, n_common, rank_shift_sum, new_in_h2).

    Scale shape: one (token, half) count fold, two K-bounded
    sort-limits; the comparison touches 2K driver rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import words_of

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = int(docs.count())
    cut = n_docs // 2

    def tok_partial(batch: pa.Table) -> pa.Table:
        import collections

        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        c: collections.Counter = collections.Counter()
        for did, tx in zip(ids, texts):
            h = 0 if did < cut else 1
            for w in words_of(tx or ""):
                c[(w, h)] += 1
        return pa.table(
            {
                "token": pa.array([k[0] for k in c], pa.string()),
                "h": pa.array([k[1] for k in c], pa.int64()),
                "n": pa.array(
                    np.fromiter(c.values(), np.int64, len(c)), pa.int64()
                ),
            }
        )

    counts = (
        docs.map_batches(tok_partial, batch_format="pyarrow")
        .groupby(["token", "h"])
        .aggregate(_Sum("n", alias_name="n"))
        .materialize()
    )

    def top_half(h: int) -> list:
        def keep(batch: pa.Table, h=h) -> pa.Table:
            hh = batch.column("h").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(hh == h))

        rows = (
            counts.map_batches(keep, batch_format="pyarrow")
            .sort(["n", "token"], descending=[True, False])
            .limit(HEAD_CHURN_K)
            .take_all()
        )
        return [r["token"] for r in rows]

    t1, t2 = top_half(0), top_half(1)
    r1 = {t: i for i, t in enumerate(t1)}
    r2 = {t: i for i, t in enumerate(t2)}
    common = [t for t in t1 if t in r2]
    shift = sum(abs(r1[t] - r2[t]) for t in common)
    df = pd.DataFrame(
        [
            {
                "k": HEAD_CHURN_K,
                "n_common": len(common),
                "rank_shift_sum": shift,
                "new_in_h2": HEAD_CHURN_K - len(common),
            }
        ]
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def mcnemar_test(sf_dir: str) -> "pd.DataFrame":
    """Exact McNemar sufficient statistics for the PAIRED comparison
    of two quality gates on the same documents — gate A = length
    (ws_tokens ≥ 20), gate B = English-stopword density
    (10·hits_en ≥ ws_tokens), the two binding components of
    `quality_score`. The marginal pass rates (what `quality_score`'s
    distribution shows) can be equal while the gates disagree on
    WHICH docs pass; McNemar's test conditions on the discordant
    pairs only — stat = (b−c)²/(b+c) with b = A-only passes, c =
    B-only passes — the right test for "did swapping gate A for gate
    B change the kept set?" (paired, same units; the unpaired
    chi2_independence is wrong here). Output one row: the 2×2 paired
    cells plus the integer stat numerator/denominator.

    Scale shape: one streaming pass; per-batch vectorized gate
    evaluation folds to four int64 cells — no shuffle wider than the
    4-cell Sum. Exact integers end to end."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import stopword_hits, token_stats

    docs = read_documents(sf_dir, ["doc_id", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").combine_chunks()
        tok = token_stats(texts)["ws_tokens"].to_numpy(zero_copy_only=False)
        en = stopword_hits(texts)["hits_en"].to_numpy(zero_copy_only=False)
        a = tok >= 20
        b = 10 * en >= tok
        return pa.table(
            {
                "both_pass": pa.array([int((a & b).sum())], pa.int64()),
                "a_only": pa.array([int((a & ~b).sum())], pa.int64()),
                "b_only": pa.array([int((~a & b).sum())], pa.int64()),
                "neither": pa.array([int((~a & ~b).sum())], pa.int64()),
            }
        )

    rows = (
        docs.map_batches(cells, batch_format="pyarrow")
        .aggregate(
            _Sum("both_pass", alias_name="both_pass"),
            _Sum("a_only", alias_name="a_only"),
            _Sum("b_only", alias_name="b_only"),
            _Sum("neither", alias_name="neither"),
        )
    )
    bp, ao, bo, ne = (
        int(rows["both_pass"]),
        int(rows["a_only"]),
        int(rows["b_only"]),
        int(rows["neither"]),
    )
    df = pd.DataFrame(
        [
            {
                "n": bp + ao + bo + ne,
                "both_pass": bp,
                "a_only": ao,
                "b_only": bo,
                "neither": ne,
                "stat_num": (ao - bo) ** 2,
                "stat_den": ao + bo,
            }
        ]
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def tv_distance(sf_dir: str) -> "pd.DataFrame":
    """Exact TOTAL-VARIATION distance between the token-frequency
    distributions of the two corpus halves — the single scalar the
    drift family reduces to: `token_df_drift` lists per-token df
    deltas and `head_churn` compares the heads; TV = ½·Σ_t |p₁(t) −
    p₂(t)| is the tightest bound on how differently ANY
    token-measurable event is weighted by the two halves (the metric
    used for shift detection between corpus snapshots). Kept exact
    in integers: tv_num = Σ_t |c₁(t)·N₂ − c₂(t)·N₁| so that
    TV = tv_num / (2·N₁·N₂); tv_bp = ⌊10⁴·tv_num / (2·N₁·N₂)⌋ is
    the floor-basis-point readout. Output one row:
    (n1_tokens, n2_tokens, vocab1, vocab2, tv_num, tv_bp).

    Scale shape: one (token, half) count fold (per-batch Counter
    pre-reduction), half totals from a 2-cell aggregate over the
    SAME folded counts, then a crc32(token) co-partition folds the
    |c₁·N₂ − c₂·N₁| partials vectorized — tokens never reach the
    driver; int64 headroom: tv_num ≤ 2·N₁·N₂ (~10¹³ at sf0.1)."""
    import collections

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import words_of
    from ..stages.shuffle import str_partition

    docs = read_documents(sf_dir, ["doc_id", "text"])
    n_docs = int(docs.count())
    cut = n_docs // 2

    def tok_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        c: collections.Counter = collections.Counter()
        for did, tx in zip(ids, texts):
            h = 0 if did < cut else 1
            for w in words_of(tx or ""):
                c[(w, h)] += 1
        return pa.table(
            {
                "token": pa.array([k[0] for k in c], pa.string()),
                "h": pa.array([k[1] for k in c], pa.int64()),
                "n": pa.array(
                    np.fromiter(c.values(), np.int64, len(c)), pa.int64()
                ),
            }
        )

    counts = (
        docs.map_batches(tok_partial, batch_format="pyarrow")
        .groupby(["token", "h"])
        .aggregate(_Sum("n", alias_name="n"))
        .materialize()
    )

    totals = {0: 0, 1: 0}
    vocab = {0: 0, 1: 0}
    for r in (
        counts.map_batches(
            lambda b: pa.table(
                {
                    "h": b.column("h"),
                    "n": b.column("n"),
                    "v": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("h")
        .aggregate(_Sum("n", alias_name="n"), _Sum("v", alias_name="v"))
        .take_all()  # bounded: 2 half rows
    ):
        totals[int(r["h"])] = int(r["n"])
        vocab[int(r["h"])] = int(r["v"])
    n1, n2 = totals[0], totals[1]

    def add_part(batch: pa.Table) -> pa.Table:
        part = str_partition(batch.column("token").to_pylist())
        return batch.append_column("part", pa.array(part, pa.int64()))

    def tv_partial(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = pd.DataFrame(
            {
                "token": part_tbl.column("token").to_pandas(),
                "h": part_tbl.column("h").to_numpy(zero_copy_only=False),
                "n": part_tbl.column("n").to_numpy(zero_copy_only=False),
            }
        )
        piv = df.pivot_table(
            index="token", columns="h", values="n", aggfunc="sum",
            fill_value=0,
        )
        c1 = piv[0].to_numpy(np.int64) if 0 in piv.columns else np.zeros(
            len(piv), np.int64
        )
        c2 = piv[1].to_numpy(np.int64) if 1 in piv.columns else np.zeros(
            len(piv), np.int64
        )
        val = int(np.abs(c1 * n2 - c2 * n1).sum())
        return pa.table({"tv": pa.array([val], pa.int64())})

    agg = (
        counts.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: tv_partial(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .aggregate(_Sum("tv", alias_name="tv"))
    )
    tv_num = int(agg["tv"])
    df = pd.DataFrame(
        [
            {
                "n1_tokens": n1,
                "n2_tokens": n2,
                "vocab1": vocab[0],
                "vocab2": vocab[1],
                "tv_num": tv_num,
                "tv_bp": tv_num * 10000 // (2 * n1 * n2) if n1 and n2 else 0,
            }
        ]
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


CNG_BUCKETS = 256  # rank-pass bucket fan per ordering


def compression_neighbor_gain(sf_dir: str) -> "pd.DataFrame":
    """Doc-REORDERING compression gain — how many distinct 3-shingles
    CONSECUTIVE documents share when the corpus is laid out (a) in
    doc_id order vs (b) sorted by simhash fingerprint: the exact
    integer proxy for the well-known trick of clustering similar
    documents before compression (URL-sorted WARCs, simhash-sorted
    shards compress better because neighboring docs share
    back-reference windows). gain = Σ over consecutive pairs
    |shingles(dᵢ) ∩ shingles(dᵢ₊₁)|, computed WITHOUT materializing
    pair intersections: a shared shingle contributes 1 iff its two
    docs sit at adjacent positions, so the total folds per SHINGLE
    from sorted position lists. Shingles travel as 60-bit md5
    prefixes on BOTH sides (oracle joins on the same hash), so the
    exchanges carry int64 only and any hash merge is bit-identical
    across the two paths. Output (ordering, n_pairs,
    shared_shingles) — the simhash row exceeding the doc_id row is
    the measured reordering win.

    Scale shape: each ordering's exact positions come from one
    bounded 256-cell count grid (doc-id ranges / 2-hex-char simhash
    prefixes) + per-bucket local sort — never a global sort; text
    is exploded to (doc, shingle-hash) rows in the FIRST map and
    never shuffles; positions attach in one tagged doc-key
    co-partition of slim int64 rows; adjacency counts fold per
    hash partition and Sum to two rows."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    from ..functions.textstats import shingles_of
    from ..pipelines.dedup import simhash_fingerprints
    from ..stages.shuffle import N_COARSE_PARTS

    docs = read_documents(sf_dir, ["doc_id", "text"])

    # --- rank pass (a): position by doc_id ------------------------
    lohi = docs.aggregate(_Min("doc_id"), _Max("doc_id"))
    dlo, dhi = int(lohi["min(doc_id)"]), int(lohi["max(doc_id)"])
    wa = (dhi - dlo) // CNG_BUCKETS + 1

    def bucket_a(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "doc": pa.array(d, pa.int64()),
                "cell": pa.array((d - dlo) // wa, pa.int64()),
            }
        )

    cells_a = docs.map_batches(bucket_a, batch_format="pyarrow").materialize()
    counts_a = {
        int(r["cell"]): int(r["count()"])
        for r in cells_a.groupby("cell").count().take_all()
    }  # bounded: 256 cells
    bases_a = {}
    acc = 0
    for c in sorted(counts_a):
        bases_a[c] = acc
        acc += counts_a[c]
    bases_a_ref = ray.put(bases_a)

    def pos_a_rows(group: pa.Table) -> pa.Table:
        cell = int(group.column("cell")[0].as_py())
        base = ray.get(bases_a_ref)[cell]
        d = np.sort(group.column("doc").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "doc": pa.array(d, pa.int64()),
                "pos": pa.array(
                    base + np.arange(1, len(d) + 1, dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    pos_a = (
        cells_a.groupby("cell")
        .map_groups(pos_a_rows, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )

    # --- rank pass (c): position by (simhash hex, doc_id) ---------
    fps = simhash_fingerprints(sf_dir).materialize()

    def bucket_c(batch: pa.Table) -> pa.Table:
        sh = batch.column("simhash").to_pylist()
        return pa.table(
            {
                "doc": batch.column("doc_id").cast(pa.int64()),
                "sim": batch.column("simhash"),
                "cell": pa.array(
                    [int(x[:2], 16) for x in sh], pa.int64()
                ),
            }
        )

    cells_c = fps.map_batches(bucket_c, batch_format="pyarrow").materialize()
    counts_c = {
        int(r["cell"]): int(r["count()"])
        for r in cells_c.groupby("cell").count().take_all()
    }  # bounded: 256 hex-prefix cells
    bases_c = {}
    acc = 0
    for c in sorted(counts_c):
        bases_c[c] = acc
        acc += counts_c[c]
    bases_c_ref = ray.put(bases_c)

    def pos_c_rows(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        cell = int(group.column("cell")[0].as_py())
        base = ray.get(bases_c_ref)[cell]
        df = pd.DataFrame(
            {
                "doc": group.column("doc").to_numpy(zero_copy_only=False),
                "sim": group.column("sim").to_pylist(),
            }
        ).sort_values(["sim", "doc"])
        return pa.table(
            {
                "doc": pa.array(df["doc"].to_numpy(np.int64), pa.int64()),
                "pos": pa.array(
                    base + np.arange(1, len(df) + 1, dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    pos_c = (
        cells_c.groupby("cell")
        .map_groups(pos_c_rows, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )

    # --- early explosion: (doc, 60-bit shingle hash), no text on ---
    def explode_hash(batch: pa.Table) -> pa.Table:
        from ..pipelines.dedup import _shingle_base  # cached md5_int60

        out_d, out_h = [], []
        for doc, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            for s in set(shingles_of(text or "", 3)):
                out_d.append(doc)
                out_h.append(_shingle_base(s))
        return pa.table(
            {
                "doc": pa.array(out_d, pa.int64()),
                "h": pa.array(out_h, pa.int64()),
                "pos": pa.array(
                    np.zeros(len(out_d), np.int64), pa.int64()
                ),
                "side": pa.array(
                    np.zeros(len(out_d), np.int64), pa.int64()
                ),
            }
        )

    def tag_pos(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc": batch.column("doc").cast(pa.int64()),
                    "h": pa.array(
                        np.zeros(batch.num_rows, np.int64), pa.int64()
                    ),
                    "pos": batch.column("pos").cast(pa.int64()),
                    "side": pa.array(
                        np.full(batch.num_rows, side, np.int64),
                        pa.int64(),
                    ),
                }
            )

        return fn

    def attach(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = part_tbl.to_pandas()
        pa_map = dict(
            zip(df[df["side"] == 1]["doc"], df[df["side"] == 1]["pos"])
        )
        pc_map = dict(
            zip(df[df["side"] == 2]["doc"], df[df["side"] == 2]["pos"])
        )
        sh = df[df["side"] == 0]
        docs_v = sh["doc"].to_numpy(np.int64)
        h = sh["h"].to_numpy(np.int64)
        p1 = np.array([pa_map[d] for d in docs_v], np.int64)
        p2 = np.array([pc_map[d] for d in docs_v], np.int64)
        return pa.table(
            {
                "h": pa.array(h, pa.int64()),
                "pa_": pa.array(p1, pa.int64()),
                "pc_": pa.array(p2, pa.int64()),
                "part2": pa.array(h % N_COARSE_PARTS, pa.int64()),
            }
        )

    sh_rows = (
        docs.map_batches(explode_hash, batch_format="pyarrow")
        .union(pos_a.map_batches(tag_pos(1), batch_format="pyarrow"))
        .union(pos_c.map_batches(tag_pos(2), batch_format="pyarrow"))
        .map_batches(
            lambda b: b.append_column(
                "part",
                pa.array(
                    b.column("doc").to_numpy(zero_copy_only=False)
                    % N_COARSE_PARTS,
                    pa.int64(),
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: attach(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )

    def adjacency(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = pd.DataFrame(
            {
                "h": part_tbl.column("h").to_numpy(zero_copy_only=False),
                "pa_": part_tbl.column("pa_").to_numpy(
                    zero_copy_only=False
                ),
                "pc_": part_tbl.column("pc_").to_numpy(
                    zero_copy_only=False
                ),
            }
        ).sort_values("h", kind="stable")
        h = df["h"].to_numpy(np.int64)
        ga = gc = 0
        if len(h):
            starts = np.concatenate(
                [[0], np.nonzero(np.diff(h))[0] + 1, [len(h)]]
            )
            va = df["pa_"].to_numpy(np.int64)
            vc = df["pc_"].to_numpy(np.int64)
            for i in range(len(starts) - 1):
                a0, a1 = starts[i], starts[i + 1]
                sa = np.sort(va[a0:a1])
                sc = np.sort(vc[a0:a1])
                ga += int((np.diff(sa) == 1).sum())
                gc += int((np.diff(sc) == 1).sum())
        return pa.table(
            {
                "ordering": pa.array(["doc_id", "simhash"], pa.string()),
                "g": pa.array([ga, gc], pa.int64()),
            }
        )

    n_docs = int(docs.count())
    rows = (
        sh_rows.groupby("part2")
        .map_groups(
            lambda g: adjacency(g.drop_columns(["part2"])),
            batch_format="pyarrow",
        )
        .groupby("ordering")
        .aggregate(_Sum("g", alias_name="shared_shingles"))
        .take_all()  # bounded: 2 ordering rows
    )
    df = pd.DataFrame(rows).sort_values("ordering", ignore_index=True)
    df["n_pairs"] = n_docs - 1
    df["shared_shingles"] = df["shared_shingles"].astype("int64")
    df["n_pairs"] = df["n_pairs"].astype("int64")
    return df[["ordering", "n_pairs", "shared_shingles"]]


SCC_DENS = (16, 8, 4, 2, 1)   # nested sample denominators
_SCC_SPACE = 1 << 60          # md5_int60 hash space


def sample_convergence_curve(sf_dir: str) -> "pd.DataFrame":
    """PILOT-SAMPLE sufficiency curve — five NESTED deterministic
    corpus samples (1/16 ⊂ 1/8 ⊂ 1/4 ⊂ 1/2 ⊂ 1, membership by
    md5(doc_id) threshold so every level contains the previous) and
    per level the exact doc count, total chars, floor-scaled mean
    length, and DISTINCT VOCABULARY: linear statistics (mean length)
    converge almost immediately while vocabulary keeps climbing (the
    Heaps-law tail `heaps_curve` shows in document order — here in
    SAMPLE-FRACTION order, which is what you actually dial when
    sizing a pilot). The table answers 'how small a sample is
    enough' per statistic, the everyday question before paying for
    a full-corpus pass. Output (fraction_den, n_docs, total_chars,
    mean_chars_x1000, vocab).

    Scale shape: doc stats fold per level from one streaming pass
    (5 threshold cells); vocabulary never reaches the driver — a
    (token → min doc-hash) MIN fold co-partitioned by token, then a
    per-partition 5-threshold count partial Sum-folds to the level
    grid. Nesting makes all five levels one pass."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import md5_int60, words_of
    from ..stages.shuffle import str_partition

    docs = read_documents(sf_dir, ["doc_id", "text", "n_chars"])
    thr = {d: _SCC_SPACE // d for d in SCC_DENS}

    def doc_cells(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        nch = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        u = np.array([md5_int60(str(i)) for i in ids], np.int64)
        dens, nd, tc = [], [], []
        for d in SCC_DENS:
            m = u < thr[d]
            dens.append(d)
            nd.append(int(m.sum()))
            tc.append(int(nch[m].sum()))
        return pa.table(
            {
                "fraction_den": pa.array(dens, pa.int64()),
                "n_docs": pa.array(nd, pa.int64()),
                "total_chars": pa.array(tc, pa.int64()),
            }
        )

    stats = {
        int(r["fraction_den"]): (int(r["n_docs"]), int(r["total_chars"]))
        for r in (
            docs.map_batches(doc_cells, batch_format="pyarrow")
            .groupby("fraction_den")
            .aggregate(
                _Sum("n_docs", alias_name="n_docs"),
                _Sum("total_chars", alias_name="total_chars"),
            )
            .take_all()  # bounded: 5 level rows
        )
    }

    def tok_minu(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        best: dict = {}
        for i, tx in zip(ids, texts):
            u = md5_int60(str(i))
            for w in set(words_of(tx or "")):
                if w not in best or u < best[w]:
                    best[w] = u
        toks = list(best.keys())
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "mu": pa.array([best[t] for t in toks], pa.int64()),
                "part": pa.array(str_partition(toks), pa.int64()),
            }
        )

    def vocab_partial(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = pd.DataFrame(
            {
                "token": part_tbl.column("token").to_pylist(),
                "mu": part_tbl.column("mu").to_numpy(zero_copy_only=False),
            }
        )
        mu = df.groupby("token", sort=False)["mu"].min().to_numpy(np.int64)
        return pa.table(
            {
                "fraction_den": pa.array(list(SCC_DENS), pa.int64()),
                "v": pa.array(
                    [int((mu < thr[d]).sum()) for d in SCC_DENS],
                    pa.int64(),
                ),
            }
        )

    vocab = {
        int(r["fraction_den"]): int(r["v"])
        for r in (
            docs.map_batches(tok_minu, batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                lambda g: vocab_partial(g.drop_columns(["part"])),
                batch_format="pyarrow",
            )
            .groupby("fraction_den")
            .aggregate(_Sum("v", alias_name="v"))
            .take_all()  # bounded: 5 level rows
        )
    }

    rows = []
    for d in SCC_DENS:
        nd, tc = stats.get(d, (0, 0))
        rows.append(
            (
                d,
                nd,
                tc,
                tc * 1000 // nd if nd else 0,
                vocab.get(d, 0),
            )
        )
    df = pd.DataFrame(
        rows,
        columns=[
            "fraction_den", "n_docs", "total_chars", "mean_chars_x1000",
            "vocab",
        ],
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("fraction_den", ignore_index=True)


AFFIX_K = 5        # tokens per affix gram
AFFIX_TOP = 16     # reported heads/tails


def boilerplate_affix_census(sf_dir: str) -> "pd.DataFrame":
    """Shared document-AFFIX census — the top-16 most common first-5
    and last-5 token grams across the corpus with their exact doc
    counts and coverage: repeated heads are navigation/header
    boilerplate, repeated tails are footers/license blocks — the
    empirical input to the north-star HTML boilerplate stripper
    (`html_extract` strips DOM furniture; this measures the
    TEXT-level furniture that survives into the corpus, exactly the
    signature CCNet/C4-style line filters key on). Output (position,
    rnk, gram, n_docs, coverage_bp) for position ∈ {head, tail}.

    Scale shape: one streaming pass emits per-batch pre-counted
    (position, gram) cells; one gram-keyed coarse exchange folds
    exact counts; two bounded top-16 sort-limits close it. Docs
    shorter than 5 tokens contribute their whole token string."""
    import collections

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import words_of
    from ..stages.shuffle import str_partition

    docs = read_documents(sf_dir, ["doc_id", "text"])
    n_docs = int(docs.count())

    def cells(batch: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for t in batch.column("text").to_pylist():
            ws = words_of(t or "")
            if not ws:
                continue
            c[("head", " ".join(ws[:AFFIX_K]))] += 1
            c[("tail", " ".join(ws[-AFFIX_K:]))] += 1
        keys = list(c.keys())
        return pa.table(
            {
                "position": pa.array([k[0] for k in keys], pa.string()),
                "gram": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array(
                    np.fromiter(c.values(), np.int64, len(c)), pa.int64()
                ),
                "part": pa.array(
                    str_partition([k[1] for k in keys]), pa.int64()
                ),
            }
        )

    def fold(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = (
            part_tbl.to_pandas()
            .groupby(["position", "gram"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        # per-partition prune: only candidates that could reach the
        # global top-16 survive (a gram's rows are co-located, so
        # per-partition counts are exact — keep each position's 16
        # largest)
        df = (
            df.sort_values(["position", "n", "gram"],
                           ascending=[True, False, True])
            .groupby("position")
            .head(AFFIX_TOP)
        )
        return pa.table(
            {
                "position": pa.array(df["position"], pa.string()),
                "gram": pa.array(df["gram"], pa.string()),
                "n": pa.array(df["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    rows = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: fold(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .take_all()  # bounded: <= 2 * 16 * 64 pruned candidate rows
    )
    out = []
    for posn in ("head", "tail"):
        cand = sorted(
            (
                (-int(r["n"]), r["gram"])
                for r in rows
                if r["position"] == posn
            ),
        )[:AFFIX_TOP]
        for i, (negn, gram) in enumerate(cand, 1):
            n = -negn
            out.append((posn, i, gram, n, n * 10000 // n_docs))
    df = pd.DataFrame(
        out, columns=["position", "rnk", "gram", "n_docs", "coverage_bp"]
    )
    for c in ["rnk", "n_docs", "coverage_bp"]:
        df[c] = df[c].astype("int64")
    return df.sort_values(["position", "rnk"], ignore_index=True)


def tokenizer_fertility(sf_dir: str) -> "pd.DataFrame":
    """Tokenizer FERTILITY by language — per language bucket the
    exact totals (docs, chars, bytes, whitespace tokens, BPE-ish
    tokens) and the floor-scaled ratios chars_per_bpe_x1000 /
    bpe_per_ws_x1000: the per-language token-budget table every
    multilingual training plan starts from (a language whose BPE
    fertility runs 2× pays 2× the context budget for the same text —
    the standard argument for fertility-aware mixing next to
    `mix_weights`' count-based temperatures). Output one row per
    language.

    Scale shape: one streaming pass — the existing vectorized
    token_stats kernels fold five integer cells per language
    through a ≤|langs| exchange. No shuffle wider than the language
    grid."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..functions.textstats import token_stats

    docs = read_documents(sf_dir, ["doc_id", "text", "lang"])

    def cells(batch: pa.Table) -> pa.Table:
        ts = token_stats(batch.column("text").combine_chunks())
        t = pa.table(
            {
                "lang": batch.column("lang"),
                "n_docs": pa.array(
                    np.ones(batch.num_rows, np.int64), pa.int64()
                ),
                "chars": ts["chars"],
                "bytes": ts["bytes"],
                "ws_tokens": ts["ws_tokens"],
                "bpe_tokens": ts["bpe_tokens"],
            }
        ).group_by("lang").aggregate(
            [
                ("n_docs", "sum"),
                ("chars", "sum"),
                ("bytes", "sum"),
                ("ws_tokens", "sum"),
                ("bpe_tokens", "sum"),
            ]
        )
        return pa.table(
            {
                "lang": t.column("lang"),
                **{
                    c: t.column(f"{c}_sum").cast(pa.int64())
                    for c in (
                        "n_docs", "chars", "bytes", "ws_tokens",
                        "bpe_tokens",
                    )
                },
            }
        )

    rows = (
        docs.map_batches(cells, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            _Sum("n_docs", alias_name="n_docs"),
            _Sum("chars", alias_name="chars"),
            _Sum("bytes", alias_name="bytes"),
            _Sum("ws_tokens", alias_name="ws_tokens"),
            _Sum("bpe_tokens", alias_name="bpe_tokens"),
        )
        .take_all()  # bounded: one row per language
    )
    df = pd.DataFrame(rows).sort_values("lang", ignore_index=True)
    for c in ["n_docs", "chars", "bytes", "ws_tokens", "bpe_tokens"]:
        df[c] = df[c].astype("int64")
    df["chars_per_bpe_x1000"] = np.where(
        df["bpe_tokens"] > 0, df["chars"] * 1000 // df["bpe_tokens"], 0
    ).astype("int64")
    df["bpe_per_ws_x1000"] = np.where(
        df["ws_tokens"] > 0,
        df["bpe_tokens"] * 1000 // df["ws_tokens"],
        0,
    ).astype("int64")
    return df[
        [
            "lang", "n_docs", "chars", "bytes", "ws_tokens", "bpe_tokens",
            "chars_per_bpe_x1000", "bpe_per_ws_x1000",
        ]
    ]


ROC_KS = (1, 2, 4, 8, 16, 32, 64)  # audited list depths


def ranking_overlap_curve(sf_dir: str) -> "pd.DataFrame":
    """RANK-AGREEMENT overlap curve — overlap@k between the corpus's
    top documents by CHARACTER length and by WHITESPACE-TOKEN count
    (ties → doc_id) for k ∈ {1..64}: the retrieval-style agreement
    read (`kendall_tau` correlates full numeric columns; overlap@k
    is what selection policies actually experience — 'top-k longest
    docs' differs depending on the length DEFINITION, and the curve
    shows where the two definitions diverge). Output (k, overlap,
    overlap_bp).

    Scale shape: two bounded top-64 sort-limits (never a global
    rank materialization) and a 7-row driver comparison."""
    import pandas as pd

    from ..functions.textstats import token_stats

    docs = read_documents(sf_dir, ["doc_id", "text", "n_chars"])

    def metric_rows(batch: pa.Table) -> pa.Table:
        ts = token_stats(batch.column("text").combine_chunks())
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_chars": batch.column("n_chars").cast(pa.int64()),
                "ws_tokens": ts["ws_tokens"],
            }
        )

    m = docs.map_batches(metric_rows, batch_format="pyarrow").materialize()
    top_a = [
        int(r["doc_id"])
        for r in m.sort(
            ["n_chars", "doc_id"], descending=[True, False]
        ).limit(max(ROC_KS)).take_all()
    ]
    top_b = [
        int(r["doc_id"])
        for r in m.sort(
            ["ws_tokens", "doc_id"], descending=[True, False]
        ).limit(max(ROC_KS)).take_all()
    ]
    out = []
    for k in ROC_KS:
        ov = len(set(top_a[:k]) & set(top_b[:k]))
        out.append((k, ov, ov * 10000 // k))
    df = pd.DataFrame(out, columns=["k", "overlap", "overlap_bp"])
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def code_switch_census(sf_dir: str) -> "pd.DataFrame":
    """CODE-SWITCHING census — token-level language-tag switches per
    document: each token gets a language tag from the stopword
    lists (priority en>de>fr>es for tokens in several; untagged
    tokens are skipped), and a SWITCH is an adjacent pair of tagged
    tokens with different tags. One row: (n_docs, n_tagged_docs,
    n_mixed_docs, total_switches, max_switches). `lang_id` assigns
    ONE language per doc; a corpus with many mixed docs breaks that
    assumption (and all per-language routing downstream) — this is
    the census that says whether document-level language routing is
    well-posed on this corpus, the standard multilingual-curation
    check before fertility-aware mixing (`tokenizer_fertility`).

    Scale shape: one streaming pass; per-doc tagging and
    adjacent-tag switch counts fold as five integer cells. No
    shuffle at all."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    from ..functions.textstats import (
        LANG_PRIORITY,
        STOPWORD_PATTERNS,
        words_of,
    )

    sets = {}
    for i, lang in enumerate(LANG_PRIORITY, 1):
        pat = STOPWORD_PATTERNS[lang]
        words = pat[len(r"\b(?:"):-len(r")\b")].split("|")
        sets[i] = frozenset(words)

    docs = read_documents(sf_dir, ["doc_id", "text"])

    def cells(batch: pa.Table) -> pa.Table:
        n_docs = n_tagged = n_mixed = total_sw = max_sw = 0
        for t in batch.column("text").to_pylist():
            n_docs += 1
            tags = []
            for w in words_of(t or ""):
                for i in (1, 2, 3, 4):
                    if w in sets[i]:
                        tags.append(i)
                        break
            if tags:
                n_tagged += 1
            sw = sum(1 for a, b in zip(tags, tags[1:]) if a != b)
            if sw:
                n_mixed += 1
            total_sw += sw
            max_sw = max(max_sw, sw)
        return pa.table(
            {
                "n_docs": pa.array([n_docs], pa.int64()),
                "n_tagged_docs": pa.array([n_tagged], pa.int64()),
                "n_mixed_docs": pa.array([n_mixed], pa.int64()),
                "total_switches": pa.array([total_sw], pa.int64()),
                "max_switches": pa.array([max_sw], pa.int64()),
            }
        )

    agg = docs.map_batches(cells, batch_format="pyarrow").aggregate(
        _Sum("n_docs", alias_name="n_docs"),
        _Sum("n_tagged_docs", alias_name="n_tagged_docs"),
        _Sum("n_mixed_docs", alias_name="n_mixed_docs"),
        _Sum("total_switches", alias_name="total_switches"),
        _Max("max_switches", alias_name="max_switches"),
    )
    return pd.DataFrame(
        [
            {
                k: int(agg[k])
                for k in (
                    "n_docs", "n_tagged_docs", "n_mixed_docs",
                    "total_switches", "max_switches",
                )
            }
        ]
    ).astype("int64")
