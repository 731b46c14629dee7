"""Remaining SURVEY §2 operators as query pipelines: M1-M3 MIME
detection, pg_trgm-style fuzzy similarity (F1 fuzzy mode), the
retry-selection predicate DSL (§2.11), and per-partition extraction
metrics (A5).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from ..functions.mime import are_mime_types_compatible, detect_mime_from_content

FUZZY_QUERY = "spark query plan"
FUZZY_THRESHOLD_NUM = 3    # similarity >= 3/100 (pg_trgm default is 0.3;
FUZZY_THRESHOLD_DEN = 100  # the tiny fixture vocab needs a lower bar)


def _char_trigrams(s: str) -> set[str]:
    """Distinct character 3-grams of the lowercased string (whole-string
    windows; strings shorter than 3 contribute themselves)."""
    s = s.lower()
    if len(s) < 3:
        return {s} if s else set()
    return {s[i : i + 3] for i in range(len(s) - 2)}


def fuzzy_search(sf_dir: str) -> "ray.data.Dataset":
    """F1 fuzzy mode (pg_trgm similarity(), /root/reference/src/db/
    documents/search.rs:117-128): char-trigram Jaccard between each
    doc and the query string, integer-threshold filtered. Outputs
    integer intersection/size columns only (oracle-exact)."""
    qgrams = _char_trigrams(FUZZY_QUERY)
    nq = len(qgrams)

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fn(batch: pa.Table) -> pa.Table:
        ids, inter_out, nd_out = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            dgrams = _char_trigrams(text or "")
            inter = len(dgrams & qgrams)
            union = len(dgrams) + nq - inter
            if union > 0 and inter * FUZZY_THRESHOLD_DEN >= union * FUZZY_THRESHOLD_NUM:
                ids.append(doc_id)
                inter_out.append(inter)
                nd_out.append(len(dgrams))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "intersection": pa.array(inter_out, pa.int64()),
                "n_doc_trigrams": pa.array(nd_out, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def retry_selection(sf_dir: str) -> "ray.data.Dataset":
    """§2.11 retry-selection DSL (/root/reference/src/routes/
    documents_ocr_retry.rs:20-61): predicate builder over
    lang ∈ {…} AND size range AND source prefix, with a LIMIT —
    compiled to pushed-down filters + vectorized masks + limit."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    )

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.is_in(batch.column("lang"), value_set=pa.array(["en", "de"])),
                pc.and_(
                    pc.greater_equal(batch.column("n_chars"), 200),
                    pc.less_equal(batch.column("n_chars"), 1500),
                ),
            ),
            pc.starts_with(batch.column("source"), pattern="src1"),
        )
        return batch.filter(keep)

    # deterministic LIMIT: order by doc_id (not block arrival order)
    return (
        ds.map_batches(fn, batch_format="pyarrow")
        .sort("doc_id")
        .limit(50)
    )


def mime_detection(sf_dir: str) -> "ray.data.Dataset":
    """M1-M3 over synthetic payload prefixes derived from each doc
    (magic bytes > trusted server type > extension; compatibility
    check against the declared type). Deterministic fixture: the
    payload prefix, claimed extension and server type are keyed off
    doc_id so every lattice path is exercised."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    prefixes = [b"%PDF-1.4\n", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0",
                b"PK\x03\x04", b"plain text here"]
    exts = ["pdf", "png", "jpg", "zip", "txt"]
    servers = ["application/pdf", "application/octet-stream", "image/jpg",
               "", "text/plain"]

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        detected, declared, compat = [], [], []
        for doc_id in ids:
            k = doc_id % 5
            payload = prefixes[k] + str(doc_id).encode()
            server = servers[(doc_id // 5) % 5]
            filename = f"doc{doc_id}.{exts[k]}"
            d = detect_mime_from_content(payload, filename, server)
            detected.append(d)
            declared.append(server)
            compat.append(bool(server) and are_mime_types_compatible(d, server))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "detected_mime": pa.array(detected, pa.string()),
                "server_mime": pa.array(declared, pa.string()),
                "compatible": pa.array(compat, pa.bool_()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def metrics_parquet_dir(sf_dir: str) -> str:
    """Deterministic scratch path the oracle SQL reads back (the
    extraction itself is hermetic-engine work no SQL can mirror, so the
    oracle verifies the metrics AGGREGATION over the materialized e2e
    output — bucket edges, groupby, sums — in DuckDB).

    Deliberately sf-agnostic: oracle_sql() strings are built without
    knowing the sf_dir the harness will pass to queries(), so the
    oracle must read whatever run the query JUST wrote. One fixed dir
    gives exactly that (the harness always runs the Ray query before
    its oracle); an sf-keyed dir made a check at sf0.001 compare
    against a stale sf0.01 run — same group structure (statuses and
    confidences key off doc_id), different sf-dependent word totals."""
    del sf_dir
    return "/tmp/readur_ray_metrics/extracted"


def extraction_metrics(sf_dir: str) -> "ray.data.Dataset":
    """A5 per-partition extraction metrics (ocr_metrics analog,
    /root/reference/migrations/20250620100001_add_ocr_queue.sql:33-46)
    over the flagship e2e run: per (part_id, status) doc counts, word
    totals and confidence-bucket histogram — partial-aggregated inside
    map_batches before the tiny groupby. The e2e output is first
    materialized to metrics_parquet_dir(sf_dir) so the DuckDB oracle
    can recompute the identical aggregation from the same rows."""
    import shutil

    from .e2e import extraction_e2e

    out_dir = metrics_parquet_dir(sf_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    # materialize ONLY the metric inputs (4 narrow columns — the spans
    # never hit disk here; the oracle needs the same rows, not the text)
    extraction_e2e(sf_dir).select_columns(
        ["part_id", "status", "confidence", "word_count", "pages_ocrd"]
    ).write_parquet(out_dir)
    ds = ray.data.read_parquet(
        out_dir,
        columns=["part_id", "status", "confidence", "word_count", "pages_ocrd"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        bucket = np.clip((conf // 10).astype(np.int64), 0, 10)
        t = pa.table(
            {
                "part_id": batch.column("part_id").cast(pa.int64()),
                "status": batch.column("status"),
                "conf_bucket": pa.array(bucket, pa.int64()),
                "words": batch.column("word_count").cast(pa.int64()),
                "pages": batch.column("pages_ocrd").cast(pa.int64()),
            }
        )
        g = t.group_by(["part_id", "status", "conf_bucket"]).aggregate(
            [("words", "sum"), ("pages", "sum"), ("words", "count")]
        )
        return pa.table(
            {
                "part_id": g.column("part_id"),
                "status": g.column("status"),
                "conf_bucket": g.column("conf_bucket"),
                "words": g.column("words_sum"),
                "pages": g.column("pages_sum"),
                "n": g.column("words_count").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["part_id", "status", "conf_bucket"])
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("words", alias_name="total_words"),
            Sum("pages", alias_name="total_pages_ocrd"),
        )
    )


# ---------------------------------------------------------------------------
# semi-structured JSON field extraction (ETL over the props column)
# ---------------------------------------------------------------------------

PROPS_K_PATTERN = r'"k":\s*(?P<k>-?\d+)'


def json_props_extract(sf_dir: str) -> "ray.data.Dataset":
    """Extract the integer field `k` from the events' JSON `props`
    column — the semi-structured-ETL scalar class (§2.9 family):
    vectorized RE2 extraction (pyarrow extract_regex; the oracle runs
    the identical pattern through DuckDB regexp_extract), no Python
    per-row loop, one streaming pass. Returns (event_id, event_type,
    k)."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "props"],
    )

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), PROPS_K_PATTERN)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "k": k,
            }
        )

    return ds.map_batches(extract, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# market-basket co-occurrence (association-rule support counting)
# ---------------------------------------------------------------------------

COOCCUR_MIN_SUPPORT = 3
COOCCUR_K = 50


def item_cooccurrence(sf_dir: str) -> "ray.data.Dataset":
    """Association-rule support counting over the event stream: items
    are the JSON `k` property, a basket is a user's distinct item set,
    and the output is the top-COOCCUR_K item pairs by co-occurrence
    support (distinct users holding both), min support
    COOCCUR_MIN_SUPPORT, ties (support DESC, item_a, item_b). The
    market-basket primitive (Apriori's first pass / co-click mining).

    Scale shape: three coarse shuffles — (1) distinct (user, item) on
    user % P (baskets co-locate, so the per-partition distinct is
    global); (2) per-user pair emission via a vectorized self-merge
    (bounded: a basket holds at most |item vocabulary| items — the
    skew bound is the vocab, not the user count) with per-partition
    partial counts, re-keyed by packed pair; (3) a per-partition
    support filter + top-K prune into a one-partition final reduce
    (disjoint pair sets make the global top-K a subset of survivors).
    No driver state; nothing but int64 triples after stage 1."""
    import pyarrow.compute as _pc

    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "props"]
    )

    def user_items(batch: pa.Table) -> pa.Table:
        m = _pc.extract_regex(batch.column("props"), PROPS_K_PATTERN)
        k = _pc.cast(_pc.struct_field(m, "k"), pa.int64())
        uid = batch.column("user_id")
        t = pa.table({"user_id": uid, "item": k})
        import pandas as pd

        df = t.to_pandas().drop_duplicates()
        u = df["user_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "item": pa.array(df["item"].to_numpy().astype(np.int64), pa.int64()),
                "part": pa.array(u % N_COARSE_PARTS, pa.int64()),
            }
        )

    def pair_partials(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.select(["user_id", "item"]).to_pandas().drop_duplicates()
        m = df.merge(df, on="user_id")
        m = m[m["item_x"] < m["item_y"]]
        g = (
            m.groupby(["item_x", "item_y"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        a = g["item_x"].to_numpy().astype(np.int64)
        b = g["item_y"].to_numpy().astype(np.int64)
        key = a * 1_000_003 + b  # packed pair key (items are small ints)
        return pa.table(
            {
                "item_a": pa.array(a, pa.int64()),
                "item_b": pa.array(b, pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64), pa.int64()),
                "part": pa.array(key % N_COARSE_PARTS, pa.int64()),
            }
        )

    def pair_totals(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.select(["item_a", "item_b", "cnt"]).to_pandas()
        g = (
            df.groupby(["item_a", "item_b"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        g = g[g["cnt"] >= COOCCUR_MIN_SUPPORT].sort_values(
            ["cnt", "item_a", "item_b"], ascending=[False, True, True]
        ).head(COOCCUR_K)
        return pa.table(
            {
                "item_a": pa.array(g["item_a"].to_numpy(), pa.int64()),
                "item_b": pa.array(g["item_b"].to_numpy(), pa.int64()),
                "support": pa.array(g["cnt"].to_numpy().astype(np.int64), pa.int64()),
                "part": pa.array(np.zeros(len(g), np.int64), pa.int64()),
            }
        )

    def final_topk(part_tbl: pa.Table) -> pa.Table:
        df = (
            part_tbl.select(["item_a", "item_b", "support"])
            .to_pandas()
            .sort_values(
                ["support", "item_a", "item_b"], ascending=[False, True, True]
            )
            .head(COOCCUR_K)
        )
        return pa.table(
            {
                "item_a": pa.array(df["item_a"].to_numpy(), pa.int64()),
                "item_b": pa.array(df["item_b"].to_numpy(), pa.int64()),
                "support": pa.array(df["support"].to_numpy(), pa.int64()),
                "rank": pa.array(
                    np.arange(1, len(df) + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(user_items, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_totals, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final_topk, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# windowed event dedup (streaming keep-first with a TTL window)
# ---------------------------------------------------------------------------

def window_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Streaming-style event dedup: keep the FIRST event per
    (user_id, event_type) within each 1-hour tumbling window — the
    TTL-window dedup every event-ingestion pipeline runs ahead of
    sessionization (at-least-once transports re-deliver within
    minutes; a global keep-first would wrongly collapse legitimate
    repeats hours apart).

    Plan: one coarse shuffle on hash(user, type, hour) — every copy of
    a (key, window) group lands together — then a vectorized
    per-partition sort + drop_duplicates resolves all groups at once.
    Only the four projected columns shuffle; ties break on
    (ts, event_id) exactly like the oracle's ROW_NUMBER order."""
    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )

    def add_part(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        h = pc.divide(hour.cast(pa.int64()), 3_600_000_000).to_numpy(
            zero_copy_only=False
        )
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        types = batch.column("event_type").to_numpy(zero_copy_only=False)
        # process-stable type key (never Python hash(): per-process seed)
        tsum = np.array(
            [sum(t.encode()) for t in types], dtype=np.int64
        )
        part = (users * 1_000_003 + h * 10_007 + tsum) % N_COARSE_PARTS
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "user_id": batch.column("user_id"),
                "event_type": batch.column("event_type"),
                "ts": batch.column("ts"),
                "hour": pa.array(h, pa.int64()),
                "part": pa.array(part.astype(np.int64), pa.int64()),
            }
        )

    def keep_first(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(
            ["event_id", "user_id", "event_type", "ts", "hour"]
        ).to_pandas()
        df = df.sort_values(["ts", "event_id"], ignore_index=True)
        df = df.drop_duplicates(["user_id", "event_type", "hour"], keep="first")
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
                "user_id": pa.array(df["user_id"].to_numpy(), pa.int64()),
                "event_type": pa.array(df["event_type"], pa.string()),
                "ts": pa.array(df["ts"], pa.timestamp("us")),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(keep_first, batch_format="pyarrow")
    )


def top_pairs_lift(sf_dir: str) -> "ray.data.Dataset":
    """Association LIFT for the top co-occurring item pairs — the
    null-model step after support counting (Apriori's confidence/lift
    pass): for each `item_cooccurrence` survivor, attach both items'
    distinct-user marginals, the universe size, and the exact signed
    lift numerator dev = support·N − n_a·n_b (dev > 0 ⟺ lift > 1,
    positively associated; the float lift = support·N / (n_a·n_b)
    derives downstream). All integers, so the oracle is bit-exact.

    Scale shape: the pair list is the memo-shaped top-K output
    (bounded), the per-item marginal table is item-vocabulary-bounded
    (the same contract item_cooccurrence's pair emission documents) —
    one distinct (user, item) pass + tiny groupby, marginals
    broadcast once, attached in a single vectorized map. Output:
    (item_a, item_b, support, n_a, n_b, n_users, dev)."""
    import re as _re

    from ray.data.aggregate import Sum

    pairs = item_cooccurrence(sf_dir)

    # per-item distinct-user marginals + the user universe (bounded)
    def ui_partial(batch: pa.Table) -> pa.Table:
        items, users = [], []
        for u, p in zip(
            batch.column("user_id").to_pylist(),
            batch.column("props").to_pylist(),
        ):
            m = _re.search(r'"k":\s*(-?\d+)', p or "")
            if m:
                items.append(int(m.group(1)))
                users.append(int(u))
        key = np.unique(
            np.array(users, np.int64) * (1 << 21) + np.array(items, np.int64)
        )
        return pa.table(
            {
                "user": pa.array(key >> 21, pa.int64()),
                "item": pa.array(key & ((1 << 21) - 1), pa.int64()),
            }
        )

    ui = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "props"]
        )
        .map_batches(ui_partial, batch_format="pyarrow")
    )
    # exact distinct via one user-keyed fold, then bounded marginals
    def dedup_part(part_tbl: pa.Table) -> pa.Table:
        key = np.unique(
            part_tbl.column("user").to_numpy(zero_copy_only=False) * (1 << 21)
            + part_tbl.column("item").to_numpy(zero_copy_only=False)
        )
        items = key & ((1 << 21) - 1)
        u, c = np.unique(items, return_counts=True)
        users = np.unique(key >> 21)
        t = pa.table(
            {
                "item": pa.array(
                    np.concatenate((u, [-1])), pa.int64()
                ),  # -1 row carries the partition's distinct-user count
                "n_p": pa.array(
                    np.concatenate((c.astype(np.int64), [len(users)])),
                    pa.int64(),
                ),
            }
        )
        return t

    def add_part(batch: pa.Table) -> pa.Table:
        u = batch.column("user").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array(u % 64, pa.int64())
        )

    marg = (
        ui.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pyarrow")
        .groupby("item")
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
    )  # bounded: item vocabulary + 1 rows
    n_users = int(marg.loc[marg["item"] == -1, "n"].iloc[0])
    m = dict(
        zip(
            marg.loc[marg["item"] >= 0, "item"].astype(int),
            marg.loc[marg["item"] >= 0, "n"].astype(int),
        )
    )
    mref = ray.put((m, n_users))

    def attach(batch: pa.Table) -> pa.Table:
        mm, nu = ray.get(mref)
        a = batch.column("item_a").to_numpy(zero_copy_only=False)
        b = batch.column("item_b").to_numpy(zero_copy_only=False)
        s = batch.column("support").to_numpy(zero_copy_only=False)
        na = np.array([mm[int(x)] for x in a], dtype=np.int64)
        nb = np.array([mm[int(x)] for x in b], dtype=np.int64)
        return pa.table(
            {
                "item_a": pa.array(a, pa.int64()),
                "item_b": pa.array(b, pa.int64()),
                "support": pa.array(s, pa.int64()),
                "n_a": pa.array(na, pa.int64()),
                "n_b": pa.array(nb, pa.int64()),
                "n_users": pa.array(
                    np.full(len(a), nu, np.int64), pa.int64()
                ),
                "dev": pa.array(s * nu - na * nb, pa.int64()),
            }
        )

    return pairs.map_batches(attach, batch_format="pyarrow")


TRIPLE_TOP_M = 32          # mine triples within the top-M items only
TRIPLE_MIN_SUPPORT = 3
TRIPLE_K = 50


def frequent_triples(sf_dir: str) -> "ray.data.Dataset":
    """Level-3 frequent itemsets — the Apriori step above
    item_cooccurrence's pair pass: the top-TRIPLE_K item TRIPLES by
    support (distinct users holding all three), min support
    TRIPLE_MIN_SUPPORT, ties (support DESC, item_a, item_b, item_c),
    mined WITHIN the TRIPLE_TOP_M most-frequent items (ties: support
    DESC, item). The top-M gate is the practical bound every
    production basket miner applies at level ≥ 3: it caps the
    candidate lattice at C(M,3) regardless of basket density (this
    fixture's baskets average ~49 of a 100-item vocabulary — unbounded
    level-3 emission would square the pair pass for no analytic gain).

    Scale shape: stage 0 reduces to per-item distinct-user supports
    (item-vocabulary-bounded partials, driver reads ≤ |vocab| rows)
    and broadcasts the top-M id set once; stage 1 shuffles distinct
    (user, item) rows ONCE on user % P so baskets co-locate; stage 2
    emits per-partition triple partials via a vectorized double
    self-merge over the M-filtered baskets (≤ C(M,3) distinct keys per
    partition), re-keyed by packed int64 triple; stage 3 sums, applies
    the support floor and per-partition top-K prune (disjoint key sets
    make the global top-K a subset of survivors) into a one-partition
    final rank. No driver state beyond the M-item set."""
    import pandas as pd
    import pyarrow.compute as _pc

    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "props"]
    )

    def user_items(batch: pa.Table) -> pa.Table:
        m = _pc.extract_regex(batch.column("props"), PROPS_K_PATTERN)
        k = _pc.cast(_pc.struct_field(m, "k"), pa.int64())
        df = pa.table(
            {"user_id": batch.column("user_id"), "item": k}
        ).to_pandas().drop_duplicates()
        u = df["user_id"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "item": pa.array(df["item"].to_numpy().astype(np.int64), pa.int64()),
                "part": pa.array(u % N_COARSE_PARTS, pa.int64()),
            }
        )

    ui = ds.map_batches(user_items, batch_format="pyarrow")

    # stage 0: per-item distinct-user supports → driver top-M (tiny)
    def item_supports(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["user_id", "item"]).to_pandas().drop_duplicates()
        g = df.groupby("item", sort=False).size().reset_index(name="sup")
        return pa.table(
            {
                "item": pa.array(g["item"].to_numpy(), pa.int64()),
                "sup": pa.array(g["sup"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    sup: dict[int, int] = {}
    for b in (
        ui.groupby("part")
        .map_groups(item_supports, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for i, s in zip(b.column("item").to_pylist(), b.column("sup").to_pylist()):
            sup[i] = sup.get(i, 0) + s
    topm = frozenset(
        i for i, _ in sorted(sup.items(), key=lambda kv: (-kv[1], kv[0]))[:TRIPLE_TOP_M]
    )
    bcast = ray.put(topm)

    # stage 2: per-partition triple partials over M-filtered baskets
    def triple_partials(part_tbl: pa.Table) -> pa.Table:
        keep = ray.get(bcast)
        df = part_tbl.select(["user_id", "item"]).to_pandas().drop_duplicates()
        df = df[df["item"].isin(keep)]
        m2 = df.merge(df, on="user_id")
        m2 = m2[m2["item_x"] < m2["item_y"]]
        m3 = m2.merge(df.rename(columns={"item": "item_z"}), on="user_id")
        m3 = m3[m3["item_y"] < m3["item_z"]]
        g = (
            m3.groupby(["item_x", "item_y", "item_z"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        a = g["item_x"].to_numpy().astype(np.int64)
        b = g["item_y"].to_numpy().astype(np.int64)
        c = g["item_z"].to_numpy().astype(np.int64)
        key = (a * 1_000_003 + b) * 1_000_003 + c
        return pa.table(
            {
                "item_a": pa.array(a, pa.int64()),
                "item_b": pa.array(b, pa.int64()),
                "item_c": pa.array(c, pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64), pa.int64()),
                "part": pa.array(key % N_COARSE_PARTS, pa.int64()),
            }
        )

    def triple_totals(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["item_a", "item_b", "item_c", "cnt"]).to_pandas()
        g = (
            df.groupby(["item_a", "item_b", "item_c"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        g = g[g["cnt"] >= TRIPLE_MIN_SUPPORT].sort_values(
            ["cnt", "item_a", "item_b", "item_c"],
            ascending=[False, True, True, True],
        ).head(TRIPLE_K)
        return pa.table(
            {
                "item_a": pa.array(g["item_a"].to_numpy(), pa.int64()),
                "item_b": pa.array(g["item_b"].to_numpy(), pa.int64()),
                "item_c": pa.array(g["item_c"].to_numpy(), pa.int64()),
                "support": pa.array(g["cnt"].to_numpy().astype(np.int64), pa.int64()),
                "part": pa.array(np.zeros(len(g), np.int64), pa.int64()),
            }
        )

    def final_topk(part_tbl: pa.Table) -> pa.Table:
        df = (
            part_tbl.select(["item_a", "item_b", "item_c", "support"])
            .to_pandas()
            .sort_values(
                ["support", "item_a", "item_b", "item_c"],
                ascending=[False, True, True, True],
            )
            .head(TRIPLE_K)
        )
        return pa.table(
            {
                "item_a": pa.array(df["item_a"].to_numpy(), pa.int64()),
                "item_b": pa.array(df["item_b"].to_numpy(), pa.int64()),
                "item_c": pa.array(df["item_c"].to_numpy(), pa.int64()),
                "support": pa.array(df["support"].to_numpy(), pa.int64()),
                "rank": pa.array(
                    np.arange(1, len(df) + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    return (
        ui.groupby("part")
        .map_groups(triple_partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(triple_totals, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final_topk, batch_format="pyarrow")
    )
