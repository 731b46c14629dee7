"""Relational analytics operators over the fixture star schema.

Re-expressions of the reference's SQL-side operators (SURVEY.md §2.6
aggregations A1-A6, §2.7 sorts/top-k O1-O3, §2.5 joins J1/J4, M20
priority buckets, M4-M6 filters) as Ray Data plans with the shapes that
survive 100 TB:

- every aggregate is PARTIAL first (pyarrow group_by inside
  map_batches) then a small groupby over pre-reduced rows;
- small dimension tables (customer→nation, nation names) are broadcast
  via ``ray.put`` and joined as lookups inside map_batches — never an
  all-to-all shuffle join;
- money columns become integer cents per-row (floor(x*100+0.5)) BEFORE
  any sum, so results are order-independent and bit-equal to the
  DuckDB oracle regardless of reduction order.

Reference analogs cited per function (file:line into /root/reference).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """float dollars → int64 cents, floor(x*100+0.5): deterministic and
    identical to CAST(floor(x*100+0.5) AS BIGINT) in the oracle."""
    x = col.to_numpy(zero_copy_only=False)
    return pa.array(np.floor(x * 100.0 + 0.5).astype(np.int64), pa.int64())


def status_counts(sf_dir: str) -> "ray.data.Dataset":
    """A2 analog (/root/reference/src/db/documents/operations.rs:251-275):
    counts + total cents by order status."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderstatus", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderstatus": batch.column("o_orderstatus"),
                "cents": _cents(batch.column("o_totalprice")),
            }
        )
        g = t.group_by("o_orderstatus").aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return pa.table(
            {
                "o_orderstatus": g.column("o_orderstatus"),
                "cents": g.column("cents_sum"),
                "n": g.column("cents_count").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Sum("n", alias_name="n_orders"),
                   Sum("cents", alias_name="total_cents"))
    )


def source_facets(sf_dir: str) -> "ray.data.Dataset":
    """A3 analog (management.rs:150-183): doc counts per (lang, source)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )
    return ds.groupby(["lang", "source"]).aggregate(Count(alias_name="n_docs"))


def hourly_event_metrics(sf_dir: str) -> "ray.data.Dataset":
    """A5 analog (migrations/20250620100001_add_ocr_queue.sql:33-46):
    hourly per-type counts + integer-cents value sums over `events`."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        t = pa.table(
            {
                "hour": hour,
                "event_type": batch.column("event_type"),
                "value_cents": _cents(batch.column("value")),
            }
        )
        g = t.group_by(["hour", "event_type"]).aggregate(
            [("value_cents", "sum"), ("value_cents", "count")]
        )
        return pa.table(
            {
                "hour": g.column("hour"),
                "event_type": g.column("event_type"),
                "cents": g.column("value_cents_sum"),
                "n": g.column("value_cents_count").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(Sum("n", alias_name="n_events"),
                   Sum("cents", alias_name="value_cents"))
    )


def orders_per_nation(sf_dir: str) -> "ray.data.Dataset":
    """A4/J1 analog (management.rs:184-233): order counts per nation via
    BROADCAST customer→nation lookup (1 ray.put, read per task — the
    small-side join that replaces a shuffle at scale)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    cust_map = dict(
        zip(
            cust.column("c_custkey").to_pylist(),
            cust.column("c_nationkey").to_pylist(),
        )
    )
    nation_map = dict(
        zip(
            nation.column("n_nationkey").to_pylist(),
            nation.column("n_name").to_pylist(),
        )
    )
    ref = ray.put((cust_map, nation_map))

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        cmap, nmap = ray.get(ref)
        keys = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        names = [nmap[cmap[k]] for k in keys]
        t = pa.table({"n_name": pa.array(names, pa.string())})
        g = t.group_by("n_name").aggregate([("n_name", "count")])
        return pa.table(
            {
                "n_name": g.column("n_name"),
                "n": g.column("n_name_count").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("n", alias_name="n_orders"))
    )


def pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H-Q1-shaped headline aggregate over lineitem: per
    (returnflag, linestatus) counts, integer quantity sums and integer
    cent sums of base / discounted price. The widest partial-aggregate
    showcase: 600k rows at sf0.1 reduce to 4 groups before the shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        base_cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        disc_cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pa.array(np.floor(qty + 0.5).astype(np.int64), pa.int64()),
                "base_cents": pa.array(base_cents, pa.int64()),
                "disc_cents": pa.array(disc_cents, pa.int64()),
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_cents", "sum"), ("disc_cents", "sum"),
             ("qty", "count")]
        )
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "qty": g.column("qty_sum"),
                "base_cents": g.column("base_cents_sum"),
                "disc_cents": g.column("disc_cents_sum"),
                "n": g.column("qty_count").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("n", alias_name="count_order"),
            Sum("qty", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
        )
    )


def top_docs(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """O2/O3 analog (search.rs:147-151): top-k docs by size.
    sort().limit() — Ray keeps only block boundaries + k rows."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(k)


def priority_buckets(sf_dir: str) -> "ray.data.Dataset":
    """M20 priority calculator (batch_ingest.rs:281-294) re-keyed on
    n_chars: ≤1 KB → 10, ≤5 KB → 8, ≤10 KB → 6, ≤50 KB → 4, else 2."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.column("n_chars").to_numpy(zero_copy_only=False)
        prio = np.select(
            [n <= 1024, n <= 5 * 1024, n <= 10 * 1024, n <= 50 * 1024],
            [10, 8, 6, 4],
            default=2,
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": batch.column("n_chars"),
                "priority": pa.array(prio, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def filter_allowed(sf_dir: str) -> "ray.data.Dataset":
    """M4-M6 filter chain re-keyed on fixture columns: keep docs with
    100 ≤ n_chars ≤ 2000 whose source is not in the deny list, count
    the survivors per source (the allowed-type + size-gate analog,
    file_service.rs:204-214 / watcher.rs:374-385)."""
    deny = ("src13", "src7")
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(batch.column("n_chars"), 100),
                pc.less_equal(batch.column("n_chars"), 2000),
            ),
            pc.invert(pc.is_in(batch.column("source"), value_set=pa.array(deny))),
        )
        return batch.filter(keep)

    return (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"), Min("n_chars", alias_name="min_chars"),
                   Max("n_chars", alias_name="max_chars"))
    )


def median_value_by_type(sf_dir: str) -> "ray.data.Dataset":
    """Exact per-group discrete median (lower middle) of integer value
    cents per event_type — an exact-quantile aggregate the reference's
    stats endpoints lack but a training-data pipeline needs (length /
    score distributions).

    Scale note: an exact median needs the group's values together —
    here via ONE shuffle of a 2-column (type, cents) projection; at
    10^12 rows the same query becomes a t-digest/KLL sketch merge
    (approximate) or a two-pass count+offset select (exact); the
    integer-cents projection keeps this shuffle ~16 B/row."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def project(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        return pa.table(
            {"event_type": batch.column("event_type"),
             "cents": pa.array(cents, pa.int64())}
        )

    def median_group(group: pa.Table) -> pa.Table:
        v = np.sort(group.column("cents").to_numpy(zero_copy_only=False))
        med = int(v[(len(v) - 1) // 2]) if len(v) else 0
        return pa.table(
            {
                "event_type": pa.array([group.column("event_type")[0].as_py()]),
                "n_events": pa.array([len(v)], pa.int64()),
                "median_cents": pa.array([med], pa.int64()),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(median_group, batch_format="pyarrow")
    )


SAMPLE_K = 100


def hash_sample_docs(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic distributed sampling: the SAMPLE_K docs with the
    smallest md5(doc_id) — a reproducible uniform sample (hash order is
    independent of doc order/partitioning, so the SAME sample comes
    back on any cluster layout, which ad-hoc .random_sample cannot
    promise).

    Plan: per-batch local top-K by hash → global sort of (≤ K per
    block) survivors → limit K. The sort input is bounded by
    K × n_blocks tiny rows — never the corpus."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        import hashlib

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        hs = np.array(
            [hashlib.md5(str(i).encode()).hexdigest() for i in ids], dtype=object
        )
        order = np.argsort(hs, kind="stable")[:SAMPLE_K]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "sample_hash": pa.array(hs[order], pa.string()),
            }
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort("sample_hash")
        .limit(SAMPLE_K)
    )


def label_facets(sf_dir: str) -> "ray.data.Dataset":
    """J3 — document↔labels many-to-many
    (/root/reference/src/db/labels.rs join tables): each doc carries
    1-3 deterministic labels (label-((doc_id + k) % 7) for
    k < doc_id % 3 + 1); facet = per label the doc count and id range.

    Plan: vectorized explode (one batch pass, numpy repeat — no row
    loop) → per-batch partial aggregate → tiny groupby(label): the
    many-to-many join never shuffles more than (label, count, min, max)
    partials."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def explode_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n_labels = ids % 3 + 1
        doc_rep = np.repeat(ids, n_labels)
        k = np.concatenate([np.arange(n) for n in n_labels]) if len(ids) else np.array([], dtype=np.int64)
        label_no = (doc_rep + k) % 7
        t = pa.table(
            {
                "label": pa.array(
                    [f"label-{v}" for v in label_no], pa.string()
                ),
                "doc_id": pa.array(doc_rep, pa.int64()),
            }
        )
        g = t.group_by("label").aggregate(
            [("doc_id", "count"), ("doc_id", "min"), ("doc_id", "max")]
        )
        return pa.table(
            {
                "label": g.column("label"),
                "n": g.column("doc_id_count").cast(pa.int64()),
                "mn": g.column("doc_id_min"),
                "mx": g.column("doc_id_max"),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    return (
        ds.map_batches(explode_partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Min("mn", alias_name="min_doc"),
            Max("mx", alias_name="max_doc"),
        )
    )


def distinct_users_daily(sf_dir: str) -> "ray.data.Dataset":
    """Exact distributed COUNT(DISTINCT): daily active users over the
    event stream — the two-stage distinct-pair plan (the aggregate
    shape Ray Data's built-in aggregates don't cover and a naive
    groupby(day) would get wrong under combining).

    Plan: per-batch LOCAL distinct (day, user) pairs (the combiner —
    bounds the shuffle at one row per distinct pair per batch) → one
    coarse shuffle keyed on the PAIR (both columns fold into the int64
    partition hash, so all copies of a pair land together while one
    hot day still spreads over all partitions — the skew resistance a
    groupby(day) plan lacks) → per-partition global distinct +
    per-day partial counts → tiny groupby(day) sum (day cardinality).
    Everything on the wire is (int64 epoch-day, int64 user, int64
    part)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def local_pairs(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"day": day, "user_id": batch.column("user_id")})
        g = t.group_by(["day", "user_id"]).aggregate([])
        epoch_day = pc.divide(
            g.column("day").cast(pa.int64()), 86_400_000_000
        ).to_numpy(zero_copy_only=False)
        users = g.column("user_id").to_numpy(zero_copy_only=False)
        from ..stages.shuffle import N_COARSE_PARTS

        part = (epoch_day * 1_000_003 + users) % N_COARSE_PARTS
        return pa.table(
            {
                "day": g.column("day"),
                "user_id": g.column("user_id"),
                "part": pa.array(part.astype(np.int64), pa.int64()),
            }
        )

    def partition_counts(group: pa.Table) -> pa.Table:
        df = group.select(["day", "user_id"]).to_pandas()
        per_day = df.drop_duplicates().groupby("day", sort=False).size()
        return pa.table(
            {
                "day": pa.array(per_day.index, pa.timestamp("us")),
                "n": pa.array(per_day.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(local_pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(partition_counts, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n_users"))
    )


HLL_P = 8                      # 2^8 = 256 registers
HLL_W = 52                     # 60-bit md5 hash minus the bucket bits
HLL_SUFFIX_MOD = 1 << HLL_W


def _bit_length(x: np.ndarray) -> np.ndarray:
    """Vectorized int.bit_length for non-negative int64 (< 2^53):
    float log2 is exact on exactly-representable ints EXCEPT that the
    log can round across power-of-two boundaries — verify and correct
    in pure integer arithmetic (tested exhaustively around every 2^k
    in test_functions)."""
    bl = np.zeros(len(x), dtype=np.int64)
    nz = x > 0
    bl[nz] = np.floor(np.log2(x[nz])).astype(np.int64) + 1
    bad = nz & ((1 << np.maximum(bl - 1, 0)) > x)
    bl[bad] -= 1
    bad = nz & ((1 << bl) <= x)
    bl[bad] += 1
    return bl


def hll_registers(sf_dir: str) -> "ray.data.Dataset":
    """Mergeable HyperLogLog register table over ``events.user_id`` in
    EXACT integer arithmetic (Flajolet et al. 2007 — public): h =
    md5_int60(user), bucket = top HLL_P bits, rho = 1-indexed position
    of the first 1-bit in the HLL_W-bit suffix (W+1 for an all-zero
    suffix), register[bucket] = max rho. The float estimator is left to
    the consumer — the REGISTERS are the distributed artifact, and
    they are what merges: per-batch partial max (the combiner) then a
    256-group ``Max`` aggregate, so the full sketch of a 10^12-row
    stream costs one pass plus a fixed 2^P-row exchange. This is the
    sketch-merge path the exact quantile/median docstrings point to
    at scales where exact per-group state no longer fits."""
    from ..functions.textstats import md5_int60

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial_registers(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        # one md5 per DISTINCT user in the batch (C-level hash loop,
        # same idiom as every other md5-keyed op in this engine)
        uniq = np.unique(users)
        h = np.array([md5_int60(str(u)) for u in uniq], dtype=np.int64)
        bucket = h >> HLL_W
        suffix = h & (HLL_SUFFIX_MOD - 1)
        # rho = W - bit_length(suffix) + 1; all-zero suffix -> W + 1
        bl = _bit_length(suffix)
        rho = np.where(suffix > 0, HLL_W - bl + 1, HLL_W + 1)
        t = pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "rho": pa.array(rho.astype(np.int64), pa.int64()),
            }
        )
        g = t.group_by("bucket").aggregate([("rho", "max")])
        return pa.table(
            {"bucket": g.column("bucket"), "max_rho": g.column("rho_max")}
        )

    return (
        ds.map_batches(partial_registers, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Max("max_rho", alias_name="max_rho"))
    )


HIST_QS = ((50, "p50"), (90, "p90"), (99, "p99"))


def hist_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """Mergeable log2-histogram quantile sketch of event value cents
    per event_type — the sketch-merge scale path that the exact
    quantile operators' docstrings (``median_by_type``,
    ``quantile_gate``) promise at 10^12 rows, in EXACT integer
    arithmetic (power-of-two equi-depth-in-log-space histograms, the
    public HdrHistogram / DDSketch idea with log base 2 so bucket
    boundaries are integers).

    Sketch: bin(v) = bit_length(cents) — bucket k holds cents in
    [2^(k-1), 2^k), bucket 0 holds 0 — so a value column of ANY range
    compresses to ≤64 counters. Per batch the combiner emits
    (event_type, bin, n_partial) partial counts (bounded: #types ×
    64 rows per batch, independent of batch size), a fixed-size
    ``Sum`` aggregate merges them, and quantile extraction walks the
    ≤64-entry cumulative counts per type: qXX_bin = smallest bin with
    100·cum ≥ XX·n (lower-quantile convention), qXX_upper = 2^bin − 1
    (the bucket's inclusive upper bound, the sketch's guaranteed
    overestimate). Relative error is bounded by the bucket width
    (≤2×); the merge is associative and commutative, so the same
    registers accumulate across streams, runs and clusters — unlike
    the exact median's one-shuffle-of-everything.

    Scale shape: ONE streaming pass, no row-level shuffle at all —
    only the #types×64 partial-count grid moves; the final
    ``map_groups`` touches #event_type groups (small by contract:
    a facet column, not an id). Reference analog: the stats
    endpoints of /root/reference/src/routes/metrics.rs, made
    distribution-aware."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial_bins(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        bins = _bit_length(cents)
        t = pa.table(
            {"event_type": batch.column("event_type"),
             "bin": pa.array(bins, pa.int64())}
        )
        g = t.group_by(["event_type", "bin"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "bin": g.column("bin"),
                "n_partial": g.column("count_all"),
            }
        )

    def quantiles_of(group: pa.Table) -> pa.Table:
        bins = group.column("bin").to_numpy(zero_copy_only=False)
        counts = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(bins)
        bins, counts = bins[order], counts[order]
        cum = np.cumsum(counts)
        n = int(cum[-1])
        out: dict[str, "pa.Array"] = {
            "event_type": pa.array([group.column("event_type")[0].as_py()]),
            "n_events": pa.array([n], pa.int64()),
        }
        for q, name in HIST_QS:
            k = int(bins[np.argmax(100 * cum >= q * n)])
            out[f"{name}_bin"] = pa.array([k], pa.int64())
            out[f"{name}_upper"] = pa.array([(1 << k) - 1], pa.int64())
        return pa.table(out)

    return (
        ds.map_batches(partial_bins, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(Sum("n_partial", alias_name="n"))
        .groupby("event_type")
        .map_groups(quantiles_of, batch_format="pyarrow")
    )


CMS_D = 4        # count-min rows (independent hash functions)
CMS_W = 256      # counters per row


def cms_registers(sf_dir: str) -> "ray.data.Dataset":
    """Mergeable Count-Min sketch registers of per-user event
    frequency in EXACT integers (Cormode & Muthukrishnan 2005 —
    public; row hashes via Kirsch-Mitzenmacher double hashing of one
    md5, the same construction as ``bloom_gate``). Completes this
    engine's mergeable-sketch triad: HyperLogLog (``hll_registers``,
    cardinality, Max-merge), Bloom (``bloom_gate``, membership,
    OR-merge), Count-Min (frequency, Sum-merge) — the three fixed-size
    answers to "how many distinct / seen before / how often" that
    replace unbounded exact state at 10^12 rows.

    Sketch: h1/h2 = two 60-bit halves of md5(user); register row d ∈
    [0, CMS_D) column = (h1 + d·h2) mod CMS_W; register value = SUM of
    occurrences hashed there. Estimate(u) = min over d — an
    overestimate only (one-sided error ≤ εN with ε = e/W at the
    classic bound). Per batch the combiner collapses the user stream
    to the D×W partial-count grid via one value_counts + bincount per
    row (bounded output: D·W rows per batch regardless of batch
    size); a fixed 1024-group ``Sum`` merges partials, so the sketch
    of any stream costs one pass plus a fixed-size exchange, and
    register tables from different runs/clusters merge by addition.

    Scale shape: no row-level shuffle — only D×W integer partials
    move. Reference analog: the per-user activity counters of
    /root/reference/src/routes/metrics.rs, made fixed-memory."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial_grid(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(users, return_counts=True)
        hexes = [hashlib.md5(str(u).encode()).hexdigest() for u in uniq]
        h1 = np.array([int(h[:15], 16) for h in hexes], dtype=np.int64)
        h2 = np.array([int(h[15:30], 16) for h in hexes], dtype=np.int64)
        rows, poss, ns = [], [], []
        for d in range(CMS_D):
            pos = (h1 + d * h2) % CMS_W  # < 4*2^60: no int64 overflow
            grid = np.bincount(pos, weights=counts, minlength=CMS_W)
            nz = np.flatnonzero(grid)
            rows.append(np.full(len(nz), d, dtype=np.int64))
            poss.append(nz.astype(np.int64))
            ns.append(grid[nz].astype(np.int64))
        return pa.table(
            {
                "row_d": pa.array(np.concatenate(rows), pa.int64()),
                "pos": pa.array(np.concatenate(poss), pa.int64()),
                "n_partial": pa.array(np.concatenate(ns), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial_grid, batch_format="pyarrow")
        .groupby(["row_d", "pos"])
        .aggregate(Sum("n_partial", alias_name="count"))
    )


ROLLUP_ALL = "(all)"   # sentinel for the rolled-up level


def status_rollup(sf_dir: str) -> "ray.data.Dataset":
    """OLAP ROLLUP in one streaming pass: event counts and exact cent
    totals at THREE aggregation levels at once — (event_type, day),
    (event_type, *), (*, *) — the GROUP BY ROLLUP(event_type, day)
    plan, which the reference's stats endpoints issue per level
    (/root/reference/src/routes/metrics.rs) and a warehouse computes
    with one scan.

    Scale shape: each batch collapses to its (type, day) grid ONCE and
    replicates the already-aggregated grid rows to the coarser levels
    with sentinel keys (bounded: <= 2*grid+1 partials per batch,
    independent of batch size), so a single fixed-size ``Sum``
    exchange produces every level — no second scan, no per-level
    shuffle, and subtotals merge associatively across streams and
    clusters. ``lvl`` (0 = leaf, 1 = per-type, 3 = grand total)
    mirrors SQL GROUPING() so consumers can slice levels."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial_levels(batch: pa.Table) -> pa.Table:
        days = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(str)
        )
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": pa.array(days, pa.string()),
                "cents": pa.array(cents, pa.int64()),
            }
        )
        g = t.group_by(["event_type", "day"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        et = g.column("event_type").to_pylist()
        dy = g.column("day").to_pylist()
        cs = g.column("cents_sum").to_numpy(zero_copy_only=False)
        cn = g.column("cents_count").to_numpy(zero_copy_only=False)
        n = len(et)
        # leaf + per-type + grand-total partials from the SAME grid
        out_type = et + et + [ROLLUP_ALL]
        out_day = dy + [ROLLUP_ALL] * n + [ROLLUP_ALL]
        out_lvl = [0] * n + [1] * n + [3]
        out_sum = np.concatenate([cs, cs, [cs.sum()]]).astype(np.int64)
        out_n = np.concatenate([cn, cn, [cn.sum()]]).astype(np.int64)
        return pa.table(
            {
                "event_type": pa.array(out_type, pa.string()),
                "day": pa.array(out_day, pa.string()),
                "lvl": pa.array(out_lvl, pa.int64()),
                "cents": pa.array(out_sum, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial_levels, batch_format="pyarrow")
        .groupby(["event_type", "day", "lvl"])
        .aggregate(
            Sum("n", alias_name="n_events"),
            Sum("cents", alias_name="total_cents"),
        )
    )


RANK_KEY_BUCKETS = 64     # key-range buckets per source for the sort-rank


def percentile_rank(sf_dir: str) -> "ray.data.Dataset":
    """Exact window-function RANK() / PERCENT_RANK() within source by
    ``n_chars`` — FULL per-row rank assignment, the heavy member of
    the window family (``quantile_gate`` emits per-group thresholds,
    ``stratified_sample`` keeps top-k; this ranks every row). Output
    per doc: rank (1 + #rows in the same source with strictly smaller
    key — SQL RANK() tie semantics) and the source's row count, so
    PERCENT_RANK() = (rnk-1)/(n_source-1) is exact integer arithmetic
    for any consumer.

    Scale shape — a distributed sort-rank, NOT a per-group sort: at
    10^12 rows one source never fits a partition (the sessionize-style
    "group fits" assumption fails), so the rank splits into
    bucket-prefix + within-bucket offset, the ``pack_sequences``
    prefix-sum machinery generalized to RANK: pass 1 counts rows per
    (source, key-range bucket) — a bounded #sources × RANK_KEY_BUCKETS
    grid reaches the driver and the per-source EXCLUSIVE prefix counts
    are broadcast once — and pass 2 shuffles rows ONCE on the
    composite (source, bucket) key and ranks bucket-locally with one
    sort + searchsorted. Equal keys always share a bucket (bucket =
    (key-lo)//width), so ties never straddle the prefix boundary, and
    a skewed source spreads across RANK_KEY_BUCKETS partitions instead
    of melting one."""
    import zlib

    from ray.data.aggregate import Max, Min

    path = f"{sf_dir}/documents.parquet"
    lohi = ray.data.read_parquet(path, columns=["n_chars"]).aggregate(
        Min("n_chars"), Max("n_chars")
    )
    lo, hi = int(lohi["min(n_chars)"]), int(lohi["max(n_chars)"])
    width = (hi - lo) // RANK_KEY_BUCKETS + 1

    def keyed(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_pylist()
        k = batch.column("n_chars").to_numpy(zero_copy_only=False)
        kb = (k - lo) // width
        part = np.array(
            [zlib.crc32(f"{s}|{b}".encode()) for s, b in zip(src, kb)],
            dtype=np.int64,
        ) % (8 * RANK_KEY_BUCKETS)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "n_chars": pa.array(k, pa.int64()),
                "kb": pa.array(kb, pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    rows = ray.data.read_parquet(
        path, columns=["doc_id", "source", "n_chars"]
    ).map_batches(keyed, batch_format="pyarrow")

    # pass 1: the (source, bucket) count grid — bounded, never rows
    def grid_counts(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["source", "kb"])
            .group_by(["source", "kb"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "source": g.column("source"),
                "kb": g.column("kb"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    grid: dict[str, np.ndarray] = {}
    for b in rows.map_batches(grid_counts, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for s, kb, n in zip(
            b.column("source").to_pylist(),
            b.column("kb").to_pylist(),
            b.column("n").to_pylist(),
        ):
            acc = grid.setdefault(s, np.zeros(RANK_KEY_BUCKETS, dtype=np.int64))
            acc[kb] += n
    prefix = {
        s: np.concatenate(([0], np.cumsum(c)[:-1])) for s, c in grid.items()
    }
    totals = {s: int(c.sum()) for s, c in grid.items()}
    bcast = ray.put((prefix, totals))

    # pass 2: one composite-key shuffle, bucket-local sort-rank
    def rank_part(part_tbl: pa.Table) -> pa.Table:
        pre, tot = ray.get(bcast)
        df = part_tbl.to_pandas()
        out = []
        for (s, kb), sub in df.groupby(["source", "kb"], sort=False):
            k = sub["n_chars"].to_numpy()
            order = np.sort(k)
            rnk = pre[s][int(kb)] + np.searchsorted(order, k, side="left") + 1
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(sub["doc_id"].to_numpy(), pa.int64()),
                        "source": pa.array(sub["source"], pa.string()),
                        "n_chars": pa.array(k, pa.int64()),
                        "rnk": pa.array(rnk.astype(np.int64), pa.int64()),
                        "n_source": pa.array(
                            np.full(len(sub), tot[s], dtype=np.int64), pa.int64()
                        ),
                    }
                )
            )
        return pa.concat_tables(out)

    return rows.groupby("part").map_groups(rank_part, batch_format="pyarrow")


def pivot_daily(sf_dir: str) -> "ray.data.Dataset":
    """Wide-format pivot (crosstab): one row per day, one count column
    per event_type plus the day total — the reporting shape every
    dashboard asks of long-format event logs. The column domain is
    discovered with a tiny distinct scan (event_type is a facet
    column, small by contract), then each batch collapses to its
    day × type grid and emits ALREADY-WIDE partial rows, so a single
    fixed-width ``Sum`` exchange per day produces the pivot — no
    row-level shuffle, no per-type pass, and partials merge
    associatively across streams and clusters."""
    path = f"{sf_dir}/events.parquet"
    types = sorted(
        ray.data.read_parquet(path, columns=["event_type"]).unique("event_type")
    )

    def wide_partials(batch: pa.Table) -> pa.Table:
        days = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(str)
        )
        et = np.asarray(batch.column("event_type").to_pylist())
        uday, day_idx = np.unique(days, return_inverse=True)
        cols: dict[str, pa.Array] = {"day": pa.array(uday, pa.string())}
        total = np.zeros(len(uday), dtype=np.int64)
        for t in types:
            cnt = np.bincount(
                day_idx[et == t], minlength=len(uday)
            ).astype(np.int64)
            cols[f"n_{t}"] = pa.array(cnt, pa.int64())
            total += cnt
        cols["n_total"] = pa.array(total, pa.int64())
        return pa.table(cols)

    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in types]
    aggs.append(Sum("n_total", alias_name="n_total"))
    return (
        ray.data.read_parquet(path, columns=["ts", "event_type"])
        .map_batches(wide_partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(*aggs)
    )


HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def order_priority_join(sf_dir: str) -> "ray.data.Dataset":
    """The big-big co-partitioned equi-join (TPC-H Q12 shape): lineitem
    ⋈ orders on orderkey — BOTH sides fact-scale, so neither may be
    broadcast — then per l_returnflag the high/low-priority line
    counts and exact revenue cents. Completes the join inventory:
    broadcast dim join (orders_per_nation), semi/anti
    (suppression_antijoin, retry_selection), asof/range interval
    joins, and now the shuffle equi-join of two large relations.

    Scale shape: each side projects to its join columns only (orders:
    key + a precomputed is_high bit; lineitem: key + flag + cents —
    never a wide row), both are hash-co-partitioned on the SAME
    ``orderkey % N_COARSE_PARTS`` map, and the union shuffles ONCE so
    every partition holds matching key ranges of both sides. Inside a
    partition the probe is a vectorized Series.map (orders side
    becomes the build dict), and the partition emits only its
    (returnflag × is_high) partial counts — bounded, independent of
    partition size — so the final exchange is a handful of rows.
    Skew: orderkey is a synthetic dense key, uniformly spread by the
    mod; a skewed real key would salt the build side the same way
    dedup's hot-bucket drop documents."""
    from ..stages.shuffle import N_COARSE_PARTS

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice"],
    )

    def order_side(batch: pa.Table) -> pa.Table:
        keys = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        pri = batch.column("o_orderpriority").to_pylist()
        is_high = np.array(
            [1 if p in HIGH_PRIORITIES else 0 for p in pri], dtype=np.int64
        )
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "is_high": pa.array(is_high, pa.int64()),
                "flag": pa.array([""] * len(keys), pa.string()),
                "cents": pa.array(np.zeros(len(keys), np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(keys), np.int64), pa.int64()),
                "part": pa.array(keys % N_COARSE_PARTS, pa.int64()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        keys = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "is_high": pa.array(np.zeros(len(keys), np.int64), pa.int64()),
                "flag": batch.column("l_returnflag"),
                "cents": pa.array(cents, pa.int64()),
                "side": pa.array(np.ones(len(keys), np.int64), pa.int64()),
                "part": pa.array(keys % N_COARSE_PARTS, pa.int64()),
            }
        )

    both = orders.map_batches(order_side, batch_format="pyarrow").union(
        lines.map_batches(line_side, batch_format="pyarrow")
    )

    def join_part(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("key")["is_high"]
        probe = df[df["side"] == 1]
        hi = probe["key"].map(build)
        t = pd.DataFrame(
            {"flag": probe["flag"], "hi": hi.to_numpy(), "cents": probe["cents"]}
        ).dropna(subset=["hi"])  # inner join: unmatched probe rows drop
        g = t.groupby(["flag", "hi"], sort=False).agg(
            n=("cents", "size"), cents=("cents", "sum")
        ).reset_index()
        return pa.table(
            {
                "flag": pa.array(g["flag"], pa.string()),
                "hi": pa.array(g["hi"].astype(np.int64), pa.int64()),
                "n": pa.array(g["n"].astype(np.int64), pa.int64()),
                "cents": pa.array(g["cents"].astype(np.int64), pa.int64()),
            }
        )

    partials = both.groupby("part").map_groups(join_part, batch_format="pyarrow")

    def finalize(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        hi_n = df["n"].where(df["hi"] == 1, 0)
        lo_n = df["n"].where(df["hi"] == 0, 0)
        out = (
            pd.DataFrame(
                {
                    "l_returnflag": df["flag"],
                    "high_line_count": hi_n,
                    "low_line_count": lo_n,
                    "n_lines": df["n"],
                    "revenue_cents": df["cents"],
                }
            )
            .groupby("l_returnflag", sort=False)
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
                "high_line_count": pa.array(
                    out["high_line_count"].astype(np.int64), pa.int64()
                ),
                "low_line_count": pa.array(
                    out["low_line_count"].astype(np.int64), pa.int64()
                ),
                "n_lines": pa.array(out["n_lines"].astype(np.int64), pa.int64()),
                "revenue_cents": pa.array(
                    out["revenue_cents"].astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        partials.map_batches(finalize, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("high_line_count", alias_name="high_line_count"),
            Sum("low_line_count", alias_name="low_line_count"),
            Sum("n_lines", alias_name="n_lines"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order clustering keys (multi-dimensional data layout / OPTIMIZE ZORDER)
# ---------------------------------------------------------------------------

ZORDER_BITS = 16      # bits per dimension (32-bit z-value)
ZORDER_BUCKETS = 64   # target layout files (z-range buckets)


def zorder_keys(sf_dir: str) -> "ray.data.Dataset":
    """Z-order (Morton) clustering keys over (user_id, event hour):
    interleave the low ZORDER_BITS bits of each dimension into a
    32-bit z-value and assign each event to one of ZORDER_BUCKETS
    z-range buckets — the multi-dimensional data-layout primitive
    behind lakehouse OPTIMIZE ZORDER: co-locating rows close in BOTH
    dimensions so min/max zone maps prune scans filtered on either.
    Returns (event_id, zval, bucket).

    Scale shape: one map-only streaming pass (the bit interleave is 16
    vectorized numpy shift/mask ops); the layout rewrite itself would
    be ``.sort("zval")`` + partitioned write — the sort is the one
    unavoidable all-to-all, identical to the training_shuffle plan.
    Oracle: the identical unrolled 16-term shift/mask expression."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def add_z(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts_us = (
            batch.column("ts")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        x = (uid % (1 << ZORDER_BITS)).astype(np.int64)
        y = ((ts_us // 3_600_000_000) % (1 << ZORDER_BITS)).astype(np.int64)
        z = np.zeros(len(x), dtype=np.int64)
        for i in range(ZORDER_BITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "zval": pa.array(z, pa.int64()),
                "bucket": pa.array(
                    z >> (2 * ZORDER_BITS - 6), pa.int64()
                ),  # 2^6 = ZORDER_BUCKETS
            }
        )

    return ds.map_batches(add_z, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact-integer grouped least-squares trend (statistical-moment aggregate)
# ---------------------------------------------------------------------------

def trend_slopes(sf_dir: str) -> "ray.data.Dataset":
    """Per event_type, the least-squares slope of value-vs-time as an
    EXACT integer rational: slope = slope_num / slope_den with
    slope_num = n·Σxy − Σx·Σy and slope_den = n·Σx² − (Σx)², where
    x = event hour since the corpus' first hour and y = integer cents.
    The statistical-moment aggregate class (regression/covariance)
    beyond sum/count — merged from per-batch partial moment vectors,
    so it distributes exactly like a sum.

    Scale shape: one tiny Min aggregate for the hour origin, then one
    streaming pass emitting per-(batch × type) moment rows (n, Σx, Σy,
    Σxy, Σx²) — five int64s per type per batch — and a small groupby
    over #types rows. No float crosses the boundary. int64 headroom:
    n·Σxy peaks ~2e18 at sf0.1 (documented dial: coarser hour grain or
    per-window partials at larger corpora)."""
    from ray.data.aggregate import Min

    path = f"{sf_dir}/events.parquet"
    origin = ray.data.read_parquet(path, columns=["ts"]).aggregate(Min("ts"))
    min_hour = int(
        pa.scalar(origin["min(ts)"]).cast(pa.int64()).as_py() // 3_600_000_000
    )

    ds = ray.data.read_parquet(path, columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ts_us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = (ts_us // 3_600_000_000 - min_hour).astype(np.int64)
        y = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": batch.column("event_type").to_pylist(),
                "n": np.ones(len(x), np.int64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        g = df.groupby("event_type", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def finalize(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.to_pandas()
        et = df["event_type"].iloc[0]
        n = int(df["n"].sum())
        sx, sy = int(df["sx"].sum()), int(df["sy"].sum())
        sxy, sxx = int(df["sxy"].sum()), int(df["sxx"].sum())
        return pa.table(
            {
                "event_type": pa.array([et], pa.string()),
                "n": pa.array([n], pa.int64()),
                "slope_num": pa.array([n * sxy - sx * sy], pa.int64()),
                "slope_den": pa.array([n * sxx - sx * sx], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finalize, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# argmax-per-group reduction (SELECT DISTINCT ON / idxmax class)
# ---------------------------------------------------------------------------

def argmax_by_source(sf_dir: str) -> "ray.data.Dataset":
    """One row per source: its LONGEST document (argmax n_chars, tie →
    min doc_id) — the argmax-per-group REDUCTION (DISTINCT ON /
    idxmax), distinct from percentile_rank's full windowed output: the
    result is one row per group and the combine is mergeable (argmax
    of per-batch argmaxes), so it never ranks or sorts the corpus.
    Returns (source, doc_id, n_chars).

    Scale shape: per-batch vectorized idxmax per source (pandas
    groupby-idxmax over the batch), then a tiny groupby over
    #sources × #batches candidate rows — the same partial→final shape
    as every aggregate here. No shuffle of the corpus."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        # argmax with tie → min doc_id: sort keys then take first
        df = df.sort_values(
            ["source", "n_chars", "doc_id"],
            ascending=[True, False, True],
            kind="stable",
        ).drop_duplicates("source")
        return pa.Table.from_pandas(
            df[["source", "doc_id", "n_chars"]], preserve_index=False
        )

    def final(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.to_pandas().sort_values(
            ["source", "n_chars", "doc_id"],
            ascending=[True, False, True],
            kind="stable",
        ).drop_duplicates("source")
        return pa.Table.from_pandas(
            df[["source", "doc_id", "n_chars"]], preserve_index=False
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# snowflake star join: fact ⋈ supplier → nation → region, ⋈ part
# ---------------------------------------------------------------------------

def regional_brand_revenue(sf_dir: str) -> "ray.data.Dataset":
    """Revenue by (region, part brand): ONE streaming pass over the
    lineitem fact with the entire dimension snowflake — supplier →
    nation → region chain and the part→brand map — broadcast once
    (ray.put) and applied as vectorized lookups per batch, then a tiny
    groupby over (#regions × #brands) pre-reduced rows. The star-schema
    join class that exercises every remaining fixture table (region,
    supplier, part). Revenue = Σ floor(extendedprice·(1−discount)·100
    + 0.5) in exact cents, discounted BEFORE rounding like the TPC-H
    revenue expression, mirrored term-for-term by the oracle.

    Scale shape: dims are small by star-schema definition — the
    supplier→region and part→brand maps are one broadcast object read
    per task, never a shuffle; the fact table never leaves its scan
    partitioning and only (region, brand, partial sums) rows exchange."""
    import pyarrow.parquet as pq

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    n2r = dict(
        zip(
            nation.column("n_nationkey").to_pylist(),
            nation.column("n_regionkey").to_pylist(),
        )
    )
    r2name = dict(
        zip(
            region.column("r_regionkey").to_pylist(),
            region.column("r_name").to_pylist(),
        )
    )
    supp_region = {
        s: r2name[n2r[n]]
        for s, n in zip(
            supp.column("s_suppkey").to_pylist(),
            supp.column("s_nationkey").to_pylist(),
        )
    }
    part_brand = dict(
        zip(
            part.column("p_partkey").to_pylist(),
            part.column("p_brand").to_pylist(),
        )
    )
    ref = ray.put((supp_region, part_brand))

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        smap, pmap = ray.get(ref)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        ep = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame(
            {
                "r_name": pd.Series(sk).map(smap).to_numpy(),
                "p_brand": pd.Series(pk).map(pmap).to_numpy(),
                "cents": cents,
                "n": np.ones(len(sk), np.int64),
            }
        )
        g = (
            df.groupby(["r_name", "p_brand"], sort=False)[["cents", "n"]]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["r_name", "p_brand"])
        .aggregate(
            Sum("cents", alias_name="revenue_cents"),
            Sum("n", alias_name="n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# shared-scan batch of group-bys (LMFAO-style grouping sets)
# ---------------------------------------------------------------------------

def multi_groupby(sf_dir: str) -> "ray.data.Dataset":
    """A BATCH of group-by aggregates over ONE shared scan (the LMFAO
    idea — VLDB 2020 'An Engine for Batches of Group-By Aggregates',
    see PAPERS.md): three grouping sets of lineitem —
    grid 0: (returnflag, linestatus); grid 1: (returnflag); grid 2:
    (ship month) — each with line count + exact revenue cents, all
    produced from a single pass that emits per-batch partials tagged
    with their grid id. The GROUPING SETS generalization of
    status_rollup's hierarchy: sets need not nest, and the fact table
    is read once however many aggregates ride on it.

    Scale shape: one pruned scan; per batch one vectorized pandas
    groupby per grid over the SAME in-memory columns (no re-scan, no
    extra shuffle per grid); the exchange carries only
    (grid, key1, key2, partials) rows bounded by the grids'
    cardinalities × batches."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_shipdate", "l_extendedprice"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["cents"] = np.floor(
            df["l_extendedprice"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        df["month"] = pd.Series(df["l_shipdate"]).dt.strftime("%Y-%m")
        df["n"] = np.int64(1)
        grids = [
            (0, df.groupby(["l_returnflag", "l_linestatus"], sort=False)),
            (1, df.groupby(["l_returnflag"], sort=False)),
            (2, df.groupby(["month"], sort=False)),
        ]
        out = []
        for gid, g in grids:
            agg = g[["n", "cents"]].sum().reset_index()
            keys = agg.columns[:-2]
            out.append(
                pd.DataFrame(
                    {
                        "grid": np.full(len(agg), gid, np.int64),
                        "key1": agg[keys[0]].astype(str),
                        "key2": agg[keys[1]].astype(str)
                        if len(keys) > 1
                        else [""] * len(agg),
                        "n": agg["n"].to_numpy().astype(np.int64),
                        "cents": agg["cents"].to_numpy().astype(np.int64),
                    }
                )
            )
        return pa.Table.from_pandas(pd.concat(out), preserve_index=False)

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["grid", "key1", "key2"])
        .aggregate(
            Sum("n", alias_name="n_lines"),
            Sum("cents", alias_name="revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Pareto-frontier (skyline) selection
# ---------------------------------------------------------------------------

def _skyline2d(n: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D maxima (skyline) of points
    (n, c): a point survives iff NO other point is ≥ in both
    coordinates and > in at least one. Equal duplicate points all
    survive (neither strictly dominates). Sort-and-sweep, fully
    vectorized: sort (n desc, c desc); within each distinct n only the
    max-c points can survive; across n levels a level survives iff its
    cmax strictly exceeds every cmax at a larger n (exclusive running
    max). O(m log m), no Python loop."""
    m = len(n)
    if m == 0:
        return np.zeros(0, bool)
    order = np.lexsort((-c, -n))
    ns, cs = n[order], c[order]
    new_n = np.empty(m, bool)
    new_n[0] = True
    new_n[1:] = ns[1:] != ns[:-1]
    grp = np.cumsum(new_n) - 1
    cmax = cs[new_n]                       # first of each n-group = its max c
    excl = np.empty_like(cmax)
    excl[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(cmax[:-1], out=excl[1:])
    keep_grp = cmax > excl
    keep_sorted = keep_grp[grp] & (cs == cmax[grp])
    keep = np.zeros(m, bool)
    keep[order] = keep_sorted
    return keep


def skyline_users(sf_dir: str) -> "ray.data.Dataset":
    """Pareto-frontier (skyline) selection — the multi-objective
    maxima class (Börzsönyi et al., ICDE 2001), which no single
    ranking, top-k, or per-dimension quantile gate expresses: users
    whose (n_events, total_cents) engagement point is dominated by no
    other user (v dominates u iff ≥ on both coordinates, > on one).
    The curation use: picking the quality-vs-quantity frontier of
    sources/domains before assigning mix weights.

    Plan (distribute-then-merge, exact):
      1. per-user aggregates via one coarse shuffle on hash(user) —
         per-batch partial (count, cents-sum) combiners first, so only
         pre-reduced int64 rows shuffle;
      2. each partition computes its LOCAL skyline with the vectorized
         sort-and-sweep kernel (`_skyline2d`);
      3. local skylines union into ONE final task and the same kernel
         runs once more — sound because dominance is transitive: a
         globally dominated point is dominated by a global-skyline
         point, which survives its own partition's local pass.
    Scale: the merge task holds only the union of local skylines —
    expected O(log m) per partition for 2-D data; the worst case
    (perfectly anti-correlated coordinates) degrades toward O(n), and
    the dial is a per-dimension pre-gate (quantile_gate) ahead of the
    frontier. Only (user, n, cents) int64 triples ever shuffle."""
    from ..stages.shuffle import int_partition

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(batch.column("value")).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(users, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        c = np.bincount(inv, weights=cents).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uniq, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "cents": pa.array(c, pa.int64()),
                "part": pa.array(int_partition(uniq), pa.int64()),
            }
        )

    def local_skyline(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["user_id", "n", "cents"]).to_pandas()
        g = df.groupby("user_id", sort=False).sum()
        n = g["n"].to_numpy().astype(np.int64)
        c = g["cents"].to_numpy().astype(np.int64)
        keep = _skyline2d(n, c)
        return pa.table(
            {
                "user_id": pa.array(
                    g.index.to_numpy().astype(np.int64)[keep], pa.int64()
                ),
                "n_events": pa.array(n[keep], pa.int64()),
                "total_cents": pa.array(c[keep], pa.int64()),
                "part2": pa.array(np.zeros(int(keep.sum()), np.int64), pa.int64()),
            }
        )

    def final_skyline(part_tbl: pa.Table) -> pa.Table:
        n = part_tbl.column("n_events").to_numpy(zero_copy_only=False)
        c = part_tbl.column("total_cents").to_numpy(zero_copy_only=False)
        keep = _skyline2d(n.astype(np.int64), c.astype(np.int64))
        return pa.table(
            {
                "user_id": pa.array(
                    part_tbl.column("user_id").to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "n_events": pa.array(n[keep].astype(np.int64), pa.int64()),
                "total_cents": pa.array(c[keep].astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(local_skyline, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(final_skyline, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# data-quality constraint audit
# ---------------------------------------------------------------------------

AUDIT_CHECKS = (
    "lineitem_discount_range",
    "lineitem_nonpositive_price",
    "orders_invalid_status",
    "events_null_props",
    "orders_dup_pk",
    "customer_dup_pk",
    "orders_orphan_custkey",
    "lineitem_orphan_orderkey",
    "lineitem_ship_before_order",
)


def data_quality_audit(sf_dir: str) -> "ray.data.Dataset":
    """Constraint-validation report — the data-quality audit class
    (expectation suites / dbt tests): one row per named check with its
    exact violation count, covering the three constraint families a
    pipeline gate needs:

    - RANGE/FORMAT (vectorized single-pass scans, partial counts per
      batch): discounts outside [0,1], non-positive prices, unknown
      order status codes, null/empty event props;
    - UNIQUENESS (exact distributed distinct): duplicate primary keys
      as rows − distinct(key), key-partitioned so every copy of a key
      lands in one partition and per-partition nunique sums are exact;
    - REFERENTIAL (co-partitioned anti-join / join, both sides
      fact-scale so neither broadcasts): orphan o_custkey vs customer,
      orphan l_orderkey vs orders, and the cross-table ORDER of events
      rule l_shipdate < o_orderdate.

    Scale shape — ONE shuffle for the whole suite: every check's rows
    ride a single unified (grp, key, dt, side, part) relation. Each
    base table is read ONCE (pruned to the union of the columns its
    checks need) and its batch fn emits the tagged key rows for ALL
    checks touching that table — the scan-family counts fold to one
    tiny grp row per batch with the count in ``key``. One
    groupby(part) co-locates every key family at once (grp
    disambiguates; all five key checks hash the same int64 key space
    with the same mod-N function, so co-partitioning is free), the
    per-partition fn computes all nine counts, and one final
    groupby(check_name) Sum over ≤ 64×9 int64 partial rows finishes.
    Explicit zero rows per partition keep absent violations visible.
    The first cut unioned five independently-shuffled sub-plans (six
    barriers total); this form is the same math in one exchange — the
    multi-groupby/LMFAO shared-scan idea applied to a validation
    suite. At 100 TB: one pass over each table's projected columns +
    one key exchange, nothing but int64 counts reaches the driver."""
    from ..stages.shuffle import N_COARSE_PARTS

    GRP_NAMES = {
        0: "orders_dup_pk",
        1: "customer_dup_pk",
        2: "orders_orphan_custkey",
        3: "lineitem_orphan_orderkey",
        4: "lineitem_ship_before_order",
        5: "lineitem_discount_range",
        6: "lineitem_nonpositive_price",
        7: "orders_invalid_status",
        8: "events_null_props",
    }
    SCAN_GRPS = (5, 6, 7, 8)

    def _rows(grp, key, dt=None, side=0):
        n = len(key)
        return pa.table(
            {
                "grp": pa.array(np.full(n, grp, np.int64), pa.int64()),
                "key": pa.array(key.astype(np.int64), pa.int64()),
                "dt": pa.array(
                    (dt if dt is not None else np.zeros(n)).astype(np.int64),
                    pa.int64(),
                ),
                "side": pa.array(np.full(n, side, np.int64), pa.int64()),
                "part": pa.array(
                    (key.astype(np.int64) % N_COARSE_PARTS), pa.int64()
                ),
            }
        )

    def _scan_row(grp: int, count: int) -> pa.Table:
        return pa.table(
            {
                "grp": pa.array([grp], pa.int64()),
                "key": pa.array([count], pa.int64()),
                "dt": pa.array([0], pa.int64()),
                "side": pa.array([0], pa.int64()),
                "part": pa.array([0], pa.int64()),
            }
        )

    def orders_rows(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        bad_status = int(
            (
                ~np.isin(
                    np.asarray(batch.column("o_orderstatus").to_pylist()),
                    ("O", "F", "P"),
                )
            ).sum()
        )
        return pa.concat_tables(
            [
                _rows(0, ok),  # dup-PK check
                _rows(2, ck, side=1),  # orphan custkey: child side
                _rows(3, ok, side=0),  # orphan orderkey: parent side
                _rows(4, ok, dt=od, side=0),  # date rule: order side
                _scan_row(7, bad_status),
            ]
        )

    def customer_rows(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.concat_tables([_rows(1, ck), _rows(2, ck, side=0)])

    def lineitem_rows(batch: pa.Table) -> pa.Table:
        lk = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        sd = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        return pa.concat_tables(
            [
                _rows(3, lk, side=1),  # orphan orderkey: child side
                _rows(4, lk, dt=sd, side=1),  # date rule: line side
                _scan_row(5, int(((disc < 0) | (disc > 1)).sum())),
                _scan_row(6, int((price <= 0).sum())),
            ]
        )

    def events_rows(batch: pa.Table) -> pa.Table:
        n = int(
            pc.sum(
                pc.or_kleene(
                    pc.is_null(batch.column("props")),
                    pc.equal(batch.column("props"), ""),
                ).cast(pa.int64())
            ).as_py()
            or 0
        )
        return _scan_row(8, n)

    unified = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus"],
        )
        .map_batches(orders_rows, batch_format="pyarrow")
        .union(
            ray.data.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_custkey"]
            ).map_batches(customer_rows, batch_format="pyarrow")
        )
        .union(
            ray.data.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=[
                    "l_orderkey",
                    "l_shipdate",
                    "l_discount",
                    "l_extendedprice",
                ],
            ).map_batches(lineitem_rows, batch_format="pyarrow")
        )
        .union(
            ray.data.read_parquet(
                f"{sf_dir}/events.parquet", columns=["props"]
            ).map_batches(events_rows, batch_format="pyarrow")
        )
    )

    def all_checks(part_tbl: pa.Table) -> pa.Table:
        grp = part_tbl.column("grp").to_numpy(zero_copy_only=False)
        key = part_tbl.column("key").to_numpy(zero_copy_only=False)
        dt = part_tbl.column("dt").to_numpy(zero_copy_only=False)
        side = part_tbl.column("side").to_numpy(zero_copy_only=False)
        counts = {g: 0 for g in GRP_NAMES}
        for g in (0, 1):  # uniqueness: rows - distinct
            k = key[grp == g]
            counts[g] = int(len(k) - len(np.unique(k)))
        for g in (2, 3):  # referential anti-join
            m = grp == g
            parents = key[m & (side == 0)]
            children = key[m & (side == 1)]
            counts[g] = int((~np.isin(children, parents)).sum())
        m = grp == 4  # cross-table date rule via a local hash join
        bk, bd = key[m & (side == 0)], dt[m & (side == 0)]
        pk, pd_ = key[m & (side == 1)], dt[m & (side == 1)]
        if len(pk) and len(bk):
            order = np.argsort(bk, kind="stable")
            bk, bd = bk[order], bd[order]
            pos = np.minimum(np.searchsorted(bk, pk), len(bk) - 1)
            found = bk[pos] == pk  # orphan lines join to nothing
            counts[4] = int((found & (pd_ < bd[pos])).sum())
        for g in SCAN_GRPS:  # scan partials carried in `key`
            counts[g] = int(key[grp == g].sum())
        return pa.table(
            {
                "check_name": pa.array(
                    [GRP_NAMES[g] for g in sorted(GRP_NAMES)], pa.string()
                ),
                "n": pa.array(
                    [counts[g] for g in sorted(GRP_NAMES)], pa.int64()
                ),
            }
        )

    return (
        unified.groupby("part")
        .map_groups(all_checks, batch_format="pyarrow")
        .groupby("check_name")
        .aggregate(Sum("n", alias_name="n_violations"))
    )


# ---------------------------------------------------------------------------
# dataset profiling + robust (MAD) outlier gating
# ---------------------------------------------------------------------------

def profile_columns(sf_dir: str) -> "ray.data.Dataset":
    """Dataset profiler — the statistics-collection sibling of
    data_quality_audit (what a catalog / zone-map builder records per
    column before anyone writes constraints): for each profiled
    lineitem column, exact min, max, null count and exact distinct
    count, as (column, stat, value) rows in integer cents/units.

    Plan: min/max/nulls are per-batch partials folded by one tiny
    groupby; exact ndv rides the same key-partitioned distinct plan as
    the audit's duplicate-PK check (all copies of a value co-locate,
    per-partition nunique sums are exact). Only (column-id, value)
    int64 pairs shuffle for the ndv half; the min/max half never
    shuffles more than #columns × #batches rows."""
    from ..stages.shuffle import N_COARSE_PARTS

    cols = {
        "l_quantity": lambda b: np.floor(
            b.column("l_quantity").to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64),
        "l_extendedprice": lambda b: np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
            + 0.5
        ).astype(np.int64),
        "l_partkey": lambda b: b.column("l_partkey").to_numpy(
            zero_copy_only=False
        ),
    }
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=list(cols)
    )

    def partials(batch: pa.Table) -> pa.Table:
        names, stats, vals = [], [], []
        for name, fn in cols.items():
            v = fn(batch)
            nulls = int(batch.column(name).null_count)
            names += [name] * 3
            stats += ["min", "max", "nulls"]
            vals += [int(v.min()), int(v.max()), nulls]
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "stat": pa.array(stats, pa.string()),
                "value": pa.array(vals, pa.int64()),
            }
        )

    minmax = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["column", "stat"])
        .aggregate(
            Min("value", alias_name="mn"),
            Max("value", alias_name="mx"),
            Sum("value", alias_name="sm"),
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "column": b.column("column"),
                    "stat": b.column("stat"),
                    "value": pa.array(
                        np.where(
                            np.asarray(b.column("stat").to_pylist()) == "min",
                            b.column("mn").to_numpy(zero_copy_only=False),
                            np.where(
                                np.asarray(b.column("stat").to_pylist()) == "max",
                                b.column("mx").to_numpy(zero_copy_only=False),
                                b.column("sm").to_numpy(zero_copy_only=False),
                            ),
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def ndv_rows(batch: pa.Table) -> pa.Table:
        names, keys = [], []
        for ci, (name, fn) in enumerate(sorted(cols.items())):
            v = np.unique(fn(batch))
            names.append(np.full(len(v), ci, np.int64))
            keys.append(v)
        ci_arr = np.concatenate(names)
        k_arr = np.concatenate(keys)
        return pa.table(
            {
                "ci": pa.array(ci_arr, pa.int64()),
                "key": pa.array(k_arr, pa.int64()),
                "part": pa.array(
                    (ci_arr * 1_000_003 + k_arr) % N_COARSE_PARTS, pa.int64()
                ),
            }
        )

    names_sorted = sorted(cols)

    def ndv_part(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["ci", "key"]).to_pandas().drop_duplicates()
        g = df.groupby("ci", sort=False).size()
        return pa.table(
            {
                "column": pa.array(
                    [names_sorted[int(i)] for i in g.index], pa.string()
                ),
                "stat": pa.array(["ndv"] * len(g), pa.string()),
                "value": pa.array(g.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    ndv = (
        ds.map_batches(ndv_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(ndv_part, batch_format="pyarrow")
        .groupby(["column", "stat"])
        .aggregate(Sum("value", alias_name="value"))
    )
    return minmax.union(ndv)


MAD_K = 3  # flag events with |cents - median| > MAD_K * MAD


def mad_outliers(sf_dir: str) -> "ray.data.Dataset":
    """Robust per-group outlier gate — median/MAD instead of
    mean/stddev (no sqrt, no float drift, breakdown point 50%): per
    event_type compute the exact discrete median of integer cents,
    then the exact discrete median of |cents − median| (the MAD), and
    report per type how many events violate |x − med| > MAD_K·MAD.

    Two exact-median passes (each the same coarse type-key shuffle as
    median_value_by_type — per-partition quantile_disc over all
    contained types at once) and one counting scan with the (median,
    MAD) table broadcast; output (event_type, median_cents, mad_cents,
    n_outliers). The broadcast is O(#types) — bounded."""
    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def rows(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("value")).to_numpy(zero_copy_only=False)
        types = batch.column("event_type").to_numpy(zero_copy_only=False)
        tsum = np.array([sum(t.encode()) for t in types], dtype=np.int64)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "cents": pa.array(cents, pa.int64()),
                "part": pa.array(tsum % N_COARSE_PARTS, pa.int64()),
            }
        )

    def med_part(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.select(["event_type", "cents"]).to_pandas()
        med = df.groupby("event_type", sort=False)["cents"].apply(
            lambda s: int(np.sort(s.to_numpy())[(len(s) - 1) // 2])
        )
        return pa.table(
            {
                "event_type": pa.array(med.index, pa.string()),
                "median_cents": pa.array(
                    med.to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    keyed = ds.map_batches(rows, batch_format="pyarrow")
    med_tbl: dict[str, int] = {}
    for b in (
        keyed.groupby("part")
        .map_groups(med_part, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        med_tbl.update(
            zip(
                b.column("event_type").to_pylist(),
                b.column("median_cents").to_pylist(),
            )
        )
    med_ref = ray.put(med_tbl)

    class AbsDev:
        def __init__(self, med_ref):
            self.med = ray.get(med_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            types = batch.column("event_type").to_pylist()
            cents = batch.column("cents").to_numpy(zero_copy_only=False)
            med = np.array([self.med[t] for t in types], np.int64)
            return pa.table(
                {
                    "event_type": batch.column("event_type"),
                    "cents": pa.array(np.abs(cents - med), pa.int64()),
                    "part": batch.column("part"),
                }
            )

    def mad_part(part_tbl: pa.Table) -> pa.Table:
        t = med_part(part_tbl)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "mad_cents": t.column("median_cents"),
            }
        )

    mad_tbl: dict[str, int] = {}
    for b in (
        keyed.map_batches(
            AbsDev, fn_constructor_args=(med_ref,), batch_format="pyarrow",
            concurrency=(1, 8),
        )
        .groupby("part")
        .map_groups(mad_part, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        mad_tbl.update(
            zip(
                b.column("event_type").to_pylist(),
                b.column("mad_cents").to_pylist(),
            )
        )
    both_ref = ray.put((med_tbl, mad_tbl))

    class CountOutliers:
        def __init__(self, both_ref):
            self.med, self.mad = ray.get(both_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            types = batch.column("event_type").to_pylist()
            cents = _cents(batch.column("value")).to_numpy(
                zero_copy_only=False
            )
            med = np.array([self.med[t] for t in types], np.int64)
            mad = np.array([self.mad[t] for t in types], np.int64)
            out = np.abs(cents - med) > MAD_K * mad
            t = pa.table(
                {
                    "event_type": pa.array(types, pa.string()),
                    "n": pa.array(out.astype(np.int64), pa.int64()),
                }
            )
            return (
                t.group_by("event_type")
                .aggregate([("n", "sum")])
                .rename_columns(["event_type", "n"])
            )

    counts = (
        ds.map_batches(
            CountOutliers,
            fn_constructor_args=(both_ref,),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_outliers"))
    )

    def attach(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pylist()
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "median_cents": pa.array(
                    [med_tbl[t] for t in types], pa.int64()
                ),
                "mad_cents": pa.array([mad_tbl[t] for t in types], pa.int64()),
                "n_outliers": batch.column("n_outliers"),
            }
        )

    return counts.map_batches(attach, batch_format="pyarrow")


TOPK_PER_GROUP = 3  # the oracle pins rn <= 3


def grouped_topk(sf_dir: str) -> "ray.data.Dataset":
    """Top-K rows PER GROUP at high group cardinality — the grouped
    top-k class (top docs per query, top orders per customer, best
    variants per experiment): per customer, the TOPK_PER_GROUP orders
    with the highest o_totalprice (integer cents; ties → min
    o_orderkey), with the exact dense rank 1..K attached. Generalizes
    `argmax_by_source` (its K=1 case) to the mergeable K-prune.

    Scale shape: top-k per group is MERGEABLE — a group's global top-K
    is contained in the union of its per-batch top-Ks, so each batch
    first prunes to ≤ K rows per group present (one lexsort, no
    Python loop), and only those survivors enter the ONE coarse
    shuffle on crc-free int key (o_custkey % N). The per-partition
    finalizer re-runs the identical lexsort-rank kernel on ≤ K×(batch
    count) rows per group. Skew-safe: a group's shuffled footprint is
    bounded by K × #source-batches regardless of its row count.
    Output: (o_custkey, o_orderkey, price_cents, rnk)."""
    from ..stages.shuffle import N_COARSE_PARTS

    def _rank_prune(
        cust: np.ndarray, okey: np.ndarray, cents: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Sort by (cust asc, cents desc, okey asc); return (order,
        rank-within-group) for the kept rank < K prefix rows."""
        order = np.lexsort((okey, -cents, cust))
        cs = cust[order]
        idx = np.arange(len(cs), dtype=np.int64)
        flags = np.empty(len(cs), dtype=bool)
        if len(cs):
            flags[0] = True
            flags[1:] = cs[1:] != cs[:-1]
        start = np.maximum.accumulate(np.where(flags, idx, 0))
        rank = idx - start
        keep = rank < TOPK_PER_GROUP
        return order[keep], rank[keep]

    def prune(batch: pa.Table) -> pa.Table:
        cust = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        okey = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cents = _cents(batch.column("o_totalprice")).to_numpy(
            zero_copy_only=False
        )
        kept, _ = _rank_prune(cust, okey, cents)
        return pa.table(
            {
                "o_custkey": pa.array(cust[kept], pa.int64()),
                "o_orderkey": pa.array(okey[kept], pa.int64()),
                "price_cents": pa.array(cents[kept], pa.int64()),
                "part": pa.array(cust[kept] % N_COARSE_PARTS, pa.int64()),
            }
        )

    def finalize(part_tbl: pa.Table) -> pa.Table:
        cust = part_tbl.column("o_custkey").to_numpy(zero_copy_only=False)
        okey = part_tbl.column("o_orderkey").to_numpy(zero_copy_only=False)
        cents = part_tbl.column("price_cents").to_numpy(zero_copy_only=False)
        kept, rank = _rank_prune(cust, okey, cents)
        return pa.table(
            {
                "o_custkey": pa.array(cust[kept], pa.int64()),
                "o_orderkey": pa.array(okey[kept], pa.int64()),
                "price_cents": pa.array(cents[kept], pa.int64()),
                "rnk": pa.array(rank + 1, pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderkey", "o_totalprice"],
        )
        .map_batches(prune, batch_format="pyarrow")
        .groupby("part")
        .map_groups(finalize, batch_format="pyarrow")
    )


def interval_overlaps(sf_dir: str) -> "ray.data.Dataset":
    """Interval-overlap SELF-JOIN, counted without emitting pairs —
    the temporal-join class (concurrent shipments in transit, session
    overlap, resource double-booking): per supplier, the exact number
    of unordered lineitem pairs whose in-transit windows
    [l_shipdate, l_shipdate + (int(q) % 30 + 1) days] intersect
    (closed intervals; the window end is synthesized deterministically
    from l_quantity since the fixture has no receipt date).

    Scale shape: the naive form is an O(n²)-pair inequality join — at
    6k intervals/supplier that is 18M pairs per group. This plan never
    materializes a pair: within one coarse shuffle on l_suppkey, each
    partition sorts its intervals by lo once and uses the sweep
    identity  pairs = Σ_i (i − #{hi < lo_i})  — every preceding
    interval a (lo_a ≤ lo_i) overlaps i iff hi_a ≥ lo_i, and no
    FOLLOWING interval has hi < lo_i (hi ≥ lo always) — two
    searchsorted passes, O(n log n) per group; duplicate rows are
    legitimate pair members (the oracle uses the ordered-minus-self
    identity for the same reason). Groups with zero overlapping pairs
    are dropped to match the oracle. Output: (suppkey, n_overlaps)."""
    from ..stages.shuffle import N_COARSE_PARTS

    DAY_US = 86_400_000_000

    def to_iv(batch: pa.Table) -> pa.Table:
        sk = batch.column("l_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        lo = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        q = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        hi = lo + (q % 30 + 1) * DAY_US
        return pa.table(
            {
                "suppkey": pa.array(sk, pa.int64()),
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "part": pa.array(sk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def sweep(part_tbl: pa.Table) -> pa.Table:
        sk = part_tbl.column("suppkey").to_numpy(zero_copy_only=False)
        lo = part_tbl.column("lo").to_numpy(zero_copy_only=False)
        hi = part_tbl.column("hi").to_numpy(zero_copy_only=False)
        out_k: list[int] = []
        out_n: list[int] = []
        order = np.lexsort((lo, sk))
        sk, lo, hi = sk[order], lo[order], hi[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], sk[1:] != sk[:-1], [True]))
        )
        for s, e in zip(bounds[:-1], bounds[1:]):
            g_lo, g_hi = lo[s:e], np.sort(hi[s:e])
            pos = np.arange(e - s, dtype=np.int64)
            n = int((pos - np.searchsorted(g_hi, g_lo, side="left")).sum())
            if n > 0:
                out_k.append(int(sk[s]))
                out_n.append(n)
        return pa.table(
            {
                "suppkey": pa.array(out_k, pa.int64()),
                "n_overlaps": pa.array(out_n, pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_quantity"],
        )
        .map_batches(to_iv, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sweep, batch_format="pyarrow")
    )


def interval_union(sf_dir: str) -> "ray.data.Dataset":
    """Interval UNION (coverage) — merge each user's overlapping
    activity windows and report the exact total covered time plus the
    merged-interval count: the utilization / uptime class
    (billable-seconds metering, machine-busy time, SLA coverage)
    that interval_overlaps' PAIR counting cannot express — overlap
    says two windows touch; union says how much wall-clock the whole
    set actually spans. Windows are [ts, ts + dur] closed intervals
    with dur synthesized deterministically from the event id
    (event_id % 3600 + 60 seconds) since the fixture has no duration
    column; touching windows merge (lo ≤ running max hi).

    Scale shape: ONE coarse user shuffle; inside a partition a single
    lexsort orders every user's windows by lo at once, then per user
    one np.maximum.accumulate gives the running sweep frontier, one
    vectorized mask (lo > frontier of the previous row) finds merged-
    segment starts, and coverage falls out as Σ (frontier[segment
    end] − lo[segment start]) — no pair is ever materialized, O(n
    log n) per partition. Output: (user_id, covered_us, n_merged),
    exact int64 (a window is ≤ 3660 s, so even a million-event user
    sums far below 2^63)."""
    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def to_iv(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        lo = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = batch.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hi = lo + (eid % 3600 + 60) * 1_000_000
        return pa.table(
            {
                "user": pa.array(u, pa.int64()),
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "part": pa.array(u % N_COARSE_PARTS, pa.int64()),
            }
        )

    def merge_sweep(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        lo = part_tbl.column("lo").to_numpy(zero_copy_only=False)
        hi = part_tbl.column("hi").to_numpy(zero_copy_only=False)
        order = np.lexsort((hi, lo, u))
        u, lo, hi = u[order], lo[order], hi[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1], [True]))
        )
        out_u: list[int] = []
        out_cov: list[int] = []
        out_n: list[int] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            g_lo, g_hi = lo[s:e], hi[s:e]
            frontier = np.maximum.accumulate(g_hi)
            new_seg = np.concatenate(([True], g_lo[1:] > frontier[:-1]))
            starts = np.flatnonzero(new_seg)
            ends = np.concatenate([starts[1:] - 1, [e - s - 1]])
            out_u.append(int(u[s]))
            out_cov.append(int((frontier[ends] - g_lo[starts]).sum()))
            out_n.append(len(starts))
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "covered_us": pa.array(out_cov, pa.int64()),
                "n_merged": pa.array(out_n, pa.int64()),
            }
        )

    return (
        ds.map_batches(to_iv, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_sweep, batch_format="pyarrow")
    )


CKSUM_MOD = 2305843009213693951  # 2^61 - 1: sum lane folds exactly


def table_checksum(sf_dir: str) -> "ray.data.Dataset":
    """Order-independent whole-table content digest — the
    anti-entropy / verification class (did a resumed, migrated or
    re-partitioned copy of this table change AT ALL?): one row of
    (n_rows, sum_lane, xor_lane) over a 60-bit md5 lane of each
    document's canonical `doc_id|text` string. Both aggregates are
    commutative+associative, so the digest is identical for ANY block
    layout, partition order or resume path — exactly what the
    finalize ledger needs to certify "this output equals that output"
    without a sort or a row-level diff (the distributed analogue of
    the reference's per-file SHA-256 gate, src/ingestion/*).

    Scale shape: one streaming pass; each batch folds to a single
    (count, sum mod 2^61-1, xor) triple — the md5 is per row but each
    call is C code over the row's own bytes (the same per-row cost the
    span-merkle hash already pays in M8); partials then fold in ONE
    tiny final group. The sum lane lives on Z/(2^61-1) so reduction
    order can never overflow or wrap differently between runs; the
    xor lane is overflow-free by construction. Collision odds for a
    corpus-level accept gate: ~2^-60 per lane, independent lanes."""
    import hashlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        txts = batch.column("text").to_pylist()
        s, x = 0, 0
        for i, t in zip(ids, txts):
            lane = int(
                hashlib.md5(f"{i}|{t or ''}".encode()).hexdigest()[:15], 16
            )
            s += lane
            x ^= lane
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n_p": pa.array([len(ids)], pa.int64()),
                "sum_p": pa.array([s % CKSUM_MOD], pa.int64()),
                "xor_p": pa.array([x], pa.int64()),
            }
        )

    def fold(tbl: pa.Table) -> pa.Table:
        s = 0
        x = 0
        for v in tbl.column("sum_p").to_pylist():
            s = (s + v) % CKSUM_MOD
        for v in tbl.column("xor_p").to_pylist():
            x ^= v
        n = int(np.sum(tbl.column("n_p").to_numpy(zero_copy_only=False)))
        return pa.table(
            {
                "n_rows": pa.array([n], pa.int64()),
                "sum_lane": pa.array([s], pa.int64()),
                "xor_lane": pa.array([x], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .map_groups(fold, batch_format="pyarrow")
    )


def contingency_grid(sf_dir: str) -> "ray.data.Dataset":
    """Exact chi-square sufficient statistics for the lang × source
    contingency table — the independence-test / feature-selection
    class (chi2 feature scoring, drift detection between a categorical
    feature and a label): per OBSERVED cell, the count, both
    marginals, the grand total, and the exact signed deviation
    dev = O·N − R·C (the χ² numerator's root: χ² = Σ dev²/(R·C·N),
    derivable downstream in one vectorized step; zero cells follow
    from the marginals). All integer — no expected-value floats ever
    materialize.

    Scale shape: per-batch pyarrow group_by partial counts (the
    combiner) → one tiny groupby((lang, source)) Sum → the driver
    reads ONLY the reduced grid (#langs × #sources rows — the
    mix_weights bounded-read contract) and attaches marginals with
    two bincounts. int64 holds dev up to N ≈ 3×10⁹ per shard; beyond,
    per-shard grids merge by summing counts first (the partials are
    mergeable) — the documented dial."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": t.column("lang"),
                "source": t.column("source"),
                "n_p": t.column("count_all").cast(pa.int64()),
            }
        )

    grid = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
    )  # bounded: #langs x #sources rows
    n = grid["n"].to_numpy()
    n_total = int(n.sum())
    row_tot = grid.groupby("lang")["n"].transform("sum").to_numpy()
    col_tot = grid.groupby("source")["n"].transform("sum").to_numpy()
    dev = n.astype(object) * n_total - row_tot.astype(object) * col_tot
    dev64 = np.array([int(v) for v in dev], dtype=np.int64)  # overflow-checked
    out = pa.table(
        {
            "lang": pa.array(grid["lang"], pa.string()),
            "source": pa.array(grid["source"], pa.string()),
            "n_obs": pa.array(n, pa.int64()),
            "row_total": pa.array(row_tot, pa.int64()),
            "col_total": pa.array(col_tot, pa.int64()),
            "n_total": pa.array(
                np.full(len(n), n_total, np.int64), pa.int64()
            ),
            "dev": pa.array(dev64, pa.int64()),
        }
    )
    return ray.data.from_arrow(out)


def audience_overlap(sf_dir: str) -> "ray.data.Dataset":
    """Pairwise audience-intersection matrix — for every unordered
    pair of event types, the exact number of users who did BOTH (the
    audience-overlap / co-engagement matrix segmentation and
    cross-sell analyses ask for). The naive form is a distinct-pair
    self-join; this plan is the BITMASK ROLLUP: with T event types a
    user's whole engagement profile is one T-bit integer, and the
    entire corpus reduces to a ≤ 2^T-row mask histogram from which
    EVERY pairwise (indeed every k-way) intersection follows by
    summing masks containing the bits — no pair ever shuffles.

    Scale shape: the type domain (bounded, collected via one tiny
    distinct aggregate) broadcasts once; per-batch distinct
    (user, type) pairs OR into per-user masks after ONE coarse user
    shuffle; per-partition mask histograms (≤ 2^T int64 rows) fold in
    a tiny groupby; the driver expands the final histogram to the
    T(T−1)/2 pair counts. Output: (type_a, type_b, n_users), pairs
    with zero overlap omitted (the oracle's inner join)."""
    from ray.data.aggregate import Sum
    from ..stages.shuffle import N_COARSE_PARTS

    path = f"{sf_dir}/events.parquet"

    # bounded type domain: per-batch distinct → driver union (T rows
    # per batch before the union; T is the event-type vocabulary)
    tset: set = set()
    for b in (
        ray.data.read_parquet(path, columns=["event_type"])
        .map_batches(
            lambda t: pa.table(
                {"event_type": pc.unique(t.column("event_type"))}
            ),
            batch_format="pyarrow",
        )
        .iter_batches(batch_format="pyarrow")
    ):
        tset.update(b.column("event_type").to_pylist())
    types = np.sort(np.array(sorted(tset), dtype=object))
    tref = ray.put(types)

    def pairs(batch: pa.Table) -> pa.Table:
        tl = ray.get(tref)
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        bit = np.searchsorted(tl, et)
        key = np.unique(u.astype(np.int64) * len(tl) + bit)
        uu, bb = key // len(tl), key % len(tl)
        return pa.table(
            {
                "user": pa.array(uu, pa.int64()),
                "bit": pa.array(bb, pa.int64()),
                "part": pa.array(uu % N_COARSE_PARTS, pa.int64()),
            }
        )

    def masks(part_tbl: pa.Table) -> pa.Table:
        u = part_tbl.column("user").to_numpy(zero_copy_only=False)
        b = part_tbl.column("bit").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        us, bs = u[order], b[order]
        flags = np.empty(len(us), dtype=bool)
        if len(us):
            flags[0] = True
            flags[1:] = us[1:] != us[:-1]
        seg = np.cumsum(flags) - 1
        n_users = int(seg[-1]) + 1 if len(us) else 0
        mask = np.zeros(n_users, dtype=np.int64)
        np.bitwise_or.at(mask, seg, np.int64(1) << bs)
        vals, cnts = np.unique(mask, return_counts=True)
        return pa.table(
            {
                "mask": pa.array(vals, pa.int64()),
                "n_p": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ray.data.read_parquet(path, columns=["user_id", "event_type"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(masks, batch_format="pyarrow")
        .groupby("mask")
        .aggregate(Sum("n_p", alias_name="n"))
        .to_pandas()
    )  # bounded driver read: <= 2^T rows
    m = hist["mask"].to_numpy().astype(np.int64)
    n = hist["n"].to_numpy().astype(np.int64)
    out_a, out_b, out_n = [], [], []
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            both = int(n[(m & (1 << i) > 0) & (m & (1 << j) > 0)].sum())
            if both > 0:
                out_a.append(types[i])
                out_b.append(types[j])
                out_n.append(both)
    return ray.data.from_arrow(
        pa.table(
            {
                "type_a": pa.array(out_a, pa.string()),
                "type_b": pa.array(out_b, pa.string()),
                "n_users": pa.array(out_n, pa.int64()),
            }
        )
    )


RV_WORKERS = tuple(f"w{i}" for i in range(8))


def rendezvous_assign(sf_dir: str) -> "ray.data.Dataset":
    """Consistent shard placement via rendezvous (highest-random-
    weight) hashing — every doc goes to the worker whose
    md5(doc_id|worker) digest is lexicographically largest: the
    placement class behind consistent resharding (adding/removing a
    worker moves ONLY the docs whose argmax changes, ~1/W of the
    corpus — the property mod-W placement lacks and the reason HRW is
    the standard cache/shard assigner). Deterministic, coordination-
    free, and computable independently per row — the ideal Ray Data
    shape: one streaming map_batches, no shuffle, no driver state.

    Output: (doc_id, worker). The per-worker load histogram is one
    tiny groupby downstream; ties are impossible (md5 collisions
    aside, the digest strings differ)."""
    import hashlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_w = []
        for i in ids:
            best_w, best_h = None, ""
            for w in RV_WORKERS:
                h = hashlib.md5(f"{i}|{w}".encode()).hexdigest()
                if h > best_h:
                    best_h, best_w = h, w
            out_w.append(best_w)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "worker": pa.array(out_w, pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def ab_lift(sf_dir: str) -> "ray.data.Dataset":
    """Experiment readout — the A/B analytics class (treatment
    assignment + conversion attribution, the decision table every
    product experiment ends in): users deterministically assigned by
    user_id parity (variant A = even — the hash-assignment stand-in),
    per variant the distinct exposed users, distinct converters
    (≥ 1 purchase), and total purchase events; lift and significance
    derive downstream from these exact integers (paired with
    contingency_grid's dev statistic for the chi-square test).

    Scale shape: per-batch partials fold each batch to one row per
    user seen (user id, purchase count) — a distinct-pair combiner —
    then ONE coarse user shuffle dedups exposure and conversion per
    user exactly (a user converting in two batches counts once), and
    per-variant int64 partials reduce in a tiny final groupby.
    Output: (variant, n_users, n_converters, n_purchases)."""
    from ray.data.aggregate import Sum
    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        is_p = np.asarray(
            [t == "purchase" for t in batch.column("event_type").to_pylist()],
            dtype=np.int64,
        )
        uu, inv = np.unique(u, return_inverse=True)
        pc_ = np.bincount(inv, weights=is_p).astype(np.int64)
        return pa.table(
            {
                "user": pa.array(uu.astype(np.int64), pa.int64()),
                "np_p": pa.array(pc_, pa.int64()),
                "part": pa.array(
                    uu.astype(np.int64) % N_COARSE_PARTS, pa.int64()
                ),
            }
        )

    def per_part(part_tbl: pa.Table) -> pa.Table:
        t = part_tbl.select(["user", "np_p"]).group_by("user").aggregate(
            [("np_p", "sum")]
        )
        u = t.column("user").to_numpy(zero_copy_only=False)
        npur = t.column("np_p_sum").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        out = []
        for v, mask in (("A", u % 2 == 0), ("B", u % 2 == 1)):
            out.append(
                (
                    v,
                    int(mask.sum()),
                    int((npur[mask] > 0).sum()),
                    int(npur[mask].sum()),
                )
            )
        return pa.table(
            {
                "variant": pa.array([o[0] for o in out], pa.string()),
                "u_p": pa.array([o[1] for o in out], pa.int64()),
                "c_p": pa.array([o[2] for o in out], pa.int64()),
                "p_p": pa.array([o[3] for o in out], pa.int64()),
            }
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "variant": batch.column("variant"),
                "n_users": batch.column("u"),
                "n_converters": batch.column("c"),
                "n_purchases": batch.column("p"),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("variant")
        .aggregate(
            Sum("u_p", alias_name="u"),
            Sum("c_p", alias_name="c"),
            Sum("p_p", alias_name="p"),
        )
        .map_batches(rename, batch_format="pyarrow")
    )


def gini_sources(sf_dir: str) -> "ray.data.Dataset":
    """Exact Gini-coefficient numerator of the ``n_chars`` distribution
    per source — the INEQUALITY/concentration monitor of a corpus mix
    (a source whose byte mass concentrates in a few giant docs packs,
    shards and trains differently from a uniform one, even at equal
    totals — the dial mix_weights cannot see). Output per source:
    ``n``, ``sum_x`` and ``gini_num`` = Σ_i (2·r_i − n − 1)·x_i over
    the ascending sort, so gini = gini_num / (n · sum_x) is exact
    integer arithmetic for any consumer. The sum is tie-order
    invariant (equal x contribute equally wherever they land among
    their ties), so any deterministic tie-break matches the oracle's
    ROW_NUMBER bit-for-bit.

    Scale shape — the percentile_rank bucket-grid sort-rank, folded
    into ALGEBRAIC per-bucket partials instead of per-row ranks: pass 1
    counts rows per (source, key-range bucket) — a bounded
    #sources × RANK_KEY_BUCKETS grid — and broadcasts the per-source
    EXCLUSIVE prefix counts once; pass 2 shuffles rows ONCE on the
    composite (source, bucket) key, sorts bucket-locally, and emits a
    single (Σ2rx, Σx, m) partial row per (source, bucket): only
    grid-bounded partials reach the final per-source Sum. Equal keys
    always share a bucket (bucket = (key−lo)//width) so ties never
    straddle a prefix boundary. int64 headroom: 2·r·x ≤ 2·n·max_x;
    at 10^12 rows the per-bucket partial would switch to a
    (hi, lo) 128-bit split — the reduction stays the same."""
    import zlib

    path = f"{sf_dir}/documents.parquet"
    lohi = ray.data.read_parquet(path, columns=["n_chars"]).aggregate(
        Min("n_chars"), Max("n_chars")
    )
    lo, hi = int(lohi["min(n_chars)"]), int(lohi["max(n_chars)"])
    width = (hi - lo) // RANK_KEY_BUCKETS + 1

    def keyed(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_pylist()
        k = batch.column("n_chars").to_numpy(zero_copy_only=False)
        kb = (k - lo) // width
        part = np.array(
            [zlib.crc32(f"{s}|{b}".encode()) for s, b in zip(src, kb)],
            dtype=np.int64,
        ) % (8 * RANK_KEY_BUCKETS)
        return pa.table(
            {
                "source": pa.array(src, pa.string()),
                "x": pa.array(k.astype(np.int64), pa.int64()),
                "kb": pa.array(kb, pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    rows = ray.data.read_parquet(
        path, columns=["source", "n_chars"]
    ).map_batches(keyed, batch_format="pyarrow")

    def grid_counts(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["source", "kb"])
            .group_by(["source", "kb"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "source": g.column("source"),
                "kb": g.column("kb"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    grid: dict[str, np.ndarray] = {}
    for b in rows.map_batches(grid_counts, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for s, kb, n in zip(
            b.column("source").to_pylist(),
            b.column("kb").to_pylist(),
            b.column("n").to_pylist(),
        ):
            acc = grid.setdefault(s, np.zeros(RANK_KEY_BUCKETS, dtype=np.int64))
            acc[kb] += n
    prefix = {
        s: np.concatenate(([0], np.cumsum(c)[:-1])) for s, c in grid.items()
    }
    bcast = ray.put(prefix)

    def bucket_partials(part_tbl: pa.Table) -> pa.Table:
        pre = ray.get(bcast)
        df = part_tbl.to_pandas()
        srcs, sum2rx, sumx, m = [], [], [], []
        for (s, kb), sub in df.groupby(["source", "kb"], sort=False):
            x = np.sort(sub["x"].to_numpy())
            r = pre[s][int(kb)] + np.arange(1, len(x) + 1, dtype=np.int64)
            srcs.append(s)
            sum2rx.append(int(np.sum(2 * r * x)))
            sumx.append(int(x.sum()))
            m.append(len(x))
        return pa.table(
            {
                "source": pa.array(srcs, pa.string()),
                "s2rx": pa.array(sum2rx, pa.int64()),
                "sx": pa.array(sumx, pa.int64()),
                "m": pa.array(m, pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("m").to_numpy(zero_copy_only=False)
        sx = batch.column("sx").to_numpy(zero_copy_only=False)
        s2rx = batch.column("s2rx").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": batch.column("source"),
                "n": pa.array(n, pa.int64()),
                "sum_x": pa.array(sx, pa.int64()),
                "gini_num": pa.array(s2rx - (n + 1) * sx, pa.int64()),
            }
        )

    return (
        rows.groupby("part")
        .map_groups(bucket_partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("s2rx", alias_name="s2rx"),
            Sum("sx", alias_name="sx"),
            Sum("m", alias_name="m"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def ks_drift(sf_dir: str) -> "ray.data.Dataset":
    """Exact two-sample Kolmogorov–Smirnov statistic of each source's
    ``n_chars`` distribution against the whole corpus — the
    distribution-DRIFT monitor (a source whose length profile diverges
    from the pool signals a scraping change or a contamination event
    long before means move). Output per source: ``n_s``, ``n_all`` and
    ``ks_num`` = max over thresholds t of |n_all·F_s(t) − n_s·F(t)|
    with F counting rows ≤ t, so D = ks_num / (n_s · n_all) is exact
    integer arithmetic — no float ECDFs, no hash jitter.

    Scale shape: the value domain of a length column is bounded
    (distinct n_chars ≪ rows), so the plan reduces rows to the
    (source, value) count grid with per-batch pyarrow group_by
    partials, one small groupby folds the grid, the GLOBAL cumulative
    (value → cum_all) is built once from the tiny value histogram and
    broadcast, and a per-source map_groups scans its ≤|domain| grid
    rows sorted by value to take the running max — rows never shuffle,
    only grid cells do. For an unbounded real-valued column the same
    plan runs on quantized buckets (KS on the binned ECDF brackets the
    exact D within one bin mass)."""
    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["source", "n_chars"])

    def cell_partials(batch: pa.Table) -> pa.Table:
        g = (
            batch.group_by(["source", "n_chars"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "source": g.column("source"),
                "v": g.column("n_chars").cast(pa.int64()),
                "c": g.column("count_all").cast(pa.int64()),
            }
        )

    cells = (
        ds.map_batches(cell_partials, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(Sum("c", alias_name="c"))
    )

    # tiny global histogram → (sorted values, cumulative counts), once
    hist: dict[int, int] = {}
    for b in cells.iter_batches(batch_format="pyarrow"):
        for v, c in zip(b.column("v").to_pylist(), b.column("c").to_pylist()):
            hist[v] = hist.get(v, 0) + c
    vals = np.array(sorted(hist), dtype=np.int64)
    cum_all = np.cumsum([hist[int(v)] for v in vals]).astype(np.int64)
    n_all = int(cum_all[-1])
    bcast = ray.put((vals, cum_all))

    def per_source(group: pa.Table) -> pa.Table:
        gvals, gcum = ray.get(bcast)
        v = group.column("v").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(v)
        v, c = v[order], c[order]
        n_s = int(c.sum())
        # source ECDF counts at EVERY global distinct value: step fn
        cum_s = np.zeros(len(gvals), dtype=np.int64)
        idx = np.searchsorted(gvals, v)
        cum_s[idx] = c
        cum_s = np.cumsum(cum_s)
        ks = int(np.max(np.abs(n_all * cum_s - n_s * gcum)))
        return pa.table(
            {
                "source": pa.array([group.column("source")[0].as_py()]),
                "n_s": pa.array([n_s], pa.int64()),
                "n_all": pa.array([n_all], pa.int64()),
                "ks_num": pa.array([ks], pa.int64()),
            }
        )

    return cells.groupby("source").map_groups(per_source, batch_format="pyarrow")


def corr_moments(sf_dir: str) -> "ray.data.Dataset":
    """Grouped pairwise co-moment statistics over lineitem's measure
    columns (quantity, discount, tax — integer-scaled ×100) per
    return flag: n, the three sums, the three squared sums and the
    three cross sums, from which Pearson r, covariance and OLS betas
    for every column pair are exact integer/rational arithmetic
    downstream — the statistical-profiling CORRELATION class
    (profile_columns reports per-column shape; this reports how
    columns move TOGETHER, the multicollinearity / feature-redundancy
    readout a feature-selection pass needs). Pairwise over k columns
    is k(k+1)/2 accumulators — the grouped scalar sibling of
    gram_matrix's dense vector Gram reduce.

    Scale shape: one pruned scan, per-batch pandas groupby folds each
    batch to ≤ #flags rows of fixed width, a tiny Sum exchange
    finishes — rows never shuffle, the wire carries #flags × batches
    partials. int64 headroom: q,d,t ≤ 5·10^3 scaled, so a cross sum
    stays < 2^63 up to ~10^11 rows per group; past that the partial
    splits into (hi, lo) lanes like gini_sources documents."""
    import pandas as pd

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount", "l_tax"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "flag": batch.column("l_returnflag").to_pylist(),
                "q": np.floor(
                    batch.column("l_quantity").to_numpy(zero_copy_only=False)
                    * 100.0 + 0.5
                ).astype(np.int64),
                "d": np.floor(
                    batch.column("l_discount").to_numpy(zero_copy_only=False)
                    * 100.0 + 0.5
                ).astype(np.int64),
                "t": np.floor(
                    batch.column("l_tax").to_numpy(zero_copy_only=False)
                    * 100.0 + 0.5
                ).astype(np.int64),
            }
        )
        df["one"] = np.int64(1)
        for a, b in (("q", "q"), ("d", "d"), ("t", "t"),
                     ("q", "d"), ("q", "t"), ("d", "t")):
            df[f"{a}{b}"] = df[a] * df[b]
        g = df.groupby("flag", sort=False).sum().reset_index()
        return pa.table(
            {
                "l_returnflag": pa.array(g["flag"], pa.string()),
                **{
                    c: pa.array(g[c].to_numpy().astype(np.int64), pa.int64())
                    for c in ("one", "q", "d", "t", "qq", "dd", "tt",
                              "qd", "qt", "dt")
                },
            }
        )

    names = {
        "one": "n", "q": "sum_q", "d": "sum_d", "t": "sum_t",
        "qq": "sum_qq", "dd": "sum_dd", "tt": "sum_tt",
        "qd": "sum_qd", "qt": "sum_qt", "dt": "sum_dt",
    }

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                **{
                    out: batch.column(f"{c}_p")
                    for c, out in names.items()
                },
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(*[Sum(c, alias_name=f"{c}_p") for c in names])
        .map_batches(rename, batch_format="pyarrow")
    )


DECILE_K = 10  # equal-frequency bins per group


def decile_table(sf_dir: str) -> "ray.data.Dataset":
    """Equal-frequency binning — exact NTILE(10) of ``n_chars`` within
    each language, reported as the per-(lang, decile) count and sum:
    the calibration / binning table feature engineering and drift
    dashboards consume (equal-WIDTH histograms mislead on skewed
    length distributions; equal-frequency bins adapt). Ties break by
    doc_id so the bin assignment is fully deterministic; the bucket
    boundary arithmetic mirrors SQL NTILE exactly (first n%k bins get
    ⌈n/k⌉ rows, the rest ⌊n/k⌋).

    Scale shape: the gini_sources/percentile_rank bucket-grid
    sort-rank, folded to a bounded output — pass 1 counts rows per
    (lang, key-range bucket) and broadcasts per-lang exclusive prefix
    counts; pass 2 shuffles rows ONCE on the composite key, assigns
    row numbers bucket-locally (sort by (n_chars, doc_id)), maps each
    to its NTILE bin with pure integer arithmetic, and emits
    (lang, decile, count, sum) partials — ≤ #langs × DECILE_K × P
    rows reach the final Sum. Equal keys share a bucket but NOT
    necessarily a bin; the doc_id tie-break inside the bucket matches
    the oracle's ORDER BY n_chars, doc_id because buckets partition
    the key range."""
    import zlib

    path = f"{sf_dir}/documents.parquet"
    lohi = ray.data.read_parquet(path, columns=["n_chars"]).aggregate(
        Min("n_chars"), Max("n_chars")
    )
    lo, hi = int(lohi["min(n_chars)"]), int(lohi["max(n_chars)"])
    width = (hi - lo) // RANK_KEY_BUCKETS + 1

    def keyed(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_pylist()
        k = batch.column("n_chars").to_numpy(zero_copy_only=False)
        kb = (k - lo) // width
        part = np.array(
            [zlib.crc32(f"{s}|{b}".encode()) for s, b in zip(lang, kb)],
            dtype=np.int64,
        ) % (8 * RANK_KEY_BUCKETS)
        return pa.table(
            {
                "lang": pa.array(lang, pa.string()),
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "x": pa.array(k.astype(np.int64), pa.int64()),
                "kb": pa.array(kb, pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    rows = ray.data.read_parquet(
        path, columns=["doc_id", "lang", "n_chars"]
    ).map_batches(keyed, batch_format="pyarrow")

    def grid_counts(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["lang", "kb"])
            .group_by(["lang", "kb"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "lang": g.column("lang"),
                "kb": g.column("kb"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    grid: dict[str, np.ndarray] = {}
    for b in rows.map_batches(grid_counts, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for s, kb, n in zip(
            b.column("lang").to_pylist(),
            b.column("kb").to_pylist(),
            b.column("n").to_pylist(),
        ):
            acc = grid.setdefault(s, np.zeros(RANK_KEY_BUCKETS, dtype=np.int64))
            acc[kb] += n
    prefix = {
        s: np.concatenate(([0], np.cumsum(c)[:-1])) for s, c in grid.items()
    }
    totals = {s: int(c.sum()) for s, c in grid.items()}
    bcast = ray.put((prefix, totals))

    def ntile_of(rn: np.ndarray, n: int, k: int = DECILE_K) -> np.ndarray:
        """SQL NTILE: first n%k bins hold n//k+1 rows, the rest n//k."""
        q, r = divmod(n, k)
        if q == 0:
            return rn  # n < k: bins of one row each
        big = r * (q + 1)
        return np.where(
            rn <= big, (rn - 1) // (q + 1) + 1, r + (rn - 1 - big) // q + 1
        ).astype(np.int64)

    def bin_partials(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        pre, tot = ray.get(bcast)
        df = part_tbl.to_pandas()
        out = []
        for (s, kb), sub in df.groupby(["lang", "kb"], sort=False):
            order = np.lexsort((sub["doc_id"].to_numpy(), sub["x"].to_numpy()))
            x = sub["x"].to_numpy()[order]
            rn = pre[s][int(kb)] + np.arange(1, len(x) + 1, dtype=np.int64)
            dec = ntile_of(rn, tot[s])
            g = (
                pd.DataFrame({"decile": dec, "x": x})
                .groupby("decile", sort=False)["x"]
                .agg(["count", "sum"])
                .reset_index()
            )
            g["lang"] = s
            out.append(
                pa.table(
                    {
                        "lang": pa.array(g["lang"], pa.string()),
                        "decile": pa.array(
                            g["decile"].to_numpy().astype(np.int64), pa.int64()
                        ),
                        "cnt": pa.array(
                            g["count"].to_numpy().astype(np.int64), pa.int64()
                        ),
                        "sx": pa.array(
                            g["sum"].to_numpy().astype(np.int64), pa.int64()
                        ),
                    }
                )
            )
        return pa.concat_tables(out)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                "decile": batch.column("decile"),
                "n_rows": batch.column("cnt_p"),
                "sum_x": batch.column("sx_p"),
            }
        )

    return (
        rows.groupby("part")
        .map_groups(bin_partials, batch_format="pyarrow")
        .groupby(["lang", "decile"])
        .aggregate(Sum("cnt", alias_name="cnt_p"), Sum("sx", alias_name="sx_p"))
        .map_batches(rename, batch_format="pyarrow")
    )


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF_US = 897_264_000_000_000  # 1998-06-01 in epoch microseconds


def q3_shipping_priority(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """TPC-H Q3 (shipping priority) — the canonical three-table
    benchmark composition: customers of one market segment, their
    orders placed before the cutoff, revenue from lineitems shipped
    after it, top-k open orders by exact revenue cents. Tail-seated
    by design: every stage is a head-checked shape composed — the
    segment semi-join is suppression_antijoin's co-partitioned
    build/probe with the polarity flipped, the orders⋈lineitem leg is
    order_priority_join's fact-fact union-shuffle verbatim, and the
    final sort().limit() is top_docs' rank-then-limit.

    Scale shape: NO broadcast anywhere — customer is fact-scale in
    TPC-H, so the segment filter rides a custkey co-partition
    (filtered customer side is build, orders side probes), the
    surviving (orderkey, odate, priority) rows re-key by orderkey and
    union-shuffle against the date-filtered lineitem projection, and
    because an orderkey lives in exactly one partition the per-group
    revenue sums are complete there — the global stage is only the
    k-row sort-limit. Dates prune at the scan; every money value is
    exact integer cents before any sum."""
    from ..stages.shuffle import N_COARSE_PARTS

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def cust_side(batch: pa.Table) -> pa.Table:
        seg = batch.column("c_mktsegment").to_numpy(zero_copy_only=False)
        keep = seg == Q3_SEGMENT
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        n = len(ck)
        return pa.table(
            {
                "key": pa.array(ck, pa.int64()),
                "okey": pa.array(np.zeros(n, np.int64), pa.int64()),
                "odate": pa.array(np.zeros(n, np.int64), pa.int64()),
                "prio": pa.array([""] * n, pa.string()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = od < Q3_CUTOFF_US
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        return pa.table(
            {
                "key": pa.array(ck, pa.int64()),
                "okey": batch.column("o_orderkey").cast(pa.int64()).filter(
                    pa.array(keep)
                ),
                "odate": pa.array(od[keep], pa.int64()),
                "prio": batch.column("o_orderpriority").filter(pa.array(keep)),
                "side": pa.array(np.ones(int(keep.sum()), np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    stage_a = cust.map_batches(cust_side, batch_format="pyarrow").union(
        orders.map_batches(order_side, batch_format="pyarrow")
    )

    def semi_join(part_tbl: pa.Table) -> pa.Table:
        side = part_tbl.column("side").to_numpy(zero_copy_only=False)
        keys = part_tbl.column("key").to_numpy(zero_copy_only=False)
        probe = np.isin(keys, keys[side == 0]) & (side == 1)
        okey = part_tbl.column("okey").to_numpy(zero_copy_only=False)[probe]
        return pa.table(
            {
                "okey": pa.array(okey, pa.int64()),
                "odate": pa.array(
                    part_tbl.column("odate").to_numpy(zero_copy_only=False)[
                        probe
                    ],
                    pa.int64(),
                ),
                "prio": pa.array(
                    np.asarray(part_tbl.column("prio").to_pylist(), object)[
                        probe
                    ],
                    pa.string(),
                ),
                "cents": pa.array(
                    np.zeros(int(probe.sum()), np.int64), pa.int64()
                ),
                "side": pa.array(
                    np.zeros(int(probe.sum()), np.int64), pa.int64()
                ),
                "part2": pa.array(okey % N_COARSE_PARTS, pa.int64()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = sd > Q3_CUTOFF_US
        lk = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        n = len(lk)
        return pa.table(
            {
                "okey": pa.array(lk, pa.int64()),
                "odate": pa.array(np.zeros(n, np.int64), pa.int64()),
                "prio": pa.array([""] * n, pa.string()),
                "cents": pa.array(cents, pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part2": pa.array(lk % N_COARSE_PARTS, pa.int64()),
            }
        )

    stage_b = (
        stage_a.groupby("part")
        .map_groups(semi_join, batch_format="pyarrow")
        .union(lines.map_batches(line_side, batch_format="pyarrow"))
    )

    def join_sum(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("okey")[["odate", "prio"]]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="okey", how="inner", rsuffix="_b")
        g = (
            m.groupby(["okey", "odate_b", "prio_b"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "l_orderkey": pa.array(g["okey"].to_numpy(), pa.int64()),
                "revenue_cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
                "o_orderdate_us": pa.array(
                    g["odate_b"].to_numpy().astype(np.int64), pa.int64()
                ),
                "o_orderpriority": pa.array(g["prio_b"], pa.string()),
            }
        )

    return (
        stage_b.groupby("part2")
        .map_groups(join_sum, batch_format="pyarrow")
        .sort(
            ["revenue_cents", "o_orderdate_us", "l_orderkey"],
            descending=[True, False, False],
        )
        .limit(k)
    )


GQ_PERCENTS = (50, 90, 99)  # quantiles resolved by the selection scan
GQ_HIST_BINS = 4096         # buckets per narrowing pass (driver state cap)


def global_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """EXACT whole-table quantiles by distributed SELECTION — no
    shuffle at all: the classic histogram-narrowing algorithm every
    shuffle-based median plan (median_by_type, weighted_median,
    hist_quantiles' grid) is the alternative to. Each pass streams
    the column once and folds it into a ≤ GQ_HIST_BINS-bucket count
    histogram of the still-active value range per quantile; the
    driver keeps only (lo, hi, rank-below) per quantile — fixed-size
    state — and descends into the bucket containing the target rank.
    When bucket width reaches 1 the bucket IS the answer. Value range
    R resolves in ceil(log_BINS(R)) passes: integer cents (~1e7
    range) take ONE narrowing pass plus one width-1 pass; a 2^63
    range takes six. Per pass the exchange is the per-batch sparse
    histogram partials — bounded by BINS × #active quantiles — and
    rows never move between workers.

    Resolves percentile_disc(q): the smallest value whose cumulative
    count reaches ceil(q·n/100), for q in GQ_PERCENTS over exact
    integer cents of l_extendedprice. Output: (q, n_rows,
    value_cents)."""
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        v = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table({"cents": pa.array(v, pa.int64())})

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    stats = cents.aggregate(
        _Min("cents", alias_name="mn"),
        _Max("cents", alias_name="mx"),
        _Count(alias_name="n"),
    )
    mn, mx, n = int(stats["mn"]), int(stats["mx"]), int(stats["n"])

    # active[q] = (lo, hi half-open, count of rows strictly below lo)
    active = {q: (mn, mx + 1, 0) for q in GQ_PERCENTS}
    ranks = {q: (q * n + 99) // 100 for q in GQ_PERCENTS}
    resolved: dict[int, int] = {}

    while active:
        ranges = [
            (q, lo, hi, max(1, -(-(hi - lo) // GQ_HIST_BINS)))
            for q, (lo, hi, _) in active.items()
        ]
        rref = ray.put(ranges)

        def hist_partials(batch: pa.Table) -> pa.Table:
            rs = ray.get(rref)
            v = batch.column("cents").to_numpy(zero_copy_only=False)
            out_q: list[int] = []
            out_b: list[int] = []
            out_n: list[int] = []
            for q, lo, hi, width in rs:
                in_r = v[(v >= lo) & (v < hi)]
                if len(in_r):
                    b = (in_r - lo) // width
                    cnt = np.bincount(b)
                    nz = np.nonzero(cnt)[0]
                    out_q += [q] * len(nz)
                    out_b += nz.tolist()
                    out_n += cnt[nz].astype(np.int64).tolist()
            return pa.table(
                {
                    "q": pa.array(out_q, pa.int64()),
                    "bucket": pa.array(out_b, pa.int64()),
                    "n": pa.array(out_n, pa.int64()),
                }
            )

        hist_rows = (
            cents.map_batches(hist_partials, batch_format="pyarrow")
            .groupby(["q", "bucket"])
            .aggregate(_Sum("n", alias_name="c"))
            .take_all()
        )  # ≤ BINS × |active| rows — the fixed-size driver budget
        by_q: dict[int, list[tuple[int, int]]] = {q: [] for q in active}
        for r in hist_rows:
            by_q[int(r["q"])].append((int(r["bucket"]), int(r["c"])))
        nxt: dict[int, tuple[int, int, int]] = {}
        for q, (lo, hi, below) in active.items():
            width = max(1, -(-(hi - lo) // GQ_HIST_BINS))
            cum = below
            for b, c in sorted(by_q[q]):
                if cum + c >= ranks[q]:
                    if width == 1:
                        resolved[q] = lo + b
                    else:
                        nxt[q] = (
                            lo + b * width,
                            min(hi, lo + (b + 1) * width),
                            cum,
                        )
                    break
                cum += c
        active = nxt

    out = pa.table(
        {
            "q": pa.array(sorted(resolved), pa.int64()),
            "n_rows": pa.array([n] * len(resolved), pa.int64()),
            "value_cents": pa.array(
                [resolved[q] for q in sorted(resolved)], pa.int64()
            ),
        }
    )
    return ray.data.from_arrow(out)


SKEW_KEYS = (  # the engine's own shuffle keys, audited as data
    ("events.user_id", "events.parquet", "user_id"),
    ("lineitem.l_orderkey", "lineitem.parquet", "l_orderkey"),
    ("lineitem.l_suppkey", "lineitem.parquet", "l_suppkey"),
    ("documents.source", "documents.parquet", "source"),
)


def shuffle_skew_audit(sf_dir: str) -> "ray.data.Dataset":
    """Partition-key SKEW audit — for each key this repo actually
    shuffles on (user_id, orderkey, suppkey, source), the exact row
    count, distinct-key count, heaviest-key row count and the
    heaviest key itself (min key among ties): the shuffle-planning
    readout behind every 'pick ONE partitioning key and salt hot
    keys' decision — max_key_rows/n_rows IS the straggler bound of a
    key-partitioned stage. Tail-seated by design: a counts-of-counts
    monitor (dedup_cluster_sizes' sibling) pointed at the engine's
    own keys.

    Scale shape: per key domain, per-batch (key, count) partials fold
    before ONE keyed Sum exchange; the per-key counts then reduce to
    a SINGLE row via per-batch (rows, keys, max, argmax) partials
    merged in one constant-key task — nothing driver-side, nothing
    key-cardinality-sized leaves the exchange. Keys are stringified
    only in the final one-row fold."""
    from ray.data.aggregate import Sum as _Sum

    def audit_one(name: str, fname: str, col: str) -> "ray.data.Dataset":
        ds = ray.data.read_parquet(f"{sf_dir}/{fname}", columns=[col])

        def count_partials(batch: pa.Table) -> pa.Table:
            g = batch.group_by([col]).aggregate([([], "count_all")])
            return pa.table(
                {
                    "key": g.column(col).cast(pa.string())
                    if pa.types.is_string(g.column(col).type)
                    else g.column(col).cast(pa.int64()).cast(pa.string()),
                    "c": g.column("count_all").cast(pa.int64()),
                }
            )

        def row_partials(batch: pa.Table) -> pa.Table:
            c = batch.column("c_p").to_numpy(zero_copy_only=False)
            k = np.asarray(batch.column("key").to_pylist(), dtype=object)
            mx = int(c.max())
            at_max = k[c == mx]
            return pa.table(
                {
                    "key_name": pa.array([name], pa.string()),
                    "rows": pa.array([int(c.sum())], pa.int64()),
                    "keys": pa.array([len(c)], pa.int64()),
                    "mx": pa.array([mx], pa.int64()),
                    "hot": pa.array([min(at_max.tolist())], pa.string()),
                }
            )

        def merge(group: pa.Table) -> pa.Table:
            rows = int(
                group.column("rows").to_numpy(zero_copy_only=False).sum()
            )
            keys = int(
                group.column("keys").to_numpy(zero_copy_only=False).sum()
            )
            mx = group.column("mx").to_numpy(zero_copy_only=False)
            hot = group.column("hot").to_pylist()
            best = int(mx.max())
            hot_key = min(h for h, m in zip(hot, mx) if m == best)
            return pa.table(
                {
                    "key_name": pa.array([name], pa.string()),
                    "n_rows": pa.array([rows], pa.int64()),
                    "n_keys": pa.array([keys], pa.int64()),
                    "max_key_rows": pa.array([best], pa.int64()),
                    "hot_key": pa.array([hot_key], pa.string()),
                }
            )

        return (
            ds.map_batches(count_partials, batch_format="pyarrow")
            .groupby("key")
            .aggregate(_Sum("c", alias_name="c_p"))
            .map_batches(row_partials, batch_format="pyarrow")
            .groupby("key_name")
            .map_groups(merge, batch_format="pyarrow")
        )

    name0, f0, c0 = SKEW_KEYS[0]
    out = audit_one(name0, f0, c0)
    for name, fname, col in SKEW_KEYS[1:]:
        out = out.union(audit_one(name, fname, col))
    return out


Q10_LO_US = 844_128_000_000_000   # 1996-10-01 in epoch microseconds
Q10_HI_US = 852_076_800_000_000   # 1997-01-01


def q10_returned_items(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """TPC-H Q10 (returned-item reporting) — the four-table benchmark
    composition: customers ranked by revenue lost to returns in one
    quarter. lineitem(returnflag='R') ⋈ orders(quarter window) on
    orderkey, re-keyed to custkey, ⋈ customer, nation name stitched
    from a 25-row broadcast map, top-k by exact revenue cents.
    Tail-seated by design: the orderkey leg is q3_shipping_priority's
    fact-fact union-shuffle verbatim, the custkey leg is the same
    co-partition with customer as the build side, and nation is
    regional_brand_revenue's broadcast-dimension stitch.

    Scale shape: both fact joins ride ONE modular key co-partition
    each (orderkey, then custkey) — no broadcast of anything
    fact-scale; nation (25 rows) is the only ray.put. Revenue is
    summed per orderkey partition-locally before the custkey re-key,
    so the second shuffle carries at most one row per (custkey within
    an order-partition), and the global stage is only the k-row
    sort-limit. Dates and the returnflag prune at the scan edge."""
    from ..stages.shuffle import N_COARSE_PARTS

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    nation_tbl = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()  # 25 rows — the one legal driver materialization
    nation_ref = ray.put(
        {int(r["n_nationkey"]): r["n_name"] for r in nation_tbl}
    )

    def line_side(batch: pa.Table) -> pa.Table:
        import pandas as pd

        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        keep = rf == "R"
        lk = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame({"k": lk, "c": cents})
            .groupby("k", sort=False)["c"]
            .sum()
            .reset_index()
        )
        kk = g["k"].to_numpy().astype(np.int64)
        n = len(kk)
        return pa.table(
            {
                "okey": pa.array(kk, pa.int64()),
                "cents": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
                "ckey": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(kk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = (od >= Q10_LO_US) & (od < Q10_HI_US)
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        n = len(ok)
        return pa.table(
            {
                "okey": pa.array(ok, pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "ckey": pa.array(ck, pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ok % N_COARSE_PARTS, pa.int64()),
            }
        )

    stage_a = lines.map_batches(line_side, batch_format="pyarrow").union(
        orders.map_batches(order_side, batch_format="pyarrow")
    )

    def okey_join(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("okey")["ckey"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="okey", how="inner", rsuffix="_b")
        g = (
            m.groupby("ckey_b", sort=False)["cents"]
            .sum()
            .reset_index()
        )
        ck = g["ckey_b"].to_numpy().astype(np.int64)
        n = len(ck)
        return pa.table(
            {
                "ckey": pa.array(ck, pa.int64()),
                "cents": pa.array(g["cents"].to_numpy().astype(np.int64), pa.int64()),
                "name": pa.array([""] * n, pa.string()),
                "acctbal": pa.array(np.zeros(n, np.float64), pa.float64()),
                "nname": pa.array([""] * n, pa.string()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part2": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def cust_side(batch: pa.Table) -> pa.Table:
        nation = ray.get(nation_ref)
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nk = batch.column("c_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(ck)
        return pa.table(
            {
                "ckey": pa.array(ck, pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "name": batch.column("c_name"),
                "acctbal": batch.column("c_acctbal"),
                "nname": pa.array(
                    [nation[int(x)] for x in nk], pa.string()
                ),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part2": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    stage_b = (
        stage_a.groupby("part")
        .map_groups(okey_join, batch_format="pyarrow")
        .union(cust.map_batches(cust_side, batch_format="pyarrow"))
    )

    def ckey_join(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("ckey")[
            ["name", "acctbal", "nname"]
        ]
        probe = df[df["side"] == 1]
        g = (
            probe.groupby("ckey", sort=False)["cents"]
            .sum()
            .reset_index()
            .join(build, on="ckey", how="inner")
        )
        return pa.table(
            {
                "c_custkey": pa.array(g["ckey"].to_numpy(), pa.int64()),
                "c_name": pa.array(g["name"], pa.string()),
                "revenue_cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
                "c_acctbal": pa.array(g["acctbal"].to_numpy(), pa.float64()),
                "n_name": pa.array(g["nname"], pa.string()),
            }
        )

    return (
        stage_b.groupby("part2")
        .map_groups(ckey_join, batch_format="pyarrow")
        .sort(["revenue_cents", "c_custkey"], descending=[True, False])
        .limit(k)
    )


BENFORD_LANES = (
    ("lineitem.l_extendedprice", "lineitem.parquet", "l_extendedprice"),
    ("orders.o_totalprice", "orders.parquet", "o_totalprice"),
)


def benford_audit(sf_dir: str) -> "ray.data.Dataset":
    """Benford first-significant-digit audit over the money columns —
    the classic fraud / synthetic-data smell test: per (lane, digit)
    the exact row count and the share in basis points. Digits are
    extracted in EXACT integer arithmetic (value → round-half-up
    cents → leading digit via a power-of-ten searchsorted), never via
    float log10, so 1000.00 can never misclassify. Tail-seated by
    design: the fold is status_counts' bincount partial and the
    finalize is mix_weights' share-of-total on a ≤18-row grid.

    Scale shape: each batch folds to at most 9 (lane, digit, n)
    partials — the shuffle moves O(lanes × 9) rows regardless of
    input size; the share finalize runs per-lane on the bounded
    grid. Output: (lane, digit, n, share_bp)."""
    POW10 = 10 ** np.arange(19, dtype=np.int64)

    def digit_partials(lane: str, col: str):
        def fold(batch: pa.Table) -> pa.Table:
            x = batch.column(col).to_numpy(zero_copy_only=False)
            cents = np.floor(x * 100.0 + 0.5).astype(np.int64)
            cents = cents[cents > 0]
            ndig = np.searchsorted(POW10, cents, side="right")
            first = cents // POW10[ndig - 1]
            counts = np.bincount(first, minlength=10)[1:10]
            nz = np.nonzero(counts)[0]
            return pa.table(
                {
                    "lane": pa.array([lane] * len(nz), pa.string()),
                    "digit": pa.array((nz + 1).astype(np.int64), pa.int64()),
                    "n": pa.array(counts[nz].astype(np.int64), pa.int64()),
                }
            )

        return fold

    def one_lane(lane: str, fname: str, col: str) -> "ray.data.Dataset":
        return ray.data.read_parquet(
            f"{sf_dir}/{fname}", columns=[col]
        ).map_batches(digit_partials(lane, col), batch_format="pyarrow")

    ds = one_lane(*BENFORD_LANES[0])
    for lane, fname, col in BENFORD_LANES[1:]:
        ds = ds.union(one_lane(lane, fname, col))

    def finalize(grp: pa.Table) -> pa.Table:
        n = grp.column("n_p").to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(n.sum())
        return pa.table(
            {
                "lane": grp.column("lane"),
                "digit": grp.column("digit"),
                "n": pa.array(n, pa.int64()),
                "share_bp": pa.array(n * 10000 // total, pa.int64()),
            }
        )

    return (
        ds.groupby(["lane", "digit"])
        .aggregate(Sum("n", alias_name="n_p"))
        .groupby("lane")
        .map_groups(finalize, batch_format="pyarrow")
    )


FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem.parquet", "l_orderkey",
     "orders.parquet", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem.parquet", "l_partkey",
     "part.parquet", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem.parquet", "l_suppkey",
     "supplier.parquet", "s_suppkey"),
    ("orders.o_custkey->customer", "orders.parquet", "o_custkey",
     "customer.parquet", "c_custkey"),
    ("customer.c_nationkey->nation", "customer.parquet", "c_nationkey",
     "nation.parquet", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier.parquet", "s_nationkey",
     "nation.parquet", "n_nationkey"),
    ("nation.n_regionkey->region", "nation.parquet", "n_regionkey",
     "region.parquet", "r_regionkey"),
)


def orphan_fk_audit(sf_dir: str) -> "ray.data.Dataset":
    """Referential-integrity audit over every foreign-key edge in the
    star schema — per edge the exact child rows / distinct child keys
    / orphan rows & keys (child key with no parent) / unreferenced
    parents (parent key no child cites): the constraint sweep a lake
    runs before trusting joins, and the dial that catches partial
    loads (orphans) and retention skew (unreferenced parents).
    Tail-seated by design: suppression_antijoin's tagged union with
    BOTH polarities counted — rebuilt in wave 60 after the sf0.1 wall
    showed the uniform 7-shuffle plan treating 25-row nation like a
    fact (99.7 s → the mixed plan below).

    Scale shape — the join_strategy_plan decision applied to itself:
    parents under ORPHAN_BCAST_MAX rows (part, supplier, nation,
    region) broadcast their PK set once and the child fold marks
    orphanhood inline, so those edges ship ZERO parent rows; only the
    fact-scale parents (orders, customer) ride the tagged-union
    co-partition. ALL edges then share ONE hash exchange of packed
    int64 (edge << 48 | key) rows — a single exchange instead of
    seven sequential ones, and a single-int sort instead of a
    (string, int) composite (wave-88 rewrite: the sorted composite
    groupby was 42 s at sf0.1; the vectorized segment reduce below
    is the plan that holds) — whose per-partition fold
    sort+reduceat-reduces its key slice straight to a 7-row per-edge
    partial grid, finalized with the broadcast parents' row counts
    (n_unref = parent_rows − referenced keys there; PKs are unique by
    audit of their own edge)."""
    from ray.data.aggregate import Sum as _Sum

    parent_rows: dict[str, int] = {}
    bcast_keys: dict[str, "ray.ObjectRef"] = {}
    for edge, _cf, _ck, parent_f, parent_k in FK_EDGES:
        if parent_f not in parent_rows:
            pds = ray.data.read_parquet(
                f"{sf_dir}/{parent_f}", columns=[parent_k]
            )
            n = int(pds.count())
            parent_rows[parent_f] = n
            if n <= ORPHAN_BCAST_MAX:
                keys = np.sort(
                    np.asarray(
                        [r[parent_k] for r in pds.take_all()], dtype=np.int64
                    )
                )
                bcast_keys[parent_f] = ray.put(keys)

    # keys pack with the edge ordinal into ONE int64 shuffle key
    # (edge_id << 48 | key): a single-int sort beats the (string,
    # int) composite by a wide margin, and TPC-H keys stay far below
    # 2^48 even at 100 TB (~10^11 rows).
    edge_ids = {e[0]: i for i, e in enumerate(FK_EDGES)}

    def child_fold(edge, child_k, pref):
        eid = edge_ids[edge] << 48

        def fold(batch: pa.Table) -> pa.Table:
            k = batch.column(child_k).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            u, cnt = np.unique(k, return_counts=True)
            if pref is not None:
                pk = ray.get(pref)
                idx = np.searchsorted(pk, u)
                idx_c = np.minimum(idx, len(pk) - 1)
                par = (pk[idx_c] == u).astype(np.int64)
            else:
                par = np.zeros(len(u), np.int64)
            gkey = eid | u
            return pa.table(
                {
                    "gkey": pa.array(gkey, pa.int64()),
                    "rows": pa.array(cnt.astype(np.int64), pa.int64()),
                    "par": pa.array(par, pa.int64()),
                    "part": pa.array(gkey % ORPHAN_PARTS, pa.int64()),
                }
            )

        return fold

    def parent_fold(edge, parent_k):
        eid = edge_ids[edge] << 48

        def fold(batch: pa.Table) -> pa.Table:
            k = np.unique(
                batch.column(parent_k).cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                )
            )
            n = len(k)
            gkey = eid | k
            return pa.table(
                {
                    "gkey": pa.array(gkey, pa.int64()),
                    "rows": pa.array(np.zeros(n, np.int64), pa.int64()),
                    "par": pa.array(np.ones(n, np.int64), pa.int64()),
                    "part": pa.array(gkey % ORPHAN_PARTS, pa.int64()),
                }
            )

        return fold

    lanes = []
    shuffle_edges = set()
    for edge, child_f, child_k, parent_f, parent_k in FK_EDGES:
        pref = bcast_keys.get(parent_f)
        lanes.append(
            ray.data.read_parquet(
                f"{sf_dir}/{child_f}", columns=[child_k]
            ).map_batches(
                child_fold(edge, child_k, pref), batch_format="pyarrow"
            )
        )
        if pref is None:
            shuffle_edges.add(edge)
            lanes.append(
                ray.data.read_parquet(
                    f"{sf_dir}/{parent_f}", columns=[parent_k]
                ).map_batches(
                    parent_fold(edge, parent_k), batch_format="pyarrow"
                )
            )
    ds = lanes[0]
    for lane in lanes[1:]:
        ds = ds.union(lane)

    edge_names = [e[0] for e in FK_EDGES]
    n_edges = len(FK_EDGES)

    def part_fold(grp: pa.Table) -> pa.Table:
        # one partition = a hash slice of (edge, key) space; fully
        # vectorized segment reduce (sort + reduceat), emits a 7-row
        # per-edge partial grid.
        gk = grp.column("gkey").to_numpy(zero_copy_only=False)
        rows = grp.column("rows").to_numpy(zero_copy_only=False)
        par = grp.column("par").to_numpy(zero_copy_only=False)
        order = np.argsort(gk, kind="stable")
        gks, rs, ps = gk[order], rows[order], par[order]
        starts = np.r_[True, gks[1:] != gks[:-1]]
        idx = np.nonzero(starts)[0]
        seg_rows = np.add.reduceat(rs, idx)
        seg_par = np.maximum.reduceat(ps, idx) > 0
        eid = (gks[starts] >> 48).astype(np.int64)
        is_child = seg_rows > 0
        orphan = is_child & ~seg_par
        acc = np.zeros((6, n_edges), np.int64)
        np.add.at(acc[0], eid, seg_rows)
        np.add.at(acc[1], eid, is_child.astype(np.int64))
        np.add.at(acc[2], eid, np.where(orphan, seg_rows, 0))
        np.add.at(acc[3], eid, orphan.astype(np.int64))
        np.add.at(acc[4], eid, (seg_par & ~is_child).astype(np.int64))
        np.add.at(acc[5], eid, (seg_par & is_child).astype(np.int64))
        return pa.table(
            {
                "edge": pa.array(edge_names, pa.string()),
                "n_child_rows": pa.array(acc[0], pa.int64()),
                "n_child_keys": pa.array(acc[1], pa.int64()),
                "n_orphan_rows": pa.array(acc[2], pa.int64()),
                "n_orphan_keys": pa.array(acc[3], pa.int64()),
                "n_unref": pa.array(acc[4], pa.int64()),
                "n_ref": pa.array(acc[5], pa.int64()),
            }
        )

    parent_n = {
        edge: parent_rows[pf]
        for edge, _cf, _ck, pf, _pk in FK_EDGES
    }

    def finalize(batch: pa.Table) -> pa.Table:
        edges = batch.column("edge").to_pylist()
        unref_direct = batch.column("n_unref_p").to_numpy(
            zero_copy_only=False
        )
        ref = batch.column("n_ref_p").to_numpy(zero_copy_only=False)
        unref = np.array(
            [
                unref_direct[i]
                if e in shuffle_edges
                else parent_n[e] - int(ref[i])
                for i, e in enumerate(edges)
            ],
            np.int64,
        )
        return pa.table(
            {
                "edge": batch.column("edge"),
                "n_child_rows": batch.column("n_child_rows_p"),
                "n_child_keys": batch.column("n_child_keys_p"),
                "n_orphan_rows": batch.column("n_orphan_rows_p"),
                "n_orphan_keys": batch.column("n_orphan_keys_p"),
                "n_unref_parents": pa.array(unref, pa.int64()),
            }
        )

    return (
        ds.groupby("part")
        .map_groups(part_fold, batch_format="pyarrow")
        .groupby("edge")
        .aggregate(
            _Sum("n_child_rows", alias_name="n_child_rows_p"),
            _Sum("n_child_keys", alias_name="n_child_keys_p"),
            _Sum("n_orphan_rows", alias_name="n_orphan_rows_p"),
            _Sum("n_orphan_keys", alias_name="n_orphan_keys_p"),
            _Sum("n_unref", alias_name="n_unref_p"),
            _Sum("n_ref", alias_name="n_ref_p"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


ORPHAN_BCAST_MAX = 1_000_000  # parent PK sets up to this many rows broadcast
ORPHAN_PARTS = 64             # hash slices of the packed (edge, key) space


KANON_SIZE_BUCKETS = ((1, 1), (2, 2), (3, 4), (5, 9), (10, 1 << 62))
KANON_BAL_SHIFT = 10_000_000  # cents min is -99_999: shift keeps // = floor


def _kanon_qi(batch: pa.Table, with_segment: bool):
    nk = batch.column("c_nationkey").cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
    cents = np.floor(bal * 100.0 + 0.5).astype(np.int64)
    bucket = (cents + KANON_BAL_SHIFT) // 100_000
    if not with_segment:
        return nk, bucket, None
    seg = np.asarray(batch.column("c_mktsegment").to_pylist(), dtype=object)
    return nk, bucket, seg


def k_anonymity_audit(sf_dir: str) -> "ray.data.Dataset":
    """k-anonymity audit of the customer table — equivalence-class
    size distribution over the quasi-identifier tuple (nation, market
    segment, $1000 balance bucket): per size band the exact number of
    classes and of rows living in them. Classes of size < 5 are the
    re-identification risk a release gate blocks on. Balance buckets
    shift cents by +10^7 before the // so floor-division semantics
    agree for negative balances (DuckDB '//' truncates toward zero).
    Tail-seated by design: status_counts' bincount fold over a
    groupby-sized key.

    Scale shape: per-batch (QI, n) partials → ONE groupby on the QI
    tuple (class sizes are complete there) → per-batch size-band
    partials → a ≤5-row grid sum; the driver never sees a class.
    Output: (size_lo, size_hi, n_classes, n_rows)."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    )

    def qi_partials(batch: pa.Table) -> pa.Table:
        import pandas as pd

        nk, bucket, seg = _kanon_qi(batch, with_segment=True)
        g = (
            pd.DataFrame({"nk": nk, "seg": seg, "b": bucket, "n": 1})
            .groupby(["nk", "seg", "b"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "nk": pa.array(g["nk"].to_numpy(), pa.int64()),
                "seg": pa.array(g["seg"], pa.string()),
                "b": pa.array(g["b"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def band_partials(batch: pa.Table) -> pa.Table:
        sizes = batch.column("n_p").to_numpy(zero_copy_only=False)
        lo = np.array([b[0] for b in KANON_SIZE_BUCKETS], np.int64)
        hi = np.array([b[1] for b in KANON_SIZE_BUCKETS], np.int64)
        band = np.searchsorted(lo, sizes, side="right") - 1
        n_classes = np.bincount(band, minlength=len(lo)).astype(np.int64)
        n_rows = np.bincount(band, weights=sizes, minlength=len(lo)).astype(
            np.int64
        )
        keep = n_classes > 0
        return pa.table(
            {
                "size_lo": pa.array(lo[keep], pa.int64()),
                "size_hi": pa.array(
                    np.minimum(hi[keep], (1 << 62)), pa.int64()
                ),
                "n_classes": pa.array(n_classes[keep], pa.int64()),
                "n_rows": pa.array(n_rows[keep], pa.int64()),
            }
        )

    return (
        ds.map_batches(qi_partials, batch_format="pyarrow")
        .groupby(["nk", "seg", "b"])
        .aggregate(_Sum("n", alias_name="n_p"))
        .map_batches(band_partials, batch_format="pyarrow")
        .groupby(["size_lo", "size_hi"])
        .aggregate(
            _Sum("n_classes", alias_name="n_classes"),
            _Sum("n_rows", alias_name="n_rows"),
        )
    )


def l_diversity_audit(sf_dir: str) -> "ray.data.Dataset":
    """l-diversity audit — the companion gate k-anonymity misses:
    with quasi-identifiers (nation, $1000 balance bucket) and the
    market segment as the sensitive attribute, a class whose members
    all share one segment leaks the attribute even at k ≥ 5. Reports,
    per distinct-segment count l, the exact number of QI classes and
    rows — the l = 1 row is the homogeneity-attack surface.
    Tail-seated by design: k_anonymity_audit's fold with the distinct
    count layered on.

    Scale shape: per-batch (QI, segment, n) partials → ONE groupby on
    (QI, segment) → per-batch (QI, classes=1, rows=n) re-partials →
    groupby QI (distinct-segment counts are complete there) → a
    ≤5-row l-grid sum. Output: (l, n_classes, n_rows)."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    )

    def qi_seg_partials(batch: pa.Table) -> pa.Table:
        import pandas as pd

        nk, bucket, seg = _kanon_qi(batch, with_segment=True)
        g = (
            pd.DataFrame({"nk": nk, "b": bucket, "seg": seg, "n": 1})
            .groupby(["nk", "b", "seg"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "nk": pa.array(g["nk"].to_numpy(), pa.int64()),
                "b": pa.array(g["b"].to_numpy(), pa.int64()),
                "seg": pa.array(g["seg"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def one_per_seg(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nk": batch.column("nk"),
                "b": batch.column("b"),
                "l1": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
                "rows": batch.column("n_p"),
            }
        )

    def l_partials(batch: pa.Table) -> pa.Table:
        ell = batch.column("l_p").to_numpy(zero_copy_only=False)
        rows = batch.column("rows_p").to_numpy(zero_copy_only=False)
        u = np.unique(ell)
        return pa.table(
            {
                "l": pa.array(u, pa.int64()),
                "n_classes": pa.array(
                    np.array([(ell == x).sum() for x in u], np.int64),
                    pa.int64(),
                ),
                "n_rows": pa.array(
                    np.array([rows[ell == x].sum() for x in u], np.int64),
                    pa.int64(),
                ),
            }
        )

    return (
        ds.map_batches(qi_seg_partials, batch_format="pyarrow")
        .groupby(["nk", "b", "seg"])
        .aggregate(_Sum("n", alias_name="n_p"))
        .map_batches(one_per_seg, batch_format="pyarrow")
        .groupby(["nk", "b"])
        .aggregate(
            _Sum("l1", alias_name="l_p"), _Sum("rows", alias_name="rows_p")
        )
        .map_batches(l_partials, batch_format="pyarrow")
        .groupby("l")
        .aggregate(
            _Sum("n_classes", alias_name="n_classes"),
            _Sum("n_rows", alias_name="n_rows"),
        )
    )


JOINABILITY_PARTS = 64  # hash slices of the shared value space

JOINABILITY_COLS = (
    ("customer.c_custkey", "customer.parquet", "c_custkey"),
    ("orders.o_custkey", "orders.parquet", "o_custkey"),
    ("orders.o_orderkey", "orders.parquet", "o_orderkey"),
    ("lineitem.l_orderkey", "lineitem.parquet", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem.parquet", "l_partkey"),
    ("part.p_partkey", "part.parquet", "p_partkey"),
    ("lineitem.l_suppkey", "lineitem.parquet", "l_suppkey"),
    ("supplier.s_suppkey", "supplier.parquet", "s_suppkey"),
)


def joinability_audit(sf_dir: str) -> "pa.Table":
    """Join-key discovery across the lake — for every pair of the 8
    candidate key columns, the EXACT value-set overlap: |A|, |B|,
    |A∩B|, Jaccard and containment(A in B) in basis points. This is
    the profile a data catalog runs to propose joins (and to catch
    key-domain drift: a custkey column that stops containing the
    customer PK is a broken pipeline). One value-keyed hash exchange
    serves ALL 28 pairs: each column contributes (value, 1<<col)
    presence rows; each hash slice of the value space OR-merges its
    masks with a fully vectorized sort + bitwise_or.reduceat and
    folds STRAIGHT to a 256-bin mask-histogram partial (wave-60
    tried a (value,bit)→(value) chain — big exchange twice — and an
    8-wide Max-flag row — 3× shuffle bytes; wave-88 replaced the
    surviving per-key AggregateFn, 41 s of per-value Python at
    sf0.1, with this segment reduce). The ≤256-row histogram — the
    only thing the driver reads — yields every pairwise intersection
    by popcount arithmetic. Tail-seated by design: dedup_exact's
    distinct fold with a bitmask payload.

    Scale shape: per-batch per-column distinct fold → ONE groupby(v)
    OR-merging int64 masks (cross-batch repeats are absorbed by the
    idempotent OR) → per-batch 256-bin histogram partials → one
    ≤256-row grid; pairwise math on the driver touches 256 ints,
    never a value. Output: (col_a, col_b, n_a, n_b, n_common,
    jaccard_bp, containment_bp)."""
    from ray.data.aggregate import Sum as _Sum

    def one_col(i: int, fname: str, col: str) -> "ray.data.Dataset":
        def fold(batch: pa.Table) -> pa.Table:
            v = np.unique(
                batch.column(col).cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                )
            )
            return pa.table(
                {
                    "v": pa.array(v, pa.int64()),
                    "m": pa.array(
                        np.full(len(v), 1 << i, np.int64), pa.int64()
                    ),
                    "part": pa.array(v % JOINABILITY_PARTS, pa.int64()),
                }
            )

        return ray.data.read_parquet(
            f"{sf_dir}/{fname}", columns=[col]
        ).map_batches(fold, batch_format="pyarrow")

    ds = one_col(0, JOINABILITY_COLS[0][1], JOINABILITY_COLS[0][2])
    for i, (_, fname, col) in enumerate(JOINABILITY_COLS[1:], start=1):
        ds = ds.union(one_col(i, fname, col))

    def part_or_hist(grp: pa.Table) -> pa.Table:
        # one hash slice of the value space: vectorized segment OR
        # (sort + bitwise_or.reduceat) folded STRAIGHT to the 256-bin
        # mask histogram partial — no per-key Python (the wave-88
        # rewrite of the per-key AggregateFn that cost 41 s at sf0.1).
        v = grp.column("v").to_numpy(zero_copy_only=False)
        m = grp.column("m").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        vs, ms = v[order], m[order]
        idx = np.nonzero(np.r_[True, vs[1:] != vs[:-1]])[0]
        masks = np.bitwise_or.reduceat(ms, idx)
        cnt = np.bincount(masks, minlength=256).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "mask": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(cnt[nz], pa.int64()),
            }
        )

    hist = np.zeros(256, np.int64)
    grid = (
        ds.groupby("part")
        .map_groups(part_or_hist, batch_format="pyarrow")
        .groupby("mask")
        .aggregate(_Sum("n", alias_name="n"))
    )
    for b in grid.iter_batches(batch_format="pyarrow"):
        for mask, n in zip(
            b.column("mask").to_pylist(), b.column("n").to_pylist()
        ):
            hist[mask] += n

    names = [c[0] for c in JOINABILITY_COLS]
    masks = np.arange(256, dtype=np.int64)
    rows = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            in_i = (masks >> i) & 1 > 0
            in_j = (masks >> j) & 1 > 0
            n_a = int(hist[in_i].sum())
            n_b = int(hist[in_j].sum())
            n_c = int(hist[in_i & in_j].sum())
            union = n_a + n_b - n_c
            rows.append(
                (
                    names[i], names[j], n_a, n_b, n_c,
                    n_c * 10000 // union if union else 0,
                    n_c * 10000 // n_a if n_a else 0,
                )
            )
    return pa.table(
        {
            "col_a": pa.array([r[0] for r in rows], pa.string()),
            "col_b": pa.array([r[1] for r in rows], pa.string()),
            "n_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "n_common": pa.array([r[4] for r in rows], pa.int64()),
            "jaccard_bp": pa.array([r[5] for r in rows], pa.int64()),
            "containment_bp": pa.array([r[6] for r in rows], pa.int64()),
        }
    )


COMPACTION_TARGET = 32_768  # bytes per planned output file
COMPACTION_BUCKETS = 256


def compaction_plan(sf_dir: str) -> "ray.data.Dataset":
    """Small-file compaction planner — the lakehouse maintenance op:
    assign each document (in doc_id order within its source) to an
    output file of ~32 KiB by the rule file_idx = exclusive-prefix-
    bytes // target, and report per (source, file) the exact doc
    count, byte total, and id range — the manifest a compactor
    executes and a resumable writer skips finished entries of.
    Tail-seated by design: decile_table's two-pass bucket-grid prefix
    machinery driving a storage plan instead of a quantile.

    Scale shape: a source never fits one partition at 10^12 rows, so
    the prefix sum is two-pass — pass 1 folds per-batch (source,
    id-range bucket) byte sums into a bounded grid, the driver builds
    per-source EXCLUSIVE bucket offsets (≤ sources×256 ints) and
    broadcasts them; pass 2 computes local exclusive cumsums inside
    each (source, bucket) group (complete by construction) and folds
    straight to (source, file) partials, summed in a final bounded
    groupby. Output: (source, file_idx, n_docs, bytes, doc_lo,
    doc_hi)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    max_id = ds.aggregate(_Max("doc_id"))["max(doc_id)"]
    span = int(max_id) + 1

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        return ids * COMPACTION_BUCKETS // span

    def pass1(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        nb = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        g = (
            pd.DataFrame({"source": src, "bucket": bucket_of(ids), "b": nb})
            .groupby(["source", "bucket"], sort=False)["b"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "bucket": pa.array(g["bucket"].to_numpy(), pa.int64()),
                "b": pa.array(g["b"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid: dict[str, np.ndarray] = {}
    for b in (
        ds.map_batches(pass1, batch_format="pyarrow")
        .groupby(["source", "bucket"])
        .aggregate(_Sum("b", alias_name="b"))
        .iter_batches(batch_format="pyarrow")
    ):
        for s, k, v in zip(
            b.column("source").to_pylist(),
            b.column("bucket").to_pylist(),
            b.column("b").to_pylist(),
        ):
            grid.setdefault(s, np.zeros(COMPACTION_BUCKETS, np.int64))[k] = v
    offsets = {
        s: np.concatenate(([0], np.cumsum(arr)[:-1])) for s, arr in grid.items()
    }
    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return batch.append_column(
            "bucket", pa.array(bucket_of(ids), pa.int64())
        )

    def pass2(grp: pa.Table) -> pa.Table:
            ids = grp.column("doc_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            nb = grp.column("n_chars").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            src = grp.column("source")[0].as_py()
            bkt = int(grp.column("bucket")[0].as_py())
            order = np.argsort(ids)
            ids, nb = ids[order], nb[order]
            excl = (
                np.concatenate(([0], np.cumsum(nb)[:-1]))
                + offsets[src][bkt]
            )
            fidx = excl // COMPACTION_TARGET
            g = (
                pd.DataFrame(
                    {"f": fidx, "n": 1, "b": nb, "lo": ids, "hi": ids}
                )
                .groupby("f", sort=False)
                .agg(
                    n=("n", "sum"), b=("b", "sum"),
                    lo=("lo", "min"), hi=("hi", "max"),
                )
                .reset_index()
            )
            return pa.table(
                {
                    "source": pa.array([src] * len(g), pa.string()),
                    "file_idx": pa.array(g["f"].to_numpy(), pa.int64()),
                    "n_docs": pa.array(
                        g["n"].to_numpy().astype(np.int64), pa.int64()
                    ),
                    "bytes": pa.array(
                        g["b"].to_numpy().astype(np.int64), pa.int64()
                    ),
                    "doc_lo": pa.array(g["lo"].to_numpy(), pa.int64()),
                    "doc_hi": pa.array(g["hi"].to_numpy(), pa.int64()),
                }
            )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(["source", "bucket"])
        .map_groups(pass2, batch_format="pyarrow")
        .groupby(["source", "file_idx"])
        .aggregate(
            _Sum("n_docs", alias_name="n_docs"),
            _Sum("bytes", alias_name="bytes"),
            _Min("doc_lo", alias_name="doc_lo"),
            _Max("doc_hi", alias_name="doc_hi"),
        )
    )


Q18_QTY_THRESH_C = 20_000  # 200.00 quantity units in exact centi-units


def q18_large_orders(sf_dir: str, k: int = 100) -> "ray.data.Dataset":
    """TPC-H Q18 (large-volume customer) — the HAVING-gated fact
    aggregate joined back to its dimensions: orders whose total
    lineitem quantity exceeds 200 units, with customer name, order
    date/price and the exact quantity sum, top-k by price. The shape
    Q3/Q10 don't cover: the filter is an aggregate over the BIGGEST
    table, so the gate itself must be computed distributed before
    any join. Tail-seated by design: q10_returned_items' two
    co-partition legs with the build side produced by a groupby
    instead of a scan filter.

    Scale shape: lineitem folds per-batch (orderkey, qty) partials →
    ONE groupby(orderkey) completes the sums → the > 200 gate prunes
    to the rare heavy orders → the survivors ride the SAME orderkey
    co-partition against orders (no re-shuffle of lineitem), re-key
    to a custkey co-partition against customer, and only the k-row
    sort-limit is global. Quantities are exact centi-units."""
    from ..stages.shuffle import N_COARSE_PARTS

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )

    def qty_partials(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lk = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        qc = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"k": lk, "q": qc})
            .groupby("k", sort=False)["q"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "okey": pa.array(g["k"].to_numpy().astype(np.int64), pa.int64()),
                "q": pa.array(g["q"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def heavy_side(batch: pa.Table) -> pa.Table:
        q = batch.column("q_p").to_numpy(zero_copy_only=False)
        keep = q > Q18_QTY_THRESH_C
        ok = batch.column("okey").to_numpy(zero_copy_only=False)[keep]
        n = len(ok)
        return pa.table(
            {
                "okey": pa.array(ok, pa.int64()),
                "q": pa.array(q[keep], pa.int64()),
                "ckey": pa.array(np.zeros(n, np.int64), pa.int64()),
                "odate": pa.array(np.zeros(n, np.int64), pa.int64()),
                "price_c": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ok % N_COARSE_PARTS, pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        price_c = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        n = len(ok)
        return pa.table(
            {
                "okey": pa.array(ok, pa.int64()),
                "q": pa.array(np.zeros(n, np.int64), pa.int64()),
                "ckey": batch.column("o_custkey").cast(pa.int64()),
                "odate": batch.column("o_orderdate").cast(pa.int64()),
                "price_c": pa.array(price_c, pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(ok % N_COARSE_PARTS, pa.int64()),
            }
        )

    stage_a = (
        lines.map_batches(qty_partials, batch_format="pyarrow")
        .groupby("okey")
        .aggregate(Sum("q", alias_name="q_p"))
        .map_batches(heavy_side, batch_format="pyarrow")
        .union(orders.map_batches(order_side, batch_format="pyarrow"))
    )

    def okey_join(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("okey")["q"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="okey", how="inner", rsuffix="_b")
        ck = m["ckey"].to_numpy().astype(np.int64)
        n = len(ck)
        return pa.table(
            {
                "ckey": pa.array(ck, pa.int64()),
                "okey": pa.array(m["okey"].to_numpy().astype(np.int64), pa.int64()),
                "odate": pa.array(m["odate"].to_numpy().astype(np.int64), pa.int64()),
                "price_c": pa.array(
                    m["price_c"].to_numpy().astype(np.int64), pa.int64()
                ),
                "q": pa.array(m["q_b"].to_numpy().astype(np.int64), pa.int64()),
                "name": pa.array([""] * n, pa.string()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part2": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(ck)
        return pa.table(
            {
                "ckey": pa.array(ck, pa.int64()),
                "okey": pa.array(np.zeros(n, np.int64), pa.int64()),
                "odate": pa.array(np.zeros(n, np.int64), pa.int64()),
                "price_c": pa.array(np.zeros(n, np.int64), pa.int64()),
                "q": pa.array(np.zeros(n, np.int64), pa.int64()),
                "name": batch.column("c_name"),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part2": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    stage_b = (
        stage_a.groupby("part")
        .map_groups(okey_join, batch_format="pyarrow")
        .union(cust.map_batches(cust_side, batch_format="pyarrow"))
    )

    def ckey_join(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("ckey")["name"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="ckey", how="inner", rsuffix="_b")
        return pa.table(
            {
                "c_name": pa.array(m["name_b"], pa.string()),
                "c_custkey": pa.array(
                    m["ckey"].to_numpy().astype(np.int64), pa.int64()
                ),
                "o_orderkey": pa.array(
                    m["okey"].to_numpy().astype(np.int64), pa.int64()
                ),
                "o_orderdate_us": pa.array(
                    m["odate"].to_numpy().astype(np.int64), pa.int64()
                ),
                "o_totalprice_cents": pa.array(
                    m["price_c"].to_numpy().astype(np.int64), pa.int64()
                ),
                "sum_qty_c": pa.array(
                    m["q"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        stage_b.groupby("part2")
        .map_groups(ckey_join, batch_format="pyarrow")
        .sort(["o_totalprice_cents", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


WELCH_SCALE = 1_000  # t² fixed-point; shrink if HUGEINT headroom tightens


def welch_t2_grid(sf_dir: str) -> "ray.data.Dataset":
    """Welch's t² between every pair of sources on document length —
    the mean-shift monitor for a corpus mix: which sources genuinely
    differ in average doc length, unequal variances allowed. The
    whole statistic is computed in EXACT big-integer arithmetic from
    per-source sufficient statistics (n, Σx, Σx²): with D = S₁n₂ −
    S₂n₁, t²·10³ = D²(n₁−1)(n₂−1)·10³ // [(n₁Q₁−S₁²)n₂²(n₂−1) +
    (n₂Q₂−S₂²)n₁²(n₁−1)] — no sqrt, no float sum, bit-exact in any
    engine (oracle computes the same in HUGEINT; the 10³ scale is
    the headroom dial — at ~10⁶ docs/source the products near
    HUGEINT's 1.7e38 ceiling, so larger corpora shrink the scale or
    shard the grid). Tail-seated by design: corr_moments' sufficient
    -statistics fold with the pairwise grid finalized driver-side on
    ≤ sources rows.

    Scale shape: ONE pass folds per-batch (source, n, S, Q) partials
    → a bounded per-source grid; the 66-pair arithmetic touches only
    that grid. Output: (src_a, src_b, n_a, n_b, mean_a_x1000,
    mean_b_x1000, t2_x1000)."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        import pandas as pd

        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        x = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        g = (
            pd.DataFrame({"source": src, "n": 1, "s": x, "q": x * x})
            .groupby("source", sort=False)
            .agg(n=("n", "sum"), s=("s", "sum"), q=("q", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
                "s": pa.array(g["s"].to_numpy().astype(np.int64), pa.int64()),
                "q": pa.array(g["q"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    stats: list[tuple[str, int, int, int]] = []
    for b in (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("s", alias_name="s"),
            _Sum("q", alias_name="q"),
        )
        .iter_batches(batch_format="pyarrow")
    ):
        stats.extend(
            zip(
                b.column("source").to_pylist(),
                b.column("n").to_pylist(),
                b.column("s").to_pylist(),
                b.column("q").to_pylist(),
            )
        )
    stats.sort()
    rows = []
    for i in range(len(stats)):
        for j in range(i + 1, len(stats)):
            (sa, n1, s1, q1), (sb, n2, s2, q2) = stats[i], stats[j]
            d = s1 * n2 - s2 * n1
            den = (n1 * q1 - s1 * s1) * n2 * n2 * (n2 - 1) + (
                n2 * q2 - s2 * s2
            ) * n1 * n1 * (n1 - 1)
            t2 = d * d * (n1 - 1) * (n2 - 1) * WELCH_SCALE // den
            rows.append(
                (
                    sa, sb, n1, n2,
                    s1 * 1000 // n1, s2 * 1000 // n2, t2,
                )
            )
    return pa.table(
        {
            "src_a": pa.array([r[0] for r in rows], pa.string()),
            "src_b": pa.array([r[1] for r in rows], pa.string()),
            "n_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "mean_a_x1000": pa.array([r[4] for r in rows], pa.int64()),
            "mean_b_x1000": pa.array([r[5] for r in rows], pa.int64()),
            "t2_x1000": pa.array([r[6] for r in rows], pa.int64()),
        }
    )


Q5_REGION = "ASIA"
Q5_LO_US = 852_076_800_000_000   # 1997-01-01 epoch microseconds
Q5_HI_US = 883_612_800_000_000   # 1998-01-01


def q5_local_supplier(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q5 (local supplier volume) — the deepest join tree in
    the registry: revenue per nation where the ordering customer and
    the supplying supplier sit in the SAME nation of one region, over
    one order-date year. Three fact co-partitions CHAINED — orderkey
    (orders⋈lineitem), custkey (⋈customer), suppkey (⋈supplier) —
    with the nation equality applied at the last hop and the 5-nation
    region membership broadcast. Tail-seated by design: q10's legs
    plus one more hop; nothing fact-scale ever broadcasts.

    Scale shape: dates prune orders at the scan; after each hop the
    payload is pre-summed per next-hop key group inside the partition
    (cents ride as exact ints), so every shuffle carries at most one
    row per (key, nation) pair per partition; the final groupby is
    over ≤ 5 nations. Output: (n_name, revenue_cents) by revenue
    desc."""
    from ..stages.shuffle import N_COARSE_PARTS

    nation_rows = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).take_all()
    region_rows = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).take_all()
    rkey = {r["r_regionkey"]: r["r_name"] for r in region_rows}
    asia = {
        int(n["n_nationkey"]): n["n_name"]
        for n in nation_rows
        if rkey[n["n_regionkey"]] == Q5_REGION
    }
    asia_ref = ray.put(asia)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )

    def order_side(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = (od >= Q5_LO_US) & (od < Q5_HI_US)
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        n = len(ok)
        return pa.table(
            {
                "k": pa.array(ok, pa.int64()),
                "a": pa.array(ck, pa.int64()),
                "b": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ok % N_COARSE_PARTS, pa.int64()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        lk = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        sk = batch.column("l_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        n = len(lk)
        return pa.table(
            {
                "k": pa.array(lk, pa.int64()),
                "a": pa.array(np.zeros(n, np.int64), pa.int64()),
                "b": pa.array(sk, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(lk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop1(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")["a"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        g = (
            m.groupby(["a_b", "b"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        ck = g["a_b"].to_numpy().astype(np.int64)
        n = len(ck)
        return pa.table(
            {
                "k": pa.array(ck, pa.int64()),
                "a": pa.array(g["b"].to_numpy().astype(np.int64), pa.int64()),
                "b": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def cust_side(batch: pa.Table) -> pa.Table:
        asia = ray.get(asia_ref)
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nk = batch.column("c_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = np.isin(nk, np.fromiter(asia, np.int64))
        ck, nk = ck[keep], nk[keep]
        n = len(ck)
        return pa.table(
            {
                "k": pa.array(ck, pa.int64()),
                "a": pa.array(nk, pa.int64()),
                "b": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop2(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")["a"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        g = (
            m.groupby(["a", "a_b"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        sk = g["a"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "k": pa.array(sk, pa.int64()),
                "a": pa.array(g["a_b"].to_numpy().astype(np.int64), pa.int64()),
                "cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
                "side": pa.array(np.ones(len(sk), np.int64), pa.int64()),
                "part": pa.array(sk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def supp_side(batch: pa.Table) -> pa.Table:
        asia = ray.get(asia_ref)
        sk = batch.column("s_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nk = batch.column("s_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = np.isin(nk, np.fromiter(asia, np.int64))
        sk, nk = sk[keep], nk[keep]
        n = len(sk)
        return pa.table(
            {
                "k": pa.array(sk, pa.int64()),
                "a": pa.array(nk, pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(sk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop3(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")["a"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        m = m[m["a"] == m["a_b"]]
        g = m.groupby("a", sort=False)["cents"].sum().reset_index()
        return pa.table(
            {
                "nk": pa.array(g["a"].to_numpy().astype(np.int64), pa.int64()),
                "cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        asia = ray.get(asia_ref)
        nk = batch.column("nk").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": pa.array(
                    [asia[int(x)] for x in nk], pa.string()
                ),
                "revenue_cents": batch.column("cents_p"),
            }
        )

    stage1 = orders.map_batches(order_side, batch_format="pyarrow").union(
        lines.map_batches(line_side, batch_format="pyarrow")
    )
    stage2 = (
        stage1.groupby("part")
        .map_groups(hop1, batch_format="pyarrow")
        .union(cust.map_batches(cust_side, batch_format="pyarrow"))
    )
    stage3 = (
        stage2.groupby("part")
        .map_groups(hop2, batch_format="pyarrow")
        .union(supp.map_batches(supp_side, batch_format="pyarrow"))
    )
    return (
        stage3.groupby("part")
        .map_groups(hop3, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(Sum("cents", alias_name="cents_p"))
        .map_batches(finalize, batch_format="pyarrow")
        .sort(["revenue_cents", "n_name"], descending=[True, False])
    )


SALT_TARGET_ROWS = 64  # rows per salted sub-key a partition should see
SALT_TOP = 10


def salt_plan(sf_dir: str) -> "ray.data.Dataset":
    """Hot-key salting plan — the ACTIONABLE half of
    shuffle_skew_audit: for each shuffle-key domain the engine
    actually partitions on, the 10 heaviest keys with the salt
    factor a planner would split them into (ceil(rows / 64), so a
    salted sub-key carries ≤ 64 rows) — exactly the number a
    key-partitioned stage multiplies its hot keys by before the
    exchange. Keys compare as strings in the (rows desc, key asc)
    tiebreak so int and string domains share one total order.
    Tail-seated by design: shuffle_skew_audit's per-key fold with
    grouped_topk's rank-then-limit.

    Scale shape: per-batch (key, rows) partials → ONE groupby per
    domain completes the counts → the global step is a 10-row
    sort-limit per domain. Output: (domain, key, n_rows, salt)."""
    from ray.data.aggregate import Sum as _Sum

    def one_domain(domain: str, fname: str, col: str) -> "ray.data.Dataset":
        ds = ray.data.read_parquet(f"{sf_dir}/{fname}", columns=[col])

        def fold(batch: pa.Table) -> pa.Table:
            vals = batch.column(col).cast(pa.string())
            arr = np.asarray(vals.to_pylist(), dtype=object)
            u, cnt = np.unique(arr, return_counts=True)
            return pa.table(
                {
                    "key": pa.array(u, pa.string()),
                    "n": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        def finalize(batch: pa.Table) -> pa.Table:
            n = batch.column("n_p").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "domain": pa.array([domain] * len(n), pa.string()),
                    "key": batch.column("key"),
                    "n_rows": pa.array(n.astype(np.int64), pa.int64()),
                    "salt": pa.array(
                        (n + SALT_TARGET_ROWS - 1) // SALT_TARGET_ROWS,
                        pa.int64(),
                    ),
                }
            )

        return (
            ds.map_batches(fold, batch_format="pyarrow")
            .groupby("key")
            .aggregate(_Sum("n", alias_name="n_p"))
            .map_batches(finalize, batch_format="pyarrow")
            .sort(["n_rows", "key"], descending=[True, False])
            .limit(SALT_TOP)
        )

    out = one_domain(*SKEW_KEYS[0])
    for spec in SKEW_KEYS[1:]:
        out = out.union(one_domain(*spec))
    return out


Q19_CLAUSES = (  # (brand, size_lo, size_hi, qty_lo_c, qty_hi_c)
    ("Brand#1", 1, 10, 100, 1100),
    ("Brand#2", 1, 20, 1000, 2000),
    ("Brand#3", 1, 30, 2000, 3000),
)


def q19_brand_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q19 (discounted revenue, adapted to the available
    columns) — the compound-predicate join benchmark: revenue from
    lineitem ⋈ part pairs satisfying an OR of three (brand, size
    range, quantity range) conjunctions. The OR straddles BOTH sides
    of the join, so neither scan can apply the full predicate alone —
    the shape that punishes naive predicate pushdown. Per clause the
    output reports the exact revenue cents and line count (plus the
    total), quantities in centi-units. Tail-seated by design:
    order_priority_join's fact-fact co-partition with the residual
    predicate evaluated at the join.

    Scale shape: part pre-filters to the union of clause brands/sizes
    (tiny fraction) and rides a partkey co-partition against the
    quantity-prefiltered lineitem projection; the residual OR
    evaluates vectorized inside the partition; the global step is a
    ≤4-row grid sum. Output: (clause, n_lines, revenue_cents)."""
    from ..stages.shuffle import N_COARSE_PARTS

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    qty_lo = min(c[3] for c in Q19_CLAUSES)
    qty_hi = max(c[4] for c in Q19_CLAUSES)
    brands = {c[0] for c in Q19_CLAUSES}

    def part_side(batch: pa.Table) -> pa.Table:
        brand = np.asarray(batch.column("p_brand").to_pylist(), dtype=object)
        size = batch.column("p_size").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = np.isin(brand, list(brands))
        pk = batch.column("p_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        n = len(pk)
        return pa.table(
            {
                "k": pa.array(pk, pa.int64()),
                "brand": pa.array(brand[keep], pa.string()),
                "size": pa.array(size[keep], pa.int64()),
                "qty_c": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        qty_c = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        keep = (qty_c >= qty_lo) & (qty_c <= qty_hi)
        pk = batch.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        n = len(pk)
        return pa.table(
            {
                "k": pa.array(pk, pa.int64()),
                "brand": pa.array([""] * n, pa.string()),
                "size": pa.array(np.zeros(n, np.int64), pa.int64()),
                "qty_c": pa.array(qty_c[keep], pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def join_eval(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")[["brand", "size"]]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        brand = m["brand_b"].to_numpy()
        size = m["size_b"].to_numpy()
        qty = m["qty_c"].to_numpy()
        cents = m["cents"].to_numpy()
        out_cl, out_n, out_c = [], [], []
        for cl, (b, slo, shi, qlo, qhi) in enumerate(Q19_CLAUSES):
            hit = (
                (brand == b)
                & (size >= slo) & (size <= shi)
                & (qty >= qlo) & (qty <= qhi)
            )
            if hit.any():
                out_cl.append(b)
                out_n.append(int(hit.sum()))
                out_c.append(int(cents[hit].sum()))
        return pa.table(
            {
                "clause": pa.array(out_cl, pa.string()),
                "n_lines": pa.array(out_n, pa.int64()),
                "revenue_cents": pa.array(out_c, pa.int64()),
            }
        )

    def add_total(batch: pa.Table) -> pa.Table:
        n = batch.column("n_lines_p").to_numpy(zero_copy_only=False)
        c = batch.column("revenue_cents_p").to_numpy(zero_copy_only=False)
        cl = batch.column("clause").to_pylist()
        return pa.table(
            {
                "clause": pa.array(cl + ["TOTAL"], pa.string()),
                "n_lines": pa.array(
                    np.concatenate([n, [n.sum()]]).astype(np.int64), pa.int64()
                ),
                "revenue_cents": pa.array(
                    np.concatenate([c, [c.sum()]]).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        lines.map_batches(line_side, batch_format="pyarrow")
        .union(part.map_batches(part_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(join_eval, batch_format="pyarrow")
        .groupby("clause")
        .aggregate(
            Sum("n_lines", alias_name="n_lines_p"),
            Sum("revenue_cents", alias_name="revenue_cents_p"),
        )
        .repartition(1)
        .map_batches(add_total, batch_format="pyarrow")
    )


def supplier_scorecard(sf_dir: str) -> "ray.data.Dataset":
    """Supplier scorecard — the procurement rollup: per supplier the
    exact line count, revenue cents, returned-line count and return
    rate in basis points, with name and nation stitched from
    broadcast dimensions (supplier and nation are dimension-scale
    here; the fold itself never assumes that — it is one suppkey
    groupby over lineitem partials). Tail-seated by design:
    source_facets' fold keyed by the FK with a two-flag payload.

    Scale shape: lineitem folds per-batch (suppkey, lines, returns,
    cents) partials → ONE groupby(suppkey) → a broadcast-dim stitch
    batch map; no global sort (the compare is order-insensitive).
    Output: (s_suppkey, s_name, n_name, n_lines, n_returned,
    revenue_cents, return_rate_bp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )
    supp_rows = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    ).take_all()
    nation_rows = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    nname = {int(r["n_nationkey"]): r["n_name"] for r in nation_rows}
    sdim = {
        int(r["s_suppkey"]): (r["s_name"], nname[int(r["s_nationkey"])])
        for r in supp_rows
    }
    sdim_ref = ray.put(sdim)

    def partials(batch: pa.Table) -> pa.Table:
        sk = batch.column("l_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        rf = np.asarray(batch.column("l_returnflag").to_pylist(), dtype=object)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "sk": sk,
                    "n": 1,
                    "r": (rf == "R").astype(np.int64),
                    "c": cents,
                }
            )
            .groupby("sk", sort=False)
            .agg(n=("n", "sum"), r=("r", "sum"), c=("c", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "sk": pa.array(g["sk"].to_numpy().astype(np.int64), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
                "r": pa.array(g["r"].to_numpy().astype(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def stitch(batch: pa.Table) -> pa.Table:
        sdim = ray.get(sdim_ref)
        sk = batch.column("sk").to_numpy(zero_copy_only=False)
        n = batch.column("n_p").to_numpy(zero_copy_only=False)
        r = batch.column("r_p").to_numpy(zero_copy_only=False)
        c = batch.column("c_p").to_numpy(zero_copy_only=False)
        names = [sdim[int(x)] for x in sk]
        return pa.table(
            {
                "s_suppkey": pa.array(sk.astype(np.int64), pa.int64()),
                "s_name": pa.array([x[0] for x in names], pa.string()),
                "n_name": pa.array([x[1] for x in names], pa.string()),
                "n_lines": pa.array(n.astype(np.int64), pa.int64()),
                "n_returned": pa.array(r.astype(np.int64), pa.int64()),
                "revenue_cents": pa.array(c.astype(np.int64), pa.int64()),
                "return_rate_bp": pa.array(
                    (r * 10000 // n).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        lines.map_batches(partials, batch_format="pyarrow")
        .groupby("sk")
        .aggregate(
            _Sum("n", alias_name="n_p"),
            _Sum("r", alias_name="r_p"),
            _Sum("c", alias_name="c_p"),
        )
        .map_batches(stitch, batch_format="pyarrow")
    )


ABC_BUCKETS = 256


def abc_analysis(sf_dir: str) -> "ray.data.Dataset":
    """ABC (Pareto) analysis of part revenue — class A holds the
    parts up to the 80% cumulative-revenue mark in descending
    revenue order, B to 95%, C the tail; the classic inventory
    segmentation. Class boundaries are integer cross-multiplications
    on the EXCLUSIVE running revenue (excl·10 < total·8 → A,
    excl·100 < total·95 → B), so the cut is exact and the
    (rev desc, partkey asc) order is total. Tail-seated by design:
    compaction_plan's two-pass bucket-grid prefix, descending.

    Scale shape: per-part revenue is one partkey groupby; the
    descending prefix is two-pass — pass 1 folds per-batch
    (revenue-bucket, Σrev) partials (equal revenues share a bucket
    by construction, so ties never straddle offsets), the driver
    builds exclusive higher-bucket offsets (≤256 ints), and pass 2
    sorts each bucket locally, classifies, and folds per-class
    partials into a 3-row grid. A value-skewed bucket bounds at the
    distinct-revenue group, the documented dial. Output: (cls,
    n_parts, revenue_cents, share_bp)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def rev_partials(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame({"pk": pk, "c": cents})
            .groupby("pk", sort=False)["c"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "pk": pa.array(g["pk"].to_numpy().astype(np.int64), pa.int64()),
                "rev": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    per_part = (
        lines.map_batches(rev_partials, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(_Sum("rev", alias_name="rev"))
        .materialize()
    )
    mm = per_part.aggregate(_Min("rev"), _Max("rev"))
    lo, hi = int(mm["min(rev)"]), int(mm["max(rev)"])
    span = max(hi - lo, 1)

    def bucket_of(rev: np.ndarray) -> np.ndarray:
        return np.minimum(
            (rev - lo) * ABC_BUCKETS // span, ABC_BUCKETS - 1
        )

    def b_partials(batch: pa.Table) -> pa.Table:
        rev = batch.column("rev").to_numpy(zero_copy_only=False)
        b = bucket_of(rev)
        g = (
            pd.DataFrame({"b": b, "s": rev})
            .groupby("b", sort=False)["s"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "b": pa.array(g["b"].to_numpy().astype(np.int64), pa.int64()),
                "s": pa.array(g["s"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    bucket_sum = np.zeros(ABC_BUCKETS, np.int64)
    for bt in (
        per_part.map_batches(b_partials, batch_format="pyarrow")
        .groupby("b")
        .aggregate(_Sum("s", alias_name="s"))
        .iter_batches(batch_format="pyarrow")
    ):
        for b, sv in zip(bt.column("b").to_pylist(), bt.column("s").to_pylist()):
            bucket_sum[b] += sv
    total = int(bucket_sum.sum())
    # offset[b] = revenue in strictly HIGHER buckets (descending order)
    desc_cum = np.cumsum(bucket_sum[::-1])[::-1]
    offsets = desc_cum - bucket_sum

    def tag(batch: pa.Table) -> pa.Table:
        rev = batch.column("rev").to_numpy(zero_copy_only=False)
        return batch.append_column("b", pa.array(bucket_of(rev), pa.int64()))

    def classify(grp: pa.Table) -> pa.Table:
        rev = grp.column("rev").to_numpy(zero_copy_only=False)
        pk = grp.column("pk").to_numpy(zero_copy_only=False)
        b = int(grp.column("b")[0].as_py())
        order = np.lexsort((pk, -rev))
        rev = rev[order]
        excl = np.concatenate(([0], np.cumsum(rev)[:-1])) + int(offsets[b])
        cls = np.where(
            excl * 10 < total * 8, "A",
            np.where(excl * 100 < total * 95, "B", "C"),
        )
        g = (
            pd.DataFrame({"cls": cls, "n": 1, "rev": rev})
            .groupby("cls", sort=False)
            .agg(n=("n", "sum"), rev=("rev", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "cls": pa.array(g["cls"], pa.string()),
                "n_parts": pa.array(
                    g["n"].to_numpy().astype(np.int64), pa.int64()
                ),
                "revenue_cents": pa.array(
                    g["rev"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    def share(batch: pa.Table) -> pa.Table:
        rev = batch.column("revenue_cents_p").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cls": batch.column("cls"),
                "n_parts": batch.column("n_parts_p"),
                "revenue_cents": pa.array(rev.astype(np.int64), pa.int64()),
                "share_bp": pa.array(rev * 10000 // total, pa.int64()),
            }
        )

    return (
        per_part.map_batches(tag, batch_format="pyarrow")
        .groupby("b")
        .map_groups(classify, batch_format="pyarrow")
        .groupby("cls")
        .aggregate(
            _Sum("n_parts", alias_name="n_parts_p"),
            _Sum("revenue_cents", alias_name="revenue_cents_p"),
        )
        .map_batches(share, batch_format="pyarrow")
    )


JSP_ROW_BYTES = 16    # modeled key+payload width on the exchange
JSP_N_WORKERS = 256   # design-point cluster the plan is priced for


def join_strategy_plan(sf_dir: str) -> "ray.data.Dataset":
    """Broadcast-vs-shuffle join planner — the engine's own core
    decision materialized as data: for every FK edge, the exact row
    counts both sides and the two exchange costs under the explicit
    integer model (broadcast ships the parent to every worker:
    parent_rows × 16 B × 256 workers; shuffle moves both sides once:
    (child+parent) × 16 B), picking the cheaper. This is the rule
    the repo itself applies — nation rides ray.put in q5/q10,
    customer rides a co-partition — now priced edge by edge.
    Tail-seated by design: orphan_fk_audit's edge list with a
    constant-space count fold per side.

    Scale shape: per edge two count-only folds (one int per batch);
    the plan arithmetic runs on a 7-row grid. Output: (edge,
    child_rows, parent_rows, broadcast_bytes, shuffle_bytes,
    strategy)."""
    from ray.data.aggregate import Sum as _Sum

    def count_rows(fname: str, col: str) -> "ray.data.Dataset":
        return (
            ray.data.read_parquet(f"{sf_dir}/{fname}", columns=[col])
            .map_batches(
                lambda t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
                batch_format="pyarrow",
            )
            .aggregate(_Sum("n", alias_name="n"))
        )

    rows = []
    counted: dict[str, int] = {}
    for edge, child_f, child_k, parent_f, parent_k in FK_EDGES:
        for f, c in ((child_f, child_k), (parent_f, parent_k)):
            if f not in counted:
                counted[f] = int(count_rows(f, c)["n"])
        ch, pr = counted[child_f], counted[parent_f]
        bcast = pr * JSP_ROW_BYTES * JSP_N_WORKERS
        shuf = (ch + pr) * JSP_ROW_BYTES
        rows.append(
            (edge, ch, pr, bcast, shuf,
             "broadcast" if bcast < shuf else "shuffle")
        )
    return pa.table(
        {
            "edge": pa.array([r[0] for r in rows], pa.string()),
            "child_rows": pa.array([r[1] for r in rows], pa.int64()),
            "parent_rows": pa.array([r[2] for r in rows], pa.int64()),
            "broadcast_bytes": pa.array([r[3] for r in rows], pa.int64()),
            "shuffle_bytes": pa.array([r[4] for r in rows], pa.int64()),
            "strategy": pa.array([r[5] for r in rows], pa.string()),
        }
    )


Q6_LO_US = 852_076_800_000_000   # 1997-01-01
Q6_HI_US = 883_612_800_000_000   # 1998-01-01


def q6_forecast_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q6 (forecasting revenue change) — the pure scan-edge
    query: one filter-aggregate over lineitem (ship-date year,
    discount in [0.05, 0.07], quantity < 24) with revenue =
    Σ price·discount in exact cents; no join, no groupby — the query
    that isolates scan + predicate throughput, and the one a
    column-pruned, row-group-pruned read should make IO-bound.
    Discounts compare in exact integer basis points (floor(d·10⁴ +
    0.5)) so the float boundary 0.05 can never straddle engines.
    Tail-seated by design: the degenerate (single-group) member of
    the pricing_summary family.

    Scale shape: per-batch (cents, n) partials → one 2-int global
    aggregate; only 4 columns leave storage. Output: (revenue_cents,
    n_lines)."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def fold(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        disc_bp = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False) * 10000.0
            + 0.5
        ).astype(np.int64)
        qty_c = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        keep = (
            (sd >= Q6_LO_US) & (sd < Q6_HI_US)
            & (disc_bp >= 500) & (disc_bp <= 700)
            & (qty_c < 2400)
        )
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )[keep]
        cents = np.floor(
            price * (disc_bp[keep] / 10000.0) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "revenue_cents": pa.array([int(cents.sum())], pa.int64()),
                "n_lines": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(fold, batch_format="pyarrow").aggregate(
        _Sum("revenue_cents", alias_name="revenue_cents"),
        _Sum("n_lines", alias_name="n_lines"),
    )
    return pa.table(
        {k: pa.array([int(v)], pa.int64()) for k, v in agg.items()}
    )


def q15_top_supplier(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q15 (top supplier) — the argmax-with-ties-ALL shape over
    an aggregate: per-supplier revenue in one ship-date quarter, then
    every supplier whose revenue EQUALS the global max (the classic
    view + max subquery). Distinct from supplier_scorecard's full
    rollup and from top-k sorts: the cut is an equality against a
    global scalar, so ties all surface. Tail-seated by design: the
    scorecard's suppkey fold with a broadcast-scalar filter.

    Scale shape: per-batch (suppkey, cents) partials → ONE
    groupby(suppkey) → a 1-int global Max → the equality filter
    streams; the dimension stitch is a broadcast. Output:
    (s_suppkey, s_name, revenue_cents)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    supp_rows = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).take_all()
    sname = {int(r["s_suppkey"]): r["s_name"] for r in supp_rows}

    def fold(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = (sd >= Q10_LO_US) & (sd < Q10_HI_US)
        sk = batch.column("l_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame({"sk": sk, "c": cents})
            .groupby("sk", sort=False)["c"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "sk": pa.array(g["sk"].to_numpy().astype(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    per_supp = (
        lines.map_batches(fold, batch_format="pyarrow")
        .groupby("sk")
        .aggregate(_Sum("c", alias_name="rev"))
        .materialize()
    )
    top = int(per_supp.aggregate(_Max("rev"))["max(rev)"])

    def winners(batch: pa.Table) -> pa.Table:
        rev = batch.column("rev").to_numpy(zero_copy_only=False)
        keep = rev == top
        sk = batch.column("sk").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "s_suppkey": pa.array(sk, pa.int64()),
                "s_name": pa.array(
                    [sname[int(x)] for x in sk], pa.string()
                ),
                "revenue_cents": pa.array(
                    rev[keep].astype(np.int64), pa.int64()
                ),
            }
        )

    return per_supp.map_batches(winners, batch_format="pyarrow")


def q14_promo_share(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q14 (promotion effect) — promo revenue share of one
    ship-month's total, in exact basis points: promo_cents·10⁴ //
    total_cents over the lineitem ⋈ part partkey co-partition. The
    CASE-inside-aggregate shape (one join, two conditional sums, one
    ratio) that dashboards call 'share of X'. Tail-seated by design:
    q19's co-partition with a two-lane conditional fold.

    Scale shape: the month filter prunes lineitem at the scan; part
    ships only (partkey, is_promo) int pairs; the co-partition folds
    each partition to (promo_cents, total_cents) partials and the
    global stage is a 2-int sum. Output: (promo_cents, total_cents,
    promo_share_bp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum
    from ..stages.shuffle import N_COARSE_PARTS

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )

    def line_side(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = (sd >= Q10_LO_US) & (sd < Q10_HI_US)
        pk = batch.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        n = len(pk)
        return pa.table(
            {
                "k": pa.array(pk, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "promo": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def part_side(batch: pa.Table) -> pa.Table:
        pk = batch.column("p_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ptype = np.asarray(batch.column("p_type").to_pylist(), dtype=object)
        promo = np.array(
            [1 if str(t).startswith("PROMO") else 0 for t in ptype], np.int64
        )
        n = len(pk)
        return pa.table(
            {
                "k": pa.array(pk, pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "promo": pa.array(promo, pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def join_fold(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")["promo"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        cents = m["cents"].to_numpy()
        promo = m["promo_b"].to_numpy()
        return pa.table(
            {
                "promo_cents": pa.array(
                    [int(cents[promo == 1].sum())], pa.int64()
                ),
                "total_cents": pa.array([int(cents.sum())], pa.int64()),
            }
        )

    agg = (
        lines.map_batches(line_side, batch_format="pyarrow")
        .union(part.map_batches(part_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(join_fold, batch_format="pyarrow")
        .aggregate(
            _Sum("promo_cents", alias_name="promo_cents"),
            _Sum("total_cents", alias_name="total_cents"),
        )
    )
    pc_, tc = int(agg["promo_cents"]), int(agg["total_cents"])
    return pa.table(
        {
            "promo_cents": pa.array([pc_], pa.int64()),
            "total_cents": pa.array([tc], pa.int64()),
            "promo_share_bp": pa.array(
                [pc_ * 10000 // tc if tc else 0], pa.int64()
            ),
        }
    )


def q17_small_quantity(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q17 (small-quantity-order revenue) — the correlated
    aggregate: lines whose quantity is below 20% of their PART's
    average quantity. The 1/5 threshold makes it exact integer
    arithmetic: qty < sum/(5n) ⇔ qty_c·5·n_part < sum_qty_c_part —
    no division anywhere. The shape Q18 doesn't cover: the gate
    compares each ROW against its own group's aggregate, so the
    per-part statistics must rejoin the fact on the SAME partkey
    co-partition that computed them. Tail-seated by design: q18's
    groupby-produced build side probed by the raw rows instead of
    the groups.

    Scale shape: pass 1 folds (partkey, sum_qty_c, n) partials → one
    groupby; pass 2 re-keys the stats and the raw (partkey, qty_c,
    cents) rows onto the same co-partition, evaluates the
    cross-multiplied gate vectorized, and folds to a 2-int global
    sum. Output: (revenue_cents, n_lines)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum
    from ..stages.shuffle import N_COARSE_PARTS

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def qty_partials(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        qty_c = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"pk": pk, "s": qty_c, "n": 1})
            .groupby("pk", sort=False)
            .agg(s=("s", "sum"), n=("n", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "pk": pa.array(g["pk"].to_numpy().astype(np.int64), pa.int64()),
                "s": pa.array(g["s"].to_numpy().astype(np.int64), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def stats_side(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(pk.astype(np.int64), pa.int64()),
                "a": batch.column("s_p"),
                "b": batch.column("n_p"),
                "side": pa.array(np.zeros(len(pk), np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def row_side(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        qty_c = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        price_c = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(pk, pa.int64()),
                "a": pa.array(qty_c, pa.int64()),
                "b": pa.array(price_c, pa.int64()),
                "side": pa.array(np.ones(len(pk), np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    stats = (
        lines.map_batches(qty_partials, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(_Sum("s", alias_name="s_p"), _Sum("n", alias_name="n_p"))
        .map_batches(stats_side, batch_format="pyarrow")
    )

    def gate(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")[["a", "b"]]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_s")
        qty, price = m["a"].to_numpy(), m["b"].to_numpy()
        sum_q, n_part = m["a_s"].to_numpy(), m["b_s"].to_numpy()
        keep = qty * 5 * n_part < sum_q
        return pa.table(
            {
                "revenue_cents": pa.array(
                    [int(price[keep].sum())], pa.int64()
                ),
                "n_lines": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    agg = (
        stats.union(lines.map_batches(row_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(gate, batch_format="pyarrow")
        .aggregate(
            _Sum("revenue_cents", alias_name="revenue_cents"),
            _Sum("n_lines", alias_name="n_lines"),
        )
    )
    return pa.table(
        {k: pa.array([int(v)], pa.int64()) for k, v in agg.items()}
    )


Q7_NATIONS = ("NATION_1", "NATION_2")
Q7_Y96_US = 820_454_400_000_000   # 1996-01-01
Q7_Y97_US = 852_076_800_000_000   # 1997-01-01
Q7_HI_US = 883_612_800_000_000    # 1998-01-01


def q7_volume_shipping(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q7 (volume shipping) — bidirectional trade between two
    nations by ship year: revenue where the supplier sits in one
    nation of the pair and the customer in the OTHER, grouped by
    (supp_nation, cust_nation, year). q5's chained co-partitions with
    the equality flipped to a cross-pair test and a year lane riding
    the payload; the year derives from pure epoch comparison (1996 +
    [sd ≥ 1997-01-01]) — no calendar functions. Tail-seated by
    design: q5's three-hop chain, filtered to the pair at every
    scan edge.

    Scale shape: both dimension sides pre-filter to the two nations
    at the scan; the three fact co-partitions (orderkey, custkey,
    suppkey) each pre-sum per (next-key, nation-lane, year) group;
    the global stage is a ≤4-row grid. Output: (supp_nation,
    cust_nation, l_year, revenue_cents)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum
    from ..stages.shuffle import N_COARSE_PARTS

    nation_rows = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    pair = {
        int(r["n_nationkey"]): r["n_name"]
        for r in nation_rows
        if r["n_name"] in Q7_NATIONS
    }
    pair_keys = np.array(sorted(pair), np.int64)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )

    def order_side(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(ok)
        return pa.table(
            {
                "k": pa.array(ok, pa.int64()),
                "a": pa.array(ck, pa.int64()),
                "b": pa.array(np.zeros(n, np.int64), pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ok % N_COARSE_PARTS, pa.int64()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = (sd >= Q7_Y96_US) & (sd < Q7_HI_US)
        lk = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        sk = batch.column("l_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        year = 1996 + (sd[keep] >= Q7_Y97_US).astype(np.int64)
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        n = len(lk)
        return pa.table(
            {
                "k": pa.array(lk, pa.int64()),
                "a": pa.array(np.zeros(n, np.int64), pa.int64()),
                "b": pa.array(sk, pa.int64()),
                "year": pa.array(year, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(lk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop1(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")["a"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        g = (
            m.groupby(["a_b", "b", "year"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        ck = g["a_b"].to_numpy().astype(np.int64)
        n = len(ck)
        return pa.table(
            {
                "k": pa.array(ck, pa.int64()),
                "a": pa.array(g["b"].to_numpy().astype(np.int64), pa.int64()),
                "b": pa.array(np.zeros(n, np.int64), pa.int64()),
                "year": pa.array(
                    g["year"].to_numpy().astype(np.int64), pa.int64()
                ),
                "cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nk = batch.column("c_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = np.isin(nk, pair_keys)
        ck, nk = ck[keep], nk[keep]
        n = len(ck)
        return pa.table(
            {
                "k": pa.array(ck, pa.int64()),
                "a": pa.array(nk, pa.int64()),
                "b": pa.array(np.zeros(n, np.int64), pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop2(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")["a"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        g = (
            m.groupby(["a", "a_b", "year"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        sk = g["a"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "k": pa.array(sk, pa.int64()),
                "a": pa.array(g["a_b"].to_numpy().astype(np.int64), pa.int64()),
                "year": pa.array(
                    g["year"].to_numpy().astype(np.int64), pa.int64()
                ),
                "cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
                "side": pa.array(np.ones(len(sk), np.int64), pa.int64()),
                "part": pa.array(sk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def supp_side(batch: pa.Table) -> pa.Table:
        sk = batch.column("s_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nk = batch.column("s_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = np.isin(nk, pair_keys)
        sk, nk = sk[keep], nk[keep]
        n = len(sk)
        return pa.table(
            {
                "k": pa.array(sk, pa.int64()),
                "a": pa.array(nk, pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(sk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop3(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")["a"]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        m = m[m["a"] != m["a_b"]]  # cross-pair: nations must differ
        g = (
            m.groupby(["a_b", "a", "year"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "snat": pa.array(
                    g["a_b"].to_numpy().astype(np.int64), pa.int64()
                ),
                "cnat": pa.array(
                    g["a"].to_numpy().astype(np.int64), pa.int64()
                ),
                "year": pa.array(
                    g["year"].to_numpy().astype(np.int64), pa.int64()
                ),
                "cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    stage1 = orders.map_batches(order_side, batch_format="pyarrow").union(
        lines.map_batches(line_side, batch_format="pyarrow")
    )
    stage2 = (
        stage1.groupby("part")
        .map_groups(hop1, batch_format="pyarrow")
        .union(cust.map_batches(cust_side, batch_format="pyarrow"))
    )
    stage3 = (
        stage2.groupby("part")
        .map_groups(hop2, batch_format="pyarrow")
        .union(supp.map_batches(supp_side, batch_format="pyarrow"))
    )
    grid = (
        stage3.groupby("part")
        .map_groups(hop3, batch_format="pyarrow")
        .groupby(["snat", "cnat", "year"])
        .aggregate(_Sum("cents", alias_name="cents_p"))
        .take_all()  # ≤ |pair|²·years rows — the bounded grid
    )
    return pa.table(
        {
            "supp_nation": pa.array(
                [pair[int(r["snat"])] for r in grid], pa.string()
            ),
            "cust_nation": pa.array(
                [pair[int(r["cnat"])] for r in grid], pa.string()
            ),
            "l_year": pa.array([int(r["year"]) for r in grid], pa.int64()),
            "revenue_cents": pa.array(
                [int(r["cents_p"]) for r in grid], pa.int64()
            ),
        }
    )


def q13_customer_distribution(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q13 (customer distribution) — the LEFT-JOIN histogram:
    how many customers placed exactly N orders, INCLUDING the
    zero-order customers an inner join would silently drop (the row
    most analysts get wrong). Tail-seated by design: orphan_fk_audit's
    tagged-union co-partition with the histogram folded on the
    missing side.

    Scale shape: orders folds per-batch (custkey, n) partials → the
    customer keys and the order counts meet on ONE custkey
    co-partition (Sum orders, Max customer-flag) → per-batch
    (c_count, custdist) histogram partials → a bounded grid; zero
    customers never leave their partition as rows, only as grid
    counts. Output: (c_count, custdist)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )

    def order_fold(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        u, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "key": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
                "is_cust": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            }
        )

    def cust_fold(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(ck)
        return pa.table(
            {
                "key": pa.array(ck, pa.int64()),
                "n": pa.array(np.zeros(n, np.int64), pa.int64()),
                "is_cust": pa.array(np.ones(n, np.int64), pa.int64()),
            }
        )

    def hist_fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n_p").to_numpy(zero_copy_only=False)
        is_cust = batch.column("c_p").to_numpy(zero_copy_only=False) > 0
        n = n[is_cust]  # order rows citing a non-customer key: none here
        u, cnt = np.unique(n, return_counts=True)
        return pa.table(
            {
                "c_count": pa.array(u.astype(np.int64), pa.int64()),
                "custdist": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    return (
        orders.map_batches(order_fold, batch_format="pyarrow")
        .union(cust.map_batches(cust_fold, batch_format="pyarrow"))
        .groupby("key")
        .aggregate(
            _Sum("n", alias_name="n_p"), _Max("is_cust", alias_name="c_p")
        )
        .map_batches(hist_fold, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(_Sum("custdist", alias_name="custdist"))
    )


Q8_REGION = "ASIA"          # the market (customer side)
Q8_FOCUS_NATION = "NATION_2"  # the supplier nation whose share we track
Q8_PTYPE = "PROMO"


def q8_market_share(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q8 (national market share) — the deepest composition in
    the registry: within one region's market for one part type, the
    revenue share supplied by one focus nation, per order year.
    Three fact co-partitions CHAINED (partkey against the
    type-filtered part, orderkey against the window-filtered orders,
    custkey against the region-filtered customer) and the supplier
    side resolved by the join_strategy_plan decision — the
    focus-nation suppkey set broadcasts (1/25 of a dimension-scale
    table; the co-partition fallback is q5/q7's third hop verbatim
    when supplier goes fact-scale). Share in exact basis points.
    Tail-seated by design: q7's chain with a broadcast-flag final
    lane.

    Scale shape: every scan pre-filters (type, window, region); each
    hop pre-sums per next-key group; the global stage is a 2-year
    grid. Output: (o_year, total_cents, focus_cents, share_bp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum
    from ..stages.shuffle import N_COARSE_PARTS

    nation_rows = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).take_all()
    region_rows = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).take_all()
    rname = {r["r_regionkey"]: r["r_name"] for r in region_rows}
    market_nations = np.array(
        sorted(
            int(n["n_nationkey"])
            for n in nation_rows
            if rname[n["n_regionkey"]] == Q8_REGION
        ),
        np.int64,
    )
    focus_key = next(
        int(n["n_nationkey"])
        for n in nation_rows
        if n["n_name"] == Q8_FOCUS_NATION
    )
    focus_supp = np.sort(
        np.array(
            [
                r["s_suppkey"]
                for r in ray.data.read_parquet(
                    f"{sf_dir}/supplier.parquet",
                    columns=["s_suppkey", "s_nationkey"],
                ).take_all()
                if int(r["s_nationkey"]) == focus_key
            ],
            np.int64,
        )
    )
    focus_ref = ray.put(focus_supp)

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )
    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )

    def line_side(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ok = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        sk = batch.column("l_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        n = len(pk)
        return pa.table(
            {
                "k": pa.array(pk, pa.int64()),
                "a": pa.array(ok, pa.int64()),
                "b": pa.array(sk, pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def part_side(batch: pa.Table) -> pa.Table:
        ptype = np.asarray(batch.column("p_type").to_pylist(), dtype=object)
        keep = ptype == Q8_PTYPE
        pk = batch.column("p_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        n = len(pk)
        return pa.table(
            {
                "k": pa.array(pk, pa.int64()),
                "a": pa.array(np.zeros(n, np.int64), pa.int64()),
                "b": pa.array(np.zeros(n, np.int64), pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(pk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop_part(part_tbl: pa.Table) -> pa.Table:
        focus = ray.get(focus_ref)
        df = part_tbl.to_pandas()
        keep_keys = set(df[df["side"] == 0]["k"].to_numpy())
        probe = df[df["side"] == 1]
        m = probe[probe["k"].isin(keep_keys)]
        ok = m["a"].to_numpy().astype(np.int64)
        sk = m["b"].to_numpy().astype(np.int64)
        if len(focus):
            idx = np.minimum(np.searchsorted(focus, sk), len(focus) - 1)
            is_focus = (focus[idx] == sk).astype(np.int64)
        else:
            is_focus = np.zeros(len(sk), np.int64)
        n = len(ok)
        return pa.table(
            {
                "k": pa.array(ok, pa.int64()),
                "a": pa.array(np.zeros(n, np.int64), pa.int64()),
                "focus": pa.array(is_focus, pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(
                    m["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(ok % N_COARSE_PARTS, pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = (od >= Q7_Y96_US) & (od < Q7_HI_US)
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        year = 1996 + (od[keep] >= Q7_Y97_US).astype(np.int64)
        n = len(ok)
        return pa.table(
            {
                "k": pa.array(ok, pa.int64()),
                "a": pa.array(ck, pa.int64()),
                "focus": pa.array(np.zeros(n, np.int64), pa.int64()),
                "year": pa.array(year, pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ok % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop_order(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("k")[["a", "year"]]
        probe = df[df["side"] == 1]
        m = probe.join(build, on="k", how="inner", rsuffix="_b")
        g = (
            m.groupby(["a_b", "year_b", "focus"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        ck = g["a_b"].to_numpy().astype(np.int64)
        n = len(ck)
        return pa.table(
            {
                "k": pa.array(ck, pa.int64()),
                "focus": pa.array(
                    g["focus"].to_numpy().astype(np.int64), pa.int64()
                ),
                "year": pa.array(
                    g["year_b"].to_numpy().astype(np.int64), pa.int64()
                ),
                "cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nk = batch.column("c_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keep = np.isin(nk, market_nations)
        ck = ck[keep]
        n = len(ck)
        return pa.table(
            {
                "k": pa.array(ck, pa.int64()),
                "focus": pa.array(np.zeros(n, np.int64), pa.int64()),
                "year": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def hop_cust(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        keep_keys = set(df[df["side"] == 0]["k"].to_numpy())
        probe = df[df["side"] == 1]
        m = probe[probe["k"].isin(keep_keys)].copy()
        m["fc"] = m["cents"] * (m["focus"] == 1)
        g = (
            m.groupby("year", sort=False)
            .agg(total=("cents", "sum"), focus=("fc", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "year": pa.array(
                    g["year"].to_numpy().astype(np.int64), pa.int64()
                ),
                "total": pa.array(
                    g["total"].to_numpy().astype(np.int64), pa.int64()
                ),
                "focus": pa.array(
                    g["focus"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    stage1 = lines.map_batches(line_side, batch_format="pyarrow").union(
        part.map_batches(part_side, batch_format="pyarrow")
    )
    stage2 = (
        stage1.groupby("part")
        .map_groups(hop_part, batch_format="pyarrow")
        .union(orders.map_batches(order_side, batch_format="pyarrow"))
    )
    stage3 = (
        stage2.groupby("part")
        .map_groups(hop_order, batch_format="pyarrow")
        .union(cust.map_batches(cust_side, batch_format="pyarrow"))
    )
    grid = (
        stage3.groupby("part")
        .map_groups(hop_cust, batch_format="pyarrow")
        .groupby("year")
        .aggregate(
            _Sum("total", alias_name="total_cents"),
            _Sum("focus", alias_name="focus_cents"),
        )
        .take_all()
    )
    grid.sort(key=lambda r: r["year"])
    return pa.table(
        {
            "o_year": pa.array([int(r["year"]) for r in grid], pa.int64()),
            "total_cents": pa.array(
                [int(r["total_cents"]) for r in grid], pa.int64()
            ),
            "focus_cents": pa.array(
                [int(r["focus_cents"]) for r in grid], pa.int64()
            ),
            "share_bp": pa.array(
                [
                    int(r["focus_cents"]) * 10000 // int(r["total_cents"])
                    if int(r["total_cents"])
                    else 0
                    for r in grid
                ],
                pa.int64(),
            ),
        }
    )


Q22_RECENT_US = 915_148_800_000_000  # 1999-01-01: the dormancy cutoff


def q22_sales_opportunity(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q22 (global sales opportunity), adapted twice to the
    data: nation stands in for the absent phone country code, and
    "no orders" becomes "no orders since 1999" (every synthetic
    customer has SOME order, so the verbatim anti-join is the empty
    set — dormancy is the version with signal): customers with an
    ABOVE-AVERAGE positive balance and no recent orders, per nation. The
    above-average gate is exact integer cross-multiplication
    (bal_c · n_pos > S_pos — no division), the no-orders test is the
    anti-join polarity of q13's co-partition, and the rollup rides
    a 25-row broadcast. Tail-seated by design: q13's tagged union
    with a broadcast scalar gate.

    Scale shape: pass 1 is a 2-int global aggregate (n_pos, Σ_pos);
    pass 2 meets customers and per-customer order counts on ONE
    custkey co-partition and folds straight to per-nation partials;
    the grid is ≤25 rows. Output: (n_name, numcust,
    totacctbal_cents)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    nation_rows = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    nname = {int(r["n_nationkey"]): r["n_name"] for r in nation_rows}

    def pos_partials(batch: pa.Table) -> pa.Table:
        bal_c = np.floor(
            batch.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        pos = bal_c[bal_c > 0]
        return pa.table(
            {
                "n": pa.array([len(pos)], pa.int64()),
                "s": pa.array([int(pos.sum())], pa.int64()),
            }
        )

    stats = cust.map_batches(pos_partials, batch_format="pyarrow").aggregate(
        _Sum("n", alias_name="n"), _Sum("s", alias_name="s")
    )
    n_pos, s_pos = int(stats["n"]), int(stats["s"])

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        nk = batch.column("c_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        bal_c = np.floor(
            batch.column("c_acctbal").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        keep = bal_c * n_pos > s_pos  # bal > avg(positive balances)
        ck, nk, bal_c = ck[keep], nk[keep], bal_c[keep]
        n = len(ck)
        return pa.table(
            {
                "key": pa.array(ck, pa.int64()),
                "nk": pa.array(nk, pa.int64()),
                "bal": pa.array(bal_c, pa.int64()),
                "has_order": pa.array(np.zeros(n, np.int64), pa.int64()),
                "is_cust": pa.array(np.ones(n, np.int64), pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = np.unique(
            batch.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )[od >= Q22_RECENT_US]
        )
        n = len(ck)
        return pa.table(
            {
                "key": pa.array(ck, pa.int64()),
                "nk": pa.array(np.zeros(n, np.int64), pa.int64()),
                "bal": pa.array(np.zeros(n, np.int64), pa.int64()),
                "has_order": pa.array(np.ones(n, np.int64), pa.int64()),
                "is_cust": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def nation_fold(batch: pa.Table) -> pa.Table:
        nk = batch.column("nk_p").to_numpy(zero_copy_only=False)
        bal = batch.column("bal_p").to_numpy(zero_copy_only=False)
        has_o = batch.column("o_p").to_numpy(zero_copy_only=False) > 0
        is_c = batch.column("c_p").to_numpy(zero_copy_only=False) > 0
        keep = is_c & ~has_o
        g = (
            pd.DataFrame({"nk": nk[keep], "n": 1, "b": bal[keep]})
            .groupby("nk", sort=False)
            .agg(n=("n", "sum"), b=("b", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "nk": pa.array(g["nk"].to_numpy().astype(np.int64), pa.int64()),
                "numcust": pa.array(
                    g["n"].to_numpy().astype(np.int64), pa.int64()
                ),
                "totacctbal_cents": pa.array(
                    g["b"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    grid = (
        cust.map_batches(cust_side, batch_format="pyarrow")
        .union(orders.map_batches(order_side, batch_format="pyarrow"))
        .groupby("key")
        .aggregate(
            _Sum("nk", alias_name="nk_p"),
            _Sum("bal", alias_name="bal_p"),
            _Max("has_order", alias_name="o_p"),
            _Max("is_cust", alias_name="c_p"),
        )
        .map_batches(nation_fold, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(
            _Sum("numcust", alias_name="numcust"),
            _Sum("totacctbal_cents", alias_name="totacctbal_cents"),
        )
        .take_all()
    )
    return pa.table(
        {
            "n_name": pa.array(
                [nname[int(r["nk"])] for r in grid], pa.string()
            ),
            "numcust": pa.array([int(r["numcust"]) for r in grid], pa.int64()),
            "totacctbal_cents": pa.array(
                [int(r["totacctbal_cents"]) for r in grid], pa.int64()
            ),
        }
    )


CMS_EVAL_TOP = 20


def cms_error_eval(sf_dir: str) -> "pa.Table":
    """Measured Count-Min overestimation — the eval that closes the
    CMS loop (bloom_fpr_eval's role for Bloom, minhash_eval's for
    MinHash): for the 20 heaviest users by EXACT count, the sketch's
    estimate (min over the D register rows) and the one-sided error
    est − true. At D=4/W=256 the error is deliberately visible, so
    the εN = e/W bound reads as data next to the measured values.
    Tail-seated by design: cms_registers' grid + an exact
    heavy-hitter fold + a driver-side probe of D·W ints.

    Scale shape: the register build is the head-checked no-row-
    shuffle pipeline; exact counts are one user groupby + a 20-row
    sort-limit; the probe touches only the broadcast-sized D×W grid.
    Output: (user_id, true_n, est_n, overestimate)."""
    import hashlib as _hashlib

    from ray.data.aggregate import Sum as _Sum

    grid = np.zeros((CMS_D, CMS_W), np.int64)
    for r in cms_registers(sf_dir).take_all():
        grid[int(r["row_d"]), int(r["pos"])] = int(r["count"])

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def count_partials(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            return_counts=True,
        )
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    top = (
        ds.map_batches(count_partials, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(_Sum("n", alias_name="true_n"))
        .sort(["true_n", "user_id"], descending=[True, False])
        .limit(CMS_EVAL_TOP)
        .take_all()
    )
    uids = [int(r["user_id"]) for r in top]
    trues = [int(r["true_n"]) for r in top]
    ests = []
    for u in uids:
        h = _hashlib.md5(str(u).encode()).hexdigest()
        h1, h2 = int(h[:15], 16), int(h[15:30], 16)
        ests.append(
            int(min(grid[d, (h1 + d * h2) % CMS_W] for d in range(CMS_D)))
        )
    return pa.table(
        {
            "user_id": pa.array(uids, pa.int64()),
            "true_n": pa.array(trues, pa.int64()),
            "est_n": pa.array(ests, pa.int64()),
            "overestimate": pa.array(
                [e - t for e, t in zip(ests, trues)], pa.int64()
            ),
        }
    )


HLL_ALPHA_NUM = 7213      # α_m = 0.7213/(1 + 1.079/m) as an exact rational
HLL_ALPHA_DEN_BASE = 10   # → 7213·m / (10·(1000·m + 1079))


def hll_error_eval(sf_dir: str) -> "pa.Table":
    """Measured HyperLogLog error — the eval that closes the LAST
    sketch loop (after bloom_fpr_eval, cms_error_eval, minhash_eval):
    the RAW HLL estimate from the 256 registers against the exact
    distinct-user count, every step exact rational arithmetic — α_m
    as the published 7213m/(10(1000m+1079)), the harmonic sum over a
    2^53 common denominator (Σ 2^(53−ρ) fits int64 at m = 256), and
    the estimate α·m³·2^53·1000 // (den·S) one big-integer division.
    No small-range correction (ln is transcendental); the zero-
    register count V is emitted so a consumer can apply linear
    counting downstream. Tail-seated by design: hll_registers' grid +
    one exact distinct fold.

    Scale shape: the register build is the head-checked fixed-
    exchange pipeline; the exact count is one distinct fold; the
    estimator touches 256 ints. Output: (m, v_zero, n_exact,
    est_raw_x1000, err_x1000)."""
    from ray.data.aggregate import Sum as _Sum

    regs = {
        int(r["bucket"]): int(r["max_rho"])
        for r in hll_registers(sf_dir).take_all()
    }
    m = 1 << HLL_P
    s_all = sum(1 << (53 - regs.get(b, 0)) for b in range(m))
    v_zero = sum(1 for b in range(m) if b not in regs)
    den = HLL_ALPHA_DEN_BASE * (1000 * m + 1079)
    est_x1000 = HLL_ALPHA_NUM * (m ** 3) * (1 << 53) * 1000 // (den * s_all)

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def distinct_fold(batch: pa.Table) -> pa.Table:
        u = np.unique(
            batch.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        return pa.table({"u": pa.array(u, pa.int64())})

    n_exact = int(
        ds.map_batches(distinct_fold, batch_format="pyarrow")
        .groupby("u")
        .aggregate(_Sum("u", alias_name="dummy"))
        .count()
    )
    return pa.table(
        {
            "m": pa.array([m], pa.int64()),
            "v_zero": pa.array([v_zero], pa.int64()),
            "n_exact": pa.array([n_exact], pa.int64()),
            "est_raw_x1000": pa.array([est_x1000], pa.int64()),
            "err_x1000": pa.array([est_x1000 - 1000 * n_exact], pa.int64()),
        }
    )


BUDGET_TOTAL = 10_000  # documents the sampling budget hands out


def budget_allocation(sf_dir: str) -> "pa.Table":
    """Largest-remainder (Hamilton) apportionment of a sampling
    budget across sources, weighted by corpus bytes — the allocator a
    crawl/sampling scheduler runs: base = B·w_s // W exactly, then
    the leftover seats go to the largest remainders (ties to the
    lexicographically first source), so Σ alloc = B EXACTLY and the
    allocation is deterministic — the property proportional floats
    can't give. Tail-seated by design: welch_t2_grid's per-source
    fold with the apportionment finalized on the ≤|sources| grid.

    Scale shape: one pass folds per-source byte sums into a bounded
    grid; the Hamilton step touches only that grid. Output: (source,
    weight, base_alloc, extra, alloc)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        nb = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        g = (
            pd.DataFrame({"source": src, "w": nb})
            .groupby("source", sort=False)["w"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "w": pa.array(g["w"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = sorted(
        (r["source"], int(r["w"]))
        for r in (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby("source")
            .aggregate(_Sum("w", alias_name="w"))
            .take_all()
        )
    )
    total = sum(w for _, w in grid)
    base = [(s, w, BUDGET_TOTAL * w // total, BUDGET_TOTAL * w % total)
            for s, w in grid]
    leftover = BUDGET_TOTAL - sum(b for _, _, b, _ in base)
    order = sorted(base, key=lambda r: (-r[3], r[0]))
    extra_set = {r[0] for r in order[:leftover]}
    return pa.table(
        {
            "source": pa.array([r[0] for r in base], pa.string()),
            "weight": pa.array([r[1] for r in base], pa.int64()),
            "base_alloc": pa.array([r[2] for r in base], pa.int64()),
            "extra": pa.array(
                [1 if r[0] in extra_set else 0 for r in base], pa.int64()
            ),
            "alloc": pa.array(
                [r[2] + (1 if r[0] in extra_set else 0) for r in base],
                pa.int64(),
            ),
        }
    )


QSE_BINS = 128               # fixed-width sketch buckets per type
QSE_PERCENTS = (50, 90, 99)  # quantiles the sketch is judged on


def quantile_sketch_error(sf_dir: str) -> "pa.Table":
    """Measured histogram-sketch quantile error — the eval that
    prices the fixed-bin quantile estimate every streaming dashboard
    ships (hist_quantiles' grid) against the EXACT percentile
    (global_quantiles' definition), per event type. The sketch
    estimate is the lower edge of the first QSE_BINS-wide bucket
    whose cumulative count reaches rank ceil(q·n/100); the exact
    answer is percentile_disc over integer cents. err_cents = est −
    exact is the sketch's signed bias in value units — bounded above
    by 0 (a lower edge never overshoots) and below by −width, read
    from data instead of assumed. Joins the measured-error family
    (bloom_fpr_eval, cms_error_eval, hll_error_eval). Tail-seated by
    design: hist_quantiles' bucket grid judged by global_quantiles'
    exact rank rule.

    Scale shape: pass 1 is a per-type (min, max, count) aggregate
    (driver reads #types rows); pass 2 exchanges per-(type, bucket)
    partials (≤ #types × QSE_BINS); the exact side reduces to the
    (type, cents) VALUE GRID — bounded by the cents range, not row
    count — and each per-type map_groups task folds grid rows, never
    raw rows. Output: (event_type, q, n_rows, est_cents,
    exact_cents, err_cents)."""
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Min as _Min
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        v = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "cents": pa.array(v, pa.int64()),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pyarrow")

    stats = {
        r["event_type"]: (int(r["mn"]), int(r["mx"]), int(r["n"]))
        for r in cents.groupby("event_type")
        .aggregate(
            _Min("cents", alias_name="mn"),
            _Max("cents", alias_name="mx"),
            _Count(alias_name="n"),
        )
        .take_all()  # bounded: one row per event type
    }
    widths = {t: (mx - mn + QSE_BINS) // QSE_BINS for t, (mn, mx, _) in stats.items()}
    ranks = {
        (t, q): (q * n + 99) // 100
        for t, (_, _, n) in stats.items()
        for q in QSE_PERCENTS
    }
    bref = ray.put({t: (mn, widths[t]) for t, (mn, _, _) in stats.items()})

    def bucket_partials(batch: pa.Table) -> pa.Table:
        bc = ray.get(bref)
        types = batch.column("event_type").to_numpy(zero_copy_only=False)
        v = batch.column("cents").to_numpy(zero_copy_only=False)
        out_t: list[str] = []
        out_b: list[int] = []
        out_n: list[int] = []
        for t in np.unique(types):
            mn, width = bc[t]
            b = (v[types == t] - mn) // width
            cnt = np.bincount(b)
            nz = np.nonzero(cnt)[0]
            out_t += [t] * len(nz)
            out_b += nz.tolist()
            out_n += cnt[nz].astype(np.int64).tolist()
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "bucket": pa.array(out_b, pa.int64()),
                "bn": pa.array(out_n, pa.int64()),
            }
        )

    bucket_rows = (
        cents.map_batches(bucket_partials, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .aggregate(_Sum("bn", alias_name="c"))
        .take_all()  # bounded: ≤ #types × QSE_BINS rows
    )
    by_t: dict[str, list[tuple[int, int]]] = {}
    for r in bucket_rows:
        by_t.setdefault(r["event_type"], []).append(
            (int(r["bucket"]), int(r["c"]))
        )
    est: dict[tuple[str, int], int] = {}
    for t, rows in by_t.items():
        mn, width = stats[t][0], widths[t]
        cum = 0
        pending = sorted(QSE_PERCENTS)
        for b, c in sorted(rows):
            cum += c
            while pending and cum >= ranks[(t, pending[0])]:
                est[(t, pending[0])] = mn + b * width
                pending.pop(0)

    rref = ray.put(ranks)

    def grid_partials(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_numpy(zero_copy_only=False)
        v = batch.column("cents").to_numpy(zero_copy_only=False)
        out_t: list[str] = []
        out_v: list[int] = []
        out_n: list[int] = []
        for t in np.unique(types):
            vals, cnts = np.unique(v[types == t], return_counts=True)
            out_t += [t] * len(vals)
            out_v += vals.tolist()
            out_n += cnts.astype(np.int64).tolist()
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "cents": pa.array(out_v, pa.int64()),
                "cnt": pa.array(out_n, pa.int64()),
            }
        )

    def exact_fold(grp: pa.Table) -> pa.Table:
        rk = ray.get(rref)
        t = grp.column("event_type")[0].as_py()
        vals = grp.column("cents").to_numpy(zero_copy_only=False)
        cnts = grp.column("cnt").to_numpy(zero_copy_only=False)
        order = np.argsort(vals)
        cum = np.cumsum(cnts[order])
        sv = vals[order]
        qs, ex = [], []
        for q in QSE_PERCENTS:
            idx = int(np.searchsorted(cum, rk[(t, q)]))
            qs.append(q)
            ex.append(int(sv[idx]))
        return pa.table(
            {
                "event_type": pa.array([t] * len(qs), pa.string()),
                "q": pa.array(qs, pa.int64()),
                "exact_cents": pa.array(ex, pa.int64()),
            }
        )

    exact_rows = (
        cents.map_batches(grid_partials, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(_Sum("cnt", alias_name="cnt"))
        .groupby("event_type")
        .map_groups(exact_fold, batch_format="pyarrow")
        .take_all()  # bounded: #types × |QSE_PERCENTS| rows
    )
    rows = sorted(
        (r["event_type"], int(r["q"]), int(r["exact_cents"]))
        for r in exact_rows
    )
    return pa.table(
        {
            "event_type": pa.array([t for t, _, _ in rows], pa.string()),
            "q": pa.array([q for _, q, _ in rows], pa.int64()),
            "n_rows": pa.array(
                [stats[t][2] for t, _, _ in rows], pa.int64()
            ),
            "est_cents": pa.array(
                [est[(t, q)] for t, q, _ in rows], pa.int64()
            ),
            "exact_cents": pa.array([e for _, _, e in rows], pa.int64()),
            "err_cents": pa.array(
                [est[(t, q)] - e for t, q, e in rows], pa.int64()
            ),
        }
    )


KMV_K = 64                      # bottom-k sketch size
KMV_HASH_MOD = 1 << 48          # 12 hex chars of md5 — keeps (k−1)·2^48 in int64


def kmv_distinct_eval(sf_dir: str) -> "pa.Table":
    """Measured KMV (bottom-k / theta-sketch) distinct-count error —
    per event type, the k-minimum-values estimate (k−1)·2^48 // h_k
    from the KMV_K smallest DISTINCT 48-bit md5 hashes of user_id,
    against the exact distinct count (of the same hash domain, so a
    48-bit collision cancels identically on both sides); types with
    fewer than k distinct users fall back to the exact count, the
    standard KMV rule. Completes the sketch-eval family
    (bloom_fpr_eval, cms_error_eval, hll_error_eval,
    quantile_sketch_error) with the ONE mergeable distinct sketch the
    registry lacked — Bar-Yossef et al.'s counting-distinct-elements
    bottom-k. Tail-seated by design: hll_error_eval's protocol on a
    bottom-k register.

    Scale shape: the exact side is the (type, hash) DISTINCT grid
    (one coarse reduce) folded to #types counts; the sketch side
    emits ≤ KMV_K candidate rows per (batch, type) and a per-type
    fold over those bounded candidates — no raw row ever reaches the
    driver. Output: (event_type, n_exact, k_used, est, err)."""
    import hashlib

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def hash_rows(batch: pa.Table) -> pa.Table:
        types = np.asarray(
            batch.column("event_type").to_pylist(), dtype=object
        )
        users = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        out_t: list[str] = []
        out_h: list[int] = []
        for t in np.unique(types):
            uu = np.unique(users[types == t])
            hv = sorted(
                {
                    int(
                        hashlib.md5(f"kmv:{int(u)}".encode()).hexdigest()[:12],
                        16,
                    )
                    for u in uu
                }
            )
            out_t += [t] * len(hv)
            out_h += hv
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "hv": pa.array(out_h, pa.int64()),
            }
        )

    hashed = ds.map_batches(hash_rows, batch_format="pyarrow")

    exact = {
        r["event_type"]: int(r["nd"])
        for r in hashed.groupby(["event_type", "hv"])
        .aggregate(_Sum("hv", alias_name="dummy"))
        .map_batches(
            lambda b: pa.table(
                {
                    "event_type": b.column("event_type"),
                    "one": pa.array(
                        np.ones(b.num_rows, np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("event_type")
        .aggregate(_Sum("one", alias_name="nd"))
        .take_all()  # bounded: one row per type
    }

    def bottom_partial(batch: pa.Table) -> pa.Table:
        types = np.asarray(
            batch.column("event_type").to_pylist(), dtype=object
        )
        hv = batch.column("hv").to_numpy(zero_copy_only=False)
        out_t: list[str] = []
        out_h: list[int] = []
        for t in np.unique(types):
            vals = np.unique(hv[types == t])[:KMV_K]
            out_t += [t] * len(vals)
            out_h += vals.tolist()
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "hv": pa.array(out_h, pa.int64()),
            }
        )

    def fold(grp: pa.Table) -> pa.Table:
        t = grp.column("event_type")[0].as_py()
        vals = np.unique(grp.column("hv").to_numpy(zero_copy_only=False))
        k_used = min(len(vals), KMV_K)
        hk = int(vals[k_used - 1])
        return pa.table(
            {
                "event_type": pa.array([t], pa.string()),
                "k_used": pa.array([k_used], pa.int64()),
                "hk": pa.array([hk], pa.int64()),
            }
        )

    sk = {
        r["event_type"]: (int(r["k_used"]), int(r["hk"]))
        for r in hashed.map_batches(bottom_partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()  # bounded: one row per type
    }
    types = sorted(exact)
    ests = []
    for t in types:
        k_used, hk = sk[t]
        n = exact[t]
        ests.append(n if n < KMV_K else (k_used - 1) * KMV_HASH_MOD // hk)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_exact": pa.array([exact[t] for t in types], pa.int64()),
            "k_used": pa.array([sk[t][0] for t in types], pa.int64()),
            "est": pa.array(ests, pa.int64()),
            "err": pa.array(
                [e - exact[t] for e, t in zip(ests, types)], pa.int64()
            ),
        }
    )


PB_REPLICAS = 16   # Poisson-bootstrap replicas
PB_NIBBLES = 16    # zero-nibbles of md5 → Binomial(16, 1/16) ≈ Poisson(1)


def poisson_bootstrap_ci(sf_dir: str) -> "pa.Table":
    """Deterministic Poisson bootstrap of the mean purchase value —
    the resampling trick that makes bootstrap CIs computable in one
    streaming pass over sharded data (Chamandy et al., "Estimating
    uncertainty for massive data streams", Google 2012): replica b
    weights each purchase by w = #zero nibbles among the first
    PB_NIBBLES of md5(event, b) ~ Binomial(16, 1/16) ≈ Poisson(1),
    so every replica is a with-replacement resample no two workers
    need to coordinate, and the spread of the PB_REPLICAS replica
    means IS the sampling distribution of the estimator. All
    arithmetic integer cents; weights are deterministic, so the CI
    is reproducible row-order-free. Tail-seated by design:
    hash_sample's md5 discipline driving weighted_sample's weighted
    mean, replicated.

    Scale shape: each batch folds to PB_REPLICAS (Σw, Σw·cents)
    int64 partials — fixed size regardless of rows — one
    groupby(replica).Sum() reduce, driver reads PB_REPLICAS rows.
    Output: (replica, n_eff, sum_cents, mean_cents)."""
    import hashlib

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        sel = et == "purchase"
        ids = batch.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[sel]
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False)[sel] * 100.0
            + 0.5
        ).astype(np.int64)
        reps, ns, sums = [], [], []
        for b in range(PB_REPLICAS):
            w = np.fromiter(
                (
                    hashlib.md5(f"pb:{int(i)}:{b}".encode())
                    .hexdigest()[:PB_NIBBLES]
                    .count("0")
                    for i in ids
                ),
                dtype=np.int64,
                count=len(ids),
            )
            reps.append(b)
            ns.append(int(w.sum()))
            sums.append(int((w * cents).sum()))
        return pa.table(
            {
                "replica": pa.array(reps, pa.int64()),
                "n_eff": pa.array(ns, pa.int64()),
                "s": pa.array(sums, pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("replica")
        .aggregate(_Sum("n_eff", alias_name="n_eff"), _Sum("s", alias_name="s"))
        .take_all()  # bounded: PB_REPLICAS rows
    )
    out = sorted((int(r["replica"]), int(r["n_eff"]), int(r["s"])) for r in rows)
    return pa.table(
        {
            "replica": pa.array([r for r, _, _ in out], pa.int64()),
            "n_eff": pa.array([n for _, n, _ in out], pa.int64()),
            "sum_cents": pa.array([s for _, _, s in out], pa.int64()),
            "mean_cents": pa.array(
                [s // n for _, n, s in out], pa.int64()
            ),
        }
    )


LPT_WORKERS = 8   # shards the balance plan packs into


def shard_balance_plan(sf_dir: str) -> "pa.Table":
    """LPT shard-balance plan — Graham's longest-processing-time list
    scheduling over the (source, lang) work cells: items sorted by
    total chars DESC (ties (source, lang) ASC) each go to the
    currently least-loaded of LPT_WORKERS shards (ties → lowest
    shard), the 4/3-approximate makespan balancer every
    heterogeneous-scan scheduler runs before launching workers.
    Where compaction_plan packs SEQUENTIALLY into size-capped files
    and salt_plan splits single hot keys, this is the third planner
    shape: min-makespan ASSIGNMENT of whole cells. Tail-seated by
    design: budget_allocation's bounded-grid greedy with a different
    invariant.

    Scale shape: per-batch (source, lang, chars) partials → ONE
    bounded groupby (≤ sources×langs cells) → the greedy runs on the
    driver over that grid (the plan IS driver-sized state, like
    budget_allocation); doc rows never leave their scan. Output:
    (rank, source, lang, item_chars, worker, load_after)."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang", "n_chars"]
    )
    grid = (
        ds.groupby(["source", "lang"])
        .aggregate(_Sum("n_chars", alias_name="w"))
        .take_all()  # bounded: one row per (source, lang) cell
    )
    items = sorted(
        ((r["source"], r["lang"], int(r["w"])) for r in grid),
        key=lambda r: (-r[2], r[0], r[1]),
    )
    loads = [0] * LPT_WORKERS
    ranks, srcs, langs, ws_, wk, la = [], [], [], [], [], []
    for rank, (s, l, w) in enumerate(items, start=1):
        k = loads.index(min(loads))
        loads[k] += w
        ranks.append(rank)
        srcs.append(s)
        langs.append(l)
        ws_.append(w)
        wk.append(k)
        la.append(loads[k])
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "source": pa.array(srcs, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "item_chars": pa.array(ws_, pa.int64()),
            "worker": pa.array(wk, pa.int64()),
            "load_after": pa.array(la, pa.int64()),
        }
    )


ROC_DAY_US = 86_400_000_000   # µs per day — the user-day grain


def _conversion_score_grid(sf_dir: str) -> list[tuple[int, int, int]]:
    """The conversion-propensity SCORE GRID shared by roc_points and
    calibration_bins — score a USER-DAY by its event count, label it
    by whether a purchase happened that day; returns the bounded
    sorted grid [(score, positives, negatives)]. roc_points sweeps it
    into the exact confusion curve + Mann-Whitney AUC (ties at half
    weight, millionths); calibration_bins scores a fixed saturating
    propensity model against it. Pure integer arithmetic throughout.

    Scale shape: one (user, day) groupby completes the grain (Sum
    count, Max label), a second bounded groupby folds it to the
    score grid (≤ max daily events rows); callers read only the
    grid."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def ud_partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // ROC_DAY_US
        )
        et = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        g = (
            pd.DataFrame(
                {"u": uid, "d": day, "n": 1, "y": (et == "purchase").astype(np.int64)}
            )
            .groupby(["u", "d"], sort=False)
            .agg(n=("n", "sum"), y=("y", "max"))
            .reset_index()
        )
        return pa.table(
            {
                "u": pa.array(g["u"].to_numpy().astype(np.int64), pa.int64()),
                "d": pa.array(g["d"].to_numpy().astype(np.int64), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
                "y": pa.array(g["y"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def to_grid(batch: pa.Table) -> pa.Table:
        s = batch.column("n").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s": pa.array(s.astype(np.int64), pa.int64()),
                "pos": pa.array(y.astype(np.int64), pa.int64()),
                "neg": pa.array((1 - y).astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(ud_partial, batch_format="pyarrow")
        .groupby(["u", "d"])
        .aggregate(_Sum("n", alias_name="n"), _Max("y", alias_name="y"))
        .map_batches(to_grid, batch_format="pyarrow")
        .groupby("s")
        .aggregate(_Sum("pos", alias_name="pos"), _Sum("neg", alias_name="neg"))
        .take_all()  # bounded: the daily-event-count score grid
    )
    return sorted((int(r["s"]), int(r["pos"]), int(r["neg"])) for r in grid)


def roc_points(sf_dir: str) -> "pa.Table":
    """ROC curve + exact Mann-Whitney AUC over the conversion score
    grid (see _conversion_score_grid for the grain and docstring of
    record — this is the fold half of the original single function)."""
    rows = _conversion_score_grid(sf_dir)
    p_tot = sum(p for _, p, _ in rows)
    n_tot = sum(n for _, _, n in rows)
    u2 = 0
    negless = 0
    for _, p, n in rows:
        u2 += p * (2 * negless + n)
        negless += n
    auc = u2 * 1_000_000 // (2 * p_tot * n_tot)
    thr, tp_l, fp_l = [], [], []
    tp = fp = 0
    for s, p, n in reversed(rows):
        tp += p
        fp += n
        thr.append(s)
        tp_l.append(tp)
        fp_l.append(fp)
    return pa.table(
        {
            "thr": pa.array(thr, pa.int64()),
            "tp": pa.array(tp_l, pa.int64()),
            "fp": pa.array(fp_l, pa.int64()),
            "fn": pa.array([p_tot - t for t in tp_l], pa.int64()),
            "tn": pa.array([n_tot - f for f in fp_l], pa.int64()),
            "tpr_bp": pa.array([t * 10_000 // p_tot for t in tp_l], pa.int64()),
            "fpr_bp": pa.array([f * 10_000 // n_tot for f in fp_l], pa.int64()),
            "auc_x1e6": pa.array([auc] * len(thr), pa.int64()),
        }
    )


def source_shape_overlap(sf_dir: str) -> "pa.Table":
    """Histogram-intersection similarity between source LENGTH
    distributions — per source pair, Σ_band min(p_a, p_b) where p is
    the source's share (in bp, floored) of docs in each log2(n_chars)
    band: the distribution-shape overlap matrix (Swain & Ballard's
    histogram intersection kernel) that says which sources are
    interchangeable in a sampling mix and which one is shaped like
    nothing else — the SHAPE axis where audience_overlap measures
    shared members and ks_drift two fixed samples. Tail-seated by
    design: conversion_by_engagement's banding folded into a
    pairwise kernel.

    Scale shape: per-batch (source, band) partials → ONE bounded
    groupby (≤ sources × 64 cells) → the pairwise fold runs on the
    driver over that grid (sources² pairs of ≤64-long bp vectors —
    driver-sized by the same contract as budget_allocation). Output:
    (source_a, source_b, overlap_bp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def band_partial(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        n = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        band = np.zeros(len(n), np.int64)
        nn = n.copy()
        while (nn > 0).any():
            band[nn > 0] += 1
            nn >>= 1
        g = (
            pd.DataFrame({"s": src, "b": band, "c": 1})
            .groupby(["s", "b"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["s"], pa.string()),
                "band": pa.array(
                    g["b"].to_numpy().astype(np.int64), pa.int64()
                ),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(band_partial, batch_format="pyarrow")
        .groupby(["source", "band"])
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: sources × log2 bands
    )
    by_src: dict[str, dict[int, int]] = {}
    for r in grid:
        by_src.setdefault(r["source"], {})[int(r["band"])] = int(r["c"])
    bp = {
        s: {b: c * 10_000 // sum(cells.values()) for b, c in cells.items()}
        for s, cells in by_src.items()
    }
    srcs = sorted(bp)
    out_a, out_b, out_o = [], [], []
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            common = set(bp[sa]) & set(bp[sb])
            out_a.append(sa)
            out_b.append(sb)
            out_o.append(sum(min(bp[sa][b], bp[sb][b]) for b in common))
    return pa.table(
        {
            "source_a": pa.array(out_a, pa.string()),
            "source_b": pa.array(out_b, pa.string()),
            "overlap_bp": pa.array(out_o, pa.int64()),
        }
    )


def hhi_concentration(sf_dir: str) -> "pa.Table":
    """Herfindahl–Hirschman language concentration per source —
    HHI = Σ_lang share² in exact basis points (Σ cnt² · 10⁴ //
    tot²), the antitrust regulator's concentration index read over a
    corpus: 10⁴ = monolingual source, → 0 = perfectly spread. The
    square-law cousin gini_sources (rank-weighted inequality) and
    l_diversity_audit (min distinct count) don't compute — and,
    being a plain sum of squares, it needs NO sort and merges
    associatively where Gini cannot. Tail-seated by design:
    contingency_grid's cells under a square-law fold.

    Scale shape: per-batch (source, lang) partials → ONE bounded
    groupby (≤ sources × langs) → the square-law fold reads the grid
    on the driver. Output: (source, n_docs, n_langs, hhi_bp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "s": np.asarray(
                        batch.column("source").to_pylist(), dtype=object
                    ),
                    "l": np.asarray(
                        batch.column("lang").to_pylist(), dtype=object
                    ),
                    "c": 1,
                }
            )
            .groupby(["s", "l"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["s"], pa.string()),
                "lang": pa.array(g["l"], pa.string()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: sources × langs cells
    )
    cells: dict[str, list[int]] = {}
    for r in grid:
        cells.setdefault(r["source"], []).append(int(r["c"]))
    srcs = sorted(cells)
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "n_docs": pa.array([sum(cells[s]) for s in srcs], pa.int64()),
            "n_langs": pa.array([len(cells[s]) for s in srcs], pa.int64()),
            "hhi_bp": pa.array(
                [
                    sum(c * c for c in cells[s])
                    * 10_000
                    // (sum(cells[s]) ** 2)
                    for s in srcs
                ],
                pa.int64(),
            ),
        }
    )


def gini_split_stump(sf_dir: str) -> "pa.Table":
    """Decision-stump split search, exact — for every candidate
    threshold v over n_chars (split: x ≤ v vs x > v), the Gini
    impurity DECREASE of predicting lang = 'en', in exact nano-units:
    gain·n²·n_l·n_r = 2p(n−p)·n_l·n_r − 2n·(p_l(n_l−p_l)·n_r +
    p_r(n_r−p_r)·n_l), floored against the common denominator — the
    CART split-finding primitive (Breiman et al. 1984) run at corpus
    scale, emitted as the FULL gain curve so the best stump AND the
    plateau around it are readable (argmax = max(gain, then min
    thr)). Gini gain is concave-guaranteed ≥ 0, so no sign tricks
    are needed; intermediates exceed int64 and ride Python bigints /
    the oracle's HUGEINT. Tail-seated by design: hist_quantiles'
    value grid swept by a supervised objective.

    Scale shape: ONE bounded (n_chars value) groupby with per-batch
    (count, positives) partials; the prefix-scan gain fold reads the
    value GRID on the driver — rows never leave their scan. Output:
    (thr, n_left, pos_left, n_right, pos_right, gain_x1e9)."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["n_chars", "lang"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        v = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        en = (
            np.asarray(batch.column("lang").to_pylist(), dtype=object) == "en"
        ).astype(np.int64)
        g = (
            pd.DataFrame({"v": v, "c": 1, "p": en})
            .groupby("v", sort=False)
            .agg(c=("c", "sum"), p=("p", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "v": pa.array(g["v"].to_numpy().astype(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
                "p": pa.array(g["p"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = sorted(
        (int(r["v"]), int(r["c"]), int(r["p"]))
        for r in ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(_Sum("c", alias_name="c"), _Sum("p", alias_name="p"))
        .take_all()  # bounded: the n_chars value grid
    )
    n = sum(c for _, c, _ in grid)
    p = sum(q for _, _, q in grid)
    thr, nl_l, pl_l, nr_l, pr_l, gain_l = [], [], [], [], [], []
    nl = pl = 0
    for v, c, q in grid:
        nl += c
        pl += q
        if nl >= n:
            break  # right side must be non-empty
        nr, pr = n - nl, p - pl
        num = 2 * p * (n - p) * nl * nr - 2 * n * (
            pl * (nl - pl) * nr + pr * (nr - pr) * nl
        )
        gain = num * 1_000_000_000 // (n * n * nl * nr)
        thr.append(v)
        nl_l.append(nl)
        pl_l.append(pl)
        nr_l.append(nr)
        pr_l.append(pr)
        gain_l.append(gain)
    return pa.table(
        {
            "thr": pa.array(thr, pa.int64()),
            "n_left": pa.array(nl_l, pa.int64()),
            "pos_left": pa.array(pl_l, pa.int64()),
            "n_right": pa.array(nr_l, pa.int64()),
            "pos_right": pa.array(pr_l, pa.int64()),
            "gain_x1e9": pa.array(gain_l, pa.int64()),
        }
    )


DICT_AUDIT_COLS = (
    ("documents", "source"),
    ("documents", "lang"),
    ("events", "event_type"),
)


def dict_encoding_audit(sf_dir: str) -> "pa.Table":
    """Dictionary-encoding benefit audit — for each low-cardinality
    string column the writer could dictionary-encode, the exact byte
    math a columnar layout decision needs: raw bytes (Σ strlen),
    dictionary bytes (Σ strlen over DISTINCT values + n rows × the
    index width 1/2/4 chosen by cardinality), and the savings in bp
    (offset-shifted floor so a pathological negative saving still
    divides exactly). profile_columns reports shapes and
    front_coding_audit prices prefix compression of SORTED keys —
    this prices the dictionary, the decision Parquet writers
    actually make per column chunk. Tail-seated by design:
    profile_columns' per-column fold with storage-cost arithmetic.

    Scale shape: per column ONE (value) groupby with per-batch
    (count, bytes) partials — dictionary candidates are
    low-cardinality by selection, so the distinct grid is bounded;
    the driver reads it and does pure integer byte math. Output:
    (table_name, column_name, n_rows, n_distinct, raw_bytes,
    dict_bytes, savings_bp)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    rows = []
    for table, col in DICT_AUDIT_COLS:
        ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        def partial(batch: pa.Table, _c=col) -> pa.Table:
            vals = np.asarray(batch.column(_c).to_pylist(), dtype=object)
            g = (
                pd.DataFrame({"v": vals, "c": 1})
                .groupby("v", sort=False)["c"]
                .sum()
                .reset_index()
            )
            return pa.table(
                {
                    "v": pa.array(g["v"], pa.string()),
                    "c": pa.array(
                        g["c"].to_numpy().astype(np.int64), pa.int64()
                    ),
                }
            )

        grid = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("v")
            .aggregate(_Sum("c", alias_name="c"))
            .take_all()  # bounded: the column's distinct values
        )
        n = sum(int(r["c"]) for r in grid)
        d = len(grid)
        raw = sum(len(r["v"].encode()) * int(r["c"]) for r in grid)
        dict_entries = sum(len(r["v"].encode()) for r in grid)
        idx_bytes = 1 if d <= 256 else (2 if d <= 65536 else 4)
        dict_total = dict_entries + n * idx_bytes
        savings_bp = (raw - dict_total + 8 * raw) * 10_000 // raw - 80_000
        rows.append((table, col, n, d, raw, dict_total, savings_bp))
    return pa.table(
        {
            "table_name": pa.array([r[0] for r in rows], pa.string()),
            "column_name": pa.array([r[1] for r in rows], pa.string()),
            "n_rows": pa.array([r[2] for r in rows], pa.int64()),
            "n_distinct": pa.array([r[3] for r in rows], pa.int64()),
            "raw_bytes": pa.array([r[4] for r in rows], pa.int64()),
            "dict_bytes": pa.array([r[5] for r in rows], pa.int64()),
            "savings_bp": pa.array([r[6] for r in rows], pa.int64()),
        }
    )


CAL_K = 3      # saturating-propensity half-point: p_hat = s/(s+K)
CAL_BINS = 10  # equal-width probability bins


def calibration_bins(sf_dir: str) -> "pa.Table":
    """Reliability diagram + exact ECE of a FIXED propensity model —
    score every user-day by the saturating curve p_hat = s/(s+CAL_K)
    (in millionths, exact floor) where s is the day's event count,
    fold user-days into CAL_BINS equal-width probability bins, and
    per bin emit count, positives, confidence mass and the exact
    calibration gap |pos/n − conf/n| in millionths (one common
    denominator, so |pos·10⁶ − conf_sum| // n is exact), plus the
    corpus ECE = Σ_b |pos_b·10⁶ − conf_b| // N. roc_points asks
    whether the score DISCRIMINATES; this asks whether its
    probabilities are HONEST — the other half of classifier eval,
    and the one that decides if scores can gate data (a miscalibrated
    quality gate silently shifts the kept distribution). Tail-seated
    by design: roc_points' grid against a fixed link function.

    Scale shape: consumes the bounded _conversion_score_grid (two
    groupbys, per-batch partials); the bin fold is pure driver
    integer math over that grid. Output: (bin, n, pos, conf_sum,
    gap_x1e6, ece_x1e6), non-empty bins only."""
    rows = _conversion_score_grid(sf_dir)
    acc: dict[int, list[int]] = {}
    for s, pos, neg in rows:
        n = pos + neg
        p_hat = s * 1_000_000 // (s + CAL_K)
        b = p_hat * CAL_BINS // 1_000_000
        cell = acc.setdefault(b, [0, 0, 0])
        cell[0] += n
        cell[1] += pos
        cell[2] += p_hat * n
    n_tot = sum(c[0] for c in acc.values())
    num_tot = sum(
        abs(c[1] * 1_000_000 - c[2]) for c in acc.values()
    )
    ece = num_tot // n_tot
    bins = sorted(acc)
    return pa.table(
        {
            "bin": pa.array(bins, pa.int64()),
            "n": pa.array([acc[b][0] for b in bins], pa.int64()),
            "pos": pa.array([acc[b][1] for b in bins], pa.int64()),
            "conf_sum": pa.array([acc[b][2] for b in bins], pa.int64()),
            "gap_x1e6": pa.array(
                [
                    abs(acc[b][1] * 1_000_000 - acc[b][2]) // acc[b][0]
                    for b in bins
                ],
                pa.int64(),
            ),
            "ece_x1e6": pa.array([ece] * len(bins), pa.int64()),
        }
    )


def chi2_independence(sf_dir: str) -> "pa.Table":
    """Exact Pearson chi-square decomposition of the source × lang
    contingency — for EVERY cell of the full marginal cross (including
    zero-observation cells) the observed count, the expected count in
    millionths (R·C·10⁶ // N) and the cell's chi-square contribution
    (O·N − R·C)²·10⁶ // (N·R·C) — numerator a square so provably
    ≥ 0, intermediates on Python ints / HUGEINT — plus the total
    statistic as the sum of the floored cell terms (mirrored exactly
    in SQL). contingency_grid emits the counts; this emits the TEST —
    which cells drive source/language dependence, the routing signal
    a mixture-weights job needs. Tail-seated by design:
    contingency_grid's counts pushed through cross-multiplied
    inference.

    Scale shape: per-batch (source, lang) Counter partials → ONE
    bounded groupby (sources × langs grid); marginals and the
    cross-multiplied fold are pure driver integer math over that
    grid. Output: (source, lang, obs, exp_x1e6, contrib_x1e6,
    chi2_x1e6)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("source").to_pylist(), dtype=object)
        la = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        g = (
            pd.DataFrame({"source": s, "lang": la, "c": 1})
            .groupby(["source", "lang"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "lang": pa.array(g["lang"], pa.string()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: sources × langs cells
    )
    obs = {(r["source"], r["lang"]): int(r["c"]) for r in grid}
    sources = sorted({k[0] for k in obs})
    langs = sorted({k[1] for k in obs})
    rc = {s: sum(obs.get((s, la), 0) for la in langs) for s in sources}
    lc = {la: sum(obs.get((s, la), 0) for s in sources) for la in langs}
    nn = sum(rc.values())
    out_s, out_l, out_o, out_e, out_c = [], [], [], [], []
    for s in sources:
        for la in langs:
            o = obs.get((s, la), 0)
            diff = o * nn - rc[s] * lc[la]
            out_s.append(s)
            out_l.append(la)
            out_o.append(o)
            out_e.append(rc[s] * lc[la] * 1_000_000 // nn)
            out_c.append(diff * diff * 1_000_000 // (nn * rc[s] * lc[la]))
    chi2 = sum(out_c)
    return pa.table(
        {
            "source": pa.array(out_s, pa.string()),
            "lang": pa.array(out_l, pa.string()),
            "obs": pa.array(out_o, pa.int64()),
            "exp_x1e6": pa.array(out_e, pa.int64()),
            "contrib_x1e6": pa.array(out_c, pa.int64()),
            "chi2_x1e6": pa.array([chi2] * len(out_s), pa.int64()),
        }
    )


RLE_BUCKET = 65536  # contiguous id-range width for distributed run count
RLE_COLS = (
    ("documents", "source", "doc_id"),
    ("documents", "lang", "doc_id"),
    ("events", "event_type", "event_id"),
)


def rle_encoding_audit(sf_dir: str) -> "pa.Table":
    """Run-length-encoding benefit audit in PHYSICAL row order — for
    each dict-candidate column, the exact number of value runs when
    rows are laid out by their id, and the exact RLE byte cost
    (Σ over runs of strlen(value) + 4 length bytes) against raw
    Σ strlen, savings in bp (same offset-shifted floor as
    dict_encoding_audit). dict_encoding_audit prices the dictionary
    regardless of order; THIS prices how clustered the layout already
    is — the signal that decides whether a rewrite (zorder_keys'
    output) is worth the IO. Tail-seated by design:
    dict_encoding_audit's byte math over event_runs' run discipline.

    Scale shape: contiguous id-range buckets (id // RLE_BUCKET) —
    ONE groupby whose group is a bounded bucket, sorted locally for
    internal runs + (first, last) edge values; the driver stitches
    adjacent buckets (a merge where last_b == first_{b+1} subtracts
    one run and its bytes — associative, so a tree reduce replaces
    the driver fold at extreme scale). Driver read bounded at
    n / RLE_BUCKET rows per column. Output: (table_name,
    column_name, n_rows, n_runs, raw_bytes, rle_bytes, savings_bp)."""
    rows_out = []
    for table, col, idcol in RLE_COLS:
        ds = ray.data.read_parquet(
            f"{sf_dir}/{table}.parquet", columns=[idcol, col]
        )

        def to_bucket(batch: pa.Table, _id=idcol) -> pa.Table:
            ids = batch.column(_id).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            return pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "v": batch.column(1 - batch.schema.get_field_index(_id)),
                    "bucket": pa.array(ids // RLE_BUCKET, pa.int64()),
                }
            )

        def bucket_runs(grp: pa.Table) -> pa.Table:
            import pandas as pd

            df = grp.select(["id", "v"]).to_pandas().sort_values("id")
            v = df["v"].to_numpy()
            lens = np.array([len(x.encode()) for x in v], dtype=np.int64)
            starts = np.r_[True, v[1:] != v[:-1]]
            return pa.table(
                {
                    "bucket": pa.array(
                        [int(grp.column("bucket")[0].as_py())], pa.int64()
                    ),
                    "n": pa.array([len(v)], pa.int64()),
                    "raw": pa.array([int(lens.sum())], pa.int64()),
                    "runs": pa.array([int(starts.sum())], pa.int64()),
                    "rbytes": pa.array(
                        [int((lens[starts] + 4).sum())], pa.int64()
                    ),
                    "first_v": pa.array([str(v[0])], pa.string()),
                    "last_v": pa.array([str(v[-1])], pa.string()),
                }
            )

        grid = sorted(
            (
                int(r["bucket"]),
                int(r["n"]),
                int(r["raw"]),
                int(r["runs"]),
                int(r["rbytes"]),
                r["first_v"],
                r["last_v"],
            )
            for r in ds.map_batches(to_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_runs, batch_format="pyarrow")
            .take_all()  # bounded: n / RLE_BUCKET stitch rows
        )
        n = sum(g[1] for g in grid)
        raw = sum(g[2] for g in grid)
        runs = sum(g[3] for g in grid)
        rbytes = sum(g[4] for g in grid)
        for prev, cur in zip(grid, grid[1:]):
            if prev[6] == cur[5]:  # run continues across the boundary
                runs -= 1
                rbytes -= len(cur[5].encode()) + 4
        savings_bp = (raw - rbytes + 8 * raw) * 10_000 // raw - 80_000
        rows_out.append((table, col, n, runs, raw, rbytes, savings_bp))
    return pa.table(
        {
            "table_name": pa.array([r[0] for r in rows_out], pa.string()),
            "column_name": pa.array([r[1] for r in rows_out], pa.string()),
            "n_rows": pa.array([r[2] for r in rows_out], pa.int64()),
            "n_runs": pa.array([r[3] for r in rows_out], pa.int64()),
            "raw_bytes": pa.array([r[4] for r in rows_out], pa.int64()),
            "rle_bytes": pa.array([r[5] for r in rows_out], pa.int64()),
            "savings_bp": pa.array([r[6] for r in rows_out], pa.int64()),
        }
    )


ZM_BUCKET = 1024  # zone (row-group analogue) width in doc_id space
ZM_THRESHOLDS = tuple(2 ** k for k in range(5, 15))  # 32 .. 16384


def zonemap_audit(sf_dir: str) -> "pa.Table":
    """Zone-map (min/max statistics) pruning audit — partition
    documents into doc_id zones of ZM_BUCKET rows, keep each zone's
    max(n_chars) and row count, and for every threshold t in the
    fixed ZM_THRESHOLDS grid report exactly how many zones the
    predicate n_chars > t could SKIP outright (zone max ≤ t) and the
    row fraction pruned, in bp. compaction_plan sizes files and
    zorder_keys orders them — this measures what the ordering BUYS:
    the skip rate a reader's row-group statistics would actually
    achieve. Tail-seated by design: dict/rle audits' storage-cost
    fold pointed at read-side statistics.

    Scale shape: per-batch (zone, max, count) partials → ONE bounded
    groupby (n / ZM_BUCKET zones); a vectorized threshold sweep per
    zone block emits (thr, skippable, rows) partials → one tiny
    groupby(thr); the driver reads |ZM_THRESHOLDS| rows. Output:
    (thr, n_zones, skippable_zones, rows_skipped, prune_bp)."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        z = (
            batch.column("doc_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // ZM_BUCKET
        )
        nc = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        g = (
            pd.DataFrame({"z": z, "mx": nc, "c": 1})
            .groupby("z", sort=False)
            .agg(mx=("mx", "max"), c=("c", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "z": pa.array(g["z"].to_numpy().astype(np.int64), pa.int64()),
                "mx": pa.array(
                    g["mx"].to_numpy().astype(np.int64), pa.int64()
                ),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    zones = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("z")
        .aggregate(_Max("mx", alias_name="mx"), _Sum("c", alias_name="c"))
    )

    thr_arr = np.array(ZM_THRESHOLDS, dtype=np.int64)

    def sweep(batch: pa.Table) -> pa.Table:
        mx = batch.column("mx").to_numpy(zero_copy_only=False)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        skip = mx[None, :] <= thr_arr[:, None]  # (T, zones)
        return pa.table(
            {
                "thr": pa.array(thr_arr, pa.int64()),
                "zones": pa.array(
                    np.full(len(thr_arr), len(mx), np.int64), pa.int64()
                ),
                "skippable": pa.array(
                    skip.sum(axis=1).astype(np.int64), pa.int64()
                ),
                "rows_skipped": pa.array(
                    (skip * c[None, :]).sum(axis=1).astype(np.int64),
                    pa.int64(),
                ),
                "rows": pa.array(
                    np.full(len(thr_arr), int(c.sum()), np.int64), pa.int64()
                ),
            }
        )

    grid = (
        zones.map_batches(sweep, batch_format="pyarrow")
        .groupby("thr")
        .aggregate(
            _Sum("zones", alias_name="zones"),
            _Sum("skippable", alias_name="skippable"),
            _Sum("rows_skipped", alias_name="rows_skipped"),
            _Sum("rows", alias_name="rows"),
        )
        .take_all()  # bounded: |ZM_THRESHOLDS| rows
    )
    rows = sorted(
        (
            int(r["thr"]),
            int(r["zones"]),
            int(r["skippable"]),
            int(r["rows_skipped"]),
            int(r["rows"]),
        )
        for r in grid
    )
    return pa.table(
        {
            "thr": pa.array([r[0] for r in rows], pa.int64()),
            "n_zones": pa.array([r[1] for r in rows], pa.int64()),
            "skippable_zones": pa.array([r[2] for r in rows], pa.int64()),
            "rows_skipped": pa.array([r[3] for r in rows], pa.int64()),
            "prune_bp": pa.array(
                [r[3] * 10_000 // r[4] for r in rows], pa.int64()
            ),
        }
    )


GD_SCALE = 32    # grid cell width = 1/32 in embedding coordinate space
GD_MINPTS = 4    # a cell is DENSE when it holds >= this many points
GD_OFF = 1 << 20   # coordinate offset keeping packed cell keys positive
GD_SPAN = 1 << 21  # packed key stride: cell = (cx+OFF)*SPAN + (cy+OFF)


def grid_dbscan(sf_dir: str) -> "pa.Table":
    """Grid-density clustering — DBSCAN collapsed onto a quantized
    grid (the cell-based variant used when pairwise eps-queries are
    too expensive): each embedding quantizes to the cell
    (floor(x·32), floor(y·32)) of its first two coordinates, a cell
    is DENSE when it holds ≥ GD_MINPTS points, and dense cells that
    touch in the 8-neighbourhood merge into clusters via connected
    components; points in non-dense cells are noise. The DENSITY
    clustering class the suite lacks: k-means (semdedup / kmeans_
    inertia) partitions by nearest centroid and must be told k;
    this finds arbitrarily-shaped blobs and outliers with no k at
    all — the outlier-mining / region-discovery shape. Reference
    parity: readur has no clustering; this extends the curation
    suite (cluster_purity consumes labels; this PRODUCES them).

    Exactness: quantization is floor(x·32) — ×2^5 is exact in any
    binary float, so float32 vs DOUBLE never disagree; everything
    after is integer. Cell keys pack as (cx+2^20)·2^21 + (cy+2^20),
    mirrored verbatim by the oracle, whose connected components run
    as a recursive min-label CTE (dedup_components precedent).

    Scale shape: per-batch cell bincount partials (arrow list
    offsets, no per-row stack) → ONE bounded groupby(cell) Sum; the
    occupied-cell grid is driver-bounded by the coordinate domain —
    normalized embeddings live in [-1, 1], so ≤ (2·32+2)² ≈ 4.4k
    cells regardless of row count — and the union-find runs on the
    dense subset of THAT, never on points. One exchange total;
    points never shuffle. Output: (cluster_id = min packed cell of
    the component, n_cells, n_points) per cluster, plus the noise
    row cluster_id = −1 (non-dense cells and their points), sorted
    by cluster_id."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.values.to_numpy(zero_copy_only=False)
        offs = col.offsets.to_numpy(zero_copy_only=False)[:-1]
        cx = np.floor(
            vals[offs].astype(np.float64) * GD_SCALE
        ).astype(np.int64)
        cy = np.floor(
            vals[offs + 1].astype(np.float64) * GD_SCALE
        ).astype(np.int64)
        cell = (cx + GD_OFF) * GD_SPAN + (cy + GD_OFF)
        u, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(u, pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: occupied cells <= (2*GD_SCALE+2)^2
    )
    counts = {int(r["cell"]): int(r["c"]) for r in grid}
    dense = {c for c, n in counts.items() if n >= GD_MINPTS}

    parent = {c: c for c in dense}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for cell in dense:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = cell + dx * GD_SPAN + dy
                if nb in dense:
                    ra, rb = find(cell), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)

    comp_cells: dict[int, int] = {}
    comp_points: dict[int, int] = {}
    for cell in dense:
        root = find(cell)
        comp_cells[root] = comp_cells.get(root, 0) + 1
        comp_points[root] = comp_points.get(root, 0) + counts[cell]

    n_noise_cells = len(counts) - len(dense)
    n_noise_pts = sum(counts.values()) - sum(comp_points.values())
    rows = [(-1, n_noise_cells, n_noise_pts)] + sorted(
        (cid, comp_cells[cid], comp_points[cid]) for cid in comp_cells
    )
    return pa.table(
        {
            "cluster_id": pa.array([r[0] for r in rows], pa.int64()),
            "n_cells": pa.array([r[1] for r in rows], pa.int64()),
            "n_points": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def wasserstein_drift(sf_dir: str) -> "ray.data.Dataset":
    """Exact 1-D Wasserstein-1 (earth-mover) distance of each
    source's ``n_chars`` distribution against the whole corpus — the
    INTEGRAL-norm companion to ks_drift's sup-norm. KS flags the
    single worst ECDF gap (sensitive to one sharp localized shift,
    blind to magnitude elsewhere); W1 integrates |ΔECDF| over the
    value axis, i.e. the total mass × distance that would have to
    move — the drift monitor that responds to a slow whole-
    distribution slide KS barely sees. Output per source: ``n_s``,
    ``n_all`` and ``w1_num`` = Σ_i |n_all·F_s(v_i) − n_s·F(v_i)| ·
    (v_{i+1} − v_i) over the sorted global value grid, so
    W1 = w1_num / (n_s·n_all) is exact integer arithmetic (the last
    grid point contributes 0: both ECDFs are complete there).
    Overflow bound: w1_num ≤ n_s·n_all·(v_max − v_min), inside int64
    through ~10^6 docs/source × 10^7 corpus × 10^4 range; beyond
    that the same plan emits HUGEINT-style hi/lo splits.

    Scale shape: identical to ks_drift (deliberately — one grid
    serves both norms): rows reduce to the (source, value) count
    grid with per-batch pyarrow group_by partials, ONE small groupby
    folds the grid, the global cumulative is built once from the
    tiny value histogram and broadcast, and a per-source map_groups
    scans its ≤|domain| grid rows — rows never shuffle, only grid
    cells do."""
    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def cell_partials(batch: pa.Table) -> pa.Table:
        g = (
            batch.group_by(["source", "n_chars"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "source": g.column("source"),
                "v": g.column("n_chars").cast(pa.int64()),
                "c": g.column("count_all").cast(pa.int64()),
            }
        )

    cells = (
        ds.map_batches(cell_partials, batch_format="pyarrow")
        .groupby(["source", "v"])
        .aggregate(_Sum("c", alias_name="c"))
    )

    hist: dict[int, int] = {}
    for b in cells.iter_batches(batch_format="pyarrow"):
        for v, c in zip(b.column("v").to_pylist(), b.column("c").to_pylist()):
            hist[v] = hist.get(v, 0) + c
    vals = np.array(sorted(hist), dtype=np.int64)
    cum_all = np.cumsum([hist[int(v)] for v in vals]).astype(np.int64)
    n_all = int(cum_all[-1])
    dv = np.diff(vals)  # gap to the next grid value; last point drops
    bcast = ray.put((vals, cum_all, dv))

    def per_source(group: pa.Table) -> pa.Table:
        gvals, gcum, gdv = ray.get(bcast)
        v = group.column("v").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        n_s = int(c.sum())
        cum_s = np.zeros(len(gvals), dtype=np.int64)
        cum_s[np.searchsorted(gvals, v)] = c
        cum_s = np.cumsum(cum_s)
        w1 = int(
            np.sum(
                np.abs(n_all * cum_s[:-1] - n_s * gcum[:-1]) * gdv
            )
        )
        return pa.table(
            {
                "source": pa.array([group.column("source")[0].as_py()]),
                "n_s": pa.array([n_s], pa.int64()),
                "n_all": pa.array([n_all], pa.int64()),
                "w1_num": pa.array([w1], pa.int64()),
            }
        )

    return cells.groupby("source").map_groups(
        per_source, batch_format="pyarrow"
    )


MW_VALUE_BUCKETS = 512  # value-range buckets for the rank exchange


def mann_whitney_u(sf_dir: str) -> "ray.data.Dataset":
    """Exact Mann-Whitney U (Wilcoxon rank-sum) statistic of each
    event type's ``value`` sample against the pooled corpus — the
    NONPARAMETRIC two-sample location test next to welch_t2_grid's
    parametric one (Welch assumes finite variance and compares means;
    U compares rank distributions, robust to the heavy-tailed /
    ordinal metrics A/B readouts actually ship). Ties are handled
    exactly through DOUBLE ranks: a tie group with L strictly-smaller
    rows and size t has average rank L + (t+1)/2, so its double rank
    d = 2L + t + 1 is always integer. Output per event_type: n_g,
    r2_sum = Σ d (twice the rank sum) and u2 = r2_sum − n_g·(n_g+1)
    (twice the U statistic vs the rest of the pool), all exact int64
    (inside int64 through ~10^9 rows; beyond, the same plan emits
    hi/lo splits). z-scores need only these plus the global tie term.

    Scale shape — the percentile_rank bucket-grid sort-rank on a
    FLOAT key: rows bucket by value range (equal values always share
    a bucket, so tie groups never straddle the prefix boundary), the
    MW_VALUE_BUCKETS-bounded count grid reaches the driver once and
    exclusive prefix bases broadcast back, and ONE groupby(kb)
    exchange ranks each bucket locally (np.unique + cumsum — no
    global sort barrier). Per-bucket output is the tiny
    (event_type, n, r2) partial, folded by one bounded groupby.
    Rows shuffle once; nothing else moves."""
    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(path, columns=["event_type", "value"])

    def finite(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isfinite(v)))

    ds = ds.map_batches(finite, batch_format="pyarrow")
    lohi = ds.aggregate(_Min("value"), _Max("value"))
    lo, hi = float(lohi["min(value)"]), float(lohi["max(value)"])
    width = (hi - lo) / MW_VALUE_BUCKETS or 1.0

    def keyed(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        kb = np.clip(
            np.floor((v - lo) / width).astype(np.int64),
            0,
            MW_VALUE_BUCKETS - 1,
        )
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "v": pa.array(v, pa.float64()),
                "kb": pa.array(kb, pa.int64()),
            }
        )

    rows = ds.map_batches(keyed, batch_format="pyarrow")

    def kb_partial(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("kb").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {
                "kb": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    grid = (
        rows.map_batches(kb_partial, batch_format="pyarrow")
        .groupby("kb")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= MW_VALUE_BUCKETS rows
    )
    counts = np.zeros(MW_VALUE_BUCKETS, dtype=np.int64)
    for r in grid:
        counts[int(r["kb"])] = int(r["n"])
    base = np.concatenate(([0], np.cumsum(counts)[:-1]))
    bcast = ray.put(base)

    def rank_part(group: pa.Table) -> pa.Table:
        pre = ray.get(bcast)
        kb = int(group.column("kb")[0].as_py())
        v = group.column("v").to_numpy(zero_copy_only=False)
        uniq, inv, cnt = np.unique(v, return_inverse=True, return_counts=True)
        before = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        d_uniq = 2 * (pre[kb] + before) + cnt + 1
        d = d_uniq[inv]
        part = pa.table(
            {"event_type": group.column("event_type"), "d": pa.array(d, pa.int64())}
        )
        g = part.group_by("event_type").aggregate([("d", "sum"), ([], "count_all")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n_g": g.column("count_all").cast(pa.int64()),
                "r2": g.column("d_sum").cast(pa.int64()),
            }
        )

    partials = rows.groupby("kb").map_groups(rank_part, batch_format="pyarrow")
    folded = partials.groupby("event_type").aggregate(
        _Sum("n_g", alias_name="n_g"), _Sum("r2", alias_name="r2_sum")
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_g").to_numpy(zero_copy_only=False)
        r2 = batch.column("r2_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n_g": pa.array(n, pa.int64()),
                "r2_sum": pa.array(r2, pa.int64()),
                "u2": pa.array(r2 - n * (n + 1), pa.int64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


RFM_BUCKETS = 64  # key-range buckets per metric for the RFM rank passes


def rfm_segments(sf_dir: str) -> "ray.data.Dataset":
    """RFM customer segmentation — the classic marketing/CRM composite
    over the orders fact: per customer, recency_days (days from the
    last order to the corpus max order day), frequency (#orders) and
    monetary_cents (exact integer revenue), each scored into exact
    quintiles 1-5 (5 = most recent / most frequent / highest spend)
    with the deterministic tie-break (metric, custkey), and the packed
    segment code rfm = 100·r + 10·f + m. Quintile score is the pure
    rank arithmetic 1 + ⌊rn0·5/n⌋ over the row_number rn0 (0-based),
    mirrored verbatim by the oracle — never NTILE's
    larger-groups-first quirk.

    Scale shape: the orders fact folds ONCE to the per-customer
    (last_day, frequency, cents) table via per-batch pyarrow partials
    + one groupby(custkey) — the only fact-sized exchange — and that
    slim 4-int-column table is materialized once and re-ranked three
    times with the percentile_rank bucket-grid sort-rank (bounded
    RFM_BUCKETS count grid to the driver, exclusive prefix bases
    broadcast, one groupby(kb) exchange per metric, bucket-local
    lexsort — no global sort barrier). Descending metrics rank on the
    negated key, so one ascending kernel serves all three. Total: one
    fact exchange + three slim-row exchanges; scores ride the row, so
    no join reassembles the output."""
    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    path = f"{sf_dir}/orders.parquet"
    ds = ray.data.read_parquet(
        path, columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )

    mx = ds.aggregate(_Max("o_orderdate"))
    max_day = int(
        np.datetime64(mx["max(o_orderdate)"], "us").astype(np.int64)
        // 86_400_000_000
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        day = pa.array(
            batch.column("o_orderdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            // 86_400_000_000,
            pa.int64(),
        )
        t = pa.table(
            {
                "custkey": batch.column("o_custkey").cast(pa.int64()),
                "day": day,
                "cents": _cents(batch.column("o_totalprice")),
            }
        )
        g = t.group_by("custkey").aggregate(
            [("day", "max"), ("cents", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "custkey": g.column("custkey"),
                "last_day": g.column("day_max").cast(pa.int64()),
                "monetary_cents": g.column("cents_sum").cast(pa.int64()),
                "frequency": g.column("count_all").cast(pa.int64()),
            }
        )

    cust = (
        ds.map_batches(cust_partial, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(
            _Max("last_day", alias_name="last_day"),
            _Sum("monetary_cents", alias_name="monetary_cents"),
            _Sum("frequency", alias_name="frequency"),
        )
    )

    def with_recency(batch: pa.Table) -> pa.Table:
        last = batch.column("last_day").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "custkey": batch.column("custkey").cast(pa.int64()),
                "recency_days": pa.array(max_day - last, pa.int64()),
                "frequency": batch.column("frequency").cast(pa.int64()),
                "monetary_cents": batch.column("monetary_cents").cast(pa.int64()),
            }
        )

    # slim pre-reduced table (4 int64 cols, one row per customer):
    # materialized ONCE so the three rank passes don't re-fold orders.
    cust = cust.map_batches(with_recency, batch_format="pyarrow").materialize()
    n_total = cust.count()

    def rank_pass(dset, metric: str, score_col: str, descending: bool):
        sign = -1 if descending else 1
        lohi = dset.aggregate(_Min(metric), _Max(metric))
        lo = sign * int(lohi[f"min({metric})"] if sign == 1 else lohi[f"max({metric})"])
        hi = sign * int(lohi[f"max({metric})"] if sign == 1 else lohi[f"min({metric})"])
        width = (hi - lo) // RFM_BUCKETS + 1

        def keyed(batch: pa.Table) -> pa.Table:
            k = sign * batch.column(metric).to_numpy(zero_copy_only=False)
            kb = (k - lo) // width
            return batch.append_column(
                "_k", pa.array(k, pa.int64())
            ).append_column("_kb", pa.array(kb, pa.int64()))

        rows = dset.map_batches(keyed, batch_format="pyarrow")

        def kb_partial(batch: pa.Table) -> pa.Table:
            u, cnt = np.unique(
                batch.column("_kb").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table(
                {
                    "kb": pa.array(u, pa.int64()),
                    "n": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        grid = (
            rows.map_batches(kb_partial, batch_format="pyarrow")
            .groupby("kb")
            .aggregate(_Sum("n", alias_name="n"))
            .take_all()  # bounded: <= RFM_BUCKETS rows
        )
        counts = np.zeros(RFM_BUCKETS, dtype=np.int64)
        for r in grid:
            counts[int(r["kb"])] = int(r["n"])
        base = np.concatenate(([0], np.cumsum(counts)[:-1]))
        bcast = ray.put(base)

        def rank_part(group: pa.Table) -> pa.Table:
            pre = ray.get(bcast)
            kb = int(group.column("_kb")[0].as_py())
            k = group.column("_k").to_numpy(zero_copy_only=False)
            ck = group.column("custkey").to_numpy(zero_copy_only=False)
            order = np.lexsort((ck, k))
            rn0 = np.empty(len(k), dtype=np.int64)
            rn0[order] = pre[kb] + np.arange(len(k), dtype=np.int64)
            score = 1 + rn0 * 5 // n_total
            out = group.drop_columns(["_k", "_kb"])
            return out.append_column(score_col, pa.array(score, pa.int64()))

        return rows.groupby("_kb").map_groups(rank_part, batch_format="pyarrow")

    cust = rank_pass(cust, "recency_days", "r_score", descending=True)
    cust = rank_pass(cust, "frequency", "f_score", descending=False)
    cust = rank_pass(cust, "monetary_cents", "m_score", descending=False)

    def finish(batch: pa.Table) -> pa.Table:
        r = batch.column("r_score").to_numpy(zero_copy_only=False)
        f = batch.column("f_score").to_numpy(zero_copy_only=False)
        m = batch.column("m_score").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "rfm", pa.array(r * 100 + f * 10 + m, pa.int64())
        )

    return cust.map_batches(finish, batch_format="pyarrow")


def t_closeness_audit(sf_dir: str) -> "ray.data.Dataset":
    """t-closeness audit — the third leg of the privacy-release triad
    (k_anonymity_audit gates class SIZE, l_diversity_audit gates
    sensitive-value VARIETY; this gates the sensitive-value
    DISTRIBUTION): with the same quasi-identifiers (nation, $1000
    balance bucket) and market segment as the sensitive attribute, a
    class whose segment mix diverges from the corpus mix leaks
    attribute information even at k ≥ 5 and l ≥ 2 — the skewness
    attack. Per class the exact total-variation distance to the
    global distribution is the integer numerator
    tvd_num = Σ_seg |n_cs·N − g_s·n_c| with t = tvd_num / (2·n_c·N),
    and classes band by t_band = ⌊10·t⌋ = (10·tvd_num) // (2·n_c·N)
    — exact floor arithmetic mirrored verbatim by the oracle. Output
    per band: (t_band, n_classes, n_rows); the high bands are the
    release blockers. Tail-seated by design: l_diversity_audit's fold
    under a distance instead of a distinct count.

    Scale shape: per-batch (QI, seg, n) partials → ONE groupby on
    (QI, seg) → per-class map_groups over its ≤|segments| grid rows
    with the bounded global segment histogram broadcast once (absent
    segments contribute (N − Σ_present g_s)·n_c in closed form, so
    the grid never densifies) → per-batch band partials → a ≤11-row
    band-grid Sum. Rows never shuffle; only grid cells do."""
    import pandas as pd
    from ray.data.aggregate import Sum as _Sum

    path = f"{sf_dir}/customer.parquet"
    ds = ray.data.read_parquet(
        path, columns=["c_nationkey", "c_mktsegment", "c_acctbal"]
    )

    def qi_seg_partials(batch: pa.Table) -> pa.Table:
        nk, bucket, seg = _kanon_qi(batch, with_segment=True)
        g = (
            pd.DataFrame({"nk": nk, "b": bucket, "seg": seg, "n": 1})
            .groupby(["nk", "b", "seg"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "nk": pa.array(g["nk"].to_numpy(), pa.int64()),
                "b": pa.array(g["b"].to_numpy(), pa.int64()),
                "seg": pa.array(g["seg"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(qi_seg_partials, batch_format="pyarrow")
        .groupby(["nk", "b", "seg"])
        .aggregate(_Sum("n", alias_name="n"))
    )

    # bounded global segment histogram (<= #segments rows)
    def seg_partials(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["c_mktsegment"])
            .group_by("c_mktsegment")
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "seg": g.column("c_mktsegment"),
                "g": g.column("count_all").cast(pa.int64()),
            }
        )

    seg_rows = (
        ray.data.read_parquet(path, columns=["c_mktsegment"])
        .map_batches(seg_partials, batch_format="pyarrow")
        .groupby("seg")
        .aggregate(_Sum("g", alias_name="g"))
        .take_all()
    )
    ghist = {r["seg"]: int(r["g"]) for r in seg_rows}
    n_all = sum(ghist.values())
    bcast = ray.put(ghist)

    def per_class(group: pa.Table) -> pa.Table:
        gh = ray.get(bcast)
        segs = group.column("seg").to_pylist()
        n = group.column("n").to_numpy(zero_copy_only=False)
        n_c = int(n.sum())
        gvec = np.array([gh[s] for s in segs], dtype=np.int64)
        present_g = int(gvec.sum())
        tvd = int(np.abs(n * n_all - gvec * n_c).sum()) + (
            n_all - present_g
        ) * n_c
        band = (10 * tvd) // (2 * n_c * n_all)
        return pa.table(
            {
                "t_band": pa.array([band], pa.int64()),
                "n_classes": pa.array([1], pa.int64()),
                "n_rows": pa.array([n_c], pa.int64()),
            }
        )

    return (
        grid.groupby(["nk", "b"])
        .map_groups(per_class, batch_format="pyarrow")
        .groupby("t_band")
        .aggregate(
            _Sum("n_classes", alias_name="n_classes"),
            _Sum("n_rows", alias_name="n_rows"),
        )
    )


SPEAR_BUCKETS = 256  # key-range buckets per axis for the rank passes


def spearman_corr(sf_dir: str) -> "pd.DataFrame":
    """Exact Spearman rank-correlation sufficient statistics between
    an order's price and its customer's account balance — the
    rank-scale companion to corr_moments' Pearson co-moments (Pearson
    moves with outliers and nonlinearity; Spearman is the monotone-
    association readout feature audits want on heavy-tailed money
    columns). Ties are exact through DOUBLE ranks (d = 2L + t + 1,
    integer; mann_whitney_u's convention), and the output is the one
    row of integer sufficient statistics (n, sx, sy, sxy, sxx, syy)
    from which rho = (n·sxy − sx·sy)/√((n·sxx − sx²)(n·syy − sy²)) is
    exact rational arithmetic downstream. int64 headroom: a cross
    term is ≤ (2n)², summed n times → safe through ~10^6 pairs; past
    that the partial splits into (hi, lo) lanes like gini_sources
    documents.

    Scale shape: the (x, y) pair table assembles via ONE
    co-partitioned union join on custkey (customer y-rows and order
    x-rows tagged into the same groupby(custkey) — never a broadcast
    of the customer table), then each axis gets one bucket-grid
    double-rank exchange (bounded SPEAR_BUCKETS count grid to the
    driver, prefix bases broadcast, groupby(kb) bucket-local
    np.unique — equal keys share a bucket, so tie groups never
    straddle bases), and per-batch moment partials fold to the single
    output row. Three exchanges total; money is integer cents
    before anything sums."""
    from ray.data.aggregate import Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def cust_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": batch.column("c_custkey").cast(pa.int64()),
                "v": _cents(batch.column("c_acctbal")),
                "side": pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()
                ),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": batch.column("o_custkey").cast(pa.int64()),
                "v": _cents(batch.column("o_totalprice")),
                "side": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )

    tagged = cust.map_batches(cust_side, batch_format="pyarrow").union(
        orders.map_batches(order_side, batch_format="pyarrow")
    )

    def attach(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        ys = v[side == 0]
        if len(ys) == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        y = int(ys[0])
        x = v[side == 1]
        return pa.table(
            {
                "x": pa.array(x, pa.int64()),
                "y": pa.array(np.full(len(x), y, np.int64), pa.int64()),
            }
        )

    pairs = tagged.groupby("custkey").map_groups(
        attach, batch_format="pyarrow"
    ).materialize()

    # Width-1 escape (the kendall_tau discipline): below the cap the
    # two rank exchanges are pure fixed cost — one vectorized task.
    if pairs.count() < KT_LOCAL_MAX:
        def _spear_local(tbl: pa.Table) -> pa.Table:
            x = tbl.column("x").to_numpy(zero_copy_only=False)
            y = tbl.column("y").to_numpy(zero_copy_only=False)

            def dr(v):
                _, inv, cnt = np.unique(
                    v, return_inverse=True, return_counts=True
                )
                before = np.concatenate(([0], np.cumsum(cnt)[:-1]))
                return (2 * before + cnt + 1)[inv]

            dx, dy = dr(x), dr(y)
            return pa.table(
                {
                    "n": pa.array([len(dx)], pa.int64()),
                    "sx": pa.array([int(dx.sum())], pa.int64()),
                    "sy": pa.array([int(dy.sum())], pa.int64()),
                    "sxy": pa.array([int((dx * dy).sum())], pa.int64()),
                    "sxx": pa.array([int((dx * dx).sum())], pa.int64()),
                    "syy": pa.array([int((dy * dy).sum())], pa.int64()),
                }
            )

        import pandas as pd

        local = pairs.repartition(1).map_batches(
            _spear_local, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        for c in local.columns:
            local[c] = local[c].astype("int64")
        return local[["n", "sx", "sy", "sxy", "sxx", "syy"]]

    def rank_axis(dset, col: str, out: str):
        lohi = dset.aggregate(Min(col), Max(col))
        lo, hi = int(lohi[f"min({col})"]), int(lohi[f"max({col})"])
        width = (hi - lo) // SPEAR_BUCKETS + 1

        def keyed(batch: pa.Table) -> pa.Table:
            k = batch.column(col).to_numpy(zero_copy_only=False)
            return batch.append_column(
                "_kb", pa.array((k - lo) // width, pa.int64())
            )

        rows = dset.map_batches(keyed, batch_format="pyarrow")

        def kb_partial(batch: pa.Table) -> pa.Table:
            u, cnt = np.unique(
                batch.column("_kb").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table(
                {
                    "kb": pa.array(u, pa.int64()),
                    "n": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        g = (
            rows.map_batches(kb_partial, batch_format="pyarrow")
            .groupby("kb")
            .aggregate(_Sum("n", alias_name="n"))
            .take_all()  # bounded: <= SPEAR_BUCKETS rows
        )
        counts = np.zeros(SPEAR_BUCKETS, dtype=np.int64)
        for r in g:
            counts[int(r["kb"])] = int(r["n"])
        base = np.concatenate(([0], np.cumsum(counts)[:-1]))
        bcast = ray.put(base)

        def rank_part(group: pa.Table) -> pa.Table:
            pre = ray.get(bcast)
            kb = int(group.column("_kb")[0].as_py())
            k = group.column(col).to_numpy(zero_copy_only=False)
            uniq, inv, cnt = np.unique(
                k, return_inverse=True, return_counts=True
            )
            before = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            d = (2 * (pre[kb] + before) + cnt + 1)[inv]
            return group.drop_columns(["_kb"]).append_column(
                out, pa.array(d, pa.int64())
            )

        return rows.groupby("_kb").map_groups(rank_part, batch_format="pyarrow")

    ranked = rank_axis(rank_axis(pairs, "x", "dx"), "y", "dy")

    def moment_partials(batch: pa.Table) -> pa.Table:
        dx = batch.column("dx").to_numpy(zero_copy_only=False)
        dy = batch.column("dy").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(dx)], pa.int64()),
                "sx": pa.array([int(dx.sum())], pa.int64()),
                "sy": pa.array([int(dy.sum())], pa.int64()),
                "sxy": pa.array([int((dx * dy).sum())], pa.int64()),
                "sxx": pa.array([int((dx * dx).sum())], pa.int64()),
                "syy": pa.array([int((dy * dy).sum())], pa.int64()),
            }
        )

    folded = ranked.map_batches(
        moment_partials, batch_format="pyarrow"
    ).aggregate(
        _Sum("n", alias_name="n"),
        _Sum("sx", alias_name="sx"),
        _Sum("sy", alias_name="sy"),
        _Sum("sxy", alias_name="sxy"),
        _Sum("sxx", alias_name="sxx"),
        _Sum("syy", alias_name="syy"),
    )
    import pandas as pd

    return pd.DataFrame([{k: int(v) for k, v in folded.items()}])[
        ["n", "sx", "sy", "sxy", "sxx", "syy"]
    ]


def _inv_count(y: "np.ndarray") -> int:
    """Exact inversion count — #pairs i<j with y[i] > y[j] — via
    bottom-up vectorized merge counting: O(log n) numpy passes
    (sort-within-blocks + one global searchsorted per level), never a
    per-row Python loop. Values are densified to ranks so the
    block-offset trick (each block shifted into its own disjoint key
    range, making the concatenated left halves globally sorted for
    ONE searchsorted) stays inside int64; the array pads to a power
    of two with a sentinel LARGER than every rank appended at the
    end, which can never form an inversion (pads always remain a
    global suffix at block granularity, so a left half holds pads
    only when its right half is all pads)."""
    n = len(y)
    if n < 2:
        return 0
    _, r = np.unique(y, return_inverse=True)
    a = r.astype(np.int64)
    m = 1 << int(np.ceil(np.log2(n)))
    big = np.int64(n + 1)
    if m > n:
        a = np.concatenate([a, np.full(m - n, big, np.int64)])
    inv = 0
    width = 1
    idx = np.arange(m)
    while width < m:
        nb2 = 2 * width
        blk = idx // nb2
        keyed = a + blk * (big + 2)
        lmask = (idx % nb2) < width
        cnt_le = np.searchsorted(keyed[lmask], keyed[~lmask], side="right")
        rstart = (idx[~lmask] // nb2) * width
        inv += int((width - (cnt_le - rstart)).sum())
        a = np.sort(a.reshape(-1, nb2), axis=1).ravel()
        width = nb2
    return inv


def _flagged_inv_count(v: "np.ndarray", f: "np.ndarray") -> int:
    """Left-flagged inversion count — #pairs i<j with v[i] > v[j] AND
    f[i] == 1 — the asymmetric variant `harrell_c_index` needs (the
    flag marks an observed event on the earlier element). Same
    bottom-up vectorized merge as `_inv_count`, with a cumulative
    flag prefix over each sorted left half: flagged-greater-than =
    block flagged total − flagged ≤, both read off one global cumsum
    after the same single searchsorted per level; flags travel with
    values through the per-block stable argsort. Pads carry flag 0
    and the max sentinel, so they contribute nothing on either
    side."""
    n = len(v)
    if n < 2:
        return 0
    _, r = np.unique(v, return_inverse=True)
    a = r.astype(np.int64)
    fl = f.astype(np.int64)
    m = 1 << int(np.ceil(np.log2(n)))
    big = np.int64(n + 1)
    if m > n:
        a = np.concatenate([a, np.full(m - n, big, np.int64)])
        fl = np.concatenate([fl, np.zeros(m - n, np.int64)])
    inv = 0
    width = 1
    idx = np.arange(m)
    while width < m:
        nb2 = 2 * width
        blk = idx // nb2
        keyed = a + blk * (big + 2)
        lmask = (idx % nb2) < width
        pos = np.searchsorted(keyed[lmask], keyed[~lmask], side="right")
        pre = np.concatenate(([0], np.cumsum(fl[lmask])))
        rstart = (idx[~lmask] // nb2) * width
        inv += int((pre[rstart + width] - pre[pos]).sum())
        order = np.argsort(a.reshape(-1, nb2), axis=1, kind="stable")
        a = np.take_along_axis(a.reshape(-1, nb2), order, 1).ravel()
        fl = np.take_along_axis(fl.reshape(-1, nb2), order, 1).ravel()
        width = nb2
    return inv


KT_BUCKETS = 128  # per-axis grid for the Kendall discordant exchanges
KT_LOCAL_MAX = 2_000_000  # pair rows below which kendall runs width-1


def _kt_local(tbl: "pa.Table") -> "pa.Table":
    """All Kendall sufficient statistics over the whole pair table in
    one vectorized task — the width-1 leg of kendall_tau's
    size-adaptive plan (below ~2M slim int64 rows the grid plan's
    exchanges are pure fixed cost). Identical semantics: D =
    `_inv_count` of y under (x, y) sort, tie counts from np.unique."""
    x = tbl.column("x").to_numpy(zero_copy_only=False)
    y = tbl.column("y").to_numpy(zero_copy_only=False)
    order = np.lexsort((y, x))
    disc = _inv_count(y[order])
    _, xc = np.unique(x, return_counts=True)
    _, yc = np.unique(y, return_counts=True)
    _, xr = np.unique(x, return_inverse=True)
    _, yr = np.unique(y, return_inverse=True)
    _, jc = np.unique(
        xr.astype(np.int64) * (np.int64(yr.max()) + 1) + yr,
        return_counts=True,
    ) if len(x) else (None, np.array([], np.int64))
    n1 = int((xc.astype(np.int64) * (xc - 1) // 2).sum())
    n2 = int((yc.astype(np.int64) * (yc - 1) // 2).sum())
    n3 = int((jc.astype(np.int64) * (jc - 1) // 2).sum())
    return pa.table(
        {
            "n": pa.array([len(x)], pa.int64()),
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "n3": pa.array([n3], pa.int64()),
            "disc": pa.array([disc], pa.int64()),
        }
    )


def kendall_tau(sf_dir: str) -> "pd.DataFrame":
    """Exact Kendall tau-b sufficient statistics between an order's
    price and its customer's account balance (the mod-4 deterministic
    o_orderkey sample keeps the quadratic oracle honest): ONE integer
    row (n, n1, n2, n3, disc) — pair count, x-tie pairs Σtx(tx−1)/2,
    y-tie pairs, joint-tie pairs, and the exact DISCORDANT pair count
    D — from which tau_b = (S − 2D)/√((n0−n1)(n0−n2)) with
    n0 = n(n−1)/2 and S = n0 − n1 − n2 + n3 is exact rational
    arithmetic downstream. Spearman (rank Pearson) and tau-b (pair
    concordance) disagree exactly when association is driven by a few
    long monotone runs — the pair completes the rank-correlation
    readout.

    Scale shape: D is an inversion count of y under (x, y) sort,
    decomposed exactly over a 2-axis value grid (equal values share a
    bucket on each axis, the SPEAR_BUCKETS discipline): (a) pairs in
    the SAME x-bucket — per-bucket `_inv_count` of y under local
    (x, y) sort, O(b log b) numpy, plus exact x-tie/joint-tie partials
    from the same np.unique; (b) pairs in DIFFERENT x-buckets AND
    different y-cells — read off the bounded KT_BUCKETS² count grid
    (one tiny fold, 2D prefix arithmetic on the driver, E matrix
    broadcast once via ray.put); (c) pairs in different x-buckets but
    the SAME y-cell — per-y-cell `_inv_count` of y under (xb, y) sort
    (same-xb pairs sort y-ascending and contribute zero), which also
    yields the exact y-tie partials. Three int64-only exchanges past
    the co-partitioned spearman union join; the slim 4-column pair
    table is materialized once and feeds all three passes. int64
    headroom: disc ≤ n²/2 — safe through ~10⁹ pairs, then split lanes
    as gini_sources documents."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def cust_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": batch.column("c_custkey").cast(pa.int64()),
                "v": _cents(batch.column("c_acctbal")),
                "side": pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()
                ),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        keep = pc.equal(
            pc.bit_wise_and(batch.column("o_orderkey").cast(pa.int64()), 3), 0
        )
        batch = batch.filter(keep)
        return pa.table(
            {
                "custkey": batch.column("o_custkey").cast(pa.int64()),
                "v": _cents(batch.column("o_totalprice")),
                "side": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )

    tagged = cust.map_batches(cust_side, batch_format="pyarrow").union(
        orders.map_batches(order_side, batch_format="pyarrow")
    )

    def attach(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        ys = v[side == 0]
        x = v[side == 1]
        if len(ys) == 0 or len(x) == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        y = int(ys[0])
        return pa.table(
            {
                "x": pa.array(x, pa.int64()),
                "y": pa.array(np.full(len(x), y, np.int64), pa.int64()),
            }
        )

    pairs = tagged.groupby("custkey").map_groups(
        attach, batch_format="pyarrow"
    ).materialize()

    # Width-1 escape: below KT_LOCAL_MAX slim pair rows the grid
    # plan's three exchanges are pure fixed cost — one task.
    if pairs.count() < KT_LOCAL_MAX:
        local = pairs.repartition(1).map_batches(
            _kt_local, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        for c in local.columns:
            local[c] = local[c].astype("int64")
        return local[["n", "n1", "n2", "n3", "disc"]]

    lohi = pairs.aggregate(Min("x"), Max("x"), Min("y"), Max("y"))
    xlo, xhi = int(lohi["min(x)"]), int(lohi["max(x)"])
    ylo, yhi = int(lohi["min(y)"]), int(lohi["max(y)"])
    wx = (xhi - xlo) // KT_BUCKETS + 1
    wy = (yhi - ylo) // KT_BUCKETS + 1

    def add_cells(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "x": batch.column("x"),
                "y": batch.column("y"),
                "xb": pa.array((x - xlo) // wx, pa.int64()),
                "yc": pa.array((y - ylo) // wy, pa.int64()),
            }
        )

    keyed = pairs.map_batches(add_cells, batch_format="pyarrow").materialize()

    # bounded KT_BUCKETS^2 count grid -> driver 2D prefix arithmetic
    def cell_partial(batch: pa.Table) -> pa.Table:
        xb = batch.column("xb").to_numpy(zero_copy_only=False)
        yc = batch.column("yc").to_numpy(zero_copy_only=False)
        u, cnt = np.unique(xb * KT_BUCKETS + yc, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    grid_rows = (
        keyed.map_batches(cell_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= KT_BUCKETS^2 rows
    )
    C = np.zeros((KT_BUCKETS, KT_BUCKETS), np.int64)
    for r in grid_rows:
        C[int(r["cell"]) // KT_BUCKETS, int(r["cell"]) % KT_BUCKETS] = int(
            r["n"]
        )
    # P[xb, yc] = rows in x-buckets < xb at y-cell yc
    P = np.vstack([np.zeros((1, KT_BUCKETS), np.int64), np.cumsum(C, 0)[:-1]])
    # E[xb, yc] = rows in x-buckets < xb with y-cell > yc
    E = np.cumsum(P[:, ::-1], 1)[:, ::-1]
    E = np.hstack([E[:, 1:], np.zeros((KT_BUCKETS, 1), np.int64)])
    e_ref = ray.put(E)

    def xb_stats(group: pa.Table) -> pa.Table:
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        yc = group.column("yc").to_numpy(zero_copy_only=False)
        xb = int(group.column("xb")[0].as_py())
        order = np.lexsort((y, x))
        inv = _inv_count(y[order])
        _, xcnt = np.unique(x, return_counts=True)
        n1 = int((xcnt * (xcnt - 1) // 2).sum())
        _, xr = np.unique(x, return_inverse=True)
        _, yr = np.unique(y, return_inverse=True)
        _, jcnt = np.unique(
            xr.astype(np.int64) * (yr.max() + 1) + yr, return_counts=True
        )
        n3 = int((jcnt * (jcnt - 1) // 2).sum())
        cross = int(ray.get(e_ref)[xb][yc].sum())
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "n1": pa.array([n1], pa.int64()),
                "n2": pa.array([0], pa.int64()),
                "n3": pa.array([n3], pa.int64()),
                "disc": pa.array([inv + cross], pa.int64()),
            }
        )

    def yc_stats(group: pa.Table) -> pa.Table:
        y = group.column("y").to_numpy(zero_copy_only=False)
        xb = group.column("xb").to_numpy(zero_copy_only=False)
        order = np.lexsort((y, xb))
        inv = _inv_count(y[order])
        _, ycnt = np.unique(y, return_counts=True)
        n2 = int((ycnt * (ycnt - 1) // 2).sum())
        return pa.table(
            {
                "n": pa.array([0], pa.int64()),
                "n1": pa.array([0], pa.int64()),
                "n2": pa.array([n2], pa.int64()),
                "n3": pa.array([0], pa.int64()),
                "disc": pa.array([inv], pa.int64()),
            }
        )

    stats = (
        keyed.groupby("xb")
        .map_groups(xb_stats, batch_format="pyarrow")
        .union(
            keyed.groupby("yc").map_groups(yc_stats, batch_format="pyarrow")
        )
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("n1", alias_name="n1"),
            _Sum("n2", alias_name="n2"),
            _Sum("n3", alias_name="n3"),
            _Sum("disc", alias_name="disc"),
        )
    )
    return pd.DataFrame([{k: int(v) for k, v in stats.items()}])[
        ["n", "n1", "n2", "n3", "disc"]
    ]


WINS_BUCKETS = 256  # value grid for the trimmed-aggregate boundary scan
WINS_TRIM_DEN = 20  # two-sided trim fraction denominator (5% each side)


def winsorized_stats(sf_dir: str) -> "pd.DataFrame":
    """Exact two-sided 5%-trimmed aggregates of order value per
    priority class — the robust-location leg beyond mad_outliers
    (MAD flags rows; this produces the outlier-insensitive aggregate
    a pricing dashboard actually reports): per o_orderpriority, with
    k = n//20 rows trimmed from EACH end of the exact cents order,
    the row (priority, n, trim_k, kept_n, kept_sum_cents). The kept
    SUM is tie-break-invariant (dropping either of two equal values
    changes nothing), so the semantics are purely multiset order
    statistics — exact, no quantile interpolation.

    Scale shape (distributed exact order statistics, the
    global_quantiles boundary-refinement discipline generalized to
    per-group two-sided trims): ONE bounded fold builds the
    (priority, value-bucket) count grid (≤ 5·WINS_BUCKETS rows to
    the driver — equal values share a bucket, so a trim boundary
    falls in exactly one bucket per side); the driver locates each
    group's lower/upper boundary bucket and the within-bucket drop
    counts, broadcast once. The second pass streams: rows in fully-
    kept buckets fold as per-batch (n, sum) partials, rows in the
    ≤ 2 boundary buckets per group co-partition on (group, bucket)
    where a local value sort drops exactly the m smallest / largest
    cents — never a global sort, never a per-group shuffle of
    non-boundary rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def keyed_rows(batch: pa.Table) -> pa.Table:
        v = _cents(batch.column("o_totalprice")).to_numpy(zero_copy_only=False)
        pcode = pc.utf8_slice_codeunits(
            batch.column("o_orderpriority"), 0, 1
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p": pa.array(pcode, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "prio": batch.column("o_orderpriority"),
            }
        )

    rows = ds.map_batches(keyed_rows, batch_format="pyarrow").materialize()

    lohi = rows.aggregate(Min("v"), Max("v"))
    vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
    wv = (vhi - vlo) // WINS_BUCKETS + 1

    def grid_partial(batch: pa.Table) -> pa.Table:
        p = batch.column("p").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        cell = p * WINS_BUCKETS + (v - vlo) // wv
        u, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    grid = (
        rows.map_batches(grid_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= n_priorities * WINS_BUCKETS rows
    )
    counts: dict[int, np.ndarray] = {}
    for r in grid:
        pcode, vb = int(r["cell"]) // WINS_BUCKETS, int(r["cell"]) % WINS_BUCKETS
        counts.setdefault(pcode, np.zeros(WINS_BUCKETS, np.int64))[vb] = int(
            r["n"]
        )
    # per group: boundary buckets + within-bucket drop counts
    plan: dict[int, tuple[int, int, int, int, int, int]] = {}
    for pcode, c in counts.items():
        n = int(c.sum())
        k = n // WINS_TRIM_DEN
        cum = np.cumsum(c)
        lo_b = int(np.searchsorted(cum, k, side="left")) if k else -1
        m_lo = k - int(cum[lo_b - 1] if lo_b > 0 else 0) if k else 0
        cum_hi = np.cumsum(c[::-1])
        hi_rb = int(np.searchsorted(cum_hi, k, side="left")) if k else -1
        hi_b = WINS_BUCKETS - 1 - hi_rb if k else WINS_BUCKETS
        m_hi = (
            k - int(cum_hi[hi_rb - 1] if hi_rb > 0 else 0) if k else 0
        )
        plan[pcode] = (n, k, lo_b, m_lo, hi_b, m_hi)
    plan_ref = ray.put(plan)

    def classify(batch: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        p = batch.column("p").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        vb = (v - vlo) // wv
        lo_b = np.array([pl[int(x)][2] for x in p], np.int64)
        hi_b = np.array([pl[int(x)][4] for x in p], np.int64)
        inner = (vb > lo_b) & (vb < hi_b)
        boundary = (vb == lo_b) | (vb == hi_b)
        # inner partials per group
        ip, iv = p[inner], v[inner]
        u, inv = np.unique(ip, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, iv)
        cnt = np.bincount(inv).astype(np.int64)
        inner_tbl = pa.table(
            {
                "p": pa.array(u, pa.int64()),
                "kept_n": pa.array(cnt, pa.int64()),
                "kept_sum": pa.array(s, pa.int64()),
                "bkey": pa.array(np.full(len(u), -1, np.int64), pa.int64()),
                "v": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            }
        )
        bp, bv = p[boundary], v[boundary]
        bvb = (bv - vlo) // wv
        bound_tbl = pa.table(
            {
                "p": pa.array(bp, pa.int64()),
                "kept_n": pa.array(np.zeros(len(bp), np.int64), pa.int64()),
                "kept_sum": pa.array(np.zeros(len(bp), np.int64), pa.int64()),
                "bkey": pa.array(bp * WINS_BUCKETS + bvb, pa.int64()),
                "v": pa.array(bv, pa.int64()),
            }
        )
        return pa.concat_tables([inner_tbl, bound_tbl])

    def boundary_trim(group: pa.Table) -> pa.Table:
        bkey = int(group.column("bkey")[0].as_py())
        if bkey < 0:  # inner partials pass through, pre-folded per batch
            t = (
                group.select(["p", "kept_n", "kept_sum"])
                .group_by("p")
                .aggregate([("kept_n", "sum"), ("kept_sum", "sum")])
            )
            return pa.table(
                {
                    "p": t.column("p"),
                    "kept_n": t.column("kept_n_sum"),
                    "kept_sum": t.column("kept_sum_sum"),
                }
            )
        pl = ray.get(plan_ref)
        pcode = bkey // WINS_BUCKETS
        vb = bkey % WINS_BUCKETS
        _, _, lo_b, m_lo, hi_b, m_hi = pl[pcode]
        v = np.sort(group.column("v").to_numpy(zero_copy_only=False))
        drop_lo = m_lo if vb == lo_b else 0
        drop_hi = m_hi if vb == hi_b else 0
        kept = v[drop_lo: len(v) - drop_hi]
        return pa.table(
            {
                "p": pa.array([pcode], pa.int64()),
                "kept_n": pa.array([len(kept)], pa.int64()),
                "kept_sum": pa.array([int(kept.sum())], pa.int64()),
            }
        )

    folded = (
        rows.map_batches(classify, batch_format="pyarrow")
        .groupby("bkey")
        .map_groups(boundary_trim, batch_format="pyarrow")
        .groupby("p")
        .aggregate(
            _Sum("kept_n", alias_name="kept_n"),
            _Sum("kept_sum", alias_name="kept_sum_cents"),
        )
        .take_all()  # bounded: one row per priority class
    )
    prio_name = {
        int(r["p"]): None for r in folded
    }
    # recover the display string from a bounded distinct scan
    names = (
        rows.map_batches(
            lambda b: pa.table(
                {
                    "p": b.column("p"),
                    "prio": b.column("prio"),
                }
            ).group_by(["p", "prio"]).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby("p")
        .map_groups(
            lambda g: g.slice(0, 1),
            batch_format="pyarrow",
        )
        .take_all()
    )
    for r in names:
        prio_name[int(r["p"])] = r["prio"]
    out = []
    for r in folded:
        pcode = int(r["p"])
        n, k, *_ = plan[pcode]
        out.append(
            {
                "priority": prio_name[pcode],
                "n": n,
                "trim_k": k,
                "kept_n": int(r["kept_n"]),
                "kept_sum_cents": int(r["kept_sum_cents"]),
            }
        )
    return (
        pd.DataFrame(out)
        .sort_values("priority", ignore_index=True)[
            ["priority", "n", "trim_k", "kept_n", "kept_sum_cents"]
        ]
    )


def mann_kendall_trend(sf_dir: str) -> "pd.DataFrame":
    """Exact Mann-Kendall trend test per event type over the daily
    count series — the NONPARAMETRIC monotone-trend detector
    (monitoring's standard "is this metric drifting" test) that
    trend_slopes' least-squares slope is not: S = Σ_{i<j}
    sign(x_j − x_i) is outlier-immune and needs no linearity. Output
    per type: (event_type, n_days, s_stat, tie_term) with
    tie_term = Σ_g t_g(t_g−1)(2t_g+5), so
    Var(S) = (n(n−1)(2n+5) − tie_term)/18 and the z-statistic are
    exact rational arithmetic downstream.

    Scale shape: one combiner-bounded fold to per-(type, day) counts
    (≤ |types|·day-span rows — days, not events, cross the
    exchange), then per-type map_groups over its bounded series
    computes S WITHOUT the quadratic pair scan: with
    P = n(n−1)/2 total pairs, T tie pairs, and D = `_inv_count`
    (strict decreases) over the day-ordered series,
    S = P − T − 2D — the merge-sort counter again, O(n log n) per
    type."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        et = batch.column("event_type")
        t = pa.table({"event_type": et, "day": pa.array(d, pa.int64())})
        g = t.group_by(["event_type", "day"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "day": g.column("day"),
                "x": g.column("count_all").cast(pa.int64()),
            }
        )

    def per_type(group: pa.Table) -> pa.Table:
        et = group.column("event_type")[0].as_py()
        day = group.column("day").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        order = np.argsort(day, kind="stable")
        xs = x[order]
        n = len(xs)
        p_total = n * (n - 1) // 2
        _, cnt = np.unique(xs, return_counts=True)
        c = cnt.astype(np.int64)
        t_pairs = int((c * (c - 1) // 2).sum())
        dcr = _inv_count(xs)
        s = p_total - t_pairs - 2 * dcr
        tie_term = int((c * (c - 1) * (2 * c + 5)).sum())
        return pa.table(
            {
                "event_type": pa.array([et], pa.string()),
                "n_days": pa.array([n], pa.int64()),
                "s_stat": pa.array([s], pa.int64()),
                "tie_term": pa.array([tie_term], pa.int64()),
            }
        )

    rows = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(_Sum("x", alias_name="x"))
        .groupby("event_type")
        .map_groups(per_type, batch_format="pyarrow")
        .take_all()  # bounded: one row per event type
    )
    df = pd.DataFrame(rows).sort_values("event_type", ignore_index=True)
    for c in ["n_days", "s_stat", "tie_term"]:
        df[c] = df[c].astype("int64")
    return df[["event_type", "n_days", "s_stat", "tie_term"]]


CP_SCALE = 1_000_000  # banding scale for the changepoint score


def changepoint_split(sf_dir: str) -> "pd.DataFrame":
    """Exact single-changepoint detection (binary segmentation, first
    split) per event type over the daily count series — the
    level-shift locator cusum_drift's sequential statistic is not:
    for every candidate boundary s the between-segment sum-of-squares
    gain is proportional to (n_r·S_l − n_l·S_r)² / (n_l·n_r), and the
    reported statistic is the BANDED integer
    score = ⌊num²·CP_SCALE / (n_l·n_r)⌋ (the t_closeness flooring
    discipline: the scaled floor IS the defined statistic, mirrored
    verbatim by the oracle's HUGEINT arithmetic, so no float and no
    rational comparison ambiguity exists). Output per type:
    (event_type, n_days, split_day, score_scaled) with split_day =
    last day of the left segment, ties broken toward the earliest
    day. A zero score means the series is flat; a dominant score at
    the same day across types localizes a global regime change.

    Scale shape: one combiner-bounded fold to per-(type, day) counts
    (days, not events, cross the exchange), then per-type map_groups
    over its bounded series: prefix sums once, then the candidate
    scan runs in PYTHON INTS over at most day-span candidates —
    bounded by the calendar, not the data — because num² · CP_SCALE
    overflows int64 by design (the oracle needs HUGEINT for the same
    reason)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        t = pa.table(
            {"event_type": batch.column("event_type"),
             "day": pa.array(d, pa.int64())}
        )
        g = t.group_by(["event_type", "day"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "day": g.column("day"),
                "x": g.column("count_all").cast(pa.int64()),
            }
        )

    def per_type(group: pa.Table) -> pa.Table:
        et = group.column("event_type")[0].as_py()
        day = group.column("day").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        order = np.argsort(day, kind="stable")
        days, xs = day[order], x[order]
        n = len(xs)
        if n < 2:  # no candidate boundary; mirror the oracle's rn < n
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_days": pa.array([], pa.int64()),
                    "split_day": pa.array([], pa.int64()),
                    "score_scaled": pa.array([], pa.string()),
                }
            )
        total = int(xs.sum())
        best_score, best_day = -1, -1
        run = 0
        for i in range(n - 1):  # bounded by the day span, not rows
            run += int(xs[i])
            nl, nr = i + 1, n - i - 1
            num = nr * run - nl * (total - run)
            score = (num * num * CP_SCALE) // (nl * nr)
            if score > best_score:
                best_score, best_day = score, int(days[i])
        return pa.table(
            {
                "event_type": pa.array([et], pa.string()),
                "n_days": pa.array([n], pa.int64()),
                "split_day": pa.array([best_day], pa.int64()),
                "score_scaled": pa.array([str(best_score)], pa.string()),
            }
        )

    rows = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(_Sum("x", alias_name="x"))
        .groupby("event_type")
        .map_groups(per_type, batch_format="pyarrow")
        .take_all()  # bounded: one row per event type
    )
    df = pd.DataFrame(rows).sort_values("event_type", ignore_index=True)
    df["n_days"] = df["n_days"].astype("int64")
    df["split_day"] = df["split_day"].astype("int64")
    df["score_scaled"] = df["score_scaled"].astype(str)
    return df[["event_type", "n_days", "split_day", "score_scaled"]]


def selectivity_drift(sf_dir: str) -> "pd.DataFrame":
    """Correlated-predicate audit — the optimizer-statistics readout
    behind the classic cardinality-misestimation failure: for every
    pair of the four canonical lineitem predicates (returnflag 'R',
    discount ≥ 5 %, quantity ≥ 25, linestatus 'F'), the exact joint
    count vs the independence assumption, as
    ratio_bp = ⌊10000·n_ab·n / (n_a·n_b)⌋ — 10000 means independent,
    ≫ 10000 positively correlated (the optimizer UNDERestimates the
    conjunction), ≪ 10000 anticorrelated. Output one row per
    unordered pair: (pred_a, pred_b, n, n_a, n_b, n_ab, ratio_bp).
    This is the table a join_strategy_plan-style planner consults
    before multiplying selectivities.

    Scale shape: one streaming pass — per batch the four boolean
    flags vectorize and the 4 single + 6 pairwise counts fold as a
    15-integer row; Sum-fold to one row, driver expands to the six
    output rows. No shuffle at all."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    PREDS = ["disc_hi", "qty_hi", "ret_r", "status_f"]
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_discount", "l_quantity"],
    )

    def flags(batch: pa.Table) -> pa.Table:
        ret = pc.equal(batch.column("l_returnflag"), "R").to_numpy(
            zero_copy_only=False
        )
        st = pc.equal(batch.column("l_linestatus"), "F").to_numpy(
            zero_copy_only=False
        )
        disc = np.floor(
            batch.column("l_discount").to_numpy(zero_copy_only=False) * 100
            + 0.5
        ) >= 5
        qty = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False) + 0.5
        ) >= 25
        f = {"disc_hi": disc, "qty_hi": qty, "ret_r": ret, "status_f": st}
        cols = {"n": pa.array([batch.num_rows], pa.int64())}
        for p in PREDS:
            cols[f"n_{p}"] = pa.array([int(f[p].sum())], pa.int64())
        for i, pi in enumerate(PREDS):
            for pj in PREDS[i + 1:]:
                cols[f"n_{pi}__{pj}"] = pa.array(
                    [int((f[pi] & f[pj]).sum())], pa.int64()
                )
        return pa.table(cols)

    aggs = [_Sum("n", alias_name="n")]
    for p in PREDS:
        aggs.append(_Sum(f"n_{p}", alias_name=f"n_{p}"))
    for i, pi in enumerate(PREDS):
        for pj in PREDS[i + 1:]:
            aggs.append(_Sum(f"n_{pi}__{pj}", alias_name=f"n_{pi}__{pj}"))
    folded = ds.map_batches(flags, batch_format="pyarrow").aggregate(*aggs)
    n = int(folded["n"])
    out = []
    for i, pi in enumerate(PREDS):
        for pj in PREDS[i + 1:]:
            na, nb = int(folded[f"n_{pi}"]), int(folded[f"n_{pj}"])
            nab = int(folded[f"n_{pi}__{pj}"])
            out.append(
                {
                    "pred_a": pi,
                    "pred_b": pj,
                    "n": n,
                    "n_a": na,
                    "n_b": nb,
                    "n_ab": nab,
                    "ratio_bp": (10000 * nab * n) // (na * nb)
                    if na and nb
                    else 0,
                }
            )
    df = pd.DataFrame(out).sort_values(
        ["pred_a", "pred_b"], ignore_index=True
    )
    for c in ["n", "n_a", "n_b", "n_ab", "ratio_bp"]:
        df[c] = df[c].astype("int64")
    return df


CVM_BUCKETS = 256  # value grid for the two-sample CvM pass
CVM_LOCAL_MAX = 2_000_000  # rows below which CvM runs width-1


def _cvm_lanes(m: "np.ndarray", a: "np.ndarray") -> tuple:
    """Σ m·a² decomposed into three int64 lanes with a = q·2²⁰ + r —
    the gini_sources split-lane discipline: a ≤ n1·n2 can reach
    ~5·10⁹, so a² overflows int64; with r < 2²⁰ every lane partial
    (Σm·q², Σm·q·r, Σm·r²) stays comfortably inside int64 and the
    exact total reassembles as 2⁴⁰·L2 + 2²¹·L1 + L0 in Python."""
    aa = np.abs(a)
    q, r = aa >> 20, aa & ((1 << 20) - 1)
    return (
        int((m * q * q).sum()),
        int((m * q * r).sum()),
        int((m * r * r).sum()),
    )


def cramer_von_mises(sf_dir: str) -> "pd.DataFrame":
    """Exact two-sample Cramér-von Mises integer core — urgent
    (1-URGENT) vs non-urgent order values: where ks_drift reads only
    the SUP of the CDF gap, CvM integrates the SQUARED gap over the
    whole pooled sample, T = Σ_{distinct v} m_v·(n₂·C₁(v) −
    n₁·C₂(v))² with inclusive cumulative counts — sensitive to
    distributed small shifts a single-point KS misses. Ties are
    handled at value level (the whole tie group contributes at its
    post-group CDF, deterministically). Output one row:
    (n1, n2, t_stat) with t_stat a decimal string — the classic
    U = T/(n₁n₂n) − (4n₁n₂−1)/(6n) normalization is exact rational
    arithmetic downstream.

    Scale shape: a (value-bucket × group) count grid (equal values
    share a bucket) gives exclusive cumulative bases per bucket
    (bounded fold, broadcast once); each bucket then sorts locally,
    forms per-distinct-value a = n₂C₁ − n₁C₂ (|a| ≤ n₁n₂, int64-
    safe), and folds Σ m·a² through the `_cvm_lanes` three-lane
    split — no HUGEINT ever crosses the exchange; the driver
    reassembles the exact total in Python. Width-1 escape below
    CVM_LOCAL_MAX rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def rows_fn(batch: pa.Table) -> pa.Table:
        g = pc.equal(batch.column("o_orderpriority"), "1-URGENT").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        v = _cents(batch.column("o_totalprice")).to_numpy(zero_copy_only=False)
        return pa.table(
            {"g": pa.array(g, pa.int64()), "v": pa.array(v, pa.int64())}
        )

    rows = ds.map_batches(rows_fn, batch_format="pyarrow").materialize()
    counts = rows.aggregate(_Sum("g", alias_name="n1"))
    n_total = rows.count()
    n1 = int(counts["n1"])
    n2 = n_total - n1

    def lanes_to_row(l2: int, l1: int, l0: int) -> "pd.DataFrame":
        t = (l2 << 40) + (l1 << 21) + l0
        return pd.DataFrame(
            [{"n1": n1, "n2": n2, "t_stat": str(t)}]
        ).astype({"n1": "int64", "n2": "int64", "t_stat": str})

    def local_all(tbl: pa.Table) -> pa.Table:
        g = tbl.column("g").to_numpy(zero_copy_only=False)
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        vs, gs = v[order], g[order]
        uniq, start, m = np.unique(vs, return_index=True, return_counts=True)
        m1 = np.add.reduceat(gs, start)
        c1 = np.cumsum(m1)
        c2 = np.cumsum(m.astype(np.int64) - m1)
        a = n2 * c1 - n1 * c2
        l2, l1, l0 = _cvm_lanes(m.astype(np.int64), a)
        return pa.table(
            {
                "l2": pa.array([l2], pa.int64()),
                "l1": pa.array([l1], pa.int64()),
                "l0": pa.array([l0], pa.int64()),
            }
        )

    if n_total < CVM_LOCAL_MAX:
        out = rows.repartition(1).map_batches(
            local_all, batch_format="pyarrow", batch_size=None
        ).take_all()
        return lanes_to_row(int(out[0]["l2"]), int(out[0]["l1"]),
                            int(out[0]["l0"]))

    lohi = rows.aggregate(Min("v"), Max("v"))
    vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
    wv = (vhi - vlo) // CVM_BUCKETS + 1

    def grid_partial(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        g = batch.column("g").to_numpy(zero_copy_only=False)
        vb = (v - vlo) // wv
        u, inv = np.unique(vb, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        g1 = np.zeros(len(u), np.int64)
        np.add.at(g1, inv, g)
        return pa.table(
            {
                "vb": pa.array(u, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "m1": pa.array(g1, pa.int64()),
            }
        )

    grid = (
        rows.map_batches(grid_partial, batch_format="pyarrow")
        .groupby("vb")
        .aggregate(_Sum("n", alias_name="n"), _Sum("m1", alias_name="m1"))
        .take_all()  # bounded: <= CVM_BUCKETS rows
    )
    cnt1 = np.zeros(CVM_BUCKETS, np.int64)
    cnt2 = np.zeros(CVM_BUCKETS, np.int64)
    for r in grid:
        cnt1[int(r["vb"])] = int(r["m1"])
        cnt2[int(r["vb"])] = int(r["n"]) - int(r["m1"])
    base1 = np.concatenate(([0], np.cumsum(cnt1)[:-1]))
    base2 = np.concatenate(([0], np.cumsum(cnt2)[:-1]))
    b1_ref, b2_ref = ray.put(base1), ray.put(base2)

    def keyed(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "vb", pa.array((v - vlo) // wv, pa.int64())
        )

    def bucket_lanes(group: pa.Table) -> pa.Table:
        vb = int(group.column("vb")[0].as_py())
        g = group.column("g").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        vs, gs = v[order], g[order]
        uniq, start, m = np.unique(vs, return_index=True, return_counts=True)
        m1 = np.add.reduceat(gs, start)
        c1 = ray.get(b1_ref)[vb] + np.cumsum(m1)
        c2 = ray.get(b2_ref)[vb] + np.cumsum(m.astype(np.int64) - m1)
        a = n2 * c1 - n1 * c2
        l2, l1, l0 = _cvm_lanes(m.astype(np.int64), a)
        return pa.table(
            {
                "l2": pa.array([l2], pa.int64()),
                "l1": pa.array([l1], pa.int64()),
                "l0": pa.array([l0], pa.int64()),
            }
        )

    folded = (
        rows.map_batches(keyed, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(bucket_lanes, batch_format="pyarrow")
        .aggregate(
            _Sum("l2", alias_name="l2"),
            _Sum("l1", alias_name="l1"),
            _Sum("l0", alias_name="l0"),
        )
    )
    return lanes_to_row(int(folded["l2"]), int(folded["l1"]),
                        int(folded["l0"]))


def kruskal_wallis(sf_dir: str) -> "pd.DataFrame":
    """Exact Kruskal-Wallis sufficient statistics — the k-sample
    generalization of mann_whitney_u over the five order-priority
    classes on order value: per class the tie-exact double-rank sum
    (d = 2·rank + t − 1, always integer) plus the pooled tie term
    Σ(t³−t), from which H = [12·Σ n_g R̄_g² / (n(n+1)) − 3(n+1)]
    with its tie correction is exact rational arithmetic downstream.
    Output per class: (priority, n_g, d_sum, n_total, tie_term) —
    the last two constant columns ride every row so the statistic
    assembles from any single row subset.

    Scale shape: spearman's single-axis bucket-grid double-rank
    exchange (bounded count grid, broadcast exclusive prefix bases,
    bucket-local np.unique — equal values share a bucket so tie
    groups never straddle bases) with the class label riding each
    row; per-bucket partials fold in a ≤5-row class grid, and the
    tie term folds from the same per-bucket np.unique. int64
    headroom: d ≤ 2n, d_sum ≤ 2n·n_g — safe past 10⁹ rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )

    def rows_fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "priority": batch.column("o_orderpriority"),
                "v": _cents(batch.column("o_totalprice")),
            }
        )

    rows = ds.map_batches(rows_fn, batch_format="pyarrow").materialize()
    n_total = rows.count()

    lohi = rows.aggregate(Min("v"), Max("v"))
    vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
    wv = (vhi - vlo) // SPEAR_BUCKETS + 1

    def keyed(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "vb", pa.array((v - vlo) // wv, pa.int64())
        )

    def vb_partial(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("vb").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {
                "vb": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    g = (
        rows.map_batches(keyed, batch_format="pyarrow")
        .map_batches(vb_partial, batch_format="pyarrow")
        .groupby("vb")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= SPEAR_BUCKETS rows
    )
    counts = np.zeros(SPEAR_BUCKETS, np.int64)
    for r in g:
        counts[int(r["vb"])] = int(r["n"])
    base = np.concatenate(([0], np.cumsum(counts)[:-1]))
    bcast = ray.put(base)

    def rank_part(group: pa.Table) -> pa.Table:
        pre = ray.get(bcast)
        vb = int(group.column("vb")[0].as_py())
        v = group.column("v").to_numpy(zero_copy_only=False)
        prio = group.column("priority").to_pandas().to_numpy(dtype=object)
        uniq, inv, cnt = np.unique(v, return_inverse=True, return_counts=True)
        before = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        d = (2 * (pre[vb] + before) + cnt + 1)[inv]
        c = cnt.astype(np.int64)
        tie = int((c * c * c - c).sum())
        import pandas as pd  # noqa: F811

        gdf = (
            pd.DataFrame({"priority": prio, "d": d})
            .groupby("priority", sort=False)["d"]
            .agg(["count", "sum"])
            .reset_index()
        )
        t = pa.table(
            {
                "priority": pa.array(gdf["priority"], pa.string()),
                "n_g": pa.array(
                    gdf["count"].to_numpy().astype(np.int64), pa.int64()
                ),
                "d_sum": pa.array(
                    gdf["sum"].to_numpy().astype(np.int64), pa.int64()
                ),
                "tie_term": pa.array(
                    np.zeros(len(gdf), np.int64), pa.int64()
                ),
            }
        )
        tie_row = pa.table(
            {
                "priority": pa.array([""], pa.string()),
                "n_g": pa.array([0], pa.int64()),
                "d_sum": pa.array([0], pa.int64()),
                "tie_term": pa.array([tie], pa.int64()),
            }
        )
        return pa.concat_tables([t, tie_row])

    folded = (
        rows.map_batches(keyed, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(rank_part, batch_format="pyarrow")
        .groupby("priority")
        .aggregate(
            _Sum("n_g", alias_name="n_g"),
            _Sum("d_sum", alias_name="d_sum"),
            _Sum("tie_term", alias_name="tie_term"),
        )
        .take_all()  # bounded: <= classes + 1 rows
    )
    tie_term = sum(int(r["tie_term"]) for r in folded)
    out = [
        {
            "priority": r["priority"],
            "n_g": int(r["n_g"]),
            "d_sum": int(r["d_sum"]),
            "n_total": n_total,
            "tie_term": tie_term,
        }
        for r in folded
        if r["priority"] != ""
    ]
    df = pd.DataFrame(out).sort_values("priority", ignore_index=True)
    for c in ["n_g", "d_sum", "n_total", "tie_term"]:
        df[c] = df[c].astype("int64")
    return df[["priority", "n_g", "d_sum", "n_total", "tie_term"]]


VARINT_BUCKETS = 256  # value grid for the sorted-delta cost pass
VARINT_LOCAL_MAX = 2_000_000  # rows below which the audit runs width-1


def _bitlen(u: "np.ndarray") -> "np.ndarray":
    """Exact bit length per element via the shift loop (≤64 numpy
    passes) — float log2 misrounds near powers of two."""
    bl = np.zeros(len(u), np.int64)
    uu = u.copy()
    while (uu > 0).any():
        bl[uu > 0] += 1
        uu = uu >> 1
    return bl


def _varint_bytes(u: "np.ndarray") -> "np.ndarray":
    """LEB128 byte cost per non-negative value: 1 for 0, else
    ⌈bit_length/7⌉."""
    return np.where(u == 0, 1, (_bitlen(u) + 6) // 7)


def _zigzag(v: "np.ndarray") -> "np.ndarray":
    return np.where(v >= 0, 2 * v, -2 * v - 1)


def varint_cost_audit(sf_dir: str) -> "pd.DataFrame":
    """Exact varint encoding cost audit — the integer-column member
    of the storage family (rle/dict/front-coding/zonemap price value
    columns; gorilla prices timestamps; this prices the LEB128
    layouts every Parquet/proto writer chooses between): per column
    (order key, customer key, price cents), the exact byte cost of
    (a) zigzag-varint on raw values and (b) varint on SORTED deltas
    (first value zigzag-encoded, each next value as its non-negative
    delta). delta_bytes ≪ raw_bytes is the signal to sort or
    delta-encode that column. Output: (col, n, raw_bytes,
    delta_bytes).

    Scale shape: raw cost is a pure streaming fold (the bit-length
    shift loop is ≤64 vectorized passes). The sorted-delta cost
    needs NO global sort: a (col, value-bucket) grid fold carries
    each bucket's (count, min, max, within-bucket delta bytes —
    computed from a LOCAL sort inside the co-partitioned bucket
    task), and the driver adds the one BOUNDARY delta per non-empty
    bucket pair from the bounded (min, max) grid — exact total,
    exchanges touch only packed int64 rows. Width-1 escape below
    VARINT_LOCAL_MAX rows per column."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def rows_fn(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        pc_ = _cents(batch.column("o_totalprice")).to_numpy(
            zero_copy_only=False
        )
        n = len(ok)
        return pa.table(
            {
                "col": pa.array(
                    np.repeat(np.array([0, 1, 2], np.int64), n), pa.int64()
                ),
                "v": pa.array(np.concatenate([ck, ok, pc_]), pa.int64()),
            }
        )

    COLS = ["o_custkey", "o_orderkey", "price_cents"]
    rows = ds.map_batches(rows_fn, batch_format="pyarrow").materialize()

    def raw_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("col").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        b = _varint_bytes(_zigzag(v))
        out_n = np.zeros(3, np.int64)
        out_b = np.zeros(3, np.int64)
        np.add.at(out_n, c, 1)
        np.add.at(out_b, c, b)
        return pa.table(
            {
                "col": pa.array(np.arange(3), pa.int64()),
                "n": pa.array(out_n, pa.int64()),
                "raw_bytes": pa.array(out_b, pa.int64()),
            }
        )

    raw = (
        rows.map_batches(raw_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("raw_bytes", alias_name="raw_bytes"),
        )
        .take_all()  # bounded: 3 rows
    )

    def local_delta(tbl: pa.Table) -> pa.Table:
        c = tbl.column("col").to_numpy(zero_copy_only=False)
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        out = np.zeros(3, np.int64)
        for ci in range(3):
            vv = np.sort(v[c == ci])
            if len(vv) == 0:
                continue
            first = int(_varint_bytes(_zigzag(vv[:1]))[0])
            out[ci] = first + int(_varint_bytes(np.diff(vv)).sum())
        return pa.table(
            {
                "col": pa.array(np.arange(3), pa.int64()),
                "delta_bytes": pa.array(out, pa.int64()),
            }
        )

    n_rows = rows.count()
    if n_rows < 3 * VARINT_LOCAL_MAX:
        drows = (
            rows.repartition(1)
            .map_batches(local_delta, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        dmap = {int(r["col"]): int(r["delta_bytes"]) for r in drows}
    else:
        lohi = rows.aggregate(Min("v"), Max("v"))
        vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
        wv = (vhi - vlo) // VARINT_BUCKETS + 1

        def keyed(batch: pa.Table) -> pa.Table:
            v = batch.column("v").to_numpy(zero_copy_only=False)
            c = batch.column("col").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "cell", pa.array(c * VARINT_BUCKETS + (v - vlo) // wv,
                                 pa.int64())
            )

        def bucket_cost(group: pa.Table) -> pa.Table:
            cell = int(group.column("cell")[0].as_py())
            v = np.sort(group.column("v").to_numpy(zero_copy_only=False))
            inner = int(_varint_bytes(np.diff(v)).sum())
            return pa.table(
                {
                    "cell": pa.array([cell], pa.int64()),
                    "inner_bytes": pa.array([inner], pa.int64()),
                    "vmin": pa.array([int(v[0])], pa.int64()),
                    "vmax": pa.array([int(v[-1])], pa.int64()),
                }
            )

        grid = (
            rows.map_batches(keyed, batch_format="pyarrow")
            .groupby("cell")
            .map_groups(bucket_cost, batch_format="pyarrow")
            .take_all()  # bounded: <= 3 * VARINT_BUCKETS rows
        )
        dmap = {}
        per_col: dict[int, list] = {0: [], 1: [], 2: []}
        for r in grid:
            per_col[int(r["cell"]) // VARINT_BUCKETS].append(
                (int(r["cell"]) % VARINT_BUCKETS, int(r["inner_bytes"]),
                 int(r["vmin"]), int(r["vmax"]))
            )
        for ci, cells in per_col.items():
            cells.sort()
            total, prev_max = 0, None
            for _, inner, vmin, vmax in cells:
                total += inner
                if prev_max is None:
                    total += int(
                        _varint_bytes(_zigzag(np.array([vmin], np.int64)))[0]
                    )
                else:
                    total += int(
                        _varint_bytes(np.array([vmin - prev_max],
                                               np.int64))[0]
                    )
                prev_max = vmax
            dmap[ci] = total

    out = []
    for r in raw:
        ci = int(r["col"])
        out.append(
            {
                "col": COLS[ci],
                "n": int(r["n"]),
                "raw_bytes": int(r["raw_bytes"]),
                "delta_bytes": dmap.get(ci, 0),
            }
        )
    df = pd.DataFrame(out).sort_values("col", ignore_index=True)
    for c in ["n", "raw_bytes", "delta_bytes"]:
        df[c] = df[c].astype("int64")
    return df[["col", "n", "raw_bytes", "delta_bytes"]]


def friedman_test(sf_dir: str) -> "pd.DataFrame":
    """Exact Friedman-test sufficient statistics — the repeated-
    measures rank test that completes the nonparametric family
    (mann_whitney_u: 2 independent samples; kruskal_wallis: k
    independent samples; this: k TREATMENTS ranked within each of b
    BLOCKS, so block-level scale differences cancel): blocks =
    customer nations, treatments = order priorities, measurement =
    the block's total order cents per priority. Per treatment the
    double-rank sum (d = 2L + T + 1 within each block, always
    integer) folds across blocks; output per priority:
    (priority, r2_sum, n_blocks, k_treat), from which the Friedman
    chi-square with tie handling is exact rational arithmetic
    downstream. Blocks missing a treatment rank over their present
    treatments — stated semantics, mirrored by the oracle.

    Scale shape: the spearman co-partitioned union join on custkey
    attaches the nation (never a broadcast of the customer table);
    per-group (nation, priority, cents) partials fold through ONE
    bounded groupby into the ≤ nations×priorities grid, and the
    within-block ranking is driver arithmetic on that grid — bounded
    by the CATEGORY product, never the order count."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
    )

    def cust_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": batch.column("c_custkey").cast(pa.int64()),
                "nation": batch.column("c_nationkey").cast(pa.int64()),
                "priority": pa.array([""] * batch.num_rows, pa.string()),
                "cents": pa.array(np.zeros(batch.num_rows, np.int64),
                                  pa.int64()),
                "side": pa.array(np.zeros(batch.num_rows, np.int64),
                                 pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": batch.column("o_custkey").cast(pa.int64()),
                "nation": pa.array(np.zeros(batch.num_rows, np.int64),
                                   pa.int64()),
                "priority": batch.column("o_orderpriority"),
                "cents": _cents(batch.column("o_totalprice")),
                "side": pa.array(np.ones(batch.num_rows, np.int64),
                                 pa.int64()),
            }
        )

    tagged = cust.map_batches(cust_side, batch_format="pyarrow").union(
        orders.map_batches(order_side, batch_format="pyarrow")
    )

    def attach(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        side = group.column("side").to_numpy(zero_copy_only=False)
        if not (side == 0).any() or not (side == 1).any():
            return pa.table(
                {
                    "nation": pa.array([], pa.int64()),
                    "priority": pa.array([], pa.string()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        nation = int(
            group.column("nation").to_numpy(zero_copy_only=False)[side == 0][0]
        )
        prio = group.column("priority").to_pandas().to_numpy(dtype=object)[
            side == 1
        ]
        cents = group.column("cents").to_numpy(zero_copy_only=False)[side == 1]
        g = (
            pd.DataFrame({"priority": prio, "cents": cents})
            .groupby("priority", sort=False)["cents"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "nation": pa.array(
                    np.full(len(g), nation, np.int64), pa.int64()
                ),
                "priority": pa.array(g["priority"], pa.string()),
                "cents": pa.array(
                    g["cents"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    grid = (
        tagged.groupby("custkey")
        .map_groups(attach, batch_format="pyarrow")
        .groupby(["nation", "priority"])
        .aggregate(_Sum("cents", alias_name="cents"))
        .take_all()  # bounded: <= nations * priorities rows
    )
    df = pd.DataFrame(grid)
    n_blocks = df["nation"].nunique()
    k_treat = df["priority"].nunique()
    out: dict[str, int] = {}
    for _, blk in df.groupby("nation"):
        v = blk["cents"].to_numpy()
        pr = blk["priority"].to_numpy()
        less = (v[:, None] > v[None, :]).sum(axis=1)
        ties = (v[:, None] == v[None, :]).sum(axis=1)  # includes self
        d = 2 * less + ties + 1
        for p, dd in zip(pr, d):
            out[p] = out.get(p, 0) + int(dd)
    res = pd.DataFrame(
        [
            {
                "priority": p,
                "r2_sum": s,
                "n_blocks": n_blocks,
                "k_treat": k_treat,
            }
            for p, s in out.items()
        ]
    ).sort_values("priority", ignore_index=True)
    for c in ["r2_sum", "n_blocks", "k_treat"]:
        res[c] = res[c].astype("int64")
    return res[["priority", "r2_sum", "n_blocks", "k_treat"]]


def ship_lag_profile(sf_dir: str) -> "pd.DataFrame":
    """Order-to-ship lag profile — the operational SLA readout of the
    big-big join: per order priority, the exact distribution of
    DAYS between o_orderdate and each line's l_shipdate, banded into
    the operations ladder (0-7, 8-30, 31-60, 61-90, >90 days) plus
    the exact lag-day sum for the mean. The cross-priority comparison
    is the 'does urgent actually ship faster' audit. Output per
    (priority, band): (priority, band_lo, n_lines, lag_days_sum).

    Scale shape: order_priority_join's co-partitioned equi-join
    verbatim — both sides project to (key, small ints), hash-
    co-partition on the SAME orderkey % P map, one union shuffle;
    inside a partition the probe is a vectorized searchsorted and
    the partition emits only its ≤ priorities×bands partial counts,
    so the final exchange is a handful of rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    DAY_US = 86_400_000_000
    BANDS = np.array([0, 8, 31, 61, 91], np.int64)  # band lower edges

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
    )
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def order_side(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        p = pc.utf8_slice_codeunits(
            batch.column("o_orderpriority"), 0, 1
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "day": pa.array(d, pa.int64()),
                "pcode": pa.array(p, pa.int64()),
                "side": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                "part": pa.array(k % N_COARSE_PARTS, pa.int64()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        k = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = (
            batch.column("l_shipdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        return pa.table(
            {
                "key": pa.array(k, pa.int64()),
                "day": pa.array(d, pa.int64()),
                "pcode": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                "side": pa.array(np.ones(len(k), np.int64), pa.int64()),
                "part": pa.array(k % N_COARSE_PARTS, pa.int64()),
            }
        )

    def probe(part_tbl: pa.Table) -> pa.Table:
        key = part_tbl.column("key").to_numpy(zero_copy_only=False)
        day = part_tbl.column("day").to_numpy(zero_copy_only=False)
        pcode = part_tbl.column("pcode").to_numpy(zero_copy_only=False)
        side = part_tbl.column("side").to_numpy(zero_copy_only=False)
        ok = side == 0
        okey = key[ok]
        order = np.argsort(okey, kind="stable")
        okey_s = okey[order]
        oday = day[ok][order]
        opc = pcode[ok][order]
        lkey, lday = key[~ok], day[~ok]
        pos = np.searchsorted(okey_s, lkey)
        pos = np.clip(pos, 0, max(len(okey_s) - 1, 0))
        match = okey_s[pos] == lkey if len(okey_s) else np.zeros(
            len(lkey), bool
        )
        lag = lday[match] - oday[pos[match]]
        pc_ = opc[pos[match]]
        band = np.searchsorted(BANDS, np.maximum(lag, 0), side="right") - 1
        cell = pc_ * 8 + band
        u, inv = np.unique(cell, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, lag)
        return pa.table(
            {
                "cell": pa.array(u, pa.int64()),
                "n_lines": pa.array(n, pa.int64()),
                "lag_days_sum": pa.array(s, pa.int64()),
            }
        )

    folded = (
        orders.map_batches(order_side, batch_format="pyarrow")
        .union(lines.map_batches(line_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(probe, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(
            _Sum("n_lines", alias_name="n_lines"),
            _Sum("lag_days_sum", alias_name="lag_days_sum"),
        )
        .take_all()  # bounded: <= priorities * bands rows
    )
    out = []
    for r in folded:
        cell = int(r["cell"])
        out.append(
            {
                "pcode": cell // 8,
                "band_lo": int(BANDS[cell % 8]),
                "n_lines": int(r["n_lines"]),
                "lag_days_sum": int(r["lag_days_sum"]),
            }
        )
    df = pd.DataFrame(out).sort_values(
        ["pcode", "band_lo"], ignore_index=True
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["pcode", "band_lo", "n_lines", "lag_days_sum"]]


_FD_SPECS = [
    # (name, table, lhs col, rhs col)
    ("nation_to_segment", "customer", "c_nationkey", "c_mktsegment"),
    ("priority_to_status", "orders", "o_orderpriority", "o_orderstatus"),
    ("lang_to_source", "documents", "lang", "source"),
    ("user_to_event_type", "events", "user_id", "event_type"),
]


def fd_violation_audit(sf_dir: str) -> "pd.DataFrame":
    """Functional-dependency violation audit — the dependency-
    profiling leg the column-wise profiler (profile_columns) and the
    constraint checker (data_quality_audit) don't cover: for each
    candidate FD lhs → rhs, the exact minimum number of rows whose
    rhs would have to change for the FD to hold
    (n_violations = n_rows − Σ_lhs max-rhs-count, the g₃ error of FD
    discovery à la TANE). Zero means the dependency holds exactly
    (a normalization opportunity); a small count is dirty data; a
    large one means no dependency. Output per FD:
    (fd_name, n_groups, n_rows, n_violations).

    Scale shape: per FD one combiner-bounded (lhs, rhs) count fold →
    per-lhs max and sum partials fold through a groupby(lhs) whose
    width is the LHS cardinality — counts, never rows, cross either
    exchange; the four FDs run as four independent bounded folds."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    out = []
    for name, table, lhs, rhs in _FD_SPECS:
        ds = ray.data.read_parquet(
            f"{sf_dir}/{table}.parquet", columns=[lhs, rhs]
        )

        def pair_partial(batch: pa.Table, lhs=lhs, rhs=rhs) -> pa.Table:
            g = batch.group_by([lhs, rhs]).aggregate([([], "count_all")])
            return pa.table(
                {
                    "lhs": g.column(lhs).cast(pa.string()),
                    "rhs": g.column(rhs).cast(pa.string()),
                    "n": g.column("count_all").cast(pa.int64()),
                }
            )

        per_lhs = (
            ds.map_batches(pair_partial, batch_format="pyarrow")
            .groupby(["lhs", "rhs"])
            .aggregate(_Sum("n", alias_name="n"))
            .groupby("lhs")
            .aggregate(
                _Sum("n", alias_name="n_rows"),
                _Max("n", alias_name="n_max"),
            )
        )

        def fold(batch: pa.Table) -> pa.Table:
            nr = batch.column("n_rows").to_numpy(zero_copy_only=False)
            nm = batch.column("n_max").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "g": pa.array([len(nr)], pa.int64()),
                    "r": pa.array([int(nr.sum())], pa.int64()),
                    "v": pa.array([int((nr - nm).sum())], pa.int64()),
                }
            )

        agg = per_lhs.map_batches(fold, batch_format="pyarrow").aggregate(
            _Sum("g", alias_name="g"),
            _Sum("r", alias_name="r"),
            _Sum("v", alias_name="v"),
        )
        out.append(
            {
                "fd_name": name,
                "n_groups": int(agg["g"]),
                "n_rows": int(agg["r"]),
                "n_violations": int(agg["v"]),
            }
        )
    df = pd.DataFrame(out).sort_values("fd_name", ignore_index=True)
    for c in ["n_groups", "n_rows", "n_violations"]:
        df[c] = df[c].astype("int64")
    return df[["fd_name", "n_groups", "n_rows", "n_violations"]]


QQ_BUCKETS = 256  # value grid for the quantile-drift selection


def qq_drift_deciles(sf_dir: str) -> "pd.DataFrame":
    """Exact quantile-quantile drift table — the decile VALUES of
    order totals in the first vs second half of the order-date range,
    side by side: wasserstein_drift integrates the gap and ks_drift
    finds its sup; this names the actual dollar values at each
    decile, the table a finance reviewer reads ('the p90 order grew
    $212'). Deciles are type-1 order statistics (the ⌈q·n/10⌉-th
    smallest cents value, 1-indexed) — exact selection, no
    interpolation. Output per decile 1-9:
    (decile, v_h1_cents, v_h2_cents, diff_cents).

    Scale shape (distributed SELECTION, one step past
    winsorized_stats' trimmed sums): a bounded (period, value-bucket)
    count grid locates each decile's bucket and within-bucket offset
    (equal values share a bucket); the second pass co-partitions ONLY
    the ≤ 18 boundary buckets, local-sorts each, and emits the
    requested order statistics — ≤ 18 small rows to the driver,
    never a global sort."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    DAY_US = 86_400_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    lohi_d = ds.aggregate(_Min("o_orderdate"), _Max("o_orderdate"))
    dlo = int(pd.Timestamp(lohi_d["min(o_orderdate)"]).value // 1000) // DAY_US
    dhi = int(pd.Timestamp(lohi_d["max(o_orderdate)"]).value // 1000) // DAY_US
    mid = (dlo + dhi) // 2  # first half: day <= mid

    def rows_fn(batch: pa.Table) -> pa.Table:
        day = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        v = _cents(batch.column("o_totalprice")).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "period": pa.array((day > mid).astype(np.int64), pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    rows = ds.map_batches(rows_fn, batch_format="pyarrow").materialize()
    lohi = rows.aggregate(_Min("v"), _Max("v"))
    vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
    wv = (vhi - vlo) // QQ_BUCKETS + 1

    def grid_partial(batch: pa.Table) -> pa.Table:
        p = batch.column("period").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        cell = p * QQ_BUCKETS + (v - vlo) // wv
        u, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    grid = (
        rows.map_batches(grid_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= 2 * QQ_BUCKETS rows
    )
    counts = np.zeros((2, QQ_BUCKETS), np.int64)
    for r in grid:
        counts[int(r["cell"]) // QQ_BUCKETS, int(r["cell"]) % QQ_BUCKETS] = (
            int(r["n"])
        )
    # plan: per (period, bucket) -> list of (decile, within-offset)
    plan: dict[int, list] = {}
    for p in (0, 1):
        n = int(counts[p].sum())
        cum = np.cumsum(counts[p])
        for q in range(1, 10):
            k = -(-q * n // 10)  # ceil
            b = int(np.searchsorted(cum, k, side="left"))
            off = k - int(cum[b - 1] if b > 0 else 0)  # 1-indexed in bucket
            plan.setdefault(p * QQ_BUCKETS + b, []).append((q, off))
    plan_ref = ray.put(plan)

    def keyed(batch: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        p = batch.column("period").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        cell = p * QQ_BUCKETS + (v - vlo) // wv
        want = np.isin(cell, np.array(sorted(pl), np.int64))
        return pa.table(
            {
                "cell": pa.array(cell[want], pa.int64()),
                "v": pa.array(v[want], pa.int64()),
            }
        )

    def select_part(group: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        cell = int(group.column("cell")[0].as_py())
        v = np.sort(group.column("v").to_numpy(zero_copy_only=False))
        qs, vals = [], []
        for q, off in pl[cell]:
            qs.append(q)
            vals.append(int(v[off - 1]))
        return pa.table(
            {
                "period": pa.array(
                    [cell // QQ_BUCKETS] * len(qs), pa.int64()
                ),
                "decile": pa.array(qs, pa.int64()),
                "val": pa.array(vals, pa.int64()),
            }
        )

    picked = (
        rows.map_batches(keyed, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(select_part, batch_format="pyarrow")
        .take_all()  # bounded: <= 18 rows
    )
    vmap = {(int(r["period"]), int(r["decile"])): int(r["val"])
            for r in picked}
    out = [
        {
            "decile": q,
            "v_h1_cents": vmap[(0, q)],
            "v_h2_cents": vmap[(1, q)],
            "diff_cents": vmap[(1, q)] - vmap[(0, q)],
        }
        for q in range(1, 10)
    ]
    df = pd.DataFrame(out)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["decile", "v_h1_cents", "v_h2_cents", "diff_cents"]]


def runs_test(sf_dir: str) -> "pd.DataFrame":
    """Exact Wald-Wolfowitz runs test sufficient statistics over the
    daily order-count series — the randomness check the drift family
    doesn't make: with each day labeled above/below the series
    MEDIAN (exact type-1 median of the daily counts; median-equal
    days dropped, the classic convention), too FEW runs means
    clustering/trend, too MANY means oscillation; (n_runs, n_above,
    n_below) make E[R] and Var[R] exact rationals downstream. Output
    one row.

    Scale shape: one combiner-bounded fold to per-day counts (days,
    not orders, cross the exchange), then the median pick and the
    run scan are driver arithmetic over the bounded day span."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        d = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        u, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {
                "day": pa.array(u, pa.int64()),
                "x": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(_Sum("x", alias_name="x"))
        .take_all()  # bounded: <= day span rows
    )
    df = pd.DataFrame(rows).sort_values("day", ignore_index=True)
    x = df["x"].to_numpy()
    n = len(x)
    med = int(np.sort(x)[(n + 1) // 2 - 1])  # type-1 median
    lab = np.where(x > med, 1, np.where(x < med, 0, -1))
    lab = lab[lab >= 0]
    n_above = int((lab == 1).sum())
    n_below = int((lab == 0).sum())
    n_runs = int(1 + (lab[1:] != lab[:-1]).sum()) if len(lab) else 0
    out = pd.DataFrame(
        [
            {
                "n_days": n,
                "median_x": med,
                "n_above": n_above,
                "n_below": n_below,
                "n_runs": n_runs,
            }
        ]
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


QMIG_BUCKETS = 256  # value grid for the migration rank passes


def quintile_migration(sf_dir: str) -> "pd.DataFrame":
    """Customer spend-quintile migration matrix — how customers move
    between spend quintiles from the first to the second half of the
    order-date range: the CRM churn/upsell readout rfm_segments'
    static snapshot cannot give. Within each half, ACTIVE customers
    rank by (total cents, custkey) into exact quintiles
    1 + ⌊rn0·5/n⌋ (the rfm convention); customers absent from a half
    take band 0, so the matrix diagonal is loyalty, the upper
    triangle is growth, row 0 is acquisition and column 0 is churn.
    Output per non-empty cell: (q_h1, q_h2, n_customers).

    Scale shape: one (custkey, half) cents fold; per half one
    bucket-grid rank pass over that half's active customers (bounded
    count grid, broadcast exclusive prefix bases, bucket-local
    (cents, custkey) lexsort); the two rank outputs co-partition on
    custkey (tagged union, never a join shuffle of wide rows) and
    collapse to the ≤36-cell matrix."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    DAY_US = 86_400_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    lohi_d = ds.aggregate(_Min("o_orderdate"), _Max("o_orderdate"))
    dlo = int(pd.Timestamp(lohi_d["min(o_orderdate)"]).value // 1000) // DAY_US
    dhi = int(pd.Timestamp(lohi_d["max(o_orderdate)"]).value // 1000) // DAY_US
    mid = (dlo + dhi) // 2

    def partials(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        v = _cents(batch.column("o_totalprice")).to_numpy(zero_copy_only=False)
        half = (day > mid).astype(np.int64)
        key = ck * 2 + half
        u, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, v)
        return pa.table(
            {
                "key": pa.array(u, pa.int64()),
                "cents": pa.array(s, pa.int64()),
            }
        )

    perch = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("key")
        .aggregate(_Sum("cents", alias_name="cents"))
        .materialize()
    )

    # Width-1 escape: below the cap the two rank passes and the
    # matrix co-partition are pure fixed cost — one vectorized task.
    if perch.count() < 2_000_000:
        def _qmig_local(tbl: pa.Table) -> pa.Table:
            key = tbl.column("key").to_numpy(zero_copy_only=False)
            cents = tbl.column("cents").to_numpy(zero_copy_only=False)
            ck, half = key // 2, key % 2
            qmap: dict[int, np.ndarray] = {}
            for h in (0, 1):
                sel = half == h
                cs, ks = cents[sel], ck[sel]
                order = np.lexsort((ks, cs))
                rn0 = np.empty(len(cs), np.int64)
                rn0[order] = np.arange(len(cs), dtype=np.int64)
                qmap[h] = (ks, 1 + rn0 * 5 // max(len(cs), 1))
            allc = np.unique(ck)
            q1 = np.zeros(len(allc), np.int64)
            q2 = np.zeros(len(allc), np.int64)
            for h, dest in ((0, q1), (1, q2)):
                ks, qv = qmap[h]
                dest[np.searchsorted(allc, ks)] = qv
            cell = q1 * 8 + q2
            u, cnt = np.unique(cell, return_counts=True)
            return pa.table(
                {
                    "cell": pa.array(u, pa.int64()),
                    "n_customers": pa.array(
                        cnt.astype(np.int64), pa.int64()
                    ),
                }
            )

        folded = (
            perch.repartition(1)
            .map_batches(
                _qmig_local, batch_format="pyarrow", batch_size=None
            )
            .take_all()
        )
        out = [
            {
                "q_h1": int(r["cell"]) // 8,
                "q_h2": int(r["cell"]) % 8,
                "n_customers": int(r["n_customers"]),
            }
            for r in folded
        ]
        df = pd.DataFrame(out).sort_values(
            ["q_h1", "q_h2"], ignore_index=True
        )
        for c in df.columns:
            df[c] = df[c].astype("int64")
        return df[["q_h1", "q_h2", "n_customers"]]

    def rank_half(half: int) -> "ray.data.Dataset":
        rows = perch.map_batches(
            lambda b, h=half: (
                lambda k, c: pa.table(
                    {
                        "ck": pa.array(k[k % 2 == h] // 2, pa.int64()),
                        "cents": pa.array(c[k % 2 == h], pa.int64()),
                    }
                )
            )(
                b.column("key").to_numpy(zero_copy_only=False),
                b.column("cents").to_numpy(zero_copy_only=False),
            ),
            batch_format="pyarrow",
        ).materialize()
        n_h = rows.count()
        lohi = rows.aggregate(_Min("cents"), _Max("cents"))
        vlo, vhi = int(lohi["min(cents)"]), int(lohi["max(cents)"])
        wv = (vhi - vlo) // QMIG_BUCKETS + 1

        def keyed(batch: pa.Table) -> pa.Table:
            c = batch.column("cents").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "vb", pa.array((c - vlo) // wv, pa.int64())
            )

        def vb_partial(batch: pa.Table) -> pa.Table:
            u, cnt = np.unique(
                batch.column("vb").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table(
                {
                    "vb": pa.array(u, pa.int64()),
                    "n": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        grid = (
            rows.map_batches(keyed, batch_format="pyarrow")
            .map_batches(vb_partial, batch_format="pyarrow")
            .groupby("vb")
            .aggregate(_Sum("n", alias_name="n"))
            .take_all()  # bounded: <= QMIG_BUCKETS rows
        )
        counts = np.zeros(QMIG_BUCKETS, np.int64)
        for r in grid:
            counts[int(r["vb"])] = int(r["n"])
        base = np.concatenate(([0], np.cumsum(counts)[:-1]))
        bref = ray.put(base)

        def rank_part(group: pa.Table, h=half) -> pa.Table:
            pre = ray.get(bref)
            vb = int(group.column("vb")[0].as_py())
            c = group.column("cents").to_numpy(zero_copy_only=False)
            ck = group.column("ck").to_numpy(zero_copy_only=False)
            order = np.lexsort((ck, c))
            rn0 = np.empty(len(c), np.int64)
            rn0[order] = pre[vb] + np.arange(len(c), dtype=np.int64)
            q = 1 + rn0 * 5 // n_h
            return pa.table(
                {
                    "ck": pa.array(ck, pa.int64()),
                    "q": pa.array(q, pa.int64()),
                    "half": pa.array(np.full(len(c), h, np.int64),
                                     pa.int64()),
                }
            )

        return (
            rows.map_batches(keyed, batch_format="pyarrow")
            .groupby("vb")
            .map_groups(rank_part, batch_format="pyarrow")
        )

    def cell_fold(part_tbl: pa.Table) -> pa.Table:
        ck = part_tbl.column("ck").to_numpy(zero_copy_only=False)
        q = part_tbl.column("q").to_numpy(zero_copy_only=False)
        h = part_tbl.column("half").to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        cks, qs, hs = ck[order], q[order], h[order]
        uniq, start = np.unique(cks, return_index=True)
        q1 = np.zeros(len(uniq), np.int64)
        q2 = np.zeros(len(uniq), np.int64)
        for hh, dest in ((0, q1), (1, q2)):
            sel = hs == hh
            pos = np.searchsorted(uniq, cks[sel])
            dest[pos] = qs[sel]
        cell = q1 * 8 + q2
        u, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def add_part(batch: pa.Table) -> pa.Table:
        ck = batch.column("ck").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array(ck % N_COARSE_PARTS, pa.int64())
        )

    folded = (
        rank_half(0)
        .union(rank_half(1))
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: cell_fold(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .groupby("cell")
        .aggregate(_Sum("n", alias_name="n_customers"))
        .take_all()  # bounded: <= 36 cells
    )
    out = [
        {
            "q_h1": int(r["cell"]) // 8,
            "q_h2": int(r["cell"]) % 8,
            "n_customers": int(r["n_customers"]),
        }
        for r in folded
    ]
    df = pd.DataFrame(out).sort_values(["q_h1", "q_h2"], ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["q_h1", "q_h2", "n_customers"]]


LMOM_BUCKETS = 256  # value grid for the L-moment rank pass
LANE_SHIFT = 20  # base-2^20 lane split for overflow-free partials


def l_moment_ratios(sf_dir: str) -> "pd.DataFrame":
    """Exact probability-weighted-moment numerators of the order-value
    distribution — the L-moment family (Hosking), the robust
    alternative to classical moments that corr_moments' Σx² cannot
    give: with x_(1) ≤ … ≤ x_(n) the cents order statistics,
    B0 = Σ x_(i), B1 = Σ (i−1)·x_(i), B2 = Σ (i−1)(i−2)·x_(i), so
    λ2 = 2B1/(n(n−1)) − B0/n (the L-scale: half the mean absolute
    pairwise difference — Gini's mean difference), and
    τ3 = (6B2' …) the L-skewness, all exact rationals downstream.
    Tie order does not matter: within a tie group x is constant, so
    the weight SUM over the group is rank-order invariant. Output
    one row: (n, b0_sum, b1_sum, b2_sum) with the B-sums as decimal
    strings (B2 ≤ n²·max_cents·n exceeds int64 by design; the
    oracle needs HUGEINT for the same reason).

    Scale shape: one bucket-grid rank pass (bounded count grid,
    broadcast exclusive prefix bases — ranks are base + local
    position after a bucket sort); per-bucket partials fold through
    the `_cvm_lanes`-style base-2²⁰ split — per element
    every base-2²⁰ digit product stays < 2⁴⁰, and the per-CLASS
    global lane sums stay int64 through ~4·10⁶ rows (the next split
    level, base-2¹⁵, extends to ~10⁹ — documented dial). The driver
    reassembles exact Python ints from the 9 lane totals."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    )

    def rows_fn(batch: pa.Table) -> pa.Table:
        return pa.table({"v": _cents(batch.column("o_totalprice"))})

    rows = ds.map_batches(rows_fn, batch_format="pyarrow").materialize()
    lohi = rows.aggregate(Min("v"), Max("v"))
    vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
    wv = (vhi - vlo) // LMOM_BUCKETS + 1

    def keyed(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "vb", pa.array((v - vlo) // wv, pa.int64())
        )

    def vb_partial(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("vb").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {
                "vb": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    grid = (
        rows.map_batches(keyed, batch_format="pyarrow")
        .map_batches(vb_partial, batch_format="pyarrow")
        .groupby("vb")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= LMOM_BUCKETS rows
    )
    counts = np.zeros(LMOM_BUCKETS, np.int64)
    for r in grid:
        counts[int(r["vb"])] = int(r["n"])
    base = np.concatenate(([0], np.cumsum(counts)[:-1]))
    bref = ray.put(base)

    M = (1 << LANE_SHIFT) - 1
    LANE_COLS = (
        [f"b0_l{k}" for k in range(2)]
        + [f"b1_l{k}" for k in range(3)]
        + [f"b2_l{k}" for k in range(4)]
    )

    def moment_part(group: pa.Table) -> pa.Table:
        pre = ray.get(bref)
        vb = int(group.column("vb")[0].as_py())
        v = np.sort(group.column("v").to_numpy(zero_copy_only=False))
        i0 = pre[vb] + np.arange(len(v), dtype=np.int64)  # rank - 1
        w2 = i0 * (i0 - 1)
        vd = [v & M, v >> LANE_SHIFT]
        id_ = [i0 & M, (i0 >> LANE_SHIFT) & M]
        wd = [w2 & M, (w2 >> LANE_SHIFT) & M, w2 >> (2 * LANE_SHIFT)]
        out = {c: 0 for c in LANE_COLS}
        out["b0_l0"] = int(vd[0].sum())
        out["b0_l1"] = int(vd[1].sum())
        for a in range(2):
            for b in range(2):
                out[f"b1_l{a + b}"] += int((id_[a] * vd[b]).sum())
        for a in range(3):
            for b in range(2):
                out[f"b2_l{a + b}"] += int((wd[a] * vd[b]).sum())
        return pa.table({k: pa.array([x], pa.int64())
                         for k, x in out.items()})

    lanes = (
        rows.map_batches(keyed, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(moment_part, batch_format="pyarrow")
        .aggregate(*[_Sum(c, alias_name=c) for c in LANE_COLS])
    )
    S = 1 << LANE_SHIFT
    b0 = sum(int(lanes[f"b0_l{k}"]) * S**k for k in range(2))
    b1 = sum(int(lanes[f"b1_l{k}"]) * S**k for k in range(3))
    b2 = sum(int(lanes[f"b2_l{k}"]) * S**k for k in range(4))
    n = int(counts.sum())
    df = pd.DataFrame(
        [
            {
                "n": n,
                "b0_sum": str(b0),
                "b1_sum": str(b1),
                "b2_sum": str(b2),
            }
        ]
    )
    df["n"] = df["n"].astype("int64")
    for c in ["b0_sum", "b1_sum", "b2_sum"]:
        df[c] = df[c].astype(str)
    return df[["n", "b0_sum", "b1_sum", "b2_sum"]]


SKP_BUCKETS = 256  # key grid for the sort-key planner
SKP_LOCAL_MAX = 2_000_000  # rows below which the planner runs width-1


def sort_key_planner(sf_dir: str) -> "pd.DataFrame":
    """Composite sort-key planner — for each candidate ORDER BY key,
    the EXACT total run count of every measured column under the
    (key, o_orderkey) total order: run counts are precisely what
    RLE/delta encodings and zone-map pruning pay for, so the argmin
    row per column IS the physical-design decision
    (rle_encoding_audit prices ONE given layout; this compares the
    candidates). Candidates: custkey, order day, priority; measured:
    priority code, status code, custkey, day. Output per
    (sort_key, column): n_runs.

    Scale shape: per candidate key, one bounded (key-bucket) count
    grid and one key-bucket co-partition — each bucket local-sorts
    by (key, orderkey) and counts adjacent changes; the ONE run that
    may span a bucket boundary is stitched on the driver from the
    bounded per-bucket (first, last) value tuples (the
    varint_cost_audit boundary discipline). Width-1 escape below
    SKP_LOCAL_MAX rows runs all candidates in one task."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority", "o_orderstatus"],
    )

    STATUS = {"F": 0, "O": 1, "P": 2}

    def rows_fn(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        day = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        pc_ = pc.utf8_slice_codeunits(
            batch.column("o_orderpriority"), 0, 1
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        st = np.array(
            [STATUS[x] for x in
             batch.column("o_orderstatus").to_pylist()],
            np.int64,
        )
        return pa.table(
            {
                "okey": pa.array(ok, pa.int64()),
                "ck": pa.array(ck, pa.int64()),
                "day": pa.array(day, pa.int64()),
                "pcode": pa.array(pc_, pa.int64()),
                "status": pa.array(st, pa.int64()),
            }
        )

    rows = ds.map_batches(rows_fn, batch_format="pyarrow").materialize()
    CANDS = ["ck", "day", "pcode"]
    MEASURED = ["pcode", "status", "ck", "day"]

    def runs_under(mat: dict, order: "np.ndarray") -> dict:
        out = {}
        for c in MEASURED:
            v = mat[c][order]
            out[c] = 1 + int((v[1:] != v[:-1]).sum()) if len(v) else 0
        return out

    if rows.count() < SKP_LOCAL_MAX:

        def local(tbl: pa.Table) -> pa.Table:
            mat = {
                c: tbl.column(c).to_numpy(zero_copy_only=False)
                for c in ["okey", *MEASURED]
            }
            keys, cols, runs = [], [], []
            for k in CANDS:
                order = np.lexsort((mat["okey"], mat[k]))
                for c, r in runs_under(mat, order).items():
                    keys.append(k)
                    cols.append(c)
                    runs.append(r)
            return pa.table(
                {
                    "sort_key": pa.array(keys, pa.string()),
                    "col": pa.array(cols, pa.string()),
                    "n_runs": pa.array(runs, pa.int64()),
                }
            )

        out = (
            rows.repartition(1)
            .map_batches(local, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        out = out.sort_values(["sort_key", "col"], ignore_index=True)
        out["n_runs"] = out["n_runs"].astype("int64")
        return out[["sort_key", "col", "n_runs"]]

    # grid path: per candidate key, bucket the key range; local
    # adjacent changes + driver boundary stitching off per-bucket
    # (first, last) tuples
    out_rows = []
    for k in CANDS:
        lohi = rows.aggregate(Min(k), Max(k))
        klo, khi = int(lohi[f"min({k})"]), int(lohi[f"max({k})"])
        wk = (khi - klo) // SKP_BUCKETS + 1

        def keyed(batch: pa.Table, k=k, klo=klo, wk=wk) -> pa.Table:
            v = batch.column(k).to_numpy(zero_copy_only=False)
            return batch.append_column(
                "kb", pa.array((v - klo) // wk, pa.int64())
            )

        def bucket_runs(group: pa.Table, k=k) -> pa.Table:
            kb = int(group.column("kb")[0].as_py())
            mat = {
                c: group.column(c).to_numpy(zero_copy_only=False)
                for c in ["okey", *MEASURED, k]
            }
            order = np.lexsort((mat["okey"], mat[k]))
            cols = {"kb": pa.array([kb], pa.int64())}
            for c in MEASURED:
                v = mat[c][order]
                cols[f"chg_{c}"] = pa.array(
                    [int((v[1:] != v[:-1]).sum())], pa.int64()
                )
                cols[f"first_{c}"] = pa.array([int(v[0])], pa.int64())
                cols[f"last_{c}"] = pa.array([int(v[-1])], pa.int64())
            return pa.table(cols)

        grid = (
            rows.map_batches(keyed, batch_format="pyarrow")
            .groupby("kb")
            .map_groups(bucket_runs, batch_format="pyarrow")
            .take_all()  # bounded: <= SKP_BUCKETS rows
        )
        grid.sort(key=lambda r: int(r["kb"]))
        for c in MEASURED:
            total = sum(int(r[f"chg_{c}"]) for r in grid) + 1
            for prev, cur in zip(grid, grid[1:]):
                if int(prev[f"last_{c}"]) != int(cur[f"first_{c}"]):
                    total += 1
            out_rows.append(
                {"sort_key": k, "col": c, "n_runs": total}
            )
    df = pd.DataFrame(out_rows).sort_values(
        ["sort_key", "col"], ignore_index=True
    )
    df["n_runs"] = df["n_runs"].astype("int64")
    return df[["sort_key", "col", "n_runs"]]


XCORR_MAX_LAG = 14


def xcorr_lag_profile(sf_dir: str) -> "pd.DataFrame":
    """Exact cross-correlation lag profile between the daily 'error'
    and 'purchase' count series — the lead-lag detector ('do errors
    LEAD purchases down?') that same-day correlation misses: for
    every lag in ±XCORR_MAX_LAG days, the exact integer co-moment
    row (lag, n, sx, sy, sxy, sxx, syy) over the days where both
    x_t and y_{t+lag} exist, so r(lag) and its argmax are exact
    rational arithmetic downstream. Output: one row per lag with
    n ≥ 2.

    Scale shape: two combiner-bounded day folds (days, not events,
    cross the exchange); the 29-lag alignment is driver arithmetic
    over the bounded spans — the runs_test/changepoint driver-read
    contract."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.is_in(
            et, value_set=pa.array(["error", "purchase"])
        )
        t = batch.filter(keep)
        d = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        isp = pc.equal(t.column("event_type"), "purchase").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        key = d * 2 + isp
        u, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby("key")
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= 2 * day span rows
    )
    xs: dict[int, int] = {}
    ys: dict[int, int] = {}
    for r in rows:
        k, n = int(r["key"]), int(r["n"])
        (ys if k % 2 else xs)[k // 2] = n
    out = []
    for lag in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1):
        pairs = [
            (xs[d], ys[d + lag]) for d in xs if (d + lag) in ys
        ]
        if len(pairs) < 2:
            continue
        xa = np.array([p[0] for p in pairs], np.int64)
        ya = np.array([p[1] for p in pairs], np.int64)
        out.append(
            {
                "lag": lag,
                "n": len(pairs),
                "sx": int(xa.sum()),
                "sy": int(ya.sum()),
                "sxy": int((xa * ya).sum()),
                "sxx": int((xa * xa).sum()),
                "syy": int((ya * ya).sum()),
            }
        )
    df = pd.DataFrame(out)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


TUKEY_BUCKETS = 256  # value grid for the per-type quartile pass
TUKEY_LOCAL_MAX = 2_000_000  # rows below which fences run width-1


def tukey_fences(sf_dir: str) -> "pd.DataFrame":
    """Exact Tukey-fence outlier profile per event type — the EDA
    boxplot numbers, exactly: per type the type-1 quartiles of the
    event value (milli-units), and the counts outside the 1.5·IQR
    fences, kept integer by doubling (outlier iff 2v < 2Q1 − 3·IQR
    or 2v > 2Q3 + 3·IQR — no halves ever materialize). mad_outliers
    flags rows by a global median scale; this is the per-group
    quartile version every dashboard draws. Output per type:
    (event_type, n, q1_milli, q3_milli, n_low_out, n_high_out).

    Scale shape: width-1 escape below TUKEY_LOCAL_MAX rows (one
    task, all types); above it, the qq_drift_deciles selection plan
    per type — bounded (type, value-bucket) count grid locates both
    quartiles' buckets and offsets, only boundary buckets
    co-partition for the exact order statistics, then ONE streaming
    pass counts fence violations with the ≤|types| fence table
    broadcast."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def rows_fn(batch: pa.Table) -> pa.Table:
        v = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 1000 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "v": pa.array(v, pa.int64()),
            }
        )

    rows = ev.map_batches(rows_fn, batch_format="pyarrow").materialize()

    def finish(per_type: dict) -> "pd.DataFrame":
        out = []
        for et in sorted(per_type):
            n, q1, q3, lo_n, hi_n = per_type[et]
            out.append(
                {
                    "event_type": et,
                    "n": n,
                    "q1_milli": q1,
                    "q3_milli": q3,
                    "n_low_out": lo_n,
                    "n_high_out": hi_n,
                }
            )
        df = pd.DataFrame(out)
        for c in df.columns[1:]:
            df[c] = df[c].astype("int64")
        return df

    if rows.count() < TUKEY_LOCAL_MAX:

        def local(tbl: pa.Table) -> pa.Table:
            import pandas as pd  # noqa: F811

            et = tbl.column("event_type").to_pandas().to_numpy(dtype=object)
            v = tbl.column("v").to_numpy(zero_copy_only=False)
            rows_out = []
            for t in np.unique(et):
                vv = np.sort(v[et == t])
                n = len(vv)
                q1 = int(vv[(n + 3) // 4 - 1])  # ceil(n/4), 1-indexed
                q3 = int(vv[(3 * n + 3) // 4 - 1])
                iqr = q3 - q1
                lo2, hi2 = 2 * q1 - 3 * iqr, 2 * q3 + 3 * iqr
                rows_out.append(
                    (t, n, q1, q3, int((2 * vv < lo2).sum()),
                     int((2 * vv > hi2).sum()))
                )
            return pa.table(
                {
                    "event_type": pa.array([r[0] for r in rows_out],
                                           pa.string()),
                    "n": pa.array([r[1] for r in rows_out], pa.int64()),
                    "q1_milli": pa.array([r[2] for r in rows_out],
                                         pa.int64()),
                    "q3_milli": pa.array([r[3] for r in rows_out],
                                         pa.int64()),
                    "n_low_out": pa.array([r[4] for r in rows_out],
                                          pa.int64()),
                    "n_high_out": pa.array([r[5] for r in rows_out],
                                           pa.int64()),
                }
            )

        df = (
            rows.repartition(1)
            .map_batches(local, batch_format="pyarrow", batch_size=None)
            .to_pandas()
            .sort_values("event_type", ignore_index=True)
        )
        for c in df.columns[1:]:
            df[c] = df[c].astype("int64")
        return df

    # grid path: type codes are discovered from a bounded fold
    lohi = rows.aggregate(Min("v"), Max("v"))
    vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
    wv = (vhi - vlo) // TUKEY_BUCKETS + 1

    def grid_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        et = batch.column("event_type").to_pandas().to_numpy(dtype=object)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"et": et, "vb": (v - vlo) // wv, "n": 1})
            .groupby(["et", "vb"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "et": pa.array(g["et"], pa.string()),
                "vb": pa.array(g["vb"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    grid = (
        rows.map_batches(grid_partial, batch_format="pyarrow")
        .groupby(["et", "vb"])
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= |types| * TUKEY_BUCKETS rows
    )
    import collections

    counts: dict[str, np.ndarray] = collections.defaultdict(
        lambda: np.zeros(TUKEY_BUCKETS, np.int64)
    )
    for r in grid:
        counts[r["et"]][int(r["vb"])] = int(r["n"])
    plan: dict[str, list] = {}
    for et, c in counts.items():
        n = int(c.sum())
        cum = np.cumsum(c)
        for which, k in (("q1", (n + 3) // 4), ("q3", (3 * n + 3) // 4)):
            b = int(np.searchsorted(cum, k, side="left"))
            off = k - int(cum[b - 1] if b > 0 else 0)
            plan.setdefault(et, []).append((which, b, off))
    plan_ref = ray.put(plan)

    def pick_part(group: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        et = group.column("event_type")[0].as_py()
        vb = int(
            (group.column("v").to_numpy(zero_copy_only=False)[0] - vlo) // wv
        )
        wants = [(w, off) for (w, b, off) in pl.get(et, []) if b == vb]
        if not wants:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "which": pa.array([], pa.string()),
                    "val": pa.array([], pa.int64()),
                }
            )
        v = np.sort(group.column("v").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "event_type": pa.array([et] * len(wants), pa.string()),
                "which": pa.array([w for w, _ in wants], pa.string()),
                "val": pa.array([int(v[off - 1]) for _, off in wants],
                                pa.int64()),
            }
        )

    def route(batch: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        et = batch.column("event_type").to_pandas().to_numpy(dtype=object)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        vb = (v - vlo) // wv
        want = np.zeros(len(v), bool)
        for t, entries in pl.items():
            bs = {b for _, b, _ in entries}
            for b in bs:
                want |= (et == t) & (vb == b)
        t2 = batch.filter(pa.array(want))
        vv = t2.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t2.column("event_type"),
                "v": t2.column("v"),
                "gk": pa.array((vv - vlo) // wv, pa.int64()),
            }
        )

    picked = (
        rows.map_batches(route, batch_format="pyarrow")
        .groupby(["event_type", "gk"])
        .map_groups(
            lambda g: pick_part(g.drop_columns(["gk"])),
            batch_format="pyarrow",
        )
        .take_all()  # bounded: <= 2 rows per type
    )
    q: dict[str, dict] = collections.defaultdict(dict)
    for r in picked:
        q[r["event_type"]][r["which"]] = int(r["val"])
    fences = {
        et: (
            2 * q[et]["q1"] - 3 * (q[et]["q3"] - q[et]["q1"]),
            2 * q[et]["q3"] + 3 * (q[et]["q3"] - q[et]["q1"]),
        )
        for et in q
    }
    f_ref = ray.put(fences)

    def out_partial(batch: pa.Table) -> pa.Table:
        fl = ray.get(f_ref)
        et = batch.column("event_type").to_pandas().to_numpy(dtype=object)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        rows_out = []
        for t in np.unique(et):
            lo2, hi2 = fl[t]
            vv = v[et == t]
            rows_out.append(
                (t, int((2 * vv < lo2).sum()), int((2 * vv > hi2).sum()))
            )
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows_out],
                                       pa.string()),
                "lo": pa.array([r[1] for r in rows_out], pa.int64()),
                "hi": pa.array([r[2] for r in rows_out], pa.int64()),
            }
        )

    outs = (
        rows.map_batches(out_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            _Sum("lo", alias_name="lo"), _Sum("hi", alias_name="hi")
        )
        .take_all()  # bounded: one row per type
    )
    omap = {r["event_type"]: (int(r["lo"]), int(r["hi"])) for r in outs}
    per_type = {
        et: (
            int(counts[et].sum()),
            q[et]["q1"],
            q[et]["q3"],
            omap.get(et, (0, 0))[0],
            omap.get(et, (0, 0))[1],
        )
        for et in counts
    }
    return finish(per_type)


THEIL_WINDOW = 64  # trailing days for the robust slope


def theil_sen_slope(sf_dir: str) -> "pd.DataFrame":
    """Exact Theil-Sen robust slope of the trailing-64-day daily
    order counts — the median of all pairwise slopes (Δcount/Δdays),
    outlier-immune where trend_slopes' least squares is not, and
    EXACT: slopes compare as cross-multiplied integers (denominators
    positive), the lower median element (0-based rank (P−1)//2 under
    (value, dx, dd) order) is selected deterministically, and the
    output is its exact rational (slope_num, slope_den) plus
    slope_milli = ⌊1000·num/den⌋. Output one row:
    (n_days, n_pairs, slope_num, slope_den, slope_milli).

    Scale shape: one combiner-bounded day fold; the ≤ C(64,2) = 2016
    pair scan is driver arithmetic bounded by the WINDOW constant —
    the oracle mirrors with a rank-by-count self-join over the same
    bounded pair set."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        d = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        u, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {
                "day": pa.array(u, pa.int64()),
                "x": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(_Sum("x", alias_name="x"))
        .take_all()  # bounded: <= day span rows
    )
    rows.sort(key=lambda r: int(r["day"]))
    tail = rows[-THEIL_WINDOW:]
    days = np.array([int(r["day"]) for r in tail], np.int64)
    x = np.array([int(r["x"]) for r in tail], np.int64)
    n = len(days)
    ii, jj = np.triu_indices(n, 1)
    dx = x[jj] - x[ii]
    dd = days[jj] - days[ii]
    p = len(dx)
    # deterministic lower-median under (value, dx, dd): value order
    # via cross-multiplied comparison — sort by (dx/dd, dx, dd) using
    # a stable key: numpy lexsort over (dd, dx, dx*LCM? ) — compare
    # exactly by sorting with Fraction keys (bounded P, driver-side)
    from fractions import Fraction

    order = sorted(
        range(p), key=lambda k: (Fraction(int(dx[k]), int(dd[k])),
                                 int(dx[k]), int(dd[k]))
    )
    sel = order[(p - 1) // 2]
    num, den = int(dx[sel]), int(dd[sel])
    milli = (1000 * num) // den
    df = pd.DataFrame(
        [
            {
                "n_days": n,
                "n_pairs": p,
                "slope_num": num,
                "slope_den": den,
                "slope_milli": milli,
            }
        ]
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def revenue_bridge(sf_dir: str) -> "pd.DataFrame":
    """Exact revenue bridge (mix-shift decomposition) — per customer
    nation, first-half vs second-half revenue in integer cents with
    exact basis-point shares: the classic finance 'bridge' that
    splits growth into market growth vs mix shift, where
    share_delta_bp ≠ 0 localizes WHERE the mix moved (a nation can
    grow in cents yet shrink in share). Output per nation:
    (nation, r1_cents, r2_cents, delta_cents, share1_bp, share2_bp,
    share_delta_bp) — shares floor against each half's exact total.

    Scale shape: the spearman union join attaches the nation (never
    a customer broadcast); one bounded (nation, half) cents fold;
    the share arithmetic is driver work over ≤ nations rows."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    DAY_US = 86_400_000_000
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    lohi_d = orders.aggregate(_Min("o_orderdate"), _Max("o_orderdate"))
    dlo = int(pd.Timestamp(lohi_d["min(o_orderdate)"]).value // 1000) // DAY_US
    dhi = int(pd.Timestamp(lohi_d["max(o_orderdate)"]).value // 1000) // DAY_US
    mid = (dlo + dhi) // 2

    def cust_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "custkey": batch.column("c_custkey").cast(pa.int64()),
                "nation": batch.column("c_nationkey").cast(pa.int64()),
                "half": pa.array(np.zeros(n, np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        day = (
            batch.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // DAY_US
        )
        n = batch.num_rows
        return pa.table(
            {
                "custkey": batch.column("o_custkey").cast(pa.int64()),
                "nation": pa.array(np.zeros(n, np.int64), pa.int64()),
                "half": pa.array((day > mid).astype(np.int64), pa.int64()),
                "cents": _cents(batch.column("o_totalprice")),
                "side": pa.array(np.ones(n, np.int64), pa.int64()),
            }
        )

    def attach(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        if not (side == 0).any() or not (side == 1).any():
            return pa.table(
                {
                    "nation": pa.array([], pa.int64()),
                    "half": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        nation = int(
            group.column("nation").to_numpy(zero_copy_only=False)[side == 0][0]
        )
        half = group.column("half").to_numpy(zero_copy_only=False)[side == 1]
        cents = group.column("cents").to_numpy(zero_copy_only=False)[side == 1]
        out = np.zeros(2, np.int64)
        np.add.at(out, half, cents)
        return pa.table(
            {
                "nation": pa.array([nation, nation], pa.int64()),
                "half": pa.array([0, 1], pa.int64()),
                "cents": pa.array(out, pa.int64()),
            }
        )

    grid = (
        cust.map_batches(cust_side, batch_format="pyarrow")
        .union(orders.map_batches(order_side, batch_format="pyarrow"))
        .groupby("custkey")
        .map_groups(attach, batch_format="pyarrow")
        .groupby(["nation", "half"])
        .aggregate(_Sum("cents", alias_name="cents"))
        .take_all()  # bounded: <= 2 * nations rows
    )
    r: dict[int, list] = {}
    for row in grid:
        r.setdefault(int(row["nation"]), [0, 0])[int(row["half"])] = int(
            row["cents"]
        )
    t1 = sum(v[0] for v in r.values())
    t2 = sum(v[1] for v in r.values())
    out = [
        {
            "nation": n,
            "r1_cents": v[0],
            "r2_cents": v[1],
            "delta_cents": v[1] - v[0],
            "share1_bp": v[0] * 10000 // t1 if t1 else 0,
            "share2_bp": v[1] * 10000 // t2 if t2 else 0,
        }
        for n, v in r.items()
    ]
    for o in out:
        o["share_delta_bp"] = o["share2_bp"] - o["share1_bp"]
    df = pd.DataFrame(out).sort_values("nation", ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def sequence_gap_audit(sf_dir: str) -> "pd.DataFrame":
    """Line-number sequence completeness audit — lineitem's
    l_linenumber should enumerate 1..k within every order; the audit
    reports exactly how many orders violate that (gaps, wrong
    starts, duplicates) — the ingestion-integrity check
    data_quality_audit's row-level rules can't express because it
    needs the WHOLE group. An order passes iff min = 1, max = count,
    and the line numbers are distinct (equivalently: distinct count
    = count AND min = 1 AND max = count). Output one row:
    (n_orders, n_ok, n_bad_start, n_gapped, n_duped,
    max_linenumber).

    Scale shape: per-batch per-order partials (min, max, count,
    distinct-count via sorted unique) → ONE orderkey-keyed
    co-partition finalizes each order and folds the five counters —
    a handful of int64s per partition reach the driver."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        k = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ln = batch.column("l_linenumber").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        P = 1 << 20  # linenumbers < 2^20 by contract
        key = k * P + ln  # dedupe-aware partial
        u, cnt = np.unique(key, return_counts=True)
        uk = u // P
        uln = u % P
        return pa.table(
            {
                "okey": pa.array(uk, pa.int64()),
                "ln": pa.array(uln, pa.int64()),
                "m": pa.array(cnt.astype(np.int64), pa.int64()),
                "part": pa.array(uk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def per_part(part_tbl: pa.Table) -> pa.Table:
        k = part_tbl.column("okey").to_numpy(zero_copy_only=False)
        ln = part_tbl.column("ln").to_numpy(zero_copy_only=False)
        m = part_tbl.column("m").to_numpy(zero_copy_only=False)
        P = 1 << 20
        key = k * P + ln
        order = np.argsort(key, kind="stable")
        ms = m[order]
        u, start = np.unique(key[order], return_index=True)
        mm = np.add.reduceat(ms, start)  # final multiplicity
        uk = u // P
        uln = u % P
        ouniq, ostart = np.unique(uk, return_index=True)
        n_lines = np.add.reduceat(mm, ostart)
        n_dist = np.diff(np.append(ostart, len(uk)))
        mn = np.minimum.reduceat(uln, ostart)
        mx = np.maximum.reduceat(uln, ostart)
        duped = n_dist != n_lines
        bad_start = mn != 1
        gapped = mx != n_dist  # with distinct lines, max != distinct
        ok = ~(duped | bad_start | (mx != n_lines))
        return pa.table(
            {
                "n_orders": pa.array([len(ouniq)], pa.int64()),
                "n_ok": pa.array([int(ok.sum())], pa.int64()),
                "n_bad_start": pa.array([int(bad_start.sum())], pa.int64()),
                "n_gapped": pa.array(
                    [int((gapped & ~duped).sum())], pa.int64()
                ),
                "n_duped": pa.array([int(duped.sum())], pa.int64()),
                "max_linenumber": pa.array([int(mx.max())], pa.int64()),
            }
        )

    folded = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow")
        .aggregate(
            _Sum("n_orders", alias_name="n_orders"),
            _Sum("n_ok", alias_name="n_ok"),
            _Sum("n_bad_start", alias_name="n_bad_start"),
            _Sum("n_gapped", alias_name="n_gapped"),
            _Sum("n_duped", alias_name="n_duped"),
            _Max("max_linenumber", alias_name="max_linenumber"),
        )
    )
    df = pd.DataFrame([{k: int(v) for k, v in folded.items()}])
    return df[
        ["n_orders", "n_ok", "n_bad_start", "n_gapped", "n_duped",
         "max_linenumber"]
    ]


def kendall_matrix_daily(sf_dir: str) -> "pd.DataFrame":
    """Pairwise Kendall dependence MATRIX of the five event types'
    daily count series — the rank-robust co-movement panel ('do
    errors and purchases move together day to day?') that
    xcorr_lag_profile's lag-0 Pearson row reads linearly and
    outliers can flip: per unordered type pair, over the days where
    BOTH series have counts, the exact tau-b sufficient statistics
    (n_days, n1, n2, n3, disc) with disc = `_inv_count` of y under
    (x, y) order — kendall_tau's statistic, swept across all
    C(5,2) = 10 pairs. Output one row per pair.

    Scale shape: one combiner-bounded (type, day) fold; the pair
    sweep is driver arithmetic over the bounded day spans (the
    xcorr/runs_test driver-read contract), merge-sort counting per
    pair."""
    import itertools

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        et = batch.column("event_type").to_pandas().to_numpy(dtype=object)
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        g = (
            pd.DataFrame({"et": et, "day": d, "n": 1})
            .groupby(["et", "day"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "et": pa.array(g["et"], pa.string()),
                "day": pa.array(g["day"].to_numpy(np.int64), pa.int64()),
                "x": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    rows = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby(["et", "day"])
        .aggregate(_Sum("x", alias_name="x"))
        .take_all()  # bounded: <= |types| * day span rows
    )
    series: dict[str, dict[int, int]] = {}
    for r in rows:
        series.setdefault(r["et"], {})[int(r["day"])] = int(r["x"])
    out = []
    for ta, tb in itertools.combinations(sorted(series), 2):
        days = sorted(set(series[ta]) & set(series[tb]))
        x = np.array([series[ta][d] for d in days], np.int64)
        y = np.array([series[tb][d] for d in days], np.int64)
        n = len(days)
        order = np.lexsort((y, x))
        disc = _inv_count(y[order])
        _, xc = np.unique(x, return_counts=True)
        _, yc = np.unique(y, return_counts=True)
        _, jc = np.unique(
            x * (np.int64(y.max()) + 1) + y, return_counts=True
        ) if n else (None, np.array([], np.int64))
        out.append(
            {
                "type_a": ta,
                "type_b": tb,
                "n_days": n,
                "n1": int((xc.astype(np.int64) * (xc - 1) // 2).sum()),
                "n2": int((yc.astype(np.int64) * (yc - 1) // 2).sum()),
                "n3": int((jc.astype(np.int64) * (jc - 1) // 2).sum()),
                "disc": disc,
            }
        )
    df = pd.DataFrame(out).sort_values(
        ["type_a", "type_b"], ignore_index=True
    )
    for c in ["n_days", "n1", "n2", "n3", "disc"]:
        df[c] = df[c].astype("int64")
    return df


KLAD_LEVELS = 7  # width-doubling generalization levels audited


def k_anon_ladder(sf_dir: str) -> "pd.DataFrame":
    """k-anonymity generalization ladder — the REMEDIATION dial
    k_anonymity_audit's snapshot doesn't give: starting from the
    release QI (nation, segment, $1000 balance bucket), each level
    DOUBLES the balance-bucket width (merging adjacent buckets, so
    level l's classes are exact unions of level 0's), and the ladder
    reports per level the class count, the smallest class, and the
    rows still living in classes under k = 5 — the level where
    n_rows_under_5 hits zero is the minimal generalization that
    makes the release safe. Output per level:
    (level, width_dollars, n_classes, min_class, n_rows_under_5).

    Scale shape: ONE bounded (nation, segment, bucket) count-grid
    fold; every level is exact integer re-aggregation of that grid
    on the driver (bucket >> level), so the whole ladder costs one
    exchange."""
    import collections

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        nk, bucket, seg = _kanon_qi(batch, with_segment=True)
        g = (
            pd.DataFrame({"nk": nk, "b": bucket, "seg": seg, "n": 1})
            .groupby(["nk", "b", "seg"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "nk": pa.array(g["nk"].to_numpy(np.int64), pa.int64()),
                "b": pa.array(g["b"].to_numpy(np.int64), pa.int64()),
                "seg": pa.array(g["seg"], pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    grid = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["nk", "b", "seg"])
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()  # bounded: <= nations * segments * buckets rows
    )
    out = []
    for level in range(KLAD_LEVELS):
        agg: collections.Counter = collections.Counter()
        for r in grid:
            agg[(int(r["nk"]), r["seg"], int(r["b"]) >> level)] += int(
                r["n"]
            )
        sizes = np.array(list(agg.values()), np.int64)
        out.append(
            {
                "level": level,
                "width_dollars": 1000 * (1 << level),
                "n_classes": len(sizes),
                "min_class": int(sizes.min()),
                "n_rows_under_5": int(sizes[sizes < 5].sum()),
            }
        )
    df = pd.DataFrame(out)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def hll_union_error(sf_dir: str) -> "pd.DataFrame":
    """Measured HyperLogLog UNION-algebra error — the property that
    justifies shipping sketches instead of sets: registers merge by
    elementwise max, so |A ∪ B| estimates WITHOUT re-reading either
    stream. Splitting the event stream at the date midpoint, this
    builds both halves' register tables in ONE pass, merges them,
    and reports the exact-rational raw estimates (the
    hll_error_eval α_m convention, no floats) for H1, H2, and the
    union against the exact distinct-user counts — union_err is the
    number a capacity planner actually absorbs when combining
    per-shard sketches. Output one row: (m, n_h1, n_h2, n_union,
    est_h1_x1000, est_h2_x1000, est_union_x1000, union_err_x1000).

    Scale shape: per-batch distinct (half, user) md5-rho partials →
    one ≤2·2^P-row Max grid; exact counts are one distinct fold per
    axis; the estimator touches 512 ints on the driver."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    from ..functions.textstats import md5_int60

    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def day_rows(batch: pa.Table) -> pa.Table:
        d = (
            batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {"day": pa.array(d, pa.int64()), "user": pa.array(u, pa.int64())}
        )

    days = ev.map_batches(day_rows, batch_format="pyarrow").materialize()
    lim = days.aggregate(_Min("day"), _Max("day"))
    mid = (int(lim["min(day)"]) + int(lim["max(day)"])) // 2

    def reg_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("day").to_numpy(zero_copy_only=False)
        u = batch.column("user").to_numpy(zero_copy_only=False)
        half = (d > mid).astype(np.int64)
        key = np.unique(u * 2 + half)
        uu, hh = key // 2, key % 2
        h = np.array([md5_int60(str(x)) for x in uu], dtype=np.int64)
        bucket = h >> HLL_W
        suffix = h & (HLL_SUFFIX_MOD - 1)
        bl = _bit_length(suffix)
        rho = np.where(suffix > 0, HLL_W - bl + 1, HLL_W + 1)
        t = pa.table(
            {
                "hb": pa.array(hh * (1 << HLL_P) + bucket, pa.int64()),
                "rho": pa.array(rho.astype(np.int64), pa.int64()),
            }
        )
        g = t.group_by("hb").aggregate([("rho", "max")])
        return pa.table(
            {"hb": g.column("hb"), "max_rho": g.column("rho_max")}
        )

    regs_rows = (
        days.map_batches(reg_partial, batch_format="pyarrow")
        .groupby("hb")
        .aggregate(_Max("max_rho", alias_name="max_rho"))
        .take_all()  # bounded: <= 2 * 2^P rows
    )
    m = 1 << HLL_P
    regs = [dict(), dict()]
    for r in regs_rows:
        hb = int(r["hb"])
        regs[hb // m][hb % m] = int(r["max_rho"])
    union = {b: max(regs[0].get(b, 0), regs[1].get(b, 0))
             for b in range(m)}

    def est_x1000(rg: dict) -> int:
        s = sum(1 << (53 - rg.get(b, 0)) for b in range(m))
        den = HLL_ALPHA_DEN_BASE * (1000 * m + 1079)
        return HLL_ALPHA_NUM * (m ** 3) * (1 << 53) * 1000 // (den * s)

    def half_counts(batch: pa.Table) -> pa.Table:
        d = batch.column("day").to_numpy(zero_copy_only=False)
        u = batch.column("user").to_numpy(zero_copy_only=False)
        half = (d > mid).astype(np.int64)
        key = np.unique(u * 2 + half)
        return pa.table({"key": pa.array(key, pa.int64())})

    uh = (
        days.map_batches(half_counts, batch_format="pyarrow")
        .groupby("key")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )

    def hist(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "h1": pa.array([int((k % 2 == 0).sum())], pa.int64()),
                "h2": pa.array([int((k % 2 == 1).sum())], pa.int64()),
            }
        )

    hc = uh.map_batches(hist, batch_format="pyarrow").aggregate(
        _Sum("h1", alias_name="h1"), _Sum("h2", alias_name="h2")
    )

    def user_rows(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(np.unique(k // 2), pa.int64())})

    n_union = (
        uh.map_batches(user_rows, batch_format="pyarrow")
        .groupby("u")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .count()
    )
    eu = est_x1000(union)
    df = pd.DataFrame(
        [
            {
                "m": m,
                "n_h1": int(hc["h1"]),
                "n_h2": int(hc["h2"]),
                "n_union": n_union,
                "est_h1_x1000": est_x1000(regs[0]),
                "est_h2_x1000": est_x1000(regs[1]),
                "est_union_x1000": eu,
                "union_err_x1000": eu - 1000 * n_union,
            }
        ]
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def cmh_test(sf_dir: str) -> "pd.DataFrame":
    """Exact Cochran-Mantel-Haenszel sufficient statistics — the
    STRATIFIED 2×2 association test that completes the categorical
    family (chi2_independence tests the marginal table; CMH tests
    exposure→outcome WITHIN strata, immune to the confounding that
    makes marginal associations lie — Simpson's paradox, quantified):
    strata = market segment, exposure = non-negative account
    balance, outcome = customer placed ≥ 1 order. Per stratum the
    exact 2×2 row (stratum, a, r1, c1, n) where a = exposed∧outcome,
    r1/c1 = margins: the CMH statistic
    (Σa − Σ r1·c1/n)² / Σ r1·c1·(n−r1)(n−c1)/(n²(n−1)) is exact
    rational arithmetic downstream, per-stratum expectations never
    floored early. Output one row per stratum.

    Scale shape: the customer projection and an orders semi-join
    flag meet in one custkey co-partition (never a broadcast); the
    2×2 grid folds in a bounded ≤|segments|-cell exchange."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )

    def cust_side(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ck": pa.array(ck, pa.int64()),
                "seg": batch.column("c_mktsegment"),
                "exposed": pa.array((bal >= 0).astype(np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(ck), np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        ck = np.unique(
            batch.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        return pa.table(
            {
                "ck": pa.array(ck, pa.int64()),
                "seg": pa.array([""] * len(ck), pa.string()),
                "exposed": pa.array(np.zeros(len(ck), np.int64), pa.int64()),
                "side": pa.array(np.ones(len(ck), np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def grid_part(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        ck = part_tbl.column("ck").to_numpy(zero_copy_only=False)
        seg = part_tbl.column("seg").to_pandas().to_numpy(dtype=object)
        ex = part_tbl.column("exposed").to_numpy(zero_copy_only=False)
        side = part_tbl.column("side").to_numpy(zero_copy_only=False)
        buyers = np.unique(ck[side == 1])
        cmask = side == 0
        has = np.isin(ck[cmask], buyers).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "seg": seg[cmask],
                    "n": 1,
                    "r1": ex[cmask],
                    "c1": has,
                    "a": ex[cmask] * has,
                }
            )
            .groupby("seg", sort=False)
            .agg(n=("n", "sum"), r1=("r1", "sum"), c1=("c1", "sum"),
                 a=("a", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "stratum": pa.array(g["seg"], pa.string()),
                "a": pa.array(g["a"].to_numpy(np.int64), pa.int64()),
                "r1": pa.array(g["r1"].to_numpy(np.int64), pa.int64()),
                "c1": pa.array(g["c1"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    rows = (
        cust.map_batches(cust_side, batch_format="pyarrow")
        .union(orders.map_batches(order_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(grid_part, batch_format="pyarrow")
        .groupby("stratum")
        .aggregate(
            _Sum("a", alias_name="a"),
            _Sum("r1", alias_name="r1"),
            _Sum("c1", alias_name="c1"),
            _Sum("n", alias_name="n"),
        )
        .take_all()  # bounded: one row per segment
    )
    df = pd.DataFrame(rows).sort_values("stratum", ignore_index=True)
    for c in ["a", "r1", "c1", "n"]:
        df[c] = df[c].astype("int64")
    return df[["stratum", "a", "r1", "c1", "n"]]


def hodges_lehmann(sf_dir: str) -> "pd.DataFrame":
    """Exact Hodges-Lehmann pseudo-median per market segment — the
    median of the Walsh-average multiset {(x_i + x_j)/2 : i ≤ j} over
    customer balances (integer cents): the location estimator dual to
    the Wilcoxon signed-rank test, ~95% Gaussian-efficient yet with a
    29% breakdown point — the robust-location leg the stats family
    lacks (`winsorized_stats` trims by quantile, `tukey_fences` flags
    by IQR, `theil_sen_slope` is the HL idea applied to slopes; this
    is the HL estimator itself). To stay in integers the output is
    the lower/upper middle ORDER STATISTICS of the Walsh-SUM multiset
    (x_i + x_j, i ≤ j): hl_cents = (walsh_lo + walsh_hi) / 4.

    Scale shape: never materializes the O(n²) pair multiset — a
    per-batch (segment, cents) → count pre-reduction bounds the
    shuffled rows by the DISCRETE balance domain (acctbal spans
    [-999.99, 9999.99]: ≤ 1.1M distinct cents, the `weighted_median`
    contract), then per-segment the k-th smallest Walsh sum is found
    by binary search over the sum domain with a vectorized
    two-pointer/prefix-sum count of pairs ≤ T (O(D log D) per probe,
    ~22 probes) — selection over n² implicit pairs at histogram
    cost. Output (segment, n, walsh_lo, walsh_hi)."""
    import pandas as pd

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        cents = np.floor(bal * 100.0 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "seg": batch.column("c_mktsegment"),
                "v": pa.array(cents, pa.int64()),
                "c": pa.array(np.ones(len(cents), np.int64), pa.int64()),
            }
        ).group_by(["seg", "v"]).aggregate([("c", "sum")])
        return pa.table(
            {
                "seg": t.column("seg"),
                "v": t.column("v"),
                "c": t.column("c_sum").cast(pa.int64()),
            }
        )

    def pick(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = group.to_pandas().groupby("v", sort=True)["c"].sum()
        vals = df.index.to_numpy(dtype=np.int64)
        cnt = df.to_numpy(dtype=np.int64)
        cum = cnt.cumsum()
        n = int(cum[-1])
        m = n * (n + 1) // 2
        k1, k2 = (m + 1) // 2, m // 2 + 1

        def pairs_le(t: int) -> int:
            # ordered pairs (any order, incl i=j) with v_i + v_j <= t
            idx = np.searchsorted(vals, t - vals, side="right") - 1
            w = np.where(idx >= 0, cum[np.maximum(idx, 0)], 0)
            p = int((cnt * w).sum())
            d = int(cnt[2 * vals <= t].sum())
            return (p + d) // 2

        def kth(k: int) -> int:
            lo, hi = int(2 * vals[0]), int(2 * vals[-1])
            while lo < hi:
                mid = (lo + hi) // 2
                if pairs_le(mid) >= k:
                    hi = mid
                else:
                    lo = mid + 1
            return lo

        return pa.table(
            {
                "segment": pa.array(
                    [group.column("seg")[0].as_py()], pa.string()
                ),
                "n": pa.array([n], pa.int64()),
                "walsh_lo": pa.array([kth(k1)], pa.int64()),
                "walsh_hi": pa.array([kth(k2)], pa.int64()),
            }
        )

    rows = (
        cust.map_batches(partials, batch_format="pyarrow")
        .groupby("seg")
        .map_groups(pick, batch_format="pyarrow")
        .take_all()  # bounded: one row per segment
    )
    df = pd.DataFrame(rows).sort_values("segment", ignore_index=True)
    for c in ["n", "walsh_lo", "walsh_hi"]:
        df[c] = df[c].astype("int64")
    return df[["segment", "n", "walsh_lo", "walsh_hi"]]


def roaring_container_audit(sf_dir: str) -> "pd.DataFrame":
    """Roaring-bitmap CONTAINER plan for the distinct order-key set —
    per 2^16-value chunk, the exact distinct count, the number of
    maximal consecutive-integer runs, and the container the Roaring
    rules pick with its serialized cost: `array` (2 bytes/value) when
    ≤ 4096 values, `bitmap` (fixed 8 KiB) above, overridden by `run`
    (2 + 4·runs bytes) when cheaper — the storage layout every
    bitmap-index / posting-list engine (Lucene, ClickHouse, Druid,
    Pilosa) derives from exactly these three numbers. TPC-H order
    keys are gappy by construction (3 of every 4 key slots unused),
    so chunks sit near the array/run boundary and the audit is a
    non-trivial planning decision per chunk — the per-container
    complement to `bitmap_index_audit`'s per-column view and
    `rle_encoding_audit`'s sorted-column runs.

    Scale shape: per-batch pre-distinct bounds the shuffled rows by
    distinct keys per batch; one coarse chunk-keyed exchange
    co-locates each chunk (a chunk's rows never straddle
    partitions), then the census is one vectorized np.unique/diff
    per partition. Output one row per chunk, ordered."""
    import pandas as pd

    from ..stages.shuffle import N_COARSE_PARTS

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        v = np.unique(
            batch.column("o_orderkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        chunk = v >> 16
        return pa.table(
            {
                "chunk": pa.array(chunk, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "part": pa.array(chunk % N_COARSE_PARTS, pa.int64()),
            }
        )

    def census(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = pd.DataFrame(
            {
                "chunk": part_tbl.column("chunk").to_numpy(
                    zero_copy_only=False
                ),
                "v": part_tbl.column("v").to_numpy(zero_copy_only=False),
            }
        )
        rows = []
        for chunk, g in df.groupby("chunk", sort=True):
            vals = np.unique(g["v"].to_numpy(np.int64))
            n = len(vals)
            runs = 1 + int((np.diff(vals) > 1).sum()) if n else 0
            run_cost = 2 + 4 * runs
            alt_cost = 2 * n if n <= 4096 else 8192
            if run_cost < alt_cost:
                cont, cost = "run", run_cost
            elif n <= 4096:
                cont, cost = "array", alt_cost
            else:
                cont, cost = "bitmap", alt_cost
            rows.append((int(chunk), n, runs, cont, cost))
        return pa.table(
            {
                "chunk": pa.array([r[0] for r in rows], pa.int64()),
                "n_values": pa.array([r[1] for r in rows], pa.int64()),
                "n_runs": pa.array([r[2] for r in rows], pa.int64()),
                "container": pa.array([r[3] for r in rows], pa.string()),
                "est_bytes": pa.array([r[4] for r in rows], pa.int64()),
            }
        )

    df = (
        orders.map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: census(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    for c in ["chunk", "n_values", "n_runs", "est_bytes"]:
        df[c] = df[c].astype("int64")
    return df.sort_values("chunk", ignore_index=True)[
        ["chunk", "n_values", "n_runs", "container", "est_bytes"]
    ]


TA_K = 8                    # rank-join top-k
TA_GRID = (1, 2, 4, 8, 16, 32, 64, 128, 256)  # audited sorted-access depths


def ta_topk_depth_audit(sf_dir: str) -> "pd.DataFrame":
    """Fagin Threshold-Algorithm EARLY-TERMINATION audit for the
    rank-join top-k over two part scores (s1 = retail-price cents,
    s2 = 1000·size): at each audited sorted-access depth d, the
    exact TA state — threshold T(d) = s1@d + s2@d (the d-th entries
    of the two descending lists, ties broken by part id), the number
    of items SEEN (rank ≤ d in either list), and the k-th best exact
    total among seen items — plus the stop flag kth_best ≥ T(d).
    The first stopped depth is how deep a top-k rank join must scan
    before the TA bound certifies the answer: the measurement behind
    choosing sorted-access prefetch for any score-combining top-k
    (retrieval fusion, `rrf_fusion`'s cousin with a certificate).

    Scale shape: the two depth-256 list prefixes come from two
    bounded sort-limits (driver holds 2·256 rows — the audited-depth
    contract); the cutoffs broadcast in-closure and item scoring is
    ONE streaming pass emitting per-(depth) partials: a seen-count
    cell plus the batch-local top-k totals; the global k-th best is
    a per-depth top-k merge over ≤ k·|grid| rows per partition fold.
    Never a full rank materialization, never a driver scan."""
    import pandas as pd

    parts_ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice", "p_size"],
    )

    def score(batch: pa.Table) -> pa.Table:
        pk = batch.column("p_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        s1 = np.floor(
            batch.column("p_retailprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        s2 = batch.column("p_size").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) * 1000
        return pa.table(
            {
                "id": pa.array(pk, pa.int64()),
                "s1": pa.array(s1, pa.int64()),
                "s2": pa.array(s2, pa.int64()),
            }
        )

    scored = parts_ds.map_batches(score, batch_format="pyarrow").materialize()
    n_items = scored.count()
    grid = [d for d in TA_GRID if d <= n_items]
    max_d = grid[-1]

    pre1 = scored.sort(["s1", "id"], descending=[True, False]).limit(
        max_d
    ).take_all()
    pre2 = scored.sort(["s2", "id"], descending=[True, False]).limit(
        max_d
    ).take_all()
    cut1 = [(int(pre1[d - 1]["s1"]), int(pre1[d - 1]["id"])) for d in grid]
    cut2 = [(int(pre2[d - 1]["s2"]), int(pre2[d - 1]["id"])) for d in grid]
    thresholds = {
        d: cut1[i][0] + cut2[i][0] for i, d in enumerate(grid)
    }

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        s1 = batch.column("s1").to_numpy(zero_copy_only=False)
        s2 = batch.column("s2").to_numpy(zero_copy_only=False)
        total = s1 + s2
        d_out, seen_out, tot_out = [], [], []
        for i, d in enumerate(grid):
            c1v, c1i = cut1[i]
            c2v, c2i = cut2[i]
            seen = (
                (s1 > c1v)
                | ((s1 == c1v) & (ids <= c1i))
                | (s2 > c2v)
                | ((s2 == c2v) & (ids <= c2i))
            )
            tops = np.sort(total[seen])[::-1][:TA_K]
            d_out.extend([d] * (1 + len(tops)))
            seen_out.append(int(seen.sum()))
            seen_out.extend([0] * len(tops))
            tot_out.append(-1)
            tot_out.extend(int(t) for t in tops)
        return pa.table(
            {
                "d": pa.array(d_out, pa.int64()),
                "n_seen": pa.array(seen_out, pa.int64()),
                "cand": pa.array(tot_out, pa.int64()),
            }
        )

    def per_depth(group: pa.Table) -> pa.Table:
        d = int(group.column("d")[0].as_py())
        seen = int(
            group.column("n_seen").to_numpy(zero_copy_only=False).sum()
        )
        cand = group.column("cand").to_numpy(zero_copy_only=False)
        cand = np.sort(cand[cand >= 0])[::-1]
        kth = int(cand[TA_K - 1]) if len(cand) >= TA_K and seen >= TA_K else -1
        return pa.table(
            {
                "depth": pa.array([d], pa.int64()),
                "n_seen": pa.array([seen], pa.int64()),
                "kth_best": pa.array([kth], pa.int64()),
            }
        )

    rows = (
        scored.map_batches(partials, batch_format="pyarrow")
        .groupby("d")
        .map_groups(per_depth, batch_format="pyarrow")
        .take_all()  # bounded: one row per audited depth
    )
    df = pd.DataFrame(rows).sort_values("depth", ignore_index=True)
    df["threshold"] = df["depth"].map(thresholds)
    df["stopped"] = (
        (df["kth_best"] >= 0) & (df["kth_best"] >= df["threshold"])
    ).astype("int64")
    for c in ["depth", "n_seen", "threshold", "kth_best", "stopped"]:
        df[c] = df[c].astype("int64")
    return df[["depth", "n_seen", "threshold", "kth_best", "stopped"]]


HAAR_L = 12                 # series padded to 2^12 = 4096 days
HAAR_TOP_K = 16             # synopsis size
HAAR_EPOCH = np.datetime64("1992-01-01")


def haar_synopsis(sf_dir: str) -> "pd.DataFrame":
    """Exact Haar-wavelet SYNOPSIS of the daily-revenue series — the
    top-16 detail coefficients of the unnormalized (integer) Haar
    transform of day-indexed revenue cents (zero-padded to 2^12),
    ranked by exact basis energy d²·2^{L−l}: the classic wavelet
    synopsis every approximate-query engine keeps instead of the
    full series (Matias/Vitter/Wang SIGMOD'98), and the
    multi-RESOLUTION complement to the time-series family here
    (`ewma_daily` smooths, `seasonality_dow` reads one period,
    `changepoint_split` finds one break; the wavelet ranking says
    WHICH scales carry the series' energy — a top-heavy low-level
    set means high-frequency noise, top-heavy high-level
    coefficients mean seasonal/trend structure). Integer sums/differences keep every
    coefficient exact; energies are compared in arbitrary precision
    (Python int / HUGEINT) so the ranking is bit-stable. Output
    (rnk, level, pos, coef), rnk 1..16 by (energy desc, level, pos).

    Scale shape: one domain-bounded (day, cents) fold — the day
    domain is the 7-year TPC-H calendar (≤ 2 557 rows, the
    `kendall_matrix_daily` contract) — then the 4096-point transform
    is driver arithmetic. At a series too long to hold (10^9 points)
    the transform tiles: each 2^k block transforms independently in
    a map_groups and only block summaries recurse — the documented
    dial; the day-grid fixture never needs it."""
    import pandas as pd

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_extendedprice"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        d = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        day = ((d.astype("datetime64[D]") - HAAR_EPOCH) // np.timedelta64(
            1, "D"
        )).astype(np.int64)
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "day": pa.array(day, pa.int64()),
                "c": pa.array(cents, pa.int64()),
            }
        ).group_by("day").aggregate([("c", "sum")])
        return pa.table(
            {
                "day": t.column("day"),
                "c": t.column("c_sum").cast(pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    rows = (
        lit.map_batches(partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the 7-year day domain
    )
    n = 1 << HAAR_L
    series = [0] * n
    for r in rows:
        d = int(r["day"])
        if 0 <= d < n:
            series[d] = int(r["c"])

    details: list[tuple[int, int, int, int]] = []  # (energy, level, pos, d)
    s = series
    for level in range(1, HAAR_L + 1):
        nxt, det = [], []
        for i in range(0, len(s), 2):
            a, b = s[i], s[i + 1]
            nxt.append(a + b)
            det.append(a - b)
        for pos, d in enumerate(det):
            details.append((d * d * (1 << (HAAR_L - level)), level, pos, d))
        s = nxt

    details.sort(key=lambda t: (-t[0], t[1], t[2]))
    top = details[:HAAR_TOP_K]
    df = pd.DataFrame(
        {
            "rnk": np.arange(1, len(top) + 1, dtype=np.int64),
            "level": np.array([t[1] for t in top], np.int64),
            "pos": np.array([t[2] for t in top], np.int64),
            "coef": np.array([t[3] for t in top], np.int64),
        }
    )
    return df


HIST_SEL_B = 16             # equi-depth buckets
HIST_SEL_PREDS = (          # (pred_id, lo, hi) in cents, half-open
    (1, 100_000, 200_000),
    (2, 1_000_000, 2_000_000),
    (3, 2_000_000, 4_000_000),
    (4, 5_000_000, 10_000_000),
    (5, 0, 1_500_000),
    (6, 9_000_000, 99_999_999),
)


def histogram_selectivity_audit(sf_dir: str) -> "pd.DataFrame":
    """Equi-depth-histogram SELECTIVITY-ESTIMATION error — build the
    16-bucket equi-depth histogram the classical optimizer keeps for
    l_extendedprice (bucket b spans ranks ⌊b·n/16⌋+1..⌊(b+1)·n/16⌋;
    boundaries are exact order statistics) and, for six fixed range
    predicates, compare the textbook continuous-uniform
    interpolation estimate Σ_b n_b·overlap/width (integer floor
    arithmetic, half-open [min_b, max_b+1) domains) against the true
    count: the estimation-error table behind every cost model's
    range-scan cardinality, and the single-column complement to
    `selectivity_drift`'s correlation audit (this one measures
    WITHIN-column skew error, that one cross-column independence
    error). Output (pred_id, lo, hi, est_rows, true_rows, abs_err).

    Scale shape: the (cents, count) histogram fold is bounded by the
    discrete price domain (the `weighted_median` contract) and goes
    through one constant-key co-partition so boundaries, estimates
    and true counts are all computed VECTORIZED inside one task —
    the driver sees only the 6 output rows."""
    import pandas as pd

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "v": pa.array(cents, pa.int64()),
                "c": pa.array(np.ones(len(cents), np.int64), pa.int64()),
            }
        ).group_by("v").aggregate([("c", "sum")])
        return pa.table(
            {
                "v": t.column("v"),
                "c": t.column("c_sum").cast(pa.int64()),
                "g": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            }
        )

    def audit(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = group.to_pandas().groupby("v", sort=True)["c"].sum()
        vals = df.index.to_numpy(dtype=np.int64)
        cnt = df.to_numpy(dtype=np.int64)
        cum = cnt.cumsum()
        n = int(cum[-1])

        def at_rank(k: int) -> int:
            return int(vals[np.searchsorted(cum, k, side="left")])

        buckets = []
        for b in range(HIST_SEL_B):
            lo_r = b * n // HIST_SEL_B
            hi_r = (b + 1) * n // HIST_SEL_B
            if hi_r == lo_r:
                continue
            buckets.append(
                (hi_r - lo_r, at_rank(lo_r + 1), at_rank(hi_r))
            )

        def true_count(lo: int, hi: int) -> int:
            a = np.searchsorted(vals, lo, side="left")
            b2 = np.searchsorted(vals, hi, side="left")
            return int(cnt[a:b2].sum())

        out = []
        for pid, lo, hi in HIST_SEL_PREDS:
            est = 0
            for nb, minb, maxb in buckets:
                ov = min(hi, maxb + 1) - max(lo, minb)
                if ov > 0:
                    est += nb * ov // (maxb + 1 - minb)
            tr = true_count(lo, hi)
            out.append((pid, lo, hi, est, tr, abs(est - tr)))
        arr = np.array(out, np.int64)
        return pa.table(
            {
                "pred_id": pa.array(arr[:, 0], pa.int64()),
                "lo": pa.array(arr[:, 1], pa.int64()),
                "hi": pa.array(arr[:, 2], pa.int64()),
                "est_rows": pa.array(arr[:, 3], pa.int64()),
                "true_rows": pa.array(arr[:, 4], pa.int64()),
                "abs_err": pa.array(arr[:, 5], pa.int64()),
            }
        )

    df = (
        lit.map_batches(partials, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda g: audit(g.drop_columns(["g"])),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("pred_id", ignore_index=True)


CSK_D = 3          # count-sketch register rows
CSK_W = 256        # counters per row
CSK_EVAL_TOP = 20  # heaviest users probed


def count_sketch_error(sf_dir: str) -> "pd.DataFrame":
    """Measured Count-SKETCH error — the signed-median estimator
    (Charikar/Chen/Farach-Colton) next to `cms_error_eval`'s
    min-estimator: registers C[d][h_d(u)] accumulate s_d(u)·count
    with a ±1 hash sign, and the estimate is the MEDIAN over rows of
    s_d(u)·C[d][h_d(u)] — unbiased with TWO-sided error (collisions
    cancel in expectation), where Count-Min only ever overestimates.
    For the 20 heaviest users by exact count, (user_id, true_n,
    est_n, err = est−true): read against cms_error_eval's one-sided
    column, this is the sketch-family trade the curation pipeline
    picks between (biased-small-memory vs unbiased-needs-median).

    Scale shape: registers are PURE SUMS (layout-independent): each
    batch folds its unique users locally and emits signed (d, cell)
    contributions, Sum-reduced to the fixed D·W grid; exact top-20
    is one user fold + bounded sort-limit; the probe touches the
    broadcast-sized grid only. md5-derived cells/signs mirror the
    oracle bit-for-bit."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def _cells(u: int):
        h = _hashlib.md5(str(u).encode()).hexdigest()
        h1, h2 = int(h[:15], 16), int(h[15:30], 16)
        cells = [(h1 + d * h2) % CSK_W for d in range(CSK_D)]
        signs = [1 if int(h[29 + d], 16) % 2 == 0 else -1
                 for d in range(CSK_D)]
        return cells, signs

    def reg_partials(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            return_counts=True,
        )
        d_out, cell_out, val_out = [], [], []
        for uid, n in zip(u, cnt):
            cells, signs = _cells(int(uid))
            for d in range(CSK_D):
                d_out.append(d)
                cell_out.append(cells[d])
                val_out.append(signs[d] * int(n))
        return pa.table(
            {
                "d": pa.array(d_out, pa.int64()),
                "cell": pa.array(cell_out, pa.int64()),
                "val": pa.array(val_out, pa.int64()),
            }
        )

    grid = np.zeros((CSK_D, CSK_W), np.int64)
    for r in (
        ds.map_batches(reg_partials, batch_format="pyarrow")
        .groupby(["d", "cell"])
        .aggregate(_Sum("val", alias_name="val"))
        .take_all()  # bounded: the fixed D x W register grid
    ):
        grid[int(r["d"]), int(r["cell"])] = int(r["val"])

    def count_partials(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            return_counts=True,
        )
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    top = (
        ds.map_batches(count_partials, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(_Sum("n", alias_name="true_n"))
        .sort(["true_n", "user_id"], descending=[True, False])
        .limit(CSK_EVAL_TOP)
        .take_all()
    )

    def med3(a: int, b: int, c: int) -> int:
        return max(min(a, b), min(max(a, b), c))

    rows = []
    for r in top:
        uid, tn = int(r["user_id"]), int(r["true_n"])
        cells, signs = _cells(uid)
        ests = [signs[d] * int(grid[d, cells[d]]) for d in range(CSK_D)]
        est = med3(*ests)
        rows.append((uid, tn, est, est - tn))
    df = pd.DataFrame(
        rows, columns=["user_id", "true_n", "est_n", "err"]
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values(
        ["true_n", "user_id"], ascending=[False, True], ignore_index=True
    )


JO_TABLES = ("region", "nation", "customer", "orders")
# Per-table local filters (each table carries its own predicate into
# every join order, as a Selinger enumerator assumes):
JO_REGIONS = ("ASIA", "EUROPE")
JO_NATION_MIN = "J"              # n_name >= 'J'
JO_SEGMENT = "BUILDING"
JO_PRIORITY = "1-URGENT"


def join_order_sequences():
    """All left-deep cross-product-free join orders of the 4-table FK
    chain region-nation-customer-orders: start anywhere, extend the
    connected interval left or right (2^3 patterns, 8 valid). Returns
    [(order_str, [interval prefixes of len >= 2])], sorted by
    order_str — shared verbatim with the SQL oracle generator."""
    import itertools

    seqs = []
    for start in range(4):
        for pattern in itertools.product((0, 1), repeat=3):
            lo = hi = start
            order = [JO_TABLES[start]]
            intervals = []
            ok = True
            for b in pattern:
                if b == 1:
                    if hi == 3:
                        ok = False
                        break
                    hi += 1
                    order.append(JO_TABLES[hi])
                else:
                    if lo == 0:
                        ok = False
                        break
                    lo -= 1
                    order.append(JO_TABLES[lo])
                intervals.append((lo, hi))
            if ok:
                seqs.append((">".join(order), intervals))
    return sorted(seqs)


def join_order_costs(sf_dir: str) -> "pd.DataFrame":
    """Selinger-style left-deep join-ORDER enumeration with EXACT
    intermediate cardinalities — for each of the 8 cross-product-free
    left-deep orders of the filtered FK chain σ(region) ⋈ σ(nation)
    ⋈ σ(customer) ⋈ σ(orders), the cost Σ|prefix join| over all
    length-≥2 prefixes (the classic CP-free cost model), ranked. On
    an UNfiltered N:1 chain every interval collapses to the fact
    count and the enumeration is degenerate; the per-table filters
    make the interval sizes genuinely diverge, so the ranking shows
    the real Selinger phenomenon — push the most selective tables
    earliest — with EXACT sizes where an optimizer uses estimates
    (read next to `histogram_selectivity_audit`'s estimation error
    and `join_strategy_plan`'s physical-operator choice, this is the
    third leg: logical order). Output (ord, order_str, cost).

    Scale shape: the 10 interval cardinalities are 4 streaming
    filtered counts, 3 catalog-bounded lookups (region 5 rows /
    nation 25 rows broadcast in-closure), and ONE custkey
    co-partition carrying three 0/1 customer flags that scores
    |c⋈o|, |n⋈c⋈o|, |r⋈n⋈c⋈o| together — the driver sees 10 ints
    and ranks 8 constant rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from ..stages.shuffle import N_COARSE_PARTS

    region = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).take_all()  # bounded: 5-row catalog
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_regionkey", "n_name"],
    ).take_all()  # bounded: 25-row catalog

    rkeys_f = {
        int(r["r_regionkey"]) for r in region if r["r_name"] in JO_REGIONS
    }
    nat_f = [r for r in nation if r["n_name"] >= JO_NATION_MIN]
    nkeys_f = {int(r["n_nationkey"]) for r in nat_f}
    nkeys_rf = {
        int(r["n_nationkey"])
        for r in nat_f
        if int(r["n_regionkey"]) in rkeys_f
    }

    sizes = {
        (0, 0): len(rkeys_f),
        (1, 1): len(nat_f),
        (0, 1): len(nkeys_rf),
    }

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    nf_arr = np.array(sorted(nkeys_f), np.int64)
    nrf_arr = np.array(sorted(nkeys_rf), np.int64)

    def cust_side(batch: pa.Table) -> pa.Table:
        seg = batch.column("c_mktsegment").to_numpy(zero_copy_only=False)
        nk = batch.column("c_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        f_plain = (seg == JO_SEGMENT).astype(np.int64)
        f_n = f_plain * np.isin(nk, nf_arr).astype(np.int64)
        f_rn = f_plain * np.isin(nk, nrf_arr).astype(np.int64)
        return pa.table(
            {
                "ck": pa.array(ck, pa.int64()),
                "f_plain": pa.array(f_plain, pa.int64()),
                "f_n": pa.array(f_n, pa.int64()),
                "f_rn": pa.array(f_rn, pa.int64()),
                "side": pa.array(np.zeros(len(ck), np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        pr = batch.column("o_orderpriority").to_numpy(zero_copy_only=False)
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[pr == JO_PRIORITY]
        z = np.zeros(len(ck), np.int64)
        return pa.table(
            {
                "ck": pa.array(ck, pa.int64()),
                "f_plain": pa.array(z, pa.int64()),
                "f_n": pa.array(z, pa.int64()),
                "f_rn": pa.array(z, pa.int64()),
                "side": pa.array(np.ones(len(ck), np.int64), pa.int64()),
                "part": pa.array(ck % N_COARSE_PARTS, pa.int64()),
            }
        )

    def score(part_tbl: pa.Table) -> pa.Table:
        ck = part_tbl.column("ck").to_numpy(zero_copy_only=False)
        side = part_tbl.column("side").to_numpy(zero_copy_only=False)
        cm = side == 0
        c_ck = ck[cm]
        o_ck = ck[~cm]
        if len(c_ck) == 0 or len(o_ck) == 0:
            z = [0, 0, 0]
            return pa.table(
                {
                    "co": pa.array([z[0]], pa.int64()),
                    "nco": pa.array([z[1]], pa.int64()),
                    "rnco": pa.array([z[2]], pa.int64()),
                }
            )
        srt = np.argsort(c_ck)
        c_ck_s = c_ck[srt]
        idx = np.searchsorted(c_ck_s, o_ck)
        idx = np.clip(idx, 0, len(c_ck_s) - 1)
        hit = c_ck_s[idx] == o_ck
        out = []
        for col in ("f_plain", "f_n", "f_rn"):
            f = part_tbl.column(col).to_numpy(zero_copy_only=False)[cm][srt]
            out.append(int(f[idx[hit]].sum()))
        return pa.table(
            {
                "co": pa.array([out[0]], pa.int64()),
                "nco": pa.array([out[1]], pa.int64()),
                "rnco": pa.array([out[2]], pa.int64()),
            }
        )

    # customer-only interval sizes fold in the same pass as the flags;
    # the mapped side is materialized once and reused by the custkey
    # co-partition below (saves a second full customer scan+map)
    cust_mapped = cust.map_batches(
        cust_side, batch_format="pyarrow"
    ).materialize()
    c_sizes = cust_mapped.aggregate(
        _Sum("f_plain", alias_name="c"),
        _Sum("f_n", alias_name="nc"),
        _Sum("f_rn", alias_name="rnc"),
    )
    sizes[(2, 2)] = int(c_sizes["c"])
    sizes[(1, 2)] = int(c_sizes["nc"])
    sizes[(0, 2)] = int(c_sizes["rnc"])

    o_cnt = orders.map_batches(
        lambda b: pa.table(
            {
                "n": pa.array(
                    [
                        int(
                            (
                                b.column("o_orderpriority").to_numpy(
                                    zero_copy_only=False
                                )
                                == JO_PRIORITY
                            ).sum()
                        )
                    ],
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    ).aggregate(_Sum("n", alias_name="n"))
    sizes[(3, 3)] = int(o_cnt["n"])

    fact = (
        cust_mapped
        .union(orders.map_batches(order_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(
            lambda g: score(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .aggregate(
            _Sum("co", alias_name="co"),
            _Sum("nco", alias_name="nco"),
            _Sum("rnco", alias_name="rnco"),
        )
    )
    sizes[(2, 3)] = int(fact["co"])
    sizes[(1, 3)] = int(fact["nco"])
    sizes[(0, 3)] = int(fact["rnco"])

    rows = []
    for order_str, intervals in join_order_sequences():
        rows.append((order_str, sum(sizes[iv] for iv in intervals)))
    df = pd.DataFrame(rows, columns=["order_str", "cost"]).sort_values(
        ["cost", "order_str"], ignore_index=True
    )
    df.insert(0, "ord", np.arange(1, len(df) + 1, dtype=np.int64))
    df["cost"] = df["cost"].astype("int64")
    return df


PFOR_BITS = (2, 4, 6, 8, 12, 16)   # audited pack widths
PFOR_LOCAL_MAX = 2_000_000         # rows below which the audit runs width-1
PFOR_BUCKETS = 256                 # value grid for the sorted-delta pass


def pfor_exception_audit(sf_dir: str) -> "pd.DataFrame":
    """PForDelta PACK-WIDTH audit — for the sorted order-key stream,
    the exact exception census at each candidate bit width b: deltas
    that don't fit b bits become 8-byte exceptions, so the estimated
    layout cost is 8 (first value) + ⌈(n−1)·b/8⌉ (packed deltas) +
    8·exc(b), and the audited widths trace the classic FastPFOR
    cost valley — too narrow drowns in exceptions, too wide wastes
    every slot. This is the BIT-PACKED member of the storage family:
    `varint_cost_audit` prices the byte-aligned LEB128 layouts; the
    posting-list engines that beat varint do it with exactly this
    exception tradeoff. Output one row per width:
    (bits, n_deltas, n_exceptions, est_bytes, is_best).

    Scale shape: the sorted-delta stream is never globally sorted —
    width-1 escape below PFOR_LOCAL_MAX rows (one local sort+diff);
    above it, the `varint_cost_audit` value-bucket grid: per-bucket
    LOCAL sorted diffs fold a 6-counter exceedance vector plus
    (vmin, vmax, count), and the driver adds the one boundary delta
    per consecutive non-empty bucket pair from the bounded
    256-bucket grid."""
    import pandas as pd

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    )
    rows = orders.map_batches(
        lambda b: pa.table(
            {
                "v": b.column("o_orderkey").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    n_rows = rows.count()

    if n_rows < PFOR_LOCAL_MAX:

        def local(tbl: pa.Table) -> pa.Table:
            v = np.sort(tbl.column("v").to_numpy(zero_copy_only=False))
            d = np.diff(v)
            nd = len(d)
            out_b, out_e = [], []
            for b in PFOR_BITS:
                out_b.append(b)
                out_e.append(int((d >= (1 << b)).sum()))
            return pa.table(
                {
                    "bits": pa.array(out_b, pa.int64()),
                    "nd": pa.array([nd] * len(out_b), pa.int64()),
                    "exc": pa.array(out_e, pa.int64()),
                }
            )

        got = (
            rows.repartition(1)
            .map_batches(local, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        nd = int(got[0]["nd"]) if got else 0
        exc_map = {int(r["bits"]): int(r["exc"]) for r in got}
    else:
        from ray.data.aggregate import Max as _Max, Min as _Min

        lohi = rows.aggregate(_Min("v"), _Max("v"))
        vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
        wv = (vhi - vlo) // PFOR_BUCKETS + 1

        def keyed(batch: pa.Table) -> pa.Table:
            v = batch.column("v").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "cell", pa.array((v - vlo) // wv, pa.int64())
            )

        def bucket_census(group: pa.Table) -> pa.Table:
            cell = int(group.column("cell")[0].as_py())
            v = np.sort(group.column("v").to_numpy(zero_copy_only=False))
            d = np.diff(v)
            excs = [int((d >= (1 << b)).sum()) for b in PFOR_BITS]
            return pa.table(
                {
                    "cell": pa.array([cell], pa.int64()),
                    "cnt": pa.array([len(v)], pa.int64()),
                    "vmin": pa.array([int(v[0])], pa.int64()),
                    "vmax": pa.array([int(v[-1])], pa.int64()),
                    **{
                        f"e{b}": pa.array([e], pa.int64())
                        for b, e in zip(PFOR_BITS, excs)
                    },
                }
            )

        grid = (
            rows.map_batches(keyed, batch_format="pyarrow")
            .groupby("cell")
            .map_groups(bucket_census, batch_format="pyarrow")
            .take_all()  # bounded: the fixed 256-bucket grid
        )
        grid.sort(key=lambda r: int(r["cell"]))
        nd = sum(int(r["cnt"]) for r in grid) - 1 if grid else 0
        exc_map = {b: 0 for b in PFOR_BITS}
        prev_max = None
        for r in grid:
            for b in PFOR_BITS:
                exc_map[b] += int(r[f"e{b}"])
            if prev_max is not None:
                bd = int(r["vmin"]) - prev_max
                for b in PFOR_BITS:
                    if bd >= (1 << b):
                        exc_map[b] += 1
            prev_max = int(r["vmax"])

    out = []
    for b in PFOR_BITS:
        exc = exc_map.get(b, 0)
        est = 8 + (nd * b + 7) // 8 + 8 * exc
        out.append((b, nd, exc, est))
    import pandas as pd  # noqa: F811

    df = pd.DataFrame(
        out, columns=["bits", "n_deltas", "n_exceptions", "est_bytes"]
    )
    best = df.sort_values(["est_bytes", "bits"]).iloc[0]["bits"]
    df["is_best"] = (df["bits"] == best).astype("int64")
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("bits", ignore_index=True)


RR_FLIP_DEN = 4   # flip with probability 1/4 (hash-simulated)


def randomized_response_eval(sf_dir: str) -> "pd.DataFrame":
    """Randomized-response (Warner) DEBIASING eval — the local-DP
    mechanism simulated deterministically and closed exactly: each
    customer reports their sensitive bit (negative account balance)
    FLIPPED with probability 1/4 (an md5 bit of the customer key, so
    the 'coin' is reproducible), and the per-segment debiased
    estimate ŷ = (4·obs − n)/2 is compared to the true count. The
    LOCAL-privacy complement to `dp_sensitivity_audit`'s central
    sensitivity: this is the estimator a collector uses when it
    never sees true bits, and err_x2 measures the realized (not
    just expected) debiasing error on this corpus. All integer:
    est_x2 = 4·obs − n so est = est_x2/2. Output per segment:
    (stratum, n, true_yes, obs_yes, est_x2, err_x2).

    Scale shape: one streaming pass — per batch the md5 coin and
    both bits vectorize into four per-segment cells; one bounded
    ≤|segments| fold. No shuffle wider than the segment grid."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )

    def cells(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        y = (bal < 0).astype(np.int64)
        flip = np.array(
            [
                int(_hashlib.md5(str(int(c)).encode()).hexdigest()[:2], 16)
                % RR_FLIP_DEN
                == 0
                for c in ck
            ],
            np.int64,
        )
        obs = y ^ flip
        t = pa.table(
            {
                "stratum": batch.column("c_mktsegment"),
                "n": pa.array(np.ones(len(ck), np.int64), pa.int64()),
                "true_yes": pa.array(y, pa.int64()),
                "obs_yes": pa.array(obs, pa.int64()),
            }
        ).group_by("stratum").aggregate(
            [("n", "sum"), ("true_yes", "sum"), ("obs_yes", "sum")]
        )
        return pa.table(
            {
                "stratum": t.column("stratum"),
                "n": t.column("n_sum").cast(pa.int64()),
                "true_yes": t.column("true_yes_sum").cast(pa.int64()),
                "obs_yes": t.column("obs_yes_sum").cast(pa.int64()),
            }
        )

    rows = (
        cust.map_batches(cells, batch_format="pyarrow")
        .groupby("stratum")
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("true_yes", alias_name="true_yes"),
            _Sum("obs_yes", alias_name="obs_yes"),
        )
        .take_all()  # bounded: one row per segment
    )
    df = pd.DataFrame(rows).sort_values("stratum", ignore_index=True)
    for c in ["n", "true_yes", "obs_yes"]:
        df[c] = df[c].astype("int64")
    df["est_x2"] = 4 * df["obs_yes"] - df["n"]
    df["err_x2"] = df["est_x2"] - 2 * df["true_yes"]
    for c in ["est_x2", "err_x2"]:
        df[c] = df[c].astype("int64")
    return df[["stratum", "n", "true_yes", "obs_yes", "est_x2", "err_x2"]]


ST_LOCAL_MAX = 2_000_000   # rows below which the ranking runs width-1
ST_BUCKETS = 256           # value-range buckets for the distributed rank


def siegel_tukey(sf_dir: str) -> "pd.DataFrame":
    """Exact Siegel-Tukey rank-DISPERSION test statistics — the
    scale-difference leg of the nonparametric family: ranks are
    assigned ALTERNATING FROM THE EXTREMES of the pooled sorted
    order (1 to the smallest, 2-3 to the two largest, 4-5 to the
    next smallest pair, ...), so a group concentrated in the middle
    collects high ranks and a dispersed group low ones; the rank sum
    then feeds the Mann-Whitney machinery but tests VARIANCE, not
    location (`mann_whitney_u` / `kruskal_wallis` test shift;
    nothing else here tests spread nonparametrically). Pooled groups
    are the R vs A return flags over price cents; ties are broken
    deterministically by (value, orderkey, linenumber) — the audit
    convention, documented in place of midranks, keeping every rank
    an exact integer. Output per group: (grp, n, rank_sum).

    Scale shape: the global position is never computed by a global
    sort — width-1 escape below ST_LOCAL_MAX rows; above it the
    spearman bucket-grid discipline: a bounded 256-cell value-range
    count grid folds to the driver, prefix bases broadcast, and each
    bucket sorts LOCALLY by (v, ok, ln) to get exact global
    positions; the alternating-rank closed form (low depth d: odd →
    2d−1, even → 2d; high depth e: odd → 2e, even → 2e−1) vectorizes
    per bucket and two rank sums fold out."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
        ],
    )

    def rows_fn(batch: pa.Table) -> pa.Table:
        fl = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        keep = (fl == "R") | (fl == "A")
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)[keep]
        ok = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        ln = batch.column("l_linenumber").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )[keep]
        g = (fl[keep] == "R").astype(np.int64)  # 1 = R, 0 = A
        return pa.table(
            {
                "v": pa.array(cents, pa.int64()),
                "ok": pa.array(ok, pa.int64()),
                "ln": pa.array(ln, pa.int64()),
                "g": pa.array(g, pa.int64()),
            }
        )

    rows = lit.map_batches(rows_fn, batch_format="pyarrow").materialize()
    n_total = rows.count()

    def alt_ranks(pos: "np.ndarray", n: int) -> "np.ndarray":
        # pos is 1-based global position in the pooled sorted order
        low = pos <= (n + 1) // 2
        d = np.where(low, pos, n + 1 - pos)
        odd = d % 2 == 1
        r_low = np.where(odd, 2 * d - 1, 2 * d)
        r_high = np.where(odd, 2 * d, 2 * d - 1)
        return np.where(low, r_low, r_high).astype(np.int64)

    def fold(g: "np.ndarray", r: "np.ndarray") -> pa.Table:
        return pa.table(
            {
                "grp": pa.array(["A", "R"], pa.string()),
                "n": pa.array(
                    [int((g == 0).sum()), int((g == 1).sum())], pa.int64()
                ),
                "rank_sum": pa.array(
                    [int(r[g == 0].sum()), int(r[g == 1].sum())],
                    pa.int64(),
                ),
            }
        )

    if n_total < ST_LOCAL_MAX:

        def local(tbl: pa.Table) -> pa.Table:
            v = tbl.column("v").to_numpy(zero_copy_only=False)
            ok = tbl.column("ok").to_numpy(zero_copy_only=False)
            ln = tbl.column("ln").to_numpy(zero_copy_only=False)
            g = tbl.column("g").to_numpy(zero_copy_only=False)
            order = np.lexsort((ln, ok, v))
            pos = np.empty(len(v), np.int64)
            pos[order] = np.arange(1, len(v) + 1)
            return fold(g, alt_ranks(pos, len(v)))

        parts = (
            rows.repartition(1)
            .map_batches(local, batch_format="pyarrow", batch_size=None)
        )
    else:
        from ray.data.aggregate import Max as _Max, Min as _Min

        lohi = rows.aggregate(_Min("v"), _Max("v"))
        vlo, vhi = int(lohi["min(v)"]), int(lohi["max(v)"])
        wv = (vhi - vlo) // ST_BUCKETS + 1

        def keyed(batch: pa.Table) -> pa.Table:
            v = batch.column("v").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "cell", pa.array((v - vlo) // wv, pa.int64())
            )

        kd = rows.map_batches(keyed, batch_format="pyarrow").materialize()
        counts = {
            int(r["cell"]): int(r["count()"])
            for r in kd.groupby("cell").count().take_all()
        }  # bounded: the 256-cell grid
        bases = {}
        acc = 0
        for c in sorted(counts):
            bases[c] = acc
            acc += counts[c]
        bases_ref = ray.put(bases)

        def bucket_fold(group: pa.Table, _n=n_total) -> pa.Table:
            cell = int(group.column("cell")[0].as_py())
            base = ray.get(bases_ref)[cell]
            v = group.column("v").to_numpy(zero_copy_only=False)
            ok = group.column("ok").to_numpy(zero_copy_only=False)
            ln = group.column("ln").to_numpy(zero_copy_only=False)
            g = group.column("g").to_numpy(zero_copy_only=False)
            order = np.lexsort((ln, ok, v))
            pos = np.empty(len(v), np.int64)
            pos[order] = base + np.arange(1, len(v) + 1)
            return fold(g, alt_ranks(pos, _n))

        parts = (
            kd.groupby("cell")
            .map_groups(bucket_fold, batch_format="pyarrow")
        )

    out = (
        parts.groupby("grp")
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("rank_sum", alias_name="rank_sum"),
        )
        .take_all()  # bounded: 2 group rows
    )
    df = pd.DataFrame(out).sort_values("grp", ignore_index=True)
    for c in ["n", "rank_sum"]:
        df[c] = df[c].astype("int64")
    return df[["grp", "n", "rank_sum"]]


HILB_N = 64    # grid side (order-6 Hilbert curve)


def _hilbert_xy2d(n: int, x: "np.ndarray", y: "np.ndarray") -> "np.ndarray":
    """Vectorized order-log2(n) Hilbert curve index (xy2d), the
    classic bit-twiddling walk mirrored level-by-level in the SQL
    oracle."""
    x = x.copy()
    y = y.copy()
    d = np.zeros(len(x), np.int64)
    s = n // 2
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * np.where(rx == 0, ry, 3 - ry)
        # rotate quadrant (canonical Wikipedia rot(): reflect with
        # n-1-·, then swap, whenever ry == 0)
        flip = (ry == 0) & (rx == 1)
        x = np.where(flip, n - 1 - x, x)
        y = np.where(flip, n - 1 - y, y)
        rot = ry == 0
        x2 = np.where(rot, y, x)
        y2 = np.where(rot, x, y)
        x, y = x2, y2
        s //= 2
    return d


def hilbert_locality_audit(sf_dir: str) -> "pd.DataFrame":
    """Space-filling-curve LOCALITY comparison — lay the non-empty
    cells of the (order-day × customer-key) 64×64 grid out in
    row-major, Z-order (bit interleave, `zorder_keys`' curve) and
    HILBERT order, and measure each layout's locality as the total
    and max Manhattan jump between consecutive non-empty cells: the
    number every clustered-storage engine is implicitly optimizing
    when it picks a cell ordering (neighboring cells share pages /
    row groups; a big jump is a seek). Z-order pays its notorious
    boundary jumps (crossing a quadrant seam teleports); Hilbert is
    jump-1 on the FULL grid by construction and near-1 on sparse
    grids — this audit puts exact numbers on that folklore for this
    corpus's occupancy pattern. Output one row per ordering:
    (ordering, n_cells, total_jump, max_jump).

    Scale shape: one domain-bounded (cell → count) fold — the grid
    is FIXED at 4096 cells regardless of corpus size (the
    `haar_synopsis` contract) — then all three orderings and their
    jump sums are driver arithmetic over ≤ 4096 rows; the Hilbert
    walk is the vectorized 6-level bit rotation, mirrored level by
    level in the oracle's unrolled CTEs."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_custkey"]
    )

    def cells(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        day = (
            (d.astype("datetime64[D]") - HAAR_EPOCH)
            // np.timedelta64(1, "D")
        ).astype(np.int64)
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        x = np.clip(day * HILB_N // 2557, 0, HILB_N - 1)
        y = ck % HILB_N
        cell = y * HILB_N + x
        t = pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "c": pa.array(np.ones(len(cell), np.int64), pa.int64()),
            }
        ).group_by("cell").aggregate([("c", "sum")])
        return pa.table(
            {"cell": t.column("cell"), "c": t.column("c_sum").cast(pa.int64())}
        )

    rows = (
        orders.map_batches(cells, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the fixed 4096-cell grid
    )
    cell = np.array(sorted(int(r["cell"]) for r in rows), np.int64)
    x = cell % HILB_N
    y = cell // HILB_N

    def zorder(xv: "np.ndarray", yv: "np.ndarray") -> "np.ndarray":
        z = np.zeros(len(xv), np.int64)
        for b in range(6):
            z |= ((xv >> b) & 1) << (2 * b)
            z |= ((yv >> b) & 1) << (2 * b + 1)
        return z

    orderings = {
        "row_major": y * HILB_N + x,
        "z_order": zorder(x, y),
        "hilbert": _hilbert_xy2d(HILB_N, x, y),
    }
    out = []
    for name in sorted(orderings):
        idx = np.argsort(orderings[name], kind="stable")
        xs, ys = x[idx], y[idx]
        jumps = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
        out.append(
            (
                name,
                len(xs),
                int(jumps.sum()) if len(jumps) else 0,
                int(jumps.max()) if len(jumps) else 0,
            )
        )
    df = pd.DataFrame(
        out, columns=["ordering", "n_cells", "total_jump", "max_jump"]
    )
    for c in ["n_cells", "total_jump", "max_jump"]:
        df[c] = df[c].astype("int64")
    return df.sort_values("ordering", ignore_index=True)


PTK_SHARDS = 16   # deterministic event shards (event_id % 16)
PTK_K = 32        # local and global top-k


def partial_topk_merge_eval(sf_dir: str) -> "pd.DataFrame":
    """The classic distributed-top-k FAILURE MODE measured exactly —
    shard events by event_id % 16 (ingest-order sharding: a user's
    events SPLIT across shards), take each shard's local top-32
    users by partial count, merge the candidate lists, and score the
    naive estimate (sum of the partial counts that survived local
    top-k) against the exact answer: for each true top-32 user,
    (rank, user_id, true_n, est_n, n_shards_counted, in_candidates).
    est_n < true_n happens exactly when a heavy user misses some
    shard's local top-k — the underestimation every
    local-topk-then-merge pipeline silently ships (`heavy_hitters_exact`
    is the exact fold; this measures what the shortcut loses; a
    sketch (`cms_error_eval`) brackets it from the other side).

    Scale shape: per-batch (shard, user) partial counts fold through
    one (shard, user)-keyed exchange; local top-32 is a per-shard
    bounded sort inside the fold partition; the candidate/truth
    comparison touches ≤ 16·32 candidate rows + the 32-row exact
    top (one user fold + bounded sort-limit)."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        ev = batch.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        shard = ev % PTK_SHARDS
        t = pa.table(
            {
                "shard": pa.array(shard, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "n": pa.array(np.ones(len(u), np.int64), pa.int64()),
            }
        ).group_by(["shard", "user_id"]).aggregate([("n", "sum")])
        return pa.table(
            {
                "shard": t.column("shard"),
                "user_id": t.column("user_id"),
                "n": t.column("n_sum").cast(pa.int64()),
            }
        )

    sharded = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["shard", "user_id"])
        .aggregate(_Sum("n", alias_name="n"))
        .materialize()
    )

    def local_topk(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = group.to_pandas().sort_values(
            ["n", "user_id"], ascending=[False, True]
        ).head(PTK_K)
        return pa.table(
            {
                "user_id": pa.array(
                    df["user_id"].to_numpy(np.int64), pa.int64()
                ),
                "est": pa.array(df["n"].to_numpy(np.int64), pa.int64()),
                "sh": pa.array(np.ones(len(df), np.int64), pa.int64()),
            }
        )

    cands = (
        sharded.groupby("shard")
        .map_groups(local_topk, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            _Sum("est", alias_name="est_n"),
            _Sum("sh", alias_name="n_shards_counted"),
        )
        .take_all()  # bounded: <= 16*32 candidate rows
    )
    cmap = {
        int(r["user_id"]): (int(r["est_n"]), int(r["n_shards_counted"]))
        for r in cands
    }

    top = (
        sharded.groupby("user_id")
        .aggregate(_Sum("n", alias_name="true_n"))
        .sort(["true_n", "user_id"], descending=[True, False])
        .limit(PTK_K)
        .take_all()
    )
    out = []
    for i, r in enumerate(top, 1):
        u, tn = int(r["user_id"]), int(r["true_n"])
        est, nsh = cmap.get(u, (0, 0))
        out.append((i, u, tn, est, nsh, 1 if u in cmap else 0))
    df = pd.DataFrame(
        out,
        columns=[
            "rank", "user_id", "true_n", "est_n", "n_shards_counted",
            "in_candidates",
        ],
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def energy_distance(sf_dir: str) -> "pd.DataFrame":
    """Exact ENERGY-DISTANCE sufficient statistics between the R and
    A return-flag price distributions — the Székely-Rizzo two-sample
    statistic E = 2·E|X−Y| − E|X−X'| − E|Y−Y'|, kept exact as the
    three pairwise-absolute-difference SUMS over cents plus the two
    counts (n_x, n_y, sum_xy, sum_xx, sum_yy): E's sign/magnitude is
    then pure rational arithmetic. Energy distance is consistent
    against ALL distribution differences (location, scale, shape),
    where `mann_whitney_u` sees location, `siegel_tukey` scale and
    `ks_drift` the max ECDF gap — this is the omnibus leg of the
    two-sample family, and O(n²) pairwise sums are computed WITHOUT
    pairs: from the sorted value multiset, Σ_{i<j}|v_i−v_j| =
    Σ_i v_i·(2i−n−1) (tie-order invariant), and the cross term folds
    from per-value prefix counts of the opposite group.

    Scale shape: two domain-bounded (cents → count) histograms (the
    `weighted_median` contract) meet in ONE constant-key
    co-partition where all three sums vectorize from cumulative
    histogram arrays; the driver sees one 5-integer row. int64
    headroom: Σ|diff| ≤ n²·range ≈ 10¹⁷ at sf0.1 — the HUGEINT /
    split-accumulator dial is documented for beyond."""
    import pandas as pd

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        fl = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        keep = (fl == "R") | (fl == "A")
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)[keep]
        g = (fl[keep] == "R").astype(np.int64)
        t = pa.table(
            {
                "v": pa.array(cents, pa.int64()),
                "g": pa.array(g, pa.int64()),
                "c": pa.array(np.ones(len(cents), np.int64), pa.int64()),
            }
        ).group_by(["v", "g"]).aggregate([("c", "sum")])
        return pa.table(
            {
                "v": t.column("v"),
                "g": t.column("g"),
                "c": t.column("c_sum").cast(pa.int64()),
                "k": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = (
            group.to_pandas()
            .groupby(["v", "g"], sort=True)["c"]
            .sum()
            .reset_index()
        )

        def within(vals: "np.ndarray", cnt: "np.ndarray") -> int:
            # sum_{i<j} |v_i - v_j| over the expanded multiset:
            # expand via cumulative positions — for sorted distinct
            # values with counts, each value v at positions
            # (L+1..L+c): sum v*(2i-n-1) over its run =
            # v * (2*(L*c + c*(c+1)/2) - c*(n+1))
            n = int(cnt.sum())
            L = np.concatenate([[0], cnt.cumsum()[:-1]])
            coef = 2 * (L * cnt + cnt * (cnt + 1) // 2) - cnt * (n + 1)
            return int((vals * coef).sum())

        out = {}
        hists = {}
        for gi in (0, 1):
            sub = df[df["g"] == gi]
            vals = sub["v"].to_numpy(np.int64)
            cnt = sub["c"].to_numpy(np.int64)
            hists[gi] = (vals, cnt)
            out[gi] = (int(cnt.sum()), within(vals, cnt))

        # cross term: for each x value, sum over y of |x - y| from
        # the opposite histogram's prefix sums
        vx, cx = hists[1]  # R
        vy, cy = hists[0]  # A
        cumy_c = np.concatenate([[0], cy.cumsum()])
        cumy_s = np.concatenate([[0], (vy * cy).cumsum()])
        idx = np.searchsorted(vy, vx, side="right")
        ny, sy = int(cy.sum()), int((vy * cy).sum())
        le_c, le_s = cumy_c[idx], cumy_s[idx]
        per_x = vx * le_c - le_s + (sy - le_s) - vx * (ny - le_c)
        sum_xy = int((per_x * cx).sum())

        return pa.table(
            {
                "n_x": pa.array([out[1][0]], pa.int64()),
                "n_y": pa.array([out[0][0]], pa.int64()),
                "sum_xy": pa.array([sum_xy], pa.int64()),
                "sum_xx": pa.array([out[1][1]], pa.int64()),
                "sum_yy": pa.array([out[0][1]], pa.int64()),
            }
        )

    df = (
        lit.map_batches(partials, batch_format="pyarrow")
        .groupby("k")
        .map_groups(
            lambda g: fold(g.drop_columns(["k"])),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def cuped_moments(sf_dir: str) -> "pd.DataFrame":
    """Exact CUPED sufficient statistics — the variance-reduction
    workhorse of online experimentation (Deng et al., WSDM'13) kept
    in integers: per deterministic arm (user-id parity), the moment
    sums (n, sx, sy, sxx, sxy, syy) of X = the user's
    first-half-of-timeline event count (the pre-period covariate)
    and Y = the second-half count (the metric), plus the pooled
    θ pieces theta_num = n·Σxy − Σx·Σy and theta_den = n·Σxx −
    (Σx)², from which θ̂ and the variance-reduction factor
    1 − ρ² are exact rationals. `ab_lift` reads the effect;
    this measures how much pre-period adjustment would shrink its
    confidence interval — the experimentation-family leg nothing
    else here covers. Output one row per arm.

    Scale shape: the per-user (pre, post) pair folds from one
    (user)-keyed count exchange (timeline midpoint from a bounded
    min/max aggregate), then moments are a per-batch vectorized
    fold to two 8-integer rows. No driver state beyond them."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    lohi = ev.aggregate(_Min("ts"), _Max("ts"))
    # exact integer-microsecond midpoint (floor), mirrored by the
    # oracle's epoch_us arithmetic — no sub-µs interval rounding
    lo_us = int(
        np.datetime64(lohi["min(ts)"], "us").astype(np.int64)
    )
    hi_us = int(
        np.datetime64(lohi["max(ts)"], "us").astype(np.int64)
    )
    mid_us = lo_us + (hi_us - lo_us) // 2

    def per_user(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ts = (
            batch.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        pre = (ts < mid_us).astype(np.int64)
        t = pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "x": pa.array(pre, pa.int64()),
                "y": pa.array(1 - pre, pa.int64()),
            }
        ).group_by("user_id").aggregate([("x", "sum"), ("y", "sum")])
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "x": t.column("x_sum").cast(pa.int64()),
                "y": t.column("y_sum").cast(pa.int64()),
            }
        )

    users = (
        ev.map_batches(per_user, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            _Sum("x", alias_name="x"), _Sum("y", alias_name="y")
        )
    )

    def moments(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        arm = (u % 2).astype(np.int64)
        rows = []
        for a in (0, 1):
            m = arm == a
            xa, ya = x[m], y[m]
            rows.append(
                (
                    a,
                    int(m.sum()),
                    int(xa.sum()),
                    int(ya.sum()),
                    int((xa * xa).sum()),
                    int((xa * ya).sum()),
                    int((ya * ya).sum()),
                )
            )
        arr = np.array(rows, np.int64)
        return pa.table(
            {
                "arm": pa.array(arr[:, 0], pa.int64()),
                "n": pa.array(arr[:, 1], pa.int64()),
                "sx": pa.array(arr[:, 2], pa.int64()),
                "sy": pa.array(arr[:, 3], pa.int64()),
                "sxx": pa.array(arr[:, 4], pa.int64()),
                "sxy": pa.array(arr[:, 5], pa.int64()),
                "syy": pa.array(arr[:, 6], pa.int64()),
            }
        )

    rows = (
        users.map_batches(moments, batch_format="pyarrow")
        .groupby("arm")
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("sx", alias_name="sx"),
            _Sum("sy", alias_name="sy"),
            _Sum("sxx", alias_name="sxx"),
            _Sum("sxy", alias_name="sxy"),
            _Sum("syy", alias_name="syy"),
        )
        .take_all()  # bounded: 2 arm rows
    )
    df = pd.DataFrame(rows).sort_values("arm", ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    df["theta_num"] = df["n"] * df["sxy"] - df["sx"] * df["sy"]
    df["theta_den"] = df["n"] * df["sxx"] - df["sx"] * df["sx"]
    for c in ["theta_num", "theta_den"]:
        df[c] = df[c].astype("int64")
    return df[
        ["arm", "n", "sx", "sy", "sxx", "sxy", "syy",
         "theta_num", "theta_den"]
    ]


def grid_percolation(sf_dir: str) -> "pd.DataFrame":
    """Spatial CONNECTIVITY census of the workload heatmap — treat
    the occupied cells of the (order-day × custkey) 64×64 grid as
    sites and connect 4-neighbors (site percolation): one row with
    (n_occupied, n_adjacent_pairs, n_clusters, largest_cluster).
    Read next to `hilbert_locality_audit` (same grid, layout cost)
    this says whether occupancy is one percolating slab — batch
    scheduling and cache reuse behave completely differently than
    for scattered islands, and the giant-cluster fraction is the
    standard percolation order parameter for that transition.

    Scale shape: the grid is FIXED at 4096 cells — one
    domain-bounded (cell → count) fold, then adjacency and
    union-find are driver arithmetic over ≤ 4096 sites (the
    `haar_synopsis` contract); the oracle reaches the same
    components with a recursive CTE over the derived edge set."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_custkey"]
    )

    def cells(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        day = (
            (d.astype("datetime64[D]") - HAAR_EPOCH)
            // np.timedelta64(1, "D")
        ).astype(np.int64)
        ck = batch.column("o_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        x = np.clip(day * HILB_N // 2557, 0, HILB_N - 1)
        y = ck % HILB_N
        cell = y * HILB_N + x
        t = pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "c": pa.array(np.ones(len(cell), np.int64), pa.int64()),
            }
        ).group_by("cell").aggregate([("c", "sum")])
        return pa.table(
            {"cell": t.column("cell"), "c": t.column("c_sum").cast(pa.int64())}
        )

    rows = (
        orders.map_batches(cells, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the fixed 4096-cell grid
    )
    occ = sorted(int(r["cell"]) for r in rows)
    occ_set = set(occ)
    parent = {c: c for c in occ}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    n_adj = 0
    for c in occ:
        x, y = c % HILB_N, c // HILB_N
        for nb in ((x + 1, y), (x, y + 1)):
            if nb[0] < HILB_N and nb[1] < HILB_N:
                c2 = nb[1] * HILB_N + nb[0]
                if c2 in occ_set:
                    n_adj += 1
                    ra, rb = find(c), find(c2)
                    if ra != rb:
                        parent[ra] = rb
    sizes: dict = {}
    for c in occ:
        r = find(c)
        sizes[r] = sizes.get(r, 0) + 1
    return pd.DataFrame(
        [
            {
                "n_occupied": len(occ),
                "n_adjacent_pairs": n_adj,
                "n_clusters": len(sizes),
                "largest_cluster": max(sizes.values()) if sizes else 0,
            }
        ]
    ).astype("int64")


SRP_BUCKETS = 16  # range-partition fan


def string_range_partition_plan(sf_dir: str) -> "pd.DataFrame":
    """RANGE-PARTITION boundary plan for a STRING sort key — the 15
    part-name order statistics at ranks ⌊i·n/16⌋ and the exact row
    count each resulting range bucket receives (row → bucket = how
    many boundaries ≤ its key): what a sort-based writer (Iceberg /
    Delta range distribution, Spark range partitioner) materializes
    before a global string sort, and the skew read that
    `shard_balance_plan`'s hash fan can't give — duplicate-heavy
    keys pile into one bucket HERE, visibly. Output per bucket:
    (bucket, lo_bound, n_rows).

    Scale shape: never a global string sort — a bounded 2-char
    prefix count grid (≤ 26² cells) folds to the driver, the driver
    locates which prefix cell holds each target rank, ONE
    prefix-cell co-partition extracts the 15 boundary strings from
    local sorts at local offsets, and a final streaming pass counts
    searchsorted bucket assignments; the driver holds 15 strings
    and the 16-row plan."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    parts_ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name"]
    )

    def prefix_counts(batch: pa.Table) -> pa.Table:
        names = batch.column("p_name").to_pylist()
        pre = [(n or "  ")[:2] for n in names]
        import collections

        c = collections.Counter(pre)
        return pa.table(
            {
                "pre": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(
                    np.fromiter(c.values(), np.int64, len(c)), pa.int64()
                ),
            }
        )

    grid = (
        parts_ds.map_batches(prefix_counts, batch_format="pyarrow")
        .groupby("pre")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the 2-char prefix grid
    )
    grid.sort(key=lambda r: r["pre"])
    n = sum(int(r["c"]) for r in grid)
    targets = [i * n // SRP_BUCKETS for i in range(1, SRP_BUCKETS)]

    # locate (prefix cell, local offset) for each target rank
    acc = 0
    want: dict = {}
    for r in grid:
        c = int(r["c"])
        for t in targets:
            if acc < t <= acc + c:
                want.setdefault(r["pre"], []).append(t - acc)
        acc += c
    want_ref = ray.put(want)

    def extract(group: pa.Table) -> pa.Table:
        wt = ray.get(want_ref)
        pre = group.column("pre")[0].as_py()
        offs = wt.get(pre)
        if not offs:
            return pa.table({"rank_off": pa.array([], pa.int64()),
                             "bound": pa.array([], pa.string())})
        names = sorted(group.column("name").to_pylist())
        return pa.table(
            {
                "rank_off": pa.array(offs, pa.int64()),
                "bound": pa.array([names[o - 1] for o in offs], pa.string()),
            }
        )

    tagged = parts_ds.map_batches(
        lambda b: pa.table(
            {
                "pre": pa.array(
                    [(x or "  ")[:2] for x in b.column("p_name").to_pylist()],
                    pa.string(),
                ),
                "name": b.column("p_name"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    got = (
        tagged.groupby("pre")
        .map_groups(extract, batch_format="pyarrow")
        .take_all()  # bounded: <= 15 boundary rows
    )
    # global boundary order == sorted bound strings: prefix cells are
    # contiguous in string order and within-cell local sort + offset
    # is the global rank, so sorting the extracted strings (dups kept)
    # reconstructs the rank order exactly
    bounds = sorted(r["bound"] for r in got)
    bref = np.array(bounds, dtype=object)

    def bucket_counts(batch: pa.Table) -> pa.Table:
        names = np.array(batch.column("p_name").to_pylist(), dtype=object)
        b = np.searchsorted(bref, names, side="right")
        bc = np.bincount(b, minlength=SRP_BUCKETS).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    np.arange(SRP_BUCKETS, dtype=np.int64), pa.int64()
                ),
                "n_rows": pa.array(bc[:SRP_BUCKETS], pa.int64()),
            }
        )

    agg = (
        parts_ds.map_batches(bucket_counts, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(_Sum("n_rows", alias_name="n_rows"))
        .take_all()
    )
    df = pd.DataFrame(agg).sort_values("bucket", ignore_index=True)
    df["lo_bound"] = [""] + bounds
    df["n_rows"] = df["n_rows"].astype("int64")
    df["bucket"] = df["bucket"].astype("int64")
    return df[["bucket", "lo_bound", "n_rows"]]


FSA_TENANTS = 16   # top users treated as tenants
FSA_CAP_DEN = 2    # capacity = total demand // 2


def fair_share_allocation(sf_dir: str) -> "pd.DataFrame":
    """Exact MAX-MIN FAIR (water-filling) allocation — the 16
    heaviest users are tenants with demand = their event count, the
    scheduler has capacity C = ⌊total/2⌋, and the allocation is the
    max-min fair point: tenants under the water level keep their
    demand, the rest share the remainder at one level L = R/(m−k),
    integerized by largest-remainder with the +1s going to the
    smallest user ids (fully deterministic, Σalloc = C exactly).
    This is the allocator inside every multi-tenant fair scheduler
    (YARN fair share / DRF's single-resource case); the audit names
    exactly who is capped and by how much on this workload —
    `budget_allocation`'s greedy knapsack is value-seeking, this is
    fairness-seeking, the two poles of the allocation family.
    Output (user_id, demand, alloc) by (demand desc, user_id).

    Scale shape: one user-count fold + a bounded 16-row sort-limit;
    the water-level scan (integer cross-multiplication, no
    division) and the remainder split are driver arithmetic on 16
    integers."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partials(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            return_counts=True,
        )
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    top = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(_Sum("n", alias_name="n"))
        .sort(["n", "user_id"], descending=[True, False])
        .limit(FSA_TENANTS)
        .take_all()
    )
    dem = sorted((int(r["n"]), int(r["user_id"])) for r in top)
    m = len(dem)
    total = sum(d for d, _ in dem)
    cap = total // FSA_CAP_DEN

    prefix = [0]
    for d, _ in dem:
        prefix.append(prefix[-1] + d)

    allocs: dict = {}
    if total <= cap:
        for d, u in dem:
            allocs[u] = d
    else:
        for kk in range(m):
            rem_n = m - kk
            rem = cap - prefix[kk]
            lower_ok = kk == 0 or dem[kk - 1][0] * rem_n <= rem
            upper_ok = rem < dem[kk][0] * rem_n
            if lower_ok and upper_ok:
                base, extra = divmod(rem, rem_n)
                unsat = sorted(u for _, u in dem[kk:])
                for d, u in dem[:kk]:
                    allocs[u] = d
                for i, u in enumerate(unsat):
                    allocs[u] = base + (1 if i < extra else 0)
                break

    rows = sorted(dem, key=lambda t: (-t[0], t[1]))
    df = pd.DataFrame(
        [(u, d, allocs[u]) for d, u in rows],
        columns=["user_id", "demand", "alloc"],
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


RB_NODES = 16   # cluster size before the resize


def rebalance_delta_audit(sf_dir: str) -> "pd.DataFrame":
    """REBALANCE-DELTA audit for two placement schemes — when the
    cluster grows 16 → 17 nodes, how many keys MOVE under (a) naive
    modulo placement and (b) rendezvous (highest-random-weight)
    hashing, as exact counts over the customer keys: the classic
    consistent-hashing result made concrete (modulo reshuffles
    ~15/16 of all keys; rendezvous moves only the ~1/17 that now
    prefer the new node — and every key that moves goes TO the new
    node, never laterally). `rendezvous_assign` places keys; this
    measures the operational cost of elasticity, which is the reason
    the scheme exists. Output (scheme, n_keys, n_moved, moved_bp).

    Scale shape: one streaming pass per scheme folded to two
    3-integer rows — per batch the 17 md5 scores per key vectorize
    as a (keys × nodes) argmax (md5 mirrored bit-for-bit in the
    oracle; ties broken by higher node id on both sides)."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )

    def cells(batch: pa.Table) -> pa.Table:
        ks = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(ks)
        scores = np.empty((n, RB_NODES + 1), np.int64)
        for j, k in enumerate(ks.tolist()):
            for i in range(RB_NODES + 1):
                h = _hashlib.md5(f"{i}:{k}".encode()).hexdigest()
                scores[j, i] = int(h[:15], 16)
        # argmax with ties to the HIGHER node id: reverse the node
        # axis so np.argmax's first-wins picks the largest id
        rev = scores[:, ::-1]
        a16 = RB_NODES - 1 - np.argmax(rev[:, 1:], axis=1)
        a17 = RB_NODES - np.argmax(rev, axis=1)
        mv_r = int((a16 != a17).sum())
        mv_m = int(((ks % RB_NODES) != (ks % (RB_NODES + 1))).sum())
        return pa.table(
            {
                "scheme": pa.array(["mod", "rendezvous"], pa.string()),
                "n_keys": pa.array([n, n], pa.int64()),
                "n_moved": pa.array([mv_m, mv_r], pa.int64()),
            }
        )

    rows = (
        cust.map_batches(cells, batch_format="pyarrow")
        .groupby("scheme")
        .aggregate(
            _Sum("n_keys", alias_name="n_keys"),
            _Sum("n_moved", alias_name="n_moved"),
        )
        .take_all()  # bounded: 2 scheme rows
    )
    df = pd.DataFrame(rows).sort_values("scheme", ignore_index=True)
    for c in ["n_keys", "n_moved"]:
        df[c] = df[c].astype("int64")
    df["moved_bp"] = (df["n_moved"] * 10000 // df["n_keys"]).astype("int64")
    return df[["scheme", "n_keys", "n_moved", "moved_bp"]]


DCC_KS = (1, 2, 4, 8, 16, 32, 64, 128)  # dictionary cutoff grid


def dict_cutoff_curve(sf_dir: str) -> "pd.DataFrame":
    """HYBRID dictionary-encoding cutoff curve — for the part-type
    column, the exact serialized cost of a PARTIAL dictionary
    holding only the k most frequent values (freq desc, value asc)
    with an escape path for the rest: per row 1 escape bit plus
    either a ⌈log2(k+1)⌉-bit code (hit) or the raw 8·(len+1)-bit
    string (miss), plus the dictionary itself (Σ len+1 bytes over
    its k entries); est_bytes = dict + ⌈bits/8⌉. The is_best row is
    the partial-dictionary optimum — the knob real writers
    (Parquet's dict-size fallback, ORC's dictionary check) tune,
    where `dict_encoding_audit` only prices the all-or-nothing
    choice. Skewed value frequencies make the curve genuinely
    non-monotone in k. Output (k, n_hits, dict_bytes, est_bytes,
    is_best).

    Scale shape: one (value → count) fold bounded by the column's
    dictionary domain (p_type ≈ 150 values — the catalog-bounded
    contract), then the whole curve is driver arithmetic over that
    histogram."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    parts_ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_type"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        vals = batch.column("p_type").to_pylist()
        import collections

        c = collections.Counter(vals)
        return pa.table(
            {
                "v": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(
                    np.fromiter(c.values(), np.int64, len(c)), pa.int64()
                ),
            }
        )

    hist = (
        parts_ds.map_batches(partials, batch_format="pyarrow")
        .groupby("v")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the p_type dictionary domain
    )
    ent = sorted(
        ((int(r["c"]), r["v"]) for r in hist), key=lambda t: (-t[0], t[1])
    )
    n = sum(c for c, _ in ent)
    miss_bits_total = sum(c * 8 * (len(v) + 1) for c, v in ent)

    out = []
    hits = 0
    dict_bytes = 0
    hit_miss_bits = 0  # bits of rows now encoded as dict hits
    cum = {0: (0, 0, 0)}
    for k in range(1, max(DCC_KS) + 1):
        if k <= len(ent):
            c, v = ent[k - 1]
            hits += c
            dict_bytes += len(v) + 1
            hit_miss_bits += c * 8 * (len(v) + 1)
        cum[k] = (hits, dict_bytes, hit_miss_bits)
    for k in DCC_KS:
        hits_k, db_k, hmb_k = cum[min(k, len(ent))] if k > len(ent) else cum[k]
        w_bits = max(1, (k + 1 - 1).bit_length())  # ceil(log2(k+1))
        bits = n + hits_k * w_bits + (miss_bits_total - hmb_k)
        est = db_k + (bits + 7) // 8
        out.append((k, hits_k, db_k, est))
    df = pd.DataFrame(
        out, columns=["k", "n_hits", "dict_bytes", "est_bytes"]
    )
    best = df.sort_values(["est_bytes", "k"]).iloc[0]["k"]
    df["is_best"] = (df["k"] == best).astype("int64")
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("k", ignore_index=True)


AMS_TRIALS = 12   # sign trials (3 groups of 4 -> median of means)


def ams_f2_eval(sf_dir: str) -> "pd.DataFrame":
    """AMS second-moment (F2) sketch eval — the Alon-Matias-Szegedy
    estimator measured against the exact second frequency moment of
    the user-activity distribution: twelve ±1-sign trials (md5
    coins) each maintain the PURE SUM T_j = Σ_u s_j(u)·f_u, the
    estimator is the median over 3 groups of the mean of 4 trial
    squares (E[T²] = F2), and the output row carries the exact F2,
    the three group sums, est_x4 = med3 (so est = est_x4/4) and the
    signed error. F2 is the self-join size / skew statistic
    (`hhi_concentration` is F2 normalized; a CMS row's collision
    mass is F2/W in expectation) — this closes the sketch-family
    loop for moments the way cms/count-sketch evals do for point
    queries. All integers: T_j ≤ ΣF1, T² ≤ 10¹² at sf0.1.

    Scale shape: trial sums are layout-independent pure sums — per
    batch the 12 signed contributions of its unique users fold as a
    12-cell exchange; exact F2 is one user-count exchange + a
    Σn² partial fold. Driver sees 12 + 1 integers."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def trial_partials(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            return_counts=True,
        )
        t_out = np.zeros(AMS_TRIALS, np.int64)
        for uid, n in zip(u.tolist(), cnt.tolist()):
            for j in range(AMS_TRIALS):
                h = _hashlib.md5(f"{j}:{uid}".encode()).hexdigest()
                s = 1 if int(h[:2], 16) % 2 == 0 else -1
                t_out[j] += s * n
        return pa.table(
            {
                "trial": pa.array(
                    np.arange(AMS_TRIALS, dtype=np.int64), pa.int64()
                ),
                "t": pa.array(t_out, pa.int64()),
            }
        )

    trials = {
        int(r["trial"]): int(r["t"])
        for r in (
            ds.map_batches(trial_partials, batch_format="pyarrow")
            .groupby("trial")
            .aggregate(_Sum("t", alias_name="t"))
            .take_all()  # bounded: 12 trial rows
        )
    }

    def count_partials(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            return_counts=True,
        )
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    f2 = int(
        (
            ds.map_batches(count_partials, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(_Sum("n", alias_name="n"))
            .map_batches(
                lambda b: pa.table(
                    {
                        "sq": pa.array(
                            [
                                int(
                                    (
                                        b.column("n").to_numpy(
                                            zero_copy_only=False
                                        ).astype(np.int64)
                                        ** 2
                                    ).sum()
                                )
                            ],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
            )
            .aggregate(_Sum("sq", alias_name="sq"))
        )["sq"]
    )

    g = [
        sum(trials[j] * trials[j] for j in range(4 * i, 4 * i + 4))
        for i in range(3)
    ]
    est_x4 = max(min(g[0], g[1]), min(max(g[0], g[1]), g[2]))
    df = pd.DataFrame(
        [
            {
                "f2_exact": f2,
                "g1_sum_t2": g[0],
                "g2_sum_t2": g[1],
                "g3_sum_t2": g[2],
                "est_x4": est_x4,
                "err_x4": est_x4 - 4 * f2,
            }
        ]
    ).astype("int64")
    return df


AQP_DENS = (16, 4)   # sample denominators for the estimate columns


def sampled_selectivity_audit(sf_dir: str) -> "pd.DataFrame":
    """SAMPLE-BASED selectivity estimation (AQP) error — the same
    six price-range predicates `histogram_selectivity_audit` feeds
    its equi-depth synopsis, estimated instead from deterministic
    Bernoulli row samples (md5(orderkey:linenumber) thresholds) at
    1/16 and 1/4, scaled back up and compared to the true count:
    the two classical cardinality-estimation inputs (histogram vs
    sample) now sit side by side on identical predicates, which is
    how an optimizer bake-off actually reads — histograms are
    cheap-but-shape-blind inside buckets, samples are shape-exact
    but noisy at low selectivity, and the err columns quantify both
    on this corpus. Output (pred_id, lo, hi, true_rows, est16,
    est4, err16, err4).

    Scale shape: ONE streaming pass — per batch the row hash and
    the six predicate masks vectorize into an 18-cell (pred ×
    {true, s16, s4}) partial, Sum-folded; the md5 row key is the
    `hash_sample` discipline (deterministic, layout-free)."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    SPACE = 1 << 60
    thr = {d: SPACE // d for d in AQP_DENS}

    def cells(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ln = batch.column("l_linenumber").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        u = np.array(
            [
                int(
                    _hashlib.md5(f"{o}:{l}".encode()).hexdigest()[:15], 16
                )
                for o, l in zip(ok.tolist(), ln.tolist())
            ],
            np.int64,
        )
        pid_out, tr, s16, s4 = [], [], [], []
        in16 = u < thr[16]
        in4 = u < thr[4]
        for pid, lo, hi in HIST_SEL_PREDS:
            m = (cents >= lo) & (cents < hi)
            pid_out.append(pid)
            tr.append(int(m.sum()))
            s16.append(int((m & in16).sum()))
            s4.append(int((m & in4).sum()))
        return pa.table(
            {
                "pred_id": pa.array(pid_out, pa.int64()),
                "tr": pa.array(tr, pa.int64()),
                "s16": pa.array(s16, pa.int64()),
                "s4": pa.array(s4, pa.int64()),
            }
        )

    rows = (
        lit.map_batches(cells, batch_format="pyarrow")
        .groupby("pred_id")
        .aggregate(
            _Sum("tr", alias_name="true_rows"),
            _Sum("s16", alias_name="s16"),
            _Sum("s4", alias_name="s4"),
        )
        .take_all()  # bounded: 6 predicate rows
    )
    df = pd.DataFrame(rows).sort_values("pred_id", ignore_index=True)
    pred = {p: (lo, hi) for p, lo, hi in HIST_SEL_PREDS}
    df["lo"] = df["pred_id"].map(lambda p: pred[p][0])
    df["hi"] = df["pred_id"].map(lambda p: pred[p][1])
    df["est16"] = df["s16"] * 16
    df["est4"] = df["s4"] * 4
    df["err16"] = (df["est16"] - df["true_rows"]).abs()
    df["err4"] = (df["est4"] - df["true_rows"]).abs()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[
        ["pred_id", "lo", "hi", "true_rows", "est16", "est4",
         "err16", "err4"]
    ]


def mom_selection_audit(sf_dir: str) -> "pd.DataFrame":
    """MEDIAN-OF-MEDIANS pivot-quality audit — run the classic BFPRT
    grouping (consecutive doc_id groups of 5 over document lengths),
    take each group's middle element, take the exact lower median of
    those group medians, and measure where that pivot actually lands
    in the full distribution: (n, mom_value, mom_rank, median_rank,
    rank_bp). The theorem guarantees the pivot's rank in [30%, 70%];
    the audit shows the realized split on this corpus — the number
    behind every deterministic-selection / distributed-quantile
    fallback path (`global_quantiles`' exact ranks are what MoM
    approximates in one shuffle-free pass). rank_bp = ⌊10⁴·rank/n⌋.

    Scale shape: groups are doc_id//5 (contiguous ids — the
    `haar_synopsis` fixture contract), so group medians fold from a
    group-keyed exchange bounded by n/5 SLIM int rows; the median of
    medians is a domain-bounded (length → count) histogram pick
    (the `weighted_median` plan), and the final rank is one
    streaming count-less-than pass."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def grp_rows(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        v = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "g": pa.array(d // 5, pa.int64()),
                "pos": pa.array(d % 5, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "part": pa.array((d // 5) % 64, pa.int64()),
            }
        )

    def grp_median(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = pd.DataFrame(
            {
                "g": part_tbl.column("g").to_numpy(zero_copy_only=False),
                "v": part_tbl.column("v").to_numpy(zero_copy_only=False),
            }
        )
        med = (
            df.groupby("g")["v"]
            .apply(lambda s: int(np.sort(s.to_numpy())[(len(s) - 1) // 2]))
            .reset_index(name="m")
        )
        t = pa.table(
            {
                "m": pa.array(med["m"].to_numpy(np.int64), pa.int64()),
                "c": pa.array(np.ones(len(med), np.int64), pa.int64()),
            }
        ).group_by("m").aggregate([("c", "sum")])
        return pa.table(
            {"m": t.column("m"), "c": t.column("c_sum").cast(pa.int64())}
        )

    meds = (
        docs.map_batches(grp_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: grp_median(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .groupby("m")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the discrete length domain
    )
    mv = np.array(sorted(int(r["m"]) for r in meds), np.int64)
    mc = np.array(
        [c for _, c in sorted((int(r["m"]), int(r["c"])) for r in meds)],
        np.int64,
    )
    cum = mc.cumsum()
    n_groups = int(cum[-1])
    k = (n_groups + 1) // 2  # lower median of the group medians
    mom = int(mv[np.searchsorted(cum, k, side="left")])

    def rank_cells(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "lt": pa.array([int((v < mom).sum())], pa.int64()),
                "n": pa.array([len(v)], pa.int64()),
            }
        )

    agg = docs.map_batches(rank_cells, batch_format="pyarrow").aggregate(
        _Sum("lt", alias_name="lt"), _Sum("n", alias_name="n")
    )
    n, lt = int(agg["n"]), int(agg["lt"])
    mom_rank = lt + 1
    df = pd.DataFrame(
        [
            {
                "n": n,
                "mom_value": mom,
                "mom_rank": mom_rank,
                "median_rank": (n + 1) // 2,
                "rank_bp": mom_rank * 10000 // n if n else 0,
            }
        ]
    ).astype("int64")
    return df


def revenue_path_extremes(sf_dir: str) -> "pd.DataFrame":
    """PATH extremes of the daily-revenue series — exact maximum
    drawdown of the cumulative series (the largest peak-to-trough
    drop: max over t of running-max − v_t, with the peak/trough
    day indices, ties to the earliest) plus the longest strictly
    rising and strictly falling runs of the DAILY series: the
    path-dependent statistics the pointwise family (`ewma_daily`,
    `tukey_fences`, `runs_test` counts sign runs, `ohlc_daily` bars)
    never sees — drawdown (of the daily LEVEL series: largest drop
    from any earlier day's level, the price-series convention) is
    THE robustness number for level processes, and the longest
    monotone runs bound how long a trend detector can stay wrong. Output one row: (n_days, max_drawdown_cents, peak_day,
    trough_day, longest_rise, longest_fall).

    Scale shape: one day-domain-bounded (day, cents) fold (the
    `haar_synopsis` contract), then the path scan is driver
    arithmetic over ≤ 2557 integers; the oracle replays the same
    scan with window prefix-max and run-group CTEs."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_extendedprice"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        d = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        day = (
            (d.astype("datetime64[D]") - HAAR_EPOCH)
            // np.timedelta64(1, "D")
        ).astype(np.int64)
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "day": pa.array(day, pa.int64()),
                "c": pa.array(cents, pa.int64()),
            }
        ).group_by("day").aggregate([("c", "sum")])
        return pa.table(
            {"day": t.column("day"), "c": t.column("c_sum").cast(pa.int64())}
        )

    rows = (
        lit.map_batches(partials, batch_format="pyarrow")
        .groupby("day")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the 7-year day domain
    )
    series = sorted((int(r["day"]), int(r["c"])) for r in rows)
    days = [d for d, _ in series]
    vals = [c for _, c in series]

    run_max = None
    run_max_day = -1
    best_dd = 0
    best_peak = best_trough = -1
    for d, c in series:
        if run_max is None or c > run_max:
            run_max = c
            run_max_day = d
        dd = run_max - c
        if dd > best_dd:
            best_dd = dd
            best_peak = run_max_day
            best_trough = d

    longest_rise = longest_fall = 0
    cur_r = cur_f = 1 if vals else 0
    for i in range(1, len(vals)):
        if vals[i] > vals[i - 1]:
            cur_r += 1
            cur_f = 1
        elif vals[i] < vals[i - 1]:
            cur_f += 1
            cur_r = 1
        else:
            cur_r = cur_f = 1
        longest_rise = max(longest_rise, cur_r)
        longest_fall = max(longest_fall, cur_f)
    longest_rise = max(longest_rise, cur_r if vals else 0)
    longest_fall = max(longest_fall, cur_f if vals else 0)

    return pd.DataFrame(
        [
            {
                "n_days": len(series),
                "max_drawdown_cents": best_dd,
                "peak_day": best_peak,
                "trough_day": best_trough,
                "longest_rise": longest_rise,
                "longest_fall": longest_fall,
            }
        ]
    ).astype("int64")


PPS_TARGET = 256   # Poisson-PPS expected sample size


def pps_sample_calibration(sf_dir: str) -> "pd.DataFrame":
    """Poisson-PPS SAMPLING calibration — include each order with
    probability min(1, k·w/W) proportional to its price (k = 256,
    the deterministic md5 coin: include iff u·W < k·w·2⁶⁰ scaled
    exactly), then compare realized inclusion counts against the
    exact expected-count numerators per price decile: the
    design-calibration read for weighted sampling (`weighted_sample`
    draws a fixed-size A-ES sample; Poisson-PPS is the
    variable-size estimator HT-weighting assumes, and its realized-
    vs-expected gap per stratum is what a survey statistician
    checks first). expected_x1m = Σ ⌊10⁶·min(1, k·w/W)⌋ keeps the
    comparison in integers. Output per decile: (decile, n_orders,
    sum_price_cents, expected_x1m, realized).

    Scale shape: W and the decile boundaries come from the bounded
    price-histogram plan (`weighted_median` contract); the
    inclusion pass is one streaming map folding 4 cells per decile.
    The decile of an order is its rank bucket by (price, orderkey)
    — computed from the same histogram, never a global sort."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )

    def hist_partials(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "v": pa.array(cents, pa.int64()),
                "c": pa.array(np.ones(len(cents), np.int64), pa.int64()),
            }
        ).group_by("v").aggregate([("c", "sum")])
        return pa.table(
            {"v": t.column("v"), "c": t.column("c_sum").cast(pa.int64())}
        )

    hist = (
        orders.map_batches(hist_partials, batch_format="pyarrow")
        .groupby("v")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the discrete price domain
    )
    vals = np.array(sorted(int(r["v"]) for r in hist), np.int64)
    cnts = np.array(
        [c for _, c in sorted((int(r["v"]), int(r["c"])) for r in hist)],
        np.int64,
    )
    cum = cnts.cumsum()
    n = int(cum[-1])
    W = int((vals * cnts).sum())
    # decile of a value: by rank of its LAST occurrence bucketed —
    # deciles split at ranks ceil(i*n/10); a value's orders may span
    # deciles only at boundaries — assign by the order's rank among
    # (price, orderkey), reproduced below via (value, within-value
    # orderkey rank); for the decile bounds we need rank prefixes:
    starts = np.concatenate([[0], cum[:-1]])  # rank before each value

    SPACE = 1 << 60

    def cells(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        u = np.array(
            [
                int(_hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
                for k in ok.tolist()
            ],
            dtype=object,
        )
        # exact inclusion: u*W < k*w*2^60  (python ints, no overflow)
        inc = np.array(
            [
                1 if int(uu) * W < PPS_TARGET * int(w) * SPACE else 0
                for uu, w in zip(u, cents.tolist())
            ],
            np.int64,
        )
        # expected numerator per order: floor(1e6 * min(1, k*w/W))
        exp = np.array(
            [
                min(10**6, 10**6 * PPS_TARGET * int(w) // W)
                for w in cents.tolist()
            ],
            np.int64,
        )
        # decile via global rank midpoint of the order's value run:
        # rank(order) = starts[value] + (rank among same-value orders)
        # — same-value rank needs orderkey order within value; for
        # decile assignment we use the value's START rank (all orders
        # of one value share a decile unless the run straddles a
        # boundary; using the start rank makes the rule exact and
        # mirrorable: decile = start_rank * 10 // n)
        idx = np.searchsorted(vals, cents)
        dec = (starts[idx] * 10 // n).astype(np.int64)
        t = pa.table(
            {
                "decile": pa.array(dec, pa.int64()),
                "n_orders": pa.array(
                    np.ones(len(dec), np.int64), pa.int64()
                ),
                "sum_price_cents": pa.array(cents, pa.int64()),
                "expected_x1m": pa.array(exp, pa.int64()),
                "realized": pa.array(inc, pa.int64()),
            }
        ).group_by("decile").aggregate(
            [
                ("n_orders", "sum"),
                ("sum_price_cents", "sum"),
                ("expected_x1m", "sum"),
                ("realized", "sum"),
            ]
        )
        return pa.table(
            {
                "decile": t.column("decile"),
                **{
                    c: t.column(f"{c}_sum").cast(pa.int64())
                    for c in (
                        "n_orders", "sum_price_cents", "expected_x1m",
                        "realized",
                    )
                },
            }
        )

    rows = (
        orders.map_batches(cells, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(
            _Sum("n_orders", alias_name="n_orders"),
            _Sum("sum_price_cents", alias_name="sum_price_cents"),
            _Sum("expected_x1m", alias_name="expected_x1m"),
            _Sum("realized", alias_name="realized"),
        )
        .take_all()  # bounded: 10 decile rows
    )
    df = pd.DataFrame(rows).sort_values("decile", ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[
        ["decile", "n_orders", "sum_price_cents", "expected_x1m",
         "realized"]
    ]


HQE_BUCKETS = 64   # equi-width synopsis size


def histogram_quantile_error(sf_dir: str) -> "pd.DataFrame":
    """Equi-WIDTH-histogram QUANTILE-estimation error — the dual of
    `histogram_selectivity_audit`: that one asks a synopsis for a
    range COUNT; this one asks it for the nine DECILE VALUES of
    l_extendedprice and compares against the exact order statistics.
    The 64-bucket equi-width synopsis estimates decile i (target
    rank k = i·n/10, value at rank max(k,1)) by walking bucket
    cumulative counts and interpolating uniformly inside the
    crossing bucket (integer floor arithmetic on the half-open
    bucket span): est = lo_b + (k − cum_before)·width_b //
    count_b. Skewed mass makes the mid-deciles land deep inside
    fat buckets — the error column is the case for equi-DEPTH
    synopses when quantiles are the workload. Output (decile,
    exact_value, est_value, abs_err).

    Scale shape: everything derives from one domain-bounded
    (cents → count) histogram fold (the `weighted_median`
    contract) routed through one constant-key co-partition; both
    the exact deciles and the synopsis walk vectorize in that one
    task and the driver sees 9 rows."""
    import pandas as pd

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        t = pa.table(
            {
                "v": pa.array(cents, pa.int64()),
                "c": pa.array(np.ones(len(cents), np.int64), pa.int64()),
            }
        ).group_by("v").aggregate([("c", "sum")])
        return pa.table(
            {
                "v": t.column("v"),
                "c": t.column("c_sum").cast(pa.int64()),
                "g": pa.array(np.zeros(len(t), np.int64), pa.int64()),
            }
        )

    def audit(group: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        df = group.to_pandas().groupby("v", sort=True)["c"].sum()
        vals = df.index.to_numpy(dtype=np.int64)
        cnt = df.to_numpy(dtype=np.int64)
        cum = cnt.cumsum()
        n = int(cum[-1])
        vmin, vmax = int(vals[0]), int(vals[-1])
        wb = (vmax - vmin) // HQE_BUCKETS + 1

        # equi-width bucket counts
        bidx = (vals - vmin) // wb
        bcnt = np.zeros(HQE_BUCKETS, np.int64)
        np.add.at(bcnt, bidx, cnt)
        bcum = bcnt.cumsum()

        out = []
        for i in range(1, 10):
            k = max(i * n // 10, 1)
            exact = int(vals[np.searchsorted(cum, k, side="left")])
            b = int(np.searchsorted(bcum, k, side="left"))
            cum_before = int(bcum[b - 1]) if b > 0 else 0
            lo_b = vmin + b * wb
            est = lo_b + (k - cum_before) * wb // max(int(bcnt[b]), 1)
            out.append((i, exact, int(est), abs(int(est) - exact)))
        arr = np.array(out, np.int64)
        return pa.table(
            {
                "decile": pa.array(arr[:, 0], pa.int64()),
                "exact_value": pa.array(arr[:, 1], pa.int64()),
                "est_value": pa.array(arr[:, 2], pa.int64()),
                "abs_err": pa.array(arr[:, 3], pa.int64()),
            }
        )

    df = (
        lit.map_batches(partials, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda g: audit(g.drop_columns(["g"])),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("decile", ignore_index=True)


RING_NODES = 16              # physical nodes
RING_VNODES = (1, 4, 16, 64)  # virtual nodes per physical node


def ring_vnode_balance(sf_dir: str) -> "pd.DataFrame":
    """Consistent-hash RING balance vs virtual-node count — place
    the customer keys on a 16-node hash ring with v ∈ {1,4,16,64}
    virtual nodes each (ring positions md5(node:replica), key goes
    to the first position clockwise from md5(key)), and report the
    exact per-level load spread: (vnodes, n_keys, max_load,
    min_load, imbalance_bp = 10⁴·(max−min)/mean). The classic ring
    result measured: v = 1 leaves O(log n / n) spread, and the
    spread shrinks ~1/√v — the third placement scheme beside
    `rendezvous_assign` (HRW) and `rebalance_delta_audit`'s modulo,
    and the one real stores (Dynamo/Cassandra) actually run; the
    curve is the vnode-count sizing table.

    Scale shape: the ring (≤ 16·64 positions) is built on the
    driver and broadcast once; key placement is one streaming pass
    with a vectorized searchsorted per level, folding a bounded
    16-cell load grid per level."""
    import hashlib as _hashlib

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )

    rings = {}
    for v in RING_VNODES:
        pos, owner = [], []
        for node in range(RING_NODES):
            for rep in range(v):
                h = int(
                    _hashlib.md5(f"{node}:{rep}".encode()).hexdigest()[:15],
                    16,
                )
                pos.append(h)
                owner.append(node)
        order = np.argsort(np.array(pos, np.int64), kind="stable")
        rings[v] = (
            np.array(pos, np.int64)[order],
            np.array(owner, np.int64)[order],
        )
    rings_ref = ray.put(rings)

    def cells(batch: pa.Table) -> pa.Table:
        rg = ray.get(rings_ref)
        ks = batch.column("c_custkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        u = np.array(
            [
                int(_hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
                for k in ks.tolist()
            ],
            np.int64,
        )
        v_out, n_out, l_out = [], [], []
        for v in RING_VNODES:
            pos, owner = rg[v]
            idx = np.searchsorted(pos, u, side="left")
            idx[idx == len(pos)] = 0  # wrap
            nodes = owner[idx]
            counts = np.bincount(nodes, minlength=RING_NODES).astype(
                np.int64
            )
            v_out.extend([v] * RING_NODES)
            n_out.extend(range(RING_NODES))
            l_out.extend(counts.tolist())
        return pa.table(
            {
                "vnodes": pa.array(v_out, pa.int64()),
                "node": pa.array(n_out, pa.int64()),
                "load": pa.array(l_out, pa.int64()),
            }
        )

    rows = (
        cust.map_batches(cells, batch_format="pyarrow")
        .groupby(["vnodes", "node"])
        .aggregate(_Sum("load", alias_name="load"))
        .take_all()  # bounded: 4 levels x 16 nodes
    )
    import collections

    per = collections.defaultdict(list)
    for r in rows:
        per[int(r["vnodes"])].append(int(r["load"]))
    out = []
    for v in RING_VNODES:
        loads = per[v]
        n_keys = sum(loads)
        mx, mn = max(loads), min(loads)
        mean = n_keys // RING_NODES
        out.append(
            (v, n_keys, mx, mn, (mx - mn) * 10000 // max(mean, 1))
        )
    df = pd.DataFrame(
        out,
        columns=["vnodes", "n_keys", "max_load", "min_load",
                 "imbalance_bp"],
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


import itertools as _itertools

PRED_ORDER_NAMES = ("ret_r", "qty_hi", "disc_hi", "status_f")


def predicate_order_sequences():
    """All 24 evaluation orders of the four canonical lineitem
    predicates — shared verbatim with the SQL oracle generator."""
    return sorted(
        ">".join(p) for p in _itertools.permutations(PRED_ORDER_NAMES)
    )


def predicate_order_costs(sf_dir: str) -> "pd.DataFrame":
    """SHORT-CIRCUIT conjunct-ordering costs with EXACT conditional
    selectivities — for every one of the 24 evaluation orders of the
    four canonical lineitem predicates (returnflag='R',
    quantity≥25, discount≥5%, linestatus='F'), the exact number of
    predicate evaluations a short-circuiting AND performs:
    evals = n + n_{p1} + n_{p1∧p2} + n_{p1∧p2∧p3}. The textbook
    rule orders by MARGINAL selectivity, but correlated predicates
    break it (`selectivity_drift` measures the correlations; this
    costs their consequence): the exact 2⁴-cell joint distribution
    makes every conditional exact, and the ranking shows how far
    the marginal-order heuristic lands from optimal on this corpus.
    Output (ord, order_str, evals), ranked by (evals, order_str).

    Scale shape: ONE streaming pass folds the 16-cell predicate-
    bitmask histogram (vectorized flags per batch); all 24 order
    costs are driver arithmetic over those 16 integers."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_quantity", "l_discount", "l_linestatus"
        ],
    )

    def cells(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        dc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        ls = batch.column("l_linestatus").to_numpy(zero_copy_only=False)
        flags = (
            (rf == "R").astype(np.int64)
            + 2 * (qty >= 25).astype(np.int64)
            + 4 * (np.floor(dc * 100.0 + 0.5) >= 5).astype(np.int64)
            + 8 * (ls == "F").astype(np.int64)
        )
        cnt = np.bincount(flags, minlength=16).astype(np.int64)
        return pa.table(
            {
                "mask": pa.array(np.arange(16, dtype=np.int64), pa.int64()),
                "c": pa.array(cnt, pa.int64()),
            }
        )

    rows = (
        lit.map_batches(cells, batch_format="pyarrow")
        .groupby("mask")
        .aggregate(_Sum("c", alias_name="c"))
        .take_all()  # bounded: the 16-cell joint grid
    )
    cnt = np.zeros(16, np.int64)
    for r in rows:
        cnt[int(r["mask"])] = int(r["c"])
    n = int(cnt.sum())
    bit = {name: 1 << i for i, name in enumerate(PRED_ORDER_NAMES)}

    def count_all(preds) -> int:
        need = 0
        for p in preds:
            need |= bit[p]
        return int(
            sum(cnt[m] for m in range(16) if (m & need) == need)
        )

    out = []
    for order_str in predicate_order_sequences():
        ps = order_str.split(">")
        evals = n
        for i in range(1, 4):
            evals += count_all(ps[:i])
        out.append((order_str, evals))
    df = pd.DataFrame(out, columns=["order_str", "evals"]).sort_values(
        ["evals", "order_str"], ignore_index=True
    )
    df.insert(0, "ord", np.arange(1, len(df) + 1, dtype=np.int64))
    df["evals"] = df["evals"].astype("int64")
    return df


def stream_disorder_profile(sf_dir: str) -> "pd.DataFrame":
    """STREAM-DISORDER profile — the histogram of |rank-by-event-time
    − rank-by-ingest-order| over ORDERS (ingest order = orderkey;
    event time = the order's FIRST ship date, ties broken by
    orderkey), bucketed by powers of two (bucket −1 = perfectly
    placed): how far orders sit from their time-ordered position,
    which is exactly the reorder-buffer / allowed-lateness sizing
    question — `late_data_watermark` counts lateness in TIME; this
    measures it in RANKS, the unit a bounded reorder buffer
    actually works in. (The events table is perfectly time-ordered
    by construction and lineitem's (orderkey, linenumber) is not
    unique in this fixture, so the order-level stream is the
    well-posed disordered sequence.) Output (bucket_pow2, n_rows).

    Scale shape: the (orderkey → min ship-day) fold is one
    exchange; BOTH ranks then come from bounded 64-cell count
    grids (orderkey ranges / day ranges) + per-bucket local sorts —
    never a global sort; the two rank row-sets meet in one
    orderkey co-partition of slim int64 rows and displacements
    fold into a ≤ 26-cell histogram."""
    import pandas as pd

    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    lit = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def base_rows(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        day = (
            (d.astype("datetime64[D]") - HAAR_EPOCH)
            // np.timedelta64(1, "D")
        ).astype(np.int64)
        t = pa.table(
            {
                "key": pa.array(ok, pa.int64()),
                "day": pa.array(day, pa.int64()),
            }
        ).group_by("key").aggregate([("day", "min")])
        return pa.table(
            {
                "key": t.column("key"),
                "day": t.column("day_min").cast(pa.int64()),
            }
        )

    rows0 = (
        lit.map_batches(base_rows, batch_format="pyarrow")
        .groupby("key")
        .aggregate(_Min("day"))
        .map_batches(
            lambda b: pa.table(
                {
                    "key": b.column("key").cast(pa.int64()),
                    "day": b.column("min(day)").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def rank_pass(cell_col_fn, sort_cols):
        kd = rows0.map_batches(
            cell_col_fn, batch_format="pyarrow"
        ).materialize()
        counts = {
            int(r["cell"]): int(r["count()"])
            for r in kd.groupby("cell").count().take_all()
        }  # bounded: 256 cells
        bases = {}
        acc = 0
        for c in sorted(counts):
            bases[c] = acc
            acc += counts[c]
        bases_ref = ray.put(bases)

        def pos_rows(group: pa.Table) -> pa.Table:
            import pandas as pd  # noqa: F811

            cell = int(group.column("cell")[0].as_py())
            base = ray.get(bases_ref)[cell]
            df = group.to_pandas().sort_values(sort_cols)
            return pa.table(
                {
                    "key": pa.array(
                        df["key"].to_numpy(np.int64), pa.int64()
                    ),
                    "pos": pa.array(
                        base + np.arange(1, len(df) + 1, dtype=np.int64),
                        pa.int64(),
                    ),
                }
            )

        return (
            kd.groupby("cell")
            .map_groups(pos_rows, batch_format="pyarrow")
            .repartition(8)
            .materialize()
        )

    lohi = rows0.aggregate(_Min("key"), _Max("key"))
    olo, ohi = int(lohi["min(key)"]), int(lohi["max(key)"])
    # 64-cell grids: the rank pass cost is per-task fixed overhead,
    # not volume (the narrow-fan rule) — 256 cells measured 11.6 s,
    # 64 cells ~7 s at sf0.1
    wo = (ohi - olo) // 64 + 1

    def cell_ingest(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "cell", pa.array((k - olo) // wo, pa.int64())
        )

    dlohi = rows0.aggregate(_Min("day"), _Max("day"))
    dlo, dhi = int(dlohi["min(day)"]), int(dlohi["max(day)"])
    wd = (dhi - dlo) // 64 + 1

    def cell_time(batch: pa.Table) -> pa.Table:
        day = batch.column("day").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "cell", pa.array((day - dlo) // wd, pa.int64())
        )

    pos_a = rank_pass(cell_ingest, ["key"])
    pos_t = rank_pass(cell_time, ["day", "key"])

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": batch.column("key").cast(pa.int64()),
                    "pos": batch.column("pos").cast(pa.int64()),
                    "side": pa.array(
                        np.full(batch.num_rows, side, np.int64),
                        pa.int64(),
                    ),
                    "part": pa.array(
                        batch.column("key").to_numpy(
                            zero_copy_only=False
                        )
                        % 64,
                        pa.int64(),
                    ),
                }
            )

        return fn

    def disp_fold(part_tbl: pa.Table) -> pa.Table:
        import collections

        import pandas as pd  # noqa: F811

        df = part_tbl.to_pandas()
        a = df[df["side"] == 0].set_index("key")["pos"]
        t = df[df["side"] == 1].set_index("key")["pos"]
        d = (a - t).abs().to_numpy(np.int64)
        c: collections.Counter = collections.Counter()
        for v in d.tolist():
            b = -1 if v == 0 else int(v).bit_length() - 1
            c[b] += 1
        keys = sorted(c)
        return pa.table(
            {
                "bucket_pow2": pa.array(keys, pa.int64()),
                "n_rows": pa.array([c[k] for k in keys], pa.int64()),
            }
        )

    rows = (
        pos_a.map_batches(tag(0), batch_format="pyarrow")
        .union(pos_t.map_batches(tag(1), batch_format="pyarrow"))
        .groupby("part")
        .map_groups(
            lambda g: disp_fold(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .groupby("bucket_pow2")
        .aggregate(_Sum("n_rows", alias_name="n_rows"))
        .take_all()  # bounded: <= 26 log buckets
    )
    df = pd.DataFrame(rows).sort_values("bucket_pow2", ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df
