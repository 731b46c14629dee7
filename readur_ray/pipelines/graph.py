"""Iterative distributed graph algorithms over the fixture relations.

PageRank is the canonical web-scale quality-weighting signal a
training-data curation pipeline consumes (Common-Crawl-style corpus
weighting ranks hosts by centrality before sampling; see the harmonic
centrality discussion in PAPERS.md). The reference has no graph
operator — this extends the engine the same way the dedup/curation
suites do, with the shapes that survive 100 TB:

- the graph is BUILT with one big-big co-partitioned shuffle equi-join
  (orders ⋈ lineitem on orderkey, both fact-scale — the
  ``order_priority_join`` pattern) whose output is already keyed by
  src; pair-distinct folds into scatter's partition-local distinct
  (exact: all copies of a pair share its src partition). Vertex ids
  are disjoint integers (customer 2k, supplier 2k+1) and the graph is
  symmetrized so no vertex dangles;
- iterations are Pregel supersteps with ONE message shuffle each: the
  edge list is partitioned by ``src % P`` once and pinned in the
  object store as P per-partition tables ({part: ObjectRef}); scatter
  is a shuffle-FREE ``map_batches`` over the co-partitioned rank
  blocks (each task plasma-reads only its partition's edges, computes
  ``rank // outdeg`` per edge and pre-combines by dst — the combiner
  that bounds skew), and gather is the one ``dst % P`` shuffle that
  sums + damps. No driver-side state ever holds a vertex vector —
  ranks checkpoint to the object store per superstep
  (``materialize()`` is the Pregel barrier, and it also keeps Ray's
  two-pass sort-shuffle from re-executing the superstep chain);
- arithmetic is EXACT int64 fixed-point (SCALE = 1e9, truncating
  division, damping 85/100) so the result is bit-equal to the DuckDB
  oracle's unrolled-CTE replay regardless of partitioning, batch
  order, or cluster layout. At 10^9+ vertices with celebrity in-degree
  > 1e8 the 85·Σ term approaches int64 range — the scale dial is
  SCALE (drop to 1e6) or a two-word accumulator, never float.

Oracle: ``__ray_entry__.oracle_sql()['pagerank']`` unrolls the same
PR_ITERS iterations as chained CTEs with identical integer ops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


PR_SCALE = 1_000_000_000   # fixed-point 1.0 (unnormalized PageRank: r0 = SCALE)
PR_DAMP_NUM = 85           # damping d = 85/100
PR_DAMP_DEN = 100
PR_BASE = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN  # (1-d)·SCALE
PR_ITERS = 5

# Shuffle width for the rank iterations. At test scale the cost of an
# iteration is the FIXED all-to-all barrier, not data volume, so a
# narrow fan (16) halves wall time vs N_COARSE_PARTS=64; at 100 TB this
# is the dial to raise toward #cores (results are invariant to it —
# partitioning only routes rows).
PR_PARTS = 16

def _edges(sf_dir: str) -> "ray.data.Dataset":
    """Symmetric customer↔supplier edges from orders ⋈ lineitem in ONE
    coarse shuffle (the co-partitioned join on orderkey), emitted keyed
    by src. Rows: (a=src, b=dst, part=src % P), all int64;
    cross-partition duplicate pairs survive until scatter's
    partition-local distinct (globally exact because every copy of a
    pair shares its src partition)."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )

    def order_side(batch: pa.Table) -> pa.Table:
        keys = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        cust = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "val": pa.array(cust.astype(np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(keys), np.int64), pa.int64()),
                "part": pa.array(keys % PR_PARTS, pa.int64()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        keys = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        supp = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "val": pa.array(supp.astype(np.int64), pa.int64()),
                "side": pa.array(np.ones(len(keys), np.int64), pa.int64()),
                "part": pa.array(keys % PR_PARTS, pa.int64()),
            }
        )

    both = orders.map_batches(order_side, batch_format="pyarrow").union(
        lines.map_batches(line_side, batch_format="pyarrow")
    )

    def join_part(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = part_tbl.to_pandas()
        build = df[df["side"] == 0].set_index("key")["val"]  # orderkey → custkey
        probe = df[df["side"] == 1]
        cust = probe["key"].map(build)
        pairs = pd.DataFrame(
            {"c": cust.to_numpy(), "s": probe["val"].to_numpy()}
        ).dropna(subset=["c"]).drop_duplicates()  # partition-local dedup;
        # cross-partition copies are dropped in scatter (all copies of a
        # pair share its src partition)
        c = pairs["c"].to_numpy().astype(np.int64) * 2
        s = pairs["s"].to_numpy().astype(np.int64) * 2 + 1
        src = np.concatenate([c, s])  # symmetric emission
        dst = np.concatenate([s, c])
        return pa.table(
            {
                "a": pa.array(src, pa.int64()),
                "b": pa.array(dst, pa.int64()),
                "part": pa.array(src % PR_PARTS, pa.int64()),
            }
        )

    # materialize before the sort-shuffle: Ray's sort samples
    # boundaries in a separate pass, which would otherwise re-execute
    # the upstream (including the parquet read) twice.
    #
    # Note: join_part may emit the same (src, dst) pair from different
    # orderkey partitions — but ALL copies of a pair share its src, so
    # they co-locate in the src-keyed output and the per-partition
    # drop_duplicates in scatter() is globally exact. Folding the
    # distinct into scatter saves a whole sort + materialize.
    return (
        both.materialize()
        .groupby("part")
        .map_groups(join_part, batch_format="pyarrow")
    )


def pagerank(sf_dir: str, iters: int = PR_ITERS) -> "ray.data.Dataset":
    """Exact-integer synchronous PageRank over the symmetric
    customer↔supplier graph (vertex ids: customer 2k, supplier 2k+1).

    r_0(v) = SCALE; r_{i+1}(v) = (1-d)·SCALE + d·Σ_{u→v} r_i(u)//deg(u)
    with d = 85/100 and every division truncating int64 — bit-equal to
    the oracle's unrolled CTEs. Returns (node, pagerank).

    Scale shape: see the module docstring — edges pin in the object
    store partitioned by src once ({part: ObjectRef}, P refs, never on
    the driver); each superstep is a shuffle-free scatter over the
    co-partitioned rank blocks + ONE message shuffle to gather. Outdeg
    is recomputed inside the src-partition (all edges of a src
    co-reside, so the local count IS the global outdegree)."""
    edges = _edges(sf_dir).materialize()

    # Pin each src-partition's edge table as one object-store ref.
    # P probe tasks map block → part id; only refs reach the driver.
    @ray.remote
    def _probe(block) -> list:
        if block.num_rows == 0 or "part" not in block.schema.names:
            return []  # empty shuffle outputs carry no schema
        parts = block.column("part").to_numpy(zero_copy_only=False)
        return [int(p) for p in np.unique(parts)]

    # A block may hold several partitions (map_groups packs multiple
    # groups per task) and a partition may span several blocks (block
    # splitting) — so map part → every block that contains it.
    blocks = edges.get_internal_block_refs()
    edge_parts: dict[int, list] = {}
    for ref, parts in zip(blocks, ray.get([_probe.remote(b) for b in blocks])):
        for part in parts:
            edge_parts.setdefault(part, []).append(ref)

    # r0: every vertex appears as a src (graph is symmetric), so the
    # per-PARTITION distinct src set is the global vertex set. Seeded
    # via map_groups (never per-block unique: a partition spanning two
    # blocks would emit a node twice and double its contributions).
    def seed_ranks(part_tbl: pa.Table) -> pa.Table:
        src = np.unique(part_tbl.column("a").to_numpy(zero_copy_only=False))
        n = len(src)
        return pa.table(
            {
                "node": pa.array(src, pa.int64()),
                "r": pa.array(np.full(n, PR_SCALE, np.int64), pa.int64()),
                "part": pa.array(src % PR_PARTS, pa.int64()),
            }
        )

    ranks = (
        edges.groupby("part")
        .map_groups(seed_ranks, batch_format="pyarrow")
        .materialize()
    )

    def scatter(rank_tbl: pa.Table) -> pa.Table:
        """One rank partition (whole block): plasma-read the matching
        edge partition, contribution r(src)//outdeg(src) per edge,
        pre-combined by dst (the skew combiner), re-keyed by dst."""
        import pandas as pd

        if rank_tbl.num_rows == 0:
            return pa.table(
                {
                    "dst": pa.array([], pa.int64()),
                    "contrib": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        # the batch may span several partitions (and a partition several
        # blocks) — fetch every edge block touching them, deduped by ref
        parts = np.unique(rank_tbl.column("part").to_numpy(zero_copy_only=False))
        refs = list({r for p in parts for r in edge_parts.get(int(p), [])})
        e = pa.concat_tables(ray.get(refs)).to_pandas() if refs else None
        if e is None:
            return pa.table(
                {
                    "dst": pa.array([], pa.int64()),
                    "contrib": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        # global pair-distinct: every copy of (a, b) shares a, so all
        # copies co-reside in this src partition
        e = e.drop_duplicates(["a", "b"])
        r = pd.Series(
            rank_tbl.column("r").to_numpy(zero_copy_only=False),
            index=rank_tbl.column("node").to_numpy(zero_copy_only=False),
        )
        # keep only edges whose src is in THIS batch: if Ray splits a
        # rank partition into several blocks, each split emits its own
        # srcs' contributions exactly once (a src's full edge set stays
        # intact — the filter drops other srcs' edges, so the local
        # degree below is still the global outdegree)
        e = e[e["a"].isin(r.index)]
        if not len(e):
            return pa.table(
                {
                    "dst": pa.array([], pa.int64()),
                    "contrib": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        deg = e.groupby("a")["b"].transform("size").to_numpy().astype(np.int64)
        contrib = (
            r.loc[e["a"].to_numpy()].to_numpy().astype(np.int64) // deg
        )
        g = (
            pd.DataFrame({"dst": e["b"].to_numpy(), "c": contrib})
            .groupby("dst", sort=False)["c"]
            .sum()
        )
        dst = g.index.to_numpy().astype(np.int64)
        return pa.table(
            {
                "dst": pa.array(dst, pa.int64()),
                "contrib": pa.array(g.to_numpy().astype(np.int64), pa.int64()),
                "part": pa.array(dst % PR_PARTS, pa.int64()),
            }
        )

    def gather(part_tbl: pa.Table) -> pa.Table:
        """One dst-partition: sum + damp → next ranks, co-partitioned
        for the next scatter."""
        df = part_tbl.to_pandas()
        g = df.groupby("dst", sort=False)["contrib"].sum()
        node = g.index.to_numpy().astype(np.int64)
        r = PR_BASE + PR_DAMP_NUM * g.to_numpy().astype(np.int64) // PR_DAMP_DEN
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "r": pa.array(r, pa.int64()),
                "part": pa.array(node % PR_PARTS, pa.int64()),
            }
        )

    for _ in range(iters):
        ranks = (
            ranks.map_batches(scatter, batch_format="pyarrow", batch_size=None)
            .groupby("part")
            .map_groups(gather, batch_format="pyarrow")
            .materialize()  # Pregel superstep barrier / checkpoint
        )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "pagerank": batch.column("r"),
            }
        )

    return ranks.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# triangle counting over the near-dup candidate graph
# ---------------------------------------------------------------------------

# Wedge centers with more neighbors than this skip wedge emission (the
# triangle is still counted iff its MINIMUM vertex is under the cap).
# The MinHash edge list already bounds degree structurally — a doc can
# gain at most (MAX_BUCKET - 1) neighbors per band, i.e. ≤ 16 × 127 =
# 2032 — so the cap is a second, independent guard for graphs built by
# other generators; the oracle mirrors it with a window QUALIFY.
TRI_DEGREE_CAP = 1024


def triangle_count(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc TRIANGLE participation counts over the MinHash-LSH
    candidate-pair graph — the graph-MOTIF counting class (clustering
    coefficient / community density), distinct from pagerank's
    iterative message passing and neardup_components' contraction: a
    triangle among near-dup candidates is the strongest non-transitive
    duplicate-cluster evidence (A~B, B~C, AND A~C all observed), the
    signal that separates dense template families from accidental
    chains before committing to component-level removal.

    Node-iterator plan (two coarse shuffles past the shared pair
    graph, all int64 columns, no driver state):
      1. edges (doc_a < doc_b) shuffle once on hash(doc_a); each
         partition emits WEDGES around its min-vertices — for every
         center x with sorted neighbors y < z, the packed candidate
         (y << 32 | z) carrying x — via the same vectorized size-class
         pair emitter the LSH buckets use (``_bucket_pairs_fn``), which
         also enforces ``TRI_DEGREE_CAP``: hot centers (degree > cap)
         emit nothing, so the quadratic wedge blowup is bounded and a
         triangle is counted iff its minimum vertex is under the cap
         (the oracle applies the identical rule);
      2. wedges and edges meet on hash(packed pair key): a wedge
         closes iff its (y, z) is an edge; each closed triangle
         (x, y, z) emits three (doc, 1) rows;
      3. one tiny groupby(doc) sum → (doc_id, n_triangles), only docs
         in ≥ 1 triangle.

    Skew: wedges per center are ≤ cap²/2 regardless of how hot a
    template family is, and the closing-edge partition receives only
    packed-int64 rows. At 100 TB the dial is TRI_DEGREE_CAP (drop hot
    hubs — standard practice: their triangles are template noise, the
    same argument as MAX_BUCKET) and the coarse width.
    """
    from .dedup import _bucket_pairs_fn, _unpack_key, pairs_materialized
    from ..stages.shuffle import int_partition

    edges = pairs_materialized(sf_dir)

    # --- hop 1: wedge emission around each edge's min endpoint ---
    def center_rows(batch: pa.Table) -> pa.Table:
        src = batch.column("doc_a").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "doc_id": batch.column("doc_b"),
                "ctr": pa.array(src, pa.int64()),  # rides as carry
                "part": pa.array(int_partition(src), pa.int64()),
            }
        )

    wedge_fn = _bucket_pairs_fn(["src"], TRI_DEGREE_CAP, carry=("ctr",))
    wedges = (
        edges.map_batches(center_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedge_fn, batch_format="pyarrow")
    )
    # (pair_key = y<<32|z, ctr_a = ctr_b = x); drop the duplicate col
    wedges = wedges.map_batches(
        lambda b: pa.table(
            {
                "pair_key": b.column("pair_key"),
                "center": b.column("ctr_a"),
            }
        ),
        batch_format="pyarrow",
    )

    # --- hop 2: close wedges against the edge set ---
    def edge_keys(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pair_key": pa.array((a << np.int64(32)) | b, pa.int64()),
                "center": pa.array(np.full(len(a), -1, dtype=np.int64), pa.int64()),
            }
        )

    both = wedges.union(edges.map_batches(edge_keys, batch_format="pyarrow"))

    def add_part2(batch: pa.Table) -> pa.Table:
        k = batch.column("pair_key").to_numpy(zero_copy_only=False)
        return batch.append_column("part2", pa.array(int_partition(k), pa.int64()))

    def close_part(part_tbl: pa.Table) -> pa.Table:
        k = part_tbl.column("pair_key").to_numpy(zero_copy_only=False)
        c = part_tbl.column("center").to_numpy(zero_copy_only=False)
        is_edge = c == -1
        edge_set = k[is_edge]
        hit = np.isin(k[~is_edge], edge_set)
        keys = k[~is_edge][hit]
        if keys.size == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        x = c[~is_edge][hit]
        y, z = _unpack_key(keys)
        docs = np.concatenate([x, y, z])
        ids, counts = np.unique(docs, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    closed = (
        both.map_batches(add_part2, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(close_part, batch_format="pyarrow")
    )

    # --- final tiny reduce: per-doc triangle totals ---
    def add_part3(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column("part3", pa.array(int_partition(d), pa.int64()))

    def sum_part(part_tbl: pa.Table) -> pa.Table:
        df = part_tbl.to_pandas()
        g = df.groupby("doc_id", sort=False)["n"].sum()
        return pa.table(
            {
                "doc_id": pa.array(g.index.to_numpy().astype(np.int64), pa.int64()),
                "n_triangles": pa.array(g.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    return (
        closed.map_batches(add_part3, batch_format="pyarrow")
        .groupby("part3")
        .map_groups(sum_part, batch_format="pyarrow")
    )


RICH_KS = (1, 2, 4, 8, 16)  # degree thresholds for the rich-club curve


def rich_club(sf_dir: str) -> "pd.DataFrame":
    """Rich-club connectivity curve over the MinHash-LSH candidate
    graph — for each degree threshold k, how densely do the
    high-degree nodes link to EACH OTHER: (k, n_rich, e_rich) with
    n_rich = nodes of degree > k and e_rich = candidate pairs whose
    BOTH endpoints are rich. φ(k) = e_rich / C(n_rich, 2) rising
    toward 1 is the template-family signature (hot near-dup hubs
    forming a dense core — exactly the structure TRI_DEGREE_CAP and
    MAX_BUCKET defend against), while a flat low curve says
    duplication is scattered; degree_assortativity summarizes mixing
    in ONE number, this resolves it across the degree scale.

    Scale shape (the degree_assortativity two-exchange shape plus a
    bounded threshold fold): endpoint rows co-partition on node
    (degrees via one np.unique; per-part rich-node counts per
    threshold ride as first-row carry columns, the triangle_census
    discipline); (eid, deg) rows co-partition on the packed edge key
    where a two-row pyarrow min gives each edge's weaker endpoint,
    folding per-threshold indicator sums. Output is |RICH_KS| rows;
    only int64 rows cross either exchange."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from .dedup import pairs_materialized
    from ..stages.shuffle import N_COARSE_PARTS

    edges = pairs_materialized(sf_dir)
    m_edges = edges.count()
    parts = N_COARSE_PARTS if 2 * m_edges >= 1_000_000 else 8
    PACK = 1 << 32
    ks = np.array(RICH_KS, np.int64)

    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column("doc_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = a * PACK + b
        node = np.concatenate([a, b])
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "eid": pa.array(np.concatenate([eid, eid]), pa.int64()),
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
        carry = np.zeros((len(ks), n), np.int64)
        if n:
            c = cnt.astype(np.int64)
            for i, k in enumerate(ks):
                carry[i, 0] = int((c > k).sum())
        cols = {
            "eid": pa.array(eid, pa.int64()),
            "deg": pa.array(deg, pa.int64()),
            "part": pa.array(eid % parts, pa.int64()),
        }
        for i in range(len(ks)):
            cols[f"nr{i}"] = pa.array(carry[i], pa.int64())
        return pa.table(cols)

    degrows = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("part")
        .map_groups(node_degrees, batch_format="pyarrow")
        .materialize()
    )
    nr_aggs = [_Sum(f"nr{i}", alias_name=f"nr{i}") for i in range(len(ks))]
    nrich = degrows.aggregate(*nr_aggs)

    def edge_minfold(part_tbl: pa.Table) -> pa.Table:
        t = (
            part_tbl.select(["eid", "deg"])
            .group_by("eid")
            .aggregate([("deg", "min")])
        )
        mind = t.column("deg_min").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                f"er{i}": pa.array([int((mind > k).sum())], pa.int64())
                for i, k in enumerate(ks)
            }
        )

    er_aggs = [_Sum(f"er{i}", alias_name=f"er{i}") for i in range(len(ks))]
    erich = (
        degrows.groupby("part")
        .map_groups(edge_minfold, batch_format="pyarrow")
        .aggregate(*er_aggs)
    )
    out = [
        {
            "k": int(k),
            "n_rich": int(nrich[f"nr{i}"]),
            "e_rich": int(erich[f"er{i}"]),
        }
        for i, k in enumerate(ks)
    ]
    df = pd.DataFrame(out)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["k", "n_rich", "e_rich"]]


def clustering_coeff_hist(sf_dir: str) -> "pd.DataFrame":
    """Per-node local clustering-coefficient histogram over the
    MinHash-LSH candidate graph — the DISTRIBUTION behind
    triangle_census's single global number: nodes of degree ≥ 2 band
    by ⌊10·2t/(d(d−1))⌋ where t is the node's capped triangle
    participation (triangle_count's TRI_DEGREE_CAP semantics,
    mirrored by its oracle: triangles whose minimum vertex is a hot
    hub are dropped on BOTH sides, so the histogram is exact for the
    capped statistic). Band 10 is a locally-complete neighborhood
    (clique member — the template-family core); a heavy band 0 with
    high degree is hub noise. Output per band: (band, n_nodes).

    Scale shape: degrees fold from one endpoint co-partition;
    per-node capped triangle counts come from the memoized
    triangle_count plan; the two slim int64 row sets co-partition on
    the node key (tagged union) and collapse to an ≤11-cell band
    grid."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from .dedup import pairs_materialized
    from ..stages.shuffle import N_COARSE_PARTS

    edges = pairs_materialized(sf_dir)

    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column("doc_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        node = np.concatenate([a, b])
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "t": pa.array(np.zeros(len(node), np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(node), np.int64), pa.int64()),
                "part": pa.array(node % N_COARSE_PARTS, pa.int64()),
            }
        )

    tri = triangle_count(sf_dir)

    def tri_side(batch: pa.Table) -> pa.Table:
        n = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "node": pa.array(n, pa.int64()),
                "t": batch.column("n_triangles").cast(pa.int64()),
                "side": pa.array(np.ones(len(n), np.int64), pa.int64()),
                "part": pa.array(n % N_COARSE_PARTS, pa.int64()),
            }
        )

    def band_part(part_tbl: pa.Table) -> pa.Table:
        node = part_tbl.column("node").to_numpy(zero_copy_only=False)
        t = part_tbl.column("t").to_numpy(zero_copy_only=False)
        side = part_tbl.column("side").to_numpy(zero_copy_only=False)
        en = node[side == 0]
        uniq, cnt = np.unique(en, return_counts=True)
        deg = cnt.astype(np.int64)
        tn, tv = node[side == 1], t[side == 1]
        tmap = np.zeros(len(uniq), np.int64)
        pos = np.searchsorted(uniq, tn)
        ok = (pos < len(uniq)) & (uniq[np.minimum(pos, len(uniq) - 1)] == tn)
        np.add.at(tmap, pos[ok], tv[ok])
        sel = deg >= 2
        poss = deg[sel] * (deg[sel] - 1) // 2
        band = np.minimum(10 * tmap[sel] // poss, 10)
        u, c = np.unique(band, return_counts=True)
        return pa.table(
            {
                "band": pa.array(u, pa.int64()),
                "n_nodes": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    rows = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .union(tri.map_batches(tri_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(
            lambda g: band_part(g), batch_format="pyarrow"
        )
        .groupby("band")
        .aggregate(_Sum("n_nodes", alias_name="n_nodes"))
        .take_all()  # bounded: <= 11 rows
    )
    df = pd.DataFrame(rows).sort_values("band", ignore_index=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df[["band", "n_nodes"]]


def lang_homophily(sf_dir: str) -> "pd.DataFrame":
    """Attribute homophily of the near-dup candidate graph — Newman
    modularity Q computed for the LANGUAGE partition instead of a
    learned one: do candidate pairs stay within a language (Q ≫ 0,
    the expected signature — near-dups are same-language) or do
    cross-language candidates leak in (Q ≈ 0 flags transliteration /
    boilerplate collisions that fuzzy dedup would wrongly merge)?
    Exact integers throughout: per language the intra-edge count,
    degree mass and node count, and the global
    q_x1e6 = (Σ_l(4m·e_l − d_l²) + 4m²)·10⁶ // 4m² − 10⁶ (the
    community_modularity shift discipline). Output per language:
    (lang, n_nodes, intra_edges, degree_sum, q_x1e6).

    Scale shape: community_modularity's two tagged-union
    co-partitions with the label side swapped for the documents'
    (doc_id, lang) projection — labels are doc-cardinality, never
    broadcast; degree mass falls out of the directed endpoint rows;
    the Q fold runs on the ≤|langs| driver grid. Width-1 escape
    below 1M directed rows."""
    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    from .dedup import pairs_materialized
    from ..stages.shuffle import N_COARSE_PARTS

    edges = pairs_materialized(sf_dir)
    m_edges = edges.count()
    parts = N_COARSE_PARTS if 2 * m_edges >= 1_000_000 else 8

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    if 2 * m_edges < 1_000_000:
        # width-1: gather the edge list and the label projection for
        # graph nodes via ONE pushdown-free pass over the slim rows
        et = edges.select_columns(["doc_a", "doc_b"]).take_all()
        a = np.array([r["doc_a"] for r in et], np.int64)
        b = np.array([r["doc_b"] for r in et], np.int64)
        nodes = np.unique(np.concatenate([a, b]))
        lt = docs.take_all()
        lmap = {int(r["doc_id"]): r["lang"] for r in lt}
        la = np.array([lmap[int(x)] for x in a], object)
        lb = np.array([lmap[int(x)] for x in b], object)
        m = len(a)
        langs = sorted({lmap[int(n)] for n in nodes})
        rows = []
        tot = 0
        for lg in langs:
            intra = int(((la == lg) & (lb == lg)).sum())
            dmass = int((la == lg).sum() + (lb == lg).sum())
            n_nodes = int(
                sum(1 for n in nodes if lmap[int(n)] == lg)
            )
            tot += 4 * m * intra - dmass * dmass
            rows.append((lg, n_nodes, intra, dmass))
        q = ((tot + 4 * m * m) * 1_000_000) // (4 * m * m) - 1_000_000
        df = pd.DataFrame(
            [
                {
                    "lang": lg,
                    "n_nodes": nn,
                    "intra_edges": ie,
                    "degree_sum": dm,
                    "q_x1e6": q,
                }
                for lg, nn, ie, dm in rows
            ]
        ).sort_values("lang", ignore_index=True)
        for c in df.columns[1:]:
            df[c] = df[c].astype("int64")
        return df

    # exchange plan: attach langs on the node key, reassemble pairs
    # on the edge key
    PACK = 1 << 32

    def endpoint_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column("doc_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        eid = a * PACK + b
        node = np.concatenate([a, b])
        return pa.table(
            {
                "key": pa.array(node, pa.int64()),
                "eid": pa.array(np.concatenate([eid, eid]), pa.int64()),
                "lang": pa.array([""] * (2 * len(a)), pa.string()),
                "part": pa.array(node % parts, pa.int64()),
            }
        )

    def lab_rows(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "key": pa.array(d, pa.int64()),
                "eid": pa.array(np.full(len(d), -1, np.int64), pa.int64()),
                "lang": batch.column("lang"),
                "part": pa.array(d % parts, pa.int64()),
            }
        )

    def attach(part_tbl: pa.Table) -> pa.Table:
        key = part_tbl.column("key").to_numpy(zero_copy_only=False)
        eid = part_tbl.column("eid").to_numpy(zero_copy_only=False)
        lang = part_tbl.column("lang").to_pandas().to_numpy(dtype=object)
        is_lab = eid < 0
        lk = key[is_lab]
        lorder = np.argsort(lk, kind="stable")
        lk_s, lv_s = lk[lorder], lang[is_lab][lorder]
        ek, ee = key[~is_lab], eid[~is_lab]
        pos = np.searchsorted(lk_s, ek)
        return pa.table(
            {
                "eid": pa.array(ee, pa.int64()),
                "lang": pa.array(lv_s[pos], pa.string()),
                "part": pa.array(ee % parts, pa.int64()),
            }
        )

    def pair_fold(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        eid = part_tbl.column("eid").to_numpy(zero_copy_only=False)
        lang = part_tbl.column("lang").to_pandas().to_numpy(dtype=object)
        order = np.argsort(eid, kind="stable")
        es, ls = eid[order], lang[order]
        # two rows per eid; intra iff both langs equal
        la, lb = ls[0::2], ls[1::2]
        same = la == lb
        g = (
            pd.DataFrame({"lang": la[same], "n": 1})
            .groupby("lang", sort=False)["n"]
            .sum()
            .reset_index()
        )
        dm = (
            pd.DataFrame({"lang": ls, "n": 1})
            .groupby("lang", sort=False)["n"]
            .sum()
            .reset_index()
        )
        t1 = pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "intra": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
                "dmass": pa.array(np.zeros(len(g), np.int64), pa.int64()),
            }
        )
        t2 = pa.table(
            {
                "lang": pa.array(dm["lang"], pa.string()),
                "intra": pa.array(np.zeros(len(dm), np.int64), pa.int64()),
                "dmass": pa.array(dm["n"].to_numpy(np.int64), pa.int64()),
            }
        )
        return pa.concat_tables([t1, t2])

    grid = (
        edges.map_batches(endpoint_rows, batch_format="pyarrow")
        .union(docs.map_batches(lab_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(attach, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_fold, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            _Sum("intra", alias_name="intra_edges"),
            _Sum("dmass", alias_name="degree_sum"),
        )
        .take_all()  # bounded: <= |langs| rows
    )
    # node counts per lang over graph nodes: one more bounded fold
    def node_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = batch.column("doc_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = np.unique(np.concatenate([a, b]))
        return pa.table(
            {
                "key": pa.array(n, pa.int64()),
                "eid": pa.array(np.full(len(n), -2, np.int64), pa.int64()),
                "lang": pa.array([""] * len(n), pa.string()),
                "part": pa.array(n % parts, pa.int64()),
            }
        )

    def attach_nodes(part_tbl: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F811

        key = part_tbl.column("key").to_numpy(zero_copy_only=False)
        eid = part_tbl.column("eid").to_numpy(zero_copy_only=False)
        lang = part_tbl.column("lang").to_pandas().to_numpy(dtype=object)
        is_lab = eid < -1
        # labels ride eid == -1; nodes ride eid == -2
        lab = eid == -1
        lk = key[lab]
        lo = np.argsort(lk, kind="stable")
        lk_s, lv_s = lk[lo], lang[lab][lo]
        nk = np.unique(key[eid == -2])
        pos = np.searchsorted(lk_s, nk)
        g = (
            pd.Series(lv_s[pos]).value_counts().rename_axis("lang")
            .reset_index(name="n")
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "n_nodes": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    nodes_grid = (
        edges.map_batches(node_rows, batch_format="pyarrow")
        .union(docs.map_batches(lab_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(attach_nodes, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(_Sum("n_nodes", alias_name="n_nodes"))
        .take_all()  # bounded: <= |langs| rows
    )
    nmap = {r["lang"]: int(r["n_nodes"]) for r in nodes_grid}
    m = m_edges
    tot = sum(
        4 * m * int(r["intra_edges"]) - int(r["degree_sum"]) ** 2
        for r in grid
    )
    q = ((tot + 4 * m * m) * 1_000_000) // (4 * m * m) - 1_000_000
    df = pd.DataFrame(
        [
            {
                "lang": r["lang"],
                "n_nodes": nmap.get(r["lang"], 0),
                "intra_edges": int(r["intra_edges"]),
                "degree_sum": int(r["degree_sum"]),
                "q_x1e6": q,
            }
            for r in grid
        ]
    ).sort_values("lang", ignore_index=True)
    for c in df.columns[1:]:
        df[c] = df[c].astype("int64")
    return df
