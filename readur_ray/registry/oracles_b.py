"""DuckDB oracle SQL, part B (statements moved
verbatim from __ray_entry__.oracle_sql round 5; wave order
preserved — see registry/__init__.py).
"""

from __future__ import annotations

from .common import (  # shared SQL fragments
    _BAND_VALUES, _SHINGLES_CTE, _SIMHASH_CTE, _WORDS_CTE,
)


def add(sql: dict) -> None:
    sql["cohort_matrix"] = """
        WITH p AS (
          SELECT DISTINCT user_id,
                 (CAST(epoch_us(ts) AS BIGINT) // 86400000000) // 7 AS w
          FROM events
        ),
        c AS (SELECT user_id, min(w) AS w0 FROM p GROUP BY 1)
        SELECT c.w0 AS cohort_week, p.w AS act_week,
               CAST(count(*) AS BIGINT) AS n_users
        FROM p JOIN c USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """

    # best_benchmark_match: per non-benchmark doc, the benchmark doc
    # sharing the most distinct word-3-shingles (ties -> min bench id)
    sql["best_benchmark_match"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        b AS (SELECT doc_id AS bench_id, s FROM sh
              WHERE doc_id % 20 = 0),
        tg AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
        m AS (SELECT tg.doc_id, b.bench_id, count(*) AS ns
              FROM tg JOIN b USING (s) GROUP BY 1, 2)
        SELECT doc_id, bench_id, CAST(ns AS BIGINT) AS n_shared
        FROM (SELECT doc_id, bench_id, ns,
                     row_number() OVER (
                       PARTITION BY doc_id ORDER BY ns DESC, bench_id
                     ) AS rn FROM m)
        WHERE rn = 1 ORDER BY doc_id
    """

    # posting_sizes: raw vs delta+LEB128 posting-list bytes per token
    # with df >= 100; varint length via the exact 7-bit ladder
    sql["posting_sizes"] = """
        WITH p AS (
          SELECT DISTINCT t AS token, doc_id FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
            FROM documents)
        ),
        o AS (SELECT token, doc_id,
                     lag(doc_id) OVER (PARTITION BY token ORDER BY doc_id)
                       AS prev
              FROM p),
        g AS (SELECT token,
                     CASE WHEN prev IS NULL THEN doc_id
                          ELSE doc_id - prev END AS gap
              FROM o),
        v AS (SELECT token,
                     CASE WHEN gap = 0 THEN 1 ELSE
                       1 + CAST(gap >= 128 AS INT)
                         + CAST(gap >= 16384 AS INT)
                         + CAST(gap >= 2097152 AS INT)
                         + CAST(gap >= 268435456 AS INT)
                         + CAST(gap >= 34359738368 AS INT)
                         + CAST(gap >= 4398046511104 AS INT)
                         + CAST(gap >= 562949953421312 AS INT)
                         + CAST(gap >= 72057594037927936 AS INT)
                     END AS nb
              FROM g)
        SELECT token, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(8 * count(*) AS BIGINT) AS raw_bytes,
               CAST(sum(nb) AS BIGINT) AS varint_bytes
        FROM v GROUP BY 1 HAVING count(*) >= 100 ORDER BY 1
    """

    # rendezvous_assign: per doc the worker with the largest
    # md5(doc_id|worker) digest (highest-random-weight hashing)
    sql["rendezvous_assign"] = """
        WITH a AS (
          SELECT doc_id, w,
                 md5(CAST(doc_id AS VARCHAR) || '|' || w) AS h
          FROM documents,
               UNNEST(['w0','w1','w2','w3','w4','w5','w6','w7']) AS t(w)
        )
        SELECT doc_id, w AS worker
        FROM (SELECT doc_id, w,
                     row_number() OVER (
                       PARTITION BY doc_id ORDER BY h DESC, w
                     ) AS rn FROM a)
        WHERE rn = 1 ORDER BY doc_id
    """

    # mutual_knn: pairs present in BOTH directions of the knn graph
    sql["mutual_knn"] = f"""
        WITH g AS ({sql["knn_graph"]})
        SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b,
               CAST(a.d2 AS BIGINT) AS d2
        FROM g a JOIN g b
          ON b.vec_id = a.neighbor_id AND b.neighbor_id = a.vec_id
        WHERE a.vec_id < a.neighbor_id
        ORDER BY 1, 2
    """

    # linkage_scores: integer agreement vector + weighted score per
    # snm_pairs candidate
    sql["linkage_scores"] = f"""
        WITH sp AS ({sql["snm_pairs"]})
        SELECT sp.doc_a, sp.doc_b,
               CAST(da.lang = db.lang AS BIGINT) AS agree_lang,
               CAST(da.source = db.source AS BIGINT) AS agree_src,
               CAST(abs(da.n_chars - db.n_chars) <= 32 AS BIGINT)
                 AS agree_len,
               CAST(8 * CAST(da.lang = db.lang AS INT)
                  + 4 * CAST(da.source = db.source AS INT)
                  + 2 * CAST(abs(da.n_chars - db.n_chars) <= 32 AS INT)
                 AS BIGINT) AS score
        FROM sp JOIN documents da ON da.doc_id = sp.doc_a
                JOIN documents db ON db.doc_id = sp.doc_b
        ORDER BY 1, 2
    """

    # ab_lift: per parity variant, distinct users / converters /
    # purchase totals
    sql["ab_lift"] = """
        WITH u AS (
          SELECT user_id,
                 CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
                 sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS np
          FROM events GROUP BY 1, 2
        )
        SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_converters,
               CAST(sum(np) AS BIGINT) AS n_purchases
        FROM u GROUP BY 1 ORDER BY 1
    """

    # dataset_card: one exact corpus fact row
    sql["dataset_card"] = """
        WITH tok AS (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
          FROM documents
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
               (SELECT CAST(count(DISTINCT source) AS BIGINT)
                FROM documents) AS n_sources,
               (SELECT CAST(count(DISTINCT lang) AS BIGINT)
                FROM documents) AS n_langs,
               (SELECT CAST(sum(length(coalesce(text, ''))) AS BIGINT)
                FROM documents) AS total_chars,
               (SELECT CAST(count(*) AS BIGINT) FROM tok) AS total_tokens,
               (SELECT CAST(count(DISTINCT t) AS BIGINT) FROM tok)
                 AS distinct_tokens,
               (SELECT CAST(count(*) - count(DISTINCT md5(coalesce(text, '')))
                       AS BIGINT) FROM documents) AS dup_texts
    """

    # knn_hubness: top-20 in-degree vectors of the knn graph
    sql["knn_hubness"] = f"""
        WITH g AS ({sql["knn_graph"]})
        SELECT neighbor_id AS vec_id, CAST(count(*) AS BIGINT)
                 AS in_degree,
               CAST(row_number() OVER (
                 ORDER BY count(*) DESC, neighbor_id
               ) AS BIGINT) AS rnk
        FROM g GROUP BY neighbor_id
        ORDER BY in_degree DESC, vec_id LIMIT 20
    """

    # top_pairs_lift: item_cooccurrence survivors with marginals and
    # the exact signed lift numerator
    sql["top_pairs_lift"] = f"""
        WITH co AS ({sql["item_cooccurrence"]}),
        ui AS (
          SELECT DISTINCT user_id,
                 CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
                      AS BIGINT) AS item
          FROM events
        ),
        m AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM ui
              GROUP BY 1),
        t AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
              FROM ui)
        SELECT co.item_a, co.item_b, co.support,
               ma.n AS n_a, mb.n AS n_b, t.nu AS n_users,
               CAST(co.support * t.nu - ma.n * mb.n AS BIGINT) AS dev
        FROM co JOIN m ma ON ma.item = co.item_a
                JOIN m mb ON mb.item = co.item_b, t
        ORDER BY co.support DESC, co.item_a, co.item_b
    """

    # ann_recall_report: per-query exact/IVF intersection size
    sql["ann_recall_report"] = f"""
        WITH e AS ({sql["ann_topk"]}),
        a AS ({sql["ann_topk_ivf_kmeans"]})
        SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM e JOIN a ON a.query_id = e.query_id
                     AND a.neighbor_id = e.neighbor_id
        GROUP BY 1 ORDER BY 1
    """

    # pq_distortion: per (subspace, code) count + exact distortion
    # against the SAME trained codebooks as pq_topk (prefix mirrors
    # sql["pq_topk"] through a2/d2c)
    sql["pq_distortion"] = """
        WITH qv AS (
          SELECT vec_id, dim, dim // 16 AS s,
                 CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 1000000 + 0.5)
                      AS BIGINT) AS q
          FROM embeddings, UNNEST(range(0, 64)) t(dim)
        ),
        seed AS (
          SELECT vec_id - 16 AS c, s, dim, q FROM qv
          WHERE vec_id BETWEEN 16 AND 23
        ),
        d0 AS (
          SELECT v.vec_id, v.s, sd.c, sum((v.q - sd.q) * (v.q - sd.q)) AS d2
          FROM qv v JOIN seed sd ON sd.dim = v.dim GROUP BY 1, 2, 3
        ),
        a0 AS (
          SELECT vec_id, s, c FROM (
            SELECT vec_id, s, c,
                   row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, c ASC) AS rn
            FROM d0) WHERE rn = 1
        ),
        cent1 AS (
          SELECT a0.c, qv.s, qv.dim, CAST(sum(qv.q) // count(*) AS BIGINT) AS q
          FROM qv JOIN a0 ON a0.vec_id = qv.vec_id AND a0.s = qv.s
          GROUP BY 1, 2, 3
        ),
        cent1f AS (  -- empty codes keep the previous centroid
          SELECT sd.c, sd.s, sd.dim, coalesce(c1.q, sd.q) AS q
          FROM seed sd LEFT JOIN cent1 c1 ON c1.c = sd.c AND c1.dim = sd.dim
        ),
        d1 AS (
          SELECT v.vec_id, v.s, cn.c, sum((v.q - cn.q) * (v.q - cn.q)) AS d2
          FROM qv v JOIN cent1f cn ON cn.dim = v.dim GROUP BY 1, 2, 3
        ),
        a1 AS (
          SELECT vec_id, s, c FROM (
            SELECT vec_id, s, c,
                   row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, c ASC) AS rn
            FROM d1) WHERE rn = 1
        ),
        cent2 AS (
          SELECT a1.c, qv.s, qv.dim, CAST(sum(qv.q) // count(*) AS BIGINT) AS q
          FROM qv JOIN a1 ON a1.vec_id = qv.vec_id AND a1.s = qv.s
          GROUP BY 1, 2, 3
        ),
        cent2f AS (
          SELECT f.c, f.s, f.dim, coalesce(c2.q, f.q) AS q
          FROM cent1f f LEFT JOIN cent2 c2 ON c2.c = f.c AND c2.dim = f.dim
        ),
        d2c AS (
          SELECT v.vec_id, v.s, cn.c, sum((v.q - cn.q) * (v.q - cn.q)) AS d2
          FROM qv v JOIN cent2f cn ON cn.dim = v.dim GROUP BY 1, 2, 3
        ),
        a2 AS (  -- final per-(vector, subspace) code
          SELECT vec_id, s, c FROM (
            SELECT vec_id, s, c,
                   row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, c ASC) AS rn
            FROM d2c) WHERE rn = 1
        ),
        m AS (
          SELECT a2.s, a2.c, count(*) AS n, sum(d.d2) AS dist
          FROM a2 JOIN d2c d
            ON d.vec_id = a2.vec_id AND d.s = a2.s AND d.c = a2.c
          GROUP BY 1, 2
        )
        SELECT s AS subspace, c AS code, CAST(n AS BIGINT) AS n_vectors,
               CAST(dist AS BIGINT) AS distortion
        FROM m ORDER BY 1, 2
    """

    # conversion_latency: first signup → first purchase strictly
    # after in (ts, event_id) order; exact percentiles at rank
    # ceil(q*n/100) over whole-second latencies.
    sql["conversion_latency"] = """
        WITH s AS MATERIALIZED (
          SELECT user_id, sts, sid FROM (
            SELECT user_id, ts AS sts, event_id AS sid,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events WHERE event_type = 'signup') WHERE rn = 1
        ),
        lat AS MATERIALIZED (
          SELECT user_id, lat_s FROM (
            SELECT e.user_id,
                   (epoch_us(e.ts) - epoch_us(s.sts)) // 1000000 AS lat_s,
                   row_number() OVER (PARTITION BY e.user_id
                                      ORDER BY e.ts, e.event_id) AS rn
            FROM events e JOIN s ON s.user_id = e.user_id
            WHERE e.event_type = 'purchase'
              AND (e.ts > s.sts OR (e.ts = s.sts AND e.event_id > s.sid))
          ) WHERE rn = 1
        ),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lat),
        g AS (SELECT lat_s, count(*) AS cnt FROM lat GROUP BY 1),
        gc AS (SELECT lat_s,
                      sum(cnt) OVER (ORDER BY lat_s) AS cum FROM g),
        rk AS (SELECT qq.q, nn.n, (qq.q * nn.n + 99) // 100 AS rank
               FROM (SELECT unnest([50, 90, 99]) AS q) qq, nn)
        SELECT CAST(rk.q AS BIGINT) AS q, rk.n AS n_converted,
               CAST(min(gc.lat_s) AS BIGINT) AS latency_s
        FROM rk JOIN gc ON gc.cum >= rk.rank
        GROUP BY rk.q, rk.n
    """

    # embedding_drift: per-dim fixed-point means of vec_id-parity
    # halves; offset shift keeps floor-division numerators >= 0.
    sql["embedding_drift"] = """
        WITH q AS MATERIALIZED (
          SELECT vec_id % 2 AS half, dim,
                 CAST(floor(CAST(embedding[dim + 1] AS DOUBLE)
                      * 1000000 + 0.5) AS BIGINT) AS v
          FROM embeddings, UNNEST(range(0, 64)) t(dim)
        ),
        g AS (
          SELECT half, dim, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS s
          FROM q GROUP BY 1, 2
        ),
        m AS (
          SELECT dim,
                 max(CASE WHEN half = 0 THEN n END) AS n_even,
                 max(CASE WHEN half = 1 THEN n END) AS n_odd,
                 max(CASE WHEN half = 0 THEN s END) AS sum_even,
                 max(CASE WHEN half = 1 THEN s END) AS sum_odd
          FROM g GROUP BY 1
        ),
        mm AS (
          SELECT dim, n_even, n_odd, sum_even, sum_odd,
                 (sum_even + n_even * 1000000) * 1000 // n_even
                   - 1000000000 AS me,
                 (sum_odd + n_odd * 1000000) * 1000 // n_odd
                   - 1000000000 AS mo
          FROM m
        )
        SELECT dim, n_even, n_odd, sum_even, sum_odd,
               CAST(me AS BIGINT) AS mean_even_milli,
               CAST(mo AS BIGINT) AS mean_odd_milli,
               CAST(abs(me - mo) AS BIGINT) AS drift_milli
        FROM mm
    """

    # source_shape_overlap: histogram intersection over log2 bands;
    # pairs with no shared band still appear with overlap 0.
    sql["source_shape_overlap"] = """
        WITH b AS (
          SELECT source,
                 CAST(len(bin(CAST(n_chars AS UBIGINT))) AS BIGINT) AS band,
                 count(*) AS c
          FROM documents GROUP BY 1, 2
        ),
        t AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM b GROUP BY 1),
        p AS MATERIALIZED (
          SELECT b.source, b.band,
                 CAST(b.c * 10000 // t.tot AS BIGINT) AS bp
          FROM b JOIN t USING (source)
        ),
        pairs AS (SELECT a.source AS source_a, b2.source AS source_b
                  FROM t a JOIN t b2 ON a.source < b2.source),
        ov AS (
          SELECT p1.source AS source_a, p2.source AS source_b,
                 sum(least(p1.bp, p2.bp)) AS o
          FROM p p1 JOIN p p2
            ON p1.band = p2.band AND p1.source < p2.source
          GROUP BY 1, 2
        )
        SELECT pairs.source_a, pairs.source_b,
               CAST(coalesce(ov.o, 0) AS BIGINT) AS overlap_bp
        FROM pairs LEFT JOIN ov USING (source_a, source_b)
    """

    # lang_signature_cosine: codepoint-polynomial trigram buckets;
    # cos^2 in 1e-8 units, dot^2 on HUGEINT.
    sql["lang_signature_cosine"] = """
        WITH tg AS MATERIALIZED (
          SELECT lang,
                 (unicode(substr(lt, i, 1)) * 961
                  + unicode(substr(lt, i + 1, 1)) * 31
                  + unicode(substr(lt, i + 2, 1))) % 256 AS bucket
          FROM (SELECT lang, lower(text) AS lt FROM documents),
               UNNEST(range(1, length(lt) - 1)) AS t(i)
          WHERE length(lt) >= 3
        ),
        g AS MATERIALIZED (
          SELECT lang, bucket, CAST(count(*) AS BIGINT) AS c
          FROM tg GROUP BY 1, 2
        ),
        nrm AS (SELECT lang, CAST(sum(c * c) AS BIGINT) AS n2
                FROM g GROUP BY 1),
        dots AS (
          SELECT a.lang AS lang_a, b.lang AS lang_b,
                 CAST(sum(a.c * b.c) AS BIGINT) AS dot
          FROM g a JOIN g b ON a.bucket = b.bucket AND a.lang < b.lang
          GROUP BY 1, 2
        ),
        pairs AS (SELECT a.lang AS lang_a, b.lang AS lang_b
                  FROM nrm a JOIN nrm b ON a.lang < b.lang)
        SELECT p.lang_a, p.lang_b,
               CAST(coalesce(d.dot, 0) AS BIGINT) AS dot,
               CAST(CAST(coalesce(d.dot, 0) AS HUGEINT)
                    * coalesce(d.dot, 0) * 100000000
                    // (CAST(na.n2 AS HUGEINT) * nb.n2) AS BIGINT)
                 AS cos2_x1e8
        FROM pairs p
        LEFT JOIN dots d ON d.lang_a = p.lang_a AND d.lang_b = p.lang_b
        JOIN nrm na ON na.lang = p.lang_a
        JOIN nrm nb ON nb.lang = p.lang_b
    """

    # dict_encoding_audit: raw vs dictionary bytes per candidate
    # column; index width by cardinality; shifted floor division.
    sql["dict_encoding_audit"] = """
        WITH u AS MATERIALIZED (
          SELECT 'documents' AS table_name, 'source' AS column_name,
                 source AS v FROM documents
          UNION ALL
          SELECT 'documents', 'lang', lang FROM documents
          UNION ALL
          SELECT 'events', 'event_type', event_type FROM events
        ),
        agg AS (
          SELECT table_name, column_name,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
                 CAST(sum(strlen(v)) AS BIGINT) AS raw_bytes
          FROM u GROUP BY 1, 2
        ),
        de AS (
          SELECT table_name, column_name,
                 CAST(sum(strlen(v)) AS BIGINT) AS dict_entries
          FROM (SELECT DISTINCT table_name, column_name, v FROM u)
          GROUP BY 1, 2
        ),
        j AS (
          SELECT agg.*, de.dict_entries,
                 CASE WHEN agg.n_distinct <= 256 THEN 1
                      WHEN agg.n_distinct <= 65536 THEN 2
                      ELSE 4 END AS idx
          FROM agg JOIN de USING (table_name, column_name)
        )
        SELECT table_name, column_name, n_rows, n_distinct, raw_bytes,
               CAST(dict_entries + n_rows * idx AS BIGINT) AS dict_bytes,
               CAST((raw_bytes - (dict_entries + n_rows * idx)
                     + 8 * raw_bytes) * 10000 // raw_bytes - 80000
                    AS BIGINT) AS savings_bp
        FROM j
    """

    # chi2_independence: full marginal cross (zero cells included);
    # (O·N − R·C)² on HUGEINT, total = sum of floored cell terms.
    sql["chi2_independence"] = """
        WITH g AS MATERIALIZED (
          SELECT source, lang, CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY 1, 2
        ),
        r AS (SELECT source, CAST(sum(c) AS BIGINT) AS rc FROM g GROUP BY 1),
        l AS (SELECT lang, CAST(sum(c) AS BIGINT) AS lc FROM g GROUP BY 1),
        t AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM g),
        cells AS (
          SELECT r.source, l.lang, r.rc, l.lc, t.nn,
                 CAST(coalesce(g.c, 0) AS BIGINT) AS obs
          FROM r CROSS JOIN l CROSS JOIN t
          LEFT JOIN g ON g.source = r.source AND g.lang = l.lang
        ),
        scored AS (
          SELECT source, lang, obs,
                 CAST(rc * lc * 1000000 // nn AS BIGINT) AS exp_x1e6,
                 CAST((CAST(obs AS HUGEINT) * nn - CAST(rc AS HUGEINT) * lc)
                      * (CAST(obs AS HUGEINT) * nn - CAST(rc AS HUGEINT) * lc)
                      * 1000000
                      // (CAST(nn AS HUGEINT) * rc * lc) AS BIGINT)
                   AS contrib_x1e6
          FROM cells
        )
        SELECT source, lang, obs, exp_x1e6, contrib_x1e6,
               CAST(sum(contrib_x1e6) OVER () AS BIGINT) AS chi2_x1e6
        FROM scored
    """

    # calibration_bins: fixed propensity p=s/(s+3) in 1e-6; gap and
    # ECE on the common n·1e6 denominator, abs before the floor.
    sql["calibration_bins"] = """
        WITH ud AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                 CAST(count(*) AS BIGINT) AS s,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS y
          FROM events GROUP BY 1, 2
        ),
        g AS MATERIALIZED (
          SELECT s, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS pos
          FROM ud GROUP BY 1
        ),
        ph AS (
          SELECT s, n, pos, s * 1000000 // (s + 3) AS p_hat FROM g
        ),
        b AS (
          SELECT p_hat * 10 // 1000000 AS bin,
                 CAST(sum(n) AS BIGINT) AS n,
                 CAST(sum(pos) AS BIGINT) AS pos,
                 CAST(sum(p_hat * n) AS BIGINT) AS conf_sum
          FROM ph GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
                       CAST(sum(abs(pos * 1000000 - conf_sum)) AS BIGINT)
                         AS num
                FROM b)
        SELECT CAST(bin AS BIGINT) AS bin, b.n, b.pos, b.conf_sum,
               CAST(abs(b.pos * 1000000 - b.conf_sum) // b.n AS BIGINT)
                 AS gap_x1e6,
               CAST(tot.num // tot.nn AS BIGINT) AS ece_x1e6
        FROM b, tot
    """

    # rle_encoding_audit: runs in physical id order via lag(); run
    # cost = strlen + 4 length bytes; shifted floor savings.
    sql["rle_encoding_audit"] = """
        WITH u AS MATERIALIZED (
          SELECT 'documents' AS table_name, 'source' AS column_name,
                 doc_id AS id, source AS v FROM documents
          UNION ALL
          SELECT 'documents', 'lang', doc_id, lang FROM documents
          UNION ALL
          SELECT 'events', 'event_type', event_id, event_type FROM events
        ),
        r AS (
          SELECT table_name, column_name, strlen(v) AS sl,
                 CASE WHEN lag(v) OVER (
                        PARTITION BY table_name, column_name ORDER BY id
                      ) IS DISTINCT FROM v THEN 1 ELSE 0 END AS st
          FROM u
        ),
        agg AS (
          SELECT table_name, column_name,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(st) AS BIGINT) AS n_runs,
                 CAST(sum(sl) AS BIGINT) AS raw_bytes,
                 CAST(sum(CASE WHEN st = 1 THEN sl + 4 ELSE 0 END)
                      AS BIGINT) AS rle_bytes
          FROM r GROUP BY 1, 2
        )
        SELECT table_name, column_name, n_rows, n_runs, raw_bytes,
               rle_bytes,
               CAST((raw_bytes - rle_bytes + 8 * raw_bytes) * 10000
                    // raw_bytes - 80000 AS BIGINT) AS savings_bp
        FROM agg
    """

    # zonemap_audit: doc_id zones of 1024; skip iff zone max <= thr;
    # fixed power-of-two threshold grid.
    sql["zonemap_audit"] = """
        WITH b AS MATERIALIZED (
          SELECT doc_id // 1024 AS z, max(n_chars) AS mx,
                 CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY 1
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS nz,
                       CAST(sum(c) AS BIGINT) AS nr FROM b),
        t(thr) AS (VALUES (32), (64), (128), (256), (512), (1024),
                          (2048), (4096), (8192), (16384))
        SELECT CAST(t.thr AS BIGINT) AS thr, tot.nz AS n_zones,
               CAST(coalesce(sum(CASE WHEN b.mx <= t.thr THEN 1 END), 0)
                    AS BIGINT) AS skippable_zones,
               CAST(coalesce(sum(CASE WHEN b.mx <= t.thr THEN b.c END), 0)
                    AS BIGINT) AS rows_skipped,
               CAST(coalesce(sum(CASE WHEN b.mx <= t.thr THEN b.c END), 0)
                    * 10000 // tot.nr AS BIGINT) AS prune_bp
        FROM t CROSS JOIN b CROSS JOIN tot
        GROUP BY t.thr, tot.nz, tot.nr
    """

    # gini_split_stump: exact Gini gain per threshold; all
    # intermediates in HUGEINT, numerator provably >= 0.
    sql["gini_split_stump"] = """
        WITH g AS (
          SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c,
                 CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                      AS BIGINT) AS p
          FROM documents GROUP BY 1
        ),
        t AS (SELECT CAST(sum(c) AS HUGEINT) AS n,
                     CAST(sum(p) AS HUGEINT) AS p FROM g),
        cum AS (
          SELECT v, CAST(sum(c) OVER (ORDER BY v) AS HUGEINT) AS nl,
                 CAST(sum(p) OVER (ORDER BY v) AS HUGEINT) AS pl
          FROM g
        )
        SELECT cum.v AS thr, CAST(cum.nl AS BIGINT) AS n_left,
               CAST(cum.pl AS BIGINT) AS pos_left,
               CAST(t.n - cum.nl AS BIGINT) AS n_right,
               CAST(t.p - cum.pl AS BIGINT) AS pos_right,
               CAST((2 * t.p * (t.n - t.p) * cum.nl * (t.n - cum.nl)
                     - 2 * t.n * (cum.pl * (cum.nl - cum.pl)
                                    * (t.n - cum.nl)
                                  + (t.p - cum.pl)
                                    * ((t.n - cum.nl) - (t.p - cum.pl))
                                    * cum.nl)
                    ) * 1000000000
                    // (t.n * t.n * cum.nl * (t.n - cum.nl)) AS BIGINT)
                 AS gain_x1e9
        FROM cum, t WHERE cum.nl < t.n
    """

    # embedding_norm_profile: exact quantized norm^2 per vector,
    # log2-banded per label; a zero norm lands in band 0.
    sql["embedding_norm_profile"] = """
        WITH q AS (
          SELECT vec_id, CAST(label AS BIGINT) AS label,
                 CAST(floor(CAST(embedding[dim + 1] AS DOUBLE)
                      * 1000000 + 0.5) AS BIGINT) AS qv
          FROM embeddings, UNNEST(range(0, 64)) t(dim)
        ),
        n2 AS (
          SELECT vec_id, max(label) AS label,
                 CAST(sum(qv * qv) AS BIGINT) AS m
          FROM q GROUP BY vec_id
        ),
        b AS (
          SELECT label,
                 CAST(CASE WHEN m = 0 THEN 0
                      ELSE len(bin(CAST(m AS UBIGINT))) END AS BIGINT)
                   AS band,
                 m
          FROM n2
        )
        SELECT label, band, CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(sum(m) AS BIGINT) AS norm2_sum
        FROM b GROUP BY 1, 2
    """

    # quantile_normalize: within-source rank maps to the global
    # value at the same relative position; (n_chars, doc_id) ties.
    sql["quantile_normalize"] = """
        WITH o AS (
          SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) - 1 AS r,
                 count(*) OVER (PARTITION BY source) AS ns
          FROM documents
        ),
        gidx AS MATERIALIZED (
          SELECT n_chars AS v,
                 row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS g
          FROM documents
        ),
        nn AS (SELECT count(*) AS n FROM documents)
        SELECT o.doc_id, o.source, o.n_chars,
               CAST(o.r AS BIGINT) AS src_rank,
               CAST(gi.v AS BIGINT) AS normalized_chars
        FROM o CROSS JOIN nn
        JOIN gidx gi ON gi.g = CASE WHEN o.ns > 1
            THEN o.r * (nn.n - 1) // (o.ns - 1)
            ELSE (nn.n - 1) // 2 END
    """

    # hhi_concentration: sum of squared lang shares per source.
    sql["hhi_concentration"] = """
        WITH g AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
                   FROM documents GROUP BY 1, 2),
        t AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot,
                     CAST(count(*) AS BIGINT) AS nl
              FROM g GROUP BY 1)
        SELECT t.source, t.tot AS n_docs, t.nl AS n_langs,
               CAST(sum(g.c * g.c) * 10000 // (t.tot * t.tot) AS BIGINT)
                 AS hhi_bp
        FROM g JOIN t USING (source) GROUP BY 1, 2, 3
    """

    # blocking_quality: SNM candidates scored against exact-Jaccard
    # truth pairs on the canonical (min, max) key; zero truth pairs
    # score vacuously complete.
    sql["blocking_quality"] = f"""
        WITH tr AS MATERIALIZED (
          SELECT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
          FROM ({sql["dedup_ngram_jaccard"]})
        ),
        ca AS MATERIALIZED (
          SELECT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
          FROM ({sql["snm_pairs"]})
        ),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        cnt AS (
          SELECT (SELECT count(*) FROM tr) AS nt,
                 (SELECT count(*) FROM ca) AS nc,
                 (SELECT count(*) FROM tr JOIN ca
                    ON tr.a = ca.a AND tr.b = ca.b) AS cap
        )
        SELECT nn.n AS n_docs,
               CAST(cnt.nt AS BIGINT) AS n_true_pairs,
               CAST(cnt.nc AS BIGINT) AS n_cand_pairs,
               CAST(cnt.cap AS BIGINT) AS n_captured,
               CAST(CASE WHEN cnt.nt = 0 THEN 10000
                    ELSE cnt.cap * 10000 // cnt.nt END AS BIGINT) AS pc_bp,
               CAST((nn.n * (nn.n - 1) // 2 - cnt.nc) * 10000
                    // (nn.n * (nn.n - 1) // 2) AS BIGINT) AS rr_bp
        FROM nn, cnt
    """

    # seasonal_naive_backtest: dense window [mn+7, mx] per type;
    # absent days are zero on either side.
    sql["seasonal_naive_backtest"] = """
        WITH g AS MATERIALIZED (
          SELECT event_type, epoch_us(ts) // 86400000000 AS d,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        r AS (SELECT event_type, min(d) AS mn, max(d) AS mx
              FROM g GROUP BY 1),
        days AS (
          SELECT r.event_type, t.d
          FROM r, UNNEST(range(r.mn + 7, r.mx + 1)) AS t(d)
        ),
        j AS (
          SELECT days.event_type, days.d,
                 coalesce(a.c, 0) AS actual, coalesce(f.c, 0) AS fcst
          FROM days
          LEFT JOIN g a ON a.event_type = days.event_type
                       AND a.d = days.d
          LEFT JOIN g f ON f.event_type = days.event_type
                       AND f.d = days.d - 7
        )
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(abs(actual - fcst)) AS BIGINT)
                 AS total_abs_err_cents,
               CAST(sum(abs(actual - fcst)) // count(*) AS BIGINT)
                 AS mae_cents
        FROM j GROUP BY 1
    """

    # label_propagation: 3 synchronized rounds over the mutual-kNN
    # edges; vote = most frequent neighbor label, ties -> smallest.
    sql["label_propagation"] = f"""
        WITH mk AS MATERIALIZED (
          SELECT vec_a, vec_b FROM ({sql["mutual_knn"]})
        ),
        ed AS MATERIALIZED (
          SELECT vec_a AS v, vec_b AS u FROM mk
          UNION ALL
          SELECT vec_b AS v, vec_a AS u FROM mk
        ),
        l0 AS (SELECT DISTINCT v, v AS lab FROM ed),
        r1 AS MATERIALIZED (
          SELECT v, lab FROM (
            SELECT ed.v, l.lab,
                   row_number() OVER (PARTITION BY ed.v
                     ORDER BY count(*) DESC, l.lab ASC) AS rn
            FROM ed JOIN l0 l ON l.v = ed.u GROUP BY ed.v, l.lab
          ) WHERE rn = 1
        ),
        r2 AS MATERIALIZED (
          SELECT v, lab FROM (
            SELECT ed.v, l.lab,
                   row_number() OVER (PARTITION BY ed.v
                     ORDER BY count(*) DESC, l.lab ASC) AS rn
            FROM ed JOIN r1 l ON l.v = ed.u GROUP BY ed.v, l.lab
          ) WHERE rn = 1
        ),
        r3 AS (
          SELECT v, lab FROM (
            SELECT ed.v, l.lab,
                   row_number() OVER (PARTITION BY ed.v
                     ORDER BY count(*) DESC, l.lab ASC) AS rn
            FROM ed JOIN r2 l ON l.v = ed.u GROUP BY ed.v, l.lab
          ) WHERE rn = 1
        )
        SELECT v AS vec_id, CAST(lab AS BIGINT) AS community FROM r3
    """

    # community_modularity: exact Q over the mutual-kNN graph with
    # the +4m^2 shift so every floor-division numerator is >= 0.
    sql["community_modularity"] = f"""
        WITH lp AS MATERIALIZED (
          SELECT vec_id, community FROM ({sql["label_propagation"]})
        ),
        mk AS MATERIALIZED (
          SELECT vec_a, vec_b FROM ({sql["mutual_knn"]})
        ),
        mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM mk),
        lab AS (
          SELECT la.community AS ca, lb.community AS cb
          FROM mk JOIN lp la ON la.vec_id = mk.vec_a
                  JOIN lp lb ON lb.vec_id = mk.vec_b
        ),
        intra AS (SELECT ca AS community, CAST(count(*) AS BIGINT) AS e
                  FROM lab WHERE ca = cb GROUP BY 1),
        deg AS (
          SELECT v, count(*) AS dg FROM (
            SELECT vec_a AS v FROM mk UNION ALL SELECT vec_b FROM mk)
          GROUP BY 1
        ),
        dsum AS (
          SELECT lp.community, CAST(sum(deg.dg) AS BIGINT) AS d,
                 CAST(count(*) AS BIGINT) AS n_nodes
          FROM lp JOIN deg ON deg.v = lp.vec_id GROUP BY 1
        ),
        per AS MATERIALIZED (
          SELECT ds.community, ds.n_nodes,
                 CAST(coalesce(i.e, 0) AS BIGINT) AS intra_edges,
                 ds.d AS degree_sum
          FROM dsum ds LEFT JOIN intra i USING (community)
        ),
        q AS (
          SELECT CAST((sum(4 * mm.m * intra_edges
                           - degree_sum * degree_sum)
                       + 4 * mm.m * mm.m) * 1000000
                      // (4 * mm.m * mm.m) - 1000000 AS BIGINT) AS q_x1e6
          FROM per, mm GROUP BY mm.m
        )
        SELECT per.community, per.n_nodes, per.intra_edges,
               per.degree_sum, q.q_x1e6
        FROM per, q
    """


    # roc_points: user-day grain; thresholds are the distinct score
    # values; AUC = Mann-Whitney U with ties at half weight.
    sql["roc_points"] = """
        WITH ud AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                 CAST(count(*) AS BIGINT) AS s,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS y
          FROM events GROUP BY 1, 2
        ),
        g AS MATERIALIZED (
          SELECT s, CAST(sum(y) AS BIGINT) AS pos,
                 CAST(sum(1 - y) AS BIGINT) AS neg
          FROM ud GROUP BY 1
        ),
        tots AS (SELECT CAST(sum(pos) AS BIGINT) AS p,
                        CAST(sum(neg) AS BIGINT) AS nn FROM g),
        cum AS (
          SELECT s, pos, neg,
                 sum(pos) OVER (ORDER BY s DESC) AS tp,
                 sum(fp_src) OVER (ORDER BY s DESC) AS fp,
                 sum(neg) OVER (ORDER BY s ASC) - neg AS negless
          FROM (SELECT s, pos, neg, neg AS fp_src FROM g)
        ),
        u2 AS (SELECT CAST(sum(pos * (2 * negless + neg)) AS BIGINT) AS u2
               FROM cum)
        SELECT cum.s AS thr, CAST(cum.tp AS BIGINT) AS tp,
               CAST(cum.fp AS BIGINT) AS fp,
               CAST(tots.p - cum.tp AS BIGINT) AS fn,
               CAST(tots.nn - cum.fp AS BIGINT) AS tn,
               CAST(cum.tp * 10000 // tots.p AS BIGINT) AS tpr_bp,
               CAST(cum.fp * 10000 // tots.nn AS BIGINT) AS fpr_bp,
               CAST(u2.u2 * 1000000 // (2 * tots.p * tots.nn) AS BIGINT)
                 AS auc_x1e6
        FROM cum, tots, u2
    """

    # ngram_novelty: distinct 8-grams per doc; owner = min doc_id
    # corpus-wide; docs with < 8 words carry no gram and are excluded.
    sql["ngram_novelty"] = f"""
        WITH {_WORDS_CTE},
        g8 AS MATERIALIZED (
          SELECT DISTINCT doc_id,
                 CAST(CAST('0x' || substr(md5(
                        ws[i]   || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                        ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' ||
                        ws[i+6] || ' ' || ws[i+7]), 1, 15) AS UBIGINT)
                      AS BIGINT) AS gh
          FROM w, UNNEST(range(1, len(ws) - 6)) AS t(i)
          WHERE len(ws) >= 8
        ),
        own AS (SELECT gh, min(doc_id) AS owner FROM g8 GROUP BY gh),
        tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS total
                FROM g8 GROUP BY doc_id),
        nov AS (SELECT owner AS doc_id, CAST(count(*) AS BIGINT) AS novel
                FROM own GROUP BY owner)
        SELECT tot.doc_id, tot.total AS grams_distinct,
               CAST(coalesce(nov.novel, 0) AS BIGINT) AS grams_novel,
               CAST(coalesce(nov.novel, 0) * 10000 // tot.total AS BIGINT)
                 AS novelty_bp
        FROM tot LEFT JOIN nov USING (doc_id)
    """

    # shard_balance_plan: LPT greedy, heaviest item to the currently
    # least-loaded of 8 shards (tie -> lowest index), unrolled as a
    # recursive CTE carrying the 8 loads as a list.
    sql["shard_balance_plan"] = """
        WITH RECURSIVE items AS MATERIALIZED (
          SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS w,
                 CAST(row_number() OVER (
                   ORDER BY sum(n_chars) DESC, source, lang) AS BIGINT) AS rn
          FROM documents GROUP BY 1, 2
        ),
        assign AS (
          SELECT CAST(0 AS BIGINT) AS rn, CAST(NULL AS VARCHAR) AS source,
                 CAST(NULL AS VARCHAR) AS lang, CAST(0 AS BIGINT) AS w,
                 CAST(-1 AS BIGINT) AS worker,
                 CAST(0 AS BIGINT) AS load_after,
                 [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0, 0] AS loads
          UNION ALL
          SELECT r.rn, r.source, r.lang, r.w, r.k,
                 r.loads[r.k + 1] + r.w,
                 list_transform(range(8), j -> CASE WHEN j = r.k
                     THEN r.loads[j + 1] + r.w ELSE r.loads[j + 1] END)
          FROM (
            SELECT a.rn + 1 AS rn, i.source, i.lang, i.w, a.loads,
                   CAST(list_position(a.loads,
                        list_aggregate(a.loads, 'min')) - 1 AS BIGINT) AS k
            FROM assign a JOIN items i ON i.rn = a.rn + 1
          ) r
        )
        SELECT rn AS rank, source, lang, w AS item_chars, worker, load_after
        FROM assign WHERE rn >= 1
    """

    # kmv_distinct_eval: bottom-64 of 48-bit md5 hashes; types with
    # fewer than k distinct users fall back to the exact count.
    sql["kmv_distinct_eval"] = """
        WITH h AS MATERIALIZED (
          SELECT DISTINCT event_type,
                 CAST(CAST('0x' || substr(md5('kmv:'
                        || CAST(user_id AS VARCHAR)), 1, 12)
                      AS UBIGINT) AS BIGINT) AS hv
          FROM events
        ),
        r AS (
          SELECT event_type, hv,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY hv) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS nd
          FROM h
        ),
        k AS (
          SELECT event_type,
                 CAST(max(nd) AS BIGINT) AS n_exact,
                 CAST(least(max(nd), 64) AS BIGINT) AS k_used,
                 CAST(max(CASE WHEN rn = least(nd, 64) THEN hv END)
                      AS BIGINT) AS hk
          FROM r GROUP BY 1
        )
        SELECT event_type, n_exact, k_used,
               CAST(CASE WHEN n_exact < 64 THEN n_exact
                    ELSE (k_used - 1) * 281474976710656 // hk END
                    AS BIGINT) AS est,
               CAST(CASE WHEN n_exact < 64 THEN 0
                    ELSE (k_used - 1) * 281474976710656 // hk - n_exact
                    END AS BIGINT) AS err
        FROM k
    """

    # poisson_bootstrap_ci: replica weight = zero-nibble count of
    # the first 16 md5 hex chars ~ Binomial(16, 1/16).
    sql["poisson_bootstrap_ci"] = """
        WITH p AS MATERIALIZED (
          SELECT event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'
        ),
        w AS (
          SELECT b.b AS replica, cents,
                 CAST(16 - length(replace(substr(md5('pb:'
                        || CAST(event_id AS VARCHAR) || ':'
                        || CAST(b.b AS VARCHAR)), 1, 16), '0', ''))
                      AS BIGINT) AS w
          FROM p CROSS JOIN (SELECT unnest(range(0, 16)) AS b) b
        ),
        g AS (
          SELECT replica, CAST(sum(w) AS BIGINT) AS n_eff,
                 CAST(sum(w * cents) AS BIGINT) AS sum_cents
          FROM w GROUP BY 1
        )
        SELECT replica, n_eff, sum_cents,
               CAST(sum_cents // n_eff AS BIGINT) AS mean_cents
        FROM g
    """

    # negative_samples: md5-probed cross-source negatives, first
    # NEG_K by probe order; candidate ids join documents to fetch
    # the negative's source.
    sql["negative_samples"] = """
        WITH nn AS (SELECT count(*) AS n FROM documents),
        cand AS MATERIALIZED (
          SELECT d.doc_id AS anchor, d.source AS anchor_source, p.probe,
                 CAST(CAST('0x' || substr(md5('neg:'
                        || CAST(d.doc_id AS VARCHAR) || ':'
                        || CAST(p.probe AS VARCHAR)), 1, 15)
                      AS UBIGINT) % (SELECT n FROM nn) AS BIGINT) AS cand
          FROM documents d
          CROSS JOIN (SELECT unnest(range(0, 8)) AS probe) p
        ),
        j AS (
          SELECT c.anchor, c.probe, c.cand, c.anchor_source,
                 d2.source AS neg_source
          FROM cand c JOIN documents d2 ON d2.doc_id = c.cand
          WHERE d2.source <> c.anchor_source
        ),
        r AS (
          SELECT anchor, probe, cand, anchor_source, neg_source,
                 row_number() OVER (PARTITION BY anchor
                                    ORDER BY probe) - 1 AS neg_rank
          FROM j
        )
        SELECT anchor AS doc_id, CAST(neg_rank AS BIGINT) AS neg_rank,
               cand AS neg_doc_id, anchor_source, neg_source
        FROM r WHERE neg_rank < 4
    """

    # quantile_sketch_error: lower-edge bucket estimate vs exact
    # percentile_disc at rank ceil(q*n/100), all-integer cents.
    sql["quantile_sketch_error"] = """
        WITH c AS MATERIALIZED (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events
        ),
        s AS (
          SELECT event_type, min(cents) AS mn, max(cents) AS mx,
                 CAST(count(*) AS BIGINT) AS n
          FROM c GROUP BY event_type
        ),
        w AS MATERIALIZED (
          SELECT event_type, mn, n, (mx - mn + 128) // 128 AS width
          FROM s
        ),
        rk AS MATERIALIZED (
          SELECT w.event_type, qq.q, w.mn, w.width, w.n,
                 (qq.q * w.n + 99) // 100 AS rank
          FROM w CROSS JOIN (SELECT unnest([50, 90, 99]) AS q) qq
        ),
        b AS (
          SELECT c.event_type, (c.cents - w.mn) // w.width AS bucket,
                 count(*) AS bn
          FROM c JOIN w USING (event_type) GROUP BY 1, 2
        ),
        bc AS MATERIALIZED (
          SELECT event_type, bucket,
                 sum(bn) OVER (PARTITION BY event_type
                               ORDER BY bucket) AS cum
          FROM b
        ),
        est AS (
          SELECT rk.event_type, rk.q, rk.n,
                 rk.mn + min(bc.bucket) * rk.width AS est_cents
          FROM rk JOIN bc ON bc.event_type = rk.event_type
                         AND bc.cum >= rk.rank
          GROUP BY rk.event_type, rk.q, rk.n, rk.mn, rk.width
        ),
        g AS (
          SELECT event_type, cents, count(*) AS cnt FROM c GROUP BY 1, 2
        ),
        gc AS MATERIALIZED (
          SELECT event_type, cents,
                 sum(cnt) OVER (PARTITION BY event_type
                                ORDER BY cents) AS cum
          FROM g
        ),
        ex AS (
          SELECT rk.event_type, rk.q, min(gc.cents) AS exact_cents
          FROM rk JOIN gc ON gc.event_type = rk.event_type
                         AND gc.cum >= rk.rank
          GROUP BY rk.event_type, rk.q
        )
        SELECT est.event_type, CAST(est.q AS BIGINT) AS q,
               est.n AS n_rows,
               CAST(est.est_cents AS BIGINT) AS est_cents,
               CAST(ex.exact_cents AS BIGINT) AS exact_cents,
               CAST(est.est_cents - ex.exact_cents AS BIGINT) AS err_cents
        FROM est JOIN ex ON est.event_type = ex.event_type
                        AND est.q = ex.q
    """

    # grid_dbscan: floor(x*32) quantization (×2^5 exact in binary
    # float), packed cell keys, dense >= 4, 8-neighbour CC as a
    # recursive min-label CTE; noise row cluster_id = -1.
    sql["grid_dbscan"] = """
        WITH RECURSIVE pts AS (
          SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 32)
                      AS BIGINT) AS cx,
                 CAST(floor(CAST(embedding[2] AS DOUBLE) * 32)
                      AS BIGINT) AS cy
          FROM embeddings
        ), cells AS MATERIALIZED (
          SELECT cx, cy,
                 (cx + 1048576) * 2097152 + (cy + 1048576) AS cell,
                 CAST(count(*) AS BIGINT) AS c
          FROM pts GROUP BY 1, 2
        ), dense AS MATERIALIZED (
          SELECT * FROM cells WHERE c >= 4
        ), edges AS MATERIALIZED (
          SELECT a.cell AS u, b.cell AS v
          FROM dense a JOIN dense b
            ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
        ), r AS (
          SELECT cell, cell AS lbl FROM dense
          UNION
          SELECT e.u AS cell, r.lbl FROM r JOIN edges e ON e.v = r.cell
        ), lab AS MATERIALIZED (
          SELECT cell, min(lbl) AS cluster_id FROM r GROUP BY cell
        ), clus AS (
          SELECT lab.cluster_id,
                 CAST(count(*) AS BIGINT) AS n_cells,
                 CAST(sum(d.c) AS BIGINT) AS n_points
          FROM lab JOIN dense d ON d.cell = lab.cell
          GROUP BY 1
        ), noise AS (
          SELECT CAST(-1 AS BIGINT) AS cluster_id,
                 CAST((SELECT count(*) FROM cells)
                      - (SELECT count(*) FROM dense) AS BIGINT)
                   AS n_cells,
                 CAST(COALESCE((SELECT sum(c) FROM cells), 0)
                      - COALESCE((SELECT sum(c) FROM dense), 0)
                      AS BIGINT) AS n_points
        )
        SELECT * FROM noise
        UNION ALL
        SELECT * FROM clus
    """

    # wasserstein_drift: ks_drift's (source, value) grid under the
    # integral norm — sum of |n_all*cum_s - n_s*cum_all| * gap to the
    # next global value (last point contributes 0).
    sql["wasserstein_drift"] = """
        WITH g AS (
            SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY 1
        ), gc AS (
            SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum_all
            FROM g
        ), s AS (
            SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY 1, 2
        ), grid AS (
            SELECT src.source, gc.v, gc.cum_all
            FROM gc CROSS JOIN (SELECT DISTINCT source FROM documents) src
        ), sc AS (
            SELECT grid.source, grid.v, grid.cum_all,
                   CAST(sum(COALESCE(s.c, 0)) OVER (
                       PARTITION BY grid.source ORDER BY grid.v
                   ) AS BIGINT) AS cum_s,
                   lead(grid.v) OVER (
                       PARTITION BY grid.source ORDER BY grid.v
                   ) AS nxt
            FROM grid LEFT JOIN s
              ON s.source = grid.source AND s.v = grid.v
        ), tot AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_s
            FROM documents GROUP BY 1
        ), alln AS (
            SELECT CAST(count(*) AS BIGINT) AS n_all FROM documents
        )
        SELECT sc.source,
               CAST(max(tot.n_s) AS BIGINT) AS n_s,
               CAST(max(alln.n_all) AS BIGINT) AS n_all,
               CAST(sum(abs(alln.n_all * sc.cum_s - tot.n_s * sc.cum_all)
                        * COALESCE(sc.nxt - sc.v, 0)) AS BIGINT) AS w1_num
        FROM sc JOIN tot ON tot.source = sc.source CROSS JOIN alln
        GROUP BY sc.source
    """

    # mann_whitney_u: tie-exact double rank d = 2*RANK() + t - 1
    # (= 2L + t + 1 with L strictly-smaller rows, t the tie size);
    # u2 = 2R - n(n+1) is twice the one-vs-rest U statistic.
    sql["mann_whitney_u"] = """
        WITH d AS (
            SELECT event_type,
                   2 * CAST(rank() OVER (ORDER BY value) AS BIGINT)
                     + CAST(count(*) OVER (PARTITION BY value) AS BIGINT)
                     - 1 AS dr
            FROM events
            WHERE isfinite(value)
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_g,
               CAST(sum(dr) AS BIGINT) AS r2_sum,
               CAST(sum(dr) - count(*) * (count(*) + 1) AS BIGINT) AS u2
        FROM d GROUP BY 1
    """

    # rfm_segments: quintile score = 1 + floor(rn0*5/n) over the
    # deterministic (metric, custkey) row_number — NTILE-free, so the
    # distributed bucket-grid rank mirrors it verbatim. Days are
    # floor(epoch/86400); money is floor(x*100+0.5) cents.
    sql["rfm_segments"] = """
        WITH mx AS (
            SELECT CAST(floor(epoch(max(o_orderdate)) / 86400) AS BIGINT) AS d
            FROM orders
        ), cust AS (
            SELECT o_custkey AS custkey,
                   (SELECT d FROM mx)
                     - CAST(floor(epoch(max(o_orderdate)) / 86400) AS BIGINT)
                     AS recency_days,
                   CAST(count(*) AS BIGINT) AS frequency,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS monetary_cents
            FROM orders GROUP BY 1
        ), n AS (
            SELECT CAST(count(*) AS BIGINT) AS n FROM cust
        ), s AS (
            SELECT cust.*,
                   1 + ((row_number() OVER (
                           ORDER BY recency_days DESC, custkey) - 1) * 5)
                       // (SELECT n FROM n) AS r_score,
                   1 + ((row_number() OVER (
                           ORDER BY frequency, custkey) - 1) * 5)
                       // (SELECT n FROM n) AS f_score,
                   1 + ((row_number() OVER (
                           ORDER BY monetary_cents, custkey) - 1) * 5)
                       // (SELECT n FROM n) AS m_score
            FROM cust
        )
        SELECT custkey, recency_days, frequency, monetary_cents,
               CAST(r_score AS BIGINT) AS r_score,
               CAST(f_score AS BIGINT) AS f_score,
               CAST(m_score AS BIGINT) AS m_score,
               CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
        FROM s
    """

    # t_closeness_audit: QI = (nation, $1000 balance bucket), sensitive
    # = market segment; tvd_num = sum_seg |n_cs*N - g_s*n_c| per class
    # (the LEFT JOIN against the full segment domain densifies absent
    # segments to 0), band = (10*tvd_num) // (2*n_c*N).
    sql["t_closeness_audit"] = """
        WITH qi AS (
            SELECT c_nationkey AS nk,
                   (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                    + 10000000) // 100000 AS b,
                   c_mktsegment AS seg
            FROM customer
        ), cs AS (
            SELECT nk, b, seg, CAST(count(*) AS BIGINT) AS n
            FROM qi GROUP BY 1, 2, 3
        ), class AS (
            SELECT nk, b, CAST(sum(n) AS BIGINT) AS n_c
            FROM cs GROUP BY 1, 2
        ), gseg AS (
            SELECT seg, CAST(count(*) AS BIGINT) AS g FROM qi GROUP BY 1
        ), alln AS (
            SELECT CAST(count(*) AS BIGINT) AS N FROM qi
        ), num AS (
            SELECT c.nk, c.b, c.n_c,
                   CAST(sum(abs(COALESCE(cs.n, 0) * alln.N
                                - gseg.g * c.n_c)) AS BIGINT) AS tvd_num
            FROM class c
            CROSS JOIN gseg
            CROSS JOIN alln
            LEFT JOIN cs ON cs.nk = c.nk AND cs.b = c.b AND cs.seg = gseg.seg
            GROUP BY 1, 2, 3
        )
        SELECT CAST((10 * tvd_num)
                    // (2 * n_c * (SELECT N FROM alln)) AS BIGINT) AS t_band,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(sum(n_c) AS BIGINT) AS n_rows
        FROM num GROUP BY 1
    """

    # spearman_corr: tie-exact double ranks (mann_whitney_u's
    # d = 2*RANK() + t - 1) on integer-cent money axes of the
    # orders-customer pair table; one integer sufficient-stats row.
    sql["spearman_corr"] = """
        WITH pr AS (
            SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS y
            FROM orders JOIN customer ON c_custkey = o_custkey
        ), d AS (
            SELECT 2 * CAST(rank() OVER (ORDER BY x) AS BIGINT)
                     + CAST(count(*) OVER (PARTITION BY x) AS BIGINT)
                     - 1 AS dx,
                   2 * CAST(rank() OVER (ORDER BY y) AS BIGINT)
                     + CAST(count(*) OVER (PARTITION BY y) AS BIGINT)
                     - 1 AS dy
            FROM pr
        )
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(dx) AS BIGINT) AS sx,
               CAST(sum(dy) AS BIGINT) AS sy,
               CAST(sum(dx * dy) AS BIGINT) AS sxy,
               CAST(sum(dx * dx) AS BIGINT) AS sxx,
               CAST(sum(dy * dy) AS BIGINT) AS syy
        FROM d
    """

    # degree_assortativity: exact degree-mixing moments over the
    # mutual-kNN edges; per-edge product of endpoint degrees.
    sql["degree_assortativity"] = f"""
        WITH mk AS MATERIALIZED (
          SELECT vec_a, vec_b FROM ({sql["mutual_knn"]})
        ),
        deg AS (
          SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
            SELECT vec_a AS v FROM mk UNION ALL SELECT vec_b FROM mk)
          GROUP BY 1
        ),
        e AS (
          SELECT da.dg AS d_a, db.dg AS d_b
          FROM mk JOIN deg da ON da.v = mk.vec_a
                  JOIN deg db ON db.v = mk.vec_b
        )
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(d_a + d_b) AS BIGINT) AS s_sum,
               CAST(sum(d_a * d_a + d_b * d_b) AS BIGINT) AS s_sq,
               CAST(sum(d_a * d_b) AS BIGINT) AS s_prod
        FROM e
    """

    # triangle_census: exact triangles via the a<b<c three-way
    # self-join (mk already stores vec_a < vec_b); wedges from
    # degrees.
    sql["triangle_census"] = f"""
        WITH mk AS MATERIALIZED (
          SELECT vec_a, vec_b FROM ({sql["mutual_knn"]})
        ),
        deg AS (
          SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
            SELECT vec_a AS v FROM mk UNION ALL SELECT vec_b FROM mk)
          GROUP BY 1
        ),
        tri AS (
          SELECT CAST(count(*) AS BIGINT) AS t
          FROM mk e1
          JOIN mk e2 ON e2.vec_a = e1.vec_b
          JOIN mk e3 ON e3.vec_a = e1.vec_a AND e3.vec_b = e2.vec_b
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM mk) AS m_edges,
               (SELECT CAST(sum((dg * (dg - 1)) // 2) AS BIGINT)
                FROM deg) AS wedges,
               (SELECT t FROM tri) AS triangles
    """

    # kendall_tau: exact tau-b sufficient statistics on the mod-4
    # sampled order-price / customer-balance pair table; disc via the
    # quadratic strict-discordance self-join (the sample keeps it
    # honest at sf0.01).
    sql["kendall_tau"] = """
        WITH pr AS MATERIALIZED (
            SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS y
            FROM orders JOIN customer ON c_custkey = o_custkey
            WHERE o_orderkey % 4 = 0
        ),
        t1 AS (SELECT CAST(coalesce(sum((c * (c - 1)) // 2), 0) AS BIGINT)
                 AS n1
               FROM (SELECT count(*) AS c FROM pr GROUP BY x)),
        t2 AS (SELECT CAST(coalesce(sum((c * (c - 1)) // 2), 0) AS BIGINT)
                 AS n2
               FROM (SELECT count(*) AS c FROM pr GROUP BY y)),
        t3 AS (SELECT CAST(coalesce(sum((c * (c - 1)) // 2), 0) AS BIGINT)
                 AS n3
               FROM (SELECT count(*) AS c FROM pr GROUP BY x, y)),
        d AS (SELECT CAST(count(*) AS BIGINT) AS disc
              FROM pr a JOIN pr b ON a.x < b.x AND a.y > b.y)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM pr) AS n,
               (SELECT n1 FROM t1) AS n1,
               (SELECT n2 FROM t2) AS n2,
               (SELECT n3 FROM t3) AS n3,
               (SELECT disc FROM d) AS disc
    """

    # km_risk_table: Kaplan-Meier risk table over per-user activity
    # spans; deaths = last event older than 7 days before the corpus
    # max; n_risk = suffix count of spans >= t.
    sql["km_risk_table"] = """
        WITH per_u AS (
          SELECT user_id,
                 date_diff('day', CAST(min(ts) AS DATE),
                           CAST(max(ts) AS DATE)) AS dur,
                 CAST(max(ts) AS DATE) AS last_d
          FROM events GROUP BY 1
        ),
        mx AS (SELECT CAST(max(ts) AS DATE) AS gmax FROM events),
        lab AS (
          SELECT CAST(dur AS BIGINT) AS t_days,
                 CAST(last_d < gmax - INTERVAL 7 DAY AS BIGINT) AS churned
          FROM per_u, mx
        ),
        agg AS (
          SELECT t_days,
                 CAST(sum(churned) AS BIGINT) AS d_events,
                 CAST(sum(1 - churned) AS BIGINT) AS c_censored
          FROM lab GROUP BY 1
        )
        SELECT t_days,
               CAST(sum(d_events + c_censored)
                    OVER (ORDER BY t_days DESC) AS BIGINT) AS n_risk,
               d_events, c_censored
        FROM agg ORDER BY t_days
    """

    # cochran_armitage_trend: exact trend sufficient statistics over
    # the log2 engagement bands (score = bit_length of event count).
    sql["cochran_armitage_trend"] = """
        WITH ue AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                           CAST(max(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS c
                    FROM events GROUP BY 1),
        b AS (SELECT CAST(len(bin(CAST(n AS UBIGINT))) AS BIGINT) AS s, c
              FROM ue)
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(c) AS BIGINT) AS r_total,
               CAST(sum(s) AS BIGINT) AS s_n,
               CAST(sum(s * s) AS BIGINT) AS s2_n,
               CAST(sum(s * c) AS BIGINT) AS s_r
        FROM b
    """

    # harrell_c_index: exact concordance counts; comparable pairs are
    # (shorter span, observed event) vs any longer span; risk = event
    # count.
    sql["harrell_c_index"] = """
        WITH per_u AS (
          SELECT user_id,
                 date_diff('day', CAST(min(ts) AS DATE),
                           CAST(max(ts) AS DATE)) AS t,
                 CAST(max(ts) AS DATE) AS last_d,
                 CAST(count(*) AS BIGINT) AS r
          FROM events GROUP BY 1
        ),
        mx AS (SELECT CAST(max(ts) AS DATE) AS gmax FROM events),
        lab AS (SELECT CAST(t AS BIGINT) AS t,
                       CAST(last_d < gmax - INTERVAL 7 DAY AS BIGINT) AS e,
                       r
                FROM per_u, mx),
        p AS (SELECT a.r AS ra, b.r AS rb
              FROM lab a JOIN lab b ON a.t < b.t AND a.e = 1)
        SELECT CAST(count(*) AS BIGINT) AS comparable,
               CAST(coalesce(sum(CASE WHEN ra > rb THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS concordant,
               CAST(coalesce(sum(CASE WHEN ra = rb THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS tied_risk
        FROM p
    """

    # dp_sensitivity_audit: exact per-user contribution bounds for
    # the daily-active and daily-event-count releases.
    sql["dp_sensitivity_audit"] = """
        WITH ud AS (SELECT user_id,
                           epoch_us(ts) // 86400000000 AS day,
                           CAST(count(*) AS BIGINT) AS n
                    FROM events GROUP BY 1, 2),
        pu AS (SELECT user_id,
                      CAST(count(*) AS BIGINT) AS days_active,
                      CAST(max(n) AS BIGINT) AS max_day,
                      CAST(sum(n) AS BIGINT) AS total
               FROM ud GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(max(days_active) AS BIGINT) AS max_days_active,
               CAST(max(max_day) AS BIGINT) AS max_events_one_day,
               CAST(max(total) AS BIGINT) AS max_events_total
        FROM pu
    """

    # winsorized_stats: exact two-sided n//20 trim per priority; the
    # kept sum is tie-break-invariant multiset order statistics.
    sql["winsorized_stats"] = """
        WITH o AS (SELECT o_orderpriority AS priority,
                          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                            AS v
                   FROM orders),
        rn AS (SELECT priority, v,
                      row_number() OVER (PARTITION BY priority
                                         ORDER BY v) AS rn,
                      count(*) OVER (PARTITION BY priority) AS n
               FROM o)
        SELECT priority,
               CAST(max(n) AS BIGINT) AS n,
               CAST(max(n) // 20 AS BIGINT) AS trim_k,
               CAST(count(*) FILTER (WHERE rn > n // 20
                     AND rn <= n - n // 20) AS BIGINT) AS kept_n,
               CAST(sum(v) FILTER (WHERE rn > n // 20
                     AND rn <= n - n // 20) AS BIGINT) AS kept_sum_cents
        FROM rn GROUP BY 1 ORDER BY 1
    """

    # competing_risks: cause-specific risk table; purchase wins exact
    # ties, censored at the last event when neither cause occurs.
    sql["competing_risks"] = """
        WITH pu AS (
          SELECT user_id,
                 min(epoch_us(ts) // 86400000000) AS t0,
                 max(epoch_us(ts) // 86400000000) AS tl,
                 min(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(ts) // 86400000000 END) AS tp,
                 min(CASE WHEN event_type = 'error'
                      THEN epoch_us(ts) // 86400000000 END) AS te
          FROM events GROUP BY 1
        ),
        lab AS (
          SELECT CAST(CASE
                   WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
                     THEN tp - t0
                   WHEN te IS NOT NULL THEN te - t0
                   ELSE tl - t0 END AS BIGINT) AS t_days,
                 CASE
                   WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN 1
                   WHEN te IS NOT NULL THEN 2
                   ELSE 0 END AS cause
          FROM pu
        ),
        agg AS (
          SELECT t_days,
                 CAST(count(*) FILTER (WHERE cause = 1) AS BIGINT)
                   AS d_purchase,
                 CAST(count(*) FILTER (WHERE cause = 2) AS BIGINT)
                   AS d_error,
                 CAST(count(*) FILTER (WHERE cause = 0) AS BIGINT)
                   AS c_censored
          FROM lab GROUP BY 1
        )
        SELECT t_days,
               CAST(sum(d_purchase + d_error + c_censored)
                    OVER (ORDER BY t_days DESC) AS BIGINT) AS n_risk,
               d_purchase, d_error, c_censored
        FROM agg ORDER BY t_days
    """

    # qini_uplift_deciles: exact decile table with the deterministic
    # (score DESC, user) rank and treat = user_id % 2.
    sql["qini_uplift_deciles"] = """
        WITH ue AS (SELECT user_id, CAST(count(*) AS BIGINT) AS score,
                           CAST(max(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS conv
                    FROM events GROUP BY 1),
        rk AS (SELECT user_id, conv,
                      row_number() OVER (ORDER BY score DESC,
                                         user_id ASC) - 1 AS rn0,
                      count(*) OVER () AS n
               FROM ue),
        d AS (SELECT 1 + rn0 * 10 // n AS decile,
                     user_id % 2 AS treat, conv
              FROM rk)
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(count(*) FILTER (WHERE treat = 1) AS BIGINT) AS n_treat,
               CAST(count(*) FILTER (WHERE treat = 0) AS BIGINT) AS n_ctrl,
               CAST(coalesce(sum(conv) FILTER (WHERE treat = 1), 0)
                    AS BIGINT) AS conv_treat,
               CAST(coalesce(sum(conv) FILTER (WHERE treat = 0), 0)
                    AS BIGINT) AS conv_ctrl
        FROM d GROUP BY 1 ORDER BY 1
    """

    # time_decay_attribution: day-grain halving credits; gap in
    # [0, 14]; only touch types that earned >= 1 pair appear.
    sql["time_decay_attribution"] = """
        WITH e AS (SELECT user_id, event_type,
                          epoch_us(ts) // 86400000000 AS day
                   FROM events),
        t AS (SELECT user_id, event_type, day,
                     CAST(count(*) AS BIGINT) AS n
              FROM e WHERE event_type IN ('view', 'click', 'signup')
              GROUP BY 1, 2, 3),
        p AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n
              FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
        j AS (SELECT t.event_type,
                     t.n * p.n AS pairs,
                     t.n * p.n * (CAST(1 AS BIGINT)
                       << CAST(14 - (p.day - t.day) AS INT)) AS credit
              FROM t JOIN p ON p.user_id = t.user_id
                           AND p.day - t.day BETWEEN 0 AND 14)
        SELECT event_type,
               CAST(sum(pairs) AS BIGINT) AS n_pairs,
               CAST(sum(credit) AS BIGINT) AS credit_sum
        FROM j GROUP BY 1 ORDER BY 1
    """

    # mann_kendall_trend: exact S and tie term per event type over
    # the bounded daily count series (quadratic self-join is honest
    # at oracle scale; the Ray side uses the merge-sort counter).
    sql["mann_kendall_trend"] = """
        WITH dc AS (SELECT event_type,
                           epoch_us(ts) // 86400000000 AS day,
                           CAST(count(*) AS BIGINT) AS x
                    FROM events GROUP BY 1, 2),
        s AS (SELECT a.event_type,
                     CAST(sum(CASE WHEN b.x > a.x THEN 1
                                   WHEN b.x < a.x THEN -1
                                   ELSE 0 END) AS BIGINT) AS s_stat
              FROM dc a JOIN dc b ON a.event_type = b.event_type
                                 AND b.day > a.day
              GROUP BY 1),
        nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
               FROM dc GROUP BY 1),
        tt AS (SELECT event_type,
                      CAST(coalesce(sum(c * (c - 1) * (2 * c + 5)), 0)
                           AS BIGINT) AS tie_term
               FROM (SELECT event_type, x, count(*) AS c
                     FROM dc GROUP BY 1, 2)
               GROUP BY 1)
        SELECT nn.event_type, nn.n_days,
               CAST(coalesce(s.s_stat, 0) AS BIGINT) AS s_stat,
               tt.tie_term
        FROM nn JOIN tt USING (event_type)
        LEFT JOIN s USING (event_type)
        ORDER BY 1
    """

    # gorilla_dod_audit: exact dod bucket bit cost per (type, day)
    # block; 64-bit header per block; equal timestamps are
    # order-insensitive.
    sql["gorilla_dod_audit"] = """
        WITH e AS (SELECT event_type, epoch_us(ts) AS t,
                          epoch_us(ts) // 86400000000 AS day
                   FROM events),
        d AS (SELECT event_type, day, t,
                     t - lag(t) OVER (PARTITION BY event_type, day
                                      ORDER BY t) AS delta
              FROM e),
        dd AS (SELECT event_type, day, delta,
                      delta - coalesce(lag(delta) OVER (
                        PARTITION BY event_type, day ORDER BY t), 0)
                        AS dod
               FROM d),
        bits AS (SELECT event_type, day,
                        CASE WHEN delta IS NULL THEN 64
                             WHEN dod = 0 THEN 1
                             WHEN dod BETWEEN -63 AND 64 THEN 9
                             WHEN dod BETWEEN -255 AND 256 THEN 12
                             WHEN dod BETWEEN -2047 AND 2048 THEN 16
                             ELSE 36 END AS b
                 FROM dd),
        per_t AS (SELECT event_type,
                         CAST(count(DISTINCT day) AS BIGINT) AS n_blocks,
                         CAST(count(*) AS BIGINT) AS n_events,
                         CAST(sum(b) AS BIGINT) AS total_bits
                  FROM bits GROUP BY 1)
        SELECT event_type, n_blocks, n_events, total_bits,
               CAST(total_bits * 1000 // n_events AS BIGINT)
                 AS bits_per_event_milli
        FROM per_t ORDER BY 1
    """

    # changepoint_split: banded integer between-SS score, HUGEINT
    # arithmetic, earliest-day tie-break; types need >= 2 days.
    sql["changepoint_split"] = """
        WITH dc AS (SELECT event_type,
                           epoch_us(ts) // 86400000000 AS day,
                           CAST(count(*) AS BIGINT) AS x
                    FROM events GROUP BY 1, 2),
        w AS (SELECT event_type, day,
                     sum(x) OVER (PARTITION BY event_type
                                  ORDER BY day) AS run,
                     sum(x) OVER (PARTITION BY event_type) AS total,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY day) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM dc),
        cand AS (SELECT event_type, day, n,
                        CAST(n - rn AS HUGEINT) * CAST(run AS HUGEINT)
                          - CAST(rn AS HUGEINT)
                            * CAST(total - run AS HUGEINT) AS num,
                        CAST(rn AS HUGEINT) * CAST(n - rn AS HUGEINT)
                          AS den
                 FROM w WHERE rn < n),
        sc AS (SELECT event_type, day, n,
                      (num * num * 1000000) // den AS score
               FROM cand),
        best AS (SELECT event_type, day, n, score,
                        row_number() OVER (PARTITION BY event_type
                          ORDER BY score DESC, day ASC) AS r
                 FROM sc)
        SELECT event_type, CAST(n AS BIGINT) AS n_days,
               CAST(day AS BIGINT) AS split_day,
               CAST(score AS VARCHAR) AS score_scaled
        FROM best WHERE r = 1 ORDER BY 1
    """

    # containment_pairs: asymmetric containment of the smaller
    # shingle set, same hot-shingle drop as the jaccard pair plan.
    sql["containment_pairs"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        szs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                FROM sh GROUP BY 1),
        shf AS (
          SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY s) AS sc
                         FROM sh)
          WHERE sc <= 32
        ),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(count(*) AS BIGINT) AS intersection
          FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, intersection, sa.n AS size_a, sb.n AS size_b,
               CAST(intersection * 10000 // least(sa.n, sb.n) AS BIGINT)
                 AS contain_bp
        FROM inter
        JOIN szs sa ON doc_a = sa.doc_id
        JOIN szs sb ON doc_b = sb.doc_id
        WHERE intersection * 5 >= least(sa.n, sb.n) * 4
    """

    # selectivity_drift: exact joint vs independence counts for the
    # six unordered predicate pairs.
    sql["selectivity_drift"] = """
        WITH f AS (SELECT
            CAST(floor(l_discount * 100 + 0.5) >= 5 AS BIGINT) AS disc_hi,
            CAST(floor(l_quantity + 0.5) >= 25 AS BIGINT) AS qty_hi,
            CAST(l_returnflag = 'R' AS BIGINT) AS ret_r,
            CAST(l_linestatus = 'F' AS BIGINT) AS status_f
          FROM lineitem),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(disc_hi) AS BIGINT) AS a1,
                     CAST(sum(qty_hi) AS BIGINT) AS a2,
                     CAST(sum(ret_r) AS BIGINT) AS a3,
                     CAST(sum(status_f) AS BIGINT) AS a4,
                     CAST(sum(disc_hi * qty_hi) AS BIGINT) AS p12,
                     CAST(sum(disc_hi * ret_r) AS BIGINT) AS p13,
                     CAST(sum(disc_hi * status_f) AS BIGINT) AS p14,
                     CAST(sum(qty_hi * ret_r) AS BIGINT) AS p23,
                     CAST(sum(qty_hi * status_f) AS BIGINT) AS p24,
                     CAST(sum(ret_r * status_f) AS BIGINT) AS p34
              FROM f)
        SELECT 'disc_hi' AS pred_a, 'qty_hi' AS pred_b, n,
               a1 AS n_a, a2 AS n_b, p12 AS n_ab,
               CAST(10000 * p12 * n // (a1 * a2) AS BIGINT) AS ratio_bp
        FROM m
        UNION ALL SELECT 'disc_hi', 'ret_r', n, a1, a3, p13,
               CAST(10000 * p13 * n // (a1 * a3) AS BIGINT) FROM m
        UNION ALL SELECT 'disc_hi', 'status_f', n, a1, a4, p14,
               CAST(10000 * p14 * n // (a1 * a4) AS BIGINT) FROM m
        UNION ALL SELECT 'qty_hi', 'ret_r', n, a2, a3, p23,
               CAST(10000 * p23 * n // (a2 * a3) AS BIGINT) FROM m
        UNION ALL SELECT 'qty_hi', 'status_f', n, a2, a4, p24,
               CAST(10000 * p24 * n // (a2 * a4) AS BIGINT) FROM m
        UNION ALL SELECT 'ret_r', 'status_f', n, a3, a4, p34,
               CAST(10000 * p34 * n // (a3 * a4) AS BIGINT) FROM m
        ORDER BY 1, 2
    """

    # wl_refinement: 1-WL from the degree coloring; sorted neighbor
    # multiset via string_agg ORDER BY (ASCII, matching Python
    # sorted() on the hex labels).
    sql["wl_refinement"] = f"""
        WITH mk AS MATERIALIZED (
          SELECT vec_a, vec_b FROM ({sql["mutual_knn"]})
        ),
        ed AS MATERIALIZED (
          SELECT vec_a AS v, vec_b AS u FROM mk
          UNION ALL SELECT vec_b, vec_a FROM mk
        ),
        l0 AS MATERIALIZED (
          SELECT v AS node, CAST(count(*) AS VARCHAR) AS lab
          FROM ed GROUP BY 1
        ),
        l1 AS MATERIALIZED (
          SELECT ed.v AS node,
                 md5(lv.lab || '|' ||
                     string_agg(lu.lab, ',' ORDER BY lu.lab)) AS lab
          FROM ed JOIN l0 lv ON lv.node = ed.v
                  JOIN l0 lu ON lu.node = ed.u
          GROUP BY ed.v, lv.lab
        ),
        l2 AS MATERIALIZED (
          SELECT ed.v AS node,
                 md5(lv.lab || '|' ||
                     string_agg(lu.lab, ',' ORDER BY lu.lab)) AS lab
          FROM ed JOIN l1 lv ON lv.node = ed.v
                  JOIN l1 lu ON lu.node = ed.u
          GROUP BY ed.v, lv.lab
        ),
        s0 AS (SELECT CAST(0 AS BIGINT) AS round,
                      CAST(count(*) AS BIGINT) AS n_colors,
                      CAST(max(c) AS BIGINT) AS max_class
               FROM (SELECT lab, count(*) AS c FROM l0 GROUP BY 1)),
        s1 AS (SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT),
                      CAST(max(c) AS BIGINT)
               FROM (SELECT lab, count(*) AS c FROM l1 GROUP BY 1)),
        s2 AS (SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
                      CAST(max(c) AS BIGINT)
               FROM (SELECT lab, count(*) AS c FROM l2 GROUP BY 1))
        SELECT * FROM s0 UNION ALL SELECT * FROM s1
        UNION ALL SELECT * FROM s2 ORDER BY round
    """

    # ann_margin_profile: banded rank-2/rank-1 d2 ratio per vector.
    sql["ann_margin_profile"] = f"""
        WITH g AS ({sql["knn_graph"]}),
        p AS (
          SELECT a.vec_id,
                 least(b.d2 * 10 // greatest(a.d2, 1), 50) AS band
          FROM g a JOIN g b ON b.vec_id = a.vec_id AND b.rank = 2
          WHERE a.rank = 1
        )
        SELECT CAST(band AS BIGINT) AS band,
               CAST(count(*) AS BIGINT) AS n_vecs
        FROM p GROUP BY 1 ORDER BY 1
    """

    # isotonic_calibration: PAV via the max-min closed form over the
    # ordered non-empty bins; exact HUGEINT cross-multiplied argmins.
    sql["isotonic_calibration"] = """
        WITH ue AS (SELECT user_id, CAST(count(*) AS BIGINT) AS score,
                           CAST(max(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS conv
                    FROM events GROUP BY 1),
        mx AS (SELECT max(score) AS smax FROM ue),
        b AS (SELECT CAST(score * 32 // (smax + 1) AS BIGINT) AS bin,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(conv) AS BIGINT) AS pos
              FROM ue, mx GROUP BY 1),
        rk AS (SELECT bin, n, pos,
                      row_number() OVER (ORDER BY bin) AS i
               FROM b),
        fr AS (SELECT j.i AS j, k.i AS k,
                      CAST(sum(m.pos) AS HUGEINT) AS num,
                      CAST(sum(m.n) AS HUGEINT) AS den
               FROM rk j JOIN rk k ON k.i >= j.i
               JOIN rk m ON m.i BETWEEN j.i AND k.i
               GROUP BY 1, 2),
        mn AS (SELECT f.j, f.num, f.den FROM fr f
               WHERE NOT EXISTS (SELECT 1 FROM fr g WHERE g.j = f.j
                     AND (g.num * f.den < f.num * g.den
                          OR (g.num * f.den = f.num * g.den
                              AND g.k < f.k)))),
        fit AS (SELECT r.i, m.num, m.den
                FROM rk r JOIN mn m ON m.j <= r.i
                WHERE NOT EXISTS (SELECT 1 FROM mn m2 WHERE m2.j <= r.i
                      AND (m2.num * m.den > m.num * m2.den
                           OR (m2.num * m.den = m.num * m2.den
                               AND m2.j < m.j))))
        SELECT rk.bin, rk.n AS n_bin, rk.pos AS pos_bin,
               CAST(1000 * fit.num // fit.den AS BIGINT) AS fit_milli
        FROM rk JOIN fit ON fit.i = rk.i ORDER BY rk.bin
    """

    # km_survival_curve: sequential integer banding of the
    # product-limit estimator over the km risk table.
    sql["km_survival_curve"] = f"""
        WITH RECURSIVE base AS MATERIALIZED (
          SELECT t_days, n_risk, d_events,
                 row_number() OVER (ORDER BY t_days) AS rn
          FROM ({sql["km_risk_table"]})
        ),
        rec(rn, t_days, n_risk, d_events, s) AS (
          SELECT rn, t_days, n_risk, d_events,
                 CAST(1000 * (n_risk - d_events) // n_risk AS BIGINT)
          FROM base WHERE rn = 1
          UNION ALL
          SELECT b.rn, b.t_days, b.n_risk, b.d_events,
                 CAST(rec.s * (b.n_risk - b.d_events) // b.n_risk
                      AS BIGINT)
          FROM rec JOIN base b ON b.rn = rec.rn + 1
        )
        SELECT t_days, n_risk, d_events, s AS s_milli
        FROM rec ORDER BY t_days
    """

    # cramer_von_mises: value-level tie handling; HUGEINT total
    # emitted as a decimal string on both sides.
    sql["cramer_von_mises"] = """
        WITH o AS (SELECT CAST(o_orderpriority = '1-URGENT' AS BIGINT)
                     AS g,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
                   FROM orders),
        nn AS (SELECT CAST(sum(g) AS BIGINT) AS n1,
                      CAST(count(*) - sum(g) AS BIGINT) AS n2 FROM o),
        dv AS (SELECT v, CAST(count(*) AS BIGINT) AS m,
                      CAST(sum(g) AS BIGINT) AS m1
               FROM o GROUP BY 1),
        cum AS (SELECT m,
                       CAST(sum(m1) OVER (ORDER BY v) AS HUGEINT) AS c1,
                       CAST(sum(m - m1) OVER (ORDER BY v) AS HUGEINT)
                         AS c2
                FROM dv),
        t AS (SELECT CAST(sum(CAST(m AS HUGEINT)
                * (CAST(nn.n2 AS HUGEINT) * c1
                   - CAST(nn.n1 AS HUGEINT) * c2)
                * (CAST(nn.n2 AS HUGEINT) * c1
                   - CAST(nn.n1 AS HUGEINT) * c2)) AS HUGEINT) AS t
              FROM cum, nn)
        SELECT nn.n1, nn.n2, CAST(t.t AS VARCHAR) AS t_stat
        FROM nn, t
    """

    # kruskal_wallis: tie-exact double ranks over the pooled values;
    # constant n_total/tie_term columns ride every class row.
    sql["kruskal_wallis"] = """
        WITH o AS (SELECT o_orderpriority AS priority,
                          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                            AS v
                   FROM orders),
        d AS (SELECT priority,
                     2 * CAST(rank() OVER (ORDER BY v) AS BIGINT)
                       + CAST(count(*) OVER (PARTITION BY v) AS BIGINT)
                       - 1 AS dd
              FROM o),
        g AS (SELECT priority, CAST(count(*) AS BIGINT) AS n_g,
                     CAST(sum(dd) AS BIGINT) AS d_sum
              FROM d GROUP BY 1),
        t AS (SELECT CAST(coalesce(sum(c * c * c - c), 0) AS BIGINT)
                AS tie_term
              FROM (SELECT count(*) AS c FROM o GROUP BY v)),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM o)
        SELECT priority, n_g, d_sum, n_total, tie_term
        FROM g, n, t ORDER BY 1
    """

    # heaps_curve: vocabulary/token growth at doc-id-ordered prefix
    # cutoffs n/64, n/16, n/4, n.
    sql["heaps_curve"] = f"""
        WITH {_WORDS_CTE},
        tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        cuts AS (SELECT DISTINCT greatest(1, n // f) AS cutoff
                 FROM nd, UNNEST([64, 16, 4, 1]) AS t(f)),
        firsts AS (SELECT word, min(doc_id) AS fd FROM tok GROUP BY 1),
        v AS (SELECT cutoff,
                     (SELECT CAST(count(*) AS BIGINT) FROM firsts
                      WHERE fd < cutoff) AS vocab_size
              FROM cuts),
        t AS (SELECT cutoff,
                     (SELECT CAST(coalesce(sum(len(ws)), 0) AS BIGINT)
                      FROM w WHERE doc_id < cutoff) AS n_tokens_seen
              FROM cuts)
        SELECT v.cutoff AS cutoff_docs, t.n_tokens_seen, v.vocab_size
        FROM v JOIN t USING (cutoff) ORDER BY 1
    """

    # varint_cost_audit: LEB128 cost, zigzag raw vs sorted deltas
    # (first value zigzag-encoded, deltas plain).
    sql["varint_cost_audit"] = """
        WITH vals AS (
          SELECT 'o_custkey' AS col, CAST(o_custkey AS BIGINT) AS v
          FROM orders
          UNION ALL SELECT 'o_orderkey', o_orderkey FROM orders
          UNION ALL SELECT 'price_cents',
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
          FROM orders),
        zz AS (SELECT col,
                      CAST(CASE WHEN v >= 0 THEN 2 * v
                           ELSE -2 * v - 1 END AS UBIGINT) AS u
               FROM vals),
        raw AS (SELECT col, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN u = 0 THEN 1
                            ELSE (len(bin(u)) + 6) // 7 END) AS BIGINT)
                         AS raw_bytes
                FROM zz GROUP BY 1),
        srt AS (SELECT col, v,
                       v - lag(v) OVER (PARTITION BY col ORDER BY v)
                         AS dlt
                FROM vals),
        sd AS (SELECT col,
                      CAST(sum(CASE WHEN dlt IS NULL THEN
                        (CASE WHEN zu = 0 THEN 1
                              ELSE (len(bin(zu)) + 6) // 7 END)
                      ELSE
                        (CASE WHEN du = 0 THEN 1
                              ELSE (len(bin(du)) + 6) // 7 END)
                      END) AS BIGINT) AS delta_bytes
               FROM (SELECT col, dlt,
                            CAST(CASE WHEN v >= 0 THEN 2 * v
                                 ELSE -2 * v - 1 END AS UBIGINT) AS zu,
                            CAST(coalesce(dlt, 0) AS UBIGINT) AS du
                     FROM srt)
               GROUP BY 1)
        SELECT raw.col, raw.n, raw.raw_bytes, sd.delta_bytes
        FROM raw JOIN sd USING (col) ORDER BY 1
    """

    # friedman_test: treatments double-ranked within nation blocks on
    # total order cents; incomplete blocks rank over their present
    # treatments.
    sql["friedman_test"] = """
        WITH cell AS (
          SELECT c_nationkey AS nation, o_orderpriority AS priority,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS cents
          FROM orders JOIN customer ON c_custkey = o_custkey
          GROUP BY 1, 2),
        d AS (SELECT nation, priority,
                     2 * CAST(rank() OVER (PARTITION BY nation
                                           ORDER BY cents) AS BIGINT)
                       + CAST(count(*) OVER (PARTITION BY nation, cents)
                              AS BIGINT) - 1 AS dd
              FROM cell),
        nb AS (SELECT CAST(count(DISTINCT nation) AS BIGINT) AS n_blocks
               FROM cell),
        kt AS (SELECT CAST(count(DISTINCT priority) AS BIGINT) AS k_treat
               FROM cell)
        SELECT priority, CAST(sum(dd) AS BIGINT) AS r2_sum,
               nb.n_blocks, kt.k_treat
        FROM d, nb, kt GROUP BY 1, 3, 4 ORDER BY 1
    """

    # rich_club: degree-threshold curve over the MinHash candidate
    # graph.
    sql["rich_club"] = f"""
        WITH pr AS MATERIALIZED (
          SELECT doc_a, doc_b FROM ({sql["dedup_minhash_lsh"]})
        ),
        deg AS MATERIALIZED (
          SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
            SELECT doc_a AS v FROM pr UNION ALL SELECT doc_b FROM pr)
          GROUP BY 1
        ),
        ks AS (SELECT unnest([1, 2, 4, 8, 16]) AS k),
        nr AS (SELECT k, (SELECT CAST(count(*) AS BIGINT) FROM deg
                          WHERE dg > k) AS n_rich FROM ks),
        er AS (SELECT k,
                      (SELECT CAST(count(*) AS BIGINT)
                       FROM pr JOIN deg da ON da.v = pr.doc_a
                               JOIN deg db ON db.v = pr.doc_b
                       WHERE least(da.dg, db.dg) > k) AS e_rich
               FROM ks)
        SELECT CAST(nr.k AS BIGINT) AS k, nr.n_rich, er.e_rich
        FROM nr JOIN er USING (k) ORDER BY 1
    """

    # absorption_reach_milli: banded matrix recurrence, purchase
    # absorbing; next-types without outgoing rows contribute 0.
    sql["absorption_reach_milli"] = """
        WITH tr AS (
          SELECT event_type AS prev, nxt, CAST(count(*) AS BIGINT) AS n
          FROM (SELECT user_id, event_type,
                       lead(event_type) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                       ) AS nxt
                FROM events)
          WHERE nxt IS NOT NULL AND event_type <> 'purchase'
          GROUP BY 1, 2),
        r AS (SELECT prev AS s, CAST(sum(n) AS BIGINT) AS r
              FROM tr GROUP BY 1),
        cp AS (SELECT r.s,
                      CAST(coalesce((SELECT sum(n) FROM tr
                            WHERE tr.prev = r.s
                              AND tr.nxt = 'purchase'), 0) AS BIGINT)
                        AS c_p
               FROM r),
        m1 AS (SELECT r.s, (1000 * cp.c_p) // r.r AS m
               FROM r JOIN cp ON cp.s = r.s),
        m2 AS (SELECT r.s,
                      (1000 * cp.c_p + coalesce(a.acc, 0)) // r.r AS m
               FROM r JOIN cp ON cp.s = r.s
               LEFT JOIN (SELECT tr.prev AS s,
                                 CAST(sum(tr.n * m1.m) AS BIGINT) AS acc
                          FROM tr JOIN m1 ON m1.s = tr.nxt
                          GROUP BY 1) a ON a.s = r.s),
        m3 AS (SELECT r.s,
                      (1000 * cp.c_p + coalesce(a.acc, 0)) // r.r AS m
               FROM r JOIN cp ON cp.s = r.s
               LEFT JOIN (SELECT tr.prev AS s,
                                 CAST(sum(tr.n * m2.m) AS BIGINT) AS acc
                          FROM tr JOIN m2 ON m2.s = tr.nxt
                          GROUP BY 1) a ON a.s = r.s)
        SELECT r.s AS event_type, r.r AS n_out,
               CAST(m1.m AS BIGINT) AS reach1_milli,
               CAST(m2.m AS BIGINT) AS reach2_milli,
               CAST(m3.m AS BIGINT) AS reach3_milli
        FROM r JOIN m1 ON m1.s = r.s JOIN m2 ON m2.s = r.s
        JOIN m3 ON m3.s = r.s ORDER BY 1
    """

    # bfs_layers: first-reached layer sizes from the 8 smallest
    # nodes; only non-empty layers appear.
    sql["bfs_layers"] = f"""
        WITH mk AS MATERIALIZED (
          SELECT vec_a, vec_b FROM ({sql["mutual_knn"]})
        ),
        ed AS MATERIALIZED (
          SELECT vec_a AS v, vec_b AS u FROM mk
          UNION ALL SELECT vec_b, vec_a FROM mk
        ),
        d0 AS (SELECT v FROM (SELECT DISTINCT v FROM ed)
               ORDER BY v LIMIT 8),
        d1 AS (SELECT DISTINCT ed.u AS v FROM ed
               JOIN d0 ON d0.v = ed.v
               WHERE ed.u NOT IN (SELECT v FROM d0)),
        d2 AS (SELECT DISTINCT ed.u AS v FROM ed
               JOIN d1 ON d1.v = ed.v
               WHERE ed.u NOT IN (SELECT v FROM d0)
                 AND ed.u NOT IN (SELECT v FROM d1)),
        d3 AS (SELECT DISTINCT ed.u AS v FROM ed
               JOIN d2 ON d2.v = ed.v
               WHERE ed.u NOT IN (SELECT v FROM d0)
                 AND ed.u NOT IN (SELECT v FROM d1)
                 AND ed.u NOT IN (SELECT v FROM d2)),
        sz AS (
          SELECT CAST(0 AS BIGINT) AS hop,
                 CAST(count(*) AS BIGINT) AS n_nodes FROM d0
          UNION ALL SELECT 1, CAST(count(*) AS BIGINT) FROM d1
          UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM d2
          UNION ALL SELECT 3, CAST(count(*) AS BIGINT) FROM d3)
        SELECT hop, n_nodes FROM sz WHERE n_nodes > 0 ORDER BY hop
    """

    # vocab_trie_audit: distinct prefixes of the truncated distinct
    # token set.
    sql["vocab_trie_audit"] = f"""
        WITH {_WORDS_CTE},
        tok AS (SELECT DISTINCT unnest(ws) AS t FROM w),
        tc AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens,
                      CAST(sum(len(left(t, 16))) AS BIGINT) AS total_chars
               FROM tok),
        pref AS (SELECT DISTINCT substr(left(t, 16), 1, i) AS p
                 FROM tok,
                      UNNEST(range(1, len(left(t, 16)) + 1)) AS r(i)),
        pn AS (SELECT CAST(count(*) AS BIGINT) AS trie_nodes FROM pref)
        SELECT tc.n_tokens, tc.total_chars, pn.trie_nodes,
               CAST(tc.total_chars - pn.trie_nodes AS BIGINT)
                 AS saved_chars
        FROM tc, pn
    """

    # ship_lag_profile: lag-day bands per priority over the big-big
    # join; negative lags band at 0 but sum raw.
    sql["ship_lag_profile"] = """
        WITH j AS (
          SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pcode,
                 epoch_us(l_shipdate) // 86400000000
                   - epoch_us(o_orderdate) // 86400000000 AS lag
          FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        ),
        b AS (SELECT pcode,
                     CASE WHEN greatest(lag, 0) >= 91 THEN 91
                          WHEN greatest(lag, 0) >= 61 THEN 61
                          WHEN greatest(lag, 0) >= 31 THEN 31
                          WHEN greatest(lag, 0) >= 8 THEN 8
                          ELSE 0 END AS band_lo,
                     lag
              FROM j)
        SELECT pcode, CAST(band_lo AS BIGINT) AS band_lo,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(lag) AS BIGINT) AS lag_days_sum
        FROM b GROUP BY 1, 2 ORDER BY 1, 2
    """

    # fd_violation_audit: g3 error per candidate FD.
    sql["fd_violation_audit"] = """
        SELECT 'lang_to_source' AS fd_name,
               CAST((SELECT count(DISTINCT lang) FROM documents)
                    AS BIGINT) AS n_groups,
               CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_rows,
               CAST((SELECT count(*) FROM documents)
                    - (SELECT sum(mx) FROM (SELECT max(c) AS mx FROM
                        (SELECT lang, source, count(*) AS c
                         FROM documents GROUP BY 1, 2) GROUP BY lang))
                    AS BIGINT) AS n_violations
        UNION ALL
        SELECT 'nation_to_segment',
               CAST((SELECT count(DISTINCT c_nationkey) FROM customer)
                    AS BIGINT),
               CAST((SELECT count(*) FROM customer) AS BIGINT),
               CAST((SELECT count(*) FROM customer)
                    - (SELECT sum(mx) FROM (SELECT max(c) AS mx FROM
                        (SELECT c_nationkey, c_mktsegment, count(*) AS c
                         FROM customer GROUP BY 1, 2)
                        GROUP BY c_nationkey)) AS BIGINT)
        UNION ALL
        SELECT 'priority_to_status',
               CAST((SELECT count(DISTINCT o_orderpriority) FROM orders)
                    AS BIGINT),
               CAST((SELECT count(*) FROM orders) AS BIGINT),
               CAST((SELECT count(*) FROM orders)
                    - (SELECT sum(mx) FROM (SELECT max(c) AS mx FROM
                        (SELECT o_orderpriority, o_orderstatus,
                                count(*) AS c
                         FROM orders GROUP BY 1, 2)
                        GROUP BY o_orderpriority)) AS BIGINT)
        UNION ALL
        SELECT 'user_to_event_type',
               CAST((SELECT count(DISTINCT user_id) FROM events)
                    AS BIGINT),
               CAST((SELECT count(*) FROM events) AS BIGINT),
               CAST((SELECT count(*) FROM events)
                    - (SELECT sum(mx) FROM (SELECT max(c) AS mx FROM
                        (SELECT user_id, event_type, count(*) AS c
                         FROM events GROUP BY 1, 2) GROUP BY user_id))
                    AS BIGINT)
        ORDER BY 1
    """

    # qq_drift_deciles: type-1 decile order statistics per half of
    # the order-date range; ceil via (a + 9) // 10 (DuckDB //
    # truncates toward zero, so the negate-floor idiom is wrong).
    sql["qq_drift_deciles"] = """
        WITH o AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                            AS v
                   FROM orders),
        lim AS (SELECT min(day) AS dlo, max(day) AS dhi FROM o),
        p AS (SELECT CAST(day > (dlo + dhi) // 2 AS BIGINT) AS period, v
              FROM o, lim),
        rk AS (SELECT period, v,
                      row_number() OVER (PARTITION BY period
                                         ORDER BY v) AS rn,
                      count(*) OVER (PARTITION BY period) AS n
               FROM p),
        q AS (SELECT unnest(range(1, 10)) AS decile),
        sel AS (SELECT q.decile, rk.period, rk.v
                FROM q JOIN rk
                  ON rk.rn = (q.decile * rk.n + 9) // 10)
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(max(CASE WHEN period = 0 THEN v END) AS BIGINT)
                 AS v_h1_cents,
               CAST(max(CASE WHEN period = 1 THEN v END) AS BIGINT)
                 AS v_h2_cents,
               CAST(max(CASE WHEN period = 1 THEN v END)
                    - max(CASE WHEN period = 0 THEN v END) AS BIGINT)
                 AS diff_cents
        FROM sel GROUP BY 1 ORDER BY 1
    """

    # simhash_bit_bias: per-bit set counts over the simhash CTE.
    sql["simhash_bit_bias"] = f"""
        WITH {_SIMHASH_CTE},
        pb AS (SELECT bit,
                      CAST(sum(CAST((CAST('0x' || simhash AS UBIGINT)
                                     >> bit) & 1 AS BIGINT)) AS BIGINT)
                        AS n_set,
                      CAST(count(*) AS BIGINT) AS n_docs
               FROM fps, UNNEST(range(0, 64)) AS r(bit) GROUP BY 1)
        SELECT CAST(bit AS BIGINT) AS bit, n_set, n_docs,
               CAST(n_set * 10000 // n_docs AS BIGINT) AS set_bp
        FROM pb ORDER BY 1
    """

    # runs_test: above/below the exact type-1 median of daily counts;
    # median-equal days dropped.
    sql["runs_test"] = """
        WITH dc AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                           CAST(count(*) AS BIGINT) AS x
                    FROM orders GROUP BY 1),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM dc),
        med AS (SELECT x AS m FROM
                  (SELECT x, row_number() OVER (ORDER BY x) AS rn
                   FROM dc), n
                WHERE rn = (n_days + 1) // 2),
        lab AS (SELECT day, CASE WHEN x > m THEN 1 ELSE 0 END AS l
                FROM dc, med WHERE x <> m),
        runs AS (SELECT CAST(coalesce(sum(CASE WHEN prev IS NULL
                          OR l <> prev THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_runs
                 FROM (SELECT l, lag(l) OVER (ORDER BY day) AS prev
                       FROM lab)),
        ab AS (SELECT CAST(coalesce(sum(l), 0) AS BIGINT) AS n_above,
                      CAST(coalesce(sum(1 - l), 0) AS BIGINT) AS n_below
               FROM lab)
        SELECT n.n_days, CAST(med.m AS BIGINT) AS median_x,
               ab.n_above, ab.n_below, runs.n_runs
        FROM n, med, ab, runs
    """

    # quintile_migration: per-half exact quintiles with the
    # (cents, custkey) tie-break; absent halves band 0.
    sql["quintile_migration"] = """
        WITH o AS (SELECT o_custkey AS ck,
                          epoch_us(o_orderdate) // 86400000000 AS day,
                          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                            AS v
                   FROM orders),
        lim AS (SELECT min(day) AS dlo, max(day) AS dhi FROM o),
        h AS (SELECT ck, CAST(day > (dlo + dhi) // 2 AS BIGINT) AS half,
                     CAST(sum(v) AS BIGINT) AS cents
              FROM o, lim GROUP BY 1, 2),
        q1 AS (SELECT ck,
                      CAST(1 + (row_number() OVER (ORDER BY cents, ck)
                                - 1) * 5 // count(*) OVER () AS BIGINT)
                        AS q
               FROM h WHERE half = 0),
        q2 AS (SELECT ck,
                      CAST(1 + (row_number() OVER (ORDER BY cents, ck)
                                - 1) * 5 // count(*) OVER () AS BIGINT)
                        AS q
               FROM h WHERE half = 1),
        allc AS (SELECT DISTINCT ck FROM h),
        m AS (SELECT coalesce(q1.q, 0) AS q_h1,
                     coalesce(q2.q, 0) AS q_h2
              FROM allc LEFT JOIN q1 USING (ck) LEFT JOIN q2 USING (ck))
        SELECT q_h1, q_h2, CAST(count(*) AS BIGINT) AS n_customers
        FROM m GROUP BY 1, 2 ORDER BY 1, 2
    """

    # token_df_drift: top-20 by |df1*N2 - df2*N1|, (score desc,
    # token asc) tie-break; halves split at doc_id < n//2.
    sql["token_df_drift"] = f"""
        WITH {_WORDS_CTE},
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        tok AS (SELECT DISTINCT doc_id, unnest(ws) AS token FROM w),
        lab AS (SELECT token,
                       CAST(doc_id >= (SELECT n // 2 FROM nd) AS BIGINT)
                         AS h
                FROM tok),
        dfs AS (SELECT token,
                       CAST(count(*) FILTER (WHERE h = 0) AS BIGINT)
                         AS df_h1,
                       CAST(count(*) FILTER (WHERE h = 1) AS BIGINT)
                         AS df_h2
                FROM lab GROUP BY 1)
        SELECT token, df_h1, df_h2,
               CAST(abs(df_h1 * (nd.n - nd.n // 2)
                        - df_h2 * (nd.n // 2)) AS BIGINT)
                 AS drift_score
        FROM dfs, nd
        ORDER BY drift_score DESC, token ASC LIMIT 20
    """

    # linkage_transitivity_audit: triangle census over accepted
    # linkage pairs (score >= 12).
    sql["linkage_transitivity_audit"] = f"""
        WITH acc AS MATERIALIZED (
          SELECT DISTINCT least(doc_a, doc_b) AS doc_a,
                 greatest(doc_a, doc_b) AS doc_b
          FROM ({sql["linkage_scores"]})
          WHERE score >= 12
        ),
        deg AS (
          SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
            SELECT doc_a AS v FROM acc UNION ALL SELECT doc_b FROM acc)
          GROUP BY 1
        ),
        tri AS (
          SELECT CAST(count(*) AS BIGINT) AS t
          FROM acc e1
          JOIN acc e2 ON e2.doc_a = e1.doc_b
          JOIN acc e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
        ),
        wd AS (SELECT CAST(coalesce(sum((dg * (dg - 1)) // 2), 0)
                           AS BIGINT) AS w FROM deg)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM acc) AS m_edges,
               wd.w AS wedges,
               tri.t AS triangles,
               CAST(wd.w - 3 * tri.t AS BIGINT) AS open_triads
        FROM wd, tri
    """

    # clustering_coeff_hist: per-node band over degrees and the
    # capped triangle counts.
    sql["clustering_coeff_hist"] = f"""
        WITH pr AS MATERIALIZED (
          SELECT doc_a, doc_b FROM ({sql["dedup_minhash_lsh"]})
        ),
        deg AS (
          SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
            SELECT doc_a AS v FROM pr UNION ALL SELECT doc_b FROM pr)
          GROUP BY 1
        ),
        tc AS (SELECT doc_id, n_triangles
               FROM ({sql["triangle_count"]})),
        j AS (SELECT deg.dg, CAST(coalesce(tc.n_triangles, 0) AS BIGINT)
                AS t
              FROM deg LEFT JOIN tc ON tc.doc_id = deg.v
              WHERE deg.dg >= 2),
        b AS (SELECT least(10 * t // ((dg * (dg - 1)) // 2), 10) AS band
              FROM j)
        SELECT CAST(band AS BIGINT) AS band,
               CAST(count(*) AS BIGINT) AS n_nodes
        FROM b GROUP BY 1 ORDER BY 1
    """

    # dedup_weighted_jaccard: w = N // df per kept shingle, hot
    # guard at 32 docs, threshold 1/4 on the weighted overlap.
    sql["dedup_weighted_jaccard"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        shf AS (
          SELECT doc_id, s,
                 CAST((SELECT n FROM nd) // cnt AS BIGINT) AS w
          FROM (SELECT doc_id, s,
                       count(*) OVER (PARTITION BY s) AS cnt FROM sh)
          WHERE cnt <= 32
        ),
        wd AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS W
               FROM shf GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(sum(a.w) AS BIGINT) AS inter_w
          FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, inter_w, wa.W AS w_a, wb.W AS w_b,
               CAST(inter_w * 10000 // (wa.W + wb.W - inter_w)
                    AS BIGINT) AS wj_bp
        FROM inter
        JOIN wd wa ON wa.doc_id = doc_a
        JOIN wd wb ON wb.doc_id = doc_b
        WHERE inter_w * 4 >= (wa.W + wb.W - inter_w)
    """

    # vocab_attribution: first-occurrence tokens per source.
    sql["vocab_attribution"] = f"""
        WITH {_WORDS_CTE},
        tok AS (SELECT doc_id, unnest(ws) AS token FROM w),
        firsts AS (SELECT token, min(doc_id) AS fd FROM tok GROUP BY 1),
        j AS (SELECT d.source FROM firsts f
              JOIN documents d ON d.doc_id = f.fd),
        sc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_first_tokens
               FROM j GROUP BY 1),
        dc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY 1)
        SELECT dc.source, dc.n_docs,
               CAST(coalesce(sc.n_first_tokens, 0) AS BIGINT)
                 AS n_first_tokens,
               CAST(coalesce(sc.n_first_tokens, 0) * 1000 // dc.n_docs
                    AS BIGINT) AS tokens_per_kdoc
        FROM dc LEFT JOIN sc USING (source) ORDER BY 1
    """

    # zipf_head_audit: top-32 head with banded Zipf ratios.
    sql["zipf_head_audit"] = f"""
        WITH {_WORDS_CTE},
        tok AS (SELECT unnest(ws) AS token FROM w),
        tf AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
               FROM tok GROUP BY 1),
        top AS (SELECT token, freq,
                       CAST(row_number() OVER (
                         ORDER BY freq DESC, token ASC) AS BIGINT)
                         AS rank
                FROM tf ORDER BY freq DESC, token ASC LIMIT 32),
        f1 AS (SELECT freq AS f FROM top WHERE rank = 1)
        SELECT rank, token, freq,
               CAST(freq * rank * 1000 // f1.f AS BIGINT)
                 AS zipf_ratio_milli
        FROM top, f1 ORDER BY rank
    """

    # l_moment_ratios: HUGEINT B-sums over the exact value ranks;
    # decimal-string output on both sides.
    sql["l_moment_ratios"] = """
        WITH o AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                     AS v
                   FROM orders),
        rk AS (SELECT v,
                      row_number() OVER (ORDER BY v) - 1 AS i0
               FROM o),
        s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS b0,
                     CAST(sum(CAST(i0 AS HUGEINT) * v) AS HUGEINT) AS b1,
                     CAST(sum(CAST(i0 AS HUGEINT) * (i0 - 1) * v)
                          AS HUGEINT) AS b2
              FROM rk)
        SELECT n, CAST(b0 AS VARCHAR) AS b0_sum,
               CAST(b1 AS VARCHAR) AS b1_sum,
               CAST(b2 AS VARCHAR) AS b2_sum
        FROM s
    """

    # sort_key_planner: exact run counts per candidate sort key via
    # 12 window-lag blocks over the shared projection.
    sql["sort_key_planner"] = """
        WITH o AS (SELECT o_orderkey AS okey, o_custkey AS ck,
                          epoch_us(o_orderdate) // 86400000000 AS day,
                          CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                            AS pcode,
                          CASE o_orderstatus WHEN 'F' THEN 0
                               WHEN 'O' THEN 1 ELSE 2 END AS status
                   FROM orders)
        SELECT 'ck' AS sort_key, 'pcode' AS col,
               CAST(1 + coalesce(sum(CASE WHEN pcode <> prev
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
        FROM (SELECT pcode,
                     lag(pcode) OVER (ORDER BY ck, okey) AS prev
              FROM o)
        WHERE prev IS NOT NULL
        UNION ALL
        SELECT 'ck' AS sort_key, 'status' AS col,
               CAST(1 + coalesce(sum(CASE WHEN status <> prev
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
        FROM (SELECT status,
                     lag(status) OVER (ORDER BY ck, okey) AS prev
              FROM o)
        WHERE prev IS NOT NULL
        UNION ALL
        SELECT 'ck' AS sort_key, 'ck' AS col,
               CAST(1 + coalesce(sum(CASE WHEN ck <> prev
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
        FROM (SELECT ck,
                     lag(ck) OVER (ORDER BY ck, okey) AS prev
              FROM o)
        WHERE prev IS NOT NULL
        UNION ALL
        SELECT 'ck' AS sort_key, 'day' AS col,
               CAST(1 + coalesce(sum(CASE WHEN day <> prev
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
        FROM (SELECT day,
                     lag(day) OVER (ORDER BY ck, okey) AS prev
              FROM o)
        WHERE prev IS NOT NULL
        UNION ALL
        SELECT 'day' AS sort_key, 'pcode' AS col,
               CAST(1 + coalesce(sum(CASE WHEN pcode <> prev
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
        FROM (SELECT pcode,
                     lag(pcode) OVER (ORDER BY day, okey) AS prev
              FROM o)
        WHERE prev IS NOT NULL
        UNION ALL
        SELECT 'day' AS sort_key, 'status' AS col,
               CAST(1 + coalesce(sum(CASE WHEN status <> prev
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
        FROM (SELECT status,
                     lag(status) OVER (ORDER BY day, okey) AS prev
              FROM o)
        WHERE prev IS NOT NULL
        UNION ALL
        SELECT 'day' AS sort_key, 'ck' AS col,
               CAST(1 + coalesce(sum(CASE WHEN ck <> prev
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
        FROM (SELECT ck,
                     lag(ck) OVER (ORDER BY day, okey) AS prev
              FROM o)
        WHERE prev IS NOT NULL
        UNION ALL
        SELECT 'day' AS sort_key, 'day' AS col,
               CAST(1 + coalesce(sum(CASE WHEN day <> prev
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
        FROM (SELECT day,
                     lag(day) OVER (ORDER BY day, okey) AS prev
              FROM o)
        WHERE prev IS NOT NULL
        UNION ALL
        SELECT 'pcode' AS sort_key, 'pcode' AS col,
               CAST(1 + coalesce(sum(CASE WHEN pcode <> prev
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
        FROM (SELECT pcode,
                     lag(pcode) OVER (ORDER BY pcode, okey) AS prev
              FROM o)
        WHERE prev IS NOT NULL
        UNION ALL
        SELECT 'pcode' AS sort_key, 'status' AS col,
               CAST(1 + coalesce(sum(CASE WHEN status <> prev
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
        FROM (SELECT status,
                     lag(status) OVER (ORDER BY pcode, okey) AS prev
              FROM o)
        WHERE prev IS NOT NULL
        UNION ALL
        SELECT 'pcode' AS sort_key, 'ck' AS col,
               CAST(1 + coalesce(sum(CASE WHEN ck <> prev
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
        FROM (SELECT ck,
                     lag(ck) OVER (ORDER BY pcode, okey) AS prev
              FROM o)
        WHERE prev IS NOT NULL
        UNION ALL
        SELECT 'pcode' AS sort_key, 'day' AS col,
               CAST(1 + coalesce(sum(CASE WHEN day <> prev
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_runs
        FROM (SELECT day,
                     lag(day) OVER (ORDER BY pcode, okey) AS prev
              FROM o)
        WHERE prev IS NOT NULL
        ORDER BY 1, 2
    """

    # xcorr_lag_profile: integer co-moment rows per lag over the two
    # bounded daily series; lags with < 2 overlapping days dropped.
    sql["xcorr_lag_profile"] = """
        WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, event_type
                   FROM events),
        xd AS (SELECT day, CAST(count(*) AS BIGINT) AS x FROM e
               WHERE event_type = 'error' GROUP BY 1),
        yd AS (SELECT day, CAST(count(*) AS BIGINT) AS y FROM e
               WHERE event_type = 'purchase' GROUP BY 1),
        lags AS (SELECT unnest(range(-14, 15)) AS lag),
        j AS (SELECT l.lag, xd.x, yd.y
              FROM lags l
              JOIN xd ON TRUE
              JOIN yd ON yd.day = xd.day + l.lag)
        SELECT CAST(lag AS BIGINT) AS lag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM j GROUP BY 1 HAVING count(*) >= 2 ORDER BY 1
    """

    # tukey_fences: type-1 quartiles per type; fences doubled to
    # stay integer.
    sql["tukey_fences"] = """
        WITH e AS (SELECT event_type,
                          CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
                   FROM events),
        rk AS (SELECT event_type, v,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY v) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM e),
        qs AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
                      max(CASE WHEN rn = (n + 3) // 4 THEN v END) AS q1,
                      max(CASE WHEN rn = (3 * n + 3) // 4 THEN v END)
                        AS q3
               FROM rk GROUP BY 1),
        o AS (SELECT e.event_type,
                     CAST(sum(CASE WHEN 2 * e.v < 2 * q1 - 3 * (q3 - q1)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_low_out,
                     CAST(sum(CASE WHEN 2 * e.v > 2 * q3 + 3 * (q3 - q1)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_high_out
              FROM e JOIN qs USING (event_type) GROUP BY 1)
        SELECT qs.event_type, qs.n,
               CAST(q1 AS BIGINT) AS q1_milli,
               CAST(q3 AS BIGINT) AS q3_milli,
               o.n_low_out, o.n_high_out
        FROM qs JOIN o USING (event_type) ORDER BY 1
    """

    # theil_sen_slope: lower-median pairwise slope over the trailing
    # 64 days; rank-by-count with exact cross-multiplied comparison
    # and the (value, dx, dd) tie-break; duplicate triples share a
    # rank range, hence the r <= target < r + cnt selection.
    sql["theil_sen_slope"] = """
        WITH dc AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                           CAST(count(*) AS BIGINT) AS x
                    FROM orders GROUP BY 1),
        t AS (SELECT day, x,
                     row_number() OVER (ORDER BY day DESC) AS rd
              FROM dc),
        w AS (SELECT day, x FROM t WHERE rd <= 64),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM w),
        p AS (SELECT b.x - a.x AS dx, b.day - a.day AS dd
              FROM w a JOIN w b ON b.day > a.day),
        st AS (SELECT CAST(count(*) AS BIGINT) AS np FROM p),
        rk AS (SELECT p.dx, p.dd,
                      (SELECT CAST(count(*) AS BIGINT) FROM p q
                       WHERE q.dx * p.dd < p.dx * q.dd
                          OR (q.dx * p.dd = p.dx * q.dd
                              AND (q.dx < p.dx
                                   OR (q.dx = p.dx AND q.dd < p.dd))))
                        AS r,
                      (SELECT CAST(count(*) AS BIGINT) FROM p q
                       WHERE q.dx = p.dx AND q.dd = p.dd) AS cnt
               FROM p),
        sel AS (SELECT DISTINCT dx, dd FROM rk, st
                WHERE r <= (np - 1) // 2 AND (np - 1) // 2 < r + cnt)
        SELECT nn.n_days, st.np AS n_pairs,
               CAST(sel.dx AS BIGINT) AS slope_num,
               CAST(sel.dd AS BIGINT) AS slope_den,
               CAST(CASE WHEN sel.dx >= 0
                    THEN 1000 * sel.dx // sel.dd
                    ELSE -((-1000 * sel.dx + sel.dd - 1) // sel.dd)
                    END AS BIGINT) AS slope_milli
        FROM sel, nn, st
    """

    # revenue_bridge: per-nation H1/H2 cents with exact bp shares.
    sql["revenue_bridge"] = """
        WITH o AS (SELECT o_custkey,
                          epoch_us(o_orderdate) // 86400000000 AS day,
                          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                            AS v
                   FROM orders),
        lim AS (SELECT min(day) AS dlo, max(day) AS dhi FROM o),
        g AS (SELECT c_nationkey AS nation,
                     CAST(day > (dlo + dhi) // 2 AS BIGINT) AS half,
                     CAST(sum(v) AS BIGINT) AS cents
              FROM o CROSS JOIN lim
              JOIN customer ON c_custkey = o_custkey
              GROUP BY 1, 2),
        p AS (SELECT nation,
                     CAST(coalesce(sum(CASE WHEN half = 0 THEN cents
                          END), 0) AS BIGINT) AS r1,
                     CAST(coalesce(sum(CASE WHEN half = 1 THEN cents
                          END), 0) AS BIGINT) AS r2
              FROM g GROUP BY 1),
        t AS (SELECT CAST(sum(r1) AS BIGINT) AS t1,
                     CAST(sum(r2) AS BIGINT) AS t2 FROM p)
        SELECT CAST(nation AS BIGINT) AS nation, r1 AS r1_cents,
               r2 AS r2_cents, CAST(r2 - r1 AS BIGINT) AS delta_cents,
               CAST(r1 * 10000 // t1 AS BIGINT) AS share1_bp,
               CAST(r2 * 10000 // t2 AS BIGINT) AS share2_bp,
               CAST(r2 * 10000 // t2 - r1 * 10000 // t1 AS BIGINT)
                 AS share_delta_bp
        FROM p, t ORDER BY 1
    """

    # sequence_gap_audit: per-order 1..k completeness counters.
    sql["sequence_gap_audit"] = """
        WITH g AS (SELECT l_orderkey,
                          CAST(count(*) AS BIGINT) AS n_lines,
                          CAST(count(DISTINCT l_linenumber) AS BIGINT)
                            AS n_dist,
                          CAST(min(l_linenumber) AS BIGINT) AS mn,
                          CAST(max(l_linenumber) AS BIGINT) AS mx
                   FROM lineitem GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN n_dist = n_lines AND mn = 1
                    AND mx = n_lines THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_ok,
               CAST(sum(CASE WHEN mn <> 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bad_start,
               CAST(sum(CASE WHEN n_dist = n_lines AND mx <> n_dist
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_gapped,
               CAST(sum(CASE WHEN n_dist <> n_lines THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_duped,
               CAST(max(mx) AS BIGINT) AS max_linenumber
        FROM g
    """

    # matryoshka_recall: exact top-10 overlap, full vs 16-dim prefix,
    # on the e6-quantized grid with the (d2, id) tie-break.
    sql["matryoshka_recall"] = """
        WITH qv AS (
          SELECT vec_id, dim,
                 CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 1000000
                      + 0.5) AS BIGINT) AS q
          FROM embeddings, UNNEST(range(0, 64)) t(dim)
        ),
        qs AS (SELECT * FROM qv WHERE vec_id < 16),
        dfull AS (
          SELECT a.vec_id AS qid, b.vec_id AS nid,
                 sum((a.q - b.q) * (a.q - b.q)) AS d2
          FROM qs a JOIN qv b USING (dim)
          WHERE b.vec_id <> a.vec_id GROUP BY 1, 2
        ),
        dpre AS (
          SELECT a.vec_id AS qid, b.vec_id AS nid,
                 sum((a.q - b.q) * (a.q - b.q)) AS d2
          FROM qs a JOIN qv b USING (dim)
          WHERE b.vec_id <> a.vec_id AND a.dim < 16 GROUP BY 1, 2
        ),
        tf AS (SELECT qid, nid FROM (
                 SELECT qid, nid, row_number() OVER (
                   PARTITION BY qid ORDER BY d2, nid) AS rn
                 FROM dfull) WHERE rn <= 10),
        tp AS (SELECT qid, nid FROM (
                 SELECT qid, nid, row_number() OVER (
                   PARTITION BY qid ORDER BY d2, nid) AS rn
                 FROM dpre) WHERE rn <= 10),
        ov AS (SELECT tf.qid, CAST(count(*) AS BIGINT) AS n_overlap
               FROM tf JOIN tp ON tp.qid = tf.qid AND tp.nid = tf.nid
               GROUP BY 1)
        SELECT q.qid AS query_id,
               CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap
        FROM (SELECT DISTINCT qid FROM tf) q
        LEFT JOIN ov USING (qid) ORDER BY 1
    """

    # dup_cluster_persistence: component era classes over the
    # recursive-CTE component assignment.
    sql["dup_cluster_persistence"] = f"""
        WITH comp AS ({sql["dedup_components"].replace(
            "WITH w AS", "WITH RECURSIVE w AS", 1)}),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        lab AS (SELECT component_id,
                       CAST(doc_id >= (SELECT n // 2 FROM nd) AS BIGINT)
                         AS h
                FROM comp),
        per AS (SELECT component_id,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       max(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS has1,
                       max(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS has2
                FROM lab GROUP BY 1 HAVING count(*) >= 2),
        cls AS (SELECT CASE WHEN has1 = 1 AND has2 = 1 THEN 'both'
                            WHEN has1 = 1 THEN 'h1_only'
                            ELSE 'h2_only' END AS era,
                       n_docs
                FROM per)
        SELECT era, CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(sum(n_docs) AS BIGINT) AS n_docs
        FROM cls GROUP BY 1 ORDER BY 1
    """

    # kendall_matrix_daily: tau-b sufficient statistics per type
    # pair over aligned days; quadratic day-pair join per pair is
    # honest at oracle scale.
    sql["kendall_matrix_daily"] = """
        WITH dc AS (SELECT event_type,
                           epoch_us(ts) // 86400000000 AS day,
                           CAST(count(*) AS BIGINT) AS x
                    FROM events GROUP BY 1, 2),
        pr AS (SELECT a.event_type AS ta, b.event_type AS tb,
                      a.day, a.x AS xa, b.x AS xb
               FROM dc a JOIN dc b
                 ON b.day = a.day AND a.event_type < b.event_type),
        st AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_days
               FROM pr GROUP BY 1, 2),
        dd AS (SELECT p1.ta, p1.tb,
                      CAST(sum(CASE WHEN (p2.xa - p1.xa)
                           * (p2.xb - p1.xb) < 0 THEN 1 ELSE 0 END)
                           AS BIGINT) AS disc,
                      CAST(sum(CASE WHEN p1.xa = p2.xa THEN 1 ELSE 0
                           END) AS BIGINT) AS n1,
                      CAST(sum(CASE WHEN p1.xb = p2.xb THEN 1 ELSE 0
                           END) AS BIGINT) AS n2,
                      CAST(sum(CASE WHEN p1.xa = p2.xa
                           AND p1.xb = p2.xb THEN 1 ELSE 0 END)
                           AS BIGINT) AS n3
               FROM pr p1 JOIN pr p2
                 ON p2.ta = p1.ta AND p2.tb = p1.tb
                AND p2.day > p1.day
               GROUP BY 1, 2)
        SELECT st.ta AS type_a, st.tb AS type_b, st.n_days,
               CAST(coalesce(dd.n1, 0) AS BIGINT) AS n1,
               CAST(coalesce(dd.n2, 0) AS BIGINT) AS n2,
               CAST(coalesce(dd.n3, 0) AS BIGINT) AS n3,
               CAST(coalesce(dd.disc, 0) AS BIGINT) AS disc
        FROM st LEFT JOIN dd USING (ta, tb) ORDER BY 1, 2
    """

    # rep_quality_audit: min-id representative vs cluster-max
    # quality over the recursive components and the quality CTE.
    sql["rep_quality_audit"] = f"""
        WITH comp AS ({sql["dedup_components"].replace(
            "WITH w AS", "WITH RECURSIVE w AS", 1)}),
        q AS ({sql["quality_score"]}),
        j AS (SELECT comp.component_id, comp.doc_id,
                     q.quality_score AS qs
              FROM comp JOIN q ON q.doc_id = comp.doc_id),
        per AS (SELECT component_id,
                       CAST(max(qs) AS BIGINT) AS best_q,
                       CAST(min(doc_id) AS BIGINT) AS rep
                FROM j GROUP BY 1 HAVING count(*) >= 2),
        rq AS (SELECT per.component_id, per.best_q, j.qs AS rep_q
               FROM per JOIN j ON j.component_id = per.component_id
                             AND j.doc_id = per.rep)
        SELECT CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(coalesce(sum(CASE WHEN rep_q < best_q THEN 1
                    ELSE 0 END), 0) AS BIGINT) AS n_rep_not_best,
               CAST(coalesce(sum(best_q - rep_q), 0) AS BIGINT)
                 AS regret_sum
        FROM rq
    """

    # k_anon_ladder: width-doubling generalization of the balance
    # bucket; levels re-aggregate the finest QI grid exactly.
    sql["k_anon_ladder"] = """
        WITH qi AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
                           (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                            + 10000000) // 100000 AS b
                    FROM customer),
        lv AS (SELECT unnest(range(0, 7)) AS level),
        cls AS (SELECT lv.level, nk, seg, b >> lv.level AS bl,
                       CAST(count(*) AS BIGINT) AS n
                FROM qi CROSS JOIN lv GROUP BY 1, 2, 3, 4)
        SELECT CAST(level AS BIGINT) AS level,
               CAST(1000 * (1 << level) AS BIGINT) AS width_dollars,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(min(n) AS BIGINT) AS min_class,
               CAST(coalesce(sum(CASE WHEN n < 5 THEN n END), 0)
                    AS BIGINT) AS n_rows_under_5
        FROM cls GROUP BY level ORDER BY 1
    """

    # lang_homophily: Newman Q for the lang partition of the
    # candidate graph, the +4m^2 shift discipline.
    sql["lang_homophily"] = f"""
        WITH pr AS MATERIALIZED (
          SELECT doc_a, doc_b FROM ({sql["dedup_minhash_lsh"]})
        ),
        mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pr),
        lab AS (SELECT doc_id, lang FROM documents),
        pl AS (SELECT la.lang AS lga, lb.lang AS lgb
               FROM pr JOIN lab la ON la.doc_id = pr.doc_a
                       JOIN lab lb ON lb.doc_id = pr.doc_b),
        intra AS (SELECT lga AS lang, CAST(count(*) AS BIGINT) AS e
                  FROM pl WHERE lga = lgb GROUP BY 1),
        ep AS (SELECT doc_a AS v FROM pr
               UNION ALL SELECT doc_b FROM pr),
        deg AS (SELECT lab.lang, CAST(count(*) AS BIGINT) AS d
                FROM ep JOIN lab ON lab.doc_id = ep.v GROUP BY 1),
        nn AS (SELECT lab.lang, CAST(count(*) AS BIGINT) AS n_nodes
               FROM (SELECT DISTINCT v FROM ep) nd
               JOIN lab ON lab.doc_id = nd.v GROUP BY 1),
        q AS (SELECT CAST(((sum(4 * mm.m * coalesce(i.e, 0)
                                - d.d * d.d) + 4 * mm.m * mm.m)
                           * 1000000) // (4 * mm.m * mm.m) - 1000000
                          AS BIGINT) AS qv
              FROM deg d LEFT JOIN intra i ON i.lang = d.lang, mm
              GROUP BY mm.m)
        SELECT nn.lang, nn.n_nodes,
               CAST(coalesce(intra.e, 0) AS BIGINT) AS intra_edges,
               deg.d AS degree_sum, q.qv AS q_x1e6
        FROM nn JOIN deg USING (lang)
        LEFT JOIN intra USING (lang), q
        ORDER BY 1
    """

    # blocking_union_eval: capture vs the exact ppjoin truth.
    sql["blocking_union_eval"] = f"""
        WITH tr AS MATERIALIZED (
          SELECT doc_a, doc_b FROM ({sql["ppjoin_exact"]})
        ),
        sn AS MATERIALIZED (
          SELECT DISTINCT least(doc_a, doc_b) AS doc_a,
                 greatest(doc_a, doc_b) AS doc_b
          FROM ({sql["snm_pairs"]})
        ),
        ls AS MATERIALIZED (
          SELECT doc_a, doc_b FROM ({sql["dedup_minhash_lsh"]})
        ),
        un AS (SELECT doc_a, doc_b FROM sn
               UNION SELECT doc_a, doc_b FROM ls)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_truth,
               (SELECT CAST(count(*) AS BIGINT) FROM sn) AS n_snm,
               (SELECT CAST(count(*) AS BIGINT) FROM ls) AS n_lsh,
               (SELECT CAST(count(*) AS BIGINT) FROM un) AS n_union,
               (SELECT CAST(count(*) AS BIGINT) FROM tr
                JOIN sn USING (doc_a, doc_b)) AS cap_snm,
               (SELECT CAST(count(*) AS BIGINT) FROM tr
                JOIN ls USING (doc_a, doc_b)) AS cap_lsh,
               (SELECT CAST(count(*) AS BIGINT) FROM tr
                JOIN un USING (doc_a, doc_b)) AS cap_union
    """

    # hll_union_error: per-half registers, elementwise-max merge,
    # exact-rational raw estimates (hll_error_eval's convention).
    sql["hll_union_error"] = """
        WITH e AS (SELECT user_id,
                          epoch_us(ts) // 86400000000 AS day
                   FROM events),
        lim AS (SELECT min(day) AS dlo, max(day) AS dhi FROM e),
        lab AS (SELECT DISTINCT user_id,
                       CAST(day > (dlo + dhi) // 2 AS BIGINT) AS half
                FROM e CROSS JOIN lim),
        h AS (SELECT half,
                     CAST(CAST('0x' || substr(md5(CAST(user_id
                          AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT)
                       AS h
              FROM lab),
        r AS (SELECT half, h // 4503599627370496 AS bucket,
                     h % 4503599627370496 AS suffix
              FROM h),
        reg AS (SELECT half, bucket,
                       CAST(max(CASE WHEN suffix = 0 THEN 53
                            ELSE 52 - len(bin(CAST(suffix AS UBIGINT)))
                                 + 1 END) AS BIGINT) AS rho
                FROM r GROUP BY 1, 2),
        allb AS (SELECT unnest(range(0, 256)) AS bucket),
        mrg AS (SELECT allb.bucket,
                       CAST(coalesce(a.rho, 0) AS BIGINT) AS r1,
                       CAST(coalesce(b.rho, 0) AS BIGINT) AS r2,
                       CAST(greatest(coalesce(a.rho, 0),
                                     coalesce(b.rho, 0)) AS BIGINT)
                         AS ru
                FROM allb
                LEFT JOIN reg a ON a.bucket = allb.bucket AND a.half = 0
                LEFT JOIN reg b ON b.bucket = allb.bucket
                              AND b.half = 1),
        ss AS (SELECT CAST(sum(CAST(1 AS HUGEINT) << (53 - r1))
                           AS HUGEINT) AS s1,
                      CAST(sum(CAST(1 AS HUGEINT) << (53 - r2))
                           AS HUGEINT) AS s2,
                      CAST(sum(CAST(1 AS HUGEINT) << (53 - ru))
                           AS HUGEINT) AS su
               FROM mrg),
        cnts AS (SELECT
                   CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_h1,
                   CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_h2,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_union
                 FROM lab)
        SELECT CAST(256 AS BIGINT) AS m, cnts.n_h1, cnts.n_h2,
               cnts.n_union,
               CAST(CAST(7213 AS HUGEINT) * 16777216
                    * 9007199254740992 * 1000 // (2570790 * ss.s1)
                    AS BIGINT) AS est_h1_x1000,
               CAST(CAST(7213 AS HUGEINT) * 16777216
                    * 9007199254740992 * 1000 // (2570790 * ss.s2)
                    AS BIGINT) AS est_h2_x1000,
               CAST(CAST(7213 AS HUGEINT) * 16777216
                    * 9007199254740992 * 1000 // (2570790 * ss.su)
                    AS BIGINT) AS est_union_x1000,
               CAST(CAST(7213 AS HUGEINT) * 16777216
                    * 9007199254740992 * 1000 // (2570790 * ss.su)
                    - 1000 * cnts.n_union AS BIGINT)
                 AS union_err_x1000
        FROM ss, cnts
    """

    # minhash_threshold_curve: precision/recall per shared-band
    # threshold vs the ppjoin truth.
    sql["minhash_threshold_curve"] = f"""
        WITH ls AS MATERIALIZED (
          SELECT doc_a, doc_b, n_shared_bands
          FROM ({sql["dedup_minhash_lsh"]})
        ),
        tr AS MATERIALIZED (
          SELECT doc_a, doc_b FROM ({sql["ppjoin_exact"]})
        ),
        t AS (SELECT unnest([1, 2, 3, 4]) AS min_bands),
        c AS (SELECT t.min_bands,
                     (SELECT CAST(count(*) AS BIGINT) FROM ls
                      WHERE n_shared_bands >= t.min_bands) AS n_cand,
                     (SELECT CAST(count(*) AS BIGINT) FROM ls
                      JOIN tr USING (doc_a, doc_b)
                      WHERE n_shared_bands >= t.min_bands)
                       AS n_captured,
                     (SELECT CAST(count(*) AS BIGINT) FROM tr) AS nt
              FROM t)
        SELECT CAST(min_bands AS BIGINT) AS min_bands, n_cand,
               n_captured,
               CAST(CASE WHEN n_cand = 0 THEN 0
                    ELSE n_captured * 10000 // n_cand END AS BIGINT)
                 AS precision_bp,
               CAST(CASE WHEN nt = 0 THEN 10000
                    ELSE n_captured * 10000 // nt END AS BIGINT)
                 AS recall_bp
        FROM c ORDER BY 1
    """

    # recycled_content_rate: H2 docs contained (>= 8000 bp, smaller
    # side) in an H1 doc.
    sql["recycled_content_rate"] = f"""
        WITH cp AS MATERIALIZED (
          SELECT * FROM ({sql["containment_pairs"]})
        ),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        rec AS (
          SELECT doc_b AS doc FROM cp, nd
          WHERE contain_bp >= 8000 AND doc_b >= nd.n // 2
            AND doc_a < nd.n // 2 AND size_b <= size_a
          UNION
          SELECT doc_a FROM cp, nd
          WHERE contain_bp >= 8000 AND doc_a >= nd.n // 2
            AND doc_b < nd.n // 2 AND size_a <= size_b
        )
        SELECT CAST(nd.n - nd.n // 2 AS BIGINT) AS n_h2_docs,
               (SELECT CAST(count(*) AS BIGINT) FROM rec)
                 AS n_recycled,
               CAST((SELECT count(*) FROM rec) * 10000
                    // (nd.n - nd.n // 2) AS BIGINT) AS recycled_bp
        FROM nd
    """

    # head_churn: top-32 heads per half under (count desc, token).
    sql["head_churn"] = f"""
        WITH {_WORDS_CTE},
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        tok AS (SELECT doc_id, unnest(ws) AS token FROM w),
        lab AS (SELECT token,
                       CAST(doc_id >= (SELECT n // 2 FROM nd) AS BIGINT)
                         AS h
                FROM tok),
        tf AS (SELECT token, h, CAST(count(*) AS BIGINT) AS n
               FROM lab GROUP BY 1, 2),
        t1 AS (SELECT token,
                      row_number() OVER (ORDER BY n DESC, token) - 1
                        AS r
               FROM tf WHERE h = 0 ORDER BY n DESC, token LIMIT 32),
        t2 AS (SELECT token,
                      row_number() OVER (ORDER BY n DESC, token) - 1
                        AS r
               FROM tf WHERE h = 1 ORDER BY n DESC, token LIMIT 32),
        c AS (SELECT t1.token, abs(t1.r - t2.r) AS shift
              FROM t1 JOIN t2 USING (token))
        SELECT CAST(32 AS BIGINT) AS k,
               CAST((SELECT count(*) FROM c) AS BIGINT) AS n_common,
               CAST((SELECT coalesce(sum(shift), 0) FROM c) AS BIGINT)
                 AS rank_shift_sum,
               CAST(32 - (SELECT count(*) FROM c) AS BIGINT)
                 AS new_in_h2
    """

    # cmh_test: per-stratum exact 2x2 sufficient rows.
    sql["cmh_test"] = """
        WITH buyers AS (SELECT DISTINCT o_custkey FROM orders),
        c AS (SELECT c_mktsegment AS stratum,
                     CAST(c_acctbal >= 0 AS BIGINT) AS ex,
                     CAST(c_custkey IN (SELECT o_custkey FROM buyers)
                          AS BIGINT) AS oc
              FROM customer)
        SELECT stratum, CAST(sum(ex * oc) AS BIGINT) AS a,
               CAST(sum(ex) AS BIGINT) AS r1,
               CAST(sum(oc) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n
        FROM c GROUP BY 1 ORDER BY 1
    """

    # hash_collision_audit: truncated-md5 bucket census per width.
    sql["hash_collision_audit"] = """
        WITH d AS (SELECT md5(text) AS h FROM documents),
        w AS (SELECT * FROM (VALUES (16, 4), (24, 6), (32, 8))
              AS t(bits, chars)),
        b AS (SELECT bits, substr(h, 1, chars) AS bucket,
                     CAST(count(*) AS BIGINT) AS c
              FROM d CROSS JOIN w GROUP BY 1, 2)
        SELECT CAST(bits AS BIGINT) AS width_bits,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_colliding_buckets,
               CAST(sum(c * (c - 1) // 2) AS BIGINT)
                 AS n_colliding_pairs,
               CAST(max(c) AS BIGINT) AS max_bucket
        FROM b GROUP BY 1 ORDER BY 1
    """

    # hodges_lehmann: exact middle order statistics of the per-segment
    # Walsh-sum multiset (x_i + x_j, i <= j) over balance cents.
    sql["hodges_lehmann"] = """
        WITH c AS (SELECT c_mktsegment AS seg,
                          CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                            AS v,
                          row_number() OVER (ORDER BY c_custkey) AS rid
                   FROM customer),
        p AS (SELECT a.seg, a.v + b.v AS ws
              FROM c a JOIN c b ON a.seg = b.seg AND a.rid <= b.rid),
        r AS (SELECT seg, ws,
                     row_number() OVER (PARTITION BY seg ORDER BY ws)
                       AS rk,
                     count(*) OVER (PARTITION BY seg) AS m
              FROM p),
        nn AS (SELECT seg, CAST(count(*) AS BIGINT) AS n
               FROM c GROUP BY 1)
        SELECT r.seg AS segment, max(nn.n) AS n,
               CAST(max(CASE WHEN rk = (m + 1) // 2 THEN ws END)
                 AS BIGINT) AS walsh_lo,
               CAST(max(CASE WHEN rk = m // 2 + 1 THEN ws END)
                 AS BIGINT) AS walsh_hi
        FROM r JOIN nn ON r.seg = nn.seg
        GROUP BY 1 ORDER BY 1
    """

    # k_core_peel: fixed-round peel replay, unrolled per (k, round)
    # with the same simultaneous-removal semantics as the Ray plan.
    _kc_ctes = [
        f"mk AS MATERIALIZED (SELECT vec_a, vec_b FROM ({sql['mutual_knn']}))",
        "g0 AS MATERIALIZED (SELECT vec_a AS v, vec_b AS u FROM mk"
        " UNION ALL SELECT vec_b, vec_a FROM mk)",
    ]
    _kc_selects = []
    for _k in (2, 3):
        _prev = "g0"
        for _r in range(1, 7):
            _s, _g = f"s_{_k}_{_r}", f"g_{_k}_{_r}"
            _kc_ctes.append(
                f"{_s} AS MATERIALIZED (SELECT v FROM {_prev}"
                f" GROUP BY v HAVING count(*) >= {_k})"
            )
            _kc_selects.append(
                f"SELECT CAST({_k} AS BIGINT) AS k,"
                f" CAST({_r} AS BIGINT) AS round,"
                f" CAST((SELECT count(DISTINCT v) FROM {_prev}) AS BIGINT)"
                f" AS n_nodes,"
                f" CAST((SELECT count(*) FROM {_s}) AS BIGINT)"
                f" AS n_survivors"
            )
            _kc_ctes.append(
                f"{_g} AS MATERIALIZED (SELECT g.v, g.u FROM {_prev} g"
                f" JOIN {_s} a ON g.v = a.v JOIN {_s} b ON g.u = b.v)"
            )
            _prev = _g
    sql["k_core_peel"] = (
        "WITH "
        + ",\n".join(_kc_ctes)
        + "\nSELECT * FROM ("
        + " UNION ALL ".join(_kc_selects)
        + ") ORDER BY k, round"
    )

    # roaring_container_audit: per-2^16-chunk container plan over the
    # distinct order-key set (array 2n / bitmap 8192 / run 2+4r).
    sql["roaring_container_audit"] = """
        WITH d AS (SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS v
                   FROM orders),
        c AS (SELECT v, v // 65536 AS chunk FROM d),
        r AS (SELECT chunk, v,
                     CASE WHEN v - lag(v) OVER (PARTITION BY chunk
                                                ORDER BY v) = 1
                          THEN 0 ELSE 1 END AS newrun
              FROM c),
        s AS (SELECT chunk, CAST(count(*) AS BIGINT) AS n_values,
                     CAST(sum(newrun) AS BIGINT) AS n_runs
              FROM r GROUP BY 1)
        SELECT CAST(chunk AS BIGINT) AS chunk, n_values, n_runs,
               CASE WHEN 2 + 4 * n_runs <
                         CASE WHEN n_values <= 4096 THEN 2 * n_values
                              ELSE 8192 END THEN 'run'
                    WHEN n_values <= 4096 THEN 'array'
                    ELSE 'bitmap' END AS container,
               CAST(CASE WHEN 2 + 4 * n_runs <
                              CASE WHEN n_values <= 4096
                                   THEN 2 * n_values ELSE 8192 END
                         THEN 2 + 4 * n_runs
                         WHEN n_values <= 4096 THEN 2 * n_values
                         ELSE 8192 END AS BIGINT) AS est_bytes
        FROM s ORDER BY chunk
    """

    # mcnemar_test: paired 2x2 cells of the two quality gates.
    sql["mcnemar_test"] = f"""
        WITH q AS ({sql["quality_score"]}),
        g AS (SELECT CAST(ws_tokens >= 20 AS BIGINT) AS a,
                     CAST(10 * hits_en >= ws_tokens AS BIGINT) AS b
              FROM q)
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a * b) AS BIGINT) AS both_pass,
               CAST(sum(a * (1 - b)) AS BIGINT) AS a_only,
               CAST(sum((1 - a) * b) AS BIGINT) AS b_only,
               CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS neither,
               CAST((sum(a * (1 - b)) - sum((1 - a) * b))
                    * (sum(a * (1 - b)) - sum((1 - a) * b)) AS BIGINT)
                 AS stat_num,
               CAST(sum(a * (1 - b)) + sum((1 - a) * b) AS BIGINT)
                 AS stat_den
        FROM g
    """

    # ta_topk_depth_audit: exact TA state at audited depths.
    sql["ta_topk_depth_audit"] = """
        WITH p AS (SELECT CAST(p_partkey AS BIGINT) AS id,
                          CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                            AS s1,
                          CAST(p_size AS BIGINT) * 1000 AS s2
                   FROM part),
        r AS (SELECT id, s1, s2, s1 + s2 AS total,
                     row_number() OVER (ORDER BY s1 DESC, id) AS r1,
                     row_number() OVER (ORDER BY s2 DESC, id) AS r2
              FROM p),
        g AS (SELECT d FROM (VALUES (1), (2), (4), (8), (16), (32),
                                    (64), (128), (256)) AS t(d)
              WHERE d <= (SELECT count(*) FROM p)),
        thr AS (SELECT g.d,
                       (SELECT s1 FROM r WHERE r1 = g.d)
                       + (SELECT s2 FROM r WHERE r2 = g.d) AS threshold
                FROM g),
        seen AS (SELECT g.d, r.total
                 FROM g JOIN r ON r.r1 <= g.d OR r.r2 <= g.d),
        kb AS (SELECT d, CAST(count(*) AS BIGINT) AS n_seen,
                      max(CASE WHEN rk = 8 THEN total END) AS kth
               FROM (SELECT d, total,
                            row_number() OVER (PARTITION BY d
                                               ORDER BY total DESC) AS rk
                     FROM seen)
               GROUP BY d)
        SELECT CAST(kb.d AS BIGINT) AS depth, kb.n_seen,
               CAST(thr.threshold AS BIGINT) AS threshold,
               CAST(coalesce(kb.kth, -1) AS BIGINT) AS kth_best,
               CAST(coalesce(kb.kth, -1) >= thr.threshold AS BIGINT)
                 AS stopped
        FROM kb JOIN thr ON kb.d = thr.d
        ORDER BY 1
    """

    # haar_synopsis: unrolled integer Haar levels; energy ranking in
    # HUGEINT (exact, mirrors Python arbitrary-precision ints).
    _hs_ctes = [
        "dd AS (SELECT CAST(date_diff('day', DATE '1992-01-01',"
        " CAST(l_shipdate AS DATE)) AS BIGINT)"
        " AS day, CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
        " AS cents FROM lineitem)",
        "ds AS (SELECT day, CAST(sum(cents) AS BIGINT) AS s FROM dd"
        " GROUP BY 1)",
        "lv0 AS MATERIALIZED (SELECT t.i AS pos, coalesce(ds.s, 0) AS s"
        " FROM range(4096) t(i) LEFT JOIN ds ON ds.day = t.i)",
    ]
    _hs_dets = []
    for _l in range(1, 13):
        _hs_ctes.append(
            f"lv{_l} AS MATERIALIZED (SELECT pos // 2 AS pos,"
            f" CAST(sum(s) AS BIGINT) AS s,"
            f" CAST(sum(CASE WHEN pos % 2 = 0 THEN s ELSE -s END)"
            f" AS BIGINT) AS d FROM lv{_l - 1} GROUP BY 1)"
        )
        _hs_dets.append(
            f"SELECT CAST({_l} AS BIGINT) AS level, CAST(pos AS BIGINT)"
            f" AS pos, d AS coef,"
            f" CAST(d AS HUGEINT) * CAST(d AS HUGEINT)"
            f" * CAST({1 << (12 - _l)} AS HUGEINT) AS energy FROM lv{_l}"
        )
    sql["haar_synopsis"] = (
        "WITH "
        + ",\n".join(_hs_ctes)
        + ",\ndt AS ("
        + " UNION ALL ".join(_hs_dets)
        + ")\nSELECT CAST(row_number() OVER (ORDER BY energy DESC,"
        " level, pos) AS BIGINT) AS rnk, level, pos, coef FROM dt"
        " ORDER BY energy DESC, level, pos LIMIT 16"
    )

    # histogram_selectivity_audit: 16-bucket equi-depth estimate vs
    # true count, exact floor arithmetic on half-open cent ranges.
    sql["histogram_selectivity_audit"] = """
        WITH vv AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
                               AS BIGINT) AS v FROM lineitem),
        h AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM vv
              GROUP BY 1),
        o AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT)
                     AS cum
              FROM h),
        nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        bk AS (SELECT t.b,
                      CAST(t.b * nn.n // 16 AS BIGINT) AS lo_rank,
                      CAST((t.b + 1) * nn.n // 16 AS BIGINT) AS hi_rank
               FROM range(16) t(b), nn),
        bounds AS (SELECT bk.b, bk.hi_rank - bk.lo_rank AS nb,
                          (SELECT min(v) FROM o
                           WHERE cum >= bk.lo_rank + 1) AS minb,
                          (SELECT min(v) FROM o
                           WHERE cum >= bk.hi_rank) AS maxb
                   FROM bk WHERE bk.hi_rank > bk.lo_rank),
        preds AS (SELECT * FROM (VALUES
                    (1, 100000, 200000),
                    (2, 1000000, 2000000),
                    (3, 2000000, 4000000),
                    (4, 5000000, 10000000),
                    (5, 0, 1500000),
                    (6, 9000000, 99999999)) p(pid, lo, hi)),
        est AS (SELECT p.pid, p.lo, p.hi,
                       CAST(sum(CASE WHEN least(p.hi, maxb + 1)
                                          - greatest(p.lo, minb) > 0
                                     THEN nb * (least(p.hi, maxb + 1)
                                          - greatest(p.lo, minb))
                                          // (maxb + 1 - minb)
                                     ELSE 0 END) AS BIGINT) AS est_rows
                FROM preds p CROSS JOIN bounds
                GROUP BY 1, 2, 3),
        tr AS (SELECT p.pid,
                      CAST(coalesce(sum(h.c), 0) AS BIGINT) AS true_rows
               FROM preds p LEFT JOIN h
                 ON h.v >= p.lo AND h.v < p.hi
               GROUP BY 1)
        SELECT CAST(est.pid AS BIGINT) AS pred_id,
               CAST(est.lo AS BIGINT) AS lo,
               CAST(est.hi AS BIGINT) AS hi,
               est.est_rows, tr.true_rows,
               CAST(abs(est.est_rows - tr.true_rows) AS BIGINT)
                 AS abs_err
        FROM est JOIN tr ON est.pid = tr.pid
        ORDER BY 1
    """

    # count_sketch_error: signed-median estimator, md5-mirrored.
    sql["count_sketch_error"] = """
        WITH uc AS (SELECT CAST(user_id AS BIGINT) AS u,
                           CAST(count(*) AS BIGINT) AS n
                    FROM events GROUP BY 1),
        hx AS (SELECT u, n, md5(CAST(u AS VARCHAR)) AS h FROM uc),
        hh AS (SELECT u, n,
                      CAST('0x' || substr(h, 1, 15) AS BIGINT) AS h1,
                      CAST('0x' || substr(h, 16, 15) AS BIGINT) AS h2,
                      h
               FROM hx),
        rows_d AS (SELECT d FROM (VALUES (0), (1), (2)) t(d)),
        cells AS (SELECT hh.u, hh.n, rows_d.d,
                         (hh.h1 + rows_d.d * hh.h2) % 256 AS cell,
                         CASE WHEN CAST('0x' ||
                                substr(hh.h, 30 + rows_d.d, 1) AS BIGINT)
                                % 2 = 0
                              THEN 1 ELSE -1 END AS sgn
                  FROM hh CROSS JOIN rows_d),
        reg AS (SELECT d, cell, CAST(sum(sgn * n) AS BIGINT) AS val
                FROM cells GROUP BY 1, 2),
        top AS (SELECT u, n FROM uc
                ORDER BY n DESC, u LIMIT 20),
        est3 AS (SELECT top.u, top.n, cells.d,
                        cells.sgn * coalesce(reg.val, 0) AS e
                 FROM top JOIN cells ON cells.u = top.u
                 LEFT JOIN reg ON reg.d = cells.d
                              AND reg.cell = cells.cell),
        med AS (SELECT u, max(n) AS n,
                       greatest(least(max(CASE WHEN d = 0 THEN e END),
                                      max(CASE WHEN d = 1 THEN e END)),
                                least(greatest(
                                        max(CASE WHEN d = 0 THEN e END),
                                        max(CASE WHEN d = 1 THEN e END)),
                                      max(CASE WHEN d = 2 THEN e END)))
                         AS est
                FROM est3 GROUP BY u)
        SELECT u AS user_id, n AS true_n,
               CAST(est AS BIGINT) AS est_n,
               CAST(est - n AS BIGINT) AS err
        FROM med ORDER BY true_n DESC, user_id
    """

    # join_order_costs: the 8 left-deep orders costed from the same
    # enumeration helper the Ray plan uses, over exact interval sizes.
    from readur_ray.pipelines.analytics import join_order_sequences

    _jo_col = {
        (0, 1): "s_rn", (1, 2): "s_nc", (2, 3): "s_co",
        (0, 2): "s_rnc", (1, 3): "s_nco", (0, 3): "s_rnco",
    }
    _jo_rows = " UNION ALL ".join(
        f"SELECT '{os}' AS order_str, "
        + " + ".join(_jo_col[iv] for iv in ivs)
        + " AS cost FROM sizes"
        for os, ivs in join_order_sequences()
    )
    sql["join_order_costs"] = f"""
        WITH rf AS (SELECT r_regionkey FROM region
                    WHERE r_name IN ('ASIA', 'EUROPE')),
        nf AS (SELECT n_nationkey, n_regionkey FROM nation
               WHERE n_name >= 'J'),
        nrf AS (SELECT nf.n_nationkey FROM nf
                JOIN rf ON nf.n_regionkey = rf.r_regionkey),
        cf AS (SELECT c_custkey, c_nationkey FROM customer
               WHERE c_mktsegment = 'BUILDING'),
        ofl AS (SELECT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'),
        sizes AS (SELECT
          (SELECT count(*) FROM nrf) AS s_rn,
          (SELECT count(*) FROM cf JOIN nf
             ON cf.c_nationkey = nf.n_nationkey) AS s_nc,
          (SELECT count(*) FROM ofl JOIN cf
             ON ofl.o_custkey = cf.c_custkey) AS s_co,
          (SELECT count(*) FROM cf JOIN nrf
             ON cf.c_nationkey = nrf.n_nationkey) AS s_rnc,
          (SELECT count(*) FROM ofl JOIN cf
             ON ofl.o_custkey = cf.c_custkey
             JOIN nf ON cf.c_nationkey = nf.n_nationkey) AS s_nco,
          (SELECT count(*) FROM ofl JOIN cf
             ON ofl.o_custkey = cf.c_custkey
             JOIN nrf ON cf.c_nationkey = nrf.n_nationkey) AS s_rnco)
        SELECT CAST(row_number() OVER (ORDER BY cost, order_str)
                 AS BIGINT) AS ord,
               order_str, CAST(cost AS BIGINT) AS cost
        FROM ({_jo_rows})
        ORDER BY 1
    """

    # dedup_threshold_curve: per-threshold census over the nested
    # Jaccard pair sets; components via the recursive reach CTE.
    _dtc_parts = [
        "jp AS MATERIALIZED (SELECT doc_a, doc_b, intersection,"
        " size_a + size_b - intersection AS u FROM ("
        + sql["dedup_ngram_jaccard"]
        + "))"
    ]
    _dtc_rows = []
    for _t in (10, 30, 50, 70):
        _dtc_parts.append(
            f"e_{_t} AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst"
            f" FROM jp WHERE intersection * 100 >= {_t} * u"
            f" UNION ALL SELECT doc_b, doc_a FROM jp"
            f" WHERE intersection * 100 >= {_t} * u)"
        )
        _dtc_parts.append(
            f"r_{_t} AS (SELECT DISTINCT src AS doc, src AS lab"
            f" FROM e_{_t}"
            f" UNION SELECT e.src, r.lab FROM r_{_t} r"
            f" JOIN e_{_t} e ON e.dst = r.doc)"
        )
        _dtc_parts.append(
            f"c_{_t} AS (SELECT doc, min(lab) AS comp FROM r_{_t}"
            f" GROUP BY 1)"
        )
        _dtc_parts.append(
            f"s_{_t} AS (SELECT comp, count(*) AS sz FROM c_{_t}"
            f" GROUP BY 1)"
        )
        _dtc_rows.append(
            f"SELECT CAST({_t} AS BIGINT) AS t_pct,"
            f" CAST((SELECT count(*) FROM jp"
            f" WHERE intersection * 100 >= {_t} * u) AS BIGINT)"
            f" AS n_edges,"
            f" CAST((SELECT count(*) FROM c_{_t}) AS BIGINT) AS n_nodes,"
            f" CAST((SELECT count(*) FROM s_{_t}) AS BIGINT)"
            f" AS n_components,"
            f" CAST((SELECT coalesce(max(sz), 0) FROM s_{_t}) AS BIGINT)"
            f" AS max_component"
        )
    sql["dedup_threshold_curve"] = (
        "WITH RECURSIVE "
        + ",\n".join(_dtc_parts)
        + "\nSELECT * FROM ("
        + " UNION ALL ".join(_dtc_rows)
        + ") ORDER BY t_pct"
    )

    # tv_distance: exact integer-scaled total variation between the
    # two halves' token distributions.
    sql["tv_distance"] = f"""
        WITH {_WORDS_CTE},
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        tok AS (SELECT doc_id, unnest(ws) AS token FROM w),
        lab AS (SELECT token,
                       CAST(doc_id >= (SELECT n // 2 FROM nd) AS BIGINT)
                         AS h
                FROM tok),
        tf AS (SELECT token, h, CAST(count(*) AS BIGINT) AS n
               FROM lab GROUP BY 1, 2),
        tot AS (SELECT
          CAST(coalesce(sum(CASE WHEN h = 0 THEN n END), 0) AS BIGINT)
            AS n1,
          CAST(coalesce(sum(CASE WHEN h = 1 THEN n END), 0) AS BIGINT)
            AS n2,
          CAST(coalesce(sum(CASE WHEN h = 0 THEN 1 END), 0) AS BIGINT)
            AS v1,
          CAST(coalesce(sum(CASE WHEN h = 1 THEN 1 END), 0) AS BIGINT)
            AS v2
          FROM tf),
        piv AS (SELECT token,
          CAST(coalesce(sum(CASE WHEN h = 0 THEN n END), 0) AS BIGINT)
            AS c1,
          CAST(coalesce(sum(CASE WHEN h = 1 THEN n END), 0) AS BIGINT)
            AS c2
          FROM tf GROUP BY 1),
        tv AS (SELECT CAST(sum(abs(c1 * tot.n2 - c2 * tot.n1))
                 AS BIGINT) AS tv_num
               FROM piv, tot)
        SELECT tot.n1 AS n1_tokens, tot.n2 AS n2_tokens,
               tot.v1 AS vocab1, tot.v2 AS vocab2, tv.tv_num,
               CAST(tv.tv_num * 10000 // (2 * tot.n1 * tot.n2)
                 AS BIGINT) AS tv_bp
        FROM tot, tv
    """

    # pfor_exception_audit: exceptions + layout cost per pack width
    # over the sorted order-key deltas.
    sql["pfor_exception_audit"] = """
        WITH vv AS (SELECT CAST(o_orderkey AS BIGINT) AS v FROM orders),
        s AS (SELECT v, v - lag(v) OVER (ORDER BY v) AS d FROM vv),
        d AS (SELECT d FROM s WHERE d IS NOT NULL),
        n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d),
        bs AS (SELECT b FROM (VALUES (2), (4), (6), (8), (12), (16))
               t(b)),
        e AS (SELECT bs.b,
                     CAST(coalesce(sum(CASE WHEN d.d >=
                            (CAST(1 AS BIGINT) << bs.b)
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS exc
              FROM bs LEFT JOIN d ON TRUE GROUP BY 1),
        c AS (SELECT e.b, n.nd, e.exc,
                     CAST(8 + (n.nd * e.b + 7) // 8 + 8 * e.exc
                       AS BIGINT) AS est_bytes
              FROM e, n),
        r AS (SELECT *, row_number() OVER (ORDER BY est_bytes, b)
                AS rn FROM c)
        SELECT CAST(b AS BIGINT) AS bits, nd AS n_deltas,
               exc AS n_exceptions, est_bytes,
               CAST(b = (SELECT b FROM r WHERE rn = 1) AS BIGINT)
                 AS is_best
        FROM c ORDER BY 1
    """

    # randomized_response_eval: Warner mechanism with md5 coin.
    sql["randomized_response_eval"] = """
        WITH c AS (SELECT c_mktsegment AS stratum,
                          CAST(c_acctbal < 0 AS BIGINT) AS y,
                          CAST(CAST('0x' || substr(
                                 md5(CAST(CAST(c_custkey AS BIGINT)
                                          AS VARCHAR)), 1, 2)
                               AS BIGINT) % 4 = 0 AS BIGINT) AS flip
                   FROM customer),
        o AS (SELECT stratum, y,
                     CASE WHEN flip = 1 THEN 1 - y ELSE y END AS obs
              FROM c)
        SELECT stratum, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS true_yes,
               CAST(sum(obs) AS BIGINT) AS obs_yes,
               CAST(4 * sum(obs) - count(*) AS BIGINT) AS est_x2,
               CAST(4 * sum(obs) - count(*) - 2 * sum(y) AS BIGINT)
                 AS err_x2
        FROM o GROUP BY 1 ORDER BY 1
    """

    # bipartiteness_audit: components via the recursive reach CTE,
    # then parities re-propagated from each component's root only.
    sql["bipartiteness_audit"] = f"""
        WITH RECURSIVE mk AS MATERIALIZED (
          SELECT vec_a, vec_b FROM ({sql["mutual_knn"]})
        ),
        e AS MATERIALIZED (
          SELECT vec_a AS src, vec_b AS dst FROM mk
          UNION ALL SELECT vec_b, vec_a FROM mk
        ),
        reach AS (
          SELECT DISTINCT src AS doc, src AS lab FROM e
          UNION
          SELECT e.src, r.lab FROM reach r JOIN e ON e.dst = r.doc
        ),
        comp AS (SELECT doc, min(lab) AS comp FROM reach GROUP BY 1),
        roots AS (SELECT DISTINCT comp FROM comp),
        par AS (
          SELECT comp AS doc, comp, 0 AS par FROM roots
          UNION
          SELECT e.src, p.comp, 1 - p.par
          FROM par p JOIN e ON e.dst = p.doc
        ),
        flags AS (SELECT doc, comp,
                         CAST(count(DISTINCT par) AS BIGINT) AS np
                  FROM par GROUP BY 1, 2),
        cstat AS (SELECT comp,
                         max(CASE WHEN np > 1 THEN 1 ELSE 0 END) AS odd,
                         CAST(count(*) AS BIGINT) AS sz
                  FROM flags GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) AS n_components,
               CAST(coalesce(sum(odd), 0) AS BIGINT)
                 AS n_odd_components,
               CAST(coalesce(sum(sz), 0) AS BIGINT) AS n_nodes,
               CAST(coalesce(sum(sz * odd), 0) AS BIGINT)
                 AS n_nodes_in_odd
        FROM cstat
    """

    # siegel_tukey: alternating-extreme ranks with deterministic
    # tie-break, exact integer rank sums per return-flag group.
    sql["siegel_tukey"] = """
        WITH x AS (SELECT l_returnflag AS grp,
                          CAST(floor(l_extendedprice * 100 + 0.5)
                            AS BIGINT) AS v,
                          CAST(l_orderkey AS BIGINT) AS ok,
                          CAST(l_linenumber AS BIGINT) AS ln
                   FROM lineitem WHERE l_returnflag IN ('R', 'A')),
        r AS (SELECT grp,
                     row_number() OVER (ORDER BY v, ok, ln) AS i,
                     count(*) OVER () AS n
              FROM x),
        a AS (SELECT grp,
                     CASE WHEN i <= (n + 1) // 2
                          THEN CASE WHEN i % 2 = 1 THEN 2 * i - 1
                                    ELSE 2 * i END
                          ELSE CASE WHEN (n + 1 - i) % 2 = 1
                                    THEN 2 * (n + 1 - i)
                                    ELSE 2 * (n + 1 - i) - 1 END
                     END AS alt
              FROM r)
        SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(alt) AS BIGINT) AS rank_sum
        FROM a GROUP BY 1 ORDER BY 1
    """

    # hilbert_locality_audit: canonical xy2d unrolled 6 levels;
    # z-order bit interleave; jumps via lag windows per ordering.
    _hl_levels = []
    _prev = "h0"
    for _i, _s in enumerate((32, 16, 8, 4, 2, 1), 1):
        _hl_levels.append(
            f"h{_i} AS (SELECT cell, x0, y0,"
            f" CASE WHEN ry = 0 THEN"
            f" (CASE WHEN rx = 1 THEN 63 - y ELSE y END)"
            f" ELSE x END AS x,"
            f" CASE WHEN ry = 0 THEN"
            f" (CASE WHEN rx = 1 THEN 63 - x ELSE x END)"
            f" ELSE y END AS y,"
            f" d + {_s * _s} * (CASE WHEN rx = 0 THEN ry"
            f" ELSE 3 - ry END) AS d"
            f" FROM (SELECT *, (x // {_s}) % 2 AS rx,"
            f" (y // {_s}) % 2 AS ry FROM {_prev}))"
        )
        _prev = f"h{_i}"
    _hl_jump = (
        "SELECT '{name}' AS ordering,"
        " CAST(count(*) AS BIGINT) AS n_cells,"
        " CAST(coalesce(sum(abs(x0 - px) + abs(y0 - py)), 0) AS BIGINT)"
        " AS total_jump,"
        " CAST(coalesce(max(abs(x0 - px) + abs(y0 - py)), 0) AS BIGINT)"
        " AS max_jump"
        " FROM (SELECT x0, y0,"
        " lag(x0) OVER (ORDER BY {key}) AS px,"
        " lag(y0) OVER (ORDER BY {key}) AS py FROM {src})"
    )
    sql["hilbert_locality_audit"] = (
        """
        WITH od AS (SELECT CAST(date_diff('day', DATE '1992-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
                          CAST(o_custkey AS BIGINT) AS ck
                    FROM orders),
        cl AS (SELECT DISTINCT
                 least(greatest(day * 64 // 2557, 0), 63) AS x0,
                 ck % 64 AS y0
               FROM od),
        h0 AS (SELECT y0 * 64 + x0 AS cell, x0, y0, x0 AS x, y0 AS y,
                      CAST(0 AS BIGINT) AS d
               FROM cl),
        """
        + ",\n".join(_hl_levels)
        + f""",
        zc AS (SELECT cell, x0, y0,
                 ((x0 // 1) % 2) * 1 + ((y0 // 1) % 2) * 2
               + ((x0 // 2) % 2) * 4 + ((y0 // 2) % 2) * 8
               + ((x0 // 4) % 2) * 16 + ((y0 // 4) % 2) * 32
               + ((x0 // 8) % 2) * 64 + ((y0 // 8) % 2) * 128
               + ((x0 // 16) % 2) * 256 + ((y0 // 16) % 2) * 512
               + ((x0 // 32) % 2) * 1024 + ((y0 // 32) % 2) * 2048
                 AS zd
               FROM h0)
        SELECT * FROM (
        {_hl_jump.format(name="hilbert", key="d", src="h6")}
        UNION ALL
        {_hl_jump.format(name="row_major", key="cell", src="h0")}
        UNION ALL
        {_hl_jump.format(name="z_order", key="zd", src="zc")}
        ) ORDER BY ordering
    """
    )

    # partial_topk_merge_eval: local top-32 per event shard, merged
    # estimate vs the exact top-32.
    sql["partial_topk_merge_eval"] = """
        WITH s AS (SELECT CAST(event_id AS BIGINT) % 16 AS shard,
                          CAST(user_id AS BIGINT) AS u
                   FROM events),
        pc AS (SELECT shard, u, CAST(count(*) AS BIGINT) AS n
               FROM s GROUP BY 1, 2),
        lt AS (SELECT shard, u, n FROM
                 (SELECT *, row_number() OVER (PARTITION BY shard
                            ORDER BY n DESC, u) AS rk FROM pc)
               WHERE rk <= 32),
        cand AS (SELECT u, CAST(sum(n) AS BIGINT) AS est_n,
                        CAST(count(*) AS BIGINT) AS nsh
                 FROM lt GROUP BY 1),
        tot AS (SELECT u, CAST(sum(n) AS BIGINT) AS true_n
                FROM pc GROUP BY 1),
        top AS (SELECT u, true_n,
                       row_number() OVER (ORDER BY true_n DESC, u)
                         AS rnk
                FROM tot ORDER BY true_n DESC, u LIMIT 32)
        SELECT CAST(top.rnk AS BIGINT) AS rank, top.u AS user_id,
               top.true_n,
               CAST(coalesce(cand.est_n, 0) AS BIGINT) AS est_n,
               CAST(coalesce(cand.nsh, 0) AS BIGINT)
                 AS n_shards_counted,
               CAST(cand.u IS NOT NULL AS BIGINT) AS in_candidates
        FROM top LEFT JOIN cand ON top.u = cand.u ORDER BY 1
    """

    # energy_distance: pairwise |diff| sums via rank coefficients
    # (within) and RANGE-frame prefix sums (cross), never pairs.
    sql["energy_distance"] = """
        WITH x AS (SELECT CAST(l_returnflag = 'R' AS BIGINT) AS g,
                          CAST(floor(l_extendedprice * 100 + 0.5)
                            AS BIGINT) AS v
                   FROM lineitem WHERE l_returnflag IN ('R', 'A')),
        wth AS (SELECT g,
                       CAST(sum(v * (2 * rn - n - 1)) AS BIGINT) AS s,
                       CAST(max(n) AS BIGINT) AS n
                FROM (SELECT g, v,
                             row_number() OVER (PARTITION BY g
                                                ORDER BY v) AS rn,
                             count(*) OVER (PARTITION BY g) AS n
                      FROM x)
                GROUP BY g),
        yagg AS (SELECT CAST(count(*) AS BIGINT) AS ny,
                        CAST(sum(v) AS BIGINT) AS sy
                 FROM x WHERE g = 0),
        pref AS (SELECT v,
                        CAST(coalesce(sum(CASE WHEN g = 0 THEN 1 END)
                          OVER (ORDER BY v RANGE UNBOUNDED PRECEDING),
                          0) AS BIGINT) AS yle_c,
                        CAST(coalesce(sum(CASE WHEN g = 0 THEN v END)
                          OVER (ORDER BY v RANGE UNBOUNDED PRECEDING),
                          0) AS BIGINT) AS yle_s,
                        g
                 FROM x),
        cross_t AS (SELECT CAST(sum(v * yle_c - yle_s
                           + (yagg.sy - yle_s)
                           - v * (yagg.ny - yle_c)) AS BIGINT)
                      AS sum_xy
                    FROM pref, yagg WHERE pref.g = 1)
        SELECT (SELECT n FROM wth WHERE g = 1) AS n_x,
               (SELECT n FROM wth WHERE g = 0) AS n_y,
               cross_t.sum_xy,
               (SELECT s FROM wth WHERE g = 1) AS sum_xx,
               (SELECT s FROM wth WHERE g = 0) AS sum_yy
        FROM cross_t
    """

    # cuped_moments: per-arm (pre, post) count moments + θ pieces.
    sql["cuped_moments"] = """
        WITH b AS (SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS lo,
                          CAST(epoch_us(max(ts)) AS BIGINT) AS hi
                   FROM events),
        u AS (SELECT CAST(user_id AS BIGINT) AS uid,
                     CAST(sum(CASE WHEN epoch_us(ts) <
                            b.lo + (b.hi - b.lo) // 2
                          THEN 1 ELSE 0 END) AS BIGINT) AS x,
                     CAST(sum(CASE WHEN epoch_us(ts) <
                            b.lo + (b.hi - b.lo) // 2
                          THEN 0 ELSE 1 END) AS BIGINT) AS y
              FROM events, b GROUP BY 1, b.lo, b.hi),
        m AS (SELECT uid % 2 AS arm,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(y * y) AS BIGINT) AS syy
              FROM u GROUP BY 1)
        SELECT CAST(arm AS BIGINT) AS arm, n, sx, sy, sxx, sxy, syy,
               CAST(n * sxy - sx * sy AS BIGINT) AS theta_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS theta_den
        FROM m ORDER BY 1
    """

    # grid_percolation: recursive reach over 4-neighbor cell edges.
    sql["grid_percolation"] = """
        WITH RECURSIVE od AS (
          SELECT CAST(date_diff('day', DATE '1992-01-01',
                   CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
                 CAST(o_custkey AS BIGINT) AS ck
          FROM orders),
        cl AS (SELECT DISTINCT
                 least(greatest(day * 64 // 2557, 0), 63) AS x,
                 ck % 64 AS y
               FROM od),
        cells AS (SELECT y * 64 + x AS cell, x, y FROM cl),
        e AS (SELECT a.cell AS src, b.cell AS dst
              FROM cells a JOIN cells b
                ON abs(a.x - b.x) + abs(a.y - b.y) = 1),
        reach AS (
          SELECT cell AS doc, cell AS lab FROM cells
          UNION
          SELECT e.src, r.lab FROM reach r JOIN e ON e.dst = r.doc
        ),
        comp AS (SELECT doc, min(lab) AS comp FROM reach GROUP BY 1),
        sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS s
               FROM comp GROUP BY 1)
        SELECT CAST((SELECT count(*) FROM cells) AS BIGINT)
                 AS n_occupied,
               CAST((SELECT count(*) // 2 FROM e) AS BIGINT)
                 AS n_adjacent_pairs,
               CAST((SELECT count(*) FROM sz) AS BIGINT) AS n_clusters,
               CAST((SELECT coalesce(max(s), 0) FROM sz) AS BIGINT)
                 AS largest_cluster
    """

    # string_range_partition_plan: 15 order-statistic bounds + exact
    # per-bucket counts by boundary comparison.
    sql["string_range_partition_plan"] = """
        WITH nm AS (SELECT p_name AS v FROM part),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nm),
        r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM nm),
        b AS (SELECT t.i,
                     (SELECT v FROM r, nn WHERE rk = t.i * nn.n // 16)
                       AS bound
              FROM range(1, 16) t(i)),
        asg AS (SELECT nm.v,
                       (SELECT count(*) FROM b WHERE b.bound <= nm.v)
                         AS bucket
                FROM nm),
        cnt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows
                FROM asg GROUP BY 1)
        SELECT CAST(t.i AS BIGINT) AS bucket,
               CASE WHEN t.i = 0 THEN ''
                    ELSE (SELECT bound FROM b WHERE b.i = t.i) END
                 AS lo_bound,
               CAST(coalesce(cnt.n_rows, 0) AS BIGINT) AS n_rows
        FROM range(16) t(i) LEFT JOIN cnt ON cnt.bucket = t.i
        ORDER BY 1
    """

    # fair_share_allocation: water-filling level scan by integer
    # cross-multiplication, largest-remainder split by user id.
    sql["fair_share_allocation"] = """
        WITH pc AS (SELECT CAST(user_id AS BIGINT) AS u,
                           CAST(count(*) AS BIGINT) AS n
                    FROM events GROUP BY 1),
        top AS (SELECT u, n FROM pc ORDER BY n DESC, u LIMIT 16),
        a AS (SELECT u, n,
                     row_number() OVER (ORDER BY n, u) AS i,
                     CAST(sum(n) OVER (ORDER BY n, u
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pre
              FROM top),
        mm AS (SELECT CAST(count(*) AS BIGINT) AS m,
                      CAST(sum(n) AS BIGINT) AS total,
                      CAST(sum(n) // 2 AS BIGINT) AS cap
               FROM top),
        kk AS (SELECT t.k FROM range(0, 17) t(k), mm
               WHERE t.k < mm.m
                 AND (t.k = 0 OR
                      (SELECT n FROM a WHERE i = t.k) * (mm.m - t.k)
                        <= mm.cap
                           - coalesce((SELECT pre FROM a
                                       WHERE i = t.k), 0))
                 AND mm.cap - coalesce((SELECT pre FROM a
                                        WHERE i = t.k), 0)
                     < (SELECT n FROM a WHERE i = t.k + 1)
                       * (mm.m - t.k)),
        k0 AS (SELECT CASE WHEN mm.total <= mm.cap THEN mm.m
                           ELSE (SELECT min(k) FROM kk) END AS k,
                      mm.m AS m, mm.cap AS cap
               FROM mm),
        lvl AS (SELECT k0.k,
                       CASE WHEN k0.k >= k0.m THEN 0
                            ELSE (k0.cap
                                  - coalesce((SELECT pre FROM a
                                              WHERE i = k0.k), 0))
                                 // (k0.m - k0.k) END AS base,
                       CASE WHEN k0.k >= k0.m THEN 0
                            ELSE (k0.cap
                                  - coalesce((SELECT pre FROM a
                                              WHERE i = k0.k), 0))
                                 % (k0.m - k0.k) END AS extra
                FROM k0),
        uns AS (SELECT a.u, row_number() OVER (ORDER BY a.u) AS r
                FROM a, k0 WHERE a.i > k0.k)
        SELECT a.u AS user_id, a.n AS demand,
               CAST(CASE WHEN a.i <= (SELECT k FROM k0) THEN a.n
                    ELSE (SELECT base FROM lvl)
                         + CASE WHEN (SELECT r FROM uns
                                      WHERE uns.u = a.u)
                                     <= (SELECT extra FROM lvl)
                                THEN 1 ELSE 0 END END AS BIGINT)
                 AS alloc
        FROM a ORDER BY demand DESC, user_id
    """

    # rebalance_delta_audit: mod vs rendezvous moved keys, 16 -> 17.
    sql["rebalance_delta_audit"] = """
        WITH ky AS (SELECT CAST(c_custkey AS BIGINT) AS k
                    FROM customer),
        nd AS (SELECT i FROM range(17) t(i)),
        sc AS (SELECT ky.k, nd.i,
                      CAST('0x' || substr(md5(CAST(nd.i AS VARCHAR)
                           || ':' || CAST(ky.k AS VARCHAR)), 1, 15)
                        AS BIGINT) AS s
               FROM ky, nd),
        a16 AS (SELECT k, i FROM
                  (SELECT k, i, row_number() OVER (PARTITION BY k
                     ORDER BY s DESC, i DESC) AS rn
                   FROM sc WHERE i < 16) q
                WHERE rn = 1),
        a17 AS (SELECT k, i FROM
                  (SELECT k, i, row_number() OVER (PARTITION BY k
                     ORDER BY s DESC, i DESC) AS rn
                   FROM sc) q
                WHERE rn = 1),
        stats AS (
          SELECT 'mod' AS scheme, CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(sum(CASE WHEN k % 16 <> k % 17 THEN 1 ELSE 0
                          END) AS BIGINT) AS n_moved
          FROM ky
          UNION ALL
          SELECT 'rendezvous', CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN a16.i <> a17.i THEN 1 ELSE 0 END)
                   AS BIGINT)
          FROM a16 JOIN a17 USING (k))
        SELECT scheme, n_keys, n_moved,
               CAST(n_moved * 10000 // n_keys AS BIGINT) AS moved_bp
        FROM stats ORDER BY scheme
    """

    # attack_robustness_curve: per hub-removal point, a filtered
    # edge set + recursive component census (unrolled per k).
    _atk_parts = [
        f"mk AS MATERIALIZED (SELECT vec_a, vec_b FROM ({sql['mutual_knn']}))",
        "allv AS (SELECT vec_a AS v FROM mk"
        " UNION ALL SELECT vec_b FROM mk)",
        "deg AS MATERIALIZED (SELECT v AS node,"
        " CAST(count(*) AS BIGINT) AS dg FROM allv GROUP BY 1)",
        "hub AS MATERIALIZED (SELECT node,"
        " row_number() OVER (ORDER BY dg DESC, node) AS rk FROM deg)",
    ]
    _atk_rows = []
    for _k in (0, 1, 2, 4, 8, 16):
        _atk_parts.append(
            f"g_{_k} AS MATERIALIZED (SELECT vec_a AS a, vec_b AS b"
            f" FROM mk WHERE vec_a NOT IN (SELECT node FROM hub"
            f" WHERE rk <= {_k}) AND vec_b NOT IN (SELECT node"
            f" FROM hub WHERE rk <= {_k}))"
        )
        _atk_parts.append(
            f"e_{_k} AS MATERIALIZED (SELECT a AS src, b AS dst"
            f" FROM g_{_k} UNION ALL SELECT b, a FROM g_{_k})"
        )
        _atk_parts.append(
            f"r_{_k} AS (SELECT DISTINCT src AS doc, src AS lab"
            f" FROM e_{_k}"
            f" UNION SELECT e.src, r.lab FROM r_{_k} r"
            f" JOIN e_{_k} e ON e.dst = r.doc)"
        )
        _atk_parts.append(
            f"c_{_k} AS (SELECT doc, min(lab) AS comp FROM r_{_k}"
            f" GROUP BY 1)"
        )
        _atk_parts.append(
            f"s_{_k} AS (SELECT comp, count(*) AS sz FROM c_{_k}"
            f" GROUP BY 1)"
        )
        _atk_rows.append(
            f"SELECT CAST({_k} AS BIGINT) AS k_removed,"
            f" CAST((SELECT count(*) FROM c_{_k}) AS BIGINT)"
            f" AS n_nodes,"
            f" CAST((SELECT count(*) FROM g_{_k}) AS BIGINT)"
            f" AS n_edges,"
            f" CAST((SELECT count(*) FROM s_{_k}) AS BIGINT)"
            f" AS n_components,"
            f" CAST((SELECT coalesce(max(sz), 0) FROM s_{_k})"
            f" AS BIGINT) AS largest_component"
        )
    sql["attack_robustness_curve"] = (
        "WITH RECURSIVE "
        + ",\n".join(_atk_parts)
        + "\nSELECT * FROM ("
        + " UNION ALL ".join(_atk_rows)
        + ") ORDER BY k_removed"
    )

    # dict_cutoff_curve: partial-dictionary cost at fixed cutoffs
    # (code widths precomputed per k).
    _dcc_rows = []
    for _k in (1, 2, 4, 8, 16, 32, 64, 128):
        _w = _k.bit_length()  # ceil(log2(k+1))
        _dcc_rows.append(
            f"SELECT CAST({_k} AS BIGINT) AS k,"
            f" CAST((SELECT coalesce(sum(c), 0) FROM e"
            f" WHERE rk <= {_k}) AS BIGINT) AS n_hits,"
            f" CAST((SELECT coalesce(sum(lv + 1), 0) FROM e"
            f" WHERE rk <= {_k}) AS BIGINT) AS dict_bytes,"
            f" CAST((SELECT coalesce(sum(lv + 1), 0) FROM e"
            f" WHERE rk <= {_k})"
            f" + ((SELECT n FROM tot)"
            f"    + (SELECT coalesce(sum(c), 0) FROM e"
            f"       WHERE rk <= {_k}) * {_w}"
            f"    + (SELECT missbits FROM tot)"
            f"    - (SELECT coalesce(sum(c * 8 * (lv + 1)), 0) FROM e"
            f"       WHERE rk <= {_k}) + 7) // 8 AS BIGINT)"
            f" AS est_bytes"
        )
    sql["dict_cutoff_curve"] = (
        """
        WITH h AS (SELECT p_type AS v, CAST(count(*) AS BIGINT) AS c
                   FROM part GROUP BY 1),
        e AS (SELECT v, c, CAST(length(v) AS BIGINT) AS lv,
                     row_number() OVER (ORDER BY c DESC, v) AS rk
              FROM h),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                       CAST(sum(c * 8 * (length(v) + 1)) AS BIGINT)
                         AS missbits
                FROM h),
        curve AS ("""
        + " UNION ALL ".join(_dcc_rows)
        + """)
        SELECT k, n_hits, dict_bytes, est_bytes,
               CAST(k = (SELECT k FROM
                 (SELECT k, row_number() OVER (ORDER BY est_bytes, k)
                    AS rn FROM curve) WHERE rn = 1) AS BIGINT)
                 AS is_best
        FROM curve ORDER BY k
    """
    )

    # ams_f2_eval: twelve signed pure-sum trials vs exact F2.
    sql["ams_f2_eval"] = """
        WITH uc AS (SELECT CAST(user_id AS BIGINT) AS u,
                           CAST(count(*) AS BIGINT) AS n
                    FROM events GROUP BY 1),
        tr AS (SELECT j FROM range(12) t(j)),
        sg AS (SELECT tr.j, uc.u, uc.n,
                      CASE WHEN CAST('0x' || substr(
                             md5(CAST(tr.j AS VARCHAR) || ':'
                                 || CAST(uc.u AS VARCHAR)), 1, 2)
                           AS BIGINT) % 2 = 0
                           THEN 1 ELSE -1 END AS s
               FROM uc CROSS JOIN tr),
        tj AS (SELECT j, CAST(sum(s * n) AS BIGINT) AS t
               FROM sg GROUP BY 1),
        gg AS (SELECT j // 4 AS g, CAST(sum(t * t) AS BIGINT) AS st2
               FROM tj GROUP BY 1),
        f2 AS (SELECT CAST(sum(n * n) AS BIGINT) AS f2 FROM uc),
        p AS (SELECT
                (SELECT st2 FROM gg WHERE g = 0) AS g1,
                (SELECT st2 FROM gg WHERE g = 1) AS g2,
                (SELECT st2 FROM gg WHERE g = 2) AS g3,
                f2.f2
              FROM f2)
        SELECT f2 AS f2_exact, g1 AS g1_sum_t2, g2 AS g2_sum_t2,
               g3 AS g3_sum_t2,
               CAST(greatest(least(g1, g2),
                             least(greatest(g1, g2), g3)) AS BIGINT)
                 AS est_x4,
               CAST(greatest(least(g1, g2),
                             least(greatest(g1, g2), g3)) - 4 * f2
                 AS BIGINT) AS err_x4
        FROM p
    """

    # bbit_minwise_eval: matched positions at low-b bits vs full,
    # over the exact ppjoin truth pairs.
    sql["bbit_minwise_eval"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        bandk AS (SELECT * FROM (VALUES {_BAND_VALUES}) AS t(b, am, ac)),
        sig AS (
          SELECT doc_id, b,
                 min(CAST(((CAST(CAST('0x' || substr(md5(s), 1, 15)
                      AS UBIGINT) AS HUGEINT)
                      * am + ac) % 18446744073709551616) // 16
                      AS BIGINT)) AS mh
          FROM sh, bandk
          GROUP BY doc_id, b
        ),
        pairs AS (SELECT doc_a, doc_b FROM ({sql["ppjoin_exact"]})),
        m AS (SELECT p.doc_a, p.doc_b, sa.mh AS ma, sb.mh AS mb
              FROM pairs p
              JOIN sig sa ON sa.doc_id = p.doc_a
              JOIN sig sb ON sb.doc_id = p.doc_b AND sb.b = sa.b),
        np_ AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pairs),
        bs AS (SELECT bb, CAST((CAST(1 AS BIGINT) << bb) - 1 AS BIGINT)
                 AS mask
               FROM (VALUES (1), (2), (4), (8)) t(bb))
        SELECT CAST(bs.bb AS BIGINT) AS b, np_.n_pairs,
               CAST(sum(CASE WHEN m.ma = m.mb THEN 1 ELSE 0 END)
                 AS BIGINT) AS sum_matches_full,
               CAST(sum(CASE WHEN (m.ma & bs.mask) = (m.mb & bs.mask)
                        THEN 1 ELSE 0 END) AS BIGINT)
                 AS sum_matches_bbit
        FROM bs CROSS JOIN m, np_
        GROUP BY 1, 2 ORDER BY 1
    """

    # compression_neighbor_gain: per-shingle adjacency counts under
    # two layouts (positions by doc_id and by simhash).
    sql["compression_neighbor_gain"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE}, {_SIMHASH_CTE},
        pa_ AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id)
                  AS p
                FROM documents),
        pc_ AS (SELECT doc_id,
                       row_number() OVER (ORDER BY simhash, doc_id)
                         AS p
                FROM fps),
        sh2 AS (SELECT doc_id,
                       CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
                         AS h
                FROM sh),
        sa AS (SELECT sh2.h, pa_.p FROM sh2 JOIN pa_ USING (doc_id)),
        sc AS (SELECT sh2.h, pc_.p FROM sh2 JOIN pc_ USING (doc_id)),
        ga AS (SELECT CAST(count(*) AS BIGINT) AS g
               FROM sa x JOIN sa y ON x.h = y.h AND y.p = x.p + 1),
        gc AS (SELECT CAST(count(*) AS BIGINT) AS g
               FROM sc x JOIN sc y ON x.h = y.h AND y.p = x.p + 1),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
        SELECT * FROM (
          SELECT 'doc_id' AS ordering, nn.n - 1 AS n_pairs,
                 ga.g AS shared_shingles
          FROM nn, ga
          UNION ALL
          SELECT 'simhash', nn.n - 1, gc.g FROM nn, gc
        ) ORDER BY ordering
    """

    # knn_reciprocity: directed edges vs mutual pairs.
    sql["knn_reciprocity"] = f"""
        WITH g AS ({sql["knn_graph"]}),
        mk AS (SELECT vec_a, vec_b FROM ({sql["mutual_knn"]}))
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings)
                 AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM g)
                 AS n_directed,
               (SELECT CAST(count(*) AS BIGINT) FROM mk)
                 AS n_mutual_pairs,
               CAST(2 * (SELECT count(*) FROM mk) * 10000
                    // (SELECT count(*) FROM g) AS BIGINT)
                 AS reciprocity_bp
    """

    # sample_convergence_curve: nested md5 doc samples; vocab via
    # per-token min doc-hash thresholds.
    sql["sample_convergence_curve"] = f"""
        WITH {_WORDS_CTE},
        du AS (SELECT doc_id, n_chars,
                      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                           1, 15) AS BIGINT) AS u
               FROM documents),
        dens AS (SELECT d FROM (VALUES (16), (8), (4), (2), (1)) t(d)),
        ds_ AS (SELECT dens.d,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(coalesce(sum(du.n_chars), 0) AS BIGINT)
                         AS total_chars
                FROM dens LEFT JOIN du
                  ON du.u < CAST(1152921504606846976 AS BIGINT) / dens.d
                GROUP BY 1),
        tok AS (SELECT w.doc_id, unnest(w.ws) AS token FROM w),
        tm AS (SELECT tok.token, min(du.u) AS mu
               FROM tok JOIN du ON du.doc_id = tok.doc_id
               GROUP BY 1),
        vc AS (SELECT dens.d, CAST(count(*) AS BIGINT) AS vocab
               FROM dens LEFT JOIN tm
                 ON tm.mu < CAST(1152921504606846976 AS BIGINT) / dens.d
               GROUP BY 1)
        SELECT CAST(ds_.d AS BIGINT) AS fraction_den, ds_.n_docs,
               ds_.total_chars,
               CAST(CASE WHEN ds_.n_docs > 0
                    THEN ds_.total_chars * 1000 // ds_.n_docs
                    ELSE 0 END AS BIGINT) AS mean_chars_x1000,
               vc.vocab
        FROM ds_ JOIN vc ON ds_.d = vc.d
        ORDER BY 1
    """

    # sampled_selectivity_audit: Bernoulli row-sample estimates vs
    # truth on the histogram predicates.
    sql["sampled_selectivity_audit"] = """
        WITH r AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
                     AS BIGINT) AS v,
                          CAST('0x' || substr(md5(
                            CAST(CAST(l_orderkey AS BIGINT) AS VARCHAR)
                            || ':' ||
                            CAST(CAST(l_linenumber AS BIGINT)
                                 AS VARCHAR)), 1, 15) AS BIGINT) AS u
                   FROM lineitem),
        preds AS (SELECT * FROM (VALUES
                    (1, 100000, 200000),
                    (2, 1000000, 2000000),
                    (3, 2000000, 4000000),
                    (4, 5000000, 10000000),
                    (5, 0, 1500000),
                    (6, 9000000, 99999999)) p(pid, lo, hi)),
        c AS (SELECT p.pid, p.lo, p.hi,
                     CAST(count(*) FILTER (WHERE r.v >= p.lo
                       AND r.v < p.hi) AS BIGINT) AS true_rows,
                     CAST(count(*) FILTER (WHERE r.v >= p.lo
                       AND r.v < p.hi
                       AND r.u < CAST(1152921504606846976 AS BIGINT)
                           / 16) AS BIGINT) AS s16,
                     CAST(count(*) FILTER (WHERE r.v >= p.lo
                       AND r.v < p.hi
                       AND r.u < CAST(1152921504606846976 AS BIGINT)
                           / 4) AS BIGINT) AS s4
              FROM preds p CROSS JOIN r
              GROUP BY 1, 2, 3)
        SELECT CAST(pid AS BIGINT) AS pred_id,
               CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi,
               true_rows,
               CAST(s16 * 16 AS BIGINT) AS est16,
               CAST(s4 * 4 AS BIGINT) AS est4,
               CAST(abs(s16 * 16 - true_rows) AS BIGINT) AS err16,
               CAST(abs(s4 * 4 - true_rows) AS BIGINT) AS err4
        FROM c ORDER BY 1
    """

    # normalization_dedup_ladder: duplicate census per rung.
    sql["normalization_dedup_ladder"] = r"""
        WITH v AS (SELECT text AS t0, lower(text) AS t1,
                          trim(regexp_replace(text, '\s+', ' ', 'g'))
                            AS t2,
                          trim(regexp_replace(regexp_replace(
                            lower(text), '[^a-z0-9 ]', '', 'g'),
                            '\s+', ' ', 'g')) AS t3
                   FROM documents),
        v2 AS (SELECT t0, t1, t2, t3,
                      array_to_string(list_sort(
                        string_split(t3, ' ')), ' ') AS t4
               FROM v),
        u AS (SELECT 0 AS lid, md5(t0) AS h FROM v2
              UNION ALL SELECT 1, md5(t1) FROM v2
              UNION ALL SELECT 2, md5(t2) FROM v2
              UNION ALL SELECT 3, md5(t3) FROM v2
              UNION ALL SELECT 4, md5(t4) FROM v2),
        g AS (SELECT lid, h, CAST(count(*) AS BIGINT) AS c
              FROM u GROUP BY 1, 2)
        SELECT CAST(lid AS BIGINT) AS level_id,
               CASE lid WHEN 0 THEN 'raw' WHEN 1 THEN 'lower'
                        WHEN 2 THEN 'ws_collapse' WHEN 3 THEN 'alnum'
                        ELSE 'bag' END AS level,
               CAST(sum(c) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(c) - count(*) AS BIGINT) AS n_dup_docs,
               CAST(max(c) AS BIGINT) AS max_group
        FROM g GROUP BY 1, 2 ORDER BY 1
    """

    # mom_selection_audit: BFPRT pivot rank over document lengths.
    sql["mom_selection_audit"] = """
        WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                          CAST(n_chars AS BIGINT) AS v
                   FROM documents),
        r AS (SELECT id // 5 AS g, v,
                     row_number() OVER (PARTITION BY id // 5
                                        ORDER BY v) AS rk,
                     count(*) OVER (PARTITION BY id // 5) AS cnt
              FROM d),
        gm AS (SELECT g, v AS m FROM r WHERE rk = (cnt + 1) // 2),
        rm AS (SELECT m, row_number() OVER (ORDER BY m) AS rk,
                      count(*) OVER () AS ng
               FROM gm),
        mv AS (SELECT m FROM rm WHERE rk = (ng + 1) // 2),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(CASE WHEN v < (SELECT m FROM mv)
                               THEN 1 ELSE 0 END) AS BIGINT) AS lt
               FROM d)
        SELECT n, CAST((SELECT m FROM mv) AS BIGINT) AS mom_value,
               CAST(lt + 1 AS BIGINT) AS mom_rank,
               CAST((n + 1) // 2 AS BIGINT) AS median_rank,
               CAST((lt + 1) * 10000 // n AS BIGINT) AS rank_bp
        FROM st
    """

    # boilerplate_affix_census: top-16 head/tail 5-gram census.
    sql["boilerplate_affix_census"] = f"""
        WITH {_WORDS_CTE},
        aff AS (SELECT 'head' AS position,
                       array_to_string(list_slice(ws, 1,
                         least(5, len(ws))), ' ') AS gram
                FROM w WHERE len(ws) >= 1
                UNION ALL
                SELECT 'tail',
                       array_to_string(list_slice(ws,
                         greatest(1, len(ws) - 4), len(ws)), ' ')
                FROM w WHERE len(ws) >= 1),
        g AS (SELECT position, gram, CAST(count(*) AS BIGINT) AS n
              FROM aff GROUP BY 1, 2),
        r AS (SELECT position, gram, n,
                     row_number() OVER (PARTITION BY position
                                        ORDER BY n DESC, gram) AS rnk
              FROM g),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
        SELECT position, CAST(rnk AS BIGINT) AS rnk, gram,
               r.n AS n_docs,
               CAST(r.n * 10000 // nd.n AS BIGINT) AS coverage_bp
        FROM r, nd WHERE rnk <= 16 ORDER BY position, rnk
    """

    # tokenizer_fertility: per-language token-budget totals.
    sql["tokenizer_fertility"] = r"""
        WITH t AS (SELECT lang,
                          CAST(length(text) AS BIGINT) AS chars,
                          CAST(strlen(text) AS BIGINT) AS bytes,
                          CAST(len(regexp_extract_all(text, '\S+'))
                            AS BIGINT) AS ws_tokens,
                          CAST(len(regexp_extract_all(text,
                            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                            AS BIGINT) AS bpe_tokens
                   FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(chars) AS BIGINT) AS chars,
               CAST(sum(bytes) AS BIGINT) AS bytes,
               CAST(sum(ws_tokens) AS BIGINT) AS ws_tokens,
               CAST(sum(bpe_tokens) AS BIGINT) AS bpe_tokens,
               CAST(CASE WHEN sum(bpe_tokens) > 0
                    THEN sum(chars) * 1000 // sum(bpe_tokens)
                    ELSE 0 END AS BIGINT) AS chars_per_bpe_x1000,
               CAST(CASE WHEN sum(ws_tokens) > 0
                    THEN sum(bpe_tokens) * 1000 // sum(ws_tokens)
                    ELSE 0 END AS BIGINT) AS bpe_per_ws_x1000
        FROM t GROUP BY 1 ORDER BY 1
    """

    # revenue_path_extremes: drawdown + monotone runs of the daily
    # level series, earliest-tie conventions mirrored.
    sql["revenue_path_extremes"] = """
        WITH dd0 AS (SELECT CAST(date_diff('day', DATE '1992-01-01',
                       CAST(l_shipdate AS DATE)) AS BIGINT) AS day,
                            CAST(floor(l_extendedprice * 100 + 0.5)
                              AS BIGINT) AS cents
                     FROM lineitem),
        ds AS (SELECT day, CAST(sum(cents) AS BIGINT) AS s
               FROM dd0 GROUP BY 1),
        pm AS (SELECT day, s, max(s) OVER (ORDER BY day) AS runmax
               FROM ds),
        ddx AS (SELECT day, s, runmax, runmax - s AS dd FROM pm),
        best AS (SELECT CAST(max(dd) AS BIGINT) AS bd FROM ddx),
        trough AS (SELECT CASE WHEN (SELECT bd FROM best) = 0 THEN -1
                        ELSE (SELECT min(day) FROM ddx
                              WHERE dd = (SELECT bd FROM best)) END
                     AS td),
        peak AS (SELECT CASE WHEN (SELECT bd FROM best) = 0 THEN -1
                      ELSE (SELECT min(day) FROM ds
                            WHERE s = (SELECT runmax FROM ddx, trough
                                       WHERE day = td)) END AS pd),
        rr AS (SELECT day, s,
                      CASE WHEN s > lag(s) OVER (ORDER BY day)
                           THEN 0 ELSE 1 END AS brk_r,
                      CASE WHEN s < lag(s) OVER (ORDER BY day)
                           THEN 0 ELSE 1 END AS brk_f
               FROM ds),
        rg AS (SELECT day,
                      sum(brk_r) OVER (ORDER BY day) AS grp_r,
                      sum(brk_f) OVER (ORDER BY day) AS grp_f
               FROM rr),
        lr AS (SELECT CAST(max(c) AS BIGINT) AS v FROM
                 (SELECT count(*) AS c FROM rg GROUP BY grp_r)),
        lf AS (SELECT CAST(max(c) AS BIGINT) AS v FROM
                 (SELECT count(*) AS c FROM rg GROUP BY grp_f))
        SELECT CAST((SELECT count(*) FROM ds) AS BIGINT) AS n_days,
               (SELECT bd FROM best) AS max_drawdown_cents,
               CAST((SELECT pd FROM peak) AS BIGINT) AS peak_day,
               CAST((SELECT td FROM trough) AS BIGINT) AS trough_day,
               (SELECT v FROM lr) AS longest_rise,
               (SELECT v FROM lf) AS longest_fall
    """

    # pps_sample_calibration: exact HUGEINT inclusion rule + decile
    # by value-run start rank.
    sql["pps_sample_calibration"] = """
        WITH o AS (SELECT CAST(o_orderkey AS BIGINT) AS k,
                          CAST(floor(o_totalprice * 100 + 0.5)
                            AS BIGINT) AS w
                   FROM orders),
        tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw,
                       CAST(count(*) AS BIGINT) AS n
                FROM o),
        sr AS (SELECT w AS v, CAST(count(*) AS BIGINT) AS c
               FROM o GROUP BY 1),
        sr2 AS (SELECT v,
                       CAST(coalesce(sum(c) OVER (ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS start_rank
                FROM sr),
        x AS (SELECT o.k, o.w, sr2.start_rank,
                     CAST('0x' || substr(md5(CAST(o.k AS VARCHAR)),
                          1, 15) AS BIGINT) AS u
              FROM o JOIN sr2 ON sr2.v = o.w),
        cells AS (SELECT CAST(x.start_rank * 10 // tot.n AS BIGINT)
                    AS decile,
                         x.w,
                         CASE WHEN CAST(x.u AS HUGEINT) * tot.tw
                              < CAST(256 AS HUGEINT) * x.w
                                * CAST(1152921504606846976 AS HUGEINT)
                              THEN 1 ELSE 0 END AS inc,
                         least(1000000,
                               1000000 * 256 * x.w // tot.tw) AS exp_
                  FROM x, tot)
        SELECT decile, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(w) AS BIGINT) AS sum_price_cents,
               CAST(sum(exp_) AS BIGINT) AS expected_x1m,
               CAST(sum(inc) AS BIGINT) AS realized
        FROM cells GROUP BY 1 ORDER BY 1
    """

    # lsh_banding_scheme_eval: per-scheme candidate census vs truth
    # (band keys = md5 of concatenated hashes; buckets > 128 dropped).
    _lsh_parts = [
        f"bandk AS (SELECT * FROM (VALUES {_BAND_VALUES}) AS t(b, am, ac))",
        "sig AS MATERIALIZED ("
        " SELECT doc_id, b,"
        " min(CAST(((CAST(CAST('0x' || substr(md5(s), 1, 15)"
        " AS UBIGINT) AS HUGEINT) * am + ac)"
        " % 18446744073709551616) // 16 AS BIGINT)) AS mh"
        " FROM sh, bandk GROUP BY doc_id, b)",
        "tp AS MATERIALIZED (SELECT doc_a, doc_b FROM"
        " (" + sql["ppjoin_exact"] + "))",
        "ntp AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tp)",
    ]
    _lsh_rows = []
    for _bc, _r in ((16, 1), (8, 2), (4, 4), (2, 8)):
        _pw = [1]
        for _ in range(7):
            _pw.append((_pw[-1] * 0x9E3779B97F4A7C15) % (1 << 64))
        _case = (
            "CASE b % {r} "
            + " ".join(f"WHEN {j} THEN CAST({_pw[j]} AS HUGEINT)"
                       for j in range(8))
            + " END"
        ).format(r=_r)
        _lsh_parts.append(
            f"bk_{_bc} AS MATERIALIZED (SELECT doc_id, b // {_r} AS band,"
            f" CAST((sum((CAST(mh AS HUGEINT) * ({_case}))"
            f" % 18446744073709551616) % 18446744073709551616)"
            f" % 2305843009213693952 AS BIGINT) AS kh"
            f" FROM sig GROUP BY doc_id, b // {_r})"
        )
        _lsh_parts.append(
            f"bf_{_bc} AS MATERIALIZED (SELECT * FROM"
            f" (SELECT *, count(*) OVER (PARTITION BY band, kh) AS bs"
            f" FROM bk_{_bc}) WHERE bs <= 128)"
        )
        _lsh_parts.append(
            f"pr_{_bc} AS MATERIALIZED (SELECT DISTINCT a.doc_id AS da,"
            f" c.doc_id AS db"
            f" FROM bf_{_bc} a JOIN bf_{_bc} c"
            f" ON a.band = c.band AND a.kh = c.kh"
            f" AND a.doc_id < c.doc_id)"
        )
        _lsh_rows.append(
            f"SELECT CAST({_bc} AS BIGINT) AS bands,"
            f" CAST({_r} AS BIGINT) AS rows_per_band,"
            f" CAST((SELECT count(*) FROM pr_{_bc}) AS BIGINT)"
            f" AS n_cand,"
            f" CAST((SELECT count(*) FROM pr_{_bc} p JOIN tp"
            f" ON tp.doc_a = p.da AND tp.doc_b = p.db) AS BIGINT)"
            f" AS n_captured"
        )
    sql["lsh_banding_scheme_eval"] = (
        f"WITH {_WORDS_CTE}, {_SHINGLES_CTE},\n"
        + ",\n".join(_lsh_parts)
        + ",\ncurve AS ("
        + " UNION ALL ".join(_lsh_rows)
        + """)
        SELECT bands, rows_per_band, n_cand, n_captured,
               CAST(CASE WHEN n_cand > 0
                    THEN n_captured * 10000 // n_cand ELSE 0 END
                 AS BIGINT) AS precision_bp,
               CAST(CASE WHEN (SELECT n FROM ntp) > 0
                    THEN n_captured * 10000 // (SELECT n FROM ntp)
                    ELSE 0 END AS BIGINT) AS recall_bp
        FROM curve ORDER BY bands DESC"""
    )

    # dup_gap_histogram: first-to-second member gaps per LSH bucket
    # (2..128 docs), power-of-two buckets via binary-string length.
    sql["dup_gap_histogram"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        bandk AS (SELECT * FROM (VALUES {_BAND_VALUES}) AS t(b, am, ac)),
        sig AS (
          SELECT doc_id, b,
                 min(CAST(((CAST(CAST('0x' || substr(md5(s), 1, 15)
                      AS UBIGINT) AS HUGEINT)
                      * am + ac) % 18446744073709551616) // 16
                      AS BIGINT)) AS mh
          FROM sh, bandk
          GROUP BY doc_id, b
        ),
        r AS (SELECT b AS band, mh, doc_id,
                     row_number() OVER (PARTITION BY b, mh
                                        ORDER BY doc_id) AS rk,
                     count(*) OVER (PARTITION BY b, mh) AS c
              FROM sig),
        g AS (SELECT band, mh,
                     max(CASE WHEN rk = 2 THEN doc_id END)
                     - max(CASE WHEN rk = 1 THEN doc_id END) AS gap
              FROM r WHERE c BETWEEN 2 AND 128 AND rk <= 2
              GROUP BY 1, 2)
        SELECT CAST(length(printf('%b', gap)) - 1 AS BIGINT)
                 AS bucket_pow2,
               CAST(count(*) AS BIGINT) AS n_buckets
        FROM g GROUP BY 1 ORDER BY 1
    """

    # dedup_quality_shift: kept-vs-removed quality moments under the
    # spliced components assignment.
    sql["dedup_quality_shift"] = f"""
        WITH comp AS ({sql["dedup_components"].replace(
            "WITH w AS", "WITH RECURSIVE w AS", 1)}),
        q AS ({sql["quality_score"]}),
        j AS (SELECT CASE WHEN c.doc_id = c.component_id
                          THEN 'kept' ELSE 'removed' END AS grp,
                     q.quality_score AS qs
              FROM comp c JOIN q ON q.doc_id = c.doc_id)
        SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(qs) AS BIGINT) AS sum_q,
               CAST(sum(qs * qs) AS BIGINT) AS sum_q2,
               CAST(CASE WHEN count(*) > 0
                    THEN sum(qs) * 1000 // count(*) ELSE 0 END
                 AS BIGINT) AS mean_q_x1000
        FROM j GROUP BY 1 ORDER BY 1
    """

    # ranking_overlap_curve: overlap@k of the two length orderings.
    sql["ranking_overlap_curve"] = r"""
        WITH m AS (SELECT doc_id,
                          CAST(n_chars AS BIGINT) AS a,
                          CAST(len(regexp_extract_all(text, '\S+'))
                            AS BIGINT) AS b
                   FROM documents),
        ra AS (SELECT doc_id,
                      row_number() OVER (ORDER BY a DESC, doc_id)
                        AS rk
               FROM m),
        rb AS (SELECT doc_id,
                      row_number() OVER (ORDER BY b DESC, doc_id)
                        AS rk
               FROM m),
        ks AS (SELECT k FROM (VALUES (1), (2), (4), (8), (16), (32),
                              (64)) t(k)),
        ov AS (SELECT ks.k,
                      CAST(count(*) AS BIGINT) AS overlap
               FROM ks LEFT JOIN ra ON ra.rk <= ks.k
               JOIN rb ON rb.doc_id = ra.doc_id AND rb.rk <= ks.k
               GROUP BY 1)
        SELECT CAST(ks.k AS BIGINT) AS k,
               CAST(coalesce(ov.overlap, 0) AS BIGINT) AS overlap,
               CAST(coalesce(ov.overlap, 0) * 10000 // ks.k
                 AS BIGINT) AS overlap_bp
        FROM ks LEFT JOIN ov ON ov.k = ks.k
        ORDER BY 1
    """

    # code_switch_census: token-level language-tag switches; word
    # lists extracted from the same stopword patterns the Ray
    # kernels use (single source of truth).
    from readur_ray.functions.textstats import (
        LANG_PRIORITY as _LP,
        STOPWORD_PATTERNS as _SP,
    )

    _in_lists = {}
    for _lang in _LP:
        _ws = _SP[_lang][len(r"\b(?:"):-len(r")\b")].split("|")
        _in_lists[_lang] = ", ".join(f"'{w}'" for w in _ws)
    sql["code_switch_census"] = f"""
        WITH {_WORDS_CTE},
        tok AS (SELECT doc_id, t.i AS i, ws[i] AS wd
                FROM w, UNNEST(range(1, len(ws) + 1)) AS t(i)),
        tg AS (SELECT doc_id, i,
                      CASE WHEN wd IN ({_in_lists['en']}) THEN 1
                           WHEN wd IN ({_in_lists['de']}) THEN 2
                           WHEN wd IN ({_in_lists['fr']}) THEN 3
                           WHEN wd IN ({_in_lists['es']}) THEN 4
                           ELSE 0 END AS tag
               FROM tok),
        tt AS (SELECT doc_id, i, tag FROM tg WHERE tag > 0),
        sw AS (SELECT doc_id,
                      CASE WHEN tag <> lag(tag) OVER (
                             PARTITION BY doc_id ORDER BY i)
                           THEN 1 ELSE 0 END AS s
               FROM tt),
        pd_ AS (SELECT doc_id,
                       CAST(coalesce(sum(s), 0) AS BIGINT) AS sw
                FROM sw GROUP BY 1)
        SELECT CAST((SELECT count(*) FROM documents) AS BIGINT)
                 AS n_docs,
               CAST((SELECT count(*) FROM pd_) AS BIGINT)
                 AS n_tagged_docs,
               CAST((SELECT count(*) FROM pd_ WHERE sw > 0) AS BIGINT)
                 AS n_mixed_docs,
               CAST((SELECT coalesce(sum(sw), 0) FROM pd_) AS BIGINT)
                 AS total_switches,
               CAST((SELECT coalesce(max(sw), 0) FROM pd_) AS BIGINT)
                 AS max_switches
    """

    # histogram_quantile_error: equi-width decile estimates vs exact
    # order statistics.
    sql["histogram_quantile_error"] = """
        WITH vv AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5)
                      AS BIGINT) AS v FROM lineitem),
        h AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM vv
              GROUP BY 1),
        o AS (SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS BIGINT)
                AS cum
              FROM h),
        nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        mm AS (SELECT CAST(min(v) AS BIGINT) AS vmin,
                      CAST(max(v) AS BIGINT) AS vmax
               FROM h),
        wb AS (SELECT (vmax - vmin) // 64 + 1 AS w, vmin FROM mm),
        b AS (SELECT (h.v - wb.vmin) // wb.w AS b,
                     CAST(sum(h.c) AS BIGINT) AS bc
              FROM h, wb GROUP BY 1),
        bo AS (SELECT b, bc,
                      CAST(sum(bc) OVER (ORDER BY b) AS BIGINT)
                        AS bcum
               FROM b),
        dec AS (SELECT t.i, greatest(t.i * nn.n // 10, 1) AS k
                FROM range(1, 10) t(i), nn),
        pick AS (SELECT dec.i, dec.k,
                        (SELECT min(v) FROM o WHERE cum >= dec.k)
                          AS exact,
                        (SELECT min(b) FROM bo WHERE bcum >= dec.k)
                          AS bb
                 FROM dec),
        est AS (SELECT pick.i, pick.k, pick.exact, pick.bb,
                       (SELECT coalesce(max(bcum), 0) FROM bo
                        WHERE b < pick.bb) AS cum_before,
                       (SELECT bc FROM bo WHERE b = pick.bb) AS bcnt
                FROM pick)
        SELECT CAST(est.i AS BIGINT) AS decile,
               CAST(est.exact AS BIGINT) AS exact_value,
               CAST(wb.vmin + est.bb * wb.w
                    + (est.k - est.cum_before) * wb.w
                      // greatest(est.bcnt, 1) AS BIGINT)
                 AS est_value,
               CAST(abs(wb.vmin + est.bb * wb.w
                    + (est.k - est.cum_before) * wb.w
                      // greatest(est.bcnt, 1) - est.exact) AS BIGINT)
                 AS abs_err
        FROM est, wb ORDER BY 1
    """

    # simhash_jaccard_curve: hamming vs exact Jaccard pieces over
    # the truth pairs.
    sql["simhash_jaccard_curve"] = f"""
        WITH {_SIMHASH_CTE},
        pairs AS (SELECT doc_a, doc_b, intersection,
                         size_a + size_b - intersection AS u
                  FROM ({sql["ppjoin_exact"]})),
        m AS (SELECT p.intersection AS i, p.u,
                     CAST(bit_count(xor(
                       CAST('0x' || fa.simhash AS UBIGINT),
                       CAST('0x' || fb.simhash AS UBIGINT)))
                       AS BIGINT) AS hamming
              FROM pairs p
              JOIN fps fa ON fa.doc_id = p.doc_a
              JOIN fps fb ON fb.doc_id = p.doc_b)
        SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(i) AS BIGINT) AS sum_inter,
               CAST(sum(u) AS BIGINT) AS sum_union
        FROM m GROUP BY 1 ORDER BY 1
    """

    # random_failure_curve: census at deterministic edge survival.
    _rf_parts = [
        f"mk AS MATERIALIZED (SELECT vec_a, vec_b FROM ({sql['mutual_knn']}))",
    ]
    _rf_rows = []
    for _d in (1, 2, 4):
        _rf_parts.append(
            f"g_{_d} AS MATERIALIZED (SELECT vec_a AS a, vec_b AS b"
            f" FROM mk WHERE CAST('0x' || substr(md5("
            f"CAST(vec_a AS VARCHAR) || ':' || CAST(vec_b AS VARCHAR)"
            f"), 1, 15) AS BIGINT)"
            f" < CAST(1152921504606846976 AS BIGINT) / {_d})"
        )
        _rf_parts.append(
            f"e_{_d} AS MATERIALIZED (SELECT a AS src, b AS dst"
            f" FROM g_{_d} UNION ALL SELECT b, a FROM g_{_d})"
        )
        _rf_parts.append(
            f"r_{_d} AS (SELECT DISTINCT src AS doc, src AS lab"
            f" FROM e_{_d}"
            f" UNION SELECT e.src, r.lab FROM r_{_d} r"
            f" JOIN e_{_d} e ON e.dst = r.doc)"
        )
        _rf_parts.append(
            f"c_{_d} AS (SELECT doc, min(lab) AS comp FROM r_{_d}"
            f" GROUP BY 1)"
        )
        _rf_parts.append(
            f"s_{_d} AS (SELECT comp, count(*) AS sz FROM c_{_d}"
            f" GROUP BY 1)"
        )
        _rf_rows.append(
            f"SELECT CAST({_d} AS BIGINT) AS survive_den,"
            f" CAST((SELECT count(*) FROM g_{_d}) AS BIGINT)"
            f" AS n_edges,"
            f" CAST((SELECT count(*) FROM c_{_d}) AS BIGINT)"
            f" AS n_nodes,"
            f" CAST((SELECT count(*) FROM s_{_d}) AS BIGINT)"
            f" AS n_components,"
            f" CAST((SELECT coalesce(max(sz), 0) FROM s_{_d})"
            f" AS BIGINT) AS largest_component"
        )
    sql["random_failure_curve"] = (
        "WITH RECURSIVE "
        + ",\n".join(_rf_parts)
        + "\nSELECT * FROM ("
        + " UNION ALL ".join(_rf_rows)
        + ") ORDER BY survive_den"
    )

    # ring_vnode_balance: per-vnode-level ring placement census.
    _rv_parts = [
        "ks AS MATERIALIZED (SELECT CAST('0x' || substr(md5("
        "CAST(CAST(c_custkey AS BIGINT) AS VARCHAR)), 1, 15)"
        " AS BIGINT) AS u FROM customer)",
    ]
    _rv_rows = []
    for _v in (1, 4, 16, 64):
        _rv_parts.append(
            f"ring_{_v} AS MATERIALIZED (SELECT CAST('0x' || substr("
            f"md5(CAST(n.i AS VARCHAR) || ':' ||"
            f" CAST(r.j AS VARCHAR)), 1, 15) AS BIGINT) AS pos,"
            f" n.i AS node"
            f" FROM range(16) n(i), range({_v}) r(j))"
        )
        _rv_parts.append(
            f"asg_{_v} AS MATERIALIZED (SELECT coalesce("
            f" (SELECT node FROM ring_{_v}"
            f"  WHERE pos >= ks.u ORDER BY pos, node LIMIT 1),"
            f" (SELECT node FROM ring_{_v}"
            f"  ORDER BY pos, node LIMIT 1)) AS node"
            f" FROM ks)"
        )
        _rv_parts.append(
            f"ld_{_v} AS (SELECT t.i AS node,"
            f" CAST(coalesce(c.c, 0) AS BIGINT) AS load"
            f" FROM range(16) t(i) LEFT JOIN"
            f" (SELECT node, count(*) AS c FROM asg_{_v} GROUP BY 1) c"
            f" ON c.node = t.i)"
        )
        _rv_rows.append(
            f"SELECT CAST({_v} AS BIGINT) AS vnodes,"
            f" CAST((SELECT sum(load) FROM ld_{_v}) AS BIGINT)"
            f" AS n_keys,"
            f" CAST((SELECT max(load) FROM ld_{_v}) AS BIGINT)"
            f" AS max_load,"
            f" CAST((SELECT min(load) FROM ld_{_v}) AS BIGINT)"
            f" AS min_load,"
            f" CAST(((SELECT max(load) FROM ld_{_v})"
            f" - (SELECT min(load) FROM ld_{_v})) * 10000"
            f" // greatest((SELECT sum(load) FROM ld_{_v}) // 16, 1)"
            f" AS BIGINT) AS imbalance_bp"
        )
    sql["ring_vnode_balance"] = (
        "WITH "
        + ",\n".join(_rv_parts)
        + "\nSELECT * FROM ("
        + " UNION ALL ".join(_rv_rows)
        + ") ORDER BY vnodes"
    )

    # predicate_order_costs: exact short-circuit evaluation counts
    # for all 24 conjunct orders, from the shared enumeration.
    from readur_ray.pipelines.analytics import (
        PRED_ORDER_NAMES as _PON,
        predicate_order_sequences as _pos,
    )

    _po_subsets = set()
    for _os in _pos():
        _ps = _os.split(">")
        for _i in (1, 2, 3):
            _po_subsets.add(tuple(sorted(_ps[:_i])))
    _po_sums = ",\n          ".join(
        "CAST(sum({expr}) AS BIGINT) AS s_{name}".format(
            expr=" * ".join(sub), name="_".join(sub)
        )
        for sub in sorted(_po_subsets)
    )
    _po_rows = " UNION ALL ".join(
        "SELECT '{os}' AS order_str, n + {terms} AS evals FROM agg".format(
            os=_os,
            terms=" + ".join(
                "s_" + "_".join(sorted(_os.split(">")[:_i]))
                for _i in (1, 2, 3)
            ),
        )
        for _os in _pos()
    )
    sql["predicate_order_costs"] = f"""
        WITH f AS (SELECT
            CAST(l_returnflag = 'R' AS BIGINT) AS ret_r,
            CAST(l_quantity >= 25 AS BIGINT) AS qty_hi,
            CAST(floor(l_discount * 100 + 0.5) >= 5 AS BIGINT)
              AS disc_hi,
            CAST(l_linestatus = 'F' AS BIGINT) AS status_f
          FROM lineitem),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
          {_po_sums}
          FROM f)
        SELECT CAST(row_number() OVER (ORDER BY evals, order_str)
                 AS BIGINT) AS ord,
               order_str, CAST(evals AS BIGINT) AS evals
        FROM ({_po_rows})
        ORDER BY 1
    """

    # stream_disorder_profile: rank displacement histogram over the
    # order-level (orderkey vs first-ship-day) sequences.
    sql["stream_disorder_profile"] = """
        WITH e AS (SELECT CAST(l_orderkey AS BIGINT) AS ok,
                          CAST(min(date_diff('day',
                            DATE '1992-01-01',
                            CAST(l_shipdate AS DATE))) AS BIGINT)
                            AS day
                   FROM lineitem GROUP BY 1),
        r AS (SELECT row_number() OVER (ORDER BY ok) AS ra,
                     row_number() OVER (ORDER BY day, ok) AS rt
              FROM e),
        d AS (SELECT abs(ra - rt) AS d FROM r)
        SELECT CAST(CASE WHEN d = 0 THEN -1
                    ELSE length(printf('%b', d)) - 1 END AS BIGINT)
                 AS bucket_pow2,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM d GROUP BY 1 ORDER BY 1
    """
