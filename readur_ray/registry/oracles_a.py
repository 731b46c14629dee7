"""DuckDB oracle SQL, part A (statements moved
verbatim from __ray_entry__.oracle_sql round 5; wave order
preserved — see registry/__init__.py).
"""

from __future__ import annotations

from .common import (  # shared SQL fragments
    _BAND_VALUES, _SHINGLES_CTE, _SIMHASH_CTE, _STOP_DE,
    _STOP_EN, _STOP_ES, _STOP_FR, _WORDS_CTE,
)


def add(sql: dict) -> None:
    sql["plaintext_extract"] = r"""
        SELECT doc_id,
               trim(text) AS extracted,
               CAST(len(regexp_extract_all(trim(text), '\S+')) AS BIGINT) AS word_count,
               CAST(length(trim(text)) AS BIGINT) AS char_count,
               CAST(strlen(trim(text)) AS BIGINT) AS byte_len,
               sha256(trim(text)) AS text_sha256
        FROM documents
    """

    sql["extract_status"] = r"""
        SELECT doc_id,
               CASE WHEN fail THEN 'failed' ELSE 'completed' END AS status,
               CASE WHEN fail THEN 'low_ocr_confidence' ELSE '' END AS failure_reason,
               CASE WHEN fail THEN 0 ELSE wc END AS word_count
        FROM (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(t, '\S+')) AS BIGINT) AS wc,
                 (strlen(t) = 0 OR len(regexp_extract_all(t, '\S+')) = 0
                  OR len(regexp_extract_all(t, '[\pL\pN]')) * 10 < strlen(t) * 3) AS fail
          FROM (SELECT doc_id, trim(text) AS t FROM documents)
        )
    """

    sql["doc_metadata"] = r"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS char_count,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS word_count,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens,
               CAST(length(text) - length(replace(text, chr(10), '')) + 1 AS BIGINT) AS line_count
        FROM documents
    """

    sql["lang_id"] = f"""
        SELECT doc_id,
               CASE WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es
                         AND hits_en > 0 THEN 'en'
                    WHEN hits_de >= hits_fr AND hits_de >= hits_es AND hits_de > 0 THEN 'de'
                    WHEN hits_fr >= hits_es AND hits_fr > 0 THEN 'fr'
                    WHEN hits_es > 0 THEN 'es'
                    ELSE 'unknown' END AS pred_lang,
               hits_en, hits_de, hits_fr, hits_es
        FROM (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(lower(text), '{_STOP_EN}')) AS BIGINT) AS hits_en,
                 CAST(len(regexp_extract_all(lower(text), '{_STOP_DE}')) AS BIGINT) AS hits_de,
                 CAST(len(regexp_extract_all(lower(text), '{_STOP_FR}')) AS BIGINT) AS hits_fr,
                 CAST(len(regexp_extract_all(lower(text), '{_STOP_ES}')) AS BIGINT) AS hits_es
          FROM documents
        )
    """

    sql["quality_score"] = f"""
        SELECT doc_id, ws_tokens, chars, punct, digits, upper_count, hits_en,
               CAST((ws_tokens >= 20)::BIGINT + (10 * hits_en >= ws_tokens)::BIGINT
                  + (5 * punct <= chars)::BIGINT + (10 * digits <= chars)::BIGINT
                  AS BIGINT) AS quality_score
        FROM (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
                 CAST(length(text) AS BIGINT) AS chars,
                 CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS BIGINT) AS punct,
                 CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digits,
                 CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS upper_count,
                 CAST(len(regexp_extract_all(lower(text), '{_STOP_EN}')) AS BIGINT) AS hits_en
          FROM documents
        )
    """

    sql["fingerprints"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        agg AS (
          SELECT doc_id,
                 min(CAST('0x' || substr(md5(s), 1, 15) AS UBIGINT)) AS mn,
                 count(*) AS n
          FROM sh GROUP BY doc_id
        )
        SELECT w.doc_id,
               md5(array_to_string(w.ws, ' ')) AS fingerprint,
               CAST(coalesce(agg.mn, 0) AS BIGINT) AS min_shingle_hash,
               CAST(coalesce(agg.n, 0) AS BIGINT) AS n_shingles
        FROM w LEFT JOIN agg ON w.doc_id = agg.doc_id
    """

    sql["dedup_exact"] = """
        WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
        g AS (SELECT content_hash, min(doc_id) AS winner FROM h GROUP BY 1)
        SELECT h.doc_id, h.content_hash,
               CASE WHEN h.doc_id = g.winner THEN 'kept'
                    ELSE 'skipped_duplicate' END AS dedup_status,
               g.winner AS winner_doc_id
        FROM h JOIN g USING (content_hash)
    """

    sql["dedup_path"] = """
        WITH p AS (
          SELECT doc_id,
                 source || '/doc-' || CAST(doc_id % 13 AS VARCHAR) || '.txt' AS rel_path
          FROM documents
        ),
        g AS (SELECT rel_path, min(doc_id) AS winner FROM p GROUP BY 1)
        SELECT p.doc_id, p.rel_path,
               CASE WHEN p.doc_id = g.winner THEN 'kept'
                    ELSE 'skipped_duplicate_path' END AS dedup_status,
               g.winner AS winner_doc_id
        FROM p JOIN g USING (rel_path)
    """

    sql["dedup_minhash_lsh"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        bandk AS (SELECT * FROM (VALUES {_BAND_VALUES}) AS t(b, am, ac)),
        sig AS (
          SELECT doc_id, b,
                 min(CAST(((CAST(CAST('0x' || substr(md5(s), 1, 15) AS UBIGINT) AS HUGEINT)
                            * am + ac) % 18446744073709551616) // 16 AS BIGINT)) AS mh
          FROM sh, bandk
          GROUP BY doc_id, b
        ),
        sigf AS (
          SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY b, mh) AS bs FROM sig)
          WHERE bs <= 128
        )
        SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_shared_bands
        FROM sigf a JOIN sigf c
          ON a.b = c.b AND a.mh = c.mh AND a.doc_id < c.doc_id
        GROUP BY 1, 2
    """

    sql["dedup_components"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        bandk AS (SELECT * FROM (VALUES {_BAND_VALUES}) AS t(b, am, ac)),
        sig AS (
          SELECT doc_id, b,
                 min(CAST(((CAST(CAST('0x' || substr(md5(s), 1, 15) AS UBIGINT) AS HUGEINT)
                            * am + ac) % 18446744073709551616) // 16 AS BIGINT)) AS mh
          FROM sh, bandk
          GROUP BY doc_id, b
        ),
        sigf AS (
          SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY b, mh) AS bs FROM sig)
          WHERE bs <= 128
        ),
        e AS (
          SELECT DISTINCT a.doc_id AS src, c.doc_id AS dst
          FROM sigf a JOIN sigf c ON a.b = c.b AND a.mh = c.mh
          WHERE a.doc_id <> c.doc_id
        ),
        reach AS (
          SELECT doc_id AS doc, doc_id AS lab FROM documents
          UNION
          SELECT e.src AS doc, r.lab
          FROM reach r JOIN e ON e.dst = r.doc
        )
        SELECT doc AS doc_id, CAST(min(lab) AS BIGINT) AS component_id
        FROM reach GROUP BY 1
    """.replace("WITH w AS", "WITH RECURSIVE w AS")
    # ^ the marker must live on the BASE oracle too (wave 42 moved it
    # into the splices and broke the standalone query): DuckDB never
    # infers recursion. The splices' own replace() is then a no-op.

    # dedup_cluster_sizes: the component assignment binned by size.
    # The spliced subquery needs an explicit RECURSIVE marker — DuckDB
    # infers recursion for top-level CTE lists but not nested ones.
    sql["dedup_cluster_sizes"] = f"""
        WITH comp AS ({sql["dedup_components"].replace("WITH w AS", "WITH RECURSIVE w AS", 1)})
        SELECT CAST(sz AS BIGINT) AS size,
               CAST(count(*) AS BIGINT) AS n_components
        FROM (SELECT component_id, count(*) AS sz FROM comp GROUP BY 1)
        GROUP BY 1
    """

    # survivorship_merge: golden record per multi-member component —
    # the same spliced components CTE joined back to documents; the
    # canonical language is the (count DESC, lang ASC) row_number
    # winner, exactly the (n desc, lang asc) sort the Ray fold takes.
    sql["survivorship_merge"] = f"""
        WITH comp AS ({sql["dedup_components"].replace("WITH w AS", "WITH RECURSIVE w AS", 1)}),
        mem AS (
          SELECT c.component_id, d.doc_id, d.lang, d.n_chars
          FROM comp c JOIN documents d ON d.doc_id = c.doc_id
        ),
        sizes AS (
          SELECT component_id,
                 CAST(count(*) AS BIGINT) AS n_members,
                 CAST(min(doc_id) AS BIGINT) AS rep_id,
                 CAST(max(n_chars) AS BIGINT) AS max_chars
          FROM mem GROUP BY 1
        ),
        lc AS (
          SELECT component_id, lang, count(*) AS c
          FROM mem GROUP BY 1, 2
        ),
        best AS (
          SELECT component_id, lang AS canon_lang,
                 row_number() OVER (
                     PARTITION BY component_id ORDER BY c DESC, lang
                 ) AS rk
          FROM lc
        )
        SELECT s.component_id, s.rep_id, s.n_members, s.max_chars,
               b.canon_lang
        FROM sizes s
        JOIN best b ON b.component_id = s.component_id AND b.rk = 1
        WHERE s.n_members >= 2
    """

    # vocab_overlap: distinct (source, term) self-join on term
    sql["vocab_overlap"] = """
        WITH w AS (
          SELECT source,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents
        ),
        st AS (SELECT DISTINCT source, term FROM w),
        m AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY 1),
        p AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 CAST(count(*) AS BIGINT) AS inter
          FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT p.source_a, p.source_b, p.inter, ma.n AS n_a, mb.n AS n_b
        FROM p JOIN m ma ON ma.source = p.source_a
               JOIN m mb ON mb.source = p.source_b
    """.replace("WITH w AS", "WITH RECURSIVE w AS")

    # triangle participation over the same candidate edge set: wedges
    # around each edge's min endpoint (centers capped at degree 1024,
    # mirroring TRI_DEGREE_CAP), closed against the UNCAPPED edge set —
    # a triangle is counted iff its minimum vertex is under the cap
    sql["triangle_count"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        bandk AS (SELECT * FROM (VALUES {_BAND_VALUES}) AS t(b, am, ac)),
        sig AS (
          SELECT doc_id, b,
                 min(CAST(((CAST(CAST('0x' || substr(md5(s), 1, 15) AS UBIGINT) AS HUGEINT)
                            * am + ac) % 18446744073709551616) // 16 AS BIGINT)) AS mh
          FROM sh, bandk
          GROUP BY doc_id, b
        ),
        sigf AS (
          SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY b, mh) AS bs FROM sig)
          WHERE bs <= 128
        ),
        e AS (
          SELECT a.doc_id AS src, c.doc_id AS dst
          FROM sigf a JOIN sigf c
            ON a.b = c.b AND a.mh = c.mh AND a.doc_id < c.doc_id
          GROUP BY 1, 2
        ),
        ecap AS (
          SELECT src, dst FROM (
            SELECT src, dst, count(*) OVER (PARTITION BY src) AS deg FROM e
          ) WHERE deg <= 1024
        ),
        tri AS (
          SELECT v.x, v.y, v.z
          FROM (
            SELECT a.src AS x, a.dst AS y, b.dst AS z
            FROM ecap a JOIN ecap b ON a.src = b.src AND a.dst < b.dst
          ) v JOIN e ON e.src = v.y AND e.dst = v.z
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
        FROM (
          SELECT x AS doc_id FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri
        )
        GROUP BY 1
    """

    # exact Levenshtein verify of each candidate pair over 96-char
    # prefixes (DuckDB levenshtein is byte-based; the Ray kernel runs
    # the identical byte DP); is_dup = dist*10 <= max(prefix byte lens)
    sql["dedup_edit_distance"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        bandk AS (SELECT * FROM (VALUES {_BAND_VALUES}) AS t(b, am, ac)),
        sig AS (
          SELECT doc_id, b,
                 min(CAST(((CAST(CAST('0x' || substr(md5(s), 1, 15) AS UBIGINT) AS HUGEINT)
                            * am + ac) % 18446744073709551616) // 16 AS BIGINT)) AS mh
          FROM sh, bandk
          GROUP BY doc_id, b
        ),
        sigf AS (
          SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY b, mh) AS bs FROM sig)
          WHERE bs <= 128
        ),
        pairs AS (
          SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
          FROM sigf a JOIN sigf c
            ON a.b = c.b AND a.mh = c.mh AND a.doc_id < c.doc_id
          GROUP BY 1, 2
        ),
        pre AS (SELECT doc_id, substr(text, 1, 96) AS p FROM documents)
        SELECT doc_a, doc_b,
               CAST(d AS BIGINT) AS edit_distance,
               CAST((d * 10 <= mx)::BIGINT AS BIGINT) AS is_dup
        FROM (
          SELECT pr.doc_a, pr.doc_b,
                 levenshtein(x.p, y.p) AS d,
                 greatest(strlen(x.p), strlen(y.p)) AS mx
          FROM pairs pr
          JOIN pre x ON x.doc_id = pr.doc_a
          JOIN pre y ON y.doc_id = pr.doc_b
        )
    """

    sql["dedup_simhash"] = f"""
        WITH {_SIMHASH_CTE}
        SELECT doc_id, simhash FROM fps
    """

    sql["dedup_simhash_pairs"] = f"""
        WITH {_SIMHASH_CTE}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(CAST('0x' || a.simhash AS UBIGINT),
                                  CAST('0x' || b.simhash AS UBIGINT))) AS BIGINT) AS hamming
        FROM fps a, fps b
        WHERE a.doc_id < b.doc_id
          AND bit_count(xor(CAST('0x' || a.simhash AS UBIGINT),
                            CAST('0x' || b.simhash AS UBIGINT))) <= 3
    """

    sql["dedup_simhash_banded"] = sql["dedup_simhash_pairs"]

    sql["dedup_ngram_jaccard"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        szs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
        shf AS (
          SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY s) AS sc FROM sh)
          WHERE sc <= 32
        ),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(count(*) AS BIGINT) AS intersection
          FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, intersection, sa.n AS size_a, sb.n AS size_b
        FROM inter
        JOIN szs sa ON doc_a = sa.doc_id
        JOIN szs sb ON doc_b = sb.doc_id
        WHERE intersection * 10 >= (sa.n + sb.n - intersection) * 1
    """

    # ppjoin_exact: the EXACT Jaccard ≥ 1/2 self-join — no hot-shingle
    # drop, no banding; the prefix filter on the Ray side is pruning
    # only, so the oracle is the plain inverted-index self-join
    sql["ppjoin_exact"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        szs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(count(*) AS BIGINT) AS intersection
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, intersection, sa.n AS size_a, sb.n AS size_b
        FROM inter
        JOIN szs sa ON doc_a = sa.doc_id
        JOIN szs sb ON doc_b = sb.doc_id
        WHERE intersection * 2 >= (sa.n + sb.n - intersection) * 1
    """

    # data_quality_audit: one row per constraint check with its exact
    # violation count — range/format, uniqueness, referential, and the
    # cross-table date-order rule
    sql["data_quality_audit"] = """
        SELECT 'lineitem_discount_range' AS check_name,
               CAST(coalesce(sum(CASE WHEN l_discount < 0 OR l_discount > 1
                                      THEN 1 END), 0) AS BIGINT) AS n_violations
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_nonpositive_price',
               CAST(coalesce(sum(CASE WHEN l_extendedprice <= 0 THEN 1 END), 0)
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'orders_invalid_status',
               CAST(coalesce(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                                      THEN 1 END), 0) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'events_null_props',
               CAST(coalesce(sum(CASE WHEN props IS NULL OR props = ''
                                      THEN 1 END), 0) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'orders_dup_pk',
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'customer_dup_pk',
               CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
        FROM customer
        UNION ALL
        SELECT 'orders_orphan_custkey',
               CAST((SELECT count(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey))
                    AS BIGINT)
        UNION ALL
        SELECT 'lineitem_orphan_orderkey',
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT)
        UNION ALL
        SELECT 'lineitem_ship_before_order',
               CAST((SELECT count(*) FROM lineitem l
                     JOIN orders o ON l.l_orderkey = o.o_orderkey
                     WHERE l.l_shipdate < o.o_orderdate) AS BIGINT)
    """

    # bm25_scores: rational-idf BM25 in exact fixed-point integers —
    # k1 = 6/5 and b = 3/4 folded into the 44/20/6/18 coefficients
    # (multiply numerator and denominator by 20T); HUGEINT intermediates
    sql["bm25_scores"] = f"""
        WITH {_WORDS_CTE},
        dl AS (SELECT doc_id, len(ws) AS dl FROM w),
        tok AS (SELECT doc_id, unnest(ws) AS t FROM w),
        q AS (SELECT * FROM (VALUES ('hash'), ('merge'), ('scan'), ('table'))
              AS q(term)),
        stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                         (SELECT sum(dl) FROM dl) AS n_tok),
        dft AS (SELECT t AS term, count(DISTINCT tok.doc_id) AS df
                FROM tok JOIN q ON q.term = tok.t GROUP BY 1),
        tft AS (SELECT doc_id, t AS term, count(*) AS tf
                FROM tok JOIN q ON q.term = tok.t GROUP BY 1, 2),
        parts AS (
          SELECT tft.doc_id,
                 CAST(
                   (CAST(2*n_docs - 2*df + 1 AS HUGEINT)
                      * (44 * tf * n_tok) * 1000000)
                   // (CAST(2*df + 1 AS HUGEINT)
                      * (20 * tf * n_tok + 6 * n_tok + 18 * dl.dl * n_docs))
                 AS BIGINT) AS s
          FROM tft JOIN dft USING (term)
          JOIN dl ON dl.doc_id = tft.doc_id, stats
        )
        SELECT doc_id, CAST(sum(s) AS BIGINT) AS bm25_fp
        FROM parts GROUP BY 1
    """

    # window_dedup: keep-first per (user, type, hour) tumbling window,
    # ties on (ts, event_id)
    sql["window_dedup"] = """
        SELECT event_id, user_id, event_type, ts FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, event_type, date_trunc('hour', ts)
            ORDER BY ts, event_id) AS rn
          FROM events
        ) WHERE rn = 1
    """

    # profile_columns: per-column exact min/max/nulls/ndv over the
    # same integer projections as the Ray kernels (cents for money,
    # raw int for keys)
    sql["profile_columns"] = """
        SELECT 'l_quantity' AS "column", 'min' AS stat,
               CAST(min(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS value FROM lineitem
        UNION ALL SELECT 'l_quantity', 'max',
               CAST(max(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
               FROM lineitem
        UNION ALL SELECT 'l_quantity', 'nulls',
               CAST(count(*) - count(l_quantity) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'l_quantity', 'ndv',
               CAST(count(DISTINCT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                    AS BIGINT) FROM lineitem
        UNION ALL SELECT 'l_extendedprice', 'min',
               CAST(min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) FROM lineitem
        UNION ALL SELECT 'l_extendedprice', 'max',
               CAST(max(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) FROM lineitem
        UNION ALL SELECT 'l_extendedprice', 'nulls',
               CAST(count(*) - count(l_extendedprice) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'l_extendedprice', 'ndv',
               CAST(count(DISTINCT CAST(floor(l_extendedprice * 100 + 0.5)
                    AS BIGINT)) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'l_partkey', 'min', CAST(min(l_partkey) AS BIGINT)
               FROM lineitem
        UNION ALL SELECT 'l_partkey', 'max', CAST(max(l_partkey) AS BIGINT)
               FROM lineitem
        UNION ALL SELECT 'l_partkey', 'nulls',
               CAST(count(*) - count(l_partkey) AS BIGINT) FROM lineitem
        UNION ALL SELECT 'l_partkey', 'ndv',
               CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem
    """

    # mad_outliers: exact discrete median + MAD per type, outliers at
    # |x - med| > 3*MAD (all integer cents)
    sql["mad_outliers"] = """
        WITH c AS (SELECT event_type,
                          CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                   FROM events),
        med AS (SELECT event_type, quantile_disc(cents, 0.5) AS m
                FROM c GROUP BY 1),
        mad AS (SELECT c.event_type, quantile_disc(abs(cents - m), 0.5) AS d
                FROM c JOIN med USING (event_type) GROUP BY 1)
        SELECT c.event_type,
               CAST(m AS BIGINT) AS median_cents,
               CAST(d AS BIGINT) AS mad_cents,
               CAST(coalesce(sum(CASE WHEN abs(cents - m) > 3 * d THEN 1 END), 0)
                    AS BIGINT) AS n_outliers
        FROM c JOIN med USING (event_type) JOIN mad USING (event_type)
        GROUP BY 1, m, d
    """

    # snm_pairs: global (key, doc_id) sort ranks, pairs within the
    # SNM window — key = lang | first 12 chars of lowercased text
    sql["snm_pairs"] = """
        WITH k AS (
          SELECT doc_id, lang || '|' || substr(lower(text), 1, 12) AS key
          FROM documents
        ),
        r AS (
          SELECT doc_id, ROW_NUMBER() OVER (ORDER BY key, doc_id) - 1 AS rnk
          FROM k
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(b.rnk - a.rnk AS BIGINT) AS rank_dist
        FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 3
    """

    # skyline_users: 2-D Pareto maxima on (n_events, total_cents) —
    # dominated iff another user is >= on both and > on at least one
    sql["skyline_users"] = """
        WITH agg AS (
          SELECT user_id,
                 CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS total_cents
          FROM events GROUP BY 1
        )
        SELECT user_id, n_events, total_cents
        FROM agg u
        WHERE NOT EXISTS (
          SELECT 1 FROM agg v
          WHERE v.n_events >= u.n_events AND v.total_cents >= u.total_cents
            AND (v.n_events > u.n_events OR v.total_cents > u.total_cents))
    """

    sql["dedup_embedding"] = """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.4
    """

    sql["ann_topk"] = """
        SELECT query_id, neighbor_id, rank FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 CAST(row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                   CAST(e.embedding AS DOUBLE[])) DESC,
                            e.vec_id ASC
                 ) AS BIGINT) AS rank
          FROM embeddings q, embeddings e
          WHERE q.vec_id < 16 AND e.vec_id <> q.vec_id
        ) WHERE rank <= 5
    """

    sql["ann_lsh_buckets"] = """
        SELECT e.vec_id,
               string_agg(CASE WHEN list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                           CAST(a.embedding AS DOUBLE[])) > 0
                          THEN '1' ELSE '0' END, '' ORDER BY a.vec_id) AS bucket
        FROM embeddings e, embeddings a
        WHERE a.vec_id >= 16 AND a.vec_id < 24
        GROUP BY e.vec_id
    """

    sql["ann_topk_lsh"] = """
        WITH b AS (
          SELECT e.vec_id,
                 string_agg(CASE WHEN list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                             CAST(a.embedding AS DOUBLE[])) > 0
                            THEN '1' ELSE '0' END, '' ORDER BY a.vec_id) AS bucket
          FROM embeddings e, embeddings a
          WHERE a.vec_id >= 16 AND a.vec_id < 24
          GROUP BY e.vec_id
        )
        SELECT query_id, neighbor_id, rank FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 CAST(row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                   CAST(e.embedding AS DOUBLE[])) DESC,
                            e.vec_id ASC
                 ) AS BIGINT) AS rank
          FROM embeddings q, embeddings e, b qb, b eb
          WHERE q.vec_id < 16 AND e.vec_id <> q.vec_id
            AND qb.vec_id = q.vec_id AND eb.vec_id = e.vec_id
            AND qb.bucket = eb.bucket
        ) WHERE rank <= 5
    """

    sql["status_counts"] = """
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders GROUP BY 1
    """

    sql["source_facets"] = """
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1, 2
    """

    sql["hourly_event_metrics"] = """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
        FROM events GROUP BY 1, 2
    """

    # hll_registers: exact-integer HyperLogLog registers; rho via the
    # binary-string length of the 52-bit suffix (bin() drops leading
    # zeros, so len(bin(x)) IS bit_length(x))
    sql["hll_registers"] = """
        WITH h AS (
          SELECT DISTINCT
                 CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                      AS UBIGINT) AS BIGINT) AS h
          FROM events
        ),
        r AS (
          SELECT h // 4503599627370496 AS bucket,
                 h % 4503599627370496 AS suffix
          FROM h
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(max(CASE WHEN suffix = 0 THEN 53
                        ELSE 52 - len(bin(CAST(suffix AS UBIGINT))) + 1 END)
                    AS BIGINT) AS max_rho
        FROM r GROUP BY 1
    """

    sql["distinct_users_daily"] = """
        SELECT date_trunc('day', ts) AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1
    """

    # cms_registers: Count-Min rows via Kirsch-Mitzenmacher double
    # hashing of one md5 (h1 + d*h2 < 4*2^60 — BIGINT-safe)
    sql["cms_registers"] = """
        WITH h AS (
          SELECT CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                      AS UBIGINT) AS BIGINT) AS h1,
                 CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 16, 15)
                      AS UBIGINT) AS BIGINT) AS h2
          FROM events
        )
        SELECT d.d AS row_d, (h1 + d.d * h2) % 256 AS pos,
               CAST(count(*) AS BIGINT) AS count
        FROM h CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS d) d
        GROUP BY 1, 2
    """

    # hist_quantiles: log2-histogram bins via bin()-string length
    # (bin() drops leading zeros, so len(bin(x)) IS bit_length(x));
    # quantile rank in pure integers: smallest bin with 100*cum >= q*n
    sql["hist_quantiles"] = """
        WITH b AS (
          SELECT event_type,
                 CASE WHEN cents <= 0 THEN 0
                      ELSE CAST(len(bin(CAST(cents AS UBIGINT))) AS BIGINT) END AS bin
          FROM (SELECT event_type,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                FROM events)
        ),
        g AS (SELECT event_type, bin, count(*) AS n FROM b GROUP BY 1, 2),
        cum AS (
          SELECT event_type, bin,
                 sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
                 sum(n) OVER (PARTITION BY event_type) AS total
          FROM g
        )
        SELECT event_type,
               CAST(max(total) AS BIGINT) AS n_events,
               CAST(min(CASE WHEN 100 * cum >= 50 * total THEN bin END) AS BIGINT) AS p50_bin,
               CAST((1 << min(CASE WHEN 100 * cum >= 50 * total THEN bin END)) - 1 AS BIGINT) AS p50_upper,
               CAST(min(CASE WHEN 100 * cum >= 90 * total THEN bin END) AS BIGINT) AS p90_bin,
               CAST((1 << min(CASE WHEN 100 * cum >= 90 * total THEN bin END)) - 1 AS BIGINT) AS p90_upper,
               CAST(min(CASE WHEN 100 * cum >= 99 * total THEN bin END) AS BIGINT) AS p99_bin,
               CAST((1 << min(CASE WHEN 100 * cum >= 99 * total THEN bin END)) - 1 AS BIGINT) AS p99_upper
        FROM cum GROUP BY 1
    """

    # bloom_gate: prior = even doc_id, probes = odd; k=3 double-hashed
    # probe positions per Kirsch-Mitzenmacher; maybe_dup = ALL set
    sql["bloom_gate"] = """
        WITH h AS (
          SELECT doc_id,
                 CAST(CAST('0x' || substr(md5(text), 1, 15) AS UBIGINT) AS BIGINT) AS h1,
                 CAST(CAST('0x' || substr(md5(text), 16, 15) AS UBIGINT) AS BIGINT) AS h2
          FROM documents
        ),
        probes AS (
          SELECT doc_id, h1 % 8 AS part, (h1 + i.i * h2) % 256 AS pos
          FROM h CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) i
        ),
        bits AS (SELECT DISTINCT part, pos FROM probes WHERE doc_id % 2 = 0)
        SELECT p.doc_id,
               CAST(min(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS maybe_dup
        FROM probes p LEFT JOIN bits b ON b.part = p.part AND b.pos = p.pos
        WHERE p.doc_id % 2 = 1
        GROUP BY p.doc_id
    """

    # bottomk_sample: global bottom-k by md5 priority (ties by doc_id;
    # md5 collisions are the only tie source — practically impossible,
    # deterministic anyway)
    sql["bottomk_sample"] = """
        SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS priority
        FROM documents
        ORDER BY priority, doc_id
        LIMIT 100
    """

    # status_rollup: lvl mirrors GROUPING(event_type)*2 + GROUPING(day)
    sql["status_rollup"] = """
        WITH b AS (
          SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events
        )
        SELECT COALESCE(event_type, '(all)') AS event_type,
               COALESCE(day, '(all)') AS day,
               CAST(GROUPING(event_type) * 2 + GROUPING(day) AS BIGINT) AS lvl,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM b GROUP BY ROLLUP(event_type, day)
    """

    # late_data_watermark: watermark = running max ts over events that
    # arrived (event_id order) strictly before this one, minus 600 s;
    # integer microseconds so no float crosses the boundary
    sql["late_data_watermark"] = """
        WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us FROM events),
        w AS (
          SELECT event_id, ts_us,
                 max(ts_us) OVER (ORDER BY event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS wm
          FROM e
        )
        SELECT event_id,
               CAST(CASE WHEN wm IS NOT NULL AND ts_us < wm - 600000000
                         THEN 1 ELSE 0 END AS BIGINT) AS late
        FROM w
    """

    # audio_features: mirrors the deterministic fake decode —
    # n_samples = 8000 + md5(ref)[0:8] % 160000, window energy =
    # md5(ref ':' w)[0:8] % 1e6 over ceil(n_samples/4000) windows
    sql["audio_features"] = """
        WITH s AS (
          SELECT doc_id,
                 'audio://' || CAST(doc_id AS VARCHAR) AS ref,
                 8000 + CAST(CAST('0x' || substr(
                     md5('audio://' || CAST(doc_id AS VARCHAR)), 1, 8)
                     AS UBIGINT) AS BIGINT) % 160000 AS n_samples
          FROM documents
        ),
        w AS (SELECT doc_id, ref, n_samples,
                     (n_samples + 3999) // 4000 AS n_windows
              FROM s),
        e AS (
          SELECT doc_id, n_samples, n_windows,
                 CAST(CAST('0x' || substr(
                     md5(ref || ':' || CAST(wi AS VARCHAR)), 1, 8)
                     AS UBIGINT) AS BIGINT) % 1000000 AS energy
          FROM w, UNNEST(range(n_windows)) AS t(wi)
        )
        SELECT doc_id,
               CAST(max(n_samples) AS BIGINT) AS n_samples,
               CAST(max(n_windows) AS BIGINT) AS n_windows,
               CAST(sum(energy) AS BIGINT) AS total_energy,
               CAST(max(energy) AS BIGINT) AS peak_energy
        FROM e GROUP BY doc_id
    """

    # percentile_rank: SQL RANK() ties == 1 + count of strictly-smaller
    # keys, exactly the bucket-prefix + searchsorted(left) arithmetic
    sql["percentile_rank"] = """
        SELECT doc_id, source, n_chars,
               CAST(rank() OVER (PARTITION BY source ORDER BY n_chars)
                    AS BIGINT) AS rnk,
               CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_source
        FROM documents
    """

    # gini_sources: Σ(2·rn − n − 1)·x over the ascending per-source
    # sort is tie-order invariant, so ROW_NUMBER's arbitrary-but-
    # deterministic tie order matches the Ray side's bucket-local sort
    sql["gini_sources"] = """
        WITH r AS (
            SELECT source, n_chars,
                   row_number() OVER (PARTITION BY source ORDER BY n_chars)
                       AS rn,
                   count(*) OVER (PARTITION BY source) AS n
            FROM documents
        )
        SELECT source,
               CAST(max(n) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_x,
               CAST(sum((2*rn - n - 1) * n_chars) AS BIGINT) AS gini_num
        FROM r GROUP BY source
    """

    # ks_drift: exact integer KS numerator — at every global distinct
    # value v, |n_all·cum_s(v) − n_s·cum_all(v)|, maxed per source
    sql["ks_drift"] = """
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
                   ) AS BIGINT) AS cum_s
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
               CAST(max(abs(alln.n_all * sc.cum_s - tot.n_s * sc.cum_all))
                    AS BIGINT) AS ks_num
        FROM sc JOIN tot ON tot.source = sc.source CROSS JOIN alln
        GROUP BY sc.source
    """

    # pivot_daily: the event_type domain is stable across sf dirs
    # (click/error/purchase/signup/view); the Ray side discovers it
    # with a distinct scan and emits the same fixed columns
    sql["pivot_daily"] = """
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
               CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
               CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
               CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
               CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
               CAST(count(*) AS BIGINT) AS n_total
        FROM events GROUP BY 1
    """

    # order_priority_join: inner fact-fact join on orderkey; revenue
    # in exact integer cents of l_extendedprice
    sql["order_priority_join"] = """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """

    sql["orders_per_nation"] = """
        SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1
    """

    sql["pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS count_order,
               CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents
        FROM lineitem GROUP BY 1, 2
    """

    sql["top_docs"] = """
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id ASC LIMIT 10
    """

    sql["priority_buckets"] = """
        SELECT doc_id, n_chars,
               CAST(CASE WHEN n_chars <= 1024 THEN 10
                         WHEN n_chars <= 5120 THEN 8
                         WHEN n_chars <= 10240 THEN 6
                         WHEN n_chars <= 51200 THEN 4
                         ELSE 2 END AS BIGINT) AS priority
        FROM documents
    """

    sql["filter_allowed"] = """
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars
        FROM documents
        WHERE n_chars BETWEEN 100 AND 2000 AND source NOT IN ('src13', 'src7')
        GROUP BY 1
    """

    sql["label_facets"] = """
        SELECT 'label-' || CAST((doc_id + k) % 7 AS VARCHAR) AS label,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(doc_id) AS BIGINT) AS min_doc,
               CAST(max(doc_id) AS BIGINT) AS max_doc
        FROM documents, UNNEST(range(0, 3)) t(k)
        WHERE k < doc_id % 3 + 1
        GROUP BY 1
    """

    sql["multimodal_meta"] = """
        SELECT doc_id, width, height,
               CASE WHEN greatest(width, height) > 512
                    THEN (width * 512) // greatest(width, height) ELSE width END AS resized_w,
               CASE WHEN greatest(width, height) > 512
                    THEN (height * 512) // greatest(width, height) ELSE height END AS resized_h,
               n_frames,
               (n_frames + 6) // 7 AS n_sampled_frames,
               feat_checksum
        FROM (
          SELECT doc_id,
                 CAST(256 + CAST('0x' || substr(md5(text), 1, 8) AS UBIGINT) % 1792 AS BIGINT) AS width,
                 CAST(256 + CAST('0x' || substr(md5(text), 9, 8) AS UBIGINT) % 1792 AS BIGINT) AS height,
                 CAST(1 + CAST('0x' || substr(md5(text), 17, 8) AS UBIGINT) % 240 AS BIGINT) AS n_frames,
                 CAST(CAST('0x' || substr(md5(text), 25, 8) AS UBIGINT) AS BIGINT) AS feat_checksum
          FROM documents
        )
    """


    sql["preprocess_stats"] = """
        WITH dims AS (
          SELECT doc_id,
                 CAST(64 + CAST('0x' || substr(md5(text), 1, 8) AS UBIGINT) % 320 AS BIGINT) AS width,
                 CAST(64 + CAST('0x' || substr(md5(text), 9, 8) AS UBIGINT) % 320 AS BIGINT) AS height
          FROM documents
        ),
        rot AS (
          SELECT doc_id, width, height,
                 CAST(width AS DOUBLE) / height > 2.0 AS rotated,
                 CASE WHEN CAST(width AS DOUBLE) / height > 2.0 THEN height ELSE width END AS w2,
                 CASE WHEN CAST(width AS DOUBLE) / height > 2.0 THEN width ELSE height END AS h2
          FROM dims
        ),
        sc AS (
          SELECT *, CASE WHEN greatest(w2, h2) > 2048 THEN 2048.0 / greatest(w2, h2)
                         WHEN least(w2, h2) < 300 THEN 600.0 / least(w2, h2)
                         ELSE 1.0 END AS scale
          FROM rot
        )
        SELECT doc_id, width, height, rotated,
               scale <> 1.0 AS resized,
               greatest(1, CAST(trunc(w2 * scale) AS BIGINT)) AS out_w,
               greatest(1, CAST(trunc(h2 * scale) AS BIGINT)) AS out_h
        FROM sc
    """

    sql["text_search"] = """
        SELECT doc_id,
               CAST((length(text) - length(replace(text, 'spark', ''))) / 5 AS BIGINT) AS n_hits,
               strpos(text, 'spark') > 0 AS match_simple,
               strpos(text, 'the table') > 0 AS match_phrase,
               (strpos(text, 'table') > 0 AND strpos(text, 'value') > 0) AS match_boolean
        FROM documents
    """

    sql["search_ranked"] = """
        SELECT doc_id, rank_score, rnk FROM (
          SELECT doc_id, rank_score,
                 CAST(row_number() OVER (ORDER BY rank_score DESC, doc_id ASC)
                      AS BIGINT) AS rnk
          FROM (
            SELECT doc_id,
                   CAST(10 * (length(text) - length(replace(text, 'spark', ''))) / 5
                      +  5 * (length(text) - length(replace(text, 'table', ''))) / 5
                      +      (length(text) - length(replace(text, 'value', ''))) / 5
                        AS BIGINT) AS rank_score
            FROM documents
          ) WHERE rank_score > 0
        ) WHERE rnk > 20 AND rnk <= 40
    """

    sql["search_snippets"] = """
        SELECT doc_id,
               CAST(strpos(text, 'spark') - 1 AS BIGINT) AS position,
               substr(text, greatest(1, strpos(text, 'spark') - 30), 65) AS snippet,
               CAST(strpos(text, 'spark') - greatest(1, strpos(text, 'spark') - 30) AS BIGINT) AS highlight_offset
        FROM documents
        WHERE strpos(text, 'spark') > 0
    """

    sql["suppression_antijoin"] = """
        SELECT doc_id, md5(text) AS content_hash
        FROM documents
        WHERE md5(text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id % 50 = 0)
    """

    sql["incremental_filter"] = """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_new
        FROM events
        WHERE ts > TIMESTAMP '2024-01-20 00:00:00'
        GROUP BY 1
    """

    sql["queue_stats"] = r"""
        WITH es AS (
          SELECT doc_id,
                 CASE WHEN fail THEN 'failed' ELSE 'completed' END AS status,
                 CASE WHEN fail THEN 'low_ocr_confidence' ELSE '' END AS failure_reason,
                 CASE WHEN fail THEN 0 ELSE wc END AS word_count
          FROM (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t, '\S+')) AS BIGINT) AS wc,
                   (strlen(t) = 0 OR len(regexp_extract_all(t, '\S+')) = 0
                    OR len(regexp_extract_all(t, '[\pL\pN]')) * 10 < strlen(t) * 3) AS fail
            FROM (SELECT doc_id, trim(text) AS t FROM documents)
          )
        )
        SELECT status, failure_reason,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(word_count) AS BIGINT) AS total_words
        FROM es GROUP BY 1, 2
    """


    sql["fuzzy_search"] = """
        WITH q AS (
          SELECT list_distinct(list_transform(range(1, length(s)-1),
                 i -> substr(s, i, 3))) AS g
          FROM (SELECT lower('spark query plan') AS s)
        ),
        d AS (
          SELECT doc_id,
                 CASE WHEN length(t) < 3 THEN
                        (CASE WHEN length(t) = 0 THEN [] ELSE [t] END)
                      ELSE list_distinct(list_transform(range(1, length(t)-1),
                           i -> substr(t, i, 3))) END AS g
          FROM (SELECT doc_id, lower(text) AS t FROM documents)
        )
        SELECT doc_id,
               CAST(len(list_intersect(d.g, q.g)) AS BIGINT) AS intersection,
               CAST(len(d.g) AS BIGINT) AS n_doc_trigrams
        FROM d, q
        WHERE len(list_intersect(d.g, q.g)) * 100 >=
              (len(d.g) + len(q.g) - len(list_intersect(d.g, q.g))) * 3
    """

    sql["retry_selection"] = """
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE lang IN ('en', 'de') AND n_chars BETWEEN 200 AND 1500
          AND source LIKE 'src1%'
        ORDER BY doc_id LIMIT 50
    """

    sql["mime_detection"] = """
        SELECT doc_id, detected_mime, server_mime,
               (server_mime <> '' AND (
                  detected_mime = server_mime
                  OR (detected_mime = 'image/jpeg' AND server_mime = 'image/jpg')
                  OR (detected_mime = 'image/jpg' AND server_mime = 'image/jpeg')
                  OR split_part(detected_mime, '/', 1) = split_part(server_mime, '/', 1)
               )) AS compatible
        FROM (
          SELECT doc_id,
                 CASE doc_id % 5
                   WHEN 0 THEN 'application/pdf'
                   WHEN 1 THEN 'image/png'
                   WHEN 2 THEN 'image/jpeg'
                   WHEN 3 THEN 'application/zip'
                   ELSE CASE WHEN srv NOT IN ('application/octet-stream',
                                'application/binary', 'binary/octet-stream',
                                '', 'unknown')
                             THEN srv ELSE 'text/plain' END
                 END AS detected_mime,
                 srv AS server_mime
          FROM (
            SELECT doc_id,
                   ['application/pdf', 'application/octet-stream', 'image/jpg',
                    '', 'text/plain'][CAST((doc_id // 5) % 5 AS INT) + 1] AS srv
            FROM documents
          )
        )
    """


    sql["sessionize"] = """
        WITH m AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 30 * 60 * 1000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events
        ),
        s AS (
          SELECT user_id, ts,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_no
          FROM m
        )
        SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
               min(ts) AS session_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us
        FROM s GROUP BY 1, 2
    """


    sql["ann_topk_ivf_kmeans"] = """
        WITH qv AS (
          SELECT vec_id, dim,
                 CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 1000000 + 0.5)
                      AS BIGINT) AS q
          FROM embeddings, UNNEST(range(0, 64)) t(dim)
        ),
        seed AS (
          SELECT vec_id - 16 AS c, dim, q FROM qv
          WHERE vec_id BETWEEN 16 AND 23
        ),
        d0 AS (
          SELECT v.vec_id, s.c, sum((v.q - s.q) * (v.q - s.q)) AS d2
          FROM qv v JOIN seed s USING (dim) GROUP BY 1, 2
        ),
        a0 AS (
          SELECT vec_id, c FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
            FROM d0) WHERE rn = 1
        ),
        cent1 AS (
          SELECT a0.c, qv.dim, CAST(sum(qv.q) // count(*) AS BIGINT) AS q
          FROM qv JOIN a0 USING (vec_id) GROUP BY 1, 2
        ),
        cent1f AS (  -- empty cells keep the previous centroid
          SELECT s.c, s.dim, coalesce(c1.q, s.q) AS q
          FROM seed s LEFT JOIN cent1 c1 ON c1.c = s.c AND c1.dim = s.dim
        ),
        d1 AS (
          SELECT v.vec_id, cn.c, sum((v.q - cn.q) * (v.q - cn.q)) AS d2
          FROM qv v JOIN cent1f cn USING (dim) GROUP BY 1, 2
        ),
        a1 AS (
          SELECT vec_id, c FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
            FROM d1) WHERE rn = 1
        ),
        cent2 AS (
          SELECT a1.c, qv.dim, CAST(sum(qv.q) // count(*) AS BIGINT) AS q
          FROM qv JOIN a1 USING (vec_id) GROUP BY 1, 2
        ),
        cent2f AS (
          SELECT f.c, f.dim, coalesce(c2.q, f.q) AS q
          FROM cent1f f LEFT JOIN cent2 c2 ON c2.c = f.c AND c2.dim = f.dim
        ),
        d2c AS (
          SELECT v.vec_id, cn.c, sum((v.q - cn.q) * (v.q - cn.q)) AS d2
          FROM qv v JOIN cent2f cn USING (dim) GROUP BY 1, 2
        ),
        a2 AS (
          SELECT vec_id, c FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
            FROM d2c) WHERE rn = 1
        ),
        pd AS (
          SELECT x.vec_id AS query_id, y.vec_id AS neighbor_id,
                 sum((x.q - y.q) * (x.q - y.q)) AS d2
          FROM qv x
          JOIN a2 ax ON ax.vec_id = x.vec_id
          JOIN a2 ay ON TRUE
          JOIN qv y ON y.vec_id = ay.vec_id AND y.dim = x.dim
          WHERE x.vec_id < 16 AND y.vec_id <> x.vec_id AND ax.c = ay.c
          GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, rank FROM (
          SELECT query_id, neighbor_id,
                 CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY d2 ASC, neighbor_id ASC
                 ) AS BIGINT) AS rank
          FROM pd) WHERE rank <= 5
    """

    # multi-probe variant: same trained centroids; each query probes
    # its top-2 cells, data vectors stay in their single a2 cell
    sql["ann_topk_ivf_kmeans_probe2"] = sql["ann_topk_ivf_kmeans"].replace(
        """        pd AS (
          SELECT x.vec_id AS query_id, y.vec_id AS neighbor_id,
                 sum((x.q - y.q) * (x.q - y.q)) AS d2
          FROM qv x
          JOIN a2 ax ON ax.vec_id = x.vec_id
          JOIN a2 ay ON TRUE
          JOIN qv y ON y.vec_id = ay.vec_id AND y.dim = x.dim
          WHERE x.vec_id < 16 AND y.vec_id <> x.vec_id AND ax.c = ay.c
          GROUP BY 1, 2
        )""",
        """        qp AS (
          SELECT vec_id, c FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
            FROM d2c WHERE vec_id < 16) WHERE rn <= 2
        ),
        pd AS (
          SELECT x.vec_id AS query_id, y.vec_id AS neighbor_id,
                 sum((x.q - y.q) * (x.q - y.q)) AS d2
          FROM qv x
          JOIN qp ax ON ax.vec_id = x.vec_id
          JOIN a2 ay ON TRUE
          JOIN qv y ON y.vec_id = ay.vec_id AND y.dim = x.dim
          WHERE x.vec_id < 16 AND y.vec_id <> x.vec_id AND ax.c = ay.c
          GROUP BY 1, 2
        )""",
    )

    # ivf_probe_cost: same trained quantizer; per query the top-2
    # cells by (d2, c) over the FINAL centroids plus the exact cell
    # sizes — a query's own vector always sits in its nearest cell,
    # so cost_p1 = n(cell1) - 1 and cost_p2 = n1 + n2 - 1; LEFT JOIN
    # keeps empty second cells at cost n1 - 1 + 0.
    sql["ivf_probe_cost"] = (
        sql["ann_topk_ivf_kmeans"].split("        pd AS (")[0]
        + """        pq AS (
          SELECT vec_id, c, rn FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
            FROM d2c WHERE vec_id < 16) WHERE rn <= 2
        ),
        sz AS (SELECT c, CAST(count(*) AS BIGINT) AS n FROM a2 GROUP BY 1),
        qc AS (
          SELECT vec_id AS query_id,
                 max(CASE WHEN rn = 1 THEN c END) AS c1,
                 max(CASE WHEN rn = 2 THEN c END) AS c2
          FROM pq GROUP BY 1
        )
        SELECT qc.query_id,
               CAST(qc.c1 AS BIGINT) AS cell1,
               CAST(qc.c2 AS BIGINT) AS cell2,
               CAST(s1.n - 1 AS BIGINT) AS cost_p1,
               CAST(s1.n + coalesce(s2.n, 0) - 1 AS BIGINT) AS cost_p2
        FROM qc
        JOIN sz s1 ON s1.c = qc.c1
        LEFT JOIN sz s2 ON s2.c = qc.c2
    """
    )

    # delta_agg_merge: the full-recompute view split into base/delta
    # lanes; changelog rows only for delta-touched groups.
    sql["delta_agg_merge"] = """
        WITH g AS (
          SELECT epoch_us(ts) // 86400000000 AS day, event_type,
                 CAST(count(*) FILTER (WHERE event_id % 10 <> 0)
                      AS BIGINT) AS nb,
                 CAST(count(*) FILTER (WHERE event_id % 10 = 0)
                      AS BIGINT) AS nd,
                 CAST(count(*) AS BIGINT) AS nt
          FROM events GROUP BY 1, 2
        )
        SELECT CAST(day AS BIGINT) AS day, event_type, '-' AS op, nb AS n
        FROM g WHERE nd > 0 AND nb > 0
        UNION ALL
        SELECT CAST(day AS BIGINT), event_type, '+', nt
        FROM g WHERE nd > 0
    """

    # q10_returned_items: the textbook Q10 over the available columns;
    # money in exact integer cents with the shared floor(x*100+0.5)
    # convention; deterministic tiebreak on c_custkey.
    sql["q10_returned_items"] = """
        WITH rev AS (
          SELECT o.o_custkey AS ckey,
                 CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                      * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_returnflag = 'R'
            AND o.o_orderdate >= TIMESTAMP '1996-10-01'
            AND o.o_orderdate < TIMESTAMP '1997-01-01'
          GROUP BY 1
        )
        SELECT c.c_custkey, c.c_name, rev.cents AS revenue_cents,
               c.c_acctbal, n.n_name
        FROM rev
        JOIN customer c ON c.c_custkey = rev.ckey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        ORDER BY revenue_cents DESC, c.c_custkey ASC
        LIMIT 20
    """

    # benford_audit: first digit from the exact cents integer via
    # string head (integer→varchar is exact); '// ' floor equals the
    # numpy '//' for the non-negative shares.
    sql["benford_audit"] = """
        WITH vals AS (
          SELECT 'lineitem.l_extendedprice' AS lane,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
          FROM lineitem
          UNION ALL
          SELECT 'orders.o_totalprice',
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
          FROM orders
        ),
        g AS (
          SELECT lane,
                 CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                 CAST(count(*) AS BIGINT) AS n
          FROM vals WHERE cents > 0 GROUP BY 1, 2
        ),
        t AS (SELECT lane, sum(n) AS tot FROM g GROUP BY 1)
        SELECT g.lane, g.digit, g.n,
               CAST(g.n * 10000 // t.tot AS BIGINT) AS share_bp
        FROM g JOIN t ON g.lane = t.lane
    """

    # ann_topk_ivfpq: the coarse CTEs verbatim, then residual-PQ
    # training replayed (2 iterations, truncating '//' division,
    # anchor-residual seeds) and the per-query ADC over its own cell.
    sql["ann_topk_ivfpq"] = (
        sql["ann_topk_ivf_kmeans"].split("        pd AS (")[0]
        + """        rv AS (
          SELECT v.vec_id, v.dim, v.dim // 16 AS s, v.q - cn.q AS r
          FROM qv v
          JOIN a2 av ON av.vec_id = v.vec_id
          JOIN cent2f cn ON cn.c = av.c AND cn.dim = v.dim
        ),
        pseed AS (
          SELECT vec_id - 16 AS pc, s, dim, r FROM rv
          WHERE vec_id BETWEEN 16 AND 23
        ),
        pd0 AS (
          SELECT v.vec_id, v.s, sd.pc,
                 sum((v.r - sd.r) * (v.r - sd.r)) AS d2
          FROM rv v JOIN pseed sd ON sd.dim = v.dim GROUP BY 1, 2, 3
        ),
        pa0 AS (SELECT vec_id, s, pc FROM (
          SELECT vec_id, s, pc, row_number() OVER (
            PARTITION BY vec_id, s ORDER BY d2 ASC, pc ASC) AS rn
          FROM pd0) WHERE rn = 1),
        pcent1 AS (
          SELECT pa0.pc, rv.s, rv.dim,
                 CAST(sum(rv.r) // count(*) AS BIGINT) AS r
          FROM rv JOIN pa0 ON pa0.vec_id = rv.vec_id AND pa0.s = rv.s
          GROUP BY 1, 2, 3
        ),
        pcent1f AS (
          SELECT sd.pc, sd.s, sd.dim, coalesce(p1.r, sd.r) AS r
          FROM pseed sd LEFT JOIN pcent1 p1
            ON p1.pc = sd.pc AND p1.dim = sd.dim
        ),
        pd1 AS (
          SELECT v.vec_id, v.s, cb.pc,
                 sum((v.r - cb.r) * (v.r - cb.r)) AS d2
          FROM rv v JOIN pcent1f cb ON cb.dim = v.dim GROUP BY 1, 2, 3
        ),
        pa1 AS (SELECT vec_id, s, pc FROM (
          SELECT vec_id, s, pc, row_number() OVER (
            PARTITION BY vec_id, s ORDER BY d2 ASC, pc ASC) AS rn
          FROM pd1) WHERE rn = 1),
        pcent2 AS (
          SELECT pa1.pc, rv.s, rv.dim,
                 CAST(sum(rv.r) // count(*) AS BIGINT) AS r
          FROM rv JOIN pa1 ON pa1.vec_id = rv.vec_id AND pa1.s = rv.s
          GROUP BY 1, 2, 3
        ),
        pcent2f AS (
          SELECT f.pc, f.s, f.dim, coalesce(p2.r, f.r) AS r
          FROM pcent1f f LEFT JOIN pcent2 p2
            ON p2.pc = f.pc AND p2.dim = f.dim
        ),
        pd2q AS (
          SELECT v.vec_id, v.s, cb.pc,
                 sum((v.r - cb.r) * (v.r - cb.r)) AS d2
          FROM rv v JOIN pcent2f cb ON cb.dim = v.dim GROUP BY 1, 2, 3
        ),
        pa2 AS (SELECT vec_id, s, pc FROM (
          SELECT vec_id, s, pc, row_number() OVER (
            PARTITION BY vec_id, s ORDER BY d2 ASC, pc ASC) AS rn
          FROM pd2q) WHERE rn = 1),
        qtabr AS (
          SELECT vec_id, s, pc, d2 FROM pd2q WHERE vec_id < 16
        ),
        adc AS (
          SELECT t.vec_id AS query_id, ay.vec_id AS neighbor_id,
                 sum(t.d2) AS d2
          FROM qtabr t
          JOIN a2 aq ON aq.vec_id = t.vec_id
          JOIN a2 ay ON ay.c = aq.c AND ay.vec_id <> t.vec_id
          JOIN pa2 py ON py.vec_id = ay.vec_id AND py.s = t.s
                     AND py.pc = t.pc
          GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, rank FROM (
          SELECT query_id, neighbor_id, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY d2 ASC, neighbor_id ASC
          ) AS BIGINT) AS rank
          FROM adc) WHERE rank <= 5
    """
    )

    # ivfpq_recall_report: exact ∩ IVF-PQ hits per query.
    sql["ivfpq_recall_report"] = f"""
        WITH e AS ({sql["ann_topk"]}),
        a AS ({sql["ann_topk_ivfpq"]})
        SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM e JOIN a ON a.query_id = e.query_id
                     AND a.neighbor_id = e.neighbor_id
        GROUP BY 1 ORDER BY 1
    """

    # video_frame_plan: md5-derived duration, stride-7 sampling
    # capped at 16; all arithmetic non-negative integers.
    sql["video_frame_plan"] = """
        WITH d AS (
          SELECT doc_id,
                 2000 + CAST(CAST('0x' || substr(
                   md5('video://' || CAST(doc_id AS VARCHAR)), 1, 15)
                   AS UBIGINT) % 58000 AS BIGINT) AS dur
          FROM documents
        ),
        f AS (SELECT doc_id, dur * 25 // 1000 AS n_frames FROM d),
        s AS (SELECT doc_id, n_frames,
                     least((n_frames + 6) // 7, 16) AS n_s FROM f)
        SELECT doc_id, CAST(i * 7 AS BIGINT) AS frame_idx,
               CAST(i * 7 * 1000 // 25 AS BIGINT) AS ts_ms,
               CAST(n_frames AS BIGINT) AS n_frames
        FROM s, unnest(range(0, n_s)) t(i)
    """

    # langid_confusion: the lang_id CTE joined back to the label.
    sql["langid_confusion"] = f"""
        WITH li AS ({sql["lang_id"]})
        SELECT d.lang AS true_lang, li.pred_lang,
               CAST(count(*) AS BIGINT) AS n
        FROM li JOIN documents d USING (doc_id)
        GROUP BY 1, 2
    """

    # jsonl_roundtrip: the checksum the decoded JSONL must reproduce.
    sql["jsonl_roundtrip"] = """
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
               CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
               CAST(sum(length(text)) AS BIGINT) AS sum_text_len
        FROM documents
    """

    # csv_roundtrip: the same parquet-side checksum as the JSONL twin.
    sql["csv_roundtrip"] = sql["jsonl_roundtrip"]

    # q6_forecast_revenue: discounts re-rounded to basis points on
    # BOTH sides before compare and multiply.
    sql["q6_forecast_revenue"] = """
        WITH f AS (
          SELECT l_extendedprice,
                 CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS bp
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
            AND CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)
                BETWEEN 500 AND 700
            AND CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) < 2400
        )
        SELECT coalesce(CAST(sum(CAST(floor(l_extendedprice
                 * (bp / 10000.0) * 100 + 0.5) AS BIGINT)) AS BIGINT), 0)
                 AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM f
    """

    # q15_top_supplier: the view + max-subquery equality, ties all.
    sql["q15_top_supplier"] = """
        WITH r AS (
          SELECT l_suppkey,
                 CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                      * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-10-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, r.rev AS revenue_cents
        FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.rev = (SELECT max(rev) FROM r)
    """

    # readability_stats: corpus-level ratios from per-lang sums.
    sql["readability_stats"] = """
        WITH d AS (
          SELECT lang,
                 CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                      AS BIGINT) AS w,
                 CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
                   AS s,
                 CAST(length(text) AS BIGINT) AS c
          FROM documents
        ),
        g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(w) AS BIGINT) AS words,
                     CAST(sum(s) AS BIGINT) AS sentences,
                     CAST(sum(c) AS BIGINT) AS chars
              FROM d GROUP BY 1)
        SELECT lang, n_docs, words, sentences, chars,
               CAST(chars * 1000 // greatest(words, 1) AS BIGINT)
                 AS chars_per_word_x1000,
               CAST(words * 1000 // greatest(sentences, 1) AS BIGINT)
                 AS words_per_sentence_x1000
        FROM g
    """

    # event_position_profile: per-event relative position via
    # row_number over the per-user (ts, event_id) order.
    sql["event_position_profile"] = """
        WITH o AS (
          SELECT event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) - 1 AS pos,
                 count(*) OVER (PARTITION BY user_id) AS len
          FROM events
        ),
        r AS (SELECT event_type,
                     CASE WHEN len > 1 THEN pos * 10000 // (len - 1)
                          ELSE 0 END AS rp
              FROM o)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(rp) // count(*) AS BIGINT) AS mean_relpos_bp
        FROM r GROUP BY 1
    """

    # ohlc_daily: endpoints via two row_numbers, extremes plain.
    sql["ohlc_daily"] = """
        WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                          epoch_us(ts) AS t, event_id,
                          CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
                   FROM events),
        w AS (SELECT event_type, day, c,
                     row_number() OVER (PARTITION BY event_type, day
                                        ORDER BY t, event_id) AS rf,
                     row_number() OVER (PARTITION BY event_type, day
                                        ORDER BY t DESC, event_id DESC)
                       AS rl
              FROM e)
        SELECT event_type, CAST(day AS BIGINT) AS day,
               CAST(max(CASE WHEN rf = 1 THEN c END) AS BIGINT) AS open_c,
               CAST(max(c) AS BIGINT) AS high_c,
               CAST(min(c) AS BIGINT) AS low_c,
               CAST(max(CASE WHEN rl = 1 THEN c END) AS BIGINT) AS close_c
        FROM w GROUP BY 1, 2
    """

    # kfold_assignment: md5-mod folds; spread over ALL five folds
    # (zero cells included via the cross join).
    sql["kfold_assignment"] = """
        WITH f AS (SELECT lang,
                          CAST(CAST('0x' || substr(
                            md5(CAST(doc_id AS VARCHAR)), 1, 15)
                            AS UBIGINT) % 5 AS BIGINT) AS fold
                   FROM documents),
        g AS (SELECT lang, fold, CAST(count(*) AS BIGINT) AS n_docs
              FROM f GROUP BY 1, 2),
        allf AS (SELECT l.lang, k.fold, coalesce(g.n_docs, 0) AS nd
                 FROM (SELECT DISTINCT lang FROM f) l
                 CROSS JOIN (SELECT unnest(range(0, 5)) AS fold) k
                 LEFT JOIN g ON g.lang = l.lang AND g.fold = k.fold),
        sp AS (SELECT lang, CAST(max(nd) - min(nd) AS BIGINT)
                 AS lang_spread
               FROM allf GROUP BY 1)
        SELECT g.lang, g.fold, g.n_docs, sp.lang_spread
        FROM g JOIN sp USING (lang)
    """

    # conversion_by_engagement: log2 band via len(bin()) — the
    # hist_quantiles convention; n ≥ 1 so band ≥ 1.
    sql["conversion_by_engagement"] = """
        WITH ue AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                           CAST(max(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS c
                    FROM events GROUP BY 1),
        b AS (SELECT CAST(len(bin(CAST(n AS UBIGINT))) AS BIGINT) AS band,
                     c
              FROM ue),
        g AS (SELECT band, CAST(count(*) AS BIGINT) AS n_users,
                     CAST(sum(c) AS BIGINT) AS n_converted
              FROM b GROUP BY 1)
        SELECT band, CAST(CAST(1 AS BIGINT) << (band - 1) AS BIGINT)
                 AS n_lo,
               n_users, n_converted,
               CAST(n_converted * 10000 // n_users AS BIGINT) AS rate_bp
        FROM g
    """

    # churn_feature_labels: fixed epoch week windows off the
    # 2024-01-01 feature clock; label window disjoint by construction.
    sql["churn_feature_labels"] = """
        WITH e AS (SELECT user_id,
                          (epoch_us(ts) - 1704067200000000)
                            // 604800000000 AS week,
                          (epoch_us(ts) - 1704067200000000)
                            // 86400000000 AS day
                   FROM events)
        SELECT user_id,
               CAST(count(*) FILTER (WHERE week = 0) AS BIGINT) AS n_w1,
               CAST(count(*) FILTER (WHERE week = 1) AS BIGINT) AS n_w2,
               CAST(count(*) FILTER (WHERE week = 2) AS BIGINT) AS n_w3,
               CAST(count(DISTINCT CASE WHEN week <= 2 THEN day END)
                    AS BIGINT) AS active_days_w13,
               CAST(CASE WHEN max(CASE WHEN week >= 3 THEN 1 ELSE 0 END)
                    = 0 THEN 1 ELSE 0 END AS BIGINT) AS churned
        FROM e GROUP BY 1
    """

    # user_behavior_twins: canonical profile via ordered string_agg;
    # size-≥2 clusters histogrammed.
    sql["user_behavior_twins"] = """
        WITH ut AS (SELECT user_id, event_type,
                           CAST(count(*) AS BIGINT) AS n
                    FROM events GROUP BY 1, 2),
        prof AS (SELECT user_id,
                        md5(string_agg(event_type || ':' || n, '|'
                            ORDER BY event_type)) AS h
                 FROM ut GROUP BY 1),
        cl AS (SELECT h, CAST(count(*) AS BIGINT) AS size
               FROM prof GROUP BY 1)
        SELECT size AS cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(count(*) * size AS BIGINT) AS n_users
        FROM cl GROUP BY 1
    """

    # vocab_coverage: rank by (count desc, token) and three prefix
    # cuts; coverage in exact basis points.
    sql["vocab_coverage"] = """
        WITH tok AS (SELECT unnest(regexp_extract_all(lower(text),
                            '[a-z0-9]+')) AS t FROM documents),
        c AS (SELECT t, CAST(count(*) AS BIGINT) AS n
              FROM tok GROUP BY 1),
        r AS (SELECT n, row_number() OVER (ORDER BY n DESC, t) AS rk
              FROM c),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        SELECT CAST(ks.k AS BIGINT) AS k,
               coalesce((SELECT CAST(sum(n) AS BIGINT) FROM r
                         WHERE rk <= ks.k), 0) AS top_total,
               tot.total AS corpus_total,
               CAST(coalesce((SELECT sum(n) FROM r WHERE rk <= ks.k), 0)
                    * 10000 // tot.total AS BIGINT) AS coverage_bp
        FROM (VALUES (100), (1000), (10000)) ks(k), tot
    """

    # hll_error_eval: the hll_registers CTE folded through the exact
    # rational estimator; unset registers contribute 2^53 each.
    sql["hll_error_eval"] = f"""
        WITH reg AS ({sql["hll_registers"]}),
        s AS (SELECT CAST(sum(CAST(1 AS HUGEINT) << (53 - max_rho))
                          AS HUGEINT) AS s_set,
                     CAST(count(*) AS BIGINT) AS n_set
              FROM reg),
        tot AS (SELECT s_set + (256 - n_set)
                        * (CAST(1 AS HUGEINT) << 53) AS s_all,
                       CAST(256 - n_set AS BIGINT) AS v_zero
                FROM s),
        ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
               FROM events)
        SELECT CAST(256 AS BIGINT) AS m, v_zero, n_exact,
               CAST((CAST(7213 AS HUGEINT) * 16777216
                     * (CAST(1 AS HUGEINT) << 53) * 1000)
                    // (10 * 257079 * s_all) AS BIGINT) AS est_raw_x1000,
               CAST((CAST(7213 AS HUGEINT) * 16777216
                     * (CAST(1 AS HUGEINT) << 53) * 1000)
                    // (10 * 257079 * s_all)
                    - n_exact * 1000 AS BIGINT) AS err_x1000
        FROM tot, ex
    """

    # budget_allocation: Hamilton apportionment in window functions;
    # ties on remainder break by source name.
    sql["budget_allocation"] = """
        WITH w AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS wt
                   FROM documents GROUP BY 1),
        t AS (SELECT CAST(sum(wt) AS BIGINT) AS tot FROM w),
        b AS (SELECT source, wt, wt * 10000 // tot AS base,
                     (wt * 10000) % tot AS rem
              FROM w, t),
        lo AS (SELECT CAST(10000 - sum(base) AS BIGINT) AS leftover FROM b),
        r AS (SELECT b.*, row_number() OVER (ORDER BY rem DESC, source)
                       AS rk
              FROM b)
        SELECT r.source, r.wt AS weight, CAST(r.base AS BIGINT)
                 AS base_alloc,
               CAST(CASE WHEN r.rk <= lo.leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS extra,
               CAST(r.base + CASE WHEN r.rk <= lo.leftover THEN 1 ELSE 0
                    END AS BIGINT) AS alloc
        FROM r, lo
    """

    # dup_cluster_sources: 8-word-opening clusters split by source
    # span (list slice [1:8] == python [:8]).
    sql["dup_cluster_sources"] = """
        WITH c AS (SELECT array_to_string(
                     (regexp_extract_all(lower(text), '[a-z0-9]+'))[1:8],
                     ' ') AS fp, source,
                          CAST(count(*) AS BIGINT) AS n
                   FROM documents GROUP BY 1, 2),
        cl AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_sources,
                      CAST(sum(n) AS BIGINT) AS n_docs
               FROM c GROUP BY 1)
        SELECT n_sources, CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(sum(n_docs) AS BIGINT) AS n_docs
        FROM cl WHERE n_docs >= 2 GROUP BY 1
    """

    # cms_error_eval: the cms_registers CTE probed at the exact
    # top-20 users' positions.
    sql["cms_error_eval"] = f"""
        WITH reg AS ({sql["cms_registers"]}),
        t AS (SELECT user_id, CAST(count(*) AS BIGINT) AS true_n
              FROM events GROUP BY 1
              ORDER BY true_n DESC, user_id LIMIT 20),
        h AS (SELECT user_id, true_n,
                CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                     1, 15) AS UBIGINT) AS BIGINT) AS h1,
                CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                     16, 15) AS UBIGINT) AS BIGINT) AS h2
              FROM t),
        p AS (SELECT user_id, true_n, d.i AS row_d,
                     (h1 + d.i * h2) % 256 AS pos
              FROM h, unnest(range(0, 4)) d(i)),
        e AS (SELECT p.user_id, p.true_n,
                     CAST(min(reg.count) AS BIGINT) AS est_n
              FROM p JOIN reg ON reg.row_d = p.row_d AND reg.pos = p.pos
              GROUP BY 1, 2)
        SELECT user_id, true_n, est_n,
               CAST(est_n - true_n AS BIGINT) AS overestimate
        FROM e
    """

    # filter_funnel: the quality_score CTE reused; marginal and
    # cumulative bites per gate.
    sql["filter_funnel"] = f"""
        WITH q AS ({sql["quality_score"]}),
        f AS (SELECT (ws_tokens >= 20) AS p1,
                     (10 * hits_en >= ws_tokens) AS p2,
                     (5 * punct <= chars) AS p3,
                     (10 * digits <= chars) AS p4
              FROM q)
        SELECT CAST(1 AS BIGINT) AS stage, 'min_length' AS gate,
               CAST(count(*) FILTER (WHERE NOT p1) AS BIGINT)
                 AS n_fail_alone,
               CAST(count(*) FILTER (WHERE p1) AS BIGINT)
                 AS n_survivors_cum,
               CAST(count(*) AS BIGINT) AS n_total
        FROM f
        UNION ALL
        SELECT 2, 'stopword_density',
               CAST(count(*) FILTER (WHERE NOT p2) AS BIGINT),
               CAST(count(*) FILTER (WHERE p1 AND p2) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM f
        UNION ALL
        SELECT 3, 'punct_ratio',
               CAST(count(*) FILTER (WHERE NOT p3) AS BIGINT),
               CAST(count(*) FILTER (WHERE p1 AND p2 AND p3) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM f
        UNION ALL
        SELECT 4, 'digit_ratio',
               CAST(count(*) FILTER (WHERE NOT p4) AS BIGINT),
               CAST(count(*) FILTER (WHERE p1 AND p2 AND p3 AND p4)
                    AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM f
    """

    # kcenter_seeds: the greedy unrolled as a generated CTE chain
    # (chosen set grows one pick per step; ties to the lower id).
    _kc_parts = [
        """
        WITH qv AS (
          SELECT vec_id, dim,
                 CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 1000000 + 0.5)
                      AS BIGINT) AS q
          FROM embeddings, UNNEST(range(0, 64)) t(dim)
        ),
        ch0 AS MATERIALIZED (SELECT 0 AS step, 0 AS vec_id)"""
    ]
    for _i in range(1, 8):
        _kc_parts.append(
            f""",
        pair{_i} AS MATERIALIZED (
          SELECT x.vec_id AS v, c.vec_id AS cid,
                 sum((x.q - y.q) * (x.q - y.q)) AS d2
          FROM qv x
          JOIN ch{_i - 1} c ON TRUE
          JOIN qv y ON y.vec_id = c.vec_id AND y.dim = x.dim
          GROUP BY 1, 2
        ),
        dm{_i} AS MATERIALIZED (SELECT v AS vec_id, min(d2) AS dmin
                   FROM pair{_i} GROUP BY 1),
        p{_i} AS MATERIALIZED (SELECT vec_id, dmin FROM dm{_i}
                  WHERE vec_id NOT IN (SELECT vec_id FROM ch{_i - 1})
                  ORDER BY dmin DESC, vec_id LIMIT 1),
        ch{_i} AS MATERIALIZED (SELECT step, vec_id FROM ch{_i - 1}
                   UNION ALL SELECT {_i}, vec_id FROM p{_i})"""
        )
    _kc_parts.append(
        """
        SELECT CAST(step AS BIGINT) AS step,
               CAST(vec_id AS BIGINT) AS vec_id,
               CAST(d2 AS BIGINT) AS d2_to_set
        FROM (
          SELECT 0 AS step, 0 AS vec_id, 0 AS d2
          """
        + "".join(
            f"UNION ALL SELECT {_i}, vec_id, dmin FROM p{_i}\n          "
            for _i in range(1, 8)
        )
        + ")"
    )
    sql["kcenter_seeds"] = "".join(_kc_parts)

    # q8_market_share: the textbook Q8 adapted (market region ASIA,
    # focus supplier nation NATION_2, p_type PROMO); year via pure
    # epoch comparison; share an integer floor division.
    sql["q8_market_share"] = """
        WITH j AS (
          SELECT 1996 + CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                 THEN 1 ELSE 0 END AS o_year,
                 CAST(floor(l_extendedprice * (1 - l_discount) * 100
                      + 0.5) AS BIGINT) AS cents,
                 CASE WHEN sn.n_name = 'NATION_2' THEN 1 ELSE 0 END AS focus
          FROM lineitem
          JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation cn ON cn.n_nationkey = c_nationkey
          JOIN region r ON r.r_regionkey = cn.n_regionkey
                        AND r.r_name = 'ASIA'
          JOIN supplier s ON s.s_suppkey = l_suppkey
          JOIN nation sn ON sn.n_nationkey = s.s_nationkey
          WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'
        ),
        g AS (SELECT CAST(o_year AS BIGINT) AS o_year,
                     CAST(sum(cents) AS BIGINT) AS total_cents,
                     CAST(coalesce(sum(cents) FILTER (WHERE focus = 1), 0)
                          AS BIGINT) AS focus_cents
              FROM j GROUP BY 1)
        SELECT o_year, total_cents, focus_cents,
               CAST(CASE WHEN total_cents = 0 THEN 0
                    ELSE focus_cents * 10000 // total_cents END AS BIGINT)
                 AS share_bp
        FROM g
    """

    # q22_sales_opportunity: the above-average gate cross-multiplied;
    # the anti-join via NOT EXISTS.
    sql["q22_sales_opportunity"] = """
        WITH c AS (SELECT c_custkey, c_nationkey,
                          CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                            AS bal
                   FROM customer),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(bal) AS BIGINT) AS s
               FROM c WHERE bal > 0),
        el AS (SELECT c.* FROM c, st
               WHERE c.bal * st.n > st.s
                 AND NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_orderdate >=
                                       TIMESTAMP '1999-01-01'))
        SELECT n.n_name, CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(bal) AS BIGINT) AS totacctbal_cents
        FROM el JOIN nation n ON n.n_nationkey = el.c_nationkey
        GROUP BY 1
    """

    # q7_volume_shipping: the textbook Q7 over the available columns;
    # year via pure epoch comparison, nations must differ.
    sql["q7_volume_shipping"] = """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(1996 + CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                    THEN 1 ELSE 0 END AS BIGINT) AS l_year,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                    * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2')
          AND n2.n_name IN ('NATION_1', 'NATION_2')
          AND n1.n_name <> n2.n_name
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
    """

    # q13_customer_distribution: the LEFT JOIN kept explicit so the
    # zero-order customers survive into the histogram.
    sql["q13_customer_distribution"] = """
        WITH cc AS (
          SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS n
          FROM customer c
          LEFT JOIN orders o ON o.o_custkey = c.c_custkey
          GROUP BY 1
        )
        SELECT n AS c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM cc GROUP BY 1
    """

    # q14_promo_share: the share-of-X CASE aggregate; '//' floor ==
    # numpy for the non-negative ratio.
    sql["q14_promo_share"] = """
        WITH j AS (
          SELECT CAST(floor(l_extendedprice * (1 - l_discount) * 100
                      + 0.5) AS BIGINT) AS cents,
                 CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS promo
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-10-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
        ),
        g AS (SELECT coalesce(CAST(sum(cents) FILTER (WHERE promo = 1)
                       AS BIGINT), 0) AS promo_cents,
                     coalesce(CAST(sum(cents) AS BIGINT), 0) AS total_cents
              FROM j)
        SELECT promo_cents, total_cents,
               CAST(CASE WHEN total_cents = 0 THEN 0
                    ELSE promo_cents * 10000 // total_cents END AS BIGINT)
                 AS promo_share_bp
        FROM g
    """

    # q17_small_quantity: the 1/5 threshold cross-multiplied; the
    # correlated aggregate via a plain per-part stats join.
    sql["q17_small_quantity"] = """
        WITH q AS (
          SELECT l_partkey AS pk,
                 CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   AS price_c
          FROM lineitem
        ),
        st AS (SELECT pk, CAST(sum(qty_c) AS BIGINT) AS s,
                      CAST(count(*) AS BIGINT) AS n
               FROM q GROUP BY 1)
        SELECT coalesce(CAST(sum(q.price_c) AS BIGINT), 0)
                 AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM q JOIN st USING (pk)
        WHERE q.qty_c * 5 * st.n < st.s
    """

    # activity_streaks: gaps-and-islands on the distinct user-day
    # grid; the histogram counts streaks and owning users per length.
    sql["activity_streaks"] = """
        WITH ud AS (SELECT DISTINCT user_id AS u,
                           epoch_us(ts) // 86400000000 AS d FROM events),
        r AS (SELECT u, d,
                     d - row_number() OVER (PARTITION BY u ORDER BY d)
                       AS isl
              FROM ud),
        s AS (SELECT u, isl, CAST(count(*) AS BIGINT) AS len
              FROM r GROUP BY 1, 2),
        per AS (SELECT u, len, CAST(count(*) AS BIGINT) AS n
                FROM s GROUP BY 1, 2)
        SELECT len AS streak_len, CAST(sum(n) AS BIGINT) AS n_streaks,
               CAST(count(*) AS BIGINT) AS n_users
        FROM per GROUP BY 1
    """

    # bloom_fpr_eval: the bloom_gate CTEs with the exact (h1, h2)
    # ground-truth join and per-partition summary folded on.
    sql["bloom_fpr_eval"] = """
        WITH h AS (
          SELECT doc_id,
                 CAST(CAST('0x' || substr(md5(text), 1, 15) AS UBIGINT)
                      AS BIGINT) AS h1,
                 CAST(CAST('0x' || substr(md5(text), 16, 15) AS UBIGINT)
                      AS BIGINT) AS h2
          FROM documents
        ),
        probes AS (
          SELECT doc_id, h1 % 8 AS part, (h1 + i.i * h2) % 256 AS pos
          FROM h CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) i
        ),
        bits AS (SELECT DISTINCT part, pos FROM probes WHERE doc_id % 2 = 0),
        flag AS (
          SELECT p.doc_id, min(p.part) AS part,
                 CAST(min(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END)
                      AS BIGINT) AS maybe_dup
          FROM probes p
          LEFT JOIN bits b ON b.part = p.part AND b.pos = p.pos
          WHERE p.doc_id % 2 = 1 GROUP BY 1
        ),
        td AS (
          SELECT hp.doc_id,
                 CAST(CASE WHEN EXISTS (
                   SELECT 1 FROM h x
                   WHERE x.doc_id % 2 = 0 AND x.h1 = hp.h1
                     AND x.h2 = hp.h2) THEN 1 ELSE 0 END AS BIGINT)
                   AS true_dup
          FROM h hp WHERE hp.doc_id % 2 = 1
        ),
        pr AS (SELECT h1 % 8 AS part, CAST(count(*) AS BIGINT) AS n_prior
               FROM h WHERE doc_id % 2 = 0 GROUP BY 1),
        j AS (SELECT f.part, f.maybe_dup, t.true_dup
              FROM flag f JOIN td t USING (doc_id)),
        g AS (SELECT part, CAST(count(*) AS BIGINT) AS n_probe,
                     CAST(sum(true_dup) AS BIGINT) AS n_true_dup,
                     CAST(sum(maybe_dup) AS BIGINT) AS n_flagged,
                     CAST(sum(CASE WHEN maybe_dup = 1 AND true_dup = 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
              FROM j GROUP BY 1)
        SELECT g.part, coalesce(pr.n_prior, 0) AS n_prior, g.n_probe,
               g.n_true_dup, g.n_flagged, g.n_false_pos,
               CAST(CASE WHEN g.n_probe - g.n_true_dup = 0 THEN 0
                    ELSE g.n_false_pos * 10000
                         // (g.n_probe - g.n_true_dup) END AS BIGINT)
                 AS fpr_bp
        FROM g LEFT JOIN pr ON pr.part = g.part
    """

    # join_strategy_plan: the same integer cost model from count(*)
    # aggregates, one branch per FK edge.
    sql["join_strategy_plan"] = " UNION ALL ".join(
        f"""
        SELECT '{edge}' AS edge,
               (SELECT CAST(count(*) AS BIGINT) FROM {ct}) AS child_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM {pt}) AS parent_rows,
               (SELECT CAST(count(*) * 16 * 256 AS BIGINT) FROM {pt})
                 AS broadcast_bytes,
               (SELECT CAST(count(*) AS BIGINT) FROM {ct}) * 16
                 + (SELECT CAST(count(*) AS BIGINT) FROM {pt}) * 16
                 AS shuffle_bytes,
               CASE WHEN (SELECT count(*) * 16 * 256 FROM {pt})
                       < (SELECT count(*) FROM {ct}) * 16
                         + (SELECT count(*) FROM {pt}) * 16
                    THEN 'broadcast' ELSE 'shuffle' END AS strategy
        """
        for edge, ct, _ck, pt, _pk in (
            ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
             "orders", "o_orderkey"),
            ("lineitem.l_partkey->part", "lineitem", "l_partkey",
             "part", "p_partkey"),
            ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
             "supplier", "s_suppkey"),
            ("orders.o_custkey->customer", "orders", "o_custkey",
             "customer", "c_custkey"),
            ("customer.c_nationkey->nation", "customer", "c_nationkey",
             "nation", "n_nationkey"),
            ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
             "nation", "n_nationkey"),
            ("nation.n_regionkey->region", "nation", "n_regionkey",
             "region", "r_regionkey"),
        )
    )

    # session_timeout_sweep: lag gaps per user in (ts, event_id)
    # order; sessions(θ) = n_users + #gaps > θ.
    sql["session_timeout_sweep"] = " UNION ALL ".join(
        f"""
        SELECT CAST({m} AS BIGINT) AS timeout_min,
               (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
               + (SELECT CAST(count(*) AS BIGINT) FROM (
                    SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id) AS gap
                    FROM events) WHERE gap > {m * 60_000_000})
                 AS n_sessions
        """
        for m in (5, 15, 30, 60)
    )

    # supplier_scorecard: one FK groupby + the dimension stitch.
    sql["supplier_scorecard"] = """
        WITH l AS (
          SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
                 CAST(count(*) FILTER (WHERE l_returnflag = 'R')
                      AS BIGINT) AS n_returned,
                 CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                      * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
          FROM lineitem GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, n.n_name, l.n_lines, l.n_returned,
               l.revenue_cents,
               CAST(l.n_returned * 10000 // l.n_lines AS BIGINT)
                 AS return_rate_bp
        FROM l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
    """

    # abc_analysis: the exclusive running revenue in (rev desc, pk)
    # order; integer cross-multiplied class cuts.
    sql["abc_analysis"] = """
        WITH pr AS (
          SELECT l_partkey AS pk,
                 CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                      * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
          FROM lineitem GROUP BY 1
        ),
        t AS (SELECT CAST(sum(rev) AS BIGINT) AS total FROM pr),
        w AS (SELECT pk, rev,
                     coalesce(sum(rev) OVER (
                       ORDER BY rev DESC, pk
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS excl
              FROM pr),
        c AS (SELECT CASE WHEN excl * 10 < total * 8 THEN 'A'
                          WHEN excl * 100 < total * 95 THEN 'B'
                          ELSE 'C' END AS cls, rev, total
              FROM w, t)
        SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(rev) AS BIGINT) AS revenue_cents,
               CAST(sum(rev) * 10000 // max(total) AS BIGINT) AS share_bp
        FROM c GROUP BY 1
    """

    # q19_brand_revenue: disjoint clauses (brands differ) so the CASE
    # ladder equals the per-clause evaluation; TOTAL from the grid.
    sql["q19_brand_revenue"] = """
        WITH l AS (
          SELECT l_partkey,
                 CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
                 CAST(floor(l_extendedprice * (1 - l_discount) * 100
                      + 0.5) AS BIGINT) AS cents
          FROM lineitem
        ),
        j AS (
          SELECT CASE
                   WHEN p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                        AND qc BETWEEN 100 AND 1100 THEN 'Brand#1'
                   WHEN p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                        AND qc BETWEEN 1000 AND 2000 THEN 'Brand#2'
                   WHEN p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
                        AND qc BETWEEN 2000 AND 3000 THEN 'Brand#3'
                 END AS clause, cents
          FROM l JOIN part ON p_partkey = l_partkey
        ),
        g AS (SELECT clause, CAST(count(*) AS BIGINT) AS n_lines,
                     CAST(sum(cents) AS BIGINT) AS revenue_cents
              FROM j WHERE clause IS NOT NULL GROUP BY 1)
        SELECT * FROM g
        UNION ALL
        SELECT 'TOTAL',
               coalesce((SELECT CAST(sum(n_lines) AS BIGINT) FROM g), 0),
               coalesce((SELECT CAST(sum(revenue_cents) AS BIGINT) FROM g), 0)
    """

    # sq8_distortion: the shared quantize CTE; affine int8 encode/
    # decode in pure integer arithmetic ('//' operands non-negative
    # by construction), exact per-dim SSE / max|err|.
    sql["sq8_distortion"] = """
        WITH qv AS (
          SELECT vec_id, dim,
                 CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 1000000 + 0.5)
                      AS BIGINT) AS q
          FROM embeddings, UNNEST(range(0, 64)) t(dim)
        ),
        mm AS (SELECT dim, min(q) AS mn, max(q) AS mx,
                      greatest(max(q) - min(q), 1) AS span
               FROM qv GROUP BY 1),
        e AS (SELECT qv.dim, mn, mx,
                     q - (mn + ((q - mn) * 255 // span) * span // 255)
                       AS err
              FROM qv JOIN mm USING (dim))
        SELECT CAST(dim AS BIGINT) AS dim, CAST(mn AS BIGINT) AS min_q,
               CAST(mx AS BIGINT) AS max_q,
               CAST(sum(err * err) AS BIGINT) AS sse,
               CAST(max(abs(err)) AS BIGINT) AS max_abs_err
        FROM e GROUP BY 1, 2, 3
    """

    # salt_plan: per shuffle domain the 10 heaviest keys (string
    # compare) with ceil-division salt factors.
    sql["salt_plan"] = " UNION ALL ".join(
        f"""
        SELECT * FROM (
          SELECT '{domain}' AS domain, CAST({col} AS VARCHAR) AS key,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST((count(*) + 63) // 64 AS BIGINT) AS salt
          FROM {tbl} GROUP BY 2
          ORDER BY n_rows DESC, key LIMIT 10
        )
        """
        for domain, tbl, col in (
            ("events.user_id", "events", "user_id"),
            ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
            ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
            ("documents.source", "documents", "source"),
        )
    )

    # q5_local_supplier: the textbook Q5 over the available columns;
    # cents with the shared floor convention; revenue-desc order with
    # the n_name tiebreak.
    sql["q5_local_supplier"] = """
        SELECT n.n_name,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                    * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE s.s_nationkey = c.c_nationkey
          AND r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
        ORDER BY revenue_cents DESC, n_name
    """

    # rake_keywords: phrase runs via gaps-and-islands (pos −
    # row_number over non-stopword tokens); the 23-word stoplist is
    # the module constant verbatim.
    sql["rake_keywords"] = """
        WITH w2 AS (SELECT doc_id, regexp_extract_all(lower(text),
                           '[a-z0-9]+') AS ws FROM documents),
        tok AS (SELECT doc_id, i AS pos, ws[i] AS w
                FROM w2, unnest(range(1, len(ws) + 1)) AS t(i)),
        ns AS (SELECT doc_id, pos, w,
                      pos - row_number() OVER (PARTITION BY doc_id
                                               ORDER BY pos) AS isl
               FROM tok
               WHERE w NOT IN ('a','an','and','are','as','at','be','by',
                               'for','from','in','is','it','of','on','or',
                               'that','the','this','to','was','were',
                               'with')),
        ph AS (SELECT doc_id, isl, CAST(count(*) AS BIGINT) AS plen
               FROM ns GROUP BY 1, 2),
        wd AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
                      CAST(sum(plen) AS BIGINT) AS degree
               FROM ns JOIN ph USING (doc_id, isl) GROUP BY 1)
        SELECT word, freq, degree,
               CAST(degree * 1000 // freq AS BIGINT) AS score_x1000
        FROM wd
        ORDER BY score_x1000 DESC, freq DESC, word
        LIMIT 50
    """

    # q18_large_orders: the textbook Q18 with the shared
    # floor(x*100+0.5) centi-unit convention on both quantity and
    # price; deterministic (price, orderkey) tiebreak.
    sql["q18_large_orders"] = """
        WITH heavy AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS sum_qty_c
          FROM lineitem GROUP BY 1
          HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 20000
        )
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               epoch_us(o.o_orderdate) AS o_orderdate_us,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                 AS o_totalprice_cents,
               h.sum_qty_c
        FROM heavy h
        JOIN orders o ON o.o_orderkey = h.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o_totalprice_cents DESC, o.o_orderkey
        LIMIT 100
    """

    # welch_t2_grid: the same exact rational in HUGEINT over the
    # per-source sufficient statistics; pairs via a self-join on
    # source name order.
    sql["welch_t2_grid"] = """
        WITH s AS (
          SELECT source, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(n_chars) AS HUGEINT) AS s,
                 CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT)
                   AS q
          FROM documents GROUP BY 1
        )
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
               CAST(a.s * 1000 // a.n AS BIGINT) AS mean_a_x1000,
               CAST(b.s * 1000 // b.n AS BIGINT) AS mean_b_x1000,
               CAST(
                 ((a.s * b.n - b.s * a.n) * (a.s * b.n - b.s * a.n)
                  * (a.n - 1) * (b.n - 1) * 1000)
                 // ((a.n * a.q - a.s * a.s) * b.n * b.n * (b.n - 1)
                     + (b.n * b.q - b.s * b.s) * a.n * a.n * (a.n - 1))
               AS BIGINT) AS t2_x1000
        FROM s a JOIN s b ON a.source < b.source
    """

    # cusum_drift: the same reduction in window functions — cum via
    # SUM OVER, running extrema clamped through 0; first argmax day
    # via a correlated min(day) over the tiny grid.
    sql["cusum_drift"] = """
        WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                          CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
        s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
                     CAST(sum(n) AS BIGINT) AS tot
              FROM d GROUP BY 1),
        c AS (SELECT d.event_type, day,
                     sum(n * nd - tot) OVER (PARTITION BY d.event_type
                                             ORDER BY day) AS cum
              FROM d JOIN s USING (event_type)),
        v AS (SELECT event_type, day,
                     cum - least(0, min(cum) OVER (PARTITION BY event_type
                                                   ORDER BY day)) AS pos,
                     greatest(0, max(cum) OVER (PARTITION BY event_type
                                                ORDER BY day)) - cum AS neg
              FROM c),
        agg AS (SELECT event_type, max(pos) AS mp, max(neg) AS mn
                FROM v GROUP BY 1)
        SELECT a.event_type, s.nd AS n_days,
               CAST(a.mp AS BIGINT) AS max_pos_cusum,
               (SELECT CAST(min(day) AS BIGINT) FROM v
                WHERE v.event_type = a.event_type AND v.pos = a.mp)
                 AS day_pos,
               CAST(a.mn AS BIGINT) AS max_neg_cusum,
               (SELECT CAST(min(day) AS BIGINT) FROM v
                WHERE v.event_type = a.event_type AND v.neg = a.mn)
                 AS day_neg
        FROM agg a JOIN s USING (event_type)
    """

    # compaction_plan: the exclusive running byte prefix per source
    # in doc_id order; '//' floor == numpy for the non-negative
    # prefix.
    sql["compaction_plan"] = """
        WITH w AS (
          SELECT source, doc_id, n_chars,
                 coalesce(sum(n_chars) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS prev
          FROM documents
        )
        SELECT source, CAST(prev // 32768 AS BIGINT) AS file_idx,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS bytes,
               CAST(min(doc_id) AS BIGINT) AS doc_lo,
               CAST(max(doc_id) AS BIGINT) AS doc_hi
        FROM w GROUP BY 1, 2
    """

    # joinability_audit: one branch per (i < j) column pair over
    # DISTINCT value sets; generated so all 28 branches share one
    # shape. '//' floor == numpy for the non-negative ratios.
    _join_cols = (
        ("customer.c_custkey", "customer", "c_custkey"),
        ("orders.o_custkey", "orders", "o_custkey"),
        ("orders.o_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("part.p_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        ("supplier.s_suppkey", "supplier", "s_suppkey"),
    )
    sql["joinability_audit"] = " UNION ALL ".join(
        f"""
        SELECT '{na}' AS col_a, '{nb}' AS col_b,
               (SELECT CAST(count(DISTINCT {ca}) AS BIGINT) FROM {ta}) AS n_a,
               (SELECT CAST(count(DISTINCT {cb}) AS BIGINT) FROM {tb}) AS n_b,
               i.c AS n_common,
               CAST(i.c * 10000 // (
                 (SELECT count(DISTINCT {ca}) FROM {ta})
                 + (SELECT count(DISTINCT {cb}) FROM {tb}) - i.c
               ) AS BIGINT) AS jaccard_bp,
               CAST(i.c * 10000
                 // (SELECT count(DISTINCT {ca}) FROM {ta})
               AS BIGINT) AS containment_bp
        FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM
              (SELECT DISTINCT {ca} AS v FROM {ta}) a
              JOIN (SELECT DISTINCT {cb} AS v FROM {tb}) b USING (v)) i
        """
        for x in range(len(_join_cols))
        for y in range(x + 1, len(_join_cols))
        for (na, ta, ca), (nb, tb, cb) in [(_join_cols[x], _join_cols[y])]
    )

    # bitmap_index_audit: the (dim, key, chunk) container sizes, then
    # Roaring's array/bitmap rule and byte costs.
    sql["bitmap_index_audit"] = """
        WITH u AS (
          SELECT 'lang' AS dim, lang AS key, doc_id FROM documents
          UNION ALL
          SELECT 'source', source, doc_id FROM documents
        ),
        c AS (
          SELECT dim, key, doc_id // 65536 AS chunk,
                 CAST(count(*) AS BIGINT) AS n
          FROM u GROUP BY 1, 2, 3
        ),
        k AS (
          SELECT dim, key,
                 CASE WHEN n < 4096 THEN 'array' ELSE 'bitmap' END AS kind,
                 n,
                 CASE WHEN n < 4096 THEN 2 * n ELSE 8192 END AS b
          FROM c
        )
        SELECT dim, key, kind,
               CAST(count(*) AS BIGINT) AS n_containers,
               CAST(sum(n) AS BIGINT) AS n_entries,
               CAST(sum(b) AS BIGINT) AS bytes_est
        FROM k GROUP BY 1, 2, 3
    """

    # k_anonymity_audit: the QI groupby + CASE band ladder; the
    # +10^7 shift keeps '//' floor-correct for negative balances.
    sql["k_anonymity_audit"] = """
        WITH qi AS (
          SELECT c_nationkey, c_mktsegment,
                 (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                  + 10000000) // 100000 AS b,
                 CAST(count(*) AS BIGINT) AS n
          FROM customer GROUP BY 1, 2, 3
        ),
        band AS (
          SELECT CASE WHEN n = 1 THEN 1 WHEN n = 2 THEN 2
                      WHEN n <= 4 THEN 3 WHEN n <= 9 THEN 5
                      ELSE 10 END AS size_lo,
                 CASE WHEN n = 1 THEN 1 WHEN n = 2 THEN 2
                      WHEN n <= 4 THEN 4 WHEN n <= 9 THEN 9
                      ELSE (CAST(1 AS BIGINT) << 62) END AS size_hi,
                 n
          FROM qi
        )
        SELECT CAST(size_lo AS BIGINT) AS size_lo,
               CAST(size_hi AS BIGINT) AS size_hi,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(sum(n) AS BIGINT) AS n_rows
        FROM band GROUP BY 1, 2
    """

    # l_diversity_audit: distinct sensitive segments per QI class,
    # then the l histogram.
    sql["l_diversity_audit"] = """
        WITH qi AS (
          SELECT c_nationkey,
                 (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                  + 10000000) // 100000 AS b,
                 CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l,
                 CAST(count(*) AS BIGINT) AS n
          FROM customer GROUP BY 1, 2
        )
        SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
               CAST(sum(n) AS BIGINT) AS n_rows
        FROM qi GROUP BY 1
    """

    # ewma_daily: the integer recursion replayed via a recursive CTE
    # stepping the per-type row_number chain; '//' floor == numpy for
    # the non-negative accumulator.
    sql["ewma_daily"] = """
        WITH RECURSIVE d AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        idx AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                             ORDER BY day) AS rn
                FROM d),
        r AS (
          SELECT event_type, day, n, rn, n * 1000000 AS e
          FROM idx WHERE rn = 1
          UNION ALL
          SELECT i.event_type, i.day, i.n, i.rn,
                 (r.e + i.n * 1000000) // 2
          FROM r JOIN idx i
            ON i.event_type = r.event_type AND i.rn = r.rn + 1
        )
        SELECT event_type, CAST(day AS BIGINT) AS day, n,
               CAST(e AS BIGINT) AS ewma_fp
        FROM r
    """

    # seasonality_dow: weekday via the same (day+3)%7 epoch-day math;
    # index in exact integer basis points over present days.
    sql["seasonality_dow"] = """
        WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                          CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
        t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total_all,
                     CAST(count(*) AS BIGINT) AS n_all
              FROM d GROUP BY 1),
        g AS (SELECT event_type, (day + 3) % 7 AS dow,
                     CAST(count(*) AS BIGINT) AS n_days,
                     CAST(sum(n) AS BIGINT) AS total
              FROM d GROUP BY 1, 2)
        SELECT g.event_type, CAST(g.dow AS BIGINT) AS dow, g.n_days,
               g.total,
               CAST(g.total * t.n_all * 10000
                    // (g.n_days * t.total_all) AS BIGINT) AS index_bp
        FROM g JOIN t USING (event_type)
    """

    # ndcg_search: the bm25 CTE reused verbatim as the ranker; rel =
    # least(total query-term tf, 3); DCG terms are exact ints
    # (gain · 2520/pos), nDCG one division of the two integer sums.
    sql["ndcg_search"] = f"""
        WITH bm AS ({sql["bm25_scores"]}),
        w2 AS (SELECT doc_id, regexp_extract_all(lower(text),
                      '[a-z0-9]+') AS ws FROM documents),
        tok AS (SELECT doc_id, unnest(ws) AS t FROM w2),
        relv AS (SELECT doc_id, CAST(least(count(*), 3) AS BIGINT) AS rel
                 FROM tok WHERE t IN ('hash','merge','scan','table')
                 GROUP BY 1),
        ranked AS (SELECT bm.doc_id, relv.rel,
                          row_number() OVER (ORDER BY bm.bm25_fp DESC,
                                             bm.doc_id) AS pos
                   FROM bm JOIN relv USING (doc_id)),
        ideal AS (SELECT doc_id, rel,
                         row_number() OVER (ORDER BY rel DESC, doc_id) AS pos
                  FROM relv),
        r10 AS (SELECT pos, doc_id, rel,
                       ((1 << rel) - 1) * (2520 // pos) AS contrib
                FROM ranked WHERE pos <= 10),
        i10 AS (SELECT pos, doc_id AS ideal_doc_id, rel AS ideal_rel,
                       ((1 << rel) - 1) * (2520 // pos) AS ideal_contrib
                FROM ideal WHERE pos <= 10)
        SELECT CAST(r10.pos AS BIGINT) AS pos, r10.doc_id, r10.rel,
               CAST(r10.contrib AS BIGINT) AS contrib_2520,
               i10.ideal_doc_id,
               CAST(i10.ideal_rel AS BIGINT) AS ideal_rel,
               CAST(i10.ideal_contrib AS BIGINT) AS ideal_contrib_2520,
               CAST(sum(r10.contrib) OVER () AS DOUBLE)
                 / CAST(sum(i10.ideal_contrib) OVER () AS DOUBLE) AS ndcg
        FROM r10 JOIN i10 USING (pos)
    """

    # orphan_fk_audit: one LEFT-JOIN branch per FK edge; unreferenced
    # parents via the reversed anti-join. Generated per edge to keep
    # the 7 branches literally identical in shape.
    _fk_edges = (
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    )
    sql["orphan_fk_audit"] = " UNION ALL ".join(
        f"""
        SELECT '{edge}' AS edge,
               CAST(count(*) AS BIGINT) AS n_child_rows,
               CAST(count(DISTINCT c.{ck}) AS BIGINT) AS n_child_keys,
               CAST(count(*) FILTER (WHERE p.{pk} IS NULL) AS BIGINT)
                 AS n_orphan_rows,
               CAST(count(DISTINCT c.{ck}) FILTER (WHERE p.{pk} IS NULL)
                 AS BIGINT) AS n_orphan_keys,
               (SELECT CAST(count(*) AS BIGINT) FROM {pt}
                WHERE {pk} NOT IN (SELECT {ck} FROM {ct}))
                 AS n_unref_parents
        FROM {ct} c LEFT JOIN {pt} p ON c.{ck} = p.{pk}
        """
        for edge, ct, ck, pt, pk in _fk_edges
    )

    # knn_graph: the SAME trained quantizer; for EVERY vector, its
    # KNN_K nearest same-cell neighbors by exact int64 squared L2,
    # ranked by (d2, neighbor_id)
    sql["knn_graph"] = (
        sql["ann_topk_ivf_kmeans"].split("        pd AS (")[0]
        + """        pd AS (
          SELECT x.vec_id AS src, y.vec_id AS dst,
                 sum((x.q - y.q) * (x.q - y.q)) AS d2
          FROM qv x
          JOIN a2 ax ON ax.vec_id = x.vec_id
          JOIN a2 ay ON ay.c = ax.c
          JOIN qv y ON y.vec_id = ay.vec_id AND y.dim = x.dim
          WHERE x.vec_id <> y.vec_id
          GROUP BY 1, 2
        )
        SELECT src AS vec_id, dst AS neighbor_id,
               CAST(d2 AS BIGINT) AS d2, rank
        FROM (
          SELECT src, dst, d2,
                 CAST(row_number() OVER (
                   PARTITION BY src ORDER BY d2 ASC, dst ASC
                 ) AS BIGINT) AS rank
          FROM pd) WHERE rank <= 3
    """
    )

    # two_hop_reach: the knn_graph CTE reused verbatim; reach via the
    # UNION-dedup of direct and composed hops.
    sql["two_hop_reach"] = f"""
        WITH kg AS ({sql["knn_graph"]}),
        e AS (SELECT vec_id AS u, neighbor_id AS v FROM kg),
        two AS (SELECT a.u, b.v AS w FROM e a JOIN e b ON b.u = a.v
                WHERE b.v <> a.u),
        reach AS (SELECT u, v AS w FROM e UNION SELECT u, w FROM two),
        r AS (SELECT u, CAST(count(*) AS BIGINT) AS reach2
              FROM reach GROUP BY 1),
        d AS (SELECT u, CAST(count(*) AS BIGINT) AS n1 FROM e GROUP BY 1)
        SELECT r.u AS vec_id, d.n1, r.reach2,
               CAST(r.reach2 - d.n1 AS BIGINT) AS n2_new
        FROM r JOIN d USING (u)
    """


    # prototype_score: the SAME trained quantizer; per vector, the
    # exact int64 distance to its own (a2) centroid and the
    # hardest-first rank within its cell
    sql["prototype_score"] = (
        sql["ann_topk_ivf_kmeans"].split("        pd AS (")[0]
        + """        proto AS (
          SELECT vec_id, c, d2 FROM (
            SELECT vec_id, c, d2,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
            FROM d2c) WHERE rn = 1
        )
        SELECT vec_id, CAST(c AS BIGINT) AS cell,
               CAST(d2 AS BIGINT) AS d2_centroid,
               CAST(row_number() OVER (
                 PARTITION BY c ORDER BY d2 DESC, vec_id ASC
               ) AS BIGINT) AS hardness_rank
        FROM proto
    """
    )

    # pq_topk: the k-means CTE chain replayed PER SUBSPACE (the extra
    # `dim // 16` grouping key is the only change vs ann_topk_ivf_kmeans
    # training); ADC distance = sum over subspaces of the query's exact
    # subvector distance to the neighbor's assigned codebook entry
    sql["pq_topk"] = """
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
        qtab AS (  -- the query's (subspace, code) ADC distance table
          SELECT x.vec_id, cb.s, cb.c, sum((x.q - cb.q) * (x.q - cb.q)) AS d2
          FROM qv x JOIN cent2f cb ON cb.dim = x.dim
          WHERE x.vec_id < 16 GROUP BY 1, 2, 3
        ),
        pd AS (
          SELECT t.vec_id AS query_id, ay.vec_id AS neighbor_id,
                 sum(t.d2) AS d2
          FROM a2 ay JOIN qtab t ON t.s = ay.s AND t.c = ay.c
          WHERE ay.vec_id <> t.vec_id
          GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, rank FROM (
          SELECT query_id, neighbor_id,
                 CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY d2 ASC, neighbor_id ASC
                 ) AS BIGINT) AS rank
          FROM pd) WHERE rank <= 5
    """

    # semdedup: the SAME trained quantizer (every CTE up to the final
    # assignment a2 is reused verbatim), then within-cell cosine
    # components with one kept representative per component
    sql["semdedup"] = (
        sql["ann_topk_ivf_kmeans"].split("        pd AS (")[0]
        + """        pairs AS (
          SELECT x.vec_id AS src, y.vec_id AS dst
          FROM embeddings x
          JOIN a2 ax ON ax.vec_id = x.vec_id
          JOIN a2 ay ON ay.c = ax.c
          JOIN embeddings y ON y.vec_id = ay.vec_id
          WHERE x.vec_id <> y.vec_id
            AND list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                       CAST(y.embedding AS DOUBLE[])) >= 0.4
        ),
        reach AS (
          SELECT vec_id AS v, vec_id AS lab FROM embeddings
          UNION
          SELECT p.src AS v, r.lab
          FROM reach r JOIN pairs p ON p.dst = r.v
        ),
        comp AS (
          SELECT v AS vec_id, CAST(min(lab) AS BIGINT) AS rep_id
          FROM reach GROUP BY 1
        )
        SELECT c.vec_id, CAST(a2.c AS BIGINT) AS cell, c.rep_id,
               CAST(CASE WHEN c.rep_id = c.vec_id THEN 1 ELSE 0 END AS BIGINT)
                   AS kept
        FROM comp c JOIN a2 ON a2.vec_id = c.vec_id
    """
    ).replace("WITH qv AS", "WITH RECURSIVE qv AS")

    sql["sliding_window"] = """
        SELECT event_type, ts,
               CAST(count(*) OVER (
                 PARTITION BY event_type ORDER BY ts
                 RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_win
        FROM events
    """

    sql["funnel_stages"] = """
        WITH m AS (
          SELECT user_id, ts, event_type,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 30 * 60 * 1000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events
        ),
        s AS (
          SELECT user_id, ts, event_type,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_no
          FROM m
        ),
        v AS (
          SELECT user_id, session_no, min(ts) AS t_v FROM s
          WHERE event_type = 'view' GROUP BY 1, 2
        ),
        c AS (
          SELECT s.user_id, s.session_no, min(s.ts) AS t_c
          FROM s JOIN v USING (user_id, session_no)
          WHERE s.event_type = 'click' AND s.ts >= v.t_v GROUP BY 1, 2
        ),
        p AS (
          SELECT s.user_id, s.session_no, min(s.ts) AS t_p
          FROM s JOIN c USING (user_id, session_no)
          WHERE s.event_type = 'purchase' AND s.ts >= c.t_c GROUP BY 1, 2
        )
        SELECT s.user_id, CAST(s.session_no AS BIGINT) AS session_no,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(CASE WHEN p.t_p IS NOT NULL THEN 3
                         WHEN c.t_c IS NOT NULL THEN 2
                         WHEN v.t_v IS NOT NULL THEN 1
                         ELSE 0 END AS BIGINT) AS funnel_stage
        FROM s
        LEFT JOIN v USING (user_id, session_no)
        LEFT JOIN c USING (user_id, session_no)
        LEFT JOIN p USING (user_id, session_no)
        GROUP BY s.user_id, s.session_no, v.t_v, c.t_c, p.t_p
    """

    sql["asof_join"] = """
        WITH c AS (
          SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
        ),
        p AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
               lat.click_id, lat.click_ts,
               epoch_us(p.ts) - epoch_us(lat.click_ts) AS gap_us
        FROM p, LATERAL (
          SELECT event_id AS click_id, ts AS click_ts
          FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
          ORDER BY ts DESC, event_id DESC LIMIT 1
        ) lat
    """

    sql["range_join"] = """
        SELECT p.event_id AS purchase_id,
               p.user_id,
               CAST(count(c.event_id) AS BIGINT) AS n_clicks_1h
        FROM events p
        LEFT JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL 1 HOUR
         AND c.ts < p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY 1, 2
    """

    sql["median_by_type"] = """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(quantile_disc(CAST(floor(value * 100 + 0.5) AS BIGINT), 0.5)
                    AS BIGINT) AS median_cents
        FROM events GROUP BY 1
    """

    sql["quantile_gate"] = """
        WITH th AS (
            SELECT source,
                   percentile_disc(0.1) WITHIN GROUP (ORDER BY n_chars)
                       AS lo_chars,
                   percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)
                       AS hi_chars
            FROM documents GROUP BY source
        )
        SELECT d.doc_id, d.source, d.n_chars, th.lo_chars, th.hi_chars
        FROM documents d JOIN th ON d.source = th.source
        WHERE d.n_chars BETWEEN th.lo_chars AND th.hi_chars
    """

    sql["hash_sample"] = """
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS sample_hash
        FROM documents
        ORDER BY sample_hash LIMIT 100
    """

    sql["ann_topk_ivf"] = """
        SELECT query_id, neighbor_id, rank FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 CAST(row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                   CAST(e.embedding AS DOUBLE[])) DESC,
                            e.vec_id ASC
                 ) AS BIGINT) AS rank
          FROM embeddings q, embeddings e
          WHERE q.vec_id < 16 AND e.vec_id <> q.vec_id AND e.label = q.label
        ) WHERE rank <= 5
    """


    sql["html_extract"] = """
        SELECT doc_id,
               CASE WHEN length(trim(text)) >= 25 THEN trim(text) ELSE '' END AS main_text
        FROM documents
    """


    sql["dedup_embedding_lsh"] = """
        WITH b AS (
          SELECT e.vec_id,
                 string_agg(CASE WHEN list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                             CAST(a.embedding AS DOUBLE[])) > 0
                            THEN '1' ELSE '0' END, '' ORDER BY a.vec_id) AS bucket
          FROM embeddings e, embeddings a
          WHERE a.vec_id >= 16 AND a.vec_id < 24
          GROUP BY e.vec_id
        )
        SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
        FROM embeddings x
        JOIN b bx ON bx.vec_id = x.vec_id
        JOIN b by2 ON TRUE
        JOIN embeddings y ON y.vec_id = by2.vec_id
        WHERE x.vec_id < y.vec_id AND bx.bucket = by2.bucket
          AND list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                     CAST(y.embedding AS DOUBLE[])) >= 0.4
    """

    sql["normalize_text"] = r"""
        SELECT doc_id,
               trim(regexp_replace(nfc_normalize(coalesce(text, '')),
                                   '\s+', ' ', 'g')) AS norm_text,
               trim(regexp_replace(nfc_normalize(coalesce(text, '')),
                                   '\s+', ' ', 'g')) <> coalesce(text, '') AS changed
        FROM documents
    """

    sql["redact_pii"] = r"""
        SELECT doc_id,
               regexp_replace(step1, '[0-9]{7,}', '[NUM]', 'g') AS redacted,
               n_emails,
               CAST(len(regexp_extract_all(step1, '[0-9]{7,}')) AS BIGINT) AS n_numbers
        FROM (
          SELECT doc_id,
                 regexp_replace(coalesce(text, ''),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '[EMAIL]', 'g') AS step1,
                 CAST(len(regexp_extract_all(coalesce(text, ''),
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails
          FROM documents
        )
    """

    sql["tfidf_top_terms"] = """
        WITH w AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2
        ),
        dfreq AS (
          SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                 (tf.tf * 1000000) // dfreq.df AS score
          FROM tf JOIN dfreq USING (term)
        ),
        ranked AS (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term ASC
                 ) AS BIGINT) AS rnk
          FROM scored
        )
        SELECT doc_id, term, tf, df, score, rnk FROM ranked WHERE rnk <= 3
    """

    # shared exact-integer k-means assignment chain (qv..a2) — the
    # VERBATIM ann_topk_ivf_kmeans prefix, spliced into every oracle
    # that needs the trained cell assignment
    _km_chain = """qv AS (
          SELECT vec_id, dim,
                 CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 1000000 + 0.5)
                      AS BIGINT) AS q
          FROM embeddings, UNNEST(range(0, 64)) t(dim)
        ),
        seed AS (
          SELECT vec_id - 16 AS c, dim, q FROM qv
          WHERE vec_id BETWEEN 16 AND 23
        ),
        d0 AS (
          SELECT v.vec_id, s.c, sum((v.q - s.q) * (v.q - s.q)) AS d2
          FROM qv v JOIN seed s USING (dim) GROUP BY 1, 2
        ),
        a0 AS (
          SELECT vec_id, c FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
            FROM d0) WHERE rn = 1
        ),
        cent1 AS (
          SELECT a0.c, qv.dim, CAST(sum(qv.q) // count(*) AS BIGINT) AS q
          FROM qv JOIN a0 USING (vec_id) GROUP BY 1, 2
        ),
        cent1f AS (
          SELECT s.c, s.dim, coalesce(c1.q, s.q) AS q
          FROM seed s LEFT JOIN cent1 c1 ON c1.c = s.c AND c1.dim = s.dim
        ),
        d1 AS (
          SELECT v.vec_id, cn.c, sum((v.q - cn.q) * (v.q - cn.q)) AS d2
          FROM qv v JOIN cent1f cn USING (dim) GROUP BY 1, 2
        ),
        a1 AS (
          SELECT vec_id, c FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
            FROM d1) WHERE rn = 1
        ),
        cent2 AS (
          SELECT a1.c, qv.dim, CAST(sum(qv.q) // count(*) AS BIGINT) AS q
          FROM qv JOIN a1 USING (vec_id) GROUP BY 1, 2
        ),
        cent2f AS (
          SELECT f.c, f.dim, coalesce(c2.q, f.q) AS q
          FROM cent1f f LEFT JOIN cent2 c2 ON c2.c = f.c AND c2.dim = f.dim
        ),
        d2c AS (
          SELECT v.vec_id, cn.c, sum((v.q - cn.q) * (v.q - cn.q)) AS d2
          FROM qv v JOIN cent2f cn USING (dim) GROUP BY 1, 2
        ),
        a2 AS (
          SELECT vec_id, c FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
            FROM d2c) WHERE rn = 1
        ),
"""

    # cluster_top_terms: the assignment chain + tfidf's tokenizer;
    # stopword gate = global top-25 terms (ties count DESC, term ASC)
    # mirrored both sides
    sql["cluster_top_terms"] = f"""
        WITH {_km_chain}
        w AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents
        ),
        gl AS (
          SELECT term, count(*) AS gtf FROM w GROUP BY 1
        ),
        stop AS (
          SELECT term FROM (
            SELECT term, row_number() OVER (ORDER BY gtf DESC, term) AS rn
            FROM gl) WHERE rn <= 25
        ),
        tc AS (
          SELECT a2.c AS cell, w.term, CAST(count(*) AS BIGINT) AS tf
          FROM w JOIN a2 ON a2.vec_id = w.doc_id
          WHERE w.term NOT IN (SELECT term FROM stop)
          GROUP BY 1, 2
        )
        SELECT CAST(cell AS BIGINT) AS cell, term, tf,
               CAST(rn AS BIGINT) AS rnk
        FROM (
          SELECT cell, term, tf,
                 row_number() OVER (
                   PARTITION BY cell ORDER BY tf DESC, term ASC
                 ) AS rn
          FROM tc) WHERE rn <= 5
    """

    # corr_moments: ×100 scaling identical to the Ray side's
    # floor(x*100+0.5); all sums exact int64
    sql["corr_moments"] = """
        WITH s AS (
          SELECT l_returnflag,
                 CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q,
                 CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d,
                 CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS t
          FROM lineitem
        )
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q) AS BIGINT) AS sum_q,
               CAST(sum(d) AS BIGINT) AS sum_d,
               CAST(sum(t) AS BIGINT) AS sum_t,
               CAST(sum(q*q) AS BIGINT) AS sum_qq,
               CAST(sum(d*d) AS BIGINT) AS sum_dd,
               CAST(sum(t*t) AS BIGINT) AS sum_tt,
               CAST(sum(q*d) AS BIGINT) AS sum_qd,
               CAST(sum(q*t) AS BIGINT) AS sum_qt,
               CAST(sum(d*t) AS BIGINT) AS sum_dt
        FROM s GROUP BY 1
    """

    # cluster_purity: the assignment chain + the label column that
    # rides in the embeddings table; majority ties → smaller label
    sql["cluster_purity"] = f"""
        WITH {_km_chain}
        lc AS (
          SELECT a2.c AS cell, e.label, CAST(count(*) AS BIGINT) AS cnt
          FROM a2 JOIN embeddings e ON e.vec_id = a2.vec_id
          GROUP BY 1, 2
        ),
        tot AS (
          SELECT cell, CAST(sum(cnt) AS BIGINT) AS n_members
          FROM lc GROUP BY 1
        ),
        top AS (
          SELECT cell, label, cnt FROM (
            SELECT cell, label, cnt,
                   row_number() OVER (
                     PARTITION BY cell ORDER BY cnt DESC, label ASC
                   ) AS rn
            FROM lc) WHERE rn = 1
        )
        SELECT CAST(top.cell AS BIGINT) AS cell,
               tot.n_members,
               CAST(top.label AS BIGINT) AS top_label,
               top.cnt AS top_count
        FROM top JOIN tot ON tot.cell = top.cell
    """

    # kappa_agreement: splices the lang_id heuristic; pe_num joins the
    # confusion-matrix marginals on the shared class key
    sql["kappa_agreement"] = f"""
        WITH p AS ({sql["lang_id"]}),
        j AS (
          SELECT p.pred_lang AS pred, d.lang AS true_lang
          FROM p JOIN documents d USING (doc_id)
        ),
        cm AS (
          SELECT pred, true_lang, CAST(count(*) AS BIGINT) AS c
          FROM j GROUP BY 1, 2
        ),
        r AS (SELECT pred AS k, sum(c) AS rc FROM cm GROUP BY 1),
        cl AS (SELECT true_lang AS k, sum(c) AS cc FROM cm GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cm),
        ag AS (
          SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_agree
          FROM cm WHERE pred = true_lang
        ),
        pe AS (
          SELECT CAST(coalesce(sum(r.rc * cl.cc), 0) AS BIGINT) AS pe_num
          FROM r JOIN cl USING (k)
        )
        SELECT tot.n, ag.n_agree, pe.pe_num,
               CAST(tot.n * ag.n_agree - pe.pe_num AS BIGINT) AS kappa_num,
               CAST(tot.n * tot.n - pe.pe_num AS BIGINT) AS kappa_den
        FROM tot, ag, pe
    """

    # autocorr_lags: the (type, lag) grid LEFT JOINs the matched pairs
    # so zero-pair lags still emit a row, matching the Ray side
    sql["autocorr_lags"] = """
        WITH dc AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        lags AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag),
        grid AS (
          SELECT t.event_type, lags.lag
          FROM (SELECT DISTINCT event_type FROM dc) t CROSS JOIN lags
        ),
        pairs AS (
          SELECT a.event_type, l.lag, a.c AS x, b.c AS y
          FROM dc a CROSS JOIN lags l
          JOIN dc b ON b.event_type = a.event_type
                   AND b.day = a.day - CAST(l.lag AS INTEGER)
        )
        SELECT grid.event_type, grid.lag,
               CAST(coalesce(count(pairs.x), 0) AS BIGINT) AS n_pairs,
               CAST(coalesce(sum(pairs.x * pairs.y), 0) AS BIGINT) AS s_xy,
               CAST(coalesce(sum(pairs.x), 0) AS BIGINT) AS sum_x,
               CAST(coalesce(sum(pairs.y), 0) AS BIGINT) AS sum_y,
               CAST(coalesce(sum(pairs.x * pairs.x), 0) AS BIGINT) AS sum_xx,
               CAST(coalesce(sum(pairs.y * pairs.y), 0) AS BIGINT) AS sum_yy
        FROM grid LEFT JOIN pairs
          ON pairs.event_type = grid.event_type AND pairs.lag = grid.lag
        GROUP BY 1, 2
    """

    # shuffle_skew_audit: per key domain the rows / distinct keys /
    # max per-key rows / min key among the heaviest (stringified so
    # int and string key domains share one column).
    sql["shuffle_skew_audit"] = """
        WITH k1 AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS c
                    FROM events GROUP BY 1),
        k2 AS (SELECT CAST(l_orderkey AS VARCHAR) AS k, count(*) AS c
               FROM lineitem GROUP BY 1),
        k3 AS (SELECT CAST(l_suppkey AS VARCHAR) AS k, count(*) AS c
               FROM lineitem GROUP BY 1),
        k4 AS (SELECT source AS k, count(*) AS c FROM documents GROUP BY 1)
        SELECT 'events.user_id' AS key_name,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(max(c) AS BIGINT) AS max_key_rows,
               min(k) FILTER (WHERE c = (SELECT max(c) FROM k1)) AS hot_key
        FROM k1
        UNION ALL
        SELECT 'lineitem.l_orderkey', CAST(sum(c) AS BIGINT),
               CAST(count(*) AS BIGINT), CAST(max(c) AS BIGINT),
               min(k) FILTER (WHERE c = (SELECT max(c) FROM k2))
        FROM k2
        UNION ALL
        SELECT 'lineitem.l_suppkey', CAST(sum(c) AS BIGINT),
               CAST(count(*) AS BIGINT), CAST(max(c) AS BIGINT),
               min(k) FILTER (WHERE c = (SELECT max(c) FROM k3))
        FROM k3
        UNION ALL
        SELECT 'documents.source', CAST(sum(c) AS BIGINT),
               CAST(count(*) AS BIGINT), CAST(max(c) AS BIGINT),
               min(k) FILTER (WHERE c = (SELECT max(c) FROM k4))
        FROM k4
    """

    # front_coding_audit: lag() over the binary-collated term order;
    # prefix equality nests, so max k with equal substr(1..k) IS the
    # LCP; a bucket's first term (or first char change) saves 0.
    sql["front_coding_audit"] = """
        WITH t AS (
          SELECT DISTINCT unnest(
            regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents
        ),
        p AS (SELECT term, lag(term) OVER (ORDER BY term) AS prev FROM t),
        lk AS (
          SELECT term, prev,
                 unnest(range(1, CAST(least(length(term), length(prev))
                                      AS BIGINT) + 1)) AS k
          FROM p
          WHERE prev IS NOT NULL
            AND substr(prev, 1, 1) = substr(term, 1, 1)
        ),
        lcpv AS (
          SELECT term,
                 coalesce(max(CASE WHEN substr(term, 1, CAST(k AS INT))
                                        = substr(prev, 1, CAST(k AS INT))
                                   THEN k END), 0) AS lcp
          FROM lk GROUP BY term
        ),
        l AS (
          SELECT substr(p.term, 1, 1) AS c0, length(p.term) AS blen,
                 coalesce(lcpv.lcp, 0) AS lcp
          FROM p LEFT JOIN lcpv ON lcpv.term = p.term
        )
        SELECT c0 AS first_char,
               CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(blen) AS BIGINT) AS total_bytes,
               CAST(sum(lcp) AS BIGINT) AS saved_bytes
        FROM l GROUP BY 1
    """

    # global_quantiles: percentile_disc = smallest value whose
    # cumulative count reaches ceil(q*n/100) — the selection scan's
    # rank convention exactly (probed: DuckDB returns rank ceil(q*n)).
    sql["global_quantiles"] = """
        WITH c AS (
          SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
          FROM lineitem
        ),
        t AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM c)
        SELECT CAST(50 AS BIGINT) AS q, t.n_rows,
               (SELECT CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY cents)
                AS BIGINT) FROM c) AS value_cents FROM t
        UNION ALL
        SELECT CAST(90 AS BIGINT), t.n_rows,
               (SELECT CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY cents)
                AS BIGINT) FROM c) FROM t
        UNION ALL
        SELECT CAST(99 AS BIGINT), t.n_rows,
               (SELECT CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY cents)
                AS BIGINT) FROM c) FROM t
    """

    # growth_accounting: every first_day is a grid day, so the
    # running sum of n_new over grid days <= d counts exactly the
    # users with first activity <= d.
    sql["growth_accounting"] = """
        WITH ud AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
          FROM events
        ),
        fd AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1),
        act AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active
                FROM ud GROUP BY 1),
        nw AS (SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
               FROM fd GROUP BY 1)
        SELECT CAST(act.day AS BIGINT) AS day, act.n_active,
               CAST(coalesce(nw.n_new, 0) AS BIGINT) AS n_new,
               CAST(sum(coalesce(nw.n_new, 0)) OVER (
                   ORDER BY act.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_cum
        FROM act LEFT JOIN nw ON nw.day = act.day
    """

    # q3_shipping_priority: the textbook Q3 with o_orderpriority
    # carried (the fixture has no o_shippriority); revenue in exact
    # integer cents per line BEFORE the sum; ties fully broken by
    # (revenue, odate, orderkey) so LIMIT is deterministic.
    sql["q3_shipping_priority"] = """
        SELECT l_orderkey,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                    + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
               epoch_us(o_orderdate) AS o_orderdate_us,
               o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY 1, 3, 4
        ORDER BY revenue_cents DESC, o_orderdate_us, l_orderkey
        LIMIT 10
    """

    # error_recovery_time: next non-error strictly after in the
    # (ts, event_id) ROWS order — min ts over the following frame is
    # the next one's ts because ts is nondecreasing in that order;
    # '// 1000000' truncation equals numpy floor for the non-negative
    # gaps; NULL frame (never recovered) lands in bucket -1.
    sql["error_recovery_time"] = """
        WITH o AS (
            SELECT user_id, event_type, epoch_us(ts) AS t,
                   min(CASE WHEN event_type <> 'error'
                            THEN epoch_us(ts) END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
                   ) AS nxt
            FROM events
        )
        SELECT CASE WHEN nxt IS NULL THEN CAST(-1 AS BIGINT)
                    ELSE CAST(floor(log2((nxt - t) // 1000000 + 1))
                         AS BIGINT) END AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM o WHERE event_type = 'error'
        GROUP BY 1
    """

    # rolling_median_daily: trailing 7-PRESENT-day windowed median of
    # the same daily grid; 2*median keeps even-width head windows
    # exact (a .5 half is exact in a double on both sides). Day is
    # BIGINT days-since-epoch (ts >= 1970 in every fixture, so '//'
    # equals the numpy datetime64[D] floor).
    sql["rolling_median_daily"] = """
        WITH dc AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                 count(*) AS c
          FROM events GROUP BY 1, 2
        )
        SELECT event_type, CAST(day AS BIGINT) AS day,
               CAST(2 * median(c) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS med_x2
        FROM dc
    """

    # decile_table: NTILE ties break by doc_id on both sides
    sql["decile_table"] = """
        WITH r AS (
            SELECT lang, n_chars,
                   ntile(10) OVER (
                     PARTITION BY lang ORDER BY n_chars, doc_id
                   ) AS decile
            FROM documents
        )
        SELECT lang, CAST(decile AS BIGINT) AS decile,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(n_chars) AS BIGINT) AS sum_x
        FROM r GROUP BY 1, 2
    """

    sql["training_prep"] = f"""
        WITH st AS (
          SELECT doc_id, text,
                 CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
                 CAST(length(text) AS BIGINT) AS chars,
                 CAST((len(regexp_extract_all(text, '\\S+')) >= 20)::BIGINT
                    + (10 * len(regexp_extract_all(lower(text), '{_STOP_EN}'))
                       >= len(regexp_extract_all(text, '\\S+')))::BIGINT
                    + (5 * len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                       <= length(text))::BIGINT
                    + (10 * len(regexp_extract_all(text, '[0-9]'))
                       <= length(text))::BIGINT AS BIGINT) AS quality_score,
                 CAST(len(regexp_extract_all(lower(text), '{_STOP_EN}')) AS BIGINT) AS hits_en,
                 CAST(len(regexp_extract_all(lower(text), '{_STOP_DE}')) AS BIGINT) AS hits_de,
                 CAST(len(regexp_extract_all(lower(text), '{_STOP_FR}')) AS BIGINT) AS hits_fr,
                 CAST(len(regexp_extract_all(lower(text), '{_STOP_ES}')) AS BIGINT) AS hits_es
          FROM documents
        ),
        gated AS (
          SELECT doc_id, ws_tokens, chars, quality_score, md5(text) AS content_hash
          FROM st
          WHERE quality_score >= 3
            AND hits_en >= hits_de AND hits_en >= hits_fr
            AND hits_en >= hits_es AND hits_en > 0
        ),
        g AS (SELECT content_hash, min(doc_id) AS winner FROM gated GROUP BY 1)
        SELECT gated.doc_id, ws_tokens, chars, quality_score, content_hash
        FROM gated JOIN g USING (content_hash)
        WHERE gated.doc_id = g.winner
    """

    # funnel_attribution: the WHOLE curation funnel composed in one
    # statement — benchmark exclusion, the training_prep gate, exact
    # dedup on the 60-bit md5 prefix among survivors, fuzzy dedup on
    # the full-corpus MinHash component (min REMAINING doc wins), then
    # the contamination flag — every sub-CTE reused verbatim from the
    # per-stage oracles, so the COMPOSITION is what this verifies.
    sql["funnel_attribution"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        bandk AS (SELECT * FROM (VALUES {_BAND_VALUES}) AS t(b, am, ac)),
        sig AS (
          SELECT doc_id, b,
                 min(CAST(((CAST(CAST('0x' || substr(md5(s), 1, 15) AS UBIGINT) AS HUGEINT)
                            * am + ac) % 18446744073709551616) // 16 AS BIGINT)) AS mh
          FROM sh, bandk
          GROUP BY doc_id, b
        ),
        sigf AS (
          SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY b, mh) AS bs FROM sig)
          WHERE bs <= 128
        ),
        e AS (
          SELECT DISTINCT a.doc_id AS src, c.doc_id AS dst
          FROM sigf a JOIN sigf c ON a.b = c.b AND a.mh = c.mh
          WHERE a.doc_id <> c.doc_id
        ),
        reach AS (
          SELECT doc_id AS doc, doc_id AS lab FROM documents
          UNION
          SELECT e.src AS doc, r.lab
          FROM reach r JOIN e ON e.dst = r.doc
        ),
        comp AS (SELECT doc AS doc_id, CAST(min(lab) AS BIGINT) AS component_id
                 FROM reach GROUP BY 1),
        st AS (
          SELECT doc_id,
                 CAST((len(regexp_extract_all(text, '\\S+')) >= 20)::BIGINT
                    + (10 * len(regexp_extract_all(lower(text), '{_STOP_EN}'))
                       >= len(regexp_extract_all(text, '\\S+')))::BIGINT
                    + (5 * len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                       <= length(text))::BIGINT
                    + (10 * len(regexp_extract_all(text, '[0-9]'))
                       <= length(text))::BIGINT AS BIGINT) AS quality_score,
                 CAST(len(regexp_extract_all(lower(text), '{_STOP_EN}')) AS BIGINT) AS hits_en,
                 CAST(len(regexp_extract_all(lower(text), '{_STOP_DE}')) AS BIGINT) AS hits_de,
                 CAST(len(regexp_extract_all(lower(text), '{_STOP_FR}')) AS BIGINT) AS hits_fr,
                 CAST(len(regexp_extract_all(lower(text), '{_STOP_ES}')) AS BIGINT) AS hits_es
          FROM documents
        ),
        flags AS (
          SELECT doc_id,
                 (quality_score >= 3 AND hits_en >= hits_de
                  AND hits_en >= hits_fr AND hits_en >= hits_es
                  AND hits_en > 0) AS gate,
                 doc_id % 20 = 0 AS bench
          FROM st
        ),
        cand AS (
          SELECT f.doc_id,
                 CAST(CAST('0x' || substr(md5(d.text), 1, 15) AS UBIGINT)
                      AS BIGINT) AS h
          FROM flags f JOIN documents d USING (doc_id)
          WHERE f.gate AND NOT f.bench
        ),
        ew AS (SELECT h, min(doc_id) AS w FROM cand GROUP BY 1),
        exact_surv AS (
          SELECT c.doc_id FROM cand c JOIN ew ON c.h = ew.h
          WHERE c.doc_id = ew.w
        ),
        fz AS (SELECT s.doc_id, c.component_id
               FROM exact_surv s JOIN comp c USING (doc_id)),
        fw AS (SELECT component_id, min(doc_id) AS w FROM fz GROUP BY 1),
        fuzzy_surv AS (
          SELECT fz.doc_id FROM fz JOIN fw ON fz.component_id = fw.component_id
          WHERE fz.doc_id = fw.w
        ),
        bench_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
        ct AS (
          SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS o
          FROM sh LEFT JOIN bench_sh b ON sh.s = b.s
          WHERE sh.doc_id % 20 <> 0
          GROUP BY sh.doc_id
        ),
        contam AS (
          SELECT d.doc_id,
                 CASE WHEN coalesce(ct.n, 0) > 0
                       AND coalesce(ct.o, 0) * 10 >= ct.n * 1
                      THEN 1 ELSE 0 END AS c
          FROM documents d LEFT JOIN ct USING (doc_id)
        )
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 20 = 0 THEN 'benchmark'
                    WHEN NOT f.gate THEN 'gate'
                    WHEN es.doc_id IS NULL THEN 'exact_dup'
                    WHEN fs.doc_id IS NULL THEN 'fuzzy_dup'
                    WHEN cm.c = 1 THEN 'contaminated'
                    ELSE 'kept' END AS stage
        FROM documents d
        JOIN flags f USING (doc_id)
        LEFT JOIN exact_surv es USING (doc_id)
        LEFT JOIN fuzzy_surv fs USING (doc_id)
        LEFT JOIN contam cm USING (doc_id)
    """.replace("WITH w AS", "WITH RECURSIVE w AS")

    # extraction_metrics: the extraction itself is hermetic-engine work
    # no SQL can mirror, so the query materializes its e2e output to a
    # fixed sf-agnostic parquet path and the oracle recomputes the
    # metrics aggregation (bucket edges, groupby, sums) from those same
    # rows in DuckDB — verifying the metrics operator end-to-end. The
    # path must not depend on sf (oracle strings are built before the
    # harness picks its sf_dir; the query always runs first).
    from readur_ray.pipelines.extras import metrics_parquet_dir

    _mdir = metrics_parquet_dir("")
    sql["extraction_metrics"] = f"""
        SELECT CAST(part_id AS BIGINT) AS part_id,
               status,
               LEAST(GREATEST(CAST(FLOOR(confidence / 10) AS BIGINT), 0), 10)
                   AS conf_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(word_count) AS BIGINT) AS total_words,
               CAST(SUM(pages_ocrd) AS BIGINT) AS total_pages_ocrd
        FROM read_parquet('{_mdir}/*.parquet')
        GROUP BY 1, 2, 3
    """

    # --- training-data curation suite (readur_ray/pipelines/curation.py) ---

    sql["line_dedup"] = """
        WITH l AS (
          SELECT doc_id, i, ls[i] AS line
          FROM (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
                FROM documents),
               UNNEST(range(1, len(ls) + 1)) AS t(i)
        ),
        kept AS (
          SELECT doc_id, i, line FROM (
            SELECT doc_id, i, line,
                   row_number() OVER (PARTITION BY line ORDER BY doc_id, i) AS rn
            FROM l)
          WHERE rn = 1
        ),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_lines,
                 string_agg(line, chr(10) ORDER BY i) AS kept_text
          FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(len(string_split(coalesce(d.text, ''), chr(10))) AS BIGINT)
                   AS n_lines,
               CAST(coalesce(agg.kept_lines, 0) AS BIGINT) AS kept_lines,
               sha256(coalesce(agg.kept_text, '')) AS kept_sha256
        FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """

    sql["contamination"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
        tgt AS (
          SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
                 CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_overlap
          FROM sh LEFT JOIN bench b ON sh.s = b.s
          WHERE sh.doc_id % 20 <> 0
          GROUP BY sh.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(t.n_shingles, 0) AS BIGINT) AS n_shingles,
               CAST(coalesce(t.n_overlap, 0) AS BIGINT) AS n_overlap,
               CAST(CASE WHEN coalesce(t.n_shingles, 0) > 0
                          AND coalesce(t.n_overlap, 0) * 10 >= t.n_shingles * 1
                         THEN 1 ELSE 0 END AS BIGINT) AS contaminated
        FROM documents d LEFT JOIN tgt t ON d.doc_id = t.doc_id
        WHERE d.doc_id % 20 <> 0
    """

    sql["stratified_sample"] = """
        SELECT source, doc_id, rk AS sample_rank
        FROM (SELECT source, doc_id,
                     md5('samp:' || CAST(doc_id AS VARCHAR)) AS rk,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('samp:' || CAST(doc_id AS VARCHAR)), doc_id
                     ) AS rn
              FROM documents)
        WHERE rn <= 20
    """

    sql["repetition_score"] = f"""
        WITH {_WORDS_CTE},
        big AS (
          SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
          FROM w, UNNEST(range(1, len(ws))) AS t(i)
          WHERE len(ws) >= 2
        ),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS total,
                 CAST(count(DISTINCT g) AS BIGINT) AS dist
          FROM big GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(total, 0) AS BIGINT) AS bigrams_total,
               CAST(coalesce(dist, 0) AS BIGINT) AS bigrams_distinct,
               CAST(CASE WHEN coalesce(total, 0) > 0
                          AND (total - dist) * 5 >= total * 1
                         THEN 1 ELSE 0 END AS BIGINT) AS repetitive
        FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """

    # fuzzy_dedup_keep: the components oracle's fixed point, aggregated
    # to one row per cluster
    sql["fuzzy_dedup_keep"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        bandk AS (SELECT * FROM (VALUES {_BAND_VALUES}) AS t(b, am, ac)),
        sig AS (
          SELECT doc_id, b,
                 min(CAST(((CAST(CAST('0x' || substr(md5(s), 1, 15) AS UBIGINT) AS HUGEINT)
                            * am + ac) % 18446744073709551616) // 16 AS BIGINT)) AS mh
          FROM sh, bandk
          GROUP BY doc_id, b
        ),
        sigf AS (
          SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY b, mh) AS bs FROM sig)
          WHERE bs <= 128
        ),
        e AS (
          SELECT DISTINCT a.doc_id AS src, c.doc_id AS dst
          FROM sigf a JOIN sigf c ON a.b = c.b AND a.mh = c.mh
          WHERE a.doc_id <> c.doc_id
        ),
        reach AS (
          SELECT doc_id AS doc, doc_id AS lab FROM documents
          UNION
          SELECT e.src AS doc, r.lab
          FROM reach r JOIN e ON e.dst = r.doc
        ),
        comp AS (
          SELECT doc AS doc_id, CAST(min(lab) AS BIGINT) AS component_id
          FROM reach GROUP BY 1
        )
        SELECT component_id,
               CAST(count(*) AS BIGINT) AS group_size,
               CAST(count(*) - 1 AS BIGINT) AS n_removed
        FROM comp GROUP BY 1
    """.replace("WITH w AS", "WITH RECURSIVE w AS")

    # pack_sequences: global prefix sum under doc_id order == a window
    # cumulative sum; DuckDB `//` truncates like floor on these
    # non-negative values. Token rule: BPE-ish tokens + 1 EOS per doc.
    sql["pack_sequences"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
                   + 1 AS n_tokens
          FROM documents
        ),
        ofs AS (
          SELECT doc_id, n_tokens,
                 CAST(coalesce(SUM(n_tokens) OVER (
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS start_offset
          FROM toks
        )
        SELECT doc_id, n_tokens, start_offset,
               CAST(start_offset // 256 AS BIGINT) AS first_chunk,
               CAST((start_offset + n_tokens - 1) // 256 AS BIGINT) AS last_chunk,
               CAST((start_offset + n_tokens - 1) // 256
                    - start_offset // 256 + 1 AS BIGINT) AS n_chunks
        FROM ofs
    """

    _BIGRAM_CNTS_CTE = f"""
        {_WORDS_CTE},
        big AS (
          SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
          FROM w, UNNEST(range(1, len(ws))) AS t(i)
          WHERE len(ws) >= 2
        ),
        cnts AS (
          SELECT g, CAST(count(*) AS BIGINT) AS cnt FROM big GROUP BY g
        )"""

    sql["top_ngrams"] = f"""
        WITH {_BIGRAM_CNTS_CTE}
        SELECT g AS ngram, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, g) AS BIGINT) AS rank
        FROM cnts ORDER BY cnt DESC, g LIMIT 50
    """

    sql["common_ngram_score"] = f"""
        WITH {_BIGRAM_CNTS_CTE},
        topv AS (SELECT g FROM cnts ORDER BY cnt DESC, g LIMIT 100),
        agg AS (
          SELECT b.doc_id,
                 CAST(count(*) AS BIGINT) AS tot,
                 CAST(sum(CASE WHEN tv.g IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS com
          FROM big b LEFT JOIN topv tv ON b.g = tv.g
          GROUP BY b.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(tot, 0) AS BIGINT) AS bigrams_total,
               CAST(coalesce(com, 0) AS BIGINT) AS bigrams_common,
               CAST(CASE WHEN coalesce(tot, 0) > 0 AND com * 2 >= tot * 1
                         THEN 1 ELSE 0 END AS BIGINT) AS common
        FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """

    sql["training_shuffle"] = """
        WITH r AS (
          SELECT doc_id,
                 md5('shuf:' || CAST(doc_id AS VARCHAR)) AS rk
          FROM documents
        )
        SELECT doc_id,
               CAST(CAST('0x' || substr(rk, 1, 8) AS UBIGINT) % 8
                    AS BIGINT) AS shard,
               CAST(row_number() OVER (
                      PARTITION BY CAST('0x' || substr(rk, 1, 8) AS UBIGINT) % 8
                      ORDER BY rk, doc_id) AS BIGINT) AS pos
        FROM r
    """

    # dup_spans: the oracle hashes grams with the SAME 60-bit md5
    # prefix as the Ray side, so both sides merge (hypothetical)
    # collisions identically and the comparison stays bit-exact.
    sql["dup_spans"] = f"""
        WITH {_WORDS_CTE},
        g8 AS (
          SELECT doc_id,
                 CAST(CAST('0x' || substr(md5(
                        ws[i]   || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                        ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' ||
                        ws[i+6] || ' ' || ws[i+7]), 1, 15) AS UBIGINT)
                      AS BIGINT) AS gh
          FROM w, UNNEST(range(1, len(ws) - 6)) AS t(i)
          WHERE len(ws) >= 8
        ),
        occ AS (
          SELECT doc_id, gh, CAST(count(*) AS BIGINT) AS occ
          FROM g8 GROUP BY doc_id, gh
        ),
        gt AS (SELECT gh, CAST(sum(occ) AS BIGINT) AS gtot FROM occ GROUP BY gh),
        dup AS (
          SELECT o.doc_id, CAST(sum(o.occ) AS BIGINT) AS d
          FROM occ o JOIN gt ON o.gh = gt.gh
          WHERE gt.gtot >= 2 GROUP BY o.doc_id
        ),
        tot AS (
          SELECT doc_id,
                 CAST(CASE WHEN len(ws) >= 8 THEN len(ws) - 7 ELSE 0 END
                      AS BIGINT) AS t
          FROM w
        )
        SELECT tot.doc_id,
               tot.t AS grams_total,
               CAST(coalesce(dup.d, 0) AS BIGINT) AS grams_dup,
               CAST(CASE WHEN tot.t > 0 AND coalesce(dup.d, 0) * 5 >= tot.t * 1
                         THEN 1 ELSE 0 END AS BIGINT) AS dup_flag
        FROM tot LEFT JOIN dup ON tot.doc_id = dup.doc_id
    """

    # dedup_substrings: same 60-bit gram hash as dup_spans; a word
    # position is removed iff covered by any occurrence of a globally
    # duplicated 8-gram; survivors reassemble in order
    sql["dedup_substrings"] = f"""
        WITH {_WORDS_CTE},
        g8 AS (
          SELECT doc_id, i,
                 CAST(CAST('0x' || substr(md5(
                        ws[i]   || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                        ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' ||
                        ws[i+6] || ' ' || ws[i+7]), 1, 15) AS UBIGINT)
                      AS BIGINT) AS gh
          FROM w, UNNEST(range(1, len(ws) - 6)) AS t(i)
          WHERE len(ws) >= 8
        ),
        gt AS (SELECT gh FROM g8 GROUP BY gh HAVING count(*) >= 2),
        ds AS (SELECT g8.doc_id, g8.i FROM g8 JOIN gt USING (gh)),
        pos AS (
          SELECT doc_id, p, ws[p] AS word
          FROM w, UNNEST(range(1, len(ws) + 1)) AS t(p)
        ),
        kept AS (
          SELECT pos.doc_id, pos.p, pos.word FROM pos
          WHERE NOT EXISTS (
            SELECT 1 FROM ds
            WHERE ds.doc_id = pos.doc_id
              AND pos.p BETWEEN ds.i AND ds.i + 7
          )
        ),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_n,
                 string_agg(word, ' ' ORDER BY p) AS ktext
          FROM kept GROUP BY doc_id
        )
        SELECT w.doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(len(ws) - coalesce(agg.kept_n, 0) AS BIGINT) AS n_removed,
               sha256(coalesce(agg.ktext, '')) AS kept_sha256
        FROM w LEFT JOIN agg ON w.doc_id = agg.doc_id
    """

    # mix_weights: floor(sqrt(double(n))) == isqrt(n) exactly for
    # n < 2^52; the ppm division is integer on both sides (operands
    # positive, so DuckDB's truncating // equals Python's floor //).
    sql["mix_weights"] = """
        WITH c AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source
        ), w AS (
          SELECT source, n_docs,
                 CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)
                   AS weight_sqrt
          FROM c
        )
        SELECT source, n_docs, weight_sqrt,
               CAST(weight_sqrt * 1000000 //
                    (SELECT sum(weight_sqrt) FROM w) AS BIGINT) AS weight_ppm
        FROM w
    """

    sql["leakage_split"] = """
        WITH b AS (
          SELECT doc_id, source,
                 CAST(CAST('0x' || substr(md5('split:' || source), 1, 8)
                           AS UBIGINT) % 100 AS BIGINT) AS bucket
          FROM documents
        )
        SELECT doc_id, source, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM b
    """

    # embed_documents: the signed-feature-hashing featurizer is pure
    # md5 integer arithmetic (bucket = md5(tok)[:8] % dim, sign = 9th
    # nibble parity), so the whole production stage is reproduced
    # exactly. LONG (doc_id, bucket, value) output — scalar columns
    # hash-compare robustly.
    sql["embed_documents"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(
                     text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS t
          FROM documents
        ),
        hb AS (
          SELECT doc_id,
                 CAST(CAST('0x' || substr(md5(t), 1, 8) AS UBIGINT) % 16
                      AS BIGINT) AS bucket,
                 CASE WHEN CAST('0x' || substr(md5(t), 9, 1) AS UBIGINT)
                           % 2 = 0
                      THEN 1 ELSE -1 END AS sgn
          FROM toks
        )
        SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS value
        FROM hb GROUP BY doc_id, bucket
    """

    # chunk_documents: token-space windows — list_slice/array_to_string
    # over the SAME RE2 token extraction reproduces chunk_text exactly.
    sql["chunk_documents"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 regexp_extract_all(
                     text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS t
          FROM documents
        ),
        ks AS (
          SELECT doc_id, t,
                 unnest(range(0, len(t), 48)) AS s
          FROM toks WHERE len(t) > 0
        )
        SELECT doc_id,
               CAST(s // 48 AS BIGINT) AS chunk_id,
               CAST(s AS BIGINT) AS start_tok,
               CAST(least(s + 64, len(t)) - s AS BIGINT) AS n_tokens,
               array_to_string(list_slice(t, s + 1, least(s + 64, len(t))),
                               ' ') AS chunk_text
        FROM ks
    """

    # extraction_e2e / extraction_summary: hermetic media engines → not
    # SQL-expressible; the driver records a rows-only check.
    # resample_ffill: grid via UNNEST(range), within-hour winner via
    # row_number DESC, forward fill via IGNORE NULLS last_value —
    # make_timestamp keeps the hour naive-UTC like the Ray side.
    sql["resample_ffill"] = """
        WITH ev AS (
          SELECT user_id, ts, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                 CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h
          FROM events
        ),
        hr AS (
          SELECT user_id, h, cents FROM (
            SELECT user_id, h, cents,
                   row_number() OVER (PARTITION BY user_id, h
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ev) WHERE rn = 1
        ),
        bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1
                   FROM ev GROUP BY user_id),
        grid AS (SELECT user_id, UNNEST(range(h0, h1 + 1)) AS h FROM bounds),
        j AS (
          SELECT g.user_id, g.h, hr.cents
          FROM grid g LEFT JOIN hr ON g.user_id = hr.user_id AND g.h = hr.h
        )
        SELECT user_id,
               make_timestamp(h * 3600000000) AS hour,
               CAST(last_value(cents IGNORE NULLS) OVER (
                      PARTITION BY user_id ORDER BY h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cents
        FROM j
    """

    # multi_groupby: the same three grouping sets via UNION ALL.
    sql["multi_groupby"] = """
        WITH c AS (
          SELECT l_returnflag, l_linestatus,
                 strftime(l_shipdate, '%Y-%m') AS month,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
          FROM lineitem
        )
        SELECT CAST(0 AS BIGINT) AS grid, l_returnflag AS key1,
               l_linestatus AS key2, CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM c GROUP BY 2, 3
        UNION ALL
        SELECT 1, l_returnflag, '', CAST(count(*) AS BIGINT),
               CAST(sum(cents) AS BIGINT)
        FROM c GROUP BY 2
        UNION ALL
        SELECT 2, month, '', CAST(count(*) AS BIGINT),
               CAST(sum(cents) AS BIGINT)
        FROM c GROUP BY 2
    """

    # minhash_eval: the exact-Jaccard truth CTEs and the MinHash
    # candidate CTEs composed verbatim, confusion via join/anti-join.
    sql["minhash_eval"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        szs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
        shf AS (
          SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY s) AS sc FROM sh)
          WHERE sc <= 32
        ),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(count(*) AS BIGINT) AS i
          FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        truth AS (
          SELECT doc_a, doc_b FROM inter
          JOIN szs sa ON doc_a = sa.doc_id
          JOIN szs sb ON doc_b = sb.doc_id
          WHERE i * 10 >= (sa.n + sb.n - i) * 1
        ),
        bandk AS (SELECT * FROM (VALUES {_BAND_VALUES}) AS t(b, am, ac)),
        sig AS (
          SELECT doc_id, b,
                 min(CAST(((CAST(CAST('0x' || substr(md5(s), 1, 15) AS UBIGINT) AS HUGEINT)
                            * am + ac) % 18446744073709551616) // 16 AS BIGINT)) AS mh
          FROM sh, bandk
          GROUP BY doc_id, b
        ),
        sigf AS (
          SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY b, mh) AS bs FROM sig)
          WHERE bs <= 128
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
          FROM sigf a JOIN sigf c
            ON a.b = c.b AND a.mh = c.mh AND a.doc_id < c.doc_id
        ),
        m AS (
          SELECT
            (SELECT count(*) FROM cand JOIN truth USING (doc_a, doc_b)) AS tp,
            (SELECT count(*) FROM cand ANTI JOIN truth USING (doc_a, doc_b)) AS fp,
            (SELECT count(*) FROM truth ANTI JOIN cand USING (doc_a, doc_b)) AS fn
        )
        SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn,
               CAST(CASE WHEN tp + fp > 0 THEN tp * 10000 // (tp + fp)
                         ELSE 0 END AS BIGINT) AS precision_bp,
               CAST(CASE WHEN tp + fn > 0 THEN tp * 10000 // (tp + fn)
                         ELSE 0 END AS BIGINT) AS recall_bp
        FROM m
    """

    # regional_brand_revenue: the same snowflake joins + discounted
    # cents expression term-for-term.
    sql["regional_brand_revenue"] = """
        SELECT r.r_name, p.p_brand,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                   * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY r.r_name, p.p_brand
    """

    # rolling_sum: ROWS-frame window replay, identical cents math.
    sql["rolling_sum"] = """
        SELECT event_id, user_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS roll_sum
        FROM events
    """

    # argmax_by_source: DISTINCT ON replay (tie → min doc_id).
    sql["argmax_by_source"] = """
        SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars FROM (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS rn
          FROM documents) WHERE rn = 1
    """

    # item_cooccurrence: distinct baskets + self-join pair support.
    sql["item_cooccurrence"] = r"""
        WITH ui AS (
          SELECT DISTINCT user_id,
                 CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)
                   AS item
          FROM events
        ),
        p AS (
          SELECT a.item AS item_a, b.item AS item_b,
                 CAST(count(*) AS BIGINT) AS support
          FROM ui a JOIN ui b
            ON a.user_id = b.user_id AND a.item < b.item
          GROUP BY 1, 2
        )
        SELECT item_a, item_b, support,
               CAST(row_number() OVER
                    (ORDER BY support DESC, item_a, item_b) AS BIGINT) AS rank
        FROM p WHERE support >= 3
        ORDER BY support DESC, item_a, item_b LIMIT 50
    """

    # frequent_triples: the level-3 lattice within the top-M item gate;
    # top-M ties (support DESC, item) on both sides
    sql["frequent_triples"] = r"""
        WITH ui AS (
          SELECT DISTINCT user_id,
                 CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)
                   AS item
          FROM events
        ),
        freq AS (
          SELECT item, count(*) AS sup,
                 row_number() OVER (ORDER BY count(*) DESC, item) AS rn
          FROM ui GROUP BY item
        ),
        f AS (
          SELECT ui.user_id, ui.item
          FROM ui JOIN freq ON freq.item = ui.item AND freq.rn <= 32
        ),
        t AS (
          SELECT a.item AS item_a, b.item AS item_b, c.item AS item_c,
                 CAST(count(*) AS BIGINT) AS support
          FROM f a JOIN f b ON a.user_id = b.user_id AND a.item < b.item
                   JOIN f c ON b.user_id = c.user_id AND b.item < c.item
          GROUP BY 1, 2, 3 HAVING count(*) >= 3
        )
        SELECT item_a, item_b, item_c, support,
               CAST(row_number() OVER
                    (ORDER BY support DESC, item_a, item_b, item_c)
                    AS BIGINT) AS rank
        FROM t ORDER BY support DESC, item_a, item_b, item_c LIMIT 50
    """

    # inter_event_gaps: integer '//' truncation equals numpy floor
    # division for the non-negative gaps; floor(log2(n+1)) is float-
    # safe on both sides for any realistic gap (see docstring)
    sql["inter_event_gaps"] = """
        WITH o AS (
            SELECT user_id, ts,
                   lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS pts
            FROM events
        )
        SELECT CAST(floor(log2(
                   (epoch_us(ts) - epoch_us(pts)) // 1000000 + 1
               )) AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM o WHERE pts IS NOT NULL
        GROUP BY 1
    """

    # event_runs: the classic double-row_number gaps-and-islands —
    # rn - rt is constant exactly within a maximal same-type run; the
    # (ts, event_id) total order makes the island structure unique.
    sql["event_runs"] = """
        WITH e AS (
            SELECT user_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn,
                   row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id
                   ) AS rt
            FROM events
        ),
        runs AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS run_len
            FROM e GROUP BY user_id, event_type, rn - rt
        )
        SELECT event_type, run_len, CAST(count(*) AS BIGINT) AS n_runs
        FROM runs GROUP BY 1, 2
    """

    # json_props_extract: identical RE2 pattern both sides.
    sql["json_props_extract"] = r"""
        SELECT event_id, event_type,
               CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
        FROM events
    """

    # zorder_keys: the identical unrolled shift/mask bit interleave.
    from readur_ray.pipelines.analytics import ZORDER_BITS

    z_terms = " + ".join(
        f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
        for i in range(ZORDER_BITS)
    )
    sql["zorder_keys"] = f"""
        WITH d AS (
          SELECT event_id,
                 user_id % {1 << ZORDER_BITS} AS x,
                 (CAST(epoch_us(ts) AS BIGINT) // 3600000000)
                   % {1 << ZORDER_BITS} AS y
          FROM events
        ),
        z AS (SELECT event_id, CAST({z_terms} AS BIGINT) AS zval FROM d)
        SELECT event_id, zval,
               CAST(zval >> {2 * ZORDER_BITS - 6} AS BIGINT) AS bucket
        FROM z
    """

    # trend_slopes: the same exact-integer moment arithmetic; sums
    # come back from DuckDB's HUGEINT accumulator cast to BIGINT
    # before the num/den products, mirroring the int64 pipeline.
    sql["trend_slopes"] = """
        WITH base AS (
          SELECT event_type,
                 CAST(epoch_us(ts) AS BIGINT) // 3600000000
                   - (SELECT MIN(CAST(epoch_us(ts) AS BIGINT) // 3600000000)
                      FROM events) AS x,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
          FROM events
        ),
        m AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx
          FROM base GROUP BY event_type
        )
        SELECT event_type, n,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
        FROM m
    """

    # scd2_merge: the lag/lead window replay of the CDC dedup +
    # versioning; the sentinel 2200-01-01 mirrors SCD2_SENTINEL_US
    # (inside pandas' datetime64[ns] range, unlike the classic 9999-12-31).
    sql["scd2_merge"] = """
        WITH ev AS (
          SELECT event_id, ts, user_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events
        ),
        ord AS (
          SELECT *, lag(cents) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM ev
        ),
        chg AS (
          SELECT user_id, ts, event_id, cents FROM ord
          WHERE prev IS NULL OR prev <> cents
        )
        SELECT user_id,
               CAST(row_number() OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                    AS BIGINT) AS version,
               cents,
               ts AS valid_from,
               coalesce(lead(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id),
                        TIMESTAMP '2200-01-01') AS valid_to,
               CAST(CASE WHEN lead(ts) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        FROM chg
    """

    # weighted_sample: same md5-priority arithmetic, zero-weight rows
    # excluded on both sides.
    sql["weighted_sample"] = """
        SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
               CAST(CAST('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)),
                                        1, 15) AS UBIGINT) AS BIGINT)
                 // n_chars AS priority
        FROM documents
        WHERE n_chars > 0
        ORDER BY priority, doc_id LIMIT 100
    """

    # pagerank: unroll PR_ITERS exact-integer iterations as chained
    # CTEs — same SCALE/damping/truncating-division as the Ray side,
    # so the comparison is bit-exact whatever the partitioning.
    from readur_ray.pipelines.graph import (
        PR_BASE, PR_DAMP_DEN, PR_DAMP_NUM, PR_ITERS, PR_SCALE,
    )

    pr_iters = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        pr_iters.append(
            f"""r{i} AS (
          SELECT e.dst AS node,
                 CAST({PR_BASE} + ({PR_DAMP_NUM} * sum({prev}.r // deg.d))
                      // {PR_DAMP_DEN} AS BIGINT) AS r
          FROM e JOIN {prev} ON e.src = {prev}.node
                 JOIN deg ON e.src = deg.src
          GROUP BY e.dst
        )"""
        )
        prev = f"r{i}"
    sql["pagerank"] = f"""
        WITH pairs AS (
          SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        ),
        e AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
        r0 AS (SELECT DISTINCT src AS node, CAST({PR_SCALE} AS BIGINT) AS r
               FROM e),
        {', '.join(pr_iters)}
        SELECT node, r AS pagerank FROM {prev}
    """

    # winnow_fingerprints: same 60-bit md5 gram hash as dup_spans; the
    # rightmost-min-per-window rule is max(i) over the argmin join.
    sql["winnow_fingerprints"] = f"""
        WITH {_WORDS_CTE},
        g AS (
          SELECT doc_id, i,
                 CAST(CAST('0x' || substr(md5(
                        ws[i] || ' ' || ws[i+1] || ' ' ||
                        ws[i+2] || ' ' || ws[i+3]), 1, 15) AS UBIGINT)
                      AS BIGINT) AS gh
          FROM w, UNNEST(range(1, len(ws) - 2)) AS t(i)
          WHERE len(ws) >= 4
        ),
        wmin AS (
          SELECT doc_id, i AS j,
                 min(gh) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
                 count(*) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
          FROM g
        ),
        sel AS (
          SELECT f.doc_id, f.j, CAST(max(g.i) AS BIGINT) AS pos, f.m AS gh
          FROM (SELECT doc_id, j, m FROM wmin WHERE wn = 4) f
          JOIN g ON g.doc_id = f.doc_id
                AND g.i BETWEEN f.j AND f.j + 3 AND g.gh = f.m
          GROUP BY f.doc_id, f.j, f.m
        )
        SELECT DISTINCT doc_id, pos, gh FROM sel
    """

    # pmi_bigrams: the quantized-PMI ranking replayed with the same
    # truncating integer division and (pmi DESC, cnt DESC, bigram) ties.
    sql["pmi_bigrams"] = f"""
        WITH {_WORDS_CTE},
        uni AS (
          SELECT ws[i] AS t, CAST(count(*) AS BIGINT) AS cnt
          FROM w, UNNEST(range(1, len(ws) + 1)) AS x(i) GROUP BY ws[i]
        ),
        tot AS (SELECT CAST(sum(len(ws)) AS BIGINT) AS n FROM w),
        big AS (
          SELECT ws[i] AS a, ws[i+1] AS b, CAST(count(*) AS BIGINT) AS cnt
          FROM w, UNNEST(range(1, len(ws))) AS x(i)
          WHERE len(ws) >= 2 GROUP BY ws[i], ws[i+1]
        ),
        sc AS (
          SELECT big.a || ' ' || big.b AS bigram, big.cnt AS cnt,
                 CAST((big.cnt * tot.n * 100) // (ua.cnt * ub.cnt)
                      AS BIGINT) AS pmi_q
          FROM big JOIN uni ua ON big.a = ua.t
                   JOIN uni ub ON big.b = ub.t
                   CROSS JOIN tot
          WHERE big.cnt >= 5
        )
        SELECT bigram, cnt, pmi_q,
               CAST(row_number() OVER (ORDER BY pmi_q DESC, cnt DESC, bigram)
                    AS BIGINT) AS rank
        FROM sc ORDER BY pmi_q DESC, cnt DESC, bigram LIMIT 50
    """

    # gram_matrix: exact second-moment sufficient statistics on the
    # shared QUANT fixed-point grid — one row per dim pair i <= j
    sql["gram_matrix"] = """
        WITH q AS (
          SELECT vec_id, dim,
                 CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 1000000 + 0.5)
                      AS BIGINT) AS v
          FROM embeddings, UNNEST(range(0, 64)) t(dim)
        )
        SELECT a.dim AS i, b.dim AS j, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a.v) AS BIGINT) AS sum_i,
               CAST(sum(b.v) AS BIGINT) AS sum_j,
               CAST(sum(a.v * b.v) AS BIGINT) AS dot
        FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.dim >= a.dim
        GROUP BY 1, 2 ORDER BY 1, 2
    """

    # coverage_greedy: COV_K(=4) greedy max-coverage rounds, unrolled —
    # each round picks the doc with the largest count of 3-shingles not
    # yet covered (ties -> min doc_id), never re-picking a winner
    sql["coverage_greedy"] = f"""
        WITH {_WORDS_CTE}, {_SHINGLES_CTE},
        docs0 AS (SELECT DISTINCT doc_id FROM sh),
        g1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS g
               FROM sh GROUP BY 1),
        w1 AS (SELECT doc_id, g FROM g1 ORDER BY g DESC, doc_id LIMIT 1),
        c1 AS (SELECT DISTINCT s FROM sh
               WHERE doc_id IN (SELECT doc_id FROM w1)),
        u2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS g FROM sh
               WHERE s NOT IN (SELECT s FROM c1) GROUP BY 1),
        g2 AS (SELECT d.doc_id, CAST(coalesce(u2.g, 0) AS BIGINT) AS g
               FROM docs0 d LEFT JOIN u2 USING (doc_id)
               WHERE d.doc_id NOT IN (SELECT doc_id FROM w1)),
        w2 AS (SELECT doc_id, g FROM g2 ORDER BY g DESC, doc_id LIMIT 1),
        c2 AS (SELECT s FROM c1 UNION
               SELECT s FROM sh WHERE doc_id IN (SELECT doc_id FROM w2)),
        u3 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS g FROM sh
               WHERE s NOT IN (SELECT s FROM c2) GROUP BY 1),
        g3 AS (SELECT d.doc_id, CAST(coalesce(u3.g, 0) AS BIGINT) AS g
               FROM docs0 d LEFT JOIN u3 USING (doc_id)
               WHERE d.doc_id NOT IN (SELECT doc_id FROM w1)
                 AND d.doc_id NOT IN (SELECT doc_id FROM w2)),
        w3 AS (SELECT doc_id, g FROM g3 ORDER BY g DESC, doc_id LIMIT 1),
        c3 AS (SELECT s FROM c2 UNION
               SELECT s FROM sh WHERE doc_id IN (SELECT doc_id FROM w3)),
        u4 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS g FROM sh
               WHERE s NOT IN (SELECT s FROM c3) GROUP BY 1),
        g4 AS (SELECT d.doc_id, CAST(coalesce(u4.g, 0) AS BIGINT) AS g
               FROM docs0 d LEFT JOIN u4 USING (doc_id)
               WHERE d.doc_id NOT IN (SELECT doc_id FROM w1)
                 AND d.doc_id NOT IN (SELECT doc_id FROM w2)
                 AND d.doc_id NOT IN (SELECT doc_id FROM w3)),
        w4 AS (SELECT doc_id, g FROM g4 ORDER BY g DESC, doc_id LIMIT 1),
        c4 AS (SELECT s FROM c3 UNION
               SELECT s FROM sh WHERE doc_id IN (SELECT doc_id FROM w4))
        SELECT CAST(1 AS BIGINT) AS round_no, doc_id, g AS gain,
               (SELECT CAST(count(*) AS BIGINT) FROM c1) AS covered_total
        FROM w1
        UNION ALL
        SELECT 2, doc_id, g, (SELECT count(*) FROM c2) FROM w2
        UNION ALL
        SELECT 3, doc_id, g, (SELECT count(*) FROM c3) FROM w3
        UNION ALL
        SELECT 4, doc_id, g, (SELECT count(*) FROM c4) FROM w4
        ORDER BY round_no
    """

    # grouped_topk: per-customer top-3 orders by integer cents,
    # ties -> min o_orderkey, dense rank attached
    sql["grouped_topk"] = """
        WITH r AS (
          SELECT o_custkey, o_orderkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                   AS price_cents,
                 row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY floor(o_totalprice * 100 + 0.5) DESC, o_orderkey
                 ) AS rn
          FROM orders
        )
        SELECT o_custkey, o_orderkey, price_cents, CAST(rn AS BIGINT) AS rnk
        FROM r WHERE rn <= 3
    """

    # interval_overlaps: the naive O(n^2) pair join the sweep replaces —
    # closed-interval overlap, window end synthesized from l_quantity.
    # Unordered pairs via the ordered-minus-self identity (the fixture
    # has duplicate (orderkey, linenumber) rows, so no row id exists):
    # every row self-overlaps, so ordered = 2*unordered + n.
    sql["interval_overlaps"] = """
        WITH iv AS (
          SELECT l_suppkey AS suppkey,
                 l_shipdate AS lo,
                 l_shipdate + to_days(
                   CAST(floor(l_quantity + 0.5) AS INTEGER) % 30 + 1
                 ) AS hi
          FROM lineitem
        ),
        tot AS (SELECT suppkey, count(*) AS n FROM iv GROUP BY 1),
        p AS (
          SELECT a.suppkey, count(*) AS c
          FROM iv a JOIN iv b
            ON a.suppkey = b.suppkey AND a.lo <= b.hi AND b.lo <= a.hi
          GROUP BY 1
        )
        SELECT p.suppkey, CAST((p.c - tot.n) // 2 AS BIGINT) AS n_overlaps
        FROM p JOIN tot USING (suppkey)
        WHERE p.c - tot.n > 0 ORDER BY 1
    """

    # interval_union: the window-function merged-interval classic —
    # a row opens a new island iff its lo exceeds the running max hi
    # of every earlier window (frame max over 1 PRECEDING; the first
    # row's NULL frame falls to ELSE 0). Island ids are order-free
    # under (lo, hi) ties: an equal-lo row can never open an island
    # (hi >= lo always), and per-island coverage is max(hi) - min(lo).
    sql["interval_union"] = """
        WITH iv AS (
          SELECT user_id, epoch_us(ts) AS lo,
                 epoch_us(ts) + (event_id % 3600 + 60) * 1000000 AS hi
          FROM events
        ),
        m AS (
          SELECT user_id, lo, hi,
                 CASE WHEN lo > max(hi) OVER (
                     PARTITION BY user_id ORDER BY lo, hi
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) THEN 1 ELSE 0 END AS new_island
          FROM iv
        ),
        isl AS (
          SELECT user_id, lo, hi,
                 sum(new_island) OVER (
                     PARTITION BY user_id ORDER BY lo, hi
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS island
          FROM m
        )
        SELECT user_id,
               CAST(sum(cov) AS BIGINT) AS covered_us,
               CAST(count(*) AS BIGINT) AS n_merged
        FROM (
          SELECT user_id, island, max(hi) - min(lo) AS cov
          FROM isl GROUP BY 1, 2
        )
        GROUP BY 1
    """

    # table_checksum: order-independent md5-lane digest of documents —
    # sum lane on Z/(2^61-1), xor lane overflow-free
    sql["table_checksum"] = """
        WITH lanes AS (
          SELECT CAST(('0x' || substr(
                   md5(CAST(doc_id AS VARCHAR) || '|' || coalesce(text, '')),
                   1, 15)) AS BIGINT) AS lane
          FROM documents
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(lane AS HUGEINT)) % 2305843009213693951
                    AS BIGINT) AS sum_lane,
               bit_xor(lane) AS xor_lane
        FROM lanes
    """

    # rrf_fusion: reciprocal-rank fusion of the BM25 list and the
    # trigram-Jaccard list; rank() ties-share-a-rank on both sides,
    # FULL OUTER JOIN with missing-list rank -> 0 contribution
    sql["rrf_fusion"] = f"""
        WITH bm AS ({sql["bm25_scores"]}),
        trid AS (
          SELECT doc_id,
                 CASE WHEN length(t) < 3 THEN
                        (CASE WHEN length(t) = 0 THEN [] ELSE [t] END)
                      ELSE list_distinct(list_transform(range(1, length(t)-1),
                           i -> substr(t, i, 3))) END AS g
          FROM (SELECT doc_id, lower(text) AS t FROM documents)
        ),
        q AS (
          SELECT list_distinct(list_transform(range(1, length(s)-1),
                 i -> substr(s, i, 3))) AS g
          FROM (SELECT lower('spark query plan') AS s)
        ),
        tri AS (
          SELECT doc_id,
                 (CAST(len(list_intersect(trid.g, q.g)) AS BIGINT) * 1000000)
                   // CAST(len(trid.g) + len(q.g)
                           - len(list_intersect(trid.g, q.g)) AS BIGINT)
                   AS tri_fp
          FROM trid, q
          WHERE len(list_intersect(trid.g, q.g)) >= 1
        ),
        ra AS (SELECT doc_id, rank() OVER (ORDER BY bm25_fp DESC) AS r FROM bm),
        rb AS (SELECT doc_id, rank() OVER (ORDER BY tri_fp DESC) AS r FROM tri),
        f AS (
          SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
                 coalesce(1000000 // (60 + ra.r), 0)
                   + coalesce(1000000 // (60 + rb.r), 0) AS rrf_fp,
                 CAST(coalesce(ra.r, 0) AS BIGINT) AS rank_lex,
                 CAST(coalesce(rb.r, 0) AS BIGINT) AS rank_tri
          FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
        )
        SELECT doc_id, CAST(rrf_fp AS BIGINT) AS rrf_fp, rank_lex, rank_tri
        FROM f ORDER BY rrf_fp DESC, doc_id LIMIT 20
    """

    # sliding_distinct: rolling 7-day distinct users per present day
    sql["sliding_distinct"] = """
        WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                   FROM events),
        days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
        SELECT CAST(days.d - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users_7d
        FROM days JOIN e ON e.d BETWEEN days.d - 6 AND days.d
        GROUP BY 1 ORDER BY 1
    """

    # retention_7d: cohort size + users also active exactly day+7
    sql["retention_7d"] = """
        WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                   FROM events)
        SELECT CAST(a.d - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n_cohort,
               CAST(count(b.user_id) AS BIGINT) AS n_retained
        FROM e a LEFT JOIN e b
          ON b.user_id = a.user_id AND b.d = a.d + 7
        GROUP BY 1 ORDER BY 1
    """

    # token_diversity: Simpson-diversity sufficient statistics per
    # source over the [a-z0-9]+ token stream
    sql["token_diversity"] = """
        WITH w AS (SELECT source,
                          unnest(regexp_extract_all(lower(text),
                                 '[a-z0-9]+')) AS t
                   FROM documents),
        c AS (SELECT source, t, count(*) AS n FROM w GROUP BY 1, 2)
        SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(n * n) AS BIGINT) AS sum_sq
        FROM c GROUP BY 1 ORDER BY 1
    """

    # event_transitions: consecutive-step counts per user timeline,
    # ties broken by event_id exactly as the Ray-side lexsort
    sql["event_transitions"] = """
        WITH o AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS nxt
          FROM events
        )
        SELECT event_type AS prev_type, nxt AS next_type,
               CAST(count(*) AS BIGINT) AS n
        FROM o WHERE nxt IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """

    # heavy_hitters_exact: tokens with count * HH_K(=40) > corpus total
    sql["heavy_hitters_exact"] = """
        WITH w AS (SELECT unnest(regexp_extract_all(lower(text),
                          '[a-z0-9]+')) AS t
                   FROM documents),
        tot AS (SELECT count(*) AS total FROM w)
        SELECT t AS token, CAST(count(*) AS BIGINT) AS n
        FROM w, tot GROUP BY 1, tot.total
        HAVING count(*) * 40 > tot.total ORDER BY 1
    """

    # knn_label_vote: majority label among knn_graph's k neighbors,
    # ties -> min label
    sql["knn_label_vote"] = f"""
        WITH g AS ({sql["knn_graph"]}),
        v AS (SELECT g.vec_id, e.label
              FROM g JOIN embeddings e ON e.vec_id = g.neighbor_id),
        c AS (SELECT vec_id, label, count(*) AS n FROM v GROUP BY 1, 2)
        SELECT vec_id, label AS pred_label, CAST(n AS BIGINT) AS n_votes
        FROM (SELECT vec_id, label, n,
                     row_number() OVER (
                       PARTITION BY vec_id ORDER BY n DESC, label ASC
                     ) AS rn FROM c)
        WHERE rn = 1 ORDER BY 1
    """

    # knn_label_noise: the vote CTE joined back to the label column.
    sql["knn_label_noise"] = f"""
        WITH v AS ({sql["knn_label_vote"]})
        SELECT e.label, CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(count(*) FILTER (WHERE v.pred_label <> e.label)
                    AS BIGINT) AS n_disagree,
               CAST(count(*) FILTER (WHERE v.pred_label <> e.label)
                    * 10000 // count(*) AS BIGINT) AS noise_bp
        FROM v JOIN embeddings e USING (vec_id)
        GROUP BY 1
    """

    # simhash_band_precision: band-key collisions vs popcount
    # survivors, per band; pairs count once per colliding band by
    # design.
    sql["simhash_band_precision"] = f"""
        WITH {_SIMHASH_CTE},
        u AS (SELECT doc_id, CAST('0x' || simhash AS UBIGINT) AS fp
              FROM fps),
        b AS (SELECT doc_id, fp, i AS band,
                     CAST((fp >> CAST(i * 16 AS UBIGINT)) & 65535
                          AS BIGINT) AS key
              FROM u, unnest(range(0, 4)) t(i)),
        cand AS (SELECT x.band,
                        CAST(bit_count(xor(x.fp, y.fp)) AS BIGINT) AS ham
                 FROM b x JOIN b y ON y.band = x.band AND y.key = x.key
                                   AND y.doc_id > x.doc_id)
        SELECT CAST(band AS BIGINT) AS band,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(count(*) FILTER (WHERE ham <= 3) AS BIGINT)
                 AS n_verified,
               CAST(count(*) FILTER (WHERE ham <= 3) * 10000 // count(*)
                    AS BIGINT) AS precision_bp
        FROM cand GROUP BY 1
    """

    # contingency_grid: observed cells with marginals and the exact
    # signed chi-square deviation O*N - R*C
    sql["contingency_grid"] = """
        WITH c AS (SELECT lang, source, count(*) AS n
                   FROM documents GROUP BY 1, 2),
        r AS (SELECT lang, sum(n) AS rn FROM c GROUP BY 1),
        cl AS (SELECT source, sum(n) AS cn FROM c GROUP BY 1),
        t AS (SELECT sum(n) AS nt FROM c)
        SELECT c.lang, c.source, CAST(c.n AS BIGINT) AS n_obs,
               CAST(r.rn AS BIGINT) AS row_total,
               CAST(cl.cn AS BIGINT) AS col_total,
               CAST(t.nt AS BIGINT) AS n_total,
               CAST(c.n * t.nt - r.rn * cl.cn AS BIGINT) AS dev
        FROM c JOIN r USING (lang) JOIN cl USING (source), t
        ORDER BY 1, 2
    """

    # resample_lerp: hourly grid per user, interior gaps linearly
    # interpolated between bracketing anchors in exact integers
    # (all cents >= 0, so // floor-division matches numpy)
    sql["resample_lerp"] = """
        WITH ev AS (
          SELECT user_id, ts, event_id,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                 CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS h
          FROM events
        ),
        hr AS (
          SELECT user_id, h, cents FROM (
            SELECT user_id, h, cents,
                   row_number() OVER (PARTITION BY user_id, h
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ev) WHERE rn = 1
        ),
        bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1
                   FROM ev GROUP BY user_id),
        grid AS (SELECT user_id, UNNEST(range(h0, h1 + 1)) AS h FROM bounds),
        j AS (
          SELECT g.user_id, g.h, hr.cents,
                 CASE WHEN hr.cents IS NOT NULL THEN g.h END AS ah
          FROM grid g LEFT JOIN hr ON g.user_id = hr.user_id AND g.h = hr.h
        ),
        w AS (
          SELECT user_id, h, cents,
                 last_value(ah IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
                 last_value(cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS py,
                 first_value(ah IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY h
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh,
                 first_value(cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY h
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ny
          FROM j
        )
        SELECT user_id, make_timestamp(h * 3600000000) AS hour,
               CAST(CASE WHEN cents IS NOT NULL THEN cents
                         ELSE (py * (nh - h) + ny * (h - ph)) // (nh - ph)
                    END AS BIGINT) AS cents
        FROM w
    """

    # quota_sample: Hamilton apportionment of a 200-doc budget across
    # sources, then per-source md5-bottom-quota picks with rank
    sql["quota_sample"] = """
        WITH n AS (SELECT source, count(*) AS ns FROM documents GROUP BY 1),
        t AS (SELECT sum(ns) AS nt FROM n),
        q AS (SELECT source, ns, (200 * ns) // nt AS base,
                     (200 * ns) % nt AS rem
              FROM n, t),
        ex AS (SELECT 200 - sum(base) AS extra FROM q),
        r AS (SELECT source, base, rem,
                     row_number() OVER (ORDER BY rem DESC, source) AS rr
              FROM q),
        quota AS (SELECT source,
                         base + CASE WHEN rr <= (SELECT extra FROM ex)
                                     THEN 1 ELSE 0 END AS qu
                  FROM r),
        ranked AS (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR))
                 ) AS rk
          FROM documents
        )
        SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
        FROM ranked JOIN quota USING (source)
        WHERE rk <= qu ORDER BY source, rk
    """

    # user_paths: first-20-step chronological event-type path + true
    # event count per user
    sql["user_paths"] = """
        WITH r AS (
          SELECT user_id, event_type,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS rn
          FROM events
        ),
        agg AS (
          SELECT user_id,
                 string_agg(event_type, '>' ORDER BY rn) AS path
          FROM r WHERE rn <= 20 GROUP BY 1
        ),
        cnt AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
        SELECT user_id, CAST(n AS BIGINT) AS n_events, path
        FROM agg JOIN cnt USING (user_id) ORDER BY 1
    """

    # audience_overlap: users engaging with BOTH event types, all
    # unordered type pairs — the naive distinct-pair self-join
    sql["audience_overlap"] = """
        WITH p AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_users
        FROM p a JOIN p b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2 ORDER BY 1, 2
    """

    # weighted_median: smallest price-cents whose cumulative quantity
    # weight reaches half the flag's total quantity
    sql["weighted_median"] = """
        WITH x AS (
          SELECT l_returnflag AS f,
                 CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
                 CAST(floor(l_quantity + 0.5) AS BIGINT) AS q
          FROM lineitem
        ),
        t AS (SELECT f, sum(q) AS tq FROM x GROUP BY 1),
        g AS (SELECT f, c, sum(q) AS qc FROM x GROUP BY 1, 2),
        w AS (SELECT f, c,
                     sum(qc) OVER (PARTITION BY f ORDER BY c) AS cum
              FROM g)
        SELECT w.f AS l_returnflag,
               CAST(min(w.c) AS BIGINT) AS w_median_cents,
               CAST(any_value(t.tq) AS BIGINT) AS total_qty
        FROM w JOIN t USING (f)
        WHERE 2 * w.cum >= t.tq
        GROUP BY 1 ORDER BY 1
    """

    # kmeans_inertia: per-cell member count + exact integer inertia
    # against the SAME trained centroids as the IVF oracles (prefix
    # mirrors sql["ann_topk_ivf_kmeans"] through a2/cent2f)
    sql["kmeans_inertia"] = """
        WITH qv AS (
          SELECT vec_id, dim,
                 CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 1000000 + 0.5)
                      AS BIGINT) AS q
          FROM embeddings, UNNEST(range(0, 64)) t(dim)
        ),
        seed AS (
          SELECT vec_id - 16 AS c, dim, q FROM qv
          WHERE vec_id BETWEEN 16 AND 23
        ),
        d0 AS (
          SELECT v.vec_id, s.c, sum((v.q - s.q) * (v.q - s.q)) AS d2
          FROM qv v JOIN seed s USING (dim) GROUP BY 1, 2
        ),
        a0 AS (
          SELECT vec_id, c FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
            FROM d0) WHERE rn = 1
        ),
        cent1 AS (
          SELECT a0.c, qv.dim, CAST(sum(qv.q) // count(*) AS BIGINT) AS q
          FROM qv JOIN a0 USING (vec_id) GROUP BY 1, 2
        ),
        cent1f AS (  -- empty cells keep the previous centroid
          SELECT s.c, s.dim, coalesce(c1.q, s.q) AS q
          FROM seed s LEFT JOIN cent1 c1 ON c1.c = s.c AND c1.dim = s.dim
        ),
        d1 AS (
          SELECT v.vec_id, cn.c, sum((v.q - cn.q) * (v.q - cn.q)) AS d2
          FROM qv v JOIN cent1f cn USING (dim) GROUP BY 1, 2
        ),
        a1 AS (
          SELECT vec_id, c FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
            FROM d1) WHERE rn = 1
        ),
        cent2 AS (
          SELECT a1.c, qv.dim, CAST(sum(qv.q) // count(*) AS BIGINT) AS q
          FROM qv JOIN a1 USING (vec_id) GROUP BY 1, 2
        ),
        cent2f AS (
          SELECT f.c, f.dim, coalesce(c2.q, f.q) AS q
          FROM cent1f f LEFT JOIN cent2 c2 ON c2.c = f.c AND c2.dim = f.dim
        ),
        d2c AS (
          SELECT v.vec_id, cn.c, sum((v.q - cn.q) * (v.q - cn.q)) AS d2
          FROM qv v JOIN cent2f cn USING (dim) GROUP BY 1, 2
        ),
        a2 AS (
          SELECT vec_id, c FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
            FROM d2c) WHERE rn = 1
        ),
        m AS (
          SELECT a2.vec_id, a2.c,
                 sum((v.q - cn.q) * (v.q - cn.q)) AS d2
          FROM qv v JOIN a2 ON a2.vec_id = v.vec_id
          JOIN cent2f cn ON cn.c = a2.c AND cn.dim = v.dim
          GROUP BY 1, 2
        )
        SELECT c AS cell, CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(sum(d2) AS BIGINT) AS inertia
        FROM m GROUP BY 1 ORDER BY 1
    """

    # cohort_matrix: distinct users per (first-active-week cohort,
    # activity week); week = epoch-day // 7
