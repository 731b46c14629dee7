"""Shared deterministic SQL fragments used by both the
oracle modules and (indirectly) the Ray pipelines' parity
tests. Moved verbatim from __ray_entry__.py (round 5).
"""

from __future__ import annotations

# --- shared SQL fragments -------------------------------------------------

# lowercased alnum words / distinct word-3-shingles of documents.text
_WORDS_CTE = (
    "w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws "
    "FROM documents)"
)
_SHINGLES_CTE = (
    "sh AS ("
    " SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s"
    " FROM w, UNNEST(range(1, len(ws)-1)) AS t(i) WHERE len(ws) >= 3"
    " UNION"
    " SELECT doc_id, array_to_string(ws, ' ') AS s FROM w"
    " WHERE len(ws) BETWEEN 1 AND 2)"
)

_STOP_EN = r"\b(?:the|and|of|to|in|is|was|for|on|as|with|at|by|it|a)\b"
_STOP_DE = r"\b(?:der|die|das|und|ist|von|zu|mit|den|im|ein|eine|nicht|auch)\b"
_STOP_FR = r"\b(?:le|la|les|et|des|du|est|une|pour|dans|que|sur|pas|plus)\b"
_STOP_ES = r"\b(?:el|los|las|es|un|una|por|para|con|del|no|se|su|como)\b"

# MinHash band-hash constants — the SAME frozen literals as
# readur_ray.pipelines.dedup._A_MIX/_C_MIX (band hash =
# ((md5_int60(shingle) * A[b] + C[b]) mod 2^64) >> 4, HUGEINT-safe).
def _band_values() -> str:
    from readur_ray.pipelines.dedup import _A_MIX, _C_MIX

    return ", ".join(
        f"({b}, {int(_A_MIX[b])}, {int(_C_MIX[b])})" for b in range(len(_A_MIX))
    )


_BAND_VALUES = _band_values()

_SIMHASH_CTE = (
    "toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t"
    " FROM documents), "
    "bits AS ("
    " SELECT doc_id, bit,"
    "  sum(CASE WHEN ((CAST('0x' || substr(md5(t), 1, 16) AS UBIGINT) >> bit) & 1) = 1"
    "      THEN 1 ELSE -1 END) AS wsum"
    " FROM toks, UNNEST(range(0, 64)) AS r(bit) GROUP BY doc_id, bit), "
    "fp AS ("
    " SELECT doc_id, CAST(sum(CASE WHEN wsum > 0 THEN CAST(1 AS UBIGINT) << bit"
    "   ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS f"
    " FROM bits GROUP BY doc_id), "
    "fps AS ("
    " SELECT d.doc_id,"
    "  coalesce(lpad(lower(hex(fp.f)), 16, '0'), '0000000000000000') AS simhash"
    " FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id)"
)


