"""readur_ray — a Ray-Data-native document-extraction engine.

A brand-new engine (not a port) with the extraction semantics of the
reference `yonasBSD/readur` (Rust/Axum document server): streaming
`ray.data.Dataset` pipelines over tables of interleaved text+media
documents, `map_batches` over zero-copy Arrow batches for classification
and plain-text extraction, actor pools holding warm (hermetic) PDF/OCR
engines for media spans, cost-aware skew routing with per-page explode +
groupby(doc_id) reassembly, exact content dedup, failure taxonomy, and a
resumable partitioned-parquet output layout with a commit ledger.

Correctness contract (see FIXTURES.md): per-document span-sequence
equality on (kind, text, media_ref, order), plus status / failure_reason
/ confidence / word_count semantics replicated from the reference
(citations in each module's docstring).
"""

__version__ = "0.1.0"
