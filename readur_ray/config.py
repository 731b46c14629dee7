"""Extraction configuration.

Mirrors the reference's per-user ``Settings`` defaults
(/root/reference/src/models/settings.rs:302-379) plus the engine-level
caps hard-coded in the reference OCR service
(/root/reference/src/ocr/enhanced.rs:825,1449,1461).

A single frozen dataclass is built once on the driver and passed to
actor constructors (loaded once per actor, never per batch/row).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractionConfig:
    # --- quality gating (settings.rs:336; enhanced.rs:1562-1597) ---
    ocr_min_confidence: float = 30.0
    min_alnum_ratio: float = 0.3

    # --- size caps (enhanced.rs:825,1449,1461; enhanced_processing.rs:24-25) ---
    max_pdf_bytes: int = 100 * 1024 * 1024
    max_text_file_bytes: int = 50 * 1024 * 1024
    max_text_content_bytes: int = 10 * 1024 * 1024
    max_image_pixels: tuple[int, int] = (10_000, 10_000)

    # --- retry (migrations/20250620100001_add_ocr_queue.sql:8):
    # recoverable failures (errors.RECOVERABLE_REASONS) are retried
    # in-actor up to max_attempts before dead-lettering ---
    max_attempts: int = 3

    # --- OCR engine settings (settings.rs:7-65 defaults; consumed by
    # real engine backends, recorded for the hermetic ones) ---
    ocr_language: str = "eng"
    preferred_languages: tuple[str, ...] = ("eng",)
    ocr_page_segmentation_mode: int = 3
    ocr_engine_mode: int = 3
    ocr_timeout_seconds: int = 300          # settings.rs:312
    concurrent_ocr_jobs: int = 4            # settings.rs:311 (per-user)
    max_file_size_mb: int = 50              # settings.rs:313

    # --- preprocessing knobs (settings.rs:302-379; feed
    # stages.preprocess.PreprocessSettings) ---
    ocr_detect_orientation: bool = True
    ocr_brightness_boost: float = 0.0
    ocr_contrast_multiplier: float = 0.0
    ocr_noise_reduction_level: int = 0
    ocr_sharpening_strength: float = 0.0
    ocr_morphological_operations: bool = False
    ocr_adaptive_threshold_window_size: int = 0

    # --- allowed types (settings.rs:314-322) ---
    allowed_file_types: tuple[str, ...] = (
        "pdf", "png", "jpg", "jpeg", "tiff", "bmp", "txt",
    )

    # --- confidence constants for PDF paths (enhanced.rs:870-877,1111-1118) ---
    conf_pdf_quick: float = 95.0
    conf_pdf_ocr: float = 85.0
    conf_pdf_bytes: float = 50.0
    conf_plain_text: float = 100.0

    # --- dedup policy (document_ingestion.rs:20-29) ---
    # 'skip' | 'return_existing' | 'allow' | 'track'
    dedup_policy: str = "skip"

    # --- Ray execution knobs (engine-level; tuned via bench) ---
    # upper CAP on the media actor pool; the effective size is
    # min(cap, 3/4 of cluster CPUs) — see extract._pool_sizes
    extract_concurrency: int = 256
    extract_batch_size: int = 128      # docs per batch in the media stage
    text_batch_size: int = 4096       # docs per batch in the vectorized text stage
    page_explode_threshold: int = 64   # PDFs with more pages fan out per-page
    num_output_partitions: int = 32    # hash(doc_id) % N resumable partitions

    # resolver spec understood by readur_ray.sources.media
    media_resolver: str = "synth"      # 'synth' | 'parquet:<path>'

    # per-user Settings rows (settings.rs:7-65): (user_id, ((field,
    # value), ...)) tuples; resolved once per actor by
    # state.settings.SettingsStore for rows carrying a user_id column
    user_overrides: tuple[tuple[str, tuple[tuple[str, object], ...]], ...] = ()

    # 'hermetic' (synthetic payload parsers, always available) or
    # 'real' (pypdfium2 + tesserocr/pytesseract — import-guarded; the
    # extraction DAG is identical either way, only the per-actor engine
    # objects differ)
    engine_backend: str = "hermetic"

    # run the P1-P12 preprocessing chain on decoded image arrays inside
    # the image-OCR actor (settings.rs enable_image_preprocessing; the
    # hermetic path decodes a deterministic synthetic array)
    enable_image_preprocessing: bool = False
    # persist ProcessedImage lineage rows (processed-artifact pointer,
    # dims, steps) in the EXTRACTED output + a side table at finalize
    # (settings.rs save_processed_images; document.rs:194-238)
    save_processed_images: bool = False

    # Simulated OCR compute per page/image (ms of core occupancy), off
    # by default. The hermetic engines parse in ~µs where real
    # Tesseract/ocrmypdf burn 1-5 s of CPU per page
    # (/root/reference/docs/dev/QUEUE_IMPROVEMENTS.md:164: 500-1000
    # files/hour/worker); with µs-level UDFs a scaling benchmark
    # measures the host memory bus, not the orchestration. The scaling
    # bench enables this to restore a realistic compute:byte ratio
    # (still ~1000× cheaper than real OCR).
    simulated_ocr_ms_per_page: float = 0.0


    def preprocess_settings(self):
        from .stages.preprocess import PreprocessSettings

        return PreprocessSettings(
            detect_orientation=self.ocr_detect_orientation,
            brightness_boost=self.ocr_brightness_boost,
            contrast_multiplier=self.ocr_contrast_multiplier,
            noise_reduction_level=self.ocr_noise_reduction_level,
            sharpening_strength=self.ocr_sharpening_strength,
            morphological_operations=self.ocr_morphological_operations,
            adaptive_threshold_window_size=self.ocr_adaptive_threshold_window_size,
        )


DEFAULT_CONFIG = ExtractionConfig()
