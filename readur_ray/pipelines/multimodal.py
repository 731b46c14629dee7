"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with sidecar
metadata; decode / resize / frame-sample run as actor-pool
``map_batches`` stages (stateful: codec/toolchain built once per actor
in ``__init__``, mirroring the warm-Tesseract pattern ST1,
/root/reference/src/ocr/enhanced.rs:275-318).

The image/audio libraries are NOT in this container, so the decode step
is STUBBED: ``PayloadCodec`` tries to import PIL/cv2 in ``__init__``
and, absent them, derives deterministic metadata (dims, frame count,
feature checksum) from the payload's md5 — the Ray-side plumbing
(schema, batch sizing, actor signature, output layout) is real and
tested, and the fake is SQL-mirrorable so even the stub has a DuckDB
oracle. Swapping in a real decoder changes only ``_decode_real``.

Scale notes: binary payloads are large → ``batch_size`` is small
(default 64) and payloads never enter a shuffle; the output is
metadata-only (a few ints per row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

RESIZE_TARGET = 512       # smart-resize target (P2 analog, enhanced.rs:354-386)
FRAME_STRIDE = 7          # sample every k-th frame


def _md5_bucket(payload: bytes, lo: int, span: int, salt: str = "") -> int:
    h = hashlib.md5(salt.encode() + payload).hexdigest()
    return lo + int(h[:8], 16) % span


class PayloadCodec:
    """Actor: decode→resize→frame-sample over a binary column.

    Real path requires PIL/cv2 (absent here); the deterministic fake
    keeps every downstream contract intact."""

    def __init__(
        self,
        resize_target: int = RESIZE_TARGET,
        frame_stride: int = FRAME_STRIDE,
        use_real: bool = False,
    ):
        self.resize_target = resize_target
        self.frame_stride = frame_stride
        # real decode is OPT-IN (not auto-detected): the driver queries
        # promise the deterministic fake regardless of what wheels the
        # environment happens to have; a real deployment constructs the
        # codec with use_real=True and fails fast here if PIL is absent
        self.real = use_real
        if use_real:
            import PIL.Image  # noqa: F401

    def _decode_real(self, payload: bytes) -> tuple[int, int, int]:
        """PIL decode: (width, height, n_frames) — used when Pillow is
        installed (guarded in __init__); multi-frame formats (GIF/TIFF)
        report their real frame count, stills report 1."""
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(payload))
        img.load()
        w, h = img.size
        return w, h, int(getattr(img, "n_frames", 1))

    def _decode_fake(self, payload: bytes) -> tuple[int, int, int]:
        """Deterministic (width, height, n_frames) from the payload md5:
        width = 256 + md5[0:8] % 1792, height = 256 + md5[8:16] % 1792,
        n_frames = 1 + md5[16:24] % 240."""
        h = hashlib.md5(payload).hexdigest()
        width = 256 + int(h[0:8], 16) % 1792
        height = 256 + int(h[8:16], 16) % 1792
        n_frames = 1 + int(h[16:24], 16) % 240
        return width, height, n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        w_out, h_out, rw_out, rh_out, nf_out, ns_out, ck_out = [], [], [], [], [], [], []
        for p in payloads:
            p = p or b""
            if self.real:
                w, h, nf = self._decode_real(p)
            else:
                w, h, nf = self._decode_fake(p)
            # smart resize (P2): scale the longer edge down to target,
            # integer floor arithmetic (SQL-mirrorable)
            longer = max(w, h)
            if longer > self.resize_target:
                rw = (w * self.resize_target) // longer
                rh = (h * self.resize_target) // longer
            else:
                rw, rh = w, h
            n_sampled = (nf + self.frame_stride - 1) // self.frame_stride
            checksum = int(hashlib.md5(p).hexdigest()[24:32], 16)
            w_out.append(w)
            h_out.append(h)
            rw_out.append(rw)
            rh_out.append(rh)
            nf_out.append(nf)
            ns_out.append(n_sampled)
            ck_out.append(checksum)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "width": pa.array(w_out, pa.int64()),
                "height": pa.array(h_out, pa.int64()),
                "resized_w": pa.array(rw_out, pa.int64()),
                "resized_h": pa.array(rh_out, pa.int64()),
                "n_frames": pa.array(nf_out, pa.int64()),
                "n_sampled_frames": pa.array(ns_out, pa.int64()),
                "feat_checksum": pa.array(ck_out, pa.int64()),
            }
        )


class PreprocessAnalyzer:
    """Actor: decode (synthetic) grayscale → P1-P12 chain → integer
    quality metrics + applied steps. Chain settings built once per
    actor (the reference loads Settings once per worker)."""

    def __init__(self):
        from ..stages.preprocess import PreprocessSettings

        self.settings = PreprocessSettings()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib as hl

        from ..stages.preprocess import preprocess_image, synth_gray_image

        payloads = batch.column("payload").to_pylist()
        rows = {k: [] for k in
                ("brightness_x1000", "contrast_x1000", "noise_x1000",
                 "sharpness_x1000", "n_steps", "steps")}
        for p in payloads:
            p = p or b""
            h = hl.md5(p).hexdigest()
            w = 64 + int(h[0:8], 16) % 320
            ht = 64 + int(h[8:16], 16) % 320
            arr = synth_gray_image(p, w, ht)
            _, stats, applied = preprocess_image(arr, self.settings)
            rows["brightness_x1000"].append(int(stats.average_brightness * 1000))
            rows["contrast_x1000"].append(int(stats.contrast_ratio * 1000))
            rows["noise_x1000"].append(int(stats.noise_level * 1000))
            rows["sharpness_x1000"].append(int(stats.sharpness * 1000))
            rows["n_steps"].append(len(applied))
            rows["steps"].append("|".join(applied))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                **{k: pa.array(v, pa.int64() if k != "steps" else pa.string())
                   for k, v in rows.items()},
            }
        )


def preprocess_chain_stats(sf_dir: str) -> "ray.data.Dataset":
    """Full P1-P12 chain over per-doc synthetic decoded images (actor
    pool; deterministic but float-convolution-based → pytest-verified,
    not SQL-expressible). Library entry point; the driver query
    ``preprocess_stats`` is the SQL-oracle-checkable decision subset."""
    def to_payload(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(
                    [(t or "").encode("utf-8") for t in texts], pa.binary()
                ),
            }
        )

    from ..stages.tuning import tuned_executor

    # the read captures the tuned context COPY → scoped to this DAG
    with tuned_executor():
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return ds.map_batches(to_payload, batch_format="pyarrow").map_batches(
            PreprocessAnalyzer,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=(1, 4),
            num_cpus=1,
        )


def preprocess_stats(sf_dir: str) -> "ray.data.Dataset":
    """P1/P2 preprocessing DECISIONS (orientation + smart-resize
    geometry, /root/reference/src/ocr/enhanced.rs:339-386) per doc,
    with md5-derived synthetic dimensions — pure integer/float64
    geometry, mirrored exactly by the DuckDB oracle.

    Decision math (identical to stages.preprocess correct_orientation /
    smart_resize): rotate 90° iff w/h > 2; then if the longest edge
    > 2048 scale by 2048/max, elif the shortest < 300 scale by 600/min;
    out dims = max(1, trunc(dim * scale))."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        hexes = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
        w = np.array([64 + int(h[0:8], 16) % 320 for h in hexes], dtype=np.int64)
        h = np.array([64 + int(x[8:16], 16) % 320 for x in hexes], dtype=np.int64)
        rotated = w.astype(np.float64) / h.astype(np.float64) > 2.0
        w2 = np.where(rotated, h, w)
        h2 = np.where(rotated, w, h)
        mx = np.maximum(w2, h2).astype(np.float64)
        mn = np.minimum(w2, h2).astype(np.float64)
        scale = np.where(mx > 2048.0, 2048.0 / mx,
                         np.where(mn < 300.0, 600.0 / mn, 1.0))
        resized = scale != 1.0
        out_w = np.maximum(1, (w2.astype(np.float64) * scale).astype(np.int64))
        out_h = np.maximum(1, (h2.astype(np.float64) * scale).astype(np.int64))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "width": pa.array(w, pa.int64()),
                "height": pa.array(h, pa.int64()),
                "rotated": pa.array(rotated, pa.bool_()),
                "resized": pa.array(resized, pa.bool_()),
                "out_w": pa.array(out_w, pa.int64()),
                "out_h": pa.array(out_h, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def multimodal_meta(sf_dir: str) -> "ray.data.Dataset":
    """Treat documents.text bytes as the opaque payload column and run
    the decode→resize→frame-sample actor pool over it. Deterministic →
    oracle-checkable; with a real decoder this is the image pipeline."""
    def to_payload(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(
                    [(t or "").encode("utf-8") for t in texts], pa.binary()
                ),
            }
        )

    from ..stages.tuning import tuned_executor

    # the read captures the tuned context COPY → scoped to this DAG
    with tuned_executor():
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return ds.map_batches(to_payload, batch_format="pyarrow").map_batches(
            PayloadCodec,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=(1, 4),
            num_cpus=1,
        )


AUDIO_WINDOW = 4000       # samples per analysis window
AUDIO_BASE_SAMPLES = 8000
AUDIO_SPAN_SAMPLES = 160000
AUDIO_ENERGY_MOD = 1_000_000


class AudioFeaturizer:
    """Actor: decode→window→feature-extract over audio refs — the
    audio leg of the multimodal plumbing (PayloadCodec covers
    image/video). Real decode needs an audio codec wheel (soundfile/
    librosa — absent here) and is OPT-IN like PayloadCodec's; the
    deterministic fake derives the stream length and per-window
    energies from md5 chains so every downstream contract (schema,
    batch size, actor signature, windowed reduction) is real and
    oracle-checkable.

    Fake decode: n_samples = 8000 + md5(ref)[0:8] % 160000; window w's
    energy = md5(ref ':' w)[0:8] % 1e6. Per-doc features: window
    count, total and peak energy — the shape of a real
    energy/VAD/fingerprint pass, in exact integers."""

    def __init__(self, window: int = AUDIO_WINDOW, use_real: bool = False):
        self.window = window
        self.real = use_real
        if use_real:
            import soundfile  # noqa: F401  (fail fast: wheel absent here)

    def _decode_fake(self, ref: str) -> tuple[int, np.ndarray]:
        n_samples = AUDIO_BASE_SAMPLES + int(
            hashlib.md5(ref.encode()).hexdigest()[:8], 16
        ) % AUDIO_SPAN_SAMPLES
        n_windows = (n_samples + self.window - 1) // self.window
        energies = np.array(
            [
                int(hashlib.md5(f"{ref}:{w}".encode()).hexdigest()[:8], 16)
                % AUDIO_ENERGY_MOD
                for w in range(n_windows)
            ],
            dtype=np.int64,
        )
        return n_samples, energies

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:
            raise NotImplementedError(
                "real audio decode requires a codec wheel; construct with "
                "use_real=False for the deterministic fake"
            )
        refs = batch.column("audio_ref").to_pylist()
        ns_out, nw_out, tot_out, peak_out = [], [], [], []
        for ref in refs:
            n_samples, energies = self._decode_fake(ref)
            ns_out.append(n_samples)
            nw_out.append(len(energies))
            tot_out.append(int(energies.sum()))
            peak_out.append(int(energies.max()))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_samples": pa.array(ns_out, pa.int64()),
                "n_windows": pa.array(nw_out, pa.int64()),
                "total_energy": pa.array(tot_out, pa.int64()),
                "peak_energy": pa.array(peak_out, pa.int64()),
            }
        )


def audio_features(sf_dir: str) -> "ray.data.Dataset":
    """Audio-modality feature extraction: attach a deterministic
    ``audio://<doc_id>`` ref per document (the opaque-binary-column
    convention: payloads resolve from the ref, never ride the plan)
    and run the decode→window→energy actor pool. Small batches +
    bounded actor concurrency because a real decoder holds codec
    buffers per actor; the windowed reduction happens inside the
    actor so only 4 int64s per doc leave the stage."""
    from ..stages.tuning import tuned_executor

    def to_refs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "audio_ref": pa.array([f"audio://{i}" for i in ids], pa.string()),
            }
        )

    with tuned_executor():
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        )
        return ds.map_batches(to_refs, batch_format="pyarrow").map_batches(
            AudioFeaturizer,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=(1, 4),
            num_cpus=1,
        )


VIDEO_FPS = 25
VIDEO_BASE_MS = 2_000
VIDEO_SPAN_MS = 58_000
VIDEO_MAX_SAMPLES = 16


def video_frame_plan(sf_dir: str) -> "ray.data.Dataset":
    """Video frame-sampling plan — the third modality beside image
    preprocessing and audio windowing, same opaque-ref convention:
    each document carries a deterministic ``video://<doc_id>`` whose
    duration derives from the ref's md5 (the hermetic stand-in for a
    container-header probe; a real ffprobe slots into the same
    signature), and the planner emits the frames a FRAME_STRIDE
    sampler would decode, capped at VIDEO_MAX_SAMPLES per doc — the
    exact work-list a decode actor pool consumes, with timestamps in
    exact integer milliseconds (frame_idx·1000 // fps). Tail-seated
    by design: audio_features' md5-metadata convention with a
    flat-map expansion.

    Scale shape: one pass, vectorized np.repeat/tile expansion, ≤16
    rows per doc — no shuffle at all. Output: (doc_id, frame_idx,
    ts_ms, n_frames)."""
    import hashlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )

    def plan(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        dur = np.array(
            [
                VIDEO_BASE_MS
                + int(hashlib.md5(f"video://{i}".encode()).hexdigest()[:15], 16)
                % VIDEO_SPAN_MS
                for i in ids
            ],
            np.int64,
        )
        n_frames = dur * VIDEO_FPS // 1000
        n_sampled = np.minimum(
            (n_frames + FRAME_STRIDE - 1) // FRAME_STRIDE, VIDEO_MAX_SAMPLES
        )
        doc_rep = np.repeat(ids, n_sampled)
        nf_rep = np.repeat(n_frames, n_sampled)
        # per-doc sample ordinals 0..n_sampled-1, concatenated
        total = int(n_sampled.sum())
        ord_all = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n_sampled)[:-1])), n_sampled
        )
        frame_idx = ord_all * FRAME_STRIDE
        return pa.table(
            {
                "doc_id": pa.array(doc_rep, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int64()),
                "ts_ms": pa.array(frame_idx * 1000 // VIDEO_FPS, pa.int64()),
                "n_frames": pa.array(nf_rep, pa.int64()),
            }
        )

    return ds.map_batches(plan, batch_format="pyarrow")
