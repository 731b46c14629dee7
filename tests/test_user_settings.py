"""Per-user settings multiplicity (reference Settings rows,
/root/reference/src/models/settings.rs:7-65): documents carrying a
user_id resolve that user's overrides inside the extraction actor."""

import pyarrow as pa

from readur_ray import synth
from readur_ray.config import ExtractionConfig
from readur_ray.pipelines.extract import DocExtractor
from readur_ray.state.settings import SettingsStore


def test_settings_store_resolves_overrides():
    base = ExtractionConfig(
        user_overrides=(
            ("picky", (("ocr_min_confidence", 99.9), ("max_attempts", 1))),
        )
    )
    store = SettingsStore(base)
    assert store.for_user(None) is base
    assert store.for_user("unknown") is base
    picky = store.for_user("picky")
    assert picky.ocr_min_confidence == 99.9
    assert picky.max_attempts == 1
    # base untouched
    assert base.ocr_min_confidence == 30.0


def _media_batch(user_ids):
    """One OCR-image doc per user id (hermetic payload, confidence 88)."""
    rows = []
    for i, u in enumerate(user_ids):
        ref = synth.make_ref("img", f"udoc-{i}", 0, cls="img_ok")
        rows.append(
            {
                "doc_id": f"udoc-{i}",
                "spans": [{"kind": "media", "text": "", "media_ref": ref, "offset": 0}],
                "mime_type": "image/png",
                "part_id": 0,
                "user_id": u,
            }
        )
    return pa.Table.from_pylist(rows)


def test_per_user_confidence_gate():
    cfg = ExtractionConfig(
        user_overrides=(("picky", (("ocr_min_confidence", 99.9),)),)
    )
    ex = DocExtractor(cfg)
    out = ex(_media_batch(["picky", "normal", None]))
    by_id = {r["doc_id"]: r for r in out.to_pylist()}
    # hermetic img_ok confidence (~88) is below picky's 99.9 gate ...
    assert by_id["udoc-0"]["status"] == "failed"
    assert by_id["udoc-0"]["failure_reason"] == "low_ocr_confidence"
    # ... and above the default 30.0 gate for everyone else
    assert by_id["udoc-1"]["status"] == "completed"
    assert by_id["udoc-2"]["status"] == "completed"


def test_without_user_column_unchanged():
    cfg = ExtractionConfig(
        user_overrides=(("picky", (("ocr_min_confidence", 99.9),)),)
    )
    ex = DocExtractor(cfg)
    batch = _media_batch(["x"]).drop_columns(["user_id"])
    out = ex(batch)
    assert out.to_pylist()[0]["status"] == "completed"
