"""W3 smart-sync planner vs the reference decision table
(/root/reference/src/services/webdav/smart_sync.rs:64-157) and the
RFC-7232 etag semantics (webdav_xml_parser.rs:538-666)."""

import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from readur_ray.state.sync import (
    SyncPlan,
    etags_match,
    normalize_etag,
    plan_sync,
    targeted_row_filter,
)


def test_etag_normalization():
    assert normalize_etag('"abc"') == "abc"
    assert normalize_etag('W/"abc"') == "abc"
    assert normalize_etag('w/ W/"abc"') == "abc"   # repeated weak markers
    assert normalize_etag("  abc  ") == "abc"


def test_etag_smart_compare():
    assert etags_match('"abc"', 'W/"abc"')   # weak vs strong, same value
    assert etags_match('"abc"', '"abc"')
    assert not etags_match('"abc"', '"abd"')


def test_first_run_is_full_scan():
    assert plan_sync({}, {"a": "1"}).decision == "full"


def test_no_changes_skips():
    known = {"a": '"1"', "b": '"2"'}
    plan = plan_sync(known, {"a": 'W/"1"', "b": '"2"'})
    assert plan.decision == "skip"


def test_small_change_is_targeted():
    known = {f"d{i}": f'"{i}"' for i in range(10)}
    disc = dict(known)
    disc["d3"] = '"changed"'
    disc["d_new"] = '"n"'
    plan = plan_sync(known, disc)
    assert plan.decision == "targeted"
    assert plan.targets == ["d3", "d_new"]


def test_many_changes_force_full():
    known = {f"d{i}": f'"{i}"' for i in range(10)}
    disc = {p: '"x"' for p in known}  # 100% changed
    assert plan_sync(known, disc).decision == "full"


def test_many_new_force_full():
    known = {f"d{i}": f'"{i}"' for i in range(10)}
    disc = dict(known, **{f"n{i}": '"n"' for i in range(6)})  # >5 new
    assert plan_sync(known, disc).decision == "full"


def test_any_deletion_forces_full():
    known = {"a": '"1"', "b": '"2"'}
    assert plan_sync(known, {"a": '"1"'}).decision == "full"


def test_folder_scoping():
    known = {"x/a": '"1"', **{f"y/d{i}": f'"{i}"' for i in range(10)}}
    disc = dict(known)
    disc["y/d3"] = '"CHANGED"'
    assert plan_sync(known, disc, folder="x/").decision == "skip"
    plan = plan_sync(known, disc, folder="y/")
    assert plan.decision == "targeted"
    assert plan.targets == ["y/d3"]
    # the same diff viewed from x/ is untouched by y/'s change
    assert plan_sync(known, disc, folder="x/").changed == []


def test_targeted_filter_prunes_scan(tmp_path):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "source": pa.array(["s1", "s1", "s2", "s2", "s3", "s3"]),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(tbl, str(tmp_path / "docs.parquet"))
    plan = SyncPlan("targeted", targets=["s2"])
    expr = targeted_row_filter(plan)
    got = pads.dataset(str(tmp_path / "docs.parquet")).to_table(filter=expr)
    assert got.column("doc_id").to_pylist() == [2, 3]
    # full scan -> no filter; skip -> empty selection
    assert targeted_row_filter(SyncPlan("full")) is None
    empty = pads.dataset(str(tmp_path / "docs.parquet")).to_table(
        filter=targeted_row_filter(SyncPlan("skip"))
    )
    assert empty.num_rows == 0
