"""W6 ledger compaction, D2 path-dedup plan, S8 s3:// pass-through."""

import json

import pyarrow as pa
import pytest

from readur_ray.sources import tables
from readur_ray.state import ledger


def test_compact_ledger_folds_old_chunks(tmp_path):
    out = str(tmp_path)
    now = 1_000_000.0
    for k in range(5):
        ledger.append_entry(out, {"kind": "chunk", "chunk": k, "rows": 10,
                                  "ts": now - 10 * 86400})
    ledger.append_entry(out, {"kind": "chunk", "chunk": 5, "rows": 7, "ts": now})
    ledger.append_entry(out, {"kind": "finalize", "total": 57, "ts": now})

    folded = ledger.compact_ledger(out, now=now)
    assert folded == 5
    # committed-chunk set is preserved across compaction
    assert ledger.committed_chunks(out) == {0, 1, 2, 3, 4, 5}
    entries = ledger.read_ledger(out)
    kinds = [e["kind"] for e in entries]
    assert kinds == ["snapshot", "chunk", "finalize"]
    assert entries[0]["chunks"] == [0, 1, 2, 3, 4]
    assert entries[0]["rows"] == 50

    # idempotent: a second pass folds the snapshot only if there is
    # something new to merge
    assert ledger.compact_ledger(out, now=now) == 0

    # a later run's old chunk merges INTO the existing snapshot
    ledger.append_entry(out, {"kind": "chunk", "chunk": 6, "rows": 3,
                              "ts": now - 9 * 86400})
    assert ledger.compact_ledger(out, now=now) == 2
    assert ledger.committed_chunks(out) == {0, 1, 2, 3, 4, 5, 6}


def test_compact_ledger_folds_filechunks_keeps_etags(tmp_path):
    """Aged filechunk commits fold into the snapshot WITH their etag map
    (resume must keep reading them); aged removals drop their etags;
    aged bookkeeping lines vanish."""
    out = str(tmp_path)
    now = 1_000_000.0
    old = now - 10 * 86400
    ledger.append_entry(out, {"kind": "filechunk", "chunk": "faaa", "etag": "e1",
                              "ts": old})
    ledger.append_entry(out, {"kind": "filechunk", "chunk": "fbbb", "etag": "e2",
                              "ts": old})
    ledger.append_entry(out, {"kind": "incremental_removed",
                              "chunks": ["fbbb"], "ts": old})
    ledger.append_entry(out, {"kind": "incremental", "mode": "targeted",
                              "ts": old})
    ledger.append_entry(out, {"kind": "filechunk", "chunk": "fccc", "etag": "e3",
                              "ts": now})

    before = ledger.committed_etags(out)
    assert before == {"faaa": "e1", "fccc": "e3"}
    folded = ledger.compact_ledger(out, now=now)
    assert folded == 4
    assert ledger.committed_etags(out) == before
    kinds = [e["kind"] for e in ledger.read_ledger(out)]
    assert kinds == ["snapshot", "filechunk"]

    # re-committing a removed chunk later resurrects it
    ledger.append_entry(out, {"kind": "filechunk", "chunk": "fbbb", "etag": "e4",
                              "ts": now})
    assert ledger.committed_etags(out)["fbbb"] == "e4"


def test_compact_ledger_atomic_file(tmp_path):
    out = str(tmp_path)
    ledger.append_entry(out, {"kind": "chunk", "chunk": 0, "rows": 1, "ts": 0.0})
    ledger.append_entry(out, {"kind": "chunk", "chunk": 1, "rows": 1, "ts": 0.0})
    ledger.compact_ledger(out, now=10 * 86400.0)
    # no tmp residue; file is valid jsonl
    assert not (tmp_path / "ledger.jsonl.tmp").exists()
    for line in (tmp_path / "ledger.jsonl").read_text().splitlines():
        json.loads(line)


def test_read_table_forwards_s3_uri(monkeypatch):
    """S8: object-store URIs ride through to ray.data.read_parquet
    untouched (no local-path mangling), with pruning args intact —
    Ray/pyarrow handle s3:// natively so this pass-through IS the S3
    source (/root/reference/src/services/s3_service.rs:82,219)."""
    captured = {}

    def fake_read_parquet(path, **kwargs):
        captured["path"] = path
        captured.update(kwargs)
        return "DS"

    monkeypatch.setattr(tables.ray.data, "read_parquet", fake_read_parquet)
    out = tables.read_table(
        "s3://bucket/prefix/documents.parquet",
        columns=["doc_id"],
        override_num_blocks=8,
    )
    assert out == "DS"
    assert captured["path"] == "s3://bucket/prefix/documents.parquet"
    assert captured["columns"] == ["doc_id"]
    assert captured["override_num_blocks"] == 8


def test_path_dedup_matches_oracle(ray_session, duck_sf0001):
    import __ray_entry__ as entrymod

    res = entrymod.queries()["dedup_path"]("/root/testdata/sf0.001").to_pandas()
    exp = duck_sf0001.execute(entrymod.oracle_sql()["dedup_path"]).df()
    res = res.sort_values(["doc_id"], ignore_index=True)[sorted(res.columns)]
    exp = exp.sort_values(["doc_id"], ignore_index=True)[sorted(exp.columns)]
    import pandas as pd

    pd.testing.assert_frame_equal(res, exp, check_dtype=False)
    assert (res["dedup_status"] == "skipped_duplicate_path").any()


@pytest.fixture(scope="module")
def duck_sf0001():
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    return con


def test_write_table_parquet_fallback(ray_session, tmp_path):
    import ray

    ds = ray.data.range(10)
    out = str(tmp_path / "o")
    fmt = tables.write_table(ds, out)
    if tables.lance_available():
        assert fmt == "lance"
    else:
        assert fmt == "parquet"
        assert ray.data.read_parquet(out).count() == 10
    # explicit lance request without the wheel fails fast
    if not tables.lance_available():
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            tables.write_table(ds, str(tmp_path / "o2"), fmt="lance")


def test_cli_ray_init_plan_cluster_vs_local():
    # `ray job submit` sets RAY_ADDRESS to the cluster: the CLI must
    # attach (no address, no num_cpus) instead of booting a local Ray
    from readur_ray.__main__ import ray_init_plan

    addr, kwargs = ray_init_plan("ray://head:10001", 16)
    assert addr is None and "num_cpus" not in kwargs

    for env in (None, "", "local"):
        addr, kwargs = ray_init_plan(env, 8)
        assert addr == "local" and kwargs["num_cpus"] == 8
    addr, kwargs = ray_init_plan("local", None)
    assert addr == "local" and "num_cpus" not in kwargs


def test_compact_ledger_folds_groupchunks_keeps_membership(tmp_path):
    """Aged groupchunk commits fold into the snapshot WITH their full
    {path: etag} membership (group reuse validation needs every member);
    aged removals drop the whole group."""
    out = str(tmp_path)
    now = 1_000_000.0
    old = now - 10 * 86400
    ledger.append_entry(out, {"kind": "groupchunk", "chunk": "gaaa",
                              "etags": {"/d/a": "e1", "/d/b": "e2"}, "ts": old})
    ledger.append_entry(out, {"kind": "groupchunk", "chunk": "gbbb",
                              "etags": {"/d/c": "e3"}, "ts": old})
    ledger.append_entry(out, {"kind": "incremental_removed",
                              "chunks": ["gbbb"], "ts": old})
    ledger.append_entry(out, {"kind": "groupchunk", "chunk": "gccc",
                              "etags": {"/d/d": "e4"}, "ts": now})

    before = ledger.committed_groups(out)
    assert before == {"gaaa": {"/d/a": "e1", "/d/b": "e2"},
                      "gccc": {"/d/d": "e4"}}
    folded = ledger.compact_ledger(out, now=now)
    assert folded == 3
    assert ledger.committed_groups(out) == before
    kinds = [e["kind"] for e in ledger.read_ledger(out)]
    assert kinds == ["snapshot", "groupchunk"]
