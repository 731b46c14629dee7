"""S6 WebDAV connector: parser semantics, live-server discovery,
smart sync, and a distributed read → extraction e2e.

Mirrors the reference's parser/sync coverage
(/root/reference/src/webdav_xml_parser.rs tests,
src/services/webdav/smart_sync.rs) against a hermetic stdlib server.
"""

import base64
import urllib.error

import pytest

from readur_ray.sources.webdav import (
    WebDavClient,
    WebDavResolver,
    parse_propfind_response,
    plan_webdav_sync,
    read_webdav,
)
from webdav_server import WebDavTree, start_server


# ---------------------------------------------------------------------------
# parser unit tests (fixture XML, no server)
# ---------------------------------------------------------------------------

MULTISTATUS = """<?xml version="1.0"?>
<D:multistatus xmlns:D="DAV:" xmlns:oc="http://owncloud.org/ns">
  <D:response>
    <D:href>/dav/docs/</D:href>
    <D:propstat>
      <D:prop><D:resourcetype><D:collection/></D:resourcetype>
        <D:getetag>"dir-etag-1"</D:getetag></D:prop>
      <D:status>HTTP/1.1 200 OK</D:status>
    </D:propstat>
  </D:response>
  <D:response>
    <D:href>/dav/docs/a%20report.txt</D:href>
    <D:propstat>
      <D:prop>
        <D:getcontentlength>42</D:getcontentlength>
        <D:getcontenttype>text/plain</D:getcontenttype>
        <D:getetag>W/"weak-etag"</D:getetag>
        <D:resourcetype/>
        <oc:permissions>RGDNVW</oc:permissions>
        <oc:fileid>777</oc:fileid>
      </D:prop>
      <D:status>HTTP/1.1 200 OK</D:status>
    </D:propstat>
  </D:response>
  <D:response>
    <D:href>/dav/docs/ghost.txt</D:href>
    <D:propstat>
      <D:prop><D:getcontentlength>1</D:getcontentlength></D:prop>
      <D:status>HTTP/1.1 404 Not Found</D:status>
    </D:propstat>
  </D:response>
  <D:response>
    <D:href>/dav/docs/scan.pdf</D:href>
    <D:propstat>
      <D:prop>
        <D:displayname>scan.pdf</D:displayname>
        <D:getcontentlength>1000</D:getcontentlength>
        <D:getcontenttype>application/octet-stream</D:getcontenttype>
        <D:getetag>"pdf-etag"</D:getetag>
        <D:resourcetype/>
      </D:prop>
      <D:status>HTTP/1.1 200 OK</D:status>
    </D:propstat>
  </D:response>
</D:multistatus>
"""


def test_parse_files_only_and_status_gating():
    files = parse_propfind_response(MULTISTATUS)
    # collection skipped, 404-propstat response skipped
    assert [f["name"] for f in files] == ["a report.txt", "scan.pdf"]


def test_parse_name_decoding_and_etag_normalization():
    f = parse_propfind_response(MULTISTATUS)[0]
    assert f["name"] == "a report.txt"          # URL-decoded href basename
    assert f["etag"] == "weak-etag"             # W/ + quotes stripped
    assert f["size"] == 42
    assert f["mime_type"] == "text/plain"


def test_parse_untrusted_server_mime_falls_back_to_extension():
    f = parse_propfind_response(MULTISTATUS)[1]
    # application/octet-stream is untrusted → extension wins
    assert f["mime_type"] == "application/pdf"


def test_parse_vendor_metadata_and_permissions():
    import json

    f = parse_propfind_response(MULTISTATUS)[0]
    assert f["permissions"] == (0o444 | 0o222 | 0o111)  # R, W, D present
    meta = json.loads(f["metadata"])
    assert meta["file_id"] == "777"
    assert meta["permissions_raw"] == "RGDNVW"


def test_parse_include_directories():
    entries = parse_propfind_response(MULTISTATUS, include_directories=True)
    dirs = [e for e in entries if e["is_directory"]]
    assert len(dirs) == 1 and dirs[0]["etag"] == "dir-etag-1"
    assert dirs[0]["mime_type"] == "inode/directory"


def test_parse_missing_etag_is_deterministic():
    xml = """<?xml version="1.0"?>
    <D:multistatus xmlns:D="DAV:"><D:response>
      <D:href>/dav/x.txt</D:href>
      <D:propstat><D:prop><D:getcontentlength>5</D:getcontentlength>
        <D:resourcetype/></D:prop>
      <D:status>HTTP/1.1 200 OK</D:status></D:propstat>
    </D:response></D:multistatus>"""
    a = parse_propfind_response(xml)[0]["etag"]
    b = parse_propfind_response(xml)[0]["etag"]
    assert a == b and len(a) == 32


# ---------------------------------------------------------------------------
# live hermetic server
# ---------------------------------------------------------------------------


@pytest.fixture()
def share():
    tree = WebDavTree()
    tree.put("/readme.txt", b"hello webdav world", "text/plain")
    tree.put("/docs/a.txt", b"alpha " * 10, "text/plain", etag_style="weak")
    tree.put("/docs/deep/b.txt", b"beta " * 5, "", etag_style="bare")
    url, shutdown = start_server(tree)
    yield url, tree
    shutdown()


def test_options_capability_probe(share):
    url, _ = share
    client = WebDavClient(url)
    assert client.check_propfind_support()


def test_discover_recursive_relative_paths(share):
    url, _ = share
    client = WebDavClient(url)
    files = client.discover("/", recursive=True)
    assert sorted(f["relative_path"] for f in files) == [
        "/docs/a.txt", "/docs/deep/b.txt", "/readme.txt",
    ]
    # non-recursive sees only the root file
    top = client.discover("/", recursive=False)
    assert [f["relative_path"] for f in top] == ["/readme.txt"]


def test_list_directory_excludes_self(share):
    url, _ = share
    files, dirs = WebDavClient(url).list_directory("/docs")
    assert [f["relative_path"] for f in files] == ["/docs/a.txt"]
    assert [d["relative_path"] for d in dirs] == ["/docs/deep"]


def test_get_roundtrip_and_resolver_cache(share):
    url, _ = share
    resolver = WebDavResolver(url)
    assert resolver.fetch("webdav:/readme.txt") == b"hello webdav world"
    assert resolver.declared_size("webdav:/docs/a.txt") == 60
    # cached: mutate the underlying store; cached ref must not re-fetch
    assert resolver.fetch("webdav:/readme.txt") == b"hello webdav world"


def test_basic_auth_enforced():
    tree = WebDavTree()
    tree.put("/s.txt", b"secret", "text/plain")
    token = "Basic " + base64.b64encode(b"alice:pw").decode()
    url, shutdown = start_server(tree, require_auth=token)
    try:
        with pytest.raises(urllib.error.HTTPError):
            WebDavClient(url).get("/s.txt")
        assert WebDavClient(url, "alice", "pw").get("/s.txt") == b"secret"
    finally:
        shutdown()


def test_smart_sync_skip_then_targeted():
    # wide tree: one changed subtree stays under the 0.3 change-ratio
    # threshold (etag changes propagate to the root, so the root dir
    # always counts as changed — Nextcloud semantics)
    tree = WebDavTree()
    for d in "abcdefg":
        tree.put(f"/{d}/file.txt", f"content {d}".encode(), "text/plain")
    url, shutdown = start_server(tree)
    try:
        client = WebDavClient(url)
        plan0, manifest = plan_webdav_sync(client, known={})
        assert plan0.decision == "full"               # first run: no manifest
        plan1, manifest1 = plan_webdav_sync(client, known=manifest)
        assert plan1.decision == "skip"               # nothing changed
        tree.put("/a/file.txt", b"CHANGED", "text/plain")
        plan2, _ = plan_webdav_sync(client, known=manifest1)
        assert plan2.decision == "targeted"
        assert "/a" in plan2.changed and "/" in plan2.changed
        assert "/b" not in plan2.changed              # untouched subtree
    finally:
        shutdown()


# ---------------------------------------------------------------------------
# distributed read → extraction e2e
# ---------------------------------------------------------------------------


def test_read_webdav_to_extraction(ray_session, tmp_path):
    from readur_ray import synth
    from readur_ray.config import ExtractionConfig
    from readur_ray.pipelines.extract import build_extracted

    tree = WebDavTree()
    tree.put("/notes/hello.txt", b"plain text from webdav share", "text/plain")
    tree.put("/notes/scan.pdf", synth.pdf_payload("wd1", 0, "pdf_text_layer", 2),
             "application/pdf")
    tree.put("/notes/photo.png", synth.img_payload("wd2", 0, "img_ok"), "image/png")
    url, shutdown = start_server(tree)
    try:
        ds = read_webdav(url, "/", concurrency=2)
        rows = {r["doc_id"]: r for r in ds.take_all()}
        assert set(rows) == {"/notes/hello.txt", "/notes/scan.pdf", "/notes/photo.png"}
        # text inlined during the download stage
        assert rows["/notes/hello.txt"]["spans"][0]["text"] == (
            "plain text from webdav share"
        )
        # media stays lazy
        assert rows["/notes/scan.pdf"]["spans"][0]["media_ref"] == (
            "webdav:/notes/scan.pdf"
        )

        # land in the table, extract with the webdav resolver
        out_dir = tmp_path / "webdav_table"
        ds.write_parquet(str(out_dir))
        cfg = ExtractionConfig(media_resolver=f"webdav:{url}", extract_concurrency=2)
        extracted = {r["doc_id"]: r for r in build_extracted(str(out_dir), cfg).take_all()}
        assert set(extracted) == set(rows)
        assert all(r["status"] == "completed" for r in extracted.values())
        assert extracted["/notes/hello.txt"]["spans"][0]["kind"] == "plain_text"
        pdf_spans = extracted["/notes/scan.pdf"]["spans"]
        assert [s["kind"] for s in pdf_spans] == ["pdf_text"]
        assert synth._page_text("wd1", 0, 0) in pdf_spans[0]["text"]
        img = extracted["/notes/photo.png"]["spans"][0]
        assert img["kind"] == "ocr_text" and img["text"]
    finally:
        shutdown()


def test_read_webdav_empty_share(ray_session):
    tree = WebDavTree()
    tree.put("/only/dir/marker.keep", b"x", "")  # unknown ext → octet-stream media
    url, shutdown = start_server(tree)
    try:
        tree.clear()
        ds = read_webdav(url, "/")
        assert ds.count() == 0
    finally:
        shutdown()


# ---------------------------------------------------------------------------
# etag-aware incremental landing (round 5)
# ---------------------------------------------------------------------------


def test_land_webdav_incremental_stable_shards(ray_session, tmp_path):
    from readur_ray.sources.webdav import land_webdav

    tree = WebDavTree()
    for d in ("alpha", "beta", "gamma"):
        for f in range(4):
            tree.put(f"/{d}/f{f}.txt", f"{d} body {f}".encode(), "text/plain")
    url, shutdown = start_server(tree)
    try:
        out = str(tmp_path / "job")
        ingested = land_webdav(out, url)
        import glob
        import os

        shard_bytes = {
            p: open(p, "rb").read() for p in glob.glob(f"{ingested}/*.parquet")
        }
        assert len(shard_bytes) == 3                 # one shard per directory

        import pyarrow.dataset as pads

        t = pads.dataset(ingested).to_table()
        assert t.num_rows == 12
        assert sorted(t.column("doc_id").to_pylist())[0] == "/alpha/f0.txt"

        # unchanged re-landing rewrites nothing (byte-stable shards)
        land_webdav(out, url)
        for p, data in shard_bytes.items():
            assert open(p, "rb").read() == data

        # mutate ONE directory: exactly its shard changes
        tree.put("/beta/f0.txt", b"beta body CHANGED", "text/plain")
        land_webdav(out, url)
        changed = [
            p for p, data in shard_bytes.items()
            if open(p, "rb").read() != data
        ]
        assert len(changed) == 1
        t2 = pads.dataset(ingested).to_table()
        texts = {
            r["doc_id"]: r["spans"][0]["text"] for r in t2.to_pylist()
        }
        assert texts["/beta/f0.txt"] == "beta body CHANGED"
        assert texts["/alpha/f0.txt"] == "alpha body 0"

        # delete a directory: its shard file goes away
        for f in range(4):
            tree.delete(f"/gamma/f{f}.txt")
        land_webdav(out, url)
        assert len(glob.glob(f"{ingested}/*.parquet")) == 2
        assert pads.dataset(ingested).to_table().num_rows == 8
        assert not glob.glob(f"{ingested}/*.tmp")
    finally:
        shutdown()
