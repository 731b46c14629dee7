"""S5 HTTP upload source: multipart parsing, endpoint validation,
content-hash dedup, and spool → extraction e2e.

Mirrors the reference's upload-route behavior
(/root/reference/src/routes/documents/crud.rs:77-314 and the
hash-duplicate integration tests)."""

import json
import urllib.error
import urllib.request

import pytest

from readur_ray.sources.upload import (
    UploadServer,
    UploadSpool,
    parse_multipart,
    read_uploads,
)


def _multipart(fields: list[tuple], boundary: str = "XbOuNdArYx") -> tuple[bytes, str]:
    """fields: (name, filename|None, content_type|None, data: bytes)."""
    chunks = []
    for name, filename, ctype, data in fields:
        head = f'Content-Disposition: form-data; name="{name}"'
        if filename is not None:
            head += f'; filename="{filename}"'
        if ctype:
            head += f"\r\nContent-Type: {ctype}"
        chunks.append(f"--{boundary}\r\n{head}\r\n\r\n".encode() + data + b"\r\n")
    body = b"".join(chunks) + f"--{boundary}--\r\n".encode()
    return body, f"multipart/form-data; boundary={boundary}"


def _post(url: str, body: bytes, ctype: str) -> tuple[int, dict]:
    req = urllib.request.Request(
        url + "/documents", data=body, method="POST",
        headers={"Content-Type": ctype},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


# ---------------------------------------------------------------------------
# multipart parser
# ---------------------------------------------------------------------------


def test_parse_multipart_binary_payload_with_crlf():
    payload = b"line1\r\nline2\r\n\r\n\x00\xff--fake--"
    body, ctype = _multipart(
        [
            ("ocr_language", None, None, b"eng"),
            ("file", "weird.bin", "application/octet-stream", payload),
        ]
    )
    parts = parse_multipart(body, ctype)
    assert [p["name"] for p in parts] == ["ocr_language", "file"]
    assert parts[1]["filename"] == "weird.bin"
    assert parts[1]["data"] == payload


def test_parse_multipart_missing_boundary():
    with pytest.raises(ValueError):
        parse_multipart(b"x", "multipart/form-data")


# ---------------------------------------------------------------------------
# endpoint behavior
# ---------------------------------------------------------------------------


def test_upload_success_then_duplicate(tmp_path):
    with UploadServer(str(tmp_path / "spool")) as srv:
        body, ctype = _multipart([("file", "a.txt", "text/plain", b"hello upload")])
        code, resp = _post(srv.url, body, ctype)
        assert code == 200 and resp["status"] == "success"
        assert resp["mime_type"] == "text/plain" and resp["file_size"] == 12
        first_id = resp["id"]
        # same bytes, different filename → content-hash duplicate
        body2, ctype2 = _multipart([("file", "b.txt", "text/plain", b"hello upload")])
        code2, resp2 = _post(srv.url, body2, ctype2)
        assert code2 == 200 and resp2["status"] == "duplicate"
        assert resp2["id"] == first_id
        # only one payload + one sidecar in the spool
        assert len(srv.spool.sidecars()) == 1


def test_upload_validation_errors(tmp_path):
    with UploadServer(str(tmp_path / "spool"), max_file_size_mb=1) as srv:
        # no file part
        body, ctype = _multipart([("ocr_language", None, None, b"eng")])
        code, resp = _post(srv.url, body, ctype)
        assert code == 400 and "No file found" in resp["error"]
        # invalid language lists the available set (crud.rs:103-113)
        body, ctype = _multipart(
            [
                ("ocr_language", None, None, b"klingon"),
                ("file", "a.txt", "text/plain", b"x"),
            ]
        )
        code, resp = _post(srv.url, body, ctype)
        assert code == 400 and "Available languages" in resp["error"]
        # over the size cap → 413
        body, ctype = _multipart(
            [("file", "big.txt", "text/plain", b"z" * (1024 * 1024 + 1))]
        )
        code, resp = _post(srv.url, body, ctype)
        assert code == 413 and "exceeds maximum allowed size" in resp["error"]


def test_upload_auth(tmp_path):
    import base64

    with UploadServer(str(tmp_path / "spool"), username="u", password="p") as srv:
        body, ctype = _multipart([("file", "a.txt", "text/plain", b"x")])
        code, _ = _post(srv.url, body, ctype)
        assert code == 401
        req = urllib.request.Request(
            srv.url + "/documents", data=body, method="POST",
            headers={
                "Content-Type": ctype,
                "Authorization": "Basic " + base64.b64encode(b"u:p").decode(),
            },
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200


def test_sidecar_records_language_owner_priority(tmp_path):
    with UploadServer(str(tmp_path / "spool")) as srv:
        body, ctype = _multipart(
            [
                ("ocr_languages[0]", None, None, b"deu"),
                ("owner", None, None, b"alice"),
                ("file", "doc.txt", "text/plain", b"guten tag"),
            ]
        )
        code, _ = _post(srv.url, body, ctype)
        assert code == 200
        side = srv.spool.sidecars()[0]
        assert side["ocr_language"] == "deu"
        assert side["owner"] == "alice"
        assert side["priority"] == 5
        assert side["relative_path"] == "upload/doc.txt"


def test_spool_reload_preserves_dedup_index(tmp_path):
    spool_dir = str(tmp_path / "spool")
    UploadSpool(spool_dir).ingest("a.txt", "text/plain", b"same bytes")
    # a fresh process over the same directory still detects the dup
    resp = UploadSpool(spool_dir).ingest("b.txt", "text/plain", b"same bytes")
    assert resp["status"] == "duplicate"


# ---------------------------------------------------------------------------
# spool → extraction e2e
# ---------------------------------------------------------------------------


def test_read_uploads_to_extraction(ray_session, tmp_path):
    from readur_ray import synth
    from readur_ray.config import ExtractionConfig
    from readur_ray.pipelines.extract import build_extracted

    spool_dir = str(tmp_path / "spool")
    with UploadServer(spool_dir) as srv:
        uploads = [
            ("notes.txt", "text/plain", b"uploaded plain text"),
            ("scan.pdf", "application/pdf", synth.pdf_payload("up1", 0, "pdf_text_layer", 1)),
            ("photo.png", "image/png", synth.img_payload("up2", 0, "img_ok")),
        ]
        for fn, ct, data in uploads:
            body, ctype = _multipart([("file", fn, ct, data)])
            code, resp = _post(srv.url, body, ctype)
            assert code == 200 and resp["status"] == "success"

    ds = read_uploads(spool_dir)
    # doc_id = <virtual path>#<sha256 prefix> (collision-free when the
    # same filename is re-uploaded with different content)
    rows = {r["doc_id"].split("#")[0]: r for r in ds.take_all()}
    assert set(rows) == {"upload/notes.txt", "upload/scan.pdf", "upload/photo.png"}
    assert all("#" in r["doc_id"] for r in rows.values())
    assert rows["upload/notes.txt"]["spans"][0]["text"] == "uploaded plain text"
    assert rows["upload/scan.pdf"]["spans"][0]["media_ref"].startswith("spool:")

    out_dir = tmp_path / "upload_table"
    ds.write_parquet(str(out_dir))
    cfg = ExtractionConfig(media_resolver=f"spool:{spool_dir}", extract_concurrency=2)
    extracted = {
        r["doc_id"].split("#")[0]: r
        for r in build_extracted(str(out_dir), cfg).take_all()
    }
    assert set(extracted) == set(rows)
    assert all(r["status"] == "completed" for r in extracted.values())
    assert extracted["upload/scan.pdf"]["spans"][0]["kind"] == "pdf_text"
    assert extracted["upload/photo.png"]["spans"][0]["kind"] == "ocr_text"


def test_read_uploads_empty_spool(ray_session, tmp_path):
    ds = read_uploads(str(tmp_path / "empty_spool"))
    assert ds.count() == 0


def test_land_connector_input_full_runner(ray_session, tmp_path):
    """The CLI ingest path end-to-end minus argparse: connector rows
    land under <out>/ingested/, and the resumable runner extracts them
    with the returned resolver spec."""
    from readur_ray import synth
    from readur_ray.__main__ import land_connector_input
    from readur_ray.config import ExtractionConfig
    from readur_ray.pipelines.run import run_extraction

    spool_dir = str(tmp_path / "spool")
    with UploadServer(spool_dir) as srv:
        for fn, ct, data in (
            ("a.txt", "text/plain", b"cli ingest text"),
            ("b.pdf", "application/pdf", synth.pdf_payload("cli1", 0, "pdf_text_layer", 1)),
        ):
            body, ctype = _multipart([("file", fn, ct, data)])
            code, resp = _post(srv.url, body, ctype)
            assert code == 200 and resp["status"] == "success"

    out = str(tmp_path / "out")
    input_path, resolver = land_connector_input(out, spool_dir=spool_dir)
    assert input_path.endswith("ingested") and resolver == f"spool:{spool_dir}"
    cfg = ExtractionConfig(media_resolver=resolver, extract_concurrency=2)
    summary = run_extraction(input_path, out, cfg, n_chunks=1)
    import ray as _ray

    final = _ray.data.read_parquet(summary["final_dir"]).take_all()
    assert sorted(r["doc_id"].split("#")[0] for r in final) == [
        "upload/a.txt", "upload/b.pdf",
    ]
    assert all(r["status"] == "completed" for r in final)


def test_same_filename_different_content_distinct_doc_ids(ray_session, tmp_path):
    # re-uploading report.txt with edited content must yield TWO docs
    # with distinct doc_ids (path-only ids silently merged them)
    spool_dir = str(tmp_path / "spool")
    with UploadServer(spool_dir) as srv:
        for data in (b"version one", b"version two, edited"):
            body, ctype = _multipart([("file", "report.txt", "text/plain", data)])
            code, resp = _post(srv.url, body, ctype)
            assert code == 200 and resp["status"] == "success"
    rows = read_uploads(spool_dir).take_all()
    ids = sorted(r["doc_id"] for r in rows)
    assert len(ids) == 2 and ids[0] != ids[1]
    assert all(i.startswith("upload/report.txt#") for i in ids)
