"""S6: WebDAV source connector.

Re-expresses the reference's WebDAV discovery / sync / download stack
(/root/reference/src/services/webdav/service.rs:911-1568 discovery +
download, /root/reference/src/webdav_xml_parser.rs:28-261 multistatus
parsing, :538-666 etag semantics) on the Python stdlib (urllib +
xml.etree) and Ray Data, with the scale split the reference's design
implies but a single Tokio process can't exploit:

- **discovery is driver-side and metadata-only** — one Depth-1
  PROPFIND per directory, BFS over collections (the reference's
  recursive scan, service.rs:988-1054). At 100 TB this is the cheap
  part: one XML round-trip per directory, zero payload bytes.
- **payload download is distributed** — text payloads are fetched
  inside a ``map_batches`` actor-pool stage (one warm authenticated
  client per actor, the analog of the reference's download semaphore,
  service.rs:1358-1420), and media payloads stay lazy
  ``media_ref = 'webdav:<relative_path>'`` strings resolved by
  :class:`WebDavResolver` *inside* the extraction actors — bytes never
  transit the driver and never ride a shuffle.
- etag normalization / comparison and full-vs-targeted smart sync are
  shared with ``state/sync.py`` (W3), which already carries the
  reference's decision table.

The connector lands rows in the engine's DOCUMENTS schema, so
"ingesting a WebDAV share" is: ``read_webdav(...) → write_table(...)``
then the normal extraction DAG — exactly the reference's
discover → download → ingest → enqueue flow with the queue replaced by
the streaming executor.
"""

from __future__ import annotations

import base64
import hashlib
import json
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET

from ..functions.mime import is_trusted_server_mime_type, mime_from_extension
from ..state.sync import normalize_etag, plan_sync

PROPFIND_BODY = (
    b'<?xml version="1.0" encoding="utf-8"?>\n'
    b'<D:propfind xmlns:D="DAV:">\n'
    b"  <D:prop>\n"
    b"    <D:displayname/>\n"
    b"    <D:getcontentlength/>\n"
    b"    <D:getlastmodified/>\n"
    b"    <D:getcontenttype/>\n"
    b"    <D:getetag/>\n"
    b"    <D:resourcetype/>\n"
    b"    <D:creationdate/>\n"
    b"  </D:prop>\n"
    b"</D:propfind>\n"
)

# generic-property keys the reference maps to first-class metadata
# fields (webdav_xml_parser.rs:120-146)
_SPECIAL_PROPS = {"permissions", "fileid", "owner-id", "owner-display-name", "has-preview"}
_CORE_PROPS = {
    "href", "displayname", "getcontentlength", "getlastmodified",
    "getcontenttype", "getetag", "creationdate", "owner", "group",
    "status", "resourcetype", "collection", "prop", "propstat",
    "response", "multistatus",
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _nextcloud_permissions(text: str) -> int | None:
    """Nextcloud 'RGDNVW' letter-set → unix-style octal
    (webdav_xml_parser.rs:183-201)."""
    text = text.strip()
    if text and text.isalpha() and text.isupper():
        perms = 0
        if "R" in text:
            perms |= 0o444
        if "W" in text:
            perms |= 0o222
        if "D" in text:
            perms |= 0o111
        return perms
    try:
        return int(text)
    except ValueError:
        return None


def _fallback_etag(href: str) -> str:
    """The reference fabricates a uuid4 when a server omits getetag
    (webdav_xml_parser.rs:224); we use a content-free deterministic
    stand-in (md5 of the href) so repeated discoveries of an
    etag-less server stay comparable instead of always 'changed'."""
    return hashlib.md5(href.encode()).hexdigest()


def parse_propfind_response(
    xml_text: str, include_directories: bool = False
) -> list[dict]:
    """Parse a 207 multistatus body into FileIngestionInfo-shaped
    dicts, mirroring webdav_xml_parser.rs:28-261: namespace-agnostic
    local-name matching, props taken only from a 200-status propstat,
    collections detected via <resourcetype><collection/>, name =
    displayname or URL-decoded href basename, etags normalized."""
    root = ET.fromstring(xml_text)
    out = []
    for resp in root.iter():
        if _local(resp.tag) != "response":
            continue
        href = ""
        props: dict[str, str] = {}
        metadata: dict[str, object] = {}
        is_collection = False
        status_ok = False

        def harvest(el) -> None:
            nonlocal is_collection
            name = _local(el.tag)
            if name == "collection":
                is_collection = True
            elif name in ("href", "status", "propstat", "prop", "response"):
                return
            elif el.text and el.text.strip():
                text = el.text.strip()
                short = name.split(":")[-1]
                if name in _CORE_PROPS:
                    props[name] = text
                elif short in _SPECIAL_PROPS or name in _SPECIAL_PROPS:
                    if short == "permissions":
                        metadata["permissions_raw"] = text
                        props["permissions"] = text
                    elif short == "fileid":
                        metadata["file_id"] = text
                    elif short == "owner-id":
                        metadata["owner_id"] = text
                    elif short == "owner-display-name":
                        metadata["owner_display_name"] = text
                        props.setdefault("owner", text)
                    elif short == "has-preview":
                        if text.lower() in ("true", "false"):
                            metadata["has_preview"] = text.lower() == "true"
                else:
                    # vendor-specific property, kept verbatim
                    # (webdav_xml_parser.rs:141-145)
                    metadata[name] = text

        for el in resp:
            if _local(el.tag) == "href":
                href = (el.text or "").strip()
        propstats = [ps for ps in resp.iter() if _local(ps.tag) == "propstat"]
        if propstats:
            # props scoped to 200-status propstat blocks ONLY: a 404/403
            # propstat in the same response (unauthorized / failed
            # props) must not leak stale etags or sizes into the dict
            for ps in propstats:
                ps_ok = any(
                    _local(s.tag) == "status" and "200" in (s.text or "")
                    for s in ps.iter()
                )
                if not ps_ok:
                    continue
                status_ok = True
                for el in ps.iter():
                    harvest(el)
        else:
            # degenerate servers: no propstat wrapper, a bare response
            # with a direct <status> — the pre-scoping behavior
            for el in resp.iter():
                name = _local(el.tag)
                if name == "status" and "200" in (el.text or ""):
                    status_ok = True
                else:
                    harvest(el)
        if not status_ok or not href:
            continue
        if is_collection and not include_directories:
            continue
        name = props.get("displayname") or href.rstrip("/").split("/")[-1]
        name = urllib.parse.unquote(name)
        etag = props.get("getetag")
        etag = normalize_etag(etag) if etag else _fallback_etag(href)
        server_mime = props.get("getcontenttype")
        if is_collection:
            mime = "inode/directory"
        elif server_mime and is_trusted_server_mime_type(server_mime):
            mime = server_mime.split(";")[0].strip()
        else:
            mime = mime_from_extension(name)
        try:
            size = int(props.get("getcontentlength", "0"))
        except ValueError:
            size = 0
        out.append(
            {
                "href": href,
                "relative_path": "",  # set by the discovery layer
                "name": name,
                "size": size,
                "mime_type": mime,
                "last_modified": props.get("getlastmodified", ""),
                "created_at": props.get("creationdate", ""),
                "etag": etag,
                "is_directory": is_collection,
                "owner": props.get("owner", ""),
                "group": props.get("group", ""),
                "permissions": _nextcloud_permissions(props["permissions"])
                if "permissions" in props
                else None,
                "metadata": json.dumps(metadata, sort_keys=True) if metadata else "",
            }
        )
    return out


class WebDavClient:
    """Minimal authenticated WebDAV client (urllib): OPTIONS capability
    probe, Depth-1 PROPFIND, GET. One instance per actor — the
    connection/auth state is the reference's warm reqwest client."""

    def __init__(self, base_url: str, username: str = "", password: str = "",
                 timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self._base_path = urllib.parse.urlparse(self.base_url).path.rstrip("/")
        self.timeout = timeout
        self._auth = None
        if username:
            token = base64.b64encode(f"{username}:{password}".encode()).decode()
            self._auth = f"Basic {token}"

    # -- transport -----------------------------------------------------
    def url_for(self, relative_path: str) -> str:
        rel = "/" + relative_path.lstrip("/")
        return self.base_url + urllib.parse.quote(rel)

    def to_relative_path(self, href: str) -> str:
        """service.rs:1364 convert_to_relative_path: strip the server
        mount prefix from an href path."""
        path = urllib.parse.unquote(urllib.parse.urlparse(href).path)
        if self._base_path and path.startswith(self._base_path):
            path = path[len(self._base_path):]
        return path.rstrip("/") or "/"

    def _request(self, method: str, url: str, body: bytes | None = None,
                 headers: dict | None = None):
        req = urllib.request.Request(url, data=body, method=method)
        if self._auth:
            req.add_header("Authorization", self._auth)
        for k, v in (headers or {}).items():
            req.add_header(k, v)
        return urllib.request.urlopen(req, timeout=self.timeout)

    # -- protocol ------------------------------------------------------
    def options(self, relative_path: str = "/") -> list[str]:
        with self._request("OPTIONS", self.url_for(relative_path)) as resp:
            allow = resp.headers.get("Allow", "")
        return [m.strip().upper() for m in allow.split(",") if m.strip()]

    def check_propfind_support(self, relative_path: str = "/") -> bool:
        """service.rs:598-600 — PROPFIND must appear in Allow."""
        return "PROPFIND" in self.options(relative_path)

    def propfind(self, relative_path: str = "/", depth: int = 1) -> str:
        with self._request(
            "PROPFIND",
            self.url_for(relative_path),
            body=PROPFIND_BODY,
            headers={"Depth": str(depth), "Content-Type": "application/xml"},
        ) as resp:
            if resp.status not in (200, 207):
                raise IOError(f"PROPFIND {relative_path}: HTTP {resp.status}")
            return resp.read().decode("utf-8", errors="replace")

    def get(self, relative_path: str) -> bytes:
        with self._request("GET", self.url_for(relative_path)) as resp:
            if resp.status != 200:
                raise IOError(f"GET {relative_path}: HTTP {resp.status}")
            return resp.read()

    # -- discovery -----------------------------------------------------
    def list_directory(self, relative_path: str = "/"):
        """One Depth-1 PROPFIND → (files, subdirectories), each with
        relative_path set; the listed directory itself is excluded
        (service.rs:976-981)."""
        entries = parse_propfind_response(
            self.propfind(relative_path, depth=1), include_directories=True
        )
        self_path = "/" + relative_path.strip("/")
        files, dirs = [], []
        for e in entries:
            e["relative_path"] = self.to_relative_path(e["href"])
            norm = "/" + e["relative_path"].strip("/")
            if norm == self_path:
                continue
            (dirs if e["is_directory"] else files).append(e)
        return files, dirs

    def discover(self, relative_path: str = "/", recursive: bool = True) -> list[dict]:
        """BFS recursive discovery (service.rs:988-1054). Metadata
        only — no payload bytes move here."""
        files: list[dict] = []
        queue = ["/" + relative_path.strip("/")]
        seen = set()
        while queue:
            d = queue.pop(0)
            if d in seen:
                continue
            seen.add(d)
            fs, ds = self.list_directory(d)
            files.extend(fs)
            if recursive:
                queue.extend(x["relative_path"] for x in ds)
        return files

    def directory_manifest(self, relative_path: str = "/") -> dict[str, str]:
        """{directory relative_path: etag} over the whole subtree —
        the shallow manifest smart-sync diffs (smart_sync.rs:57-181).
        Costs one PROPFIND per directory, no file payloads."""
        manifest: dict[str, str] = {}
        root = "/" + relative_path.strip("/")
        root_entries = parse_propfind_response(
            self.propfind(root, depth=0), include_directories=True
        )
        for e in root_entries:
            manifest[root] = e["etag"]
        queue, seen = [root], set()
        while queue:
            d = queue.pop(0)
            if d in seen:
                continue
            seen.add(d)
            _, dirs = self.list_directory(d)
            for sub in dirs:
                manifest[sub["relative_path"]] = sub["etag"]
                queue.append(sub["relative_path"])
        return manifest


def plan_webdav_sync(client: WebDavClient, known: dict[str, str],
                     relative_path: str = "/"):
    """Smart sync over a live share: shallow manifest → the W3
    decision table (skip / targeted / full). Returns (plan, manifest);
    persist the manifest for the next cycle."""
    current = client.directory_manifest(relative_path)
    return plan_sync(known, current), current


# ---------------------------------------------------------------------------
# Ray-side: distributed download + DOCUMENTS rows
# ---------------------------------------------------------------------------


class WebDavResolver:
    """MediaResolver over a share: ``media_ref = 'webdav:<relative>'``
    → GET inside the extraction actor. A tiny per-actor cache collapses
    the declared_size + fetch pair for the same ref into one GET."""

    _CACHE_CAP = 32

    def __init__(self, base_url: str, username: str = "", password: str = ""):
        self._client = WebDavClient(base_url, username, password)
        self._cache: dict[str, bytes] = {}

    def _rel(self, ref: str) -> str:
        return ref.split(":", 1)[1] if ref.startswith("webdav:") else ref

    def fetch(self, ref: str) -> bytes:
        rel = self._rel(ref)
        if rel not in self._cache:
            if len(self._cache) >= self._CACHE_CAP:
                self._cache.pop(next(iter(self._cache)))
            self._cache[rel] = self._client.get(rel)
        return self._cache[rel]

    def declared_size(self, ref: str) -> int:
        return len(self.fetch(ref))


class ToDocuments:
    """Actor-pool stage: file-metadata rows → DOCUMENTS rows. Text
    payloads are fetched here (warm client per actor, the reference's
    bounded-concurrency download pool, service.rs:1358-1420) and
    inlined as text spans; media payloads stay lazy webdav: refs."""

    def __init__(self, base_url: str, username: str = "", password: str = ""):
        self._client = WebDavClient(base_url, username, password)

    def __call__(self, batch):
        import pyarrow as pa

        rows = batch.to_pylist()
        doc_ids, spans_col, mimes, sizes, pages, etags = [], [], [], [], [], []
        for r in rows:
            rel, mime = r["relative_path"], r["mime_type"]
            if mime.startswith("text/"):
                payload = self._client.get(rel)
                span = {"kind": "text",
                        "text": payload.decode("utf-8", errors="replace"),
                        "media_ref": "", "offset": 0}
                size = len(payload)
            else:
                span = {"kind": "media", "text": "",
                        "media_ref": f"webdav:{rel}", "offset": 0}
                size = int(r["size"])
            doc_ids.append(rel)
            spans_col.append([span])
            mimes.append(mime)
            sizes.append(size)
            pages.append(0)  # unknown pre-fetch; engines count pages themselves
            etags.append(r["etag"])
        from ..schema import SPAN

        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "spans": pa.array(spans_col, pa.list_(SPAN)),
                "mime_type": pa.array(mimes, pa.string()),
                "file_size": pa.array(sizes, pa.int64()),
                "page_count": pa.array(pages, pa.int32()),
                "etag": pa.array(etags, pa.string()),
                "source": pa.array(["webdav"] * len(rows), pa.string()),
            }
        )


def read_webdav(
    base_url: str,
    relative_path: str = "/",
    username: str = "",
    password: str = "",
    recursive: bool = True,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Discover a share (driver, metadata-only) and materialize it as
    a DOCUMENTS-schema Dataset with downloads distributed across an
    actor pool. Feed the result to ``write_table`` + the extraction
    DAG with ``media_resolver='webdav:<base_url>'``."""
    import ray.data

    client = WebDavClient(base_url, username, password)
    infos = client.discover(relative_path, recursive=recursive)
    items = [
        {k: info[k] for k in ("relative_path", "mime_type", "size", "etag")}
        for info in infos
    ]
    if not items:
        import pyarrow as pa

        from ..schema import DOCUMENTS

        empty = pa.table(
            {f.name: pa.array([], f.type) for f in DOCUMENTS}
        ).append_column("etag", pa.array([], pa.string())).append_column(
            "source", pa.array([], pa.string())
        )
        return ray.data.from_arrow(empty)
    ds = ray.data.from_items(items)
    return ds.map_batches(
        ToDocuments,
        fn_constructor_args=(base_url, username, password),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, concurrency),
        num_cpus=0.25,
    )


# ---------------------------------------------------------------------------
# etag-aware stable landing (S6 -> incremental extraction bridge)
# ---------------------------------------------------------------------------

LAND_SUBSHARDS = 1   # md5-bucket split inside each directory; raise when
                     # single directories hold >>1k files (changing it
                     # re-lands every shard — a planned migration, not a dial
                     # to flip per run)


def _shard_key(relative_path: str) -> str:
    """Stable shard assignment: top-level directory (+ md5 sub-bucket
    when LAND_SUBSHARDS > 1). A file's shard never depends on what
    else is in the share, so unchanged shards stay byte-identical on
    disk across landings."""
    import hashlib

    parts = relative_path.strip("/").split("/")
    top = parts[0] if len(parts) > 1 else "_root"
    if LAND_SUBSHARDS > 1:
        h = int(hashlib.md5(relative_path.encode()).hexdigest()[:8], 16)
        return f"{top}.{h % LAND_SUBSHARDS:02d}"
    return top


def land_webdav(
    out_dir: str,
    base_url: str,
    username: str = "",
    password: str = "",
    relative_path: str = "/",
) -> str:
    """Incremental landing: discover the share (driver, metadata only),
    diff per-shard {relative_path: etag} manifests against the previous
    landing, and re-download ONLY the shards whose membership or etags
    changed — one Ray task per pending shard writing a deterministic
    ``ingested/shard-<md5>.parquet`` (tmp + rename, so a crashed
    landing never leaves a torn shard). Unchanged shards are not
    rewritten, so their file bytes — and therefore
    ``run_incremental``'s content etags — are stable, and the
    extraction layer's group chunks re-extract only the changed
    slice of the share.

    This is the reference's smart sync driving ingest cost, not just
    scan cost (/root/reference/src/services/webdav/smart_sync.rs:57-181
    decides full-vs-targeted crawl; here the same etag evidence also
    skips download + landing + re-extraction). Measured (hermetic
    100k-file share, scripts/webdav_scale.py): the pre-fix path
    re-landed and re-extracted all 100k files on every run; with
    stable shards a 2-directory mutation re-lands 2 shards and the
    extraction ledger reuses every other group chunk.

    Returns the ingested directory (the extraction job's input_path).
    """
    import hashlib
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray

    client = WebDavClient(base_url, username, password)
    infos = client.discover(relative_path, recursive=True)

    shards: dict[str, list[dict]] = {}
    for info in infos:
        item = {k: info[k] for k in ("relative_path", "mime_type", "size", "etag")}
        shards.setdefault(_shard_key(info["relative_path"]), []).append(item)
    current = {
        s: {it["relative_path"]: it["etag"] for it in items}
        for s, items in shards.items()
    }

    ingested = os.path.join(out_dir, "ingested")
    os.makedirs(ingested, exist_ok=True)
    manifest_path = os.path.join(out_dir, "ingested_manifest.json")
    previous: dict[str, dict] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            previous = json.load(fh)

    def shard_file(s: str) -> str:
        return os.path.join(
            ingested, f"shard-{hashlib.md5(s.encode()).hexdigest()[:16]}.parquet"
        )

    for s in previous:
        if s not in current:
            try:
                os.remove(shard_file(s))
            except FileNotFoundError:
                pass
    pending = [
        s for s in sorted(current)
        if previous.get(s) != current[s] or not os.path.exists(shard_file(s))
    ]

    if pending:
        @ray.remote(num_cpus=0.25)
        def _land(shard: str, items: list[dict]) -> int:
            td = ToDocuments(base_url, username, password)
            items = sorted(items, key=lambda it: it["relative_path"])
            tbl = td(pa.Table.from_pylist(items))
            dest = shard_file(shard)
            tmp = dest + ".tmp"
            pq.write_table(tbl, tmp)
            os.replace(tmp, dest)
            return tbl.num_rows

        ray.get([_land.remote(s, shards[s]) for s in pending])

    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(current, fh)
    os.replace(tmp, manifest_path)
    return ingested
