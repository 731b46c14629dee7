"""Hermetic in-process WebDAV server for connector tests.

Implements just enough of RFC 4918 on the stdlib http.server to
exercise readur_ray.sources.webdav: OPTIONS capability advertising,
Depth-0/1 PROPFIND returning 207 multistatus XML (with the etag-format
and vendor-property quirks the reference's parser tolerates), and GET.
Nextcloud-style semantics: a directory's etag changes whenever any
descendant changes.
"""

from __future__ import annotations

import hashlib
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

MOUNT = "/remote.php/webdav"


class WebDavTree:
    """In-memory share: relpath ('/a/b.txt') → (bytes, mime, etag_style).

    Directory membership is INDEXED (parent → child files / dirs) so a
    PROPFIND costs O(listing), not O(total files) — the original
    prefix-scan implementation made every request on a 100k-file share
    cost seconds and the connector scale drive measured the fixture,
    not the engine. Semantics are unchanged: directories exist exactly
    while a file lives under them, and `dir_etag` still folds the
    sorted subtree file paths + etags (Nextcloud propagation)."""

    def __init__(self):
        self.files: dict[str, tuple[bytes, str, str]] = {}
        self._kid_files: dict[str, set] = {"/": set()}
        self._kid_dirs: dict[str, set] = {"/": set()}

    @staticmethod
    def _parent(path: str) -> str:
        return path.rsplit("/", 1)[0] or "/"

    def put(self, relpath: str, data: bytes, mime: str = "", etag_style: str = "quoted"):
        relpath = "/" + relpath.strip("/")
        new = relpath not in self.files
        self.files[relpath] = (data, mime, etag_style)
        if not new:
            return
        # register the file and any missing ancestor dirs bottom-up
        self._kid_files.setdefault(self._parent(relpath), set()).add(relpath)
        d = self._parent(relpath)
        while d != "/":
            parent = self._parent(d)
            kids = self._kid_dirs.setdefault(parent, set())
            if d in kids:
                break
            kids.add(d)
            self._kid_files.setdefault(d, set())
            self._kid_dirs.setdefault(d, set())
            d = parent

    def clear(self):
        """Empty the share (files AND directory indexes)."""
        self.__init__()

    def delete(self, relpath: str):
        relpath = "/" + relpath.strip("/")
        if self.files.pop(relpath, None) is None:
            return
        d = self._parent(relpath)
        self._kid_files[d].discard(relpath)
        # prune now-empty directories bottom-up (a dir exists only
        # while a file lives somewhere under it)
        while d != "/" and not self._kid_files[d] and not self._kid_dirs[d]:
            parent = self._parent(d)
            self._kid_dirs[parent].discard(d)
            del self._kid_files[d]
            del self._kid_dirs[d]
            d = parent

    def file_etag(self, relpath: str) -> str:
        data, _, style = self.files[relpath]
        raw = hashlib.md5(data).hexdigest()[:16]
        if style == "weak":
            return f'W/"{raw}"'
        if style == "bare":
            return raw
        return f'"{raw}"'

    def _subtree_files(self, dirpath: str) -> list[str]:
        out: list[str] = []
        stack = [dirpath]
        while stack:
            d = stack.pop()
            out.extend(self._kid_files.get(d, ()))
            stack.extend(self._kid_dirs.get(d, ()))
        return sorted(out)

    def dir_etag(self, dirpath: str) -> str:
        dirpath = "/" + dirpath.strip("/")
        h = hashlib.md5()
        for p in self._subtree_files(dirpath if dirpath != "/" else "/"):
            h.update(p.encode())
            h.update(self.file_etag(p).encode())
        return f'"{h.hexdigest()[:16]}"'

    def is_dir(self, relpath: str) -> bool:
        relpath = "/" + relpath.strip("/")
        return relpath == "/" or relpath in self._kid_dirs

    def children(self, dirpath: str):
        """Direct child (files, dirs) of dirpath."""
        dirpath = "/" + dirpath.strip("/")
        return (sorted(self._kid_files.get(dirpath, ())),
                sorted(self._kid_dirs.get(dirpath, ())))


def _response_xml(tree: WebDavTree, relpath: str, omit_displayname: bool) -> str:
    href = urllib.parse.quote(MOUNT + relpath)
    if tree.is_dir(relpath):
        name = relpath.rstrip("/").split("/")[-1] or "webdav"
        return f"""  <D:response>
    <D:href>{href}{'' if relpath == '/' else '/'}</D:href>
    <D:propstat>
      <D:prop>
        <D:displayname>{name}</D:displayname>
        <D:getetag>{tree.dir_etag(relpath)}</D:getetag>
        <D:resourcetype><D:collection/></D:resourcetype>
      </D:prop>
      <D:status>HTTP/1.1 200 OK</D:status>
    </D:propstat>
  </D:response>"""
    data, mime, _ = tree.files[relpath]
    name = relpath.split("/")[-1]
    display = "" if omit_displayname else f"<D:displayname>{name}</D:displayname>\n        "
    mime_el = f"<D:getcontenttype>{mime}</D:getcontenttype>\n        " if mime else ""
    return f"""  <D:response>
    <D:href>{href}</D:href>
    <D:propstat>
      <D:prop>
        {display}<D:getcontentlength>{len(data)}</D:getcontentlength>
        <D:getlastmodified>Mon, 17 Aug 2026 10:00:00 GMT</D:getlastmodified>
        {mime_el}<D:getetag>{tree.file_etag(relpath)}</D:getetag>
        <D:resourcetype/>
        <oc:fileid>{abs(hash(relpath)) % 99999}</oc:fileid>
        <oc:permissions>RGDNVW</oc:permissions>
      </D:prop>
      <D:status>HTTP/1.1 200 OK</D:status>
    </D:propstat>
    <D:propstat>
      <D:prop><D:creationdate/></D:prop>
      <D:status>HTTP/1.1 404 Not Found</D:status>
    </D:propstat>
  </D:response>"""


def make_handler(tree: WebDavTree, require_auth: str | None = None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _rel(self) -> str:
            path = urllib.parse.unquote(urllib.parse.urlparse(self.path).path)
            if path.startswith(MOUNT):
                path = path[len(MOUNT):]
            return "/" + path.strip("/")

        def _authorized(self) -> bool:
            if require_auth is None:
                return True
            return self.headers.get("Authorization", "") == require_auth

        def _deny(self):
            self.send_response(401)
            self.send_header("WWW-Authenticate", 'Basic realm="webdav"')
            self.end_headers()

        def do_OPTIONS(self):
            self.send_response(200)
            self.send_header("Allow", "OPTIONS, GET, HEAD, PROPFIND")
            self.send_header("DAV", "1, 2")
            self.end_headers()

        def do_PROPFIND(self):
            if not self._authorized():
                return self._deny()
            if self.headers.get("Content-Length"):
                self.rfile.read(int(self.headers["Content-Length"]))
            rel = self._rel()
            depth = self.headers.get("Depth", "1")
            if rel not in tree.files and not tree.is_dir(rel):
                self.send_response(404)
                self.end_headers()
                return
            parts = [_response_xml(tree, rel, omit_displayname=False)]
            if depth != "0" and tree.is_dir(rel):
                files, dirs = tree.children(rel)
                # omit displayname on every other file to exercise the
                # href-basename fallback
                for i, f in enumerate(files):
                    parts.append(_response_xml(tree, f, omit_displayname=i % 2 == 1))
                for d in dirs:
                    parts.append(_response_xml(tree, d, omit_displayname=False))
            body = (
                '<?xml version="1.0" encoding="utf-8"?>\n'
                '<D:multistatus xmlns:D="DAV:" xmlns:oc="http://owncloud.org/ns">\n'
                + "\n".join(parts)
                + "\n</D:multistatus>\n"
            ).encode()
            self.send_response(207)
            self.send_header("Content-Type", "application/xml; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if not self._authorized():
                return self._deny()
            rel = self._rel()
            if rel not in tree.files:
                self.send_response(404)
                self.end_headers()
                return
            data, mime, _ = tree.files[rel]
            self.send_response(200)
            self.send_header("Content-Type", mime or "application/octet-stream")
            self.send_header("ETag", tree.file_etag(rel))
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    return Handler


def start_server(tree: WebDavTree, require_auth: str | None = None):
    """Returns (base_url, shutdown_fn). base_url includes the mount."""
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(tree, require_auth))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}{MOUNT}"

    def shutdown():
        server.shutdown()
        server.server_close()

    return url, shutdown
