"""Network-backed object-store implementation of the storage contract.

``S3ObjectStorage`` speaks the S3 REST subset the engine's restricted
primitive set needs — all publicly documented protocol:

* conditional create: ``PUT`` with ``If-None-Match: *`` (supported by
  AWS S3 since 2024, and by MinIO/R2/GCS-interop endpoints), failing
  with HTTP 412 when the key exists → ``FileExistsError``;
* plain atomic ``PUT`` for last-writer-wins data publication (a 200
  response IS the durability barrier);
* ``DELETE`` for control-file reclamation (lease steal, ack rewind);
* ``GET`` / list-objects-v2 for reads and key listing.

The client is stdlib-only (http.client); it targets IAM-less /
pre-signed-proxy endpoints. Production AWS adds SigV4 signing on top of
the same verbs — orthogonal to the contract and deliberately out of
scope here (credential plumbing, not storage semantics).

CONTROL-PLANE AUTHORITY LIVES IN THE BUCKET: exclusivity is enforced by
the service's conditional PUT, not by anything local. Because the
engine's DATA PLANE reads files through POSIX paths (pyarrow/ray
read_parquet), every successful remote publish is also materialized at
the local path — a write-through cache of the bucket. On one node that
cache is always complete; a multi-node deployment points the read side
at the bucket via an Arrow/fsspec S3 filesystem (read-side plumbing,
no change to this write-side contract).

``MiniS3Server`` is an in-process test double implementing exactly that
REST subset with correct conditional-PUT atomicity (one lock around the
keyspace) so the contract tests exercise real HTTP round-trips.
"""

from __future__ import annotations

import http.client
import os
import threading
import urllib.parse


class S3ClientError(RuntimeError):
    pass


class S3AmbiguousError(S3ClientError):
    """The connection died after the request may have reached the server:
    the outcome is unknown. Raised instead of blind-retrying for
    NON-idempotent requests (the conditional PUT) — a blind resend of a
    conditional PUT that was actually applied turns a WON fence claim
    into a false 412/FileExistsError."""


class S3Client:
    """Minimal S3-protocol client (path-style addressing, stdlib-only).

    One ``http.client`` connection per thread (the engine calls storage
    from many Ray workers — each worker process builds its own client).
    """

    def __init__(self, endpoint: str, bucket: str, timeout: float = 30.0):
        u = urllib.parse.urlparse(endpoint)
        if u.scheme != "http":
            raise ValueError(
                f"only http endpoints supported (got {endpoint!r}); "
                "terminate TLS at a proxy or extend with ssl context"
            )
        self.host = u.hostname
        self.port = u.port or 80
        self.bucket = bucket
        self.timeout = timeout
        self._local = threading.local()

    def _conn(self) -> http.client.HTTPConnection:
        c = getattr(self._local, "conn", None)
        if c is None:
            c = http.client.HTTPConnection(self.host, self.port, timeout=self.timeout)
            self._local.conn = c
        return c

    def _request(self, method, path, body=None, headers=None, retry=True):
        c = self._conn()
        try:
            c.request(method, path, body=body, headers=headers or {})
            r = c.getresponse()
            data = r.read()
        except (http.client.HTTPException, ConnectionError, OSError) as e:
            # stale keep-alive: rebuild the connection once. Only
            # idempotent requests (GET/DELETE/plain PUT) may be blindly
            # resent — a conditional PUT must resolve the ambiguity at
            # the caller (read-back compare in put_object).
            c.close()
            self._local.conn = None
            if not retry:
                raise S3AmbiguousError(f"{method} {path}: {e!r}") from e
            if hasattr(body, "seek"):
                body.seek(0)
            c = self._conn()
            c.request(method, path, body=body, headers=headers or {})
            r = c.getresponse()
            data = r.read()
        return r.status, data

    def _key_path(self, key: str) -> str:
        return f"/{self.bucket}/" + urllib.parse.quote(key)

    def put_object(self, key: str, data, if_none_match: bool = False) -> None:
        """``data`` is bytes, or (plain PUTs only) a seekable binary file
        object — streamed as the request body, never slurped."""
        if hasattr(data, "read"):
            if if_none_match:
                raise TypeError("conditional PUT requires bytes (read-back compare)")
            length = os.fstat(data.fileno()).st_size
        else:
            length = len(data)
        headers = {"Content-Length": str(length)}
        if not if_none_match:
            status, body = self._request("PUT", self._key_path(key), data, headers)
        else:
            headers["If-None-Match"] = "*"
            for _ in range(3):
                try:
                    status, body = self._request(
                        "PUT", self._key_path(key), data, headers, retry=False
                    )
                    break
                except S3AmbiguousError:
                    # the conditional PUT may or may not have been
                    # applied — read back and compare instead of
                    # resending blind
                    try:
                        existing = self.get_object(key)
                    except FileNotFoundError:
                        continue  # definitely not applied: safe to resend
                    if existing == data:
                        return  # our write was the one applied: we WON
                    raise FileExistsError(key) from None
            else:
                raise S3ClientError(f"PUT {key}: repeated connection failures")
        if status == 412 or (status == 409 and if_none_match):
            # 412 PreconditionFailed (S3/MinIO); 409 ConditionalRequestConflict
            # (S3 under concurrent conditional writes) — both mean "exists
            # or being created": the caller lost the claim
            raise FileExistsError(key)
        if status not in (200, 204):
            raise S3ClientError(f"PUT {key}: HTTP {status} {body[:200]!r}")

    def get_object(self, key: str) -> bytes:
        status, body = self._request("GET", self._key_path(key))
        if status == 404:
            raise FileNotFoundError(key)
        if status != 200:
            raise S3ClientError(f"GET {key}: HTTP {status}")
        return body

    def delete_object(self, key: str) -> None:
        status, _ = self._request("DELETE", self._key_path(key))
        if status not in (200, 204, 404):
            raise S3ClientError(f"DELETE {key}: HTTP {status}")

    def list_keys(self, prefix: str = "", page_size: int = 1000) -> list[str]:
        """Full listing across ListObjectsV2 pages — a real endpoint caps
        each response at ~1000 keys; truncation must be followed, not
        silently returned as a complete listing."""
        import re

        out: list[str] = []
        token: str | None = None
        while True:
            params = {
                "list-type": "2",
                "prefix": prefix,
                "max-keys": str(page_size),
            }
            if token:
                params["continuation-token"] = token
            q = urllib.parse.urlencode(params)
            status, body = self._request("GET", f"/{self.bucket}?{q}")
            if status != 200:
                raise S3ClientError(f"LIST {prefix}: HTTP {status}")
            out.extend(
                urllib.parse.unquote(m.decode())
                for m in re.findall(rb"<Key>([^<]*)</Key>", body)
            )
            if not re.search(rb"<IsTruncated>true</IsTruncated>", body):
                return out
            m = re.search(
                rb"<NextContinuationToken>([^<]*)</NextContinuationToken>", body
            )
            if not m:
                raise S3ClientError(
                    f"LIST {prefix}: truncated page without continuation token"
                )
            token = urllib.parse.unquote(m.group(1).decode())


class S3ObjectStorage:
    """The storage contract over an S3-compatible endpoint (see module
    docstring: bucket-authoritative fence, write-through local cache
    for the POSIX-reading data plane)."""

    def __init__(self, client: S3Client):
        self.client = client

    @staticmethod
    def _key_of(path: str) -> str:
        # mirror the absolute local path as the object key (one table
        # root == one key prefix), so local and bucket layouts align
        return os.path.abspath(path).lstrip("/")

    def sync_dir(self, path: str) -> None:
        pass  # the PUT ack is the durability barrier

    def commit_bytes_exclusive(self, path: str, data: bytes) -> None:
        # the SERVICE arbitrates exclusivity: exactly one conditional
        # PUT of this key ever succeeds, across every node and process
        key = self._key_of(path)
        try:
            self.client.put_object(key, data, if_none_match=True)
        except FileExistsError:
            # Lost the fence — possibly to a previous attempt of this
            # same table that died AFTER its bucket PUT but BEFORE its
            # local write-through. Heal the local cache from the
            # authoritative bucket copy so the resume path sees the
            # committed epoch instead of wedging on 412 forever, then
            # report the lost fence as usual.
            if not os.path.exists(path):
                committed = self.client.get_object(key)
                self._write_local(path, committed)
            raise
        # write-through local materialization for POSIX readers; the
        # bucket copy is authoritative, so a plain replace is safe (all
        # local writers hold identical committed bytes)
        self._write_local(path, data)

    @staticmethod
    def _write_local(path: str, data: bytes) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = path + f".s3tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def publish_file(self, tmp_path: str, final_path: str, durable: bool) -> None:
        # stream the file as the request body — a full epoch delta can
        # be hundreds of MB; slurping it would double peak worker memory
        with open(tmp_path, "rb") as f:
            self.client.put_object(self._key_of(final_path), f)
        os.replace(tmp_path, final_path)

    def delete_control(self, path: str) -> None:
        self.client.delete_object(self._key_of(path))
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass


def from_env() -> S3ObjectStorage:
    """Build the backend from XGEO_S3_ENDPOINT / XGEO_S3_BUCKET (read in
    the driver and every worker, like XGEO_STORAGE itself)."""
    endpoint = os.environ.get("XGEO_S3_ENDPOINT")
    bucket = os.environ.get("XGEO_S3_BUCKET", "xgeo")
    if not endpoint:
        raise ValueError("XGEO_STORAGE=s3 requires XGEO_S3_ENDPOINT")
    return S3ObjectStorage(S3Client(endpoint, bucket))


# --------------------------------------------------------------------------
# test double: an in-process S3-subset server


class MiniS3Server:
    """Threaded HTTP server implementing the S3 REST subset above with
    correct conditional-PUT semantics (atomic under one lock) — the
    network peer for contract tests. NOT a production server."""

    def __init__(self):
        import http.server

        objects: dict[str, bytes] = {}
        lock = threading.Lock()
        self.objects = objects

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def _split(self):
                u = urllib.parse.urlparse(self.path)
                parts = u.path.lstrip("/").split("/", 1)
                bucket = parts[0]
                key = urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""
                return bucket, key, urllib.parse.parse_qs(u.query)

            def _reply(self, status, body=b"", headers=None):
                self.send_response(status)
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_PUT(self):
                _, key, _ = self._split()
                n = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(n)
                with lock:
                    if self.headers.get("If-None-Match") == "*" and key in objects:
                        self._reply(412, b"<Error>PreconditionFailed</Error>")
                        return
                    objects[key] = data
                self._reply(200, headers={"ETag": '"x"'})

            def do_GET(self):
                bucket, key, q = self._split()
                if not key and "list-type" in q:
                    prefix = q.get("prefix", [""])[0]
                    maxk = int(q.get("max-keys", ["1000"])[0])
                    token = q.get("continuation-token", [None])[0]
                    with lock:
                        keys = sorted(k for k in objects if k.startswith(prefix))
                    if token:
                        keys = [k for k in keys if k > token]
                    page, rest = keys[:maxk], keys[maxk:]
                    nxt = (
                        f"<NextContinuationToken>{page[-1]}"
                        "</NextContinuationToken>"
                        if rest
                        else ""
                    )
                    body = (
                        "<ListBucketResult>"
                        + f"<IsTruncated>{'true' if rest else 'false'}"
                        "</IsTruncated>"
                        + nxt
                        + "".join(f"<Contents><Key>{k}</Key></Contents>" for k in page)
                        + "</ListBucketResult>"
                    ).encode()
                    self._reply(200, body)
                    return
                with lock:
                    data = objects.get(key)
                if data is None:
                    self._reply(404, b"<Error>NoSuchKey</Error>")
                else:
                    self._reply(200, data)

            def do_DELETE(self):
                _, key, _ = self._split()
                with lock:
                    objects.pop(key, None)
                self._reply(204)

        self._httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.endpoint = f"http://127.0.0.1:{self._httpd.server_port}"
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()
