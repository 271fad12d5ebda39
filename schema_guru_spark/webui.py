"""HTTP upload API — S5 of SURVEY.md §2 (webui module of the reference).

POST /upload with multipart form data; each field is a JSON file (field
name ending ``.json`` -> one document) or NDJSON (any other name -> one
document per line); a field named ``enumCardinality`` sets the enum
cutoff (SchemaGuruRoutes.scala:35-59, HttpJsonGetters.scala:44-56,
HttpOptionsGetter.scala:23-33). Response:

    {"status": "processed", "schema": {...}, "errors": [...],
     "warning": {"message": "Possibly duplicated keys found",
                 "items": [a1, b1, a2, b2, ...]} | null}

(SchemaGuruWarnings.scala:48-56 flattens duplicate pairs into one
array.) Stdlib only — http.server + email multipart parsing; the static
asset routes of the reference are not reproduced (the API is the
surface users script against). Driver-scale only, like the reference:
uploads are bounded by the request body, never a cluster job.
"""

from __future__ import annotations

import email
import email.policy
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple

from schema_guru_spark.core.context import SchemaContext
from schema_guru_spark.core.levenshtein import get_duplicates
from schema_guru_spark.core.microschema import ZERO, derive, merge, render
from schema_guru_spark.core.transforms import apply_transforms, extract_keys


def _parse_single(name: str, content: str) -> List[Tuple[Optional[dict], Optional[dict]]]:
    """One .json field -> one (value, error) (HttpJsonGetters.scala:65-78)."""
    try:
        return [(json.loads(content), None)]
    except ValueError as e:
        return [(None, {"file": name,
                        "error": "File contents failed to parse into JSON",
                        "message": str(e)})]


def _parse_ndjson(name: str, content: str) -> List[Tuple[Optional[dict], Optional[dict]]]:
    """NDJSON field -> one doc per line (HttpJsonGetters.scala:97-112);
    line numbers are 0-based like the reference's zipWithIndex."""
    out = []
    for i, line in enumerate(content.split("\n")):
        try:
            out.append((json.loads(line), None))
        except ValueError as e:
            out.append((None, {
                "file": name,
                "error": f"File contents failed to parse into JSON on line {i}",
                "message": str(e)}))
    return out


def process_upload(fields: List[Tuple[str, str]]) -> dict:
    """The /upload pipeline (SchemaGuruRoutes.scala:40-55): split
    parse errors, derive + merge + transform, Levenshtein warning.

    ``fields`` is the ordered multipart form as (name, content) pairs.
    quantity = total field count, matching the reference's
    ``formData.fields.length`` (enumCardinality included).
    """
    cardinality = 0
    for name, content in fields:
        if name == "enumCardinality":
            try:
                cardinality = int(content.strip())
            except ValueError:
                cardinality = 0
    ctx = SchemaContext.make(cardinality, quantity=len(fields))

    parsed: List[Tuple[Optional[dict], Optional[dict]]] = []
    for name, content in fields:
        if name == "enumCardinality":
            continue
        if name.endswith(".json"):
            parsed.extend(_parse_single(name, content))
        else:
            parsed.extend(_parse_ndjson(name, content))

    errors = [err for _, err in parsed if err is not None]
    acc = ZERO
    for value, err in parsed:
        if err is not None:
            continue
        schema, derive_err = derive(value, ctx)
        if derive_err is not None:
            errors.append({"error": derive_err})
        else:
            acc = merge(acc, schema, ctx)

    final = apply_transforms(acc, ctx)
    dups = sorted(get_duplicates(extract_keys(final)))
    warning = None
    if dups:
        items: List[str] = []
        for a, b in dups:
            items.extend([a, b])
        warning = {"message": "Possibly duplicated keys found",
                   "items": items}
    return {
        "status": "processed",
        "schema": render(final, ctx),
        "errors": errors,
        "warning": warning,
    }


def _parse_multipart(content_type: str, body: bytes) -> List[Tuple[str, str]]:
    """Multipart form -> ordered (field_name, content) pairs."""
    msg = email.message_from_bytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body,
        policy=email.policy.default)
    fields = []
    for part in msg.iter_parts():
        name = (part.get_param("name", header="content-disposition")
                or part.get_filename() or "unknown")
        payload = part.get_payload(decode=True)
        fields.append((str(name), (payload or b"").decode("utf-8", "replace")))
    return fields


_INDEX_HTML = b"""<!doctype html>
<html><head><title>schema-sentry</title></head><body>
<h1>schema-sentry</h1>
<p>POST JSON files (multipart) to <code>/upload</code>; field name
ending in <code>.json</code> = one document, any other name = NDJSON,
optional <code>enumCardinality</code> field sets the enum cutoff.</p>
<form action="/upload" method="post" enctype="multipart/form-data">
  <input type="file" name="file.json">
  <input type="text" name="enumCardinality" placeholder="enum cardinality">
  <button type="submit">derive schema</button>
</form>
</body></html>
"""


class SchemaGuruHandler(BaseHTTPRequestHandler):
    # static tree root (SchemaGuruRoutes.scala:62-75 serves
    # resources/web); None falls back to the minimal inline page
    static_dir: Optional[str] = None

    def do_GET(self):  # noqa: N802 (http.server API)
        if self.static_dir is not None:
            self._serve_static()
            return
        if self.path not in ("/", "/index.html"):
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(_INDEX_HTML)))
        self.end_headers()
        self.wfile.write(_INDEX_HTML)

    def _serve_static(self):
        import mimetypes
        import os
        import urllib.parse

        # decode BEFORE the containment check: percent-encoded names
        # must resolve (browsers encode spaces/UTF-8), and an encoded
        # ../ must still be caught by the realpath guard below
        rel = urllib.parse.unquote(
            self.path.split("?", 1)[0]).lstrip("/") or "index.html"
        # traversal guard: resolve and require containment in the root
        root = os.path.realpath(self.static_dir)
        full = os.path.realpath(os.path.join(root, rel))
        if full != root and not full.startswith(root + os.sep):
            self.send_error(404)
            return
        if os.path.isdir(full):
            full = os.path.join(full, "index.html")
        if not os.path.isfile(full):
            self.send_error(404)
            return
        ctype = mimetypes.guess_type(full)[0] or "application/octet-stream"
        if ctype.startswith("text/") or ctype in (
                "application/javascript", "application/json"):
            ctype += "; charset=utf-8"
        with open(full, "rb") as f:
            payload = f.read()
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_POST(self):  # noqa: N802 (http.server API)
        if self.path != "/upload":
            self.send_error(404)
            return
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        try:
            fields = _parse_multipart(
                self.headers.get("Content-Type", ""), body)
            result = process_upload(fields)
            payload = json.dumps(result).encode()
            self.send_response(200)
        except Exception as e:  # malformed multipart -> 400, never a crash
            payload = json.dumps({"status": "error", "message": str(e)}).encode()
            self.send_response(400)
        self.send_header("Content-Type", "application/json")
        # CORS parity: Access-Control-Allow-Origin(AllOrigins),
        # SchemaGuruRoutes.scala:38
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, fmt, *args):  # quiet by default
        pass


def default_static_dir() -> Optional[str]:
    """The packaged static web app (webui_static/ next to this module),
    or None when absent — mirrors the reference's resources/web tree
    (original implementation, not a copy of the reference's JSX app)."""
    import os
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "webui_static")
    return d if os.path.isdir(d) else None


def serve(port: int = 8000,
          static_dir: Optional[str] = "auto") -> ThreadingHTTPServer:
    """Start the API server (non-blocking handle; call
    ``serve_forever`` or use in tests with a thread).

    ``static_dir``: "auto" serves the packaged webui_static/ tree when
    present; a path serves that tree; None forces the minimal inline
    page (pure-API mode)."""
    resolved = default_static_dir() if static_dir == "auto" else static_dir

    class Handler(SchemaGuruHandler):
        pass

    Handler.static_dir = resolved
    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--static-dir", default="auto",
                    help="static asset root; 'auto' uses the packaged "
                         "webui_static/, 'none' disables static serving")
    args = ap.parse_args()
    sd = None if args.static_dir == "none" else args.static_dir
    httpd = serve(args.port, static_dir=sd)
    print(f"schema-guru webui API on http://127.0.0.1:{args.port}/upload")
    httpd.serve_forever()
