"""S5 HTTP upload API (webui ProcessSpec.scala:26-46 parity + extras)."""

import json
import threading
import urllib.request

import pytest

from schema_guru_spark.webui import process_upload, serve


def test_process_one_json_object():
    # ProcessSpec: {"referrer":"127.0.0.1","id":42} -> schema type object
    out = process_upload([("test.json", '{"referrer":"127.0.0.1", "id":42 }')])
    assert out["status"] == "processed"
    assert out["schema"]["type"] == "object"
    props = out["schema"]["properties"]
    assert props["referrer"]["format"] == "ipv4"
    assert props["id"]["type"] == "integer"
    assert out["errors"] == []


def test_ndjson_field_and_line_errors():
    out = process_upload([("data", '{"a": 1}\nnot json\n{"a": 2}')])
    assert out["schema"]["properties"]["a"]["type"] == "integer"
    assert len(out["errors"]) == 1
    err = out["errors"][0]
    assert err["file"] == "data"
    assert "on line 1" in err["error"]  # 0-based like the reference


def test_enum_cardinality_field():
    docs = [("d%d.json" % i, json.dumps({"k": v}))
            for i, v in enumerate(["a", "b", "c"])]
    out = process_upload(docs + [("enumCardinality", "5")])
    assert sorted(out["schema"]["properties"]["k"]["enum"]) == ["a", "b", "c"]
    # cutoff below observed cardinality -> enum dropped
    out2 = process_upload(docs + [("enumCardinality", "2")])
    assert "enum" not in out2["schema"]["properties"]["k"]


def test_duplicate_keys_warning():
    out = process_upload([
        ("a.json", '{"userName": 1}'), ("b.json", '{"user_name": 2}')])
    assert out["warning"]["message"] == "Possibly duplicated keys found"
    assert set(out["warning"]["items"]) == {"userName", "user_name"}


def test_scalar_top_level_rejected():
    out = process_upload([("n.json", "42")])
    assert any("unacceptable" in e.get("error", "") for e in out["errors"])


@pytest.fixture(scope="module")
def server():
    httpd = serve(0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _multipart(fields):
    boundary = "XBOUNDARYX"
    parts = []
    for name, content in fields:
        parts.append(
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="{name}"\r\n\r\n'
            f"{content}\r\n")
    body = ("".join(parts) + f"--{boundary}--\r\n").encode()
    return body, f"multipart/form-data; boundary={boundary}"


def test_http_upload_end_to_end(server):
    body, ctype = _multipart(
        [("test.json", '{"referrer":"127.0.0.1", "id":42 }')])
    req = urllib.request.Request(
        f"{server}/upload", data=body,
        headers={"Content-Type": ctype}, method="POST")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
        assert resp.headers["Access-Control-Allow-Origin"] == "*"
        out = json.load(resp)
    assert out["schema"]["type"] == "object"


def test_http_unknown_path_404(server):
    req = urllib.request.Request(f"{server}/nope", data=b"", method="POST")
    try:
        urllib.request.urlopen(req)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_http_index_served(server):
    with urllib.request.urlopen(f"{server}/") as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/html")
        body = resp.read().decode()
    assert "schema-guru" in body


def test_static_tree_served_with_mime_types(server):
    # reference parity: the webui serves a static asset tree
    # (webui/src/main/resources/web) — ours is webui_static/, original
    # implementation, correct Content-Type per extension
    for path, ctype, marker in [
        ("/index.html", "text/html", "schema-guru"),
        ("/css/main.css", "text/css", "grid"),
        ("/js/app.js", "text/javascript", "/upload"),
    ]:
        with urllib.request.urlopen(f"{server}{path}") as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith(ctype), \
                (path, resp.headers["Content-Type"])
            assert marker in resp.read().decode()


def test_static_404_and_traversal_guard(server):
    import urllib.error
    for path in ["/nope.css", "/../webui.py", "/..%2fwebui.py",
                 "/%2e%2e/webui.py"]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{server}{path}")
        assert ei.value.code == 404, path
    # percent-encoded names of REAL files must resolve (r03 review):
    # css%2Fmain.css decodes to the existing css/main.css
    with urllib.request.urlopen(f"{server}/css%2Fmain.css") as resp:
        assert resp.status == 200


def test_pure_api_mode_serves_inline_page():
    import threading
    from schema_guru_spark.webui import serve as _serve
    httpd = _serve(0, static_dir=None)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/"
        with urllib.request.urlopen(url) as resp:
            body = resp.read().decode()
        assert "/upload" in body and "<form" in body
    finally:
        httpd.shutdown()
