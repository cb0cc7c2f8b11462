"""Contract tests for the JS client SDK (``clients/js/index.mjs``).

The build image has no JS runtime (ROADMAP.md, re-verified round 4), so
the JS client is validated the way the reference validates its WASM
build without a browser: by pinning its wire behavior.

- ``clients/js/fixtures.json`` records the EXACT request body each JS
  method serializes (defaults included, nulls dropped); this module
  replays every exchange against a live ``EngineServer`` and asserts
  the responses, so the pinned contract is known-good against the real
  server.
- Static cross-checks tie the JS *source* to that contract: every
  endpoint string in ``index.mjs`` must exist in the server's routing
  table, every snake_case body field the JS emits must be read by a
  server handler, and every fixture body key must appear in the JS
  source (so fixtures can't drift from the code they pin).

Reference role: ``npm/src/index.ts:46-85`` — the reference's only
non-Python L7 surface (typed errors + engine loading); here the JS
surface is the HTTP client with typed errors + idempotent retries.
"""

import json
import re
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pytest

from muninn_tpu.serve import EngineServer

JS_DIR = Path(__file__).resolve().parent.parent / "clients" / "js"
JS_SRC = (JS_DIR / "index.mjs").read_text()
FIXTURES = json.loads((JS_DIR / "fixtures.json").read_text())


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _assert_expect(expect, got, ctx):
    """Subset assertions with the fixture file's relaxation forms."""
    if "min_len" in expect:
        assert len(got) >= expect["min_len"], (ctx, got)
        expect = {k: v for k, v in expect.items() if k != "min_len"}
    if "contains_key" in expect:
        assert expect["contains_key"] in got, (ctx, got)
        expect = {k: v for k, v in expect.items() if k != "contains_key"}
    for key, want in expect.items():
        assert key in got, (ctx, key, got)
        val = got[key]
        if isinstance(want, dict) and "approx" in want:
            assert abs(val - want["approx"]) <= want["tol"], (ctx, key, val)
        elif isinstance(want, dict) and "row0_col0" in want:
            assert val[0][0] == want["row0_col0"], (ctx, key, val)
        elif isinstance(want, dict) and "row0_col0_approx" in want:
            assert abs(val[0][0] - want["row0_col0_approx"]) <= want["tol"], (
                ctx, key, val,
            )
        else:
            assert val == want, (ctx, key, val, want)


def test_js_fixture_exchanges_replay_against_live_server(tmp_path):
    """Replaying the JS client's canned exchanges in order against a
    real server yields the pinned responses — the full session a JS
    caller would run (create/insert/search/delete/save/load/tune +
    graph create/query ops + typed-error paths)."""
    srv = EngineServer(coalesce_window=0.0)
    port = srv.start(port=0)

    def sub(x):
        if isinstance(x, str):
            return x.replace("{tmp}", str(tmp_path))
        if isinstance(x, dict):
            return {k: sub(v) for k, v in x.items()}
        if isinstance(x, list):
            return [sub(v) for v in x]
        return x

    try:
        for ex in FIXTURES["exchanges"]:
            st, resp = _post(port, ex["path"], sub(ex["body"]))
            assert st == 200, (ex["js"], st, resp)
            _assert_expect(sub(ex["expect"]), resp, ex["js"])
        for ex in FIXTURES["get_exchanges"]:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{ex['path']}", timeout=30
            ) as r:
                assert r.status == 200, ex["js"]
                resp = json.loads(r.read())
            _assert_expect(ex["expect"], resp, ex["js"])
        for ex in FIXTURES["error_exchanges"]:
            st, resp = _post(port, ex["path"], sub(ex["body"]))
            assert st == ex["expect_status"], (ex["js"], st, resp)
            assert "error" in resp, (ex["js"], resp)
    finally:
        srv.stop()


def test_js_source_endpoints_exist_on_server():
    """Every endpoint path the JS source requests is served: POST paths
    must be in the routing table, GET /health is special-cased, and the
    retryable IDEMPOTENT list may only name known-idempotent paths."""
    import muninn_tpu.serve as serve_mod

    server_src = Path(serve_mod.__file__).read_text()
    routes = set(re.findall(r'"(/(?:index|graph)/\w+)":', server_src))
    assert routes, "could not parse the server routing table"

    js_paths = set(re.findall(r'_request\(\s*"(/[\w/]+)"', JS_SRC))
    assert js_paths, "could not parse endpoints from index.mjs"
    GET_PATHS = {"/health", "/stats", "/index/list"}  # do_GET routes
    for p in js_paths - GET_PATHS:
        assert p in routes, f"JS requests unknown endpoint {p}"
    for p in GET_PATHS & js_paths:
        assert f'"{p}"' in Path(serve_mod.__file__).read_text()

    # the JS retry allowlist must match the Python SDK's exactly — a
    # divergence would retry mutations in one SDK but not the other
    from muninn_tpu.client import EngineClient as PyClient

    decl = JS_SRC.split("static IDEMPOTENT = [")[1].split("]")[0]
    js_idem = set(re.findall(r'"(/[\w/]+)"', decl))
    assert js_idem == set(PyClient._IDEMPOTENT), (js_idem, PyClient._IDEMPOTENT)


def test_js_body_fields_are_read_by_server():
    """Every snake_case wire field the JS client emits is consumed by a
    server handler (catches field-name typos without executing JS)."""
    import muninn_tpu.serve as serve_mod

    server_src = Path(serve_mod.__file__).read_text()
    read_fields = set(
        re.findall(r'body(?:\.get\(|\[)"(\w+)"', server_src)
    )
    # snake_case keys in JS object literals (wire fields are snake_case
    # by convention; camelCase never crosses the wire)
    js_fields = {
        f for f in re.findall(r"(\w+_\w+):", JS_SRC)
    }
    assert js_fields, "could not parse wire fields from index.mjs"
    unknown = js_fields - read_fields
    assert not unknown, f"JS emits fields the server never reads: {unknown}"


def test_fixture_bodies_match_js_source():
    """Every key in every fixture body appears in the JS source (as a
    literal field or shorthand), so fixtures can't pin a contract the
    code doesn't implement; and each fixture's path is requested
    somewhere in the JS source."""
    js_paths = set(re.findall(r'_request\(\s*"(/[\w/]+)"', JS_SRC))
    for ex in FIXTURES["get_exchanges"]:
        assert ex["path"] in js_paths, ex["path"]
    for ex in FIXTURES["exchanges"] + FIXTURES["error_exchanges"]:
        assert ex["path"] in js_paths, ex["path"]
        for key in ex["body"]:
            assert re.search(rf"\b{key}\b", JS_SRC), (
                f"fixture field {key!r} absent from index.mjs", ex["js"],
            )


def test_js_typed_error_classes_mirror_python_sdk():
    """The JS error taxonomy is the Python SDK's: a base class plus
    request (4xx, never retried), server (5xx, retried), connection
    (retried) — with 4xx raised eagerly and 5xx/connection retried only
    on idempotent paths (verified structurally in the source)."""
    for cls in ("MuninnClientError", "MuninnRequestError",
                "MuninnServerError", "MuninnConnectionError"):
        assert f"export class {cls}" in JS_SRC, cls
    # 4xx throw is immediate (inside the loop, before retry bookkeeping)
    assert "if (resp.status < 500) throw new MuninnRequestError" in JS_SRC
    # mutations never retry
    assert "const retries = idempotent ? this.retries : 0;" in JS_SRC
