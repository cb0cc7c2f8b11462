"""Viz server e2e over HTTP (the reference has Playwright e2e for its
FastAPI+React viz; here the server is stdlib and tested with urllib)."""

import json
import urllib.request

from muninn_tpu.graph import Graph
from viz.server import VizServer


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return r.status, r.read()


def test_viz_server_endpoints():
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e")]
    g = Graph.from_edges(*zip(*edges))
    srv = VizServer(g)
    port = srv.start(port=0)
    try:
        status, body = _get(port, "/")
        assert status == 200 and b"muninn-tpu graph" in body

        status, body = _get(port, "/api/stats")
        stats = json.loads(body)
        assert stats["nodes"] == 5 and stats["edges"] == 4
        assert stats["communities"] >= 2

        status, body = _get(port, "/api/graph?min_degree=0")
        payload = json.loads(body)
        assert len(payload["nodes"]) == 5
        assert len(payload["edges"]) == 4
        n0 = payload["nodes"][0]
        assert {"id", "degree", "centrality", "community"} <= set(n0)

        # min_degree filter drops the d-e pair (degree 1)
        status, body = _get(port, "/api/graph?min_degree=2")
        payload = json.loads(body)
        assert {n["id"] for n in payload["nodes"]} == {"a", "b", "c"}
    finally:
        srv.stop()
