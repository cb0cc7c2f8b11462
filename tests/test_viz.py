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


def test_page_interaction_script():
    """No browser runtime exists in this image (the reference uses
    Playwright), so validate the embedded page statically: the
    selection/search UI is present, every element the script queries
    exists in the DOM, and the script's brackets are balanced."""
    import re

    from viz.server import _PAGE

    # interaction surface: detail panel, search box, click handler
    for frag in ("id=\"detail\"", "id=\"search\"",
                 "addEventListener('click'", "function select("):
        assert frag in _PAGE, frag
    # every getElementById target has a matching id= in the markup
    for eid in set(re.findall(r"getElementById\('([^']+)'\)", _PAGE)):
        assert f'id="{eid}"' in _PAGE, eid
    # bracket balance over the whole script (catches editing typos;
    # string literals in the page contain no brackets)
    script = _PAGE.split("<script>")[1].split("</script>")[0]
    for o, c in ("{}", "()", "[]"):
        assert script.count(o) == script.count(c), (o, c)


def test_embed_payload_endpoints(rng):
    """Embedding-projection payloads (reference viz/server/embed.py:
    /embed/:table_id shape: table_id, count, points with id/x/y/z/
    label/category)."""
    import json
    import urllib.request

    import numpy as np

    from muninn_tpu.graph import Graph
    from viz.server import VizServer

    g = Graph.from_edges(["a", "b", "c"], ["b", "c", "a"])
    # two separable clusters in 8-d
    v = np.concatenate([
        rng.normal(0, 0.1, (20, 8)) + np.array([3.0] + [0.0] * 7),
        rng.normal(0, 0.1, (20, 8)) - np.array([3.0] + [0.0] * 7),
    ]).astype(np.float32)
    labels = [f"doc {i} " + "x" * 200 for i in range(40)]
    cats = ["A"] * 20 + ["B"] * 20
    srv = VizServer(g, embeddings={"chunks": (labels, v, cats)})
    port = srv.start(port=0)
    try:
        base = f"http://127.0.0.1:{port}"
        tables = json.load(urllib.request.urlopen(f"{base}/api/embed"))
        assert tables["tables"] == ["chunks"]
        p = json.load(urllib.request.urlopen(f"{base}/api/embed/chunks"))
        assert p["table_id"] == "chunks" and p["count"] == 40
        pt = p["points"][0]
        assert {"id", "x", "y", "z", "label", "category"} <= set(pt)
        assert len(pt["label"]) <= 120
        # PCA separates the two planted clusters on the first axis
        xs = np.array([q["x"] for q in p["points"]])
        assert (xs[:20] > 0).all() != (xs[20:] > 0).all()
        assert abs(xs[:20].mean() - xs[20:].mean()) > 3
        # unknown table -> 404
        import urllib.error
        try:
            urllib.request.urlopen(f"{base}/api/embed/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # page advertises the embed view
        html = urllib.request.urlopen(base).read().decode()
        assert "api/embed" in html and "drawEmbed" in html
    finally:
        srv.stop()
