"""Knowledge-graph visualization server.

The reference ships a FastAPI server + React/cytoscape frontend
(``viz/server/main.py``, ``viz/frontend/``) serving KG/embedding
payloads from demo DBs with betweenness-cached node sizing and
min-degree filtering. This equivalent is dependency-free (stdlib
``http.server``) and TPU-backed: payloads are computed by the
muninn-tpu graph engine (degree/betweenness/communities) and rendered
by an embedded single-file canvas force-layout page.

Usage:
    from viz.server import VizServer
    srv = VizServer(graph)           # a muninn_tpu Graph
    srv.serve(port=8787)             # blocking; or srv.start() in a thread

Endpoints:
    GET /            -> HTML page
    GET /api/graph?min_degree=N -> {"nodes": [...], "edges": [...]}
    GET /api/stats   -> counts + modularity
    GET /api/embed   -> {"tables": [...]}
    GET /api/embed/<name> -> {"table_id", "count", "points": [{id, x,
        y, z, label, category}]} — the reference's 3D scatter payload
        (``viz/server/embed.py:20-36``), except the projection is a 3D
        PCA computed on the TPU (the reference precomputes UMAP into
        SQLite offline; here any registered embedding matrix projects
        on demand).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

LABEL_MAX_CHARS = 120  # reference viz/server/embed.py:15

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>muninn-tpu graph</title>
<style>
 body { margin:0; background:#111; color:#ddd; font:13px sans-serif; }
 #bar { padding:8px 12px; background:#1b1b1b; }
 canvas { display:block; }
</style></head>
<body>
<div id="bar">muninn-tpu graph viewer — <span id="stats"></span>
 &nbsp; min degree <input id="mind" type="number" value="0" min="0" style="width:4em">
 &nbsp; view <select id="view"><option value="graph">graph</option></select>
 &nbsp; find <input id="search" placeholder="node id" style="width:8em">
 &nbsp; <span id="detail"></span>
</div>
<canvas id="c"></canvas>
<script>
const cv = document.getElementById('c'), cx = cv.getContext('2d');
let nodes = [], edges = [], byId = {};
const palette = ['#4fc3f7','#ffb74d','#aed581','#f06292','#ba68c8',
                 '#fff176','#4db6ac','#e57373','#90a4ae','#7986cb'];
function resize(){ cv.width = innerWidth; cv.height = innerHeight - 40; }
addEventListener('resize', resize); resize();
async function load(){
  const mind = document.getElementById('mind').value || 0;
  const g = await (await fetch('/api/graph?min_degree=' + mind)).json();
  const s = await (await fetch('/api/stats')).json();
  document.getElementById('stats').textContent =
    `${s.nodes} nodes, ${s.edges} edges, ${s.communities} communities, Q=${s.modularity.toFixed(3)}`;
  nodes = g.nodes; edges = g.edges; byId = {};
  nodes.forEach(n => { n.x = Math.random()*cv.width; n.y = Math.random()*cv.height;
                       n.vx = 0; n.vy = 0; byId[n.id] = n; });
  select(null);
}
function step(){
  // simple force layout: repulsion + springs + centering
  for (const a of nodes){ a.fx = (cv.width/2 - a.x)*0.002; a.fy = (cv.height/2 - a.y)*0.002; }
  for (let i = 0; i < nodes.length; i++) for (let j = i+1; j < nodes.length; j++){
    const a = nodes[i], b = nodes[j];
    let dx = a.x-b.x, dy = a.y-b.y, d2 = dx*dx+dy*dy+0.01, f = 800/d2;
    a.fx += dx*f; a.fy += dy*f; b.fx -= dx*f; b.fy -= dy*f;
  }
  for (const e of edges){
    const a = byId[e.source], b = byId[e.target]; if (!a || !b) continue;
    const dx = b.x-a.x, dy = b.y-a.y;
    a.fx += dx*0.005; a.fy += dy*0.005; b.fx -= dx*0.005; b.fy -= dy*0.005;
  }
  for (const n of nodes){
    n.vx = (n.vx + n.fx)*0.85; n.vy = (n.vy + n.fy)*0.85;
    n.x += n.vx; n.y += n.vy;
  }
}
function draw(){
  cx.clearRect(0,0,cv.width,cv.height);
  cx.strokeStyle = '#444';
  for (const e of edges){
    const a = byId[e.source], b = byId[e.target]; if (!a || !b) continue;
    cx.beginPath(); cx.moveTo(a.x,a.y); cx.lineTo(b.x,b.y); cx.stroke();
  }
  for (const n of nodes){
    cx.fillStyle = palette[n.community % palette.length];
    const r = 3 + 10*(n.centrality || 0);
    cx.beginPath(); cx.arc(n.x,n.y,r,0,7); cx.fill();
    if (n === selected){
      cx.strokeStyle = '#fff'; cx.lineWidth = 2;
      cx.beginPath(); cx.arc(n.x,n.y,r+3,0,7); cx.stroke(); cx.lineWidth = 1;
    }
    if (nodes.length <= 200 || n === selected){
      cx.fillStyle = '#bbb'; cx.fillText(n.id, n.x+r+2, n.y+3);
    }
  }
}
// ── node selection: click or search (reference frontend detail panel) ──
let selected = null;
function select(n){
  selected = n;
  document.getElementById('detail').textContent = n
    ? `${n.id}: degree ${n.degree}, centrality ${(n.centrality||0).toFixed(3)}, community ${n.community}`
    : '';
}
cv.addEventListener('click', ev => {
  const x = ev.offsetX, y = ev.offsetY;
  let best = null, bd = 12*12;
  for (const n of nodes){
    const d = (n.x-x)*(n.x-x) + (n.y-y)*(n.y-y);
    if (d < bd){ bd = d; best = n; }
  }
  select(best);
});
document.getElementById('search').addEventListener('change', ev => {
  const q = ev.target.value.trim().toLowerCase();
  const n = q && (nodes.find(n => String(n.id).toLowerCase() === q) ||
                  nodes.find(n => String(n.id).toLowerCase().includes(q)));
  select(n || null);
  if (n){ n.x = cv.width/2; n.y = cv.height/2; n.vx = n.vy = 0; }
});
// ── 3D embedding scatter (the reference's Deck.GL view, canvas-native) ──
let points = [], angle = 0, catColor = {};
async function loadEmbed(name){
  const p = await (await fetch('/api/embed/' + name)).json();
  points = p.points; catColor = {}; let ci = 0;
  for (const pt of points)
    if (pt.category != null && !(pt.category in catColor))
      catColor[pt.category] = palette[ci++ % palette.length];
  document.getElementById('stats').textContent =
    `${p.count} points — ${name} (3D PCA)`;
}
function drawEmbed(){
  cx.clearRect(0,0,cv.width,cv.height);
  angle += 0.004;
  const xs = points.map(p=>p.x), ys = points.map(p=>p.y);
  const sc = Math.min(cv.width, cv.height) /
    (2.5 * Math.max(...xs.map(Math.abs), ...ys.map(Math.abs), 1e-6));
  const ca = Math.cos(angle), sa = Math.sin(angle);
  for (const p of points){
    const rx = p.x*ca + p.z*sa, rz = -p.x*sa + p.z*ca;
    const px = cv.width/2 + rx*sc, py = cv.height/2 - p.y*sc;
    const depth = 0.6 + 0.4/(1 + Math.exp(-rz*sc/100));
    cx.fillStyle = p.category != null ? catColor[p.category] : '#4fc3f7';
    cx.globalAlpha = depth;
    cx.beginPath(); cx.arc(px, py, 2 + depth*2, 0, 7); cx.fill();
  }
  cx.globalAlpha = 1;
}
const viewSel = document.getElementById('view');
async function initViews(){
  const t = await (await fetch('/api/embed')).json();
  for (const name of t.tables){
    const o = document.createElement('option');
    o.value = 'embed:' + name; o.textContent = 'embed: ' + name;
    viewSel.appendChild(o);
  }
}
viewSel.addEventListener('change', () => {
  if (viewSel.value.startsWith('embed:')) loadEmbed(viewSel.value.slice(6));
  else load();
});
function loop(){
  if (viewSel.value.startsWith('embed:')){ if (points.length) drawEmbed(); }
  else if (nodes.length){ step(); draw(); }
  requestAnimationFrame(loop);
}
document.getElementById('mind').addEventListener('change', load);
initViews(); load(); loop();
</script></body></html>"""


class VizServer:
    """Serve an interactive view of a muninn-tpu ``Graph``.

    Betweenness (node sizing, cached like the reference's BC cache) and
    Leiden communities (coloring) are computed once lazily.
    """

    def __init__(self, graph, *, embeddings: dict | None = None,
                 max_bc_nodes: int = 5000):
        """``embeddings``: optional ``{table_name: (labels, vectors[,
        categories])}`` — served as 3D scatter payloads (the
        reference's chunks/entities UMAP tables)."""
        self.graph = graph
        self._bc = None
        self._communities = None
        self._modularity = 0.0
        self._max_bc_nodes = max_bc_nodes
        self._httpd = None
        self._embeddings = dict(embeddings or {})
        self._embed_cache: dict[str, dict] = {}
        # ThreadingHTTPServer: the page fires /api/graph and /api/stats
        # concurrently on first load — without a lock both threads run
        # the minutes-long lazy leiden+betweenness, and two concurrent
        # device computations can fail the single-client TPU tunnel
        self._alock = threading.Lock()

    def add_embeddings(self, name: str, labels, vectors,
                       categories=None) -> None:
        self._embeddings[name] = (labels, vectors, categories)
        self._embed_cache.pop(name, None)

    # ── payloads ──

    def _ensure_analytics(self):
        with self._alock:
            if self._communities is None:
                self._communities, self._modularity = self.graph.leiden(seed=0)
            if self._bc is None:
                if self.graph.num_nodes <= self._max_bc_nodes:
                    self._bc = self.graph.betweenness(normalized=True)
                else:
                    self._bc = self.graph.betweenness(
                        normalized=True, sample_sources=64
                    )

    def graph_payload(self, min_degree: int = 0) -> dict:
        self._ensure_analytics()
        deg = self.graph.degree(direction="both")
        keep = {n for n, d in deg.items() if d >= min_degree}
        max_bc = max(self._bc.values()) or 1.0
        nodes = [
            {
                "id": str(n),
                "degree": deg[n],
                "centrality": self._bc[n] / max_bc,
                "community": int(self._communities[n]),
            }
            for n in keep
        ]
        src = self.graph._src
        dst = self.graph._dst
        ids = self.graph.nodes.ids
        edges = [
            {"source": str(ids[s]), "target": str(ids[d])}
            for s, d in zip(src.tolist(), dst.tolist())
            if ids[s] in keep and ids[d] in keep
        ]
        return {"nodes": nodes, "edges": edges}

    def embed_payload(self, name: str) -> dict:
        """3D projection payload (reference ``EmbedPayload`` shape).
        Projection = top-3 principal components of the centered
        embedding matrix, computed on device via the d x d covariance
        eigendecomposition (one matmul + eigh — no O(N^2) work)."""
        if name not in self._embeddings:
            raise KeyError(name)
        with self._alock:
            return self._embed_payload_locked(name)

    def _embed_payload_locked(self, name: str) -> dict:
        if name not in self._embed_cache:
            import jax.numpy as jnp
            import numpy as np

            spec = self._embeddings[name]
            labels, vectors = spec[0], spec[1]
            categories = spec[2] if len(spec) > 2 else None
            x = jnp.asarray(np.asarray(vectors, np.float32))
            xc = x - jnp.mean(x, axis=0, keepdims=True)
            cov = (xc.T @ xc) / max(x.shape[0] - 1, 1)
            _, vecs = jnp.linalg.eigh(cov)      # ascending eigenvalues
            proj = np.asarray(xc @ vecs[:, -3:][:, ::-1])  # [N, 3]
            pts = [
                {
                    "id": i,
                    "x": float(p[0]), "y": float(p[1]), "z": float(p[2]),
                    "label": str(labels[i])[:LABEL_MAX_CHARS],
                    "category": (
                        str(categories[i]) if categories is not None else None
                    ),
                }
                for i, p in enumerate(proj)
            ]
            self._embed_cache[name] = {
                "table_id": name, "count": len(pts), "points": pts,
            }
        return self._embed_cache[name]

    def stats_payload(self) -> dict:
        self._ensure_analytics()
        return {
            "nodes": self.graph.num_nodes,
            "edges": self.graph.num_edges,
            "communities": len(set(self._communities.values())),
            "modularity": self._modularity,
        }

    # ── http ──

    def _handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == "/":
                    body = _PAGE.encode()
                    ctype = "text/html"
                elif url.path == "/api/graph":
                    q = parse_qs(url.query)
                    mind = int(q.get("min_degree", ["0"])[0])
                    body = json.dumps(server.graph_payload(mind)).encode()
                    ctype = "application/json"
                elif url.path == "/api/stats":
                    body = json.dumps(server.stats_payload()).encode()
                    ctype = "application/json"
                elif url.path == "/api/embed":
                    body = json.dumps(
                        {"tables": sorted(server._embeddings)}
                    ).encode()
                    ctype = "application/json"
                elif url.path.startswith("/api/embed/"):
                    name = url.path[len("/api/embed/"):]
                    try:
                        body = json.dumps(server.embed_payload(name)).encode()
                    except KeyError:
                        self.send_response(404)
                        self.end_headers()
                        return
                    ctype = "application/json"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        return Handler

    def start(self, port: int = 8787, host: str = "127.0.0.1") -> int:
        """Start in a background thread; returns the bound port."""
        self._httpd = ThreadingHTTPServer((host, port), self._handler())
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address[1]

    def serve(self, port: int = 8787, host: str = "127.0.0.1") -> None:
        self._httpd = ThreadingHTTPServer((host, port), self._handler())
        print(f"muninn-tpu viz on http://{host}:{port}")
        self._httpd.serve_forever()

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()  # release the listening socket
            self._httpd = None
