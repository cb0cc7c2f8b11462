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
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

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
    if (nodes.length <= 200){ cx.fillStyle = '#bbb'; cx.fillText(n.id, n.x+r+2, n.y+3); }
  }
}
function loop(){ if (nodes.length){ step(); draw(); } requestAnimationFrame(loop); }
document.getElementById('mind').addEventListener('change', load);
load(); loop();
</script></body></html>"""


class VizServer:
    """Serve an interactive view of a muninn-tpu ``Graph``.

    Betweenness (node sizing, cached like the reference's BC cache) and
    Leiden communities (coloring) are computed once lazily.
    """

    def __init__(self, graph, *, max_bc_nodes: int = 5000):
        self.graph = graph
        self._bc = None
        self._communities = None
        self._modularity = 0.0
        self._max_bc_nodes = max_bc_nodes
        self._httpd = None

    # ── payloads ──

    def _ensure_analytics(self):
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
            self._httpd = None
