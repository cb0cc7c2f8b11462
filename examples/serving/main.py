"""Serve indexes + graphs over HTTP and drive them with the client SDK."""

import numpy as np

from muninn_tpu.client import EngineClient, MuninnRequestError
from muninn_tpu.serve import EngineServer


def main() -> dict:
    srv = EngineServer()
    port = srv.start(port=0)  # ephemeral port, background thread
    try:
        client = EngineClient(f"http://127.0.0.1:{port}")
        client.wait_ready(timeout=30)

        # -- remote vector index (IVF engine) --
        rng = np.random.default_rng(0)
        corpus = rng.standard_normal((400, 32)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        idx = client.create_index(
            "docs", dim=32, metric="cosine", kind="ivf", nprobe=4
        )
        idx.insert(range(len(corpus)), corpus)
        ids, dists = idx.search(corpus[:8], k=3)
        self_hits = sum(row[0] == i for i, row in enumerate(ids))

        # -- server-side checkpoint + reload under a new name --
        import tempfile

        ckpt = tempfile.mkdtemp(prefix="muninn_ckpt_") + "/docs"
        idx.save(ckpt)
        idx2 = client.load_index("docs_restored", ckpt)
        ids2, _ = idx2.search(corpus[:8], k=3)
        reload_ok = ids2 == ids

        # -- remote graph analytics --
        g = client.create_graph(
            "kg",
            src=["ada", "ada", "grace", "alan", "alan"],
            dst=["grace", "alan", "linus", "linus", "grace"],
        )
        ranks = g.pagerank()
        leiden = g.leiden()
        closure = g.select("@ada")

        # -- typed errors: collisions are deterministic 400s --
        try:
            client.create_index("docs", dim=32)
            duplicate_rejected = False
        except MuninnRequestError:
            duplicate_rejected = True

        return {
            "self_hits": self_hits,
            "reload_ok": reload_ok,
            "rank_sum": sum(ranks.values()),
            "communities": len(set(leiden["communities"].values())),
            "closure_nodes": len(closure),
            "duplicate_rejected": duplicate_rejected,
        }
    finally:
        srv.stop()


if __name__ == "__main__":
    for k, v in main().items():
        print(f"{k}: {v}")
