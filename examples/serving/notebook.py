"""Tutorial notebook source for serving.ipynb."""

# %% [markdown]
# ## 1. Start the engine server
#
# A self-contained HTTP server on an ephemeral port, driven by the
# typed client SDK.

# %%
import numpy as np

from muninn_tpu.client import EngineClient, MuninnRequestError
from muninn_tpu.serve import EngineServer

srv = EngineServer()
port = srv.start(port=0)
client = EngineClient(f"http://127.0.0.1:{port}")
client.wait_ready(timeout=30)
client.ping()

# %% [markdown]
# ## 2. A remote IVF index

# %%
rng = np.random.default_rng(0)
corpus = rng.standard_normal((400, 32)).astype(np.float32)
corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
idx = client.create_index("docs", dim=32, metric="cosine", kind="ivf",
                          nprobe=4)
idx.insert(range(len(corpus)), corpus)
ids, dists = idx.search(corpus[:8], k=3)
self_hits = sum(row[0] == i for i, row in enumerate(ids))
self_hits

# %% [markdown]
# ## 3. Server-side checkpoint + reload

# %%
import tempfile

ckpt = tempfile.mkdtemp(prefix="muninn_ckpt_") + "/docs"
idx.save(ckpt)
idx2 = client.load_index("docs_restored", ckpt)
ids2, _ = idx2.search(corpus[:8], k=3)
reload_ok = ids2 == ids
reload_ok

# %% [markdown]
# ## 4. Remote graph analytics

# %%
g = client.create_graph(
    "kg",
    src=["ada", "ada", "grace", "alan", "alan"],
    dst=["grace", "alan", "linus", "linus", "grace"],
)
ranks = g.pagerank()
round(sum(ranks.values()), 3)

# %% [markdown]
# ## 5. Communities and selectors over HTTP

# %%
leiden = g.leiden()
closure = g.select("@ada")
len(set(leiden["communities"].values())), len(closure)

# %% [markdown]
# ## 6. Typed errors
#
# Collisions are deterministic 400s; the client never retries
# non-idempotent mutations on connection errors.

# %%
try:
    client.create_index("docs", dim=32)
    duplicate_rejected = False
except MuninnRequestError:
    duplicate_rejected = True
duplicate_rejected

# %% [markdown]
# ## 7. Concurrent clients coalesce
#
# Single-query searches arriving together share one batched engine
# dispatch (see `/health` counters).

# %%
import json as _json
import urllib.request

with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
    health = _json.loads(r.read())
health["search_requests"] >= health["search_batches"]

# %% [markdown]
# ## 8. Shut down

# %%
srv.stop()
{"self_hits": self_hits, "reload_ok": reload_ok,
 "duplicate_rejected": duplicate_rejected}
