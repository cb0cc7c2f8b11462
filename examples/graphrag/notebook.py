"""Tutorial notebook source for graphrag.ipynb."""

# %% [markdown]
# ## 1. Setup: chat + embed backends
#
# Echo/hash backends keep the notebook deterministic; swap `path=` for
# real checkpoints in production.

# %%
import numpy as np

from muninn_tpu import Graph
from muninn_tpu.index.flat import FlatIndex
from muninn_tpu.models.chat import load_chat_model
from muninn_tpu.models.embed import embed, load_embed_model
from muninn_tpu.text import extract_ner_re_batch, label_groups

load_chat_model("chat")
load_embed_model("emb", dim=64)

DOCS = [
    "Ada Lovelace worked with Charles Babbage on the Analytical Engine.",
    "Charles Babbage designed the Analytical Engine in London.",
    "Grace Hopper created COBOL at Remington Rand.",
    "COBOL influenced modern business programming languages.",
    "Alan Turing proposed the Turing Machine at Cambridge.",
    "The Turing Machine formalized computation itself.",
]
len(DOCS)

# %% [markdown]
# ## 2. Knowledge extraction
#
# One batched grammar-constrained decode over the corpus.

# %%
src, dst, mention_of = [], [], {}
for i, out in enumerate(extract_ner_re_batch("chat", DOCS)):
    for r in out["relations"]:
        src.append(r["head"])
        dst.append(r["tail"])
    for e in out["entities"]:
        mention_of.setdefault(e["name"], []).append(i)
print(f"{len(src)} relations, {len(mention_of)} distinct mentions")

# %% [markdown]
# ## 3. Entity graph + Leiden communities

# %%
g = Graph.from_edges(src, dst)
labels, q = g.leiden(seed=0)
members: dict = {}
for node, comm in labels.items():
    members.setdefault(comm, []).append(node)
print(f"{len(members)} communities (Q={q:.2f})")

# %% [markdown]
# ## 4. Name the communities

# %%
named = dict(
    (gid, label) for gid, label, _ in label_groups("chat", members)
)
for comm, nodes in sorted(members.items()):
    print(f"[{named.get(comm, comm)}] {sorted(nodes)}")

# %% [markdown]
# ## 5. An entity embedding index for retrieval

# %%
entities = list(labels)
idx = FlatIndex(64, "cosine")
idx.insert(np.arange(len(entities)), embed("emb", entities))
len(idx)

# %% [markdown]
# ## 6. Community-aware retrieval
#
# Nearest entities → their communities → every doc that mentions a
# community member.

# %%
query = "Who built early mechanical computers?"
ids, _ = idx.search(embed("emb", [query])[0], k=3)
hit_comms = {labels[entities[i]] for i in np.asarray(ids) if i >= 0}
contexts = []
for c in hit_comms:
    context_docs = sorted(
        {d for n in members[c] for d in mention_of.get(n, [])}
    )
    contexts.append(context_docs)
    print(f"community [{named.get(c, c)}] -> docs {context_docs}")
    for d in context_docs:
        print(f"  - {DOCS[d]}")

# %% [markdown]
# ## 7. Verify the retrieval found real context

# %%
assert contexts and any(contexts)
True

# %% [markdown]
# ## 8. Summary

# %%
{"n_communities": len(members), "contexts": contexts}
