"""Tutorial notebook source for llm_extract.ipynb."""

# %% [markdown]
# ## 1. Load an extraction model

# %%
from muninn_tpu import Graph
from muninn_tpu.models.chat import load_chat_model
from muninn_tpu.text import (
    extract_entities, extract_ner_re_batch, extract_relations,
)

load_chat_model("extractor")
DOCS = [
    "Ada Lovelace worked with Charles Babbage on the Analytical Engine.",
    "Charles Babbage designed the Analytical Engine in London.",
    "Grace Hopper created COBOL at Remington Rand.",
    "Alan Turing proposed the Turing Machine at Cambridge.",
]
len(DOCS)

# %% [markdown]
# ## 2. Named entities

# %%
ents = extract_entities("extractor", DOCS[0])
[e["name"] for e in ents["entities"]]

# %% [markdown]
# ## 3. Supervised extraction: constrain the type set

# %%
typed = extract_entities("extractor", DOCS[0],
                         entity_types=["PERSON", "ARTIFACT"])
typed["entities"][:2]

# %% [markdown]
# ## 4. Relations

# %%
rels = extract_relations("extractor", DOCS[2])
rels["relations"]

# %% [markdown]
# ## 5. Batched NER+RE over the corpus
#
# One decode pass for every document.

# %%
results = extract_ner_re_batch("extractor", DOCS)
src, dst = [], []
for r in results:
    for rel in r["relations"]:
        src.append(rel["head"])
        dst.append(rel["tail"])
print(f"extracted {len(src)} relations from {len(DOCS)} docs")

# %% [markdown]
# ## 6. Into a knowledge graph

# %%
g = Graph.from_edges(src, dst)
comps = g.connected_components()
n_comp = len({c for c, _ in comps.values()})
n_comp

# %% [markdown]
# ## 7. Who is most connected?

# %%
pr = g.pagerank()
central = max(pr, key=pr.get)
central

# %% [markdown]
# ## 8. Summary

# %%
{"n_edges": len(src), "n_components": n_comp, "central": central}
