"""Model layer: Node2Vec, embedding/chat model registry and backends.

Note: the ``embed``/``chat`` convenience *functions* live in
``muninn_tpu.models.embed`` / ``muninn_tpu.models.chat`` — they are not
re-exported here so the submodule names stay importable.
"""

from muninn_tpu.models.node2vec import node2vec_train
from muninn_tpu.models.registry import ModelType, registry
from muninn_tpu.models.embed import load_embed_model, model_dim
from muninn_tpu.models.chat import load_chat_model

__all__ = [
    "node2vec_train",
    "ModelType",
    "registry",
    "load_embed_model",
    "model_dim",
    "load_chat_model",
]
