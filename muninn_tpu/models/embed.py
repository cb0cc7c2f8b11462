"""Text embedding models.

The reference loads GGUF encoder models through llama.cpp
(``src/llama_embed.c``: tokenize -> llama_encode -> pooled embedding ->
L2 normalize). TPU-native equivalents:

- ``FlaxEmbedModel``: a transformers Flax encoder loaded from a local
  path, mean-pooled, running batched under jit on the TPU (the MXU does
  the work the reference gives to llama.cpp's CPU/Metal path).
- ``HashEmbedModel``: deterministic hashed bag-of-words embeddings —
  the ``MUNINN_TESTING`` dummy-model analogue
  (``src/llama_common.c:321-348``) so every downstream pipeline
  (indexing, ER) tests without model files in a zero-egress image.

All embeddings are L2-normalized float32, matching the reference
(``src/llama_embed.c:118-191``).
"""

from __future__ import annotations

import hashlib

import numpy as np

from muninn_tpu.models.registry import ModelType, registry
from muninn_tpu.text.tokenize import HashTokenizer


class HashEmbedModel:
    """Deterministic embeddings: each token hashes to a stable gaussian
    direction; a text embeds to the L2-normalized mean. Similar texts
    share tokens -> high cosine similarity. No model files needed."""

    model_type = ModelType.EMBED

    def __init__(self, dim: int = 64, seed: int = 0):
        self.dim = int(dim)
        self.seed = seed
        self.tokenizer = HashTokenizer()
        self.n_ctx = 8192  # reference cap, src/llama_embed.c:70-80

    def _token_vec(self, tok: str) -> np.ndarray:
        h = hashlib.blake2s(
            f"{self.seed}:{tok.lower()}".encode(), digest_size=8
        ).digest()
        rng = np.random.default_rng(int.from_bytes(h, "little"))
        return rng.standard_normal(self.dim).astype(np.float32)

    def embed(self, texts) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            pieces = self.tokenizer.pieces(t)[: self.n_ctx]
            if pieces:
                out[i] = np.mean([self._token_vec(p) for p in pieces], axis=0)
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-12)


class TfidfHashEmbedModel(HashEmbedModel):
    """Corpus-fit hashed TF-IDF embeddings: token directions from
    ``HashEmbedModel``, weighted by inverse document frequency fit on a
    corpus, plus (optional) character n-grams per word.

    The ER blocking role (``er/resolve.py`` step 1 — the reference
    blocks on real llama embeddings whose similarity already encodes
    token rarity, ``src/llama_er.c:207-287``): a plain bag-of-words
    hash embedding ranks candidates by SHARED TOKEN COUNT, so at scale
    a corpus-wide token ("Holdings") crowds true rare-token variants
    out of the k-NN neighborhood. IDF weighting restores the rarity
    signal; word n-grams catch abbreviated variants ("Hldgs") whose
    word token never matches.

    Fit is one pass over the corpus; unseen tokens at embed time get
    the max-IDF weight (they are maximally rare)."""

    def __init__(self, dim: int = 64, seed: int = 0, ngram: int = 0):
        super().__init__(dim=dim, seed=seed)
        self.ngram = int(ngram)
        self._idf: dict[str, float] = {}
        self._max_idf = 1.0
        # token-direction memo: corpora repeat tokens massively (the
        # whole point of IDF), and _token_vec is hash+PRNG per call
        self._vec_cache: dict[str, np.ndarray] = {}

    def _token_vec(self, tok: str) -> np.ndarray:
        v = self._vec_cache.get(tok)
        if v is None:
            v = super()._token_vec(tok)
            self._vec_cache[tok] = v
        return v

    def _pieces(self, text: str) -> list[str]:
        toks = [p.lower() for p in self.tokenizer.pieces(text)]
        if self.ngram > 1:
            for w in list(toks):
                if len(w) > self.ngram:
                    toks += [
                        w[i : i + self.ngram]
                        for i in range(len(w) - self.ngram + 1)
                    ]
        return toks[: self.n_ctx]

    def fit(self, corpus) -> "TfidfHashEmbedModel":
        import math

        df: dict[str, int] = {}
        n = 0
        for t in corpus:
            n += 1
            for tok in set(self._pieces(t)):
                df[tok] = df.get(tok, 0) + 1
        self._idf = {
            tok: math.log((n + 1) / (c + 1)) + 1.0 for tok, c in df.items()
        }
        self._max_idf = math.log(n + 1) + 1.0
        return self

    def embed(self, texts) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            pieces = self._pieces(t)
            if not pieces:
                continue
            acc = np.zeros(self.dim, np.float32)
            for p in pieces:
                acc += self._idf.get(p, self._max_idf) * self._token_vec(p)
            out[i] = acc
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-12)


class FlaxEmbedModel:
    """Transformers Flax encoder from a local path; mean pooling over
    the last hidden state, jitted and batched on TPU."""

    model_type = ModelType.EMBED

    def __init__(self, path: str, n_ctx: int | None = None, batch_size: int = 64):
        import jax
        import jax.numpy as jnp
        from transformers import AutoTokenizer, FlaxAutoModel

        self._hf_tok = AutoTokenizer.from_pretrained(path)
        if self._hf_tok.pad_token is None:  # decoder tokenizers (GPT-2)
            self._hf_tok.pad_token = self._hf_tok.eos_token
        self._model = FlaxAutoModel.from_pretrained(path)
        # pin weights on device once (numpy params would re-upload per
        # jitted call — see FlaxChatModel.__init__)
        self._model.params = jax.device_put(self._model.params)
        cfg_ctx = getattr(self._model.config, "max_position_embeddings", 512)
        self.n_ctx = min(n_ctx or cfg_ctx, 8192)  # src/llama_embed.c:70-80
        self.dim = self._model.config.hidden_size
        self.batch_size = batch_size

        from muninn_tpu.text.tokenize import HfTokenizer

        self.tokenizer = HfTokenizer(path)

        @jax.jit
        def _forward(params, input_ids, attention_mask):
            out = self._model(
                input_ids=input_ids, attention_mask=attention_mask,
                params=params,
            ).last_hidden_state
            mask = attention_mask[:, :, None].astype(jnp.float32)
            pooled = jnp.sum(out * mask, axis=1) / jnp.maximum(
                jnp.sum(mask, axis=1), 1e-9
            )
            return pooled / jnp.maximum(
                jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
            )

        self._forward = _forward

    def embed(self, texts) -> np.ndarray:
        import numpy as np

        if isinstance(texts, str):
            texts = [texts]
        outs = []
        for s in range(0, len(texts), self.batch_size):
            batch = texts[s : s + self.batch_size]
            # honor the configured context window; bucket the padded
            # length to a pow2 (>= 64) of the batch's longest sequence
            # so compiles stay bounded at O(log n_ctx) shapes instead
            # of silently truncating every document to 512 tokens
            enc = self._hf_tok(
                batch, truncation=True, max_length=self.n_ctx,
                return_tensors="np", padding=True,
            )
            ln = enc["input_ids"].shape[1]
            bucket = 64
            while bucket < ln:
                bucket *= 2
            bucket = min(bucket, self.n_ctx)
            if bucket > ln:
                pad_id = self._hf_tok.pad_token_id or 0
                enc["input_ids"] = np.pad(
                    enc["input_ids"], ((0, 0), (0, bucket - ln)),
                    constant_values=pad_id,
                )
                enc["attention_mask"] = np.pad(
                    enc["attention_mask"], ((0, 0), (0, bucket - ln))
                )
            outs.append(
                np.asarray(
                    self._forward(
                        self._model.params, enc["input_ids"],
                        enc["attention_mask"],
                    )
                )
            )
        return np.concatenate(outs).astype(np.float32)


def load_embed_model(
    name: str, path: str | None = None, *, dim: int = 64, n_ctx: int | None = None
):
    """Load + register an embedding model (``muninn_embed_model``,
    ``src/llama_embed.c:209-240``). ``path=None`` registers the
    deterministic hash model (the dummy-injection analogue)."""
    model = (
        HashEmbedModel(dim=dim) if path is None
        else FlaxEmbedModel(path, n_ctx=n_ctx)
    )
    registry.add(name, model)
    return model


def embed(model_name: str, texts) -> np.ndarray:
    """``muninn_embed(model, text) -> BLOB`` equivalent, batched."""
    model = registry.find_type(model_name, ModelType.EMBED)
    return model.embed(texts)


def model_dim(model_name: str) -> int:
    """``muninn_model_dim``."""
    return registry.find_type(model_name, ModelType.EMBED).dim
