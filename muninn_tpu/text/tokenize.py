"""Tokenizer functions.

Mirrors the reference's tokenizer SQL surface (``muninn_tokenize``,
``muninn_tokenize_text``, ``muninn_token_count`` —
``src/llama_common.c:128-290``): tokenize against a *registered model*'s
tokenizer. Backends:

- any HuggingFace tokenizer loaded from a local path (zero-egress
  environments must have files on disk), or
- the built-in ``HashTokenizer`` — a deterministic byte-pair-free
  word/punct splitter with stable hashed ids, serving the role of the
  reference's ``MUNINN_TESTING`` dummy models
  (``src/llama_common.c:321-348``): real code paths, no model files.
"""

from __future__ import annotations

import hashlib
import re


class HashTokenizer:
    """Deterministic tokenizer: lowercased word/punctuation pieces with
    ids from a stable hash (32000-slot space, like a small sentencepiece
    vocab)."""

    VOCAB_SIZE = 32000
    _PIECE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

    def tokenize(self, text: str) -> list[int]:
        return [self._id(p) for p in self.pieces(text)]

    def pieces(self, text: str) -> list[str]:
        return self._PIECE.findall(text)

    def token_count(self, text: str) -> int:
        return len(self.pieces(text))

    def _id(self, piece: str) -> int:
        h = hashlib.blake2s(piece.lower().encode(), digest_size=4).digest()
        return int.from_bytes(h, "little") % self.VOCAB_SIZE


class HfTokenizer:
    """Wrap a transformers tokenizer loaded from a local path."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(path)

    def tokenize(self, text: str) -> list[int]:
        return self._tok.encode(text, add_special_tokens=False)

    def pieces(self, text: str) -> list[str]:
        return self._tok.tokenize(text)

    def token_count(self, text: str) -> int:
        return len(self.tokenize(text))


def tokenize(model, text: str) -> list[int]:
    """Token ids (``muninn_tokenize`` returns a JSON int array)."""
    return model.tokenizer.tokenize(text)


def tokenize_text(model, text: str) -> list[str]:
    """Token pieces (``muninn_tokenize_text``)."""
    return model.tokenizer.pieces(text)


def token_count(model, text: str) -> int:
    """Token count (``muninn_token_count``)."""
    return model.tokenizer.token_count(text)
