"""Text utilities: tokenization, extraction, string similarity."""

from muninn_tpu.text.tokenize import token_count, tokenize, tokenize_text
from muninn_tpu.text.extract import (
    extract_entities,
    extract_entities_batch,
    extract_ner_re,
    extract_ner_re_batch,
    extract_relations,
    label_groups,
    summarize,
)

__all__ = [
    "token_count", "tokenize", "tokenize_text",
    "extract_entities", "extract_entities_batch", "extract_ner_re",
    "extract_ner_re_batch", "extract_relations", "label_groups", "summarize",
]
