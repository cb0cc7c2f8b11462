"""NER / relation extraction / summarization over a chat model.

Mirrors the reference's extraction SQL functions
(``muninn_extract_entities[_batch]``, ``muninn_extract_relations``,
``muninn_extract_ner_re[_batch]``, ``muninn_summarize`` —
``src/llama_chat.c`` + prompts/grammars in ``src/llama_constants.h``).
The reference constrains output at the token level with GBNF JSON
grammars; the same applies here: extraction passes the matching grammar
(``text/grammar.py``) to the model — token-level logit masking on Flax
backends, validate-or-replace on string backends — with the
``json_output`` repair path and per-key validation as the final net.

Prompts come in supervised (caller supplies entity/relation types) and
unsupervised variants, like the reference's 6 system prompts.
"""

from __future__ import annotations

from muninn_tpu.models.chat import json_output
from muninn_tpu.models.registry import ModelType, registry
from muninn_tpu.text.grammar import GRAMMAR_NER, GRAMMAR_NER_RE, GRAMMAR_RE

NER_PROMPT_UNSUPERVISED = (
    "Extract every named entity from the text. Respond with JSON only, "
    'shaped {"entities": [{"name": str, "type": str}]}. Use concise '
    "UPPERCASE types (PERSON, ORG, PLACE, ...). No prose."
)
NER_PROMPT_SUPERVISED = (
    "Extract named entities of the following types: {types}. Respond "
    'with JSON only, shaped {{"entities": [{{"name": str, "type": str}}]}}. '
    "Only use the listed types. No prose."
)
RE_PROMPT_UNSUPERVISED = (
    "Extract subject-relation-object triples from the text. Respond with "
    'JSON only, shaped {"relations": [{"head": str, "relation": str, '
    '"tail": str}]}. No prose.'
)
RE_PROMPT_SUPERVISED = (
    "Extract subject-relation-object triples using only these relations: "
    '{types}. Respond with JSON only, shaped {{"relations": [{{"head": '
    'str, "relation": str, "tail": str}}]}}. No prose.'
)
NER_RE_PROMPT_UNSUPERVISED = (
    "Extract named entities and subject-relation-object triples from the "
    'text. Respond with JSON only, shaped {"entities": [{"name": str, '
    '"type": str}], "relations": [{"head": str, "relation": str, '
    '"tail": str}]}. No prose.'
)
SUMMARIZE_PROMPT = (
    "Summarize the text in at most {max_words} words. Respond with the "
    "summary only."
)


def _chat_model(name: str):
    return registry.find_type(name, ModelType.CHAT)


def _clean_entities(val) -> list[dict]:
    out = []
    if not isinstance(val, list):
        return out
    for e in val:
        if isinstance(e, dict) and isinstance(e.get("name"), str):
            out.append(
                {"name": e["name"], "type": str(e.get("type", "ENTITY"))}
            )
    return out


def _clean_relations(val) -> list[dict]:
    out = []
    if not isinstance(val, list):
        return out
    for r in val:
        if (
            isinstance(r, dict)
            and isinstance(r.get("head"), str)
            and isinstance(r.get("tail"), str)
        ):
            out.append(
                {
                    "head": r["head"],
                    "relation": str(r.get("relation", "related_to")),
                    "tail": r["tail"],
                }
            )
    return out


def extract_entities(
    model_name: str, text: str, *, entity_types: list[str] | None = None,
    max_tokens: int = 1024,
) -> dict:
    """``muninn_extract_entities(model, text[, types])`` ->
    {"entities": [...]}."""
    sp = (
        NER_PROMPT_SUPERVISED.format(types=", ".join(entity_types))
        if entity_types
        else NER_PROMPT_UNSUPERVISED
    )
    raw = _chat_model(model_name).generate(
        text, system_prompt=sp, max_tokens=max_tokens, grammar=GRAMMAR_NER
    )
    val = json_output(raw, wrap_key="entities")
    ents = _clean_entities(val.get("entities"))
    if entity_types:
        allowed = {t.upper() for t in entity_types}
        ents = [e for e in ents if e["type"].upper() in allowed] or ents
    return {"entities": ents}


def extract_relations(
    model_name: str, text: str, *, relation_types: list[str] | None = None,
    max_tokens: int = 1024,
) -> dict:
    """``muninn_extract_relations`` -> {"relations": [...]}."""
    sp = (
        RE_PROMPT_SUPERVISED.format(types=", ".join(relation_types))
        if relation_types
        else RE_PROMPT_UNSUPERVISED
    )
    raw = _chat_model(model_name).generate(
        text, system_prompt=sp, max_tokens=max_tokens, grammar=GRAMMAR_RE
    )
    val = json_output(raw, wrap_key="relations")
    return {"relations": _clean_relations(val.get("relations"))}


def extract_ner_re(model_name: str, text: str, *, max_tokens: int = 2048) -> dict:
    """``muninn_extract_ner_re`` -> {"entities": [...], "relations": [...]}."""
    raw = _chat_model(model_name).generate(
        text, system_prompt=NER_RE_PROMPT_UNSUPERVISED, max_tokens=max_tokens,
        grammar=GRAMMAR_NER_RE,
    )
    val = json_output(raw, wrap_key="entities")
    return {
        "entities": _clean_entities(val.get("entities")),
        "relations": _clean_relations(val.get("relations")),
    }


def extract_entities_batch(
    model_name: str, texts, *, entity_types: list[str] | None = None,
    max_tokens: int = 1024,
) -> list[dict]:
    """``muninn_extract_entities_batch`` — ONE batched decode for all
    texts (``src/llama_chat.c:224-415``): every prompt advances one
    token per step through the shared batch axis."""
    sp = (
        NER_PROMPT_SUPERVISED.format(types=", ".join(entity_types))
        if entity_types
        else NER_PROMPT_UNSUPERVISED
    )
    raws = _chat_model(model_name).generate_batch(
        list(texts), system_prompt=sp, max_tokens=max_tokens,
        grammar=GRAMMAR_NER,
    )
    out = []
    for raw in raws:
        val = json_output(raw, wrap_key="entities")
        ents = _clean_entities(val.get("entities"))
        if entity_types:
            allowed = {t.upper() for t in entity_types}
            ents = [e for e in ents if e["type"].upper() in allowed] or ents
        out.append({"entities": ents})
    return out


def extract_ner_re_batch(model_name: str, texts, *, max_tokens: int = 2048) -> list[dict]:
    """``muninn_extract_ner_re_batch`` — one batched decode."""
    raws = _chat_model(model_name).generate_batch(
        list(texts), system_prompt=NER_RE_PROMPT_UNSUPERVISED,
        max_tokens=max_tokens, grammar=GRAMMAR_NER_RE,
    )
    outs = []
    for r in raws:
        val = json_output(r, wrap_key="entities")  # parse/repair ONCE
        outs.append({
            "entities": _clean_entities(val.get("entities")),
            "relations": _clean_relations(val.get("relations")),
        })
    return outs


def summarize(model_name: str, text: str, *, max_words: int = 80) -> str:
    """``muninn_summarize``."""
    return _chat_model(model_name).generate(
        text,
        system_prompt=SUMMARIZE_PROMPT.format(max_words=max_words),
        max_tokens=max_words * 2,
    ).strip()


def label_groups(
    model_name: str,
    memberships: dict,
    *,
    min_group_size: int = 2,
    max_members: int = 20,
    system_prompt: str | None = None,
) -> list[tuple]:
    """``muninn_label_groups`` (``src/llama_label_groups.c``): label each
    group of members with a short name. ``memberships``: group_id ->
    list of member strings. Returns rows (group_id, label, member_count).
    """
    sp = system_prompt or (
        "Give a short (1-4 word) label naming what these items have in "
        "common. Respond with the label only."
    )
    rows = []
    for gid, members in memberships.items():
        members = list(members)
        if len(members) < min_group_size:
            continue
        sample = members[:max_members]
        raw = _chat_model(model_name).generate(
            "Items: " + "; ".join(str(m) for m in sample),
            system_prompt=sp, max_tokens=32,
        )
        cleaned = raw.strip().strip('"').strip("'")
        lines = cleaned.splitlines()  # quote-only output strips to ''
        label = lines[0].strip() if lines else ""
        rows.append((gid, label, len(members)))
    return rows
