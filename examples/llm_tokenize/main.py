"""Tokenizer functions: ids, pieces, counts, budget truncation."""

from muninn_tpu.models.embed import load_embed_model
from muninn_tpu.models.registry import registry
from muninn_tpu.text import token_count, tokenize, tokenize_text

DOC = (
    "Tokenization splits text into model units. Counting tokens before "
    "sending a prompt keeps requests inside the context window."
)


def main() -> dict:
    load_embed_model("tok-demo", dim=32)
    m = registry.find("tok-demo")

    ids = tokenize(m, "Hello tokenized world")
    pieces = tokenize_text(m, "Hello tokenized world")
    print("ids    :", ids)
    print("pieces :", pieces)
    assert len(ids) == len(pieces)
    assert ids == tokenize(m, "Hello tokenized world"), "ids must be stable"

    n = token_count(m, DOC)
    print("document tokens:", n)

    # budget truncation: keep whole tokens up to a budget
    budget = 12
    kept = pieces_to_text = " ".join(tokenize_text(m, DOC)[:budget])
    print(f"first {budget} tokens: {kept!r}")
    assert token_count(m, pieces_to_text) <= budget + 1
    return {"n_tokens": n, "ids": ids}


if __name__ == "__main__":
    main()
