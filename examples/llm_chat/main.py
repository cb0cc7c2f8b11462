"""Chat generation: prompts, think-stripping, grammar JSON, batching."""

import json

from muninn_tpu.models.chat import chat, load_chat_model, strip_think_block
from muninn_tpu.text.grammar import GRAMMAR_NER


def main() -> dict:
    model = load_chat_model("assistant")  # echo backend; path= for real

    out = chat("assistant", "Name three graph algorithms.")
    print("plain:", out[:80])

    out = chat("assistant", "Summarize HNSW in one line.",
               system_prompt="You are a terse systems engineer.",
               max_tokens=64)
    print("with system prompt:", out[:80])

    # think-block stripping
    raw = "<think>chain of thought...</think>The answer is 42."
    print("stripped:", strip_think_block(raw))

    # grammar-constrained JSON: output is guaranteed parseable and
    # shaped like the grammar (here: the NER entity-list grammar)
    out = chat("assistant", "Ada Lovelace met Charles Babbage in London.",
               system_prompt="Extract the entities as JSON.",
               grammar=GRAMMAR_NER)
    obj = json.loads(out)
    print("grammar JSON:", obj)
    assert "entities" in obj or isinstance(obj, list)

    # batched generation: one decode pass, many prompts
    prompts = [f"Define term {t}" for t in ("HNSW", "CSR", "SGNS", "MXU")]
    outs = model.generate_batch(prompts, max_tokens=32)
    for p, o in zip(prompts, outs):
        print(f"  {p!r} -> {o[:50]!r}")
    assert len(outs) == len(prompts)
    return {"json": obj, "batch_n": len(outs)}


if __name__ == "__main__":
    main()
