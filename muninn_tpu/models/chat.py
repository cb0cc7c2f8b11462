"""Chat / generation models.

The reference drives GGUF chat models through llama.cpp with GBNF
grammar-constrained sampling, batched multi-sequence decode (<= 8 seqs
sharing one KV cache), chat templating, think-block stripping, and
JSON-repair fallbacks (``src/llama_chat.c``). TPU-native equivalents:

- ``FlaxChatModel``: a transformers Flax causal LM from a local path,
  greedy decode under jit; batched generation maps naturally to the
  batch axis (the reference's seq-id multiplexing exists because
  llama.cpp shares one KV cache — on TPU a batch dimension is the
  idiomatic form of the same thing).
- ``EchoChatModel``: deterministic test backend (the ``MUNINN_TESTING``
  dummy-model analogue) with canned JSON responses driven by prompt
  inspection — exercises every downstream pipeline without weights.
- JSON post-processing mirrors ``result_json_output`` /
  ``strip_think_block`` (``src/llama_chat.c:506-560``): bare arrays are
  wrapped under a key, truncated output falls back to a valid JSON
  envelope, and ``<think>...</think>`` blocks are removed.
"""

from __future__ import annotations

import json
import re

from muninn_tpu.models.registry import ModelType, registry
from muninn_tpu.text.tokenize import HashTokenizer

_THINK_RE = re.compile(r"<think>.*?</think>\s*", re.DOTALL)


def strip_think_block(text: str) -> str:
    """Remove a leading <think>...</think> block; a truncated think
    block (opened, never closed) yields empty output
    (``src/llama_chat.c:506-530``)."""
    if "<think>" in text and "</think>" not in text:
        return ""
    return _THINK_RE.sub("", text).strip()


def json_output(text: str, wrap_key: str = "items") -> dict:
    """Normalize model output to a JSON object: bare arrays get wrapped
    under ``wrap_key``; unparseable/truncated output falls back to an
    empty envelope (``result_json_output``, ``src/llama_chat.c:538+``)."""
    text = strip_think_block(text)
    try:
        val = json.loads(text)
    except json.JSONDecodeError:
        # salvage the longest parseable prefix of a truncated array/object
        val = None  # empty text (e.g. an all-think output) skips the loop
        for end in range(len(text), 0, -1):
            for closer in ("", "]", "}", "]}", '"}]}', '"}]'):
                try:
                    val = json.loads(text[:end] + closer)
                    break
                except json.JSONDecodeError:
                    val = None
            if val is not None:
                break
        if val is None:
            return {wrap_key: []}
    if isinstance(val, list):
        return {wrap_key: val}
    if isinstance(val, dict):
        return val
    return {wrap_key: [val]}


def _apply_grammar_contract(out: str, grammar: str | None) -> str:
    """For string-level backends (Echo), honor a GBNF ``grammar`` by
    validation: output that the grammar rejects is replaced with the
    grammar's shortest accepted string, so callers get the same
    valid-by-construction contract as token-level constrained decode."""
    if grammar is None:
        return out
    from muninn_tpu.text.grammar import compile_gbnf

    dfa = _dfa_cache_get(grammar, compile_gbnf)
    if dfa.accepts(out):
        return out
    return dfa.shortest_accepted().decode("utf-8", errors="replace")


_DFA_CACHE: dict[str, object] = {}


def _dfa_cache_get(grammar: str, compiler):
    if grammar not in _DFA_CACHE:
        _DFA_CACHE[grammar] = compiler(grammar)
    return _DFA_CACHE[grammar]


class EchoChatModel:
    """Deterministic chat backend for tests: recognizes the extraction
    prompt shapes and emits rule-based JSON (capitalized spans as
    entities, 'X <verb> Y' as relations); otherwise echoes a summary."""

    model_type = ModelType.CHAT

    def __init__(self, seed: int = 0):
        self.tokenizer = HashTokenizer()
        self.n_ctx = 8192

    _CAP_SPAN = re.compile(r"\b([A-Z][\w.\-]*(?:\s+[A-Z][\w.\-]*)*)\b")

    def _entities(self, text: str) -> list[dict]:
        out = []
        seen = set()
        for m in self._CAP_SPAN.finditer(text):
            name = m.group(1)
            if name.lower() in ("the", "a", "i") or name in seen:
                continue
            seen.add(name)
            out.append({"name": name, "type": "ENTITY"})
        return out

    def _relations(self, text: str) -> list[dict]:
        ents = [e["name"] for e in self._entities(text)]
        rels = []
        for i in range(len(ents) - 1):
            a, b = ents[i], ents[i + 1]
            ia = text.find(a)
            ib = text.find(b, ia + len(a))
            if ia < 0 or ib < 0:
                continue
            between = text[ia + len(a) : ib].strip()
            if 0 < len(between.split()) <= 4:
                rels.append({"head": a, "relation": between, "tail": b})
        return rels

    def generate(
        self,
        prompt: str,
        *,
        grammar: str | None = None,
        max_tokens: int = 512,
        system_prompt: str | None = None,
        skip_think: bool = True,
        grammar_eos_bias: float = 0.0,  # token-level knob; no-op here
    ) -> str:
        task = (system_prompt or "") + " " + prompt
        if "entities" in task.lower() and "relation" in task.lower():
            out = json.dumps(
                {
                    "entities": self._entities(prompt),
                    "relations": self._relations(prompt),
                }
            )
        elif "entities" in task.lower():
            out = json.dumps({"entities": self._entities(prompt)})
        elif "relation" in task.lower():
            out = json.dumps({"relations": self._relations(prompt)})
        elif "same real-world entity" in task.lower():
            # the ER prompt formats names with !r: apostrophes flip the
            # repr to double quotes, so match either quote style
            names = re.findall(r"'([^']*)'|\"([^\"]*)\"", prompt)
            names = [a or b for a, b in names]
            if len(names) >= 2:
                ta = {w for w in re.split(r"\W+", names[0].lower()) if w}
                tb = {w for w in re.split(r"\W+", names[1].lower()) if w}
                if "confidence" in task.lower():
                    # graded mode: Jaccard token overlap on a 0-10 scale
                    j = len(ta & tb) / max(len(ta | tb), 1)
                    out = str(round(10 * j))
                else:
                    out = "yes" if (ta & tb) else "no"
            elif "confidence" in task.lower():
                out = "0"
            else:
                out = "no"
        elif "label" in task.lower():
            ents = [
                e for e in self._entities(prompt)
                if e["name"].lower() != "items"
            ]
            out = ents[0]["name"] if ents else "group"
        elif "summar" in task.lower():
            words = prompt.split()
            out = " ".join(words[: min(len(words), max_tokens // 4)])
        else:
            out = prompt[: max_tokens * 4]
        return _apply_grammar_contract(out, grammar)

    def generate_batch(self, prompts, **kw) -> list[str]:
        """Batched generation (reference: <= 8 seqs share one KV cache,
        ``src/llama_chat.c:224-415``; here the batch axis does it)."""
        return [self.generate(p, **kw) for p in prompts]


def _grammar_tables(tg, vocab_size: int):
    """Pad the compiled token-transition/mask tables to the model's
    vocab (tokens beyond the table are never legal)."""
    import numpy as np

    s, v = tg.trans.shape
    trans = np.full((s, vocab_size), -1, np.int32)
    trans[:, : min(v, vocab_size)] = tg.trans[:, :vocab_size]
    mask = np.zeros((s, vocab_size), bool)
    mask[:, : min(v, vocab_size)] = tg.mask[:, :vocab_size]
    return trans, mask


class FlaxChatModel:
    """Transformers Flax causal LM from a local path; batched greedy
    decode with optional token-level grammar constraints.

    Templating: uses the tokenizer's chat template when present
    (the reference calls ``llama_chat_apply_template`` with model
    specific special cases, ``src/llama_chat.c:424-494``). Batched
    generation left-pads prompts and decodes all sequences through one
    KV cache per step — the true batch-axis analogue of the reference's
    seq-id multiplexed ``llama_decode`` (``src/llama_chat.c:224-415``).
    """

    model_type = ModelType.CHAT

    def __init__(self, path: str, n_ctx: int | None = None):
        from transformers import AutoTokenizer, FlaxAutoModelForCausalLM

        self._tok = AutoTokenizer.from_pretrained(path)
        self._model = FlaxAutoModelForCausalLM.from_pretrained(path)
        # pin the weights on device ONCE: from_pretrained leaves numpy
        # params, and numpy args to a jitted decode re-upload the whole
        # model per call (through this environment's ~2 MB/s tunnel
        # that is minutes per generate for a 100M-param model)
        import jax

        self._model.params = jax.device_put(self._model.params)
        train_ctx = getattr(self._model.config, "max_position_embeddings", 2048)
        # n_ctx = max(8192, train/8) capped at train (src/llama_chat.c:66-75)
        self.n_ctx = min(n_ctx or max(8192, train_ctx // 8), train_ctx)
        from muninn_tpu.text.tokenize import HfTokenizer

        self.tokenizer = HfTokenizer(path)
        self._token_bytes = None
        self._tg_cache: dict[str, object] = {}
        # jitted grammar-decode programs keyed by their static config —
        # a fresh @jax.jit closure per call would retrace the whole
        # KV-cache scan every generate_batch (25-200 s-class through
        # the TPU tunnel); table arrays are runtime args so jax's own
        # shape-keyed cache handles different grammars per key
        self._decode_fns: dict[tuple, object] = {}

    def _token_grammar(self, gbnf: str):
        if gbnf not in self._tg_cache:
            from muninn_tpu.text.grammar import TokenGrammar, token_bytes_from_hf

            if self._token_bytes is None:
                self._token_bytes = token_bytes_from_hf(self._tok)
            tb, eos = self._token_bytes
            self._tg_cache[gbnf] = TokenGrammar.from_gbnf(gbnf, tb, eos)
        return self._tg_cache[gbnf]

    def _render(self, prompt: str, system_prompt: str | None,
                skip_think: bool = True) -> str:
        msgs = []
        if system_prompt:
            msgs.append({"role": "system", "content": system_prompt})
        msgs.append({"role": "user", "content": prompt})
        tmpl = getattr(self._tok, "chat_template", None)
        if tmpl:
            # Gemma-4 family templates use <|turn>/<turn|> tokens; the
            # reference renders them by hand because llama.cpp's
            # heuristic matcher fails on them (src/llama_chat.c:440-459).
            # HF executes the Jinja directly, so hand-rendering is only
            # the fallback when the template itself won't execute.
            try:
                text = self._tok.apply_chat_template(
                    msgs, tokenize=False, add_generation_prompt=True
                )
            except Exception:
                if "<turn|>" in tmpl:
                    text = "<bos>"
                    if system_prompt:
                        text += f"<|turn>system\n{system_prompt}<turn|>\n"
                    text += f"<|turn>user\n{prompt}<turn|>\n<|turn>model\n"
                    return text
                raise
            # Qwen3.5 thinking models: inject an empty closed think
            # block to disable reasoning when the caller asked to skip
            # it (src/llama_chat.c:478-489's inject_skip_think)
            if (
                skip_think
                and "enable_thinking" in tmpl
                and not text.rstrip().endswith("</think>")
            ):
                text += "<think>\n\n</think>\n\n"
            return text
        parts = [f"{m['role']}: {m['content']}" for m in msgs]
        return "\n".join(parts) + "\nassistant:"

    def generate(self, prompt: str, **kw) -> str:
        return self.generate_batch([prompt], **kw)[0]

    def _grammar_greedy_decode(
        self, input_ids, attention_mask, max_new: int, tg,
        eos_bias: float,
    ):
        """Grammar-constrained greedy decode as ONE XLA program.

        The KV cache AND the grammar DFA state are both loop carries of
        a single ``lax.scan`` — O(1) grammar work per step (a [B]-wide
        table gather), unlike the round-2 stateless logits processor
        that rescanned the whole generated suffix every step (O(L^2)
        over a long constrained generation). This is the TPU-native
        form of the reference's GBNF sampler chain
        (``src/llama_chat.c:110-210``): llama.cpp re-evaluates the
        grammar on host per step; here the compiled mask/transition
        tables live on device and the decode never leaves the device.
        """
        import jax.numpy as jnp
        import numpy as np

        model = self._model
        vocab = model.config.vocab_size
        tabs = getattr(tg, "_decode_tables", None)
        if tabs is None or tabs[2] != vocab:
            trans, mask = _grammar_tables(tg, vocab)
            tabs = (jnp.asarray(trans), jnp.asarray(mask), vocab)
            tg._decode_tables = tabs
        trans_j, mask_j, _ = tabs
        eos_id = int(tg.eos_id)
        pad_id = int(self._tok.pad_token_id)
        b, in_len = input_ids.shape
        key = (b, in_len, int(max_new), eos_id, pad_id, float(eos_bias))
        run = self._decode_fns.get(key)
        if run is None:
            run = self._build_decode_fn(*key)
            self._decode_fns[key] = run
        return np.asarray(run(
            jnp.asarray(input_ids), jnp.asarray(attention_mask),
            model.params, trans_j, mask_j,
        ))

    def _build_decode_fn(
        self, b: int, in_len: int, max_new: int, eos_id: int,
        pad_id: int, bias: float,
    ):
        """One jitted decode program for a static (batch, lengths,
        special-ids, bias) configuration; the grammar transition/mask
        tables are runtime arguments."""
        import jax
        import jax.numpy as jnp

        model = self._model
        max_len = in_len + max_new

        def constrain(logits, st, trans_j, mask_j):
            allowed = mask_j[st]
            neg = jnp.finfo(logits.dtype).min
            out = jnp.where(allowed, logits, neg)
            if bias:
                # EOS is unmasked exactly in accepting states: a
                # positive bias means "finish at the first point the
                # output is a complete sentence of the grammar"
                out = out.at[:, eos_id].add(
                    jnp.where(allowed[:, eos_id], bias, 0.0)
                )
            return out

        @jax.jit
        def run(input_ids, attention_mask, params, trans_j, mask_j):
            cache = model.init_cache(b, max_len)
            # extended mask covers future cache positions (the
            # prepare_inputs_for_generation contract of HF Flax LMs)
            ext_mask = jax.lax.dynamic_update_slice(
                jnp.ones((b, max_len), dtype=attention_mask.dtype),
                attention_mask, (0, 0),
            )
            pos = jnp.clip(jnp.cumsum(attention_mask, axis=1) - 1, 0)
            out = model(
                input_ids, attention_mask=ext_mask, position_ids=pos,
                past_key_values=cache, params=params,
            )
            st0 = jnp.zeros((b,), jnp.int32)
            tok0 = jnp.argmax(
                constrain(out.logits[:, -1], st0, trans_j, mask_j), axis=-1
            ).astype(jnp.int32)
            done0 = tok0 == eos_id
            st1 = jnp.where(
                done0, st0, jnp.maximum(trans_j[st0, tok0], 0)
            )

            def step(carry, _):
                cache, tok, posn, st, done = carry
                out = model(
                    tok[:, None], attention_mask=ext_mask,
                    position_ids=posn[:, None], past_key_values=cache,
                    params=params,
                )
                nxt = jnp.argmax(
                    constrain(out.logits[:, -1], st, trans_j, mask_j), axis=-1
                ).astype(jnp.int32)
                nxt = jnp.where(done, pad_id, nxt)
                fin = nxt == eos_id
                nst = jnp.where(
                    done | fin, st, jnp.maximum(trans_j[st, nxt], 0)
                )
                return (
                    out.past_key_values, nxt, posn + 1, nst, done | fin
                ), nxt

            _, toks = jax.lax.scan(
                step,
                (out.past_key_values, tok0, pos[:, -1] + 1, st1, done0),
                None, length=max_new - 1,
            )
            return jnp.concatenate([tok0[:, None], toks.T], axis=1)

        return run

    def generate_batch(
        self,
        prompts,
        *,
        grammar: str | None = None,
        max_tokens: int = 512,
        system_prompt: str | None = None,
        skip_think: bool = True,
        grammar_eos_bias: float = 0.0,
    ) -> list[str]:
        """Decode all prompts together: left-padded batch, one greedy
        decode step advances every live sequence (the reference packs
        <= 8 seqs into one ``llama_decode``; on TPU the batch axis is
        that, unbounded). ``grammar_eos_bias > 0`` makes the decode
        finish at the first grammar-acceptance point."""
        texts = [self._render(p, system_prompt, skip_think) for p in prompts]
        self._tok.padding_side = "left"
        if self._tok.pad_token is None:
            self._tok.pad_token = self._tok.eos_token
        enc = self._tok(texts, return_tensors="np", padding=True)
        # bucket the padded prompt length to a pow2 (capped at n_ctx):
        # the decode program is keyed on in_len, so organically varying
        # prompt lengths would otherwise compile a fresh program per
        # length (25-200 s-class through the TPU tunnel; CLAUDE.md
        # bucket rule). Extra LEFT pads carry attention_mask 0 and are
        # position-id-neutral.
        import numpy as _np

        in_len = enc["input_ids"].shape[1]
        bucket = 16
        while bucket < in_len:
            bucket *= 2
        bucket = min(bucket, self.n_ctx)
        if bucket > in_len:
            pw = bucket - in_len
            enc["input_ids"] = _np.pad(
                enc["input_ids"], ((0, 0), (pw, 0)),
                constant_values=int(self._tok.pad_token_id),
            )
            enc["attention_mask"] = _np.pad(
                enc["attention_mask"], ((0, 0), (pw, 0))
            )
            in_len = bucket
        # clamp the decode budget to the model context: walking the KV
        # cache past max_position_embeddings is a shape error inside
        # attention. The reference bounds generation by n_ctx the same
        # way (src/llama_chat.c:66-75 context sizing); callers keep
        # their larger budgets on models with room for them.
        if in_len >= self.n_ctx:
            raise ValueError(
                f"prompt occupies the whole context ({in_len} >= "
                f"n_ctx={self.n_ctx}); nothing can be generated"
            )
        max_tokens = min(max_tokens, self.n_ctx - in_len)
        if grammar is not None:
            seqs = self._grammar_greedy_decode(
                enc["input_ids"], enc["attention_mask"],
                max_tokens, self._token_grammar(grammar), grammar_eos_bias,
            )
        else:
            out = self._model.generate(
                enc["input_ids"],
                attention_mask=enc["attention_mask"],
                max_new_tokens=max_tokens,
                do_sample=False,
                pad_token_id=self._tok.pad_token_id,
            )
            seqs = out.sequences[:, in_len:]
        outs = [self._tok.decode(s, skip_special_tokens=True) for s in seqs]
        if grammar is not None:
            # the token budget can truncate mid-sentence; the output is
            # still a live DFA prefix, so close it with the shortest
            # accepted suffix (grammar-exact analogue of the reference's
            # fallback JSON on truncation, src/llama_chat.c:538+)
            dfa = self._token_grammar(grammar).dfa
            fixed = []
            for o in outs:
                if not dfa.accepts(o):
                    try:
                        o = o + dfa.complete(o).decode("utf-8", "replace")
                    except ValueError:
                        o = dfa.shortest_accepted().decode("utf-8", "replace")
                fixed.append(o)
            outs = fixed
        return [strip_think_block(o) if skip_think else o for o in outs]


def load_chat_model(name: str, path: str | None = None, *, n_ctx: int | None = None):
    """Load + register a chat model (``muninn_chat_model``). ``path=None``
    registers the deterministic echo backend (dummy-injection analogue)."""
    model = EchoChatModel() if path is None else FlaxChatModel(path, n_ctx=n_ctx)
    registry.add(name, model)
    return model


def chat(
    model_name: str,
    prompt: str,
    *,
    grammar: str | None = None,
    max_tokens: int = 512,
    system_prompt: str | None = None,
    skip_think: bool = True,
) -> str:
    """``muninn_chat(model, prompt[, grammar[, max_tokens[,
    system_prompt[, skip_think]]]])`` equivalent."""
    model = registry.find_type(model_name, ModelType.CHAT)
    out = model.generate(
        prompt, grammar=grammar, max_tokens=max_tokens,
        system_prompt=system_prompt, skip_think=skip_think,
    )
    return strip_think_block(out) if skip_think else out
