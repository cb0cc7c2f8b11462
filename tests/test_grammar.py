"""Grammar-constrained decoding: GBNF compiler, token lifting, and
end-to-end constrained generation.

Mirrors the reference's GBNF guarantee (``src/llama_constants.h:29-65``,
``src/llama_chat.c:110-210``): output is valid JSON of the grammar's
shape at the *token* level. The end-to-end test builds a tiny
randomly-initialized GPT-2 + ByteLevel BPE tokenizer locally (the
zero-egress analogue of the reference's downloaded-GGUF gated tests,
``pytests/test_embed_gguf.py:23-37``) — with random weights, ONLY the
grammar constraint can make the output valid, which is exactly the
guarantee under test.
"""

import json

import numpy as np
import pytest

from muninn_tpu.text.grammar import (
    GRAMMAR_NER,
    GRAMMAR_NER_RE,
    GRAMMAR_RE,
    TokenGrammar,
    compile_gbnf,
)


class TestCharDFA:
    def test_ner_shape(self):
        dfa = compile_gbnf(GRAMMAR_NER)
        good = [
            '{"entities": [{"name": "Ada", "type": "PERSON"}]}',
            '{"entities": []}',
            '[{"name": "X", "type": "T"}]',
            '{"entities": [{"name": "A", "type": "B"}, {"name": "C", "type": "D"}]}',
            '{"entities": [{"name": "naïve — ünïcode", "type": "X"}]}',
            '{\n"entities"\t: [  ]\n}',
        ]
        bad = [
            '{"entities": [{"name": "Ada"}]}',          # missing key
            '{"entities"',                               # truncated
            "hello",
            '{"entities": [{"name": Ada, "type": "T"}]}',  # unquoted
            '{"entities": [],}',                         # trailing comma
        ]
        for s in good:
            assert dfa.accepts(s), s
        for s in bad:
            assert not dfa.accepts(s), s

    def test_re_and_ner_re_shapes(self):
        dre = compile_gbnf(GRAMMAR_RE)
        assert dre.accepts('{"relations": [{"head": "A", "relation": "r", "tail": "B"}]}')
        assert not dre.accepts('{"relations": [{"head": "A", "tail": "B"}]}')
        dnr = compile_gbnf(GRAMMAR_NER_RE)
        assert dnr.accepts('{"entities": [], "relations": []}')
        assert not dnr.accepts('{"entities": []}')

    def test_recursive_rule_rejected(self):
        with pytest.raises(ValueError, match="recursive"):
            compile_gbnf('root ::= "a" root | "b"\n')

    def test_shortest_accepted_parses(self):
        for g in (GRAMMAR_NER, GRAMMAR_RE, GRAMMAR_NER_RE):
            dfa = compile_gbnf(g)
            s = dfa.shortest_accepted().decode()
            assert dfa.accepts(s)
            json.loads(s)

    def test_user_supplied_grammar(self):
        # muninn_chat accepts arbitrary GBNF via its 3rd arg
        dfa = compile_gbnf('root ::= "yes" | "no"\n')
        assert dfa.accepts("yes") and dfa.accepts("no")
        assert not dfa.accepts("maybe")


class TestTokenGrammar:
    def test_token_walk_and_eos(self):
        dfa = compile_gbnf(GRAMMAR_NER)
        vocab = [
            b"{", b"}", b"[", b"]", b'"', b":", b",", b" ",
            b'"entities"', b'"name"', b'"type"', b"Ada", b'"Ada"', None,
        ]
        tg = TokenGrammar(dfa, vocab, eos_id=13)
        s = 0
        for tok in [0, 8, 5, 2, 3, 1]:  # { "entities" : [ ] }
            assert tg.mask[s, tok]
            s = tg.trans[s, tok]
        assert tg.mask[s, 13], "EOS allowed exactly at acceptance"
        assert not tg.mask[0, 13], "EOS forbidden before acceptance"
        # a token that can never fit the grammar start is masked
        assert not tg.mask[0, 11]  # bare 'Ada' at start

    def test_known_sequence_walk_and_random_liveness(self):
        dfa = compile_gbnf(GRAMMAR_NER)
        vocab = [bytes([b]) for b in range(32, 127)] + [None]
        eos = len(vocab) - 1
        tg = TokenGrammar(dfa, vocab, eos_id=eos)

        # every byte of a valid sentence is allowed, and EOS fires only
        # at the end
        good = '{"entities": [{"name": "Ada", "type": "P"}]}'
        s = 0
        for ch in good:
            t = ord(ch) - 32
            assert tg.mask[s, t], (s, ch)
            assert not tg.mask[s, eos], "eos allowed on a strict prefix"
            s = int(tg.trans[s, t])
        assert tg.mask[s, eos]

        # random walks never dead-end (live DFA invariant), and any walk
        # that takes EOS has produced an accepted string
        rng = np.random.default_rng(0)
        done = 0
        for _ in range(20):
            s, out = 0, bytearray()
            for _ in range(300):
                allowed = np.nonzero(tg.mask[s])[0]
                assert len(allowed), "dead end reached"
                if tg.mask[s, eos] and rng.random() < 0.5:
                    assert dfa.accepts(bytes(out)), bytes(out)
                    done += 1
                    break
                choices = allowed[allowed != eos]
                if len(choices) == 0:
                    assert dfa.accepts(bytes(out))
                    done += 1
                    break
                t = int(rng.choice(choices))
                out.extend(vocab[t])
                s = int(tg.trans[s, t])
        assert done >= 3, "random walks should terminate at acceptance sometimes"

    def test_string_content_is_exact_utf8(self):
        """Negated classes model UTF-8 exactly: overlong encodings,
        surrogates, bare continuations, and out-of-range leads are
        rejected; well-formed scalars of every width are accepted."""
        dfa = compile_gbnf(GRAMMAR_NER)

        def doc(name_bytes: bytes) -> bytes:
            return (b'[{"name": "' + name_bytes + b'", "type": "x"}]')

        for good in ["é", "ø", "漢", "🎉", "", "\U0010ffff"]:
            assert dfa.accepts(doc(good.encode("utf-8"))), good
        bad = [
            b"\xf0\x80\x80\x80",  # overlong 4-byte
            b"\xc0\xaf",          # overlong 2-byte
            b"\xe0\x80\x80",      # overlong 3-byte
            b"\xed\xa0\x80",      # surrogate U+D800
            b"\xf4\x90\x80\x80",  # > U+10FFFF
            b"\x80",              # bare continuation
            b"\xc2",              # truncated sequence
            b"\xf5\x80\x80\x80",  # invalid lead
        ]
        for nb in bad:
            assert not dfa.accepts(doc(nb)), nb

    def test_complete_mid_scalar_cut_yields_valid_utf8(self):
        """Truncation repair: a token-budget cut inside a multi-byte
        scalar must complete to VALID UTF-8 (the production repair path
        in models/chat.py appends ``dfa.complete(prefix)``)."""
        dfa = compile_gbnf(GRAMMAR_NER)
        full = '[{"name": "a🎉b", "type": "t"}]'.encode("utf-8")
        assert dfa.accepts(full)
        for cut in range(len(full) + 1):
            prefix = full[:cut]
            assert dfa.alive(prefix), cut
            fixed = prefix + dfa.complete(prefix)
            assert dfa.accepts(fixed), cut
            json.loads(fixed.decode("utf-8"))  # decodable + parseable


# tiny_model_dir fixture lives in conftest.py (shared with the embed
# and chat real-model tests)


class TestFlaxConstrainedDecode:
    def test_grammar_forces_valid_json_from_random_weights(self, tiny_model_dir):
        from muninn_tpu.models.chat import FlaxChatModel

        m = FlaxChatModel(tiny_model_dir)
        dfa = compile_gbnf(GRAMMAR_NER)
        # eos_bias > 0: finish at the first grammar-acceptance point, so
        # even a random-weight model must emit COMPLETE valid JSON
        out = m.generate(
            "Extract entities: Ada Lovelace wrote programs.",
            grammar=GRAMMAR_NER, max_tokens=96, grammar_eos_bias=100.0,
        )
        assert dfa.accepts(out), out
        json.loads(out)
        # sanity: the unconstrained model does NOT reliably emit valid
        # JSON (random weights) — proves the constraint is doing the work
        free = m.generate("Extract entities.", max_tokens=48)
        assert not dfa.accepts(free) or free != out

    def test_unbiased_decode_never_violates_grammar(self, tiny_model_dir):
        """Without the EOS bias a random model may pad until the token
        budget — the invariant is then prefix-validity: the DFA never
        rejects, and the repair path still yields a dict."""
        from muninn_tpu.models.chat import FlaxChatModel, json_output

        m = FlaxChatModel(tiny_model_dir)
        dfa = compile_gbnf(GRAMMAR_NER)
        out = m.generate("Extract: Ada.", grammar=GRAMMAR_NER, max_tokens=48)
        assert dfa.alive(out), out
        assert isinstance(json_output(out, wrap_key="entities"), dict)

    def test_batched_decode_never_violates(self, tiny_model_dir):
        """4 prompts through ONE left-padded batch decode: every output
        is grammar-prefix-valid (a random model may wander inside
        unbounded string content until the token budget, so completion
        is only guaranteed for bounded grammars — next test)."""
        from muninn_tpu.models.chat import FlaxChatModel, json_output

        m = FlaxChatModel(tiny_model_dir)
        dfa = compile_gbnf(GRAMMAR_NER)
        prompts = [
            "Extract entities: Ada.",
            "Extract entities: Turing founded the field of computing.",
            "Extract entities: nothing here",
            "Extract entities: Berlin is in Germany.",
        ]
        outs = m.generate_batch(
            prompts, grammar=GRAMMAR_NER, max_tokens=96,
            grammar_eos_bias=100.0,
        )
        assert len(outs) == 4
        for o in outs:
            assert dfa.alive(o), o
            assert isinstance(json_output(o, wrap_key="entities"), dict)

    def test_batched_bounded_grammar_completes(self, tiny_model_dir):
        """With a fully bounded grammar + EOS bias, every sequence in
        the batch must produce COMPLETE valid JSON — token-level parity
        with the reference's GBNF guarantee."""
        from muninn_tpu.models.chat import FlaxChatModel

        g = (
            'root ::= "{" ws "\\"verdict\\"" ws ":" ws val ws "}"\n'
            'val ::= "\\"yes\\"" | "\\"no\\"" | "\\"unsure\\""\n'
            "ws ::= [ ]?\n"
        )
        dfa = compile_gbnf(g)
        m = FlaxChatModel(tiny_model_dir)
        prompts = ["Is Ada a person?", "Is Berlin a person?",
                   "Was Turing a founder?", "Is this JSON?"]
        outs = m.generate_batch(prompts, grammar=g, max_tokens=32,
                                grammar_eos_bias=100.0)
        assert len(outs) == 4
        for o in outs:
            assert dfa.accepts(o), o
            v = json.loads(o)["verdict"]
            assert v in ("yes", "no", "unsure")

    def test_extraction_pipeline_on_real_model(self, tiny_model_dir):
        """extract_entities through a registered Flax model returns the
        schema shape even from random weights (grammar + cleaners)."""
        from muninn_tpu.models.chat import load_chat_model
        from muninn_tpu.models.registry import registry
        from muninn_tpu.text.extract import extract_entities

        load_chat_model("tiny-flax", tiny_model_dir)
        try:
            out = extract_entities("tiny-flax", "Ada met Turing.", max_tokens=96)
            assert isinstance(out["entities"], list)
            for e in out["entities"]:
                assert set(e) == {"name", "type"}
        finally:
            registry.remove("tiny-flax")


class TestEchoGrammarContract:
    def test_echo_honors_grammar(self):
        from muninn_tpu.models.chat import EchoChatModel

        m = EchoChatModel()
        dfa = compile_gbnf(GRAMMAR_NER)
        out = m.generate(
            "Ada Lovelace wrote programs in London.",
            grammar=GRAMMAR_NER,
            system_prompt="Extract entities as JSON.",
        )
        assert dfa.accepts(out), out

    def test_echo_invalid_output_replaced(self):
        from muninn_tpu.models.chat import EchoChatModel

        m = EchoChatModel()
        g = 'root ::= "ok"\n'
        out = m.generate("summarize: blah blah", grammar=g,
                         system_prompt="summarize")
        assert out == "ok"


class TestGrammarJsonOracleFuzz:
    """Representative of the 1200-doc fuzz that found the UTF-8
    exactness bug: random documents of each grammar's shape must be
    accepted; byte mutants the DFA accepts must parse as JSON; every
    prefix must be alive and complete() to a parseable doc."""

    def _rand_string(self, rng):
        pool = list("abcXYZ 0129_./-éø漢🎉'&<>[]{}:,")
        return "".join(str(rng.choice(pool))
                       for _ in range(int(rng.integers(0, 10))))

    @pytest.mark.parametrize("gname", ["NER", "RE", "NER_RE"])
    def test_fuzz(self, gname):
        rng = np.random.default_rng(17)
        dfa = compile_gbnf({"NER": GRAMMAR_NER, "RE": GRAMMAR_RE,
                            "NER_RE": GRAMMAR_NER_RE}[gname])

        def doc():
            ents = [{"name": self._rand_string(rng),
                     "type": self._rand_string(rng)}
                    for _ in range(int(rng.integers(0, 3)))]
            rels = [{"head": self._rand_string(rng),
                     "relation": self._rand_string(rng),
                     "tail": self._rand_string(rng)}
                    for _ in range(int(rng.integers(0, 2)))]
            if gname == "NER":
                return json.dumps({"entities": ents}, ensure_ascii=False)
            if gname == "RE":
                return json.dumps({"relations": rels}, ensure_ascii=False)
            return json.dumps({"entities": ents, "relations": rels},
                              ensure_ascii=False)

        for _ in range(25):
            b = doc().encode("utf-8")
            assert dfa.accepts(b)
            cut = int(rng.integers(0, len(b) + 1))
            assert dfa.alive(b[:cut])
            fixed = b[:cut] + dfa.complete(b[:cut])
            assert dfa.accepts(fixed)
            json.loads(fixed.decode("utf-8"))
            for _ in range(4):
                mb = bytearray(b)
                op = int(rng.integers(0, 3))
                pos = int(rng.integers(0, len(mb))) if len(mb) else 0
                byte = int(rng.integers(1, 128))
                if op == 0 and len(mb):
                    mb[pos] = byte
                elif op == 1:
                    mb.insert(pos, byte)
                elif len(mb):
                    del mb[pos]
                if dfa.accepts(bytes(mb)):
                    json.loads(bytes(mb).decode("utf-8"))
