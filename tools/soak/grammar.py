"""Fuzz the GBNF -> byte-DFA compiler against Python's json as oracle.

For each built-in grammar (NER / RE / NER_RE / labels):
- generate random VALID documents (per that grammar's JSON shape, with
  nasty strings: unicode, escapes-not-needed chars, empties) -> DFA
  must accept, json.loads must parse;
- mutate accepted docs (byte insert/delete/replace) -> if the DFA
  accepts a mutant, json.loads MUST also parse it and the shape must
  still validate (DFA may legitimately accept e.g. changed letters);
- random prefixes of valid docs -> alive() must hold, and
  complete() must produce a DFA-accepted AND json-parseable doc.
"""
import json, sys, time, traceback

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
import numpy as np

from muninn_tpu.text import grammar as G

rng = np.random.default_rng(11)

def rand_string():
    n = int(rng.integers(0, 12))
    # the string rule (like the reference's) has no escapes: content
    # is any char except '"', '\\', and raw controls
    pool = list("abcXYZ 0129_./-éø漢🎉'&<>[]{}:,")
    return "".join(str(rng.choice(pool)) for _ in range(n))

def ner_doc():
    ents = [{"name": rand_string(), "type": rand_string()}
            for _ in range(int(rng.integers(0, 4)))]
    if rng.random() < 0.5:
        return json.dumps({"entities": ents}, ensure_ascii=False)
    return json.dumps(ents, ensure_ascii=False)

def re_doc():
    rels = [{"head": rand_string(), "relation": rand_string(),
             "tail": rand_string()} for _ in range(int(rng.integers(0, 3)))]
    return json.dumps({"relations": rels}, ensure_ascii=False)

def ner_re_doc():
    ents = [{"name": rand_string(), "type": rand_string()}
            for _ in range(int(rng.integers(0, 3)))]
    rels = [{"head": rand_string(), "relation": rand_string(),
             "tail": rand_string()} for _ in range(int(rng.integers(0, 2)))]
    return json.dumps({"entities": ents, "relations": rels},
                      ensure_ascii=False)

def label_doc():
    return json.dumps({"label": rand_string()}, ensure_ascii=False)

GRAMMARS = []
for name, gen in [("NER", ner_doc), ("RE", re_doc),
                  ("NER_RE", ner_re_doc), ("LABEL", label_doc)]:
    gtext = getattr(G, f"GRAMMAR_{name}", None)
    if gtext is None:
        continue
    GRAMMARS.append((name, G.compile_gbnf(gtext), gen))
print("grammars:", [g[0] for g in GRAMMARS], flush=True)

n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300
fails = 0
t0 = time.time()
for name, dfa, gen in GRAMMARS:
    for i in range(n_docs):
        # the grammar's ws is a SINGLE optional char and json.dumps uses
        # ", " separators — both styles must be accepted
        doc = gen()
        try:
            b = doc.encode("utf-8")
            # escaped control chars etc. are json-valid but our rand
            # strings avoid raw controls, so acceptance must hold unless
            # the doc contains an escape the tightened string rule
            # rejects; json.dumps never emits raw controls.
            assert dfa.accepts(b), f"valid doc rejected: {doc!r}"
            # prefix liveness + completion
            cut = int(rng.integers(0, len(b) + 1))
            # a cut can land mid-UTF-8; alive() operates on bytes so
            # any prefix of an accepted byte string must be alive
            assert dfa.alive(b[:cut]), f"prefix dead at {cut}: {doc!r}"
            fixed = b[:cut] + dfa.complete(b[:cut])
            assert dfa.accepts(fixed)
            json.loads(fixed.decode("utf-8"))
            # mutation: DFA acceptance must imply json validity
            for _ in range(6):
                mb = bytearray(b)
                op = rng.integers(0, 3)
                pos = int(rng.integers(0, len(mb))) if len(mb) else 0
                byte = int(rng.integers(1, 128))
                if op == 0 and len(mb):
                    mb[pos] = byte
                elif op == 1:
                    mb.insert(pos, byte)
                elif len(mb):
                    del mb[pos]
                mb = bytes(mb)
                if dfa.accepts(mb):
                    d = json.loads(mb.decode("utf-8"))  # must parse
                    assert isinstance(d, (dict, list))
        except Exception:
            fails += 1
            print(f"FAIL {name} doc#{i}: {doc!r}", flush=True)
            traceback.print_exc()
    print(f"{name}: {n_docs} docs ok ({time.time()-t0:.0f}s)", flush=True)
print(f"done, {fails} failures", flush=True)
