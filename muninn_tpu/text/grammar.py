"""Token-level grammar-constrained decoding.

The reference guarantees valid JSON at the token level by wiring GBNF
grammars into llama.cpp's sampler chain (``src/llama_constants.h:29-65``,
``src/llama_chat.c:110-210``). A per-step host-side grammar evaluation
would serialize the TPU decode loop, so the design here compiles the
grammar ahead of time into dense device tables:

1. parse a GBNF subset (non-recursive rules — the reference's JSON
   grammars are regular) into an AST,
2. Thompson-construct a byte-level NFA, subset-construct a DFA, and trim
   states that cannot reach acceptance,
3. lift the byte DFA to the *token* level against a tokenizer's
   vocabulary: ``token_trans[S, V]`` (resulting DFA state, or -1 if the
   token is not allowed from state ``S``) and ``token_mask[S, V]`` —
   the EOS column is allowed exactly in accepting states.

The decode loop then applies the constraint as a pure logit mask + one
gather per step (``logits + where(mask[state])``, ``state =
trans[state, tok]``), entirely inside jit — no host round trips.

Supported GBNF subset: ``name ::= ...`` rules, string literals with
escapes, character classes ``[...]``/``[^...]`` with ranges, grouping,
alternation ``|``, and ``* + ?`` postfixes. Recursive rules raise (the
reference's NER/RE/NER+RE grammars are all non-recursive).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# ───────────────────────── grammar constants ─────────────────────────
# Same JSON shapes as the reference's GBNF_NER / GBNF_RE / GBNF_NER_RE
# (src/llama_constants.h:29-65), with this package's field names
# (extract.py prompts: entities[{name,type}], relations[{head,relation,
# tail}]).

# Two deliberate tightenings over the reference's common rules
# (src/llama_constants.h GBNF_COMMON_RULES):
# - string content excludes raw control bytes — JSON requires them
#   escaped, so the reference's [^"\\]* admits strings json parsers
#   reject;
# - ws is a single optional whitespace char, not [ \t\n]* — an
#   unbounded whitespace rule lets a degenerate model pad forever under
#   constrained decode, and one char is all JSON style ever needs.
_COMMON = (
    'string ::= "\\"" [^"\\\\\\x00-\\x1f]* "\\""\n'
    'ws ::= [ \\t\\n]?\n'
)

GRAMMAR_NER = (
    'root ::= ("{" ws "\\"entities\\"" ws ":" ws "[" ws entities ws "]" ws "}")'
    ' | ("[" ws entities ws "]")\n'
    'entities ::= entity ("," ws entity)* | ""\n'
    'entity ::= "{" ws "\\"name\\"" ws ":" ws string ws "," ws'
    ' "\\"type\\"" ws ":" ws string ws "}"\n' + _COMMON
)

GRAMMAR_RE = (
    'root ::= ("{" ws "\\"relations\\"" ws ":" ws "[" ws relations ws "]" ws "}")'
    ' | ("[" ws relations ws "]")\n'
    'relations ::= relation ("," ws relation)* | ""\n'
    'relation ::= "{" ws "\\"head\\"" ws ":" ws string ws "," ws'
    ' "\\"relation\\"" ws ":" ws string ws "," ws'
    ' "\\"tail\\"" ws ":" ws string ws "}"\n' + _COMMON
)

GRAMMAR_YES_NO = 'root ::= "yes" | "no"\n'

# 0-10 integer confidence (the ER adjudication's graded mode)
GRAMMAR_CONFIDENCE = 'root ::= "10" | [0-9]\n'

GRAMMAR_NER_RE = (
    'root ::= "{" ws "\\"entities\\"" ws ":" ws "[" ws entities ws "]" ws "," ws'
    ' "\\"relations\\"" ws ":" ws "[" ws relations ws "]" ws "}"\n'
    'entities ::= entity ("," ws entity)* | ""\n'
    'entity ::= "{" ws "\\"name\\"" ws ":" ws string ws "," ws'
    ' "\\"type\\"" ws ":" ws string ws "}"\n'
    'relations ::= relation ("," ws relation)* | ""\n'
    'relation ::= "{" ws "\\"head\\"" ws ":" ws string ws "," ws'
    ' "\\"relation\\"" ws ":" ws string ws "," ws'
    ' "\\"tail\\"" ws ":" ws string ws "}"\n' + _COMMON
)


# ───────────────────────── GBNF parsing ─────────────────────────

_ESCAPES = {"n": 0x0A, "t": 0x09, "r": 0x0D, '"': 0x22, "\\": 0x5C,
            "]": 0x5D, "[": 0x5B, "^": 0x5E, "-": 0x2D}


class _Parser:
    """Recursive-descent parser for the GBNF subset. AST nodes:
    ('lit', bytes) ('class', bool[256]) ('seq', [..]) ('alt', [..])
    ('star'|'plus'|'opt', node) ('ref', name)."""

    def __init__(self, text: str):
        self.s = text
        self.i = 0

    def error(self, msg: str):
        raise ValueError(f"GBNF parse error at {self.i}: {msg}")

    def ws(self, newlines: bool = False):
        chars = " \t\r\n" if newlines else " \t\r"
        while self.i < len(self.s) and self.s[self.i] in chars:
            self.i += 1

    def parse(self) -> dict[str, tuple]:
        rules = {}
        while True:
            self.ws(newlines=True)
            if self.i >= len(self.s):
                break
            name = self._ident()
            self.ws()
            if not self.s.startswith("::=", self.i):
                self.error(f"expected ::= after rule name {name!r}")
            self.i += 3
            rules[name] = self._alternatives()
        if "root" not in rules:
            raise ValueError("GBNF grammar must define a 'root' rule")
        return rules

    def _ident(self) -> str:
        j = self.i
        while j < len(self.s) and (self.s[j].isalnum() or self.s[j] in "_-"):
            j += 1
        if j == self.i:
            self.error("expected identifier")
        name, self.i = self.s[self.i : j], j
        return name

    def _alternatives(self) -> tuple:
        alts = [self._sequence()]
        while True:
            self.ws()
            # a '|' may continue on the next line
            save = self.i
            if self.i < len(self.s) and self.s[self.i] == "\n":
                j = self.i + 1
                while j < len(self.s) and self.s[j] in " \t\r\n":
                    j += 1
                if j < len(self.s) and self.s[j] == "|":
                    self.i = j
                else:
                    self.i = save
                    break
            if self.i < len(self.s) and self.s[self.i] == "|":
                self.i += 1
                alts.append(self._sequence())
            else:
                break
        return alts[0] if len(alts) == 1 else ("alt", alts)

    def _sequence(self) -> tuple:
        items = []
        while True:
            self.ws()
            if self.i >= len(self.s) or self.s[self.i] in "|)\n":
                break
            items.append(self._item())
        if not items:
            return ("lit", b"")
        return items[0] if len(items) == 1 else ("seq", items)

    def _item(self) -> tuple:
        node = self._base()
        if self.i < len(self.s) and self.s[self.i] in "*+?":
            op = {"*": "star", "+": "plus", "?": "opt"}[self.s[self.i]]
            self.i += 1
            node = (op, node)
        return node

    def _base(self) -> tuple:
        c = self.s[self.i]
        if c == '"':
            return ("lit", self._literal())
        if c == "[":
            return ("class", self._charclass())
        if c == "(":
            self.i += 1
            node = self._alternatives()
            self.ws()
            if self.i >= len(self.s) or self.s[self.i] != ")":
                self.error("expected )")
            self.i += 1
            return node
        if c.isalnum() or c in "_-":
            return ("ref", self._ident())
        self.error(f"unexpected char {c!r}")

    def _literal(self) -> bytes:
        self.i += 1
        out = bytearray()
        while True:
            if self.i >= len(self.s):
                self.error("unterminated literal")
            c = self.s[self.i]
            if c == '"':
                self.i += 1
                return bytes(out)
            if c == "\\":
                self.i += 1
                e = self.s[self.i]
                if e in _ESCAPES:
                    out.append(_ESCAPES[e])
                elif e == "x":
                    out.append(int(self.s[self.i + 1 : self.i + 3], 16))
                    self.i += 2
                else:
                    self.error(f"bad escape \\{e}")
                self.i += 1
            else:
                out.extend(c.encode("utf-8"))
                self.i += 1

    def _charclass(self) -> np.ndarray:
        self.i += 1
        neg = self.s[self.i] == "^"
        if neg:
            self.i += 1
        allowed = np.zeros(256, bool)

        def nextbyte() -> int:
            c = self.s[self.i]
            if c == "\\":
                self.i += 1
                e = self.s[self.i]
                self.i += 1
                if e in _ESCAPES:
                    return _ESCAPES[e]
                if e == "x":
                    v = int(self.s[self.i : self.i + 2], 16)
                    self.i += 2
                    return v
                self.error(f"bad class escape \\{e}")
            self.i += 1
            b = c.encode("utf-8")
            if len(b) != 1:
                self.error("non-ascii char class member")
            return b[0]

        while True:
            if self.i >= len(self.s):
                self.error("unterminated char class")
            if self.s[self.i] == "]":
                self.i += 1
                break
            lo = nextbyte()
            if self.i < len(self.s) - 1 and self.s[self.i] == "-" and self.s[self.i + 1] != "]":
                self.i += 1
                hi = nextbyte()
                allowed[lo : hi + 1] = True
            else:
                allowed[lo] = True
        if neg:
            allowed = ~allowed
            # high bytes stay flagged here; _build_nfa expands them into
            # the exact UTF-8 byte automaton so negated classes (JSON
            # string content) accept precisely the valid encodings of
            # non-ASCII scalars
        return allowed


# ───────────────────────── NFA / DFA ─────────────────────────


class _Nfa:
    def __init__(self):
        self.eps: list[list[int]] = []
        self.edges: list[list[tuple[np.ndarray, int]]] = []  # (byteset, to)

    def state(self) -> int:
        self.eps.append([])
        self.edges.append([])
        return len(self.eps) - 1


def _build_nfa(rules: dict[str, tuple]) -> tuple[_Nfa, int, int]:
    nfa = _Nfa()

    def build(node, stack: tuple) -> tuple[int, int]:
        kind = node[0]
        if kind == "lit":
            start = nfa.state()
            cur = start
            for b in node[1]:
                nxt = nfa.state()
                arr = np.zeros(256, bool)
                arr[b] = True
                nfa.edges[cur].append((arr, nxt))
                cur = nxt
            return start, cur
        if kind == "class":
            allowed = node[1]
            start, end = nfa.state(), nfa.state()
            ascii_part = allowed.copy()
            ascii_part[0x80:] = False
            if ascii_part.any():
                nfa.edges[start].append((ascii_part, end))
            if allowed[0x80:].any():
                # negated classes admit "any non-ASCII scalar": expand to
                # the EXACT UTF-8 byte automaton (Unicode Table 3-7). A
                # single loose any-high-byte edge would accept invalid
                # sequences — and `CharDFA.complete()`'s BFS (truncation
                # repair) would then emit overlong encodings like
                # F0 80 80 80 when a token-budget cut lands mid-scalar.
                def edge(frm, lo, hi, to):
                    arr = np.zeros(256, bool)
                    arr[lo : hi + 1] = True
                    nfa.edges[frm].append((arr, to))

                c1 = nfa.state()  # 1 continuation byte remaining
                c2 = nfa.state()  # 2 remaining
                c3 = nfa.state()  # 3 remaining
                edge(c1, 0x80, 0xBF, end)
                edge(c2, 0x80, 0xBF, c1)
                edge(c3, 0x80, 0xBF, c2)
                edge(start, 0xC2, 0xDF, c1)           # U+0080..U+07FF
                e0 = nfa.state()
                edge(start, 0xE0, 0xE0, e0)
                edge(e0, 0xA0, 0xBF, c1)              # no overlongs
                mid3 = np.zeros(256, bool)
                mid3[0xE1:0xED] = True                # E1..EC
                mid3[0xEE:0xF0] = True                # EE..EF
                nfa.edges[start].append((mid3, c2))
                ed = nfa.state()
                edge(start, 0xED, 0xED, ed)
                edge(ed, 0x80, 0x9F, c1)              # no surrogates
                f0 = nfa.state()
                edge(start, 0xF0, 0xF0, f0)
                edge(f0, 0x90, 0xBF, c2)              # no overlongs
                edge(start, 0xF1, 0xF3, c3)
                f4 = nfa.state()
                edge(start, 0xF4, 0xF4, f4)
                edge(f4, 0x80, 0x8F, c2)              # <= U+10FFFF
            return start, end
        if kind == "seq":
            start, cur = build(node[1][0], stack)
            for sub in node[1][1:]:
                s2, e2 = build(sub, stack)
                nfa.eps[cur].append(s2)
                cur = e2
            return start, cur
        if kind == "alt":
            start, end = nfa.state(), nfa.state()
            for sub in node[1]:
                s2, e2 = build(sub, stack)
                nfa.eps[start].append(s2)
                nfa.eps[e2].append(end)
            return start, end
        if kind in ("star", "plus", "opt"):
            s2, e2 = build(node[1], stack)
            start, end = nfa.state(), nfa.state()
            nfa.eps[start].append(s2)
            nfa.eps[e2].append(end)
            if kind in ("star", "opt"):
                nfa.eps[start].append(end)
            if kind in ("star", "plus"):
                nfa.eps[e2].append(s2)
            return start, end
        if kind == "ref":
            name = node[1]
            if name in stack:
                raise ValueError(
                    f"recursive rule {name!r} unsupported (grammar must be regular)"
                )
            if name not in rules:
                raise ValueError(f"undefined rule {name!r}")
            return build(rules[name], stack + (name,))
        raise AssertionError(kind)

    start, end = build(rules["root"], ("root",))
    return nfa, start, end


def _eps_closure(nfa: _Nfa, states: frozenset[int]) -> frozenset[int]:
    seen = set(states)
    todo = list(states)
    while todo:
        s = todo.pop()
        for t in nfa.eps[s]:
            if t not in seen:
                seen.add(t)
                todo.append(t)
    return frozenset(seen)


@dataclass
class CharDFA:
    """Byte-level DFA: ``trans[S, 256]`` int32 (-1 = reject),
    ``accept[S]`` bool, start state 0. Dead states (no path to
    acceptance) are pre-rejected."""

    trans: np.ndarray
    accept: np.ndarray

    @property
    def n_states(self) -> int:
        return self.trans.shape[0]

    def accepts(self, data: bytes | str) -> bool:
        if isinstance(data, str):
            data = data.encode("utf-8")
        s = 0
        for b in data:
            s = self.trans[s, b]
            if s < 0:
                return False
        return bool(self.accept[s])

    def alive(self, data: bytes | str) -> bool:
        """True iff ``data`` is a prefix of some accepted string (the
        constrained-decode invariant: output may be truncated by the
        token budget but is never grammar-violating)."""
        if isinstance(data, str):
            data = data.encode("utf-8")
        s = 0
        for b in data:
            s = self.trans[s, b]
            if s < 0:
                return False
        return True

    def shortest_accepted(self) -> bytes:
        """BFS for the shortest (lexicographically-smallest) accepted
        string — the fallback emission when a non-token backend's output
        fails the grammar."""
        return self.complete(b"")

    def complete(self, data: bytes | str) -> bytes:
        """Shortest (lexicographically-smallest) suffix that extends
        ``data`` to an accepted string. The truncation repair for
        constrained decode: a token budget can cut output mid-sentence,
        but the cut is always at a live DFA state, so appending this
        suffix yields grammar-valid output — the grammar-exact form of
        the reference's fallback-JSON-on-truncation
        (``src/llama_chat.c:538+``).

        Raises ValueError if ``data`` is not a live prefix or no
        accepting state is reachable."""
        if isinstance(data, str):
            data = data.encode("utf-8")
        start = 0
        for b in data:
            start = int(self.trans[start, b])
            if start < 0:
                raise ValueError("data is not a live prefix of the grammar")
        if self.accept[start]:
            return b""
        prev: dict[int, tuple[int, int]] = {start: (-1, -1)}
        frontier = [start]
        while frontier:
            nxt: list[int] = []
            for st in frontier:
                for b in range(256):
                    t = int(self.trans[st, b])
                    if t >= 0 and t not in prev:
                        prev[t] = (st, b)
                        if self.accept[t]:
                            out = bytearray()
                            cur = t
                            while cur != start:
                                p, byte = prev[cur]
                                out.append(byte)
                                cur = p
                            return bytes(reversed(out))
                        nxt.append(t)
            frontier = nxt
        raise ValueError("no accepting state reachable")


def compile_gbnf(text: str) -> CharDFA:
    """GBNF -> byte DFA (parse -> Thompson NFA -> subset construction ->
    dead-state trim)."""
    rules = _Parser(text).parse()
    nfa, start, end = _build_nfa(rules)

    start_set = _eps_closure(nfa, frozenset([start]))
    ids: dict[frozenset, int] = {start_set: 0}
    order = [start_set]
    trans_rows: list[np.ndarray] = []
    i = 0
    while i < len(order):
        cur = order[i]
        # outgoing byte sets: union per byte
        row = np.full(256, -1, np.int64)
        # collect (byteset, targets)
        per_byte_targets: dict = {}
        move = np.zeros((256,), object)
        targets_by_byte = [set() for _ in range(256)]
        for s in cur:
            for byteset, to in nfa.edges[s]:
                for b in np.nonzero(byteset)[0]:
                    targets_by_byte[b].add(to)
        for b in range(256):
            if targets_by_byte[b]:
                nxt = _eps_closure(nfa, frozenset(targets_by_byte[b]))
                if nxt not in ids:
                    ids[nxt] = len(order)
                    order.append(nxt)
                row[b] = ids[nxt]
        trans_rows.append(row)
        i += 1

    trans = np.stack(trans_rows).astype(np.int32)
    accept = np.array([end in st for st in order], bool)

    # trim states that cannot reach acceptance (prevents the decode loop
    # from being steered into dead ends)
    n = len(order)
    reach = accept.copy()
    changed = True
    while changed:
        changed = False
        can = reach[np.maximum(trans, 0)] & (trans >= 0)   # [S, 256]
        new = reach | can.any(axis=1)
        if (new != reach).any():
            reach = new
            changed = True
    dead = ~reach
    if dead[0]:
        raise ValueError("grammar accepts no strings")
    remap = np.cumsum(reach) - 1
    trans2 = trans[reach]
    bad = (trans2 < 0) | dead[np.maximum(trans2, 0)]
    trans2 = np.where(bad, -1, remap[np.maximum(trans2, 0)]).astype(np.int32)
    return CharDFA(trans=trans2, accept=accept[reach])


# ───────────────────────── token lifting ─────────────────────────


def _gpt2_byte_decoder() -> dict[str, int]:
    """Inverse of the GPT-2 byte-level BPE unicode mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


def token_bytes_from_hf(tok) -> tuple[list[bytes | None], int]:
    """Best-effort byte strings for every vocab id of a HuggingFace
    tokenizer (None = special/undecodable -> never allowed under a
    grammar). Handles byte-level BPE (GPT-2 style) and sentencepiece
    '▁' conventions."""
    vocab = tok.get_vocab()
    v = max(vocab.values()) + 1
    out: list[bytes | None] = [None] * v
    specials = set(getattr(tok, "all_special_tokens", []) or [])
    byte_level = any("\u0120" in t for t in list(vocab)[:2000]) or any(
        "\u0120" in t for t in vocab
    )
    bd = _gpt2_byte_decoder() if byte_level else None
    for t, i in vocab.items():
        if t in specials or i >= v:
            continue
        try:
            if bd is not None:
                out[i] = bytes(bd[c] for c in t)
            elif t.startswith("\u2581"):
                out[i] = (" " + t[1:].replace("\u2581", " ")).encode("utf-8")
            else:
                out[i] = t.replace("\u2581", " ").encode("utf-8")
        except (KeyError, UnicodeEncodeError):
            out[i] = None
    eos = getattr(tok, "eos_token_id", None)
    return out, (eos if eos is not None else v - 1)


class TokenGrammar:
    """A byte DFA lifted to token level for a fixed vocabulary.

    Attributes (numpy; callers move them to device once per generate):
    - ``trans [S, V] int32``: DFA state after consuming the token's
      bytes from each state; -1 = token not allowed.
    - ``mask [S, V] bool``: ``trans >= 0``, with the EOS column set to
      the state's acceptance flag (EOS is legal exactly when the output
      so far is a complete sentence of the grammar).
    """

    def __init__(self, dfa: CharDFA, token_bytes: list[bytes | None], eos_id: int):
        self.dfa = dfa
        self.eos_id = int(eos_id)
        s = dfa.n_states
        v = len(token_bytes)
        lens = np.array([len(b) if b else 0 for b in token_bytes], np.int32)
        lmax = max(1, int(lens.max()))
        tb = np.zeros((v, lmax), np.uint8)
        for i, b in enumerate(token_bytes):
            if b:
                tb[i, : len(b)] = np.frombuffer(b, np.uint8)
        usable = np.array([b is not None and len(b) > 0 for b in token_bytes])

        # vectorized lift: run every (state, token) pair through the
        # byte DFA, one numpy step per byte position
        cur = np.broadcast_to(np.arange(s, dtype=np.int32)[:, None], (s, v)).copy()
        for j in range(lmax):
            active = (j < lens)[None, :] & (cur >= 0)
            step = dfa.trans[np.maximum(cur, 0), tb[None, :, j]]
            cur = np.where(active, step, cur)
        cur = np.where(usable[None, :], cur, -1)
        if self.eos_id < v:
            cur[:, self.eos_id] = -1
        self.trans = cur.astype(np.int32)
        mask = self.trans >= 0
        if self.eos_id < v:
            mask[:, self.eos_id] = dfa.accept
        self.mask = mask

    @classmethod
    def from_gbnf(cls, gbnf: str, token_bytes, eos_id: int) -> "TokenGrammar":
        return cls(compile_gbnf(gbnf), token_bytes, eos_id)
