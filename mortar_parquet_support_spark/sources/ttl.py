"""Turtle (.ttl) graph source: parse RDF building models into a triples
DataFrame (SURVEY.md §2.1 S8, §1.2).

The reference delegates parsing to rdflib and storage to Oxigraph
(``/root/reference/mortar-parquet-client/setup-graphs.py:16-23``); neither is
available (nor wanted) here. Instead a small self-contained Turtle parser —
covering the grammar subset that rdflib's serializer emits and the Brick
corpus uses — loads each file driver-side (graphs are ≤ a few MB) into rows
``(site, subject, predicate, object, okind)``, and the union of all sites
becomes one Spark DataFrame (FIXTURES.md F3 + an object-kind discriminator).

Grammar subset: ``@prefix``/``PREFIX`` declarations; IRIREFs; prefixed names
(dots, slashes, ``%``-escapes in locals); ``a``; predicate lists ``;``;
object lists ``,``; anonymous blank nodes ``[ ... ]`` (nested); labeled blank
nodes ``_:x``; string literals (single/triple-quoted) with ``^^`` datatype /
``@lang`` suffixes; numeric + boolean literals; comments. RDF collections
``( ... )`` are parsed structurally into rdf:first/rest triples.

Representation choices (parity with the reference's stringified results,
``client.py:43,53``): IRIs are stored as plain URI strings, literals as their
lexical form, blank nodes as ``_:{site}:{label}`` (skolemized per-site so the
multi-site union never collides, SURVEY.md §7 R2 / ``setup-graphs.py:17-19``).
"""

from __future__ import annotations

import glob
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("site", T.StringType(), False),
        T.StructField("subject", T.StringType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("object", T.StringType(), False),
        T.StructField("okind", T.StringType(), False),  # iri | literal | bnode
    ]
)

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<comment>\#[^\n]*)
    | (?P<iriref><[^<>"{}|^`\\\s]*>)
    | (?P<string3>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\")
    | (?P<string3s>'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<string>"(?:[^"\\\n]|\\.)*")
    | (?P<strings>'(?:[^'\\\n]|\\.)*')
    | (?P<dtype>\^\^)
    | (?P<lang>@[a-zA-Z][a-zA-Z0-9-]*)
    | (?P<punct>[;,\[\]()])
    | (?P<pname>[^\s;,\[\]()"'#]+)
    """,
    re.VERBOSE,
)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments, verbatim algorithm."""
    inp, out = path, []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1) if inp.startswith("/") else inp.find("/")
            if i == -1:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:i])
                inp = inp[i:]
    return "".join(out)


def _rfc3986_resolve(base: str, ref: str) -> str:
    """RFC 3986 §5.2-5.3 reference resolution for schemes urljoin treats
    as opaque (urn:, tag:, ...). ``base`` must be absolute; ``ref`` must
    be a relative reference (the caller short-circuits absolute refs).
    Handles authority-relative (//h), absolute-path (/p), query-only
    (?q), fragment-only (#f), and same-document refs, plus ./.. dot
    segments — the ad-hoc string merge this replaces concatenated refs
    onto slashless base paths ('urn:isbn:X' + 'ch1' -> 'urn:isbn:Xch1')
    and mis-merged /p and ?q forms."""
    if ":" not in base:
        # a colon-less @base is itself a relative reference (malformed per
        # Turtle, which requires an absolute IRI) — degrade the way the
        # old urljoin path did instead of crashing the whole corpus load:
        # resolve under a pseudo-scheme, then strip it back off.
        return _rfc3986_resolve("rel:" + base, ref)[len("rel:"):]
    scheme, rest = base.split(":", 1)
    rest = rest.split("#", 1)[0]  # base fragment never survives resolution
    if "?" in rest:
        b_path, b_query = rest.split("?", 1)
        b_query = "?" + b_query
    else:
        b_path, b_query = rest, ""
    b_auth = ""
    if b_path.startswith("//"):
        m = re.match(r"//[^/?#]*", b_path)
        b_auth = m.group()
        b_path = b_path[len(b_auth) :]

    r_frag = ""
    if "#" in ref:
        ref, f = ref.split("#", 1)
        r_frag = "#" + f
    if "?" in ref:
        r_path, r_query = ref.split("?", 1)
        r_query = "?" + r_query
    else:
        r_path, r_query = ref, ""

    if r_path.startswith("//"):
        m = re.match(r"//[^/?#]*", r_path)
        t_auth = m.group()
        return scheme + ":" + t_auth + _remove_dot_segments(
            r_path[len(t_auth) :]
        ) + r_query + r_frag
    if not r_path:  # query-only / fragment-only / same-document
        return scheme + ":" + b_auth + b_path + (r_query or b_query) + r_frag
    if r_path.startswith("/"):
        t_path = _remove_dot_segments(r_path)
    else:
        if b_auth and not b_path:
            merged = "/" + r_path
        elif "/" in b_path:
            merged = b_path.rsplit("/", 1)[0] + "/" + r_path
        else:  # slashless opaque base path: ref replaces it (§5.3 merge)
            merged = r_path
        t_path = _remove_dot_segments(merged)
    return scheme + ":" + b_auth + t_path + r_query + r_frag


_STRING_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def decode_string_escapes(body: str) -> str:
    """THE ECHAR/UCHAR string-escape decoder — shared by the Turtle
    loader and the SPARQL compiler's FILTER-literal parser, which MUST
    decode byte-identically for literals to compare equal to stored TTL
    values (review r14: the two hand-synchronized copies are now one)."""

    def sub(m: "re.Match[str]") -> str:
        esc = m.group(1)
        if esc[0] == "u" or esc[0] == "U":
            return chr(int(esc[1:], 16))
        return _STRING_ESCAPES.get(esc, "\\" + esc)

    return re.sub(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)", sub, body)


@dataclass
class _Parser:
    text: str
    site: str
    pos: int = 0
    tokens: list[tuple[str, str]] = field(default_factory=list)
    prefixes: dict[str, str] = field(default_factory=dict)
    triples: list[tuple[str, str, str, str]] = field(default_factory=list)
    _bnode_n: int = 0
    base: str | None = None

    def _resolve_iri(self, raw: str) -> str:
        """Resolve a (possibly relative) IRIREF against the declared
        @base per RFC 3986. Without a base, relative IRIs pass through
        unchanged (historical behavior); silently storing them while a
        base was declared would corrupt every join against absolute IRIs.

        urljoin is a NO-OP for base schemes it doesn't treat as
        hierarchical (urn:, tag:, ...) — it would hand the relative ref
        back unchanged, the exact corruption this method exists to
        prevent — so those schemes get a manual RFC 3986 §5.3 merge.
        """
        import re as _re
        from urllib.parse import urljoin, uses_relative

        if not self.base or _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", raw):
            return raw
        scheme = self.base.split(":", 1)[0].lower()
        if scheme in uses_relative:
            return urljoin(self.base, raw)
        return _rfc3986_resolve(self.base, raw)

    # -- tokenization -----------------------------------------------------
    def _tokenize(self) -> None:
        for m in _TOKEN_RE.finditer(self.text):
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            tok = m.group()
            if kind == "pname":
                # A pname token may have swallowed the statement-terminating
                # '.' (an UNESCAPED dot can't end a Turtle local). Strip
                # only unescaped trailing dots: 'ex:foo\.' is a valid local
                # ENDING in a dot (PN_LOCAL_ESC) — its escaped dot is part
                # of the name, and rstrip would emit a spurious terminator
                # that fails the whole file.
                core, n_dots = tok, 0
                # a trailing dot is part of the local iff escaped ('\.');
                # PN_LOCAL_ESC never escapes a backslash itself, so a
                # preceding '\' always means the dot is escaped
                while core.endswith(".") and not core.endswith("\\."):
                    core = core[:-1]
                    n_dots += 1
                if core:
                    self.tokens.append(("pname", core))
                for _ in range(n_dots):
                    self.tokens.append(("dot", "."))
            else:
                self.tokens.append((kind, tok))

    # -- token helpers ----------------------------------------------------
    def _peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else ("eof", "")

    def _next(self):
        tok = self._peek()
        self.pos += 1
        return tok

    def _expect(self, kind: str):
        tok = self._next()
        if tok[0] != kind:
            raise ValueError(f"{self.site}: expected {kind}, got {tok} at {self.pos}")
        return tok

    def _fresh_bnode(self) -> str:
        self._bnode_n += 1
        # '#' cannot appear in a Turtle BLANK_NODE_LABEL, so generated
        # anonymous-node names can never collide with a document's OWN
        # labeled bnode (a file containing '_:gen1' plus one anonymous
        # [ ... ] node previously merged two distinct RDF nodes into one
        # — fabricated matches; review r14)
        return f"_:{self.site}:#gen{self._bnode_n}"

    # -- term expansion ---------------------------------------------------
    def _expand_pname(self, tok: str) -> str:
        if tok.startswith("_:"):
            return f"_:{self.site}:{tok[2:]}"
        if ":" not in tok:
            raise ValueError(f"{self.site}: not a prefixed name: {tok!r}")
        prefix, local = tok.split(":", 1)
        if prefix not in self.prefixes:
            raise ValueError(f"{self.site}: unknown prefix {prefix!r}")
        local = re.sub(r"\\(.)", r"\1", local)  # PN_LOCAL_ESC
        return self.prefixes[prefix] + local

    @classmethod
    def _unquote(cls, tok: str) -> str:
        """Decode Turtle string escapes in ONE pass. Sequential
        str.replace passes mis-decode an escaped backslash followed by
        n/t/r (e.g. the four chars \\\\n in 'C:\\\\new' became
        backslash+NEWLINE because the \\n replacement matched inside the
        \\\\ sequence). Also decodes \\uXXXX / \\UXXXXXXXX numeric
        escapes, which were previously left as raw text."""
        triple = tok.startswith('"""') or tok.startswith("'''")
        body = tok[3:-3] if triple else tok[1:-1]
        return decode_string_escapes(body)

    # -- grammar ----------------------------------------------------------
    def parse(self) -> list[tuple[str, str, str, str]]:
        self._tokenize()
        while self._peek()[0] != "eof":
            kind, tok = self._peek()
            if kind in ("pname", "lang") and tok.lower() in ("@prefix", "prefix"):
                self._next()
                _, pfx = self._expect("pname")
                _, iri = self._expect("iriref")
                # prefix IRIs resolve against @base too (RFC 3986)
                self.prefixes[pfx.rstrip(":")] = self._resolve_iri(iri[1:-1])
                if self._peek()[0] == "dot":
                    self._next()
            elif kind in ("pname", "lang") and tok.lower() in ("@base", "base"):
                self._next()
                _, iri = self._expect("iriref")
                # successive @base directives resolve against the previous
                self.base = self._resolve_iri(iri[1:-1]) if self.base else iri[1:-1]
                if self._peek()[0] == "dot":
                    self._next()
            else:
                subject = self._parse_subject()
                self._parse_predicate_object_list(subject)
                self._expect("dot")
        return self.triples

    def _parse_subject(self) -> str:
        kind, tok = self._next()
        if kind == "iriref":
            return self._resolve_iri(tok[1:-1])
        if kind == "pname":
            return self._expand_pname(tok)
        if kind == "punct" and tok == "[":
            node = self._fresh_bnode()
            if self._peek() != ("punct", "]"):
                self._parse_predicate_object_list(node)
            self._expect_punct("]")
            return node
        if kind == "punct" and tok == "(":
            # collections are valid SUBJECTS per the Turtle grammar
            # (subject ::= iri | BlankNode | collection); reuse the object
            # parser's rdf:first/rest expansion and return the list head
            node, _okind = self._parse_collection()
            return node
        raise ValueError(f"{self.site}: bad subject token {kind} {tok!r}")

    def _expect_punct(self, want: str) -> None:
        kind, tok = self._next()
        if kind != "punct" or tok != want:
            raise ValueError(f"{self.site}: expected {want!r}, got {kind} {tok!r}")

    def _parse_predicate_object_list(self, subject: str) -> None:
        while True:
            kind, tok = self._peek()
            if kind == "punct" and tok in ("]",):
                return
            if kind in ("dot", "eof"):
                return
            predicate = self._parse_predicate()
            self._parse_object_list(subject, predicate)
            if self._peek() == ("punct", ";"):
                while self._peek() == ("punct", ";"):
                    self._next()
                continue
            return

    def _parse_predicate(self) -> str:
        kind, tok = self._next()
        if kind == "pname" and tok == "a":
            return RDF_TYPE
        if kind == "iriref":
            return self._resolve_iri(tok[1:-1])
        if kind == "pname":
            return self._expand_pname(tok)
        raise ValueError(f"{self.site}: bad predicate token {kind} {tok!r}")

    def _parse_object_list(self, subject: str, predicate: str) -> None:
        while True:
            obj, okind = self._parse_object()
            self.triples.append((subject, predicate, obj, okind))
            if self._peek() == ("punct", ","):
                self._next()
                continue
            return

    def _parse_object(self) -> tuple[str, str]:
        kind, tok = self._next()
        if kind == "iriref":
            return self._resolve_iri(tok[1:-1]), "iri"
        if kind in ("string", "string3", "strings", "string3s"):
            value = self._unquote(tok)
            nkind, ntok = self._peek()
            if nkind == "dtype":  # "lex"^^<datatype> — keep the lexical form
                self._next()
                self._next()  # datatype iri/pname, dropped (stringified parity)
            elif nkind == "lang":
                self._next()
            return value, "literal"
        if kind == "punct" and tok == "[":
            node = self._fresh_bnode()
            if self._peek() != ("punct", "]"):
                self._parse_predicate_object_list(node)
            self._expect_punct("]")
            return node, "bnode"
        if kind == "punct" and tok == "(":
            return self._parse_collection()
        if kind == "pname":
            if tok.startswith("_:"):
                return self._expand_pname(tok), "bnode"
            if re.fullmatch(r"[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|true|false", tok):
                return tok, "literal"
            return self._expand_pname(tok), "iri"
        raise ValueError(f"{self.site}: bad object token {kind} {tok!r}")

    def _parse_collection(self) -> tuple[str, str]:
        items: list[tuple[str, str]] = []
        while self._peek() != ("punct", ")"):
            items.append(self._parse_object())
        self._next()  # ')'
        if not items:
            return RDF_NIL, "iri"
        head = self._fresh_bnode()
        node = head
        for i, (obj, okind) in enumerate(items):
            self.triples.append((node, RDF_FIRST, obj, okind))
            if i + 1 < len(items):
                nxt = self._fresh_bnode()
                self.triples.append((node, RDF_REST, nxt, "bnode"))
                node = nxt
            else:
                self.triples.append((node, RDF_REST, RDF_NIL, "iri"))
        return head, "bnode"


def parse_ttl(text: str, site: str) -> list[tuple[str, str, str, str, str]]:
    """Parse one Turtle document into ``(site, s, p, o, okind)`` rows."""
    parser = _Parser(text=text, site=site)
    return [(site, s, p, o, k) for (s, p, o, k) in parser.parse()]


def load_graph_dir(spark: SparkSession, graph_dir: str) -> DataFrame:
    """S8: load every ``*.ttl`` in ``graph_dir`` as one triples DataFrame,
    one named graph per file stem (``setup-graphs.py:16-23``: graph name
    ``urn:{stem}#`` -> our ``site`` column, SURVEY.md §1.2).

    Parsing happens driver-side (site graphs are small — the whole 45-graph
    corpus is ~88k lines); the resulting DataFrame is broadcast-sized and
    cached by callers. For graphs that DON'T fit a driver, the same parser
    can run distributed via ``spark.read.text(...).groupBy(file)`` +
    ``applyInPandas`` — not needed for this corpus.
    """
    rows: list[tuple[str, str, str, str, str]] = []
    for path in sorted(glob.glob(os.path.join(graph_dir, "*.ttl"))):
        site = os.path.splitext(os.path.basename(path))[0]
        with open(path, encoding="utf-8") as fh:
            rows.extend(parse_ttl(fh.read(), site))
    from mortar_parquet_support_spark.functions import tiny_frame

    return tiny_frame(spark, rows, TRIPLES_SCHEMA)
