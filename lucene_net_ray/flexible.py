"""Flexible query parser analog: StandardQueryParser + PrecedenceQueryParser.

Reference surface:
  /root/reference/src/Lucene.Net.QueryParser/Flexible/Standard/StandardQueryParser.cs
  /root/reference/src/Lucene.Net.QueryParser/Flexible/Standard/Processors/*.cs
  /root/reference/src/Lucene.Net.Tests.QueryParser/Flexible/Precedence/PrecedenceQueryParser.cs

The point of the reference's "flexible" framework (vs the classic parser) is
its three-phase, pluggable architecture: a syntax parser produces a
query-NODE tree with no analysis applied; a configurable PROCESSOR PIPELINE
rewrites the tree (wildcard classification, numeric configs, analysis,
default-operator modifiers, ...); BUILDERS then lower nodes to real queries.
This module mirrors those phases clean-room:

  parse text -> node tree -> [processor, ...] -> Query dataclasses

so every processor is a plain ``tree -> tree`` function users can remove,
reorder, or extend via ``parser.pipeline`` — the same extension seam as the
reference's ``StandardQueryNodeProcessorPipeline.cs``.

Semantics pinned from the reference sources (not copied):
  * grammar precedence — AND binds tighter than OR, juxtaposition loosest
    (Standard/Parser/StandardSyntaxParser.cs grammar productions);
  * StandardQueryParser FLATTENS that precedence again unless a group
    intervenes (Processors/BooleanQuery2ModifierNodeProcessor.cs:
    nested BooleanQueryNode under BooleanQueryNode is tagged TAG_REMOVE,
    AND children and — under default-AND — plain-boolean children get
    MOD_REQ);
  * PrecedenceQueryParser KEEPS the precedence tree and only applies
    modifiers (Flexible/Precedence/Processors/BooleanModifiersQueryNodeProcessor.cs);
  * NOT is a modifier like '-' (MOD_NOT), not classic's MatchAll-AND-NOT;
  * exclusive range endpoints '{..}' are supported (TermRangeQueryNodeProcessor);
  * '*' endpoints mean unbounded (OpenRangeQueryNodeProcessor);
  * leading wildcards raise unless allowed (AllowLeadingWildcardProcessor);
  * expanded terms (wildcard/prefix/fuzzy/range/regex) are lowercased when
    ``lowercase_expanded_terms`` (LowercaseExpandedTermsQueryNodeProcessor);
  * fields configured numeric turn terms/ranges into docvalues range
    filters (NumericQueryNodeProcessor / NumericRangeQueryNodeProcessor);
  * fieldless clauses expand across ``multi_fields`` with per-field boosts
    (MultiFieldQueryNodeProcessor, StandardQueryParser.SetMultiFields).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field, replace

from .query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    FieldRangeFilter,
    FilteredQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    QueryParseError,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    _with_boost,
)

# ---------------------------------------------------------------------------
# Query-node tree (Flexible/Core/Nodes analog)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Node:
    pass


@dataclass(frozen=True)
class FieldNode(Node):
    """Unanalyzed field:text leaf (Core/Nodes/FieldQueryNode.cs)."""

    field: str | None
    text: str


@dataclass(frozen=True)
class AnalyzedTermNode(Node):
    """A single post-analysis term (produced by the analyzer processor)."""

    field: str | None
    term: str


@dataclass(frozen=True)
class QuotedNode(Node):
    """Quoted phrase, slop=None until the default-slop processor runs
    (Core/Nodes/QuotedFieldQueryNode.cs + SlopQueryNode.cs)."""

    field: str | None
    text: str
    slop: int | None = None


@dataclass(frozen=True)
class PhraseNode(Node):
    """Post-analysis phrase (terms + increments-aware positions)."""

    field: str | None
    terms: tuple[str, ...]
    positions: tuple[int, ...]
    slop: int | None = None


@dataclass(frozen=True)
class RangeNode(Node):
    """Raw term range; '*' endpoints already mapped to None
    (Standard/Nodes/TermRangeQueryNode.cs)."""

    field: str | None
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class NumericRangeNode(Node):
    """Range over a numeric-configured field
    (Standard/Nodes/NumericRangeQueryNode.cs)."""

    field: str
    lower: float | int | None
    upper: float | int | None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class FuzzyNode(Node):
    field: str | None
    text: str
    max_edits: int | None = None  # None -> parser config default


@dataclass(frozen=True)
class WildcardNode(Node):
    field: str | None
    pattern: str


@dataclass(frozen=True)
class PrefixNode(Node):
    """Trailing-*-only wildcard (Standard/Nodes/PrefixWildcardQueryNode.cs)."""

    field: str | None
    prefix: str


@dataclass(frozen=True)
class RegexNode(Node):
    field: str | None
    pattern: str


@dataclass(frozen=True)
class MatchAllNode(Node):
    pass


@dataclass(frozen=True)
class GroupNode(Node):
    """Parenthesized group — the flattening boundary
    (Core/Nodes/GroupQueryNode.cs)."""

    child: Node = None


@dataclass(frozen=True)
class BooleanNode(Node):
    """Juxtaposition sequence (Core/Nodes/BooleanQueryNode.cs)."""

    children: tuple[Node, ...] = ()


@dataclass(frozen=True)
class AnalyzedBooleanNode(BooleanNode):
    """Multi-token analyzer expansion (Standard/Nodes/StandardBooleanQueryNode.cs).

    Distinct from plain BooleanNode on purpose: the reference's
    BooleanQuery2ModifierNodeProcessor applies default-AND MOD_REQ only to
    children of the EXACT BooleanQueryNode type (IsDefaultBooleanQueryNode
    does a GetType() equality check), so a term that analyzes into several
    tokens keeps OR semantics among those tokens even under default-AND."""


@dataclass(frozen=True)
class AndNode(BooleanNode):
    pass


@dataclass(frozen=True)
class OrNode(BooleanNode):
    pass


@dataclass(frozen=True)
class ModifierNode(Node):
    """MOD_REQ ('+') / MOD_NOT ('-'/NOT) wrapper
    (Core/Nodes/ModifierQueryNode.cs)."""

    child: Node = None
    mod: str = "REQ"  # "REQ" | "NOT"


@dataclass(frozen=True)
class BoostNode(Node):
    child: Node = None
    boost: float = 1.0


# ---------------------------------------------------------------------------
# Syntax parser (StandardSyntaxParser.cs analog) — NO analysis here
# ---------------------------------------------------------------------------

_FLEX_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<and>AND\b|&&) | (?P<or>OR\b|\|\|) | (?P<not>NOT\b|!) |
        (?P<plus>\+) | (?P<minus>-) |
        (?P<range>[A-Za-z0-9_.]*:?[\[\{][^\]\}]*\ TO\ [^\]\}]*[\]\}](?:\^[0-9.]+)?) |
        (?P<phrase>[A-Za-z0-9_.]*:?"[^"]*"(?:~\d+)?(?:\^[0-9.]+)?) |
        (?P<regex>[^\s()+\-/]*:?/[^/]+/(?:\^[0-9.]+)?) |
        (?P<atom>[^\s()+\-!][^\s()]*)
    )""",
    re.VERBOSE,
)


def _lex(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        if s[i].isspace():
            i += 1
            continue
        m = _FLEX_TOKEN_RE.match(s, i)
        if not m or m.end() == i:
            raise QueryParseError(f"cannot lex flexible query at {i}: {s[i:]!r}")
        i = m.end()
        out.append((m.lastgroup, m.group(m.lastgroup)))
    return out


def _split_boost(text: str) -> tuple[str, float | None]:
    m = re.match(r"^(.*)\^([0-9]*\.?[0-9]+)$", text, re.DOTALL)
    if m and m.group(1):
        return m.group(1), float(m.group(2))
    return text, None


def _split_field(text: str) -> tuple[str | None, str]:
    if ":" in text:
        f, rest = text.split(":", 1)
        if f and rest:
            return f, rest
    return None, text


def parse_to_nodes(s: str) -> Node:
    """Syntax-parse to the raw node tree. Grammar (StandardSyntaxParser.cs):

        query := disj+                  (juxtaposition -> BooleanNode)
        disj  := conj (OR conj)*        (-> OrNode)
        conj  := modcl (AND modcl)*     (-> AndNode)
        modcl := (+|-|NOT)? clause
        clause:= '(' query ')' boost? | range | phrase | regex | atom
    """
    tokens = _lex(s)
    pos = [0]

    def peek():
        return tokens[pos[0]] if pos[0] < len(tokens) else (None, None)

    def advance():
        t = tokens[pos[0]]
        pos[0] += 1
        return t

    def parse_query() -> Node:
        items = [parse_disj()]
        while peek()[0] not in (None, "rparen"):
            items.append(parse_disj())
        return items[0] if len(items) == 1 else BooleanNode(children=tuple(items))

    def parse_disj() -> Node:
        items = [parse_conj()]
        while peek()[0] == "or":
            advance()
            items.append(parse_conj())
        return items[0] if len(items) == 1 else OrNode(children=tuple(items))

    def parse_conj() -> Node:
        items = [parse_modcl()]
        while peek()[0] == "and":
            advance()
            items.append(parse_modcl())
        return items[0] if len(items) == 1 else AndNode(children=tuple(items))

    def parse_modcl() -> Node:
        kind, _ = peek()
        if kind == "plus":
            advance()
            return ModifierNode(child=parse_clause(), mod="REQ")
        if kind in ("minus", "not"):
            advance()
            return ModifierNode(child=parse_clause(), mod="NOT")
        return parse_clause()

    def parse_clause() -> Node:
        kind, text = peek()
        if kind == "lparen":
            advance()
            inner = parse_query()
            if peek()[0] != "rparen":
                raise QueryParseError("unbalanced parentheses in flexible query")
            advance()
            node: Node = GroupNode(child=inner)
            k2, t2 = peek()
            if k2 == "atom" and t2.startswith("^"):
                advance()
                try:
                    node = BoostNode(child=node, boost=float(t2[1:]))
                except ValueError as e:
                    raise QueryParseError(f"bad boost {t2!r}") from e
            return node
        if kind is None:
            raise QueryParseError("empty flexible query")
        advance()
        if kind == "range":
            return _range_node(text)
        if kind == "phrase":
            return _phrase_node(text)
        if kind == "regex":
            text, boost = _split_boost(text)
            fld = None
            if not text.startswith("/"):
                fld, text = text.split(":", 1)
            node = RegexNode(field=fld, pattern=text[1:-1])
            return BoostNode(child=node, boost=boost) if boost else node
        if kind == "atom":
            return _atom_node(text)
        raise QueryParseError(f"unexpected token {kind} in flexible query")

    node = parse_query()
    if pos[0] != len(tokens):
        raise QueryParseError(f"trailing input at token {pos[0]}")
    return node


def _range_node(text: str) -> Node:
    text, boost = _split_boost(text)
    fld, body = _split_field(text)
    inc_lo = body[0] == "["
    inc_hi = body[-1] == "]"
    lo, hi = body[1:-1].split(" TO ")
    lo, hi = lo.strip(), hi.strip()
    node: Node = RangeNode(
        field=fld,
        lower=None if lo in ("*", "") else lo,
        upper=None if hi in ("*", "") else hi,
        include_lower=inc_lo,
        include_upper=inc_hi,
    )
    return BoostNode(child=node, boost=boost) if boost else node


def _phrase_node(text: str) -> Node:
    text, boost = _split_boost(text)
    fld = None
    if not text.startswith('"'):
        fld, text = text.split(":", 1)
    m = re.match(r'^"(.*)"(?:~(\d+))?$', text, re.DOTALL)
    if not m:
        raise QueryParseError(f"bad phrase {text!r}")
    node: Node = QuotedNode(field=fld, text=m.group(1), slop=int(m.group(2)) if m.group(2) else None)
    return BoostNode(child=node, boost=boost) if boost else node


def _atom_node(text: str) -> Node:
    text, boost = _split_boost(text)
    fld, body = _split_field(text)
    node: Node
    if fld == "*" and body == "*":
        node = MatchAllNode()
    else:
        m = re.match(r"^(.+)~(\d*)$", body)
        if m:
            node = FuzzyNode(field=fld, text=m.group(1), max_edits=int(m.group(2)) if m.group(2) else None)
        else:
            node = FieldNode(field=fld, text=body)
    return BoostNode(child=node, boost=boost) if boost else node


# ---------------------------------------------------------------------------
# Processors — each a (node, cfg) -> node|None pure rewrite
# ---------------------------------------------------------------------------


def _map_children(node: Node, fn) -> Node:
    """Rebuild ``node`` with ``fn`` applied to each child; drop None."""
    if isinstance(node, BooleanNode):
        kids = tuple(c for c in (fn(ch) for ch in node.children) if c is not None)
        return replace(node, children=kids)
    if isinstance(node, (GroupNode, ModifierNode, BoostNode)):
        child = fn(node.child)
        return None if child is None else replace(node, child=child)
    return node


def _walk(node: Node, leaf_fn, cfg) -> Node | None:
    """Bottom-up rewrite: recurse, then apply leaf_fn to every node."""
    rebuilt = _map_children(node, lambda ch: _walk(ch, leaf_fn, cfg))
    if rebuilt is None:
        return None
    return leaf_fn(rebuilt, cfg)


def proc_wildcard(tree: Node, cfg) -> Node:
    """WildcardQueryNodeProcessor.cs: classify FieldNode text containing
    '*'/'?' into Prefix/Wildcard nodes; lone '*' over a field -> field
    exists wildcard."""

    def leaf(n: Node, cfg) -> Node:
        if isinstance(n, FieldNode) and ("*" in n.text or "?" in n.text):
            t = n.text
            if t.endswith("*") and "*" not in t[:-1] and "?" not in t:
                return PrefixNode(field=n.field, prefix=t[:-1])
            return WildcardNode(field=n.field, pattern=t)
        return n

    return _walk(tree, leaf, cfg)


def proc_fuzzy(tree: Node, cfg) -> Node:
    """FuzzyQueryNodeProcessor.cs: fill config default edits; cap at 2
    (the reference's LevenshteinAutomata ceiling, FuzzyQuery.cs:59)."""

    def leaf(n: Node, cfg) -> Node:
        if isinstance(n, FuzzyNode):
            edits = n.max_edits if n.max_edits is not None else cfg.fuzzy_max_edits
            return replace(n, max_edits=min(int(edits), 2))
        return n

    return _walk(tree, leaf, cfg)


def proc_numeric(tree: Node, cfg) -> Node:
    """NumericQueryNodeProcessor.cs + NumericRangeQueryNodeProcessor.cs:
    fields in cfg.numeric_fields turn exact terms into point ranges and
    term ranges into numeric ranges over docvalues."""
    if not cfg.numeric_fields:
        return tree

    def conv(field: str, s: str | None):
        if s is None:
            return None
        kind = cfg.numeric_fields[field]
        try:
            return float(s) if kind in ("double", "float") else int(s)
        except ValueError as e:
            raise QueryParseError(f"bad numeric value {s!r} for field {field!r}") from e

    def leaf(n: Node, cfg) -> Node:
        if isinstance(n, FieldNode) and n.field in cfg.numeric_fields:
            v = conv(n.field, n.text)
            return NumericRangeNode(field=n.field, lower=v, upper=v)
        if isinstance(n, RangeNode) and n.field in cfg.numeric_fields:
            return NumericRangeNode(
                field=n.field,
                lower=conv(n.field, n.lower),
                upper=conv(n.field, n.upper),
                include_lower=n.include_lower,
                include_upper=n.include_upper,
            )
        return n

    return _walk(tree, leaf, cfg)


def proc_lowercase_expanded(tree: Node, cfg) -> Node:
    """LowercaseExpandedTermsQueryNodeProcessor.cs: lowercase the text of
    wildcard/prefix/fuzzy/range/regex nodes (terms that bypass analysis)."""
    if not cfg.lowercase_expanded_terms:
        return tree

    def leaf(n: Node, cfg) -> Node:
        if isinstance(n, WildcardNode):
            return replace(n, pattern=n.pattern.lower())
        if isinstance(n, PrefixNode):
            return replace(n, prefix=n.prefix.lower())
        if isinstance(n, FuzzyNode):
            return replace(n, text=n.text.lower())
        if isinstance(n, RangeNode):
            return replace(
                n,
                lower=n.lower.lower() if n.lower is not None else None,
                upper=n.upper.lower() if n.upper is not None else None,
            )
        if isinstance(n, RegexNode):
            return replace(n, pattern=n.pattern.lower())
        return n

    return _walk(tree, leaf, cfg)


def proc_allow_leading_wildcard(tree: Node, cfg) -> Node:
    """AllowLeadingWildcardProcessor.cs: reject '*foo'/'?foo' unless
    explicitly allowed."""
    if cfg.allow_leading_wildcard:
        return tree

    def leaf(n: Node, cfg) -> Node:
        if isinstance(n, WildcardNode) and n.pattern[:1] in ("*", "?"):
            raise QueryParseError(f"leading wildcard not allowed: {n.pattern!r}")
        return n

    return _walk(tree, leaf, cfg)


def proc_analyzer(tree: Node, cfg) -> Node | None:
    """AnalyzerQueryNodeProcessor.cs: run the analyzer over FieldNode /
    QuotedNode text. 0 tokens -> node removed; 1 token -> term; n tokens ->
    plain BooleanNode (juxtaposition — the default operator applies to it,
    like the reference); quoted -> PhraseNode with analyzer positions."""

    def leaf(n: Node, cfg) -> Node | None:
        if isinstance(n, FieldNode):
            terms = cfg.analyzer(n.text)
            if not terms:
                return None
            if len(terms) == 1:
                return AnalyzedTermNode(field=n.field, term=terms[0])
            return AnalyzedBooleanNode(
                children=tuple(AnalyzedTermNode(field=n.field, term=t) for t in terms)
            )
        if isinstance(n, QuotedNode):
            terms, positions = cfg.analyzer.analyze_text_positions(n.text)
            if not terms:
                return None
            if len(terms) == 1:
                return AnalyzedTermNode(field=n.field, term=terms[0])
            return PhraseNode(
                field=n.field, terms=tuple(terms), positions=tuple(positions), slop=n.slop
            )
        return n

    return _walk(tree, leaf, cfg)


def proc_default_phrase_slop(tree: Node, cfg) -> Node:
    """DefaultPhraseSlopQueryNodeProcessor.cs: phrases without an explicit
    ~slop get the configured default."""

    def leaf(n: Node, cfg) -> Node:
        if isinstance(n, PhraseNode) and n.slop is None:
            return replace(n, slop=cfg.phrase_slop)
        return n

    return _walk(tree, leaf, cfg)


_LEAF_FIELDED = (
    FieldNode,
    AnalyzedTermNode,
    QuotedNode,
    PhraseNode,
    RangeNode,
    FuzzyNode,
    WildcardNode,
    PrefixNode,
    RegexNode,
)


def proc_multi_field(tree: Node, cfg) -> Node:
    """MultiFieldQueryNodeProcessor.cs: fieldless leaves expand to a group
    of per-field copies OR'd together, with per-field boosts
    (StandardQueryParser.SetMultiFields + QueryParserUtil.cs)."""
    if not cfg.multi_fields:
        return tree

    def leaf(n: Node, cfg) -> Node:
        if isinstance(n, _LEAF_FIELDED) and n.field is None:
            copies = []
            for f in cfg.multi_fields:
                c: Node = replace(n, field=f)
                b = cfg.field_boosts.get(f)
                if b is not None and b != 1.0:
                    c = BoostNode(child=c, boost=b)
                copies.append(c)
            if len(copies) == 1:
                return copies[0]
            return GroupNode(child=OrNode(children=tuple(copies)))
        return n

    return _walk(tree, leaf, cfg)


def proc_default_field(tree: Node, cfg) -> Node:
    """Assign the parse-call default field to any still-fieldless leaf."""

    def leaf(n: Node, cfg) -> Node:
        if isinstance(n, _LEAF_FIELDED) and n.field is None:
            return replace(n, field=cfg._default_field)
        return n

    return _walk(tree, leaf, cfg)


def proc_boolean_flatten_modifiers(tree: Node, cfg) -> Node:
    """BooleanQuery2ModifierNodeProcessor.cs (StandardQueryParser):
    remove the grammar's precedence by flattening nested boolean nodes that
    are not separated by a GroupNode, applying MOD_REQ to children whose
    (pre-flatten) parent is an AndNode — or any plain BooleanNode when the
    default operator is AND."""
    using_and = cfg.default_operator == "and"

    def process(n: Node) -> Node:
        # recurse through non-boolean wrappers first
        if isinstance(n, GroupNode):
            return GroupNode(child=process(n.child))
        if isinstance(n, ModifierNode):
            return replace(n, child=process(n.child))
        if isinstance(n, BoostNode):
            return replace(n, child=process(n.child))
        if not isinstance(n, BooleanNode):
            return n
        flat: list[Node] = []

        def collect(parent: BooleanNode, kids: tuple[Node, ...]):
            req_here = isinstance(parent, AndNode) or (
                using_and and type(parent) is BooleanNode
            )
            for ch in kids:
                if isinstance(ch, BooleanNode):
                    collect(ch, ch.children)
                    continue
                ch = process(ch)
                if isinstance(ch, ModifierNode):
                    flat.append(ch)
                elif req_here:
                    flat.append(ModifierNode(child=ch, mod="REQ"))
                else:
                    flat.append(ch)

        collect(n, n.children)
        return BooleanNode(children=tuple(flat))

    return process(tree)


def proc_boolean_precedence_modifiers(tree: Node, cfg) -> Node:
    """BooleanModifiersQueryNodeProcessor.cs (PrecedenceQueryParser): KEEP
    the precedence tree; AndNode children -> MOD_REQ, plain BooleanNode
    children -> MOD_REQ under default-AND, OrNode children untouched."""
    using_and = cfg.default_operator == "and"

    def process(n: Node) -> Node:
        if isinstance(n, GroupNode):
            return GroupNode(child=process(n.child))
        if isinstance(n, ModifierNode):
            return replace(n, child=process(n.child))
        if isinstance(n, BoostNode):
            return replace(n, child=process(n.child))
        if not isinstance(n, BooleanNode):
            return n
        # reference condition: AndQueryNode always; under default-AND, any
        # boolean that is not an OrQueryNode (subclasses INCLUDED here,
        # unlike the Standard flatten processor's exact-type check)
        req_here = isinstance(n, AndNode) or (using_and and not isinstance(n, OrNode))
        kids = []
        for ch in n.children:
            ch = process(ch)
            if req_here and not isinstance(ch, ModifierNode):
                ch = ModifierNode(child=ch, mod="REQ")
            kids.append(ch)
        return replace(n, children=tuple(kids))

    return process(tree)


def proc_simplify(tree: Node, cfg) -> Node | None:
    """BooleanSingleChildOptimizationQueryNodeProcessor.cs +
    RemoveEmptyNonLeafQueryNodeProcessor.cs: unwrap single-child booleans
    and groups, drop empty booleans."""

    def leaf(n: Node, cfg) -> Node | None:
        if isinstance(n, BooleanNode):
            if not n.children:
                return None
            if len(n.children) == 1 and not isinstance(n.children[0], ModifierNode):
                return n.children[0]
        if isinstance(n, GroupNode):
            return n.child
        return n

    return _walk(tree, leaf, cfg)


# ---------------------------------------------------------------------------
# Builders (Standard/Builders analog): node tree -> Query dataclasses
# ---------------------------------------------------------------------------


def build_query(node: Node) -> Query:
    if isinstance(node, AnalyzedTermNode):
        return TermQuery(field=node.field, term=node.term)
    if isinstance(node, PhraseNode):
        return PhraseQuery(
            field=node.field,
            terms=node.terms,
            positions=node.positions,
            slop=node.slop or 0,
        )
    if isinstance(node, PrefixNode):
        return PrefixQuery(field=node.field, prefix=node.prefix)
    if isinstance(node, WildcardNode):
        return WildcardQuery(field=node.field, pattern=node.pattern)
    if isinstance(node, RegexNode):
        return RegexpQuery(field=node.field, pattern=node.pattern)
    if isinstance(node, FuzzyNode):
        return FuzzyQuery(field=node.field, term=node.text, max_edits=node.max_edits or 2)
    if isinstance(node, RangeNode):
        return TermRangeQuery(
            field=node.field,
            lower=node.lower,
            upper=node.upper,
            include_lower=node.include_lower,
            include_upper=node.include_upper,
        )
    if isinstance(node, NumericRangeNode):
        return FilteredQuery(
            query=MatchAllDocsQuery(),
            filter=FieldRangeFilter(
                field=node.field,
                lower=node.lower,
                upper=node.upper,
                include_lower=node.include_lower,
                include_upper=node.include_upper,
            ),
        )
    if isinstance(node, MatchAllNode):
        return MatchAllDocsQuery()
    if isinstance(node, BoostNode):
        return _with_boost(build_query(node.child), node.boost)
    if isinstance(node, GroupNode):
        return build_query(node.child)
    if isinstance(node, ModifierNode):
        # a bare top-level modifier: wrap into a one-clause boolean
        occur = MUST if node.mod == "REQ" else MUST_NOT
        return BooleanQuery(clauses=(BooleanClause(build_query(node.child), occur),))
    if isinstance(node, BooleanNode):
        clauses = []
        for ch in node.children:
            if isinstance(ch, ModifierNode):
                occur = MUST if ch.mod == "REQ" else MUST_NOT
                clauses.append(BooleanClause(build_query(ch.child), occur))
            else:
                clauses.append(BooleanClause(build_query(ch), SHOULD))
        return BooleanQuery(clauses=tuple(clauses))
    raise QueryParseError(f"cannot build query from node {node!r}")


# ---------------------------------------------------------------------------
# Parsers
# ---------------------------------------------------------------------------


class StandardQueryParser:
    """StandardQueryParser.cs analog. Configure, then ``parse(text, field)``.

    The processor pipeline is a public list of ``(tree, cfg) -> tree``
    callables — remove/insert/reorder entries to customize, the same seam as
    the reference's ``SetQueryNodeProcessor`` /
    ``StandardQueryNodeProcessorPipeline``.
    """

    #: processors that run before the operator/modifier phase
    _PRE = (
        proc_wildcard,
        proc_fuzzy,
        proc_numeric,
        proc_lowercase_expanded,
        proc_allow_leading_wildcard,
        proc_analyzer,
        proc_default_phrase_slop,
        proc_multi_field,
        proc_default_field,
    )

    def __init__(self, analyzer=None):
        from .functions.analysis import Analyzer

        self.analyzer = analyzer or Analyzer()
        self.default_operator = "or"  # "or" | "and"
        self.allow_leading_wildcard = False
        self.lowercase_expanded_terms = True
        self.fuzzy_max_edits = 2
        self.phrase_slop = 0
        self.multi_fields: tuple[str, ...] | None = None
        self.field_boosts: dict[str, float] = {}
        self.numeric_fields: dict[str, str] = {}  # field -> "long" | "double"
        self._default_field = "content"
        self.pipeline = list(self._PRE) + [
            proc_boolean_flatten_modifiers,
            proc_simplify,
        ]

    # -- configuration setters mirroring the reference API ------------------
    def set_default_operator(self, op: str):
        if op not in ("or", "and"):
            raise ValueError("operator must be 'or' or 'and'")
        self.default_operator = op
        return self

    def set_multi_fields(self, fields, boosts: dict[str, float] | None = None):
        self.multi_fields = tuple(fields) if fields else None
        self.field_boosts = dict(boosts or {})
        return self

    def set_numeric_config(self, field: str, kind: str = "long"):
        self.numeric_fields[field] = kind
        return self

    def parse(self, text: str, default_field: str = "content") -> Query:
        self._default_field = default_field
        tree = parse_to_nodes(text)
        for proc in self.pipeline:
            tree = proc(tree, self)
            if tree is None:
                raise QueryParseError("query reduced to nothing (all stopwords?)")
        return build_query(tree)


class PrecedenceQueryParser(StandardQueryParser):
    """PrecedenceQueryParser.cs analog: identical surface, but AND/OR
    precedence from the grammar is PRESERVED in the built query instead of
    flattened (BooleanModifiersQueryNodeProcessor instead of
    BooleanQuery2ModifierNodeProcessor)."""

    def __init__(self, analyzer=None):
        super().__init__(analyzer)
        self.pipeline = list(self._PRE) + [
            proc_boolean_precedence_modifiers,
            proc_simplify,
        ]


def parse_flexible(
    text: str,
    default_field: str = "content",
    analyzer=None,
    default_operator: str = "or",
    **cfg,
) -> Query:
    """One-shot helper over StandardQueryParser."""
    p = StandardQueryParser(analyzer)
    p.set_default_operator(default_operator)
    for k, v in cfg.items():
        setattr(p, k, v)
    return p.parse(text, default_field)
