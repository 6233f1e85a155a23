"""Minimal HTML tree with the traversal semantics the kernels need.

Go's x/net/html gives the reference a full node tree
(/root/reference/html.go:177, linkNodeParsing.go:48-53); Python has
no stdlib tree parser, so we build one on ``html.parser``. The tree
only needs to be faithful for: pre-order traversal, per-node
attribute lists (in source order), tag names (lowercase), and text
nodes (entity-decoded, adjacent runs merged) — which is exactly what
the link/keyword/text kernels consume. Corpus HTML is well-formed
(generator-controlled); lenient auto-closing is limited to void
elements and implicit <p> closes, pinned by tests.
"""

from __future__ import annotations

from html.parser import HTMLParser

TEXT = 0
ELEMENT = 1
COMMENT = 2

# HTML void elements: never pushed onto the open stack.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# Tags that implicitly close an open <p> (subset a crawler corpus hits).
_CLOSES_P = frozenset(
    "address article aside blockquote div dl fieldset footer form h1 h2 h3 "
    "h4 h5 h6 header hr main nav ol p pre section table ul".split()
)


class Node:
    __slots__ = ("type", "data", "attrs", "children")

    def __init__(self, type_: int, data: str, attrs: list[tuple[str, str]] | None = None):
        self.type = type_
        self.data = data  # tag name for elements, content for text
        self.attrs = attrs or []
        self.children: list[Node] = []

    def pre_order(self):
        # iterative (document pre-order): recursion via nested
        # generators cost ~10% of the extraction kernel (r6)
        stack = [self]
        pop = stack.pop
        while stack:
            n = pop()
            yield n
            c = n.children
            if c:
                stack.extend(c[::-1])

    def text_nodes(self):
        for n in self.pre_order():
            if n.type == TEXT:
                yield n


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(ELEMENT, "#document")
        self.stack = [self.root]

    # -- helpers ---------------------------------------------------
    def _top(self) -> Node:
        return self.stack[-1]

    def _append_text(self, data: str) -> None:
        top = self._top()
        # merge adjacent text nodes (Go's parser yields merged runs)
        if top.children and top.children[-1].type == TEXT:
            top.children[-1].data += data
        else:
            top.children.append(Node(TEXT, data))

    # -- parser callbacks ------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _CLOSES_P:
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].data == "p":
                    del self.stack[i:]
                    break
        node = Node(ELEMENT, tag, [(k, v if v is not None else "") for k, v in attrs])
        self._top().children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        node = Node(ELEMENT, tag, [(k, v if v is not None else "") for k, v in attrs])
        self._top().children.append(node)

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].data == tag:
                del self.stack[i:]
                return
        # stray end tag: ignored (lenient, like Go's parser)

    def handle_data(self, data: str) -> None:
        if data:
            self._append_text(data)

    def handle_comment(self, data: str) -> None:
        self._top().children.append(Node(COMMENT, data))


# ---- fast tokenizer for the strictly-simple subset (r6) --------------
#
# html.parser's pure-Python goahead loop is ~2/3 of the extraction
# kernel's CPU. For documents made ONLY of constructs whose tokenization
# is trivially unambiguous — no character references ('&'), comments,
# declarations, processing instructions, CDATA elements (script/style)
# or NULs, and every '<' opening a tag that matches a strict
# name/attribute grammar (single '=', quoted values without '<'/'>',
# unquoted values without quotes/'='/'<') — the token stream can be
# produced by one compiled-regex walk and fed to the SAME _TreeBuilder
# callbacks html.parser would call, so the resulting tree is identical
# by construction. ANY byte outside the subset bails out to html.parser
# for the whole page (return None), so fidelity on arbitrary input is
# unchanged. Equivalence is pinned by a differential fuzzer in
# tests/test_kernels.py (random nasty documents: fast path == parser
# path tree-for-tree).
import re as _re

_FAST_TAG = _re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)"
    r"((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s>'\"=<`]+))?)*)"
    r"\s*(/?)>"
)
_FAST_ATTR = _re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(\"[^\"<>]*\"|'[^'<>]*'|[^\s>'\"=<`]+))?"
)
# CDATA content elements: html.parser switches to CDATA tokenization
# for these (case-insensitively), which the fast grammar does not model
_CDATA_TAGS = frozenset(("script", "style"))


def _parse_fast(s: str) -> Node | None:
    """One-pass regex tokenization of the strict subset; None = bail.

    The only prefilter scan is for '&' (character references touch
    both text and attribute values); every other out-of-subset
    construct ('<!', '<?', malformed tags, script/style) is caught
    structurally — a '<' whose tag does not match the strict grammar,
    or a parsed name in _CDATA_TAGS, bails the whole page."""
    if "&" in s:
        return None
    builder = _TreeBuilder()
    data = builder.handle_data
    pos = 0
    n = len(s)
    find = s.find
    match = _FAST_TAG.match
    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            data(s[pos:])
            break
        if lt > pos:
            data(s[pos:lt])
        m = match(s, lt)
        if m is None:
            return None  # '<' outside the strict grammar — replay slow
        end, name, raw_attrs, selfclose = m.groups()
        name = name.lower()
        if name in _CDATA_TAGS:
            return None
        if end:
            if selfclose or raw_attrs.strip():
                return None  # end tag with attrs/slash: parser-specific recovery
            builder.handle_endtag(name)
        else:
            if raw_attrs:
                attrs = []
                for a in _FAST_ATTR.finditer(raw_attrs):
                    k, v = a.groups()
                    if v is not None and v[0] in "\"'":
                        v = v[1:-1]
                    attrs.append((k.lower(), v))
            else:
                attrs = []
            if selfclose:
                builder.handle_startendtag(name, attrs)
            else:
                builder.handle_starttag(name, attrs)
        pos = m.end()
    return builder.root


def parse_html(html_bytes: bytes) -> Node:
    """Parse UTF-8 HTML bytes into a Node tree (root = #document)."""
    s = html_bytes.decode("utf-8", errors="replace")
    root = _parse_fast(s)
    if root is not None:
        return root
    builder = _TreeBuilder()
    builder.feed(s)
    builder.close()
    return builder.root
