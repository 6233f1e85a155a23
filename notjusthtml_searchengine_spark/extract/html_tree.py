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
        # Elements carrying an href/src attribute, in creation order —
        # which IS document pre-order of elements, so the link kernel
        # can skip the full-tree re-walk (r6). Collected identically by
        # the fast tokenizer below.
        self.link_nodes: list[Node] = []

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
        for k, _ in node.attrs:
            if k == "href" or k == "src":
                self.link_nodes.append(node)
                break
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        node = Node(ELEMENT, tag, [(k, v if v is not None else "") for k, v in attrs])
        self._top().children.append(node)
        for k, _ in node.attrs:
            if k == "href" or k == "src":
                self.link_nodes.append(node)
                break

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


def _parse_fast(s: str) -> tuple[Node, list[Node]] | None:
    """One-pass regex tokenization of the strict subset; None = bail.

    Returns ``(root, link_nodes)`` — the same tree _TreeBuilder would
    produce plus the href/src-carrying elements in document pre-order
    (creation order), matching ``_TreeBuilder.link_nodes``.

    The tokenizer and tree builder are FUSED (r6): the per-tag
    callback indirection through HTMLParser-style handlers was ~25% of
    the parse wall at corpus tag densities, and every branch below is
    a line-for-line transcription of the corresponding _TreeBuilder
    handler, so the tree is identical by construction (pinned by the
    differential fuzzer + corpus tree-equality tests).

    The only prefilter scan is for '&' (character references touch
    both text and attribute values); every other out-of-subset
    construct ('<!', '<?', malformed tags, script/style) is caught
    structurally — a '<' whose tag does not match the strict grammar,
    or a parsed name in _CDATA_TAGS, bails the whole page."""
    if "&" in s:
        return None
    root = Node(ELEMENT, "#document")
    stack = [root]
    top = root
    link_nodes: list[Node] = []
    pos = 0
    n = len(s)
    find = s.find
    match = _FAST_TAG.match
    attr_iter = _FAST_ATTR.finditer
    void = _VOID
    closes_p = _CLOSES_P
    cdata = _CDATA_TAGS
    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            lt = n
        if lt > pos:
            # handle_data + _append_text: merge adjacent text runs
            c = top.children
            if c and c[-1].type == TEXT:
                c[-1].data += s[pos:lt]
            else:
                c.append(Node(TEXT, s[pos:lt]))
            if lt == n:
                break
        m = match(s, lt)
        if m is None:
            return None  # '<' outside the strict grammar — replay slow
        end, name, raw_attrs, selfclose = m.groups()
        name = name.lower()
        if name in cdata:
            return None
        if end:
            if selfclose or raw_attrs.strip():
                return None  # end tag with attrs/slash: parser-specific recovery
            # handle_endtag: pop to the matching open tag, else ignore
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].data == name:
                    del stack[i:]
                    top = stack[-1]
                    break
        else:
            if raw_attrs:
                attrs = []
                is_link = False
                for a in attr_iter(raw_attrs):
                    k, v = a.groups()
                    if v is None:
                        v = ""
                    elif v[0] in "\"'":
                        v = v[1:-1]
                    k = k.lower()
                    if k == "href" or k == "src":
                        is_link = True
                    attrs.append((k, v))
            else:
                attrs = []
                is_link = False
            if selfclose:
                # handle_startendtag: append, never pushed, no <p> close
                node = Node(ELEMENT, name, attrs)
                top.children.append(node)
            else:
                # handle_starttag: implicit <p> close, push unless void
                if name in closes_p:
                    for i in range(len(stack) - 1, 0, -1):
                        if stack[i].data == "p":
                            del stack[i:]
                            top = stack[-1]
                            break
                node = Node(ELEMENT, name, attrs)
                top.children.append(node)
                if name not in void:
                    stack.append(node)
                    top = node
            if is_link:
                link_nodes.append(node)
        pos = m.end()
    return root, link_nodes


def parse_html(html_bytes: bytes) -> Node:
    """Parse UTF-8 HTML bytes into a Node tree (root = #document)."""
    s = html_bytes.decode("utf-8", errors="replace")
    res = _parse_fast(s)
    if res is not None:
        return res[0]
    builder = _TreeBuilder()
    builder.feed(s)
    builder.close()
    return builder.root


def parse_page(html_bytes: bytes) -> tuple[Node, list[Node]]:
    """Parse + the href/src-carrying elements in document pre-order.

    The link kernel iterates exactly these nodes instead of re-walking
    the whole tree scanning every element's attrs (r6)."""
    s = html_bytes.decode("utf-8", errors="replace")
    res = _parse_fast(s)
    if res is not None:
        return res
    builder = _TreeBuilder()
    builder.feed(s)
    builder.close()
    return builder.root, builder.link_nodes
