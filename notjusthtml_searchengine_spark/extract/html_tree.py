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
        yield self
        for c in self.children:
            yield from c.pre_order()

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


def parse_html(html_bytes: bytes) -> Node:
    """Parse UTF-8 HTML bytes into a Node tree (root = #document)."""
    builder = _TreeBuilder()
    builder.feed(html_bytes.decode("utf-8", errors="replace"))
    builder.close()
    return builder.root
