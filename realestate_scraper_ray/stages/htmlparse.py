"""Tolerant HTML parsing — the engine's analogue of the reference's
BeautifulSoup/lxml layer (/root/reference/scrapper/core/parse.py:10-26).

The reference parses every page with BeautifulSoup (lxml, html.parser
fallback), which survives attribute reordering, unquoted attribute
values, single quotes, and broken nesting. Neither bs4 nor lxml is in
this environment, so this module builds the same tolerance on the
stdlib ``html.parser.HTMLParser``:

  - ``parse_html(html) -> Node``: a document tree whose nodes carry
    normalized attribute dicts (html.parser already normalizes quoting
    and ordering at tokenization time),
  - ``Node.find_all(tag, attrs, contains)``: the ``soup.select``
    analogue used by the per-portal extractors,
  - unclosed / misnested tags are recovered by popping to the nearest
    matching open tag (and ignoring stray end tags), the same recovery
    strategy html5 parsers use.

The HOT crawl path does NOT pay for a full-document parse: the
per-portal extractors (stages/portals.py) run attribute-order- and
quote-insensitive regexes first and fall back to this tree only when
the fast path finds nothing but the portal's markers are present —
the same two-tier strategy the reference uses (raw-regex fallbacks in
otodom.py:409-430 next to the soup pass).
"""

from __future__ import annotations

from html.parser import HTMLParser

# elements that never take children (html.parser reports no end tag)
_VOID = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
})


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict | None = None,
                 parent: "Node | None" = None):
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.children: list = []          # Node | str
        self.parent = parent

    # -- soup-like accessors -------------------------------------------------

    def get(self, name: str, default: str | None = None) -> str | None:
        return self.attrs.get(name, default)

    def iter_nodes(self):
        """Depth-first, document order, self included."""
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter_nodes()

    def find_all(self, tag: str | None = None, attrs: dict | None = None,
                 contains: dict | None = None) -> list["Node"]:
        """All descendant nodes (doc order) matching ``tag`` and every
        attribute filter: ``attrs`` = exact value, ``contains`` =
        substring (the ``[attr*=v]`` CSS analogue). ``attrs`` value
        ``True`` means "attribute present"."""
        out = []
        for n in self.iter_nodes():
            if n is self:
                continue
            if tag is not None and n.tag != tag:
                continue
            ok = True
            for k, v in (attrs or {}).items():
                av = n.attrs.get(k)
                if (av is None) if v is True else (av != v):
                    ok = False
                    break
            if ok:
                for k, v in (contains or {}).items():
                    av = n.attrs.get(k)
                    if av is None or v not in av:
                        ok = False
                        break
            if ok:
                out.append(n)
        return out

    def find(self, tag: str | None = None, attrs: dict | None = None,
             contains: dict | None = None) -> "Node | None":
        hits = self.find_all(tag, attrs, contains)
        return hits[0] if hits else None

    def get_text(self, sep: str = " ") -> str:
        """Concatenated text content, ``get_text(strip=True)`` style:
        fragments stripped and joined with ``sep``."""
        parts: list[str] = []

        def walk(n: Node):
            for c in n.children:
                if isinstance(c, Node):
                    walk(c)
                else:
                    t = c.strip()
                    if t:
                        parts.append(t)

        walk(self)
        return sep.join(parts)

    def ancestor(self, tag: str) -> "Node | None":
        """Nearest enclosing element with ``tag`` (card lookup for
        anchors found in document order)."""
        n = self.parent
        while n is not None:
            if n.tag == tag:
                return n
            n = n.parent
        return None

    def __repr__(self) -> str:  # debugging aid only
        return f"<{self.tag} {self.attrs}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        # duplicate attributes: first wins (browser behavior); valueless
        # attributes (e.g. ``disabled``) map to ""
        ad: dict[str, str] = {}
        for k, v in attrs:
            ad.setdefault(k, v if v is not None else "")
        node = Node(tag, ad, self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        ad: dict[str, str] = {}
        for k, v in attrs:
            ad.setdefault(k, v if v is not None else "")
        self.stack[-1].children.append(Node(tag, ad, self.stack[-1]))

    def handle_endtag(self, tag):
        # tolerant recovery: pop to the nearest matching open tag;
        # ignore stray end tags (broken nesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    """Parse ``html`` into a tolerant document tree. Never raises on
    malformed input — html.parser is a recovering tokenizer, and the
    tree builder ignores anything it can't place (the hard-fallback
    semantics of the reference's ``soup()``, core/parse.py:10-15)."""
    b = _TreeBuilder()
    try:
        b.feed(html)
        b.close()
    except Exception:
        pass  # keep whatever tree was built before the failure
    return b.root
