"""CSS / XPath selector subset over the stdlib HTML parser.

The reference extracts with lxml selectors (``response.xpath(...)`` —
3,035 spiders; ``response.css(...)`` — 896, e.g. ``der_immo_tip.py:
32-47``). lxml is not in this container, so this module implements the
selector SUBSET those spiders actually use over a minimal DOM built
with ``html.parser``:

* CSS: descendant combination by whitespace, ``>`` child combinator,
  simple selectors ``tag``, ``.class``, ``#id``, ``[attr]``,
  ``[attr=value]`` (combinable, e.g. ``div.item > a.title``), plus
  Scrapy's ``::text`` / ``::attr(name)`` extraction suffixes.
* XPath: ``//tag``, ``//tag[@attr="v"]``, ``//tag[@class="v"]``,
  descendant chaining ``//a//b``, child ``/a``, and the terminal
  ``/text()`` or ``/@attr`` extraction steps.

Both compile to the same step matcher; evaluation is one Python pass
per page inside a pandas UDF — Arrow batch in, ``array<string>`` out.
Default extraction (no ::text / text()) yields the node's normalized
descendant text, matching how the spiders consume ``.get()`` through
``remove_white_spaces``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: HTML void elements — start tags that never receive an end tag
VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


@dataclass
class _Node:
    tag: str
    attrs: dict
    #: document-ordered mix of text strings and child _Nodes
    content: list = field(default_factory=list)

    @property
    def children(self) -> list:
        return [c for c in self.content if isinstance(c, _Node)]

    def all_text(self) -> str:
        parts = []
        for c in self.content:
            parts.append(c if isinstance(c, str) else c.all_text())
        return " ".join(" ".join(parts).split())

    def direct_text(self) -> str:
        return " ".join(
            " ".join(c for c in self.content if isinstance(c, str)).split()
        )


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs))
        self._stack[-1].content.append(node)
        if tag not in VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].content.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        # close the nearest open tag of this name (tolerates misnesting)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if data.strip():
            self._stack[-1].content.append(data)


def parse_tree(html: str) -> _Node:
    p = _TreeBuilder()
    p.feed(html or "")
    return p.root


@dataclass
class _Step:
    tag: str | None = None
    node_id: str | None = None
    classes: tuple = ()
    attrs: tuple = ()  # (name, value-or-None) pairs
    child: bool = False  # direct-child combinator (css '>' / xpath '/')

    def matches(self, node: _Node) -> bool:
        if self.tag and node.tag != self.tag:
            return False
        if self.node_id is not None and node.attrs.get("id") != self.node_id:
            return False
        node_classes = (node.attrs.get("class") or "").split()
        for c in self.classes:
            if c not in node_classes:
                return False
        for name, value in self.attrs:
            if name not in node.attrs:
                return False
            if value is not None and node.attrs.get(name) != value:
                return False
        return True


_CSS_TOKEN = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*)?"
    r"(?P<rest>(?:[.#][\w-]+|\[[\w-]+(?:=(?:\"[^\"]*\"|'[^']*'|[^\]]*))?\])*)$"
)
_CSS_PART = re.compile(r"[.#][\w-]+|\[[\w-]+(?:=(?:\"[^\"]*\"|'[^']*'|[^\]]*))?\]")


def _parse_simple_css(token: str, child: bool) -> _Step:
    m = _CSS_TOKEN.match(token)
    if not m:
        raise ValueError(f"unsupported css selector token: {token!r}")
    step = _Step(tag=m.group("tag"), child=child)
    classes, attrs = [], []
    for part in _CSS_PART.findall(m.group("rest") or ""):
        if part.startswith("."):
            classes.append(part[1:])
        elif part.startswith("#"):
            step.node_id = part[1:]
        else:  # [attr] or [attr=value]
            inner = part[1:-1]
            name, eq, value = inner.partition("=")
            attrs.append((name, value.strip("\"'") if eq else None))
    step.classes = tuple(classes)
    step.attrs = tuple(attrs)
    return step


def compile_css(selector: str) -> tuple[list[_Step], str | None, str | None]:
    """-> (steps, extract_mode, attr_name); mode in {None, 'text', 'attr'}."""
    sel = selector.strip()
    mode, attr = None, None
    m = re.search(r"::(text|attr\(([\w-]+)\))$", sel)
    if m:
        mode = "text" if m.group(1) == "text" else "attr"
        attr = m.group(2)
        sel = sel[: m.start()].strip()
    steps: list[_Step] = []
    child_next = False
    for token in sel.split():
        if token == ">":
            child_next = True
            continue
        steps.append(_parse_simple_css(token, child_next))
        child_next = False
    if not steps:
        raise ValueError(f"empty css selector: {selector!r}")
    return steps, mode, attr


_XPATH_STEP = re.compile(
    r"(?P<sep>//|/)(?P<body>@[\w-]+|text\(\)|[a-zA-Z][\w-]*"
    r"(?:\[@[\w-]+(?:=(?:\"[^\"]*\"|'[^']*'))?\])?)"
)


def compile_xpath(xpath: str) -> tuple[list[_Step], str | None, str | None]:
    """-> same triple as compile_css for the supported xpath subset."""
    pos, steps, mode, attr = 0, [], None, None
    src = xpath.strip()
    while pos < len(src):
        m = _XPATH_STEP.match(src, pos)
        if not m:
            raise ValueError(f"unsupported xpath: {xpath!r} at {src[pos:]!r}")
        pos = m.end()
        body, child = m.group("body"), m.group("sep") == "/"
        if body == "text()":
            mode = "text"
            if pos != len(src):
                raise ValueError(f"text() must be terminal: {xpath!r}")
        elif body.startswith("@"):
            mode, attr = "attr", body[1:]
            if pos != len(src):
                raise ValueError(f"@attr must be terminal: {xpath!r}")
        else:
            tm = re.match(
                r"([a-zA-Z][\w-]*)(?:\[@([\w-]+)(?:=(?:\"([^\"]*)\"|'([^']*)'))?\])?$",
                body,
            )
            tag, aname, v1, v2 = tm.groups()
            attrs = ()
            if aname:
                attrs = ((aname, v1 if v1 is not None else v2),)
            steps.append(_Step(tag=tag, attrs=attrs, child=child))
    if not steps:
        raise ValueError(f"empty xpath: {xpath!r}")
    return steps, mode, attr


def _select(root: _Node, steps: list[_Step]) -> list[_Node]:
    current = [root]
    for step in steps:
        nxt: list[_Node] = []
        seen: set[int] = set()

        def collect(node: _Node, descend: bool):
            for c in node.children:
                if step.matches(c) and id(c) not in seen:
                    seen.add(id(c))
                    nxt.append(c)
                if descend:
                    collect(c, True)

        for n in current:
            collect(n, not step.child)
        current = nxt
    return current


def _extract(nodes: list[_Node], mode: str | None, attr: str | None) -> list[str]:
    if mode == "attr":
        return [n.attrs[attr] for n in nodes if attr in n.attrs]
    if mode == "text":
        out = []
        for n in nodes:
            t = n.direct_text()
            if t:
                out.append(t)
        return out
    return [n.all_text() for n in nodes]


def select_html(html: str, selector: str, lang: str = "css") -> list[str]:
    """Evaluate one selector against one page (driver-side helper)."""
    steps, mode, attr = (compile_css if lang == "css" else compile_xpath)(selector)
    return _extract(_select(parse_tree(html), steps), mode, attr)


def _selector_udf(selector: str, lang: str):
    compiled = (compile_css if lang == "css" else compile_xpath)(selector)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def run(html: pd.Series) -> pd.Series:
        steps, mode, attr = compiled
        return pd.Series(
            [_extract(_select(parse_tree(h), steps), mode, attr) for h in html]
        )

    return run


def css_extract(html: Column, selector: str) -> Column:
    """``response.css(selector).getall()`` analog -> array<string>."""
    return _selector_udf(selector, "css")(html)


def xpath_extract(html: Column, xpath: str) -> Column:
    """``response.xpath(xpath).getall()`` analog -> array<string>."""
    return _selector_udf(xpath, "xpath")(html)
