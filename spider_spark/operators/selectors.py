"""CSS / XPath selector subset over the stdlib HTML parser.

The reference extracts with lxml selectors (``response.xpath(...)`` —
3,035 spiders; ``response.css(...)`` — 896, e.g. ``der_immo_tip.py:
32-47``). lxml is not in this container, so this module implements the
selector SUBSET those spiders actually use over a minimal DOM built
with ``html.parser``:

* CSS: descendant combination by whitespace, ``>`` child combinator,
  simple selectors ``tag``, ``*``, ``.class``, ``#id``, ``[attr]``,
  ``[attr=value]``, ``:nth-child(n)`` (259 spiders), Scrapy's
  non-standard ``:contains("s")``, plus the ``::text`` /
  ``::attr(name)`` extraction suffixes.
* XPath: ``//tag`` / ``/tag`` steps with predicates
  ``[@attr]``, ``[@attr="v"]``, ``[contains(@attr,"s")]`` (1,787
  spiders), ``[contains(text(),"s")]`` (454), ``[contains(.,"s")]``
  (the ``//script[contains(.,'LatLng')]`` idiom), positional ``[n]``
  and ``[last()]``; axes ``following-sibling::`` (1,531 spiders) and
  ``preceding-sibling::`` (61), including the text-node targets
  ``following-sibling::text()`` and ``following-sibling::text()[1]``;
  terminal ``/text()``, ``//text()`` and ``/@attr``.

Both compile to the same step matcher; evaluation is one iterative
pass per page inside a pandas UDF — Arrow batch in, ``array<string>``
out.  All DOM walks use explicit stacks (no recursion), so
adversarially deep-nested HTML degrades gracefully instead of raising
RecursionError inside a Spark task.

Extraction semantics mirror parsel/Scrapy observably:

* ``::text`` / ``/text()`` yields one result per DIRECT text node of
  each match; ``//text()`` yields one per DESCENDANT text node —
  whitespace-only nodes are skipped and runs of whitespace collapsed
  (the spiders pipe results through ``remove_white_spaces``; collapsing
  here is our documented normalization).
* default extraction (no ::text / text()) yields the node's normalized
  descendant text, matching how spiders consume ``.get()``.
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


@dataclass(eq=False)  # identity equality: .index()/dedup must not match twins
class _Node:
    tag: str
    attrs: dict
    parent: "_Node | None" = None
    #: document-ordered mix of text strings and child _Nodes
    content: list = field(default_factory=list)

    @property
    def children(self) -> list:
        return [c for c in self.content if isinstance(c, _Node)]

    def all_text(self) -> str:
        """Normalized concatenation of every descendant text node
        (iterative pre-order walk — no recursion)."""
        parts: list[str] = []
        stack = [iter(self.content)]
        while stack:
            try:
                c = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            if isinstance(c, str):
                parts.append(c)
            else:
                stack.append(iter(c.content))
        return " ".join(" ".join(parts).split())

    def direct_text(self) -> str:
        return " ".join(
            " ".join(c for c in self.content if isinstance(c, str)).split()
        )

    def text_nodes(self, deep: bool) -> list[str]:
        """Normalized individual text nodes (direct, or all descendants)."""
        out: list[str] = []
        if not deep:
            for c in self.content:
                if isinstance(c, str):
                    t = " ".join(c.split())
                    if t:
                        out.append(t)
            return out
        stack = [iter(self.content)]
        while stack:
            try:
                c = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            if isinstance(c, str):
                t = " ".join(c.split())
                if t:
                    out.append(t)
            else:
                stack.append(iter(c.content))
        return out


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), parent=self._stack[-1])
        self._stack[-1].content.append(node)
        if tag not in VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].content.append(
            _Node(tag, dict(attrs), parent=self._stack[-1])
        )

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
    axis: str = "descendant"  # descendant|child|following-sibling|preceding-sibling
    tag: str | None = None  # None = any element ('*')
    node_id: str | None = None
    classes: tuple = ()
    attrs: tuple = ()  # (name, value-or-None) equality pairs
    attr_contains: tuple = ()  # (name, substring) — contains(@a, "s")
    text_contains: tuple = ()  # substrings — contains(text(), "s") / :contains()
    alltext_contains: tuple = ()  # substrings — contains(., "s")
    position: int | None = None  # 1-based axis position; -1 = last()
    nth_child: int | None = None  # CSS :nth-child(n) — nth ELEMENT child of parent
    is_text: bool = False  # text() node test (terminal extraction step)

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
        for name, sub in self.attr_contains:
            if sub not in (node.attrs.get(name) or ""):
                return False
        for sub in self.text_contains:
            if sub not in node.direct_text():
                return False
        for sub in self.alltext_contains:
            if sub not in node.all_text():
                return False
        if self.nth_child is not None:
            parent = node.parent
            if parent is None:
                return False
            elems = [c for c in parent.content if isinstance(c, _Node)]
            try:
                if elems.index(node) + 1 != self.nth_child:
                    return False
            except ValueError:
                return False
        return True


# ---------------------------------------------------------------------------
# CSS compilation
# ---------------------------------------------------------------------------

_CSS_TOKEN = re.compile(
    r"(?P<tag>\*|[a-zA-Z][\w-]*)?"
    r"(?P<rest>(?:[.#][\w-]+"
    r"|\[[\w-]+(?:=(?:\"[^\"]*\"|'[^']*'|[^\]]*))?\]"
    r"|:nth-child\(\d+\)"
    r"|:contains\((?:\"[^\"]*\"|'[^']*')\))*)$"
)
_CSS_PART = re.compile(
    r"[.#][\w-]+"
    r"|\[[\w-]+(?:=(?:\"[^\"]*\"|'[^']*'|[^\]]*))?\]"
    r"|:nth-child\(\d+\)"
    r"|:contains\((?:\"[^\"]*\"|'[^']*')\)"
)


def _parse_simple_css(token: str, child: bool) -> _Step:
    m = _CSS_TOKEN.match(token)
    if not m or (not m.group("tag") and not m.group("rest")):
        raise ValueError(f"unsupported css selector token: {token!r}")
    tag = m.group("tag")
    step = _Step(
        tag=None if tag in (None, "*") else tag,
        axis="child" if child else "descendant",
    )
    classes, attrs, text_contains = [], [], []
    for part in _CSS_PART.findall(m.group("rest") or ""):
        if part.startswith("."):
            classes.append(part[1:])
        elif part.startswith("#"):
            step.node_id = part[1:]
        elif part.startswith(":nth-child"):
            step.nth_child = int(part[len(":nth-child("):-1])
        elif part.startswith(":contains"):
            text_contains.append(part[len(":contains(") + 1:-2])
        else:  # [attr] or [attr=value]
            inner = part[1:-1]
            name, eq, value = inner.partition("=")
            attrs.append((name, value.strip("\"'") if eq else None))
    step.classes = tuple(classes)
    step.attrs = tuple(attrs)
    # Scrapy's :contains() matches on the node's FULL text (lxml
    # set:contains over descendant text), not just direct text
    step.alltext_contains = tuple(text_contains)
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
    if mode == "text":
        steps.append(_Step(axis="child", is_text=True))
    return steps, mode, attr


# ---------------------------------------------------------------------------
# XPath compilation
# ---------------------------------------------------------------------------

_AXES = {
    "": None,  # resolved from the separator
    "child::": "child",
    "descendant::": "descendant",
    "following-sibling::": "following-sibling",
    "preceding-sibling::": "preceding-sibling",
}

_XP_SEP = re.compile(r"//|/")
_XP_AXIS = re.compile(r"(?:child|descendant|following-sibling|preceding-sibling)::")
_XP_TEST = re.compile(r"@[\w-]+|text\(\)|\*|[a-zA-Z][\w-]*")
#: one [...] predicate; string literals may not contain their own quote
_XP_PRED = re.compile(
    r"\[(?:"
    r"(?P<last>last\(\))"
    r"|(?P<pos>\d+)"
    r"|contains\(\s*(?P<csub>@[\w-]+|text\(\)|\.)\s*,\s*"
    r"(?:\"(?P<cv1>[^\"]*)\"|'(?P<cv2>[^']*)')\s*\)"
    r"|@(?P<aname>[\w-]+)(?:=(?:\"(?P<av1>[^\"]*)\"|'(?P<av2>[^']*)'))?"
    r")\]"
)


def compile_xpath(xpath: str) -> tuple[list[_Step], str | None, str | None]:
    """-> same triple as compile_css for the supported xpath subset."""
    src = xpath.strip()
    pos = 0
    steps: list[_Step] = []
    mode: str | None = None
    attr: str | None = None
    while pos < len(src):
        if mode is not None:
            raise ValueError(f"@attr must be terminal: {xpath!r}")
        sep = _XP_SEP.match(src, pos)
        if not sep:
            raise ValueError(f"unsupported xpath: {xpath!r} at {src[pos:]!r}")
        pos = sep.end()
        axis = "descendant" if sep.group() == "//" else "child"
        am = _XP_AXIS.match(src, pos)
        if am:
            axis = am.group()[:-2]
            pos = am.end()
        tm = _XP_TEST.match(src, pos)
        if not tm:
            raise ValueError(f"unsupported xpath: {xpath!r} at {src[pos:]!r}")
        test = tm.group()
        pos = tm.end()
        if test.startswith("@"):
            mode, attr = "attr", test[1:]
            continue
        step = _Step(axis=axis)
        if test == "text()":
            step.is_text = True
            mode = "text"
        elif test != "*":
            step.tag = test
        attrs, attr_contains, text_contains, alltext_contains = [], [], [], []
        while pos < len(src) and src[pos] == "[":
            pm = _XP_PRED.match(src, pos)
            if not pm:
                raise ValueError(f"unsupported predicate: {xpath!r} at {src[pos:]!r}")
            pos = pm.end()
            if pm.group("last"):
                step.position = -1
            elif pm.group("pos"):
                step.position = int(pm.group("pos"))
            elif pm.group("csub") is not None:
                sub = pm.group("cv1") if pm.group("cv1") is not None else pm.group("cv2")
                target = pm.group("csub")
                if target == "text()":
                    text_contains.append(sub)
                elif target == ".":
                    alltext_contains.append(sub)
                else:
                    attr_contains.append((target[1:], sub))
            else:
                name = pm.group("aname")
                v = pm.group("av1") if pm.group("av1") is not None else pm.group("av2")
                attrs.append((name, v))
        step.attrs = tuple(attrs)
        step.attr_contains = tuple(attr_contains)
        step.text_contains = tuple(text_contains)
        step.alltext_contains = tuple(alltext_contains)
        if step.is_text and (attrs or attr_contains or text_contains or alltext_contains):
            raise ValueError(f"text() supports only positional predicates: {xpath!r}")
        steps.append(step)
        if step.is_text and pos < len(src):
            raise ValueError(f"text() must be terminal: {xpath!r}")
    if not steps:
        raise ValueError(f"empty xpath: {xpath!r}")
    return steps, mode, attr


# ---------------------------------------------------------------------------
# evaluation (iterative — explicit stacks, no recursion)
# ---------------------------------------------------------------------------


def _descendants(node: _Node) -> list[_Node]:
    """All element descendants in document order (iterative)."""
    out: list[_Node] = []
    stack = [iter(node.content)]
    while stack:
        try:
            c = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if isinstance(c, _Node):
            out.append(c)
            stack.append(iter(c.content))
    return out


def _axis_elements(ctx: _Node, axis: str) -> list[_Node]:
    if axis == "child":
        return ctx.children
    if axis == "descendant":
        return _descendants(ctx)
    parent = ctx.parent
    if parent is None:
        return []
    sibs = [c for c in parent.content if isinstance(c, _Node)]
    try:
        i = sibs.index(ctx)
    except ValueError:
        return []
    if axis == "following-sibling":
        return sibs[i + 1:]
    if axis == "preceding-sibling":
        # axis order is reverse document order (nearest sibling first) —
        # positional predicates count backwards, like lxml
        return sibs[:i][::-1]
    raise ValueError(f"unknown axis: {axis}")


def _axis_text_nodes(ctx: _Node, axis: str) -> list[str]:
    """Normalized text nodes along the axis (for text() steps)."""
    if axis == "child":
        return ctx.text_nodes(deep=False)
    if axis == "descendant":
        return ctx.text_nodes(deep=True)
    parent = ctx.parent
    if parent is None:
        return []
    try:
        i = parent.content.index(ctx)
    except ValueError:
        return []
    if axis == "following-sibling":
        tail = parent.content[i + 1:]
    else:  # preceding-sibling (reverse axis order)
        tail = parent.content[:i][::-1]
    out = []
    for c in tail:
        if isinstance(c, str):
            t = " ".join(c.split())
            if t:
                out.append(t)
    return out


def _apply_position(matched: list, step: _Step, by_parent: bool) -> list:
    """Positional predicate over already-matched candidates.

    ``by_parent=True`` (child/descendant axes): XPath positions count
    within each parent's matching children (``//p[2]`` = every p that is
    the 2nd p child of ITS parent). Sibling axes count along the axis.
    """
    if step.position is None:
        return matched
    if not by_parent:
        if step.position == -1:
            return matched[-1:] if matched else []
        return (
            [matched[step.position - 1]] if len(matched) >= step.position else []
        )
    groups: dict[int, list[_Node]] = {}
    order: list[int] = []
    for n in matched:
        key = id(n.parent)
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(n)
    out = []
    for key in order:
        g = groups[key]
        if step.position == -1:
            out.append(g[-1])
        elif len(g) >= step.position:
            out.append(g[step.position - 1])
    return out


def _select(root: _Node, steps: list[_Step]) -> list:
    """Evaluate element steps; a terminal text() step returns strings."""
    current: list[_Node] = [root]
    for step in steps:
        if step.is_text:
            texts: list[str] = []
            for ctx in current:
                nodes = _axis_text_nodes(ctx, step.axis)
                nodes = _apply_position(nodes, step, by_parent=False)
                if step.axis == "preceding-sibling":
                    nodes.reverse()  # results in document order (lxml)
                texts.extend(nodes)
            return texts
        nxt: list[_Node] = []
        seen: set[int] = set()
        for ctx in current:
            matched = [n for n in _axis_elements(ctx, step.axis) if step.matches(n)]
            matched = _apply_position(
                matched, step, by_parent=step.axis in ("child", "descendant")
            )
            if step.axis == "preceding-sibling":
                # axis order is reversed for position counting; emit the
                # surviving nodes back in document order (lxml nodesets)
                matched = matched[::-1]
            for n in matched:
                if id(n) not in seen:
                    seen.add(id(n))
                    nxt.append(n)
        current = nxt
    return current


def _extract(selected: list, mode: str | None, attr: str | None) -> list[str]:
    if selected and isinstance(selected[0], str):
        return selected  # already text nodes from a text() step
    if mode == "attr":
        return [n.attrs[attr] for n in selected if attr in n.attrs]
    if mode == "text":  # text() step matched nothing
        return []
    return [n.all_text() for n in selected]


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


# ---------------------------------------------------------------------------
# .re() / .re_first() composition (116 spiders, e.g. `.re_first(r"\d+")`)
# ---------------------------------------------------------------------------


def _re_group_index(pattern: str) -> int:
    """parsel semantics: patterns with a capture group return the group,
    group-less patterns return the full match."""
    return 1 if re.compile(pattern).groups >= 1 else 0


def re_over(arr: Column, pattern: str) -> Column:
    """``SelectorList.re(pattern)`` analog over an extracted array:
    findall per element, flattened — pure JVM (`regexp_extract_all`)."""
    idx = _re_group_index(pattern)
    return F.flatten(
        F.transform(
            arr, lambda s: F.regexp_extract_all(s, F.lit(pattern), F.lit(idx))
        )
    )


def css_re(html: Column, selector: str, pattern: str) -> Column:
    """``response.css(sel).re(pattern)`` -> array<string>."""
    return re_over(css_extract(html, selector), pattern)


def xpath_re(html: Column, xpath: str, pattern: str) -> Column:
    """``response.xpath(xp).re(pattern)`` -> array<string>."""
    return re_over(xpath_extract(html, xpath), pattern)


def re_first(arr_or_html: Column, *args) -> Column:
    """``.re_first(pattern)`` analog.

    ``re_first(arr, pattern)`` over an extracted array, or
    ``re_first(html, selector, pattern, lang='css')`` end to end.
    """
    if len(args) == 1:
        return F.try_element_at(re_over(arr_or_html, args[0]), F.lit(1))
    selector, pattern = args[0], args[1]
    lang = args[2] if len(args) > 2 else "css"
    arr = (css_extract if lang == "css" else xpath_extract)(arr_or_html, selector)
    return F.try_element_at(re_over(arr, pattern), F.lit(1))
