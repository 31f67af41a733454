"""HTML main-content extraction channel.

This is the engine's analog of the reference's layout-analysis flow for web
pages (the north star's "HTML boilerplate strip"): the DOM plays the role of
the rendered page, block-level elements play the role of detected layout
boxes, and the same page-local operator chain runs over them:

1.  **Segmentation** — DOM walk emitting typed candidate regions; the
    analog of layout-model detect (``ultralytics_layout_model.py:54-88``).
2.  **Classification** — tag + class/id + link-text-density heuristics map
    each region to a :class:`~latyas_ray.blocks.BlockKind`
    (header/footer/nav boilerplate per the north star; kind mapping is the
    analog of ``BlockType.from_str``, ``block.py:29-68``).
3.  **Duplicate-region removal** — exact (kind, text) duplicates from
    nested/cloned containers are dropped keep-first; the DOM analog of
    ``Layout.remove_overlapping`` (``layout.py:86-132``) where duplicated
    containers produce coincident boxes.
4.  **Reading order** — synthetic page geometry is assigned (full-width
    bands; two-column zones with deliberately staggered row heights so the
    column gutter is the only clean cut) and
    :func:`~latyas_ray.reflow.xy_cut_reflow` orders the regions, exactly as
    ``base_pipeline.py:188-190`` / ``pdf2txt.py:93-94`` do per page.
5.  **Routing + assembly** — per-kind keep/drop rules
    (:data:`~latyas_ray.blocks.KEEP_KINDS`), the caption/cross-ref filter
    (``pdf2txt.py:86-89``), equation wrapping ``\\n$$\\n…\\n$$\\n`` and
    EmbedEq skipping (``tools/pdf2text.py:30-39``), blocks joined with
    ``"\\n\\n"`` (frozen separator; the HTML-path analog of the page-writer
    join at ``tools/pdf2text.py:59-62``).

Everything here is a pure function of the input bytes — no floats besides
exact small-integer-valued geometry, no dict-order or hash-seed dependence —
so the output is byte-identical no matter how the corpus is partitioned
(the north rule's per-url invariant).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

from .blocks import BlockKind, KEEP_KINDS
from .overlap import Region
from .reflow import xy_cut_reflow
from .textnorm import caption_crossref_drop, collapse_ws

# ---------------------------------------------------------------- DOM tree

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# Opening one of these auto-closes an open <p> (HTML5 parsing rules).
_P_CLOSERS = frozenset(
    "p div section article main aside header footer nav ul ol dl table h1 h2 "
    "h3 h4 h5 h6 figure blockquote pre".split()
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
CONTAINER_TAGS = frozenset({"html", "body", "main", "article", "section", "div"})
BOILER_TAGS = frozenset({"nav", "aside", "header", "footer"})

_BOILER_CLASS_RE = re.compile(
    r"(?:^|[\s_-])(nav|menu|sidebar|banner|cookie|consent|social|share|related|"
    r"widget|footer|breadcrumbs?|ads?|promo|newsletter)(?:$|[\s_-])",
    re.IGNORECASE,
)
_COL_LEFT_RE = re.compile(r"(?:^|\s)col(?:umn)?[_-]?left(?:$|\s)|(?:^|\s)left(?:$|\s)")
_COL_RIGHT_RE = re.compile(r"(?:^|\s)col(?:umn)?[_-]?right(?:$|\s)|(?:^|\s)right(?:$|\s)")
_EQUATION_RE = re.compile(r"^\$\$(.+)\$\$$", re.DOTALL)

# Link-text density above this on a shortish container marks boilerplate
# (the DOM-side "text-density heuristic" of the north star).
LINK_DENSITY_THRESHOLD = 0.6
LINK_DENSITY_MAX_CHARS = 512


class Node:
    """One DOM node; ``tag == ""`` marks a text node.  The ``_raw`` /
    ``_collapsed`` / ``_linklen`` slots memoize per-subtree derivations so
    nested containers don't recompute them per ancestor (the naive form is
    O(depth × text) on deep pages)."""

    __slots__ = ("tag", "attrs", "children", "text", "_raw", "_collapsed", "_linklen")

    def __init__(self, tag: str, attrs: Optional[Dict[str, str]] = None, text: str = ""):
        self.tag = tag
        self.attrs = attrs if attrs is not None else {}
        self.children: List["Node"] = []
        self.text = text
        self._raw: Optional[str] = None
        self._collapsed: Optional[str] = None
        self._linklen: int = -1


class _TreeBuilder(HTMLParser):
    """Forgiving tree builder: mismatched end tags pop to the nearest open
    ancestor of that name (or are ignored); block tags auto-close ``<p>``;
    ``<li>`` auto-closes ``<li>`` — the malformed-HTML families in the
    corpus rely on these recovery rules being deterministic."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        if tag in _P_CLOSERS:
            while self.stack[-1].tag in ("p", "li") and tag != "li":
                self.stack.pop()
            if tag == "li":
                while self.stack[-1].tag == "li":
                    self.stack.pop()
        node = Node(tag, {k: (v or "") for k, v in attrs} if attrs else None)
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)
        elif tag == "br":
            node.children.append(Node("", text="\n"))

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs} if attrs else None)
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignored

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(Node("", text=data))


# ------------------------------------------------- fast guarded tokenizer
#
# ``html.parser`` is the semantic reference, but it is pure Python and
# costs ~30% of extraction.  The fast tokenizer below handles the common
# regular subset with compiled regexes and REFUSES (returns None →
# stdlib fallback) anything outside it, so it can never disagree with the
# reference tokenizer — equivalence is enforced by a tree-diff test over
# the corpus plus fuzz cases.  Rejected features: character/entity
# references (``&``), comments/PIs, script/style CDATA modes, bare ``<``
# in text, quoted ``>`` inside attribute values, end tags with attributes,
# and unterminated tags.  The choice of path is a pure function of the
# input bytes, so partitioning-independence is preserved.

_FAST_BAD = re.compile(r"&|<!--|<\?|<(?![a-zA-Z/!])|<\s*(script|style)\b", re.IGNORECASE)
_DECL_RE = re.compile(r"<![^<>]*>")
_FTAG = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[^\s/<>=]+(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s<>\"']+))?)*)\s*(/?)>"
)
_FATTR = re.compile(
    r"([^\s/<>=]+)(?:\s*=\s*(?:\"([^\"<>]*)\"|'([^'<>]*)'|([^\s<>\"']+)))?"
)


def _fast_parse(text: str):
    """Tokenize the regular-subset fast path; None = use html.parser."""
    if _FAST_BAD.search(text):
        return None
    builder = _TreeBuilder()
    pos = 0
    n = len(text)
    find = text.find
    while True:
        lt = find("<", pos)
        if lt < 0:
            if pos < n:
                builder.handle_data(text[pos:])
            break
        if lt > pos:
            builder.handle_data(text[pos:lt])
        if text.startswith("<!", lt):
            m = _DECL_RE.match(text, lt)
            if not m:
                return None
            pos = m.end()
            continue
        m = _FTAG.match(text, lt)
        if not m:
            return None
        closing, tag, attrstr, selfclose = m.groups()
        tag = tag.lower()
        if closing:
            if attrstr.strip() or selfclose:
                return None  # html.parser treats these as bogus end tags
            builder.handle_endtag(tag)
        else:
            attrs = []
            if attrstr:
                # finditer, not findall: findall flattens non-participating
                # groups to "" and a valueless attr ("checked") would be
                # indistinguishable from an empty-valued one
                for am in _FATTR.finditer(attrstr):
                    v = am.group(2)
                    if v is None:
                        v = am.group(3)
                    if v is None:
                        v = am.group(4)
                    attrs.append((am.group(1).lower(), v))
            if selfclose:
                builder.handle_startendtag(tag, attrs)
            else:
                builder.handle_starttag(tag, attrs)
        pos = m.end()
    return builder.root


def parse_html(payload: bytes) -> Node:
    """Decode (utf-8, replacement on bad bytes) and build the tree."""
    text = payload.decode("utf-8", errors="replace")
    root = _fast_parse(text)
    if root is not None:
        return root
    builder = _TreeBuilder()
    builder.feed(text)
    builder.close()
    return builder.root


# ----------------------------------------------------------- text helpers


def _subtree_text(node: Node) -> str:
    if node.tag == "":
        return node.text
    if node._raw is not None:
        return node._raw
    if node.tag in ("script", "style"):
        val = ""
    else:
        val = "".join(_subtree_text(c) for c in node.children)
    node._raw = val
    return val


def _collapsed_text(node: Node) -> str:
    """``collapse_ws(_subtree_text(node))``, memoized per node (collapse is
    not compositional over children — boundary whitespace — so the cache
    holds the full result, computed once)."""
    if node.tag == "":
        return collapse_ws(node.text)
    if node._collapsed is None:
        node._collapsed = collapse_ws(_subtree_text(node))
    return node._collapsed


def _link_text_len(node: Node) -> int:
    if node._linklen >= 0:
        return node._linklen
    if node.tag == "a":
        val = len(_collapsed_text(node))
    else:
        val = sum(_link_text_len(c) for c in node.children if c.tag != "")
    node._linklen = val
    return val


def _classes(node: Node) -> str:
    return node.attrs.get("class", "") + " " + node.attrs.get("id", "")


# ---------------------------------------------------------- segmentation


@dataclass
class _Seg:
    """One candidate region before geometry/ordering."""

    kind: BlockKind
    text: str
    dom_path: str
    col: Optional[str]  # None | "left" | "right"


def _is_boilerplate_container(node: Node) -> bool:
    if _BOILER_CLASS_RE.search(_classes(node)):
        return True
    if node.tag in CONTAINER_TAGS:
        # link text first: it's computed from <a> subtrees only (cheap),
        # and when it is zero the density ratio can never reach the
        # threshold — skipping the whole-container collapse_ws, which
        # profiling showed was ~18% of giant-document extraction.
        # Identical semantics: 0 / total < threshold for every total.
        link_len = _link_text_len(node)
        if link_len == 0:
            return False
        total = len(_collapsed_text(node))
        if 0 < total < LINK_DENSITY_MAX_CHARS:
            if link_len / total >= LINK_DENSITY_THRESHOLD:
                return True
    return False


def _column_side(node: Node) -> Optional[str]:
    cls = node.attrs.get("class", "")
    if _COL_LEFT_RE.search(cls):
        return "left"
    if _COL_RIGHT_RE.search(cls):
        return "right"
    return None


# Browser-grade span caps (colspan 1000 / rowspan 65534 per the HTML spec);
# without them a single corrupt attribute (colspan="2147483647") inflates
# the occupancy grid by the span factor and OOMs the worker.
_SPAN_CAPS = {"colspan": 1000, "rowspan": 65534}


def _int_attr(node: Node, name: str, default: int = 1) -> int:
    try:
        v = int(node.attrs.get(name, default))
    except (TypeError, ValueError):
        return default
    return min(max(1, v), _SPAN_CAPS.get(name, 1 << 20))


def _table_blocks(node: Node, path: str, col: Optional[str], out: List[_Seg]) -> None:
    """Emit TableCaption (if any) then the Table grid (rows ``\\n``, cells
    ``\\t``) — the HTML analog of table-structure recognition output,
    with ``rowspan``/``colspan`` expanded exactly as TATR's cell assembly
    repeats a spanning cell's text into every covered grid slot
    (``tsr/models/tatr/pipeline.py:254-258``; same semantics as
    :func:`latyas_ray.functions.tsr.cells_to_csv`).  Trailing empty slots
    are trimmed per row, so span-free tables serialize exactly as before."""
    tr_nodes: List[Node] = []

    def walk_rows(n: Node) -> None:
        for c in n.children:
            if c.tag == "tr":
                tr_nodes.append(c)
            elif c.tag in ("thead", "tbody", "tfoot"):
                walk_rows(c)

    for c in node.children:
        if c.tag == "caption":
            cap = _collapsed_text(c)
            if cap:
                out.append(_Seg(BlockKind.TableCaption, cap, path + "/caption", col))
    walk_rows(node)

    # occupancy-grid placement: each cell lands in its row's next free
    # slot, then fills rowspan × colspan slots with its text
    grid_rows: List[List[Optional[str]]] = [[] for _ in tr_nodes]

    def slot(r: int, c: int) -> Optional[str]:
        row = grid_rows[r]
        return row[c] if c < len(row) else None

    def fill(r: int, c: int, val: str) -> None:
        # earlier-placed spans win: a colspan sweep crossing a slot already
        # claimed by a prior row's rowspan must not clobber it (the browser
        # table model keeps the earlier cell's occupancy)
        row = grid_rows[r]
        while len(row) <= c:
            row.append(None)
        if row[c] is None:
            row[c] = val

    for ri, tr in enumerate(tr_nodes):
        ci = 0
        for cell in tr.children:
            if cell.tag not in ("td", "th"):
                continue
            while slot(ri, ci) is not None:
                ci += 1
            text = _collapsed_text(cell)
            for dr in range(_int_attr(cell, "rowspan")):
                if ri + dr >= len(grid_rows):
                    break
                for dc in range(_int_attr(cell, "colspan")):
                    fill(ri + dr, ci + dc, text)
            ci += _int_attr(cell, "colspan")

    lines = []
    for row in grid_rows:
        vals = ["" if v is None else v for v in row]
        while vals and vals[-1] == "":
            vals.pop()
        lines.append("\t".join(vals))
    grid = "\n".join(r for r in lines if r)
    if grid:
        out.append(_Seg(BlockKind.Table, grid, path, col))


def _list_block(node: Node, path: str, col: Optional[str], out: List[_Seg]) -> None:
    items = [
        _collapsed_text(c) for c in node.children if c.tag == "li"
    ]
    text = "\n".join("- " + it for it in items if it)
    if text:
        out.append(_Seg(BlockKind.List, text, path, col))


def _dl_block(node: Node, path: str, col: Optional[str], out: List[_Seg]) -> None:
    """``<dl>`` definition list → List block: terms as ``- term`` lines,
    each definition indented beneath its term."""
    lines: List[str] = []
    for c in node.children:
        if c.tag == "dt":
            t = _collapsed_text(c)
            if t:
                lines.append("- " + t)
        elif c.tag == "dd":
            d = _collapsed_text(c)
            if d:
                lines.append("  " + d)
    text = "\n".join(lines)
    if text:
        out.append(_Seg(BlockKind.List, text, path, col))


def _pre_text(node: Node) -> str:
    """``<pre>`` preserves interior whitespace verbatim; only the single
    leading newline HTML defines as ignorable and trailing newlines are
    trimmed (never collapsed)."""
    raw = _subtree_text(node)
    if raw.startswith("\n"):
        raw = raw[1:]
    return raw.rstrip("\n")


def _segment(
    node: Node, path: str, col: Optional[str], saw_content: List[bool], out: List[_Seg]
) -> None:
    counts: Dict[str, int] = {}
    for child in node.children:
        tag = child.tag
        if tag == "":
            continue
        counts[tag] = counts.get(tag, 0) + 1
        cpath = f"{path}/{tag}[{counts[tag]}]"

        if tag in ("script", "style", "head", "template", "noscript", "iframe"):
            continue

        if tag in BOILER_TAGS or (
            tag in CONTAINER_TAGS and _is_boilerplate_container(child)
        ):
            text = _collapsed_text(child)
            if tag in ("header", "nav"):
                kind = BlockKind.Header
            elif tag in ("footer", "aside"):
                kind = BlockKind.Footer
            else:
                kind = BlockKind.Header if not saw_content[0] else BlockKind.Footer
            out.append(_Seg(kind, text, cpath, col))
            continue

        if tag in HEADING_TAGS:
            text = _collapsed_text(child)
            if text:
                saw_content[0] = True
                out.append(_Seg(BlockKind.Title, text, cpath, col))
            continue

        if tag in ("p", "blockquote"):
            text = _collapsed_text(child)
            if not text:
                continue
            saw_content[0] = True
            m = _EQUATION_RE.match(text)
            if m:
                out.append(_Seg(BlockKind.Equation, m.group(1).strip(), cpath, col))
            else:
                out.append(_Seg(BlockKind.Text, text, cpath, col))
            continue

        if tag in ("ul", "ol"):
            saw_content[0] = True
            _list_block(child, cpath, col, out)
            continue

        if tag == "dl":
            saw_content[0] = True
            _dl_block(child, cpath, col, out)
            continue

        if tag == "pre":
            text = _pre_text(child)
            if text:
                saw_content[0] = True
                out.append(_Seg(BlockKind.Text, text, cpath, col))
            continue

        if tag == "table":
            saw_content[0] = True
            _table_blocks(child, cpath, col, out)
            continue

        if tag == "figure":
            out.append(_Seg(BlockKind.Figure, "", cpath, col))
            for gc in child.children:
                if gc.tag == "figcaption":
                    cap = _collapsed_text(gc)
                    if cap:
                        out.append(
                            _Seg(BlockKind.FigureCaption, cap, cpath + "/figcaption", col)
                        )
            continue

        if tag in CONTAINER_TAGS:
            side = _column_side(child) or col
            if any(c.tag and c.tag not in ("script", "style") for c in child.children):
                _segment(child, cpath, side, saw_content, out)
            else:
                text = _collapsed_text(child)
                if text:
                    saw_content[0] = True
                    out.append(_Seg(BlockKind.Text, text, cpath, side))
            continue

        # inline / unknown elements at block level contribute nothing here;
        # their text is captured when an ancestor block element is emitted.
    return


# -------------------------------------------------------------- geometry

PAGE_W = 100.0
# Full-width and left-column blocks are 10 units tall on a 12-unit pitch;
# right-column blocks are 13 on a 15-unit pitch.  The deliberate stagger
# makes column rows y-overlap, so the XY-cut's only clean cut in a column
# zone is the x gutter → true column-major reading order (see
# tests/test_core.py::test_xy_cut_two_column_staggered_rows_column_major).
_H_FULL, _P_FULL = 10.0, 12.0
_H_LEFT, _P_LEFT = 10.0, 12.0
_H_RIGHT, _P_RIGHT = 13.0, 15.0


def assign_geometry(segs: List[_Seg]) -> List[Tuple[float, float, float, float]]:
    rects: List[Tuple[float, float, float, float]] = []
    cur_y = 0.0
    col_y: Dict[str, float] = {}
    in_zone = False
    for s in segs:
        if s.col is None:
            if in_zone:
                cur_y = max([cur_y] + list(col_y.values()))
                col_y = {}
                in_zone = False
            rects.append((2.0, cur_y, PAGE_W - 2.0, cur_y + _H_FULL))
            cur_y += _P_FULL
        else:
            if not in_zone:
                in_zone = True
                col_y = {}
            y0 = col_y.get(s.col, cur_y)
            if s.col == "left":
                rects.append((2.0, y0, 48.0, y0 + _H_LEFT))
                col_y[s.col] = y0 + _P_LEFT
            else:
                rects.append((52.0, y0, PAGE_W - 2.0, y0 + _H_RIGHT))
                col_y[s.col] = y0 + _P_RIGHT
    return rects


# -------------------------------------------------------------- assembly

HTML_BLOCK_JOIN = "\n\n"  # frozen separator (oracle contract)


def extract_html(payload: bytes) -> Tuple[str, List[Region]]:
    """Run the full HTML channel.  Returns ``(extracted_text, regions)``;
    each region's ``meta`` carries ``order`` (reading-order position) and
    ``char_start``/``char_end`` into ``extracted_text`` (-1 when the region
    contributed no text)."""
    root = parse_html(payload)
    segs: List[_Seg] = []
    _segment(root, "", None, [False], segs)

    # nested-duplicate removal: keep-first on exact (kind, text)
    seen: set = set()
    deduped: List[_Seg] = []
    for s in segs:
        key = (int(s.kind), s.text)
        if s.text and key in seen:
            continue
        seen.add(key)
        deduped.append(s)

    rects = assign_geometry(deduped)
    order = xy_cut_reflow(rects, margin=0.0) if deduped else []

    regions: List[Region] = []
    for i, s in enumerate(deduped):
        regions.append(
            Region(
                rect=rects[i],
                kind=s.kind,
                text=s.text or None,
                dom_path=s.dom_path,
                page=-1,
                meta={"order": -1, "char_start": -1, "char_end": -1},
            )
        )

    parts: List[str] = []
    spans: List[Tuple[int, int, int]] = []  # (region_idx, start, end)
    pos = 0
    for rank, i in enumerate(order):
        regions[i].meta["order"] = rank
        s = deduped[i]
        if s.kind not in KEEP_KINDS or not s.text:
            continue
        if s.kind in (
            BlockKind.Text,
            BlockKind.Title,
            BlockKind.Caption,
            BlockKind.FigureCaption,
            BlockKind.TableCaption,
        ) and caption_crossref_drop(s.text):
            continue
        if s.kind == BlockKind.Equation:
            chunk = "\n$$\n" + s.text + "\n$$\n"
        else:
            chunk = s.text
        if parts:
            pos += len(HTML_BLOCK_JOIN)
        parts.append(chunk)
        spans.append((i, pos, pos + len(chunk)))
        pos += len(chunk)

    text = HTML_BLOCK_JOIN.join(parts)
    for i, start, end in spans:
        regions[i].meta["char_start"] = start
        regions[i].meta["char_end"] = end
    return text, regions
