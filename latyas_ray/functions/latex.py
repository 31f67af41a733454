"""LaTeX → KaTeX-safe normalization (scalar string function).

Semantics of the reference's ``to_katex``
(``/root/reference/latyas/tex_ocr/models/texteller/ocr_model/utils/to_katex.py:89-180``)
re-expressed as a table-driven rewrite pipeline:

- box macros (``\\mbox``/``\\hbox``/``\\makebox``/``\\raisebox``/
  ``\\scalebox``/``\\vbox``) and their dimension arguments are unwrapped,
- size macros keep their content but switch ``$…$`` delimiters to braces,
- ``\\boldmath``→``\\bm``, ``\\emph``→``\\textit``,
- delimiter-size macros (``\\left``/``\\big``/…) lose stray braces,
- display blocks ``\\[…\\]`` become ``…\\newline`` (trailing one removed),
- spacing macros (``\\,``/``\\!``/``\\;``/``\\:``) collapse to one space,
  ``\\vspace{...}`` is dropped,
- consecutive ``\\text{...}`` runs merge, ``\\bf `` is stripped,
- bare ``$…$`` wrappers (not preceded by a macro) are removed,
- whitespace collapses to single spaces.

The brace matcher honors backslash escapes; occurrences are processed in
the reference's observable order — collected once, rewritten rightmost
suffix first (``change_all``), with a same-suffix re-sweep only when the
macro name changes (``change``'s tail recursion).  Unbalanced input
degrades gracefully.  Equivalence is enforced by a 2,000-case fuzz
against a straight port of the reference chain
(``tests/test_latex_differential.py``).
"""

from __future__ import annotations

import re
from typing import Tuple

_PAIRS = {"{": "}", "$": "$"}


def _match_close(s: str, start: int, open_ch: str, close_ch: str) -> int:
    """Index of the close matching ``s[start] == open_ch``, honoring
    backslash escapes; -1 when unbalanced."""
    depth = 1
    i = start + 1
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\":
            i += 2
            continue
        if c == close_ch and depth == 1:
            return i
        if c == close_ch:
            depth -= 1
        elif c == open_ch and open_ch != close_ch:
            depth += 1
        i += 1
    return -1


def _rewrite_pass(
    s: str,
    macro: str,
    repl: str,
    delims: Tuple[str, str],
    new_delims: Tuple[str, str],
) -> str:
    """One rewrite sweep: every ``macro<open>…<close>`` occurrence in one
    left-to-right scan → ``repl<new_open>…<new_close>`` (inner content
    copied verbatim); when the macro NAME changes, the sweep repeats on
    its own output until the pattern is gone (the reference ``change``'s
    tail recursion, ``to_katex.py:57-59`` — name-preserving rules do NOT
    re-sweep there, and neither do we)."""
    open_ch, close_ch = delims
    new_open, new_close = new_delims
    needle = macro + open_ch
    reapply = repl != macro
    guard = 0
    # high cap: the reference's tail recursion handles ~1000 nesting
    # levels before Python's recursion limit; match that envelope while
    # still bounding pathological self-feeding inputs
    while needle in s and guard < 1000:
        guard += 1
        out = []
        i = 0
        n = len(s)
        while i < n:
            if s.startswith(needle, i):
                open_at = i + len(macro)
                close_at = _match_close(s, open_at, open_ch, close_ch)
                if close_at < 0:  # unbalanced: rewrite the head, keep rest
                    out.append(repl + new_open)
                    i = open_at + 1
                    continue
                out.append(repl + new_open + s[open_at + 1: close_at] + new_close)
                i = close_at + 1
            else:
                out.append(s[i])
                i += 1
        s = "".join(out)
        if not reapply:
            break
    return s


def _rewrite_macro(
    s: str,
    macro: str,
    repl: str,
    delims: Tuple[str, str],
    new_delims: Tuple[str, str],
) -> str:
    """Rewrite with the reference's OCCURRENCE ORDER: positions of the
    pattern are collected on the input once and processed RIGHT-TO-LEFT,
    each rewriting the whole suffix from that position
    (``change_all``, ``to_katex.py:80-87``).  The order is observable —
    for ``$``-delimited rules an inner occurrence must collapse to braces
    before the outer one scans for its closing ``$``, and
    name-preserving rules must leave ``\\Bigr{}``'s empty braces behind
    rather than re-sweeping them away — so a plain fixpoint loop is NOT
    equivalent (caught by tests/test_latex_differential.py)."""
    needle = macro + delims[0]
    positions = [m.start() for m in re.finditer(re.escape(needle), s)]
    for p in reversed(positions):
        s = s[:p] + _rewrite_pass(s[p:], macro, repl, delims, new_delims)
    return s


_SIZE_MACROS = [r"\Huge", r"\huge", r"\LARGE", r"\Large", r"\large",
                r"\normalsize", r"\small", r"\footnotesize", r"\tiny"]
_DELIM_MACROS = [r"\left", r"\middle", r"\right",
                 r"\big", r"\Big", r"\bigg", r"\Bigg",
                 r"\bigl", r"\Bigl", r"\biggl", r"\Biggl",
                 r"\bigm", r"\Bigm", r"\biggm", r"\Biggm",
                 r"\bigr", r"\Bigr", r"\biggr", r"\Biggr"]


def strip_dollar_wrapped(s: str) -> str:
    """Remove ``$…$`` wrappers that do not directly follow a macro name
    (``to_katex.py:68-78`` ``rm_dollar_surr`` semantics)."""
    for m in re.findall(r"\\[a-zA-Z]+\$.*?\$|\$.*?\$", s):
        if not m.startswith("\\"):
            s = s.replace(m, " " + m.strip("$") + " ")
    return s


def to_katex(formula: str) -> str:
    s = formula
    # Box rules interleave with their dimension-argument regexes in the
    # REFERENCE ORDER (to_katex.py:92-106): \mbox before the \raise
    # substitution — a space minted by \raise must not feed the
    # "\mbox " rule (divergence caught by the adversarial fuzz).
    s = _rewrite_macro(s, r"\mbox ", " ", ("{", "}"), ("", ""))
    s = _rewrite_macro(s, r"\mbox", " ", ("{", "}"), ("", ""))
    s = re.sub(r"\\hbox to ?-? ?\d+\.\d+(pt)?\{", r"\\hbox{", s)
    s = _rewrite_macro(s, r"\hbox", " ", ("{", "}"), ("", " "))
    s = re.sub(r"\\raise ?-? ?\d+\.\d+(pt)?", r" ", s)
    s = re.sub(r"\\makebox ?\[\d+\.\d+(pt)?\]\{", r"\\makebox{", s)
    s = _rewrite_macro(s, r"\makebox", " ", ("{", "}"), ("", " "))
    s = re.sub(r"\\raisebox\{-? ?\d+\.\d+(pt)?\}\{", r"\\raisebox{", s)
    s = re.sub(r"\\scalebox\{-? ?\d+\.\d+(pt)?\}\{", r"\\scalebox{", s)
    s = _rewrite_macro(s, r"\scalebox", " ", ("{", "}"), ("", " "))
    s = _rewrite_macro(s, r"\raisebox", " ", ("{", "}"), ("", " "))
    s = _rewrite_macro(s, r"\vbox", " ", ("{", "}"), ("", " "))
    for macro in _SIZE_MACROS:
        s = _rewrite_macro(s, macro, macro, ("$", "$"), ("{", "}"))
    # both brace forms, then both dollar forms (to_katex.py:123-126)
    s = _rewrite_macro(s, r"\boldmath ", r"\bm", ("{", "}"), ("{", "}"))
    s = _rewrite_macro(s, r"\boldmath", r"\bm", ("{", "}"), ("{", "}"))
    s = _rewrite_macro(s, r"\boldmath ", r"\bm", ("$", "$"), ("{", "}"))
    s = _rewrite_macro(s, r"\boldmath", r"\bm", ("$", "$"), ("{", "}"))
    s = _rewrite_macro(s, r"\scriptsize", r"\scriptsize", ("$", "$"), ("{", "}"))
    for macro in (r"\emph", r"\emph "):
        s = _rewrite_macro(s, macro, r"\textit", ("{", "}"), ("{", "}"))
    for macro in _DELIM_MACROS:
        s = _rewrite_macro(s, macro, macro, ("{", "}"), ("", ""))

    s = re.sub(r"\\\[(.*?)\\\]", r"\1\\newline", s)
    if s.endswith(r"\newline"):
        s = s[: -len(r"\newline")]

    for spacer in (r"\,", r"\!", r"\;", r"\:"):
        s = re.sub(r"(" + re.escape(spacer) + r"){1,}", " ", s)
    s = re.sub(r"\\vspace\{.*?}", "", s)

    def _merge_text_runs(m: re.Match) -> str:
        inner = "".join(re.findall(r"\\text\{([^}]*)\}", m.group(0)))
        return "\\text{" + inner + "}"

    s = re.sub(r"(\\text\{[^}]*\}\s*){2,}", _merge_text_runs, s)
    s = s.replace(r"\bf ", "")
    s = strip_dollar_wrapped(s)
    s = re.sub(r" +", " ", s)
    return s.strip()
