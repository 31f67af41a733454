"""Differential property test: ``functions.latex.to_katex`` (table-driven
re-expression) vs a straight port of the reference's rewrite chain
(``/root/reference/latyas/tex_ocr/models/texteller/ocr_model/utils/to_katex.py:1-180``)
over generated LaTeX covering every rewrite rule — the same earned-claim
mechanism as the XY-cut / overlap / TSR differentials."""

import random
import re

import pytest

from latyas_ray.functions.latex import to_katex

# ---- straight port of the reference chain (to_katex.py:1-180) ----


def _change(input_str, old_inst, new_inst, old_surr_l, old_surr_r,
            new_surr_l, new_surr_r):
    result = ""
    i = 0
    n = len(input_str)
    while i < n:
        if input_str[i:i + len(old_inst)] == old_inst:
            start = i + len(old_inst)
        else:
            result += input_str[i]
            i += 1
            continue
        if start < n and input_str[start] == old_surr_l:
            count = 1
            j = start + 1
            escaped = False
            while j < n and count > 0:
                if input_str[j] == '\\' and not escaped:
                    escaped = True
                    j += 1
                    continue
                if input_str[j] == old_surr_r and not escaped:
                    count -= 1
                    if count == 0:
                        break
                elif input_str[j] == old_surr_l and not escaped:
                    count += 1
                escaped = False
                j += 1
            if count == 0:
                inner_content = input_str[start + 1:j]
                result += new_inst + new_surr_l + inner_content + new_surr_r
                i = j + 1
                continue
            else:
                result += new_inst + new_surr_l
                i = start + 1
                continue
        else:
            result += input_str[i:start]
            i = start
    if old_inst != new_inst and (old_inst + old_surr_l) in result:
        return _change(result, old_inst, new_inst, old_surr_l, old_surr_r,
                       new_surr_l, new_surr_r)
    return result


def _rm_dollar_surr(content):
    pattern = re.compile(r'\\[a-zA-Z]+\$.*?\$|\$.*?\$')
    matches = pattern.findall(content)
    for match in matches:
        if not re.match(r'\\[a-zA-Z]+', match):
            new_match = match.strip('$')
            content = content.replace(match, ' ' + new_match + ' ')
    return content


def _change_all(input_str, old_inst, new_inst, old_surr_l, old_surr_r,
                new_surr_l, new_surr_r):
    pos = [m.start() for m in re.finditer(re.escape(old_inst + old_surr_l),
                                          input_str)]
    res = list(input_str)
    for p in pos[::-1]:
        res[p:] = list(_change(''.join(res[p:]), old_inst, new_inst,
                               old_surr_l, old_surr_r, new_surr_l, new_surr_r))
    return ''.join(res)


def _ref_to_katex(formula: str) -> str:
    res = formula
    res = _change_all(res, r'\mbox ', r' ', r'{', r'}', r'', r'')
    res = _change_all(res, r'\mbox', r' ', r'{', r'}', r'', r'')
    res = re.sub(r'\\hbox to ?-? ?\d+\.\d+(pt)?\{', r'\\hbox{', res)
    res = _change_all(res, r'\hbox', r' ', r'{', r'}', r'', r' ')
    res = re.sub(r'\\raise ?-? ?\d+\.\d+(pt)?', r' ', res)
    res = re.sub(r'\\makebox ?\[\d+\.\d+(pt)?\]\{', r'\\makebox{', res)
    res = _change_all(res, r'\makebox', r' ', r'{', r'}', r'', r' ')
    res = re.sub(r'\\raisebox\{-? ?\d+\.\d+(pt)?\}\{', r'\\raisebox{', res)
    res = re.sub(r'\\scalebox\{-? ?\d+\.\d+(pt)?\}\{', r'\\scalebox{', res)
    res = _change_all(res, r'\scalebox', r' ', r'{', r'}', r'', r' ')
    res = _change_all(res, r'\raisebox', r' ', r'{', r'}', r'', r' ')
    res = _change_all(res, r'\vbox', r' ', r'{', r'}', r'', r' ')
    for ins in (r'\Huge', r'\huge', r'\LARGE', r'\Large', r'\large',
                r'\normalsize', r'\small', r'\footnotesize', r'\tiny'):
        res = _change_all(res, ins, ins, r'$', r'$', '{', '}')
    res = _change_all(res, r'\boldmath ', r'\bm', r'{', r'}', r'{', r'}')
    res = _change_all(res, r'\boldmath', r'\bm', r'{', r'}', r'{', r'}')
    res = _change_all(res, r'\boldmath ', r'\bm', r'$', r'$', r'{', r'}')
    res = _change_all(res, r'\boldmath', r'\bm', r'$', r'$', r'{', r'}')
    res = _change_all(res, r'\scriptsize', r'\scriptsize', r'$', r'$', r'{', r'}')
    res = _change_all(res, r'\emph', r'\textit', r'{', r'}', r'{', r'}')
    res = _change_all(res, r'\emph ', r'\textit', r'{', r'}', r'{', r'}')
    for ins in (r'\left', r'\middle', r'\right', r'\big', r'\Big', r'\bigg',
                r'\Bigg', r'\bigl', r'\Bigl', r'\biggl', r'\Biggl', r'\bigm',
                r'\Bigm', r'\biggm', r'\Biggm', r'\bigr', r'\Bigr',
                r'\biggr', r'\Biggr'):
        res = _change_all(res, ins, ins, r'{', r'}', r'', r'')
    res = re.sub(r'\\\[(.*?)\\\]', r'\1\\newline', res)
    if res.endswith(r'\newline'):
        res = res[:-8]
    res = re.sub(r'(\\,){1,}', ' ', res)
    res = re.sub(r'(\\!){1,}', ' ', res)
    res = re.sub(r'(\\;){1,}', ' ', res)
    res = re.sub(r'(\\:){1,}', ' ', res)
    res = re.sub(r'\\vspace\{.*?}', '', res)

    def merge_texts(match):
        texts = match.group(0)
        merged = ''.join(re.findall(r'\\text\{([^}]*)\}', texts))
        return f'\\text{{{merged}}}'

    res = re.sub(r'(\\text\{[^}]*\}\s*){2,}', merge_texts, res)
    res = res.replace(r'\bf ', '')
    res = _rm_dollar_surr(res)
    res = re.sub(r' +', ' ', res)
    return res.strip()


# ------------------------------------------------------------- generators

_ATOMS = ["x", "y+z", r"\alpha", "a_{i}^{2}", r"\frac{a}{b}", "42", "(p)",
          r"\sum_{i=1}^n i"]


def _gen_fragment(rng: random.Random, depth: int = 0) -> str:
    inner = rng.choice(_ATOMS) if depth >= 3 else _gen_expr(rng, depth + 1)
    kind = rng.randrange(24)
    if kind == 0:
        return rng.choice([r"\mbox{", r"\mbox {"]) + inner + "}"
    if kind == 1:
        return r"\hbox to 3.5pt{" + inner + "}"
    if kind == 2:
        return r"\raise 1.5pt " + inner
    if kind == 3:
        return r"\makebox[4.0pt]{" + inner + "}"
    if kind == 4:
        return r"\raisebox{-2.0pt}{" + inner + "}"
    if kind == 5:
        return rng.choice([r"\large", r"\small", r"\Huge", r"\scriptsize",
                           r"\tiny"]) + "$" + inner + "$"
    if kind == 6:
        return rng.choice([r"\boldmath{", r"\boldmath {", r"\boldmath$",
                           r"\boldmath $"]) + inner + rng.choice("}$")
    if kind == 7:
        return rng.choice([r"\emph{", r"\emph {"]) + inner + "}"
    if kind == 8:
        return rng.choice([r"\left", r"\big", r"\Bigr"]) + "{" + rng.choice("(){}[]|") + "}"
    if kind == 9:
        return r"\[" + inner + r"\]"
    if kind == 10:
        return rng.choice([r"\,", r"\!", r"\;", r"\:"]) * rng.randint(1, 3)
    if kind == 11:
        return r"\vspace{2pt}"
    if kind == 12:
        return r"\text{" + rng.choice(["ab", "c d"]) + "} " + r"\text{ef}"
    if kind == 13:
        return r"\bf " + inner
    if kind == 14:
        return "$" + inner + "$"
    if kind == 15:
        return r"\vbox{" + inner + "}"
    if kind == 16:
        return r"\scalebox{1.5}{" + inner + "}"
    if kind == 17:  # macro adjacency, no separating space
        return rng.choice([r"\mbox", r"\hbox", r"\vbox"]) + _gen_fragment(
            rng, depth + 1
        )
    if kind == 18:  # unbalanced / stray delimiters
        return rng.choice(["{", "}", "$", r"\mbox{", r"\large$"]) + inner
    if kind == 19:  # escaped braces inside content
        return r"\mbox{" + inner.replace("{", r"\{", 1) + "}"
    return inner


def _gen_expr(rng: random.Random, depth: int = 0) -> str:
    sep = rng.choice([" ", " ", ""])  # sometimes no separator: adjacency
    return sep.join(_gen_fragment(rng, depth) for _ in range(rng.randint(1, 4)))


def test_to_katex_matches_reference_port_fuzz():
    rng = random.Random(0x7E8)
    for case in range(6000):
        s = _gen_expr(rng)
        assert to_katex(s) == _ref_to_katex(s), f"case {case}: {s!r}"


def test_to_katex_matches_on_adjacency_and_depth_edges():
    """Directed edges the generator can under-sample: the \\raise-minted
    space feeding \\mbox (the divergence the fuzz caught), and nesting
    beyond the old re-sweep cap."""
    cases = [
        "\\mbox\\raise 1.5pt{x}",
        "\\mbox \\raise 1.5pt{x}",
        "\\hbox\\raise 2.0pt{y}",
        "\\boldmath$a$\\boldmath{b}",
        "\\emph" + "{\\emph" * 80 + "{x}" + "}" * 80,
        "\\small$\\small$x$$",
    ]
    for s in cases:
        assert to_katex(s) == _ref_to_katex(s), repr(s)


def test_to_katex_matches_on_corpus_equations():
    """Every display equation the corpus grammar emits must normalize
    identically under both implementations."""
    eqs = ["E = mc^2", "\\int_0^1 x^2 dx = 1/3", "a^2 + b^2 = c^2",
           "\\sum_{i=1}^n i = n(n+1)/2", "E=mc^2", "\\frac{a}{b}=c",
           "x^n+y^n=z^n", "$inline$"]
    for eq in eqs:
        assert to_katex(eq) == _ref_to_katex(eq), eq
