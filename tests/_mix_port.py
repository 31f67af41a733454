"""VERBATIM port of the reference markdown-assembly walk — TEST-ONLY
differential harness (the declared-port pattern of ``_tatr_port.py``;
never imported by product code).

Sources transcribed:
- ``latyas/layout/models/texteller/det_model/Bbox.py:8-63``
  (Point/Bbox, THREADHOLD, same_row, __lt__)
- ``latyas/tex_ocr/models/texteller/ocr_model/utils/to_katex.py:4-86``
  (change / find_substring_positions / change_all)
- ``latyas/layout/models/texteller/utils/mix_inference.py:218-264``
  (the markdown walk: tag re-attach + inline bold-strip)
"""

import re


class Point:
    def __init__(self, x, y):
        self.x = int(x)
        self.y = int(y)


class Bbox:
    THREADHOLD = 0.4

    def __init__(self, x, y, h, w, label=None, confidence=0, content=None):
        self.p = Point(x, y)
        self.h = int(h)
        self.w = int(w)
        self.label = label
        self.confidence = confidence
        self.content = content

    @property
    def ll_point(self):
        return Point(self.p.x, self.p.y + self.h)

    def same_row(self, other) -> bool:
        if (
            (self.p.y >= other.p.y and self.ll_point.y <= other.ll_point.y)
            or (self.p.y <= other.p.y and self.ll_point.y >= other.ll_point.y)
        ):
            return True
        if self.ll_point.y <= other.p.y or self.p.y >= other.ll_point.y:
            return False
        return 1.0 * abs(self.p.y - other.p.y) / max(self.h, other.h) < self.THREADHOLD

    def __lt__(self, other) -> bool:
        if not self.same_row(other):
            return self.p.y < other.p.y
        else:
            return self.p.x < other.p.x


def change(input_str, old_inst, new_inst, old_surr_l, old_surr_r,
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
                assert j < n
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
        return change(result, old_inst, new_inst, old_surr_l, old_surr_r,
                      new_surr_l, new_surr_r)
    else:
        return result


def find_substring_positions(string, substring):
    return [m.start() for m in re.finditer(re.escape(substring), string)]


def change_all(input_str, old_inst, new_inst, old_surr_l, old_surr_r,
               new_surr_l, new_surr_r):
    pos = find_substring_positions(input_str, old_inst + old_surr_l)
    res = list(input_str)
    for p in pos[::-1]:
        res[p:] = list(change(''.join(res[p:]), old_inst, new_inst,
                              old_surr_l, old_surr_r, new_surr_l, new_surr_r))
    return ''.join(res)


def mix_markdown(bboxes):
    """mix_inference.py:218-264 — boxes already content-wrapped
    (embedding ' $…$ ', isolated '\\n\\n$$…$$\\n\\n')."""
    bboxes = sorted(bboxes)
    if bboxes == []:
        return ""

    md = ""
    prev = Bbox(bboxes[0].p.x, bboxes[0].p.y, -1, -1, label="guard")
    for curr in bboxes:
        if (
            prev.label == "isolated"
            and curr.label == "text"
            and prev.same_row(curr)
        ):
            curr.content = curr.content.strip()
            if curr.content.startswith('(') and curr.content.endswith(')'):
                curr.content = curr.content[1:-1]

            if re.search(r'\\tag\{.*\}$', md[:-4]) is not None:
                md = md[:-5] + f', {curr.content}' + '}' + md[-4:]
            else:
                md = md[:-4] + f'\\tag{{{curr.content}}}' + md[-4:]
            continue

        if not prev.same_row(curr):
            md += " "

        if curr.label == "embedding":
            curr.content = change_all(curr.content, r'\bm', r' ', r'{', r'}', r'', r' ')
            curr.content = change_all(curr.content, r'\boldsymbol', r' ', r'{', r'}', r'', r' ')
            curr.content = change_all(curr.content, r'\textit', r' ', r'{', r'}', r'', r' ')
            curr.content = change_all(curr.content, r'\textbf', r' ', r'{', r'}', r'', r' ')
            curr.content = change_all(curr.content, r'\textbf', r' ', r'{', r'}', r'', r' ')
            curr.content = change_all(curr.content, r'\mathbf', r' ', r'{', r'}', r'', r' ')

            curr.content = curr.content.replace(r'\begin{split}', r'\begin{aligned}')
            curr.content = curr.content.replace(r'\end{split}', r'\end{aligned}')

            curr.content = re.sub(r' +', ' ', curr.content)
            assert curr.content.startswith(' $') and curr.content.endswith('$ ')
            curr.content = ' $' + curr.content[2:-2].strip() + '$ '
        md += curr.content
        prev = curr
    return md.strip()
