"""Text utilities: Levenshtein distance, two-channel reconciliation,
caption/cross-reference filters.

- ``levenshtein_distance`` matches the reference DP
  (``/root/reference/latyas/utils/text_utils.py:1-18``) exactly, but runs
  the inner row vectorized in numpy (O(len1) Python iterations instead of
  O(len1·len2)) — the reference's pure-Python DP is a hot-path cost we do
  not copy.
- ``reconcile`` implements the dual-channel choose rule of
  ``pdf2txt.py:78-85``: prefer the cheap channel (native PDF text / the
  corpus's pre-extracted ``text`` column) when its normalized edit distance
  to the extractor output is < 0.2, else keep the extractor output.  At
  corpus scale the exact DP is quadratic, so the rule is tiered (exactly
  deterministic, documented): equality fast path → length-gap lower-bound
  reject → exact DP below ``exact_cap`` chars → line-level DP above it.
- ``caption_crossref_drop`` is the block filter of ``pdf2txt.py:86-89``:
  drop text starting with ``图``/``表``, or short text containing
  ``见表``/``见图``.
"""

from __future__ import annotations

import hashlib
from typing import Tuple

import numpy as np

# Accept the cheap channel when edit distance / max(len) is below this
# (pdf2txt.py:82).
RECONCILE_THRESHOLD = 0.2
# Above this many chars, fall back to line-level distance (scale guard).
EXACT_CAP = 8192
# Line-level DP cap: longer line sequences are chunk-merged down to this.
MAX_LINES = 2048


def levenshtein_distance(s1: str, s2: str) -> int:
    """Edit distance; semantics of ``text_utils.py:1-18``."""
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if len(s2) == 0:
        return len(s1)
    return _lev_np(
        np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32),
        np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32),
    )


def _lev_np(a1: np.ndarray, a2: np.ndarray) -> int:
    """Row-vectorized Levenshtein over two code-point arrays."""
    m = a2.shape[0]
    previous = np.arange(m + 1, dtype=np.int64)
    offs = np.arange(m + 1, dtype=np.int64)
    head = np.empty(m + 1, dtype=np.int64)
    for i in range(a1.shape[0]):
        sub = previous[:-1] + (a2 != a1[i])
        ins = previous[1:] + 1
        head[0] = i + 1
        head[1:] = np.minimum(sub, ins)
        # fold in left-to-right deletions: C[j] = min_{k<=j} head[k] + (j-k)
        previous = np.minimum.accumulate(head - offs) + offs
    return int(previous[-1])


def _line_tokens(s: str, max_lines: int = MAX_LINES) -> np.ndarray:
    """Hash each line to a token; chunk-merge when the line count exceeds
    ``max_lines`` so the DP stays bounded (deterministic)."""
    lines = s.split("\n")
    if len(lines) > max_lines:
        k = -(-len(lines) // max_lines)  # ceil
        lines = ["\n".join(lines[i : i + k]) for i in range(0, len(lines), k)]
    out = np.empty(len(lines), dtype=np.uint64)
    for i, ln in enumerate(lines):
        out[i] = np.uint64(
            int.from_bytes(hashlib.md5(ln.encode("utf-8")).digest()[:8], "little")
        )
    return out


def normalized_distance(extracted: str, candidate: str) -> float:
    """Deterministic tiered distance in [0, 1].

    Tiers: equality → 0; length-gap lower bound ≥ threshold → 1.0 (the true
    distance is provably ≥ |len gap|, so the accept test cannot pass);
    both short → exact char DP; else line-hash DP weighted by line count.
    """
    if extracted == candidate:
        return 0.0
    n1, n2 = len(extracted), len(candidate)
    mx = max(n1, n2)
    if mx == 0:
        return 0.0
    if abs(n1 - n2) / mx >= RECONCILE_THRESHOLD:
        return 1.0
    if mx <= EXACT_CAP:
        return levenshtein_distance(extracted, candidate) / mx
    t1, t2 = _line_tokens(extracted), _line_tokens(candidate)
    if t1.shape[0] < t2.shape[0]:
        t1, t2 = t2, t1
    if t2.shape[0] == 0:
        return 1.0
    d = _lev_np(t1, t2)
    return d / max(t1.shape[0], t2.shape[0])


def _decide_threshold(a1: np.ndarray, a2: np.ndarray, denom: int) -> bool:
    """Exact decision ``lev(a1, a2) / denom < RECONCILE_THRESHOLD`` without
    always paying the full DP (``a1`` is the longer array):

    - equal lengths: Hamming distance is an UPPER bound on edit distance,
      so ``ham/denom < t`` proves acceptance in one vectorized pass (the
      common near-identical-channels case);
    - during the DP, the row minimum is a non-decreasing LOWER bound on
      the final distance, so ``min/denom >= t`` proves rejection early
      (the disagreeing-channels case exits after ~t·n rows);
    - otherwise the completed DP's exact distance decides.

    Every early path is implied by the exact comparison, so the decision
    is bit-identical to ``normalized_distance(...) < RECONCILE_THRESHOLD``.
    """
    t = RECONCILE_THRESHOLD
    if a1.shape == a2.shape:
        ham = int((a1 != a2).sum())
        if ham / denom < t:
            return True
    m = a2.shape[0]
    previous = np.arange(m + 1, dtype=np.int64)
    offs = np.arange(m + 1, dtype=np.int64)
    head = np.empty(m + 1, dtype=np.int64)
    for i in range(a1.shape[0]):
        sub = previous[:-1] + (a2 != a1[i])
        ins = previous[1:] + 1
        head[0] = i + 1
        head[1:] = np.minimum(sub, ins)
        previous = np.minimum.accumulate(head - offs) + offs
        if not (i & 31) and int(previous.min()) / denom >= t:
            return False
    return int(previous[-1]) / denom < t


def _accept_candidate(extracted: str, candidate: str) -> bool:
    """``normalized_distance(extracted, candidate) < RECONCILE_THRESHOLD``,
    computed with the same tier structure but decision-exact shortcuts
    (:func:`_decide_threshold`)."""
    n1, n2 = len(extracted), len(candidate)
    mx = max(n1, n2)
    if mx == 0:
        return True
    if abs(n1 - n2) / mx >= RECONCILE_THRESHOLD:
        return False
    if mx <= EXACT_CAP:
        s1, s2 = (extracted, candidate) if n1 >= n2 else (candidate, extracted)
        return _decide_threshold(
            np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32),
            np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32),
            mx,
        )
    t1, t2 = _line_tokens(extracted), _line_tokens(candidate)
    if t1.shape[0] < t2.shape[0]:
        t1, t2 = t2, t1
    if t2.shape[0] == 0:
        return False
    return _decide_threshold(t1, t2, max(t1.shape[0], t2.shape[0]))


def reconcile(extracted: str, candidate: str) -> Tuple[str, str]:
    """Choose between extractor output and the cheap pre-extracted channel.

    Returns ``(final_text, source)`` with source ``"channel"`` when the
    candidate is accepted (distance < 0.2, ``pdf2txt.py:82-85``) else
    ``"extractor"``.  An empty candidate against non-empty extraction is
    always rejected; two empties agree trivially.
    """
    if extracted == candidate:
        return candidate, "channel"
    if not candidate:
        return extracted, "extractor"
    if _accept_candidate(extracted, candidate):
        return candidate, "channel"
    return extracted, "extractor"


def caption_crossref_drop(text: str) -> bool:
    """Block-level drop filter (``pdf2txt.py:86-89``)."""
    if text.startswith("图") or text.startswith("表"):
        return True
    if len(text) < 256 and ("见表" in text or "见图" in text):
        return True
    return False


def collapse_ws(s: str) -> str:
    """HTML text normalization: collapse whitespace runs to single spaces
    and strip — the DOM-text analog of the OCR join's newline strip
    (``paddleocr_ocr_model.py:79``)."""
    return " ".join(s.split())


def sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()
