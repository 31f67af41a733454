"""Differential property test: the row-vectorized Levenshtein in
``textnorm.levenshtein_distance`` must equal a straight port of the
reference DP (``/root/reference/latyas/utils/text_utils.py:1-18``) over
randomized pairs — empty/equal/near/disjoint, unicode, long strings."""

import random

from latyas_ray.textnorm import levenshtein_distance


def _ref_levenshtein(s1: str, s2: str) -> int:
    if len(s1) < len(s2):
        return _ref_levenshtein(s2, s1)
    if len(s2) == 0:
        return len(s1)
    previous_row = range(len(s2) + 1)
    for i, c1 in enumerate(s1):
        current_row = [i + 1]
        for j, c2 in enumerate(s2):
            insertions = previous_row[j + 1] + 1
            deletions = current_row[j] + 1
            substitutions = previous_row[j] + (c1 != c2)
            current_row.append(min(insertions, deletions, substitutions))
        previous_row = current_row
    return previous_row[-1]


def _rand_str(rng: random.Random, alphabet: str, max_len: int) -> str:
    return "".join(rng.choice(alphabet) for _ in range(rng.randrange(max_len + 1)))


def test_levenshtein_matches_reference_dp_fuzz():
    rng = random.Random(0x1EE7)
    alphabets = ["ab", "abcde", "abc 中文。xyz", "a"]
    for case in range(1500):
        alpha = rng.choice(alphabets)
        a = _rand_str(rng, alpha, 40)
        if rng.random() < 0.4:  # correlated pair: mutate a
            chars = list(a)
            for _ in range(rng.randrange(4)):
                if not chars:
                    break
                op = rng.randrange(3)
                pos = rng.randrange(len(chars))
                if op == 0:
                    chars[pos] = rng.choice(alpha)
                elif op == 1:
                    del chars[pos]
                else:
                    chars.insert(pos, rng.choice(alpha))
            b = "".join(chars)
        else:
            b = _rand_str(rng, alpha, 40)
        assert levenshtein_distance(a, b) == _ref_levenshtein(a, b), (
            f"case {case}: {a!r} vs {b!r}"
        )


def test_levenshtein_matches_reference_dp_long():
    rng = random.Random(7)
    base = "".join(rng.choice("abcdefgh ") for _ in range(600))
    mutated = base[:150] + "XYZ" + base[160:400] + base[420:]
    assert levenshtein_distance(base, mutated) == _ref_levenshtein(base, mutated)
    assert levenshtein_distance(base, "") == len(base)
    assert levenshtein_distance("", "") == 0
