"""Fuzzy string similarity — difflib-backed reimplementation of the three
scores the reference uses (deduplicator.py:155-168 via fuzzywuzzy):
ratio, token_sort_ratio, partial_ratio. fuzzywuzzy's pure-python fallback is
difflib.SequenceMatcher, so these match its behavior.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

_NON_ALNUM = re.compile(r"[^\w]+", re.UNICODE)


def _ratio(a: str, b: str) -> int:
    if not a and not b:
        return 100
    if not a or not b:
        return 0
    return int(round(100 * SequenceMatcher(None, a, b).ratio()))


def ratio(a: str, b: str) -> int:
    return _ratio(a, b)


def _full_process(s: str) -> str:
    return " ".join(_NON_ALNUM.sub(" ", s.lower()).split())


def token_sort_ratio(a: str, b: str) -> int:
    sa = " ".join(sorted(_full_process(a).split()))
    sb = " ".join(sorted(_full_process(b).split()))
    return _ratio(sa, sb)


def partial_ratio(a: str, b: str) -> int:
    """Best-matching-substring ratio (fuzzywuzzy partial_ratio algorithm)."""
    if not a or not b:
        return 100 if a == b else 0
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    m = SequenceMatcher(None, shorter, longer)
    best = 0.0
    for block in m.get_matching_blocks():
        start = max(0, block.b - block.a)
        segment = longer[start : start + len(shorter)]
        r = SequenceMatcher(None, shorter, segment).ratio()
        if r > 0.995:
            return 100
        best = max(best, r)
    return int(round(100 * best))


def max_similarity(a: str, b: str) -> int:
    return max(ratio(a, b), token_sort_ratio(a, b), partial_ratio(a, b))
