"""Jaro-Winkler string similarity (Jaro, JASA 1989; Winkler, ASA
1990) — own implementation, oracle-checked against DuckDB's builtin.

The edit-distance companion of the typosquat/homoglyph arms: census-
style record linkage (the Fellegi-Sunter scorer two gates over)
weighs name-field agreement with exactly this statistic. Conventions
pinned by the DuckDB builtin (probed, not assumed): empty-vs-
anything AND empty-vs-empty score 0.0; the Winkler prefix boost
l*p*(1-jaro) applies only when jaro exceeds the 0.7 bookkeeping
threshold, prefix capped at 4, p = 0.1.
"""

from __future__ import annotations


def jaro(s1: str, s2: str) -> float:
    if not s1 or not s2:
        return 0.0
    n1, n2 = len(s1), len(s2)
    window = max(n1, n2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(n2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: matched chars out of order, counted in halves
    t = 0
    k = 0
    for i in range(n1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (
        matches / n1 + matches / n2 + (matches - t) / matches
    ) / 3.0


def jaro_winkler(
    s1: str, s2: str, p: float = 0.1, threshold: float = 0.7
) -> float:
    j = jaro(s1, s2)
    if j <= threshold:
        return j
    l = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        l += 1
    return j + l * p * (1.0 - j)
