"""Pure-Python string-similarity metrics (normalized to [0, 1]).

Parity surface for the reference's SimilarityRegistry, which wraps 27
textdistance metrics (PyDI/utils/similarity_registry.py:27-90). These are
the *fallback* path, executed inside Arrow-batched pandas UDFs; the common
metrics (levenshtein, jaccard, dice, overlap, cosine, prefix, postfix,
length, identity) have native Column-expression fast paths in
``similarity.py`` and never reach Python.

All functions take two strings and return a normalized similarity
(1.0 = identical), matching textdistance's ``normalized_similarity``.
"""

from __future__ import annotations

from difflib import SequenceMatcher
from typing import Callable, Sequence


# ---------------------------------------------------------------- edit-based

def levenshtein_dist(a: Sequence, b: Sequence) -> int:
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def levenshtein(a: str, b: str) -> float:
    m = max(len(a), len(b))
    return 1.0 if m == 0 else 1.0 - levenshtein_dist(a, b) / m


def damerau_levenshtein(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if max(la, lb) == 0:
        return 1.0
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = a[i - 1] != b[j - 1]
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return 1.0 - d[la][lb] / max(la, lb)


def hamming(a: str, b: str) -> float:
    m = max(len(a), len(b))
    if m == 0:
        return 1.0
    dist = sum(ca != cb for ca, cb in zip(a, b)) + abs(len(a) - len(b))
    return 1.0 - dist / m


def jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    window = max(window, 0)
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and a[i] == b[j]:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    j = jaro(a, b)
    prefix = 0
    for ca, cb in zip(a[:max_prefix], b[:max_prefix]):
        if ca == cb:
            prefix += 1
        else:
            break
    return j + prefix * p * (1.0 - j)


def strcmp95(a: str, b: str) -> float:
    """Jaro-Winkler variant with long-string adjustment (strcmp95 core)."""
    jw = jaro_winkler(a.strip(), b.strip())
    la, lb = len(a), len(b)
    if min(la, lb) > 4 and jw > 0.7:
        common = sum(min(a.count(c), b.count(c)) for c in set(a))
        if common > 0 and min(la, lb) > 0:
            adj = (common - min(la, lb) / 2) / (la + lb - common) if (la + lb - common) else 0
            jw += (1.0 - jw) * max(0.0, adj) * 0.1
    return min(jw, 1.0)


def _nw_score(a: str, b: str, gap: float = -1.0,
              match: float = 1.0, mismatch: float = -1.0) -> float:
    prev = [j * gap for j in range(len(b) + 1)]
    for i, ca in enumerate(a, 1):
        cur = [i * gap]
        for j, cb in enumerate(b, 1):
            s = match if ca == cb else mismatch
            cur.append(max(prev[j - 1] + s, prev[j] + gap, cur[j - 1] + gap))
        prev = cur
    return prev[-1]


def needleman_wunsch(a: str, b: str) -> float:
    m = max(len(a), len(b))
    if m == 0:
        return 1.0
    return max(0.0, _nw_score(a, b)) / m


def gotoh(a: str, b: str, open_: float = -1.0, extend: float = -0.5,
          match: float = 1.0, mismatch: float = -1.0) -> float:
    """Affine-gap global alignment similarity."""
    la, lb = len(a), len(b)
    m = max(la, lb)
    if m == 0:
        return 1.0
    NEG = float("-inf")
    d = [[0.0] * (lb + 1) for _ in range(la + 1)]
    p = [[NEG] * (lb + 1) for _ in range(la + 1)]
    q = [[NEG] * (lb + 1) for _ in range(la + 1)]
    for i in range(1, la + 1):
        d[i][0] = open_ + (i - 1) * extend
        q[i][0] = NEG
    for j in range(1, lb + 1):
        d[0][j] = open_ + (j - 1) * extend
        p[0][j] = NEG
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            p[i][j] = max(d[i - 1][j] + open_, p[i - 1][j] + extend)
            q[i][j] = max(d[i][j - 1] + open_, q[i][j - 1] + extend)
            s = match if a[i - 1] == b[j - 1] else mismatch
            d[i][j] = max(d[i - 1][j - 1] + s, p[i][j], q[i][j])
    return max(0.0, d[la][lb]) / m


def smith_waterman(a: str, b: str, gap: float = -1.0,
                   match: float = 1.0, mismatch: float = -1.0) -> float:
    m = min(len(a), len(b))
    if m == 0:
        return 1.0 if len(a) == len(b) else 0.0
    best = 0.0
    prev = [0.0] * (len(b) + 1)
    for ca in a:
        cur = [0.0]
        for j, cb in enumerate(b, 1):
            s = match if ca == cb else mismatch
            v = max(0.0, prev[j - 1] + s, prev[j] + gap, cur[j - 1] + gap)
            cur.append(v)
            best = max(best, v)
        prev = cur
    return best / m


def mlipns(a: str, b: str, threshold: float = 0.25, max_mismatches: int = 2) -> float:
    """Modified Language-Independent Product Name Search: binary 0/1."""
    if a == b:
        return 1.0
    m = max(len(a), len(b))
    if m == 0:
        return 1.0
    ham = sum(ca != cb for ca, cb in zip(a, b)) + abs(len(a) - len(b))
    return 1.0 if ham <= max_mismatches and ham / m <= threshold else 0.0


_EDITEX_GROUPS = ["aeiouy", "bp", "ckq", "dt", "lr", "mn", "gj", "fpv", "sxz", "csz"]


def _editex_cost(ca: str, cb: str) -> int:
    if ca == cb:
        return 0
    for g in _EDITEX_GROUPS:
        if ca in g and cb in g:
            return 1
    return 2


def editex(a: str, b: str) -> float:
    a, b = a.lower(), b.lower()
    la, lb = len(a), len(b)
    m = max(la, lb)
    if m == 0:
        return 1.0
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(1, la + 1):
        d[i][0] = d[i - 1][0] + (2 if i == 1 or _editex_cost(a[i - 2], a[i - 1]) else 1)
    for j in range(1, lb + 1):
        d[0][j] = d[0][j - 1] + (2 if j == 1 or _editex_cost(b[j - 2], b[j - 1]) else 1)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            d[i][j] = min(d[i - 1][j] + 1 + (_editex_cost(a[i - 2], a[i - 1]) > 0 if i > 1 else 1),
                          d[i][j - 1] + 1 + (_editex_cost(b[j - 2], b[j - 1]) > 0 if j > 1 else 1),
                          d[i - 1][j - 1] + _editex_cost(a[i - 1], b[j - 1]))
    return 1.0 - d[la][lb] / (2 * m)


# ---------------------------------------------------------------- token-based

def _word_toks(s: str) -> list[str]:
    return [t for t in s.lower().split() if t]


def jaccard(a: str, b: str) -> float:
    sa, sb = set(_word_toks(a)), set(_word_toks(b))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def sorensen_dice(a: str, b: str) -> float:
    sa, sb = set(_word_toks(a)), set(_word_toks(b))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return 2 * len(sa & sb) / (len(sa) + len(sb))


def overlap(a: str, b: str) -> float:
    sa, sb = set(_word_toks(a)), set(_word_toks(b))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / min(len(sa), len(sb))


def tversky(a: str, b: str, alpha: float = 1.0, beta: float = 1.0) -> float:
    sa, sb = set(_word_toks(a)), set(_word_toks(b))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    denom = inter + alpha * len(sa - sb) + beta * len(sb - sa)
    return inter / denom if denom else 0.0


def tanimoto(a: str, b: str) -> float:
    return jaccard(a, b)


def cosine(a: str, b: str) -> float:
    from collections import Counter
    from math import sqrt

    ca, cb = Counter(_word_toks(a)), Counter(_word_toks(b))
    if not ca and not cb:
        return 1.0
    if not ca or not cb:
        return 0.0
    dot = sum(ca[t] * cb[t] for t in ca)
    na = sqrt(sum(v * v for v in ca.values()))
    nb = sqrt(sum(v * v for v in cb.values()))
    return dot / (na * nb)


def bag(a: str, b: str) -> float:
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    m = max(len(a), len(b))
    if m == 0:
        return 1.0
    dist = max(sum((ca - cb).values()), sum((cb - ca).values()))
    return 1.0 - dist / m


def monge_elkan(a: str, b: str,
                inner: Callable[[str, str], float] | None = None) -> float:
    """Mean over tokens of max inner similarity (default inner=jaro_winkler)."""
    inner = inner or jaro_winkler
    ta, tb = _word_toks(a), _word_toks(b)
    if not ta and not tb:
        return 1.0
    if not ta or not tb:
        return 0.0
    return sum(max(inner(x, y) for y in tb) for x in ta) / len(ta)


# ------------------------------------------------------------- sequence-based

def lcsseq(a: str, b: str) -> float:
    m = max(len(a), len(b))
    if m == 0:
        return 1.0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1] / m


def lcsstr(a: str, b: str) -> float:
    m = max(len(a), len(b))
    if m == 0:
        return 1.0
    best = 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            v = prev[j - 1] + 1 if ca == cb else 0
            cur.append(v)
            best = max(best, v)
        prev = cur
    return best / m


def ratcliff_obershelp(a: str, b: str) -> float:
    if not a and not b:
        return 1.0
    # difflib's ratio() is order-sensitive in tie-breaking (found by the
    # hypothesis symmetry property); canonical argument order makes the
    # metric symmetric by construction
    if b < a:
        a, b = b, a
    return SequenceMatcher(None, a, b, autojunk=False).ratio()


# -------------------------------------------------------------------- simple

def prefix(a: str, b: str) -> float:
    m = min(len(a), len(b))
    if max(len(a), len(b)) == 0:
        return 1.0
    if m == 0:
        return 0.0
    n = 0
    for ca, cb in zip(a, b):
        if ca != cb:
            break
        n += 1
    return n / m


def postfix(a: str, b: str) -> float:
    return prefix(a[::-1], b[::-1])


def length(a: str, b: str) -> float:
    m = max(len(a), len(b))
    return 1.0 if m == 0 else min(len(a), len(b)) / m


def identity(a: str, b: str) -> float:
    return 1.0 if a == b else 0.0


# ------------------------------------------------------------------ phonetic

def _mra_encode(s: str) -> str:
    s = "".join(c for c in s.upper() if c.isalpha())
    if not s:
        return ""
    out = s[0] + "".join(c for c in s[1:] if c not in "AEIOU")
    dedup = out[0]
    for c in out[1:]:
        if c != dedup[-1]:
            dedup += c
    if len(dedup) > 6:
        dedup = dedup[:3] + dedup[-3:]
    return dedup


def mra(a: str, b: str) -> float:
    """Match Rating Approach comparison, normalized to [0,1]."""
    ea, eb = _mra_encode(a), _mra_encode(b)
    if not ea and not eb:
        return 1.0
    if not ea or not eb:
        return 0.0
    if abs(len(ea) - len(eb)) > 2:
        return 0.0
    # strike out identical chars L->R then R->L
    ra, rb = list(ea), list(eb)
    for lst_a, lst_b in ((ra, rb),):
        i = 0
        while i < len(lst_a):
            if lst_a[i] in lst_b:
                lst_b.remove(lst_a[i])
                lst_a.pop(i)
            else:
                i += 1
    unmatched = max(len(ra), len(rb))
    minimum_rating = 6 - unmatched
    # map to [0,1]: 6 -> 1.0
    return max(0.0, minimum_rating) / 6.0


REGISTRY: dict[str, Callable[[str, str], float]] = {
    # edit-based (similarity_registry.py:27-39)
    "hamming": hamming,
    "levenshtein": levenshtein,
    "damerau_levenshtein": damerau_levenshtein,
    "jaro_winkler": jaro_winkler,
    "jaro": jaro,
    "strcmp95": strcmp95,
    "needleman_wunsch": needleman_wunsch,
    "gotoh": gotoh,
    "smith_waterman": smith_waterman,
    "mlipns": mlipns,
    "editex": editex,
    # token-based (:42-51)
    "jaccard": jaccard,
    "sorensen_dice": sorensen_dice,
    "tversky": tversky,
    "overlap": overlap,
    "tanimoto": tanimoto,
    "cosine": cosine,
    "monge_elkan": monge_elkan,
    "bag": bag,
    # sequence-based (:54-58)
    "lcsseq": lcsseq,
    "lcsstr": lcsstr,
    "ratcliff_obershelp": ratcliff_obershelp,
    # simple (:61-66)
    "prefix": prefix,
    "postfix": postfix,
    "length": length,
    "identity": identity,
    # phonetic (:69-71)
    "mra": mra,
}
