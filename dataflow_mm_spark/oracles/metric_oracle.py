"""Independent reference implementations of the text metrics, used ONLY to
derive DuckDB oracle constants for the driver gate (plans/registry.py).

These are deliberately written in a DIFFERENT shape from the engine kernels
in functions/evaluate.py — full-matrix edit-distance DP (vs rolling row),
dict-based n-gram counting with precision/recall computed separately (vs
Counter intersection + F1 helper), recursive-free LCS over a different loop
order, and a literal transcription of the BLEU formula — so an
implementation bug in the engine cannot silently co-exist in the oracle.
The driver gate then holds the engine kernels to these constants over a
generated fixture family (≥16 shapes per metric, including empty strings,
unicode, repeated tokens, and mixed insert/delete/substitute edits).

Boundary conventions (shared metric DEFINITION, not shared code):
* WER(ref, hyp) = word edit distance / len(ref); empty ref → distance is
  len(hyp) (pure insertions) with denominator 1;
* ROUGE tokenization = lowercased ``[a-z0-9]+`` runs (rouge_score default,
  no stemming); empty token list on either side → 0.0;
* BLEU = method1-smoothed sentence BLEU (zero n-gram numerators become 0.1)
  with 0.0 when the hypothesis has no n-grams at any order ≤ 4.
"""

from __future__ import annotations

import math
import re

_TOKEN = re.compile(r"[a-z0-9]+")


def edit_distance(a: list[str], b: list[str]) -> int:
    """Full-matrix Wagner–Fischer over word lists."""
    m, n = len(a), len(b)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
    return d[m][n]


def wer(ref: str, hyp: str) -> float:
    r, h = ref.split(), hyp.split()
    if not r:
        return float(len(h))
    return edit_distance(r, h) / len(r)


def ocr_reward(ref: str, hyp: str) -> float:
    """Clipped 1-WER, the reference OCR reward."""
    return max(0.0, min(1.0, 1.0 - wer(ref, hyp)))


def _ngrams(tokens: list[str], n: int) -> dict[tuple, int]:
    counts: dict[tuple, int] = {}
    for i in range(len(tokens) - n + 1):
        g = tuple(tokens[i : i + n])
        counts[g] = counts.get(g, 0) + 1
    return counts


def _rouge_n(ref_t: list[str], hyp_t: list[str], n: int) -> float:
    rg, hg = _ngrams(ref_t, n), _ngrams(hyp_t, n)
    n_ref, n_hyp = sum(rg.values()), sum(hg.values())
    if n_ref == 0 or n_hyp == 0:
        return 0.0
    overlap = 0
    for g, c in hg.items():
        if g in rg:
            overlap += c if c < rg[g] else rg[g]
    if overlap == 0:
        return 0.0
    precision = overlap / n_hyp
    recall = overlap / n_ref
    return 2 * precision * recall / (precision + recall)


def _lcs(a: list[str], b: list[str]) -> int:
    """Iterative LCS, column-major (different loop order from the engine)."""
    if not a or not b:
        return 0
    prev = [0] * (len(a) + 1)
    for j in range(1, len(b) + 1):
        cur = [0] * (len(a) + 1)
        for i in range(1, len(a) + 1):
            if a[i - 1] == b[j - 1]:
                cur[i] = prev[i - 1] + 1
            else:
                cur[i] = cur[i - 1] if cur[i - 1] >= prev[i] else prev[i]
        prev = cur
    return prev[len(a)]


def _rouge_l(ref_t: list[str], hyp_t: list[str]) -> float:
    if not ref_t or not hyp_t:
        return 0.0
    lcs = _lcs(ref_t, hyp_t)
    if lcs == 0:
        return 0.0
    precision = lcs / len(hyp_t)
    recall = lcs / len(ref_t)
    return 2 * precision * recall / (precision + recall)


def rouge_mean(ref: str, hyp: str) -> float:
    rt = _TOKEN.findall(ref.lower())
    ht = _TOKEN.findall(hyp.lower())
    return (_rouge_n(rt, ht, 1) + _rouge_n(rt, ht, 2) + _rouge_l(rt, ht)) / 3


def freeform_reward(ref: str, hyp: str) -> float:
    return max(0.0, min(1.0, rouge_mean(ref, hyp)))


def bleu_method1(ref: str, hyp: str, max_n: int = 4) -> float:
    """Literal Papineni-et-al formula with Chen & Cherry method1 smoothing."""
    rt, ht = ref.split(), hyp.split()
    if not ht:
        return 0.0
    log_sum = 0.0
    for n in range(1, max_n + 1):
        hg, rg = _ngrams(ht, n), _ngrams(rt, n)
        total = sum(hg.values())
        if total == 0:
            return 0.0
        overlap = 0
        for g, c in hg.items():
            if g in rg:
                overlap += c if c < rg[g] else rg[g]
        numer = overlap if overlap > 0 else 0.1
        log_sum += math.log(numer / total)
    bp = 1.0 if len(ht) > len(rt) else math.exp(1 - len(rt) / max(1, len(ht)))
    return bp * math.exp(log_sum / max_n)
