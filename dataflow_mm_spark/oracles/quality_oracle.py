"""Pandas oracle for the 15-rule quality scorer.

Independent re-statement of the reference semantics
(dataflow/operators/core_vision/filter/rule_base_filter.py:243-354) used as
the parity target in tests. Intentionally written as plain Python over a
pandas Series — slow, simple, obviously-correct.
"""

from __future__ import annotations

import re
import string

import pandas as pd

_ID_RE = re.compile(
    r"(身\s{0,10}份|id\s{0,10}number\s{0,10}|identification|identity|"
    r"\s{0,10}ID\s{0,10}No\s{0,10}|id\s{0,10}card\s{0,10}|"
    r"NRIC\s{0,10}number\s{0,10}|IC\s{0,10}number\s{0,10}|"
    r"resident\s{0,10}registration\s{0,10}|I.D.\s{0,10}Number\s{0,10})",
    re.I,
)
_SPECIAL_RES = [
    re.compile(p)
    for p in (
        r"u200e",
        r"&#247;|\? :",
        r"[�□]|\{\/U\}",
        r"U\+26[0-F][0-D]|U\+273[3-4]|U\+1F[3-6][0-4][0-F]|U\+1F6[8-F][0-F]",
    )
]
_HTML_BASES = (
    "nbsp lt gt amp quot apos hellip ndash mdash lsquo rsquo ldquo rdquo".split()
)
_HTML_TOKENS = [f"{amp}{b}" for b in _HTML_BASES for amp in ("&", "＆")]
_BULLETS = tuple("•‣▶◀◦■□▪▫–")
_WATERMARK_RE = re.compile("Copyright|Watermark|Confidential")
_LOREM_RE = re.compile("lorem ipsum", re.I)
_PUNC_TABLE = str.maketrans("", "", string.punctuation)


def _nonblank_lines(text: str) -> list[str]:
    return [ln for ln in text.split("\n") if ln.strip()]


def passes_quality(text: str | None) -> bool:
    if text is None or not text.strip():
        return False
    words = text.split()
    nw = len(words)
    lines = _nonblank_lines(text)

    if text.endswith(":"):
        return False
    if lines and sum(
        1 for ln in lines if ln.rstrip().endswith(("...", "…"))
    ) / len(lines) >= 0.3:
        return False
    if nw:
        mean = sum(map(len, words)) / nw
        if mean < 3 or mean >= 20:
            return False
        syms = text.count("#") + text.count("...") + text.count("…")
        if syms / nw >= 0.4:
            return False
    if any(tok in text for tok in _HTML_TOKENS):
        return False
    if len(_ID_RE.findall(text)) >= 3:
        return False
    longest = max(
        (
            len(s.split())
            for para in text.split("\n")
            for s in re.split("[–.!?,;•/|…]", para)
        ),
        default=0,
    )
    if longest > 112:
        return False
    if any(rx.search(text) for rx in _SPECIAL_RES):
        return False
    if _WATERMARK_RE.search(text):
        return False
    if (text.count("{") + text.count("}")) / len(text) >= 0.025:
        return False
    if nw and sum(1 for w in words if w.isupper()) / nw > 0.2:
        return False
    if len(_LOREM_RE.findall(text)) / len(text) > 3e-8:
        return False
    if nw:
        low = text.lower().split()
        if len(set(low)) / len(low) <= 0.1:
            return False
    if lines and sum(
        1 for ln in lines if ln.lstrip().startswith(_BULLETS)
    ) / len(lines) > 0.9:
        return False
    norm = [
        n
        for n in (
            ln.translate(_PUNC_TABLE).lower() for ln in text.split("\n")
        )
        if n.strip()
    ]
    if norm:
        n_js = sum(1 for n in norm if "javascript" in n)
        if not (len(norm) <= 3 or len(norm) - n_js >= 3):
            return False
    return True


def quality_mask(texts: pd.Series) -> pd.Series:
    return texts.map(passes_quality)
