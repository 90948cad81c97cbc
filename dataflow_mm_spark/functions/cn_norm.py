"""Chinese text normalization — number-reading subset of the reference's
cn_tn engine (dataflow/operators/core_audio/refine/audio_text_normalizer.py
selects engine='cn_tn', a ~1200-line TTS text-normalization module). This
module re-implements, from the public rules of Chinese number reading (not
the reference code), the deterministic subset an ASR/TTS transcript pipeline
hits most: cardinal integers, decimals, percentages and signed numbers spoken
in Mandarin, plus dates (年), latin unit suffixes, phone numbers (mobile
``1[3-9]``+9 digits and dashed landlines, digit-by-digit with 幺) and
fractions (``N/M`` → 分母分之分子, cn_tn.py:813-828) and full-width digit
forms (folded to ASCII before matching). r4 adds the reference's remaining
NSW classes (cn_tn.py:933-1016): money (number + optional 多/余/几 + currency
unit reads as a cardinal, unit kept), cardinal-with-quantifier (number before
a measure word reads as a cardinal even when ≥4 digits), digit-ID (a BARE run
of ≥4 digits with no quantifier/unit/sign/decimal context is an identifier —
digit-by-digit with regular 一), and the letter-2-letter restore (B2B/P2P/O2O:
a 二 produced between latin letters restores to ``2``), plus 2-digit years
(``[089]\\d年`` reads digit-by-digit per the cn_tn date pattern — 99年 is the
year 99, not a duration; ``1x``-``7x`` two-digit counts before 年 stay
durations → cardinals).
r5 adds the 两-substitution (cn_tn num2chn ``alt_two=True`` — the Cardinal
DEFAULT, so it reaches every cardinal reading): a leading-position 2 before
a >十 unit reads 两 (两千/两万; 十二万 and 一万零二百 keep 二), verified
case-by-case against the reference's staged passes; and the full public
儿-whitelist (cn_tn.py:33-36).
Documented exclusions: dash-less landline numbers (ambiguous with digit-IDs,
which already read digit-by-digit — only the 幺 convention differs);
big-digit output forms 壹贰佰仟 (``num2chn(big=True)`` is never invoked by
any reference NSW class — unreachable in the pipeline); the currency-NAME
list (cn_tn.py:42 ``CURRENCY_NAMES`` is defined but referenced nowhere in
the reference — dead code, nothing to match); 1e12 reads 万亿 (modern
convention) where the reference's mid numbering system says 兆.

Reading rules implemented:
* digits 0-9 → 零一二三四五六七八九; positions 十百千, groups 万/亿/万亿
  (4-digit grouping, e.g. 120034 → 十二万零三十四,
  100034567 → 一亿零三万四千五百六十七);
* interior zero runs collapse to ONE 零; trailing zeros are silent. The 零
  is inserted when a lower 4-digit group starts below its 千 place (the
  widely-taught group-frame rule): 10500 → 一万零五百, 1005000 → 一百万五千;
* a leading 一十 reads 十 (10 → 十, 110 → 一百一十);
* decimals read digit-by-digit after 点 (3.14 → 三点一四);
* percent N% → 百分之 + reading(N); negative -N → 负 + reading(N);
* dates: a 4-digit year before 年 reads digit-by-digit (2024年 → 二零二四年);
  months/days are plain cardinals so 月/日 need no special casing;
* latin unit suffixes attached to a number map to their Mandarin readings
  (kg→千克, km→千米, cm→厘米, mm→毫米, ℃→摄氏度); bare 'm' is ambiguous
  and intentionally unmapped.

Exposed as a pure-Python kernel (pinned unit tests) and an Arrow pandas UDF
that rewrites every number occurrence inside a text column.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_DIGITS = "零一二三四五六七八九"
_UNITS = ["", "十", "百", "千"]

# alt_two: preceded by start-of-reading or a >十 unit, followed by a >十
# unit (lookbehind "not a non-unit char" == start or unit)
_LIANG_RE = re.compile(r"(?<![^百千万亿])二(?=[百千万亿])")


def _read_under_10000(n: int) -> str:
    """Reading of 0 < n < 10000, without group suffix."""
    out = []
    zero_pending = False
    for pos in range(3, -1, -1):
        d = (n // 10**pos) % 10
        if d == 0:
            if out:
                zero_pending = True
            continue
        if zero_pending:
            out.append("零")
            zero_pending = False
        out.append(_DIGITS[d] + _UNITS[pos])
    return "".join(out)


def read_digits(s: str) -> str:
    """Digit-by-digit reading (phone-number style) — the fallback for runs
    too long to be cardinals."""
    return "".join(_DIGITS[int(c)] for c in s)


def _read_under_1e8(n: int) -> str:
    """Reading of 0 < n < 10^8: 万-group + base group with the gap-零 rule
    (a base group below its 千 place after a 万 group takes a 零)."""
    hi, lo = divmod(n, 10000)
    if hi == 0:
        return _read_under_10000(lo)
    s = _read_under_10000(hi) + "万"
    if lo:
        if lo < 1000:
            s += "零"
        s += _read_under_10000(lo)
    return s


def read_int(n: int) -> str:
    """Mandarin cardinal reading of a non-negative integer < 10^16; longer
    integers fall back to digit-by-digit (IDs/hashes are not cardinals).

    Numbers ≥ 10^8 split at 亿 with the multiplier read as a FULL cardinal
    (standard Mandarin: 7000200030000 → 七万零二亿零三万, not the flat-group
    七万亿零二亿零三万 this engine produced before r4 — the two only differ
    when both the 万亿- and 亿-level groups are nonzero)."""
    if n >= 10**16:
        return read_digits(str(n))
    if n == 0:
        return "零"
    hi, lo = divmod(n, 10**8)
    if hi == 0:
        s = _read_under_1e8(lo)
    else:
        s = _read_under_1e8(hi) + "亿"
        if lo:
            if lo < 10**7:
                s += "零"
            s += _read_under_1e8(lo)
    # leading 一十 reads 十 (only at the very start)
    if s.startswith("一十"):
        s = s[1:]
    # 两-substitution (cn_tn num2chn alt_two=True — the reference Cardinal
    # DEFAULT, so every cardinal path reads 两千/两万): a 二 directly before
    # a >十 unit, at reading start or directly after another >十 unit,
    # reads 两. Zero- and 十-preceded 二 keep 二 (一万零二百, 十二万), as do
    # digit-by-digit readings (no units → no match). Source-text magnitude
    # units (2万元 money) are outside the rendered string, so 二万元 keeps
    # 二 — matching the reference's Money path.
    return _LIANG_RE.sub("两", s)


_UNIT_READINGS = {
    "kg": "千克",
    "km": "千米",
    "cm": "厘米",
    "mm": "毫米",
    "℃": "摄氏度",
}


def read_phone(s: str) -> str:
    """Phone-number reading: digit-by-digit with 1 → 幺 (the spoken-Mandarin
    telephone convention, cn_tn TelePhone analogue); dashes are silent."""
    return "".join("幺" if c == "1" else _DIGITS[int(c)] for c in s if c != "-")


def read_number(token: str) -> str:
    """Reading of a matched numeric token:
    ``DDDD年`` (year, digit-by-digit), a phone number (mobile ``1[3-9]``+9
    digits or dashed landline, digit-by-digit with 幺), a money/quantifier
    token (``digits[.digits][多余几]<CJK unit>`` — cardinal + suffix kept,
    cn_tn.py:933-946,983-990), or ``[-]digits[.digits][%|unit]``."""
    t = token
    if t.endswith("年") and _YEAR_RE.fullmatch(t):  # 4-digit year
        return read_digits(t[:-1]) + "年"
    if _PHONE_RE.fullmatch(t):
        return read_phone(t)
    if "/" in t:  # fraction N/M → 分母分之分子 (cn_tn.py:813-828 semantics)
        num, den = t.split("/", 1)
        return read_int(int(den)) + "分之" + read_int(int(num))
    mq = _MONEYQ_SPLIT_RE.fullmatch(t)
    if mq:  # money / quantifier: cardinal reading, CJK suffix unchanged
        return read_number(mq.group(1)) + mq.group(2) + mq.group(3)
    prefix = ""
    if t.startswith("-"):
        prefix, t = "负", t[1:]
    unit = ""
    for u, reading in _UNIT_READINGS.items():
        if t.endswith(u):
            unit, t = reading, t[: -len(u)]
            break
    percent = t.endswith("%")
    if percent:
        t = t[:-1]
    if "." in t:
        whole, frac = t.split(".", 1)
        body = read_int(int(whole or "0")) + "点" + "".join(
            _DIGITS[int(c)] for c in frac
        )
    else:
        body = read_int(int(t))
    if percent:
        body = "百分之" + body
    return prefix + body + unit


_PHONE_RE = re.compile(r"1[3-9]\d{9}|0\d{2,3}-\d{7,8}")
_YEAR_RE = re.compile(r"(?:\d{4}|[089]\d)年")

# money units (cn_tn.py:44 semantics): magnitude-prefixed 元/块, the small
# units 角/毛/分, and bare magnitude words (3万 is money in the reference)
_CN_MAG = "亿|千万|百万|万|千|百"
_MONEY_UNIT = rf"(?:(?:{_CN_MAG})?[元块]|[角毛分]|{_CN_MAG})"
# common measure words (cn_tn.py:45 COM_QUANTIFIERS semantics — a
# representative single-char subset; extend for corpus-specific vocabulary)
_QUANT_CHARS = (
    "个条张只件位名台辆架间家颗棵座场次回本页杯瓶匹头双对份组段句字词行列"
    "篇节章盒袋箱桶罐碗盘碟支枝根道面片岁人层户门队班课站楼年月日天周时刻秒"
)
_MONEYQ = rf"(?:{_MONEY_UNIT}|[{_QUANT_CHARS}])"
# token splitter for read_number: number + optional approximation char
# (多/余/几, kept verbatim) + the CJK unit/quantifier suffix
_MONEYQ_SPLIT_RE = re.compile(r"(\d+(?:\.\d+)?)([多余几]?)([一-鿿]+)")
_IDRUN_RE = re.compile(r"\d{4,}")
# letter-2-letter restore (cn_tn.py:1009-1016): B2B/P2P/O2O keep their digit
_L2L_RE = re.compile(r"(?<=[A-Za-z])二(?=[A-Za-z])")

# a '-' directly before a year/phone/fraction is NOT a minus sign — the
# higher-priority class wins (keeps leftmost-match parity with the oracle's
# staged passes, which rewrite those classes before the signed pass runs)
_SG = r"(?!\d{4}年)(?!(?:1[3-9]\d{9}|0\d{2,3}-\d{7,8}|\d+/\d+)(?!\d))"

_NUM_RE = re.compile(
    r"(?<!\d)(?:\d{4}|[089]\d)年"         # 4-digit or [089]x 2-digit year
    r"|(?<!\d)1[3-9]\d{9}(?!\d)"          # mobile
    r"|(?<!\d)0\d{2,3}-\d{7,8}(?!\d)"     # dashed landline
    r"|(?<!\d)\d+/\d+(?!\d)"              # fraction (cn_tn.py:968-973)
    rf"|\d+(?:\.\d+)?[多余几]?{_MONEYQ}"   # money / quantifier → cardinal
    rf"|(?:-{_SG})?\d+(?:\.\d+)?(?:%|kg|km|cm|mm|℃)"  # percent / latin unit
    rf"|(?:-{_SG})?\d+\.\d+"              # decimal
    rf"|-{_SG}\d+"                        # signed integer
    r"|\d{4,}(?!\d)"                      # bare digit-ID → digit-by-digit
    r"|\d+"                               # short bare cardinal
)


def _render_token(tok: str) -> str:
    """Text-level dispatch: a BARE ≥4-digit run (no year/phone/suffix/sign
    context — those alternatives matched first) is an identifier and reads
    digit-by-digit (cn_tn.py:993-999 数字编号); everything else delegates to
    :func:`read_number`."""
    if _IDRUN_RE.fullmatch(tok) and not _PHONE_RE.fullmatch(tok):
        return read_digits(tok)
    return read_number(tok)


# full-width (ＦＵＬＬＷＩＤＴＨ) digits, %, minus and dot fold to ASCII
# before matching — the cn_tn engine accepts both forms
_FULLWIDTH = str.maketrans("０１２３４５６７８９．％－", "0123456789.%-")


def cn_normalize_numbers_py(text: str | None) -> str | None:
    """Replace every numeric occurrence in ``text`` with its Mandarin
    reading (pinned-test kernel); a 二 landing between latin letters
    restores to ``2`` (B2B/P2P/O2O, cn_tn.py:1009-1016)."""
    if text is None:
        return None
    out = _NUM_RE.sub(
        lambda m: _render_token(m.group(0)), text.translate(_FULLWIDTH)
    )
    return _L2L_RE.sub("2", out)


@pandas_udf(T.StringType())
def cn_normalize_numbers(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized column form of :func:`cn_normalize_numbers_py`."""
    return texts.map(cn_normalize_numbers_py)


# --- TextNorm option flags (cn_tn.py:1056-1114 pipeline) --------------------
# Order matches the reference __call__: banjiao → case → fillers → erhua →
# number normalization → punctuation strip → space collapse.

# full-width (全角) printable ASCII block + ideographic space → half-width
_QJ2BJ_TABLE = str.maketrans(
    {chr(0xFF01 + i): chr(0x21 + i) for i in range(0x5E)} | {"　": " "}
)

FILLER_CHARS = ("呃", "啊")  # cn_tn.py:31

# words whose 儿 is a real morpheme, not erhua colouring (cn_tn.py:33-37
# documents the rule; this list carries the common members — extend via the
# ``er_whitelist`` argument for corpus-specific vocabulary)
ER_WHITELIST = (
    "儿女", "儿子", "儿孙", "女儿", "儿媳", "妻儿", "胎儿", "婴儿",
    "新生儿", "婴幼儿", "幼儿", "少儿", "小儿", "儿歌", "儿童", "儿科",
    "托儿所", "孤儿", "儿戏", "儿化",
    # r5: the remaining true-morpheme 儿 words/idioms and place names of
    # the public whitelist (cn_tn.py:33-36, itself from Qwen2-Audio)
    "台儿庄", "鹿儿岛", "正儿八经", "吊儿郎当", "生儿育女", "托儿带女",
    "养儿防老", "痴儿呆女", "佳儿佳妇", "儿怜兽扰", "儿无常父",
    "儿不嫌母丑", "儿行千里母担忧", "儿大不由爷", "苏乞儿",
)

_CN_PUNCS = "，。！？；：、“”‘’【】《》（）,.!?;:\"'[]<>()"
_PUNCS_TABLE = str.maketrans("", "", _CN_PUNCS)


def remove_erhua_py(text: str, whitelist: tuple[str, ...] = ER_WHITELIST) -> str:
    """Drop 儿 characters that are erhua colouring, keeping every 儿 inside
    an occurrence of a whitelisted true-morpheme word
    (他女儿在那边儿 → 他女儿在那边)."""
    keep: set[int] = set()
    for w in whitelist:
        start = text.find(w)
        while start != -1:
            keep.update(range(start, start + len(w)))
            start = text.find(w, start + 1)
    return "".join(c for i, c in enumerate(text) if c != "儿" or i in keep)


def _is_en_char(c: str) -> bool:
    return c.isascii() and (c.isalnum() or c == "'")


def remove_space_py(text: str) -> str:
    """Collapse whitespace, keeping ONE space only between two latin/digit
    tokens (cn_tn remove_space: CJK text carries no spaces, inter-English
    spacing survives)."""
    toks = text.split()
    parts: list[str] = []
    for k, t in enumerate(toks):
        if k and _is_en_char(toks[k - 1][-1]) and _is_en_char(t[0]):
            parts.append(" ")
        parts.append(t)
    return "".join(parts)


def cn_text_norm_py(
    text: str | None,
    to_banjiao: bool = False,
    to_upper: bool = False,
    to_lower: bool = False,
    remove_fillers: bool = False,
    remove_erhua: bool = False,
    remove_space: bool = False,
    er_whitelist: tuple[str, ...] = ER_WHITELIST,
) -> str | None:
    """cn_tn TextNorm pipeline (cn_tn.py:1081-1114 order) over the engine's
    number-reading subset. check_chars and OpenCC traditional/simplified
    conversion stay out of scope (documented; the latter needs the opencc
    package)."""
    if text is None:
        return None
    if to_banjiao:
        text = text.translate(_QJ2BJ_TABLE)
    if to_upper:
        text = text.upper()
    if to_lower:
        text = text.lower()
    if remove_fillers:
        for c in FILLER_CHARS:
            text = text.replace(c, "")
    if remove_erhua:
        text = remove_erhua_py(text, er_whitelist)
    text = cn_normalize_numbers_py(text)
    text = text.translate(_PUNCS_TABLE)
    if remove_space:
        text = remove_space_py(text)
    return text


def cn_text_norm(
    to_banjiao: bool = False,
    to_upper: bool = False,
    to_lower: bool = False,
    remove_fillers: bool = False,
    remove_erhua: bool = False,
    remove_space: bool = False,
):
    """Column form: returns an Arrow-vectorized UDF configured with the
    given flags (mirrors TextNormalizer(language='zh', **kwargs))."""

    @pandas_udf(T.StringType())
    def norm(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: cn_text_norm_py(
                t,
                to_banjiao=to_banjiao,
                to_upper=to_upper,
                to_lower=to_lower,
                remove_fillers=remove_fillers,
                remove_erhua=remove_erhua,
                remove_space=remove_space,
            )
        )

    return norm
