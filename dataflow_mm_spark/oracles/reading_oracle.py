"""Independent number-reading oracle (r3 judge #7).

Derives the driver-gate pins for ``docs_number_words`` / ``docs_cn_numbers``
from the PUBLIC reading rules in a deliberately different code shape from the
engine kernels, so an error must be made twice — in two different
algorithms — to slip past the value-hash gate (the same contract
``metric_oracle.py`` provides for WER/ROUGE/BLEU):

* EN (vs ``functions/normalize.py``'s single-pass token FSM with an
  accumulator + pending-"and" rollback): a recursive-descent grammar parser —
  subhundred → group → scale chain → ordinal/decimal composition.
* CN (vs ``functions/cn_norm.py``'s iterative hi/lo split with positional
  4-digit group rendering): a pure recursion over descending units
  (亿→万→千→百→十) with the gap-零 rule applied at each split.

Both sides implement the same public semantics; neither imports the other.
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# English number words → digits (Whisper EnglishNumberNormalizer semantics)
# --------------------------------------------------------------------------

_SMALL = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12, "thirteen": 13, "fourteen": 14, "fifteen": 15,
    "sixteen": 16, "seventeen": 17, "eighteen": 18, "nineteen": 19,
}
_TENS = {
    "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
    "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
}
_SCALE_VAL = {
    "thousand": 10**3, "million": 10**6, "billion": 10**9, "trillion": 10**12,
}
_ORD_SMALL = {
    "first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
    "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9, "tenth": 10,
    "eleventh": 11, "twelfth": 12, "thirteenth": 13, "fourteenth": 14,
    "fifteenth": 15, "sixteenth": 16, "seventeenth": 17, "eighteenth": 18,
    "nineteenth": 19,
}
_ORD_TENS = {
    "twentieth": 20, "thirtieth": 30, "fortieth": 40, "fiftieth": 50,
    "sixtieth": 60, "seventieth": 70, "eightieth": 80, "ninetieth": 90,
}
_ORD_SCALE = {
    "hundredth": 100, "thousandth": 10**3, "millionth": 10**6,
    "billionth": 10**9, "trillionth": 10**12,
}
_ORD_ANY = set(_ORD_SMALL) | set(_ORD_TENS) | set(_ORD_SCALE)


def _suffix(n: int) -> str:
    two = n % 100
    if two in (11, 12, 13):
        return "th"
    return {1: "st", 2: "nd", 3: "rd"}.get(n % 10, "th")


def _sub100(w: list[str], i: int):
    """1-99 cardinal at w[i] → (value, next) | None. Zero is NOT a
    subhundred — it composes with nothing (handled at number level)."""
    if i >= len(w):
        return None
    t = w[i]
    if t in _TENS:
        v = _TENS[t]
        if i + 1 < len(w) and w[i + 1] in _SMALL and 1 <= _SMALL[w[i + 1]] <= 9:
            return v + _SMALL[w[i + 1]], i + 2
        return v, i + 1
    if t in _SMALL and _SMALL[t] >= 1:
        return _SMALL[t], i + 1
    return None


def _group(w: list[str], i: int, allow_a: bool = False):
    """1-999 group: [1-9 'hundred' ['and'] [sub100]] | sub100.
    The article 'a' reads as 1 directly before 'hundred' ("a hundred and
    five" → 105) but ONLY as the opening group of a number (allow_a — the
    kernel twin likewise only accepts 'a' at run start); as a continuation
    ("ninety trillion a hundred") it stays an article (r4)."""
    sub = _sub100(w, i)
    if sub is None:
        if allow_a and i + 1 < len(w) and w[i] == "a" and w[i + 1] == "hundred":
            sub = (1, i + 1)
        else:
            return None
    v, j = sub
    if 1 <= v <= 9 and j < len(w) and w[j] == "hundred":
        v, j = v * 100, j + 1
        k = j
        if k < len(w) and w[k] == "and":
            rest = _sub100(w, k + 1)
            if rest is not None:
                return v + rest[0], rest[1]
        rest = _sub100(w, j)
        if rest is not None:
            return v + rest[0], rest[1]
        return v, j
    return v, j


def _cardinal(w: list[str], i: int):
    """Positive cardinal: group (scale ['and'] group?)* with strictly
    decreasing scales → (value, next, used_scale) | None.
    'a' reads as 1 directly before a scale word ("a thousand and one" →
    1001), opening position only (r4)."""
    g = _group(w, i, allow_a=True)
    if g is None:
        if i + 1 < len(w) and w[i] == "a" and w[i + 1] in _SCALE_VAL:
            g = (1, i + 1)
        else:
            return None
    val, j = g
    total, last_scale = 0, None
    while j < len(w) and w[j] in _SCALE_VAL and val > 0:
        s = _SCALE_VAL[w[j]]
        if last_scale is not None and s >= last_scale:
            break
        total, last_scale, val, j = total + val * s, s, 0, j + 1
        k = j
        if k < len(w) and w[k] == "and":
            nxt = _group(w, k + 1)
            if nxt is not None:
                val, j = nxt
                continue
            break
        nxt = _group(w, j)
        if nxt is not None:
            val, j = nxt
            continue
        break
    return total + val, j, last_scale is not None


def _year_half(w: list[str], i: int):
    """Second half of a year-style pairing at w[i] → (value, next) | None:
    tens[+unit] ("eighty four"), a teen/ten ("nineteen", for "twenty
    nineteen"), or 'oh'+unit ("oh five"). Bare 'o' is deliberately NOT
    accepted (too common as a stray letter post-normalization)."""
    if i >= len(w):
        return None
    t = w[i]
    if t in _TENS:
        v = _TENS[t]
        if i + 1 < len(w) and w[i + 1] in _SMALL and 1 <= _SMALL[w[i + 1]] <= 9:
            return v + _SMALL[w[i + 1]], i + 2
        return v, i + 1
    if t in _SMALL and 10 <= _SMALL[t] <= 19:
        return _SMALL[t], i + 1
    if (
        t == "oh"
        and i + 1 < len(w)
        and w[i + 1] in _SMALL
        and 1 <= _SMALL[w[i + 1]] <= 9
    ):
        return _SMALL[w[i + 1]], i + 2
    return None


def _number(w: list[str], i: int):
    """Full number at w[i] → (rendered, next) | None."""
    # zero: standalone, or a decimal lead
    if w[i] == "zero":
        val, j, scaled = 0, i + 1, False
    else:
        c = _cardinal(w, i)
        if c is None:
            # bare ordinal ("first", "twentieth", "hundredth")
            return _ordinal_from(0, w, i, scaled=False)
        val, j, scaled = c
    # decimal: 'point' + run of 0-9 digit words
    if (
        j + 1 < len(w)
        and w[j] == "point"
        and w[j + 1] in _SMALL
        and _SMALL[w[j + 1]] < 10
    ):
        frac, j = "", j + 1
        while j < len(w) and w[j] in _SMALL and _SMALL[w[j]] < 10:
            frac, j = frac + str(_SMALL[w[j]]), j + 1
        return f"{val}.{frac}", j
    if val == 0:
        return "0", j
    # year pairing (r4): a pure sub-hundred 10-99 pairs with a following
    # tens/teen run, 'oh'+digit, or 'hundred' [['and'] sub100] into one
    # 4-digit year-style number ("nineteen eighty four" → 1984,
    # "nineteen oh five" → 1905, "nineteen hundred and five" → 1905,
    # "twenty twenty one" → 2021). Terminal — no decimal/ordinal follows.
    if not scaled and 10 <= val <= 99:
        yh = _year_half(w, j)
        if yh is not None:
            return str(val * 100 + yh[0]), yh[1]
        if j < len(w) and w[j] == "hundred":
            v2, j2 = val * 100, j + 1
            if j2 < len(w) and w[j2] == "and":
                rest = _sub100(w, j2 + 1)
                if rest is not None:
                    return str(v2 + rest[0]), rest[1]
            rest = _sub100(w, j2)
            if rest is not None:
                return str(v2 + rest[0]), rest[1]
            return str(v2), j2
    # ordinal continuation ("twenty first", "one hundred and first")
    o = _ordinal_from(val, w, j, scaled)
    if o is not None:
        return o
    return str(val), j


def _ordinal_from(prefix: int, w: list[str], i: int, scaled: bool):
    """Ordinal word at w[i] (optionally behind 'and') composed onto a
    cardinal prefix → (rendered, next) | None."""
    k = i
    if (
        prefix > 0
        and prefix % 100 == 0
        and k < len(w)
        and w[k] == "and"
        and k + 1 < len(w)
        and (w[k + 1] in _ORD_SMALL or w[k + 1] in _ORD_TENS)
    ):
        k += 1
    if k >= len(w):
        return None
    t = w[k]
    if t in _ORD_SMALL:
        v = _ORD_SMALL[t]
        fits = (
            prefix == 0
            or (v < 10 and prefix % 10 == 0 and prefix % 100 != 10)
            or (v >= 10 and prefix % 100 == 0)
        )
        if fits:
            n = prefix + v
            return f"{n}{_suffix(n)}", k + 1
        return None
    if t in _ORD_TENS and (prefix == 0 or prefix % 100 == 0):
        n = prefix + _ORD_TENS[t]
        return f"{n}{_suffix(n)}", k + 1
    if t in _ORD_SCALE and not scaled and (t != "hundredth" or prefix <= 9):
        # pure-group prefix only: "three thousandth", "ninety thousandth",
        # "two hundredth" — but not "ninety hundredth" (no such cardinal)
        n = (prefix or 1) * _ORD_SCALE[t]
        return f"{n}{_suffix(n)}", k + 1
    return None


_CUR_BIG = {"dollar": "$", "dollars": "$", "pound": "£", "pounds": "£"}
_CUR_SMALL = {"cent": "¢", "cents": "¢", "pence": "p"}


def _is_num(t: str) -> bool:
    return t.replace(".", "", 1).isdigit() and not t.startswith(".")


def _currency_tokens(toks: list[str]) -> list[str]:
    """Token-scan post passes (vs the kernel's regex form): 'N and a half'
    quadruple → N.5 (integers only), then number + currency word → symbol
    prefix, then '$A and ¢B' triple → '$A.BB'."""
    halved: list[str] = []
    i = 0
    while i < len(toks):
        if (
            i + 3 < len(toks)
            and toks[i].isdigit()
            and toks[i + 1] == "and"
            and toks[i + 2] == "a"
            and toks[i + 3] == "half"
        ):
            halved.append(toks[i] + ".5")
            i += 4
            continue
        halved.append(toks[i])
        i += 1
    toks = halved
    res: list[str] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if _is_num(t) and i + 1 < len(toks):
            nxt = toks[i + 1]
            if nxt in _CUR_BIG:
                res.append(_CUR_BIG[nxt] + t)
                i += 2
                continue
            if nxt in _CUR_SMALL:
                res.append(_CUR_SMALL[nxt] + t)
                i += 2
                continue
        res.append(t)
        i += 1
    out: list[str] = []
    i = 0
    while i < len(res):
        if (
            i + 2 < len(res)
            and res[i][:1] in "$£" and res[i][1:].isdigit()
            and res[i + 1] == "and"
            and res[i + 2][:1] in "¢p" and res[i + 2][1:].isdigit()
            and len(res[i + 2]) <= 3
        ):
            out.append(f"{res[i][0]}{res[i][1:]}.{int(res[i + 2][1:]):02d}")
            i += 3
            continue
        out.append(res[i])
        i += 1
    # sub-dollar extraction twin (token-scan form): a "$0.xx"/"£0.xx"/
    # "€0.xx" token reads ¢xx (int() strips leading cent zeros)
    final: list[str] = []
    for t in out:
        if (
            len(t) >= 4
            and t[0] in "$£€"
            and t[1:3] == "0."
            and t[3:].isdigit()
            and len(t) <= 5
        ):
            final.append(f"¢{int(t[3:])}")
        else:
            final.append(t)
    return final


_O_SMALL_DIGITS = {
    "oh": 0, "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4,
    "five": 5, "six": 6, "seven": 7, "eight": 8, "nine": 9,
}


def _repeat_run(w: list[str], i: int):
    """double/triple spell-out run, two-stage (mark then render — the
    kernel integrates this into its single token pass): stage 1 converts
    the token window into (count, digit) marks — a repeater binds the next
    digit word, a plain digit word after the first mark is (1, digit),
    plain 'zero' excluded (it keeps its cardinal/decimal reading); stage 2
    renders marks to a concatenated digit string. None unless w[i] is a
    repeater with a digit word behind it."""
    reps = {"double": 2, "triple": 3}
    marks: list[tuple[int, int]] = []
    j = i
    while j < len(w):
        if w[j] in reps and j + 1 < len(w) and w[j + 1] in _O_SMALL_DIGITS:
            marks.append((reps[w[j]], _O_SMALL_DIGITS[w[j + 1]]))
            j += 2
        elif marks and w[j] in _O_SMALL_DIGITS and w[j] not in ("zero",):
            marks.append((1, _O_SMALL_DIGITS[w[j]]))
            j += 1
        else:
            break
    if not marks:
        return None
    return "".join(str(d) * c for c, d in marks), j


def en_number_words(phrase: str) -> str:
    """Phrase with spelled-out numbers → phrase with digits."""
    w = phrase.split()
    out, i = [], 0
    while i < len(w):
        rr = _repeat_run(w, i)
        if rr is not None:
            out.append(rr[0])
            i = rr[1]
            continue
        opener = (
            w[i] in _SMALL
            or w[i] in _TENS
            or w[i] in _ORD_ANY
            or (
                w[i] == "a"
                and i + 1 < len(w)
                and (w[i + 1] == "hundred" or w[i + 1] in _SCALE_VAL)
            )
        )
        r = _number(w, i) if opener else None
        if r is not None:
            out.append(r[0])
            i = r[1]
        else:
            out.append(w[i])
            i += 1
    return " ".join(_currency_tokens(out))


# --------------------------------------------------------------------------
# Mandarin readings (cn_tn subset semantics)
# --------------------------------------------------------------------------

_DIG = "零一二三四五六七八九"
_UNITS_DESC = ((10**8, "亿"), (10**4, "万"), (10**3, "千"), (10**2, "百"), (10, "十"))


def _rx(n: int) -> str:
    """Pure recursion over descending units; gap-零 when the remainder falls
    below a tenth of the split base."""
    for base, name in _UNITS_DESC:
        if n >= base:
            hi, lo = divmod(n, base)
            s = _rx(hi) + name
            if lo:
                if lo < base // 10:
                    s += "零"
                s += _rx(lo)
            return s
    return _DIG[n]


def _liang(s: str) -> str:
    """alt_two twin (independent formulation: explicit char-walk, vs the
    kernel's lookaround regex): a 二 whose next char is a >十 unit and
    whose previous char is absent or itself a >十 unit reads 两
    (两千/两万; 十二万 and 一万零二百 keep 二)."""
    big = "百千万亿"
    out = list(s)
    for i, c in enumerate(s):
        if (
            c == "二"
            and i + 1 < len(s)
            and s[i + 1] in big
            and (i == 0 or s[i - 1] in big)
        ):
            out[i] = "两"
    return "".join(out)


def cn_int(n: int) -> str:
    """Cardinal reading of 0 <= n (leading 一十 reads 十; alt_two 两
    substitution — the cn_tn Cardinal default); ≥10^16 falls back
    to digit-by-digit — IDs/hashes are not cardinals (public cn_tn rule)."""
    if n >= 10**16:
        return cn_digits(str(n))
    if n == 0:
        return "零"
    s = _rx(n)
    return _liang(s[1:] if s.startswith("一十") else s)


def cn_digits(s: str) -> str:
    return "".join(_DIG[int(c)] for c in s)


def cn_phone(s: str) -> str:
    return "".join("幺" if c == "1" else _DIG[int(c)] for c in s if c != "-")


_CN_UNITS = {"kg": "千克", "km": "千米", "cm": "厘米", "mm": "毫米", "℃": "摄氏度"}

# money units + measure words — same public classes as the kernel's
# (cn_tn.py:44-45 semantics); the tokenizer spec is shared, the readings
# behind each class are this module's own
_O_MAG = "亿|千万|百万|万|千|百"
_O_MONEY = rf"(?:(?:{_O_MAG})?[元块]|[角毛分]|{_O_MAG})"
_O_QUANT = (
    "个条张只件位名台辆架间家颗棵座场次回本页杯瓶匹头双对份组段句字词行列"
    "篇节章盒袋箱桶罐碗盘碟支枝根道面片岁人层户门队班课站楼年月日天周时刻秒"
)


_O_RE = None  # built lazily


def _o_regex():
    """The PUBLIC tokenization contract (one alternation, priority year >
    phone > fraction > money/quantifier > percent/latin-unit > decimal >
    signed > digit-ID > cardinal; a '-' before a year/phone/fraction is not
    a sign). The tokenizer spec is shared with the kernel by design — what
    this oracle keeps independent is the READING algorithms (pure
    descending-unit recursion + named-group dispatch, vs the kernel's
    positional hi/lo renderer + token-string re-parsing)."""
    global _O_RE
    if _O_RE is None:
        import re

        sg = r"(?!\d{4}年)(?!(?:1[3-9]\d{9}|0\d{2,3}-\d{7,8}|\d+/\d+)(?!\d))"
        _O_RE = re.compile(
            r"(?<!\d)(?P<year>\d{4}|[089]\d)年"
            r"|(?<!\d)(?P<phone>1[3-9]\d{9}|0\d{2,3}-\d{7,8})(?!\d)"
            r"|(?<!\d)(?P<fnum>\d+)/(?P<fden>\d+)(?!\d)"
            rf"|(?P<mqn>\d+(?:\.\d+)?)(?P<mqa>[多余几]?)"
            rf"(?P<mqu>{_O_MONEY}|[{_O_QUANT}])"
            rf"|(?P<usign>-{sg})?(?P<unum>\d+(?:\.\d+)?)(?P<unit>%|kg|km|cm|mm|℃)"
            rf"|(?P<dsign>-{sg})?(?P<dint>\d+)\.(?P<dfrac>\d+)"
            rf"|-{sg}(?P<sint>\d+)"
            r"|(?P<idrun>\d{4,})(?!\d)"
            r"|(?P<card>\d+)"
        )
    return _O_RE


def _o_render(m) -> str:
    """Named-group dispatch: each token class renders via the oracle's own
    reading primitives."""
    g = m.groupdict()
    if g["year"] is not None:
        return cn_digits(g["year"]) + "年"
    if g["phone"] is not None:
        return cn_phone(g["phone"])
    if g["fnum"] is not None:
        return cn_int(int(g["fden"])) + "分之" + cn_int(int(g["fnum"]))
    if g["mqn"] is not None:
        return _o_plain(g["mqn"]) + g["mqa"] + g["mqu"]
    if g["unum"] is not None:
        body = _o_plain(g["unum"])
        body = "百分之" + body if g["unit"] == "%" else body + _CN_UNITS[g["unit"]]
        return ("负" if g["usign"] else "") + body
    if g["dint"] is not None:
        sign = "负" if g["dsign"] else ""
        return sign + cn_int(int(g["dint"])) + "点" + cn_digits(g["dfrac"])
    if g["sint"] is not None:
        return "负" + cn_int(int(g["sint"]))
    if g["idrun"] is not None:
        return cn_digits(g["idrun"])
    return cn_int(int(g["card"]))


def cn_text(text: str) -> str:
    """Text-level normalization: tokenization per the shared public spec,
    readings from this module's independent recursion; the trailing pass
    restores a 二 between latin letters to ``2`` (B2B/P2P/O2O)."""
    import re

    t = text.translate(str.maketrans("０１２３４５６７８９．％－", "0123456789.%-"))
    t = _o_regex().sub(_o_render, t)
    return re.sub(r"(?<=[A-Za-z])二(?=[A-Za-z])", "2", t)


def _o_plain(num: str) -> str:
    """Cardinal or 点-decimal reading of an unsigned numeric string."""
    if "." in num:
        whole, frac = num.split(".", 1)
        return cn_int(int(whole or "0")) + "点" + cn_digits(frac)
    return cn_int(int(num))


# --- cn_tn TextNorm pipeline twin (regex-shaped vs the kernel's scan/table
# forms): banjiao → case → fillers → erhua → numbers → puncs → spaces ------

_ORACLE_ER_WHITELIST = (
    "儿女", "儿子", "儿孙", "女儿", "儿媳", "妻儿", "胎儿", "婴儿",
    "新生儿", "婴幼儿", "幼儿", "少儿", "小儿", "儿歌", "儿童", "儿科",
    "托儿所", "孤儿", "儿戏", "儿化",
    "台儿庄", "鹿儿岛", "正儿八经", "吊儿郎当", "生儿育女", "托儿带女",
    "养儿防老", "痴儿呆女", "佳儿佳妇", "儿怜兽扰", "儿无常父",
    "儿不嫌母丑", "儿行千里母担忧", "儿大不由爷", "苏乞儿",
)


def cn_text_norm(
    text: str,
    to_banjiao: bool = False,
    to_upper: bool = False,
    to_lower: bool = False,
    remove_fillers: bool = False,
    remove_erhua: bool = False,
    remove_space: bool = False,
) -> str:
    import re

    if to_banjiao:
        text = "".join(
            chr(ord(c) - 0xFEE0) if 0xFF01 <= ord(c) <= 0xFF5E
            else (" " if c == "　" else c)
            for c in text
        )
    if to_upper:
        text = text.upper()
    if to_lower:
        text = text.lower()
    if remove_fillers:
        text = re.sub("[呃啊]", "", text)
    if remove_erhua:
        keep: set[int] = set()
        for w in _ORACLE_ER_WHITELIST:
            for m in re.finditer(re.escape(w), text):
                keep.update(range(m.start(), m.end()))
        text = "".join(
            c for i, c in enumerate(text) if c != "儿" or i in keep
        )
    text = cn_text(text)
    text = re.sub("[，。！？；：、“”‘’【】《》（）,.!?;:\"'\\[\\]<>()]", "", text)
    if remove_space:
        text = re.sub(r"\s+", " ", text).strip()
        # keep a space only between latin/digit neighbours
        text = re.sub(r"(?<![A-Za-z0-9']) | (?![A-Za-z0-9'])", "", text)
    return text
