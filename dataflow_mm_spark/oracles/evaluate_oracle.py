"""Pandas oracle for answer-reward evaluation (reference
general_text_answer_evaluator.py:46-148 semantics)."""

from __future__ import annotations

import re

from dataflow_mm_spark.functions.evaluate import _wer, rouge_mean

_ANS = re.compile(r"<answer>\s*(.*?)\s*</answer>", re.DOTALL)


def extract_answer(text: str) -> str:
    m = _ANS.search(text or "")
    return m.group(1).strip() if m else ""


def _num(s: str):
    try:
        return float(s.replace(",", ""))
    except Exception:
        return None


def reward(gt_solution: str, model_output: str, qtype: str) -> float:
    out = extract_answer(model_output)
    gt = extract_answer(gt_solution)
    if qtype == "multiple choice":
        return 1.0 if out.strip() == gt.strip() else 0.0
    if qtype == "numerical":
        if (("." in gt) or ("," in gt)) != (("." in out) or ("," in out)):
            return 0.0
        g, o = _num(gt), _num(out)
        if g is None or o is None:
            return 0.0
        return 1.0 if round(g, 2) == round(o, 2) else 0.0
    if qtype == "OCR":
        return max(0.0, min(1.0, 1 - _wer(gt, out)))
    if qtype == "free-form":
        return max(0.0, min(1.0, rouge_mean(gt, out)))
    if qtype == "regression":
        g, o = _num(gt), _num(out)
        if g is None or o is None:
            return 0.0
        rel = min(1.0, max(0.0, (abs(o - g) + 1e-9) / (abs(g) + 1e-9)))
        return 1 - rel
    return 0.0
