"""Deterministic interleaved-document corpus (BASELINE.json input_hint).

Table shape (verbatim from input_hint):

    doc_id: string
    spans:  array<struct<kind:string, text:string,
                         media_ref:string, offset:int>>

Text spans carry raw strings from the reference's label-normalization
input domain (FIXTURES.md §1): clean equations, noisy variants with
fullwidth chars / √ / spaces / circled digits, CJK boilerplate
phrases, and double-'=' defects. Media spans carry recipe keys (see
ocr_spark.sources.media). ~1% of documents are media-heavy (50-200
media spans vs a 1-7 median) to exercise the skew split.

Everything is a pure function of (doc_id) — no wall clock, no global
state — so any worker can regenerate any document independently
(which is also what makes the corpus embarrassingly scalable: at
10^12 documents the generator is just a parallel map over ids).
"""

from __future__ import annotations

import numpy as np

from ocr_spark.sources.media import stable_seed

# Our own boilerplate phrase list (CJK marketing/heading noise in the
# reference's vocabulary domain, config.py:42 — phrases are original).
BOILERPLATE = [
    "口算练习",
    "家长评分",
    "错题本",
    "小朋友你真棒",
    "用时分秒",
    "基础过关",
    "能力提高题",
    "第天月日",
    "竖式计算",
    "脱式计算",
    "闯关开始",
]

# fullwidth / decorated variants used to build noisy raw text
_NOISE_MAP = {
    "0": "０", "1": "１", "2": "２", "3": "３", "4": "４",
    "5": "５", "6": "６", "7": "７", "8": "８", "9": "９",
    "+": "＋", "-": "－", "=": "＝", "(": "（", ")": "）",
}
_CIRCLED = {"1": "①", "2": "②", "3": "③", "4": "④"}


def _equation(rng) -> str:
    a, b = int(rng.integers(2, 99)), int(rng.integers(2, 40))
    op = str(rng.choice(["+", "-", "×", "÷"]))
    if op == "+":
        return f"{a}+{b}={a + b}"
    if op == "-":
        return f"{a}-{b}={a - b}"
    if op == "×":
        return f"{a}×{b}={a * b}"
    d = int(rng.integers(2, 10))
    q = int(rng.integers(2, 12))
    return f"{d * q}÷{d}={q}"


def _noisy(rng, eq: str) -> str:
    out = []
    for ch in eq:
        r = rng.random()
        if r < 0.35 and ch in _NOISE_MAP:
            out.append(_NOISE_MAP[ch])
        elif r < 0.42 and ch in _CIRCLED:
            out.append(_CIRCLED[ch])
        else:
            out.append(ch)
        if rng.random() < 0.08:
            out.append(str(rng.choice([" ", "　", "_", "√"])))
    if rng.random() < 0.2:
        out.insert(0, "√")
    return "".join(out)


def make_text_span(rng) -> str:
    r = rng.random()
    if r < 0.30:
        return _equation(rng)
    if r < 0.55:
        return _noisy(rng, _equation(rng))
    if r < 0.75:
        return str(rng.choice(BOILERPLATE))
    if r < 0.90:
        eq = _equation(rng)
        return eq + "=" + eq.split("=")[1]  # double-'=' defect
    return _equation(rng).replace("=", "＝") + str(rng.choice(["?", "？"]))


def doc_spans(doc_id: str) -> list[dict]:
    """doc_id -> ordered span list (deterministic)."""
    rng = np.random.default_rng(stable_seed("doc", doc_id))
    heavy = rng.random() < 0.01
    if heavy:
        n_media = int(rng.integers(50, 201))
        n_text = int(rng.integers(0, 6))
        kinds = ["media"] * n_media + ["text"] * n_text
        rng.shuffle(kinds)
    else:
        n = int(rng.integers(2, 9))
        kinds = [("media" if rng.random() < 0.45 else "text") for _ in range(n)]
    spans = []
    for offset, kind in enumerate(kinds):
        if kind == "text":
            spans.append(
                {"kind": "text", "text": make_text_span(rng), "media_ref": "", "offset": offset}
            )
        else:
            ref = f"m-{stable_seed('ref', doc_id, offset) % 10**12:012d}"
            spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": offset})
    return spans


def doc_ids(n_docs: int) -> list[str]:
    return [f"doc-{i:08d}" for i in range(n_docs)]
