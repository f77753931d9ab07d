"""Deterministic synthetic media pages.

A ``media_ref`` string is a *recipe key*: it fully determines a page of
print/hand text segments (layout + gold labels) and, for any box, a
CTC probability matrix. No binary payloads exist anywhere — this is
the sandbox stand-in for "fetch the image bytes and run the detector /
recognizer on them", mirroring the reference's synthetic-data design
(mnist_to_num.py:43-109 renders equations from a recipe; the CTPN/CRNN
checkpoints are not in the repo, .gitignore:1,17-22, so behavior is
frozen against deterministic stand-in weights instead).

Determinism contract (relied on by fixtures): numpy PCG64 seeded from
sha256 of the recipe key — stable across platforms and processes.

Segment label alphabet == the recognizer alphabet (config.ALPHABET).
``read_label(page, bbox)`` defines what "recognizing a crop" returns:
the concatenation of the gold labels of all segments whose center lies
inside the bbox, in left-to-right order — so recognition of merged
hulls is well-defined without pixels.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from ocr_spark.config import ALPHABET, BLANK_ID, CHAR_TO_ID


def stable_seed(*parts) -> int:
    h = hashlib.sha256("\x1f".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "little")


@dataclass
class Segment:
    bbox: np.ndarray  # [left, top, right, bottom] float64
    cls: str  # 'print' | 'hand'
    label: str


@dataclass
class Page:
    media_ref: str
    segments: list


CHAR_W = 22.0
SEG_H = 40.0


def _seg(x: float, y: float, label: str, cls: str) -> Segment:
    w = CHAR_W * max(len(label), 1)
    return Segment(
        bbox=np.array([x, y, x + w, y + SEG_H], dtype=np.float64),
        cls=cls,
        label=label,
    )


def _wrong(rng, v: int) -> int:
    return v + int(rng.integers(1, 4)) * (1 if rng.random() < 0.5 else -1)


def build_page(media_ref: str) -> Page:
    """Recipe key -> deterministic page of labeled segments."""
    rng = np.random.default_rng(stable_seed("page", media_ref))
    n_problems = int(rng.integers(1, 7))
    segments: list[Segment] = []
    y = 40.0
    for _ in range(n_problems):
        x = 60.0 if rng.random() < 0.7 else 620.0
        kind = rng.choice(
            ["full", "qa", "divrem", "vertical", "at", "hand_only", "bracket"],
            p=[0.20, 0.33, 0.10, 0.15, 0.05, 0.10, 0.07],
        )
        a, b = int(rng.integers(2, 80)), int(rng.integers(2, 30))
        op = str(rng.choice(["+", "-", "×"]))
        val = {"+": a + b, "-": a - b, "×": a * b}[op]
        ans = val if rng.random() < 0.8 else _wrong(rng, val)

        if kind == "full":
            segments.append(_seg(x, y, f"{a}{op}{b}={ans}", "print"))
        elif kind == "qa":
            q = _seg(x, y, f"{a}{op}{b}=", "print")
            gap = float(rng.uniform(12, 40))
            segments.append(q)
            segments.append(_seg(q.bbox[2] + gap, y, str(ans), "hand"))
        elif kind == "divrem":
            d = int(rng.integers(2, 10))
            quo = int(rng.integers(2, 10))
            rem = int(rng.integers(0, d))
            num = quo * d + rem
            q = _seg(x, y, f"{num}÷{d}=", "print")
            sep = "*" if rng.random() < 0.5 else "~"
            rq, rr = (quo, rem) if rng.random() < 0.85 else (_wrong(rng, quo), rem)
            segments.append(q)
            segments.append(_seg(q.bbox[2] + float(rng.uniform(12, 30)), y, f"{rq}{sep}{rr}", "hand"))
        elif kind == "vertical":
            q = _seg(x, y, f"{a}{op}{b}", "print")
            segments.append(q)
            y += SEG_H + float(rng.uniform(18, 40))
            segments.append(_seg(x + float(rng.uniform(0, 18)), y, str(ans), "hand"))
        elif kind == "at":
            segments.append(_seg(x, y, f"{a}@{b}", "print"))
        elif kind == "hand_only":
            segments.append(_seg(x, y, f"{a}{op}{b}={ans}", "hand"))
        else:  # bracket: print "(a+b" ... hand ans ... print ")=c" -> 2-round merge
            c = int(rng.integers(2, 20))
            total = val + c if rng.random() < 0.8 else _wrong(rng, val + c)
            p1 = _seg(x, y, f"({a}{op}{b}", "print")
            hand = _seg(p1.bbox[2] + float(rng.uniform(18, 40)), y, "", "hand")
            # hand holds the inner result guess
            hand.label = str(val if rng.random() < 0.9 else _wrong(rng, val))
            hand.bbox[2] = hand.bbox[0] + CHAR_W * len(hand.label)
            # round-2 attachment needs gap < merged_width / 10
            p2 = _seg(hand.bbox[2] + float(rng.uniform(6, 14)), y, f")+{c}={total}", "print")
            segments.extend([p1, hand, p2])
        y += SEG_H + float(rng.uniform(45, 85))
    return Page(media_ref=media_ref, segments=segments)


def read_label(page: Page, bbox) -> str:
    """Gold text of a crop: labels of segments centered inside bbox,
    left-to-right (ties by top)."""
    hits = []
    for s in page.segments:
        cx = (s.bbox[0] + s.bbox[2]) / 2
        cy = (s.bbox[1] + s.bbox[3]) / 2
        if bbox[0] <= cx <= bbox[2] and bbox[1] <= cy <= bbox[3]:
            hits.append((s.bbox[0], s.bbox[1], s.label))
    hits.sort(key=lambda t: (t[0], t[1]))
    return "".join(t[2] for t in hits)


def synth_probs(label: str, seed: int) -> np.ndarray:
    """Deterministic CTC probability matrix for a gold label.

    Frame pattern: blank, then per char (char-frame, blank-frame),
    with a closing blank. One character position may be "corrupted":
    a wrong class gets slightly higher probability than the true one,
    so greedy decode errs there while the true sequence stays within
    beam reach — exercising the reference's backup-retry path
    (pipline.py:713-723).
    """
    rng = np.random.default_rng(seed)
    ids = [CHAR_TO_ID[c] for c in label]
    t_total = 2 * len(ids) + 2
    n_classes = len(ALPHABET)
    probs = rng.uniform(0.001, 0.01, size=(t_total, n_classes))

    corrupt_pos = -1
    if ids and rng.random() < 0.12:
        corrupt_pos = int(rng.integers(0, len(ids)))

    probs[0, BLANK_ID] = rng.uniform(0.75, 0.95)
    frame = 1
    for pos, cid in enumerate(ids):
        if pos == corrupt_pos:
            wrong = int(rng.integers(0, n_classes - 1))  # never blank
            if wrong == cid:
                wrong = (wrong + 1) % (n_classes - 1)
            probs[frame, wrong] = 0.44
            probs[frame, cid] = 0.36
        else:
            probs[frame, cid] = rng.uniform(0.70, 0.95)
        frame += 1
        probs[frame, BLANK_ID] = rng.uniform(0.75, 0.95)
        frame += 1
    probs[frame, BLANK_ID] = rng.uniform(0.75, 0.95)
    probs /= probs.sum(axis=1, keepdims=True)
    return probs


def box_probs(page: Page, bbox) -> np.ndarray:
    """CTC probabilities for recognizing the given crop of a page."""
    label = read_label(page, bbox)
    seed = stable_seed(
        "probs", page.media_ref, int(bbox[0]), int(bbox[1]), int(bbox[2]), int(bbox[3])
    )
    return synth_probs(label, seed)
