"""CTPN-style detection kernel (numpy, deterministic).

Mirrors the *call contract* of the reference's detection stage
(pipline.py:621-644: image -> (bboxes, types)); the CTPN network
itself lives in gitignored submodules there, so this is an original
stand-in with the same architectural shape:

1. anchor scoring — fixed-width (16px) vertical anchor slices get a
   text-ness score and a print/hand class (scores seeded from the
   recipe key; a small per-segment miss probability drops whole
   segments below threshold);
2. graph-based text-line construction — same-class anchors with high
   vertical overlap and horizontal gap <= LINE_MAX_GAP are unioned
   into text lines (connected components);
3. NMS — greedy by score, suppressing IoU > NMS_IOU.

Output boxes are anchor-quantized hulls of the true segments (left
floored / right ceiled to the anchor grid), sorted by (top, left).
This module is shared by the engine and the fixture oracle: detection
is our own design (nothing in the reference repo to diverge from), so
a single implementation is the source of truth.
"""

from __future__ import annotations

import numpy as np

from ocr_spark.config import ANCHOR_WIDTH, LINE_MAX_GAP, NMS_IOU
from ocr_spark.sources.media import Page, stable_seed

MISS_PROB = 0.03
SCORE_THRESHOLD = 0.5


def _rect_iou(a: np.ndarray, b: np.ndarray) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    if inter <= 0:
        return 0.0
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (area_a + area_b - inter)


def detect_page(page: Page) -> tuple[np.ndarray, list[str]]:
    """Page -> (boxes [n,4] float64, classes) — the (bboxes, types)
    contract of reference pipline.py:648."""
    rng = np.random.default_rng(stable_seed("detect", page.media_ref))

    # 1. anchor scoring
    anchors = []  # (left, top, right, bottom, cls, score)
    for seg in page.segments:
        base = rng.uniform(0.80, 0.99)
        missed = rng.random() < MISS_PROB
        x0 = np.floor(seg.bbox[0] / ANCHOR_WIDTH) * ANCHOR_WIDTH
        x1 = np.ceil(seg.bbox[2] / ANCHOR_WIDTH) * ANCHOR_WIDTH
        n_slots = max(int((x1 - x0) / ANCHOR_WIDTH), 1)
        jitter = rng.uniform(-0.05, 0.05, size=n_slots)
        for k in range(n_slots):
            score = base + jitter[k]
            if missed:
                score *= 0.3
            anchors.append(
                (
                    x0 + k * ANCHOR_WIDTH,
                    seg.bbox[1],
                    x0 + (k + 1) * ANCHOR_WIDTH,
                    seg.bbox[3],
                    seg.cls,
                    score,
                )
            )
    anchors = [a for a in anchors if a[5] > SCORE_THRESHOLD]
    if not anchors:
        return np.zeros((0, 4), dtype=np.float64), []

    # 2. text-line construction: union-find over the adjacency graph
    anchors.sort(key=lambda a: (a[1], a[0]))
    n = len(anchors)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i, j):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[rj] = ri

    for i in range(n):
        li, ti, ri_, bi, ci, _ = anchors[i]
        for j in range(i + 1, n):
            lj, tj, rj_, bj, cj, _ = anchors[j]
            if tj > bi:  # sorted by top: nothing below can overlap
                break
            if cj != ci:
                continue
            ov = min(bi, bj) - max(ti, tj)
            if ov <= 0 or ov / min(bi - ti, bj - tj) < 0.7:
                continue
            gap = max(lj - ri_, li - rj_)
            if gap <= LINE_MAX_GAP:
                union(i, j)

    groups: dict[int, list[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)

    lines = []
    for members in groups.values():
        arr = np.array([anchors[i][:4] for i in members], dtype=np.float64)
        score = float(np.mean([anchors[i][5] for i in members]))
        box = np.array(
            [arr[:, 0].min(), arr[:, 1].min(), arr[:, 2].max(), arr[:, 3].max()]
        )
        lines.append((box, anchors[members[0]][4], score))

    # 3. NMS
    lines.sort(key=lambda x: -x[2])
    kept = []
    for box, cls, score in lines:
        if all(_rect_iou(box, kb) <= NMS_IOU for kb, _, _ in kept):
            kept.append((box, cls, score))

    kept.sort(key=lambda x: (x[0][1], x[0][0]))
    boxes = np.stack([k[0] for k in kept]) if kept else np.zeros((0, 4))
    classes = [k[1] for k in kept]
    return boxes.astype(np.float64), classes
