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

    # 1. anchor scoring — loop over segments only (the rng draw order
    # is part of the frozen-fixture contract), anchors built as
    # columnar arrays per segment
    cols_l, cols_t, cols_r, cols_b, cols_s, cols_c = [], [], [], [], [], []
    for seg in page.segments:
        base = rng.uniform(0.80, 0.99)
        missed = rng.random() < MISS_PROB
        x0 = np.floor(seg.bbox[0] / ANCHOR_WIDTH) * ANCHOR_WIDTH
        x1 = np.ceil(seg.bbox[2] / ANCHOR_WIDTH) * ANCHOR_WIDTH
        n_slots = max(int((x1 - x0) / ANCHOR_WIDTH), 1)
        jitter = rng.uniform(-0.05, 0.05, size=n_slots)
        score = base + jitter
        if missed:
            score = score * 0.3
        ks = np.arange(n_slots, dtype=np.float64)
        cols_l.append(x0 + ks * ANCHOR_WIDTH)
        cols_r.append(x0 + (ks + 1) * ANCHOR_WIDTH)
        cols_t.append(np.full(n_slots, seg.bbox[1]))
        cols_b.append(np.full(n_slots, seg.bbox[3]))
        cols_s.append(score)
        cols_c.append(np.full(n_slots, 0 if seg.cls == "print" else 1, dtype=np.int64))
    if not cols_l:
        return np.zeros((0, 4), dtype=np.float64), []
    al = np.concatenate(cols_l)
    at = np.concatenate(cols_t)
    ar = np.concatenate(cols_r)
    ab = np.concatenate(cols_b)
    ascore = np.concatenate(cols_s)
    acls = np.concatenate(cols_c)

    keepmask = ascore > SCORE_THRESHOLD
    al, at, ar, ab, ascore, acls = (
        v[keepmask] for v in (al, at, ar, ab, ascore, acls)
    )
    n = len(al)
    if n == 0:
        return np.zeros((0, 4), dtype=np.float64), []

    # stable (top, left) order — same total order as the reference
    # implementation's stable list sort
    order = np.lexsort((al, at))
    al, at, ar, ab, ascore, acls = (v[order] for v in (al, at, ar, ab, ascore, acls))

    # 2. text-line construction: vectorized pairwise adjacency, then
    # union-find only over the actual edges. The adjacency predicate is
    # exactly the loop condition it replaces: same class, vertical
    # overlap ratio >= 0.7 of the shorter anchor, horizontal gap <=
    # LINE_MAX_GAP (the old loop's early `break` only skipped pairs
    # with ov <= 0, so the edge set is identical).
    heights = ab - at
    ov = np.minimum(ab[:, None], ab[None, :]) - np.maximum(at[:, None], at[None, :])
    minh = np.minimum(heights[:, None], heights[None, :])
    gap = np.maximum(al[None, :] - ar[:, None], al[:, None] - ar[None, :])
    adj = (
        (acls[:, None] == acls[None, :])
        & (ov > 0)
        & (ov / minh >= 0.7)
        & (gap <= LINE_MAX_GAP)
    )
    ii, jj = np.triu_indices(n, 1)
    edge_mask = adj[ii, jj]

    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i, j in zip(ii[edge_mask], jj[edge_mask]):
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            parent[rj] = ri

    groups: dict[int, list[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)

    cls_names = ["print", "hand"]
    lines = []
    for members in groups.values():
        m = np.asarray(members)
        score = float(np.mean(ascore[m]))
        box = np.array([al[m].min(), at[m].min(), ar[m].max(), ab[m].max()])
        lines.append((box, cls_names[int(acls[m[0]])], score))

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
