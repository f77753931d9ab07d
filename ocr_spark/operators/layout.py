"""Geometric layout analysis (per-page, numpy).

Re-expresses the reference's box pairing / clustering semantics:

- horizontal mutual-nearest pairing  — reference layout_utils.py:118-216
  (``row_get_pair``): for each print box the nearest hand box by
  (right-mid-edge -> left-mid-edge) distance; a "best pair"
  (row-IoU>0.9 and col-IoU>0.3) short-circuits the scan; the chosen
  candidate must then satisfy the row-pair condition; a second pass
  dedups hands claimed by several prints keeping the closest.
- hull merging with residues — reference pipline.py:165-201
  (``create_big_img`` / ``row_connect``), two rounds (round 2 with the
  looser gap divisor, attaching bracket-style leftovers to merges).
- vertical nearest-lower pairing — reference layout_utils.py:219-288
  (``column_get_pair``).
- union-find into forests + per-forest rank — reference
  pipline.py:224-287 (``graph_to_forest``); members sort by top
  (stable), position = (tree, rank).
- fraction retyping — reference pipline.py:291-300 (``judge_fraction``).

Deliberate divergence: when round 1 leaves no print residue the
reference raises NameError (pipline.py:194-196 leaves
``merge_print_cell`` unbound); we treat that as "no round-2 pairs".

Boxes are [left, top, right, bottom] float64 rows of an (n, 4) array.
Distance math mirrors the reference exactly (sqrt of squared diffs in
float64) so strict-inequality comparisons agree bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ocr_spark.config import (
    BEST_PAIR_COL_IOU,
    BEST_PAIR_ROW_IOU,
    ROW_PAIR_MIN_VALUE,
    ROW_PAIR_MIN_VALUE_2,
)


@dataclass
class Node:
    """One layout node: an original detected box or a merged hull."""

    bbox: np.ndarray  # [left, top, right, bottom]
    typ: str  # 'print' | 'hand' | 'merge' | 'fraction'
    output: str = ""
    state: str = ""
    backups: list = field(default_factory=list)
    position: tuple = (-1, -1)
    probs: np.ndarray | None = None

    @property
    def left(self):
        return self.bbox[0]

    @property
    def top(self):
        return self.bbox[1]

    @property
    def right(self):
        return self.bbox[2]

    @property
    def bottom(self):
        return self.bbox[3]


def row_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vertical-interval IoU normalized by the smaller height."""
    top = np.maximum(a[:, None, 1], b[None, :, 1])
    bot = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = bot - top
    denom = np.minimum(a[:, None, 3] - a[:, None, 1], b[None, :, 3] - b[None, :, 1])
    out = np.where(inter > 0, inter / denom, 0.0)
    return out


def col_iou_matrix(a: np.ndarray, b: np.ndarray, norm: str = "min") -> np.ndarray:
    """Horizontal-interval IoU normalized by min or max width."""
    left = np.maximum(a[:, None, 0], b[None, :, 0])
    right = np.minimum(a[:, None, 2], b[None, :, 2])
    inter = right - left
    wa = a[:, None, 2] - a[:, None, 0]
    wb = b[None, :, 2] - b[None, :, 0]
    denom = np.minimum(wa, wb) if norm == "min" else np.maximum(wa, wb)
    return np.where(inter > 0, inter / denom, 0.0)


def _edge_distance_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distance from a's (right, mid-y) to b's (left, mid-y)."""
    dx = b[None, :, 0] - a[:, None, 2]
    dy = (b[None, :, 1] + b[None, :, 3]) / 2 - (a[:, None, 1] + a[:, None, 3]) / 2
    return np.sqrt(dx * dx + dy * dy)


def _same_line_matrix(p: np.ndarray, h: np.ndarray, riou: np.ndarray) -> np.ndarray:
    """in_same_line: containment either way, or print mid-y inside the
    hand's vertical range, or row-IoU > 0.9."""
    contains = (
        (p[:, None, 1] >= h[None, :, 1]) & (p[:, None, 3] <= h[None, :, 3])
    ) | ((h[None, :, 1] >= p[:, None, 1]) & (h[None, :, 3] <= p[:, None, 3]))
    mid = (p[:, None, 1] + p[:, None, 3]) / 2
    centred = (mid > h[None, :, 1]) & (mid < h[None, :, 3])
    return contains | centred | (riou > 0.9)


def row_pairs(
    prints: np.ndarray, hands: np.ndarray, min_value: float = ROW_PAIR_MIN_VALUE
) -> dict[int, int]:
    """Mutual-nearest horizontal pairing print->hand."""
    np_, nh = len(prints), len(hands)
    if np_ == 0 or nh == 0:
        return {}
    dist = _edge_distance_matrix(prints, hands)
    riou = row_iou_matrix(prints, hands)
    ciou = col_iou_matrix(prints, hands, "min")
    best = (riou > BEST_PAIR_ROW_IOU) & (ciou > BEST_PAIR_COL_IOU)
    same_line = _same_line_matrix(prints, hands, riou)
    width = prints[:, 2] - prints[:, 0]
    gap = hands[None, :, 0] - prints[:, None, 2]
    cond = (
        same_line
        & (gap < width[:, None] / min_value)
        & (np.abs(gap) < width[:, None])
        & (ciou < 0.9)
    )

    pairs: dict[int, int] = {}
    for i in range(np_):
        bi = best[i]
        j = int(bi.argmax()) if bi.any() else int(dist[i].argmin())
        if cond[i, j]:
            pairs[i] = j

    # dedup: a hand claimed by several prints keeps the closest claimant
    claims: dict[int, list[int]] = {}
    for i, j in pairs.items():
        claims.setdefault(j, []).append(i)
    for j, claimants in claims.items():
        if len(claimants) > 1:
            dists = dist[claimants, j]
            keep = claimants[int(np.argmin(dists))]
            for c in claimants:
                if c != keep:
                    del pairs[c]
    return pairs


def merge_pairs(
    pairs: dict[int, int], lhs: list[Node], rhs: list[Node]
) -> tuple[list[Node], list[Node], list[Node]]:
    """Union-hull each matched pair into a 'merge' node; return
    (lhs residue, rhs residue, merged) preserving list order."""
    matched_l = set(pairs.keys())
    matched_r = set(pairs.values())
    merged = []
    for i in pairs:  # insertion order == ascending accepted lhs index
        a, b = lhs[i], rhs[pairs[i]]
        bbox = np.array(
            [
                min(a.left, b.left),
                min(a.top, b.top),
                max(a.right, b.right),
                max(a.bottom, b.bottom),
            ],
            dtype=np.float64,
        )
        merged.append(Node(bbox=bbox, typ="merge"))
    lhs_res = [n for i, n in enumerate(lhs) if i not in matched_l]
    rhs_res = [n for j, n in enumerate(rhs) if j not in matched_r]
    return lhs_res, rhs_res, merged


def _bbox_array(nodes: list[Node]) -> np.ndarray:
    if not nodes:
        return np.zeros((0, 4), dtype=np.float64)
    return np.stack([n.bbox for n in nodes]).astype(np.float64)


def row_connect(
    prints: list[Node], hands: list[Node]
) -> tuple[list[Node], list[Node], list[Node]]:
    """Two-round horizontal merging.

    Returns (row_pairs_nodes, hand_residue, print_residue) where
    row_pairs_nodes = round-2 merge residue + round-2 merges.
    """
    p1 = row_pairs(_bbox_array(prints), _bbox_array(hands), ROW_PAIR_MIN_VALUE)
    print_res, hand_res, merge1 = merge_pairs(p1, prints, hands)
    if print_res:
        p2 = row_pairs(_bbox_array(merge1), _bbox_array(print_res), ROW_PAIR_MIN_VALUE_2)
    else:
        p2 = {}
    merge_res, print_res, merge2 = merge_pairs(p2, merge1, print_res)
    return merge_res + merge2, hand_res, print_res


def column_pairs(nodes: list[Node]) -> dict[int, int]:
    """Nearest-lower vertical pairing over all nodes.

    For node i, among nodes j with top_j >= top_i (j != i), running-min
    scan over distance between the two (left, mid-y) points, eligible
    when (col-IoU > 0.1 and dist < 4*h_i or dist < 4*h_j) or
    dist < 2*h_i. Result -1 when nothing qualifies.
    """
    n = len(nodes)
    out: dict[int, int] = {}
    if n == 0:
        return out
    b = _bbox_array(nodes)
    lx = b[:, 0]
    my = (b[:, 1] + b[:, 3]) / 2
    h = b[:, 3] - b[:, 1]
    dx = lx[None, :] - lx[:, None]
    dy = my[None, :] - my[:, None]
    dist = np.sqrt(dx * dx + dy * dy)
    ciou = col_iou_matrix(b, b, "min")
    for i in range(n):
        ok = (b[:, 1] >= b[i, 1]) & (np.arange(n) != i)
        elig = ok & (
            ((ciou[i] > 0.1) & ((dist[i] < 4 * h[i]) | (dist[i] < 4 * h)))
            | (dist[i] < 2 * h[i])
        )
        if elig.any():
            d = np.where(elig, dist[i], np.inf)
            out[i] = int(d.argmin())
        else:
            out[i] = -1
    return out


def build_forests(pairs: dict[int, int], nodes: list[Node]) -> list[list[Node]]:
    """Fold pair edges into forests (connected components), preserving
    the reference's exact list-merge ordering, then sort each forest by
    top (stable) and assign position=(tree, rank)."""
    forests: list[list[int]] = []
    for top_idx in pairs:  # insertion order: 0..n-1
        bottom_idx = pairs[top_idx]
        if not forests:
            forests.append([top_idx] if bottom_idx == -1 else [top_idx, bottom_idx])
            continue
        t_forest = None
        b_forest = None
        for f in forests:
            if top_idx in f:
                t_forest = f
            if bottom_idx in f:
                b_forest = f
            if t_forest is not None and b_forest is not None:
                break
        if t_forest is not None and b_forest is not None and t_forest is not b_forest:
            t_forest.extend(b_forest)
            forests.remove(b_forest)
        elif t_forest is not None:
            # NOTE: when top and bottom already share a forest the
            # reference appends bottom AGAIN (duplicate member,
            # pipline.py:256-258) — preserved.
            if bottom_idx != -1:
                t_forest.append(bottom_idx)
        elif b_forest is not None:
            b_forest.append(top_idx)
        else:
            forests.append([top_idx] if bottom_idx == -1 else [top_idx, bottom_idx])

    forest_nodes = [[nodes[i] for i in f] for f in forests]
    for ti, f in enumerate(forest_nodes):
        f.sort(key=lambda nd: nd.top)
        for ri, nd in enumerate(f):
            nd.position = (ti, ri)
    return forest_nodes


def judge_fraction(forests: list[list[Node]]) -> None:
    """Retype a print/merge node as 'fraction' when a hand-ish node
    below it (before the next print/merge) has col-IoU(max) > 0.5."""
    for forest in forests:
        for top in forest:
            if top.typ in ("merge", "print"):
                for i in range(top.position[1] + 1, len(forest)):
                    bottom = forest[i]
                    if bottom.typ in ("merge", "print"):
                        break
                    a = top.bbox[None, :]
                    b = bottom.bbox[None, :]
                    if col_iou_matrix(a, b, "max")[0, 0] > 0.5:
                        top.typ = "fraction"
