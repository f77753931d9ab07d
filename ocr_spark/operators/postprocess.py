"""Per-page recognition routing, vertical-form splice, and the full
media-span extraction chain.

Semantics re-expressed from the reference's post-processing stage
(pipline.py:698-798), greedy-decode configuration (the
``GREEADY_BEAM=True`` shape, config.py:6 / pipline.py:680-685):

- primary output per box = greedy CTC decode;
- routing by type x verdict: 'merge' always emits (with a beam-backup
  retry when not 'right' and CJK-free, pipline.py:713-723); 'print'
  emits when 'right', else '@' -> fraction (dropped) else vertical;
  'hand' emits when 'right' else dropped; 'fraction' (from
  judge_fraction) is dropped;
- vertical-form splice (pipline.py:757-796): each vertical print walks
  its forest from rank max(r-2, 0) downward, skipping print/merge
  nodes, splicing "expr=answer" candidates until one grades 'right'
  (emitting a merged hull) else the vertical itself is emitted with
  'error' (has an operator, CJK-free) or 'problem'.

Quirk preserved: under greedy mode backup lists of vertical/bottom
boxes are empty, so the splice grades only the direct concatenation
(the reference's nested backup loops never run).

Emitted span text is ``"<state>:<output>"``.
"""

from __future__ import annotations

import numpy as np

from ocr_spark.config import BEAM_K
from ocr_spark.functions.arith import eval_verdict
from ocr_spark.functions.ctc import beam_decode_texts, greedy_decode_batch
from ocr_spark.functions.text_clean import has_cjk
from ocr_spark.operators.detect import detect_page
from ocr_spark.operators.layout import (
    Node,
    build_forests,
    column_pairs,
    judge_fraction,
    row_connect,
)
from ocr_spark.sources.media import Page, build_page

_OPERATOR_CHARS = set("+-×÷=")


def _recognize_pages(
    pages_nodes: list[tuple[Page, list[Node]]], weights: dict | None = None
) -> None:
    """Batch-recognize every node of every page in one shot: the
    forward pass runs width-bucketed across ALL crops of the batch
    (sources.media.box_probs_batch — one BLAS matmul per bucket instead
    of one per crop), then the broadcast class projection (M7,
    reference pipline.py:684-685) and ONE vectorized greedy decode over
    the pad-to-max batch (the reference's utils.py:171-180 + one
    sess.run). Assigns node.probs / node.output in place."""
    items = [(page, n.bbox) for page, nodes in pages_nodes for n in nodes]
    if not items:
        return
    from ocr_spark.sources.weights import project_probs

    from ocr_spark.sources.media import box_probs_batch

    mats = [project_probs(m, weights) for m in box_probs_batch(items, weights)]
    lengths = np.array([m.shape[0] for m in mats], dtype=np.int64)
    t_max = int(lengths.max())
    batch = np.zeros((len(mats), t_max, mats[0].shape[1]), dtype=np.float64)
    for i, m in enumerate(mats):
        batch[i, : m.shape[0]] = m
    outputs = greedy_decode_batch(batch, lengths)
    flat_nodes = [n for _, nodes in pages_nodes for n in nodes]
    for node, mat, out in zip(flat_nodes, mats, outputs):
        node.probs = mat
        node.output = out


def _recognize(page: Page, nodes: list[Node], weights: dict | None = None) -> None:
    """Single-page recognition (kept as the unit-test surface; the
    extraction kernels batch across pages via ``_recognize_pages``)."""
    _recognize_pages([(page, nodes)], weights)


def route_nodes(
    nodes: list[Node],
) -> tuple[list[Node], list[Node], list[Node], list[Node]]:
    """Type x verdict routing -> (connect, vertical, fraction, other)."""
    connect: list[Node] = []
    vertical: list[Node] = []
    fraction: list[Node] = []
    other: list[Node] = []
    for node in nodes:
        if node.typ == "merge":
            state = eval_verdict(node.output)
            node.state = state
            if state != "right" and not has_cjk(node.output):
                node.backups = beam_decode_texts(node.probs, BEAM_K)
                for cand in node.backups:
                    if eval_verdict(cand) == "right":
                        node.state = "right"
                        node.output = cand
                        break
            connect.append(node)
        elif node.typ == "print":
            state = eval_verdict(node.output)
            if state == "right":
                node.state = state
                connect.append(node)
            elif "@" in node.output:
                fraction.append(node)
            else:
                vertical.append(node)
        elif node.typ == "hand":
            state = eval_verdict(node.output)
            if state == "right":
                node.state = state
                connect.append(node)
            else:
                other.append(node)
        else:  # 'fraction' from judge_fraction
            other.append(node)
    return connect, vertical, fraction, other


def splice_vertical(
    vertical: list[Node], forests: list[list[Node]], connect: list[Node]
) -> None:
    """Vertical-form (竖式) splice; appends results to connect."""
    for v in vertical:
        forest = forests[v.position[0]]
        state = ""
        out = ""
        spliced = False
        for num in range(max(v.position[1] - 2, 0), len(forest)):
            b = forest[num]
            if b.typ in ("print", "merge"):
                continue
            label = v.output.replace("=", "") + "=" + b.output.replace("=", "")
            state = eval_verdict(label)
            out = label
            done = False
            for v_cand in v.backups:  # empty under greedy mode
                for b_cand in b.backups:
                    label2 = v_cand.replace("=", "") + "=" + b_cand.replace("=", "")
                    state = eval_verdict(label2)
                    out = label2
                    if state == "right":
                        done = True
                        break
                if done:
                    break
            if state == "right":
                hull = np.array(
                    [
                        min(v.left, b.left),
                        min(v.top, b.top),
                        max(v.right, b.right),
                        max(v.bottom, b.bottom),
                    ],
                    dtype=np.float64,
                )
                connect.append(Node(bbox=hull, typ="merge", output=out, state="right"))
                spliced = True
                break
        if not spliced:
            if not has_cjk(v.output) and (_OPERATOR_CHARS & set(v.output)):
                v.state = "error"
            else:
                v.state = "problem"
            connect.append(v)


def _prepare_page(media_ref: str) -> tuple[Page, list[Node], list[list[Node]]]:
    """Pre-recognition half of the OCR chain for one media span:
    recipe -> detect -> layout. Returns (page, all_nodes, forests);
    all_nodes is empty when detection finds nothing."""
    page = build_page(media_ref)
    boxes, classes = detect_page(page)
    if len(classes) == 0:
        return page, [], []

    prints = [Node(bbox=boxes[i], typ="print") for i in range(len(classes)) if classes[i] == "print"]
    hands = [Node(bbox=boxes[i], typ="hand") for i in range(len(classes)) if classes[i] != "print"]

    if prints and hands:
        row_nodes, hand_res, print_res = row_connect(prints, hands)
        all_nodes = row_nodes + hand_res + print_res
        cpairs = column_pairs(all_nodes)
        forests = build_forests(cpairs, all_nodes)
        judge_fraction(forests)
    else:
        all_nodes = prints + hands
        cpairs = column_pairs(all_nodes)
        forests = build_forests(cpairs, all_nodes)
    return page, all_nodes, forests


def _finish_page(all_nodes: list[Node], forests: list[list[Node]]) -> list[str]:
    """Post-recognition half: route -> splice -> ordered span texts."""
    connect, vertical, _fraction, _other = route_nodes(all_nodes)
    splice_vertical(vertical, forests, connect)
    return [f"{n.state}:{n.output}" for n in connect]


# recognition batches this many pages at once: bounds the live
# node.probs matrices (~17 KB each, ~4 nodes/page -> ~35 MB/chunk)
# while keeping the width buckets full enough to amortize the matmuls
_PAGE_CHUNK = 512


def extract_media_spans_batch(
    media_refs: list[str], weights: dict | None = None
) -> list[list[str]]:
    """Full OCR chain for MANY media spans: per-page detect/layout and
    route/splice stay per-page computations, but recognition — ~90% of
    extraction cost (BENCH_r02) — runs as width-bucketed batched BLAS
    matmuls across every crop of up to ``_PAGE_CHUNK`` pages at once
    (the reference's pad-to-max batched sess.run, utils.py:171-180,
    lifted from one page to the whole Arrow batch). Output is
    bit-identical to per-page extraction (asserted by
    test_extraction)."""
    out: list[list[str]] = []
    for s in range(0, len(media_refs), _PAGE_CHUNK):
        chunk = media_refs[s : s + _PAGE_CHUNK]
        preps = [_prepare_page(ref) for ref in chunk]
        _recognize_pages(
            [(page, nodes) for page, nodes, _ in preps], weights
        )
        out.extend(
            _finish_page(nodes, forests) if nodes else []
            for _, nodes, forests in preps
        )
    return out


def extract_media_span(media_ref: str, weights: dict | None = None) -> list[str]:
    """Full OCR chain for one media span: recipe -> detect -> layout ->
    recognize -> route -> splice. Returns ordered span texts.

    ``weights`` is the broadcast model-weights dict
    (sources/weights.py); None = module defaults (identical output —
    the default projection is the identity on the 21-class alphabet)."""
    return extract_media_spans_batch([media_ref], weights)[0]
