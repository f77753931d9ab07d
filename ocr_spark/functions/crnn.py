"""Real recognition compute: a deterministic numpy CRNN stand-in for
the reference's conv-stack + BiLSTM recognizer (model.py:93-218).

Round 1 fabricated CTC probability matrices directly from the gold
label ("recipe-seeded logits", SURVEY §2.9 allowance). This module
replaces that with an actual forward pass over actually-rendered
pixels, so the heavy-UDF surface costs what real inference costs and
the skew/cost-model numbers are measured, not extrapolated:

- ``render_label``: glyph-bitmap renderer — the pixel source for a
  crop (the sandbox twin of "decode the image bytes"; the reference's
  synthetic data is likewise rendered from recipes, mnist_to_num.py).
  Deterministic per (label, seed): seeded amplitude/offset jitter and
  background noise.
- conv stack (weights broadcast via sources/weights.py): two 3x3
  valid convolutions with ReLU and (2,2)/(2,1) max-pools — the width
  arithmetic reproduces the reference's width-dependent
  sequence_length = floor((w-2)/2) - 2 (model.py:176-183, its
  stride-[2,1] pooling plan), clamped >= 1.
- recurrence: a residual bidirectional tanh recurrence with a
  diagonal (LRU-style) gate, h_t = tanh(x_t + d ⊙ h_{t-1}), over
  timestep features — the BiLSTM's sequential dependency with real
  per-step state propagation.
- classifier: a context-stacked linear head fit in closed form (ridge
  regression to one-hot frame labels over jittered glyph renders
  pushed through the SAME conv+recurrence stack) at
  weight-construction time; softmax with a fixed gain yields per-frame
  class probabilities. Inter-glyph gap frames are trained to the CTC
  blank, which is what makes greedy collapse recover repeated
  characters.

Everything is a pure function of (label, seed, weights): fixtures are
regenerated from this compute and the decode oracle replays it
identically.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ocr_spark.config import ALPHABET, BLANK_ID, N_CLASSES

# -- glyph font (7x5 bitmaps, our own design) -------------------------------

_G = {
    "0": ".###.|#...#|#...#|#...#|#...#|#...#|.###.",
    "1": "..#..|.##..|..#..|..#..|..#..|..#..|.###.",
    "2": ".###.|#...#|....#|...#.|..#..|.#...|#####",
    "3": "####.|....#|...#.|..##.|....#|....#|####.",
    "4": "...#.|..##.|.#.#.|#..#.|#####|...#.|...#.",
    "5": "#####|#....|####.|....#|....#|#...#|.###.",
    "6": ".###.|#....|#....|####.|#...#|#...#|.###.",
    "7": "#####|....#|...#.|..#..|..#..|.#...|.#...",
    "8": ".###.|#...#|#...#|.###.|#...#|#...#|.###.",
    "9": ".###.|#...#|#...#|.####|...#.|..#..|.#...",
    "-": ".....|.....|.....|#####|.....|.....|.....",
    "=": ".....|#####|.....|.....|.....|#####|.....",
    "+": ".....|..#..|..#..|#####|..#..|..#..|.....",
    "×": ".....|#...#|.#.#.|..#..|.#.#.|#...#|.....",
    "÷": ".....|.##..|.....|#####|.....|..##.|.....",
    "(": "...#.|..#..|.#...|.#...|.#...|..#..|...#.",
    ")": ".#...|..#..|...#.|...#.|...#.|..#..|.#...",
    "*": ".....|#.#.#|.###.|#####|.###.|#.#.#|.....",
    "@": ".###.|#...#|#.###|#.#.#|#.##.|#....|.####",
    "~": ".....|.....|.#..#|#.#.#|#..#.|.....|.....",
    " ": ".....|.....|.....|.....|.....|.....|.....",
}

_SCALE = 4          # 7x5 bitmap -> 28x20 pixels
GLYPH_H, GLYPH_W = 7 * _SCALE, 5 * _SCALE
CELL_W = GLYPH_W + 8          # 8px inter-glyph gap (wider than the
                              # conv receptive span -> pure-blank frames)
IMG_H = GLYPH_H + 4           # 2px top/bottom margin
_MARGIN = 4                   # canvas side margins


@lru_cache(maxsize=1)
def _glyph_bitmaps() -> np.ndarray:
    """[N_CLASSES, GLYPH_H, GLYPH_W] float bitmaps, class-id indexed."""
    out = np.zeros((N_CLASSES, GLYPH_H, GLYPH_W), dtype=np.float64)
    for cid, ch in enumerate(ALPHABET):
        rows = _G[ch].split("|")
        small = np.array(
            [[1.0 if c == "#" else 0.0 for c in row] for row in rows]
        )
        out[cid] = np.kron(small, np.ones((_SCALE, _SCALE)))
    return out


def render_label(label: str, seed: int) -> np.ndarray:
    """label -> [IMG_H, W] grayscale image, W = CELL_W*len + margins.
    Seeded jitter: per-char amplitude 0.85-1.0, +-1px placement offset;
    background noise U(0, 0.06)."""
    rng = np.random.default_rng(seed)
    n = len(label)
    width = CELL_W * n + 2 * _MARGIN
    img = rng.uniform(0.0, 0.06, size=(IMG_H, width))
    bitmaps = _glyph_bitmaps()
    ids = [ALPHABET.index(c) for c in label]
    for i, cid in enumerate(ids):
        amp = rng.uniform(0.85, 1.0)
        dy = int(rng.integers(-1, 2))
        dx = int(rng.integers(-1, 2))
        y0 = 2 + dy
        x0 = _MARGIN + CELL_W * i + dx
        img[y0 : y0 + GLYPH_H, x0 : x0 + GLYPH_W] += amp * bitmaps[cid]
    return np.clip(img, 0.0, 1.0)


# -- conv stack -------------------------------------------------------------


def _conv2d_valid(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    """x [Cin, H, W], k [Cout, Cin, 3, 3] -> [Cout, H-2, W-2] via
    SLAB im2col + one BLAS matmul (the fast path: this is where the
    compute budget goes, as in the real model). The column matrix is
    assembled as 9 whole-slab strided copies (one per kernel tap)
    instead of the per-window gather a transpose+reshape of
    sliding_window_view compiles to — same bytes, ~3x faster to
    build, and the [Cout, 9Cin] @ [9Cin, HW] orientation writes the
    output contiguous so the old final transpose-copy disappears.
    Same dot products up to BLAS summation order, which the
    classifier's round(10) quantization absorbs (fixture-asserted).
    With OCR_SPARK_CONV=shiftsum and Cin > 1, the multi-channel conv
    runs as 9 channel-matmuls over strided views instead (the A/B
    arm BENCH/NOTES_r4.md section 16 measured)."""
    cin, h, w = x.shape
    cout = k.shape[0]
    if _CONV_IMPL == "shiftsum" and cin > 1:
        out = np.zeros((cout, h - 2, w - 2))
        for di in range(3):
            for dj in range(3):
                sl = x[:, di : di + h - 2, dj : dj + w - 2]
                out += np.tensordot(k[:, :, di, dj], sl, axes=([1], [0]))
        return out
    h2, w2 = h - 2, w - 2
    cols = np.empty((9, cin, h2, w2))
    for di in range(3):
        for dj in range(3):
            cols[di * 3 + dj] = x[:, di : di + h2, dj : dj + w2]
    # k[co, ci, di, dj] -> kk[co, (di*3+dj)*Cin + ci] to match cols
    kk = k.transpose(0, 2, 3, 1).reshape(cout, 9 * cin)
    out = kk @ cols.reshape(9 * cin, h2 * w2)
    return out.reshape(cout, h2, w2)


def _maxpool(x: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Elementwise max over ph*pw strided views — value-identical to
    the reshape-reduce form but ~5x faster (no 5-D intermediate; pure
    max, so no float-order concerns at all)."""
    c, h, w = x.shape
    h2, w2 = h // ph, w // pw
    v = x[:, : h2 * ph, : w2 * pw]
    out = None
    for i in range(ph):
        for j in range(pw):
            s = v[:, i::ph, j::pw]
            out = s.copy() if out is None else np.maximum(out, s, out=out)
    return out


def sequence_length(width: int, variant: str = "base") -> int:
    """The reference's width-dependent CTC length, per conv-stack
    variant:

    - ``base`` (model.py:176-183): floor((w-2)/2) - 2;
    - ``conv9`` (model3.py:56-75): one extra 3x3 VALID conv after
      conv8 trims two more steps — after_pool4 = after_pool3 - 2;
    - ``fraction`` (model_fraction2.py:57-86): a final 2x2 VALID conv
      trims one step and leaves a height-2 map whose two rows are
      interleaved into the time axis — after_conv9 =
      (after_pool3 - 1) * 2, the doubled temporal resolution the
      reference uses for vertically-stacked fraction layouts.

    All clamped >= 1 (the reference's tf.maximum(seq_len, 1))."""
    base = (width - 2) // 2 - 2
    if variant == "conv9":
        return max(base - 2, 1)
    if variant == "fraction":
        return max((base - 1) * 2, 1)
    return max(base, 1)


def char_frame_range(pos: int, t_total: int) -> tuple[int, int]:
    """Output-frame span whose receptive field sits on character cell
    ``pos`` (used by the deterministic corruption injector)."""
    x0 = _MARGIN + CELL_W * pos + 3
    x1 = _MARGIN + CELL_W * pos + GLYPH_W - 3
    t0 = max((x0 - 3) // 2, 0)
    t1 = min((x1 - 3) // 2, t_total - 1)
    return t0, t1


def _conv2d_valid2(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    """2x2 VALID conv: x [Cin, H, W], k [Cout, Cin, 2, 2] ->
    [Cout, H-1, W-1] (the fraction variant's final conv,
    model_fraction2.py:60)."""
    cin, h, w = x.shape
    cout = k.shape[0]
    h2, w2 = h - 1, w - 1
    cols = np.empty((4, cin, h2, w2))  # slab im2col (see _conv2d_valid)
    for di in range(2):
        for dj in range(2):
            cols[di * 2 + dj] = x[:, di : di + h2, dj : dj + w2]
    kk = k.transpose(0, 2, 3, 1).reshape(cout, 4 * cin)
    out = kk @ cols.reshape(4 * cin, h2 * w2)
    return out.reshape(cout, h2, w2)


def conv_features(img: np.ndarray, weights: dict, variant: str = "base") -> np.ndarray:
    """[H, W] image -> [T, D] timestep features,
    T = sequence_length(W, variant).

    Variants (see sequence_length): ``conv9`` appends a 3x3 VALID conv
    (model3.py:56-75 — extra capacity, two fewer timesteps);
    ``fraction`` appends a 2x2 VALID conv, pools the height to 2 and
    interleaves the two rows into the time axis (model_fraction2.py:
    57-86 — its transpose + reshape doubling), so vertically stacked
    content gets its own frames. Both keep D = 96, so the recurrence
    and classifier-head machinery are shared."""
    x = img[None, :, :]
    # ReLU commutes with max-pool (both are maxes), so pooling FIRST
    # shrinks the ReLU pass 4x (2x) — values exactly identical, and
    # the clamp runs in place on the pooled map
    x = _maxpool(_conv2d_valid(x, weights["conv1"]), 2, 2)
    np.maximum(x, 0.0, out=x)
    x = _maxpool(_conv2d_valid(x, weights["conv2"]), 2, 1)
    np.maximum(x, 0.0, out=x)
    if variant == "conv9":
        x = np.maximum(_conv2d_valid(x, weights["conv9"]), 0.0)
    elif variant == "fraction":
        x = np.maximum(_conv2d_valid2(x, weights["conv9f"]), 0.0)
        # height 5 -> 2 via OVERLAPPING half-pools (rows 0-2 / 2-4):
        # the reference reaches its h=2 map through a deeper stack
        # whose two rows each cover ~half the input height; a plain
        # stride-2 pool here would drop row 4 and leave each frame
        # blind to a third of the glyph
        x = np.stack(
            [x[:, :3].max(axis=1), x[:, 2:].max(axis=1)], axis=1
        )
        c, h, t = x.shape
        # [C, 2, T] -> [2T, C]: row-major (time, height) interleave —
        # exactly the reference's transpose([0,2,1,3]) + reshape
        feats = x.transpose(2, 1, 0).reshape(h * t, c)
        want = sequence_length(img.shape[1], variant)
        return feats[:want] if len(feats) >= want else np.pad(
            feats, ((0, want - len(feats)), (0, 0))
        )
    c, h, t = x.shape
    feats = x.reshape(c * h, t).T  # [T, D]
    want = sequence_length(img.shape[1], variant)
    return feats[:want] if len(feats) >= want else np.pad(
        feats, ((0, want - len(feats)), (0, 0))
    )


def recurrent_mix(feats: np.ndarray, wh: np.ndarray, alpha: float = 0.25) -> np.ndarray:
    """Residual bidirectional tanh recurrence with a DIAGONAL
    recurrent gate (LRU/minimal-RNN style): h_t = tanh(x_t + d ⊙
    h_{t-1}). Still a real sequential dependency driven by broadcast
    per-feature decay weights, but each step is O(D) elementwise
    instead of an O(D^2) matvec — the dense-matrix variant made the
    recurrence 80% of the whole forward pass for no accuracy gain
    (profiled: 47 ms -> ~4 ms per label), leaving the conv matmuls as
    the dominant (and representative) compute."""
    t, d = feats.shape
    # BOTH directions step together as one [2, d] state: the forward
    # pass walks feats as-is, the backward pass walks it reversed, so
    # step i needs [feats[i], feats[t-1-i]] — staged once into xs.
    # Halves the per-step numpy dispatch count (the [d]-vector steps
    # are dispatch-bound); every op stays elementwise, so the values
    # are bitwise identical to two independent scans. Steps stay
    # allocation-free: tanh lands directly in the out row.
    xs = np.empty((t, 2, d))
    xs[:, 0] = feats
    xs[:, 1] = feats[::-1]
    out = np.empty((t, 2, d))
    buf = np.empty((2, d))
    h = np.zeros((2, d))
    for i in range(t):
        np.multiply(wh, h, out=buf)
        buf += xs[i]
        h = np.tanh(buf, out=out[i])
    # out[i, 0] = forward h_i; out[i, 1] = backward h_{t-1-i}
    return feats + alpha * (out[:, 0] + out[::-1, 1])


_CTX = 4  # classifier sees +-4 neighboring frames (~a full glyph width)


def stack_context(feats: np.ndarray, r: int = _CTX) -> np.ndarray:
    """[T, D] -> [T, (2r+1)*D]: each frame concatenated with its r
    neighbors on each side (zero-padded at the ends) — the temporal
    receptive field a real CRNN's sequence head has, which is what
    separates glyphs whose single-frame slices are ambiguous."""
    t, d = feats.shape
    padded = np.concatenate(
        [np.zeros((r, d)), feats, np.zeros((r, d))], axis=0
    )
    return np.concatenate([padded[i : i + t] for i in range(2 * r + 1)], axis=1)


def _head_blocks(weights: dict) -> tuple[np.ndarray, np.ndarray]:
    """Shift-sum form of the classifier head, derived once per worker
    and memoized inside the (worker-local) weights dict.

    The context-stacked product ``[ctx | 1] @ cls_w`` reads a
    [T, (2r+1)D+1] matrix that is 2r+1 shifted COPIES of the same
    [T, D] features (~1 MB/crop at D=96 — the cache-bound traffic
    BENCH r2/r3 profiled). Algebraically the same logits are
    ``sum_o padded[t+o] @ W_o + bias`` — so compute ONE matmul of the
    padded features against the column-concatenated blocks
    [D, (2r+1)C] (C=22 classes, ~4x narrower than 9D) and add 2r+1
    shifted [T, C] slices. Identical dot products up to summation
    order; the round(p, 10) quantization below absorbs that, keeping
    decode bit-identical (asserted against the stacked path and the
    frozen fixtures by test_crnn)."""
    cls_w = weights["cls_w"]
    r = weights.get("ctx_r", _CTX)
    cached = weights.get("_head_blocks")
    if cached is None or cached[2] is not cls_w:  # stale if cls_w swapped
        d = (cls_w.shape[0] - 1) // (2 * r + 1)
        wcat = np.ascontiguousarray(
            cls_w[:-1]
            .reshape(2 * r + 1, d, cls_w.shape[1])
            .transpose(1, 0, 2)
            .reshape(d, -1)
        )
        cached = (wcat, cls_w[-1], cls_w)
        weights["_head_blocks"] = cached
    return cached[0], cached[1]


def class_probs(feats: np.ndarray, weights: dict) -> np.ndarray:
    """[T, D] features -> [T, N_CLASSES] softmax probabilities through
    the context-window linear classifier head (shift-sum form, see
    _head_blocks; bias folded in as an augmented all-ones feature in
    the reference stacked form)."""
    wcat, bias = _head_blocks(weights)
    t, d = feats.shape
    r = weights.get("ctx_r", _CTX)
    c = wcat.shape[1] // (2 * r + 1)
    padded = np.concatenate(
        [np.zeros((r, d)), feats, np.zeros((r, d))], axis=0
    )
    p = padded @ wcat  # [t + 2r, (2r+1)*C]
    acc = np.tile(bias, (t, 1))
    for i in range(2 * r + 1):
        acc += p[i : i + t, i * c : (i + 1) * c]
    logits = weights["gain"] * acc
    logits -= logits.max(axis=1, keepdims=True)
    e = np.exp(logits)
    p = e / e.sum(axis=1, keepdims=True)
    # quantize: BLAS matmul summation order differs between driver and
    # pinned executor threads by ~1e-15 relative — enough to flip a
    # near-tied beam ordering. 10-decimal rounding is 5 orders above
    # the noise floor and far below any decision margin, so decode is
    # bit-identical wherever (and in whichever algebraic form) the
    # forward pass runs.
    return np.round(p, 10)


def _class_probs_stacked(feats: np.ndarray, weights: dict) -> np.ndarray:
    """Reference stacked-context head (the literal [ctx | 1] @ cls_w
    product) — kept for the head-equivalence test and A/B harnesses."""
    ctx = stack_context(feats, weights.get("ctx_r", _CTX))
    aug = np.concatenate([ctx, np.ones((len(ctx), 1))], axis=1)
    logits = weights["gain"] * (aug @ weights["cls_w"])
    logits -= logits.max(axis=1, keepdims=True)
    e = np.exp(logits)
    p = e / e.sum(axis=1, keepdims=True)
    return np.round(p, 10)


def forward_probs(img: np.ndarray, weights: dict, variant: str = "base") -> np.ndarray:
    """Full forward pass: image -> conv stack -> recurrence ->
    prototype classifier -> [T, N_CLASSES] CTC probabilities. Pass a
    ``variant`` together with that variant's weights
    (build_conv_weights(variant)) for the conv9 / fraction stacks —
    the production extraction default stays 'base'."""
    feats = recurrent_mix(conv_features(img, weights, variant), weights["wh"])
    probs = class_probs(feats, weights)
    if variant == "fraction" and len(probs) % 2 == 0:
        # pair-consistency smoothing: the trained reference model
        # learns that the two interleaved frames of one column step
        # agree; the closed-form head has no such coupling, and a
        # single flickering frame of a pair splits a glyph run into a
        # doubled character under CTC collapse (measured: 36% of
        # random labels, ALL failures pure adjacent duplication).
        # Averaging each pair's class distribution restores the
        # coupling deterministically — 0/100 random-label misses —
        # while keeping the doubled-frame stack and the reference's
        # seq-len arithmetic intact.
        pm = probs.reshape(-1, 2, probs.shape[1]).mean(axis=1)
        probs = np.round(np.repeat(pm, 2, axis=0), 10)
    return probs


# -- batched forward pass ----------------------------------------------------
#
# The per-crop forward pass spends its budget in three smallish BLAS
# matmuls (conv1/conv2 im2col, classifier head); running one crop at a
# time leaves call overhead and cache misses on the table — profiled at
# ~90% of extraction wall time (BENCH_r02). The batched path stacks all
# same-shaped crops of an Arrow batch and runs each matmul ONCE per
# width bucket. Every output element is the same dot product as the
# single-crop path; the existing round(p, 10) quantization in
# class_probs absorbs BLAS summation-order noise, so decode stays
# bit-identical to the per-crop path (asserted by test_crnn).

# Per-matmul sub-batch cap — how many same-shape crops stack into one
# im2col/classifier matmul. Two measured sweeps disagree, and the
# CONCURRENT one is the one that matters:
# - single-worker (idle box): peak at 8 crops (1.27x vs per-crop),
#   collapse beyond ~24 — a per-worker L2/L3 budget;
# - 32 concurrent workers (tools/ab_maxcrops.py, cold-JVM interleaved
#   A/B on the real extraction job): monotonically WORSE with stacking
#   — cap=8 is 1.7x slower than cap=1 (46.0s vs 26.7s median at 6000
#   docs), cap=4 1.8x, cap=2 1.2x — while at local[4] all caps tie
#   (121.6s vs 121.7s). The ~1 MB/crop context matrices are cache-
#   resident per-crop, but 32 workers x stacked batches oversubscribe
#   the SHARED L3/DRAM bandwidth, and the whole fleet goes memory-
#   bound. Deployment shape is always many-workers-per-host, so the
#   default is 1 (no stacking); the width-bucket machinery stays for
#   the vectorized decode and for hosts with larger cache-per-core
#   (env-overridable so A/B benchmarks reach the forked workers).
import os as _os  # noqa: E402

_MAX_CROPS = int(_os.environ.get("OCR_SPARK_MAX_CROPS", "1"))
# classifier-head form: 'shiftsum' (default; one narrow matmul + 2r+1
# shifted adds) or 'stacked' (literal [ctx|1]@cls_w) — round(10)-equal
_HEAD_IMPL = _os.environ.get("OCR_SPARK_HEAD", "shiftsum")
# multi-channel conv form: 'im2col' (default) or 'shiftsum' (9 strided
# channel-matmuls, no im2col materialization) — round(10)-equal decode
_CONV_IMPL = _os.environ.get("OCR_SPARK_CONV", "im2col")
# recurrence batch width: how many same-width crops step one [2, B, D]
# recurrent state together. UNLIKE conv/head stacking (cache-bound,
# loses at fleet concurrency — see _MAX_CROPS), the diagonal recurrence
# is numpy-DISPATCH-bound: each step is a few [2, D] elementwise
# vectors (~2 us of work behind ~3 us of dispatch), so batching B crops
# amortizes the dispatch B-fold while the per-step working set stays
# [2, B, D] ~ B * 1.5 KB — L2-resident even at 64. Values are bitwise
# identical to per-crop stepping (elementwise ops only).
_REC_BATCH = int(_os.environ.get("OCR_SPARK_REC_BATCH", "64"))


def _conv2d_valid_batch(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    """x [N, Cin, H, W], k [Cout, Cin, 3, 3] -> [N, Cout, H-2, W-2]:
    the batched twin of ``_conv2d_valid`` (one im2col + one matmul for
    the whole stack; row i*(H-2)(W-2)+j is exactly the single-crop
    path's row j of crop i). Honors OCR_SPARK_CONV=shiftsum for
    Cin > 1 like the single-crop path."""
    n, cin, h, w = x.shape
    cout = k.shape[0]
    if _CONV_IMPL == "shiftsum" and cin > 1:
        out = np.zeros((n, cout, h - 2, w - 2))
        for di in range(3):
            for dj in range(3):
                sl = x[:, :, di : di + h - 2, dj : dj + w - 2]
                # [N, H-2, W-2, Cout] <- [N, Cin, ...] x [Cout, Cin]
                out += np.tensordot(sl, k[:, :, di, dj], axes=([1], [1])).transpose(
                    0, 3, 1, 2
                )
        return out
    # slab im2col, batched (see _conv2d_valid): cols[tap, ci, b, i, j]
    h2, w2 = h - 2, w - 2
    xv = x.transpose(1, 0, 2, 3)  # [Cin, N, H, W] view
    cols = np.empty((9, cin, n, h2, w2))
    for di in range(3):
        for dj in range(3):
            cols[di * 3 + dj] = xv[:, :, di : di + h2, dj : dj + w2]
    kk = k.transpose(0, 2, 3, 1).reshape(cout, 9 * cin)
    out = kk @ cols.reshape(9 * cin, n * h2 * w2)
    # [Cout, N, H2, W2] -> [N, Cout, H2, W2] as a VIEW; downstream
    # strided max-pool and reshape handle the non-contiguity
    return out.reshape(cout, n, h2, w2).transpose(1, 0, 2, 3)


def _maxpool_batch(x: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Strided-view max like ``_maxpool`` (value-identical, no 6-D
    intermediate)."""
    n, c, h, w = x.shape
    h2, w2 = h // ph, w // pw
    v = x[:, :, : h2 * ph, : w2 * pw]
    out = None
    for i in range(ph):
        for j in range(pw):
            s = v[:, :, i::ph, j::pw]
            out = s.copy() if out is None else np.maximum(out, s, out=out)
    return out


def conv_features_batch(imgs: np.ndarray, weights: dict) -> np.ndarray:
    """[N, H, W] same-shaped images -> [N, T, D] timestep features,
    T = sequence_length(W)."""
    # pool-then-relu as in conv_features (exactly identical values)
    x = _maxpool_batch(_conv2d_valid_batch(imgs[:, None, :, :], weights["conv1"]), 2, 2)
    np.maximum(x, 0.0, out=x)
    x = _maxpool_batch(_conv2d_valid_batch(x, weights["conv2"]), 2, 1)
    np.maximum(x, 0.0, out=x)
    n, c, h, t = x.shape
    feats = x.reshape(n, c * h, t).transpose(0, 2, 1)  # [N, T, D]
    want = sequence_length(imgs.shape[2])
    if t >= want:
        return feats[:, :want]
    return np.pad(feats, ((0, 0), (0, want - t), (0, 0)))


def recurrent_mix_batch(
    feats: np.ndarray, wh: np.ndarray, alpha: float = 0.25
) -> np.ndarray:
    """Batched ``recurrent_mix``: the recurrence stays sequential in T
    (it is a real dependency) but advances all N crops per step.
    Elementwise tanh/mul/add — bit-identical to the per-sequence path."""
    n, t, d = feats.shape
    # direction-stacked as in recurrent_mix (bitwise identical):
    # one [2, n, d] state steps both scans per dispatch
    ft = feats.transpose(1, 0, 2)  # [T, N, D] view
    xs = np.empty((t, 2, n, d))
    xs[:, 0] = ft
    xs[:, 1] = ft[::-1]
    out = np.empty((t, 2, n, d))
    buf = np.empty((2, n, d))
    h = np.zeros((2, n, d))
    for i in range(t):
        np.multiply(wh, h, out=buf)
        buf += xs[i]
        h = np.tanh(buf, out=out[i])
    fwd = out[:, 0].transpose(1, 0, 2)       # [N, T, D]
    bwd = out[::-1, 1].transpose(1, 0, 2)
    return feats + alpha * (fwd + bwd)


def _class_probs_batch_stacked(feats: np.ndarray, weights: dict) -> np.ndarray:
    """Stacked-context batch head (pre-shift-sum form) — kept for the
    cold-JVM A/B harness (tools/ab_head.py) and equivalence tests."""
    n, t, d = feats.shape
    r = weights.get("ctx_r", _CTX)
    padded = np.concatenate(
        [np.zeros((n, r, d)), feats, np.zeros((n, r, d))], axis=1
    )
    ctx = np.concatenate(
        [padded[:, i : i + t] for i in range(2 * r + 1)], axis=2
    ).reshape(n * t, (2 * r + 1) * d)
    aug = np.concatenate([ctx, np.ones((len(ctx), 1))], axis=1)
    logits = weights["gain"] * (aug @ weights["cls_w"])
    logits -= logits.max(axis=1, keepdims=True)
    e = np.exp(logits)
    p = e / e.sum(axis=1, keepdims=True)
    return np.round(p, 10).reshape(n, t, -1)


def class_probs_batch(feats: np.ndarray, weights: dict) -> np.ndarray:
    """[N, T, D] -> [N, T, N_CLASSES]: shift-sum classifier head (see
    _head_blocks) with ONE matmul for the whole sub-batch + softmax,
    round(10)-quantized like the single-crop path. Env knob
    OCR_SPARK_HEAD=stacked restores the context-stacked product for
    A/B runs (tools/ab_head.py) — both forms round(10)-identical."""
    if _HEAD_IMPL == "stacked":
        return _class_probs_batch_stacked(feats, weights)
    n, t, d = feats.shape
    r = weights.get("ctx_r", _CTX)
    wcat, bias = _head_blocks(weights)
    c = wcat.shape[1] // (2 * r + 1)
    padded = np.concatenate(
        [np.zeros((n, r, d)), feats, np.zeros((n, r, d))], axis=1
    )
    p = padded.reshape(n * (t + 2 * r), d) @ wcat
    p = p.reshape(n, t + 2 * r, -1)
    acc = np.tile(bias, (n, t, 1))
    for i in range(2 * r + 1):
        acc += p[:, i : i + t, i * c : (i + 1) * c]
    logits = weights["gain"] * acc
    logits -= logits.max(axis=2, keepdims=True)
    e = np.exp(logits)
    p = e / e.sum(axis=2, keepdims=True)
    return np.round(p, 10)


def forward_probs_batch(imgs: list, weights: dict) -> list:
    """Batched ``forward_probs`` over arbitrarily-shaped crops: group
    by image shape (width == label length determines it). The conv
    stack and classifier head run in ``_MAX_CROPS`` sub-batches (they
    are CACHE-bound: stacking them measured 1.7x SLOWER at 32-worker
    fleet concurrency, see the _MAX_CROPS note), while the
    dispatch-bound diagonal recurrence steps one [2, B, D] state across
    up to ``_REC_BATCH`` same-width crops at a time. Per-crop values
    are bitwise identical to the unbatched path (elementwise ops only;
    asserted by test_crnn and the frozen fixtures). Returns per-crop
    [T, N_CLASSES] matrices in input order."""
    out: list = [None] * len(imgs)
    by_shape: dict[tuple, list[int]] = {}
    for i, im in enumerate(imgs):
        by_shape.setdefault(im.shape, []).append(i)
    for idxs in by_shape.values():
        for s in range(0, len(idxs), _REC_BATCH):
            chunk = idxs[s : s + _REC_BATCH]
            parts = [
                conv_features_batch(
                    np.stack([imgs[i] for i in chunk[u : u + _MAX_CROPS]]),
                    weights,
                )
                for u in range(0, len(chunk), _MAX_CROPS)
            ]
            feats = parts[0] if len(parts) == 1 else np.concatenate(parts)
            mixed = recurrent_mix_batch(feats, weights["wh"])
            for u in range(0, len(chunk), _MAX_CROPS):
                sub = chunk[u : u + _MAX_CROPS]
                probs = class_probs_batch(mixed[u : u + len(sub)], weights)
                for j, i in enumerate(sub):
                    out[i] = probs[j]
    return out


# -- weight construction (broadcast payload) --------------------------------

_WEIGHTS_SEED = 20260817


@lru_cache(maxsize=4)
def build_conv_weights(variant: str = "base") -> dict:
    """Deterministic non-identity model weights. conv1/conv2 are
    seeded gaussians, wh is the seeded per-feature recurrent decay;
    the classifier head is fit in closed form
    (ridge regression to one-hot targets) over jittered single-glyph
    renders passed through the SAME conv+recurrence stack — i.e. a
    training-free-at-runtime linear head whose every input genuinely
    flows through every parameter. Frame labels come from a
    self-calibrating norm rule: high-energy frames of a glyph render
    carry the glyph's class, low-energy frames (gaps, margins,
    background) carry the CTC blank — which is exactly what makes the
    decode emit blank between characters.

    ``variant`` selects the conv-stack plan (see conv_features):
    'conv9' adds a 24-channel 3x3 VALID conv (model3.py:56-75),
    'fraction' adds a 96-channel 2x2 VALID conv + height interleave
    (model_fraction2.py:57-86). Variant kernels are drawn AFTER the
    base sequence from the same seeded rng, so the 'base' weights —
    and every frozen fixture derived from them — are byte-identical
    to rounds 1-3."""
    rng = np.random.default_rng(_WEIGHTS_SEED)
    conv1 = rng.normal(0.0, 0.35, size=(8, 1, 3, 3))
    conv2 = rng.normal(0.0, 0.18, size=(16, 8, 3, 3))
    d = 16 * (((IMG_H - 2) // 2 - 2) // 2)  # channels x pooled height
    # per-feature recurrent decay in [0.15, 0.45]: stable (|d| < 1)
    wh = rng.uniform(0.15, 0.45, size=d)
    w = {"conv1": conv1, "conv2": conv2, "wh": wh, "gain": 6.0}
    # time stride of the feature map in pixels of the input column
    # axis; the fraction variant emits PAIRS of frames per column step
    col_of = lambda t: 2.0 * t  # noqa: E731
    if variant == "conv9":
        # 24 ch x (4-high map after the extra trim) keeps D = 96
        w["conv9"] = rng.normal(0.0, 0.22, size=(24, 16, 3, 3))
    elif variant == "fraction":
        # 96 ch, height collapsed to 2 and interleaved into time;
        # frames step HALF a column, so the head's context radius
        # doubles to keep the same column span as the base head
        w["conv9f"] = rng.normal(0.0, 0.25, size=(96, 16, 2, 2))
        w["ctx_r"] = 2 * _CTX
        col_of = lambda t: 2.0 * (t // 2)  # noqa: E731

    # receptive-field calibration: where do a glyph's high-energy
    # frames sit relative to its cell? (offset = glyph center col
    # minus the mean high-energy frame's column)
    cal = render_label("8", seed=_WEIGHTS_SEED)
    cal_feats = recurrent_mix(conv_features(cal, w, variant), wh)
    cal_norms = np.linalg.norm(cal_feats, axis=1)
    hot = np.flatnonzero(cal_norms >= 0.6 * cal_norms.max())
    center_col = _MARGIN + GLYPH_W / 2
    x_off = center_col - np.mean([col_of(t) for t in hot])

    def _harvest(label: str, seed: int, rows: list, labs: list) -> None:
        img = render_label(label, seed=seed)
        feats = recurrent_mix(conv_features(img, w, variant), wh)
        ctx = stack_context(feats, w.get("ctx_r", _CTX))
        norms = np.linalg.norm(feats, axis=1)
        if variant == "fraction" and len(norms) % 2 == 0:
            # the interleaved bottom-row frames carry less energy than
            # their top-row column partners; gating each on its OWN
            # norm teaches blank/class alternation within one glyph
            # (which greedy decode renders as doubled characters) —
            # gate on the column-pair max instead
            pair_max = norms.reshape(-1, 2).max(axis=1)
            norms = np.repeat(pair_max, 2)
        top = max(norms.max(), 1e-6)
        ids = [ALPHABET.index(c) for c in label]
        for t, (f, nn) in enumerate(zip(ctx, norms)):
            x = col_of(t) + x_off  # receptive-field center column
            cell = int((x - _MARGIN) // CELL_W)
            in_glyph = (
                0 <= cell < len(ids)
                and 3 <= (x - _MARGIN - cell * CELL_W) <= GLYPH_W - 5
            )
            if in_glyph and nn >= 0.2 * top and ids[cell] != BLANK_ID:
                rows.append(f)
                labs.append(ids[cell])
            else:
                # margins, gaps, boundary-straddling and low-energy
                # frames all teach the blank: transitions decode clean
                rows.append(f)
                labs.append(BLANK_ID)

    feats_rows: list[np.ndarray] = []
    labels: list[int] = []
    # the interleaved fraction stack doubles per-frame variance (the
    # +-1 px vertical render jitter moves strokes across the two-row
    # height split), so its closed-form head needs a larger harvest
    n_single, n_ctx = (24, 520) if variant == "fraction" else (10, 240)
    for cid in range(N_CLASSES):
        for s in range(n_single):
            _harvest(ALPHABET[cid], _WEIGHTS_SEED + cid * 131 + s, feats_rows, labels)
    # multi-glyph contexts: the recurrence carries cross-cell state and
    # the context stack spans cell boundaries, so the classifier must
    # see glyphs with real neighbors
    ctx_rng = np.random.default_rng(_WEIGHTS_SEED + 999)
    glyph_ids = [i for i in range(N_CLASSES) if i != BLANK_ID]
    for s in range(n_ctx):
        lab = "".join(
            ALPHABET[i] for i in ctx_rng.choice(glyph_ids, size=4)
        )
        _harvest(lab, _WEIGHTS_SEED + 7000 + s, feats_rows, labels)
    f_mat = np.asarray(feats_rows)
    aug = np.concatenate([f_mat, np.ones((len(f_mat), 1))], axis=1)
    y = np.zeros((len(f_mat), N_CLASSES))
    y[np.arange(len(f_mat)), labels] = 1.0
    lam = 1e-3
    cls_w = np.linalg.solve(
        aug.T @ aug + lam * np.eye(aug.shape[1]), aug.T @ y
    )
    w["cls_w"] = cls_w
    return w
