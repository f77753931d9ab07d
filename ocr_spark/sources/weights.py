"""Model weights for the recognition stage — the broadcast surface.

The reference restores two TF checkpoints once per process and reuses
the sessions for every image (pipline.py:319-378; graph/session reuse
pipline.py:895, 935). The Spark equivalent implemented here:
``extract()`` broadcasts this weights dict ONCE per job
(``sc.broadcast``), and each python worker fetches it once and reuses
it for every Arrow batch — never a per-task (much less per-row)
reload.

Since round 2 the dict carries REAL model parameters consumed by an
actual forward pass (ocr_spark.functions.crnn):

- ``conv1`` / ``conv2`` — the 3x3 conv filter banks (reference
  model.py:93-150's conv stack);
- ``wh`` — the per-feature decay of the residual bidirectional tanh
  recurrence (diagonal/LRU-style gate; the BiLSTM stand-in,
  model.py:152-175);
- ``cls_w`` / ``gain`` — the context-stacked linear classifier head
  (fit in closed form at weight-construction time on the DRIVER;
  workers only ever receive the finished arrays via the broadcast);
- ``projection`` — the class-projection matrix applied to every CTC
  probability matrix before decoding: the reference projects 165-class
  logits down to the 21-class arithmetic alphabet via the NUM_SIGN
  index list (pipline.py:684-685, config.py:46). Our recognizer
  already emits 21 classes, so the default projection is the identity
  on that alphabet — but the matrix genuinely multiplies into the
  batch (tests prove a permuted projection permutes the decoded text).
- ``alphabet`` / ``blank_id`` / ``beam_k`` — decode-table constants
  (reference config.py:46-48, pipline.py:31-84).

At production scale this dict is tens-to-hundreds of MB of conv/LSTM
parameters; the lifecycle (build/restore once on the driver, broadcast
once, fetch per worker) is identical.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ocr_spark.config import ALPHABET, BEAM_K, BLANK_ID, N_CLASSES


@lru_cache(maxsize=1)
def _base_weights() -> dict:
    from ocr_spark.functions.crnn import build_conv_weights  # noqa: PLC0415

    w = dict(build_conv_weights())
    w.update(
        {
            "alphabet": ALPHABET,
            "blank_id": BLANK_ID,
            "beam_k": BEAM_K,
            "projection": np.eye(N_CLASSES, dtype=np.float64),
        }
    )
    return w


def default_weights() -> dict:
    """Fresh shallow copy per call (the heavy arrays are shared;
    callers may swap entries — e.g. a different projection — without
    polluting the cached base)."""
    return dict(_base_weights())


def project_probs(mat: np.ndarray, weights: dict | None) -> np.ndarray:
    """Apply the class projection (M7) to a [T, C] probability matrix."""
    if weights is None:
        return mat
    return mat @ weights["projection"]
