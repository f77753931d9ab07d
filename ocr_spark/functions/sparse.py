"""F15 `list_to_sparse` and F16 `image_size_normal` — the two
training-/rendering-time utilities SURVEY §2.8 scoped out of the
extraction graft, implemented for completeness (the only remaining
"no" row is S5, the external HTTP scoring service).

- ``list_to_sparse`` (reference utils.py:235-258): a label batch ->
  TF-SparseTensor triple [index, value, shape]. Quirk preserved: a
  character missing from the vocabulary maps to None, and the
  reference's ``np.array(value, int32)`` then throws and is silently
  swallowed — the returned ``value`` stays a plain Python list in
  that case. The Spark-side twin is the `posexplode` form SURVEY
  prescribes: one row per (x, y, value) nonzero.
- ``image_size_normal`` (reference utils.py:36-48): resize to
  3024x4032 RGB and return the scale factors. Quirk preserved: x_pro
  divides by the true target width 3024 but y_pro divides by 4031
  while the image is resized to 4032 rows. Deterministic
  nearest-neighbor resize (no cv2 in this container — interpolation
  choice is irrelevant to the scale-factor contract the pipeline
  consumes).
"""

from __future__ import annotations

import numpy as np

from ocr_spark.config import ALPHABET

_VOCAB = {c: i for i, c in enumerate(ALPHABET)}

TARGET_W, TARGET_H = 3024, 4032
_Y_PRO_DENOM = 4031  # reference quirk: utils.py:43 divides by 4031


def list_to_sparse(label_list: list[str], vocab: dict | None = None) -> list:
    """[index, value, shape] exactly as reference utils.py:235-258:
    index = int32 [(x, y)] in row order, value = int32 vocab ids
    (or the un-converted Python list when any char misses the vocab —
    the reference's swallowed-exception quirk), shape =
    int32 [batch, max_len]."""
    vocab = _VOCAB if vocab is None else vocab
    index: list[list[int]] = []
    value: list = []
    max_length = 0
    for x, labels in enumerate(label_list):
        if len(labels) > max_length:
            max_length = len(labels)
        for y, char in enumerate(labels):
            index.append([x, y])
            value.append(vocab.get(char))
    shape = np.array([len(label_list), max_length], dtype=np.int32)
    index_arr = np.array(index, dtype=np.int32)
    try:
        value = np.array(value, dtype=np.int32)
    except Exception:  # noqa: BLE001 — the reference swallows it too
        pass
    return [index_arr, value, shape]


def sparse_encode(df, label_col: str, id_col: str):
    """Spark twin of F15: one row per sparse nonzero —
    (x = ``id_col``, y = char position, value = vocab id; -1 for
    out-of-vocabulary, Spark columns being non-None-friendly).
    Pure codegen: posexplode of the char split + a map-literal lookup
    (SURVEY §2.8 F15 row's prescribed `posexplode(split(label,''))`).
    Distributed by construction — no driver-side batch, so at 100 TB
    this is a scan -> generate -> project plan with no shuffle."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    vocab_map = F.create_map(
        *[x for c, i in _VOCAB.items() for x in (F.lit(c), F.lit(i))]
    )
    chars = F.split(F.col(label_col), "").cast("array<string>")
    # split('ab', '') yields a trailing '' element on Spark; filter it
    chars = F.filter(chars, lambda c: c != F.lit(""))
    return (
        df.select(F.col(id_col).alias("x"), F.posexplode(chars).alias("y", "c"))
        .select(
            "x",
            "y",
            F.coalesce(vocab_map[F.col("c")], F.lit(-1)).alias("value"),
        )
    )


def sparse_encode_documents(docs, width: int = 12):
    """Driver-gated form of F15 over the standard documents table:
    label = first ``width`` chars of text, x = doc_id. Columns
    (x, y, value) match the DuckDB oracle in __spark_entry__."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    return sparse_encode(
        docs.select(
            F.col("doc_id"), F.substring("text", 1, width).alias("label")
        ),
        "label",
        "doc_id",
    )


def image_size_normal(img: np.ndarray) -> tuple[np.ndarray, float, float]:
    """Reference utils.py:36-48: resize [H, W, 3] BGR to 3024x4032,
    convert to RGB, return (img, x_pro, y_pro). x_pro = 3024 / W;
    y_pro = 4031 / H (the reference's off-by-one denominator,
    preserved and documented). Nearest-neighbor sampling keeps the
    function a pure deterministic array op."""
    h, w = img.shape[:2]
    x_pro = TARGET_W / w
    y_pro = _Y_PRO_DENOM / h
    rows = np.minimum((np.arange(TARGET_H) * h) // TARGET_H, h - 1).astype(int)
    cols = np.minimum((np.arange(TARGET_W) * w) // TARGET_W, w - 1).astype(int)
    resized = img[rows][:, cols]
    if resized.ndim == 3 and resized.shape[2] == 3:
        resized = resized[:, :, ::-1]  # BGR -> RGB
    return resized, x_pro, y_pro
