"""F15 list_to_sparse / F16 image_size_normal (functions/sparse.py)
vs the reference's observable behavior (utils.py:235-258, 36-48),
including both quirks."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.config import ALPHABET
from ocr_spark.functions.sparse import (
    TARGET_H,
    TARGET_W,
    image_size_normal,
    list_to_sparse,
    sparse_encode,
)


def test_list_to_sparse_triple():
    labels = ["12+3=15", "7", "", "9×9=81"]
    index, value, shape = list_to_sparse(labels)
    assert shape.tolist() == [4, 7]  # [batch, max_len]
    assert shape.dtype == np.int32
    # row-order (x, y) pairs; empty label contributes nothing
    assert index.tolist()[:3] == [[0, 0], [0, 1], [0, 2]]
    assert [xy for xy in index.tolist() if xy[0] == 2] == []
    assert isinstance(value, np.ndarray) and value.dtype == np.int32
    # values are vocabulary ids
    assert value[0] == ALPHABET.index("1")
    assert value[7] == ALPHABET.index("7")


def test_list_to_sparse_missing_char_quirk():
    """A char outside the vocab maps to None and the int32 conversion
    fails — the reference swallows the exception and returns the raw
    list (utils.py:252-256)."""
    index, value, shape = list_to_sparse(["1Z2"])
    assert isinstance(value, list)  # NOT converted
    assert value[1] is None
    assert shape.tolist() == [1, 3]


def test_image_size_normal_quirk_and_shape():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(100, 200, 3)).astype(np.uint8)
    out, x_pro, y_pro = image_size_normal(img)
    assert out.shape == (TARGET_H, TARGET_W, 3)
    assert x_pro == 3024 / 200
    assert y_pro == 4031 / 100  # the 4031-vs-4032 reference quirk
    # BGR -> RGB: channel order reversed (check one known pixel)
    assert out[0, 0, 0] == img[0, 0, 2] and out[0, 0, 2] == img[0, 0, 0]


@pytest.mark.usefixtures("spark")
def test_sparse_encode_matches_kernel(spark):
    """The distributed posexplode form agrees with the reference
    kernel on every in-vocab nonzero (same (x, y, value) set)."""
    labels = ["12+3=15", "7", "", "9×9=81", "100÷7=14~2"]
    df = spark.createDataFrame(
        [(i, lab) for i, lab in enumerate(labels)], "x INT, label STRING"
    )
    rows = sorted(
        tuple(r) for r in sparse_encode(df, "label", "x").collect()
    )
    index, value, _ = list_to_sparse(labels)
    expect = sorted(
        (int(x), int(y), int(v)) for (x, y), v in zip(index.tolist(), value)
    )
    assert rows == expect
