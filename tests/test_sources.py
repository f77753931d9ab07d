"""Source operators from SURVEY.md §2.1 that aren't exercised by the
parquet-based driver contract:

- S2: Pascal-VOC-ish detection-XML scan (reference cutdata.py:8-101)
  via Spark's native XML reader, including the polygon-validity filter
  (P10: 4-point polygons accepted, 3-point rejected).
- S4: label-embedded-in-filename scan (reference utils.py:271-284
  ``*_<label>.jpg``) via regexp_extract over input_file_name().
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

VOC_XML = """<annotation>
  <outputs>
    <object>
      <item><name>print</name>
        <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>110</xmax><ymax>60</ymax></bndbox>
      </item>
      <item><name>hand</name>
        <polygon><x1>120</x1><y1>20</y1><x2>180</x2><y2>20</y2>
                 <x3>180</x3><y3>60</y3><x4>120</x4><y4>60</y4></polygon>
      </item>
      <item><name>hand</name>
        <polygon><x1>0</x1><y1>0</y1><x2>5</x2><y2>0</y2>
                 <x3>5</x3><y3>5</y3></polygon>
      </item>
    </object>
  </outputs>
</annotation>
"""


def test_detection_xml_scan(spark, tmp_path):
    xml_dir = tmp_path / "xml"
    xml_dir.mkdir()
    (xml_dir / "00001.xml").write_text(VOC_XML)

    items = (
        spark.read.format("xml")
        .option("rowTag", "item")
        .load(str(xml_dir))
    )
    # bndbox rows -> rects directly
    rects = items.where(F.col("bndbox").isNotNull()).select(
        "name",
        F.col("bndbox.xmin").alias("left"),
        F.col("bndbox.ymin").alias("top"),
        F.col("bndbox.xmax").alias("right"),
        F.col("bndbox.ymax").alias("bottom"),
    )
    # polygon rows -> validity filter (all 4 points present = the
    # reference's "reject 3- or 5-point polygons", cutdata.py:56-101)
    # -> collapse to the bounding rect
    polys = items.where(F.col("polygon").isNotNull())
    valid = polys.where(
        F.col("polygon.x4").isNotNull() & F.col("polygon.y4").isNotNull()
    )
    poly_rects = valid.select(
        "name",
        F.least("polygon.x1", "polygon.x2", "polygon.x3", "polygon.x4").alias("left"),
        F.least("polygon.y1", "polygon.y2", "polygon.y3", "polygon.y4").alias("top"),
        F.greatest("polygon.x1", "polygon.x2", "polygon.x3", "polygon.x4").alias("right"),
        F.greatest("polygon.y1", "polygon.y2", "polygon.y3", "polygon.y4").alias("bottom"),
    )
    got = sorted(
        tuple(r) for r in rects.unionByName(poly_rects).collect()
    )
    assert got == [
        ("hand", 120, 20, 180, 60),
        ("print", 10, 20, 110, 60),
    ]
    assert polys.count() == 2  # the 3-point polygon existed but was filtered


def test_filename_label_scan(spark, tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rows = {"00000_12+3=15.jpg": "a", "00001_9x9=81.jpg": "b"}
    for fname, payload in rows.items():
        (d / fname).write_text(payload)

    df = (
        spark.read.format("binaryFile")
        .load(str(d))
        .select(
            F.regexp_extract(
                F.element_at(F.split(F.input_file_name(), "/"), -1),
                r"^\d+_(.+)\.(jpg|png|JPG)$",
                1,
            ).alias("label")
        )
    )
    assert sorted(r["label"] for r in df.collect()) == ["12+3=15", "9x9=81"]


def test_crop_margin_variants_recipe():
    """F22 margin-expansion recipe (reference inference.py:470-522):
    variant set gated on label length, expansion arithmetic, the
    unclamped negative-start numpy quirk, and the height-keyed resize
    ladder (including the both-over-height second pair)."""
    from ocr_spark.sources.media import crop_margin_variants

    # interior box, short label -> 3 variants, no resizes (h <= 1800)
    variants, resizes = crop_margin_variants(
        (100, 70, 200, 105), "12+3=15", img_h=1080, img_w=1920
    )
    assert [v["variant"] for v in variants] == ["tight", "margin_5", "margin_3"]
    t, m5, m3 = variants
    assert (t["row0"], t["col0"], t["height"], t["width"]) == (70, 100, 36, 101)
    # h=35 -> dv=5; w=100 -> d5=20, d3=33
    assert (m5["row0"], m5["col0"], m5["height"], m5["width"]) == (65, 80, 46, 141)
    assert (m3["row0"], m3["col0"], m3["height"], m3["width"]) == (65, 67, 46, 167)
    assert resizes == []

    # long label (>10 chars) -> margin_3 suppressed
    variants, _ = crop_margin_variants(
        (100, 70, 200, 105), "123+456=579x", img_h=1080, img_w=1920
    )
    assert [v["variant"] for v in variants] == ["tight", "margin_5"]

    # top-edge box: expanded start goes negative -> numpy wraps to
    # img_h-5, past the stop -> EMPTY crop (reference writes a 0-size jpg)
    variants, _ = crop_margin_variants((100, 2, 200, 37), "9", 1080, 1920)
    m5 = variants[1]
    assert m5["row0"] == 1080 - 3 and m5["empty"]

    # resize ladder: >3900 two pairs (second divides BOTH by height);
    # >1800 one pair
    _, r2 = crop_margin_variants((0, 0, 10, 10), "9", 4000, 3000)
    assert r2 == [(1920 / 4000, 1080 / 3000), (854 / 4000, 640 / 4000)]
    _, r1 = crop_margin_variants((0, 0, 10, 10), "9", 2000, 1500)
    assert r1 == [(854 / 2000, 640 / 2000)]
