"""Multimodal binary columns (SURVEY S1/S7/S8; north-star multimodal ops).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs, read via Spark's ``binaryFile`` source:

    spark.read.format("binaryFile").load(dir)
      → (path, modificationTime, length, content BINARY)

Decode / feature-extract kernels run as Arrow-batched ``mapInPandas``
generators — the Spark-side plumbing (schema, batch shape, partitioning)
is real and tested; the pixel decode itself is STUBBED (no PIL/GDAL in
this container) behind ``_decode_image_stub``, a deterministic fake
derived from the content bytes, exactly where a PIL/gdal call would go.

Reference parity:
- S1 object-store list+fetch (download_list_images.py:17-25) → binaryFile
  scan (the listing, download loop, and temp-dir lifecycle all collapse
  into the source).
- S7 EXIF GPS extract (script_geo.py:170-171) → :func:`extract_exif_gps`.
- S8 raster geotransform read (script_geo.py:175-179) → :func:`extract_raster_meta`.
- P6 type dispatch BR/TIF (script_geo.py:167-175) → expression dispatch on
  extension + decode success, not exception control flow.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "path string, length long, clase string, lat double, lon double, "
    "gt array<double>, cols int, rows int"
)


def read_binary_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """S1: binaryFile scan of an object-store/filesystem directory."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _decode_image_stub(content: bytes, path: str) -> dict:
    """Deterministic fake decode — STAND-IN for PIL/GPSPhoto/GDAL.

    Real implementation: ``gpsphoto.getGPSData`` for JPG EXIF
    (script_geo.py:170) and ``gdal.Open(...).GetGeoTransform()`` for
    GeoTIFF (script_geo.py:176-179). Not installed in this container, so
    metadata is derived from a content digest: same plumbing, stable
    outputs, clearly fake values.
    """
    digest = hashlib.md5(content).digest()

    def frac(i: int) -> float:
        return int.from_bytes(digest[i : i + 4], "big") / 2**32

    is_jpg = path.lower().endswith((".jpg", ".jpeg"))
    if is_jpg:
        return {
            "clase": "BR",
            "lat": -35.0 + 2.0 * frac(0),
            "lon": -72.0 + 2.0 * frac(4),
            "gt": None,
            "cols": None,
            "rows": None,
        }
    return {
        "clase": "TIF",
        "lat": None,
        "lon": None,
        "gt": [200000.0 + 1000 * frac(0), 0.5, 0.0, 6000000.0 + 1000 * frac(4), 0.0, -0.5],
        "cols": 1000 + int(frac(8) * 1000),
        "rows": 1000 + int(frac(12) * 1000),
    }


def extract_image_meta(binary_df: DataFrame) -> DataFrame:
    """S7+S8+P6 as one Arrow-batched mapInPandas pass.

    Emits the ``images`` fixture shape (FIXTURES.md §B): clase dispatch,
    EXIF lat/lon for 'BR', geotransform + dims for 'TIF'.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [
                _decode_image_stub(c, p) for c, p in zip(pdf["content"], pdf["path"])
            ]
            out = pd.DataFrame(metas)
            out.insert(0, "length", pdf["length"].values)
            out.insert(0, "path", pdf["path"].values)
            yield out

    return binary_df.select("path", "length", "content").mapInPandas(
        batches, IMAGE_META_SCHEMA
    )


def content_key(df: DataFrame, content_col: str = "content") -> DataFrame:
    """S12 fixed: TRUE content-addressed key ``md5(content)`` (the reference
    hashes ``os.urandom(32)`` — download_list_images.py:45, §2.11 bug 5)."""
    return df.withColumn("content_key", F.md5(F.col(content_col)))
