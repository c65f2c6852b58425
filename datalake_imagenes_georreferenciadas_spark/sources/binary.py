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


# ---- north-star multimodal kernels (resize / frame-sample) --------------
#
# Real decoders (PIL/ffmpeg) aren't in this container; the *Spark-side
# contract* — Arrow batch shape, output schema, partition-parallel map — is
# the engine surface. Each stub derives deterministic output from the bytes
# so tests can assert end-to-end through mapInPandas.

RESIZE_SCHEMA = "path string, width int, height int, thumb binary"


def resize_images(binary_df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas kernel.

    STUB decode: real body is ``PIL.Image.open(io.BytesIO(b)).resize(...)``;
    here the "thumbnail" is a deterministic byte slice so plumbing (batch
    iteration, binary-in/binary-out, schema) is fully exercised.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            thumbs = [
                hashlib.md5(bytes(b)).digest() * ((width * height) // 16 + 1)
                for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "width": width,
                    "height": height,
                    "thumb": [t[: width * height] for t in thumbs],
                }
            )

    return binary_df.select("path", "content").mapInPandas(batches, RESIZE_SCHEMA)


EXTRACT_SCHEMA = "archive string, member string, size long, content binary"


def extract_archives(binary_df: DataFrame) -> DataFrame:
    """S2: archive extract as a one-to-many mapInPandas kernel — the
    reference's ``extract_files`` unzip-then-delete loop
    (download_list_images.py:27-30) without ever touching local disk:
    zip bytes in, one row per member out. REAL implementation (stdlib
    zipfile); non-zip inputs yield zero rows rather than failing the task.
    """
    import io
    import zipfile

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            archives, members, sizes, contents = [], [], [], []
            for p, b in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(bytes(b)))
                except zipfile.BadZipFile:
                    continue
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    archives.append(p)
                    members.append(info.filename)
                    sizes.append(info.file_size)
                    contents.append(zf.read(info))
            yield pd.DataFrame(
                {"archive": archives, "member": members, "size": sizes, "content": contents}
            )

    return binary_df.select("path", "content").mapInPandas(batches, EXTRACT_SCHEMA)


FRAME_SCHEMA = "path string, frame_idx int, frame_key string"


def sample_frames(binary_df: DataFrame, every_n: int = 10, max_frames: int = 5) -> DataFrame:
    """Video frame sampling as a one-to-many mapInPandas kernel.

    STUB decode: real body seeks an ffmpeg/PyAV demuxer; here each "frame"
    is keyed by a digest chain so the row-expansion contract (one binary →
    N frame rows) is exercised and deterministic.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            paths, idxs, keys = [], [], []
            for p, b in zip(pdf["path"], pdf["content"]):
                d = hashlib.md5(bytes(b)).hexdigest()
                for i in range(max_frames):
                    paths.append(p)
                    idxs.append(i * every_n)
                    keys.append(hashlib.md5(f"{d}:{i * every_n}".encode()).hexdigest())
            yield pd.DataFrame({"path": paths, "frame_idx": idxs, "frame_key": keys})

    return binary_df.select("path", "content").mapInPandas(batches, FRAME_SCHEMA)
