"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): an
``exifscan`` format that reads a directory of images as a TYPED table —
path, size, kind, EXIF GPS coordinates for JPEGs, dimensions +
geotransform origin for GeoTIFFs — using the pure-stdlib TIFF codec
(functions/tiff.py). The Spark-4-native way to expose a bespoke scan
(the reference's per-image Python loop, script_geo.py:166-205) as a
first-class source: the planner asks ``partitions()`` once on the
driver (file list chunked into splits), each split's ``read()`` runs on
an executor, and the scan parallelizes like any other table.

Contrast with ``binaryFile`` + ``mapInPandas`` (sources/binary.py):
that path ships whole blobs through an Arrow exchange before decoding;
this one decodes INSIDE the scan and emits only the typed metadata —
at 100 TB of imagery, the difference between shuffling bytes and
shuffling rows.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EXIFSCAN_SCHEMA = (
    "path string, length bigint, kind string, lat double, lon double, "
    "cols int, rows int, x0 double, y0 double"
)


class _FileSplit(InputPartition):
    def __init__(self, files: list[str]):
        self.files = files


class ExifScanReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        self.num_partitions = int(options.get("numPartitions", "8"))

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.lower().endswith((".jpg", ".jpeg", ".tif", ".tiff"))
        )
        n = max(1, min(self.num_partitions, len(files)))
        return [_FileSplit(files[i::n]) for i in range(n)]

    def read(self, partition: _FileSplit):
        # executor-side: decode inside the scan, emit typed rows only
        from ..functions import tiff as T

        for path in partition.files:
            with open(path, "rb") as fh:
                blob = fh.read()
            if path.lower().endswith((".jpg", ".jpeg")):
                gps = T.parse_exif_gps(blob)
                if gps is not None:
                    yield (path, len(blob), "BR", gps[0], gps[1],
                           None, None, None, None)
                    continue
            else:
                meta = T.parse_tiff_meta(blob)
                if meta is not None:
                    gt, cols, rows = meta
                    yield (path, len(blob), "TIF", None, None,
                           cols, rows, gt[0], gt[3])
                    continue
            yield (path, len(blob), "RAW", None, None, None, None, None, None)


class ExifScanDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "exifscan"

    def schema(self) -> str:
        return EXIFSCAN_SCHEMA

    def reader(self, schema) -> ExifScanReader:
        return ExifScanReader(self.options)


def register_exifscan(spark) -> None:
    """Idempotent registration of the ``exifscan`` format."""
    spark.dataSource.register(ExifScanDataSource)
