"""Unit + property tests for the pure-stdlib TIFF/EXIF/GeoTIFF codec
(functions/tiff.py) — the real byte-level S7/S8 metadata kernels."""

from __future__ import annotations

import struct
import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datalake_imagenes_georreferenciadas_spark.functions import tiff as T


def test_jpeg_exif_gps_roundtrip_exact():
    b = T.write_jpeg_exif_gps((33, 27, 1234, 100), (70, 40, 5678, 100), True, True)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    lat, lon = T.parse_exif_gps(b)
    assert lat == -(33 + 27 / 60.0 + (1234 / 100) / 3600.0)
    assert lon == -(70 + 40 / 60.0 + (5678 / 100) / 3600.0)


def test_jpeg_exif_gps_north_east_positive():
    b = T.write_jpeg_exif_gps((1, 2, 300, 100), (4, 5, 600, 100), False, False)
    lat, lon = T.parse_exif_gps(b)
    assert lat > 0 and lon > 0


def test_geotiff_roundtrip_exact():
    g = T.write_geotiff(1024, 768, 350000.25, 6300000.75, 0.5, 0.25)
    gt, cols, rows = T.parse_tiff_meta(g)
    assert (cols, rows) == (1024, 768)
    assert gt == [350000.25, 0.5, 0.0, 6300000.75, 0.0, -0.25]


def test_big_endian_tiff_parses():
    # hand-build an MM (big-endian) TIFF with the same tags: parsers
    # must honor the byte-order mark, not assume II
    def ifd_be(entries, base):
        entries = sorted(entries)
        head = struct.pack(">H", len(entries))
        tail_off = base + 2 + 12 * len(entries) + 4
        body, tail = b"", b""
        for tag, typ, count, value in entries:
            if isinstance(value, int):
                field = struct.pack(">I", value)
            elif len(value) <= 4:
                field = value.ljust(4, b"\x00")
            else:
                field = struct.pack(">I", tail_off + len(tail))
                tail += value
            body += struct.pack(">HHI", tag, typ, count) + field
        return head + body + struct.pack(">I", 0) + tail

    scale = struct.pack(">3d", 2.0, 4.0, 0.0)
    tie = struct.pack(">6d", 0.0, 0.0, 0.0, 100.0, 900.0, 0.0)
    ifd = ifd_be(
        [(256, 4, 1, 64), (257, 4, 1, 32), (33550, 12, 3, scale), (33922, 12, 6, tie)],
        base=8,
    )
    data = b"MM" + struct.pack(">HI", 42, 8) + ifd
    gt, cols, rows = T.parse_tiff_meta(data)
    assert (cols, rows) == (64, 32)
    assert gt == [100.0, 2.0, 0.0, 900.0, 0.0, -4.0]


def test_non_image_bytes_return_none():
    for blob in (b"", b"hello world", b"\xff\xd8\xff\xd9", b"II whatever"):
        assert T.parse_exif_gps(blob) is None
        assert T.parse_tiff_meta(blob) is None


@settings(max_examples=50, deadline=None)
@given(
    d=st.integers(0, 89),
    m=st.integers(0, 59),
    sn=st.integers(0, 5999),
    south=st.booleans(),
    west=st.booleans(),
)
def test_exif_gps_roundtrip_property(d, m, sn, south, west):
    b = T.write_jpeg_exif_gps((d, m, sn, 100), (d, m, sn, 100), south, west)
    lat, lon = T.parse_exif_gps(b)
    mag = d + m / 60.0 + (sn / 100) / 3600.0
    assert lat == (-mag if south else mag)
    assert lon == (-mag if west else mag)


@settings(max_examples=50, deadline=None)
@given(data=st.binary(max_size=300), cut=st.integers(0, 300))
def test_parsers_never_raise_on_garbage_or_truncation(data, cut):
    # corrupt blobs must degrade to None (the mapInPandas kernel relies
    # on this to fall through to the digest stub, never fail the task)
    g = T.write_geotiff(16, 16, 1.0, 2.0, 0.5, 0.5)
    j = T.write_jpeg_exif_gps((1, 2, 3, 100), (4, 5, 6, 100), False, False)
    for blob in (data, g[: cut % (len(g) + 1)], j[: cut % (len(j) + 1)], data + g):
        T.parse_exif_gps(blob)
        T.parse_tiff_meta(blob)
