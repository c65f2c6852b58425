"""7z container codec: pure-stdlib reader/writer (sources/sevenzip.py)
and its integration with the S2 archive-extract kernel.

Reference parity: download_list_images.py:27-30 extracts landing-bucket
archives via patoolib, which covers .7z through external tools; here the
container format itself is implemented over stdlib lzma/bz2/zlib.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from datalake_imagenes_georreferenciadas_spark.sources.sevenzip import (
    Bad7z,
    Unsupported7z,
    read_7z,
    write_7z,
)

MEMBERS = [
    ("docs/alpha.txt", b"alpha alpha alpha " * 40),
    ("beta.bin", bytes(range(256)) * 17),
    ("empty.txt", b""),
    ("gamma/delta.csv", b"k,v\n1,2\n" * 99),
]


@pytest.mark.parametrize("codec", ["copy", "lzma1", "lzma2", "bzip2", "deflate"])
def test_roundtrip_all_codecs(codec):
    arc = write_7z(MEMBERS, codec=codec)
    assert arc[:6] == b"7z\xbc\xaf\x27\x1c"
    assert read_7z(arc) == MEMBERS


def test_solid_substream_split_is_exact():
    # two members whose concatenation is ambiguous without the
    # substream-size table: identical bytes, different lengths
    members = [("a", b"z" * 100), ("b", b"z" * 7)]
    got = read_7z(write_7z(members, codec="lzma2"))
    assert got == members


def test_empty_archive_and_all_empty_members():
    assert read_7z(write_7z([], codec="copy")) == []
    members = [("a.txt", b""), ("b.txt", b"")]
    assert read_7z(write_7z(members, codec="lzma2")) == members


def test_unicode_member_names():
    members = [("ñandú/imágen_01.jpg", b"\xff\xd8jpeg"), ("中文.txt", b"ok")]
    assert read_7z(write_7z(members)) == members


def test_substream_crc_verified():
    arc = bytearray(write_7z([("a", b"payload-bytes")], codec="copy"))
    # flip a payload byte (pack area starts at offset 32), then restore
    # the start-header so only the substream CRC can catch it
    arc[32] ^= 0xFF
    with pytest.raises(Bad7z):
        read_7z(bytes(arc))


def test_header_crc_verified():
    arc = bytearray(write_7z(MEMBERS))
    arc[-1] ^= 0xFF  # header lives at the tail
    with pytest.raises(Bad7z):
        read_7z(bytes(arc))


def test_not_an_archive():
    with pytest.raises(Bad7z):
        read_7z(b"Rar!\x1a\x07\x00 proprietary")


def test_unsupported_coder_is_distinguishable():
    # hand-patch the folder's coder id to AES-256 (0x06F10701): a VALID
    # archive using a coder outside the stdlib set must raise
    # Unsupported7z (→ skipped_reason channel), not Bad7z
    arc = bytearray(write_7z([("a", b"x" * 50)], codec="copy"))
    idx = arc.rindex(bytes([1, 1, 0x00]))  # numCoders=1, flags=1, id=Copy
    patched = arc[:idx] + bytes([1, 4]) + b"\x06\xf1\x07\x01" + arc[idx + 3 :]
    # recompute next-header size/CRC in the start header
    header_len = len(patched) - (len(arc) - len(b"")) + 0  # recompute below
    # header occupies the tail: find its start from the start-header fields
    nh_off = struct.unpack("<Q", bytes(arc[12:20]))[0]
    new_header = bytes(patched[32 + nh_off :])
    start = struct.pack("<QQI", nh_off, len(new_header), zlib.crc32(new_header))
    rebuilt = bytes(patched[:8]) + struct.pack("<I", zlib.crc32(start)) + start + bytes(
        patched[32:]
    )
    with pytest.raises(Unsupported7z):
        read_7z(rebuilt)


def test_encoded_header_archive():
    """Real `7z a` compresses the header by default (kEncodedHeader):
    rebuild a written archive with an LZMA2-compressed header and a
    pointer block describing it — the reader must decode the header
    folder first, then parse it as a normal kHeader."""
    import lzma

    from datalake_imagenes_georreferenciadas_spark.sources import sevenzip as SZ

    members = [("a.txt", b"alpha " * 50), ("b.txt", b"beta")]
    arc = SZ.write_7z(members, codec="lzma2")
    nh_off, nh_size = struct.unpack("<QQ", arc[12:28])
    header = arc[32 + nh_off : 32 + nh_off + nh_size]
    packed_area = arc[32 : 32 + nh_off]

    comp = lzma.LZMACompressor(
        format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 20, "preset": 6}],
    )
    chdr = comp.compress(header) + comp.flush()

    n = SZ._write_number
    desc = bytearray()
    desc += n(SZ.K_ENCODED_HEADER)
    desc += n(SZ.K_PACK_INFO) + n(len(packed_area)) + n(1)
    desc += n(SZ.K_SIZE) + n(len(chdr)) + n(SZ.K_END)
    desc += n(SZ.K_UNPACK_INFO)
    desc += n(SZ.K_FOLDER) + n(1) + b"\x00"
    desc += bytes([1, 1 | 0x20]) + SZ.CODEC_LZMA2 + n(1) + bytes([16])
    desc += n(SZ.K_CODERS_UNPACK_SIZE) + n(len(header))
    desc += n(SZ.K_END) + n(SZ.K_END)
    desc = bytes(desc)

    body = packed_area + chdr
    start = struct.pack("<QQI", len(body), len(desc), zlib.crc32(desc))
    rebuilt = (
        SZ.SIGNATURE
        + b"\x00\x04"
        + struct.pack("<I", zlib.crc32(start))
        + start
        + body
        + desc
    )
    assert SZ.read_7z(rebuilt) == members


def test_multi_coder_bindpair_chain():
    """Two-coder folder (LZMA2 → Delta) wired through a bind pair — the
    filter-chain shape real 7z uses for executables (BCJ+LZMA). The
    payload is delta-ENCODED then compressed; the reader must decode
    LZMA2 first, route its output through the bind pair into the Delta
    decoder, and return the original bytes."""
    import lzma

    from datalake_imagenes_georreferenciadas_spark.sources import sevenzip as SZ

    payload = bytes((i * 7 + (i // 5)) & 0xFF for i in range(4096))
    dist = 4
    # delta ENCODE (decoder inverts): d[i] = p[i] - p[i-dist]
    enc = bytearray(payload)
    for i in range(len(enc) - 1, dist - 1, -1):
        enc[i] = (enc[i] - enc[i - dist]) & 0xFF
    comp = lzma.LZMACompressor(
        format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 20, "preset": 6}],
    )
    packed = comp.compress(bytes(enc)) + comp.flush()

    n = SZ._write_number
    hdr = bytearray()
    hdr += n(SZ.K_HEADER)
    hdr += n(SZ.K_MAIN_STREAMS_INFO)
    hdr += n(SZ.K_PACK_INFO) + n(0) + n(1)
    hdr += n(SZ.K_SIZE) + n(len(packed)) + n(SZ.K_END)
    hdr += n(SZ.K_UNPACK_INFO)
    hdr += n(SZ.K_FOLDER) + n(1) + b"\x00"
    hdr += n(2)  # two coders
    hdr += bytes([1 | 0x20]) + SZ.CODEC_LZMA2 + n(1) + bytes([16])
    hdr += bytes([1 | 0x20]) + SZ.CODEC_DELTA + n(1) + bytes([dist - 1])
    hdr += n(1) + n(0)  # bind pair: delta's in-stream 1 <- lzma2's out 0
    hdr += n(SZ.K_CODERS_UNPACK_SIZE) + n(len(payload)) + n(len(payload))
    hdr += n(SZ.K_END)
    hdr += n(SZ.K_SUBSTREAMS_INFO)
    hdr += n(SZ.K_CRC) + b"\x01" + struct.pack("<I", zlib.crc32(payload))
    hdr += n(SZ.K_END)
    hdr += n(SZ.K_END)
    hdr += n(SZ.K_FILES_INFO) + n(1)
    name = b"\x00" + "chained.bin\x00".encode("utf-16-le")
    hdr += n(SZ.K_NAME) + n(len(name)) + name
    hdr += n(SZ.K_END) + n(SZ.K_END)
    hdr = bytes(hdr)

    start = struct.pack("<QQI", len(packed), len(hdr), zlib.crc32(hdr))
    arc = (
        SZ.SIGNATURE
        + b"\x00\x04"
        + struct.pack("<I", zlib.crc32(start))
        + start
        + packed
        + hdr
    )
    assert SZ.read_7z(arc) == [("chained.bin", payload)]


def test_kernel_extracts_7z_alongside_zip(spark):
    import io
    import zipfile

    from datalake_imagenes_georreferenciadas_spark.sources.binary import extract_archives

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("z.txt", b"zip-side")
    arc7 = write_7z([("s.txt", b"seven-side"), ("t.txt", b"tee")], codec="lzma2")
    raw = spark.createDataFrame(
        [
            ("landing/a.zip", bytearray(zbuf.getvalue())),
            ("landing/b.7z", bytearray(arc7)),
            ("landing/c.rar", bytearray(b"Rar!\x1a\x07\x00 still proprietary")),
        ],
        "path string, content binary",
    )
    rows = extract_archives(raw).collect()
    got = {
        r["member"]: bytes(r["content"])
        for r in rows
        if r["skipped_reason"] is None
    }
    assert got == {"z.txt": b"zip-side", "s.txt": b"seven-side", "t.txt": b"tee"}
    skipped = [r["archive"] for r in rows if r["skipped_reason"] is not None]
    assert skipped == ["file:/landing/c.rar"] or skipped == ["landing/c.rar"]
