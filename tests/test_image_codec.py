"""kernels.image_codec: the real multimodal decode path.

Pure-Python BMP/PNG round-trips (all five PNG scanline filters, both BMP
row orders), malformed-input rejection, and the Spark mapInPandas decode
(`ops.multimodal.decode_image_real`) recovering byte-exact pixel digests
for payloads encoded in a separate Spark pass."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from kgspark.kernels.image_codec import (
    PNG_SIGNATURE,
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
)


def _noise(n: int, seed: int) -> bytes:
    return bytes(random.Random(seed).randrange(256) for _ in range(n))


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (8, 8), (16, 14), (5, 7)])
def test_bmp_roundtrip_both_row_orders(w, h):
    px = _noise(w * h * 3, seed=w * 100 + h)
    assert decode_bmp(encode_bmp(w, h, px)) == (w, h, 3, px)
    assert decode_bmp(encode_bmp(w, h, px, top_down=True)) == (w, h, 3, px)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_channel_counts(channels):
    # height 10 > 5 ⇒ every filter type (y % 5) appears at least twice
    w, h = 7, 10
    px = _noise(w * h * channels, seed=channels)
    assert decode_png(encode_png(w, h, px, channels)) == (w, h, channels, px)


def test_png_each_filter_type_decodes():
    """Hand-build a PNG per filter type (constant f for every row) so a
    filter-specific decode bug can't hide behind the y%5 mix."""
    w, h, ch = 5, 4, 3
    px = _noise(w * h * ch, seed=99)
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    for ftype in range(5):
        raw = bytearray()
        prev = bytes(stride)
        for y in range(h):
            row = px[y * stride:(y + 1) * stride]
            raw.append(ftype)
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                ref = (0, a, b, (a + b) // 2, paeth(a, b, c))[ftype]
                raw.append((row[i] - ref) & 0xFF)
            prev = row

        def chunk(t, payload):
            return (struct.pack(">I", len(payload)) + t + payload
                    + struct.pack(">I", zlib.crc32(t + payload) & 0xFFFFFFFF))

        data = (PNG_SIGNATURE
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))
        assert decode_png(data) == (w, h, ch, px), f"filter {ftype}"


def test_sniffing_and_malformed_rejection():
    px = _noise(4 * 3 * 3, seed=5)
    assert decode_image(encode_bmp(4, 3, px))[0] == "bmp"
    assert decode_image(encode_png(4, 3, px))[0] == "png"
    for bad in (b"", b"BM123", PNG_SIGNATURE + b"\x00" * 10, b"GIF89a\x00\x00"):
        with pytest.raises(ValueError):
            decode_image(bad)
    # corrupt a chunk payload byte → CRC must catch it
    good = bytearray(encode_png(4, 4, bytes(48), 3))
    good[16] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    # truncated BMP pixel data
    bmp = encode_bmp(4, 4, _noise(48, seed=1))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bmp[:-8])


@pytest.mark.parametrize("w,h", [(64, 48), (127, 33), (256, 64)])
def test_bmp_vectorized_matches_scalar(w, h):
    """The numpy decode path (row un-shuffle + BGR flip as strided
    views) is byte-identical to the scalar loop — the scalar path IS
    the oracle (VERDICT r4 item 3)."""
    px = _noise(w * h * 3, seed=w ^ h)
    for td in (False, True):
        data = encode_bmp(w, h, px, top_down=td)
        assert decode_bmp(data, vectorized=True) == \
            decode_bmp(data, vectorized=False) == (w, h, 3, px)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_vectorized_matches_scalar(channels):
    """numpy unfilter (None copy, Up row-add, Sub per-lane cumsum mod
    256; Average/Paeth scalar rows) == the all-scalar decode, for a
    height that cycles every filter type several times."""
    w, h = 61, 23
    px = _noise(w * h * channels, seed=1000 + channels)
    data = encode_png(w, h, px, channels)
    assert decode_png(data, vectorized=True) == \
        decode_png(data, vectorized=False) == (w, h, channels, px)


def test_pixel_digests_vectorized_matches_scalar():
    from kgspark.ops.multimodal import pixel_digests, pixel_digests_scalar

    for seed, n in ((1, 0), (2, 1), (3, 97), (4, 98), (5, 10_000)):
        px = _noise(n, seed)
        assert pixel_digests(px) == pixel_digests_scalar(px)


def test_spark_decode_real_matches_formula(spark):
    """encode (mapInPandas) → decode (mapInPandas) recovers exactly the
    synthesis-formula metadata + position-weighted digest for both
    containers — the pytest twin of the mm_decode_real driver oracle."""
    from pyspark.sql import functions as F

    from kgspark.ops import multimodal

    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    payloads = multimodal.synth_image_payloads(ids, "doc_id")
    got = {r["doc_id"]: r for r in
           multimodal.decode_image_real(payloads).collect()}
    assert len(got) == 40
    for doc_id in range(40):
        w, h, px = multimodal._synth_pixels(doc_id)
        r = got[doc_id]
        assert r["fmt"] == ("bmp" if doc_id % 2 == 0 else "png")
        assert (r["width"], r["height"], r["n_channels"]) == (w, h, 3)
        assert r["n_pixel_bytes"] == len(px)
        assert r["mean_millichannel"] == (sum(px) * 1000) // len(px)
        assert r["pix_weighted"] == sum(
            v * (1 + i % 97) for i, v in enumerate(px))
