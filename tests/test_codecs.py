"""Pure-stdlib PNG/WAV codec tests + the oracle-checked decode query.

The PNG roundtrip matrix covers every channel count × every scanline
filter, with random content, so each decoder unfilter path is exercised
against the matching encoder filter (which is its algebraic inverse).
"""

from __future__ import annotations

import numpy as np
import pytest

from mapreduceindex_spark.functions import codecs
from mapreduceindex_spark.operators import multimodal as M
from tests.conftest import SF_SMALL, assert_df_matches_oracle


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip(channels, filter_type):
    rng = np.random.default_rng(channels * 10 + filter_type)
    shape = (13, 17) if channels == 1 else (13, 17, channels)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    data = codecs.png_encode(arr, filter_type=filter_type)
    assert codecs.sniff_media(data) == "png"
    out = codecs.png_decode(data)
    np.testing.assert_array_equal(out, arr)


def test_png_resize_nearest():
    # gradient image: resized pixels must equal source pixels at the
    # nearest-neighbor index map, by construction
    arr = (np.arange(20 * 30 * 3, dtype=np.int64) % 256).astype(np.uint8)
    arr = arr.reshape(20, 30, 3)
    small = codecs.png_decode(codecs.png_resize_nearest(codecs.png_encode(arr), 10, 5))
    assert small.shape == (5, 10, 3)
    ys = (np.arange(5) * 20) // 5
    xs = (np.arange(10) * 30) // 10
    np.testing.assert_array_equal(small, arr[ys][:, xs])


def test_wav_roundtrip():
    rng = np.random.default_rng(7)
    samples = rng.integers(-(2**15), 2**15, size=(441, 2), dtype=np.int16)
    data = codecs.wav_encode(samples, sample_rate=22050)
    assert codecs.sniff_media(data) == "wav"
    meta = codecs.wav_decode(data)
    assert meta["sample_rate"] == 22050
    assert meta["n_channels"] == 2
    assert meta["n_frames"] == 441
    np.testing.assert_array_equal(meta["samples"], samples)


def test_decode_media_dispatch():
    png = codecs.png_encode(np.zeros((3, 5, 3), dtype=np.uint8))
    d = M.decode_media(png)
    assert (d["kind"], d["width"], d["height"], d["channels"]) == ("png", 5, 3, 3)

    wav = codecs.wav_encode(np.zeros((100, 1), dtype=np.int16))
    d = M.decode_media(wav)
    assert (d["kind"], d["width"], d["sample_rate"]) == ("wav", 100, 16000)

    text = b"just some text"
    with pytest.raises(NotImplementedError):
        M.decode_media(text)
    d = M.decode_media(text, fake=True)
    n = len(text)
    assert (d["width"], d["height"]) == (16 + n % 1024, 16 + (n // 7) % 1024)


def test_png_unsupported_variants_raise():
    data = bytearray(codecs.png_encode(np.zeros((4, 4), dtype=np.uint8)))
    # corrupt IHDR bit depth (offset: 8 sig + 8 chunk hdr + 8 w/h)
    data[24] = 16
    with pytest.raises(NotImplementedError):
        codecs.png_decode(bytes(data))
    with pytest.raises(ValueError):
        codecs.png_decode(b"\x00" * 16)


def test_media_decode_png_matches_oracle(spark, duck):
    from mapreduceindex_spark.session import load_table

    df = M.decode_png_dims(load_table(spark, SF_SMALL, "documents"))
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT doc_id,
               (4 + doc_id % 61)::BIGINT AS width,
               (4 + doc_id % 53)::BIGINT AS height,
               3::BIGINT AS channels,
               ((4 + doc_id % 53) * 3 *
                  ((4 + doc_id % 61) * (doc_id % 196)
                   + (4 + doc_id % 61) * (3 + doc_id % 61) // 2)
               )::BIGINT AS px_sum
        FROM documents
        """,
    )


def test_bmp_roundtrip_all_padding_classes_and_orientations():
    """24-bit BMP encode→decode is exact for every scanline-padding class
    (3·w mod 4 ∈ {0,1,2,3}) in both row orders, and grayscale input
    replicates across RGB."""
    rng = np.random.RandomState(11)
    for w in (4, 5, 6, 7):
        for top_down in (False, True):
            arr = rng.randint(0, 256, (5, w, 3)).astype(np.uint8)
            back = codecs.bmp_decode(codecs.bmp_encode(arr, top_down=top_down))
            assert back.shape == (5, w, 3)
            assert (back == arr).all(), (w, top_down)
    gray = rng.randint(0, 256, (4, 6)).astype(np.uint8)
    back = codecs.bmp_decode(codecs.bmp_encode(gray))
    assert all((back[:, :, c] == gray).all() for c in range(3))


def test_bmp_sniff_and_dispatch():
    bmp = codecs.bmp_encode(np.zeros((3, 5), dtype=np.uint8))
    assert codecs.sniff_media(bmp) == "bmp"
    d = M.decode_media(bmp)
    assert (d["kind"], d["width"], d["height"], d["channels"]) == ("bmp", 5, 3, 3)


def test_bmp_sniff_rejects_text_lookalikes():
    """The 2-byte 'BM' magic must not classify text payloads ('BMW…') as
    BMP — ASCII text has no NUL bytes, so the zero reserved words and a
    known biSize are impossible; such payloads fall to the deterministic
    fake instead of crashing media_features on garbage header fields."""
    text = b"BMW motorcycles are manufactured in Berlin " * 4
    assert codecs.sniff_media(text) == "unknown"
    d = M.decode_media(text, fake=True)
    n = len(text)
    assert (d["kind"], d["width"], d["height"]) == (
        "fake", 16 + n % 1024, 16 + (n // 7) % 1024
    )
    # a corrupt REAL container under fake=True degrades to the fake
    # formula rather than poisoning the whole Arrow batch
    broken = bytearray(codecs.bmp_encode(np.zeros((4, 4), dtype=np.uint8)))
    broken[28] = 32  # biBitCount -> unsupported
    d = M.decode_media(bytes(broken), fake=True)
    assert d["kind"] == "fake"
    # ...but still raises when fake=False (a real decode pipeline must
    # surface corruption, not invent dimensions)
    with pytest.raises(NotImplementedError):
        M.decode_media(bytes(broken), fake=False)


def test_bmp_unsupported_variants_raise():
    data = bytearray(codecs.bmp_encode(np.zeros((4, 4), dtype=np.uint8)))
    data[28] = 32  # biBitCount -> 32
    with pytest.raises(NotImplementedError):
        codecs.bmp_decode(bytes(data))
    data = bytearray(codecs.bmp_encode(np.zeros((4, 4), dtype=np.uint8)))
    data[30] = 1  # biCompression -> BI_RLE8
    with pytest.raises(NotImplementedError):
        codecs.bmp_decode(bytes(data))
    with pytest.raises(ValueError):
        codecs.bmp_decode(b"\x00" * 64)
    truncated = codecs.bmp_encode(np.zeros((8, 8), dtype=np.uint8))[:-16]
    with pytest.raises(ValueError):
        codecs.bmp_decode(truncated)


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def _tiny_gif(interlaced: bool = False) -> bytes:
    """A HAND-PACKED 3x1 GIF (indices [1, 2, 2], 4-color global table)
    with the LZW bitstream laid out by hand — the decoder pin is
    independent of our own encoder, so complementary encode/decode bugs
    can't hide each other. Codes: CLEAR(4)@3b, 1@3b, 2@3b, 2@3b,
    END(5)@4b (the table hits 2^3 after the third literal, so END is
    read at the widened 4-bit width) -> payload bytes 0x8C 0x54."""
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 3, 1, 0x81, 0, 0)  # GCT, 4 entries
    out += bytes(
        [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    )
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, 3, 1, 0x40 if interlaced else 0
    )
    out += bytes([2])  # LZW min code size
    out += bytes([2, 0x8C, 0x54, 0])  # one 2-byte sub-block + terminator
    out += b"\x3b"
    return bytes(out)


def test_gif_decode_hand_packed_palette():
    """Palette handling pinned on hand-laid bytes: indices [1, 2, 2]
    must come back as the TABLE's RGB rows, not as raw indices."""
    arr = codecs.gif_decode(_tiny_gif())
    assert arr.shape == (1, 3, 3)
    assert arr.tolist() == [[[40, 50, 60], [70, 80, 90], [70, 80, 90]]]


def test_gif_interlaced_rejected():
    with pytest.raises(NotImplementedError):
        codecs.gif_decode(_tiny_gif(interlaced=True))


def test_gif_roundtrip_exercises_width_growth_and_clear():
    """A 300x300 gradient forces the LZW table through every width
    3->12 and past 4096 entries (encoder emits CLEAR, decoder rebuilds);
    the round trip must be lossless through the full palette."""
    idx = (np.add.outer(np.arange(300), np.arange(300)) % 251).astype(
        np.uint8
    )
    pal = np.stack(
        [np.arange(256), (2 * np.arange(256)) % 256, 255 - np.arange(256)],
        axis=1,
    ).astype(np.uint8)
    dec = codecs.gif_decode(codecs.gif_encode(idx, pal))
    assert (dec == pal[idx]).all()


def test_gif_malformed_raise():
    with pytest.raises(ValueError):
        codecs.gif_decode(b"NOTAGIF" + b"\x00" * 20)
    # palette index beyond the color table must not silently wrap
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    data = bytearray(codecs.gif_encode(np.array([[1, 1]], np.uint8), pal2))
    with pytest.raises(ValueError):
        codecs.gif_encode(np.array([[2]], np.uint8), pal2)
    # truncated pixel data
    good = codecs.gif_encode(
        np.arange(64, dtype=np.uint8).reshape(8, 8),
        np.zeros((64, 3), np.uint8) + 7,
    )
    # chop the data sub-blocks: keep header+palette+descriptor+mincode,
    # then an empty sub-block chain
    head_len = 6 + 7 + 3 * 64 + 10 + 1
    with pytest.raises(ValueError):
        codecs.gif_decode(good[:head_len] + b"\x00\x3b")


def test_sniff_gif():
    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    data = codecs.gif_encode(np.array([[0, 1]], np.uint8), pal)
    assert codecs.sniff_media(data) == "gif"
    assert M.decode_media(data)["kind"] == "gif"
    assert M.decode_media(data)["width"] == 2
