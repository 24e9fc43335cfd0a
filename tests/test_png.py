"""PNG codec correctness (functions/multimodal.py): the decoder's five
inverse scanline filters are validated against FORWARD filters
implemented here independently from the RFC 2083 §6 formulas -- an
encode-side/decode-side cross-check, not a self-inverse tautology --
plus round-trips through our own filter-0 encoder, CRC tamper
detection, and the unsupported-profile seam."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from tsfeatures_ray.functions.multimodal import (
    decode_image,
    decode_png,
    encode_png,
)


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Independent PNG writer applying the RFC 2083 FORWARD filters:
    Sub  f(x) = raw(x) - raw(x-bpp)
    Up   f(x) = raw(x) - prior(x)
    Avg  f(x) = raw(x) - floor((raw(x-bpp) + prior(x)) / 2)
    Paeth f(x) = raw(x) - PaethPredictor(raw(x-bpp), prior(x),
                                         prior(x-bpp))
    (all mod 256; out-of-scan references are 0)."""
    h, w, channels = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[channels]
    bpp = channels
    stride = w * channels
    flat = img.reshape(h, stride).astype(np.int64)
    rows = []
    prior = np.zeros(stride, np.int64)
    for y in range(h):
        raw = flat[y]
        f = filters[y % len(filters)]
        left = np.concatenate([np.zeros(bpp, np.int64), raw[:-bpp]])
        pl = np.concatenate([np.zeros(bpp, np.int64), prior[:-bpp]])
        if f == 0:
            enc = raw
        elif f == 1:
            enc = raw - left
        elif f == 2:
            enc = raw - prior
        elif f == 3:
            enc = raw - (left + prior) // 2
        else:  # Paeth
            p = left + prior - pl
            pa_, pb_, pc_ = np.abs(p - left), np.abs(p - prior), np.abs(p - pl)
            pred = np.where(
                (pa_ <= pb_) & (pa_ <= pc_), left,
                np.where(pb_ <= pc_, prior, pl),
            )
            enc = raw - pred
        rows.append(bytes([f]) + (enc % 256).astype(np.uint8).tobytes())
        prior = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_inverse_filters_match_spec_forward(channels, filters):
    rng = np.random.RandomState(channels * 10 + filters[0])
    img = rng.randint(0, 256, size=(11, 7, channels)).astype(np.uint8)
    payload = _png_with_filters(img, filters)
    got = decode_png(payload)
    assert got.shape == img.shape
    assert np.array_equal(got, img)


def test_png_encoder_roundtrip_and_dispatch():
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 256, size=(20, 33, 3)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    gray = rng.randint(0, 256, size=(9, 5)).astype(np.uint8)
    g = decode_png(encode_png(gray))
    assert g.shape == (9, 5, 1) and np.array_equal(g[:, :, 0], gray)
    rgba = rng.randint(0, 256, size=(6, 6, 4)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)
    # decode_image normalizes to HxWx3 for the feature kernels
    assert decode_image(encode_png(gray)).shape == (9, 5, 3)
    assert decode_image(encode_png(rgba)).shape == (6, 6, 3)


def test_png_crc_tamper_detected():
    img = np.zeros((4, 4, 3), np.uint8)
    payload = bytearray(encode_png(img))
    payload[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def _png(w, h, depth, ctype, rows: bytes, interlace=0, plte=None, trns=None):
    """Independent minimal PNG writer for full-profile decode tests."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", zlib.compress(rows)) + _chunk(b"IEND", b"")


def _pack_rows(samples: np.ndarray, depth: int) -> bytes:
    """(h, w, c) integer samples -> filter-0 scanlines at any legal bit
    depth (MSB-first packing, rows zero-padded to byte boundaries)."""
    h = samples.shape[0]
    rows = []
    for y in range(h):
        flat = samples[y].reshape(-1)
        if depth == 8:
            b = flat.astype(np.uint8).tobytes()
        elif depth == 16:
            b = flat.astype(">u2").tobytes()
        else:
            bits = (
                (flat[:, None] >> np.arange(depth - 1, -1, -1)) & 1
            ).astype(np.uint8).reshape(-1)
            b = np.packbits(bits).tobytes()
        rows.append(b"\x00" + b)
    return b"".join(rows)


def test_png_16bit_reduces_to_high_byte():
    rng = np.random.RandomState(7)
    s = rng.randint(0, 65536, size=(9, 5, 3))
    got = decode_png(_png(5, 9, 16, 2, _pack_rows(s, 16)))
    assert np.array_equal(got, (s >> 8).astype(np.uint8))
    g = rng.randint(0, 65536, size=(4, 6, 1))
    got_g = decode_png(_png(6, 4, 16, 0, _pack_rows(g, 16)))
    assert np.array_equal(got_g, (g >> 8).astype(np.uint8))


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_png_palette(depth):
    rng = np.random.RandomState(depth)
    ncol = 1 << depth
    plte = rng.randint(0, 256, size=(ncol, 3)).astype(np.uint8)
    idx = rng.randint(0, ncol, size=(7, 9, 1))
    payload = _png(9, 7, depth, 3, _pack_rows(idx, depth),
                   plte=plte.tobytes())
    got = decode_png(payload)
    assert np.array_equal(got, plte[idx[:, :, 0]])
    # tRNS adds a palette alpha channel (entries past tRNS are opaque)
    trns = bytes([0, 255] + [128] * max(0, min(ncol, 4) - 2))
    got_a = decode_png(_png(9, 7, depth, 3, _pack_rows(idx, depth),
                            plte=plte.tobytes(), trns=trns))
    assert got_a.shape == (7, 9, 4)
    alpha = np.full(ncol, 255, np.uint8)
    alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
    assert np.array_equal(got_a[:, :, 3], alpha[idx[:, :, 0]])


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_gray_scales_to_full_range(depth):
    rng = np.random.RandomState(depth)
    s = rng.randint(0, 1 << depth, size=(5, 11, 1))
    got = decode_png(_png(11, 5, depth, 0, _pack_rows(s, depth)))
    assert np.array_equal(got, (s * 255 // ((1 << depth) - 1)).astype(np.uint8))


def test_png_gray_alpha():
    rng = np.random.RandomState(3)
    s = rng.randint(0, 256, size=(6, 4, 2))
    got = decode_png(_png(4, 6, 8, 4, _pack_rows(s, 8)))
    assert np.array_equal(got, s.astype(np.uint8))
    assert decode_image(_png(4, 6, 8, 4, _pack_rows(s, 8))).shape == (6, 4, 3)


def test_png_adam7_interlace():
    """Adam7: seven independently-filtered sub-images scatter back to
    the exact same pixels the sequential stream carries."""
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(13, 11, 3))
    passes = []
    for x0, dx, y0, dy in (
        (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
        (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
    ):
        sub = img[y0::dy, x0::dx]
        if sub.size:
            passes.append(_pack_rows(sub, 8))
    got = decode_png(_png(11, 13, 8, 2, b"".join(passes), interlace=1))
    assert np.array_equal(got, img.astype(np.uint8))
    # sub-byte interlaced palette: per-pass rows repack at byte bounds
    plte = rng.randint(0, 256, size=(4, 3)).astype(np.uint8)
    idx = rng.randint(0, 4, size=(9, 10, 1))
    passes = []
    for x0, dx, y0, dy in (
        (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
        (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
    ):
        sub = idx[y0::dy, x0::dx]
        if sub.size:
            passes.append(_pack_rows(sub, 2))
    got_p = decode_png(_png(10, 9, 2, 3, b"".join(passes), interlace=1,
                            plte=plte.tobytes()))
    assert np.array_equal(got_p, plte[idx[:, :, 0]])


def test_png_colorkey_transparency():
    img = np.zeros((3, 3, 3), np.int64)
    img[1, 1] = [10, 20, 30]
    trns = struct.pack(">HHH", 10, 20, 30)
    got = decode_png(_png(3, 3, 8, 2, _pack_rows(img, 8), trns=trns))
    assert got.shape == (3, 3, 4)
    assert got[1, 1, 3] == 0 and got[0, 0, 3] == 255


def test_png_illegal_ihdr_rejected():
    # 16-bit palette is not a legal depth/color combination
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
               + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="illegal IHDR"):
        decode_png(payload)


def test_media_pipeline_decodes_png_payloads(ray_session):
    """The media table now mixes PNG and PPM images; the feature stage
    must decode both through the same dispatch."""
    import ray.data as rd

    from tsfeatures_ray.functions.multimodal import (
        media_features,
        synth_media_table,
    )

    tbl = synth_media_table(n=24, seed=11)
    has_png = any(
        p.as_py().startswith(b"\x89PNG") for p in tbl["payload"]
    )
    assert has_png
    out = media_features(rd.from_arrow(tbl)).to_pandas()
    assert len(out) == 24
    assert all(len(v) == 64 for v in out["features"])


def test_wav_widths_and_stereo():
    """decode_wav handles 8/16/32-bit PCM and averages channels."""
    import io
    import wave

    from tsfeatures_ray.functions.multimodal import decode_wav

    sig = np.sin(2 * np.pi * 440 * np.arange(800) / 8000.0) * 0.5

    def make(width, nch):
        if width == 1:
            pcm = ((sig * 127) + 128).astype(np.uint8)
        elif width == 2:
            pcm = (sig * 32767).astype("<i2")
        else:
            pcm = (sig * 2147483647).astype("<i4")
        if nch == 2:
            pcm = np.repeat(pcm, 2)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(nch)
            f.setsampwidth(width)
            f.setframerate(8000)
            f.writeframes(pcm.tobytes())
        return buf.getvalue()

    for width in (1, 2, 4):
        for nch in (1, 2):
            s, rate = decode_wav(make(width, nch))
            assert rate == 8000 and len(s) == 800
            tol = 0.02 if width == 1 else 1e-3
            assert np.abs(s - sig).max() < tol, (width, nch)
