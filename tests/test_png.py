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


def test_png_unsupported_profile_raises():
    # 16-bit depth header
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
               + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
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
