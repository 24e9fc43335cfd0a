"""Gates for the baseline JPEG codec (functions/jpeg.py).

Encoder and decoder are independent implementations of the T.81 wire
format (the decoder reads its Huffman/quant tables from the stream, the
encoder writes its own), so a round trip exercises marker framing,
byte-stuffing, entropy coding, zigzag, quantization and both DCT
directions. The DCT basis and zigzag order are additionally pinned
against analytic ground truth so a complementary encoder/decoder bug
cannot hide.
"""

from __future__ import annotations

import numpy as np
import pytest

from tsfeatures_ray.functions.jpeg import _A, _ZZ, decode_jpeg, encode_jpeg


def _smooth(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            100 + 40 * np.sin(y / 15 + seed),
            120 + 30 * np.cos(x / 20),
            90 + 20 * np.sin((x + y) / 25),
        ],
        axis=2,
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def test_dct_basis_orthonormal_and_invertible():
    assert np.allclose(_A @ _A.T, np.eye(8), atol=1e-12)
    rng = np.random.RandomState(0)
    blk = rng.randn(8, 8) * 50
    coef = _A.T @ blk @ _A
    assert np.allclose(_A @ coef @ _A.T, blk, atol=1e-9)


def test_zigzag_is_diagonal_traversal():
    # spec-defined start of the zigzag scan + a permutation of 0..63
    assert _ZZ[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(_ZZ.tolist()) == list(range(64))


def test_flat_image_roundtrip_exact():
    img = np.full((16, 24, 3), 130, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == img.shape
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 1


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("hw", [(48, 64), (45, 53), (8, 8), (17, 9)])
def test_smooth_roundtrip(sub, hw):
    img = _smooth(*hw)
    dec = decode_jpeg(encode_jpeg(img, subsample=sub))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(float) - img.astype(float))
    assert err.max() <= 12, err.max()
    assert err.mean() <= 3.0, err.mean()


def test_grayscale_roundtrip():
    img = (np.outer(np.arange(17), np.ones(13)) * 5 % 200 + 20).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == (17, 13, 3)
    assert int(np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max()) <= 4


def test_noise_roundtrip_survives_byte_stuffing():
    # dense noise maximizes entropy-coded 0xFF bytes and AC symbol
    # coverage; lossy error is large by design, structure must survive
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(float) - img.astype(float)).mean() < 60


def test_decode_image_dispatch():
    from tsfeatures_ray.functions.multimodal import decode_image

    img = _smooth(16, 16)
    out = decode_image(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(float) - img.astype(float)).mean() <= 3.0


def test_fill_bytes_before_markers():
    # T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker
    # code, both in the header stream and before the scan-terminating
    # marker; decode must skip the run, not parse 0xFF as a marker or
    # truncate the scan
    img = _smooth(24, 16, seed=2)
    enc = encode_jpeg(img)
    ref = decode_jpeg(enc)
    padded = bytearray(enc)
    i = padded.find(b"\xff\xc0")  # fill before SOF0 (header loop)
    padded[i:i] = b"\xff"
    assert padded.endswith(b"\xff\xd9")
    padded[-2:-2] = b"\xff\xff"  # fill run before EOI (entropy splitter)
    dec = decode_jpeg(bytes(padded))
    assert np.array_equal(dec, ref)


@pytest.mark.parametrize(
    "img_fn",
    [
        lambda: _smooth(48, 64),
        lambda: _smooth(45, 53, 1),
        lambda: _smooth(8, 8, 2),
        lambda: np.random.default_rng(3).integers(
            0, 256, (24, 32, 3), dtype=np.uint8
        ),
        lambda: (
            np.outer(np.arange(17), np.ones(13)) * 5 % 200 + 20
        ).astype(np.uint8),
    ],
    ids=["smooth", "odd-dims", "tiny", "noise", "gray"],
)
def test_progressive_equals_baseline(img_fn):
    """The progressive encoder quantizes identically to the baseline
    encoder and only reorders coefficient transmission (spectral
    selection + successive approximation), so decoding both streams
    must give BIT-IDENTICAL pixels. Noise maximizes ZRL / correction-
    bit / end-of-band coverage in the refinement scans."""
    from tsfeatures_ray.functions.jpeg import encode_jpeg_progressive

    img = img_fn()
    prog = encode_jpeg_progressive(img)
    assert prog.find(b"\xff\xc2") > 0 and prog.count(b"\xff\xda") >= 6
    np.testing.assert_array_equal(
        decode_jpeg(prog), decode_jpeg(encode_jpeg(img))
    )


@pytest.mark.parametrize(
    "img_fn",
    [
        lambda: _smooth(48, 64),
        lambda: _smooth(45, 53, 1),
        lambda: _smooth(8, 8, 2),
        lambda: np.random.default_rng(3).integers(
            0, 256, (24, 32, 3), dtype=np.uint8
        ),
        lambda: (
            np.outer(np.arange(17), np.ones(13)) * 5 % 200 + 20
        ).astype(np.uint8),
    ],
    ids=["smooth", "odd-dims", "tiny", "noise", "gray"],
)
def test_arithmetic_equals_baseline(img_fn):
    """The SOF9 encoder quantizes identically to the baseline encoder
    and only swaps the entropy coder (QM arithmetic for Huffman), so
    decoding both streams must give BIT-IDENTICAL pixels; the
    arithmetic stream must also be smaller than this encoder's
    simple-Huffman baseline (a badly transcribed Table D.3 would
    inflate it)."""
    from tsfeatures_ray.functions.jpeg import encode_jpeg_arithmetic

    img = img_fn()
    base = encode_jpeg(img)
    ar = encode_jpeg_arithmetic(img)
    assert ar.find(b"\xff\xc9") > 0 and ar.find(b"\xff\xcc") > 0  # SOF9+DAC
    np.testing.assert_array_equal(decode_jpeg(ar), decode_jpeg(base))
    assert len(ar) < len(base)


def test_arithmetic_420_and_byte_stuffing():
    """4:2:0 arithmetic scan round-trips, and a large noise image
    forces stuffed 0xFF bytes through the encoder's carry-stacking
    path and the decoder's unstuffing path."""
    from tsfeatures_ray.functions.jpeg import encode_jpeg_arithmetic

    img = _smooth(37, 29)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_arithmetic(img, subsample="420")),
        decode_jpeg(encode_jpeg(img, subsample="420")),
    )
    noise = np.random.default_rng(11).integers(
        0, 256, (120, 160, 3), dtype=np.uint8
    )
    ar = encode_jpeg_arithmetic(noise)
    scan = ar[ar.find(b"\xff\xda"):]
    assert scan.count(b"\xff\x00") > 0  # stuffing exercised
    np.testing.assert_array_equal(
        decode_jpeg(ar), decode_jpeg(encode_jpeg(noise))
    )


@pytest.mark.parametrize(
    "img_fn",
    [
        lambda: _smooth(48, 64),
        lambda: np.random.default_rng(3).integers(
            0, 256, (24, 32, 3), dtype=np.uint8
        ),
        lambda: (
            np.outer(np.arange(17), np.ones(13)) * 5 % 200 + 20
        ).astype(np.uint8),
    ],
    ids=["smooth", "noise", "gray"],
)
def test_progressive_arithmetic_equals_baseline(img_fn):
    """SOF10 combines the progressive scan script with the QM-coder:
    quantization is identical to the baseline encoder and both entropy
    layers are lossless, so decoding must give BIT-IDENTICAL pixels.
    Noise maximizes newly-nonzero / correction-bit / EOB coverage in
    the G.2 refinement models."""
    from tsfeatures_ray.functions.jpeg import (
        encode_jpeg_progressive_arithmetic,
    )

    img = img_fn()
    pa = encode_jpeg_progressive_arithmetic(img)
    assert pa.find(b"\xff\xca") > 0 and pa.count(b"\xff\xda") >= 6
    np.testing.assert_array_equal(
        decode_jpeg(pa), decode_jpeg(encode_jpeg(img))
    )


@pytest.mark.parametrize("pred", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_roundtrip_exact(pred):
    """SOF3 lossless mode: every predictor selector must reconstruct
    the EXACT input array -- not the baseline's lossy pixels. Noise
    exercises the full diff-category range; the 1-pixel and 1-row
    shapes exercise the forced first-line/first-column predictors."""
    from tsfeatures_ray.functions.jpeg import encode_jpeg_lossless

    rng = np.random.default_rng(pred)
    for shape in ((21, 17, 3), (1, 9, 3), (7, 1, 3), (1, 1, 3), (13, 11)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        ll = encode_jpeg_lossless(img, predictor=pred)
        assert ll.find(b"\xff\xc3") > 0
        dec = decode_jpeg(ll)
        ref = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)
        np.testing.assert_array_equal(dec, ref)


def test_lossless_arithmetic_rejected():
    img = _smooth(8, 8)
    enc = bytearray(encode_jpeg(img))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xCB  # rewrite SOF0 -> SOF11 (arithmetic lossless)
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(bytes(enc))


def test_non_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"P6\n1 1\n255\nabc")


class TestHierarchical:
    """Annex J pyramid gates: DHP/EXP framing, differential SOF5/SOF7
    zero-prediction decoding, J.1.1.2 reference expansion."""

    def _gray(self, h, w, seed=0):
        rng = np.random.default_rng(seed)
        y, x = np.mgrid[0:h, 0:w]
        img = 128 + 60 * np.sin(x / 5 + seed) + 50 * np.cos(y / 7)
        img = img + rng.normal(0, 8, (h, w))
        return np.clip(img, 0, 255).astype(np.uint8)

    @pytest.mark.parametrize("shape", [(29, 37), (16, 16), (33, 8)])
    def test_lossless_pyramid_exact(self, shape):
        """Lossy base + differential-lossless refinement reconstructs
        the EXACT input (the whole point of Annex J pyramids), at odd
        and block-aligned shapes."""
        from tsfeatures_ray.functions.jpeg import encode_jpeg_hierarchical

        img = self._gray(*shape, seed=shape[0])
        out = decode_jpeg(encode_jpeg_hierarchical(img, refine="lossless"))
        assert np.array_equal(out[:, :, 0], img)
        assert np.array_equal(out[:, :, 1], img)  # gray replicates

    def test_dct_pyramid_near_exact_and_better_than_base(self):
        """SOF5 differential DCT refinement (unit quantization): the
        reconstruction may differ from the input only by DCT rounding
        (|err| <= 1) and must strictly improve on the expanded base
        frame alone."""
        from tsfeatures_ray.functions.jpeg import (
            _expand2x,
            encode_jpeg,
            encode_jpeg_hierarchical,
        )

        img = self._gray(40, 56, seed=2)
        out = decode_jpeg(encode_jpeg_hierarchical(img, refine="dct"))
        err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
        assert err.max() <= 1
        # base-only reconstruction (what a resolution-limited reader sees)
        pi = img.astype(np.int64)
        half = ((pi[0::2, 0::2] + pi[0::2, 1::2] + pi[1::2, 0::2]
                 + pi[1::2, 1::2] + 2) >> 2).astype(np.uint8)
        ref = decode_jpeg(encode_jpeg(half))[:, :, 0].astype(np.int64)
        ref = _expand2x(_expand2x(ref, axis=1), axis=0)[:40, :56]
        base_err = np.abs(ref - img.astype(np.int64))
        assert err.mean() < base_err.mean() / 10

    def test_expand_filter_spec_values(self):
        """J.1.1.2: even outputs copy, odd outputs are the rounded mean
        of neighbours, edges replicate."""
        from tsfeatures_ray.functions.jpeg import _expand2x

        r = np.array([[0, 10, 255]], dtype=np.int64)
        got = _expand2x(r, axis=1)
        assert got.tolist() == [[0, 5, 10, 133, 255, 255]]
        got_v = _expand2x(r.T, axis=0)
        assert got_v.T.tolist() == [[0, 5, 10, 133, 255, 255]]

    def test_differential_outside_pyramid_rejected(self):
        from tsfeatures_ray.functions.jpeg import encode_jpeg_hierarchical

        img = self._gray(16, 16)
        b = bytearray(encode_jpeg_hierarchical(img))
        # strip the DHP segment (4 bytes header + payload): differential
        # frames must then be rejected
        i = b.index(b"\xff\xde")
        seglen = int.from_bytes(b[i + 2 : i + 4], "big")
        del b[i : i + 2 + seglen]
        with pytest.raises(ValueError):
            decode_jpeg(bytes(b))

    def test_unsupported_modes_still_raise(self):
        from tsfeatures_ray.functions.jpeg import encode_jpeg_hierarchical

        img = self._gray(16, 16)
        b = bytearray(encode_jpeg_hierarchical(img))
        i = b.index(b"\xff\xc7")
        b[i + 1] = 0xCF  # arithmetic differential lossless
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(b))
