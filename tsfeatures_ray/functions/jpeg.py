"""Baseline JPEG (JFIF) codec in pure numpy + stdlib -- no external
libraries (round-4 VERDICT ask #8: a real JPEG seam instead of a
NotImplementedError).

Scope (ITU-T T.81, public specification):

- ``decode_jpeg``: baseline sequential DCT (SOF0/1), 8-bit, any
  sampling factors (4:4:4 / 4:2:2 / 4:2:0), restart markers,
  byte-stuffing, progressive DCT (SOF2, T.81 Annex G): multi-scan
  spectral selection + successive approximation, interleaved DC scans,
  non-interleaved AC band scans, DC/AC refinement with end-of-band
  runs and correction bits, AND arithmetic-coded DCT -- sequential
  (SOF9) and progressive (SOF10, Annex G.2 band/refinement models):
  the full Annex D QM-coder (Table D.3 state machine, carry stacking,
  byte stuffing) with the Annex F DC/AC conditioning model (DAC
  markers honored, defaults DC L=0/U=1, AC Kx=5), AND lossless
  prediction (SOF3, Annex H: all 7 predictor selectors, point
  transform, modulo-2^16 reconstruction; components returned
  verbatim -- T.81 defines no color transform for lossless), AND
  Huffman HIERARCHICAL pyramids (Annex J: DHP/EXP markers,
  non-differential base frames, differential sequential SOF5 and
  differential lossless SOF7 refinement frames with zero-prediction
  coding and the J.1.1.2 reference expansion filter). Huffman
  and quantization tables are read from the stream (DHT/DQT), so any
  compliant Huffman file decodes. 12-bit precision, differential
  progressive (SOF6) and the arithmetic lossless/differential modes
  raise NotImplementedError (the remaining seam).
- ``encode_jpeg``: baseline sequential, 4:4:4 (one 8x8 block per
  component per MCU), quantization via the spec's example luminance /
  chrominance tables (Annex K shape), and SIMPLE canonical Huffman
  tables (all 12 DC categories at 4 bits, all 162 AC run/size symbols
  at 8 bits). The tables ride in the stream per the format, so the
  output is a valid JPEG any reader decodes -- it just compresses a
  little worse than the Annex-K-optimal tables (drop-in replacement).
- ``encode_jpeg_progressive``: SOF2 with a libjpeg-shaped scan script
  (DC first + refine, per-component AC bands 1-5 / 6-63 at point
  transform 1 + their refinement scans); same quantization as the
  baseline encoder, so both streams decode to bit-identical pixels
  (the round-trip gate in tests/test_jpeg.py).
- ``encode_jpeg_arithmetic``: SOF9 with default conditioning in a DAC
  segment; entropy coding is lossless over the same quantized
  coefficients, so its pixels are also bit-identical to the baseline
  stream's (same gate), while the stream is substantially smaller
  than this encoder's simple-Huffman baseline.
- ``encode_jpeg_progressive_arithmetic``: SOF10 with the progressive
  scan script re-entropy-coded through the QM-coder (G.2 band /
  refinement statistical models); same bit-identical-pixels gate.
- ``encode_jpeg_lossless``: SOF3 with a selectable predictor;
  round-trips the input array EXACTLY (the strongest gate: decode
  equals the original, not the baseline's lossy reconstruction).

The entropy coder is a straightforward sequential bit loop (this is the
documented per-record decode seam -- MediaFeatures runs it inside an
actor-pool map_batches; plug PIL/libjpeg into MediaFeatures(decode=...)
when throughput matters). The DCT/IDCT are vectorized: all blocks of a
component transform in one (N, 8, 8) einsum.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_jpeg",
    "encode_jpeg",
    "encode_jpeg_progressive",
    "encode_jpeg_arithmetic",
    "encode_jpeg_progressive_arithmetic",
    "encode_jpeg_lossless",
]

JPEG_MAGIC = b"\xff\xd8"

# T.81 Table D.3: the QM-coder probability estimation state machine.
# (Qe, NMPS, NLPS, switch) per state; entry 113 is the conventional
# non-adapting near-equiprobable state used for AC sign bits (its
# transitions point at itself and switch is 0, so it never moves).
_ARITH_TAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)


class _ArithDecoder:
    """T.81 Annex D.2 QM-coder decoder over one restart segment whose
    stuffed zero bytes were already stripped (0xFF 0x00 -> 0xFF, same
    convention as the Huffman path); reads past the end feed zeros per
    D.2.7. A statistics bin is one byte: low 7 bits = Table D.3 state
    index, top bit = current MPS sense."""

    def __init__(self, data: bytes):
        self.d = data
        self.bp = 0
        # INITDEC, aligned to this encoder's geometry (A0 = 0x10000,
        # CT0 = 11, bytes emitted from bit 19): the first two stream
        # bytes are exactly the initial 16-bit window, so they preload
        # Chigh whole and the next byte is due at the first shift
        self.c = (self._byte() << 24) | (self._byte() << 16)
        self.ct = 0
        self.a = 0x10000

    def _byte(self) -> int:
        b = self.d[self.bp] if self.bp < len(self.d) else 0
        self.bp += 1
        return b

    def decode(self, st: bytearray, i: int) -> int:
        sv = st[i]
        qe, nmps, nlps, sw = _ARITH_TAB[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if (self.c >> 16) < self.a:
            if self.a >= 0x8000:
                return mps
            # MPS path with conditional exchange (D.2.4)
            if self.a < qe:
                d = 1 - mps
                if sw:
                    mps = 1 - mps
                st[i] = (mps << 7) | nlps
            else:
                d = mps
                st[i] = (mps << 7) | nmps
        else:
            # LPS path with conditional exchange (D.2.3)
            self.c -= self.a << 16
            if self.a < qe:
                d = mps
                st[i] = (mps << 7) | nmps
            else:
                d = 1 - mps
                if sw:
                    mps = 1 - mps
                st[i] = (mps << 7) | nlps
            self.a = qe
        # RENORMD (D.2.6)
        a, c, ct = self.a, self.c, self.ct
        while a < 0x8000:
            if ct == 0:
                c += self._byte() << 8
                ct = 8
            a <<= 1
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
        self.a, self.c, self.ct = a, c, ct
        return d


class _ArithEncoder:
    """T.81 Annex D.1 QM-coder encoder. Emits raw entropy bytes with
    carry resolution (the 0xFF stacking discipline); the caller applies
    marker byte-stuffing (0xFF -> 0xFF 0x00) on the finished scan."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11  # 3 spacer bits + first byte
        self.buffer = -1
        self.sc = 0  # count of stacked (carry-pending) 0xFF bytes
        self.out = bytearray()

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        sv = st[i]
        qe, nmps, nlps, sw = _ARITH_TAB[sv & 0x7F]
        mps = sv >> 7
        self.a -= qe
        if bit == mps:
            # CODEMPS (D.1.3)
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[i] = (mps << 7) | nmps
        else:
            # CODELPS (D.1.2)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            if sw:
                mps = 1 - mps
            st[i] = (mps << 7) | nlps
        # RENORME (D.1.5) + BYTEOUT (D.1.6)
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a >= 0x8000:
                break

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry: bump the buffered byte, stacked 0xFFs roll to 0x00
            if self.buffer >= 0:
                self.out.append(self.buffer + 1)
            self.out.extend(b"\x00" * self.sc)
            self.sc = 0
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.sc += 1  # may still receive a carry; hold it back
        else:
            if self.buffer >= 0:
                self.out.append(self.buffer)
            self.out.extend(b"\xff" * self.sc)
            self.sc = 0
            self.buffer = t
        self.c &= 0x7FFFF

    def flush(self) -> bytes:
        # D.1.8/D.1.9: CLEARBITS then the final byte writes
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # one final carry
            if self.buffer >= 0:
                self.out.append(self.buffer + 1)
            self.out.extend(b"\x00" * self.sc)
        else:
            if self.buffer >= 0:
                self.out.append(self.buffer)
            self.out.extend(b"\xff" * self.sc)
        self.buffer = -1
        self.sc = 0
        self.out.append((self.c >> 19) & 0xFF)
        self.out.append((self.c >> 11) & 0xFF)
        return bytes(self.out)


# Statistics layout per T.81 F.1.4.4 (as in every interoperable
# implementation): DC tables use 49 bins -- 5 conditioning classes x
# 4 (zero/sign/pos-mag/neg-mag) at 0..19, shared magnitude-category
# exponent bins X1..X15 at 20..34, shared magnitude low-bit bins at
# +14 from the exponent position. AC tables use 245 bins -- 3 per
# coefficient index k (EOB / zero / magnitude) at 3*(k-1), exponent
# families at 189 (k <= Kx) and 217 (k > Kx), low-bit bins at +14.
_DC_STAT_BINS = 64
_AC_STAT_BINS = 256


def _arith_decode_dc(dec, st, ctx, L, U):
    """Decode one DC difference (F.2.4.1). Returns (diff, next_ctx)."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    pos = ctx + 2 + sign
    m = dec.decode(st, pos)
    if m:
        pos = 20
        while dec.decode(st, pos):
            m <<= 1
            if m == 0x8000:
                raise ValueError("DC magnitude overrun")
            pos += 1
    # conditioning category for the NEXT block (F.1.4.4.1.2)
    if m < ((1 << L) >> 1):
        nctx = 0
    elif m > ((1 << U) >> 1):
        nctx = 12 + 4 * sign
    else:
        nctx = 4 + 4 * sign
    v = m
    pos += 14
    mm = m >> 1
    while mm:
        if dec.decode(st, pos):
            v |= mm
        mm >>= 1
    v += 1
    return (-v if sign else v), nctx


def _arith_decode_ac(dec, st, fixed, blk, kx, ss=1, se=63, al=0):
    """Decode one block's AC coefficients (F.2.4.2 sequential /
    G.2.2 progressive-first band [ss, se] at point transform al)."""
    k = ss
    while k <= se:
        pos = 3 * (k - 1)
        if dec.decode(st, pos):  # EOB
            return
        while dec.decode(st, pos + 1) == 0:
            pos += 3
            k += 1
            if k > se:
                raise ValueError("AC index overrun")
        sign = dec.decode(fixed, 0)
        pos += 2
        m = dec.decode(st, pos)
        if m:
            if dec.decode(st, pos):
                m = 2
                pos = 189 if k <= kx else 217
                while dec.decode(st, pos):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("AC magnitude overrun")
                    pos += 1
        v = m
        pos += 14
        mm = m >> 1
        while mm:
            if dec.decode(st, pos):
                v |= mm
            mm >>= 1
        v += 1
        blk[_ZZ[k]] = (-v if sign else v) << al
        k += 1


def _arith_refine_ac(dec, st, fixed, blk, ss, se, al):
    """Decode one block's AC successive-approximation refinement scan
    (T.81 G.2.2, figure G.10 decode side): per-coefficient correction
    bits for already-nonzero history, newly-nonzero insertions at
    +/-2^al, EOB decision only past the previous stage's end-of-band
    index."""
    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex > 0 and blk[_ZZ[kex]] == 0:
        kex -= 1
    k = ss
    while k <= se:
        pos = 3 * (k - 1)
        if k > kex:
            if dec.decode(st, pos):
                return  # EOB
        while True:
            z = _ZZ[k]
            if blk[z] != 0:  # previously nonzero: correction bit
                if dec.decode(st, pos + 2):
                    blk[z] += m1 if blk[z] < 0 else p1
                break
            if dec.decode(st, pos + 1):  # newly nonzero
                blk[z] = m1 if dec.decode(fixed, 0) else p1
                break
            pos += 3
            k += 1
            if k > se:
                raise ValueError("AC refine index overrun")
        k += 1


def _arith_encode_dc(enc, st, ctx, diff, L, U):
    """Encode one DC difference (F.1.4.1). Returns the next context."""
    if diff == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, ctx + 1, sign)
    v = (-diff if sign else diff) - 1
    pos = ctx + 2 + sign
    m = 0
    if v:
        enc.encode(st, pos, 1)
        m = 1
        pos = 20
        v2 = v >> 1
        while v2:
            enc.encode(st, pos, 1)
            m <<= 1
            pos += 1
            v2 >>= 1
    enc.encode(st, pos, 0)
    if m < ((1 << L) >> 1):
        nctx = 0
    elif m > ((1 << U) >> 1):
        nctx = 12 + 4 * sign
    else:
        nctx = 4 + 4 * sign
    pos += 14
    mm = m >> 1
    while mm:
        enc.encode(st, pos, 1 if v & mm else 0)
        mm >>= 1
    return nctx


def _arith_encode_ac(enc, st, fixed, row, kx, ss=1, se=63, al=0):
    """Encode one block's AC coefficients (F.1.4.2 sequential /
    G.1.2.2 progressive-first band [ss, se] at point transform al)
    from a 64-long zigzag-ordered row."""
    ke = se
    while ke >= ss and (abs(int(row[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        pos = 3 * (k - 1)
        enc.encode(st, pos, 0)  # not EOB yet
        while (abs(int(row[k])) >> al) == 0:
            enc.encode(st, pos + 1, 0)
            pos += 3
            k += 1
        enc.encode(st, pos + 1, 1)
        val = int(row[k])
        sign = 1 if val < 0 else 0
        enc.encode(fixed, 0, sign)
        v = (abs(val) >> al) - 1
        pos += 2
        m = 0
        if v:
            enc.encode(st, pos, 1)
            m = 1
            v2 = v >> 1
            if v2:
                enc.encode(st, pos, 1)
                m = 2
                pos = 189 if k <= kx else 217
                v2 >>= 1
                while v2:
                    enc.encode(st, pos, 1)
                    m <<= 1
                    pos += 1
                    v2 >>= 1
        enc.encode(st, pos, 0)
        pos += 14
        mm = m >> 1
        while mm:
            enc.encode(st, pos, 1 if v & mm else 0)
            mm >>= 1
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _arith_encode_ac_refine(enc, st, fixed, row, ss, se, al):
    """Encode one block's AC successive-approximation refinement
    (T.81 G.1.2.3): correction bits for history-nonzero coefficients,
    newly-nonzero insertions, EOB decisions only past the previous
    stage's end-of-band index."""
    ke = se
    while ke >= ss and (abs(int(row[ke])) >> al) == 0:
        ke -= 1
    kex = se
    while kex >= ss and (abs(int(row[kex])) >> (al + 1)) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        pos = 3 * (k - 1)
        if k > kex:
            enc.encode(st, pos, 0)  # not EOB yet
        while True:
            val = int(row[k])
            t = abs(val) >> al
            if t:
                if t >> 1:  # previously nonzero: correction bit
                    enc.encode(st, pos + 2, t & 1)
                else:  # newly nonzero at this precision
                    enc.encode(st, pos + 1, 1)
                    enc.encode(fixed, 0, 1 if val < 0 else 0)
                break
            enc.encode(st, pos + 1, 0)
            pos += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _decode_scan_arith(
    segs, scan_comps, coef, dc_cond, ac_cond, ss, se, ah, al,
    restart_interval, width, height, hmax, vmax, mcux, mcuy,
):
    """Decode one arithmetic-coded scan -- sequential full-band (SOF9)
    or any progressive band/refinement (SOF10, T.81 G.2) -- into the
    coefficient grids. Statistics, conditioning contexts and DC
    predictors all reset at scan start and restart boundaries."""
    interleaved = len(scan_comps) > 1
    if interleaved:
        n_units = mcux * mcuy
        ubx = uby = 0
    else:
        c0 = scan_comps[0]
        cw = -(-width * c0["h"] // hmax)
        ch = -(-height * c0["v"] // vmax)
        ubx = -(-cw // 8)
        uby = -(-ch // 8)
        n_units = ubx * uby

    def fresh():
        return (
            {sc["dc"]: bytearray(_DC_STAT_BINS) for sc in scan_comps},
            {sc["ac"]: bytearray(_AC_STAT_BINS) for sc in scan_comps},
            bytearray([113]),
            [0] * len(scan_comps),
            [0] * len(scan_comps),
        )

    seg_idx = 0
    dec = _ArithDecoder(segs[0])
    dc_st, ac_st, fixed, pred, ctx = fresh()

    def decode_block(blk, sc, sci):
        if ah == 0:  # first pass (sequential is ss=0, se=63, al=0)
            if ss == 0:
                L, U = dc_cond.get(sc["dc"], (0, 1))
                diff, ctx[sci] = _arith_decode_dc(
                    dec, dc_st[sc["dc"]], ctx[sci], L, U
                )
                pred[sci] += diff
                blk[0] = pred[sci] << al
            if se >= 1:
                _arith_decode_ac(
                    dec, ac_st[sc["ac"]], fixed, blk,
                    ac_cond.get(sc["ac"], 5), max(ss, 1), se, al,
                )
        elif ss == 0:  # DC refinement: one fixed-bin bit per block
            if dec.decode(fixed, 0):
                blk[0] |= 1 << al
        else:  # AC refinement
            _arith_refine_ac(
                dec, ac_st[sc["ac"]], fixed, blk, ss, se, al
            )

    for u in range(n_units):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            dec = _ArithDecoder(segs[seg_idx])
            dc_st, ac_st, fixed, pred, ctx = fresh()
        if interleaved:
            my, mx = divmod(u, mcux)
            for sci, sc in enumerate(scan_comps):
                for v in range(sc["v"]):
                    for h in range(sc["h"]):
                        decode_block(
                            coef[sc["ci"]][my * sc["v"] + v, mx * sc["h"] + h],
                            sc, sci,
                        )
        else:
            by, bx = divmod(u, ubx)
            decode_block(coef[scan_comps[0]["ci"]][by, bx], scan_comps[0], 0)


def _zigzag_order() -> np.ndarray:
    """Zigzag scan order: position k -> flat (row*8+col) index,
    generated by diagonal traversal (no memorized table)."""
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            ij.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(i * 8 + j for i, j in ij)
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag_order()

# 2-D DCT basis: A[x, u] = 0.5 * alpha(u) * cos((2x+1) u pi / 16);
# spatial = A @ coef @ A.T, coef = A.T @ spatial @ A (orthonormal)
_A = np.zeros((8, 8))
for _x in range(8):
    for _u in range(8):
        _a = np.sqrt(0.5) if _u == 0 else 1.0
        _A[_x, _u] = 0.5 * _a * np.cos((2 * _x + 1) * _u * np.pi / 16)

# spec example quantization tables (T.81 Annex K shape)
_QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
_QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


# ---------------------------------------------------------------------------
# huffman tables
# ---------------------------------------------------------------------------

class _HuffDecoder:
    """Canonical Huffman decoder built from the DHT (BITS, HUFFVAL)
    lists -- the spec's mincode/maxcode/valptr construction."""

    def __init__(self, bits: list[int], huffval: list[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.huffval = huffval
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = br.read_bit()
        length = 1
        while length <= 16:
            if self.maxcode[length] >= code:
                return self.huffval[
                    self.valptr[length] + code - self.mincode[length]
                ]
            code = (code << 1) | br.read_bit()
            length += 1
        raise ValueError("invalid Huffman code in entropy stream")


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict:
    """symbol -> (code, length) for the encoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# simple-but-valid encoder tables: every code length is uniform, so the
# canonical construction cannot produce the forbidden all-ones code
_DC_BITS = [0, 0, 0, 12] + [0] * 12          # 12 categories @ 4 bits
_DC_VALS = list(range(12))
_AC_VALS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)  # EOB, ZRL, and every (run 0-15, size 1-10)
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8  # all @ 8 bits


# ---------------------------------------------------------------------------
# bit io
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over de-stuffed entropy data."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream exhausted")
            self.bitbuf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _extend(v: int, s: int) -> int:
    """Sign-extend an s-bit magnitude (spec EXTEND)."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _entropy_segments(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Split one scan's entropy data into restart segments (stuffed zero
    bytes stripped, T.81-legal 0xFF fill runs skipped). Returns the
    segments and the position of the 0xFF opening the marker that ended
    the scan (or len(payload) if the stream is truncated)."""
    segs: list[bytes] = []
    j = start
    s0 = start
    while j < len(payload) - 1:
        if payload[j] == 0xFF and payload[j + 1] != 0x00:
            k = j + 1
            while k < len(payload) and payload[k] == 0xFF:
                k += 1
            segs.append(payload[s0:j].replace(b"\xff\x00", b"\xff"))
            if k < len(payload) and 0xD0 <= payload[k] <= 0xD7:
                # RSTn: continue with fresh predictors
                j = k + 1
                s0 = j
                continue
            return segs, j  # EOI / next marker
        j += 1
    segs.append(payload[s0:].replace(b"\xff\x00", b"\xff"))
    return segs, len(payload)


def _refine_ac(br, blk, act, ss: int, se: int, al: int, eobrun: int) -> int:
    """AC successive-approximation refinement for one block's [ss, se]
    band (T.81 G.1.2.3 / figure G.7 decode side). Returns the updated
    end-of-band run."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = act.decode(br)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) + (br.read_bits(r) if r else 0)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                val = p1 if br.read_bit() else m1
            while k <= se:
                z = _ZZ[k]
                if blk[z] != 0:
                    if br.read_bit() and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                blk[_ZZ[k]] = val
            k += 1
    if eobrun > 0:
        # blocks inside an end-of-band run still carry correction bits
        # for their already-nonzero coefficients
        while k <= se:
            z = _ZZ[k]
            if blk[z] != 0:
                if br.read_bit() and (blk[z] & p1) == 0:
                    blk[z] += p1 if blk[z] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(
    segs, scan_comps, coef, huff, ss, se, ah, al,
    restart_interval, width, height, hmax, vmax, mcux, mcuy,
    differential=False,
):
    """Decode ONE scan (baseline full-band or any progressive band) into
    the per-component coefficient grids. Interleaved scans walk MCUs;
    single-component scans walk the component's own block raster
    (T.81 A.2.2 non-interleaved order)."""
    interleaved = len(scan_comps) > 1
    if interleaved:
        n_units = mcux * mcuy
        ubx = uby = 0
    else:
        c0 = scan_comps[0]
        cw = -(-width * c0["h"] // hmax)   # component sample dims
        ch = -(-height * c0["v"] // vmax)
        ubx = -(-cw // 8)
        uby = -(-ch // 8)
        n_units = ubx * uby
    seg_idx = 0
    br = _BitReader(segs[0])
    pred = [0] * len(scan_comps)
    eobrun = 0

    def decode_block(blk, sc, sci):
        nonlocal eobrun
        if ah == 0:  # first pass (baseline is the ss=0, se=63, al=0 case)
            k = ss
            if ss == 0:
                s = huff[(0, sc["dc"])].decode(br)
                diff = _extend(br.read_bits(s), s) if s else 0
                if differential:
                    # T.81 differential frames: DC prediction is zero,
                    # the decoded value IS the coefficient
                    blk[0] = diff << al
                else:
                    pred[sci] += diff
                    blk[0] = pred[sci] << al
                k = 1
            if k > se:
                return
            if eobrun > 0:
                eobrun -= 1
                return
            act = huff[(1, sc["ac"])]
            while k <= se:
                rs = act.decode(br)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) + (br.read_bits(r) if r else 0) - 1
                    return
                k += r
                if k > se:
                    raise ValueError("AC index overrun")
                blk[_ZZ[k]] = _extend(br.read_bits(s), s) << al
                k += 1
        elif ss == 0:  # DC refinement: one raw bit per block
            if br.read_bit():
                blk[0] |= 1 << al
        else:  # AC refinement
            eobrun = _refine_ac(
                br, blk, huff[(1, sc["ac"])], ss, se, al, eobrun
            )

    for u in range(n_units):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            br = _BitReader(segs[seg_idx])
            pred[:] = [0] * len(scan_comps)
            eobrun = 0
        if interleaved:
            my, mx = divmod(u, mcux)
            for sci, sc in enumerate(scan_comps):
                for v in range(sc["v"]):
                    for h in range(sc["h"]):
                        decode_block(
                            coef[sc["ci"]][my * sc["v"] + v, mx * sc["h"] + h],
                            sc, sci,
                        )
        else:
            by, bx = divmod(u, ubx)
            decode_block(coef[scan_comps[0]["ci"]][by, bx], scan_comps[0], 0)


def _expand2x(r: np.ndarray, axis: int) -> np.ndarray:
    """T.81 J.1.1.2 reference upsampling: even outputs copy the input,
    odd outputs are the rounded mean of the two neighbours (last one
    replicates the edge)."""
    if axis == 0:
        return _expand2x(r.T, axis=1).T
    h, w = r.shape
    out = np.empty((h, 2 * w), dtype=np.int64)
    out[:, 0::2] = r
    nxt = np.concatenate([r[:, 1:], r[:, -1:]], axis=1)
    out[:, 1::2] = (r + nxt + 1) >> 1
    return out


def _lossless_predict(smp, y, x, sel, p1):
    """T.81 H.1.2.1 sample prediction: the selected predictor in the
    interior, forced cases on the first line / first column, and the
    midpoint constant for the very first sample."""
    if y == 0:
        return int(smp[0, x - 1]) if x > 0 else p1
    if x == 0:
        return int(smp[y - 1, 0])
    a = int(smp[y, x - 1])
    b = int(smp[y - 1, x])
    if sel == 1:
        return a
    if sel == 2:
        return b
    c = int(smp[y - 1, x - 1])
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise ValueError(f"lossless predictor {sel} out of range")


def _decode_scan_lossless(
    segs, scan_comps, samples, huff, sel, pt,
    restart_interval, width, height, differential=False,
):
    """Decode one lossless scan (SOF3, T.81 Annex H): per-sample
    predictor + DC-category Huffman differences, modulo-2^16
    reconstruction, restart segments restarting prediction."""
    if restart_interval and restart_interval % width:
        raise NotImplementedError(
            "lossless restart intervals must be row-aligned "
            "(a multiple of the sample width)"
        )
    seg_idx = 0
    br = _BitReader(segs[0])
    p1 = 1 << (7 - pt)  # 2^(P - Pt - 1) at 8-bit precision
    origin = 0  # restart boundaries restart prediction at that row
    u = 0
    for y in range(height):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            br = _BitReader(segs[seg_idx])
            origin = y
        u += width
        for x in range(width):
            for sc in scan_comps:
                s = huff[(0, sc["dc"])].decode(br)
                if s == 16:
                    diff = 32768
                else:
                    diff = _extend(br.read_bits(s), s) if s else 0
                smp = samples[sc["ci"]]
                if differential:
                    # differential frames code the correction directly:
                    # prediction is zero (T.81 Annex J / H)
                    px = 0
                else:
                    px = _lossless_predict(
                        smp[origin:], y - origin, x, sel, p1
                    )
                smp[y, x] = (px + diff) & 0xFFFF
    for sc in scan_comps:
        if pt:
            samples[sc["ci"]] <<= pt


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF -> HxWx3 uint8 (grayscale replicates channels). Decodes
    baseline sequential (SOF0/1), progressive (SOF2: spectral selection
    + successive approximation, T.81 Annex G), arithmetic-coded
    sequential/progressive (SOF9/10, Annex D QM-coder + Annex F
    conditioning), lossless (SOF3, Annex H) and Huffman HIERARCHICAL
    pyramids (Annex J: DHP/EXP + non-differential frames + differential
    sequential SOF5 / differential lossless SOF7, zero-prediction
    differential coding, J.1.1.2 reference expansion); differential
    progressive (SOF6) and the arithmetic lossless/differential modes
    raise at the documented seam."""
    if not payload.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG stream")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[dict] = []
    coef: list[np.ndarray] | None = None
    height = width = 0
    hmax = vmax = mcux = mcuy = 0
    restart_interval = 0
    n_scans = 0
    arith = False
    lossless = False
    samples: list[np.ndarray] | None = None
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    hier = False            # DHP seen: multi-frame pyramid (Annex J)
    differential = False    # current frame codes corrections to ref
    ref: list[np.ndarray] | None = None  # hierarchical reference planes
    pending_exp = (0, 0)    # EXP marker: (Eh, Ev) upsample request
    frame_scans = 0

    def _finalize_frame():
        """Fold the just-decoded frame into the hierarchical reference:
        non-differential frames BECOME the reference (component space);
        differential frames add their corrections (mod 2^16 for
        lossless per Annex H, clamped [0,255] for DCT)."""
        nonlocal ref
        if lossless:
            planes = [s.copy() for s in samples]
        else:
            planes = []
            for ci, c in enumerate(comps):
                by, bx, _ = coef[ci].shape
                coefs = coef[ci].reshape(by, bx, 8, 8) * qt[c["tq"]]
                shift = 0.0 if differential else 128.0
                spatial = np.einsum("xu,ncuv,yv->ncxy", _A, coefs, _A) + shift
                plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
                plane = np.repeat(
                    np.repeat(plane, vmax // c["v"], axis=0),
                    hmax // c["h"], axis=1,
                )
                plane = np.rint(plane[:height, :width]).astype(np.int64)
                if not differential:
                    plane = np.clip(plane, 0, 255)
                planes.append(plane)
        if differential:
            if ref is None:
                raise ValueError("differential frame without a reference")
            if lossless:
                ref = [(r + p) & 0xFFFF for r, p in zip(ref, planes)]
            else:
                ref = [np.clip(r + p, 0, 255) for r, p in zip(ref, planes)]
        else:
            ref = planes

    i = 2
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes -- the marker code is the first non-0xFF byte
        while i + 1 < len(payload) and payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[i : i + 2])
        body = payload[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(body[j + 1 : j + 65], dtype=np.uint8)
                flat = np.zeros(64, dtype=np.int64)
                flat[_ZZ] = tbl
                qt[tq] = flat.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1 : j + 17])
                nsym = sum(bits)
                vals = list(body[j + 17 : j + 17 + nsym])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                j += 17 + nsym
        elif marker == 0xDE:  # DHP: hierarchical progression (Annex J)
            hier = True
            i += seglen
            continue
        elif marker == 0xDF:  # EXP: expand reference before next frame
            pending_exp = (body[0] >> 4, body[0] & 15)
            i += seglen
            continue
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC7, 0xC9, 0xCA):
            # SOF0/1 sequential, SOF2 progressive, SOF3 lossless
            # (Huffman); SOF5 differential sequential, SOF7 differential
            # lossless (hierarchical, Annex J); SOF9 sequential, SOF10
            # progressive (arithmetic)
            if hier and frame_scans:
                _finalize_frame()  # previous pyramid frame -> reference
                frame_scans = 0
            arith = marker in (0xC9, 0xCA)
            lossless = marker in (0xC3, 0xC7)
            differential = marker in (0xC5, 0xC7)
            if differential and not hier:
                raise ValueError("differential frame outside DHP pyramid")
            prec, height, width, nf = struct.unpack(">BHHB", body[:6])
            if differential:
                eh, ev = pending_exp
                pending_exp = (0, 0)
                for _ in range(eh):
                    ref = [_expand2x(r, axis=1) for r in ref]
                for _ in range(ev):
                    ref = [_expand2x(r, axis=0) for r in ref]
                ref = [r[:height, :width] for r in ref]
                if any(r.shape != (height, width) for r in ref):
                    raise ValueError("reference smaller than frame")
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for c in range(nf):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if lossless:
                if hmax != 1 or vmax != 1:
                    raise NotImplementedError(
                        "lossless JPEG with subsampled components"
                    )
                samples = [
                    np.zeros((height, width), dtype=np.int64) for _ in comps
                ]
                coef = []  # marks the frame as started
                i += seglen
                continue
            mcux = -(-width // (8 * hmax))
            mcuy = -(-height // (8 * vmax))
            # int64 grids: progressive refinement does bitwise updates
            coef = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
                for c in comps
            ]
        elif marker in (0xC6, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "unsupported JPEG mode: differential progressive (SOF6),"
                " arithmetic lossless (SOF11) and arithmetic differential"
                " frames (SOF13-15) -- baseline/progressive DCT in both"
                " entropy codings, Huffman lossless, and Huffman"
                " hierarchical pyramids (DHP/EXP + SOF5/SOF7) are"
                " implemented"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            j = 0
            while j + 2 <= len(body):
                tc, tb = body[j] >> 4, body[j] & 15
                cs = body[j + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 15, cs >> 4)  # (L, U)
                else:
                    ac_cond[tb] = cs  # Kx
                j += 2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if coef is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c : 3 + 2 * c]
                ci, comp = next(
                    (j, x) for j, x in enumerate(comps) if x["id"] == cs
                )
                scan_comps.append(
                    {**comp, "ci": ci, "dc": tt >> 4, "ac": tt & 15}
                )
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            i += seglen
            segs, i = _entropy_segments(payload, i)
            if lossless:
                _decode_scan_lossless(
                    segs, scan_comps, samples, huff, ss, ahal & 15,
                    restart_interval, width, height,
                    differential=differential,
                )
            elif arith:
                _decode_scan_arith(
                    segs, scan_comps, coef, dc_cond, ac_cond,
                    ss, se, ahal >> 4, ahal & 15,
                    restart_interval, width, height, hmax, vmax,
                    mcux, mcuy,
                )
            else:
                _decode_scan(
                    segs, scan_comps, coef, huff, ss, se,
                    ahal >> 4, ahal & 15,
                    restart_interval, width, height, hmax, vmax,
                    mcux, mcuy, differential=differential,
                )
            n_scans += 1
            frame_scans += 1
            continue
        i += seglen
    if coef is None or n_scans == 0:
        raise ValueError("no SOS/SOF in stream")

    if hier:
        # pyramid output: fold the last frame, return the reference in
        # component space (like lossless mode: T.81 defines the color
        # transform outside the hierarchical reconstruction; our
        # encoder emits grayscale pyramids)
        if frame_scans:
            _finalize_frame()
        planes = [np.clip(r, 0, 255).astype(np.uint8) for r in ref]
        if len(planes) == 1:
            return np.repeat(planes[0][:, :, None], 3, axis=2)
        return np.stack(planes[:3], axis=2)

    if lossless:
        # no DCT and no defined color transform in lossless mode:
        # components are returned verbatim (T.81 Annex H codes raw
        # component samples; DNG-style files carry raw planes)
        planes = [np.clip(s, 0, 255).astype(np.uint8) for s in samples]
        if len(planes) == 1:
            return np.repeat(planes[0][:, :, None], 3, axis=2)
        return np.stack(planes[:3], axis=2)

    # dequantize + IDCT, vectorized per component
    planes = []
    for ci, c in enumerate(comps):
        by, bx, _ = coef[ci].shape
        coefs = coef[ci].reshape(by, bx, 8, 8) * qt[c["tq"]]
        spatial = np.einsum("xu,ncuv,yv->ncxy", _A, coefs, _A) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        y = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _encode_blocks(bw: _BitWriter, blocks: np.ndarray, qtab: np.ndarray,
                   dc_codes: dict, ac_codes: dict, pred: int) -> int:
    """Quantize + entropy-code a (N, 8, 8) run of blocks (one
    component, scan order); returns the updated DC predictor."""
    coefs = np.einsum("ux,nxy,yv->nuv", _A.T, blocks - 128.0, _A)
    q = np.rint(coefs / qtab).astype(np.int64).reshape(-1, 64)[:, _ZZ]
    for row in q:
        diff = int(row[0]) - pred
        pred = int(row[0])
        s = int(abs(diff)).bit_length()
        code, length = dc_codes[s]
        bw.write(code, length)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        nz = np.flatnonzero(row[1:]) + 1
        k = 1
        for idx in nz:
            run = int(idx) - k
            while run >= 16:
                c, ln = ac_codes[0xF0]  # ZRL
                bw.write(c, ln)
                run -= 16
            v = int(row[idx])
            s = abs(v).bit_length()
            c, ln = ac_codes[(run << 4) | s]
            bw.write(c, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            k = int(idx) + 1
        if k < 64:
            c, ln = ac_codes[0x00]  # EOB
            bw.write(c, ln)
    return pred


def encode_jpeg(img: np.ndarray, subsample: str = "444") -> bytes:
    """HxWx3 (RGB) or HxW (grayscale) uint8 -> baseline JFIF bytes
    (tables carried in-stream). ``subsample``: "444" (one block per
    component per MCU) or "420" (16x16 MCU, 2x2-averaged chroma)."""
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    sub420 = subsample == "420" and not gray
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    mcu = 16 if sub420 else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    qts = [_QT_LUMA] + ([] if gray else [_QT_CHROMA, _QT_CHROMA])
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0/JFIF: version 1.1, unitless 1:1 density, no thumbnail
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tq, qtab in enumerate(qts[: 2 if not gray else 1]):
        zz = qtab.reshape(-1)[_ZZ].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    nf = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for c in range(nf):
        hv = 0x22 if (sub420 and c == 0) else 0x11
        sof += bytes([c + 1, hv, 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, th, bits, vals in (
        (0, 0, _DC_BITS, _DC_VALS),
        (1, 0, _AC_BITS, _AC_VALS),
        (0, 1, _DC_BITS, _DC_VALS),
        (1, 1, _AC_BITS, _AC_VALS),
    )[: 2 if gray else 4]:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([nf])
    for c in range(nf):
        t = 0 if c == 0 else 1
        sos += bytes([c + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # pad planes by edge replication; 4:2:0 averages chroma 2x2
    bw = _BitWriter()
    pads = []
    for ci, p in enumerate(planes):
        pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        if sub420 and ci > 0:
            pp = pp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        pads.append(pp)

    def block_at(plane: np.ndarray, by: int, bx: int) -> np.ndarray:
        return plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8][None]

    preds = [0] * nf
    mcux = pw // mcu
    mcuy = ph // mcu
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in range(nf):
            qtab = qts[min(ci, len(qts) - 1)]
            if sub420 and ci == 0:
                for v in range(2):
                    for hh in range(2):
                        preds[ci] = _encode_blocks(
                            bw, block_at(pads[0], my * 2 + v, mx * 2 + hh),
                            qtab, dc_codes, ac_codes, preds[ci],
                        )
            else:
                preds[ci] = _encode_blocks(
                    bw, block_at(pads[ci], my, mx), qtab,
                    dc_codes, ac_codes, preds[ci],
                )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_arithmetic(img: np.ndarray, subsample: str = "444") -> bytes:
    """HxWx3 (RGB) or HxW (grayscale) uint8 -> arithmetic-coded
    sequential JPEG (SOF9, T.81 Annex D QM-coder): same color
    transform, padding and quantization as ``encode_jpeg``, so the
    stream decodes to pixels BIT-IDENTICAL to the baseline Huffman
    stream of the same image (the round-trip gate). Conditioning
    defaults (DC L=0/U=1, AC Kx=5) ride in a DAC segment."""
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    sub420 = subsample == "420" and not gray
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    mcu = 16 if sub420 else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    qts = [_QT_LUMA] + ([] if gray else [_QT_CHROMA, _QT_CHROMA])
    nf = 1 if gray else 3

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tq, qtab in enumerate(qts[: 2 if not gray else 1]):
        zz = qtab.reshape(-1)[_ZZ].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for c in range(nf):
        hv = 0x22 if (sub420 and c == 0) else 0x11
        sof += bytes([c + 1, hv, 0 if c == 0 else 1])
    out += b"\xff\xc9" + struct.pack(">H", 2 + len(sof)) + sof  # SOF9
    # DAC: default conditioning, one DC + one AC entry per table id
    dac = b""
    for t in range(1 if gray else 2):
        dac += bytes([t, 0x10])         # DC table t: U=1, L=0
        dac += bytes([0x10 | t, 5])     # AC table t: Kx=5
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    sos = bytes([nf])
    for c in range(nf):
        t = 0 if c == 0 else 1
        sos += bytes([c + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    pads = []
    for ci, p in enumerate(planes):
        pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        if sub420 and ci > 0:
            pp = pp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        pads.append(pp)

    def quant_rows(plane, by, bx, qtab):
        blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8][None]
        coefs = np.einsum("ux,nxy,yv->nuv", _A.T, blk - 128.0, _A)
        return np.rint(coefs / qtab).astype(np.int64).reshape(-1, 64)[:, _ZZ]

    enc = _ArithEncoder()
    dc_st = {t: bytearray(_DC_STAT_BINS) for t in range(1 if gray else 2)}
    ac_st = {t: bytearray(_AC_STAT_BINS) for t in range(1 if gray else 2)}
    fixed = bytearray([113])
    preds = [0] * nf
    ctxs = [0] * nf

    def code_block(row, ci):
        t = 0 if ci == 0 else 1
        diff = int(row[0]) - preds[ci]
        preds[ci] = int(row[0])
        ctxs[ci] = _arith_encode_dc(enc, dc_st[t], ctxs[ci], diff, 0, 1)
        _arith_encode_ac(enc, ac_st[t], fixed, row, 5)

    mcux = pw // mcu
    mcuy = ph // mcu
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in range(nf):
            qtab = qts[min(ci, len(qts) - 1)]
            if sub420 and ci == 0:
                for v in range(2):
                    for hh in range(2):
                        code_block(
                            quant_rows(pads[0], my * 2 + v, mx * 2 + hh,
                                       qtab)[0], ci,
                        )
            else:
                code_block(quant_rows(pads[ci], my, mx, qtab)[0], ci)
    # marker byte-stuffing on the finished scan (0xFF -> 0xFF 0x00)
    out += enc.flush().replace(b"\xff", b"\xff\x00")
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G, Huffman)
# ---------------------------------------------------------------------------

def _encode_ac_first_block(bw, vzz, ss, se, al, ac_codes) -> None:
    """First (Ah=0) AC scan of one block's [ss, se] band at point
    transform ``al``: classic run/size coding of the shifted magnitudes;
    end-of-band is always EOB0 (legal, marginally less compact than
    EOBn runs)."""
    r = 0
    for k in range(ss, se + 1):
        t = int(vzz[k])
        a = abs(t) >> al
        if a == 0:
            r += 1
            continue
        while r > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            r -= 16
        s = a.bit_length()
        c, ln = ac_codes[(r << 4) | s]
        bw.write(c, ln)
        vv = a if t > 0 else -a
        bw.write(vv if vv >= 0 else vv + (1 << s) - 1, s)
        r = 0
    if r > 0:
        c, ln = ac_codes[0x00]  # EOB0
        bw.write(c, ln)


def _encode_ac_refine_block(bw, vzz, ss, se, al, ac_codes) -> None:
    """Refinement (Ah=al+1) AC scan of one block (T.81 G.1.2.3, the
    jpeglib buffered-correction-bit structure): newly-nonzero
    coefficients emit (run|1)+sign, already-nonzero ones a single
    correction bit appended after the next emitted symbol. Correction
    bits are only ever buffered while the pending zero-run is <= 15, so
    each ZRL's appended bits are exactly the ones the decoder's 16-skip
    walk consumes."""
    av = [abs(int(vzz[k])) >> al for k in range(se + 1)]
    eob = 0  # last newly-nonzero index; trailing runs fold into EOB
    for k in range(ss, se + 1):
        if av[k] == 1:
            eob = k
    r = 0
    pending: list[int] = []
    for k in range(ss, se + 1):
        if av[k] == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            r -= 16
            for b in pending:
                bw.write(b, 1)
            pending = []
        if av[k] > 1:  # history nonzero: correction bit only
            pending.append(av[k] & 1)
            continue
        c, ln = ac_codes[(r << 4) | 1]
        bw.write(c, ln)
        bw.write(1 if int(vzz[k]) > 0 else 0, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        c, ln = ac_codes[0x00]  # EOB0; decoder tail-corrects the band
        bw.write(c, ln)
        for b in pending:
            bw.write(b, 1)


def encode_jpeg_progressive(img: np.ndarray) -> bytes:
    """HxWx3 (RGB) or HxW (grayscale) uint8 -> progressive JFIF (SOF2)
    bytes, 4:4:4 sampling. The scan script exercises BOTH Annex-G
    dimensions: an interleaved DC-first scan at point transform 1 + a
    DC refinement scan, then per component spectral-selection AC bands
    (1-5, 6-63) at point transform 1 followed by their refinement scans
    to full precision. The quantized coefficients are identical to
    ``encode_jpeg``'s, so decoding both streams yields bit-identical
    pixels."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    nf = len(planes)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    qts = [_QT_LUMA] + ([] if gray else [_QT_CHROMA, _QT_CHROMA])
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

    # quantized zigzag coefficients per component, block raster order --
    # the SAME quantization as encode_jpeg (bit-identical decode)
    comp_q: list[np.ndarray] = []
    for ci, p in enumerate(planes):
        pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        blocks = (
            pp.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coefs = np.einsum("ux,nxy,yv->nuv", _A.T, blocks - 128.0, _A)
        q = (
            np.rint(coefs / qts[min(ci, len(qts) - 1)])
            .astype(np.int64)
            .reshape(-1, 64)[:, _ZZ]
        )
        comp_q.append(q)
    n_blocks = len(comp_q[0])

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tq, qtab in enumerate(qts[: 2 if not gray else 1]):
        zz = qtab.reshape(-1)[_ZZ].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for c in range(nf):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    for tc, th, bits, vals in (
        (0, 0, _DC_BITS, _DC_VALS),
        (1, 0, _AC_BITS, _AC_VALS),
        (0, 1, _DC_BITS, _DC_VALS),
        (1, 1, _AC_BITS, _AC_VALS),
    )[: 2 if gray else 4]:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def sos(comp_list: list[int], ss: int, se: int, ah: int, al: int):
        body = bytes([len(comp_list)])
        for ci in comp_list:
            t = 0 if ci == 0 else 1
            body += bytes([ci + 1, (t << 4) | t])
        body += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body)

    all_comps = list(range(nf))
    # scan 1: DC first, interleaved, point transform 1
    sos(all_comps, 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * nf
    for m in range(n_blocks):
        for ci in range(nf):
            vv = int(comp_q[ci][m, 0]) >> 1
            diff = vv - preds[ci]
            preds[ci] = vv
            s = abs(diff).bit_length()
            c, ln = dc_codes[s]
            bw.write(c, ln)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    out += bw.flush()
    # scan 2: DC refinement (raw bit 0 per block, no Huffman)
    sos(all_comps, 0, 0, 1, 0)
    bw = _BitWriter()
    for m in range(n_blocks):
        for ci in range(nf):
            bw.write(int(comp_q[ci][m, 0]) & 1, 1)
    out += bw.flush()
    # per component: spectral-selection AC bands, first then refine
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(nf):
            sos([ci], ss, se, 0, 1)
            bw = _BitWriter()
            for m in range(n_blocks):
                _encode_ac_first_block(bw, comp_q[ci][m], ss, se, 1, ac_codes)
            out += bw.flush()
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(nf):
            sos([ci], ss, se, 1, 0)
            bw = _BitWriter()
            for m in range(n_blocks):
                _encode_ac_refine_block(bw, comp_q[ci][m], ss, se, 0, ac_codes)
            out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive_arithmetic(img: np.ndarray) -> bytes:
    """HxWx3 (RGB) or HxW (grayscale) uint8 -> progressive
    arithmetic-coded JFIF (SOF10, T.81 Annex G.2), 4:4:4 sampling,
    with the SAME scan script as ``encode_jpeg_progressive`` (DC first
    + refine, per-component AC bands 1-5 / 6-63 at point transform 1 +
    refinement scans) and the SAME quantization as ``encode_jpeg``, so
    all three streams decode to bit-identical pixels. Statistics reset
    per scan; each scan's entropy segment is byte-stuffed."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    nf = len(planes)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    qts = [_QT_LUMA] + ([] if gray else [_QT_CHROMA, _QT_CHROMA])

    comp_q: list[np.ndarray] = []
    for ci, p in enumerate(planes):
        pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        blocks = (
            pp.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coefs = np.einsum("ux,nxy,yv->nuv", _A.T, blocks - 128.0, _A)
        q = (
            np.rint(coefs / qts[min(ci, len(qts) - 1)])
            .astype(np.int64)
            .reshape(-1, 64)[:, _ZZ]
        )
        comp_q.append(q)
    n_blocks = len(comp_q[0])

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tq, qtab in enumerate(qts[: 2 if not gray else 1]):
        zz = qtab.reshape(-1)[_ZZ].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for c in range(nf):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xca" + struct.pack(">H", 2 + len(sof)) + sof  # SOF10
    dac = b""
    for t in range(1 if gray else 2):
        dac += bytes([t, 0x10])       # DC table t: U=1, L=0
        dac += bytes([0x10 | t, 5])   # AC table t: Kx=5
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac

    def sos(comp_list: list[int], ss: int, se: int, ah: int, al: int):
        body = bytes([len(comp_list)])
        for ci in comp_list:
            t = 0 if ci == 0 else 1
            body += bytes([ci + 1, (t << 4) | t])
        body += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body)

    def fresh_scan():
        return (
            _ArithEncoder(),
            {t: bytearray(_DC_STAT_BINS) for t in range(1 if gray else 2)},
            {t: bytearray(_AC_STAT_BINS) for t in range(1 if gray else 2)},
            bytearray([113]),
        )

    all_comps = list(range(nf))
    # scan 1: DC first, interleaved, point transform 1
    sos(all_comps, 0, 0, 0, 1)
    enc, dc_st, ac_st, fixed = fresh_scan()
    preds = [0] * nf
    ctxs = [0] * nf
    for m in range(n_blocks):
        for ci in range(nf):
            t = 0 if ci == 0 else 1
            vv = int(comp_q[ci][m, 0]) >> 1
            ctxs[ci] = _arith_encode_dc(
                enc, dc_st[t], ctxs[ci], vv - preds[ci], 0, 1
            )
            preds[ci] = vv
    out += enc.flush().replace(b"\xff", b"\xff\x00")
    # scan 2: DC refinement (one fixed-bin bit per block)
    sos(all_comps, 0, 0, 1, 0)
    enc, dc_st, ac_st, fixed = fresh_scan()
    for m in range(n_blocks):
        for ci in range(nf):
            enc.encode(fixed, 0, int(comp_q[ci][m, 0]) & 1)
    out += enc.flush().replace(b"\xff", b"\xff\x00")
    # per component: spectral-selection AC bands, first then refine
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(nf):
            t = 0 if ci == 0 else 1
            sos([ci], ss, se, 0, 1)
            enc, dc_st, ac_st, fixed = fresh_scan()
            for m in range(n_blocks):
                _arith_encode_ac(
                    enc, ac_st[t], fixed, comp_q[ci][m], 5, ss, se, 1
                )
            out += enc.flush().replace(b"\xff", b"\xff\x00")
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(nf):
            t = 0 if ci == 0 else 1
            sos([ci], ss, se, 1, 0)
            enc, dc_st, ac_st, fixed = fresh_scan()
            for m in range(n_blocks):
                _arith_encode_ac_refine(
                    enc, ac_st[t], fixed, comp_q[ci][m], ss, se, 0
                )
            out += enc.flush().replace(b"\xff", b"\xff\x00")
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_lossless(img: np.ndarray, predictor: int = 4) -> bytes:
    """HxWx3 (RGB) or HxW (grayscale) uint8 -> LOSSLESS JPEG (SOF3,
    T.81 Annex H): per-sample prediction (selector 1-7) + DC-category
    Huffman-coded differences, components carried verbatim (no color
    transform and no quantization -- T.81 defines none for lossless),
    so ``decode_jpeg`` reconstructs the EXACT input array."""
    if not 1 <= predictor <= 7:
        raise ValueError("predictor selector must be in 1..7")
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    planes = [img] if gray else [img[:, :, c] for c in range(3)]
    nf = len(planes)
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for c in range(nf):
        sof += bytes([c + 1, 0x11, 0])  # h=v=1, no quantization table
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof  # SOF3
    body = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([nf])
    for c in range(nf):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, 0])  # Ss=selector, Se=0, Ah/Al=0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    p1 = 1 << 7
    smps = [p.astype(np.int64) for p in planes]
    for y in range(h):
        for x in range(w):
            for smp in smps:
                px = _lossless_predict(smp, y, x, predictor, p1)
                diff = int(smp[y, x]) - px
                s = abs(diff).bit_length()
                code, length = dc_codes[s]
                bw.write(code, length)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_hierarchical(img: np.ndarray, refine: str = "lossless") -> bytes:
    """HxW (grayscale) uint8 -> hierarchical JPEG (T.81 Annex J): DHP,
    a half-resolution baseline (SOF0) frame, EXP, then ONE full-
    resolution differential refinement frame.

    ``refine="lossless"`` emits a differential LOSSLESS frame (SOF7) --
    the classic lossy-base + lossless-refinement pyramid, so
    ``decode_jpeg`` reconstructs the EXACT input array (the round-trip
    gate in tests/test_jpeg.py) while a resolution-limited consumer can
    stop after the embedded half-res frame. ``refine="dct"`` emits a
    differential sequential DCT frame (SOF5, unit quantization): the
    reconstruction is near-exact (DCT rounding only) and the stream
    exercises the zero-DC-prediction differential Huffman path.

    The encoder computes the reference EXACTLY as the decoder will --
    by decoding its own base frame and applying the J.1.1.2 expansion
    -- so the coded corrections are bit-consistent with reconstruction."""
    if refine not in ("lossless", "dct"):
        raise ValueError("refine must be 'lossless' or 'dct'")
    img = np.asarray(img)
    if img.ndim != 2:
        raise ValueError("hierarchical encoder takes a 2-D grayscale array")
    h, w = img.shape
    hh, hw = -(-h // 2), -(-w // 2)
    pad = np.pad(img, ((0, 2 * hh - h), (0, 2 * hw - w)), mode="edge")
    pi = pad.astype(np.int64)
    half = ((pi[0::2, 0::2] + pi[0::2, 1::2] + pi[1::2, 0::2]
             + pi[1::2, 1::2] + 2) >> 2).astype(np.uint8)
    base = encode_jpeg(half)  # SOI..EOI, gray baseline, tables in-stream
    # reference = decoder's view of the base frame, EXP-expanded, cropped
    ref = decode_jpeg(base)[:, :, 0].astype(np.int64)
    ref = _expand2x(ref, axis=1)
    ref = _expand2x(ref, axis=0)
    ref = ref[:h, :w]
    diff = img.astype(np.int64) - ref  # in [-255, 255]

    out = bytearray(b"\xff\xd8")  # SOI
    dhp = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xde" + struct.pack(">H", 2 + len(dhp)) + dhp  # DHP
    out += base[2:-2]  # base frame: strip its SOI/EOI, keep tables+scan
    out += b"\xff\xdf" + struct.pack(">H", 3) + bytes([0x11])  # EXP h+v

    if refine == "lossless":
        sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
        out += b"\xff\xc7" + struct.pack(">H", 2 + len(sof)) + sof  # SOF7
        body = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        sos = bytes([1, 1, 0x00, 0, 0, 0])  # 1 comp; Ss=0 (differential)
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
        bw = _BitWriter()
        for d in diff.ravel():
            d = int(d)
            s = abs(d).bit_length()
            code, length = dc_codes[s]
            bw.write(code, length)
            if s:
                bw.write(d if d >= 0 else d + (1 << s) - 1, s)
        out += bw.flush()
    else:  # differential sequential DCT, unit quantization
        bh, bwid = -(-h // 8) * 8, -(-w // 8) * 8
        dpad = np.zeros((bh, bwid), dtype=np.float64)
        dpad[:h, :w] = diff
        blocks = (
            dpad.reshape(bh // 8, 8, bwid // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        ones = np.ones((8, 8), dtype=np.int64)
        qseg = bytes([1]) + bytes(np.asarray(ones, dtype=np.uint8)[
            np.unravel_index(_ZZ, (8, 8))].tolist())
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(qseg)) + qseg
        sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 1])
        out += b"\xff\xc5" + struct.pack(">H", 2 + len(sof)) + sof  # SOF5
        for tc, th, bits, vals in (
            (0, 0, _DC_BITS, _DC_VALS), (1, 0, _AC_BITS, _AC_VALS),
        ):
            body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        sos = bytes([1, 1, 0x00, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
        ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
        bw = _BitWriter()
        # differential frames: no level shift, DC prediction fixed at 0
        coefs = np.einsum("ux,nxy,yv->nuv", _A.T, blocks, _A)
        q = np.rint(coefs).astype(np.int64).reshape(-1, 64)[:, _ZZ]
        for row in q:
            d = int(row[0])
            s = abs(d).bit_length()
            code, length = dc_codes[s]
            bw.write(code, length)
            if s:
                bw.write(d if d >= 0 else d + (1 << s) - 1, s)
            nz = np.flatnonzero(row[1:]) + 1
            k = 1
            for idx in nz:
                run = int(idx) - k
                while run >= 16:
                    c, ln = ac_codes[0xF0]
                    bw.write(c, ln)
                    run -= 16
                v = int(row[idx])
                s = abs(v).bit_length()
                c, ln = ac_codes[(run << 4) | s]
                bw.write(c, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                k = int(idx) + 1
            if k < 64:
                c, ln = ac_codes[0x00]
                bw.write(c, ln)
        out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
