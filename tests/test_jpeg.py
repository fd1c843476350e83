"""Pure-numpy baseline JPEG codec tests (functions/jpeg.py).

The decoder reads every table it uses from the file (DQT/DHT), so decode
correctness does not depend on the repo's Annex-K constants; the constants
only shape the encoder's streams and are validated here for canonical-
Huffman consistency. Round trips assert tight bounds on smooth content
(JPEG is lossy; DC-only content is near-exact) and a PIL differential gate
runs wherever PIL exists.
"""

import numpy as np
import pyarrow as pa
import pytest

from plakar_ray.functions import jpeg


def _smooth(h, w, seed=0):
    """Deterministic smooth RGB test image (low AC energy)."""
    yy = np.linspace(0, 255, h)[:, None]
    xx = np.linspace(0, 255, w)[None, :]
    r = xx.repeat(h, 0)[:h]
    g = yy.repeat(w, 1)[:, :w]
    b = (xx + yy) / 2
    return np.stack([r, g, b], -1).astype(np.uint8)


def _decode(enc: bytes):
    return jpeg.decode_jpeg(np.frombuffer(enc, np.uint8))


def test_annex_k_tables_are_valid_canonical_huffman():
    for bits, vals in (jpeg.HUFF_DC_LUMA, jpeg.HUFF_DC_CHROMA,
                       jpeg.HUFF_AC_LUMA, jpeg.HUFF_AC_CHROMA):
        lut_val, lut_len = jpeg.build_decode_lut(bits, vals)  # raises if bad
        # every symbol reachable, prefix-free by construction
        assert sum(bits) == len(vals)
        reachable = set(int(v) for v, l in zip(lut_val, lut_len) if l > 0)
        assert reachable == set(vals)
    # DC tables carry the 12 size categories, AC the 162 run/size symbols
    assert len(jpeg.HUFF_DC_LUMA[1]) == 12
    assert len(jpeg.HUFF_DC_CHROMA[1]) == 12
    assert len(jpeg.HUFF_AC_LUMA[1]) == 162
    assert len(jpeg.HUFF_AC_CHROMA[1]) == 162


def test_solid_color_near_exact():
    px = np.full((32, 48, 3), [120, 60, 200], dtype=np.uint8)
    w, h, c, dec = _decode(jpeg.encode_jpeg(px, quality=95))
    assert (w, h, c) == (48, 32, 3)
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 2


def test_smooth_gradient_roundtrip_psnr():
    px = _smooth(64, 80)
    w, h, c, dec = _decode(jpeg.encode_jpeg(px, quality=92))
    assert (w, h, c) == (80, 64, 3)
    err = dec.astype(float) - px.astype(float)
    psnr = 10 * np.log10(255.0 ** 2 / max((err ** 2).mean(), 1e-9))
    assert psnr > 40
    assert np.abs(err).max() <= 8


def test_grayscale_and_odd_dimensions():
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    # upsample noise to a smooth 37x53 field
    g = np.kron(base, np.ones((8, 8), np.uint8))[:37, :53]
    w, h, c, dec = _decode(jpeg.encode_jpeg(g, quality=95))
    assert (w, h, c) == (53, 37, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 12


def test_420_subsampling_and_restart_markers():
    px = _smooth(50, 70, seed=3)  # not multiples of 16: exercises MCU pad
    enc_plain = jpeg.encode_jpeg(px, quality=92, subsampling="420")
    enc_dri = jpeg.encode_jpeg(px, quality=92, subsampling="420",
                               restart_interval=3)
    assert b"\xff\xdd" in enc_dri and b"\xff\xd0" in enc_dri
    w, h, c, dec_plain = _decode(enc_plain)
    w2, h2, c2, dec_dri = _decode(enc_dri)
    assert (w, h, c) == (70, 50, 3) == (w2, h2, c2)
    # restart intervals change the byte stream, never the decoded pixels
    assert np.array_equal(dec_plain, dec_dri)
    err = np.abs(dec_plain.astype(int) - px.astype(int))
    assert err.max() <= 16  # chroma is half-resolution on purpose


def test_quality_knob_moves_size_and_error():
    px = _smooth(48, 48)
    hi = jpeg.encode_jpeg(px, quality=95)
    lo = jpeg.encode_jpeg(px, quality=20)
    assert len(lo) < len(hi)
    _, _, _, dec_hi = _decode(hi)
    _, _, _, dec_lo = _decode(lo)
    e_hi = np.abs(dec_hi.astype(int) - px.astype(int)).mean()
    e_lo = np.abs(dec_lo.astype(int) - px.astype(int)).mean()
    assert e_hi <= e_lo


def test_malformed_streams_raise():
    px = _smooth(16, 16)
    good = jpeg.encode_jpeg(px, quality=90)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(np.frombuffer(b"\xff\xd8\xff\xe0junk", np.uint8))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(np.frombuffer(good[:40], np.uint8))  # no SOS
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(np.frombuffer(b"notajpeg", np.uint8))
    # flipping the SOF marker to lossless must hit the honest gate
    lossless = bytearray(good)
    sof = lossless.find(b"\xff\xc0")
    lossless[sof + 1] = 0xC3
    with pytest.raises(ValueError, match="lossless"):
        jpeg.decode_jpeg(np.frombuffer(bytes(lossless), np.uint8))
    # flipping it to SOF2 leaves a baseline scan header that is illegal in
    # progressive mode (full-band interleaved scan) — still a clean error
    prog = bytearray(good)
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(np.frombuffer(bytes(prog), np.uint8))


def test_decode_reads_tables_from_file_not_constants():
    """A stream quantized with non-Annex-K tables still decodes right."""
    px = _smooth(32, 32)
    enc = jpeg.encode_jpeg(px, quality=100)  # quality 100 -> q=1 everywhere
    _, _, _, dec = _decode(enc)
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 3


def test_strict_media_stage_decodes_jpeg_natively():
    from plakar_ray.stages.media import DecodeImageStage

    px = _smooth(40, 56)
    t = pa.table({
        "media_id": pa.array([1], type=pa.int64()),
        "payload": pa.array([jpeg.encode_jpeg(px, quality=90)],
                            type=pa.binary()),
    })
    out = DecodeImageStage(strict=True)(t)
    assert out.column("width").to_pylist() == [56]
    assert out.column("height").to_pylist() == [40]
    assert out.column("channels").to_pylist() == [3]
    feat = np.array(out.column("feat").to_pylist()[0])
    assert feat.shape == (16,) and abs(feat.sum() - 1.0) < 1e-9
    # the feature is the real pixel histogram, not the payload fake
    w, h, c, dec = _decode(jpeg.encode_jpeg(px, quality=90))
    hist = np.bincount((dec.reshape(-1) >> 4), minlength=16).astype(float)
    assert np.allclose(feat, hist / hist.sum())


def _prog_cases():
    rng = np.random.default_rng(5)
    noise = np.kron(rng.integers(0, 256, (6, 7, 3), dtype=np.uint8),
                    np.ones((8, 8, 1), np.uint8))[:45, :51]
    return [
        ("smooth444", _smooth(64, 80), "444", 0),
        ("smooth420", _smooth(50, 70), "420", 0),
        ("blocknoise", noise, "444", 0),
        ("gray", noise[:37, :39, 0], "444", 0),
        ("dri420", _smooth(40, 40), "420", 2),
        ("hardnoise", rng.integers(0, 256, (24, 24, 3), dtype=np.uint8),
         "444", 0),
    ]


def test_progressive_equals_baseline_bit_for_bit():
    """Both encoders emit the same quantized coefficients, so decoding a
    progressive stream must reproduce the baseline decode EXACTLY — the
    strongest internal oracle for the progressive entropy layer."""
    for name, px, sub, dri in _prog_cases():
        for q in (30, 75, 95):
            kw = dict(quality=q, subsampling=sub, restart_interval=dri)
            base = jpeg.encode_jpeg(px, **kw)
            prog = jpeg.encode_jpeg_progressive(px, **kw)
            assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog[2:4]
            db = _decode(base)
            dp = _decode(prog)
            assert db[:3] == dp[:3], (name, q)
            assert np.array_equal(db[3], dp[3]), (name, q)


def test_progressive_randomized_sweep():
    """Randomized sparse/dense images across qualities — identity with the
    baseline decode on every one (hits long ZRL runs, EOB runs spanning
    blocks, multi-level refinement)."""
    rng = np.random.default_rng(17)
    for trial in range(20):
        h = int(rng.integers(8, 49))
        w = int(rng.integers(8, 49))
        kind = trial % 3
        if kind == 0:  # sparse high-frequency spikes
            px = np.full((h, w, 3), 128, np.uint8)
            for _ in range(6):
                px[rng.integers(0, h), rng.integers(0, w)] = rng.integers(
                    0, 256, 3)
        elif kind == 1:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        else:
            base = rng.integers(0, 256, (max(h // 8, 1), max(w // 8, 1), 3),
                                dtype=np.uint8)
            px = np.kron(base, np.ones((8, 8, 1), np.uint8))[:h, :w]
        q = int(rng.choice([25, 60, 90, 100]))
        sub = "420" if trial % 2 else "444"
        base_s = jpeg.encode_jpeg(px, quality=q, subsampling=sub)
        prog_s = jpeg.encode_jpeg_progressive(px, quality=q, subsampling=sub)
        assert np.array_equal(_decode(base_s)[3], _decode(prog_s)[3]), trial


def test_ac_refinement_unit_roundtrip():
    """Encoder->decoder round trip at the coefficient level for the AC
    refinement scan (T.81 G.1.2.3) on crafted blocks that force the corner
    cases: ZRL with correction bits interleaved, runs ending exactly at the
    band edge, EOB runs spanning blocks with pending correction bits."""
    ss, se, al = 1, 63, 0
    zz = jpeg.ZIGZAG
    ac_codes = jpeg._encode_codes(*jpeg._PROG_AC_HUFF)
    lut = jpeg.build_decode_lut(*jpeg._PROG_AC_HUFF)

    def craft(spec):
        """spec: {zigzag_index: full_value}; returns full-coef zigzag array."""
        full = np.zeros(64, np.int32)
        for k, v in spec.items():
            full[k] = v
        return full

    cases = [
        # newly-nonzero after a >16-zero run with corrections inside it
        craft({1: 5, 2: -7, 30: 1, 63: -1}),
        # corrections only (everything already nonzero at al+1)
        craft({k: 4 + (k % 3) for k in range(1, 20)}),
        # empty band (pure EOB run)
        craft({}),
        # newly-nonzero at the very last band position
        craft({63: -1}),
        # dense mix
        craft({k: (-1) ** k * (1 + k % 5) for k in range(1, 64, 3)}),
        # two ZRLs back-to-back before a hit, corrections sprinkled
        craft({5: 3, 40: 1}),
        craft({2: 2, 36: -1, 50: 1}),
    ]
    rng = np.random.default_rng(23)
    for _ in range(30):
        spec = {int(k): int(rng.integers(-9, 10)) or 1
                for k in rng.choice(np.arange(1, 64), rng.integers(0, 12),
                                    replace=False)}
        cases.append(craft(spec))

    def approx(full, bits):
        out = np.zeros(64, np.int32)
        mag = np.abs(full) >> bits << bits
        out = np.where(full >= 0, mag, -mag).astype(np.int32)
        return out

    # encode all blocks as one scan
    w = jpeg._ProgScanWriter(ac_codes)
    for full in cases:
        jpeg._prog_ac_refine(w, full, ss, se, al)
    scan = bytearray()
    w.finish(scan)

    # decode into blocks pre-seeded with the al+1 approximation
    br = jpeg._BitReader(bytes(scan))
    eobrun = 0
    for full in cases:
        prev_zz = approx(full, al + 1)
        want_zz = approx(full, al)
        block = np.zeros(64, np.int32)  # natural order
        block[zz] = prev_zz
        eobrun = jpeg._refine_ac(br, block, lut, ss, se, al, eobrun, zz)
        got_zz = block[zz]
        assert np.array_equal(got_zz[ss:se + 1], want_zz[ss:se + 1]), full


def test_mjpeg_avi_frame_sample_and_decode():
    """MJPEG-in-AVI is REAL video for this repo: the RIFF walker yields the
    container's actual frame chunks, each a complete JPEG, and the
    sample-then-decode pipeline recovers every sampled frame's pixels."""
    import pyarrow.compute  # noqa: F401

    from plakar_ray.functions import codecs
    from plakar_ray.stages.media import DecodeImageStage, FrameSampleStage

    frames_px = [np.full((24, 32, 3), [i * 25 % 256, 100, 200], np.uint8)
                 for i in range(9)]
    frames = [jpeg.encode_jpeg(p, quality=90) for p in frames_px]
    avi = codecs.encode_avi_mjpeg(frames, 32, 24, fps=5)
    buf = np.frombuffer(avi, np.uint8)
    assert codecs.sniff(buf) == "avi"
    spans = codecs.avi_frame_spans(buf)
    assert [bytes(buf[o:o + s]) for o, s in spans] == frames

    t = pa.table({
        "media_id": pa.array([7], type=pa.int64()),
        "payload": pa.array([avi], type=pa.binary()),
    })
    sampled = FrameSampleStage(every=2)(t)
    assert sampled.column("frame_idx").to_pylist() == [0, 2, 4, 6, 8]
    # every sampled frame decodes through the strict image stage
    decoded = DecodeImageStage(strict=True)(pa.table({
        "media_id": sampled.column("frame_idx").cast(pa.int64()),
        "payload": sampled.column("frame"),
    }))
    assert decoded.column("width").to_pylist() == [32] * 5
    assert decoded.column("height").to_pylist() == [24] * 5
    # pixel identity with a direct decode of the source JPEG
    for row, fi in enumerate(sampled.column("frame_idx").to_pylist()):
        got = _decode(sampled.column("frame").to_pylist()[row])[3]
        want = _decode(frames[fi])[3]
        assert np.array_equal(got, want)

    # non-AVI payloads keep the byte-slicing fallback
    blob = pa.table({
        "media_id": pa.array([1], type=pa.int64()),
        "payload": pa.array([b"\x01" * 4096 * 3], type=pa.binary()),
    })
    legacy = FrameSampleStage(every=1)(blob)
    assert legacy.column("frame_idx").to_pylist() == [0, 1, 2]
    assert all(len(f) == 4096 for f in legacy.column("frame").to_pylist())

    # malformed AVI chunk tree raises
    bad = bytearray(avi)
    bad[16:20] = (2 ** 31 - 1).to_bytes(4, "little")  # absurd chunk size
    with pytest.raises(ValueError):
        codecs.avi_frame_spans(np.frombuffer(bytes(bad), np.uint8))


def test_pil_differential():
    """Where PIL exists, its decode of our stream must agree closely."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    px = _smooth(64, 64)
    for enc in (jpeg.encode_jpeg(px, quality=92),
                jpeg.encode_jpeg_progressive(px, quality=92)):
        ours = _decode(enc)[3]
        theirs = np.asarray(PIL.open(io.BytesIO(enc)).convert("RGB"))
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 2
