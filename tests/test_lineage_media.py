"""Lineage/checkpoint-resume, multimodal stubs, pages invariants, CLI."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest


def test_lineage_resume(ray_session, tmp_path):
    from plakar_ray.state.lineage import LineageLog, Partition, digest_of, run_stage

    calls_file = tmp_path / "calls.txt"

    def fn(payload):
        with open(calls_file, "a") as f:
            f.write(f"{payload}\n")
        return pa.table({"x": pa.array([payload] * 3, type=pa.int64())})

    parts = [Partition(f"p{i:02d}", i, digest_of("stage1", i)) for i in range(6)]
    root = str(tmp_path / "ckpt")
    ds, skipped, ran = run_stage(root, "stage1", parts, fn)
    assert (skipped, ran) == (0, 6)
    assert ds.count() == 18

    # Simulate a partial failure: drop two manifests -> only those re-run.
    log = LineageLog(root, "stage1")
    os.remove(log._mpath("p01"))
    os.remove(log._mpath("p04"))
    ds2, skipped2, ran2 = run_stage(root, "stage1", parts, fn)
    assert (skipped2, ran2) == (4, 2)
    assert ds2.count() == 18
    # Input change invalidates exactly that partition.
    parts2 = list(parts)
    parts2[0] = Partition("p00", 100, digest_of("stage1", 100))
    ds3, skipped3, ran3 = run_stage(root, "stage1", parts2, fn)
    assert (skipped3, ran3) == (5, 1)
    m = log.manifest()
    assert len(m) == 6
    assert all(set(r) >= {"stage", "partition_id", "input_digest", "row_count", "wall_s"} for r in m)


def _media_table(n=10, seed=3):
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(1000, 40000, n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array(["image"] * n),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def test_decode_image_stage(ray_session):
    import ray.data

    from plakar_ray.stages.media import DecodeImageStage, decode_images

    t = _media_table()
    out = decode_images(ray.data.from_arrow(t), batch_size=4).to_pandas().sort_values("media_id")
    assert list(out.columns) == ["media_id", "width", "height", "channels", "feat"]
    assert len(out) == 10
    assert (out.width >= 16).all() and (out.channels <= 4).all()
    # Deterministic: direct call == pipeline result.
    direct = DecodeImageStage()(t).to_pandas().sort_values("media_id")
    assert (np.stack(out.feat.values) == np.stack(direct.feat.values)).all()
    # Strict mode raises (no PIL in this environment).
    if not DecodeImageStage(strict=True).has_pil:
        with pytest.raises(NotImplementedError):
            DecodeImageStage(strict=True)(t)


def test_audio_and_frames(ray_session):
    from plakar_ray.stages.media import AudioFeatureStage, FrameSampleStage

    t = _media_table(6)
    audio = AudioFeatureStage()(t)
    assert audio.num_rows == 6
    frames = FrameSampleStage(frame_bytes=1000, every=2)(t)
    assert frames.num_rows > 0
    assert set(frames.column_names) == {"media_id", "frame_idx", "frame"}
    assert all(len(f) == 1000 for f in frames.column("frame").to_pylist())


def test_pages_text_identity(ray_session, tmp_path):
    """Per-url extracted text must be byte-identical to the input text —
    the driver's per-row invariant, frozen as sha256 per url."""
    import hashlib

    import pyarrow.parquet as pq
    import ray.data

    from plakar_ray.pipelines.pages import extract_text_batch, read_pages, text_digests
    from plakar_ray.sources.pages import synthesize_pages

    pages, _ = synthesize_pages(n_pages=100, seed=9)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, path)
    ds = read_pages(path).map_batches(extract_text_batch, batch_format="pyarrow")
    got = text_digests(ds)
    want = {
        u: hashlib.sha256(t.encode()).hexdigest()
        for u, t in zip(pages.column("url").to_pylist(), pages.column("text").to_pylist())
    }
    for u, d in zip(got.column("url").to_pylist(), got.column("text_sha256").to_pylist()):
        assert want[u] == d
    assert got.num_rows == 100


def test_page_clusters(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from plakar_ray.pipelines.pages import page_near_dup_clusters, read_pages
    from plakar_ray.opts import ChunkerOpts
    from plakar_ray.sources.pages import synthesize_pages

    pages, expected = synthesize_pages(n_pages=200, seed=11)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, path)
    urls = pages.column("url").to_pylist()
    cl = page_near_dup_clusters(
        read_pages(path), "fastcdc-v1.0.0", ChunkerOpts(64, 2048, 256)
    )
    by_url = dict(zip(cl.column("url").to_pylist(), cl.column("cluster_url").to_pylist()))
    exact = [
        (urls[a], urls[b])
        for a, b, k in zip(
            expected.column("id_a").to_pylist(),
            expected.column("id_b").to_pylist(),
            expected.column("kind").to_pylist(),
        )
        if k == "exact"
    ]
    assert exact
    for ua, ub in exact:
        assert by_url.get(ua, ua) == by_url.get(ub, ub)


def test_cli_analyze(ray_session, tmp_path, capsys):
    # CLI shares the session-scoped ray (guarded init); run analyze on a tiny
    # parquet table.
    import pyarrow.parquet as pq

    from plakar_ray import cli

    t = pa.table(
        {
            "doc_id": pa.array(range(8), type=pa.int64()),
            "text": pa.array(["hello world " * 50] * 8),
        }
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(t, path)
    code = cli.main(["analyze", "--input", path, "--min", "64", "--avg", "128", "--max", "512",
                     "--algo", "fastcdc-v1.0.0"])
    out = capsys.readouterr().out
    assert code == 0
    assert "dedup_ratio" in out


def test_cli_compare_resync_cluster(ray_session, tmp_path, capsys):
    import pyarrow.parquet as pq

    from plakar_ray import cli

    rng = np.random.default_rng(8)
    texts = ["".join(chr(97 + c) for c in rng.integers(0, 26, 5000)) for _ in range(10)]
    t = pa.table(
        {
            "doc_id": pa.array(range(20), type=pa.int64()),
            "text": pa.array(texts + texts),
        }
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(t, path)
    size = ["--min", "64", "--avg", "256", "--max", "2048"]

    assert cli.main(["compare", "--input", path, "--a", "fastcdc-v1.0.0",
                     "--b", "ultracdc", *size]) in (0, 1)
    out = capsys.readouterr().out
    assert "dedup_ratio" in out

    assert cli.main(["resync", "--input", path, "--algo", "fastcdc-v1.0.0",
                     "--edits", "2", *size]) == 0
    assert "mean_shared_frac" in capsys.readouterr().out

    outp = str(tmp_path / "clusters.parquet")
    assert cli.main(["cluster", "--input", path, "--algo", "fastcdc-v1.0.0",
                     *size, "--out", outp]) == 0
    cl = pq.read_table(outp)
    # duplicated corpus: every doc pairs with its twin
    assert cl.num_rows == 20


# ---------------------------------------------------------- real codecs


def test_codec_roundtrips():
    """Pure-numpy codecs: encode -> decode is exact for PPM/BMP/WAV."""
    from plakar_ray.functions import codecs

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    for enc, dec in [(codecs.encode_ppm, codecs.decode_pnm),
                     (codecs.encode_bmp, codecs.decode_bmp)]:
        buf = np.frombuffer(enc(px), dtype=np.uint8)
        w, h, c, out = dec(buf)
        assert (w, h, c) == (17, 13, 3)
        assert (out == px).all()
    # grayscale PGM
    gray = rng.integers(0, 256, (9, 21), dtype=np.uint8)
    w, h, c, out = codecs.decode_pnm(
        np.frombuffer(codecs.encode_ppm(gray), dtype=np.uint8))
    assert (w, h, c) == (21, 9, 1)
    assert (out[:, :, 0] == gray).all()
    # PPM comment + multi-whitespace header parses
    hdr = b"P6 # comment\n# another\n 17\t13\n255\n" + px.tobytes()
    w, h, c, out = codecs.decode_pnm(np.frombuffer(hdr, dtype=np.uint8))
    assert (w, h, c) == (17, 13, 3) and (out == px).all()
    # WAV: 16-bit stereo PCM round-trip within quantization error
    s = rng.uniform(-0.9, 0.9, (500, 2))
    rate, ch, out = codecs.decode_wav(
        np.frombuffer(codecs.encode_wav(s, rate=8000), dtype=np.uint8))
    assert (rate, ch) == (8000, 2) and out.shape == (500, 2)
    # encode scales by 32767, decode by 32768 -> error bound ~2/32768
    assert np.abs(out - s).max() < 2.5 / 32768
    # sniffing rejects junk
    assert codecs.sniff(np.frombuffer(b"\xff\xd8\xffjunk", np.uint8)) == "jpeg"
    assert codecs.sniff(rng.integers(0, 10, 64).astype(np.uint8)) == "unknown"


def test_media_real_decode_strict(ray_session):
    """Uncompressed payloads decode for REAL through the strict stages; a
    compressed (jpeg-magic) payload still hits the honest gate."""
    import ray.data

    from plakar_ray.functions import codecs
    from plakar_ray.stages.media import AudioFeatureStage, DecodeImageStage, decode_images

    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(24, 32), (10, 50), (64, 8)]]
    payloads = [codecs.encode_ppm(imgs[0]), codecs.encode_bmp(imgs[1]),
                codecs.encode_ppm(imgs[2][:, :, 0])]
    t = pa.table({
        "media_id": pa.array(range(3), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
    })
    out = (decode_images(ray.data.from_arrow(t), batch_size=2, strict=True)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert list(out.width) == [32, 50, 8]
    assert list(out.height) == [24, 10, 64]
    assert list(out.channels) == [3, 3, 1]
    # feat is the real pixel histogram, identical for the same image in
    # either container format
    ppm_feat = DecodeImageStage(strict=True)(pa.table({
        "media_id": pa.array([0], type=pa.int64()),
        "payload": pa.array([codecs.encode_ppm(imgs[1])], type=pa.binary()),
    })).column("feat").to_pylist()[0]
    assert np.allclose(ppm_feat, list(out.feat[1]))
    # strict still rejects a malformed jpeg-magic payload honestly (the
    # native baseline decoder raises ValueError on the truncated stream)
    jpeg = pa.table({
        "media_id": pa.array([0], type=pa.int64()),
        "payload": pa.array([b"\xff\xd8\xff\xe0fakejpeg"], type=pa.binary()),
    })
    if not DecodeImageStage(strict=True).has_pil:
        with pytest.raises((ValueError, NotImplementedError)):
            DecodeImageStage(strict=True)(jpeg)

    # audio: real WAV frame count + RMS features under strict
    tone = np.sin(np.linspace(0, 40 * np.pi, 1600))
    wav = pa.table({
        "media_id": pa.array([0], type=pa.int64()),
        "payload": pa.array([codecs.encode_wav(tone)], type=pa.binary()),
    })
    a = AudioFeatureStage(strict=True)(wav)
    assert a.column("n_samples").to_pylist() == [1600]
    feat = np.array(a.column("feat").to_pylist()[0])
    # RMS of a full-scale sine is ~0.707 in every window
    assert np.allclose(feat, 0.707, atol=0.01)
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(strict=True)(jpeg.rename_columns(["media_id", "payload"]))


def test_png_codec_all_filters_and_palette():
    """decode_png recovers pixels through every scanline filter type (a
    forward-filtering reference encoder produces the fixtures) and expands
    palette images to RGB; encode_png/decode_png round-trips 1-4 channels."""
    import struct
    import zlib

    from plakar_ray.functions import codecs

    rng = np.random.default_rng(11)

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    def encode_filtered(px, ftype):
        h, w, ch = px.shape
        stride = w * ch
        recon = px.reshape(h, stride).astype(np.int32)
        scan = np.zeros((h, stride + 1), np.uint8)
        prior = np.zeros(stride, np.int32)
        for y in range(h):
            cur = recon[y]
            raw = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                raw[x] = (cur[x] - pred) & 0xFF
            scan[y, 0] = ftype
            scan[y, 1:] = raw
            prior = cur
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (
            codecs._PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan.tobytes())) + chunk(b"IEND", b"")
        )

    for ftype in range(5):
        for shape in [(9, 7, 3), (5, 12, 1), (6, 6, 4)]:
            px = rng.integers(0, 256, shape, dtype=np.uint8)
            w, h, c, dec = codecs.decode_png(
                np.frombuffer(encode_filtered(px, ftype), np.uint8)
            )
            assert (h, w, c) == shape and np.array_equal(dec, px), (ftype, shape)

    # encode/decode round-trip (filter-0 encoder)
    for shape in [(7, 5, 3), (16, 9, 1), (4, 4, 4), (3, 8, 2)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        buf = np.frombuffer(codecs.encode_png(px), np.uint8)
        assert codecs.sniff(buf) == "png"
        w, h, c, dec = codecs.decode_png(buf)
        assert (h, w, c) == shape and np.array_equal(dec, px)

    # palette expansion
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (8, 6), dtype=np.uint8)
    scan = np.zeros((8, 7), np.uint8)
    scan[:, 1:] = idx
    ihdr = struct.pack(">IIBBBBB", 6, 8, 8, 3, 0, 0, 0)
    enc = (
        codecs._PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(scan.tobytes())) + chunk(b"IEND", b"")
    )
    w, h, c, dec = codecs.decode_png(np.frombuffer(enc, np.uint8))
    assert c == 3 and np.array_equal(dec, pal[idx])


def test_png_16bit_and_adam7():
    """16-bit PNGs decode to exact uint16 (big-endian pairs, byte-wise
    filters with a 2x-channel left lag) and Adam7-interlaced images of odd
    sizes decode equal to their plain encoding. The 16-bit Sub case is also
    checked against a hand-computed spec recurrence, not just round-trip."""
    import struct
    import zlib

    from plakar_ray.functions import codecs

    rng = np.random.default_rng(21)

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    # --- spec compliance: 16-bit gray, one scanline, filter 1 (Sub).
    # Filters act on BYTES with lag = bytes-per-pixel (2 for gray16):
    # recon[x] = raw[x] + recon[x-2]; pixels are big-endian pairs.
    raw = bytes([1, 0x01, 0x02, 0x80, 0xFF, 0x90, 0x01])  # ftype + 3 px
    rec = [0] * 6
    for x in range(6):
        rec[x] = (raw[1 + x] + (rec[x - 2] if x >= 2 else 0)) & 0xFF
    expected = np.array(
        [(rec[0] << 8) | rec[1], (rec[2] << 8) | rec[3], (rec[4] << 8) | rec[5]],
        dtype=np.uint16,
    )
    ihdr = struct.pack(">IIBBBBB", 3, 1, 16, 0, 0, 0, 0)
    enc = (
        codecs._PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    w, h, c, dec = codecs.decode_png(np.frombuffer(enc, np.uint8))
    assert (w, h, c) == (3, 1, 1) and dec.dtype == np.uint16
    assert np.array_equal(dec[:, :, 0], expected[None, :])

    # --- 16-bit round-trips, 1 and 3 channels
    for shape in [(7, 5, 1), (4, 9, 3)]:
        px = rng.integers(0, 65536, shape, dtype=np.uint16)
        w, h, c, dec = codecs.decode_png(
            np.frombuffer(codecs.encode_png(px), np.uint8)
        )
        assert (h, w, c) == shape and dec.dtype == np.uint16
        assert np.array_equal(dec, px)

    # --- Adam7 round-trips at sizes exercising empty and partial passes,
    # 8- and 16-bit, 1-4 channels
    for shape, dtype in [
        ((1, 1, 1), np.uint8), ((3, 5, 3), np.uint8), ((8, 8, 4), np.uint8),
        ((13, 11, 2), np.uint8), ((9, 16, 3), np.uint16), ((2, 2, 1), np.uint16),
    ]:
        hi = 256 if dtype == np.uint8 else 65536
        px = rng.integers(0, hi, shape, dtype=dtype)
        buf = np.frombuffer(codecs.encode_png(px, interlace=True), np.uint8)
        w, h, c, dec = codecs.decode_png(buf)
        assert (h, w, c) == shape and np.array_equal(dec, px), (shape, dtype)
        # interlaced and plain encodings must decode identically
        _, _, _, dec2 = codecs.decode_png(
            np.frombuffer(codecs.encode_png(px), np.uint8)
        )
        assert np.array_equal(dec, dec2)


def test_png_sub_byte_depths():
    """1/2/4-bit gray and palette PNGs decode exactly: big-endian bit groups
    per scanline byte, zero-padded to the byte boundary, byte-wise filters
    with lag 1, gray scaled by bit replication (17/85/255 steps), Adam7
    passes re-packed at their own width."""
    import struct
    import zlib

    from plakar_ray.functions import codecs

    rng = np.random.default_rng(31)

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    def pack_rows(vals, depth):
        """(h, w) sample values -> filtered (filter 0) scanline bytes."""
        h, w = vals.shape
        out = []
        for y in range(h):
            bits = (
                (vals[y][:, None] >> np.arange(depth - 1, -1, -1)) & 1
            ).astype(np.uint8).reshape(-1)
            row = np.packbits(bits)  # zero-pads to the byte boundary
            out.append(b"\x00" + row.tobytes())
        return b"".join(out)

    def png(w, h, depth, color, payload, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
        parts = [codecs._PNG_MAGIC, chunk(b"IHDR", ihdr)]
        if plte is not None:
            parts.append(chunk(b"PLTE", plte.tobytes()))
        parts += [chunk(b"IDAT", zlib.compress(payload)), chunk(b"IEND", b"")]
        return np.frombuffer(b"".join(parts), np.uint8)

    # gray 1/2/4-bit, widths that don't fill the last byte
    for depth, shape in [(1, (3, 10)), (2, (5, 7)), (4, (4, 5))]:
        vals = rng.integers(0, 1 << depth, shape, dtype=np.uint8)
        w, h, c, dec = codecs.decode_png(
            png(shape[1], shape[0], depth, 0, pack_rows(vals, depth))
        )
        assert (h, w, c) == (*shape, 1)
        assert np.array_equal(dec[:, :, 0], vals * (255 // ((1 << depth) - 1)))

    # 2-bit palette with an Up-filtered second row (filters act on the
    # PACKED bytes): row1_raw = row1_bytes - row0_bytes mod 256
    idx = rng.integers(0, 4, (2, 9), dtype=np.uint8)
    packed = [
        np.frombuffer(pack_rows(idx[y : y + 1], 2), np.uint8)[1:] for y in (0, 1)
    ]
    payload = (
        b"\x00" + packed[0].tobytes()
        + b"\x02" + ((packed[1].astype(np.int16) - packed[0]) % 256)
        .astype(np.uint8).tobytes()
    )
    plte = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    w, h, c, dec = codecs.decode_png(png(9, 2, 2, 3, payload, plte))
    assert c == 3 and np.array_equal(dec, plte[idx])

    # 4-bit gray, Adam7: per-pass packing at the pass's own width
    vals = rng.integers(0, 16, (7, 13), dtype=np.uint8)
    parts = []
    for x0, y0, dx, dy in codecs._ADAM7:
        sub = vals[y0::dy, x0::dx]
        if sub.size:
            parts.append(pack_rows(sub, 4))
    ihdr = struct.pack(">IIBBBBB", 13, 7, 4, 0, 0, 0, 1)
    enc = (
        codecs._PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(parts))) + chunk(b"IEND", b"")
    )
    w, h, c, dec = codecs.decode_png(np.frombuffer(enc, np.uint8))
    assert (w, h, c) == (13, 7, 1)
    assert np.array_equal(dec[:, :, 0], vals * 17)


def test_png_strict_decode_in_media_stage():
    """8-bit PNG decodes for REAL through the strict image stage — no PIL
    needed (stdlib zlib + numpy unfiltering)."""
    from plakar_ray.functions import codecs
    from plakar_ray.stages.media import DecodeImageStage

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
    t = pa.table(
        {
            "media_id": pa.array([1], type=pa.int64()),
            "payload": pa.array([codecs.encode_png(px)], type=pa.binary()),
        }
    )
    out = DecodeImageStage(strict=True)(t)
    assert out.column("width")[0].as_py() == 10
    assert out.column("height")[0].as_py() == 12
    assert out.column("channels")[0].as_py() == 3

    # 16-bit Adam7 payload also passes the strict gate natively
    px16 = rng.integers(0, 65536, (6, 11, 3), dtype=np.uint16)
    t16 = pa.table(
        {
            "media_id": pa.array([2], type=pa.int64()),
            "payload": pa.array(
                [codecs.encode_png(px16, interlace=True)], type=pa.binary()
            ),
        }
    )
    out16 = DecodeImageStage(strict=True)(t16)
    assert out16.column("width")[0].as_py() == 11
    assert out16.column("height")[0].as_py() == 6
    assert out16.column("channels")[0].as_py() == 3


def test_media_decode_stats_query(ray_session):
    """Driver-contract multimodal row: strict pure-numpy JPEG decode over
    the deterministic fixture — stable schema, deterministic values."""
    from plakar_ray.entry import q_media_decode_stats

    t1 = q_media_decode_stats("/root/testdata/sf0.001")
    t2 = q_media_decode_stats("/root/testdata/sf0.001")
    assert t1.column_names == [
        "width", "height", "channels", "n_images", "feat0_e6_sum",
    ]
    assert t1.num_rows > 0
    assert t1.equals(t2)
    assert sum(t1.column("n_images").to_pylist()) >= 100


def test_resize_image_stage(ray_session):
    """ResizeImageStage (stages/media.py): real PPM decode + pure-numpy
    half-pixel resample; nearest on an integer upscale is exact pixel
    replication, bilinear midpoints are hand-checkable averages; the fake
    path keeps the schema for undecodable payloads."""
    import ray.data

    from plakar_ray.functions import codecs
    from plakar_ray.functions.imageops import resize_bilinear, resize_nearest
    from plakar_ray.stages.media import ResizeImageStage, resize_images

    # 2x2 RGB ramp
    img = np.array(
        [[[0, 10, 20], [100, 110, 120]], [[200, 210, 220], [40, 50, 60]]],
        dtype=np.uint8,
    )
    # nearest 2x upscale == 2x2 block replication
    nn = resize_nearest(img, 4, 4)
    assert (nn[:2, :2] == img[0, 0]).all() and (nn[2:, 2:] == img[1, 1]).all()
    # bilinear downscale of a constant image is constant
    const = np.full((8, 6, 3), 77, dtype=np.uint8)
    assert (resize_bilinear(const, 3, 3) == 77).all()
    # bilinear 2x2 -> 1x1 is the rounded mean of all four pixels
    one = resize_bilinear(img, 1, 1)
    exp = np.floor(img.astype(np.float64).mean(axis=(0, 1)) + 0.5)
    assert (one[0, 0] == exp).all()

    # end-to-end: one real PPM + one undecodable payload (fake path)
    t = pa.table(
        {
            "media_id": pa.array([0, 1], type=pa.int64()),
            "payload": pa.array(
                [codecs.encode_ppm(img), b"\x00\x01\x02not-an-image" * 50],
                type=pa.binary(),
            ),
        }
    )
    out = (
        resize_images(ray.data.from_arrow(t), out_h=4, out_w=4, method="nearest")
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["media_id", "width", "height", "channels", "pixels"]
    assert (out.width == 4).all() and (out.height == 4).all()
    got = np.frombuffer(out.pixels[0], dtype=np.uint8).reshape(4, 4, 3)
    assert (got == nn).all()
    assert len(out.pixels[1]) == 4 * 4 * int(out.channels[1])
    # deterministic: direct call equals the pipeline result
    direct = ResizeImageStage(out_h=4, out_w=4, method="nearest")(t).to_pandas()
    assert (np.frombuffer(direct.pixels[1], dtype=np.uint8)
            == np.frombuffer(out.pixels[1], dtype=np.uint8)).all()
    # strict mode raises on the undecodable payload (no PIL here)
    if not ResizeImageStage(strict=True).has_pil:
        with pytest.raises(NotImplementedError):
            ResizeImageStage(out_h=4, out_w=4, strict=True)(t)
