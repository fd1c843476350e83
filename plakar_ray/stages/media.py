"""Multimodal (image/audio/video) stages — real Ray plumbing, real codecs
for uncompressed formats, gated stubs for compressed ones.

Media travel as opaque `binary` payload columns with typed metadata, decoded
and featurized inside actor-pool map_batches stages. Payload format is
sniffed per row (functions/codecs.sniff):

* PPM/PGM/BMP/PNG (all legal depths, incl. Adam7) images, JPEG (baseline,
  extended sequential, progressive), and RIFF PCM WAV audio decode for
  REAL with the pure-numpy codecs in `plakar_ray.functions.codecs` and
  `plakar_ray.functions.jpeg` — no library needed.
* MJPEG-in-AVI video frame-samples for REAL (RIFF walk -> per-frame JPEG
  decode); see FrameSampleStage.
* Remaining compressed formats (MP3, exotic JPEG modes, ...) use PIL when
  importable; otherwise
  strict=True raises NotImplementedError (the honest production gate) and
  strict=False substitutes a deterministic fake decode (byte-histogram
  features, sizes derived from a payload hash) so schemas, batch sizing,
  actor lifecycle and downstream layout stay fully testable.

Batch sizes for media must be SMALL (payloads are large): callers pass
batch_size explicitly; helpers default to 16 rows per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from plakar_ray.functions import codecs, jpeg
from plakar_ray.functions.arrowbytes import byte_views


def _try_import_pil():
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


class DecodeImageStage:
    """(media_id, payload) -> (media_id, width, height, channels,
    feat: fixed_size_list<float>(16)).

    PPM/PGM/BMP/PNG and baseline-JPEG payloads decode for real (pure-numpy
    codecs); remaining compressed modes decode via PIL when available, else
    the strict gate / fake
    applies. feat is the normalized 16-bin intensity histogram of the
    decoded pixels (of the raw payload bytes on the fake path) — stable
    across runs and processes.
    """

    FEAT_DIM = 16

    def __init__(self, id_col: str = "media_id", payload_col: str = "payload",
                 strict: bool = False):
        self.id_col = id_col
        self.payload_col = payload_col
        self.strict = strict
        self.has_pil = _try_import_pil()

    def _fake_decode(self, payload: np.ndarray) -> tuple[int, int, int, np.ndarray]:
        h = hashlib.sha256(payload.tobytes()).digest()
        width = 16 + h[0] % 240
        height = 16 + h[1] % 240
        channels = 1 + h[2] % 3
        hist = np.bincount(payload >> 4, minlength=16).astype(np.float64)
        total = max(hist.sum(), 1.0)
        return width, height, channels, hist / total

    @staticmethod
    def _pixel_feat(px: np.ndarray) -> np.ndarray:
        hist = np.bincount(
            (px.reshape(-1) >> 4).astype(np.intp), minlength=16
        ).astype(np.float64)
        return hist / max(hist.sum(), 1.0)

    def _pil_pixels(self, payload: np.ndarray) -> np.ndarray:
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(payload.tobytes()))
        px = np.asarray(img.convert("RGB") if img.mode == "P" else img)
        if px.ndim == 2:
            px = px[:, :, None]
        return px

    def _decode_pixels(self, payload: np.ndarray) -> np.ndarray | None:
        """Raw (h, w, c) uint8 pixels, or None for the fake path
        (strict=False, format not decodable in this environment)."""
        kind = codecs.sniff(payload)
        if kind in ("ppm", "pgm"):
            return codecs.decode_pnm(payload)[3]
        if kind == "bmp":
            return codecs.decode_bmp(payload)[3]
        if kind == "png":
            # Pure stdlib-zlib + numpy decode (functions/codecs.decode_png,
            # all legal depth/color combos incl. Adam7); PIL only for
            # payloads it rejects (malformed / exotic chunk layouts).
            try:
                px = codecs.decode_png(payload)[3]
                if px.dtype == np.uint16:  # downstream ops are 8-bit
                    px = (px >> 8).astype(np.uint8)
                return px
            except ValueError:
                if self.strict and not self.has_pil:
                    raise
        if kind == "jpeg":
            # Pure-numpy baseline/extended-sequential/progressive decode
            # (functions/jpeg.decode_jpeg); PIL only for the modes it
            # rejects (lossless/arithmetic/hierarchical, 12-bit).
            try:
                return jpeg.decode_jpeg(payload)[3]
            except ValueError:
                if self.strict and not self.has_pil:
                    raise
        if self.has_pil and kind in ("jpeg", "png"):
            return self._pil_pixels(payload)
        if self.strict:
            raise NotImplementedError(
                f"image decode for format {kind!r} needs PIL (not in this "
                "environment); PPM/PGM/BMP, PNG (all legal depths, incl. "
                "Adam7) and baseline JPEG decode natively, or strict=False "
                "fakes"
            )
        return None

    def _decode(self, payload: np.ndarray) -> tuple[int, int, int, np.ndarray]:
        px = self._decode_pixels(payload)
        if px is None:
            return self._fake_decode(payload)
        return px.shape[1], px.shape[0], px.shape[2], self._pixel_feat(px)

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = byte_views(batch.column(self.payload_col))
        n = len(batch)
        w = np.empty(n, np.int32)
        hgt = np.empty(n, np.int32)
        c = np.empty(n, np.int32)
        feats = np.zeros((n, self.FEAT_DIM), np.float64)
        for i in range(n):
            payload = data[offsets[i] : offsets[i + 1]]
            w[i], hgt[i], c[i], feats[i] = self._decode(payload)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "width": pa.array(w, type=pa.int32()),
                "height": pa.array(hgt, type=pa.int32()),
                "channels": pa.array(c, type=pa.int32()),
                "feat": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), type=pa.float64()), self.FEAT_DIM
                ),
            }
        )


class ResizeImageStage(DecodeImageStage):
    """(media_id, payload) -> (media_id, width, height, channels,
    pixels: large_binary) — the training-pipeline image-preprocess step:
    decode (same dispatch/gating as DecodeImageStage) then resample to a
    fixed (out_h, out_w) with the pure-numpy half-pixel bilinear or
    nearest kernel (functions/imageops.py). `pixels` is the raw
    out_h x out_w x c uint8 buffer (row-major), ready for a
    fixed-shape tensor consumer; channel count passes through.

    The fake path (strict=False, undecodable format) emits deterministic
    sha256-keystream pixels so schemas and batch plumbing stay testable
    without the codec."""

    def __init__(self, out_h: int = 64, out_w: int = 64,
                 method: str = "bilinear", id_col: str = "media_id",
                 payload_col: str = "payload", strict: bool = False):
        super().__init__(id_col=id_col, payload_col=payload_col, strict=strict)
        if method not in ("bilinear", "nearest"):
            raise ValueError(f"unknown resize method {method!r}")
        self.out_h = int(out_h)
        self.out_w = int(out_w)
        self.method = method

    def _fake_pixels(self, payload: np.ndarray) -> np.ndarray:
        w, h, c, _ = self._fake_decode(payload)
        need = h * w * c
        seed = hashlib.sha256(payload.tobytes()).digest()
        reps = (need + len(seed) - 1) // len(seed)
        buf = np.frombuffer(seed * reps, dtype=np.uint8)[:need]
        return buf.reshape(h, w, c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from plakar_ray.functions.imageops import resize_bilinear, resize_nearest

        kernel = resize_bilinear if self.method == "bilinear" else resize_nearest
        data, offsets = byte_views(batch.column(self.payload_col))
        n = len(batch)
        chans = np.empty(n, np.int32)
        bufs = []
        for i in range(n):
            payload = data[offsets[i] : offsets[i + 1]]
            px = self._decode_pixels(payload)
            if px is None:
                px = self._fake_pixels(payload)
            out = kernel(px, self.out_h, self.out_w)
            chans[i] = out.shape[2]
            bufs.append(np.ascontiguousarray(out, dtype=np.uint8).reshape(-1))
        sizes = np.array([b.size for b in bufs], dtype=np.int64)
        off = np.concatenate(([0], np.cumsum(sizes)))
        flat = np.concatenate(bufs) if bufs else np.empty(0, np.uint8)
        pixels = pa.Array.from_buffers(
            pa.large_binary(),
            n,
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(flat.tobytes())],
        )
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "width": pa.array(
                    np.full(n, self.out_w, dtype=np.int32), type=pa.int32()
                ),
                "height": pa.array(
                    np.full(n, self.out_h, dtype=np.int32), type=pa.int32()
                ),
                "channels": pa.array(chans, type=pa.int32()),
                "pixels": pixels,
            }
        )


class AudioFeatureStage:
    """(media_id, payload) -> (media_id, n_samples, feat(8)).

    RIFF PCM WAV payloads decode for real (pure-numpy): n_samples is the
    true frame count and feat holds FEAT_DIM windowed RMS energies of the
    mono mix. Other formats fall back to the strict gate / fake windowed
    byte means (same gating contract as images)."""

    FEAT_DIM = 8

    def __init__(self, id_col: str = "media_id", payload_col: str = "payload",
                 strict: bool = False):
        self.id_col = id_col
        self.payload_col = payload_col
        self.strict = strict

    def _decode(self, payload: np.ndarray) -> tuple[int, np.ndarray]:
        if codecs.sniff(payload) == "wav":
            _, _, samples = codecs.decode_wav(payload)
            mono = samples.mean(axis=1)
            feat = np.zeros(self.FEAT_DIM)
            if mono.shape[0]:
                parts = np.array_split(mono, self.FEAT_DIM)
                feat = np.array(
                    [np.sqrt(np.mean(p * p)) if p.size else 0.0 for p in parts]
                )
            return mono.shape[0], feat
        if self.strict:
            raise NotImplementedError(
                "audio decode for this format needs an audio lib; RIFF PCM "
                "WAV decodes natively, or run with strict=False for the fake"
            )
        raw = payload.astype(np.float64)
        feat = np.zeros(self.FEAT_DIM)
        if raw.shape[0]:
            parts = np.array_split(raw, self.FEAT_DIM)
            feat = np.array([p.mean() if p.size else 0.0 for p in parts])
        return raw.shape[0], feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = byte_views(batch.column(self.payload_col))
        n = len(batch)
        ns = np.empty(n, np.int64)
        feats = np.zeros((n, self.FEAT_DIM), np.float64)
        for i in range(n):
            ns[i], feats[i] = self._decode(data[offsets[i] : offsets[i + 1]])
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_samples": pa.array(ns, type=pa.int64()),
                "feat": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), type=pa.float64()), self.FEAT_DIM
                ),
            }
        )


class FrameSampleStage:
    """(media_id, payload) -> one row per sampled frame.

    AVI payloads are REAL video: the RIFF walker (codecs.avi_frame_spans)
    yields the container's actual frame chunks, every `every`-th of which
    becomes a row — for MJPEG AVIs each emitted frame is a complete JPEG,
    so piping the output (frame renamed to payload) into decode_images
    gives a fully real sample-then-decode video pipeline. Non-AVI payloads
    keep the fixed-size byte slicing (plumbing stand-in for codecs this
    environment lacks, e.g. H.264)."""

    def __init__(self, id_col: str = "media_id", payload_col: str = "payload",
                 frame_bytes: int = 4096, every: int = 4):
        self.id_col = id_col
        self.payload_col = payload_col
        self.frame_bytes = frame_bytes
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = byte_views(batch.column(self.payload_col))
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        take, frame_idx, frames = [], [], []
        for i in range(len(batch)):
            payload = data[offsets[i] : offsets[i + 1]]
            if codecs.sniff(payload) == "avi":
                spans = codecs.avi_frame_spans(payload)
                for j in range(0, len(spans), self.every):
                    off, size = spans[j]
                    take.append(i)
                    frame_idx.append(j)
                    frames.append(payload[off : off + size].tobytes())
                continue
            n_frames = payload.shape[0] // self.frame_bytes
            for j in range(0, n_frames, self.every):
                take.append(i)
                frame_idx.append(j)
                frames.append(
                    payload[j * self.frame_bytes : (j + 1) * self.frame_bytes].tobytes()
                )
        return pa.table(
            {
                self.id_col: ids.take(pa.array(take, type=pa.int64())),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def decode_images(ds, concurrency=None, batch_size: int = 16, strict: bool = False):
    """Actor-pool decode: media payloads are heavy, so batches stay small;
    columns are pruned to id+payload upstream."""
    if concurrency is None:
        from plakar_ray.stages.chunk import default_pool_size

        concurrency = default_pool_size()
    return ds.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs=dict(strict=strict),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_images(ds, out_h: int = 64, out_w: int = 64, method: str = "bilinear",
                  concurrency=None, batch_size: int = 16, strict: bool = False):
    """Actor-pool decode + fixed-shape resample (the image-preprocess
    step of a training pipeline); output rows carry the raw resized
    uint8 buffer."""
    if concurrency is None:
        from plakar_ray.stages.chunk import default_pool_size

        concurrency = default_pool_size()
    return ds.map_batches(
        ResizeImageStage,
        fn_constructor_kwargs=dict(
            out_h=out_h, out_w=out_w, method=method, strict=strict
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
