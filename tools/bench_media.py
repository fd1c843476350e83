"""Media-decode throughput probe: JPEG (baseline + progressive) and
MJPEG-AVI frame-sampling through the production actor-pool stages.

JPEG entropy decode is inherently sequential per payload (a Python
symbol loop over a Huffman bitstream), so the engine's media throughput
comes from the actor pool decoding many images at once — the same shape a
100 TB crawl has (billions of small images, not one big one). This probe
measures:

* single-core decode MB/s (compressed bytes) and images/s, baseline and
  progressive, without Ray — the per-worker ceiling;
* the strict decode_images actor-pool stage at two parallelism levels on
  the same corpus (fresh ray.init per level) — images/s, MB/s and the
  parallel speedup the pool actually delivers.

Writes BENCH/media_decode_r{R}.json.

    python tools/bench_media.py [round]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_corpus(n_images: int, seed: int = 11):
    """Deterministic mixed corpus: photos-ish smooth blocks, some noise,
    mixed sizes/qualities/subsampling, ~20% progressive (web-crawl-ish)."""
    from plakar_ray.functions import jpeg

    rng = np.random.default_rng(seed)
    payloads = []
    for i in range(n_images):
        h = int(rng.integers(96, 257))
        w = int(rng.integers(96, 257))
        base = rng.integers(0, 256, (max(h // 16, 1), max(w // 16, 1), 3),
                            dtype=np.uint8)
        px = np.kron(base, np.ones((16, 16, 1), np.uint8))[:h, :w]
        q = int(rng.choice([60, 75, 85, 92]))
        sub = "420" if i % 2 else "444"
        enc = (jpeg.encode_jpeg_progressive if i % 5 == 0 else
               jpeg.encode_jpeg)(px, quality=q, subsampling=sub)
        payloads.append(enc)
    return payloads


def single_core(payloads) -> dict:
    from plakar_ray.functions import jpeg

    out = {}
    for name, idx in (("baseline", [i for i in range(len(payloads))
                                    if i % 5 != 0]),
                      ("progressive", [i for i in range(len(payloads))
                                       if i % 5 == 0])):
        sel = [payloads[i] for i in idx]
        total = sum(len(p) for p in sel)
        t0 = time.perf_counter()
        for p in sel:
            jpeg.decode_jpeg(np.frombuffer(p, np.uint8))
        dt = time.perf_counter() - t0
        out[name] = {
            "images": len(sel),
            "compressed_mb": round(total / 1e6, 2),
            "sec": round(dt, 3),
            "images_per_s": round(len(sel) / dt, 1),
            "mb_per_s": round(total / 1e6 / dt, 2),
        }
    return out


def write_corpus_parquet(payloads, path: str) -> None:
    """Corpus as parquet with small row groups — read_parquet then splits
    the scan into many blocks, the shape a crawl's media table has."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "media_id": pa.array(range(len(payloads)), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
    })
    pq.write_table(t, path, row_group_size=16)


def pool_level(parquet_path: str, n_images: int, total_bytes: int,
               num_cpus: int) -> dict:
    """read_parquet -> strict decode_images at one parallelism level in
    THIS process (caller runs each level in a fresh subprocess)."""
    import ray
    import ray.data

    from plakar_ray.stages.media import decode_images

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True)
    ds = ray.data.read_parquet(parquet_path)
    # warm the pool so actor startup stays outside the timed region
    decode_images(ds.limit(num_cpus * 4), batch_size=4,
                  concurrency=num_cpus, strict=True).materialize()
    t0 = time.perf_counter()
    n = decode_images(ds, batch_size=16, concurrency=num_cpus,
                      strict=True).count()
    dt = time.perf_counter() - t0
    ray.shutdown()
    assert n == n_images
    return {
        "num_cpus": num_cpus,
        "images": n,
        "sec": round(dt, 3),
        "images_per_s": round(n / dt, 1),
        "mb_per_s": round(total_bytes / 1e6 / dt, 2),
    }


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if len(sys.argv) > 2 and sys.argv[2] == "--level":
        # child mode: decode in a fresh process at one parallelism level
        print(json.dumps(pool_level(
            sys.argv[3], int(sys.argv[4]), int(sys.argv[5]),
            int(sys.argv[6]))))
        return

    n_images = int(os.environ.get("MEDIA_BENCH_IMAGES", "4800"))
    payloads = make_corpus(n_images)
    total_bytes = sum(len(p) for p in payloads)
    pq_path = f"/tmp/media_bench_corpus_{n_images}.parquet"
    write_corpus_parquet(payloads, pq_path)
    result = {
        "corpus": {
            "images": n_images,
            "compressed_mb": round(total_bytes / 1e6, 2),
            "progressive_share": 0.2,
        },
        "single_core": single_core(payloads[: max(n_images // 4, 200)]),
    }
    import subprocess
    for level in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(rnd),
             "--level", pq_path, str(n_images), str(total_bytes),
             str(level)],
            capture_output=True, text=True, cwd=REPO, timeout=1200,
        )
        line = proc.stdout.strip().splitlines()[-1]
        result[f"pool_{level}"] = json.loads(line)
    r8, r32 = result["pool_8"], result["pool_32"]
    result["speedup_8_to_32"] = round(
        r32["images_per_s"] / r8["images_per_s"], 3)
    result["scaling_efficiency_8_to_32"] = round(
        r32["images_per_s"] / r8["images_per_s"] / 4.0, 3)
    path = os.path.join(REPO, "BENCH", f"media_decode_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
