"""Profile oracle (GenerateProfile/MatchProfile parity), sweep pipelines,
batch-slicing equivalence, and hypothesis property tests."""

import os
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from plakar_ray.functions.profile import (
    PROFILE_SWEEP,
    build_profiles,
    generate_profile,
    match_profile,
)
from plakar_ray.opts import ChunkerOpts
from plakar_ray.oracle import chunk_lengths_oracle
from plakar_ray.registry import chunk_lengths

_rng = np.random.default_rng(77)
_DATA = _rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()


def test_profile_roundtrip():
    opts = ChunkerOpts(256, 4096, 1024)
    p = generate_profile("fastcdc-v1.0.0", _DATA, opts)
    assert match_profile(p, "fastcdc-v1.0.0", _DATA, opts) == []
    # A different algorithm must mismatch.
    errs = match_profile(p, "ultracdc", _DATA, opts)
    assert errs
    # Edited data must mismatch.
    edited = _DATA[:1000] + b"x" + _DATA[1000:]
    assert match_profile(p, "fastcdc-v1.0.0", edited, opts)


def test_profile_sweep_grid():
    profiles = build_profiles(_DATA[:100_000], algos=["fastcdc", "ultracdc"])
    assert len(profiles) == 2 * len(PROFILE_SWEEP)
    for key, t in profiles.items():
        # Reconstruction: offsets+lengths tile the input.
        assert t.column("offset").to_pylist()[0] == 0
        assert (
            t.column("offset").to_pylist()[-1] + t.column("length").to_pylist()[-1]
            == 100_000
        )


def test_sweeps(ray_session):
    import ray.data

    from plakar_ray.pipelines.sweeps import dedup_ratio_sweep, length_histogram, resync_sweep

    texts = ["".join(chr(97 + c) for c in _rng.integers(0, 26, 4000)) for _ in range(10)]
    table = pa.table(
        {"doc_id": pa.array(range(20), type=pa.int64()), "text": pa.array(texts + texts)}
    )

    sw = dedup_ratio_sweep(lambda: ray.data.from_arrow(table), "fastcdc-v1.0.0",
                           avgs=[256, 1024]).to_pandas()
    assert len(sw) == 2
    assert (sw.dedup_ratio <= 0.51).all()  # fully duplicated corpus

    rs = resync_sweep(lambda: ray.data.from_arrow(table), "fastcdc-v1.0.0",
                      ChunkerOpts(64, 2048, 256), edit_counts=[0, 16]).to_pandas()
    assert rs.loc[rs.edits == 0, "mean_shared_frac"].iloc[0] == 1.0
    assert rs.loc[rs.edits == 16, "mean_shared_frac"].iloc[0] <= 1.0

    h = length_histogram(ray.data.from_arrow(table), "fastcdc-v1.0.0",
                         ChunkerOpts(64, 2048, 256), n_buckets=16).to_pandas()
    assert h["count"].sum() > 0
    assert abs(h.cdf.iloc[-1] - 1.0) < 1e-9


def test_batch_slicing_equivalence(ray_session):
    """Reference layer 3 (buffer_test.go:64-114) re-expressed: the same
    documents split across different Arrow batch/block boundaries produce an
    identical chunk table."""
    import ray.data

    from plakar_ray.stages.chunk import chunk_dataset

    texts = ["".join(chr(97 + c) for c in _rng.integers(0, 26, n)) for n in
             [0, 1, 100, 1000, 5000, 20000, 333, 4096]]
    table = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": pa.array(texts)}
    )
    opts = ChunkerOpts(64, 2048, 256)

    def run(blocks, batch_size):
        ds = ray.data.from_arrow(table).repartition(blocks)
        out = chunk_dataset(ds, "fastcdc-v1.0.0", opts, batch_size=batch_size).to_pandas()
        out["digest"] = out["digest"].apply(bytes)
        return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)

    base = run(1, None)
    for blocks, bs in [(2, None), (8, None), (1, 1), (3, 2)]:
        other = run(blocks, bs)
        assert base.equals(other), (blocks, bs)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    algo=st.sampled_from(
        ["fastcdc", "fastcdc-v1.0.0", "jc", "jc-v1.1.0", "ultracdc",
         "ultracdc-v1.0.0", "fastcdc4stadia"]
    ),
    n=st.integers(min_value=0, max_value=30_000),
    seed=st.integers(min_value=0, max_value=2**31),
    profile=st.sampled_from([(64, 512, 128), (256, 4096, 1024)]),
    pattern=st.sampled_from(["random", "zeros", "repeat"]),
)
def test_kernel_oracle_property(algo, n, seed, profile, pattern):
    if pattern == "random":
        data = np.random.default_rng(seed).integers(0, 256, n, dtype=np.uint8).tobytes()
    elif pattern == "zeros":
        data = bytes(n)
    else:
        data = (b"abcab" * (n // 5 + 1))[:n]
    opts = ChunkerOpts(profile[0], profile[1], profile[2])
    assert chunk_lengths(algo, data, opts).tolist() == chunk_lengths_oracle(algo, data, opts)


def test_svgplot_renders_valid_svg():
    """Pure-SVG chart helpers: valid XML, fixed categorical order, marks."""
    import xml.etree.ElementTree as ET

    from plakar_ray.functions import svgplot

    svg = svgplot.bar_chart("Hist", "len", "count",
                            [0, 10, 20], [10, 20, 30], [5, 0, 9])
    root = ET.fromstring(svg)
    ns = "{http://www.w3.org/2000/svg}"
    bars = [r for r in root.iter(f"{ns}rect")
            if r.get("fill") == svgplot.SEQUENTIAL]
    assert len(bars) == 2  # zero-count bucket draws no bar
    # bars are baseline-anchored: y + height == baseline for both
    base = {round(float(b.get("y")) + float(b.get("height")), 1) for b in bars}
    assert len(base) == 1

    series = {"fastcdc": ([0, 1, 2], [0.9, 0.8, 0.7]),
              "jc": ([0, 1, 2], [0.95, 0.85, 0.75]),
              "ultracdc": ([0, 1, 2], [0.97, 0.9, 0.8])}
    svg2 = svgplot.line_chart("Resync", "edits", "shared", series)
    root2 = ET.fromstring(svg2)
    lines = [p.get("stroke") for p in root2.iter(f"{ns}polyline")]
    # fixed categorical assignment in declaration order, never cycled
    assert lines == svgplot.CATEGORICAL[:3]
    texts = [t.text for t in root2.iter(f"{ns}text")]
    assert {"fastcdc", "jc", "ultracdc"} <= set(texts)  # legend + end labels
    # hoverable markers carry value tooltips
    assert sum(1 for _ in root2.iter(f"{ns}circle")) == 9
    # single-series chart: no legend, sequential hue
    svg3 = svgplot.line_chart("CDF", "len", "frac", {"a": ([0, 1], [0.1, 1.0])})
    assert svgplot.CATEGORICAL[1] not in svg3
    assert svgplot.SEQUENTIAL in svg3


def test_render_figures(ray_session, tmp_path):
    """The cdcplot SVG figure set renders end-to-end from a Dataset."""
    import xml.etree.ElementTree as ET

    import ray.data

    from plakar_ray.pipelines.plots import render_figures

    texts = ["".join(chr(97 + c) for c in _rng.integers(0, 26, 3000)) for _ in range(8)]
    table = pa.table(
        {"doc_id": pa.array(range(16), type=pa.int64()), "text": pa.array(texts + texts)}
    )
    paths = render_figures(
        lambda: ray.data.from_arrow(table), str(tmp_path),
        algos=["fastcdc-v1.0.0", "ultracdc"], hist_algo="fastcdc-v1.0.0",
        opts=ChunkerOpts(64, 2048, 256), sweep_avgs=[256, 1024],
        resync_edits=[0, 8],
    )
    assert sorted(os.path.basename(p) for p in paths) == [
        "chunk_length_cdf.svg", "chunk_length_hist.svg",
        "dedup_ratio_sweep.svg", "resync_curve.svg",
    ]
    for p in paths:
        ET.parse(p)  # every artifact is valid XML
