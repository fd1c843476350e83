"""Algorithm registry: name -> AlgorithmSpec.

Mirrors the reference's registry surface (Register / name->factory,
chunkers.go:59-67) with the registered names preserved verbatim. Each spec
bundles option defaulting, setup (mask/jump/gear derivation), validation, the
scalar oracle cut function and the vectorized whole-document boundary kernel.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np

from plakar_ray import kernels, oracle
from plakar_ray.gear import GEAR, GEAR64_STADIA, get_gear_table
from plakar_ray.opts import (
    DEFAULTS_FASTCDC,
    DEFAULTS_FIXED,
    DEFAULTS_JC,
    DEFAULTS_STADIA,
    DEFAULTS_ULTRACDC,
    ChunkerOpts,
    fastcdc_masks,
    jc_jump_length,
    jc_masks,
    validate_fastcdc,
    validate_fixed,
    validate_triple,
)


@dataclass(frozen=True)
class AlgorithmSpec:
    name: str
    defaults: ChunkerOpts
    setup: Callable[[ChunkerOpts], dict[str, Any]]
    validate: Callable[[ChunkerOpts], None]
    oracle_cut: Callable[..., int]  # (cfg, opts, data: bytes, n) -> int
    boundaries: Callable[..., np.ndarray]  # (cfg, opts, data: np.uint8[:]) -> int64 lengths
    # Optional batched form: (cfg, opts, batch_buffer, doc_offsets) ->
    # list of per-doc int64 length arrays. Cutpoint-identical to per-doc
    # `boundaries`; exists where per-segment warm-up launch overhead is
    # worth amortizing across a whole map_batches batch (fastcdc/jc).
    boundaries_multi: Callable[..., list] | None = None

    def resolve_opts(self, opts: ChunkerOpts | None) -> ChunkerOpts:
        """Zero-value back-fill from defaults (chunkers.go:86-98)."""
        if opts is None:
            return self.defaults
        o = opts.with_defaults(self.defaults)
        if self.name.startswith("fixed"):
            # Fixed chunker: Min and Max track NormalSize (fixed.go:49-59).
            ns = o.normal_size or DEFAULTS_FIXED.normal_size
            o = ChunkerOpts(ns, ns, ns, o.key)
            validate_fixed(o)
        return o


ALGORITHMS: dict[str, AlgorithmSpec] = {}


def register_chunker(spec: AlgorithmSpec) -> None:
    """User-extension surface, mirroring Register (chunkers.go:61-67)."""
    if spec.name in ALGORITHMS:
        raise ValueError("algorithm already registered")
    ALGORITHMS[spec.name] = spec


# Modules that register extension algorithms on import. A Ray worker
# process may not have imported them yet (the registry dict is
# per-process), so get_algorithm resolves misses through this list once
# before failing. A broken extension module raises its real ImportError
# here rather than masquerading as "unknown algorithm".
EXTENSION_MODULES: list[str] = ["plakar_ray.competitors"]


def get_algorithm(name: str) -> AlgorithmSpec:
    if name not in ALGORITHMS:
        import importlib

        for mod in EXTENSION_MODULES:
            importlib.import_module(mod)
    if name not in ALGORITHMS:
        raise KeyError(f"unknown algorithm: {name}")
    return ALGORITHMS[name]


# ---------------------------------------------------------------- fastcdc ---


def _mk_fastcdc(name: str, legacy: bool, keyed: bool) -> AlgorithmSpec:
    def setup(o: ChunkerOpts) -> dict[str, Any]:
        mask_s, mask_l = fastcdc_masks(o, legacy)
        gear = get_gear_table(o.key)
        return {"mask_s": mask_s, "mask_l": mask_l, "gear": gear}

    def ocut(cfg, o, data, n):
        return oracle.cut_fastcdc(o, data, n, cfg["mask_s"], cfg["mask_l"], cfg["gear"])

    def bnd(cfg, o, data):
        return kernels.boundaries_fastcdc(data, o, cfg["mask_s"], cfg["mask_l"], cfg["gear"])

    def bnd_multi(cfg, o, data, doc_offsets):
        return kernels.boundaries_fastcdc_multi(
            data, doc_offsets, o, cfg["mask_s"], cfg["mask_l"], cfg["gear"]
        )

    return AlgorithmSpec(
        name=name,
        defaults=DEFAULTS_FASTCDC,
        setup=setup,
        validate=lambda o: validate_fastcdc(o, keyed),
        oracle_cut=ocut,
        boundaries=bnd,
        boundaries_multi=bnd_multi,
    )


# --------------------------------------------------------------------- jc ---


def _mk_jc(name: str, legacy: bool, spec_faithful: bool) -> AlgorithmSpec:
    def setup(o: ChunkerOpts) -> dict[str, Any]:
        mask_c, mask_j = jc_masks(o, legacy)
        return {
            "mask_c": mask_c,
            "mask_j": mask_j,
            "jump_length": jc_jump_length(o.normal_size),
            "gear": get_gear_table(o.key),
            "spec_faithful": spec_faithful,
        }

    def ocut(cfg, o, data, n):
        return oracle.cut_jc(
            o, data, n, cfg["mask_c"], cfg["mask_j"], cfg["jump_length"],
            cfg["spec_faithful"], cfg["gear"],
        )

    def bnd(cfg, o, data):
        return kernels.boundaries_jc(
            data, o, cfg["mask_c"], cfg["mask_j"], cfg["jump_length"],
            cfg["spec_faithful"], cfg["gear"],
        )

    def bnd_multi(cfg, o, data, doc_offsets):
        return kernels.boundaries_jc_multi(
            data, doc_offsets, o, cfg["mask_c"], cfg["mask_j"], cfg["jump_length"],
            cfg["spec_faithful"], cfg["gear"],
        )

    return AlgorithmSpec(
        name=name,
        defaults=DEFAULTS_JC,
        setup=setup,
        validate=validate_triple,
        oracle_cut=ocut,
        boundaries=bnd,
        boundaries_multi=bnd_multi,
    )


# --------------------------------------------------------------- ultracdc ---


def _mk_ultracdc(name: str, spec_faithful: bool) -> AlgorithmSpec:
    def ocut(cfg, o, data, n):
        return oracle.cut_ultracdc(o, data, n, spec_faithful)

    def bnd(cfg, o, data):
        return kernels.boundaries_ultracdc(data, o, spec_faithful)

    def bnd_multi(cfg, o, data, doc_offsets):
        return kernels.boundaries_ultracdc_multi(data, doc_offsets, o, spec_faithful)

    return AlgorithmSpec(
        name=name,
        defaults=DEFAULTS_ULTRACDC,
        setup=lambda o: {},
        validate=validate_triple,
        oracle_cut=ocut,
        boundaries=bnd,
        boundaries_multi=bnd_multi,
    )


# ----------------------------------------------------- fastcdc4stadia ------


def _mk_stadia() -> AlgorithmSpec:
    return AlgorithmSpec(
        name="fastcdc4stadia",
        defaults=DEFAULTS_STADIA,
        setup=lambda o: {"gear": GEAR64_STADIA},
        validate=validate_triple,
        oracle_cut=lambda cfg, o, data, n: oracle.cut_stadia(o, data, n),
        boundaries=lambda cfg, o, data: kernels.boundaries_stadia(data, o),
        boundaries_multi=lambda cfg, o, data, doc_offsets: kernels.boundaries_stadia_multi(
            data, doc_offsets, o
        ),
    )


# -------------------------------------------------------------- fixed ------


def _mk_fixed() -> AlgorithmSpec:
    return AlgorithmSpec(
        name="fixed-v1.0.0",
        defaults=DEFAULTS_FIXED,
        setup=lambda o: {},
        validate=validate_fixed,
        oracle_cut=lambda cfg, o, data, n: oracle.cut_fixed(o, data, n),
        boundaries=lambda cfg, o, data: kernels.boundaries_fixed(data, o),
    )


# Registered names preserved verbatim from the reference
# (fastcdc.go:77-81, jc.go:77-81, ultracdc registration, fixed registration).
for _spec in [
    _mk_fastcdc("fastcdc", legacy=True, keyed=False),
    _mk_fastcdc("kfastcdc", legacy=True, keyed=True),
    _mk_fastcdc("fastcdc-v1.0.0", legacy=False, keyed=False),
    _mk_jc("jc", legacy=True, spec_faithful=False),
    _mk_jc("jc-v1.0.0", legacy=False, spec_faithful=False),
    _mk_jc("jc-v1.1.0", legacy=True, spec_faithful=True),
    _mk_ultracdc("ultracdc", spec_faithful=False),
    _mk_ultracdc("ultracdc-v1.0.0", spec_faithful=True),
    _mk_stadia(),
    _mk_fixed(),
]:
    register_chunker(_spec)


def chunk_lengths(algo: str, data: bytes | np.ndarray, opts: ChunkerOpts | None = None) -> np.ndarray:
    """Production chunking: all chunk lengths of one document via the
    vectorized kernel, with Next()-stream semantics (chunkers.go:160-190).
    Empty input yields an empty array (the reference's zero-length chunk is
    dropped, tests/harness_test.go:140-143)."""
    spec = get_algorithm(algo)
    o = spec.resolve_opts(opts)
    cfg = spec.setup(o)
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else data
    return spec.boundaries(cfg, o, arr)
