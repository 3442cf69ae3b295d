"""Configuration for the TPU wavefront runtime.

Reinterprets every knob of the reference ``racc::Configuration``
(reference RayAccelerator.h:32-42) for the TPU execution model, where the
CPU-thread/GPU-queue scheduler is replaced by a compiled wavefront loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Configuration:
    """Runtime configuration.

    Mapping from the reference configuration (RayAccelerator.h:32-42,
    defaults at RayAccelerator.cpp:429-446):

    - ``gpuContext``            -> ``backend``: which traversal engine runs the
      ray/scene intersection stage. ``"mxu"`` is the cluster-dense tracer
      (ops/trace_mxu.py) — the throughput engine, playing the role of the
      OpenCL kernel (Kernels.h:141-242); ``"xla"`` is the lockstep
      BVH2/TrianglePair traversal (ops/trace.py), the general-purpose
      fallback in the role of the Embree CPU path (Scene.cpp:374-484);
      ``"pallas"`` selects the hand-written Pallas kernel variant of the
      dense tracer. All produce identical hits and serve as each other's
      oracle, like the reference's ``--no-gpu`` / ``--no-cpu-tracing`` flag
      pair (main.cpp:289-302).
    - ``allowCpuTracing``       -> ``hybrid_tracing``: let a second engine
      share the work by workload kind, the analog of the reference's hybrid
      scheduling where the CPU helps trace once the GPU saturates
      (RayAccelerator.cpp:268-300): coherent primary waves run on the
      dense tile engine, incoherent bounce waves on the pair-centric
      sparse engine (ops/trace_sparse.py).
    - ``cpuThreads``/``gpuSubmissionThreads`` -> gone: XLA owns scheduling;
      the mesh axis in :mod:`rayaccel_tpu.parallel` is the concurrency knob.
    - ``maxRaysInFlight`` (128*128*16)        -> ``max_rays_in_flight``: the
      per-chip ray-pool cap; a wave is clamped to at most this many lanes.
    - ``maxRaysPerSpawn``/``cpuShadeBatch``   -> gone: spawn and shade fuse
      into the compiled wave loop, so there is no separate granularity.
    - ``cpuTestBatch``                        -> ``trace_block``: ray-tile
      size of the dense trace kernels' grids.
    - ``rayStreamBatchSize`` (11264, sized so the iGPU stays occupied,
      RayAccelerator.cpp:440) -> ``wave_size``: rays per traced wave; sized to
      keep the VPU's 8x128 lanes and the HBM pipeline occupied.
    """

    backend: str = "pallas"                 # "pallas" | "mxu" | "xla" | "sparse"
    hybrid_tracing: bool = True
    max_rays_in_flight: int = 128 * 128 * 16
    trace_block: int = 1024
    wave_size: int = 128 * 128
    # BVH traversal stack depth per ray (reference GPU kernel uses 64,
    # Kernels.h:166). Kept configurable because it scales wavefront state.
    traversal_stack_depth: int = 48
    # Pixel sampler: "uniform" matches the reference's per-call rand()
    # jitter (Camera.cpp:58); "stratified" is progressive R2
    # low-discrepancy sampling (BASELINE config 4).
    sampler: str = "uniform"
    # Re-sort lane state between bounces by spatial coherence (the TPU
    # form of the reference's ray-stream regrouping, SURVEY.md §7).
    regroup: bool = True
    # Maximum path depth for the Whitted ray-tree spill stack, analog of
    # maxShadingDepth=8 pre-sizing loopData 8*maxRaysInFlight
    # (WhittedRenderer.cpp:47-50).
    max_shading_depth: int = 8
    # Optional (devices, ) mesh shape for multi-chip tile parallelism.
    mesh_shape: Optional[Tuple[int, ...]] = None

    def __post_init__(self):
        if self.backend not in ("mxu", "xla", "pallas", "sparse",
                                "bruteforce"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.sampler not in ("uniform", "stratified"):
            raise ValueError(f"unknown sampler {self.sampler!r}")
        if self.max_rays_in_flight <= 0 or self.wave_size <= 0:
            raise ValueError("ray counts must be positive")
        if self.wave_size % 8 != 0:
            raise ValueError("wave_size must be a multiple of 8")


@dataclasses.dataclass(frozen=True)
class ContextInfo:
    """Introspection data, analog of racc::ContextInfo (RayAccelerator.h:44-49)."""

    device_count: int
    wave_size: int
    max_rays_in_flight: int
    backend: str


def default_configuration(backend: str = "pallas") -> Configuration:
    """Tuned defaults, analog of racc::defaultConfiguration
    (reference RayAccelerator.cpp:429-446): the benched production
    config — Pallas dense work-queue kernel for coherent primaries with
    hybrid routing of bounce waves onto the sparse pair engine, 65k-lane
    waves, 1024-ray trace tiles (docs/PERF_NOTES.md measured matrix).
    The CLI (cli.py:select_backend) and ``Configuration()`` use the same
    default, so the quick-start path IS the fast path."""
    return Configuration(backend=backend, wave_size=128 * 128 * 4)
