"""Native (C++) host-side scene compiler with on-demand build + ctypes
bindings. Falls back to the NumPy implementations when unavailable
(set RACC_NO_NATIVE=1 to force the fallback)."""

from rayaccel_tpu.scene.native.build import (get_library, native_available,
                                             build_bvh_native,
                                             pair_all_native,
                                             pair_leaves_native)

__all__ = ["get_library", "native_available", "build_bvh_native",
           "pair_all_native", "pair_leaves_native"]
