"""Probe two suspected fixed costs found by the round-4 whitted xplane:

1. PAIR-KERNEL CALL FLOOR: restart-pass pair kernels with 4-240 items
   showed ~2 ms/call in the depth-8 frame (branch_1_fun.119 = 8 items =
   2.05 ms/call) while the per-item grid tax is only ~3.8 us. If a
   pallas call has a ~2 ms floor, the ~35 restart calls/frame cost
   ~66 ms of the 611 ms whitted frame for trivial work.

2. SCATTER-MIN vs MANUAL SORT-MERGE: the per-ray min merge
   (trace_sparse.py:538 best_p.at[ray].min(packed)) totals ~76 ms/frame
   (XLA lowers it to sort + apply). A manual (ray, packed) 2-operand
   sort puts each ray's minimum at its segment head; a head-only
   set-scatter may beat XLA's generic lowering.

Run from repo root on the TPU: python tools/probe_call_floor.py
Timing rules (docs/PERF_NOTES.md): chain data dependencies, vary
inputs, sync with ONE value readback per timed chain.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.utils.profiling import _timed_loop

from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import RAY_FEATURES, compile_clusters
from rayaccel_tpu.ops.trace_sparse import _make_call, _RANK_SHIFT, _MISS_BITS

sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
n_c = cs.n_clusters
C = cs.cluster_size
col_bits = max((C - 1).bit_length(), 1)
G3 = jnp.asarray(cs.G.reshape(RAY_FEATURES, n_c, 4 * C).transpose(1, 2, 0))
print(f"n_c={n_c} C={C}", flush=True)

rng = np.random.default_rng(7)
SP = 1024




# ---- 1. pair-kernel call floor ----
print("\npair-kernel call cost vs n_items (one cluster run per block):",
      flush=True)
for b in (4, 8, 64, 240, 1024):
    Bp = b
    mp = Bp * SP
    o = rng.uniform(-6, 6, (mp, 3)).astype(np.float32)
    d = rng.normal(size=(mp, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    cl = np.sort(rng.integers(0, n_c, b)).astype(np.int32)
    lanes = np.repeat(cl, SP).astype(np.int32)
    F8 = np.concatenate([d, o, np.zeros((mp, 1), np.float32),
                         np.full((mp, 1), 1e6, np.float32)], axis=1)
    Fp = np.concatenate([
        F8[:, 0:3], F8[:, 3:6],
        np.cross(F8[:, 0:3], F8[:, 3:6]).astype(np.float32) * 0 + 1.0,
        np.ones((mp, 1), np.float32), F8[:, 6:8],
        lanes.view(np.float32)[:, None],
        np.zeros((mp, RAY_FEATURES - 13), np.float32)], axis=1)
    Fp = jnp.asarray(Fp).reshape(Bp, SP, RAY_FEATURES).transpose(0, 2, 1)
    items = jnp.asarray((np.arange(b, dtype=np.int32) << 16) | cl)
    call = _make_call(b, Bp, SP, C, col_bits,
                      jax.lax.Precision.HIGHEST, False)

    def run(eps, Fp_in, items=items, call=call, b=b):
        out = call(items, jnp.int32(b), Fp_in + eps, G3)
        return out[:, 0, :1]

    ms = _timed_loop(run, (Fp,), 30) * 1e3
    print(f"  items={b:5d}: {ms:7.3f} ms/call  "
          f"({ms * 1e3 / b:7.1f} us/item)", flush=True)

# ---- 2. scatter-min vs sort-merge ----
print("\nper-ray min merge at bucket width (R=983040):", flush=True)
R = 983040
for mp in (491520, 983040, 1474560):
    live = rng.random(R) < 0.52
    live_ids = np.where(live)[0]
    ray_np = rng.choice(live_ids, mp).astype(np.int32)
    # cluster-major order: shuffle ray ids (high entropy like production)
    packed_np = rng.integers(0, _MISS_BITS, mp, dtype=np.int64) \
        .astype(np.int32)
    ray_j = jnp.asarray(ray_np)
    packed_j = jnp.asarray(packed_np)

    def scat(eps, packed, ray=ray_j):
        p = packed + eps.astype(jnp.int32)
        best = jnp.full((R,), jnp.int32(_MISS_BITS))
        return best.at[ray].min(p, mode="drop")[:1].astype(jnp.float32)

    def sortm(eps, packed, ray=ray_j):
        p = packed + eps.astype(jnp.int32)
        ks, ps = jax.lax.sort((ray, p), num_keys=2)
        head = jnp.concatenate(
            [jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        idx = jnp.where(head, ks, jnp.int32(R))
        best = jnp.full((R,), jnp.int32(_MISS_BITS))
        return best.at[idx].set(ps, mode="drop")[:1].astype(jnp.float32)

    # Exactness first (CPU semantics match on-device for these ops).
    a = np.asarray(jnp.full((R,), jnp.int32(_MISS_BITS))
                   .at[ray_j].min(packed_j, mode="drop"))
    ks, ps = jax.lax.sort((ray_j, packed_j), num_keys=2)
    head = jnp.concatenate([jnp.ones((1,), bool),
                            ks[1:] != ks[:-1]])
    idx = jnp.where(head, ks, jnp.int32(R))
    bman = np.asarray(jnp.full((R,), jnp.int32(_MISS_BITS))
                      .at[idx].set(ps, mode="drop"))
    n_diff = int((a != bman).sum())
    ms_a = _timed_loop(scat, (packed_j,), 20) * 1e3
    ms_b = _timed_loop(sortm, (packed_j,), 20) * 1e3
    print(f"  mp={mp:8d}: scatter-min {ms_a:7.3f} ms | "
          f"sort-merge {ms_b:7.3f} ms | diff rows {n_diff}", flush=True)
