"""Minimal pair-kernel hardware-vs-interpret harness.

Round-3 regression: trace_sparse returns wrong misses on HARDWARE only
(interpret mode and the select kernel verified clean). This builds one
small cluster-sorted pair batch with the real wrapper code and compares
the packed kernel output bit-for-bit between interpret and Mosaic.
Small shapes => ~1 min compiles => fast bisection.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.scene.loader import make_test_scene
from rayaccel_tpu.scene.clusters import RAY_FEATURES, compile_clusters
from rayaccel_tpu.ops.trace_sparse import _make_call, _RANK_SHIFT
from rayaccel_tpu.ops.intersect import safe_inv_dir

sd = make_test_scene()
cs = compile_clusters(sd, cluster_size=16)
n_c = cs.n_clusters
C = cs.cluster_size
col_bits = max((C - 1).bit_length(), 1)
print("n_c", n_c, "C", C, flush=True)

rng = np.random.default_rng(1)
SP = 512
Bp = 2
mp = Bp * SP

# Random rays aimed at the scene, assigned to ROUND-ROBIN clusters in
# sorted order (cluster-major like the real pipeline).
o = rng.uniform(-6, 6, (mp, 3)).astype(np.float32)
o[:, 1] = rng.uniform(0.5, 6, mp).astype(np.float32)
d = rng.normal(size=(mp, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
tlo = np.zeros(mp, np.float32)
tmax = np.full(mp, 1e6, np.float32)

cl_s = np.sort(rng.integers(0, n_c, mp)).astype(np.int32)
rank_s = np.zeros(mp, np.int32)
lanes = (cl_s | (rank_s << _RANK_SHIFT)).astype(np.int32)

F8 = np.concatenate([d, o, tlo[:, None], tmax[:, None]], axis=1)
Fp = np.concatenate([
    F8, lanes.view(np.float32)[:, None],
    np.zeros((mp, RAY_FEATURES - 9), np.float32)], axis=1)
Fp = jnp.asarray(Fp).reshape(Bp, SP, RAY_FEATURES).transpose(0, 2, 1)

# Items: one per (block, cluster run).
pos = np.arange(mp, dtype=np.int32)
prev = np.concatenate([cl_s[:1] - 1, cl_s[:-1]])
boundary = (pos % SP == 0) | (cl_s != prev)
bpos = pos[boundary]
n_items = len(bpos)
items = ((bpos // SP) << 16) | cl_s[bpos]
cap = -(-n_items // 8) * 8
items = np.concatenate([items, np.full(cap - n_items, items[-1],
                                       np.int32)]).astype(np.int32)
print("items:", n_items, "cap:", cap, flush=True)

G3 = cs.G.reshape(RAY_FEATURES, n_c, 4 * C).transpose(1, 2, 0)

outs = {}
for interp in (True, False):
    call = _make_call(cap, Bp, SP, C, col_bits,
                      jax.lax.Precision.HIGHEST, interp)
    out = call(jnp.asarray(items), jnp.int32(n_items), Fp, G3)
    outs[interp] = np.asarray(out)

pk_i = outs[True][:, 0, :].view(np.int32)
pk_h = outs[False][:, 0, :].view(np.int32)
diff = (pk_i != pk_h)
print("packed mismatches:", int(diff.sum()), "of", mp, flush=True)
if diff.sum():
    bi, li = np.nonzero(diff)
    for j in range(min(8, len(bi))):
        b, l = int(bi[j]), int(li[j])
        print(f"block {b} lane {l} cl {cl_s[b*SP+l]}"
              f" interp {pk_i[b, l]:#010x} hw {pk_h[b, l]:#010x}",
              flush=True)
    # Which clusters/blocks are affected?
    print("affected blocks:", sorted(set(bi.tolist()))[:10], flush=True)
    aff = sorted(set(int(cl_s[b * SP + l]) for b, l in zip(bi, li)))
    print("affected clusters:", aff[:20], "...", len(aff), "total", flush=True)
else:
    print("CLEAN: hardware == interpret", flush=True)
