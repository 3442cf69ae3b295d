"""Attr-gather micro-probes: column width, index distribution, and
dead-lane clamping at frame-pool scale.

Questions (docs/PERF_NOTES.md round-3 decomposition — the winner attr
row gather is the largest single bounce term, ~28-30ms at 983k width):
  1. What does a (983k, cols) take cost at cols = 8/16/21/32?  (Is the
     21-col narrowing worth what the cost model predicts?)
  2. Does index DISTRIBUTION matter — random rows vs ~50% of lanes
     clamped to row 0 (the dead-lane pattern) vs sorted indices?  If
     clamped-dead is cheaper, a one-line `jnp.where(live, slot, 0)`
     in the engines buys the saving for free.

Run from repo root on the TPU: python tools/probe_gather_attr.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.utils.profiling import _timed_loop

R = 983040          # frame pool width
NROWS = 106 * 1024  # ~cluster-scene attr table size (828 * 128)
rng = np.random.default_rng(0)

A32 = jnp.asarray(rng.standard_normal((NROWS, 32)), jnp.float32)
idx_rand = jnp.asarray(rng.integers(0, NROWS, R), jnp.int32)
live = jnp.asarray(rng.random(R) < 0.52)
idx_clamp = jnp.where(live, idx_rand, 0)
idx_sorted = jnp.sort(idx_rand)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timed_take(A, idx, cols):
    def f(eps, A, idx):
        # eps varies the indices so the relay can't dedupe dispatches.
        j = jnp.minimum(idx + eps.astype(jnp.int32), NROWS - 1)
        return jnp.take(A[:, :cols], j, axis=0).sum(axis=0)
    return _timed_loop(f, (A, idx), 6) * 1e3


for cols in (8, 16, 21, 32):
    ms = timed_take(A32, idx_rand, cols)
    emit(probe="attr_cols", cols=cols, ms=round(ms, 2),
         ns_per_row=round(ms * 1e6 / R, 2))

for name, idx in (("random", idx_rand), ("clamp_dead0", idx_clamp),
                  ("sorted", idx_sorted)):
    ms = timed_take(A32, idx, 21)
    emit(probe="attr_idx_dist", dist=name, cols=21, ms=round(ms, 2),
         ns_per_row=round(ms * 1e6 / R, 2))
