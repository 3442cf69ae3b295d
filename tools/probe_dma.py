"""ONE-SHOT manual-DMA probe (budget: once per round, background).

Round-2 measured that Pallas manual DMA hangs the chip ~1h via the axon
tunnel (docs/PERF_NOTES.md) — but it is the only road past the pair
F-row gather floor (~23ns/row), so each round re-probes ONCE in case the
tunnel/toolchain changed. Three escalating steps; each prints before/after
so the hang point is identifiable in the log:

  A. static-slice HBM->VMEM copy inside a kernel
  B. dynamically-indexed (scalar-prefetch) HBM block copy
  C. a 4-iteration fori loop of dynamic copies (the work-list shape the
     fused select->pair kernel would need)

Run: timeout 900 python tools/probe_dma.py   (expect either 3 OKs in
seconds, or silence = hang -> kill and do not retry this round).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)
x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)


def kern_a(x_any, out_ref, scratch, sem):
    cp = pltpu.make_async_copy(x_any.at[pl.ds(8, 8)], scratch, sem)
    cp.start()
    cp.wait()
    out_ref[...] = scratch[...]


@jax.jit
def run_a(x):
    return pl.pallas_call(
        kern_a,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(x)


print("A: compiling static-slice DMA...", flush=True)
out = np.asarray(run_a(x))
assert np.array_equal(out, np.asarray(x)[8:16]), out[0, :4]
print("A OK", flush=True)


def kern_b(idx_ref, x_any, out_ref, scratch, sem):
    i = idx_ref[0]
    cp = pltpu.make_async_copy(x_any.at[pl.ds(i * 8, 8)], scratch, sem)
    cp.start()
    cp.wait()
    out_ref[...] = scratch[...]


@jax.jit
def run_b(x, idx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda i, idx: (0, 0)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kern_b,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid_spec=grid_spec,
    )(idx, x)


print("B: compiling dynamic-index DMA...", flush=True)
out = np.asarray(run_b(x, jnp.asarray([3], jnp.int32)))
assert np.array_equal(out, np.asarray(x)[24:32]), out[0, :4]
print("B OK", flush=True)


def kern_c(idx_ref, x_any, out_ref, scratch, sem):
    def body(j, acc):
        i = idx_ref[j]
        cp = pltpu.make_async_copy(x_any.at[pl.ds(i * 8, 8)], scratch, sem)
        cp.start()
        cp.wait()
        return acc + scratch[...]

    out_ref[...] = jax.lax.fori_loop(0, 4, body,
                                     jnp.zeros((8, 128), jnp.float32))


@jax.jit
def run_c(x, idx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda i, idx: (0, 0)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kern_c,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid_spec=grid_spec,
    )(idx, x)


print("C: compiling work-list DMA loop...", flush=True)
idx = jnp.asarray([1, 5, 2, 7], jnp.int32)
out = np.asarray(run_c(x, idx))
want = sum(np.asarray(x)[int(i) * 8:int(i) * 8 + 8] for i in idx)
assert np.allclose(out, want), out[0, :4]
print("C OK — manual DMA usable on this link", flush=True)
