"""Micro-probe: Pallas grid-step overhead on TPU.

Times empty kernels with varying grid sizes / block shapes / SMEM use.
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, x):
    _ = float(np.asarray(jnp.sum(fn(x))))  # force full execution
    times = []
    for i in range(4):
        xv = x * (1.0 + 1e-6 * i)
        t0 = time.perf_counter()
        _ = float(np.asarray(jnp.sum(fn(xv))))
        times.append(time.perf_counter() - t0)
    return min(times)


def probe(T, rays, smem_out, smem_in, semantics, outcols=8):
    def kernel(*refs):
        if smem_in and smem_out:
            planes_ref, dirs_ref, out_ref, mout_ref = refs
        elif smem_in:
            planes_ref, dirs_ref, out_ref = refs
        elif smem_out:
            dirs_ref, out_ref, mout_ref = refs
        else:
            dirs_ref, out_ref = refs
        out_ref[0, :, 0:1] = dirs_ref[0, :, 0:1]
        if outcols > 1:
            out_ref[0, :, 1:outcols] = jnp.zeros((rays, outcols - 1), jnp.float32)
        if smem_out:
            for k in range(8):
                mout_ref[0, 0, k] = jnp.int32(k)

    in_specs = []
    if smem_in:
        in_specs.append(pl.BlockSpec((1, 1, 12), lambda i: (i, 0, 0),
                                     memory_space=pltpu.SMEM))
    in_specs.append(pl.BlockSpec((1, rays, 3), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
    out_specs = [pl.BlockSpec((1, rays, outcols), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((T, rays, outcols), jnp.float32)]
    if smem_out:
        out_specs.append(pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((T, 1, 8), jnp.int32))

    kw = {}
    if semantics:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,))

    @jax.jit
    def fn(dirs):
        args = []
        if smem_in:
            args.append(jnp.zeros((T, 1, 12), jnp.float32))
        args.append(dirs)
        res = pl.pallas_call(
            kernel, grid=(T,), in_specs=in_specs,
            out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
            out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
            **kw,
        )(*args)
        return res[0] if isinstance(res, tuple) else res

    dirs = jnp.ones((T, rays, 3), jnp.float32)
    dt = timeit(fn, dirs)
    tot = T * rays
    print(f"T={T:5d} rays={rays:5d} smem_in={smem_in} smem_out={smem_out} "
          f"sem={semantics or '-':9s} outcols={outcols}: {dt*1e3:8.2f} ms "
          f"({dt/T*1e6:7.2f} us/step, {tot/dt/1e6:8.1f}M elt/s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "base"):
        probe(1800, 1152, True, True, None)        # mimics trace kernel io
        probe(1800, 1152, False, True, None)       # no smem out
        probe(1800, 1152, False, False, None)      # pure vmem
        probe(1800, 1152, False, False, "parallel")
        probe(1800, 1152, False, False, "arbitrary")
    if which in ("all", "scale"):
        probe(450, 4608, False, False, None)       # same elements, 4x steps fewer
        probe(225, 9216, False, False, None)
        probe(1800, 1152, False, False, None, outcols=1)
        probe(1800, 128, False, False, None)       # tiny blocks, same steps
