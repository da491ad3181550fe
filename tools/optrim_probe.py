"""Interleaved A/B of two exact-semantics vector-op trims in the fused
kernel's node loop (REJECTED — kept reproducible):

  1. ok = (min(tca, disc) >= 0) & lod_ok   [vs (tca>=0) & lod & (disc>=0)]
  2. ts = tca - sqrt(disc)                 [vs sqrt(max(disc, 0)); a
     disc<0 NaN never survives: every NaN compare is false and `ok` is
     already false there]

-2 vector ops of ~22 per candidate ON PAPER, but measured 0.93x
(SLOWER) with bit-identical output: Mosaic already schedules the
independent compares well and the min adds a serial dependency
(docs/PERF.md round-5 negative results). tools/_binned_r5a.py holds
the rejected variant; the live module keeps the original form.

Usage: python tools/optrim_probe.py
"""
from __future__ import annotations

import dataclasses
import importlib.util
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))
from _common import setup_cache

setup_cache()
import jax
import jax.numpy as jnp
import numpy as np

from sphereflake_tpu.config import RenderConfig, default_scene
from sphereflake_tpu.models.sphereflake import child_templates, root_frame
from sphereflake_tpu.ops import binned as b_new

_spec = importlib.util.spec_from_file_location(
    "_binned_r5a", os.path.join(_here, "_binned_r5a.py")
)
b_old = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(b_old)

scene0 = default_scene()
cfg = RenderConfig(width=1920, height=1080, max_depth=6, tile_h=32,
                   tile_w=32, algorithm="binned")
T = cfg.tiles_y * cfg.tiles_x
STEP = 2048
fresh = iter(range(1, 100000))


def fresh_scene():
    cam = dataclasses.replace(
        scene0.camera, roll=scene0.camera.roll + 1e-6 * next(fresh)
    )
    return dataclasses.replace(scene0, camera=cam)


def make_refresh(mod, n):
    @jax.jit
    def run(scene):
        root = root_frame(scene.camera.position)
        templates = child_templates(scene.fractal)
        pairs, starts, lens, _ = mod.binned_pairs(scene, cfg, root, templates)
        cam0 = mod.camera_vector(scene, cfg)
        ids = jnp.arange(STEP, dtype=jnp.int32) % T

        def body(acc, i):
            cam = cam0.at[11].add(1e-12 * i.astype(jnp.float32))
            out, _m = mod.trace_pairs_fused_subset(
                cam, pairs, starts, lens, ids, cfg, shade_only=True
            )
            return acc + out[5, 0, 0, 0] + out[-1, 0, 0, 0], None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(n, dtype=jnp.int32)
        )
        return acc

    return run


def timed(fn, sc):
    t0 = time.perf_counter()
    float(fn(sc))
    return time.perf_counter() - t0


def marginal(make, label):
    f2, f22 = make(2), make(22)
    timed(f2, fresh_scene())
    timed(f22, fresh_scene())
    trials = sorted(
        (timed(f22, fresh_scene()) - timed(f2, fresh_scene())) / 20
        for _ in range(3)
    )
    print(f"{label:12s}: {trials[1] * 1e3:6.2f} ms/step median "
          f"(trials {', '.join(f'{t * 1e3:.2f}' for t in trials)})",
          flush=True)
    return trials[1]


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    # Bit-parity of full-frame kernel rows.
    def rows_fn(mod):
        @jax.jit
        def rows(scene):
            root = root_frame(scene.camera.position)
            templates = child_templates(scene.fractal)
            pairs, starts, lens, _ = mod.binned_pairs(
                scene, cfg, root, templates
            )
            cam = mod.camera_vector(scene, cfg)
            out, _ = mod.trace_pairs_fused_soa(cam, pairs, starts, lens, cfg)
            return out

        return rows

    sc = fresh_scene()
    r_old = np.asarray(rows_fn(b_old)(sc))
    r_new = np.asarray(rows_fn(b_new)(sc))
    bit = (r_old == r_new).mean()
    print(f"full-frame rows bit-parity old-vs-new: {bit:.6f}")

    t_old = marginal(lambda n: make_refresh(b_new, n), "step/kept")
    t_new = marginal(lambda n: make_refresh(b_old, n), "step/optrim")
    t_old2 = marginal(lambda n: make_refresh(b_new, n), "step/kept")
    tp = min(t_old, t_old2)
    rays = STEP * 1024
    print(f"\n{rays / tp / 1e6:.0f}M -> {rays / t_new / 1e6:.0f}M rays/s "
          f"({tp / t_new:.3f}x)")


if __name__ == "__main__":
    main()
