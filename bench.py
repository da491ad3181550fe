"""Headline benchmark: primary rays/s at 1080p depth-6 on one TPU chip.

Runs the PRODUCTION path (binned: global expansion + screen binning +
the windowed Pallas ray kernel, `sphereflake_tpu/ops/binned.py`) and
prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

vs_baseline is against BASELINE.json's target of 2e9 primary rays/s per
v5p chip (the reference itself publishes no numbers — BASELINE.md).
Extra context lines go to stderr.

Timing methodology (docs/PERF.md): the tunneled axon backend neither
synchronizes on `block_until_ready` nor re-executes identical
dispatches (the relay memoizes them), so the only honest measurement
runs N frames inside ONE dispatch — a `lax.scan` whose per-frame
camera varies — synchronized by fetching the scalar result value.
Per-frame device time is the marginal (t(n=22) - t(n=2)) / 20, which
cancels launch + fetch overhead exactly. Correctness gates the number:
a frame that dropped geometry (pair-table overflow) fails the bench
rather than reporting a fast lie.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from functools import partial


def main() -> int:
    cache = os.path.expanduser(
        os.environ.get("SPHEREFLAKE_CACHE_DIR", "~/.cache/jax-bench")
    )
    os.makedirs(cache, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from sphereflake_tpu.config import RenderConfig, default_scene
    from sphereflake_tpu.render import render_gbuffer

    dev = jax.devices()[0]
    print(f"bench device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    # 1080p depth-6: BASELINE.json config 3 geometry, production path.
    cfg = RenderConfig(
        width=1920,
        height=1080,
        max_depth=6,
        tile_h=32,
        tile_w=32,
        max_frontier=1024,
        algorithm="binned" if dev.platform != "cpu" else "fast",
        strict_lod=True,
    )
    scene0 = default_scene()

    # Correctness gate on a full frame first.
    t0 = time.perf_counter()
    gb = render_gbuffer(scene0, cfg)
    _ = float(np.asarray(jnp.sum(jnp.minimum(gb.min_t, 1e30))))
    compile_s = time.perf_counter() - t0
    print(f"first frame (incl. compile): {compile_s:.1f}s", file=sys.stderr)
    overflow = int(gb.metrics.overflow)
    print(
        f"algorithm={cfg.algorithm} depth_reached={int(gb.metrics.max_depth_reached)} "
        f"overflow={overflow} nodes={int(gb.metrics.nodes_visited)} "
        f"closest={float(gb.metrics.closest_distance):.3f}",
        file=sys.stderr,
    )
    if overflow:
        print(
            f"FAIL: pair-table overflow dropped {overflow} nodes — the "
            "benchmarked image would be missing geometry; raise "
            "max_frontier / PAIR_CAP",
            file=sys.stderr,
        )
        return 1

    @partial(jax.jit, static_argnames=("n",))
    def frames(scene, n):
        def body(acc, i):
            fi = i.astype(jnp.float32)
            cam = dataclasses.replace(
                scene.camera, yaw=scene.camera.yaw + 1e-7 * fi
            )
            gb = render_gbuffer(dataclasses.replace(scene, camera=cam), cfg)
            # Consume two pixels so no frame's work can be elided.
            return acc + gb.min_t[5, 5] + gb.min_t[540, 960], None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    fresh = iter(range(1, 1 << 20))

    def run(n: int) -> float:
        # Fresh top-level input each call: the relay memoizes identical
        # (executable, inputs) dispatches.
        cam = dataclasses.replace(
            scene0.camera, roll=scene0.camera.roll + 1e-6 * next(fresh)
        )
        sc = dataclasses.replace(scene0, camera=cam)
        t0 = time.perf_counter()
        float(frames(sc, n))
        return time.perf_counter() - t0

    n_small, n_big = 2, 22
    run(n_small)  # compile both scan variants
    run(n_big)
    dts = []
    for _ in range(3):
        t_s = run(n_small)
        t_b = run(n_big)
        dts.append((t_b - t_s) / (n_big - n_small))
    dt = min(dts)
    rays_per_s = cfg.width * cfg.height / dt
    print(
        f"marginal device time over {n_big - n_small} in-dispatch frames: "
        f"{dt * 1e3:.2f} ms/frame -> {rays_per_s / 1e6:.1f}M rays/s "
        f"(trials: {', '.join(f'{d * 1e3:.2f}' for d in dts)} ms)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "primary_rays_per_second_1080p_depth6_1chip",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / 2.0e9,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
