"""Headline benchmark: primary rays/s at 1080p depth-6 on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

vs_baseline is against BASELINE.json's target of 2e9 primary rays/s per
v5p chip (the reference itself publishes no numbers — BASELINE.md).
Extra context lines go to stderr.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    import jax

    from sphereflake_tpu.config import RenderConfig, default_scene
    from sphereflake_tpu.render import render_gbuffer

    dev = jax.devices()[0]
    print(f"bench device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    # 1080p depth-6: BASELINE.json config 3 geometry. 1080 = 9*120.
    cfg = RenderConfig(
        width=1920,
        height=1080,
        max_depth=6,
        tile_h=120,
        tile_w=128,
        tile_batch=27,
        max_frontier=1024,
        strict_lod=True,
    )
    scene = default_scene()

    t0 = time.perf_counter()
    gb = render_gbuffer(scene, cfg)
    jax.block_until_ready(gb.min_t)
    compile_s = time.perf_counter() - t0
    print(f"first frame (incl. compile): {compile_s:.1f}s", file=sys.stderr)
    print(
        f"depth_reached={int(gb.metrics.max_depth_reached)} "
        f"overflow={int(gb.metrics.overflow)} "
        f"closest={float(gb.metrics.closest_distance):.3f}",
        file=sys.stderr,
    )

    frames = 5
    t0 = time.perf_counter()
    for _ in range(frames):
        gb = render_gbuffer(scene, cfg)
    jax.block_until_ready(gb.min_t)
    dt = time.perf_counter() - t0
    rays = cfg.width * cfg.height * frames
    rays_per_s = rays / dt
    print(
        f"{frames} frames in {dt:.3f}s -> {rays_per_s / 1e6:.1f}M rays/s "
        f"({dt / frames * 1e3:.1f} ms/frame)",
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
