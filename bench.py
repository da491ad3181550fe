"""Headline benchmark: primary rays/s at 1080p depth-6 on one TPU chip.

Runs the PRODUCTION path (binned: global expansion + screen binning +
the fused raygen+trace+shade Pallas kernel, `ops/binned.py`) and prints
ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N, ...}

The headline value measures what the REFERENCE's own rays/s counter
measures (`Sphereflake.cpp:184` += packet width per traced packet,
reported each second, `main.cpp:285-287`): sustained ray throughput
while frameless workers continuously re-trace a STATIC view. The
TPU-native frameless unit is the 1024-ray tile; the per-camera pair
table is prepared once, as the reference's workers reread a fixed view.
The number is gated on correctness: the frameless accumulation must
cover every tile, match the full renderer, and drop zero geometry. The
stricter full-frame metric (camera moving every frame, re-binned per
frame) is also measured and carried in the JSON as
"full_frame_rays_per_second".

vs_baseline is against BASELINE.json's target of 2e9 primary rays/s per
v5p chip (the reference itself publishes no numbers — BASELINE.md).
Extra context lines go to stderr.

Round ritual (VERDICT r4 item 8): run `python tools/tpu_validate.py`
(the compiled-on-chip invariant sweep) before trusting any bench
number, and record its table in docs/PERF.md — the CPU suite
interprets every kernel, so only the sweep proves the compiled paths.

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
    # Median, not min: single-trial outliers on the jittery tunnel cut
    # both ways, and a min over marginals can undercut every real
    # trial (round-5 probes saw a 1.46 ms "min" among 2.9-3.2 ms
    # trials). The full spread rides in the JSON.
    dt = sorted(dts)[1]
    frame_rays_per_s = cfg.width * cfg.height / dt
    print(
        f"full frames (moving camera, re-binned each frame): "
        f"{dt * 1e3:.2f} ms/frame -> {frame_rays_per_s / 1e6:.1f}M rays/s "
        f"(trials: {', '.join(f'{d * 1e3:.2f}' for d in dts)} ms)",
        file=sys.stderr,
    )

    # ---- Headline: sustained rays/s, measured the way the REFERENCE
    # measures its title-bar number (`Sphereflake.cpp:184`,
    # `main.cpp:285-287`): a STATIC view continuously re-traced by the
    # frameless workers, counter reset each second. The TPU-native
    # frameless unit is the 1024-ray tile (`runtime/progressive.py`);
    # the pair table is prepared once per camera exactly as the
    # reference's workers reread a fixed view. Correctness gates below:
    # the accumulated image must match the full renderer, cover every
    # tile, and drop nothing.
    from sphereflake_tpu.runtime.progressive import (
        progressive_prepare_trimmed,
        progressive_tiles_init,
        progressive_tiles_step,
        tile_progressive_gbuffer,
    )

    # 1024 Sobol-chosen tiles per step: the step-size sweep
    # (tools/stepsize_probe.py) measured 0.96 us/tile at 1024 vs 1.11
    # at 2048/4096 — smaller refresh batches run closer to the
    # reference's own granularity (8-ray packets) and faster per ray.
    tiles_per_step = 1024
    T = cfg.tiles_y * cfg.tiles_x

    # Correctness gate: accumulate to full coverage and compare. The
    # prepared table is occlusion- and frustum-trimmed (provably
    # output-preserving — `progressive_prepare_trimmed`); the gate
    # below verifies the accumulated buffer against the UNTRIMMED full
    # renderer, so any incorrect trim fails the bench.
    st = progressive_tiles_init(cfg, seed=1)
    prepared0 = progressive_prepare_trimmed(scene0, cfg)
    if int(np.asarray(prepared0[3])):
        print("FAIL: pair overflow in frameless prepare", file=sys.stderr)
        return 1
    for _ in range(24):
        st = progressive_tiles_step(
            st, scene0, cfg, tiles_per_step=tiles_per_step,
            prepared=prepared0,
        )
    covered = int(np.asarray(st.covered).sum())
    pos_t, _nrm_t, mt_t, _hit_t = tile_progressive_gbuffer(st, cfg)
    mt_full = np.asarray(gb.min_t)
    mt_acc = np.asarray(mt_t)
    cov_mask = np.kron(
        np.asarray(st.covered).reshape(cfg.tiles_y, cfg.tiles_x),
        np.ones((cfg.tile_h, cfg.tile_w), bool),
    )[: cfg.height, : cfg.width]
    agree = (
        np.isclose(mt_acc, mt_full, rtol=1e-4, atol=1e-4) | ~cov_mask
    ).mean()
    print(
        f"frameless gate: {covered}/{T} tiles covered, "
        f"{agree:.4f} of pixels match the full render",
        file=sys.stderr,
    )
    if covered < T or agree < 0.999:
        print("FAIL: frameless accumulation diverges", file=sys.stderr)
        return 1

    @partial(jax.jit, static_argnames=("n",))
    def refresh(scene, n):
        state = progressive_tiles_init(cfg, seed=0)
        prepared = progressive_prepare_trimmed(scene, cfg)

        def body(st, _):
            st = progressive_tiles_step(
                st, scene, cfg, tiles_per_step=tiles_per_step,
                prepared=prepared,
            )
            return st, None

        state, _ = jax.lax.scan(body, state, None, length=n)
        return state.rows[5, 0, 0, 0] + state.closest_distance

    def run_refresh(n: int) -> float:
        cam = dataclasses.replace(
            scene0.camera, roll=scene0.camera.roll + 1e-6 * next(fresh)
        )
        sc = dataclasses.replace(scene0, camera=cam)
        t0 = time.perf_counter()
        float(refresh(sc, n))
        return time.perf_counter() - t0

    run_refresh(n_small)
    run_refresh(n_big)
    # 5 trials (vs 3 for full frames): the ~1 ms step leaves the
    # marginal more exposed to tunnel jitter, so the median needs more
    # support; the full spread rides in the JSON either way.
    rts = []
    for _ in range(5):
        t_s = run_refresh(n_small)
        t_b = run_refresh(n_big)
        rts.append((t_b - t_s) / (n_big - n_small))
    rdt = sorted(rts)[2]  # median (see full-frame note)
    rays_per_s = tiles_per_step * 1024 / rdt
    print(
        f"sustained frameless refresh (reference metric): "
        f"{rdt * 1e3:.2f} ms per {tiles_per_step}-tile step -> "
        f"{rays_per_s / 1e6:.1f}M rays/s "
        f"(trials: {', '.join(f'{d * 1e3:.2f}' for d in rts)} ms)",
        file=sys.stderr,
    )

    def spread(trials_s, work_rays):
        """Per-trial rays/s spread: the tunnel drifts ±35% across
        sessions (docs/PERF.md), so the artifact carries the variance
        it saw rather than a bare min."""
        rs = sorted(work_rays / t for t in trials_s)
        return {
            "min": rs[0],
            "median": rs[len(rs) // 2],
            "max": rs[-1],
        }

    print(
        json.dumps(
            {
                # Named for its semantics (round-4 advisor): sustained
                # frameless refresh of a STATIC view — the reference's
                # own title-bar rays/s counter (`Sphereflake.cpp:184`,
                # reset each second while workers re-trace a fixed
                # view, `main.cpp:285-287`). NOT comparable to the
                # round-1..3 full-frame 'primary_rays_per_second_*'
                # metric, which rides below as
                # full_frame_rays_per_second.
                "metric": "sustained_frameless_rays_per_second_1080p_depth6_1chip",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / 2.0e9,
                "mode": "sustained_frameless_refresh_static_view "
                "(the reference's rays/s counter semantics, "
                "Sphereflake.cpp:184; gated on full-coverage parity "
                "with the full renderer)",
                "full_frame_rays_per_second": frame_rays_per_s,
                "tiles_per_step": tiles_per_step,
                "sustained_trials_rays_per_second": spread(
                    rts, tiles_per_step * 1024
                ),
                "full_frame_trials_rays_per_second": spread(
                    dts, cfg.width * cfg.height
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
