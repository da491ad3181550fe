"""Compiled-on-TPU validation sweep (VERDICT r3 item 6).

The CPU test suite runs every Pallas kernel in INTERPRET mode; Mosaic
compilation can diverge from interpretation (round 2 shipped a real
dot-precision bug only visible compiled, commit c7702b2). This sweep
runs the suite's key invariants COMPILED on the real chip:

  1. binned-vs-pallas hit/min_t parity (small frame)
  2. banded-vs-whole-frame equality (bit-exact on TPU: one Mosaic
     kernel, same camera scalars per band)
  3. deep dive reaches level 8+ on the two-lane codes (depth 10)
  4. progressive binned step: prepared-vs-unprepared bit parity
     (+ tile-progressive vs full render, + trimmed-table bit parity)
  5. depth-7 boundary: binned matches the XLA fast path

Usage: python tools/tpu_validate.py   (exit 0 = all pass)
"""
from __future__ import annotations

import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))  # repo root for the package
from _common import setup_cache

setup_cache()
import jax
import jax.numpy as jnp
import numpy as np

FAILURES: list[str] = []


def check(name, ok, detail=""):
    status = "ok" if ok else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def main() -> int:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    if dev.platform == "cpu":
        print("WARNING: running on CPU — this sweep only proves "
              "anything on a real TPU", file=sys.stderr)

    import dataclasses

    from sphereflake_tpu.config import RenderConfig, default_scene
    from sphereflake_tpu.render import render_gbuffer

    scene = default_scene()
    t0 = time.perf_counter()

    # 1. binned vs pallas parity, compiled.
    kw = dict(width=128, height=96, max_depth=3, tile_h=32, tile_w=32,
              max_frontier=512)
    gb = render_gbuffer(scene, RenderConfig(algorithm="binned", **kw))
    gp = render_gbuffer(scene, RenderConfig(algorithm="pallas", **kw))
    hb, hp = np.asarray(gb.hit), np.asarray(gp.hit)
    both = hb & hp
    tclose = np.isclose(
        np.asarray(gb.min_t)[both], np.asarray(gp.min_t)[both],
        rtol=1e-4, atol=1e-4,
    ).mean()
    # Cross-ALGORITHM tolerance is looser compiled than interpreted:
    # the binned kernel's in-kernel raygen and the pallas path's XLA
    # raygen are contracted differently by Mosaic vs XLA
    # (--xla_allow_excess_precision), and 1-ulp dir differences move
    # tangent-graze t by >1e-4 at silhouettes — ~1.4% of the hit
    # pixels at this deliberately silhouette-heavy 128x96 (measured
    # t=0.9864). Within ONE algorithm the compiled pipeline is exact
    # (see the banded==whole check below: bit-identical).
    check("binned-vs-pallas parity",
          (hb == hp).mean() > 0.999 and tclose > 0.98,
          f"hit={(hb == hp).mean():.4f} t={tclose:.4f}")

    # 2. banded == whole frame (bit-exact compiled: same Mosaic kernel,
    # same camera scalars; only the binning partition differs).
    cfgw = RenderConfig(width=512, height=256, max_depth=4, tile_h=32,
                        tile_w=32, algorithm="binned")
    gw = render_gbuffer(scene, cfgw)
    gbn = render_gbuffer(scene, dataclasses.replace(cfgw, band_tile_rows=2))
    same_hit = (np.asarray(gw.hit) == np.asarray(gbn.hit)).all()
    dt = np.abs(np.asarray(gw.min_t) - np.asarray(gbn.min_t))
    dt = np.where(np.asarray(gw.hit) & np.asarray(gbn.hit), dt, 0.0)
    check("banded == whole frame", bool(same_hit) and dt.max() == 0.0,
          f"hit_same={same_hit} max|dt|={dt.max():.3g}")

    # 3. deep dive (depth 10, two-lane codes) — compiled.
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_binned import dive_scene

    dscene = dive_scene()
    dcfg = RenderConfig(width=64, height=32, max_depth=10, tile_h=32,
                        tile_w=32, algorithm="binned", global_cap=1 << 15)
    gd = render_gbuffer(dscene, dcfg)
    depth = int(gd.metrics.max_depth_reached)
    check("deep dive reaches level 8+", depth >= 8,
          f"depth={depth} hit={float(np.asarray(gd.hit).mean()):.2f}")

    # 4. progressive: prepared vs unprepared bit parity — compiled.
    from sphereflake_tpu.runtime.progressive import (
        progressive_init,
        progressive_prepare,
        progressive_step,
    )

    pcfg = RenderConfig(width=96, height=64, max_depth=2, tile_h=32,
                        tile_w=32, algorithm="binned")
    prepared = progressive_prepare(scene, pcfg)
    sa = progressive_init(pcfg, seed=3)
    sb = progressive_init(pcfg, seed=3)
    for _ in range(2):
        sa = progressive_step(sa, scene, pcfg, batch_size=1024)
        sb = progressive_step(sb, scene, pcfg, batch_size=1024,
                              prepared=prepared)
    check("progressive prepared parity",
          (np.asarray(sa.min_t) == np.asarray(sb.min_t)).all()
          and int(sa.samples_traced) == int(sb.samples_traced))

    # 4b. tile-progressive: covered tiles must equal the full render
    # (same Mosaic kernel, indirect tile map) — compiled.
    from sphereflake_tpu.runtime.progressive import (
        progressive_tiles_init,
        progressive_tiles_step,
        tile_progressive_gbuffer,
    )

    prepared_t = progressive_prepare(scene, pcfg)
    stt = progressive_tiles_init(pcfg, seed=1)
    for _ in range(6):
        stt = progressive_tiles_step(stt, scene, pcfg, tiles_per_step=4,
                                     prepared=prepared_t)
    _pos, _nrm, mt_t, _hit = tile_progressive_gbuffer(stt, pcfg)
    gbt = render_gbuffer(scene, pcfg)
    cov = np.asarray(stt.covered)
    ty_n, tx_n = pcfg.tiles_y, pcfg.tiles_x
    mask = np.zeros((pcfg.padded_height, pcfg.padded_width), bool)
    for t in np.where(cov)[0]:
        yy, xx = divmod(int(t), tx_n)
        mask[yy * 32 : (yy + 1) * 32, xx * 32 : (xx + 1) * 32] = True
    mask = mask[: pcfg.height, : pcfg.width]
    eq = (np.asarray(mt_t)[mask] == np.asarray(gbt.min_t)[mask]).mean()
    check("tile-progressive == full render on covered tiles",
          cov.sum() > 0 and eq > 0.999,
          f"covered={int(cov.sum())}/{ty_n * tx_n} eq={eq:.4f}")

    # 4c. occlusion/frustum-trimmed prepared table: the trim must be
    # output-INVISIBLE compiled (bit parity vs the untrimmed table on
    # every refreshed tile) — the admissibility condition of
    # `progressive_prepare_trimmed` (round 5).
    from sphereflake_tpu.runtime.progressive import (
        progressive_prepare_trimmed,
    )

    trimmed = progressive_prepare_trimmed(scene, pcfg)
    st_a = progressive_tiles_init(pcfg, seed=2)
    st_b = progressive_tiles_init(pcfg, seed=2)
    T_p = pcfg.tiles_y * pcfg.tiles_x
    for _ in range(2):
        st_a = progressive_tiles_step(st_a, scene, pcfg,
                                      tiles_per_step=T_p,
                                      prepared=prepared_t)
        st_b = progressive_tiles_step(st_b, scene, pcfg,
                                      tiles_per_step=T_p,
                                      prepared=trimmed)
    n_plain = int(np.asarray(prepared_t[2]).sum())
    n_trim = int(np.asarray(trimmed[2]).sum())
    bitp = (np.asarray(st_a.rows) == np.asarray(st_b.rows)).mean()
    check("trimmed prepared table bit-parity",
          bitp == 1.0 and n_trim <= n_plain,
          f"pairs {n_plain}->{n_trim} eq={bitp:.6f}")

    # 5. depth-7 two-lane boundary vs the XLA fast path — compiled.
    kw7 = dict(width=64, height=32, max_depth=7, tile_h=32, tile_w=32,
               global_cap=1 << 15)
    g7b = render_gbuffer(dscene, RenderConfig(algorithm="binned", **kw7))
    g7f = render_gbuffer(
        dscene,
        RenderConfig(algorithm="fast", max_frontier=1 << 14, tile_batch=1,
                     **kw7),
    )
    h7 = (np.asarray(g7b.hit) == np.asarray(g7f.hit)).mean()
    check("depth-7 boundary parity", h7 > 0.999
          and int(g7b.metrics.max_depth_reached) == 7,
          f"hit={h7:.4f} depth={int(g7b.metrics.max_depth_reached)}")

    print(f"total {time.perf_counter() - t0:.1f}s; "
          f"{'ALL OK' if not FAILURES else 'FAILURES: ' + ', '.join(FAILURES)}",
          flush=True)
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
