"""Multi-chip tile parallelism on the virtual 8-device CPU mesh
(BASELINE.md config 5: replicated scene, sharded waves, ICI counter psum)."""

import numpy as np
import jax
import pytest

import rayaccel_tpu as racc
from rayaccel_tpu.scene.loader import make_test_scene


@pytest.fixture(scope="module")
def scene64():
    return make_test_scene(viewport=(64, 64), max_depth=2)


def make_renderer(scene, mesh_shape=None, backend="mxu", whitted=False):
    cfg = racc.Configuration(wave_size=4096, backend=backend,
                             mesh_shape=mesh_shape)
    ctx = racc.create_context(cfg)
    cam = racc.Camera.look_at(scene.cam_origin, scene.cam_dir, scene.cam_up,
                              scene.cam_fov, 64, 64)
    cls = racc.WhittedRenderer if whitted else racc.PathTracingRenderer
    return cls(ctx, cam, scene)


def test_mesh_context_created(scene64):
    ctx = racc.create_context(racc.Configuration(mesh_shape=(8,)))
    assert ctx.mesh is not None
    assert ctx.mesh.devices.size == 8


@pytest.mark.parametrize("whitted", [False, True])
def test_sharded_render_runs(scene64, whitted):
    r = make_renderer(scene64, mesh_shape=(8,), whitted=whitted)
    stats = r.render_frame(jax.random.PRNGKey(0))
    img = r.image()
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.max() > 0.01
    assert int(stats.rays_traced) >= 64 * 64
    if whitted:
        assert r.dropped == 0


def test_sharded_matches_single_chip_statistically(scene64):
    """Sharded and single-chip renders use decorrelated per-shard keys, so
    compare converged images (the same scene integrated two ways)."""
    r1 = make_renderer(scene64, mesh_shape=None)
    r8 = make_renderer(scene64, mesh_shape=(8,))
    for i in range(12):
        r1.render_frame(jax.random.PRNGKey(i))
        r8.render_frame(jax.random.PRNGKey(1000 + i))
    rmse = np.sqrt(np.mean((r1.image() - r8.image()) ** 2))
    assert rmse < 0.05, f"sharded render diverges: rmse={rmse}"


def test_sharded_whitted_matches_single_chip(scene64):
    """Whitted is deterministic given primary jitter; with the same
    per-wave key structure differing only in shard folding, images agree
    at the converged level."""
    s8 = type(scene64)(**{**scene64.__dict__, "max_depth": 8})
    r1 = make_renderer(s8, mesh_shape=None, whitted=True)
    r8 = make_renderer(s8, mesh_shape=(8,), whitted=True)
    for i in range(4):
        r1.render_frame(jax.random.PRNGKey(i))
        r8.render_frame(jax.random.PRNGKey(1000 + i))
    rmse = np.sqrt(np.mean((r1.image() - r8.image()) ** 2))
    assert rmse < 0.05


def test_replicate_scene_places_on_all_devices(scene64):
    from rayaccel_tpu.parallel.mesh import make_mesh, replicate_scene
    from rayaccel_tpu.scene.clusters import compile_clusters
    mesh = make_mesh(jax.devices()[:8])
    cs = compile_clusters(scene64, cluster_size=16)
    rep = replicate_scene(mesh, cs)
    assert len(rep.G.sharding.device_set) == 8


def test_sharded_pallas_backend(scene64):
    """The Pallas kernel path must also run under the tile mesh."""
    r = make_renderer(scene64, mesh_shape=(8,), backend="pallas")
    stats = r.render_frame(jax.random.PRNGKey(0))
    img = r.image()
    assert np.isfinite(img).all() and img.max() > 0.01
    assert int(stats.rays_traced) >= 64 * 64
