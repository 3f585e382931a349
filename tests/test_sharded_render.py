"""Rendering fan-out over the mesh: batch-sharded focal-stack rendering
produces the same result as unsharded (SURVEY.md §2 'rendering fan-out ...
should shard over the same mesh')."""
import jax
import numpy as np
import pytest


def test_render_stack_batch_sharded_equals_unsharded():
    import jax.numpy as jnp

    from aadff_tpu.parallel.mesh import data_sharding, make_mesh
    from aadff_tpu.psfnet import PSFNet

    from conftest import LENS_RF50

    net = PSFNet(LENS_RF50, sensor_res=(16, 128), kernel_size=11)
    rng = np.random.default_rng(0)
    B, S, H, W = 8, 3, 16, 128
    img = rng.uniform(0, 1, (B, 3, H, W)).astype(np.float32)
    depth = -rng.uniform(500, 15000, (B, 1, H, W)).astype(np.float32)
    fds = -np.sort(rng.uniform(500, 15000, (B, S)))[:, ::-1].copy().astype(np.float32)

    ref = np.asarray(net.render_stack(img, depth, fds))

    mesh = make_mesh(8)
    img_s = jax.device_put(jnp.asarray(img), data_sharding(mesh, 4))
    depth_s = jax.device_put(jnp.asarray(depth), data_sharding(mesh, 4))
    fds_s = jax.device_put(jnp.asarray(fds), data_sharding(mesh, 2))
    out = net.render_stack(img_s, depth_s, fds_s)
    # output stays batch-sharded over the mesh
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
