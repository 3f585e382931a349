"""Pallas kernel correctness (interpret mode on the CPU test mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from aadff_tpu.ops.pallas_mlp import flax_mlp_weights, mlp_psf_pallas
from aadff_tpu.psfnet import MLP


def test_pallas_mlp_matches_xla():
    model = MLP(in_features=4, out_features=121, hidden_features=256,
                hidden_layers=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    weights = flax_mlp_weights(variables)

    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.uniform(-1, 1, (2048, 4)).astype(np.float32))
    ref = model.apply(variables, field)
    out = mlp_psf_pallas(field, weights, 121, interpret=True, tile=1024)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # rows are L1-normalised PSFs
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)


def test_pallas_mlp_handles_ragged_n():
    """N not a multiple of the tile is padded and sliced back."""
    model = MLP(in_features=4, out_features=121, hidden_features=256,
                hidden_layers=8)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4)))
    weights = flax_mlp_weights(variables)
    field = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (1500, 4)).astype(np.float32)
    )
    out = mlp_psf_pallas(field, weights, 121, interpret=True, tile=1024)
    assert out.shape == (1500, 121)
    ref = model.apply(variables, field)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
