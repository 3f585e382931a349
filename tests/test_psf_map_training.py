"""MLPConv PSF-map training data path (reference psfnet.py:173-242)."""
import numpy as np
import pytest


def test_calc_psf_map_and_training_batch():
    import jax

    from aadff_tpu.psfnet import PSFNet

    from conftest import LENS_RF50

    net = PSFNet(LENS_RF50, sensor_res=(64, 64), kernel_size=11)
    net.spp = 256  # keep the CPU test cheap
    psf_map = net.calc_psf_map(-2400.0, -2400.0, psf_grid=(2, 2),
                               key=jax.random.PRNGKey(0))
    assert psf_map.shape == (1, 22, 22)
    m = np.asarray(psf_map)
    assert np.isfinite(m).all() and m.min() >= 0
    # each grid cell is an L1-normalised PSF
    for i in range(2):
        for j in range(2):
            cell = m[0, i * 11:(i + 1) * 11, j * 11:(j + 1) * 11]
            assert abs(cell.sum() - 1.0) < 1e-4

    inp, maps = net.get_training_psf_map(bs=2, psf_grid=(2, 2),
                                         psf_map_size=(44, 44),
                                         key=jax.random.PRNGKey(1))
    assert inp.shape == (2, 2)
    assert maps.shape == (2, 1, 44, 44)
    assert np.isfinite(np.asarray(maps)).all()


def test_mlpconv_model_output_shape():
    import jax
    import jax.numpy as jnp

    from aadff_tpu.psfnet import MLPConv

    model = MLPConv(in_features=2, ks=128)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 2)))
    out = model.apply(variables, jnp.zeros((2, 2)))
    assert out.shape == (2, 128, 128, 1)


def test_mlpconv_training_branch():
    """train_psfnet with the mlpconv architecture trains on PSF maps
    (reference psfnet.py:93-97)."""
    from aadff_tpu.psfnet import PSFNet

    from conftest import LENS_RF50

    net = PSFNet(LENS_RF50, model_name="mlpconv", kernel_size=11,
                 sensor_res=(64, 64))
    net.spp = 128
    losses = net.train_psfnet(iters=2, bs=1, lr=1e-4, evaluate_every=1000,
                              result_dir="/tmp/mlpconv_train_test")
    assert len(losses) == 3 and all(np.isfinite(losses))
