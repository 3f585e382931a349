"""PSF surrogate network architectures in Flax.

Re-implementation of `deeplens/psfnet_arch.py`: the production `MLP`
(psfnet_arch.py:24-47), the `MLPConv` encoder/decoder (50-104), and `Siren`
(107-248).  Layer sizes and the output Sigmoid + L1 normalisation are kept
identical so the reference's pretrained pickle converts weight-for-weight.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    """4 -> hidden//4 -> hidden -> [hidden]*layers -> out, Sigmoid, L1-norm."""

    in_features: int = 4
    out_features: int = 121
    hidden_features: int = 256
    hidden_layers: int = 8

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features // 4)(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden_features)(x)
        x = nn.relu(x)
        for _ in range(self.hidden_layers):
            x = nn.Dense(self.hidden_features)(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_features)(x)
        x = nn.sigmoid(x)
        # L1 normalisation along the kernel axis (psfnet_arch.py:46)
        x = x / (jnp.sum(jnp.abs(x), axis=-1, keepdims=True) + 1e-12)
        return x


class MLPConv(nn.Module):
    """MLP encoder + conv decoder for PSF-map prediction (psfnet_arch.py:50-104).

    The reference instantiates this without the required `ks` argument
    (psfnet.py:61 — a latent bug); here `ks` is a proper field with the
    intended constraint ks % 4 == 0.
    """

    in_features: int = 2
    ks: int = 128
    channels: int = 1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        assert self.ks % 4 == 0, "ks must be 4n"
        ks_mlp = self.ks // 4
        h = nn.Dense(256)(x)
        h = nn.relu(h)
        h = nn.Dense(256)(h)
        h = nn.relu(h)
        h = nn.Dense(512)(h)
        h = nn.relu(h)
        h = nn.Dense(self.channels * ks_mlp**2)(h)

        h = h.reshape((-1, ks_mlp, ks_mlp, self.channels))  # NHWC
        h = nn.ConvTranspose(64, (3, 3), padding="SAME")(h)
        h = nn.relu(h)
        h = nn.ConvTranspose(64, (3, 3), padding="SAME")(h)
        h = nn.relu(h)
        h = jax.image.resize(h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]),
                             method="nearest")
        h = nn.ConvTranspose(64, (3, 3), padding="SAME")(h)
        h = nn.relu(h)
        h = nn.ConvTranspose(64, (3, 3), padding="SAME")(h)
        h = nn.relu(h)
        h = jax.image.resize(h, (h.shape[0], h.shape[1] * 2, h.shape[2] * 2, h.shape[3]),
                             method="nearest")
        h = nn.ConvTranspose(self.channels, (3, 3), padding="SAME")(h)
        if self.activation == "relu":
            h = nn.relu(h)
        else:
            h = nn.sigmoid(h)
        return h


class SineLayer(nn.Module):
    """Siren sine layer (psfnet_arch.py:107-180)."""

    features: int
    w0: float = 1.0
    c: float = 6.0
    is_first: bool = False

    @nn.compact
    def __call__(self, x):
        dim_in = x.shape[-1]
        w_std = (1 / dim_in) if self.is_first else (math.sqrt(self.c / dim_in) / self.w0)
        kernel_init = nn.initializers.uniform(scale=2 * w_std)

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -w_std, w_std)

        x = nn.Dense(self.features, kernel_init=init, bias_init=init)(x)
        return jnp.sin(self.w0 * x)


class Siren(nn.Module):
    """Siren MLP (psfnet_arch.py:107-248)."""

    dim_out: int
    dim_hidden: int = 256
    num_layers: int = 5
    w0: float = 1.0
    w0_initial: float = 30.0

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = SineLayer(self.dim_hidden, w0=self.w0_initial if i == 0 else self.w0,
                          is_first=(i == 0))(x)
        x = nn.Dense(self.dim_out)(x)
        return x


class ModulateSiren(nn.Module):
    """Latent-modulated SIREN image decoder (psfnet_arch.py:168-248; unused
    by the reference training scripts, ported for component parity).

    A fixed [-1, 1]^2 position grid over (H, W) runs through `num_layers`
    sine layers; each activation is gated by a ReLU-MLP "modulator" of the
    latent code (layer i>0 sees concat(latent, prev modulator state)).  The
    head is a linear layer + tanh -> [1, 1, H, W].
    """

    dim_out: int
    dim_hidden: int
    dim_latent: int
    num_layers: int
    image_width: int
    image_height: int
    w0: float = 1.0
    w0_initial: float = 30.0

    @nn.compact
    def __call__(self, latent):
        latent = jnp.asarray(latent).reshape(-1)[None, :]  # [1, dim_latent]

        ys = jnp.linspace(-1, 1, self.image_height)
        xs = jnp.linspace(-1, 1, self.image_width)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        x = jnp.stack([gy, gx], axis=-1).reshape(-1, 2)  # [(h w), 2]

        kaiming = nn.initializers.kaiming_normal()
        z = None
        for i in range(self.num_layers):
            mod_in = latent if i == 0 else jnp.concatenate(
                [latent, z], axis=-1
            )
            z = nn.relu(nn.Dense(self.dim_hidden, kernel_init=kaiming)(mod_in))
            x = SineLayer(
                self.dim_hidden,
                w0=self.w0_initial if i == 0 else self.w0,
                is_first=(i == 0),
            )(x)
            x = x * z  # [hw, dh] * [1, dh]
        x = nn.Dense(self.dim_out, kernel_init=kaiming)(x)
        x = jnp.tanh(x)
        x = x.reshape(-1, self.image_height, self.image_width, self.dim_out)
        return jnp.transpose(x, (0, 3, 1, 2))  # NCHW like the reference
