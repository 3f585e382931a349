"""AiFDepthNet: I3D-style 3D-CNN U-Net with attention depth/AiF regression.

Flax port of the reference `dff/AiFNet.py:91-613` — same topology (Inception
`Mixed` blocks over [B, S, H, W, C] focal stacks, transposed-3D-conv decoder,
softmax attention over the stack dimension), channels-last for TPU.

Losses (`compute_loss`) reproduce dff/AiFNet.py:450-584: masked L1 depth,
AiF L1, edge-aware second-order smoothness with robust L1.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import TorchConv, TorchConvTranspose, torch_max_pool


class Conv3dBN(nn.Module):
    """conv3d + BN + ReLU (reference AiFNet.py:7-24).

    `dtype` is the computation dtype (params stay f32; Flax BatchNorm computes
    batch statistics in f32 internally regardless).
    """

    features: int
    k: Tuple[int, int, int] = (1, 1, 1)
    s: Tuple[int, int, int] = (1, 1, 1)
    p: Tuple[int, int, int] = (0, 0, 0)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.features, self.k, self.s, self.p, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)


class Trans3dBN(nn.Module):
    """transposed conv3d + BN + ReLU + conv3d_bn (reference AiFNet.py:27-54)."""

    features: Tuple[int, int]
    k: Tuple[int, int, int] = (1, 1, 1)
    s: Tuple[int, int, int] = (1, 1, 1)
    p: Tuple[int, int, int] = (0, 0, 0)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConvTranspose(self.features[0], self.k, self.s, self.p,
                               dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        return Conv3dBN(self.features[1], (3, 3, 3), (1, 1, 1), (1, 1, 1),
                        dtype=self.dtype)(x, train)


class Mixed(nn.Module):
    """Inception block (reference AiFNet.py:57-88)."""

    out_ch: Tuple[int, int, int, int, int, int]
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out_ch
        dt = self.dtype
        b0 = Conv3dBN(oc[0], dtype=dt)(x, train)
        b1 = Conv3dBN(oc[2], (3, 3, 3), p=(1, 1, 1), dtype=dt)(
            Conv3dBN(oc[1], dtype=dt)(x, train), train)
        b2 = Conv3dBN(oc[4], (3, 3, 3), p=(1, 1, 1), dtype=dt)(
            Conv3dBN(oc[3], dtype=dt)(x, train), train)
        b3 = Conv3dBN(oc[5], dtype=dt)(
            torch_max_pool(x, (3, 3, 3), (1, 1, 1), (1, 1, 1)), train
        )
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class AiFDepthNet(nn.Module):
    """Reference dff/AiFNet.py:91-447, channels-last.

    Input: focal stack [B, S, H, W, C]; returns dict with 'pred_depth' (or
    'pred_disp') [B, 1, H, W] and 'pred_AiF_img' [B, 3, H, W] in the
    reference's NCHW convention for drop-in metric compatibility.
    """

    n_channels: int = 3
    n_classes: int = 1
    n_stack: int = 10
    disp_depth: str = "depth"
    stage2: str = "attention"
    normalize_attention: bool = False
    remat: bool = False  # rematerialise Mixed blocks (memory for FLOPs)
    dtype: Any = None  # compute dtype for the conv trunk (e.g. jnp.bfloat16);
    # params stay f32, attention head + losses stay f32.  The train step is
    # HBM-bound (docs/DESIGN.md §9), so bf16 activations cut step traffic.

    @nn.compact
    def __call__(self, stack, focus_position, train: bool = False):
        # stack: [B, S, H, W, C] with C = n_channels (3, or 4 with stack index)
        x = stack if self.dtype is None else stack.astype(self.dtype)
        B, S, H, W, C = x.shape
        dt = self.dtype

        MixedBlock = nn.remat(Mixed, static_argnums=(2,)) if self.remat else Mixed

        conv1a = Conv3dBN(64, (7, 7, 7), (1, 2, 2), (3, 3, 3), dtype=dt)(x, train)
        h = torch_max_pool(conv1a, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        conv2c = Conv3dBN(192, (3, 3, 3), p=(1, 1, 1), dtype=dt)(
            Conv3dBN(64, dtype=dt)(h, train), train)
        h = torch_max_pool(conv2c, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        mix3c = MixedBlock((128, 128, 192, 32, 96, 64), dtype=dt, name="Mixed_3c")(
            MixedBlock((64, 96, 128, 16, 32, 32), dtype=dt, name="Mixed_3b")(
                h, train),
            train,
        )
        h = torch_max_pool(mix3c, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        mix4f = MixedBlock((256, 160, 320, 32, 128, 128), dtype=dt,
                           name="Mixed_4f")(
            MixedBlock((112, 144, 288, 32, 64, 64), dtype=dt, name="Mixed_4e")(
                MixedBlock((128, 128, 256, 24, 64, 64), dtype=dt, name="Mixed_4d")(
                    MixedBlock((160, 112, 224, 24, 64, 64), dtype=dt,
                               name="Mixed_4c")(
                        MixedBlock((192, 96, 208, 16, 48, 64), dtype=dt,
                                   name="Mixed_4b")(
                            h, train
                        ), train
                    ), train
                ), train
            ), train
        )
        h = torch_max_pool(mix4f, (1, 2, 2), (1, 2, 2), (0, 0, 0))
        mix5c = MixedBlock((384, 192, 384, 48, 128, 128), dtype=dt,
                           name="Mixed_5c")(
            MixedBlock((256, 160, 320, 32, 128, 128), dtype=dt, name="Mixed_5b")(
                h, train),
            train,
        )

        # Decoder (reference AiFNet.py:206-254)
        up_5c = Trans3dBN((64, 64), (3, 4, 4), (1, 2, 2), (1, 1, 1), dtype=dt)(
            mix5c, train)
        up_4f = Conv3dBN(64, dtype=dt)(mix4f, train)
        cat = jnp.concatenate([up_5c, up_4f], axis=-1)
        up_5c4f = Trans3dBN((64, 64), (3, 4, 4), (1, 2, 2), (1, 1, 1), dtype=dt)(
            cat, train)
        up_3c = Conv3dBN(64, dtype=dt)(mix3c, train)
        cat = jnp.concatenate([up_5c4f, up_3c], axis=-1)
        up_5c4f3c = Trans3dBN((32, 32), (3, 4, 4), (1, 2, 2), (1, 1, 1), dtype=dt)(
            cat, train)
        up_2c = Conv3dBN(32, dtype=dt)(conv2c, train)
        cat = jnp.concatenate([up_5c4f3c, up_2c], axis=-1)
        up_5c4f3c2c = Trans3dBN((32, 16), (3, 4, 4), (1, 2, 2), (1, 1, 1),
                                dtype=dt)(cat, train)
        up_1a = Conv3dBN(16, dtype=dt)(conv1a, train)
        cat = jnp.concatenate([up_5c4f3c2c, up_1a], axis=-1)
        up_final = TorchConvTranspose(32, (3, 4, 4), (1, 2, 2), (1, 1, 1),
                                      dtype=dt)(cat)
        out = TorchConv(self.n_classes, (3, 3, 3), (1, 1, 1), (1, 1, 1),
                        dtype=dt)(up_final)
        # out: [B, S, H', W', n_classes]

        # crop to input size (transposed convs can overshoot by stride-1);
        # the attention head and losses always run in f32
        out = out[:, :, :H, :W, :].astype(jnp.float32)

        if self.stage2.upper() == "ATTENTION":
            d_maps = focus_position.reshape(B, S, 1, 1)
            if self.n_classes == 2:
                att = out
            else:
                att = jnp.concatenate([out, out], axis=-1)
            if self.normalize_attention:
                d_att = nn.softplus(att[..., 0])
                d_att = d_att / jnp.sum(d_att, axis=1, keepdims=True)
                a_att = jax.nn.softmax(att[..., 1], axis=1)
            else:
                d_att = jax.nn.softmax(att[..., 0], axis=1)  # over S
                a_att = jax.nn.softmax(att[..., 1], axis=1)
            d_out = jnp.sum(d_att * d_maps, axis=1)[:, None]  # [B,1,H,W]
            aif = jnp.sum(a_att[..., None] * stack[..., :3], axis=1)  # [B,H,W,3]
            aif = jnp.transpose(aif, (0, 3, 1, 2))
        else:  # DIRECT (reference AiFNet.py:258-269, 436-442)
            o = jnp.transpose(out[..., 0], (0, 2, 3, 1))  # [B,H,W,S]
            d_out = jnp.transpose(nn.Dense(1)(o), (0, 3, 1, 2))
            aif = jnp.transpose(nn.sigmoid(nn.Dense(3)(o)), (0, 3, 1, 2))

        return {f"pred_{self.disp_depth}": d_out, "pred_AiF_img": aif}


def add_stack_index_channel(stack):
    """Append the normalised stack index as a 4th channel
    (reference dff/AiFNet.py:290-295, the n_channels=4 variant).

    stack: [B, S, H, W, 3] -> [B, S, H, W, 4]
    """
    B, S, H, W, C = stack.shape
    idx = (jnp.arange(1, S + 1, dtype=stack.dtype) / S).reshape(1, S, 1, 1, 1)
    idx = jnp.broadcast_to(idx, (B, S, H, W, 1))
    return jnp.concatenate([stack, idx], axis=-1)


# ==========================================================================
# Losses (reference dff/AiFNet.py:450-584)
# ==========================================================================
def _image_grads(x, stride=1):
    gh = x[..., stride:, :] - x[..., :-stride, :]
    gw = x[..., stride:] - x[..., :-stride]
    return gh, gw


def _robust_l1(x):
    return (x**2 + 0.001**2) ** 0.5


def _smoothness(gt_aif, d_out):
    edge_constant = 150.0
    img_gx, img_gy = _image_grads(gt_aif)
    wx = jnp.exp(-jnp.mean((edge_constant * img_gx) ** 2, axis=1, keepdims=True))
    wy = jnp.exp(-jnp.mean((edge_constant * img_gy) ** 2, axis=1, keepdims=True))
    d_gx, d_gy = _image_grads(d_out)
    return (jnp.mean(wx * _robust_l1(d_gx)) + jnp.mean(wy * _robust_l1(d_gy))) / 2.0


def compute_loss(outputs: Dict[str, Any], input_dict: Dict[str, Any], task: str,
                 disp_depth: str = "depth", disp_w: float = 1.0,
                 aif_w: float = 0.0, smooth_w: float = 0.0):
    """Reference compute_loss for tasks D_FS / A_FS / DA_FS.

    Masked means use `where`-style masking (mask weights) rather than boolean
    indexing so everything stays jittable with static shapes.
    """
    losses = {}
    d_out = outputs[f"pred_{disp_depth}"]
    aif = outputs["pred_AiF_img"]

    def masked_mean(err, mask):
        return jnp.sum(err * mask) / (jnp.sum(mask) + 1e-12)

    if task in ("D_FS", "DA_FS"):
        gt_d = input_dict[disp_depth]
        mask = (gt_d > 0).astype(d_out.dtype)
        l1 = masked_mean(jnp.abs(d_out - gt_d), mask)
        losses[disp_depth] = l1
        losses["disp_MSE"] = jax.lax.stop_gradient(
            masked_mean((d_out - gt_d) ** 2, mask)
        )
    if task in ("A_FS", "DA_FS"):
        gt_aif = input_dict["AiF_img"]
        losses["AiF"] = jnp.mean(jnp.abs(aif - gt_aif))
        losses["smooth"] = _smoothness(gt_aif, d_out)

    if task == "D_FS":
        losses["total"] = disp_w * losses[disp_depth]
    elif task == "A_FS":
        losses["total"] = aif_w * losses["AiF"] + smooth_w * losses["smooth"]
    elif task == "DA_FS":
        losses["total"] = (
            aif_w * losses["AiF"] + disp_w * losses[disp_depth]
            + smooth_w * losses["smooth"]
        )
    else:
        raise NotImplementedError(task)
    return losses
