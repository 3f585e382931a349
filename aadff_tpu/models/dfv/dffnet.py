"""DFVNet: focus-volume depth-from-focus network.

Flax port of the reference `DFV_models/DFFNet.py:12-119` (Ours-FV with
use_diff=0, Ours-DFV with use_diff=1).  Fixes, rather than replicates, the
reference's eval-path degeneracy in decoderBlock (see submodule.py).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import resize_bilinear, resize_trilinear
from .feat import FeatExactor
from .submodule import DecoderBlock, DisparityRegression


class DFVNet(nn.Module):
    clean: bool = False
    level: int = 2
    use_diff: int = 1

    def setup(self):
        assert 1 <= self.level <= 4
        assert self.use_diff in (0, 1)
        self.feature_extraction = FeatExactor()
        if self.level == 1:
            self.decoder3 = DecoderBlock(2, 16, stride=(1, 1, 1), up=False, nstride=1)
        elif self.level == 2:
            self.decoder3 = DecoderBlock(2, 32, stride=(1, 1, 1), up=False, nstride=1)
            self.decoder4 = DecoderBlock(2, 32, up=True)
        elif self.level == 3:
            self.decoder3 = DecoderBlock(2, 32, stride=(1, 1, 1), up=False, nstride=1)
            self.decoder4 = DecoderBlock(2, 32, up=True)
            self.decoder5 = DecoderBlock(2, 64, up=True, pool=True)
        else:
            self.decoder3 = DecoderBlock(2, 32, stride=(1, 1, 1), up=False, nstride=1)
            self.decoder4 = DecoderBlock(2, 32, up=True)
            self.decoder5 = DecoderBlock(2, 64, up=True, pool=True)
            self.decoder6 = DecoderBlock(2, 128, up=True, pool=True)
        self.disp_reg = DisparityRegression(1)

    @staticmethod
    def _diff_volume(vol):
        """Adjacent-frame differencing over the stack dim
        (reference DFFNet.py:43-45); vol: [B, S, h, w, C]."""
        out = vol[:, :-1] - vol[:, 1:]
        return jnp.concatenate([out, vol[:, -1:]], axis=1)

    def __call__(self, stack, focal_dist, train: bool = False):
        """stack: [B, S, H, W, 3]; focal_dist: [B, S]."""
        B, S, H, W, C = stack.shape
        flat = stack.reshape(B * S, H, W, C)
        conv4, conv3, conv2, conv1 = self.feature_extraction(flat, train)

        def to_vol(f, s):
            _, h, w, c = f.shape
            return f.reshape(B, S, h, w, c)

        vol4, vol3, vol2, vol1 = (to_vol(conv4, 32), to_vol(conv3, 16),
                                  to_vol(conv2, 8), to_vol(conv1, 4))
        if self.use_diff == 1:
            vol4, vol3, vol2, vol1 = (self._diff_volume(vol4), self._diff_volume(vol3),
                                      self._diff_volume(vol2), self._diff_volume(vol1))

        cost4 = cost5 = cost6 = None
        if self.level == 1:
            _, cost3 = self.decoder3(vol1, train)
        elif self.level == 2:
            feat4_2x, cost4 = self.decoder4(vol2, train)
            feat3 = jnp.concatenate([feat4_2x, vol1], axis=-1)
            _, cost3 = self.decoder3(feat3, train)
        elif self.level == 3:
            feat5_2x, cost5 = self.decoder5(vol3, train)
            feat4 = jnp.concatenate([feat5_2x, vol2], axis=-1)
            feat4_2x, cost4 = self.decoder4(feat4, train)
            feat3 = jnp.concatenate([feat4_2x, vol1], axis=-1)
            _, cost3 = self.decoder3(feat3, train)
        else:
            feat6_2x, cost6 = self.decoder6(vol4, train)
            feat5 = jnp.concatenate([feat6_2x, vol3], axis=-1)
            feat5_2x, cost5 = self.decoder5(feat5, train)
            feat4 = jnp.concatenate([feat5_2x, vol2], axis=-1)
            feat4_2x, cost4 = self.decoder4(feat4, train)
            feat3 = jnp.concatenate([feat4_2x, vol1], axis=-1)
            _, cost3 = self.decoder3(feat3, train)

        def up_cost(cost):  # [B, S, h, w] -> [B, S, H, W] bilinear
            c = jnp.transpose(cost, (0, 2, 3, 1))
            c = resize_bilinear(c, (H, W))
            return jnp.transpose(c, (0, 3, 1, 2))

        cost3 = up_cost(cost3)
        pred3, std3 = self.disp_reg(jax.nn.softmax(cost3, axis=1), focal_dist,
                                    uncertainty=True)

        if train:
            stacked, stds = [pred3], [std3]
            if self.level >= 2:
                cost4 = up_cost(cost4)
                pred4, std4 = self.disp_reg(jax.nn.softmax(cost4, axis=1),
                                            focal_dist, uncertainty=True)
                stacked.append(pred4)
                stds.append(std4)
                if self.level >= 3:
                    c5 = resize_trilinear(cost5[..., None],
                                          (focal_dist.shape[1], H, W))[..., 0]
                    pred5, std5 = self.disp_reg(jax.nn.softmax(c5, axis=1),
                                                focal_dist, uncertainty=True)
                    stacked.append(pred5)
                    stds.append(std5)
                    if self.level >= 4:
                        c6 = resize_trilinear(cost6[..., None],
                                              (focal_dist.shape[1], H, W))[..., 0]
                        pred6, std6 = self.disp_reg(jax.nn.softmax(c6, axis=1),
                                                    focal_dist, uncertainty=True)
                        stacked.append(pred6)
                        stds.append(std6)
            return stacked, stds
        return pred3, std3[:, 0], jax.nn.softmax(cost3, axis=1)


def dfv_loss(stacked, stds, gt_depth, mask, level_weights=(1.0, 0.8, 0.6, 0.4)):
    """Multi-scale masked L1 training loss for DFVNet (the reference's DFV
    training script is broken — 2_aber_aware_dff_dfv.py:115 references an
    undefined variable — so this implements the intended objective of the
    upstream DFV work: weighted L1 over scales)."""
    total = 0.0
    m = mask.astype(stacked[0].dtype)
    for w, pred in zip(level_weights, stacked):
        total = total + w * jnp.sum(jnp.abs(pred - gt_depth) * m) / (jnp.sum(m) + 1e-12)
    return total
