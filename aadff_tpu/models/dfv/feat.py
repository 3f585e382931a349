"""ResNet18 + pyramid pooling + FPN feature extractor for DFVNet.

Flax port of the reference `DFV_models/featExactor2.py` and the pieces of
`DFV_models/utils.py` it uses (conv2DBatchNormRelu with LeakyReLU(0.1),
icnet-style sum pyramid pooling).  torchvision is unavailable here, so the
ResNet18 backbone is implemented natively; `convert.py` loads torchvision
weights from a torch state_dict file when one is supplied
(featExactor2.py:87 uses pretrained=True).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..layers import TorchConv, resize_bilinear, upsample_nearest


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = TorchConv(self.features, (3, 3), (self.stride, self.stride), (1, 1),
                        use_bias=False)(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5)(out)
        out = nn.relu(out)
        out = TorchConv(self.features, (3, 3), (1, 1), (1, 1), use_bias=False)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5)(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = TorchConv(self.features, (1, 1), (self.stride, self.stride),
                                 (0, 0), use_bias=False)(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5)(identity)
        return nn.relu(out + identity)


class ConvBNLeakyRelu(nn.Module):
    """conv2DBatchNormRelu (reference DFV_models/utils.py:32-53)."""

    features: int
    k_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.features, (self.k_size, self.k_size),
                      (self.stride, self.stride), (self.padding, self.padding),
                      use_bias=self.use_bias)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.leaky_relu(x, 0.1)


class PyramidPoolingSum(nn.Module):
    """icnet sum-mode pyramid pooling (reference DFV_models/utils.py:58-115)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        pp_sum = x
        sizes = np.linspace(1, min(H, W) // 2, 4, dtype=int)[::-1]
        for i, pool_size in enumerate(sizes):
            ksz = (int(H / pool_size), int(W / pool_size))
            out = nn.avg_pool(x, ksz, strides=ksz, padding="VALID")
            out = ConvBNLeakyRelu(C, 1, 1, 0, use_bias=False)(out, train)
            out = resize_bilinear(out, (H, W))
            pp_sum = pp_sum + 0.25 * out
        return nn.relu(pp_sum / 2.0)


class FeatExactor(nn.Module):
    """ResNet18-FPN multi-scale features (reference featExactor2.py:61-148).

    Input [N, H, W, 3] -> (proj6 1/32 x128, proj5 1/16 x64, proj4 1/8 x32,
    proj3 1/4 x16), channels-last.
    """

    @nn.compact
    def __call__(self, x, train: bool = False):
        # ResNet18 stem
        h = TorchConv(64, (7, 7), (2, 2), (3, 3), use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(h)
        h = nn.relu(h)
        pool1 = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        def layer(h, feat, stride):
            h = BasicBlock(feat, stride)(h, train)
            return BasicBlock(feat, 1)(h, train)

        conv3 = layer(pool1, 64, 1)     # 1/4
        conv4 = layer(conv3, 128, 2)    # 1/8
        conv5 = layer(conv4, 256, 2)    # 1/16
        conv6 = layer(conv5, 512, 2)    # 1/32
        conv6 = PyramidPoolingSum()(conv6, train)

        up6 = ConvBNLeakyRelu(256)(upsample_nearest(conv6, 2), train)
        conv5 = ConvBNLeakyRelu(256)(jnp.concatenate([conv5, up6], -1), train)
        up5 = ConvBNLeakyRelu(128)(upsample_nearest(conv5, 2), train)
        conv4 = ConvBNLeakyRelu(128)(jnp.concatenate([conv4, up5], -1), train)
        up4 = ConvBNLeakyRelu(64)(upsample_nearest(conv4, 2), train)
        conv3 = ConvBNLeakyRelu(64)(jnp.concatenate([conv3, up4], -1), train)

        proj6 = ConvBNLeakyRelu(128, 1, 1, 0)(conv6, train)
        proj5 = ConvBNLeakyRelu(64, 1, 1, 0)(conv5, train)
        proj4 = ConvBNLeakyRelu(32, 1, 1, 0)(conv4, train)
        proj3 = ConvBNLeakyRelu(16, 1, 1, 0)(conv3, train)
        return proj6, proj5, proj4, proj3
