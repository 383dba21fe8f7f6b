"""Conditional GAN painter model (generator + discriminator), flax.

The reference repo carries only the CGAN's trained artifacts; the model lives
in an external repository with a full architecture spec in
trained_models/README.md:95-139. This module makes the CGAN a first-class
in-repo model family (SURVEY §1):

Generator (Johnson-style translator):
  Conv 9x9 (2->32) -> two stride-2 convs (->64->128) -> 9 res blocks
  -> two stride-2 transposed convs -> Conv 9x9 (32->1), tanh;
  BatchNorm throughout, LeakyReLU(0.2).
Discriminator: five 4x4 convs (3->64->128->256->512->1), LeakyReLU(0.2),
  sigmoid output.
Every parametric layer is spectrally normalised (power iteration).
Init: Kaiming for all layers, last layer Xavier(gain=0.25)
(trained_models/README.md:101-102).
Redshift conditioning: constant feature map of f(z) = z - 1
(trained_models/README.md:99).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from baryon_painter_tpu.models.layers import (SpecSequential,
                                              kaiming_normal_init,
                                              merge_aux_label, xavier_init)

__all__ = ["CGANGenerator", "CGANDiscriminator", "cgan_generator_spec",
           "cgan_discriminator_spec", "z_feature"]


def z_feature(z):
    """Redshift feature map value: f(z) = z - 1 (balances [0, 2] around 0)."""
    return jnp.asarray(z) - 1.0


def _conv(cin, cout, k, s, bias, bn, act, output_padding=None, transp=False):
    cfg = {"in_channels": cin, "out_channels": cout, "kernel_size": k,
           "stride": s, "padding": (k - 1) // 2, "bias": bias}
    if output_padding is not None:
        cfg["output_padding"] = output_padding
    layers = [("transp conv" if transp else "conv", cfg)]
    if bn:
        layers.append(("batchnorm", {"num_features": cout}))
    if act == "lrelu":
        layers.append(("Leaky ReLU", 0.2))
    elif act == "tanh":
        layers.append(("tanh",))
    elif act == "sigmoid":
        layers.append(("sigmoid",))
    return layers


def _res_block_lrelu(c):
    inner = (_conv(c, c, 3, 1, False, True, "lrelu")
             + _conv(c, c, 3, 1, False, True, None))
    return [("residual block", (inner, ("Leaky ReLU", 0.2)))]


def cgan_generator_spec(in_channels: int = 2, n_res_blocks: int = 9,
                        upsample: str = "transpose"):
    """Body spec (everything except the final 9x9 conv, which uses Xavier
    init and is built separately).

    ``upsample='transpose'`` mirrors the reference (strided transposed
    convs, trained_models/README.md:97); ``'resize'`` replaces them with
    nearest-resize + 3x3 conv — architecturally checkerboard-free, the same
    variant that cut the CVAE decoder's painted auto-P(k) error 5x
    (models/dsl.py conv_up)."""
    body = _conv(in_channels, 32, 9, 1, False, True, "lrelu")
    body += _conv(32, 64, 3, 2, True, True, "lrelu")
    body += _conv(64, 128, 3, 2, True, True, "lrelu")
    for _ in range(n_res_blocks):
        body += _res_block_lrelu(128)
    if upsample == "transpose":
        body += _conv(128, 64, 3, 2, True, True, "lrelu", output_padding=1,
                      transp=True)
        body += _conv(64, 32, 3, 2, True, True, "lrelu", output_padding=1,
                      transp=True)
    elif upsample == "resize":
        body += [("upsample nearest", {"scale": 2})]
        body += _conv(128, 64, 3, 1, True, True, "lrelu")
        body += [("upsample nearest", {"scale": 2})]
        body += _conv(64, 32, 3, 1, True, True, "lrelu")
    else:
        raise ValueError(f"Unknown generator upsample mode '{upsample}'.")
    head = _conv(32, 1, 9, 1, True, True, "tanh")
    return tuple(map(tuple, body)), tuple(map(tuple, head))


def cgan_discriminator_spec(in_channels: int = 3):
    body = _conv(in_channels, 64, 4, 2, True, False, "lrelu")
    body += _conv(64, 128, 4, 2, False, False, "lrelu")
    body += _conv(128, 256, 4, 2, False, False, "lrelu")
    body += _conv(256, 512, 4, 1, False, False, "lrelu")
    head = _conv(512, 1, 4, 1, True, False, "sigmoid")
    return tuple(map(tuple, body)), tuple(map(tuple, head))


class CGANGenerator(nn.Module):
    in_channels: int = 2  # dm + z feature map
    n_res_blocks: int = 9
    spectral_norm: bool = True
    upsample: str = "transpose"
    dtype: Optional[Any] = None
    # fused Pallas residual blocks for the painting path; requires
    # spectral_norm=False (fold it first: models/fuse.py)
    fused_res_blocks: bool = False

    @nn.compact
    def __call__(self, y, z, train: bool = True):
        """y: (N,H,W,1) transformed DM tile; z: (N,) redshifts."""
        body_spec, head_spec = cgan_generator_spec(self.in_channels,
                                                   self.n_res_blocks,
                                                   self.upsample)
        h = merge_aux_label(y, z_feature(z))
        h = SpecSequential(body_spec, dtype=self.dtype,
                           spectral_norm=self.spectral_norm,
                           fused_res_blocks=self.fused_res_blocks,
                           kernel_init=kaiming_normal_init)(h, train=train)
        h = SpecSequential(head_spec, dtype=self.dtype,
                           spectral_norm=self.spectral_norm,
                           kernel_init=xavier_init(0.25))(h, train=train)
        return h


class CGANDiscriminator(nn.Module):
    in_channels: int = 3  # dm + z feature map + pressure
    spectral_norm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, y, z, x, train: bool = True,
                 return_features: bool = False):
        """y: DM (N,H,W,1); z: (N,); x: pressure (N,H,W,1).
        Returns per-patch probabilities (N, h, w, 1); with
        ``return_features`` also the pre-head body activations — the
        feature layer for Salimans-style feature-matching adversarial
        training (train/cgan.py CGANTrainConfig.feature_matching)."""
        body_spec, head_spec = cgan_discriminator_spec(self.in_channels)
        h = jnp.concatenate([merge_aux_label(y, z_feature(z)), x], axis=-1)
        feat = SpecSequential(body_spec, dtype=self.dtype,
                              spectral_norm=self.spectral_norm,
                              kernel_init=kaiming_normal_init)(h, train=train)
        h = SpecSequential(head_spec, dtype=self.dtype,
                           spectral_norm=self.spectral_norm,
                           kernel_init=xavier_init(0.25))(feat, train=train)
        if return_features:
            return h, feat
        return h
