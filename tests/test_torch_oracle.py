"""Torch-oracle parity: the DSL-built flax stacks compute the same function
as a PyTorch network built from the same layer specs.

The reference's models are torch Sequentials built by its dict DSL
(reference models/utils.py:114-157); ours are flax ``SpecSequential``s built
from the same semantic keys (models/dsl.py). This test interprets the
*identical* spec with an independent torch-based interpreter, copies the
flax parameters across (HWIO->OIHW, with the spatial flip + in/out swap for
transposed convs), and asserts the forward passes agree to float32
tolerance — in eval mode (running statistics) and train mode (batch
statistics). Because the flax path runs with the MXU conv rewrites enabled
(ops/conv_rewrites.py, the default), this also pins the rewrites against an
implementation that shares none of their code.

Known, deliberate divergence (not tested): torch updates running_var with
the *unbiased* batch variance while flax (and our BatchNorm) use the biased
one; normalization itself uses the biased variance on both sides, so
outputs agree and only the running-stat trajectories differ by n/(n-1).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from baryon_painter_tpu.models import dsl
from baryon_painter_tpu.models.layers import SpecSequential

torch.manual_seed(0)


# --------------------------------------------------------------------- #
# torch interpreter of the layer DSL (independent oracle implementation) #
# --------------------------------------------------------------------- #

class _TorchResBlock(torch.nn.Module):
    def __init__(self, inner, act):
        super().__init__()
        self.inner = inner
        self.act = act

    def forward(self, x):
        return self.act(self.inner(x) + x)


def _activation(name, config=None):
    name = name.lower() if isinstance(name, str) else name
    return {
        "relu": lambda: torch.nn.ReLU(),
        "leaky relu": lambda: torch.nn.LeakyReLU(
            0.2 if config is None else config),
        "tanh": lambda: torch.nn.Tanh(),
        "sigmoid": lambda: torch.nn.Sigmoid(),
        "softplus": lambda: torch.nn.Softplus(),
    }[name]()


def _sn_sigma(kernel):
    """Independent spectral-norm scale: the exact largest singular value of
    the (fan_in, fan_out)-reshaped kernel via numpy SVD. flax's SpectralNorm
    approximates this with power iteration; once its stored u has converged
    the two agree (the reshape grouping matches flax's reshape(-1, C_out);
    torch's (C_out, -1) of OIHW is a row-permuted transpose, which has the
    same singular values)."""
    m = np.asarray(kernel).reshape(-1, kernel.shape[-1])
    return float(np.linalg.svd(m, compute_uv=False)[0])


def torch_from_spec(spec, params, batch_stats, spectral_norm=False):
    """Build the torch twin of SpecSequential(spec) carrying the given flax
    parameters. ``params``/``batch_stats`` are the flax variable dicts for
    the SpecSequential scope; layers are matched by flax's deterministic
    per-class auto-naming (Conv2d_0, BatchNorm_1, ...). With
    ``spectral_norm=True`` every conv kernel is divided by its exact SVD
    sigma (the converged limit of the power iteration)."""
    counters = {}
    sigma = _sn_sigma if spectral_norm else (lambda k: 1.0)

    def scope(cls):
        i = counters.get(cls, 0)
        counters[cls] = i + 1
        return f"{cls}_{i}"

    def t(a):
        # copy: flips produce negative strides, and torch refuses those
        return torch.from_numpy(np.array(a, dtype=np.float32, copy=True))

    layers = []
    for layer in spec:
        name = layer[0]
        config = layer[1] if len(layer) > 1 else None
        lname = name.lower() if isinstance(name, str) else name
        if lname == "conv":
            p = params[scope("Conv2d")]
            k = np.asarray(p["kernel"])  # HWIO
            m = torch.nn.Conv2d(
                config["in_channels"], config["out_channels"],
                config["kernel_size"], stride=config.get("stride", 1),
                padding=config.get("padding", 0),
                bias=config.get("bias", True))
            with torch.no_grad():
                m.weight.copy_(t(k.transpose(3, 2, 0, 1) / sigma(k)))
                if config.get("bias", True):
                    m.bias.copy_(t(p["bias"]))
            layers.append(m)
        elif lname == "transp conv":
            p = params[scope("ConvTranspose2d")]
            k = np.asarray(p["kernel"])  # HWIO, un-flipped correlation
            m = torch.nn.ConvTranspose2d(
                config["in_channels"], config["out_channels"],
                config["kernel_size"], stride=config.get("stride", 1),
                padding=config.get("padding", 0),
                output_padding=config.get("output_padding", 0),
                bias=config.get("bias", True))
            with torch.no_grad():
                # torch's transp-conv weight is IOHW and is applied as the
                # *gradient* of a conv, i.e. spatially flipped relative to
                # the lhs-dilated correlation our ConvTranspose2d computes
                m.weight.copy_(
                    t(k[::-1, ::-1].transpose(2, 3, 0, 1) / sigma(k)))
                if config.get("bias", True):
                    m.bias.copy_(t(p["bias"]))
            layers.append(m)
        elif lname == "batchnorm":
            s = scope("BatchNorm")
            p, st = params[s], batch_stats[s]
            m = torch.nn.BatchNorm2d(config["num_features"], eps=1e-5,
                                     momentum=0.1)
            with torch.no_grad():
                m.weight.copy_(t(p["scale"]))
                m.bias.copy_(t(p["bias"]))
                m.running_mean.copy_(t(st["mean"]))
                m.running_var.copy_(t(st["var"]))
            layers.append(m)
        elif lname == "prelu":
            p = params[scope("PReLU")]
            m = torch.nn.PReLU(num_parameters=1)
            with torch.no_grad():
                m.weight.copy_(t(np.asarray(p["negative_slope"]).reshape(1)))
            layers.append(m)
        elif lname in ("relu", "leaky relu", "tanh", "sigmoid", "softplus"):
            layers.append(_activation(lname, config))
        elif lname == "residual block":
            inner_spec, act = config
            s = scope("ResidualBlock")
            inner = torch_from_spec(
                inner_spec, params[s]["SpecSequential_0"],
                batch_stats.get(s, {}).get("SpecSequential_0", {}),
                spectral_norm=spectral_norm)
            layers.append(_TorchResBlock(
                inner,
                _activation(act[0], act[1] if len(act) > 1 else None)))
        elif lname == "upsample nearest":
            layers.append(torch.nn.Upsample(scale_factor=config["scale"],
                                            mode="nearest"))
        else:
            raise NotImplementedError(name)
    return torch.nn.Sequential(*layers)


def _run_pair(spec, cin, size=16, batch=3, train=False, seed=0):
    """Build flax + torch twins of ``spec``, run the same input, return
    (flax_out_NCHW, torch_out_NCHW) as numpy."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((batch, size, size, cin)).astype(np.float32)

    model = SpecSequential(tuple(map(tuple, spec)))
    variables = model.init(jax.random.PRNGKey(seed), jnp.asarray(x),
                           train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # nontrivial running statistics so eval mode actually tests them
    batch_stats = jax.tree.map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 1.5, a.shape).astype(np.float32)), batch_stats)

    if train:
        out, _ = model.apply({"params": params, "batch_stats": batch_stats},
                             jnp.asarray(x), train=True,
                             mutable=["batch_stats"])
    else:
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          jnp.asarray(x), train=False)
    flax_out = np.asarray(out).transpose(0, 3, 1, 2)

    oracle = torch_from_spec(
        spec, jax.tree.map(np.asarray, params),
        jax.tree.map(np.asarray, batch_stats))
    oracle.train(train)
    with torch.no_grad():
        torch_out = oracle(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    return flax_out, torch_out


def _assert_close(a, b):
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


# --------------------------------------------------------------------- #
# cases                                                                 #
# --------------------------------------------------------------------- #

ACTIVATIONS = ["relu", "leaky relu", "prelu", "tanh", "sigmoid", "softplus",
               None]


@pytest.mark.parametrize("activation", ACTIVATIONS)
def test_conv_block_activations(activation):
    spec = dsl.conv_block(2, 5, kernel=3, bias=True, batchnorm=True,
                          activation=activation)
    _assert_close(*_run_pair(spec, cin=2))


@pytest.mark.parametrize("train", [False, True])
def test_conv_down_stack(train):
    # scale chain 1 -> 2 -> 4: k3s1p1, k4s2p1, k8s4p2 (models/utils.py:40-51)
    spec = dsl.conv_down(1, [4, 8, 16], [1, 2, 4], bias=False,
                         batchnorm=True, activation="prelu")
    _assert_close(*_run_pair(spec, cin=1, size=32, train=train))


@pytest.mark.parametrize("train", [False, True])
def test_conv_up_transpose_stack(train):
    spec = dsl.conv_up(16, [8, 4], [4, 2], bias=False, batchnorm=True,
                       activation="relu")
    _assert_close(*_run_pair(spec, cin=16, size=8, train=train))


def test_conv_up_resize_stack():
    spec = dsl.conv_up(8, [4, 2], [2, 2], mode="resize", bias=True,
                       batchnorm=False, activation="leaky relu")
    _assert_close(*_run_pair(spec, cin=8, size=8))


@pytest.mark.parametrize("train", [False, True])
def test_res_block(train):
    spec = [("residual block", dsl.res_block(6))]
    _assert_close(*_run_pair(spec, cin=6, train=train))


def test_fiducial_like_encoder_decoder_roundtrip():
    """A down stack into res blocks into an up stack — the painter's
    characteristic composition (reference scripts/CVAE_single_scale.py)."""
    spec = (dsl.conv_down(2, [8, 16], [2, 4], bias=False, batchnorm=True,
                          activation="prelu")
            + [("residual block", dsl.res_block(16))]
            + dsl.conv_up(16, [8, 4], [4, 2], bias=False, batchnorm=True,
                          activation="prelu")
            + dsl.conv_block(4, 1, kernel=3, bias=True, batchnorm=False,
                             activation=None))
    flax_out, torch_out = _run_pair(spec, cin=2, size=32)
    assert flax_out.shape == (3, 1, 32, 32)
    _assert_close(flax_out, torch_out)


def test_parity_holds_without_conv_rewrites(monkeypatch):
    """The naive lowering path (rewrites disabled) matches the same oracle,
    so rewrites-vs-naive agreement is transitively pinned too."""
    monkeypatch.setenv("BPT_DISABLE_CONV_REWRITES", "1")
    spec = (dsl.conv_down(1, [4, 8], [2, 4], bias=False, batchnorm=True,
                          activation="prelu")
            + dsl.conv_up(8, [4, 1], [4, 2], bias=False, batchnorm=True,
                          activation="relu"))
    _assert_close(*_run_pair(spec, cin=1, size=32))
