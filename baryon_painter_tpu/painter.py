"""Painter API: the user-facing painting surface.

Preserves the reference's interface (painter.py:16-30, 371-392):

    painter = CVAEPainter("path/to/checkpoint")        # state+meta pair
    pressure = painter.paint(dm_tile, z=0.5)           # single 512^2 tile

and adds the TPU-native batched path the reference lacks:

    pressure = painter.paint_batch(tiles, zs)          # (N,512,512) at once

Transform -> prior-sample -> decode -> inverse transform all run inside one
jit graph on device; tiles are painted in batches instead of one by one
(the reference's lightcone loop paints tile-at-a-time on CPU,
process_SLICS.py:207 — batching is the headline speedup there).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from baryon_painter_tpu.models.cvae import CVAE
from baryon_painter_tpu.train import checkpoint as ckpt

__all__ = ["Painter", "CVAEPainter", "CGANPainter", "load_painter"]


class Painter:
    """Abstract base class for a baryon painter (reference painter.py:16-30)."""

    def load_state_from_file(self, filename):
        raise NotImplementedError("This is an abstract base class.")

    def paint(self, input, **kwargs):
        raise NotImplementedError("This is an abstract base class.")


class CVAEPainter(Painter):
    def __init__(self, filename: Optional[str] = None,
                 model: Optional[CVAE] = None,
                 variables: Optional[Dict[str, Any]] = None,
                 meta: Optional[dict] = None,
                 training_data_set=None, test_data_set=None,
                 architecture: Optional[dict] = None,
                 dtype=None,
                 seed: int = 0,
                 fused_inference: bool = False):
        """Construct from a checkpoint (``filename``), from live state
        (``model``/``variables``/``meta``), or — reference parity
        (painter.py:34-47) — from datasets + an architecture dict, in which
        case ``train()`` builds the trainer and ``paint()`` becomes available
        after training (or after ``load_state_from_file``).

        ``fused_inference=True`` converts canonical residual blocks to the
        fused Pallas inference layout (models/fuse.py) when the painting
        function is built — same function, one kernel per block on TPU.

        ``dtype`` is the conv compute dtype for the model this painter
        builds — both the training model (architecture branch) and a
        checkpoint-loaded paint model. The committed fidelity gates are
        evaluated with bfloat16 compute (scripts/fidelity_check.py), so
        ``jnp.bfloat16`` reproduces their provenance; ``None`` computes in
        the input dtype (float32)."""
        self.training_data = training_data_set
        self.test_data = test_data_set
        self.trainer = None
        self._train_dtype = dtype
        self._fused_inference = fused_inference
        if filename is not None:
            self.load_state_from_file(filename)
        elif model is not None or variables is not None:
            if model is None or variables is None or meta is None:
                raise ValueError("Provide either filename or "
                                 "(model, variables, meta).")
            self._setup(model, variables, meta)
        elif architecture is not None and training_data_set is not None:
            self.architecture = architecture
            self.model = CVAE(architecture, dtype=dtype)
        else:
            raise ValueError("Provide filename, (model, variables, meta), "
                             "or (architecture, training_data_set).")
        self._base_rng = jax.random.PRNGKey(seed)
        self._n_painted = 0

    def train(self, n_pepoch: int = 5, learning_rate: float = 1e-4,
              batch_size: int = 1, adaptive_learning_rate=None,
              adaptive_batch_size=None, validation_pepochs=(),
              pepoch_size: int = 3136, var_anneal_fn=None, KL_anneal_fn=None,
              output_path: Optional[str] = None, device_data: bool = False,
              seed: int = 0, verbose: bool = False, **config_kw):
        """Train on the constructor's datasets; reference-parity surface
        (painter.py:60-75). Returns (training_stats, validation_stats)."""
        from baryon_painter_tpu.train.trainer import CVAETrainer, TrainConfig
        if self.training_data is None:
            raise RuntimeError("Trying to train but no training data specified.")
        cfg = TrainConfig(learning_rate=learning_rate, batch_size=batch_size,
                          n_pepoch=n_pepoch, pepoch_size=pepoch_size,
                          adaptive_learning_rate=adaptive_learning_rate,
                          adaptive_batch_size=adaptive_batch_size,
                          var_anneal_fn=var_anneal_fn,
                          KL_anneal_fn=KL_anneal_fn,
                          output_path=output_path, seed=seed,
                          verbose=verbose, **config_kw)
        self.trainer = CVAETrainer(self.model, self.training_data,
                                   test_data=self.test_data, config=cfg,
                                   device_data=device_data)
        stats = self.trainer.train(validation_pepochs=validation_pepochs)
        meta = ckpt.meta_from_dataset(self.training_data,
                                      self.model.architecture)
        self._setup(self.model,
                    {"params": self.trainer.state.params,
                     "batch_stats": self.trainer.state.batch_stats}, meta)
        return stats

    def validate(self, **kw):
        """Diagnostics via the attached trainer (painter.py:295 parity)."""
        if self.trainer is None:
            raise RuntimeError("validate() requires train() first.")
        return self.trainer.validate(**kw)

    # ------------------------------------------------------------------ #

    def _setup(self, model, variables, meta):
        if (getattr(self, "_fused_inference", False)
                and not meta["model_architecture"].get("fused_res_blocks")):
            from baryon_painter_tpu.models.fuse import fuse_cvae_variables
            variables, arch = fuse_cvae_variables(variables,
                                                  meta["model_architecture"])
            meta = {**meta, "model_architecture": arch}
            model = CVAE(arch, dtype=model.dtype)
        self.model = model
        self.variables = {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})}
        self.meta = meta
        self.architecture = meta["model_architecture"]
        self.input_field = meta["input_field"]
        self.label_fields = list(meta["label_fields"])
        self.tile_L = meta["tile_L"]
        self.tile_size = meta["tile_size"]
        self.transforms, self.stats = ckpt.transforms_from_meta(meta)

        in_tf = self.transforms[self.input_field]
        in_stats = self.stats[self.input_field]
        out_field = self.label_fields[0]
        out_tf = self.transforms[out_field]
        out_stats = self.stats[out_field]

        @partial(jax.jit, static_argnames=("transform", "inverse_transform",
                                           "return_var", "z_mode"))
        def _paint(variables, tiles, zs, rng, transform=True,
                   inverse_transform=True, return_var=False,
                   z_mode="sample"):
            y = tiles
            if transform:
                y = in_tf.forward(y, in_stats, zs)
            # single-channel -> NHWC; split-scale transforms emit (N,C,H,W)
            y = y[..., None] if y.ndim == 3 else jnp.moveaxis(y, -3, -1)
            z_latent = None
            if z_mode in ("mean", "zero"):
                # deterministic paint at the prior mean / at z=0 (the
                # reference's commented alternative, painter.py:384)
                z_mu, _ = self.model.apply(variables, y, zs, train=False,
                                           method=self.model.prior)
                z_latent = z_mu if z_mode == "mean" else jnp.zeros_like(z_mu)
            res = self.model.apply(variables, y, zs, z=z_latent, train=False,
                                   return_var=return_var,
                                   rngs={"sample": rng},
                                   method=self.model.sample_P)
            if return_var:
                pred, var = res
            else:
                pred, var = res, None
            if pred.shape[-1] == 1:
                pred = pred[..., 0]
            else:
                pred = jnp.moveaxis(pred, -1, -3)  # back to (N, C, H, W)
            if inverse_transform:
                pred = out_tf.inverse(pred, out_stats, zs)
            return (pred, var[..., 0]) if return_var else pred

        self._paint_fn = _paint

    @classmethod
    def from_trainer(cls, trainer, seed: int = 0,
                     fused_inference: bool = False, dtype="keep"):
        """Painter over the trainer's live state.

        ``dtype="keep"`` paints with the trainer's own model (its training
        compute dtype, typically bfloat16); any other value (including
        ``None`` = float32 input dtype) rebuilds the paint model with that
        conv compute dtype over the same parameters — used by the fidelity
        gate to score a checkpoint under portable f32 arithmetic.
        """
        meta = ckpt.meta_from_dataset(trainer.training_data,
                                      trainer.model.architecture)
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}
        # clone() preserves every module field, so an architecture knob
        # added later cannot silently revert to its default here
        model = (trainer.model if dtype == "keep"
                 else trainer.model.clone(dtype=dtype))
        return cls(model=model, variables=variables, meta=meta,
                   seed=seed, fused_inference=fused_inference)

    def load_state_from_file(self, filename: str):
        """Load a (state.msgpack, meta.json) checkpoint pair by base path."""
        state, meta = ckpt.load_checkpoint(filename)
        model = CVAE(meta["model_architecture"],
                     dtype=getattr(self, "_train_dtype", None))
        self._setup(model, state, meta)

    def save_state_to_file(self, filename: str):
        ckpt.save_checkpoint(filename,
                             {"params": self.variables["params"],
                              "batch_stats": self.variables["batch_stats"],
                              "step": jnp.zeros((), jnp.int32)},
                             self.meta)

    # ------------------------------------------------------------------ #

    def _next_rng(self):
        self._n_painted += 1
        return jax.random.fold_in(self._base_rng, self._n_painted)

    def paint(self, input, z: float = 0.0, transform: bool = True,
              inverse_transform: bool = True, return_var: bool = False,
              rng=None):
        """Paint a single (H, W) tile; reference parity (painter.py:371-392)."""
        tile = jnp.asarray(input, jnp.float32)
        if tile.ndim != 2:
            raise ValueError(f"paint expects a 2-D tile, got {tile.shape}.")
        expected = tuple(self.architecture["dim_y"][1:])
        if tile.shape != expected:
            raise ValueError(
                f"Shape mismatch between input and model: {tile.shape} vs "
                f"{expected}")
        out = self.paint_batch(tile[None], jnp.full((1,), z, jnp.float32),
                               transform=transform,
                               inverse_transform=inverse_transform,
                               return_var=return_var, rng=rng)
        if return_var:
            return np.asarray(out[0][0]), np.asarray(out[1][0])
        return np.asarray(out[0])

    def paint_batch(self, tiles, zs, transform: bool = True,
                    inverse_transform: bool = True, return_var: bool = False,
                    rng=None, z_mode: str = "sample"):
        """Paint a batch of tiles (N, H, W) with per-tile redshifts (N,).

        z_mode: 'sample' draws the latent from the prior (stochastic,
        reference behavior); 'mean' decodes at the prior mean
        (deterministic); 'zero' decodes at z=0."""
        tiles = jnp.asarray(tiles, jnp.float32)
        zs = jnp.asarray(zs, jnp.float32)
        if rng is None:
            rng = self._next_rng()
        return self._paint_fn(self.variables, tiles, zs, rng,
                              transform=transform,
                              inverse_transform=inverse_transform,
                              return_var=return_var, z_mode=z_mode)


class CGANPainter(Painter):
    """Generator-only painting with the CGAN model family
    (the reference's GAN_Painter capability, create_lightcone.py:43-54,
    made first-class in-repo)."""

    def __init__(self, filename: Optional[str] = None,
                 generator=None, variables: Optional[dict] = None,
                 meta: Optional[dict] = None,
                 fused_inference: bool = False,
                 dtype=None):
        """``fused_inference=True`` folds the spectral normalization into
        the weights (flax's exact eval-time sigma) and converts the
        generator's LeakyReLU residual blocks to the fused Pallas layout
        (models/fuse.py) — same painted tiles, one kernel per block.
        ``dtype``: conv compute dtype for a checkpoint-loaded generator
        (None computes in the input dtype, float32)."""
        self._fused_inference = fused_inference
        self._dtype = dtype
        if filename is not None:
            self.load_state_from_file(filename)
        else:
            if generator is None or variables is None or meta is None:
                raise ValueError("Provide either filename or "
                                 "(generator, variables, meta).")
            self._setup(generator, variables, meta)

    def _setup(self, generator, variables, meta):
        from baryon_painter_tpu.models.cgan import CGANGenerator
        if (getattr(self, "_fused_inference", False)
                and not generator.fused_res_blocks):
            # folds SN (a no-op when the generator has none) and renames
            # the residual blocks into the fused layout
            from baryon_painter_tpu.models.fuse import \
                fuse_cgan_generator_variables
            variables, gen_kwargs = fuse_cgan_generator_variables(
                variables, meta["model_architecture"])
            generator = CGANGenerator(dtype=generator.dtype, **gen_kwargs)
            # record the converted layout so save_state_to_file round-trips
            meta = {**meta,
                    "model_architecture": {**meta["model_architecture"],
                                           "spectral_norm": False,
                                           "fused_res_blocks": True}}
        self.generator = generator
        self.variables = variables
        self.meta = meta
        self.input_field = meta["input_field"]
        self.label_fields = list(meta["label_fields"])
        self.tile_L = meta["tile_L"]
        self.tile_size = meta["tile_size"]
        self.transforms, self.stats = ckpt.transforms_from_meta(meta)

        in_tf = self.transforms[self.input_field]
        in_stats = self.stats[self.input_field]
        out_field = self.label_fields[0]
        out_tf = self.transforms[out_field]
        out_stats = self.stats[out_field]

        @partial(jax.jit, static_argnames=("transform", "inverse_transform"))
        def _paint(variables, tiles, zs, transform=True,
                   inverse_transform=True):
            y = tiles
            if transform:
                y = in_tf.forward(y, in_stats, zs)
            pred = self.generator.apply(variables, y[..., None], zs,
                                        train=False)[..., 0]
            if inverse_transform:
                pred = out_tf.inverse(pred, out_stats, zs)
            return pred

        self._paint_fn = _paint

    @classmethod
    def from_trainer(cls, trainer, dtype="keep"):
        """Painter over the trainer's live generator state.

        ``dtype`` as in ``CVAEPainter.from_trainer``: "keep" paints with the
        trainer's generator (training compute dtype); anything else rebuilds
        the generator with that conv compute dtype over the same parameters.
        """
        meta = ckpt.meta_from_dataset(
            trainer.training_data,
            {"n_res_blocks": trainer.generator.n_res_blocks,
             "in_channels": trainer.generator.in_channels,
             "upsample": trainer.generator.upsample},
            model_kind="cgan")
        variables = {"params": trainer.state.g_params,
                     "batch_stats": trainer.state.g_stats}
        # clone() preserves every module field (see CVAE counterpart)
        g = (trainer.generator if dtype == "keep"
             else trainer.generator.clone(dtype=dtype))
        return cls(generator=g, variables=variables, meta=meta)

    def load_state_from_file(self, filename: str):
        from baryon_painter_tpu.models.cgan import CGANGenerator
        state, meta = ckpt.load_checkpoint(filename)
        arch = meta["model_architecture"]
        generator = CGANGenerator(
            in_channels=arch.get("in_channels", 2),
            n_res_blocks=arch.get("n_res_blocks", 9),
            upsample=arch.get("upsample", "transpose"),
            spectral_norm=arch.get("spectral_norm", True),
            fused_res_blocks=arch.get("fused_res_blocks", False),
            dtype=getattr(self, "_dtype", None))
        variables = {"params": state["g_params"],
                     "batch_stats": state.get("g_stats", {})}
        self._setup(generator, variables, meta)

    def save_state_to_file(self, filename: str):
        ckpt.save_checkpoint(filename,
                             {"g_params": self.variables["params"],
                              "g_stats": self.variables["batch_stats"],
                              "step": jnp.zeros((), jnp.int32)},
                             self.meta)

    def paint(self, input, z: float = 0.0, transform: bool = True,
              inverse_transform: bool = True):
        tile = jnp.asarray(input, jnp.float32)
        if tile.ndim != 2:
            raise ValueError(f"paint expects a 2-D tile, got {tile.shape}.")
        out = self.paint_batch(tile[None], jnp.full((1,), z, jnp.float32),
                               transform=transform,
                               inverse_transform=inverse_transform)
        return np.asarray(out[0])

    def paint_batch(self, tiles, zs, transform: bool = True,
                    inverse_transform: bool = True, **_):
        tiles = jnp.asarray(tiles, jnp.float32)
        zs = jnp.asarray(zs, jnp.float32)
        return self._paint_fn(self.variables, tiles, zs, transform=transform,
                              inverse_transform=inverse_transform)


def load_painter(filename: str, **kwargs) -> Painter:
    """Open a checkpoint pair and dispatch on its model_kind.

    ``kwargs`` (e.g. ``fused_inference=True``, ``dtype=jnp.bfloat16``) are
    forwarded to the dispatched painter class."""
    import json
    with open(filename + "_meta.json") as f:
        kind = json.load(f).get("model_kind", "cvae")
    if kind == "cgan":
        return CGANPainter(filename, **kwargs)
    return CVAEPainter(filename, **kwargs)
