"""CVAE training engine: one fused jit step, TPU-first.

Contrast with the reference loop (painter.py:60-293): there, transforms run
in numpy inside DataLoader workers, the model forward/backward runs per batch,
and schedules mutate module attributes. Here a single jit graph contains
  raw tiles -> on-device transforms -> CVAE forward -> ELBO -> grads -> adam
with the learning rate, alpha_var and beta_KL passed as *traced scalars* so
pepoch schedules never trigger recompiles. Changing the batch size compiles
one graph per bucket (4/8/16/24 in the fiducial ramp) which jit caches.

Data parallelism is sharding, not wrapper classes: pass a
``jax.sharding.Mesh`` with a 'data' axis and the batch is sharded over it;
XLA inserts the gradient psum and computes batch-norm statistics over the
GLOBAL batch (sync-BN) automatically because the jit graph has global-array
semantics.
"""
from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from baryon_painter_tpu.data.dataset import BahamasTileDataset
from baryon_painter_tpu.models.cvae import CVAE
from baryon_painter_tpu.train import checkpoint as ckpt
from baryon_painter_tpu.train.stats import TrainingStats

__all__ = ["TrainConfig", "TrainState", "CVAETrainer"]


def _encode_data_rng(rng: np.random.Generator) -> np.ndarray:
    """PCG64 generator state -> uint64[6] (128-bit state/inc split hi/lo)."""
    st = rng.bit_generator.state
    s, inc = st["state"]["state"], st["state"]["inc"]
    mask = (1 << 64) - 1
    return np.array([s >> 64, s & mask, inc >> 64, inc & mask,
                     st["has_uint32"], st["uinteger"]], dtype=np.uint64)


def _decode_data_rng(arr) -> np.random.Generator:
    a = [int(v) for v in np.asarray(arr, dtype=np.uint64)]
    rng = np.random.default_rng(0)
    rng.bit_generator.state = {
        "bit_generator": "PCG64",
        "state": {"state": (a[0] << 64) | a[1], "inc": (a[2] << 64) | a[3]},
        "has_uint32": a[4], "uinteger": a[5]}
    return rng


_PROGRESS_KEYS = ("n_samples", "i_pepoch", "last_pepoch_samples",
                  "last_val_loss", "last_ckpt", "last_report")
# the CGAN loop has no report counter (train/cgan.py resume parity)
_GAN_PROGRESS_KEYS = ("n_samples", "i_pepoch", "last_pepoch_samples",
                      "last_val_loss", "last_ckpt")


def clip_grads_by_global_norm(grads, max_norm):
    """Scale a gradient pytree so its global L2 norm is at most max_norm.

    Shared by the CVAE and CGAN train steps (TrainConfig.clip_grad_norm /
    CGANTrainConfig.clip_grad_norm). Operates on the raw gradients rather
    than inside the optax chain so that checkpointed opt_states keep the
    same tree structure whether clipping is on or off.
    """
    norm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: g * scale, grads)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    batch_size: int = 1
    n_pepoch: int = 5
    pepoch_size: int = 3136
    adaptive_learning_rate: Optional[Callable[[int], float]] = None
    adaptive_batch_size: Optional[Callable[[int], int]] = None
    var_anneal_fn: Optional[Callable[[int], float]] = None
    KL_anneal_fn: Optional[Callable[[int], float]] = None
    validation_loss_frequency: int = 100       # in samples
    validation_loss_batch_size: int = 16
    checkpoint_frequency: int = 1000           # in samples
    keep_last_checkpoints: int = 0             # periodic ckpt rotation; 0 = keep all
    statistics_report_frequency: int = 50      # in samples; 0 = off
    stats_sync_every: int = 16                 # steps between device syncs
    mavg_window_size: int = 20
    output_path: Optional[str] = None
    seed: int = 0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    device_cache_budget_bytes: int = 8 * 1024 ** 3
    # Spectral auxiliary loss (off by default = reference-parity training):
    # adds pk_loss_weight * sum of squared log-ratios between the batch-mean
    # auto/cross P(k) of a PRIOR-sampled painting (inverse-transformed to
    # physical space, eval-mode BN — exactly the paint-time code path) and
    # the truth's. Directly optimizes the P(k) fidelity gate (BASELINE.md:26)
    # that plain ELBO training approaches only asymptotically.
    pk_loss_weight: float = 0.0
    pk_loss_n_bins: int = 12
    # Compute the spectral loss per redshift (masked batch-mean spectra, one
    # term per z in the training set, averaged) instead of pooled across the
    # whole batch. The gate is per-z (validation_plotting.py:76-158 panels per
    # z); a pooled loss lets the model overshoot one z and undershoot another
    # while the z-averaged spectrum stays perfect. Use with batches carrying
    # a balanced number of samples per z.
    pk_loss_per_z: bool = False
    # Keep BatchNorm running statistics fixed at their restored values
    # during fine-tunes. The painted spectrum is evaluated through
    # eval-mode BN (running averages), so momentum-0.9 running-stat
    # updates move the gate metric even at lr -> 0 — measured: resuming a
    # gate-floor checkpoint at lr 5e-6 jumped the gate 0.054 -> 0.12 in
    # 100 steps with frozen-quality gradients (round-3 log). The CGAN
    # calibration mode freezes its G stats for the same reason
    # (train/cgan.py adversarial_weight=0); this is the CVAE counterpart.
    freeze_bn_stats: bool = False
    # Global-norm gradient clipping (0 = off). The spectral loss on
    # heavy-tailed physical stacks (lognormal density; --physical
    # fixtures) occasionally produces gradient spikes that bounce a
    # near-converged fine-tune off its gate floor (observed: the
    # physical-512 per-z fine-tune oscillated 0.28 -> 0.42 at lr 5e-5
    # with best-gate never improving). Applied to the gradients, not the
    # optax chain, so restored opt_states stay tree-compatible.
    clip_grad_norm: float = 0.0
    verbose: bool = False


class CVAETrainer:
    def __init__(self, model: CVAE, training_data: BahamasTileDataset,
                 test_data: Optional[BahamasTileDataset] = None,
                 config: TrainConfig = TrainConfig(),
                 mesh: Optional[Mesh] = None,
                 device_data: bool = False):
        """``device_data=True`` uploads the stacks to HBM once and assembles
        samples inside the jit step (see data/device_cache.py) - the per-step
        host->device transfer drops from ~4 MB/sample to ~25 bytes/sample."""
        self.model = model
        self.training_data = training_data
        self.test_data = test_data
        self.config = config
        self.mesh = mesh

        ds = training_data
        t = ds.tile_size
        self._rng = jax.random.PRNGKey(config.seed)
        self._rng, init_rng, sample_rng = jax.random.split(self._rng, 3)

        # capture transform specs + stats tables as jit constants (needed by
        # _prepare below, which also determines the post-transform channel
        # counts, e.g. n_scale channels for split-scale transforms)
        self._stats = {f: ds.stats[f] for f in ds.fields}
        self._transforms = {f: ds.transforms[f] for f in ds.fields}
        self._input_field = ds.input_field
        self._label_fields = list(ds.label_fields)

        x0, y0 = jax.eval_shape(
            self._prepare,
            jnp.zeros((1, t, t), jnp.float32),
            jnp.zeros((len(ds.label_fields), 1, t, t), jnp.float32),
            jnp.zeros((1,), jnp.float32))
        x0 = jnp.zeros(x0.shape, x0.dtype)
        y0 = jnp.zeros(y0.shape, y0.dtype)
        aux0 = jnp.zeros((1,), jnp.float32)
        # jit the init: run eagerly, the conv-rewrite kernel reshapes
        # (ops/conv_rewrites.py) dispatch dozens of tiny eager ops, each a
        # separate compile — minutes over a network-attached chip
        variables = jax.jit(model.init)(
            {"params": init_rng, "sample": sample_rng}, x0, y0, aux0)

        self.optimizer = optax.chain(
            optax.scale_by_adam(b1=config.adam_b1, b2=config.adam_b2),
            optax.scale(-1.0))
        self.state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.optimizer.init(variables["params"]),
            step=jnp.zeros((), jnp.int32))
        # host-side mirror of state.step: reading the device scalar would
        # force a device sync on every dispatch (fatal over a network-attached
        # chip), so the RNG folding uses this counter instead
        self._host_step = 0

        if mesh is not None:
            self._data_sharding = NamedSharding(mesh, P("data"))
            replicated = NamedSharding(mesh, P())
            self.state = jax.device_put(self.state, replicated)
        else:
            self._data_sharding = None

        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

        self._progress = None
        self._data_rng = None
        # optional declarative RunConfig (train/run_config.py); stored into
        # every checkpoint's meta for full-run reproducibility
        self.run_config = None

        if (config.pk_loss_weight > 0
                and model.architecture.get("fused_res_blocks")):
            raise ValueError(
                "pk_loss_weight requires fused_res_blocks=False: the loss "
                "differentiates through the eval-mode paint path, and the "
                "fused Pallas inference kernel has no VJP.")

        self.device_cache = None
        if device_data:
            from baryon_painter_tpu.data.device_cache import DeviceStackCache
            self.device_cache = DeviceStackCache.create_if_fits(
                training_data, config.device_cache_budget_bytes, mesh=mesh)
            if self.device_cache is not None:
                self._train_step_digits = jax.jit(
                    self._train_step_digits_impl, donate_argnums=(0,))
                self._train_scan = jax.jit(self._train_scan_impl,
                                           donate_argnums=(0,))
                if (config.pk_loss_weight > 0 and not config.pk_loss_per_z
                        and not self.device_cache.uniform_z):
                    import warnings
                    warnings.warn(
                        "pooled spectral loss (pk_loss_per_z=False) on a "
                        "z-skewed mesh: batch-mean spectra over-represent "
                        "the over-sampled redshifts and per-sample "
                        "importance weights cannot correct a pooled loss; "
                        "use pk_loss_per_z=True (see docs/scaling.md).",
                        stacklevel=2)

    # ------------------------------------------------------------------ #

    def _to_channels(self, arr, field, z):
        """Transform a raw (N,H,W) field and shape to NHWC."""
        out = self._transforms[field].forward(arr, self._stats[field], z)
        if out.ndim == 3:
            return out[..., None]
        # split-scale style (N, C, H, W) -> NHWC
        return jnp.moveaxis(out, -3, -1)

    def _prepare(self, raw_input, raw_labels, z):
        y = self._to_channels(raw_input, self._input_field, z)
        xs = [self._to_channels(raw_labels[j], f, z)
              for j, f in enumerate(self._label_fields)]
        x = jnp.concatenate(xs, axis=-1)
        return x.astype(jnp.float32), y.astype(jnp.float32)

    def _forward(self, params, batch_stats, raw_input, raw_labels, z, rng,
                 alpha_var, beta_KL, train, sample_weight=None):
        x, y = self._prepare(raw_input, raw_labels, z)
        out, updates = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, y, z, alpha_var=alpha_var, beta_KL=beta_KL, train=train,
            sample_weight=sample_weight,
            rngs={"sample": rng}, mutable=["batch_stats"])
        return out, updates

    def _pk_loss(self, params, batch_stats, raw_input, raw_labels, z, rng):
        """Squared log-ratio of batch-mean auto+cross P(k), prior-sampled
        painting vs truth, in physical space (the fidelity-gate metric).
        See train/spectral.py for the loss itself."""
        from baryon_painter_tpu.train.spectral import pk_fidelity_loss

        x, y = self._prepare(raw_input, raw_labels, z)
        pred_t = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, y, z,
            train=False, rngs={"sample": rng}, method=self.model.sample_P)
        pred_t = pred_t[..., 0].astype(jnp.float32)
        # clamp to the truth's transformed range (+margin) so the exp in the
        # inverse transform cannot overflow on early-training outliers
        x0 = jax.lax.stop_gradient(x[..., 0].astype(jnp.float32))
        pred_t = jnp.clip(pred_t, x0.min() - 1.0, x0.max() + 1.0)
        field = self._label_fields[0]
        pred = self._transforms[field].inverse(pred_t, self._stats[field], z)
        truth = raw_labels[0].astype(jnp.float32)
        dm = raw_input.astype(jnp.float32)
        return pk_fidelity_loss(
            pred, truth, dm, L=float(self.training_data.tile_L),
            n_bins=self.config.pk_loss_n_bins, z=z,
            redshifts=(list(self.training_data.redshifts)
                       if self.config.pk_loss_per_z else None))

    def _train_step_impl(self, state: TrainState, raw_input, raw_labels, z,
                         rng, lr, alpha_var, beta_KL, sample_weight=None):
        # BPT_REMAT: rematerialize the forward in the backward pass (trade
        # recompute flops for stored-residual HBM traffic; the step is
        # bandwidth-bound at ~48 flops/byte vs the 241 flops/byte v5e
        # ridge, docs/roofline.md). Off by default - measured results in
        # the round log decide whether it graduates. Values:
        #   1 / full       -> jax.checkpoint with nothing saved
        #   dots           -> save MXU results, recompute elementwise/norm
        #                     (the cheap-to-recompute, byte-heavy part)
        #   dots_no_batch  -> save only batch-independent dot products
        def fwd(params, bstats, ri, rl, zz, rk, sw):
            return self._forward(params, bstats, ri, rl, zz, rk, alpha_var,
                                 beta_KL, True, sample_weight=sw)
        remat = os.environ.get("BPT_REMAT")
        if remat:
            policies = {
                "1": None, "full": None,
                "dots": jax.checkpoint_policies.checkpoint_dots,
                "dots_no_batch":
                    jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
            }
            if remat not in policies:
                raise ValueError(
                    f"BPT_REMAT={remat!r}: use one of {sorted(policies)} "
                    f"(a typo here would silently measure full remat)")
            fwd = jax.checkpoint(fwd, policy=policies[remat])

        def loss_fn(params):
            out, updates = fwd(params, state.batch_stats, raw_input,
                               raw_labels, z, rng, sample_weight)
            loss = -out["elbo"]
            if self.config.pk_loss_weight > 0:
                pk = self._pk_loss(params, state.batch_stats, raw_input,
                                   raw_labels, z,
                                   jax.random.fold_in(rng, 1))
                out = dict(out, pk_loss=pk)
                loss = loss + self.config.pk_loss_weight * pk
            return loss, (out, updates)

        (_, (out, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # pre-clip global norm: the observable for choosing clip_grad_norm
        # (XLA CSEs the duplicate norm inside the clip helper)
        out = dict(out, grad_norm=optax.global_norm(grads))
        if self.config.clip_grad_norm > 0:
            grads = clip_grads_by_global_norm(grads,
                                              self.config.clip_grad_norm)
        direction, opt_state = self.optimizer.update(grads, state.opt_state,
                                                     state.params)
        direction = jax.tree.map(lambda u: lr * u, direction)
        params = optax.apply_updates(state.params, direction)
        new_state = TrainState(params=params,
                               batch_stats=(state.batch_stats
                                            if self.config.freeze_bn_stats
                                            else updates["batch_stats"]),
                               opt_state=opt_state,
                               step=state.step + 1)
        metrics = {k: v for k, v in out.items()
                   if k not in ("x_mu", "x_var")}
        return new_state, metrics

    def _train_step_digits_impl(self, state: TrainState, stacks, digits,
                                rng, lr, alpha_var, beta_KL):
        # stacks is passed as an explicit jit argument: closing over the
        # HBM cache would embed it as an MLIR constant (device->host fetch
        # at lowering + GB-scale HLO; see DeviceStackCache.stacks)
        cache = self.device_cache
        raw_input, raw_labels, z = cache.gather(digits, stacks)
        # mesh-sharded z sampling is non-uniform when n_z % n_dev != 0;
        # importance weights restore the uniform-z expected gradient
        # (ADVICE r2; data/device_cache.py z_slot_weights)
        sw = (None if cache.mesh is None or cache.uniform_z
              else jnp.asarray(cache.z_slot_weights)[digits[:, 0]])
        return self._train_step_impl(state, raw_input, raw_labels, z, rng,
                                     lr, alpha_var, beta_KL,
                                     sample_weight=sw)

    def _train_scan_impl(self, state: TrainState, stacks, digits_k, base_rng,
                         lr_k, alpha_k, beta_k):
        """K fused training steps in ONE device dispatch via lax.scan.

        Eliminates per-step host->device dispatch latency entirely (the
        dominant cost on a network-attached chip). digits_k: (K, B, 9);
        lr/alpha/beta: (K,) traced schedules.
        """
        def body(st, inp):
            digits, step_i, lr, a, b = inp
            rng = jax.random.fold_in(base_rng, step_i)
            st, metrics = self._train_step_digits_impl(st, stacks, digits,
                                                       rng, lr, a, b)
            return st, metrics

        return jax.lax.scan(body, state,
                            (digits_k[0], digits_k[1], lr_k, alpha_k, beta_k))

    def _eval_step_impl(self, state: TrainState, raw_input, raw_labels, z,
                        rng, alpha_var, beta_KL):
        # Loss parity with the reference's validate(compute_loss=True)
        # (painter.py:312-314): batch-mode statistics, no state mutation.
        out, _ = self._forward(state.params, state.batch_stats, raw_input,
                               raw_labels, z, rng, alpha_var, beta_KL, True)
        return {k: v for k, v in out.items() if k not in ("x_mu", "x_var")}

    # ------------------------------------------------------------------ #

    def _put_batch(self, batch: Dict[str, np.ndarray]):
        arrs = (batch["input"], batch["labels"], batch["z"])
        if self._data_sharding is None:
            return tuple(jnp.asarray(a) for a in arrs)
        sh = self._data_sharding
        shardings = (sh, NamedSharding(self.mesh, P(None, "data")),
                     sh)
        return tuple(jax.device_put(a, s) for a, s in zip(arrs, shardings))

    def step(self, batch: Dict[str, np.ndarray], lr: float,
             alpha_var: float = 1.0, beta_KL: float = 1.0):
        """Run one fused training step on a raw host batch."""
        raw_input, raw_labels, z = self._put_batch(batch)
        step_rng = jax.random.fold_in(self._rng, self._host_step)
        self._host_step += 1
        self.state, metrics = self._train_step(
            self.state, raw_input, raw_labels, z, step_rng,
            jnp.float32(lr), jnp.float32(alpha_var), jnp.float32(beta_KL))
        return metrics

    def step_indices(self, idx: np.ndarray, lr: float,
                     alpha_var: float = 1.0, beta_KL: float = 1.0):
        """Training step by sample index, assembling the batch ON DEVICE
        from the HBM-resident stack cache (device_data=True required)."""
        if self.device_cache is None:
            raise RuntimeError("Construct the trainer with device_data=True "
                               "to use step_indices.")
        digits = self.device_cache.digits(idx)
        if self._data_sharding is not None:
            digits = jax.device_put(digits, self._data_sharding)
        step_rng = jax.random.fold_in(self._rng, self._host_step)
        self._host_step += 1
        self.state, metrics = self._train_step_digits(
            self.state, self.device_cache.stacks, digits, step_rng,
            jnp.float32(lr), jnp.float32(alpha_var), jnp.float32(beta_KL))
        return metrics

    def _sample_indices(self, rng, n: int) -> np.ndarray:
        """Batch sampling for the fused path: device-grouped z-local rows
        when the device cache is mesh-sharded, plain sampling otherwise."""
        if self.device_cache is not None and self.device_cache.mesh is not None:
            return self.device_cache.sample_mesh_indices(rng, n)
        return self.training_data.sample_indices(rng, n)

    def step_scan(self, idx_matrix: np.ndarray, lr, alpha_var=1.0,
                  beta_KL=1.0):
        """Run K fused steps (one dispatch): idx_matrix is (K, B) sample
        indices; lr/alpha_var/beta_KL may be scalars or (K,) schedules.
        Returns stacked per-step metrics (device arrays)."""
        if self.device_cache is None:
            raise RuntimeError("Construct the trainer with device_data=True "
                               "to use step_scan.")
        k = idx_matrix.shape[0]
        digits = np.stack([self.device_cache.digits(row)
                           for row in idx_matrix])
        if self._data_sharding is not None:
            spec = NamedSharding(self.mesh, P(None, "data"))
            digits = jax.device_put(digits, spec)

        def sched(v):
            arr = np.broadcast_to(np.asarray(v, np.float32), (k,))
            return jnp.asarray(arr)

        steps = jnp.arange(self._host_step, self._host_step + k)
        self._host_step += k
        # rng folding matches k sequential step_indices calls exactly
        self.state, metrics = self._train_scan(
            self.state, self.device_cache.stacks,
            (jnp.asarray(digits), steps), self._rng, sched(lr),
            sched(alpha_var), sched(beta_KL))
        return metrics

    def eval_loss(self, batch, alpha_var=1.0, beta_KL=1.0, seed=0):
        raw_input, raw_labels, z = self._put_batch(batch)
        return self._eval_step(self.state, raw_input, raw_labels, z,
                               jax.random.PRNGKey(seed), jnp.float32(alpha_var),
                               jnp.float32(beta_KL))

    def _flush_stats(self, pending, training_stats):
        """Convert buffered device metrics to host floats in one sync."""
        if not pending:
            return
        host = jax.device_get([m for _, m, _, _ in pending])
        for (n_samples, _, lr, bs), metrics in zip(pending, host):
            training_stats.push_loss(n_samples, *self.stats_tuple(metrics),
                                     lr, bs)
        pending.clear()

    def stats_tuple(self, metrics) -> tuple:
        vals = [float(metrics["elbo"]), -float(metrics["kl"])]
        vals += list(np.asarray(metrics["log_likelihood"]))
        if "log_likelihood_fixed_var" in metrics:
            vals += list(np.asarray(metrics["log_likelihood_fixed_var"]))
            vals += list(np.asarray(metrics["log_likelihood_free_var"]))
        return tuple(vals)

    # ------------------------------------------------------------------ #

    def train(self, validation_pepochs: Sequence[int] = (),
              on_validation: Optional[Callable] = None):
        """Full training loop with pepoch schedules; returns
        (training_stats, validation_stats). Mirrors painter.py:60-293."""
        cfg = self.config
        ds = self.training_data

        # Rename the numeric channel suffix to the label-field name
        # (reference painter.py:114-121). Suffix-anchored: a bare substring
        # replace corrupts unrelated digits ("log_likelihood_10", field
        # names containing the digit).
        stats_labels = list(self.model.get_stats_labels())
        for j, f in enumerate(self._label_fields):
            suffix = f"_{j}"
            stats_labels = [
                l[:-len(suffix)] + f"_{f}_0" if l.endswith(suffix) else l
                for l in stats_labels]
        stats_labels += ["lr", "batch_size"]

        out_path = cfg.output_path
        train_fn = val_fn = ckpt_template = None
        if out_path is not None:
            os.makedirs(out_path, exist_ok=True)
            train_fn = os.path.join(out_path, "training_stats.txt")
            val_fn = os.path.join(out_path, "validation_stats.txt")
            ckpt_template = os.path.join(
                out_path, "checkpoint_sample{sample:0>10}")

        # Resume: restore() stashes loop progress + the data-RNG state from
        # the checkpoint; schedules fast-forward to the restored pepoch and
        # the stats files re-load instead of truncating (SURVEY §5 failure
        # recovery — the reference restarts from scratch).
        progress = dict(self._progress or {})
        resuming = bool(progress)
        n_samples = progress.get("n_samples", 0)
        i_pepoch = progress.get("i_pepoch", 0)
        last_pepoch_samples = progress.get("last_pepoch_samples", 0)
        last_val_loss = progress.get("last_val_loss", 0)
        last_ckpt = progress.get("last_ckpt", 0)
        last_report = progress.get("last_report", 0)
        data_rng = (self._data_rng if resuming and self._data_rng is not None
                    else np.random.default_rng(cfg.seed))

        training_stats = TrainingStats(stats_labels, cfg.mavg_window_size,
                                       stats_filename=train_fn,
                                       resume=resuming,
                                       resume_up_to=(n_samples if resuming
                                                     else None))
        validation_stats = TrainingStats(stats_labels, cfg.mavg_window_size,
                                         stats_filename=val_fn,
                                         resume_up_to=(n_samples if resuming
                                                       else None),
                                         dump_to_file_frequency=1,
                                         resume=resuming)

        batch_size = (cfg.adaptive_batch_size(i_pepoch)
                      if cfg.adaptive_batch_size else cfg.batch_size)
        lr_mult = (cfg.adaptive_learning_rate(i_pepoch)
                   if cfg.adaptive_learning_rate else 1.0)
        alpha_var = cfg.var_anneal_fn(i_pepoch) if cfg.var_anneal_fn else 1.0
        beta_KL = cfg.KL_anneal_fn(i_pepoch) if cfg.KL_anneal_fn else 1.0

        if not resuming and 0 in validation_pepochs and on_validation:
            # pepoch 0 fires before any training (the boundary check below
            # only triggers after a full pepoch has elapsed)
            on_validation(self, 0)

        t0 = time.time()
        pending = []

        def snapshot_progress():
            self._progress = {"n_samples": n_samples, "i_pepoch": i_pepoch,
                              "last_pepoch_samples": last_pepoch_samples,
                              "last_val_loss": last_val_loss,
                              "last_ckpt": last_ckpt,
                              "last_report": last_report}
            self._data_rng = data_rng

        while i_pepoch < cfg.n_pepoch:
            # ---- pepoch boundary -------------------------------------- #
            if n_samples - cfg.pepoch_size >= last_pepoch_samples and n_samples:
                i_pepoch += 1
                last_pepoch_samples = n_samples
                if i_pepoch >= cfg.n_pepoch:
                    break
                if cfg.adaptive_learning_rate:
                    sched = cfg.adaptive_learning_rate
                    if hasattr(sched, "observe"):
                        # reactive schedule (ReduceLROnPlateau): feed it the
                        # latest training-ELBO moving average (the reference
                        # steps its torch scheduler with the current batch's
                        # ELBO at each pepoch boundary, painter.py:186-190)
                        self._flush_stats(pending, training_stats)
                        mavg = training_stats.loss_terms["ELBO"]["mavg"]
                        lr_mult = (sched.observe(mavg[-1]) if mavg
                                   else sched())
                    else:
                        lr_mult = sched(i_pepoch)
                if cfg.var_anneal_fn:
                    alpha_var = cfg.var_anneal_fn(i_pepoch)
                if cfg.KL_anneal_fn:
                    beta_KL = cfg.KL_anneal_fn(i_pepoch)
                if cfg.adaptive_batch_size:
                    batch_size = cfg.adaptive_batch_size(i_pepoch)
                if i_pepoch in validation_pepochs and on_validation:
                    on_validation(self, i_pepoch)

            lr = cfg.learning_rate * lr_mult
            if self.device_cache is not None:
                # Fuse steps up to the next sample-count boundary (pepoch /
                # validation / checkpoint / report) into ONE scan dispatch.
                horizons = [last_pepoch_samples + cfg.pepoch_size]
                if (self.test_data is not None
                        and cfg.validation_loss_frequency > 0):
                    horizons.append(last_val_loss + cfg.validation_loss_frequency)
                if ckpt_template is not None:
                    horizons.append(last_ckpt + cfg.checkpoint_frequency)
                if cfg.statistics_report_frequency > 0:
                    horizons.append(last_report + cfg.statistics_report_frequency)
                until = max(min(horizons) - n_samples, 1)
                k = min(max(1, cfg.stats_sync_every),
                        -(-until // batch_size))
                # round down to a power of two: bounds the number of distinct
                # compiled scan lengths to log2(stats_sync_every)+1
                k = 1 << (k.bit_length() - 1)
                idx_matrix = np.stack(
                    [self._sample_indices(data_rng, batch_size)
                     for _ in range(k)])
                metrics_k = self.step_scan(idx_matrix, lr=lr,
                                           alpha_var=alpha_var,
                                           beta_KL=beta_KL)
                for i in range(k):
                    n_samples += batch_size
                    pending.append(
                        (n_samples,
                         jax.tree.map(lambda a, i=i: a[i], metrics_k),
                         lr, batch_size))
            else:
                idx = ds.sample_indices(data_rng, batch_size)
                metrics = self.step(ds.get_raw_batch(idx), lr=lr,
                                    alpha_var=alpha_var, beta_KL=beta_KL)
                n_samples += batch_size
                pending.append((n_samples, metrics, lr, batch_size))

            # Buffer metrics on-device; sync in batches so the step loop is
            # not throttled by per-step device round trips.
            if len(pending) >= max(1, cfg.stats_sync_every):
                self._flush_stats(pending, training_stats)

            if (self.test_data is not None
                    and cfg.validation_loss_frequency > 0
                    and n_samples - cfg.validation_loss_frequency >= last_val_loss):
                self._flush_stats(pending, training_stats)
                last_val_loss = n_samples
                vidx = self.test_data.sample_indices(
                    data_rng, cfg.validation_loss_batch_size)
                vmetrics = self.eval_loss(self.test_data.get_raw_batch(vidx),
                                          alpha_var, beta_KL)
                validation_stats.push_loss(
                    n_samples, *self.stats_tuple(vmetrics),
                    cfg.learning_rate * lr_mult, batch_size)

            if (ckpt_template is not None
                    and n_samples - cfg.checkpoint_frequency >= last_ckpt):
                last_ckpt = n_samples
                # flush stats first so the file on disk is consistent with
                # the checkpoint (a resume re-loads this file)
                self._flush_stats(pending, training_stats)
                training_stats.flush_to_file()
                validation_stats.flush_to_file()
                snapshot_progress()
                self.save(ckpt_template.format(sample=n_samples))
                ckpt.rotate_checkpoints(out_path, cfg.keep_last_checkpoints)

            if (cfg.statistics_report_frequency > 0
                    and n_samples - cfg.statistics_report_frequency >= last_report):
                last_report = n_samples
                self._flush_stats(pending, training_stats)
                if cfg.verbose:
                    elbo = training_stats.loss_terms["ELBO"]["mavg"][-1]
                    rate = n_samples / (time.time() - t0)
                    print(f"P-Epoch [{i_pepoch}/{cfg.n_pepoch}] "
                          f"samples {n_samples} ELBO(mavg) {elbo:.3e} "
                          f"({rate:.1f} samples/s)")

        self._flush_stats(pending, training_stats)
        training_stats.flush_to_file()
        validation_stats.flush_to_file()
        snapshot_progress()
        if out_path is not None:
            self.save(os.path.join(out_path, "model"))
        return training_stats, validation_stats

    # ------------------------------------------------------------------ #

    def validate(self, validation_batch_size: int = 8,
                 validation_redshift: Optional[float] = None,
                 compute_loss: bool = False,
                 plot_sample_var: bool = False,
                 plot_power_spectra: Sequence[str] = ("auto",),
                 plot_histogram: Sequence[str] = ("log",),
                 save_plots: bool = False,
                 filename_template: str = "{plot_type}.png",
                 seed: int = 0):
        """Diagnostics on a test batch; mirrors painter.py:295-367.

        With compute_loss=True returns the reference stats tuple; otherwise
        paints the batch with the prior and produces sample / P(k) /
        histogram figures (returned as a dict; saved when save_plots)."""
        if self.test_data is None:
            raise RuntimeError("Trying to validate but no test data specified.")
        from baryon_painter_tpu.utils import validation_plotting as vp

        ds = self.test_data
        rng = np.random.default_rng(seed)
        idx = ds.sample_indices(rng, validation_batch_size,
                                z=validation_redshift)
        batch = ds.get_raw_batch(idx)
        if compute_loss:
            return self.stats_tuple(self.eval_loss(batch, seed=seed))

        zs = batch["z"]
        x, y = self._prepare(jnp.asarray(batch["input"]),
                             jnp.asarray(batch["labels"]), jnp.asarray(zs))
        pred = self.model.apply(
            {"params": self.state.params,
             "batch_stats": self.state.batch_stats},
            y, jnp.asarray(zs), return_var=plot_sample_var, train=False,
            rngs={"sample": jax.random.PRNGKey(seed)},
            method=self.model.sample_P)
        if plot_sample_var:
            x_pred, x_var = pred
        else:
            x_pred, x_var = pred, None

        # float32: bf16-model predictions arrive as ml_dtypes.bfloat16, which
        # numpy cannot promote against float32 inside the plotting code
        to_nchw = lambda a: np.moveaxis(
            np.asarray(a).astype(np.float32), -1, 1)
        x_nchw, y_nchw, p_nchw = to_nchw(x), to_nchw(y), to_nchw(x_pred)
        inv = [ds.get_inverse_transforms(z=z) for z in zs]
        figs = {}
        figs["sample"], _ = vp.plot_samples(
            x_nchw, p_nchw, y_nchw,
            output_pred_var=to_nchw(x_var) if x_var is not None else None,
            input_label=ds.input_field, output_labels=ds.label_fields)
        for mode in plot_power_spectra or ():
            figs[f"{mode}_power_spectrum"], _ = vp.plot_power_spectra(
                x_nchw, p_nchw, y_nchw, L=ds.tile_L, mode=mode,
                output_labels=ds.label_fields,
                input_transform=[t[0] for t in inv],
                output_transforms=[t[1:] for t in inv])
        for mode in plot_histogram or ():
            figs[f"{mode}_histogram"], _ = vp.plot_histogram(
                x_nchw, p_nchw, labels=ds.label_fields,
                y_logscale=mode == "log")
        if save_plots:
            for name, fig in figs.items():
                fig.savefig(filename_template.format(plot_type=name))
        return figs

    def save(self, base_path: str, include_opt_state: bool = True):
        state = {"params": self.state.params,
                 "batch_stats": self.state.batch_stats,
                 "step": self.state.step}
        if include_opt_state:
            state["opt_state"] = self.state.opt_state
        if self._progress is not None:
            state["progress"] = np.array(
                [self._progress[k] for k in _PROGRESS_KEYS], dtype=np.int64)
        if self._data_rng is not None:
            state["data_rng"] = _encode_data_rng(self._data_rng)
        sched = self.config.adaptive_learning_rate
        if hasattr(sched, "state_array"):
            # reactive schedules (ReduceLROnPlateau) carry float state that
            # must survive a resume mid-plateau
            state["lr_sched"] = np.asarray(sched.state_array(), np.float64)
        meta = ckpt.meta_from_dataset(self.training_data,
                                      self.model.architecture)
        if self.run_config is not None:
            meta["run_config"] = self.run_config.to_dict()
        ckpt.save_checkpoint(base_path, state, meta)

    def restore(self, base_path: str):
        import flax.serialization

        raw, meta = ckpt.load_checkpoint(base_path)
        restore = flax.serialization.from_state_dict
        self.state = TrainState(
            params=restore(self.state.params, raw["params"]),
            batch_stats=restore(self.state.batch_stats, raw["batch_stats"]),
            opt_state=(restore(self.state.opt_state, raw["opt_state"])
                       if "opt_state" in raw else self.state.opt_state),
            step=jnp.asarray(raw["step"]))
        if self.mesh is not None:
            self.state = jax.device_put(self.state,
                                        NamedSharding(self.mesh, P()))
        self._host_step = int(raw["step"])
        if "progress" in raw:
            vals = np.asarray(raw["progress"], dtype=np.int64)
            self._progress = {k: int(v)
                              for k, v in zip(_PROGRESS_KEYS, vals)}
        if "data_rng" in raw:
            self._data_rng = _decode_data_rng(raw["data_rng"])
        if "lr_sched" in raw and hasattr(self.config.adaptive_learning_rate,
                                         "load_state_array"):
            self.config.adaptive_learning_rate.load_state_array(
                np.asarray(raw["lr_sched"], np.float64))
        return meta
