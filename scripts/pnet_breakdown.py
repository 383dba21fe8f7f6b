#!/usr/bin/env python
"""Where do the decoder's bytes live? Per-slice flops/bytes breakdown.

docs/roofline.md establishes the 512^2 train step is memory-bound (84% of
HBM speed-of-light, 66.9 GB/step) and that further MFU requires removing
bytes. This tool answers WHERE the bytes are, so byte-reduction work (e.g.
a fused train-mode Pallas kernel) targets the right layers: it compiles
each slice of the fiducial decoder trunk (full-res input conv, down chain,
the 4 residual blocks at 64^2 x 128ch, the transposed-conv up chain, the
output heads) as its own jitted fwd and fwd+bwd graph for the session
backend and reports XLA cost_analysis flops + bytes.

cost_analysis needs only a compile, not an execution, so this is safe to
run while the chip trains. Fresh-initialized parameters are used — byte
and flop counts depend on shapes, not values. NOTE: slice sums exceed the
full-net measurement's bytes because cross-slice fusion is lost at the
cut points; the value of this table is the RELATIVE distribution.

Prints one JSON line; use --out to also write docs/ab/pnet_breakdown.json.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from baryon_painter_tpu.utils.platform import (enable_compilation_cache,
                                                   respect_env_platform)
    respect_env_platform()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from baryon_painter_tpu.models.cvae import fiducial_cvae_architecture
    from baryon_painter_tpu.models.layers import SpecSequential
    from baryon_painter_tpu.utils.profiling import xla_cost

    arch = fiducial_cvae_architecture(tile_size=args.tile, n_res_blocks=4)
    trunk = arch["p_y_z_in"]
    # slice boundaries keyed on layer kinds (see models/dsl.py): the trunk
    # is [full-res conv+bn+relu] [3x strided down] [4 res blocks] [3x up]
    n_res0 = next(i for i, l in enumerate(trunk)
                  if l[0].lower() == "residual block")
    n_res1 = max(i for i, l in enumerate(trunk)
                 if l[0].lower() == "residual block") + 1
    slices = {
        "trunk_in (512^2 conv 3->16)": trunk[:3],
        "down chain (512->64, 16->128ch)": trunk[3:n_res0],
        "res blocks (4x @64^2 x128ch)": trunk[n_res0:n_res1],
        "up chain (64->512, 128->16ch)": trunk[n_res1:],
        "heads (3x @512^2, 16->8->1->1)": None,  # handled below
    }

    B, T = args.batch, args.tile
    dtype = jnp.bfloat16

    def measure(spec_list, in_shape, heads=False):
        """(fwd_flops, fwd_bytes, fb_flops, fb_bytes, out_shape)."""
        if heads:
            import flax.linen as nn

            class Heads(nn.Module):
                @nn.compact
                def __call__(self, x, train=True):
                    return jnp.concatenate(
                        [SpecSequential(_to_tuple(h), dtype=dtype)(
                            x, train=train)
                         for h in arch["p_y_z_out"]], axis=-1)

            mod = Heads()
        else:
            mod = SpecSequential(_to_tuple(spec_list), dtype=dtype)
        x = jnp.zeros(in_shape, dtype)
        variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
        params = variables.get("params", {})
        bstats = variables.get("batch_stats", {})

        def fwd(p_, b_, x_):
            out, _ = mod.apply({"params": p_, "batch_stats": b_}, x_,
                               train=True, mutable=["batch_stats"])
            return out

        def fb(p_, b_, x_):
            def loss(pp):
                return fwd(pp, b_, x_).astype(jnp.float32).sum()
            l, g = jax.value_and_grad(loss)(p_)
            return l, g

        cf = jax.jit(fwd).lower(params, bstats, x).compile()
        f_fl, f_by = xla_cost(cf)
        out_shape = jax.eval_shape(lambda: fwd(params, bstats, x)).shape
        cb = jax.jit(fb).lower(params, bstats, x).compile()
        b_fl, b_by = xla_cost(cb)
        return f_fl, f_by, b_fl, b_by, out_shape

    def _to_tuple(spec):
        return tuple(tuple(l) for l in spec) if spec is not None else None

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rows = {}
    shape = (B, T, T, 3)  # decoder trunk input: [y, z_up, aux] channels
    for name, spec in slices.items():
        heads = spec is None
        f_fl, f_by, b_fl, b_by, shape_out = measure(
            spec, shape if not heads else (B, T, T, 16), heads=heads)
        rows[name] = {
            "in_shape": list(shape if not heads else (B, T, T, 16)),
            "fwd_gflops": round(f_fl / 1e9, 1),
            "fwd_gbytes": round(f_by / 1e9, 2),
            "fwdbwd_gflops": round(b_fl / 1e9, 1),
            "fwdbwd_gbytes": round(b_by / 1e9, 2),
        }
        print(f"{name:36s} fwd {f_by/1e9:6.2f} GB {f_fl/1e9:7.1f} Gfl | "
              f"fwd+bwd {b_by/1e9:6.2f} GB {b_fl/1e9:7.1f} Gfl",
              file=sys.stderr, flush=True)
        if not heads:
            shape = (B,) + tuple(shape_out[1:])

    total_fb = sum(r["fwdbwd_gbytes"] for r in rows.values())
    for r in rows.values():
        r["fwdbwd_byte_share_pct"] = round(
            100 * r["fwdbwd_gbytes"] / total_fb, 1)
    report = {"metric": "pnet_byte_breakdown", "tile": T, "batch": B,
              "backend": jax.devices()[0].device_kind,
              "slices": rows,
              "slices_fwdbwd_gbytes_total": round(total_fb, 2),
              "note": "slice sums exceed the fused full-net bytes "
                      "(cross-slice fusion lost at cuts); use the "
                      "relative shares"}
    print(json.dumps(report))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
