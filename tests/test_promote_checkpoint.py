"""Hermetic tests for scripts/promote_checkpoint.py (workdir -> trained_models
promotion: inference-state stripping, best-checkpoint selection, clobber
guard, metadata cross-checks, manifest accuracy)."""
import importlib.util
import json
import os
import time

import flax.serialization
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "promote_checkpoint", os.path.join(REPO, "scripts",
                                           "promote_checkpoint.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_ckpt(base, extra_keys=(), tile=64, model_kind="cvae"):
    state = {"params": {"w": np.ones((2, 2), np.float32)},
             "batch_stats": {"m": np.zeros(2, np.float32)},
             "step": np.int64(7)}
    for k in extra_keys:
        state[k] = {"nu": np.ones(3, np.float32)}
    with open(base + "_state.msgpack", "wb") as f:
        f.write(flax.serialization.msgpack_serialize(state))
    with open(base + "_meta.json", "w") as f:
        json.dump({"model_kind": model_kind, "tile_size": tile,
                   "tile_L": 100.0, "input_field": "dm",
                   "label_fields": ["pressure"],
                   "model_architecture": {"dim_z": [1, 4, 4]}}, f)


def _restore(path):
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def test_promote_strips_training_state_and_reports_manifest(tmp_path, capsys):
    mod = _load_module()
    wd, dest = tmp_path / "wd", tmp_path / "dest"
    wd.mkdir()
    _write_ckpt(str(wd / "fidelity_model_cvae"),
                extra_keys=("opt_state", "progress", "data_rng"))
    (wd / "training_stats_cvae.txt").write_text(
        "# Batch nr, sample nr, ELBO, KL_term\n"
        + "\n".join(f"{i} {24 * (i + 1)} {-100.0 + i} {-1.0}"
                    for i in range(30)) + "\n")

    mod.main(["--workdir", str(wd), "--model", "cvae",
              "--dest", str(dest), "--skip-eval"])

    raw = _restore(str(dest / "model_state.msgpack"))
    assert set(raw) == {"params", "batch_stats", "step"}
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # manifest lists exactly what exists in dest
    for name in manifest["files"]:
        assert (dest / name).exists(), name
    assert "report.md" in manifest["files"]
    assert "loss_curves.png" in manifest["files"]


def test_promote_prefers_newer_best_checkpoint(tmp_path):
    mod = _load_module()
    wd, dest = tmp_path / "wd", tmp_path / "dest"
    wd.mkdir()
    base = str(wd / "fidelity_model_cvae")
    _write_ckpt(base, tile=32)
    _write_ckpt(base + "_best", tile=48)
    # make _best strictly newer (the crashed-refinement scenario)
    later = time.time() + 60
    os.utime(base + "_best_state.msgpack", (later, later))

    mod.main(["--workdir", str(wd), "--model", "cvae",
              "--dest", str(dest), "--skip-eval"])
    meta = json.loads((dest / "model_meta.json").read_text())
    assert meta["tile_size"] == 48  # the _best pair was promoted

    # explicit override still selects the final save
    mod.main(["--workdir", str(wd), "--model", "cvae", "--dest", str(dest),
              "--skip-eval", "--checkpoint", "base", "--force"])
    meta = json.loads((dest / "model_meta.json").read_text())
    assert meta["tile_size"] == 32


def test_promote_refuses_to_clobber_without_force(tmp_path):
    mod = _load_module()
    wd, dest = tmp_path / "wd", tmp_path / "dest"
    wd.mkdir()
    _write_ckpt(str(wd / "fidelity_model_cvae"))
    mod.main(["--workdir", str(wd), "--model", "cvae",
              "--dest", str(dest), "--skip-eval"])
    with pytest.raises(SystemExit, match="--force"):
        mod.main(["--workdir", str(wd), "--model", "cvae",
                  "--dest", str(dest), "--skip-eval"])


def test_promote_cross_checks_meta(tmp_path):
    mod = _load_module()
    wd = tmp_path / "wd"
    wd.mkdir()
    _write_ckpt(str(wd / "fidelity_model_cvae"), tile=64)
    with pytest.raises(SystemExit, match="tile"):
        mod.main(["--workdir", str(wd), "--model", "cvae",
                  "--dest", str(tmp_path / "d1"), "--skip-eval",
                  "--eval-args", "--tile 128"])
    # a cgan-named checkpoint whose metadata says cvae must be rejected
    _write_ckpt(str(wd / "fidelity_model_cgan"), model_kind="cvae")
    with pytest.raises(SystemExit, match="metadata"):
        mod.main(["--workdir", str(wd), "--model", "cgan",
                  "--dest", str(tmp_path / "d2"), "--skip-eval"])


def test_promote_missing_checkpoint_errors(tmp_path):
    mod = _load_module()
    (tmp_path / "wd").mkdir()
    with pytest.raises(SystemExit, match="no checkpoint"):
        mod.main(["--workdir", str(tmp_path / "wd"), "--model", "cvae",
                  "--dest", str(tmp_path / "dest"), "--skip-eval"])
