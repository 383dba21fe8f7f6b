"""Hermetic test for scripts/make_model_report.py (the notebook-tier
report generator: loss curves + P(k) gate table from committed artifacts)."""
import importlib.util
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "make_model_report", os.path.join(REPO, "scripts",
                                          "make_model_report.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_report_from_synthetic_artifacts(tmp_path):
    mod = _load_module()
    d = tmp_path / "CVAE" / "toy"
    d.mkdir(parents=True)
    (d / "model_meta.json").write_text(json.dumps({
        "model_kind": "cvae", "tile_size": 64, "tile_L": 100.0,
        "input_field": "dm", "label_fields": ["pressure"],
        "model_architecture": {"dim_z": [1, 4, 4]}}))
    (d / "fidelity_report.json").write_text(json.dumps({
        "pass_5pct": True,
        "per_z": {"0": {"auto": 0.01, "cross": 0.02},
                  "1": {"auto": 0.06, "cross": 0.03}}}))
    rows = "\n".join(f"{i} {24 * (i + 1)} {-100.0 + i} {-1.0}"
                     for i in range(50))
    (d / "training_stats.txt").write_text(
        "# Batch nr, sample nr, ELBO, KL_term\n" + rows + "\n")

    mod.make_report(str(d))

    report = (d / "report.md").read_text()
    assert "P(k) fidelity gate" in report
    assert "| 0 | 0.010 | 0.020 | yes |" in report
    assert "| 1 | 0.060 | 0.030 | NO |" in report   # per-z 0.06 > 5%
    assert "PASS" in report                          # overall flag as stored
    assert (d / "loss_curves.png").exists()


def test_report_renders_dual_dtype_gate(tmp_path):
    """Reports produced under --gate-dtype both carry per_z_by_dtype; the
    table must show both paint-dtype legs and pass on the worst of them."""
    mod = _load_module()
    d = tmp_path / "CVAE" / "dual"
    d.mkdir(parents=True)
    (d / "model_meta.json").write_text(json.dumps({
        "model_kind": "cvae", "tile_size": 64, "tile_L": 100.0,
        "input_field": "dm", "label_fields": ["pressure"],
        "model_architecture": {"dim_z": [1, 4, 4]}}))
    (d / "fidelity_report.json").write_text(json.dumps({
        "pass_5pct": False, "gate_dtype": "both",
        "per_z": {"0": {"auto": 0.01, "cross": 0.02}},
        "per_z_by_dtype": {
            "f32": {"0": {"auto": 0.01, "cross": 0.02}},
            "model": {"0": {"auto": 0.08, "cross": 0.02}}}}))
    mod.make_report(str(d))
    report = (d / "report.md").read_text()
    assert "| z | auto f32 | cross f32 | auto model | cross model | pass |" \
        in report
    # worst over dtypes (model-leg auto 0.08) fails the row
    assert "| 0 | 0.010 | 0.020 | 0.080 | 0.020 | NO |" in report
    assert "worst per-z value 0.080 across paint dtypes f32/model" in report


def test_report_tolerates_header_only_stats(tmp_path):
    """A run that crashed before its first stats flush leaves a header-only
    file; the loss panel must be skipped, not crash on an empty column."""
    mod = _load_module()
    d = tmp_path / "CVAE" / "crashed"
    d.mkdir(parents=True)
    (d / "model_meta.json").write_text(json.dumps({
        "model_kind": "cvae", "tile_size": 64, "tile_L": 100.0,
        "input_field": "dm", "label_fields": ["pressure"],
        "model_architecture": {"dim_z": [1, 4, 4]}}))
    (d / "training_stats.txt").write_text(
        "# Batch nr, sample nr, ELBO, KL_term\n")
    mod.make_report(str(d))
    assert (d / "report.md").exists()
    assert not (d / "loss_curves.png").exists()


def test_report_skips_dir_without_meta(tmp_path, capsys):
    mod = _load_module()
    mod.make_report(str(tmp_path))
    assert "skip" in capsys.readouterr().out
    assert not (tmp_path / "report.md").exists()


def test_mavg_window():
    mod = _load_module()
    x = np.arange(10, dtype=float)
    m = mod._mavg(x, w=3)
    assert m[0] == 0.0
    np.testing.assert_allclose(m[-1], np.mean(x[-3:]))
