"""Hermetic tests for the reference-stats comparison harness.

The harness diffs reference-format training logs (painter.py:462-463 format,
written identically by our TrainingStats), so these tests synthesize two
small logs and check alignment, deviation math, term prefix-matching, and
the CLI gate exit codes.
"""
import json

import numpy as np
import pytest

from baryon_painter_tpu.train.stats_compare import (compare_trajectories,
                                                    load_stats_file)


def _write_stats(path, samples, elbo, batch=None, terms=None,
                 extra_cols=()):
    terms = terms or ["ELBO", "KL_term"]
    if batch is not None:
        terms = terms + ["batch_size"]
    with open(path, "w") as f:
        f.write("# Batch nr, sample nr, {}\n".format(", ".join(terms)))
        for i, (s, e) in enumerate(zip(samples, elbo)):
            row = [str(i), str(int(s)), repr(float(e)), "0.5"]
            if batch is not None:
                row.append(str(batch))
            f.write(" ".join(row) + " \n")


def _trajectory(n, lo=-55000.0, hi=-800.0, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    samples = np.arange(1, n + 1) * 24
    t = np.linspace(0, 1, n)
    elbo = lo + (hi - lo) * (1 - np.exp(-5 * t))
    if noise:
        elbo = elbo + rng.normal(0, noise, n)
    return samples, elbo


def test_load_stats_file_skips_torn_rows(tmp_path):
    p = tmp_path / "s.txt"
    samples, elbo = _trajectory(10)
    _write_stats(p, samples, elbo)
    with open(p, "a") as f:
        f.write("10 264 -123.0\n")  # torn row: missing columns
    terms, s, v = load_stats_file(p)
    assert terms == ["ELBO", "KL_term"]
    assert len(s) == 10 and v.shape == (10, 2)


def test_identical_runs_have_zero_deviation(tmp_path):
    samples, elbo = _trajectory(300)
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    _write_stats(a, samples, elbo)
    _write_stats(b, samples, elbo)
    for mode in ("shape", "absolute"):
        rep = compare_trajectories(a, b, mode=mode)
        assert rep["max_deviation"] < 1e-12


def test_shape_mode_is_scale_free(tmp_path):
    samples, elbo = _trajectory(300)
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    _write_stats(a, samples, elbo)
    _write_stats(b, samples, elbo * 1000.0 + 7.0)  # same shape, other scale
    rep = compare_trajectories(a, b, mode="shape")
    assert rep["max_deviation"] < 1e-9
    rep_abs = compare_trajectories(a, b, mode="absolute")
    assert rep_abs["max_deviation"] > 1.0


def test_divergent_trajectories_flagged(tmp_path):
    samples, elbo = _trajectory(300)
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    _write_stats(a, samples, elbo)
    # a run that converges far more slowly: different shape
    slow = elbo[0] + (elbo[-1] - elbo[0]) * np.linspace(0, 1, 300) ** 4
    _write_stats(b, samples, slow)
    rep = compare_trajectories(a, b, mode="shape", smooth_window=1)
    assert rep["max_deviation"] > 0.3


def test_term_prefix_matching(tmp_path):
    samples, elbo = _trajectory(50)
    ref, ours = tmp_path / "ref.txt", tmp_path / "ours.txt"
    _write_stats(ref, samples, elbo,
                 terms=["ELBO", "log_likelihood_pressure_0"])
    _write_stats(ours, samples, elbo, terms=["ELBO", "log_likelihood_0"])
    rep = compare_trajectories(ref, ours, term="log_likelihood_pressure_0",
                               our_term="log_likelihood_0")
    assert rep["max_deviation"] < 1e-12
    # prefix match: reference's longer name resolves against ours
    rep2 = compare_trajectories(ref, ours, term="log_likelihood")
    assert rep2["max_deviation"] < 1e-12


def test_per_sample_normalization(tmp_path):
    samples, elbo = _trajectory(200)
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    _write_stats(a, samples, elbo, batch=4)     # logs batch totals
    _write_stats(b, samples, elbo * 6.0, batch=24)
    rep = compare_trajectories(a, b, mode="absolute", per_sample=True)
    assert rep["max_deviation"] < 1e-9
    with pytest.raises(ValueError, match="batch_size"):
        _write_stats(tmp_path / "c.txt", samples, elbo)
        compare_trajectories(a, tmp_path / "c.txt", per_sample=True)


def test_no_overlap_errors(tmp_path):
    s1, e1 = _trajectory(50)
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    _write_stats(a, s1, e1)
    _write_stats(b, s1 + s1[-1] + 100, e1)
    with pytest.raises(ValueError, match="overlap"):
        compare_trajectories(a, b)


def test_cli_gate_and_report(tmp_path, capsys):
    import sys
    sys.path.insert(0, "scripts")
    try:
        from compare_reference_stats import main
    finally:
        sys.path.pop(0)
    samples, elbo = _trajectory(300)
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    _write_stats(a, samples, elbo)
    _write_stats(b, samples, elbo * 1.02)  # 2% off
    out = tmp_path / "rep.json"
    rc = main(["--reference", str(a), "--ours", str(b), "--mode", "absolute",
               "--band", "0.05", "--out", str(out)])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["pass"] and rep["max_deviation"] < 0.05
    capsys.readouterr()
    rc = main(["--reference", str(a), "--ours", str(b), "--mode", "absolute",
               "--band", "0.001"])
    assert rc == 1
