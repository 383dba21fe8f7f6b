"""Validation plotting/metric tests (headless Agg)."""
import numpy as np
import pytest

from baryon_painter_tpu.utils.validation_plotting import (
    plot_histogram, plot_power_spectra, plot_samples,
    power_spectrum_fractional_error)

# quick-tier exclusion: matplotlib figure rendering (run with the full suite)
pytestmark = pytest.mark.slow


@pytest.fixture
def fields(rng):
    true = rng.standard_normal((3, 1, 32, 32)).astype(np.float32)
    pred = true + 0.1 * rng.standard_normal((3, 1, 32, 32)).astype(np.float32)
    inp = rng.standard_normal((3, 1, 32, 32)).astype(np.float32)
    return true, pred, inp


def test_plot_samples(fields):
    true, pred, inp = fields
    fig, ax = plot_samples(true, pred, inp, n_sample=2,
                           input_label="dm", output_labels=["pressure"])
    assert ax.shape[0] == 4  # 2 rows per sample
    var = np.abs(pred) + 0.1
    fig, ax = plot_samples(true, pred, inp, output_pred_var=var, n_sample=1)
    assert ax.shape[0] == 3


def test_plot_power_spectra_and_histogram(fields):
    true, pred, inp = fields
    fig, ax = plot_power_spectra(true, pred, inp, L=100.0, mode="auto",
                                 output_labels=["pressure"])
    assert ax.shape == (2, 1)
    fig, ax = plot_power_spectra(true, pred, inp, L=100.0, mode="cross")
    fig, ax = plot_histogram(true, pred, labels=["pressure"], y_logscale=True)
    assert len(ax) == 1


def test_fractional_error_metric(fields):
    true, pred, inp = fields
    k, frac = power_spectrum_fractional_error(true, true, inp, L=100.0)
    np.testing.assert_allclose(frac, 0.0, atol=1e-5)  # identical fields
    k, frac = power_spectrum_fractional_error(true, pred, inp, L=100.0,
                                              mode="cross")
    assert frac.shape == (3, 1, 20)
    with pytest.raises(ValueError):
        power_spectrum_fractional_error(true, pred, inp, L=1.0, mode="bogus")


def test_step_timer():
    from baryon_painter_tpu.utils.profiling import StepTimer
    t = StepTimer()
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert s["n"] == 2 and s["mean_ms"] >= 0
