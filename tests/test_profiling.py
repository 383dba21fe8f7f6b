"""utils/profiling: peak-spec lookup precedence, StepTimer, xla_cost."""
import numpy as np

from baryon_painter_tpu.utils import profiling as prof


class _Dev:
    def __init__(self, kind):
        self.device_kind = kind


def test_peak_lookup_known_kind_and_prefix():
    assert prof.device_peak_flops(_Dev("TPU v5 lite")) == 197e12
    # prefix match with longest-key preference: "TPU v4 lite ..." must not
    # be shadowed by "TPU v4"
    assert prof.device_peak_flops(_Dev("TPU v4 lite chip")) == 137.5e12
    assert prof.device_peak_bandwidth(_Dev("TPU v4 chip")) == 1228e9
    assert np.isnan(prof.device_peak_flops(_Dev("cpu")))


def test_peak_env_override_takes_precedence(monkeypatch):
    monkeypatch.setenv("BPT_PEAK_FLOPS", "1e15")
    # the override applies even for known kinds (docs/flags.md)
    assert prof.device_peak_flops(_Dev("TPU v5 lite")) == 1e15
    assert prof.device_peak_flops(_Dev("unknown")) == 1e15


def test_step_timer_summary_empty_and_filled():
    t = prof.StepTimer(skip_first=1)
    assert t.summary() == {"n": 0, "mean_ms": 0.0, "p50_ms": 0.0,
                           "p95_ms": 0.0, "max_ms": 0.0}
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert s["n"] == 2  # skip_first dropped one
    assert s["max_ms"] >= s["p50_ms"] >= 0


class _Compiled:
    def __init__(self, ret):
        self._ret = ret

    def cost_analysis(self):
        if isinstance(self._ret, Exception):
            raise self._ret
        return self._ret


def test_xla_cost_shapes():
    fl, by = prof.xla_cost(_Compiled({"flops": 7.0, "bytes accessed": 3.0}))
    assert (fl, by) == (7.0, 3.0)
    # some backends wrap the dict in a 1-list
    fl, by = prof.xla_cost(_Compiled([{"flops": 5.0}]))
    assert fl == 5.0 and np.isnan(by)
    fl, by = prof.xla_cost(_Compiled(RuntimeError("unavailable")))
    assert np.isnan(fl) and np.isnan(by)
