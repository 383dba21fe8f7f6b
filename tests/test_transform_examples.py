"""Hermetic test for scripts/transform_examples.py (the counterpart of the
reference's notebooks/data_transform_examples.ipynb)."""
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_transform_examples_report(tmp_path, monkeypatch, capsys):
    spec = importlib.util.spec_from_file_location(
        "transform_examples", os.path.join(REPO, "scripts",
                                           "transform_examples.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv",
                        ["transform_examples.py", "--out", str(tmp_path),
                         "--n", "64"])
    mod.main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(report["modes"]) == {"log", "shift-log", "shift-log-2p",
                                    "log-tanh", "x/(1+x)", "1/x",
                                    "split-scale"}
    for mode, r in report["modes"].items():
        if mode == "split-scale":
            assert r["recompose_max_rel_err"] < 1e-5
        else:
            assert r["roundtrip_max_rel_err"] < 1e-3, mode
    for fig in report["figures"]:
        assert (tmp_path / fig).exists()
    assert (tmp_path / "report.json").exists()
