"""Every committed checkpoint must carry machine-readable provenance.

The repo's standard (trained_models/README.md "Re-evaluate / reuse"):
each non-archived checkpoint directory ships a one-command re-evaluable
``fidelity_report.json``. VERDICT r4 weak 4 found the round-4 additions
violating it (gate numbers living only in READMEs) — this test makes the
contract structural: a future checkpoint commit without a report fails CI.

Rules enforced per directory under trained_models/ (excluding archive/)
that contains a ``model_state.msgpack``:

  1. ``fidelity_report.json`` exists and parses, with a boolean
     ``pass_5pct`` and numeric per-leg gate data.
  2. If ``pass_5pct`` is false, the directory is explicitly labeled
     non-passing: its name ends in ``-wip`` or its README contains a
     "NOT gate-passing" / "near-gate" marker — a silent failing
     checkpoint cannot masquerade as a flagship.
  3. ``model_meta.json`` exists (the self-describing checkpoint half).
"""
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODELS_ROOT = os.path.join(REPO, "trained_models")


def checkpoint_dirs():
    found = []
    for root, dirs, files in os.walk(MODELS_ROOT):
        if "archive" in os.path.relpath(root, MODELS_ROOT).split(os.sep):
            continue
        if "model_state.msgpack" in files:
            found.append(root)
    return sorted(found)


CKPTS = checkpoint_dirs()


def test_found_checkpoints():
    # the committed flagships must be discoverable (guards the walker)
    names = {os.path.relpath(d, MODELS_ROOT) for d in CKPTS}
    assert any(n.startswith("CVAE") for n in names), names
    assert any(n.startswith("CGAN") for n in names), names


@pytest.mark.parametrize("ckpt", CKPTS,
                         ids=[os.path.relpath(d, MODELS_ROOT)
                              for d in CKPTS])
def test_checkpoint_has_provenance(ckpt):
    meta = os.path.join(ckpt, "model_meta.json")
    assert os.path.exists(meta), f"{ckpt}: missing model_meta.json"
    with open(meta) as f:
        json.load(f)

    report_path = os.path.join(ckpt, "fidelity_report.json")
    assert os.path.exists(report_path), (
        f"{ckpt}: missing fidelity_report.json — every non-archive "
        f"checkpoint needs a committed, re-evaluable gate report "
        f"(scripts/fidelity_check.py --eval-only, or "
        f"scripts/promote_checkpoint.py)")
    with open(report_path) as f:
        report = json.load(f)
    assert isinstance(report.get("pass_5pct"), bool), (
        f"{ckpt}: fidelity_report.json lacks a boolean pass_5pct")
    # a gate number must be recoverable from the report (worst-bin or
    # per-leg max of auto/cross fractional errors)
    has_number = any(
        isinstance(report.get(k), (int, float))
        for k in ("auto", "cross", "gate", "worst_bin"))
    assert has_number or report.get("per_z_by_dtype"), (
        f"{ckpt}: fidelity_report.json carries no numeric gate data")

    if not report["pass_5pct"]:
        name = os.path.basename(ckpt)
        readme = os.path.join(ckpt, "README.md")
        labeled = name.endswith("-wip")
        if not labeled and os.path.exists(readme):
            text = open(readme).read().lower()
            labeled = ("not gate-passing" in text or "near-gate" in text)
        assert labeled, (
            f"{ckpt}: gate-failing checkpoint must be labeled -wip or "
            f"carry a README marking it NOT gate-passing")
