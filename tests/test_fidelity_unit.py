"""Fast unit coverage of fidelity_check's pure helpers (no subprocess, no
jax compile) — the slow end-to-end CLI contract lives in test_fidelity_cli.py.
"""
import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "fidelity_check", os.path.join(REPO, "scripts", "fidelity_check.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


fc = _load_module()


def test_allocate_exact_static_contract():
    # the static CLI contract: batch % sum(shares) == 0 -> per-share quotas
    # are integers and the allocation equals the old per*shares arithmetic
    zs = [0.0, 0.5, 1.0]
    shares = {0.0: 1, 0.5: 2, 1.0: 1}
    counts = fc.allocate_batch_shares(48, shares, zs)
    assert counts == {0.0: 12, 0.5: 24, 1.0: 12}


def test_allocate_largest_remainder_sums_to_batch():
    zs = [0.0, 0.125, 0.25, 0.5, 1.0]
    shares = {0.0: 3, 0.125: 1, 0.25: 2, 0.5: 1, 1.0: 1}
    for batch in range(len(zs), 67):
        counts = fc.allocate_batch_shares(batch, shares, zs)
        assert sum(counts.values()) == batch
        assert all(c >= 1 for c in counts.values())
        # boosted z never receives fewer samples than an unboosted one
        assert counts[0.0] >= counts[0.125]


def test_allocate_min_one_per_z():
    # heavy boost on one z with a small batch must not starve the others
    zs = [0.0, 0.5, 1.0, 2.0]
    shares = {0.0: 50, 0.5: 1, 1.0: 1, 2.0: 1}
    counts = fc.allocate_batch_shares(6, shares, zs)
    assert sum(counts.values()) == 6
    assert all(c >= 1 for c in counts.values())
    assert counts[0.0] == 3


def test_allocate_rejects_batch_below_n_z():
    with pytest.raises(ValueError):
        fc.allocate_batch_shares(2, {0.0: 1, 0.5: 1, 1.0: 1},
                                 [0.0, 0.5, 1.0])
