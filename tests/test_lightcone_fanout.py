"""Tests for the multi-host lightcone fan-out driver.

The fan-out replaces the reference's SLURM array pattern
(lightcone_slurm_sbatch.sh: one process per LOS). Each process paints the
lines of sight congruent to its process index and shells out to
create_lightcone.py per LOS. These tests pin the partitioning (complete,
disjoint, round-robin) and the child-command contract without spawning
real paints.
"""
import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


@pytest.fixture()
def fanout(monkeypatch):
    sys.path.insert(0, SCRIPTS)
    try:
        import lightcone_fanout
    finally:
        sys.path.pop(0)
    calls = []
    monkeypatch.setattr(lightcone_fanout.subprocess, "run",
                        lambda cmd, check: calls.append(cmd))
    return lightcone_fanout, calls


def _run(mod, argv):
    old = sys.argv
    sys.argv = ["lightcone_fanout.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def test_partition_complete_and_disjoint(fanout):
    mod, calls = fanout
    los = [str(i) for i in range(74, 84)]
    seen = []
    for pid in range(3):
        calls.clear()
        _run(mod, ["--los", *los, "--num-processes", "3",
                   "--process-id", str(pid)])
        mine = [int(c[c.index("--SLICS-LOS") + 1]) for c in calls]
        # round-robin congruence, as in the SLURM array replacement
        assert mine == list(range(74, 84))[pid::3]
        seen += mine
    assert sorted(seen) == list(range(74, 84))


def test_child_command_contract(fanout):
    mod, calls = fanout
    _run(mod, ["--los", "7", "--output-base", "/tmp/ym",
               "--num-processes", "1", "--process-id", "0",
               "--SLICS-base-path", "/data/SLICS", "--n-plane", "15"])
    (cmd,) = calls
    assert cmd[0] == sys.executable
    assert cmd[1].endswith("create_lightcone.py")
    assert cmd[cmd.index("--output-file") + 1] == "/tmp/ym_LOS7"
    # unknown args pass through to create_lightcone verbatim
    assert cmd[cmd.index("--SLICS-base-path") + 1] == "/data/SLICS"
    assert cmd[cmd.index("--n-plane") + 1] == "15"


def test_single_process_defaults(fanout):
    mod, calls = fanout
    _run(mod, ["--los", "1", "2"])
    assert len(calls) == 2
