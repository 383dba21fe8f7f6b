"""Rotation of periodic training checkpoints (train/checkpoint.py
rotate_checkpoints): keep the newest K, never touch non-periodic files."""
import os

from baryon_painter_tpu.train.checkpoint import rotate_checkpoints


def _mk(directory, sample):
    base = f"checkpoint_sample{sample:0>10}"
    for suffix in ("_state.msgpack", "_meta.json"):
        with open(os.path.join(directory, base + suffix), "w") as f:
            f.write("x")
    return base


def test_keeps_newest_k(tmp_path):
    d = str(tmp_path)
    bases = [_mk(d, s) for s in (1000, 2000, 10000, 500)]
    deleted = rotate_checkpoints(d, keep=2)
    # zero-padded names sort by sample count: 500 and 1000 go
    assert deleted == sorted(bases)[:2]
    left = sorted(f for f in os.listdir(d) if f.endswith("_state.msgpack"))
    assert left == ["checkpoint_sample0000002000_state.msgpack",
                    "checkpoint_sample0000010000_state.msgpack"]
    # meta files of the deleted pair are gone too
    assert not any(f.endswith("_meta.json") and "0000000500" in f
                   for f in os.listdir(d))


def test_keep_zero_is_noop(tmp_path):
    d = str(tmp_path)
    _mk(d, 1)
    _mk(d, 2)
    assert rotate_checkpoints(d, keep=0) == []
    assert len(os.listdir(d)) == 4


def test_ignores_final_and_foreign_files(tmp_path):
    d = str(tmp_path)
    _mk(d, 1)
    _mk(d, 2)
    for name in ("model_state.msgpack", "model_meta.json",
                 "training_stats.txt"):
        with open(os.path.join(d, name), "w") as f:
            f.write("x")
    rotate_checkpoints(d, keep=1)
    names = set(os.listdir(d))
    assert {"model_state.msgpack", "model_meta.json",
            "training_stats.txt"} <= names
    assert "checkpoint_sample0000000002_state.msgpack" in names
    assert "checkpoint_sample0000000001_state.msgpack" not in names


def test_fewer_than_keep(tmp_path):
    d = str(tmp_path)
    _mk(d, 1)
    assert rotate_checkpoints(d, keep=5) == []
    assert len(os.listdir(d)) == 2
