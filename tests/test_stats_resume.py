"""TrainingStats resume: orphaned-row truncation (crash-after-flush)."""
import os

from baryon_painter_tpu.train.stats import TrainingStats, parse_stats_file


def _fill(path, n_rows, terms=("ELBO", "KL_term")):
    s = TrainingStats(terms, dump_to_file_frequency=1, stats_filename=path)
    for i in range(n_rows):
        s.push_loss((i + 1) * 10, -float(i), -1.0)
    s.flush_to_file()
    return s


def test_resume_drops_rows_past_checkpoint(tmp_path):
    """A crashed run flushes rows past its last checkpoint; resuming from
    the checkpoint must not replay that orphaned segment (it would be
    trained again and appear twice)."""
    path = str(tmp_path / "training_stats.txt")
    _fill(path, 10)  # rows at samples 10..100; checkpoint was at 60

    s = TrainingStats(("ELBO", "KL_term"), dump_to_file_frequency=1,
                      stats_filename=path, resume=True, resume_up_to=60)
    assert s.n_processed_samples == [10, 20, 30, 40, 50, 60]
    # the on-disk file was rewritten without the orphaned tail
    _, samples, rows = parse_stats_file(path)
    assert samples == [10, 20, 30, 40, 50, 60]

    # replaying the 60->100 segment appends monotonically
    for i in range(6, 10):
        s.push_loss((i + 1) * 10, -float(i), -1.0)
    s.flush_to_file()
    _, samples, _ = parse_stats_file(path)
    assert samples == [(i + 1) * 10 for i in range(10)]


def test_resume_without_up_to_keeps_everything(tmp_path):
    path = str(tmp_path / "training_stats.txt")
    _fill(path, 5)
    s = TrainingStats(("ELBO", "KL_term"), stats_filename=path, resume=True)
    assert len(s.n_processed_samples) == 5
