"""Dataset tests: bijective indexing, dihedral group, batch assembly,
transform round-trips (the coverage the reference lacked, SURVEY §4)."""
import numpy as np
import pytest

from baryon_painter_tpu.data.dataset import (BahamasTileDataset, BatchLoader,
                                             load_file_info,
                                             slics_scale_factor)
from baryon_painter_tpu.data.indexing import (IndexScheme, dihedral_transform)
from baryon_painter_tpu.data.synthetic import make_synthetic_stacks
from baryon_painter_tpu.transforms import RangeCompress


@pytest.fixture(scope="module")
def stacks(tmp_path_factory):
    root = tmp_path_factory.mktemp("stacks")
    info = make_synthetic_stacks(str(root), n_stack=3, n_grid=64,
                                 redshifts=(0.0, 0.5, 1.0))
    return str(root), info


def make_dataset(stacks, **kw):
    root, info = stacks
    defaults = dict(files=load_file_info(info), root_path=root, n_tile=2,
                    transforms={"dm": RangeCompress("shift-log", 4.0),
                                "pressure": RangeCompress("shift-log", 4.0)})
    defaults.update(kw)
    return BahamasTileDataset(**defaults)


# --------------------------------------------------------------------- #
# Index scheme
# --------------------------------------------------------------------- #

def test_index_scheme_bijective():
    sch = IndexScheme(n_z=3, n_perm=8, n_stack=2, n_tile=2)
    assert sch.n_sample == 2 ** 2 * 2 ** 4 * 8 ** 2
    idx = np.arange(sch.n_total)
    s = sch.decode(idx)
    # all digit combinations hit
    assert s.z.max() == 2 and s.p100.max() == 7 and s.tx150.max() == 1
    rt = sch.encode(s)
    np.testing.assert_array_equal(rt, idx)
    # every (stack, tile) pair of the 100-stack is addressed (quirk-1 fix)
    combos = set(zip(s.s100.tolist(), s.tx100.tolist(), s.ty100.tolist()))
    assert len(combos) == 2 * 2 * 2


def test_index_out_of_range():
    sch = IndexScheme(n_z=1, n_perm=1, n_stack=1, n_tile=2)
    with pytest.raises(IndexError):
        sch.decode(sch.n_total)


def test_dihedral_group_complete(rng):
    tile = rng.standard_normal((6, 6)).astype(np.float32)
    images = [dihedral_transform(tile, p).tobytes() for p in range(8)]
    assert len(set(images)) == 8  # all 8 symmetries distinct (quirk-2 fix)


# --------------------------------------------------------------------- #
# Dataset behavior
# --------------------------------------------------------------------- #

def test_construction_and_getitem(stacks):
    ds = make_dataset(stacks)
    assert ds.fields == ["dm", "pressure"]
    assert ds.redshifts == [0.0, 0.5, 1.0]
    assert ds.tile_size == 32
    d, idx, z = ds[17]
    assert isinstance(d, list) and len(d) == 2
    assert d[0].shape == (32, 32)
    assert z in ds.redshifts


def test_field_and_redshift_selection(stacks):
    ds = make_dataset(stacks, label_fields=["pressure"], redshifts=[0.0, 1.0])
    assert ds.label_fields == ["pressure"]
    assert ds.redshifts == [0.0, 1.0]
    with pytest.raises(ValueError):
        make_dataset(stacks, label_fields=["nope"])
    with pytest.raises(ValueError):
        make_dataset(stacks, redshifts=[0.25])


def test_train_val_split_no_overlap(stacks):
    train = make_dataset(stacks, n_stack=2, stack_offset=1)
    val = make_dataset(stacks, n_stack=1, stack_offset=0)
    assert train.n_stack == 2 and val.n_stack == 1
    with pytest.raises(ValueError):
        make_dataset(stacks, n_stack=3, stack_offset=1)


def test_sample_is_sum_of_depths(stacks):
    """d = d_100 + d_150 (datasets.py:344) with SLICS scaling on input."""
    ds = make_dataset(stacks)
    idx = 5
    s = ds.scheme.decode(idx)
    z = ds.redshifts[int(s.z)]
    t = ds.tile_size
    d100 = np.asarray(ds.data["dm"][z]["100"])[int(s.s100),
                                               int(s.tx100) * t:(int(s.tx100) + 1) * t,
                                               int(s.ty100) * t:(int(s.ty100) + 1) * t]
    d150 = np.asarray(ds.data["dm"][z]["150"])[int(s.s150),
                                               int(s.tx150) * t:(int(s.tx150) + 1) * t,
                                               int(s.ty150) * t:(int(s.ty150) + 1) * t]
    want = (d100 + d150) * slics_scale_factor(ds.n_grid)
    got = ds.get_input_sample(idx, transform=False)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_transform_round_trip_through_dataset(stacks):
    """inv(transform(x)) == x within 2e-5*sigma (test_dataset.py:80-83)."""
    ds = make_dataset(stacks)
    idx = 12
    z = ds.sample_idx_to_redshift(idx)
    raw = ds.get_input_sample(idx, transform=False)
    tr = ds.get_input_sample(idx, transform=True)
    rec = np.asarray(ds.inverse_transform(tr, "dm", z))
    _, var = ds.stats["dm"].at_z(z)
    atol = 2e-5 * np.sqrt(float(var)) * 10
    np.testing.assert_allclose(rec, raw, atol=atol, rtol=1e-3)


def test_raw_batch_matches_single_sample(stacks):
    ds = make_dataset(stacks, tile_permutations=True)
    idx = np.array([3, 1000, 54321]) % len(ds)
    raw = ds.get_raw_batch(idx)
    assert raw["input"].shape == (3, 32, 32)
    assert raw["labels"].shape == (1, 3, 32, 32)
    for i, ix in enumerate(idx):
        np.testing.assert_allclose(raw["input"][i],
                                   ds.get_input_sample(int(ix), transform=False),
                                   rtol=1e-6)
        np.testing.assert_allclose(raw["labels"][0, i],
                                   ds.get_label_sample(int(ix), transform=False)[0],
                                   rtol=1e-6)
        assert raw["z"][i] == ds.sample_idx_to_redshift(int(ix))


def test_get_batch_parity_shape(stacks):
    ds = make_dataset(stacks)
    fields, idx, z = ds.get_batch(size=4, rng=np.random.default_rng(0))
    assert fields.shape == (2, 4, 1, 32, 32)
    assert idx.shape == (4,) and z.shape == (4,)


def test_get_batch_fixed_z(stacks):
    ds = make_dataset(stacks)
    _, idx, z = ds.get_batch(size=6, z=0.5, rng=np.random.default_rng(0))
    assert np.all(z == 0.5)
    assert np.all(ds.scheme.z_index(idx) == ds.redshifts.index(0.5))


def test_sampling_uniform_over_z(stacks):
    """quirk-3 fix: unspecified z samples all redshifts ~uniformly."""
    ds = make_dataset(stacks, tile_permutations=True)
    rng = np.random.default_rng(1)
    idx = ds.sample_indices(rng, 3000)
    zi = ds.scheme.z_index(idx)
    counts = np.bincount(zi, minlength=3)
    assert np.all(counts > 700)


def test_batch_loader(stacks):
    ds = make_dataset(stacks)
    loader = BatchLoader(ds, batch_size=4, seed=0)
    try:
        b1 = next(loader)
        b2 = next(loader)
        assert b1["input"].shape == (4, 32, 32)
        assert not np.array_equal(b1["idx"], b2["idx"])
    finally:
        loader.close()
