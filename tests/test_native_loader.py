"""Native C++ shard loader: build, roundtrip, decode, edge cases."""

import subprocess

import numpy as np
import pytest

from biear_tpu.data.native_loader import (write_shard, ShardDataset,
                                          native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain available")


@pytest.fixture
def shard(tmp_path, rng):
    wav = rng.uniform(-1, 1, (10, 64)).astype(np.float32)
    feat = rng.standard_normal((10, 3, 5)).astype(np.float32)
    y = rng.standard_normal((10, 7)).astype(np.float32)
    p = str(tmp_path / "s.bin")
    write_shard(p, [wav, feat, y], ["i16", "f32", "f32"])
    return p, wav, feat, y


def test_roundtrip_and_i16_decode(shard):
    p, wav, feat, y = shard
    ds = ShardDataset(p, shapes=[(64,), (3, 5), (7,)])
    assert len(ds) == 10 and ds.n_fields == 3
    rows = ds.rows(np.array([3, 0, 9, 3]))
    assert rows[0].shape == (4, 64) and rows[1].shape == (4, 3, 5)
    # i16 quantisation: within one LSB of the original
    np.testing.assert_allclose(rows[0], wav[[3, 0, 9, 3]], atol=1.0 / 32000)
    np.testing.assert_array_equal(rows[1], feat[[3, 0, 9, 3]])
    np.testing.assert_array_equal(rows[2], y[[3, 0, 9, 3]])
    ds.close()


def test_out_of_range_rows_zero_fill(shard):
    p, wav, *_ = shard
    ds = ShardDataset(p, shapes=[(64,), (3, 5), (7,)])
    rows = ds.rows(np.array([0, 99, -1]))
    assert np.all(rows[0][1] == 0.0) and np.all(rows[0][2] == 0.0)
    np.testing.assert_allclose(rows[0][0], wav[0], atol=1.0 / 32000)


def test_bad_file_rejected(tmp_path):
    p = str(tmp_path / "junk.bin")
    with open(p, "wb") as f:
        f.write(b"not a shard at all, definitely " * 4)
    with pytest.raises(OSError):
        ShardDataset(p)


def test_pipeline_integration(shard):
    from biear_tpu.data import batch_iterator
    p, wav, *_ = shard
    ds = ShardDataset(p, shapes=[(64,), (3, 5), (7,)])
    seen = 0
    for batch in batch_iterator(ds, 4, shuffle=True, seed=0):
        seen += batch[0].shape[0]
        assert batch[0].dtype == np.float32
    assert seen == 10


def test_h5_to_shard_tool(tmp_path, rng):
    from biear_tpu.data import save_active_h5
    h5p = str(tmp_path / "a.h5")
    wav = rng.uniform(-1, 1, (6, 128)).astype(np.float32)
    x3 = rng.standard_normal((6, 100)).astype(np.float32)
    y = rng.standard_normal((6, 56)).astype(np.float32)
    save_active_h5(h5p, wav, wav, x3, y)
    shp = str(tmp_path / "a.bin")
    r = subprocess.run(["python", "tools/h5_to_shard.py", h5p, shp],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    ds = ShardDataset(shp, shapes=[(128,), (128,), (100,), (56,)])
    rows = ds.rows([2])
    np.testing.assert_allclose(rows[0][0], wav[2], atol=1.0 / 32000)
    np.testing.assert_array_equal(rows[3][0], y[2])

def test_shape_validation_fails_loudly(shard):
    p, *_ = shard
    with pytest.raises(ValueError, match="wrong schema"):
        ShardDataset(p, shapes=[(64,), (3, 5)])          # field count
    with pytest.raises(ValueError, match="does not match"):
        ShardDataset(p, shapes=[(64,), (3, 5), (8,)])    # per-row elems


def test_data_paths_and_open_datasets(tmp_path, rng):
    """DATA_FORMAT: shard routes the production runner onto ShardDataset."""
    from biear_tpu.config import load_run_config, data_paths
    from biear_tpu.train.runner import _open_datasets
    rc = load_run_config("/root/repo/conf/config.yaml")
    rc.root = str(tmp_path)
    rc.data_format = "shard"
    paths = data_paths(rc)
    assert paths["train"].endswith("anechoic_train_active_wav.shard")
    fs, bands = rc.model_cfg.fs, rc.model_cfg.n_bands
    for p in paths.values():
        write_shard(p, [rng.uniform(-1, 1, (3, fs)).astype(np.float32),
                        rng.uniform(-1, 1, (3, fs)).astype(np.float32),
                        rng.standard_normal((3, bands)).astype(np.float32),
                        rng.standard_normal((3, 56)).astype(np.float32)],
                    ["i16", "i16", "f32", "f32"])
    ds = _open_datasets(rc)
    assert set(ds) == {"train", "val", "test"}
    assert isinstance(ds["train"], ShardDataset) and len(ds["train"]) == 3
    rows = ds["train"].rows([0, 2])
    assert rows[0].shape == (2, fs) and rows[3].shape == (2, 56)
    # SHARD_ROOT overrides where the shards live
    rc.shard_root = str(tmp_path / "elsewhere")
    assert data_paths(rc)["val"].startswith(rc.shard_root)


@pytest.mark.slow
def test_train_runner_from_shards(tmp_path, rng):
    """Full runner epoch loop fed by the native loader (datasets=None so
    the production _open_datasets path resolves DATA_FORMAT: shard)."""
    import json
    from test_runner import _tiny_rc, _tiny_h5  # reuse the tiny fixtures
    from biear_tpu.config import data_paths
    from biear_tpu.train.runner import train

    rc = _tiny_rc(tmp_path)
    rc.data_format = "shard"
    h5ds = _tiny_h5(tmp_path, rng, fs=rc.model_cfg.fs,
                    bands=rc.model_cfg.n_bands)
    names = {"train": "train", "val": "val", "test": "test"}
    for split, p in data_paths(rc).items():
        arrays = [a.copy() for a in h5ds[names[split]].rows(
            np.arange(len(h5ds[names[split]])))]
        write_shard(p, arrays, ["i16", "i16", "f32", "f32"])
    out = train(rc, datasets=None, quiet=True, run_id="SHARD")
    with open(f"{out['run_dir']}/logs_json/history.json") as f:
        h = json.load(f)
    assert len(h["train"]) == rc.epochs
    assert np.isfinite(h["train"][-1]["loss"])


@pytest.mark.slow
def test_evaluate_from_shard(tmp_path, rng):
    """The evaluate pipeline accepts a .shard test split directly."""
    from test_runner import _tiny_rc, _tiny_h5
    from biear_tpu.train.runner import train
    from biear_tpu.train.evaluate import evaluate

    rc = _tiny_rc(tmp_path)
    rc.epochs = 1
    ds = _tiny_h5(tmp_path, rng, fs=rc.model_cfg.fs,
                  bands=rc.model_cfg.n_bands)
    out = train(rc, datasets=ds, quiet=True, run_id="EVS")
    shard = str(tmp_path / "test.shard")
    arrays = [a.copy() for a in ds["test"].rows(np.arange(len(ds["test"])))]
    write_shard(shard, arrays, ["i16", "i16", "f32", "f32"])
    res = evaluate(f"{out['run_dir']}/checkpoints/best", test_h5=shard,
                   batch_size=4, quiet=True,
                   out_path=str(tmp_path / "ev.json"))
    assert "overall" in res and np.isfinite(res["overall"]["sound_acc"])
