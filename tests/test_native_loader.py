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
