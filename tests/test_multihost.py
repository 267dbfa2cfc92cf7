"""Multi-host input sharding: partition correctness + a real 2-process run.

SURVEY §5 names per-host input sharding as a first-class component;
``batch_iterator(host_id, host_count)`` implements it
(data/pipeline.py:19-54). These tests pin its contract:

  * every epoch's global permutation is HOST-INDEPENDENT (same seed+epoch
    on every host), and the host slices are pairwise disjoint and cover
    the permutation exactly — skewed slicing (overlap, gap, or unequal
    beyond +-1 rows) fails loudly;
  * padding/weight semantics hold per host;
  * a genuine ``jax.process_count() == 2`` run (two local processes over
    the distributed runtime, CPU collectives) trains with per-host
    iterator slices and produces a global psum equal to the single-process
    answer — the end-to-end multi-host data path.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from biear_tpu.data.pipeline import batch_iterator


class _IndexDataset:
    """rows(sel) returns the selected indices themselves."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def rows(self, sel):
        return (np.asarray(sel, np.float32),)


def _consumed(n, bs, host_id, host_count, *, shuffle, seed=3, epoch=5,
              pad_to_full=False):
    got, weights = [], []
    for b in batch_iterator(_IndexDataset(n), bs, shuffle=shuffle, seed=seed,
                            epoch=epoch, pad_to_full=pad_to_full,
                            host_id=host_id, host_count=host_count):
        if pad_to_full:
            rows, w = b
            got.append(rows[w > 0])
            weights.append(w)
        else:
            got.append(b[0])
    return np.concatenate(got).astype(np.int64), weights


@pytest.mark.parametrize("host_count", [2, 4])
@pytest.mark.parametrize("n,bs", [(1000, 64), (997, 32)])
def test_host_slices_disjoint_cover(host_count, n, bs):
    per_host = [_consumed(n, bs, h, host_count, shuffle=True)[0]
                for h in range(host_count)]
    allrows = np.concatenate(per_host)
    # disjoint + cover: the union is exactly 0..n-1, each once
    assert len(allrows) == n
    assert np.array_equal(np.sort(allrows), np.arange(n))
    # balanced to +-1 row
    sizes = [len(p) for p in per_host]
    assert max(sizes) - min(sizes) <= 1
    # the global permutation is host-independent: interleaving the host
    # streams reconstructs the epoch permutation every host computes
    perm = np.random.default_rng(3 + 5).permutation(n)
    for h, rows in enumerate(per_host):
        assert np.array_equal(rows, perm[h::host_count])


def test_host_slices_skew_detectable():
    """The test above must actually fail on skewed slicing: simulate an
    off-by-one host id collision and assert the overlap is caught."""
    a, _ = _consumed(200, 16, 0, 2, shuffle=True)
    b, _ = _consumed(200, 16, 0, 2, shuffle=True)   # both claim host 0
    assert len(np.intersect1d(a, b)) > 0             # overlap exists
    assert len(np.union1d(a, b)) < 200               # and rows got lost


def test_padded_tail_per_host():
    n, bs = 130, 32                   # host 0 gets 65 rows -> 2*32 + 1 tail
    rows, weights = _consumed(n, bs, 0, 2, shuffle=False, pad_to_full=True)
    assert len(rows) == 65
    assert all(len(w) == bs for w in weights)
    assert weights[-1].sum() == 1.0   # one real row in the padded tail


def test_epoch_changes_permutation():
    e0, _ = _consumed(256, 32, 0, 2, shuffle=True, epoch=0)
    e1, _ = _consumed(256, 32, 0, 2, shuffle=True, epoch=1)
    assert not np.array_equal(e0, e1)


_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


@pytest.mark.slow
def test_two_process_distributed_psum():
    """jax.process_count()==2 for real: two OS processes join a
    distributed coordinator (CPU collectives), each feeds its
    batch_iterator host slice into a global device array, and the jitted
    global mean must equal the single-process full-batch mean."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_NUM_PROCESSES", None)
    port = 29517
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), "2", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    # both workers print the same verified global mean marker
    marks = [[ln for ln in o.splitlines() if ln.startswith("GLOBAL_OK")]
             for o in outs]
    assert all(m for m in marks), "missing GLOBAL_OK marker:\n" + "\n".join(outs)
    assert marks[0] == marks[1]


_RUNNER_WORKER = os.path.join(os.path.dirname(__file__),
                              "_multihost_runner_worker.py")


def _two_process_runner(tmp_path, data_format: str, port: int):
    """Shared body of the 2-process runner smokes: pre-create the tiny
    dataset in the requested format, launch two coordinated workers, and
    assert (a) both ranks report bit-identical metric histories, (b)
    exactly one run tree exists, written by rank 0 alone — rank 1 carries
    an open/makedirs tripwire that fails the worker on any write under
    the run tree, (c) the tree holds the standard artifacts."""
    import json as json_mod
    sys.path.insert(0, os.path.dirname(__file__))
    from test_runner import _tiny_h5

    rng = np.random.default_rng(0)
    # n=13 rows over 2 hosts at local_bs=2: host 0 gets 7 rows (4 batches),
    # host 1 gets 6 (3) — exercising the all-padding batch equalization
    h5ds = _tiny_h5(tmp_path, rng, n=13)
    if data_format == "shard":
        # the one production input format for scale: both ranks host-slice
        # their reads through the native mmap loader on the SAME files
        from test_runner import _tiny_rc
        from biear_tpu.config import data_paths
        from biear_tpu.data.native_loader import write_shard
        rc = _tiny_rc(tmp_path)
        rc.data_format = "shard"
        for split, p in data_paths(rc).items():
            arrays = [a.copy() for a in h5ds[split].rows(
                np.arange(len(h5ds[split])))]
            write_shard(p, arrays, ["i16", "i16", "f32", "f32"])

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [subprocess.Popen(
        [sys.executable, _RUNNER_WORKER, str(pid), "2", str(port),
         str(tmp_path), data_format],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("runner workers timed out:\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, "missing RESULT marker:\n" + out
        results.append(json_mod.loads(lines[-1][len("RESULT "):]))
    # identical metrics on both ranks (replicated global computation)
    assert results[0] == results[1]
    assert np.isfinite(results[0]["train"][-1]["loss"])
    # exactly one run tree, owned by rank 0
    runs_root = tmp_path / "runs"
    trees = sorted(os.listdir(runs_root))
    assert len(trees) == 1, trees
    run_dir = runs_root / trees[0]
    assert str(run_dir) == results[0]["run_dir"]
    for sub in ("meta/settings.json", "logs_json/history.json",
                "logs_json/test_metrics.json", "logs_json/scalars.jsonl",
                "checkpoints/best", "checkpoints/last"):
        assert os.path.exists(run_dir / sub), sub


@pytest.mark.slow
def test_two_process_runner_smoke(tmp_path):
    """The PRODUCTION runner under jax.process_count()==2, H5 input."""
    _two_process_runner(tmp_path, "h5", port=29531)


@pytest.mark.slow
def test_two_process_runner_shard_input(tmp_path):
    """The PRODUCTION runner under jax.process_count()==2 with
    DATA_FORMAT: shard — the native mmap loader serving per-host slices
    of every global batch from the same shard files in both processes
    (the scale input path, previously tested single-process only)."""
    from biear_tpu.data.native_loader import native_available
    if not native_available():
        pytest.skip("native loader unavailable")
    _two_process_runner(tmp_path, "shard", port=29537)


@pytest.mark.parametrize("n,bs,hosts", [(13, 2, 2), (130, 32, 2), (64, 8, 4),
                                        (65, 8, 4)])
def test_equal_batch_counts_across_hosts(n, bs, hosts):
    """Under pad_to_full every host must emit the SAME number of batches
    (collective steps deadlock on ragged epoch tails otherwise); short
    hosts append all-padding batches whose weights are exactly zero."""
    counts, real_rows = [], []
    for h in range(hosts):
        nb, rows = 0, 0
        for b in batch_iterator(_IndexDataset(n), bs, shuffle=True, seed=1,
                                epoch=2, pad_to_full=True, host_id=h,
                                host_count=hosts):
            nb += 1
            rows += int(b[-1].sum())
            assert b[0].shape[0] == bs        # static shape incl. dummies
        counts.append(nb)
        real_rows.append(rows)
    assert len(set(counts)) == 1, counts      # equal everywhere
    assert sum(real_rows) == n                # padding contributes nothing
