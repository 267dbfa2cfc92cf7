"""Worker for test_multihost.test_two_process_runner_smoke (+ shard variant).

Usage: python _multihost_runner_worker.py <pid> <nproc> <port> <workdir> \
           [h5|shard]

Joins the jax.distributed coordinator, then runs the REAL production
runner (biear_tpu.train.runner.train) for two tiny epochs over the H5
files the parent test pre-created in <workdir>, with the global batch
assembled from per-host iterator slices. With the "shard" format the
runner's production _open_datasets path resolves DATA_FORMAT: shard and
every rank reads its host-slice of each batch through the native mmap
loader against the same shard files (page-cache shared across
processes).

Multi-process write discipline is enforced with a tripwire: on non-main
ranks, ANY attempt to open-for-write or makedirs under the run tree
raises — so a regression that un-gates a checkpoint/log/history write
fails this worker loudly instead of silently double-writing.

Prints ``RESULT <json>`` with the full metric history on success; the
parent asserts the two ranks' lines are identical (metrics are computed
from replicated global values, so they must match bit-for-bit).
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    work = sys.argv[4]
    data_format = sys.argv[5] if len(sys.argv) > 5 else "h5"

    # a hang anywhere (a rank missing a collective) must diagnose itself:
    # dump all thread stacks and die instead of absorbing the test timeout
    import faulthandler
    faulthandler.dump_traceback_later(
        int(os.environ.get("WORKER_HANG_S", "420")), exit=True)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc and jax.process_index() == pid

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)

    runs_root = os.path.join(work, "runs")
    if pid != 0:
        import builtins
        real_open = builtins.open
        real_makedirs = os.makedirs

        def guarded_open(file, mode="r", *a, **k):
            if (isinstance(file, (str, os.PathLike))
                    and str(file).startswith(runs_root)
                    and any(c in str(mode) for c in "wxa+")):
                raise AssertionError(
                    f"non-main rank {pid} wrote {file} mode={mode}")
            return real_open(file, mode, *a, **k)

        def guarded_makedirs(name, *a, **k):
            if str(name).startswith(runs_root):
                raise AssertionError(
                    f"non-main rank {pid} makedirs {name}")
            return real_makedirs(name, *a, **k)

        builtins.open = guarded_open
        os.makedirs = guarded_makedirs

    from pathlib import Path
    from test_runner import _tiny_rc
    from biear_tpu.train.runner import train

    rc = _tiny_rc(Path(work))
    if data_format == "shard":
        # datasets=None -> the production _open_datasets resolves
        # DATA_FORMAT: shard onto ShardDataset over the parent-written
        # shard files at data_paths(rc)
        rc.data_format = "shard"
        ds = None
    else:
        from biear_tpu.data import ActiveH5Dataset
        ds = {split: ActiveH5Dataset(os.path.join(work, f"{split}.h5"))
              for split in ("train", "val", "test")}
    out = train(rc, datasets=ds, quiet=True, run_id="MP", seed=0)

    def strip_sec(h):        # wall-clock differs per rank; metrics must not
        return [{k: v for k, v in d.items() if k != "sec"} for d in h]

    print("RESULT " + json.dumps(
        {"val": strip_sec(out["history"]["val"]),
         "train": strip_sec(out["history"]["train"]),
         "test": strip_sec([out["test"]]), "best": list(out["best_tuple"]),
         "run_dir": out["run_dir"]}, sort_keys=True))


if __name__ == "__main__":
    main()
