"""Worker for test_multihost.test_two_process_distributed_psum.

Usage: python _multihost_worker.py <process_id> <num_processes> <port>

Joins the jax.distributed coordinator on localhost, builds a 1-D 'data'
mesh over ALL processes' devices, feeds THIS host's batch_iterator slice
into a global jax.Array (make_array_from_process_local_data), and checks
a jitted global mean (which lowers to a cross-process psum) against the
full-dataset answer every process can compute locally. Prints
``GLOBAL_OK <value>`` on success.
"""

import sys

import numpy as np


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    import jax

    # the axon sitecustomize pins the TPU platform regardless of the env
    # snapshot; override through config like tests/conftest.py does
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from biear_tpu.data.pipeline import batch_iterator

    class DS:
        def __init__(self, n):
            self.vals = (np.arange(n, dtype=np.float32) * 0.5 - 3.0)

        def __len__(self):
            return len(self.vals)

        def rows(self, sel):
            return (self.vals[sel],)

    n, bs_global = 256, 64
    ds = DS(n)
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    gsh = NamedSharding(mesh, P("data"))

    @jax.jit
    def global_mean(x):
        return jnp.mean(x)

    # each process iterates ITS host slice of the same global permutation;
    # per-host batches of bs_global/nproc assemble into global batches
    it = batch_iterator(ds, bs_global // nproc, shuffle=True, seed=7,
                        epoch=0, host_id=pid, host_count=nproc)
    total, count = 0.0, 0
    for (local,) in it:
        if len(local) * nproc < bs_global:
            break                      # ragged tail: skip (drop_last shape)
        garr = jax.make_array_from_process_local_data(
            gsh, local.reshape(-1), (bs_global,))
        total += float(global_mean(garr)) * bs_global
        count += bs_global
    got = total / count
    # the permuted union over both hosts of full batches is the first
    # `count` rows of the permutation; recompute exactly:
    perm = np.random.default_rng(7 + 0).permutation(n)
    rows = np.concatenate(
        [perm[h::nproc][:count // nproc] for h in range(nproc)])
    want = float(np.mean(ds.vals[rows]))
    assert abs(got - want) < 1e-5, (got, want)
    print(f"GLOBAL_OK {got:.6f}")


if __name__ == "__main__":
    main()
