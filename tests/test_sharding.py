"""Sharded-execution correctness on the 8-device virtual CPU mesh:
data-parallel and data+model-parallel training steps must match the
single-device step numerically."""

import numpy as np
import pytest

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from biear_tpu.models.config import BiEARConfig
from biear_tpu.models.biear import init_active
from biear_tpu.parallel.mesh import make_mesh, batch_sharding, param_pspecs, shard_params
from biear_tpu.train import TrainHyper, make_optimizer, make_train_step, make_eval_step


pytestmark = [pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 virtual devices"),
              pytest.mark.slow]  # quick tier: -m 'not slow'


@pytest.fixture(scope="module")
def setup(request):
    cfg = BiEARConfig(fs=1600, timesteps=4, n_fft=256, n_bands=24,
                      fmin=50.0, fmax=700.0, latent_dim=24,
                      deltaQ_mode="relative")
    params = init_active(jax.random.PRNGKey(0), cfg)
    hp = TrainHyper()
    rng = np.random.default_rng(0)
    B = 16
    y = np.zeros((B, 8, 7), np.float32)
    y[:, :, 2] = 1.0
    for b in range(B):
        s = rng.integers(0, 8)
        y[b, s, :3] = (1.0, rng.uniform(), 0.0)
        y[b, s, 3 + rng.integers(0, 4)] = 1.0
    batch = (rng.uniform(-1, 1, (B, cfg.fs)).astype(np.float32),
             rng.uniform(-1, 1, (B, cfg.fs)).astype(np.float32),
             rng.uniform(-1, 1, (B, cfg.n_bands)).astype(np.float32),
             y.reshape(B, 56))
    return cfg, params, hp, batch


def _run_steps(cfg, params, hp, batch, mesh=None, n_steps=3):
    params = jax.tree.map(jnp.copy, params)
    if mesh is not None:
        params = shard_params(params, mesh)
        bsh = batch_sharding(mesh)
        batch = tuple(jax.device_put(np.asarray(b), bsh) for b in batch)
    else:
        batch = tuple(jnp.asarray(b) for b in batch)
    opt = make_optimizer(params, hp)
    opt_state = opt.init(params)
    step = make_train_step(cfg, hp, opt, "active")
    losses = []
    for i in range(n_steps):
        # train=False dropout is off only in eval; use a FIXED key so the
        # dropout masks are identical across mesh configurations.
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.PRNGKey(7), jnp.float32(1.0))
        losses.append(float(m["loss"]))
    ev = make_eval_step(cfg, hp, "active")
    final = float(ev(params, batch)["loss"])
    return losses, final


def test_dp_matches_single_device(setup):
    cfg, params, hp, batch = setup
    base_losses, base_final = _run_steps(cfg, params, hp, batch, mesh=None)
    mesh = make_mesh(8, 1)
    dp_losses, dp_final = _run_steps(cfg, params, hp, batch, mesh=mesh)
    np.testing.assert_allclose(dp_losses, base_losses, rtol=2e-4)
    np.testing.assert_allclose(dp_final, base_final, rtol=2e-4)


def test_dp_tp_matches_single_device(setup):
    cfg, params, hp, batch = setup
    base_losses, base_final = _run_steps(cfg, params, hp, batch, mesh=None)
    mesh = make_mesh(4, 2)
    tp_losses, tp_final = _run_steps(cfg, params, hp, batch, mesh=mesh)
    np.testing.assert_allclose(tp_losses, base_losses, rtol=2e-4)
    np.testing.assert_allclose(tp_final, base_final, rtol=2e-4)


def test_param_pspecs_structure(setup):
    cfg, params, hp, _ = setup
    specs = param_pspecs(params, True)
    assert specs["subheads"]["shared"]["w"] == P("model", None, None)
    assert specs["body"]["l1"]["w"] == P("model", None)
    assert specs["body"]["l2"]["w"] == P(None, "model")
    assert specs["encoder_ild"]["gru1"]["w_ih"] == P()
    # replicated spec tree for DP-only
    flat = jax.tree.leaves(param_pspecs(params, False),
                           is_leaf=lambda x: isinstance(x, P))
    assert all(s == P() for s in flat)


def test_sharded_synthesizer(setup):
    """The synthesizer runs under a mesh too (batch split over data)."""
    from biear_tpu.data import AnechoicSynthesizer, make_test_hrir_bank, make_test_segments
    ir, az, dist = make_test_hrir_bank()
    s = AnechoicSynthesizer(ir, az, dist, make_test_segments(4), fs=16000)
    out = s.sample_batch(jax.random.PRNGKey(0), 16)
    assert out[0].shape == (16, 16000)
    assert bool(jnp.all(jnp.isfinite(out[0])))


def test_synth_output_sharding(setup):
    """set_output_sharding: sampler outputs come back committed to the
    data-axis batch sharding (no implicit reshard before the train step),
    and the numbers are identical to the unsharded sampler."""
    from biear_tpu.data import (AnechoicSynthesizer, make_test_hrir_bank,
                                make_test_segments)
    from biear_tpu.parallel.mesh import batch_sharding
    ir, az, dist = make_test_hrir_bank()
    s = AnechoicSynthesizer(ir, az, dist, make_test_segments(4), fs=16000)
    plain = s.sample_batch(jax.random.PRNGKey(0), 8)
    mesh = make_mesh(4, 2)
    bsh = batch_sharding(mesh)
    s.set_output_sharding(bsh)
    sharded = s.sample_batch(jax.random.PRNGKey(0), 8)
    for p, q in zip(plain, sharded):
        assert q.sharding.is_equivalent_to(bsh, q.ndim)
        np.testing.assert_allclose(np.asarray(p), np.asarray(q), atol=1e-6)


def test_batch_iterator_host_sharding_covers_all_rows():
    """Multi-host input sharding: hosts see disjoint slices whose union is
    the full (permuted) epoch — with pad_to_full weights marking padding."""
    from biear_tpu.data.pipeline import batch_iterator

    class DS:
        def __init__(self, n):
            self.x = np.arange(n, dtype=np.float32)[:, None]
        def __len__(self):
            return len(self.x)
        def rows(self, sel):
            return (self.x[sel],)

    ds = DS(21)
    seen = []
    for hid in range(4):
        for b in batch_iterator(ds, 4, shuffle=True, seed=7, epoch=3,
                                pad_to_full=True, host_id=hid,
                                host_count=4):
            rows, w = b
            assert rows.shape[0] == 4 and w.shape == (4,)
            seen.extend(rows[w > 0.5, 0].astype(int).tolist())
    assert sorted(seen) == list(range(21))


# ---------- production dispatch shapes on the mesh (round-3 VERDICT #4) ----------

def _synth_and_cfg():
    from biear_tpu.data.synth import (AnechoicSynthesizer,
                                      make_test_hrir_bank,
                                      make_test_segments)
    cfg = BiEARConfig(fs=1600, timesteps=4, n_fft=256, n_bands=16,
                      fmin=50.0, fmax=700.0, latent_dim=16,
                      controller_mode="dual", deltaQ_mode="relative")
    ir, az, dist = make_test_hrir_bank(m_per_sector=2, ir_len=64, fs=1600)
    segs = make_test_segments(n=4, seg_len=3200)
    synth = AnechoicSynthesizer(ir, az, dist, segs, fs=1600, num_lags=16)
    return cfg, synth


def test_train_chunk_matches_on_mesh():
    """make_train_chunk — the dispatch shape production actually runs
    (fused synthesize->train lax.scan) — must produce the same params and
    per-step losses under data=4 x model=2 sharding as on one device.
    The synthesizer emits mesh-sharded batches via set_output_sharding,
    exactly as train/runner.py wires it."""
    from biear_tpu.train.loop import make_train_chunk
    from biear_tpu.train import make_optimizer

    cfg, synth = _synth_and_cfg()
    hp = TrainHyper()
    params0 = init_active(jax.random.PRNGKey(0), cfg)
    B, CH = 8, 2
    rng = jax.random.PRNGKey(7)

    def run(mesh):
        params = jax.tree.map(jnp.copy, params0)
        if mesh is not None:
            params = shard_params(params, mesh)
            synth.set_output_sharding(batch_sharding(mesh))
        else:
            synth.set_output_sharding(None)
        opt = make_optimizer(params, hp)
        opt_state = opt.init(params)
        chunk = make_train_chunk(cfg, hp, opt, "active",
                                 synth.batch_fn(B), CH)
        p, o, ms = chunk(synth.bank, params, opt_state, rng,
                         jnp.float32(1.0))
        return p, np.asarray(ms["loss"])

    try:
        p_base, l_base = run(None)
        p_mesh, l_mesh = run(make_mesh(4, 2))
    finally:
        synth.set_output_sharding(None)
    np.testing.assert_allclose(l_mesh, l_base, rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_mesh), jax.tree.leaves(p_base)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_eval_chunk_matches_on_mesh():
    """make_eval_chunk (stacked same-shape eval batches in one scanned
    dispatch) under data+model sharding == single-device."""
    from biear_tpu.train.loop import make_eval_chunk

    cfg, synth = _synth_and_cfg()
    hp = TrainHyper()
    params0 = init_active(jax.random.PRNGKey(0), cfg)
    B, NB = 8, 3
    batches = [synth.sample_batch(jax.random.PRNGKey(100 + i), B)
               for i in range(NB)]
    stacked = tuple(jnp.stack([b[j] for b in batches]) for j in range(4))

    ev = make_eval_chunk(cfg, hp, "active")
    base = ev(params0, stacked)

    mesh = make_mesh(4, 2)
    params_m = shard_params(jax.tree.map(jnp.copy, params0), mesh)
    bsh = NamedSharding(mesh, P(None, "data"))   # batch axis is dim 1 here
    stacked_m = tuple(jax.device_put(np.asarray(x), bsh) for x in stacked)
    ev_m = make_eval_chunk(cfg, hp, "active")
    got = ev_m(params_m, stacked_m)
    np.testing.assert_allclose(np.asarray(got["loss"]),
                               np.asarray(base["loss"]),
                               rtol=2e-4, atol=1e-6)


def test_param_pspecs_unknown_key_fails_loudly():
    """A param tree with a top-level key the partitioner doesn't know must
    raise under model parallelism (silent replication of a new subsystem
    would quietly forfeit its sharding), and keep replicating under pure
    data parallelism."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    tree = {"body": {"l1": {"w": jnp.zeros((4, 4)), "b": jnp.zeros(4)},
                     "l2": {"w": jnp.zeros((4, 4)), "b": jnp.zeros(4)},
                     "l3": {"w": jnp.zeros((4, 4)), "b": jnp.zeros(4)}},
            "mystery_subsystem": {"w": jnp.zeros((4, 4))}}
    with pytest.raises(ValueError, match="mystery_subsystem"):
        param_pspecs(tree, True)
    specs = param_pspecs(tree, False)   # DP-only: replicate everything
    assert all(s == P() for s in jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, P)))
