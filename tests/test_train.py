"""Training-layer tests: loss parity vs torch functionals, optimizer
behaviour, masked nonfinite skipping, and a short learning smoke run."""

import numpy as np
import pytest

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import torch

from biear_tpu.models import BiEARConfig, build_model_active, active_forward
from biear_tpu.train import (
    unpack_targets, task_loss, q_regularizers, sanitize_x3, sanitize_wav,
    make_optimizer, PlateauScheduler, TrainHyper,
    make_train_step, make_eval_step, is_better_tuple,
)

B = 4


def _fake_targets(rng, B):
    """Random but structurally valid y (B, 56)."""
    y = np.zeros((B, 8, 7), np.float32)
    y[:, :, 2] = 1.0  # default no-source one-hot
    for b in range(B):
        for s in rng.choice(8, size=rng.integers(1, 4), replace=False):
            y[b, s, 0] = 1.0
            y[b, s, 1] = rng.uniform(0, 1)
            y[b, s, 2:] = 0.0
            y[b, s, 2 + rng.integers(1, 5)] = 1.0
    return y.reshape(B, 56)


def test_unpack_targets_matches_strided_layout(rng):
    y = _fake_targets(rng, B)
    ys, ya, yd = unpack_targets(jnp.asarray(y))
    for k in range(8):
        np.testing.assert_array_equal(np.asarray(ys[:, k]), y[:, 7 * k])
        np.testing.assert_array_equal(np.asarray(ya[:, k]), y[:, 7 * k + 1])
        np.testing.assert_array_equal(np.asarray(yd[:, k]),
                                      y[:, 7 * k + 2:7 * k + 7])


def test_task_loss_matches_torch(rng):
    y = _fake_targets(rng, B)
    s = rng.standard_normal((B, 8)).astype(np.float32)
    a = rng.uniform(0, 1, (B, 8)).astype(np.float32)
    d = rng.standard_normal((B, 8, 5)).astype(np.float32)

    loss, m = task_loss(jnp.asarray(s), jnp.asarray(a), jnp.asarray(d),
                        jnp.asarray(y))

    ts, ta, td = (torch.tensor(v) for v in (s, a, d))
    ty = torch.tensor(y)
    ys = torch.stack([ty[:, 7 * k] for k in range(8)], 1)
    yaoa = torch.stack([ty[:, 7 * k + 1] for k in range(8)], 1)
    ydist = torch.stack([ty[:, 7 * k + 2:7 * k + 7] for k in range(8)], 1)
    bce = torch.nn.BCEWithLogitsLoss(pos_weight=torch.full((8,), 3.0))
    sl1 = torch.nn.SmoothL1Loss(beta=0.02)
    ce = torch.nn.CrossEntropyLoss()
    want = (0.2 * bce(ts, ys) + 0.45 * sl1(ta, yaoa)
            + 0.35 * ce(td.reshape(-1, 5), ydist.argmax(-1).reshape(-1)))
    assert float(loss) == pytest.approx(float(want), rel=1e-5)
    # metric defs
    want_acc = ((torch.sigmoid(ts) > 0.5) == ys.bool()).float().mean()
    assert float(m["sound_acc"]) == pytest.approx(float(want_acc), abs=1e-6)
    assert float(m["aoa_mae"]) == pytest.approx(
        float((ta - yaoa).abs().mean()), rel=1e-5)


def test_q_regularizers_value(rng):
    Q = jnp.asarray(rng.uniform(1.0, 9.0, (2, 19, 100)).astype(np.float32))
    Q0 = jnp.asarray(rng.uniform(1.0, 9.0, 100).astype(np.float32))
    got = q_regularizers(Q, Q0, 1e-3, 1e-3)
    lq = np.log(np.asarray(Q) + 1e-8)
    lq0 = np.log(np.asarray(Q0) + 1e-8)[None, None]
    want = 1e-3 * ((lq - lq0) ** 2).mean() + \
        1e-3 * ((lq[:, :, 1:] - lq[:, :, :-1]) ** 2).mean()
    assert float(got) == pytest.approx(float(want), rel=1e-4)


def test_sanitizers(rng):
    x3 = rng.uniform(-20, 20, (B, 100)).astype(np.float32)
    x3[0, 0] = np.nan
    out = np.asarray(sanitize_x3(jnp.asarray(x3)))
    assert np.isfinite(out).all() and np.abs(out).max() <= 5.0
    # each row peak-normalised to <= 1 when maxabs > 1
    assert np.abs(out[1]).max() == pytest.approx(1.0, abs=1e-5)

    # int16-style wavs get rescaled
    wav = (rng.uniform(-1, 1, (B, 100)) * 30000).astype(np.float32)
    L, R = sanitize_wav(jnp.asarray(wav), jnp.asarray(wav))
    assert float(jnp.max(jnp.abs(L))) <= 1.0
    assert float(jnp.std(L)) > 0.1  # rescaled, not clipped flat

    # float wavs pass through (clamped only)
    wav2 = rng.uniform(-1.5, 1.5, (B, 100)).astype(np.float32)
    L2, _ = sanitize_wav(jnp.asarray(wav2), jnp.asarray(wav2))
    np.testing.assert_allclose(np.asarray(L2), np.clip(wav2, -1, 1), atol=1e-7)


def test_plateau_scheduler_torch_semantics():
    s = PlateauScheduler(factor=0.5, patience=2)
    vals = [1.0, 0.9, 0.91, 0.91, 0.91]  # 3 bad epochs after the best
    scales = [s.step(v) for v in vals]
    assert scales == [1.0, 1.0, 1.0, 1.0, 0.5]


def test_is_better_tuple_lexicographic():
    assert is_better_tuple((0.9, 0.1, 0.5), None)
    assert is_better_tuple((0.91, 0.2, 0.1), (0.9, 0.1, 0.5))
    assert is_better_tuple((0.9, 0.09, 0.1), (0.9, 0.1, 0.5))
    assert is_better_tuple((0.9, 0.1, 0.6), (0.9, 0.1, 0.5))
    assert not is_better_tuple((0.89, 0.01, 0.9), (0.9, 0.1, 0.5))


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = BiEARConfig(fs=1600, timesteps=4, n_fft=256, n_bands=24,
                      fmin=50.0, fmax=700.0, latent_dim=24,
                      deltaQ_mode="relative")
    key = jax.random.PRNGKey(0)
    from biear_tpu.models.biear import init_active
    params = init_active(key, cfg)
    hp = TrainHyper()
    opt = make_optimizer(params, hp)
    return cfg, params, hp, opt


def _tiny_batch(rng, cfg, B=4):
    wav = rng.uniform(-1, 1, (2, B, cfg.fs)).astype(np.float32)
    x3 = rng.uniform(-1, 1, (B, cfg.n_bands)).astype(np.float32)
    y = _fake_targets(rng, B)
    return (jnp.asarray(wav[0]), jnp.asarray(wav[1]), jnp.asarray(x3),
            jnp.asarray(y))


def _copy(tree):
    # train_step donates (params, opt_state); tests sharing the fixture
    # must hand it a private copy.
    return jax.tree.map(jnp.copy, tree)


@pytest.mark.slow
def test_train_step_learns(rng, tiny_setup):
    cfg, params, hp, opt = tiny_setup
    params = _copy(params)
    step = make_train_step(cfg, hp, opt, "active")
    opt_state = opt.init(params)
    batch = _tiny_batch(rng, cfg)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(12):
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, batch, k,
                                    jnp.float32(1.0))
        losses.append(float(m["loss"]))
        assert float(m["skipped"]) == 0.0
    assert losses[-1] < losses[0]  # overfits one batch
    assert all(np.isfinite(losses))


@pytest.mark.slow
def test_train_step_skips_poisoned_batch(rng, tiny_setup):
    cfg, params, hp, opt = tiny_setup
    params = _copy(params)
    step = make_train_step(cfg, hp, opt, "active")
    opt_state = opt.init(params)
    wavL, wavR, x3, y = _tiny_batch(rng, cfg)
    bad_y = y.at[:, :].set(jnp.nan)  # poison the targets -> nonfinite loss
    p_before = jax.tree.leaves(params)[0].copy()
    params2, opt_state2, m = step(params, opt_state, (wavL, wavR, x3, bad_y),
                                  jax.random.PRNGKey(0), jnp.float32(1.0))
    assert float(m["skipped"]) == 1.0
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(params2)[0]),
                                  np.asarray(p_before))


def test_eval_step_deterministic(rng, tiny_setup):
    cfg, params, hp, _ = tiny_setup
    ev = make_eval_step(cfg, hp, "active")
    batch = _tiny_batch(rng, cfg)
    m1 = ev(params, batch)
    m2 = ev(params, batch)
    assert float(m1["loss"]) == float(m2["loss"])


@pytest.mark.slow
def test_train_chunk_matches_per_step_path():
    """One fused lax.scan chunk == the same steps dispatched one by one
    with the same key schedule (params, opt state, and per-step metrics)."""
    import jax
    import jax.numpy as jnp

    from biear_tpu.models import BiEARConfig
    from biear_tpu.models.biear import init_active
    from biear_tpu.data.synth import (AnechoicSynthesizer,
                                      make_test_hrir_bank,
                                      make_test_segments)
    from biear_tpu.train import TrainHyper, make_optimizer
    from biear_tpu.train.loop import make_train_step, make_train_chunk

    cfg = BiEARConfig(fs=1600, timesteps=4, n_fft=256, n_bands=16,
                      fmin=50.0, fmax=700.0, latent_dim=16,
                      controller_mode="dual", deltaQ_mode="relative")
    hp = TrainHyper()
    params = init_active(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(params, hp)
    opt_state = opt.init(params)

    ir, az, dist = make_test_hrir_bank(m_per_sector=2, ir_len=64, fs=1600)
    segs = make_test_segments(n=4, seg_len=3200)
    synth = AnechoicSynthesizer(ir, az, dist, segs, fs=1600, num_lags=16)

    B, CH = 4, 3
    chunk = make_train_chunk(cfg, hp, opt, "active", synth.batch_fn(B), CH)
    step = make_train_step(cfg, hp, opt, "active")

    rng = jax.random.PRNGKey(7)
    p1, o1, ms = chunk(synth.bank,
                       jax.tree.map(jnp.copy, params),
                       jax.tree.map(jnp.copy, opt_state),
                       rng, jnp.float32(1.0))

    # replay: the chunk splits rng into CH keys, then (synth, step) per key
    p2, o2 = params, opt_state
    losses = []
    for k in jax.random.split(rng, CH):
        k_synth, k_step = jax.random.split(k)
        batch = synth.sample_batch(k_synth, B)
        p2, o2, m = step(p2, o2, batch, k_step, jnp.float32(1.0))
        losses.append(float(m["loss"]))

    np.testing.assert_allclose(np.asarray(ms["loss"]), np.asarray(losses),
                               rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_param_grads_custom_vjp_matches_autodiff(rng, tiny_setup, monkeypatch):
    """Step-level wiring check for the custom filterbank VJP with
    x_grad=False (the frontends declare the spectra off the
    differentiation path): full-model parameter gradients must match
    plain autodiff to float32 tolerance."""
    from biear_tpu.train.loop import _active_loss

    cfg, params, hp, opt = tiny_setup
    batch = _tiny_batch(rng, cfg)
    key = jax.random.PRNGKey(3)

    def grads(vjp):
        monkeypatch.setenv("BIEAR_FB_VJP", vjp)
        # eval-mode loss (no dropout) keeps both paths on the same RNG
        f = lambda p: _active_loss(p, cfg, hp, batch, key,
                                   False, "active")[0]
        return jax.grad(f)(params)

    try:
        ga = grads("autodiff")
        gc = grads("custom")
    finally:
        monkeypatch.delenv("BIEAR_FB_VJP", raising=False)
    flat_a, _ = jax.flatten_util.ravel_pytree(ga)
    flat_c, _ = jax.flatten_util.ravel_pytree(gc)
    assert np.isfinite(np.asarray(flat_a)).all()
    np.testing.assert_allclose(np.asarray(flat_c), np.asarray(flat_a),
                               rtol=5e-4, atol=5e-6)


def test_effective_remat_tracks_vjp_resolution(monkeypatch):
    """The remat gate must mirror resolve_fb_vjp exactly: remat only
    when the autodiff VJP (with its (B,N,F) residuals) will run."""
    import dataclasses
    from biear_tpu.models.frontend import _effective_remat
    from biear_tpu.ops.filterbank import _FB_VJP_AUTO_MIN_BATCH

    cfg = BiEARConfig()
    assert cfg.fb_vjp == "auto" and cfg.remat_frontend
    monkeypatch.delenv("BIEAR_FB_VJP", raising=False)
    # auto crossover: small batch -> autodiff -> remat; big -> custom -> no
    assert _effective_remat(cfg, _FB_VJP_AUTO_MIN_BATCH - 1) is True
    assert _effective_remat(cfg, _FB_VJP_AUTO_MIN_BATCH) is False
    # explicit modes override the batch
    assert _effective_remat(
        dataclasses.replace(cfg, fb_vjp="custom"), 4) is False
    assert _effective_remat(
        dataclasses.replace(cfg, fb_vjp="autodiff"), 4096) is True
    # remat_frontend=False always wins
    assert _effective_remat(
        dataclasses.replace(cfg, remat_frontend=False), 4) is False
    # env override reaches the shared resolver
    monkeypatch.setenv("BIEAR_FB_VJP", "custom")
    assert _effective_remat(cfg, 4) is False
    monkeypatch.setenv("BIEAR_FB_VJP", "bogus")
    with pytest.raises(ValueError, match="fb_vjp"):
        _effective_remat(cfg, 4)


def test_fb_x_grad_knob_restores_waveform_gradients(rng, tiny_setup,
                                                    monkeypatch):
    """Under the custom VJP, dL/dwav is exactly zero with the default
    fb_x_grad=False and nonzero (matching autodiff) with the knob on."""
    import dataclasses
    from biear_tpu.train.loop import _active_loss

    cfg, params, hp, opt = tiny_setup
    batch = _tiny_batch(rng, cfg)
    key = jax.random.PRNGKey(5)

    def wav_grad(c, vjp):
        monkeypatch.setenv("BIEAR_FB_VJP", vjp)
        f = lambda wl: _active_loss(params, c, hp,
                                    (wl, batch[1], batch[2], batch[3]),
                                    key, False, "active")[0]
        return np.asarray(jax.grad(f)(batch[0]))

    try:
        g_off = wav_grad(cfg, "custom")
        g_on = wav_grad(dataclasses.replace(cfg, fb_x_grad=True), "custom")
        g_ref = wav_grad(dataclasses.replace(cfg, fb_x_grad=True),
                         "autodiff")
    finally:
        monkeypatch.delenv("BIEAR_FB_VJP", raising=False)
    np.testing.assert_array_equal(g_off, 0.0)
    assert np.abs(g_on).max() > 0
    np.testing.assert_allclose(g_on, g_ref, rtol=5e-4, atol=1e-7)
