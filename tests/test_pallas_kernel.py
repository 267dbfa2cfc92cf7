"""Pallas fused filterbank kernel: numerical parity with the jnp path
(forward AND gradients), run in interpreter mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from biear_tpu.ops.erb import erb_spaced_fc_and_q
from biear_tpu.ops.filterbank import filterbank_apply
from biear_tpu.ops.pallas.fb_kernel import make_fb_apply, fb_apply_pallas


@pytest.fixture(scope="module")
def grids():
    fc, Q0 = erb_spaced_fc_and_q(100, 50.0, 7200.0)
    f_fft = np.linspace(0, 8000.0, 513).astype(np.float32)
    return fc, Q0, f_fft


def _inputs(rng, Q0, B=4):
    Q = (Q0[None] * rng.uniform(0.6, 1.4, (B, 100))).astype(np.float32)
    X = (rng.standard_normal((B, 513)) + 1j * rng.standard_normal((B, 513)))
    X3 = np.stack([np.abs(X), X.real, X.imag], 1).astype(np.float32)
    return jnp.asarray(Q), jnp.asarray(X3)


def test_forward_matches_jnp_path(rng, grids):
    fc, Q0, f_fft = grids
    Q, X3 = _inputs(rng, np.asarray(Q0))
    out = fb_apply_pallas(Q, X3, fc, f_fft)            # (B, 3, N)
    Y, Zre, Zim = filterbank_apply(Q, jnp.asarray(fc), jnp.asarray(f_fft),
                                   X3[:, 0], X3[:, 1], X3[:, 2])
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(Y),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(Zre),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[:, 2]), np.asarray(Zim),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_jnp_path(rng, grids):
    fc, Q0, f_fft = grids
    Q, X3 = _inputs(rng, np.asarray(Q0), B=2)
    kernel = make_fb_apply(fc, f_fft)

    def loss_pallas(q, x):
        return jnp.sum(jnp.sin(kernel(q, x)))

    def loss_ref(q, x):
        Y, Zre, Zim = filterbank_apply(q, jnp.asarray(fc),
                                       jnp.asarray(f_fft),
                                       x[:, 0], x[:, 1], x[:, 2])
        return jnp.sum(jnp.sin(jnp.stack([Y, Zre, Zim], 1)))

    gq_p, gx_p = jax.grad(loss_pallas, argnums=(0, 1))(Q, X3)
    gq_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(Q, X3)
    np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_r),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-5)


def test_frontend_with_pallas_matches_without(rng, monkeypatch, grids):
    """Full adaptive frontend: pallas path == jnp path end to end."""
    import biear_tpu.models.frontend as fe
    from biear_tpu.models.config import BiEARConfig
    from biear_tpu.models.biear import init_active
    from biear_tpu.models import active_forward

    cfg = BiEARConfig(fs=1600, timesteps=4, n_fft=256, n_bands=24,
                      fmin=50.0, fmax=700.0, latent_dim=24,
                      deltaQ_mode="relative")
    params = init_active(jax.random.PRNGKey(0), cfg)
    # make the controller live so Q actually moves
    params["bifb"]["fb"]["q_out"]["l3"]["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), params["bifb"]["fb"]["q_out"]["l3"]["w"].shape)
    wavL = jnp.asarray(rng.uniform(-1, 1, (2, 1600)).astype(np.float32))
    wavR = jnp.asarray(rng.uniform(-1, 1, (2, 1600)).astype(np.float32))
    x3 = jnp.zeros((2, 24))

    monkeypatch.setenv("BIEAR_USE_PALLAS", "0")
    fe._fused_fb_apply.cache_clear()
    ref = active_forward(params, cfg, wavL, wavR, x3, train=False)

    monkeypatch.setenv("BIEAR_USE_PALLAS", "1")
    fe._fused_fb_apply.cache_clear()
    pal = active_forward(params, cfg, wavL, wavR, x3, train=False)
    monkeypatch.setenv("BIEAR_USE_PALLAS", "0")
    fe._fused_fb_apply.cache_clear()

    for a, b, name in zip(ref[:3], pal[:3], ("sound", "aoa", "dist")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(ref[3]["Q"]),
                               np.asarray(pal[3]["Q"]), atol=1e-4)


# ---------------- v2: chunked fwd + Pallas bwd ----------------

def test_fb2_forward_and_grads_match_jnp(rng, grids):
    from biear_tpu.ops.pallas.fb_kernel2 import make_fb_apply2

    fc, Q0, f_fft = grids
    Q, X3 = _inputs(rng, np.asarray(Q0), B=5)          # non-multiple of tile
    op = make_fb_apply2(fc, f_fft, tile_b=4)

    out = op(Q, X3)
    Y, Zre, Zim = filterbank_apply(Q, jnp.asarray(fc), jnp.asarray(f_fft),
                                   X3[:, 0], X3[:, 1], X3[:, 2])
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.stack([Y, Zre, Zim], 1)),
                               rtol=2e-5, atol=2e-5)

    def loss_pallas(q, x):
        return jnp.sum(jnp.sin(op(q, x)))

    def loss_ref(q, x):
        Y, Zr, Zi = filterbank_apply(q, jnp.asarray(fc), jnp.asarray(f_fft),
                                     x[:, 0], x[:, 1], x[:, 2])
        return jnp.sum(jnp.sin(jnp.stack([Y, Zr, Zi], 1)))

    gq_p, gx_p = jax.grad(loss_pallas, argnums=(0, 1))(Q, X3)
    gq_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(Q, X3)
    np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_r),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-5)


# ---------------- fused whole-scan-step kernel ----------------

def test_scan_step_kernel_matches_controller_step(rng, grids):
    """One fused step == filterbank_apply + controller_step, values AND
    grads (params, Q, h, X3)."""
    from biear_tpu.ops.pallas.scan_step import make_scan_step, pack_controller
    from biear_tpu.models.frontend import controller_init, controller_step
    from biear_tpu.models.config import BiEARConfig

    fc, Q0, f_fft = grids
    cfg = BiEARConfig()
    N, H = cfg.n_bands, cfg.ctrl_hidden
    p = controller_init(jax.random.PRNGKey(0), cfg, 2 * N)
    p["q_out"]["l3"]["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), p["q_out"]["l3"]["w"].shape)
    B = 6
    Q = jnp.asarray((np.asarray(Q0)[None]
                     * rng.uniform(0.6, 1.4, (B, N))).astype(np.float32))
    h = jnp.asarray(0.1 * rng.standard_normal((B, H)).astype(np.float32))
    X = rng.standard_normal((B, 513)) + 1j * rng.standard_normal((B, 513))
    X3 = jnp.asarray(np.stack([np.abs(X), X.real, X.imag], 1)
                     .astype(np.float32))
    ones = jnp.ones((B, H))
    step = make_scan_step(fc, f_fft, N, H, tile_b=4)

    def run_pallas(p_, Q_, h_, X3_):
        pp = pack_controller(p_, N, H)
        return step(pp, Q_, h_, X3_, ones, ones)

    def run_ref(p_, Q_, h_, X3_):
        Y, Zr, Zi = filterbank_apply(Q_, jnp.asarray(fc), jnp.asarray(f_fft),
                                     X3_[:, 0], X3_[:, 1], X3_[:, 2])
        Yc = jnp.log1p(jnp.maximum(Y, 0.0))
        feat = jnp.concatenate([Yc, 0.2 * jax.lax.stop_gradient(Yc)], -1)
        d, hh = controller_step(p_, cfg, h_, feat, None, False)
        return jnp.stack([Y, Zr, Zi], 1), d, hh

    out_p = run_pallas(p, Q, h, X3)
    out_r = run_ref(p, Q, h, X3)
    for a, b, name in zip(out_p, out_r, ("out3", "delta", "h")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)

    def loss(runner, p_, Q_, h_, X3_):
        o, d, hh = runner(p_, Q_, h_, X3_)
        return jnp.sum(jnp.sin(o)) + jnp.sum(d * d) + jnp.sum(jnp.cos(hh))

    gs_p = jax.grad(lambda *a: loss(run_pallas, *a), (0, 1, 2, 3))(p, Q, h, X3)
    gs_r = jax.grad(lambda *a: loss(run_ref, *a), (0, 1, 2, 3))(p, Q, h, X3)
    for gp_, gr_ in zip(gs_p, gs_r):
        for a, b in zip(jax.tree.leaves(gp_), jax.tree.leaves(gr_)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("mode,ctrl", [("fb2", "dual"), ("step", "dual"),
                                       ("step", "single")])
def test_frontend_modes_match_jnp(rng, monkeypatch, mode, ctrl):
    """Full adaptive frontend fwd + train-mode grads: each kernel ladder
    rung == the pure-XLA path, end to end through the scan (ear-vmapped
    dual and shared-Q single controller)."""
    import biear_tpu.models.frontend as fe
    from biear_tpu.models.config import BiEARConfig
    from biear_tpu.models.biear import init_active
    from biear_tpu.models import active_forward

    cfg = BiEARConfig(fs=1600, timesteps=4, n_fft=256, n_bands=24,
                      fmin=50.0, fmax=700.0, latent_dim=24,
                      deltaQ_mode="relative", controller_mode=ctrl)
    params = init_active(jax.random.PRNGKey(0), cfg)
    l3 = (params["bifb"]["fb"]["q_out"]["l3"] if ctrl == "dual"
          else params["bifb"]["ctrl"]["q_out"]["l3"])
    l3["w"] = 0.05 * jax.random.normal(jax.random.PRNGKey(1), l3["w"].shape)
    wavL = jnp.asarray(rng.uniform(-1, 1, (2, 1600)).astype(np.float32))
    wavR = jnp.asarray(rng.uniform(-1, 1, (2, 1600)).astype(np.float32))
    x3 = jnp.zeros((2, 24))

    def fwd_and_grad():
        out = active_forward(params, cfg, wavL, wavR, x3, train=False)

        def loss(p):
            s, a, d, aux = active_forward(p, cfg, wavL, wavR, x3,
                                          train=True,
                                          rng=jax.random.PRNGKey(7))
            return (jnp.mean(s * s) + jnp.mean(a) + jnp.mean(d * d)
                    + jnp.mean(aux["Q"]))

        return out, jax.grad(loss)(params)

    monkeypatch.setenv("BIEAR_USE_PALLAS", "off")
    fe._fused_fb_apply.cache_clear()
    ref_out, ref_grad = fwd_and_grad()

    monkeypatch.setenv("BIEAR_USE_PALLAS", mode)
    fe._fused_fb_apply.cache_clear()
    pal_out, pal_grad = fwd_and_grad()
    monkeypatch.setenv("BIEAR_USE_PALLAS", "off")
    fe._fused_fb_apply.cache_clear()

    for a, b, name in zip(ref_out[:3], pal_out[:3], ("sound", "aoa", "dist")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, err_msg=name)
    np.testing.assert_allclose(np.asarray(pal_out[3]["Q"]),
                               np.asarray(ref_out[3]["Q"]), atol=1e-4)
    for a, b in zip(jax.tree.leaves(ref_grad), jax.tree.leaves(pal_grad)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)
