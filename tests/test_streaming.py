"""Streaming inference equivalence: serve/streaming.py vs the batch forward.

Contract under test (serve/streaming.py docstring): feeding a 1 s crop as
cfg.timesteps hop-chunks (+ the residual tail samples at readout)
reproduces active_forward(train=False) on the same crop. Frontend and
encoder streaming is the identical code (frontend.adaptive_step /
single_step ARE the scan bodies), so those paths match to float
round-off; the CC feature's mean removal is an algebraic readout
correction, so it carries a small tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from biear_tpu.models import BiEARConfig
from biear_tpu.models.biear import active_forward, init_active
from biear_tpu.ops.xcorr import cross_correlation_feature
from biear_tpu.serve import (stream_apply, stream_init, stream_plan,
                             stream_readout, stream_step)

FS = 16000


def _wavs(rng, B):
    # Band-limited-ish signals with ear correlation so CC/ILD/IPD are all
    # non-degenerate.
    t = np.arange(FS) / FS
    base = rng.standard_normal((B, FS)).astype(np.float32)
    tone = np.sin(2 * np.pi * 700.0 * t)[None].astype(np.float32)
    wavL = 0.3 * base + tone * rng.uniform(0.2, 1.0, (B, 1)).astype(np.float32)
    wavR = 0.3 * np.roll(base, 7, axis=1) + 0.8 * np.roll(tone, 11, axis=1)
    return jnp.asarray(wavL), jnp.asarray(wavR)


def _batch_x3(wavL, wavR):
    return cross_correlation_feature(wavL, wavR, FS, use_kernel=False)


def _assert_match(stream_out, batch_out, atol):
    names = ("sound_logits", "aoa", "dist_logits")
    for name, s, b in zip(names, stream_out, batch_out):
        np.testing.assert_allclose(np.asarray(s), np.asarray(b),
                                   atol=atol, rtol=0, err_msg=name)


@pytest.mark.parametrize("mode,fixed", [("dual", False), ("single", False),
                                        ("dual", True)])
def test_stream_matches_batch(mode, fixed):
    cfg = BiEARConfig(controller_mode=mode, fixed_frontend_q=fixed,
                      use_cc=True, deltaQ_mode="relative", deltaQ_base=1.0,
                      deltaQ_low_factor=0.3, deltaQ_high_factor=5.0)
    key = jax.random.PRNGKey(3)
    params = init_active(key, cfg)
    # Perturb the zero-init controller output layer so Q actually moves
    # and the streamed feedback loop is exercised (not just Q == Q0).
    if not fixed:
        leaf = ["bifb", "fb" if mode == "dual" else "ctrl"]
        p = params
        for k in leaf:
            p = p[k]
        p["q_out"]["l3"]["w"] = 0.25 * jax.random.normal(
            jax.random.PRNGKey(7), p["q_out"]["l3"]["w"].shape)

    wavL, wavR = _wavs(np.random.default_rng(11), B=3)
    x3 = _batch_x3(wavL, wavR)
    batch_out = active_forward(params, cfg, wavL, wavR, x3)[:3]
    stream_out = stream_apply(params, cfg, wavL, wavR)
    # The only tolerance-level divergence is x3's accumulation order.
    _assert_match(stream_out, batch_out, atol=2e-4)


def test_stream_matches_batch_bf16_matmul_dft():
    """The exactness contract under the PRODUCTION bf16-W + matmul-DFT
    policy (serve/streaming.py _frame_spectra): the stream path's (B,w)
    einsum must reproduce the batch path's (B,T,w) einsum. The contraction
    operands and precision are identical; only the batching shape differs,
    which XLA evaluates with the same dot kernel — asserted here at a
    tight explicit tolerance rather than assumed in a comment."""
    cfg = BiEARConfig(controller_mode="dual", use_cc=True,
                      fb_w_dtype="bfloat16", dft_mode="matmul",
                      deltaQ_mode="relative", deltaQ_base=1.0,
                      deltaQ_low_factor=0.3, deltaQ_high_factor=5.0)
    assert cfg.use_dft_matmul
    params = init_active(jax.random.PRNGKey(3), cfg)
    p = params["bifb"]["fb"]
    p["q_out"]["l3"]["w"] = 0.25 * jax.random.normal(
        jax.random.PRNGKey(7), p["q_out"]["l3"]["w"].shape)

    wavL, wavR = _wavs(np.random.default_rng(13), B=3)
    x3 = _batch_x3(wavL, wavR)
    batch_out = active_forward(params, cfg, wavL, wavR, x3)[:3]
    stream_out = stream_apply(params, cfg, wavL, wavR)
    # Same 2e-4 budget as the f32 path: the CC accumulation order is the
    # only divergence; the matmul spectra themselves are shape-batched
    # identically on both sides.
    _assert_match(stream_out, batch_out, atol=2e-4)


def test_stream_step_by_step_no_cc_is_exact():
    """Without the CC feature every streamed op is the literal batch op,
    so the agreement must be at float32 round-off, not just tolerance."""
    cfg = BiEARConfig(controller_mode="dual", use_cc=False)
    params = init_active(jax.random.PRNGKey(0), cfg)
    wavL, wavR = _wavs(np.random.default_rng(5), B=2)
    batch_out = active_forward(params, cfg, wavL, wavR)[:3]

    plan = stream_plan(cfg)
    hop, T = plan["hop"], cfg.timesteps
    state = stream_init(params, cfg, batch=2)
    step = jax.jit(stream_step, static_argnums=1)
    for t in range(T):
        sl = slice(t * hop, (t + 1) * hop)
        state = step(params, cfg, state, wavL[:, sl], wavR[:, sl])
    stream_out = stream_readout(params, cfg, state)
    _assert_match(stream_out, batch_out, atol=2e-6)


def test_stream_cc_matches_batch_feature():
    """The incremental CC accumulator + mean-removal correction vs the
    batch cross_correlation_feature, on its own."""
    from biear_tpu.serve.streaming import _cc_accumulate, _cc_readout

    cfg = BiEARConfig()
    plan = stream_plan(cfg)
    rng = np.random.default_rng(2)
    wavL, wavR = _wavs(rng, B=4)
    # Nonzero means make the mean-removal correction do real work.
    wavL = wavL + 0.37
    wavR = wavR - 0.21

    ref = np.asarray(_batch_x3(wavL, wavR))

    B, K = 4, plan["K"]
    z = lambda *s: jnp.zeros(s, jnp.float32)
    cc = {"raw": z(B, 2 * K + 1), "n": jnp.zeros((B,), jnp.int32),
          "sumL": z(B), "sumR": z(B), "headL": z(B, K), "headR": z(B, K),
          "tailL": z(B, K), "tailR": z(B, K)}
    # Deliberately uneven chunking (independent of the frame hop): the
    # accumulator must not care how the sample stream is sliced.
    edges = [0, 842, 3000, 3100, 9000, 15998, 16000]
    for a, b in zip(edges[:-1], edges[1:]):
        cc = _cc_accumulate(cc, wavL[:, a:b], wavR[:, a:b], K)
    got = np.asarray(_cc_readout(cc, plan))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=0)


def test_stream_readout_is_anytime():
    """Readout after t < T frames is well-formed (finite, right shapes) —
    the anytime-belief property a streaming deployment relies on."""
    cfg = BiEARConfig(controller_mode="dual", use_cc=True)
    params = init_active(jax.random.PRNGKey(1), cfg)
    plan = stream_plan(cfg)
    hop = plan["hop"]
    wavL, wavR = _wavs(np.random.default_rng(9), B=2)

    state = stream_init(params, cfg, batch=2)
    for t in range(3):
        sl = slice(t * hop, (t + 1) * hop)
        state = stream_step(params, cfg, state, wavL[:, sl], wavR[:, sl])
    sound, aoa, dist = stream_readout(params, cfg, state)
    assert sound.shape == (2, cfg.n_sectors)
    assert aoa.shape == (2, cfg.n_sectors)
    assert dist.shape == (2, cfg.n_sectors, cfg.n_dist_class)
    for x in (sound, aoa, dist):
        assert bool(jnp.all(jnp.isfinite(x)))
    assert state["t"].shape == (2,) and int(state["t"][0]) == 3


def test_stream_reset_slot_equals_fresh_stream():
    """Stream churn exactness: after stream_reset on slot j mid-flight,
    slot j's subsequent hops + readout must be BIT-identical to an
    independent fresh stream fed the same post-reset audio, while the
    untouched slots are bit-identical to an unchurned run. This is what
    makes per-slot re-init sound under mixed-phase batches (per-stream
    t / cc.n counters)."""
    from biear_tpu.serve import stream_reset

    cfg = BiEARConfig(controller_mode="dual", use_cc=True,
                      deltaQ_mode="relative", deltaQ_base=1.0,
                      deltaQ_low_factor=0.3, deltaQ_high_factor=5.0)
    params = init_active(jax.random.PRNGKey(3), cfg)
    p = params["bifb"]["fb"]
    p["q_out"]["l3"]["w"] = 0.25 * jax.random.normal(
        jax.random.PRNGKey(7), p["q_out"]["l3"]["w"].shape)
    plan = stream_plan(cfg)
    hop = plan["hop"]
    B, j = 3, 1
    wavL, wavR = _wavs(np.random.default_rng(21), B=B)
    wavL2, wavR2 = _wavs(np.random.default_rng(22), B=B)

    # churned run: 4 hops of wav1, reset slot j, 5 hops of wav2
    state = stream_init(params, cfg, B)
    for t in range(4):
        sl = slice(t * hop, (t + 1) * hop)
        state = stream_step(params, cfg, state, wavL[:, sl], wavR[:, sl])
    pre = jax.tree.map(lambda x: np.asarray(x), state)
    mask = jnp.asarray([i == j for i in range(B)])
    state = stream_reset(params, cfg, state, mask)
    for t in range(5):
        sl = slice(t * hop, (t + 1) * hop)
        state = stream_step(params, cfg, state, wavL2[:, sl], wavR2[:, sl])
    got = stream_readout(params, cfg, state)

    # reference A: an all-fresh batch over the same 5 hops (same batch
    # shape — XLA dot tiling differs across batch sizes, so exactness is
    # defined within a shape); slot j must match bit-for-bit
    ref_state = stream_init(params, cfg, B)
    for t in range(5):
        sl = slice(t * hop, (t + 1) * hop)
        ref_state = stream_step(params, cfg, ref_state,
                                wavL2[:, sl], wavR2[:, sl])
    ref = stream_readout(params, cfg, ref_state)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g[j:j + 1]),
                                      np.asarray(r[j:j + 1]))

    # reference B: unchurned slots continue exactly as if no reset happened
    state_b = jax.tree.map(jnp.asarray, pre)
    for t in range(5):
        sl = slice(t * hop, (t + 1) * hop)
        state_b = stream_step(params, cfg, state_b,
                              wavL2[:, sl], wavR2[:, sl])
    ref_b = stream_readout(params, cfg, state_b)
    keep = np.array([i for i in range(B) if i != j])
    for g, r in zip(got, ref_b):
        np.testing.assert_array_equal(np.asarray(g)[keep],
                                      np.asarray(r)[keep])


def test_stream_rejects_overlapping_frames():
    with pytest.raises(NotImplementedError):
        stream_plan(BiEARConfig(hop_ratio=0.5))


def test_stream_step_sharded_over_streams():
    """Serving scale-out: the batch axis IS the concurrent-streams axis,
    so sharding the stream state + chunks over a device mesh must give
    the single-device result (the streaming path is pure XLA — no Pallas
    — so it partitions; cf. ops/window_gather's SPMD fallback note)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = BiEARConfig(controller_mode="dual", use_cc=True)
    params = init_active(jax.random.PRNGKey(0), cfg)
    plan = stream_plan(cfg)
    hop = plan["hop"]
    B = 8
    wavL, wavR = _wavs(np.random.default_rng(3), B=B)

    state = stream_init(params, cfg, B)
    ref_state = stream_step(params, cfg, state, wavL[:, :hop], wavR[:, :hop])
    ref = stream_readout(params, cfg, ref_state)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    # Frontend carries: dual mode stacks the ear axis first, encoders and
    # CC lead with the stream axis.
    def shard_spec(path, leaf):
        del path
        if leaf.ndim == 0:
            return NamedSharding(mesh, P())
        if leaf.ndim >= 2 and leaf.shape[0] == 2 and leaf.shape[1] == B:
            return NamedSharding(mesh, P(None, "data"))
        if leaf.shape[0] == B:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())

    specs = jax.tree_util.tree_map_with_path(shard_spec, state)
    state_sh = jax.tree.map(jax.device_put, state, specs)
    csh = NamedSharding(mesh, P("data"))
    out_state = jax.jit(stream_step, static_argnums=1)(
        params, cfg, state_sh, jax.device_put(wavL[:, :hop], csh),
        jax.device_put(wavR[:, :hop], csh))
    got = stream_readout(params, cfg, out_state)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-5, rtol=0)
