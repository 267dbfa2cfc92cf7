"""Unit tests for the Pallas sample-granular window gather
(biear_tpu/ops/window_gather.py) — the hottest data-movement op of the
fused pipeline. The kernel itself runs here in Pallas interpret mode
(numerics identical to the TPU lowering's semantics); the XLA fallback
and a numpy oracle pin the contract:

    out[x].reshape(16384)[t] == pool3[rows[x]].reshape(-1)[offs[x] + t]
"""

import numpy as np
import pytest

import jax.numpy as jnp

from biear_tpu.ops.window_gather import (
    WIN_BLOCKS,
    _gather_windows_pallas,
    _gather_windows_xla,
    gather_windows,
    pad_pool_for_windows,
)

WIN = WIN_BLOCKS * 128


def _setup(seed, np_rows=3, t=17000, left_pad=383, max_off=1200):
    rng = np.random.default_rng(seed)
    pool = rng.standard_normal((np_rows, t)).astype(np.float32)
    pool3 = pad_pool_for_windows(pool, left_pad, max_off)
    return pool, pool3, left_pad, max_off


def _oracle(pool3, rows, offs):
    flat = np.asarray(pool3).reshape(pool3.shape[0], -1)
    return np.stack([flat[r, o:o + WIN] for r, o in zip(rows, offs)])


@pytest.mark.parametrize("offs", [
    [0, 128, 1200],              # block-aligned + max_off
    [1, 127, 129, 640 + 37],     # sub-block offsets crossing boundaries
])
def test_pallas_interpret_matches_oracle(offs):
    pool, pool3, left_pad, max_off = _setup(0)
    offs = np.asarray(offs[:pool.shape[0] + 1][:3], dtype=np.int32)
    rows = np.arange(len(offs), dtype=np.int32) % pool.shape[0]
    got = _gather_windows_pallas(jnp.asarray(pool3), jnp.asarray(rows),
                                 jnp.asarray(offs), True)
    want = _oracle(pool3, rows, offs)
    np.testing.assert_array_equal(np.asarray(got).reshape(len(offs), WIN),
                                  want)


def test_xla_fallback_matches_oracle_and_padding_zeroes():
    pool, pool3, left_pad, max_off = _setup(1)
    rng = np.random.default_rng(2)
    rows = rng.integers(0, pool.shape[0], size=8).astype(np.int32)
    offs = rng.integers(0, max_off + left_pad, size=8).astype(np.int32)
    got = np.asarray(_gather_windows_xla(jnp.asarray(pool3),
                                         jnp.asarray(rows),
                                         jnp.asarray(offs)))
    np.testing.assert_array_equal(got.reshape(8, WIN),
                                  _oracle(pool3, rows, offs))
    # offset 0 starts inside the left zero-pad: first left_pad samples 0
    z = np.asarray(_gather_windows_xla(jnp.asarray(pool3),
                                       jnp.asarray([0], np.int32),
                                       jnp.asarray([0], np.int32)))
    assert np.all(z.reshape(-1)[:left_pad] == 0.0)
    np.testing.assert_array_equal(z.reshape(-1)[left_pad:WIN],
                                  pool[0, :WIN - left_pad])


def test_kernel_and_fallback_agree():
    pool, pool3, left_pad, max_off = _setup(3)
    rng = np.random.default_rng(4)
    n = 6
    rows = rng.integers(0, pool.shape[0], size=n).astype(np.int32)
    offs = rng.integers(0, max_off + left_pad, size=n).astype(np.int32)
    a = np.asarray(_gather_windows_pallas(jnp.asarray(pool3),
                                          jnp.asarray(rows),
                                          jnp.asarray(offs), True))
    b = np.asarray(_gather_windows_xla(jnp.asarray(pool3),
                                       jnp.asarray(rows),
                                       jnp.asarray(offs)))
    np.testing.assert_array_equal(a, b)


def test_dispatch_uses_fallback_on_cpu():
    pool, pool3, left_pad, max_off = _setup(5)
    rows = jnp.asarray([0, 1], jnp.int32)
    offs = jnp.asarray([3, 259], jnp.int32)
    got = np.asarray(gather_windows(jnp.asarray(pool3), rows, offs))
    np.testing.assert_array_equal(got.reshape(2, WIN),
                                  _oracle(pool3, np.asarray(rows),
                                          np.asarray(offs)))


# ---------------- fused gather + block-Toeplitz mix ----------------

def _mix_oracle(pool3, rows, offs, meas, kb, nf):
    """numpy: out[x] = frame(window_x) @ kb[meas[x]], f64 accumulate."""
    win = _oracle(pool3, rows, offs)                     # (X, WIN)
    ncol = kb.shape[1]
    X = len(rows)
    out = np.zeros((X, nf, kb.shape[2]), np.float64)
    for x in range(X):
        fw = np.stack([win[x, 128 * f:128 * f + ncol] for f in range(nf)])
        out[x] = fw.astype(np.float64) @ np.asarray(kb[meas[x]], np.float64)
    return out


def _mix_setup(seed, m_kernels=4, ncol=384):
    pool, pool3, left_pad, max_off = _setup(seed)
    rng = np.random.default_rng(seed + 100)
    kb = rng.standard_normal((m_kernels, ncol, 256)).astype(np.float32)
    n = 5
    rows = rng.integers(0, pool.shape[0], size=n).astype(np.int32)
    offs = rng.integers(0, max_off + left_pad, size=n).astype(np.int32)
    meas = rng.integers(0, m_kernels, size=n).astype(np.int32)
    return pool3, kb, rows, offs, meas


def test_gather_mix_interpret_matches_oracle():
    from biear_tpu.ops.window_gather import (_gather_mix_pallas,
                                             _gather_mix_xla)
    nf = 13
    pool3, kb, rows, offs, meas = _mix_setup(7)
    got = np.asarray(_gather_mix_pallas(
        jnp.asarray(pool3), jnp.asarray(rows), jnp.asarray(offs),
        jnp.asarray(meas), jnp.asarray(kb), nf, True))
    want = _mix_oracle(pool3, rows, offs, meas, kb, nf)
    assert got.shape == want.shape == (5, nf, 256)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)


def test_gather_mix_kernel_and_fallback_agree():
    """Interpret-mode kernel vs XLA composition: same operand dtype (f32
    here — bf16 is a device policy), identical framing -> tight match.
    atol: the kernel's ears-major output block (the layout contract that
    keeps the fused chunk copy-free, ops/window_gather.py::_mix_kernel)
    makes XLA fuse a transpose into the interpret-mode dot, shifting f32
    accumulation order by ~3e-5 on a 384-term contraction."""
    from biear_tpu.ops.window_gather import (_gather_mix_pallas,
                                             _gather_mix_xla)
    nf = 13
    pool3, kb, rows, offs, meas = _mix_setup(8)
    a = np.asarray(_gather_mix_pallas(
        jnp.asarray(pool3), jnp.asarray(rows), jnp.asarray(offs),
        jnp.asarray(meas), jnp.asarray(kb), nf, True))
    b = np.asarray(_gather_mix_xla(
        jnp.asarray(pool3), jnp.asarray(rows), jnp.asarray(offs),
        jnp.asarray(meas), jnp.asarray(kb), nf))
    np.testing.assert_allclose(a, b, rtol=0, atol=5e-5)


def test_gather_mix_rejects_unpadded_kb():
    from biear_tpu.ops.window_gather import gather_mix_kb
    pool3, kb, rows, offs, meas = _mix_setup(9)
    with pytest.raises(ValueError, match="128-padded"):
        gather_mix_kb(jnp.asarray(pool3), jnp.asarray(rows),
                      jnp.asarray(offs), jnp.asarray(meas),
                      jnp.asarray(kb[:, :383]), 13)


def test_mesh_sharded_synth_forces_xla_fallback(monkeypatch):
    """Pallas calls have no SPMD partitioning rule: when the synthesizer
    emits mesh-sharded batches, both gather ops must be asked for their
    XLA compositions (use_kernel=False), and the numbers must match the
    unsharded batch bit-for-bit."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from biear_tpu.data.synth import (AnechoicSynthesizer,
                                      make_test_hrir_bank,
                                      make_test_segments)
    from biear_tpu.ops import window_gather as wg

    seen = []
    real = wg.gather_mix_kb

    def spy(*a, **kw):
        seen.append(kw.get("use_kernel", "missing"))
        return real(*a, **kw)

    monkeypatch.setattr(wg, "gather_mix_kb", spy)
    ir, az, dist = make_test_hrir_bank()
    segs = make_test_segments(16)
    s = AnechoicSynthesizer(ir, az, dist, segs, fs=16000, num_lags=100,
                            mix_dtype="bfloat16")
    base = s.sample_batch(jax.random.PRNGKey(1), 8)
    assert seen and seen[-1] != False  # noqa: E712  (None or absent = auto)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    s.set_output_sharding(NamedSharding(mesh, P("data")))
    sharded = s.sample_batch(jax.random.PRNGKey(1), 8)
    assert seen[-1] is False
    for a, b in zip(base, sharded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gather_mix_rejects_window_overrun():
    from biear_tpu.ops.window_gather import gather_mix_kb, WIN_BLOCKS
    pool3, kb, rows, offs, meas = _mix_setup(10)  # ncol=384 -> 3 blocks
    with pytest.raises(ValueError, match="window coverage"):
        gather_mix_kb(jnp.asarray(pool3), jnp.asarray(rows),
                      jnp.asarray(offs), jnp.asarray(meas),
                      jnp.asarray(kb), WIN_BLOCKS - 1)


def test_gather_mix_large_bank_falls_back(monkeypatch):
    """A bank over the VMEM budget must auto-dispatch to the XLA
    composition instead of attempting (and failing) to hold it
    VMEM-resident."""
    from biear_tpu.ops import window_gather as wg

    pool3, kb, rows, offs, meas = _mix_setup(11)
    monkeypatch.setattr(wg, "_MIX_KB_VMEM_BYTES", kb.nbytes - 1)
    monkeypatch.setattr(wg.jax, "default_backend", lambda: "tpu")
    called = {}
    monkeypatch.setattr(wg, "_gather_mix_xla",
                        lambda *a, **k: called.setdefault("xla", True))
    monkeypatch.setattr(wg, "_gather_mix_pallas",
                        lambda *a, **k: called.setdefault("pallas", True))
    wg.gather_mix_kb(jnp.asarray(pool3), jnp.asarray(rows),
                     jnp.asarray(offs), jnp.asarray(meas),
                     jnp.asarray(kb), 13)
    assert called == {"xla": True}


# ---------------- fused cross-correlation lag kernel ----------------

def test_cc_kernel_interpret_matches_numpy():
    """Interpret-mode kernel vs np.correlate at the kept lags."""
    from biear_tpu.ops.window_gather import cc_kept_lags
    rng = np.random.default_rng(3)
    B, n, mk = 4, 1280, 48
    lf = rng.standard_normal((B, n)).astype(np.float32)
    rf = rng.standard_normal((B, n)).astype(np.float32)
    got = np.asarray(cc_kept_lags(jnp.asarray(lf), jnp.asarray(rf), mk,
                                  use_kernel=True, interpret=True))
    assert got.shape == (B, 2 * mk + 1)
    for b in range(B):
        full = np.correlate(lf[b].astype(np.float64),
                            rf[b].astype(np.float64), "full")
        want = full[n - 1 - mk:n + mk]
        np.testing.assert_allclose(got[b], want, rtol=2e-5, atol=2e-3)


def test_cc_kernel_matches_xla_composition():
    from biear_tpu.ops.window_gather import cc_kept_lags
    from biear_tpu.ops.xcorr import _cc_kept_lags_mxu
    rng = np.random.default_rng(4)
    B, n, mk = 3, 2560, 33
    lf = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    rf = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    a = np.asarray(cc_kept_lags(lf, rf, mk, use_kernel=True,
                                interpret=True))
    b = np.asarray(_cc_kept_lags_mxu(lf, rf, mk))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-4)


def test_cc_feature_kernel_gating():
    """cross_correlation_feature: use_kernel=False (the mesh-sharded
    path) and the CPU auto path must agree bit-for-bit; use_kernel=None
    on CPU dispatches the XLA composition."""
    from biear_tpu.ops.xcorr import cross_correlation_feature
    rng = np.random.default_rng(5)
    B, n = 4, 16000
    lf = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    rf = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    auto = np.asarray(cross_correlation_feature(lf, rf, 16000))
    forced = np.asarray(cross_correlation_feature(lf, rf, 16000,
                                                  use_kernel=False))
    np.testing.assert_array_equal(auto, forced)


def test_cc_kernel_rejects_bad_shapes():
    from biear_tpu.ops.window_gather import cc_kept_lags
    x = jnp.zeros((2, 1280), jnp.float32)
    with pytest.raises(ValueError, match="cc kernel"):
        cc_kept_lags(x, x, 64, use_kernel=True)   # max_kept > 63
