"""On-device passive-feature synthesis (data/passive_synth.py): the
reference's offline 5-feature H5 precompute (create_h5_data/
data_save.py:122-164) fused into the training stream. Quick tier."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from biear_tpu.data import (AnechoicSynthesizer, PassiveFeatureSynth,
                            make_test_hrir_bank, make_test_segments)
from biear_tpu.ops.features import passive_features

CONF_P = os.path.join(os.path.dirname(__file__), "..", "conf",
                      "config_passive.yaml")


def _synths():
    ir, az, dist = make_test_hrir_bank()
    inner = AnechoicSynthesizer(ir, az, dist, make_test_segments(4))
    return inner, PassiveFeatureSynth(inner)


def test_adapter_matches_direct_features():
    """Adapter batches == passive_features applied to the inner batch's
    waveforms (same key -> same scene draw), labels passed through."""
    inner, pas = _synths()
    key = jax.random.PRNGKey(7)
    wavL, wavR, x3, y = inner.sample_batch(key, 4)
    x1, x2, x3p, x4, x5, yp = pas.sample_batch(key, 4)
    e1, e4 = passive_features(wavL)
    e2, e5 = passive_features(wavR)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(e1))
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(x4), np.asarray(e4))
    np.testing.assert_array_equal(np.asarray(x5), np.asarray(e5))
    np.testing.assert_array_equal(np.asarray(x3p), np.asarray(x3))
    np.testing.assert_array_equal(np.asarray(yp), np.asarray(y))
    assert x1.shape == (4, 19, 100) and x4.shape == (4, 19, 100)


def test_batch_fn_matches_sample_batch():
    """The jit-embeddable batch_fn path (the fused train chunk's input)
    must reproduce sample_batch exactly."""
    _, pas = _synths()
    key = jax.random.PRNGKey(3)
    direct = pas.sample_batch(key, 4)
    fn = pas.batch_fn(4)
    via_fn = jax.jit(fn)(pas.bank, key)
    for i, (a, b) in enumerate(zip(direct, via_fn)):
        # mag-dB planes (0, 1) differ ~2e-5 dB from jit fusion rounding
        # in the sqrt/log10 chain; everything else is bit-exact
        atol = 1e-3 if i < 2 else 0.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=atol)


@pytest.mark.slow
def test_passive_synth_train_end_to_end(tmp_path):
    """runner.train with model_kind=passive driven by the on-device
    synthesizer: the chunked (fused lax.scan) dispatch path, finite loss,
    eval splits built from passive batches."""
    from biear_tpu.config import load_run_config
    from biear_tpu.train.runner import train

    rc = load_run_config(CONF_P)
    rc.runs_root = str(tmp_path / "runs")
    rc.epochs = 1
    rc.batch_size = 4
    rc.synth_on_device = True
    rc.raw["SYNTH_STEPS_PER_EPOCH"] = 2
    rc.raw["SYNTH_EVAL_SAMPLES"] = 8
    assert rc.model_kind == "passive" and not rc.active

    _, pas = _synths()
    out = train(rc, synth=pas, quiet=True, run_id="PS")
    tr = out["history"]["train"][0]
    assert np.isfinite(tr["loss"]) and tr["skipped"] == 0
    assert out["test"] is not None and np.isfinite(out["test"]["loss"])


def test_protocol_predictions_passive(tmp_path):
    """tools/run_full_protocol.predictions_on_device passive branch over
    a stacked SynthEvalDataset."""
    from biear_tpu.models.biear import init_passive
    from biear_tpu.models.config import BiEARConfig
    from biear_tpu.train.runner import SynthEvalDataset
    from tools.run_full_protocol import predictions_on_device, full_metrics

    _, pas = _synths()
    cfg = BiEARConfig()
    params = init_passive(jax.random.PRNGKey(0), cfg)
    ds = SynthEvalDataset(pas, 12, seed=5, batch_size=4, test_thirds=True,
                          keep_on_device=True)
    s, a, d, y = predictions_on_device(params, cfg, ds, "passive")
    assert s.shape == (12, 8) and a.shape == (12, 8)
    assert d.shape == (12, 8, 5) and y.shape == (12, 56)
    m = full_metrics(s, a, d, y)
    assert np.isfinite(m["overall"]["aoa_mae"])


@pytest.mark.slow
def test_assembled_passive_batch_matches_reference_pipeline():
    """VERDICT r3 weak 5: the ASSEMBLED passive 6-tuple at protocol
    geometry (1 s @ 16 kHz, 19x100 planes, 100-lag CC) must match what
    the reference's offline utils.py pipeline would produce on the SAME
    waveforms — per-sample numpy oracles end-to-end, not per-function
    pieces. x1/x2/x4/x5 against the stft_gammatone_mag_phase route
    (utils.py:233-303 mirror), x3 against the np.correlate crop/normalise/
    interp route (utils.py:390-420)."""
    from biear_tpu.ops.features import stft_gammatone_mag_phase
    from test_ops import np_cc_feature

    inner, pas = _synths()
    key = jax.random.PRNGKey(11)
    wavL, wavR, _, _ = (np.asarray(b) for b in inner.sample_batch(key, 6))
    x1, x2, x3, x4, x5, _ = (np.asarray(b) for b in
                             pas.sample_batch(key, 6))
    assert x1.shape == (6, 19, 100) and x3.shape == (6, 100)
    for b in range(6):
        for wav, mag, phase in ((wavL[b], x1[b], x4[b]),
                                (wavR[b], x2[b], x5[b])):
            m_np, p_np = stft_gammatone_mag_phase(wav, 16000)
            # compare where the band output carries energy: deep nulls
            # legitimately diverge between f32 and f64 FFTs (see
            # test_features.test_passive_features_match_per_sample_numpy)
            sig = m_np > -60.0
            assert sig.mean() > 0.1
            np.testing.assert_allclose(mag[sig], m_np[sig], atol=2e-2)
            sig18 = sig[:18]
            dphi = np.angle(np.exp(1j * (phase[:18][sig18]
                                         - p_np[:18][sig18])))
            assert np.abs(dphi).max() < 2e-2
        np.testing.assert_allclose(x3[b], np_cc_feature(wavL[b], wavR[b],
                                                        16000), atol=2e-4)
