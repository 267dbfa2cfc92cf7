"""NIST SPHERE reader (TIMIT ingestion, reference reads via libsndfile —
generate_anechoic_data.py:97)."""

import numpy as np
import pytest

from tools.sphere import read_sphere


def _write_sphere(path, data, fs=16000, byte_format="01", coding="pcm",
                  channels=1, n_bytes=2, header_size=1024):
    fields = [
        f"sample_rate -i {fs}",
        f"channel_count -i {channels}",
        f"sample_n_bytes -i {n_bytes}",
        f"sample_byte_format -s{len(byte_format)} {byte_format}",
        f"sample_coding -s{len(coding)} {coding}",
        f"sample_count -i {len(data) // max(channels, 1)}",
    ]
    head = "NIST_1A\n" + f"{header_size:>7d}\n" + "\n".join(fields) \
        + "\nend_head\n"
    raw = head.encode("ascii")
    assert len(raw) <= header_size
    raw += b" " * (header_size - len(raw))
    with open(path, "wb") as f:
        f.write(raw)
        f.write(data.tobytes())


def test_pcm16_little_endian(tmp_path):
    x = (np.sin(np.linspace(0, 40, 2000)) * 20000).astype("<i2")
    p = tmp_path / "a.wav"
    _write_sphere(str(p), x)
    fs, y = read_sphere(str(p))
    assert fs == 16000
    np.testing.assert_array_equal(y, x.astype(np.int16))


def test_pcm16_big_endian(tmp_path):
    x = (np.sin(np.linspace(0, 40, 1500)) * 20000).astype(np.int16)
    p = tmp_path / "b.wav"
    _write_sphere(str(p), x.astype(">i2"), byte_format="10")
    fs, y = read_sphere(str(p))
    np.testing.assert_array_equal(y, x)


def test_ulaw(tmp_path):
    """mu-law round trip: encode with the audioop-free formula, decode with
    the reader; tolerance is the codec's quantisation error."""
    x = (np.sin(np.linspace(0, 30, 3000)) * 16000).astype(np.int16)
    # reference mu-law encoder
    BIAS, CLIP = 0x84, 32635
    s = x.astype(np.int32)
    sign = np.where(s < 0, 0x80, 0)
    mag = np.minimum(np.abs(s), CLIP) + BIAS
    exp = (np.floor(np.log2(mag >> 7))).astype(np.int32)
    exp = np.clip(exp, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    u = (~(sign | (exp << 4) | mant)) & 0xFF
    p = tmp_path / "c.wav"
    _write_sphere(str(p), u.astype(np.uint8), coding="ulaw", n_bytes=1)
    fs, y = read_sphere(str(p))
    assert np.max(np.abs(y.astype(np.int32) - x.astype(np.int32))) < 1100


def test_multichannel_and_count(tmp_path):
    x = np.arange(20, dtype="<i2")          # 10 frames x 2 channels
    p = tmp_path / "d.wav"
    _write_sphere(str(p), x, channels=2)
    fs, y = read_sphere(str(p))
    assert y.shape == (10, 2)


def test_shorten_rejected(tmp_path):
    x = np.zeros(10, "<i2")
    p = tmp_path / "e.wav"
    _write_sphere(str(p), x, coding="pcm,embedded-shorten-v2.00")
    with pytest.raises(ValueError, match="shorten"):
        read_sphere(str(p))


def test_not_sphere(tmp_path):
    p = tmp_path / "f.wav"
    with open(p, "wb") as f:
        f.write(b"RIFF....WAVEfmt ")
    with pytest.raises(ValueError, match="magic"):
        read_sphere(str(p))


def test_speech_pool_reads_sphere(tmp_path):
    """collect_speech_pool must ingest SPHERE-format 'wav' files (TIMIT's
    on-disk format) transparently."""
    from tools.generate_binaural_data import collect_speech_pool
    x = (np.sin(np.linspace(0, 900, 32000)) * 20000).astype("<i2")
    _write_sphere(str(tmp_path / "s1.WAV"), x)
    _write_sphere(str(tmp_path / "s2.WAV"), x[::-1].copy())
    pool = collect_speech_pool(str(tmp_path), 16000)
    assert pool.shape == (2, int(1.2 * 16000))
    assert np.abs(pool).max() <= 1.0
