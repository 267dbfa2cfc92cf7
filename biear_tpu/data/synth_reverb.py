"""On-device reverberant (BRIR) synthesis: Auditorium / Spirit scenes.

Scene parity with generate_auditorium_data.py / generate_spirit_data.py:
a head-rotation BRIR bank (M measurements x 2 ears x E fixed loudspeakers),
speaker world-azimuths from their (x, y) coordinates, per-measurement head
yaw; a sample picks a random head yaw, derives each speaker's RELATIVE
azimuth -> sector, chooses up to n_src distinct occupied sectors, one
speaker per sector (preferring unused speakers,
generate_auditorium_data.py:299-307), convolves a random speech segment
with the (head, speaker) BRIR pair, truncates to 1 s (no random crop —
:321-328), sums, and scales to 0.9/peak (:339-341).

The host-side rejection logic becomes tables + a fixed 3-slot masked
selection loop, so the whole sampler jits and vmaps.

Distance labels use the 5-class rule: nearest of {0.5, 1, 2, 3} m if
<= 3 m, else "other" (class 4) (:87-96). NOTE a latent reference bug: its
H5 label builder shifts distance_class by +1 into a 5-way one-hot
(data_save.py:108), which overflows for the room sets' "other" class (the
Auditorium speakers at 3.97 m and 5.49 m would crash it). Our packer
clamps "other" into the farthest bin by default (other_policy="clamp") —
a documented deviation that makes the reverberant sets trainable.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.xcorr import cross_correlation_feature
from .labels import DIST_CLASSES, N_SECTORS, N_DIST_CLASSES
from .synth import (_next_pow2, add_diffuse_noise, assemble_batch,
                    select_segments)


def dist_class_5(dist_m: float, other_thresh: float = 3.0) -> int:
    """0..3 nearest prototype if <= thresh, else 4 ('other')."""
    if dist_m > other_thresh:
        return 4
    return int(np.argmin(np.abs(DIST_CLASSES - dist_m)))


# Auditorium3 fixed loudspeaker geometry (generate_auditorium_data.py:56-65)
AUDITORIUM3_SPEAKER_XY = np.array([
    [0.00, 3.97], [4.30, 3.42], [2.20, -1.94],
    [0.00, 1.50], [-0.75, 1.30], [0.75, 1.30],
])

# Spirit room: 3 loudspeakers at ~2 m (generate_spirit_data.py:57-61)
SPIRIT_SPEAKER_XY = np.array([
    [-1.00, 1.73], [0.00, 2.00], [1.00, 1.73],
])

# Room-scene distance labelling constants (generate_spirit_data.py:37-41).
OTHER_THRESH_M = 3.0
OTHER_CLASS_ID = 4

SCENE_SPEAKER_XY = {
    "auditorium": AUDITORIUM3_SPEAKER_XY,
    "room": AUDITORIUM3_SPEAKER_XY,          # legacy alias
    "spirit": SPIRIT_SPEAKER_XY,
}


def scene_speaker_xy(scene: str, n_emitters: int) -> np.ndarray:
    """Loudspeaker (x, y) table for a named room scene, checked against the
    BRIR's emitter count. A Spirit SOFA must get Spirit geometry — wrong
    coordinates mean wrong distances AND wrong world azimuths (the
    reference ships one generator per room: generate_auditorium_data.py:56-65,
    generate_spirit_data.py:57-63)."""
    key = str(scene).lower()
    if key not in SCENE_SPEAKER_XY:
        raise ValueError(f"unknown room scene {scene!r}; "
                         f"known: {sorted(SCENE_SPEAKER_XY)}")
    xy = SCENE_SPEAKER_XY[key]
    if n_emitters > len(xy):
        raise ValueError(
            f"scene {scene!r} defines {len(xy)} loudspeakers but the BRIR "
            f"bank has {n_emitters} emitters — wrong scene for this SOFA?")
    return xy[:n_emitters]


class ReverbSynthesizer:
    """Batched on-device sampler over a head-rotation BRIR bank.

    ir:          (M, 2, E, L) BRIRs at `fs`
    head_yaw:    (M,) head yaw per measurement (deg)
    speaker_xy:  (E, 2) loudspeaker positions (m), head at origin
    segments:    (P, >= fs) clean speech pool
    """

    def __init__(self, ir, head_yaw, speaker_xy, segments, fs: int = 16000,
                 max_sources: int = 3, other_policy: str = "clamp",
                 num_lags: int = 100, noise_snr_db=None):
        self.noise_snr_db = (None if noise_snr_db is None
                             else (float(noise_snr_db[0]),
                                   float(noise_snr_db[1])))
        ir = np.asarray(ir, np.float32)
        M, R, E, L = ir.shape
        assert R == 2
        self.fs = int(fs)
        self.max_sources = int(max_sources)
        self.num_lags = int(num_lags)
        self._out_sharding = None
        self.ir_len = L
        self.n_speakers = E

        speaker_xy = np.asarray(speaker_xy, np.float64)
        sp_dist = np.sqrt((speaker_xy ** 2).sum(1))
        sp_az_world = np.degrees(np.arctan2(speaker_xy[:, 1],
                                            speaker_xy[:, 0])) % 360.0
        yaw = np.asarray(head_yaw, np.float64) % 360.0

        # rel_az(m, e), sector(m, e), norm_angle(m, e) — all host tables.
        rel = (sp_az_world[None, :] - yaw[:, None]) % 360.0
        width = 360.0 / N_SECTORS
        sec = np.clip(np.floor(rel / width).astype(np.int64), 0,
                      N_SECTORS - 1)
        norm = np.minimum((rel - sec * width + 1e-3) / width, 1.0)

        dcls = np.array([dist_class_5(d) for d in sp_dist], np.int64)
        # Host-side metadata tables for sample_batch_meta (the offline
        # writer's label-fidelity path: true distances, head yaw, true
        # 5-class ids including "other").
        self._yaw_np = yaw.astype(np.float64)                 # (M,)
        self._sp_dist_np = sp_dist.astype(np.float64)         # (E,)
        self._sp_az_world_np = sp_az_world.astype(np.float64)  # (E,)
        self._rel_np = rel.astype(np.float64)                 # (M, E)
        self._dcls_np = dcls                                  # (E,) true class
        if other_policy == "clamp":
            onehot_idx = np.minimum(dcls + 1, N_DIST_CLASSES - 1)
        elif other_policy == "strict":
            if (dcls + 1 >= N_DIST_CLASSES).any():
                raise ValueError(
                    "'other' distance class overflows the 5-way one-hot "
                    "(the reference's label builder would crash here); use "
                    "other_policy='clamp'")
            onehot_idx = dcls + 1
        else:
            raise ValueError(f"unknown other_policy {other_policy!r}")

        # Small tables stay numpy (embed as constants); the big banks are
        # device-resident and passed as ARGUMENTS into the jitted sampler —
        # captured device arrays would need a bulk device->host read at
        # trace time, which this image's TPU tunnel cannot do.
        self._sector_np = sec.astype(np.int32)                # (M, E)
        self._norm_np = norm.astype(np.float32)               # (M, E)
        self._onehot_np = onehot_idx.astype(np.int32)         # (E,)
        self._fft_len = _next_pow2(self.fs + L - 1)
        segments = np.asarray(segments, np.float32)
        self._seg_len = segments.shape[1]
        if self._seg_len < self.fs:
            raise ValueError("segments must be at least 1 s long")
        self.n_measurements = M
        self._mxu_select = (self.fs % 128 == 0)
        if self._mxu_select and segments.shape[1] % 128:
            segments = np.pad(
                segments, ((0, 0), (0, 128 - segments.shape[1] % 128)))
        self._bank = {"segments": jax.device_put(segments)}
        # BRIR spectra precomputed once when they fit comfortably in HBM:
        # computing rfft(L) per (source, step) inside the sampler doubles
        # the pipeline's FFT count. f32 re/im planes (the tunnel transfers
        # f32 only); complex is formed on device.
        F = self._fft_len // 2 + 1
        self._precomputed_H = (M * 2 * E * F * 8) <= 2 << 30
        if self._precomputed_H:
            H = np.fft.rfft(ir, n=self._fft_len)              # (M, 2, E, F)
            self._bank["H_re"] = jax.device_put(H.real.astype(np.float32))
            self._bank["H_im"] = jax.device_put(H.imag.astype(np.float32))
        else:
            self._bank["ir"] = jax.device_put(ir)             # (M, 2, E, L)

    def _one(self, bank, key, n_src_fixed: int):
        fs, E, MS = self.fs, self.n_speakers, self.max_sources
        ks = jax.random.split(key, 7)

        m = jax.random.randint(ks[0], (), 0, self.n_measurements)
        if n_src_fixed > 0:
            n_src = jnp.int32(n_src_fixed)
        else:
            n_src = jax.random.randint(ks[1], (), 1, MS + 1)

        spk_sector = jnp.asarray(self._sector_np)[m]        # (E,)
        # occupied sectors -> randomised-priority top-MS distinct choice
        occ = jnp.zeros(N_SECTORS, bool).at[spk_sector].set(True)
        n_valid = jnp.sum(occ.astype(jnp.int32))
        n_eff = jnp.minimum(n_src, n_valid)
        prio = jax.random.uniform(ks[2], (N_SECTORS,)) + jnp.where(occ, 0.0,
                                                                   -1e9)
        chosen_sectors = jnp.argsort(-prio)[:MS]            # (MS,)
        active = jnp.arange(MS) < n_eff

        # one speaker per chosen sector, preferring unused speakers —
        # sequential over the <= 3 slots (static unroll), exactly the
        # reference's used_speakers preference with fallback.
        def pick(used, j):
            cand = spk_sector == chosen_sectors[j]          # (E,)
            r = jax.random.uniform(jax.random.fold_in(ks[3], j), (E,))
            score = r + jnp.where(cand, 0.0, -1e9) + jnp.where(used, -1e3,
                                                               0.0)
            s = jnp.argmax(score)
            return used.at[s].set(True), s

        used = jnp.zeros(E, bool)
        speakers = []
        for j in range(MS):
            used, s = pick(used, j)
            speakers.append(s)
        speakers = jnp.stack(speakers)                      # (MS,)

        seg_idx = jax.random.randint(ks[4], (MS,), 0,
                                     bank["segments"].shape[0])
        if self._mxu_select:
            qoff = jax.random.randint(
                ks[5], (MS,), 0, (self._seg_len - fs) // 128 + 1)
            segs = select_segments(bank["segments"], seg_idx, qoff, fs)
        else:
            seg_off = jax.random.randint(ks[5], (MS,), 0,
                                         self._seg_len - fs + 1)
            segs = jax.vmap(lambda si, so: jax.lax.dynamic_slice(
                bank["segments"][si], (so,), (fs,)))(seg_idx, seg_off)

        def one_source(s, seg):
            X = jnp.fft.rfft(seg, n=self._fft_len)
            if self._precomputed_H:
                H = jax.lax.complex(bank["H_re"][m, :, s, :],
                                    bank["H_im"][m, :, s, :])     # (2, F)
            else:
                H = jnp.fft.rfft(bank["ir"][m, :, s, :], n=self._fft_len)
            y = jnp.fft.irfft(X[None, :] * H, n=self._fft_len)
            return y[:, :fs]                                # truncate, no crop

        src = jax.vmap(one_source)(speakers, segs)          # (MS, 2, fs)
        y_lr = jnp.sum(src * active[:, None, None], axis=0)
        peak = jnp.maximum(jnp.max(jnp.abs(y_lr)), 1e-8)
        y_lr = 0.9 * y_lr / peak                            # :339-341

        # labels, scatter-free — chosen sectors are distinct, and an
        # inactive slot's one-hot row equals the base row (see synth.py)
        maskf = active.astype(jnp.float32)
        # HIGHEST on the label einsums: angle targets must not be
        # bf16-rounded by the default MXU mode (see synth.py)
        hi = jax.lax.Precision.HIGHEST
        sec1 = jax.nn.one_hot(chosen_sectors, N_SECTORS, dtype=jnp.float32)
        sound = jnp.einsum("ms,m->s", sec1, maskf, precision=hi)
        angle = jnp.einsum("ms,m->s", sec1,
                           jnp.asarray(self._norm_np)[m, speakers] * maskf,
                           precision=hi)
        base = jnp.concatenate(
            [jnp.ones((N_SECTORS, 1)),
             jnp.zeros((N_SECTORS, N_DIST_CLASSES - 1))], axis=1)
        rows = jax.nn.one_hot(
            jnp.where(active, jnp.asarray(self._onehot_np)[speakers], 0),
            N_DIST_CLASSES)
        covered = jnp.sum(sec1, axis=0)
        onehot = (base * (1.0 - covered)[:, None]
                  + jnp.einsum("ms,mc->sc", sec1, rows, precision=hi))
        y = jnp.concatenate(
            [sound[:, None], angle[:, None], onehot], axis=1).reshape(-1)
        # slot metadata, all float32 (this image's TPU tunnel only
        # transfers f32; hosts re-derive int fields from these)
        meta = {"head_index": jnp.float32(m),
                "speaker_id": speakers.astype(jnp.float32),    # (MS,)
                "sector_id": chosen_sectors.astype(jnp.float32),
                "active": maskf}
        return y_lr[0], y_lr[1], y, meta

    def set_output_sharding(self, sharding) -> None:
        """See AnechoicSynthesizer.set_output_sharding."""
        self._out_sharding = sharding

    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
    def _batch(self, bank, key, batch_size: int, n_src_fixed: int,
               out_sharding=None):
        return assemble_batch(self._one, bank, key, batch_size, n_src_fixed,
                              self.fs, self.num_lags, out_sharding,
                              noise_snr_db=self.noise_snr_db)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _batch_meta(self, bank, key, batch_size: int, n_src_fixed: int):
        keys = jax.random.split(key, batch_size)
        wavL, wavR, y, meta = jax.vmap(
            lambda k: self._one(bank, k, n_src_fixed))(keys)
        if self.noise_snr_db is not None:
            # same fold_in stream as assemble_batch so meta batches match
            # sample_batch bit-for-bit at the same key
            yn = add_diffuse_noise(jax.random.fold_in(key, 2**20),
                                   jnp.stack([wavL, wavR], axis=1),
                                   self.noise_snr_db)
            wavL, wavR = yn[:, 0], yn[:, 1]
        x3 = cross_correlation_feature(wavL, wavR, self.fs,
                                       num_lags=self.num_lags)
        return wavL, wavR, x3, y, meta

    def sample_batch(self, key, batch_size: int, n_src: int | None = None):
        return self._batch(self._bank, key, batch_size,
                           0 if n_src is None else int(n_src),
                           self._out_sharding)

    @property
    def bank(self):
        """Device-array bank — pass into the caller's jit as an argument
        (see AnechoicSynthesizer.bank for the tunnel constraint)."""
        return self._bank

    def batch_fn(self, batch_size: int, n_src: int | None = None):
        """Pure (bank, key) -> batch closure for use INSIDE a caller's jit
        — see AnechoicSynthesizer.batch_fn."""
        nsf = 0 if n_src is None else int(n_src)
        return functools.partial(assemble_batch, self._one,
                                 batch_size=batch_size, n_src_fixed=nsf,
                                 fs=self.fs, num_lags=self.num_lags,
                                 out_sharding=self._out_sharding,
                                 noise_snr_db=self.noise_snr_db)

    def sample_batch_meta(self, key, batch_size: int,
                          n_src: int | None = None):
        """Like sample_batch plus a per-sample metadata dict (head index,
        chosen speaker/sector per slot, active mask) — enough for an offline
        writer to emit reference-fidelity labels (true distance_m, head yaw,
        5-class ids including 'other'; generate_spirit_data.py:380-404)."""
        return self._batch_meta(self._bank, key, batch_size,
                                0 if n_src is None else int(n_src))


def make_test_brir_bank(n_yaw: int = 24, ir_len: int = 1200, seed: int = 0,
                        speaker_xy=None, fs: int = 16000):
    """Synthetic room bank: direct path with azimuth-dependent ITD/ILD plus
    an exponentially decaying diffuse tail. Lets reverb tests run without
    the Auditorium/Spirit SOFA files."""
    rng = np.random.default_rng(seed)
    if speaker_xy is None:
        speaker_xy = AUDITORIUM3_SPEAKER_XY
    speaker_xy = np.asarray(speaker_xy, np.float64)
    E = len(speaker_xy)
    yaw = np.linspace(-90.0, 90.0, n_yaw) % 360.0
    az_world = np.degrees(np.arctan2(speaker_xy[:, 1],
                                     speaker_xy[:, 0])) % 360.0
    dist = np.sqrt((speaker_xy ** 2).sum(1))

    ir = np.zeros((n_yaw, 2, E, ir_len), np.float32)
    for mi in range(n_yaw):
        for e in range(E):
            rel = np.deg2rad((az_world[e] - yaw[mi]) % 360.0)
            itd = 0.0007 * np.sin(rel)
            base = 10 + int(dist[e] * fs / 343.0) % 40
            dl = base + max(0, int(round(-itd * fs)))
            dr = base + max(0, int(round(itd * fs)))
            gl = (1.0 + 0.4 * np.sin(rel)) / (1.0 + dist[e])
            gr = (1.0 - 0.4 * np.sin(rel)) / (1.0 + dist[e])
            ir[mi, 0, e, dl:dl + 16] = gl * np.exp(-np.arange(16) / 3.0)
            ir[mi, 1, e, dr:dr + 16] = gr * np.exp(-np.arange(16) / 3.0)
            tail_start = base + 40
            tail = rng.standard_normal(ir_len - tail_start) * np.exp(
                -np.arange(ir_len - tail_start) / (0.08 * fs))
            ir[mi, :, e, tail_start:] += 0.05 * tail / (1.0 + dist[e])
    return ir, yaw, speaker_xy
