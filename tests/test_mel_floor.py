"""r5clamp — per-bin mel noise floor (PERFORMANCE.md, the pre-declared
alternative after r5dither step 3 failed its quality-neutrality bar).

`LogMelConfig.noise_floor_sigma` / `Music2MIDI.mel_noise_floor` clamps
each mel bin at the EXPECTED mel power of an RMS-sigma white gaussian
noise floor (the training corpora's synthesize_corpus --noise default,
0.003) before the log.  Unlike the waveform dither it touches ONLY
inputs below the training floor — digital silence and zero-pad tails,
the r4 noise-floor OOD class — and leaves in-domain audio bit-unchanged
(the property the dither measurably lacked: -0.0066 clean / -0.0216
hard paired split deltas).

Reference contract: generate() must work on arbitrary serving uploads
(/root/reference/music2midi/model.py:84, /root/reference/webui.py:53-61;
the clamp enters at the same point as the reference's own
clamp(min=1e-6), /root/reference/music2midi/input.py:15-41).
"""

from pathlib import Path

import numpy as np
import pytest

CKPTS = Path(__file__).resolve().parent.parent / "checkpoints"
SIGMA = 0.003


def _cfg(sigma=SIGMA):
    from music2midi_tpu.ops.mel import LogMelConfig

    return LogMelConfig(noise_floor_sigma=sigma)


def test_floor_matches_empirical_noise_power():
    """noise_mel_floor == the measured mean mel power of white noise at
    the same sigma (the derivation, not just the shape)."""
    from music2midi_tpu.ops.mel import (
        frame_signal, mel_filterbank, noise_mel_floor,
    )
    import jax.numpy as jnp

    cfg = _cfg()
    floor = noise_mel_floor(cfg)
    rng = np.random.default_rng(0)
    wave = jnp.asarray(
        (rng.standard_normal((4, 16000)) * SIGMA).astype(np.float32)
    )
    frames = frame_signal(wave, cfg)
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    fb = jnp.asarray(mel_filterbank(
        cfg.n_fft // 2 + 1, cfg.f_min, cfg.sample_rate / 2.0, cfg.n_mels,
        cfg.sample_rate,
    ))
    mel = np.asarray(jnp.einsum("bfk,km->bfm", power, fb))
    emp = mel.mean(axis=(0, 1))
    live = floor > cfg.log_floor * 1.01  # skip empty filter columns
    ratio = emp[live] / floor[live]
    # ~250 frames of chi^2 fluctuation around the analytic mean
    assert 0.8 < float(np.median(ratio)) < 1.25, float(np.median(ratio))


def test_clamp_only_lifts_below_floor_bins():
    """Clamp ON == clamp OFF wherever the signal sits above the floor;
    everywhere else it only lifts.  In-domain audio (tone + a >= sigma
    noise floor, i.e. every training wav) is bit-unchanged in its
    above-floor bins."""
    from music2midi_tpu.ops.mel import log_mel_spectrogram, noise_mel_floor

    cfg_on, cfg_off = _cfg(), _cfg(0.0)
    rng = np.random.default_rng(1)
    t = np.arange(32000) / 16000.0
    wave = (
        0.3 * np.sin(2 * np.pi * 440.0 * t)
        + SIGMA * rng.standard_normal(len(t))
    ).astype(np.float32)[None]
    on = np.asarray(log_mel_spectrogram(wave, cfg_on))
    off = np.asarray(log_mel_spectrogram(wave, cfg_off))
    assert (on >= off - 1e-6).all()
    log_floor_bins = np.log(noise_mel_floor(cfg_on))
    above = off > log_floor_bins[None, None, :] + 1e-6
    # vacuity guards: the tone bins are above the floor in every frame,
    # and a healthy share of all bins is above (noise-only bins hover
    # AROUND the floor mean — chi^2 median < mean — so ~half sit below)
    tone_bin = int(off.mean(axis=(0, 1)).argmax())
    assert above[:, :, tone_bin].all()
    assert above.mean() > 0.2
    np.testing.assert_array_equal(on[above], off[above])


def test_digital_silence_lands_on_the_training_floor():
    """Zeros in -> exactly the per-bin floor out (not the 1e-6 clamp the
    fine-tunes never saw)."""
    from music2midi_tpu.ops.mel import log_mel_spectrogram, noise_mel_floor

    cfg = _cfg()
    wave = np.zeros((1, 48000), np.float32)
    out = np.asarray(log_mel_spectrogram(wave, cfg))
    expect = np.log(noise_mel_floor(cfg))
    np.testing.assert_allclose(
        out, np.broadcast_to(expect, out.shape), atol=1e-5
    )
    # and it is far above the old clamp
    assert float(out.min()) > np.log(1e-6) + 2.0


def test_pipeline_knob_rebinds_mel_config():
    from music2midi_tpu.infer import Music2MIDI

    m = Music2MIDI.from_random(seed=0, decode_max_length=8)
    assert m.mel_noise_floor == 0.0  # OFF per the r5clamp FAIL verdict
    # (-0.0261 paired hard200 delta — PERFORMANCE.md r5clamp Results)
    m.mel_noise_floor = SIGMA
    assert m.mel_config.noise_floor_sigma == pytest.approx(SIGMA)
    assert (
        m._generate_fn.keywords["mel_cfg"].noise_floor_sigma
        == pytest.approx(SIGMA)
    )
    m.mel_noise_floor = 0.0
    assert m._generate_fn.keywords["mel_cfg"].noise_floor_sigma == 0.0


@pytest.mark.slow
@pytest.mark.skipif(
    not (CKPTS / "music2midi_r4mix_avg4k.npz").exists(),
    reason="no committed r4mix fine-tune",
)
def test_clamp_restores_finetune_on_clean_audio_without_dither():
    """The same pinned regression pair as test_input_dither, closed by
    the clamp ALONE (dither off): the r4mix fine-tune returns zero notes
    on the clean A4 fixture bare, and passes the full calibration gate
    with mel_noise_floor=0.003."""
    import tempfile

    from music2midi_tpu.audio import write_wav
    from music2midi_tpu.calibration import check_midi, render_fixture
    from music2midi_tpu.infer import Music2MIDI

    wav, sr = render_fixture()
    model = Music2MIDI.from_npz(str(CKPTS / "music2midi_r4mix_avg4k.npz"))
    model.input_dither = 0.0
    with tempfile.TemporaryDirectory() as td:
        path = str(Path(td) / "a4_22050.wav")
        write_wav(path, wav, sr)
        bare = model.generate(audio_path=path)
        model.mel_noise_floor = SIGMA
        clamped = model.generate(audio_path=path)
    n_bare = sum(len(i.notes) for i in bare.instruments)
    ok, detail = check_midi(clamped)
    assert n_bare == 0, (
        "the r4 regression no longer reproduces bare "
        f"(got {n_bare} notes) — this test's premise changed, re-evaluate"
    )
    assert ok, f"mel_noise_floor=0.003 still fails the gate: {detail}"
