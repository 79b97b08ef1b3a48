"""End-to-end offline data-prep pipeline over a synthetic data dir.

Drives the four prep CLIs IN ORDER exactly as dataset.md prescribes
(reference dataset.md:1-22; download_youtube is unexercisable offline):

    align_audio_midi -> midi_to_numpy -> compute_metrics -> generate_split

on a tiny two-song dataset where the "song audio" is the MIDI synthesized
with a linear tempo warp — so alignment has real work to do and every
artifact (warp path, aligned MIDI, numpy notes, metrics, split) can be
checked for shape and sanity.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from music2midi_tpu.audio import write_wav
from music2midi_tpu.midi import MidiFile
from music2midi_tpu.utils import numpy_to_midi

SR = 22050


def _song_notes(seed: int, n: int = 24, dur: float = 12.0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    on = np.sort(rng.uniform(0, dur - 1.0, n))
    length = rng.uniform(0.3, 0.9, n)
    pitch = rng.integers(48, 84, n)
    vel = rng.integers(60, 100, n)
    return np.stack([on, on + length, pitch, vel], axis=1)


N_SONGS = 4  # generate_split needs >= 3 survivors


def _two_track_midi(notes: np.ndarray) -> MidiFile:
    """The reference keeps only 2-track MIDIs (generate_split.py filter):
    melody in track 0, a simple bass line in track 1."""
    from music2midi_tpu.midi import Instrument, Note

    midi = numpy_to_midi(notes)
    bass = Instrument(program=0, name="bass")
    for on in np.arange(0.0, notes[:, 1].max(), 2.0):
        bass.notes.append(
            Note(start=float(on), end=float(on + 1.0), pitch=36,
                 velocity=70)
        )
    midi.instruments.append(bass)
    return midi


@pytest.fixture(scope="module")
def prep_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("prep")
    (d / "audio").mkdir()
    (d / "midi").mkdir()
    (d / "metadata").mkdir()
    for i in range(N_SONGS):
        pid = f"song{i}"
        notes = _song_notes(seed=10 + i)
        midi = _two_track_midi(notes)
        midi.write(d / "midi" / f"{pid}.mid")
        # the "real" song: same MIDI but 8% slower -> warped timing
        warped = notes.copy()
        warped[:, :2] *= 1.08
        y = _two_track_midi(warped).synthesize(fs=SR).astype(np.float32)
        peak = np.abs(y).max()
        if peak > 0:
            y = 0.7 * y / peak
        write_wav(d / "audio" / f"{pid}.wav", y, SR)
        with open(d / "metadata" / f"{pid}.yaml", "w") as f:
            yaml.safe_dump(
                {
                    "piano": {
                        "id": pid,
                        "genre": "pop",
                        "difficulty": "beginner",
                    },
                },
                f,
            )
    return d


def _run(module_name: str, argv, monkeypatch):
    import importlib

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "data"))
    try:
        mod = importlib.import_module(module_name)
        monkeypatch.setattr(sys, "argv", argv)
        mod.main()
    finally:
        sys.path.pop(0)


def test_prep_pipeline_end_to_end(prep_dir, monkeypatch):
    cfg = str(Path(__file__).resolve().parent.parent / "config.yaml")
    d = str(prep_dir)

    _run("align_audio_midi", ["align_audio_midi.py", d, "--config", cfg,
                              "--workers", "2"], monkeypatch)
    for pid in ("song0", "song1", "song2", "song3"):
        wp = np.load(prep_dir / "warp_path" / f"{pid}.npy")
        assert wp.shape[0] == 2 and wp.shape[1] > 10
        aligned = MidiFile(prep_dir / "midi_aligned" / f"{pid}.mid")
        assert len(aligned.instruments[0].notes) > 0
        meta = yaml.safe_load(open(prep_dir / "metadata" / f"{pid}.yaml"))
        assert meta["metrics"]["opt_chroma_shift"] == 0
        # aligned onsets should land near the warped (1.08x) times
        orig = MidiFile(prep_dir / "midi" / f"{pid}.mid")
        o0 = orig.instruments[0].notes[0].start
        a0 = aligned.instruments[0].notes[0].start
        assert abs(a0 - 1.08 * o0) < 0.35, (o0, a0)

    _run("midi_to_numpy", ["midi_to_numpy.py", d, "--workers", "2"],
         monkeypatch)
    for pid in ("song0", "song1", "song2", "song3"):
        arr = np.load(prep_dir / "midi_numpy" / f"{pid}.npy")
        assert arr.ndim == 2 and arr.shape[1] == 4
        assert (arr[:, 1] >= arr[:, 0]).all()

    # metrics.csv goes to the CURRENT directory (reference parity quirk:
    # /root/reference/data/compute_metrics.py:108 does the same)
    monkeypatch.chdir(prep_dir)
    _run("compute_metrics", ["compute_metrics.py", d, "--config", cfg],
         monkeypatch)
    assert (prep_dir / "metrics.csv").exists()
    meta = yaml.safe_load(open(prep_dir / "metadata" / "song0.yaml"))
    for key in ("wp_std", "max_beat_fluctuation", "max_note_density",
                "time_diff_ratio"):
        assert key in meta["metrics"], meta["metrics"]

    _run("generate_split", ["generate_split.py", d, "--config", cfg],
         monkeypatch)
    split = np.load(prep_dir / "dataset_split.npz", allow_pickle=True)
    assert len(split["train_id"]) >= 1
    ids = set(np.concatenate(
        [split["train_id"], split["val_id"], split["test_id"]]
    ).tolist())
    assert ids <= {f"song{i}" for i in range(N_SONGS)} and len(ids) >= 3


def test_synthesize_corpus_resume_deterministic(tmp_path, monkeypatch):
    """A resumed synthesize_corpus run (some songs already on disk) must
    produce byte-identical audio and metadata for the remaining songs as
    a fresh run with the same seed — per-song rng streams, so
    skip-if-exists cannot shift which draws a song receives."""
    fresh, resumed = tmp_path / "fresh", tmp_path / "resumed"
    argv = ["synthesize_corpus.py", None, "--songs", "3",
            "--duration", "4", "--seed", "5"]
    for d in (fresh, resumed):
        argv[1] = str(d)
        _run("synthesize_corpus", list(argv), monkeypatch)
    # simulate a partial run: drop songs 1-2 everywhere, rerun
    for pid in ("synth001", "synth002"):
        (resumed / "audio" / f"{pid}.wav").unlink()
        (resumed / "metadata" / f"{pid}.yaml").unlink()
        (resumed / "midi" / f"{pid}.mid").unlink()
    argv[1] = str(resumed)
    _run("synthesize_corpus", list(argv), monkeypatch)
    for pid in ("synth000", "synth001", "synth002"):
        for sub, name in (("audio", f"{pid}.wav"),
                          ("metadata", f"{pid}.yaml"),
                          ("midi", f"{pid}.mid")):
            a = (fresh / sub / name).read_bytes()
            b = (resumed / sub / name).read_bytes()
            assert a == b, f"{sub}/{name} differs between fresh and resume"


def test_synthesize_corpus_hard_profile(tmp_path, monkeypatch):
    """--profile hard (VERDICT r3 #6 mix realism) renders interference
    stems the score does NOT contain — the audio must differ strongly
    from the clean render of the same composition, stay finite/bounded,
    and still carry the piano (the aligner smoke runs in the chain)."""
    import numpy as np

    from music2midi_tpu.audio import load as load_audio

    argv = ["synthesize_corpus.py", None, "--songs", "1",
            "--duration", "8", "--seed", "5"]
    for profile, sub in (("clean", "c"), ("hard", "h")):
        d = tmp_path / sub
        argv[1] = str(d)
        _run("synthesize_corpus",
             argv + ["--profile", profile], monkeypatch)
        assert (d / "audio" / "synth000.wav").exists()
    yc, sr = load_audio(tmp_path / "c" / "audio" / "synth000.wav")
    yh, _ = load_audio(tmp_path / "h" / "audio" / "synth000.wav")
    assert np.all(np.isfinite(yh)) and np.abs(yh).max() <= 1.0
    n = min(len(yc), len(yh))
    # same composition, very different mix: correlation well below 1
    c = np.corrcoef(yc[:n], yh[:n])[0, 1]
    assert abs(c) < 0.9, c
    # the midi targets are IDENTICAL across profiles (realism must not
    # leak into the labels)
    a = (tmp_path / "c" / "midi" / "synth000.mid").read_bytes()
    b = (tmp_path / "h" / "midi" / "synth000.mid").read_bytes()
    assert a == b

def test_synthesize_corpus_fullmix_profile(tmp_path, monkeypatch):
    """--profile fullmix (VERDICT r4 #5 real-recording transfer): the
    produced-track render must differ strongly from the clean render of
    the same composition, stay finite/bounded, put substantial energy in
    the sub-bass band the clean profile lacks, and leave the label MIDI
    byte-identical."""
    import numpy as np

    from music2midi_tpu.audio import load as load_audio

    argv = ["synthesize_corpus.py", None, "--songs", "1",
            "--duration", "8", "--seed", "5"]
    for profile, sub in (("clean", "c"), ("fullmix", "f")):
        d = tmp_path / sub
        argv[1] = str(d)
        _run("synthesize_corpus",
             argv + ["--profile", profile], monkeypatch)
        assert (d / "audio" / "synth000.wav").exists()
    yc, sr = load_audio(tmp_path / "c" / "audio" / "synth000.wav")
    yf, _ = load_audio(tmp_path / "f" / "audio" / "synth000.wav")
    assert np.all(np.isfinite(yf)) and np.abs(yf).max() <= 1.0
    n = min(len(yc), len(yf))
    c = np.corrcoef(yc[:n], yf[:n])[0, 1]
    assert abs(c) < 0.9, c

    def band_frac(y):
        spec = np.abs(np.fft.rfft(y.astype(np.float64))) ** 2
        freqs = np.fft.rfftfreq(len(y), 1 / sr)
        return float(spec[freqs < 120].sum() / max(spec.sum(), 1e-30))

    # the synth bass dominates the low end (house-loop energy profile)
    assert band_frac(yf) > 2 * band_frac(yc), (band_frac(yf), band_frac(yc))
    a = (tmp_path / "c" / "midi" / "synth000.mid").read_bytes()
    b = (tmp_path / "f" / "midi" / "synth000.mid").read_bytes()
    assert a == b


def test_bus_compress_reduces_dynamics():
    """The mix-bus compressor must reduce the loud/quiet RMS ratio of a
    bursty signal (pumping), preserve length/finiteness, and act mostly
    on the loud section."""
    import numpy as np

    sc = _synth_mod()
    sr = 22050
    t = np.arange(2 * sr) / sr
    y = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    y[: sr] *= 0.9   # loud first half
    y[sr:] *= 0.05   # quiet second half
    out = sc._bus_compress(y, sr)
    assert out.shape == y.shape and np.all(np.isfinite(out))

    def rms(x):
        return float(np.sqrt(np.mean(x**2)))

    ratio_in = rms(y[: sr]) / rms(y[sr:])
    ratio_out = rms(out[: sr]) / rms(out[sr:])
    assert ratio_out < 0.7 * ratio_in, (ratio_in, ratio_out)


def _synth_mod():
    import importlib

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "data"))
    try:
        return importlib.import_module("synthesize_corpus")
    finally:
        sys.path.pop(0)


def test_render_piano_timbre_properties():
    """The realistic-piano voice must differ from the training additive
    synth exactly where a real piano does: partials past the 3rd
    harmonic, velocity-dependent brightness, amplitude decay, and a
    damper tail after key release — while keeping the fundamental at
    the note's true pitch (labels stay valid)."""
    from music2midi_tpu.midi import Instrument, MidiFile, Note

    sc = _synth_mod()
    sr = 22050

    def one_note(vel):
        m = MidiFile()
        inst = Instrument(program=0)
        inst.notes.append(Note(start=0.0, end=1.5, pitch=69, velocity=vel))
        m.instruments = [inst]
        return m

    y = sc.render_piano(one_note(90), sr, np.random.default_rng(0))
    assert np.all(np.isfinite(y)) and np.abs(y).max() <= 1.0 + 1e-6
    # rendered length covers the damper tail past note-off
    assert len(y) >= int(1.6 * sr)

    def spectrum(sig, lo_t, hi_t):
        seg = sig[int(lo_t * sr):int(hi_t * sr)].astype(np.float64)
        spec = np.abs(np.fft.rfft(seg)) ** 2
        freqs = np.fft.rfftfreq(len(seg), 1 / sr)
        return spec, freqs

    spec, freqs = spectrum(y, 0.05, 1.05)
    # fundamental AT A440 (k=1 inharmonic stretch is < 0.1%)
    assert 430 < freqs[np.argmax(spec)] < 452

    def band_frac(spec, freqs, lo, hi):
        return float(spec[(freqs >= lo) & (freqs < hi)].sum()
                     / max(spec.sum(), 1e-30))

    # energy at the 4th partial (~1760+ Hz with stretch) — the additive
    # training synth (3 exact harmonics) has essentially none there
    y_add = one_note(90).synthesize(fs=sr)
    spec_a, freqs_a = spectrum(y_add, 0.05, 1.05)
    p4 = band_frac(spec, freqs, 1700, 1900)
    p4_add = band_frac(spec_a, freqs_a, 1700, 1900)
    assert p4 > 1e-4 and p4 > 10 * p4_add, (p4, p4_add)

    # velocity brightness: the loud note carries a larger HF fraction
    y_soft = sc.render_piano(one_note(40), sr, np.random.default_rng(0))
    y_loud = sc.render_piano(one_note(120), sr, np.random.default_rng(0))
    s_soft, f_soft = spectrum(y_soft, 0.05, 1.05)
    s_loud, f_loud = spectrum(y_loud, 0.05, 1.05)
    assert (band_frac(s_loud, f_loud, 1500, 9000)
            > 1.5 * band_frac(s_soft, f_soft, 1500, 9000))

    def rms(sig, lo_t, hi_t):
        seg = sig[int(lo_t * sr):int(hi_t * sr)]
        return float(np.sqrt(np.mean(seg ** 2)))

    # strings decay while held...
    assert rms(y, 1.0, 1.3) < rms(y, 0.05, 0.35)
    # ...and the damper kills them fast after key release at 1.5 s
    assert rms(y, 1.55, 1.65) < 0.5 * rms(y, 1.35, 1.45)


def test_make_timbre_eval_corpus(tmp_path, monkeypatch):
    """tools/make_timbre_eval.py re-renders ONLY the chosen split with the
    piano voice, byte-verifies its seed derivation against the source
    corpus, symlinks labels/metadata verbatim, and fails loudly on a
    wrong seed."""
    import runpy

    src = tmp_path / "src"
    cfg = str(Path(__file__).resolve().parent.parent / "config.yaml")
    _run("synthesize_corpus",
         ["synthesize_corpus.py", str(src), "--songs", "4",
          "--duration", "12", "--seed", "5"], monkeypatch)
    _run("align_audio_midi",
         ["align_audio_midi.py", str(src), "--config", cfg,
          "--workers", "2"], monkeypatch)
    _run("midi_to_numpy",
         ["midi_to_numpy.py", str(src), "--workers", "2"], monkeypatch)
    monkeypatch.chdir(src)
    _run("compute_metrics",
         ["compute_metrics.py", str(src), "--config", cfg], monkeypatch)
    _run("generate_split",
         ["generate_split.py", str(src), "--config", cfg], monkeypatch)

    split = np.load(src / "dataset_split.npz", allow_pickle=True)
    use = "test" if len(split["test_id"]) else "train"
    ids = [str(p) for p in split[f"{use}_id"]]
    assert ids

    tool = str(Path(__file__).resolve().parent.parent / "tools"
               / "make_timbre_eval.py")
    dst = tmp_path / "piano"
    monkeypatch.setattr(sys, "argv", [
        "make_timbre_eval.py", str(src), str(dst), "--split", use,
        "--seed", "5", "--duration", "12"])
    runpy.run_path(tool, run_name="__main__")

    from music2midi_tpu.audio import load as load_audio

    for pid in ids:
        wav = dst / "audio" / f"{pid}.wav"
        assert wav.exists() and not wav.is_symlink()
        # labels and metadata are the SOURCE files, not copies
        npy = dst / "midi_numpy" / f"{pid}.npy"
        assert npy.is_symlink() and npy.resolve() == (
            src / "midi_numpy" / f"{pid}.npy").resolve()
        assert (dst / "metadata" / f"{pid}.yaml").is_symlink()
        # same composition, different voice: timing-aligned but far from
        # a copy of the source render
        ya, _ = load_audio(src / "audio" / f"{pid}.wav")
        yb, _ = load_audio(wav)
        n = min(len(ya), len(yb))
        assert abs(len(ya) - len(yb)) < 22050 // 2
        assert abs(np.corrcoef(ya[:n], yb[:n])[0, 1]) < 0.95

    # split file is carried over verbatim
    s2 = np.load(dst / "dataset_split.npz", allow_pickle=True)
    assert list(s2[f"{use}_id"]) == list(split[f"{use}_id"])

    # wrong seed must fail the byte-identity derivation check
    monkeypatch.setattr(sys, "argv", [
        "make_timbre_eval.py", str(src), str(tmp_path / "bad"),
        "--split", use, "--seed", "6", "--duration", "12"])
    with pytest.raises(SystemExit, match="seed-derivation check FAILED"):
        runpy.run_path(tool, run_name="__main__")
