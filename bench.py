"""Headline benchmark: 3-minute songs per minute per chip.

Runs the full song->MIDI pipeline (audio chunking -> log-mel -> T5 encode ->
autoregressive greedy decode -> host detokenize/stitch) on the available
accelerator and prints ONE JSON line:

  {"metric": "songs_per_min_per_chip", "value": N,
   "unit": "3min_songs/min/chip", "vs_baseline": N / 6.25}

Baseline normalization: the driver's north-star target is >= 50 3-min
songs/min on a v5e-8 (BASELINE.md), i.e. 6.25 songs/min/chip.

No trained checkpoint ships with the reference repo, so the model is
randomly initialized; to keep the measurement honest the EOS logit is
disabled and every chunk decodes a fixed DECODE_TOKENS tokens — a
conservative stand-in for trained-model output lengths (typical 3-s chunks
emit ~30-150 tokens; we force 256).

Measured in bfloat16 — the TPU serving configuration (fp32 remains the
bit-parity mode).  Driver-conditions numbers on this tunneled-TPU stack:
~85 songs/min/chip, p50 song latency ~0.5 s (r1 driver capture: 85.33;
the relay adds 50-500 ms jitter per dispatch, hence median-of-5 over a
fully pre-warmed bucket set).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

DECODE_TOKENS = 256  # forced tokens per 3-s chunk (conservative)
N_SONGS = 8
SONG_SECONDS = 180


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--ckpt", type=str, default=os.environ.get("M2M_BENCH_CKPT"),
        help="trained checkpoint (orbax dir or torch .ckpt). With a "
             "checkpoint the bench measures the REAL serving operating "
             "point: EOS early-exit decode at the config's full "
             "decode_max_length instead of forced 256 tokens/chunk "
             "(VERDICT r2 weak #2)",
    )
    p.add_argument(
        "--max_decode", type=int, default=None,
        help="decode token cap per chunk (default: 1024 in trained mode, "
             "DECODE_TOKENS forced in random mode)",
    )
    p.add_argument(
        "--config", type=str, default=None,
        help="config for --ckpt. Default: an orbax checkpoint's EMBEDDED "
             "config; a torch .ckpt embeds none, so the packaged default "
             "(reference schema) is used — pass this explicitly for a "
             ".ckpt trained with a non-default architecture",
    )
    p.add_argument(
        "--int8_weights", action="store_true",
        help="int8 weight-only quantization of the decode projections "
             "(models/t5.py:_quantize_w) on top of the serving defaults",
    )
    p.add_argument(
        "--kv_bits", type=int, default=8, choices=[8, 4],
        help="quantized-KV width (4 = jnp.int4 experiment; see "
             "infer/decode.py DecodeConfig.kv_bits)",
    )
    p.add_argument(
        "--audio_dir", type=str, default=os.environ.get("M2M_BENCH_AUDIO"),
        help="directory of .wav songs for the trained-mode workload "
             "(default: synthetic sines, as in the random-weights mode); "
             "throughput is normalized to 3-min-song equivalents by "
             "total audio seconds",
    )
    return p.parse_args()


def main() -> None:
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from music2midi_tpu.infer import Music2MIDI

    if args.ckpt:
        from pathlib import Path

        # real operating point: trained weights, EOS early exit, full
        # config decode length — no forced-token floor.  config default
        # None: from_orbax then restores the checkpoint's EMBEDDED config
        # (evaluate.load_engine's ./config.yaml fallback would silently
        # override it from the repo root); a torch .ckpt embeds no config,
        # so None means the packaged reference-schema default there —
        # --config exists for non-default .ckpt architectures
        kw = {"dtype": jnp.bfloat16}
        if args.max_decode:
            kw["decode_max_length"] = args.max_decode
        p = Path(args.ckpt)
        if p.suffix in (".ckpt", ".pt"):
            engine = Music2MIDI.from_torch_checkpoint(p, args.config, **kw)
        else:
            engine = Music2MIDI.from_orbax(p, args.config, **kw)
    else:
        engine = Music2MIDI.from_random(
            seed=0,
            decode_max_length=args.max_decode or DECODE_TOKENS,
            dtype=jnp.bfloat16,
        )
        # suppress EOS inside the decode loop so every chunk decodes the
        # full DECODE_TOKENS (an earlier -1e9 lm_head-column hack made EOS
        # the argmax whenever sum(hidden) < 0 and let decode exit early,
        # inflating the benchmark)
        engine.suppress_tokens = (engine.t5_config.eos_token_id,)
    if args.int8_weights:
        engine.int8_weights = True
    engine.kv_bits = args.kv_bits  # != 8 implies quantized KV (_dcfg)
    engine.params = jax.device_put(engine.params)

    sr = int(engine.config.model.sample_rate)
    if args.audio_dir:
        from pathlib import Path

        from music2midi_tpu.audio import load as load_audio

        paths = sorted(Path(args.audio_dir).glob("*.wav"))[:N_SONGS]
        if not paths:
            raise SystemExit(f"no .wav files in {args.audio_dir}")
        songs = [load_audio(p, sr=sr)[0].astype(np.float32) for p in paths]
    else:
        rng = np.random.default_rng(0)
        t = np.arange(SONG_SECONDS * sr) / sr
        songs = [
            (0.3 * np.sin(2 * np.pi * (200 + 40 * k) * t)
             + 0.05 * rng.normal(size=len(t))).astype(np.float32)
            for k in range(N_SONGS)
        ]
    # 3-min-song equivalents: trained-mode corpora have shorter songs, so
    # normalize throughput by total audio time, not file count
    song_equivalents = sum(len(s) for s in songs) / sr / SONG_SECONDS

    # warmup: run the EXACT workload once so every bucket shape the timed
    # trials hit is compiled (a partial warmup left one bucket cold in r1)
    engine.generate_batch(songs)
    engine.generate(audio_y=songs[0])

    # 3 groups x 3 trials with gaps between groups: the relay's ambient
    # load swings throughput ~2x across minutes-scale windows (CLAUDE.md),
    # which back-to-back medians cannot see — the spread fields put error
    # bars on the headline (VERDICT r2 weak #1)
    trials = []
    for g in range(3):
        if g:
            time.sleep(10.0)
        for _ in range(3):
            t0 = time.perf_counter()
            midis = engine.generate_batch(songs)
            trials.append(time.perf_counter() - t0)
    elapsed = sorted(trials)[len(trials) // 2]
    n_notes = sum(  # noqa: F841 — random weights may yield zero notes;
        len(i.notes) for m in midis for i in m.instruments
    )  # the full pipeline still runs detokenize/stitch on every chunk
    tput = sorted(song_equivalents / (t / 60.0) for t in trials)

    # p50 single-song latency (BASELINE.md headline metric #2): one 3-min
    # song through the full generate() path, median of 5
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        engine.generate(audio_y=songs[0])
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50_latency = lat[len(lat) // 2]

    songs_per_min = song_equivalents / (elapsed / 60.0)
    result = {
        "metric": "songs_per_min_per_chip",
        "value": round(songs_per_min, 2),
        "unit": "3min_songs/min/chip",
        "vs_baseline": round(songs_per_min / 6.25, 3),
        "mode": "trained_eos" if args.ckpt else "random_forced256",
        "int8_weights": bool(args.int8_weights),
        "kv_bits": int(args.kv_bits),
        "n_notes": n_notes,
        "p50_song_latency_s": round(p50_latency, 3),
        "spread": {
            "n_trials": len(tput),
            "min": round(tput[0], 2),
            # nearest-rank on (n-1)*q so small n gives a trimmed value,
            # not a duplicate of min/max (9 trials -> indices 1 and 7)
            "p10": round(tput[round((len(tput) - 1) * 0.1)], 2),
            "p90": round(tput[round((len(tput) - 1) * 0.9)], 2),
            "max": round(tput[-1], 2),
        },
        "latency_spread_s": {
            "min": round(lat[0], 3), "max": round(lat[-1], 3),
        },
        # latency is for songs[0] as-is (3 min synthetic, or the first
        # corpus song's true length in trained mode)
        "latency_song_seconds": round(len(songs[0]) / sr, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
