"""Evaluation CLI — `python evaluate.py DATA_DIR --ckpt CKPT [--config
--name]`: per-song melody chroma accuracy over the test split, written to
scores/score-{name}.csv (reference evaluate.py:13-52, methodology
unchanged).

--ckpt accepts an orbax params/train dir or a reference PyTorch .ckpt.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd
import yaml


#: the committed trained artifact (README "Model of record"); CLIs fall
#: back to it when no --ckpt/--config is given, so a fresh clone
#: evaluates/serves real transcriptions instead of random weights
RECORD_CKPT = Path(__file__).resolve().parent / "checkpoints" \
    / "model_of_record.npz"


def load_engine(ckpt: str, config_path: str, dtype: str = "float32"):
    """dtype: float32 (bit-parity mode) | bfloat16 (TPU serving mode)."""
    import jax.numpy as jnp

    if ckpt is None and config_path is None and RECORD_CKPT.exists():
        print(f"no --ckpt given; using the model of record: {RECORD_CKPT}")
        ckpt = str(RECORD_CKPT)
    explicit_config = config_path is not None
    if config_path is None:
        config_path = (
            "config.yaml" if Path("config.yaml").exists() else None
        )

    from music2midi_tpu.infer import Music2MIDI

    jdtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
    if ckpt is None:
        # reachable when --config was given (the model-of-record default
        # only applies to a bare invocation: an explicit config may
        # describe a different architecture) or no record is committed
        print("WARNING: no checkpoint — running RANDOM weights; pass "
              "--ckpt (e.g. checkpoints/model_of_record.npz) for real "
              "transcriptions")
        return Music2MIDI.from_random(config=config_path, dtype=jdtype)
    p = Path(ckpt)
    if p.suffix == ".ckpt" or p.suffix == ".pt":
        return Music2MIDI.from_torch_checkpoint(p, config_path, dtype=jdtype)
    if p.suffix == ".npz":
        # honor the checkpoint's EMBEDDED config unless --config was
        # explicit: the ./config.yaml cwd fallback must not silently
        # override the architecture the weights were trained with
        return Music2MIDI.from_npz(
            p, config_path if explicit_config else None, dtype=jdtype
        )
    return Music2MIDI.from_orbax(p, config_path, dtype=jdtype)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_dir", type=str)
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument(
        "--config", type=str, default=None,
        help="config path (default: ./config.yaml if present, else the"
             " packaged default)")
    parser.add_argument("--name", type=str, default="music2midi")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument(
        "--int8_weights", action="store_true",
        help="int8 weight-only quantization of the decode projections "
             "(serving-mode ablation; models/t5.py:_quantize_w)")
    parser.add_argument(
        "--kv_bits", type=int, default=8, choices=[8, 4],
        help="quantized-KV width in serving mode (4 = jnp.int4 "
             "experiment; see infer/decode.py DecodeConfig.kv_bits)")
    parser.add_argument(
        "--dither", type=float, default=None,
        help="override Music2MIDI.input_dither (serving waveform dither "
             "RMS; see PERFORMANCE.md r5dither)")
    parser.add_argument(
        "--mel_floor", type=float, default=None,
        help="override Music2MIDI.mel_noise_floor (r5clamp per-bin mel "
             "noise floor sigma; see PERFORMANCE.md r5clamp)")
    parser.add_argument(
        "--split", type=str, default="test",
        choices=["test", "val", "train"],
        help="which dataset_split ids to score (test = the reference "
             "evaluation; train/val are overfit/selection diagnostics)")
    args = parser.parse_args()

    from music2midi_tpu.evaluation import evaluate_batch
    from music2midi_tpu.utils import numpy_to_midi

    data_dir = Path(args.data_dir)
    split = np.load(data_dir / "dataset_split.npz", allow_pickle=True)
    test_ids = split[f"{args.split}_id"]
    engine = load_engine(args.ckpt, args.config, args.dtype)
    if args.int8_weights:
        engine.int8_weights = True
    engine.kv_bits = args.kv_bits  # != 8 implies quantized KV (_dcfg)
    if args.dither is not None:
        engine.input_dither = args.dither
    if args.mel_floor is not None:
        engine.mel_noise_floor = args.mel_floor

    logs = []
    for i, piano_id in enumerate(test_ids):
        with open(data_dir / "metadata" / f"{piano_id}.yaml") as f:
            meta = yaml.safe_load(f)
        genre = meta["piano"]["genre"]
        difficulty = meta["piano"]["difficulty"]
        # the ENGINE's config (possibly embedded in the checkpoint) maps
        # names -> indices; resolving a separate config here could
        # silently disagree with the model's conditioning vocabulary
        cond_index = engine.cond_index_from_names(
            genre=genre, difficulty=difficulty
        )
        label_midi = numpy_to_midi(
            np.load(data_dir / "midi_numpy" / f"{piano_id}.npy")
        )
        audio_path = data_dir / "audio" / f"{piano_id}.wav"
        output_midi = engine.generate(
            audio_path=audio_path, cond_index=cond_index
        )
        score = evaluate_batch([label_midi], [output_midi])
        logs.append([piano_id, args.name, genre, difficulty, score])
        print(
            f"[{i + 1}/{len(test_ids)}] {piano_id}: score={score:.4f}"
        )

    df = pd.DataFrame(
        logs, columns=["piano_id", "model", "genre", "difficulty", "score"]
    )
    Path("scores").mkdir(exist_ok=True)
    out = f"scores/score-{args.name}.csv"
    df.to_csv(out, index=False)
    print(f"mean score: {df['score'].mean():.4f} -> {out}")


if __name__ == "__main__":
    main()
