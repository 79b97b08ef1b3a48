"""Training CLI — `python train.py DATA_DIR [--name --config --ckpt]`.

TPU-native replacement for the reference's Lightning trainer (reference
train.py:17-41): a pjit data-parallel train step over all local devices,
HF-parity Adafactor with relative-step warmup, orbax checkpointing with the
config embedded, JSONL + stdout logging (wandb attaches automatically when
installed), periodic in-training chroma-accuracy evaluation every
log_every_n_steps (reference model.py:40-42).
"""

from __future__ import annotations

import argparse
import faulthandler
import io
import json
import time

try:
    faulthandler.enable()  # SIGSEGV/SIGABRT dump Python stacks — a stalled
    # run can be diagnosed with `kill -ABRT <pid>` instead of dying silently
except io.UnsupportedOperation:
    pass  # stderr has no fileno under pytest capture; diagnostics-only
from datetime import datetime
from pathlib import Path

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_dir", type=str)
    parser.add_argument(
        "--name", type=str,
        default=datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
        help="name of the run",
    )
    parser.add_argument("--config", type=str, default="config.yaml")
    parser.add_argument(
        "--ckpt", type=str, default=None,
        help="checkpoint dir to resume training",
    )
    parser.add_argument(
        "--init_from", type=str, default=None,
        help="warm-start fine-tuning: initialize PARAMS from any "
             "checkpoint (npz export / save_params dir / training "
             "ckpt) with a fresh optimizer and step 0 — unlike --ckpt, "
             "which resumes the full training state",
    )
    parser.add_argument(
        "--run_id", type=str, default=None,
        help="wandb run id to resume (when wandb is installed)",
    )
    parser.add_argument("--out_dir", type=str, default="runs")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--tp", type=int, default=1,
        help="tensor-parallel degree (attention heads + FFN hidden are "
             "sharded megatron-style over the tp mesh axis)",
    )
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument(
        "--lr", type=float, default=None,
        help="fixed Adafactor lr (default: HF relative-step warmup "
             "schedule, the reference configuration)",
    )
    parser.add_argument("--eval_in_train", action="store_true",
                        help="chroma score on train batches every "
                             "log_every_n_steps (reference behavior)")
    parser.add_argument(
        "--steps_per_dispatch", type=int, default=1,
        help="optimizer steps fused into ONE device dispatch via lax.scan "
             "(train.loop.make_multi_step). >1 collapses the per-step "
             "host round trips — the right mode when dispatch latency, "
             "not device compute, bounds the loop (tunneled TPU relays). "
             "Optimizer trajectory identical to the per-step loop; "
             "loss logs per dispatch (not per log_every_n_steps) and "
             "validation runs at checkpoint boundaries",
    )
    parser.add_argument(
        "--device", type=str, default="auto", choices=["auto", "cpu"],
        help="cpu forces the CPU backend (jax.config, since env "
             "JAX_PLATFORMS alone is overridden by the TPU plugin's "
             "sitecustomize) — for smoke runs and relay-free training",
    )
    parser.add_argument(
        "--dtype", type=str, default="float32",
        choices=["float32", "bfloat16"],
        help="model compute dtype.  bfloat16 = mixed precision: matmuls "
             "and activations in bf16, parameters / gradients / Adafactor "
             "state and layer-norm + loss math stay fp32 (master weights "
             "fall out of the cast-per-op design).  float32 is the "
             "reference-parity configuration",
    )
    return parser.parse_args()


def evaluate_training_batch(engine_params, batch, cfg, t5_cfg, mel_cfg,
                            tokenizer, notes_batch):
    """Greedy-decode the training batch and chroma-score it (reference
    model.py:55-65: max_length = 4 * max notes)."""
    import jax.numpy as jnp

    from music2midi_tpu.evaluation import evaluate_batch as chroma
    from music2midi_tpu.infer.decode import DecodeConfig, generate_tokens
    from music2midi_tpu.models.t5 import conditioning_prepend, encode
    from music2midi_tpu.ops.mel import log_mel_spectrogram
    from music2midi_tpu.utils import numpy_to_midi

    max_notes = max(len(n) for n in notes_batch)
    max_len = min(1024, max(8, max_notes * 4))
    mel = log_mel_spectrogram(jnp.asarray(batch.waveform), mel_cfg)
    embeds = conditioning_prepend(
        engine_params, mel, jnp.asarray(batch.cond_index)
    )
    enc = encode(engine_params, embeds, t5_cfg)
    tokens, lengths = generate_tokens(
        engine_params, enc, t5_cfg, DecodeConfig(max_length=max_len)
    )
    tokens = np.asarray(tokens)
    decoded = tokenizer.decode([t for t in tokens], mode="batched")
    label_midi = [numpy_to_midi(n) for n in notes_batch]
    out_midi = [numpy_to_midi(n) for n in decoded]
    return chroma(label_midi, out_midi)


def main():
    args = parse_args()

    # multi-host slices: one process per host; init (guarded, no-op
    # single-host) must precede the first backend touch so jax.devices()
    # is the global list
    from music2midi_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from music2midi_tpu.config import load_config
    from music2midi_tpu.data import DataLoader, Music2MIDIDataset
    from music2midi_tpu.models import init_params, t5_config_from
    from music2midi_tpu.ops.mel import log_mel_config_from
    from music2midi_tpu.parallel import batch_sharding, make_mesh, param_shardings
    from music2midi_tpu.tokenizer import MidiTokenizer
    from music2midi_tpu.train import adafactor_hf, make_train_step
    from music2midi_tpu.train.checkpoint import (
        restore_train_state,
        save_train_state,
    )
    from music2midi_tpu.train.loop import (
        Batch,
        init_train_state,
        make_eval_step,
    )

    config = load_config(args.config)
    data_dir = Path(args.data_dir)
    split = np.load(data_dir / "dataset_split.npz", allow_pickle=True)
    train_set = Music2MIDIDataset(data_dir, split["train_id"], config)
    val_set = Music2MIDIDataset(data_dir, split["val_id"], config)
    dl_cfg = config.dataloader
    train_loader = DataLoader(
        train_set, batch_size=int(dl_cfg.batch_size),
        num_workers=int(dl_cfg.num_workers), shuffle=True, seed=args.seed,
    )
    val_loader = DataLoader(
        val_set, batch_size=int(dl_cfg.batch_size),
        num_workers=int(dl_cfg.num_workers), shuffle=False, seed=args.seed,
        # validation must see every sample: the default drop_last=True
        # silently yields ZERO batches (no val/loss at all) whenever the
        # val split is smaller than one batch (Lightning never drops on val)
        drop_last=False,
    )

    t5_cfg = t5_config_from(
        config,
        dtype={"float32": jnp.float32,
               "bfloat16": jnp.bfloat16}[args.dtype],
    )
    mel_cfg = log_mel_config_from(config)
    tokenizer = MidiTokenizer(config)
    num_cond = tuple(len(v) for v in config.conditioning.values())
    if args.init_from:
        # warm start: PARAMS ONLY from any checkpoint restore_params
        # accepts (npz export incl. the model of record, save_params
        # dir, training ckpt); optimizer state and step start fresh —
        # this is fine-tuning, not a resume (--ckpt is the resume path)
        from music2midi_tpu.train.checkpoint import restore_params

        params, ck_cfg = restore_params(args.init_from)
        if ck_cfg is not None:
            # fail with a clear message instead of an opaque shape error
            # at the first train step (dtype is a runtime choice, not an
            # architecture field — exclude it from the comparison)
            theirs = t5_config_from(ck_cfg, dtype=t5_cfg.dtype)
            if theirs != t5_cfg:
                raise SystemExit(
                    f"--init_from architecture mismatch: checkpoint has "
                    f"{theirs}, --config builds {t5_cfg}"
                )
        # train in fp32; keep any integer leaves (e.g. a quantized
        # export) bit-exact the way save_params_npz does.  bfloat16 is
        # dtype.kind "V" in numpy, so test for integer kinds, not float
        params = jax.tree.map(
            lambda x: np.asarray(x)
            if np.asarray(x).dtype.kind in "iu"
            else np.asarray(x, dtype=np.float32),
            params,
        )
        print(f"warm start: params from {args.init_from}")
    else:
        params = init_params(args.seed, t5_cfg, num_cond)

    # dp must divide the batch size; use the largest divisor that fits the
    # device count after carving out tp
    n_dev = len(jax.devices())
    tp = args.tp
    if n_dev % tp != 0:
        raise SystemExit(f"--tp {tp} does not divide {n_dev} devices")
    batch_size = int(dl_cfg.batch_size)
    dp = max(d for d in range(1, n_dev // tp + 1) if batch_size % d == 0)
    if dp * tp < n_dev:
        print(f"note: using {dp * tp}/{n_dev} devices (batch {batch_size} "
              f"not divisible by {n_dev // tp} with tp={tp})")
    mesh = make_mesh(jax.devices()[:dp * tp], dp=dp, tp=tp)
    print(f"mesh (dp={dp}, tp={tp}); placing params...", flush=True)
    params = jax.device_put(params, param_shardings(mesh, params))
    bshard = batch_sharding(mesh)

    optimizer = adafactor_hf(learning_rate=args.lr)
    accum = int(config.trainer.accumulate_grad_batches)
    if accum > 1:
        import optax

        optimizer = optax.MultiSteps(optimizer, every_k_schedule=accum)
    state = init_train_state(params, optimizer)
    if args.ckpt:
        state, _ = restore_train_state(args.ckpt, state)
        print(f"resumed from {args.ckpt} at step {int(state.step)}")

    step_fn = make_train_step(optimizer, t5_cfg, mel_cfg)
    eval_fn = make_eval_step(t5_cfg, mel_cfg)
    rng = jax.random.PRNGKey(args.seed)

    out_dir = Path(args.out_dir) / args.name.replace(" ", "_").replace(
        ":", "-"
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    log_file = open(out_dir / "log.jsonl", "a")

    wandb_run = None
    try:  # optional wandb (reference train.py:36-39)
        import wandb

        wandb_run = wandb.init(
            project="music2midi", name=args.name, id=args.run_id,
            config=config.to_dict(), resume="allow",
        )
    except Exception:
        pass

    def log(record: dict):
        record["time"] = time.time()
        log_file.write(json.dumps(record) + "\n")
        log_file.flush()
        if wandb_run is not None:
            wandb_run.log(record, step=record.get("step"))
        print({k: v for k, v in record.items() if k != "time"})

    log_every = int(config.trainer.log_every_n_steps)
    max_epochs = int(config.trainer.max_epochs)
    steps_per_epoch = max(1, len(train_loader))
    min_steps_between_saves = max(steps_per_epoch, log_every)
    # host-side step counter: fetching int(state.step) every step costs a
    # synchronous device->host round trip per step — on the tunneled-relay
    # stack that serializes the whole loop on dispatch latency (observed
    # 50 ms-minutes per round trip).  Steps between log points now dispatch
    # fully async; the ONLY sync is float(loss) at log boundaries.
    step = int(state.step)
    run_start_step = step
    last_saved = step
    t_start = time.time()

    # best-val checkpoint selection: out_dir/ckpt is always the LATEST
    # state (resume target); out_dir/ckpt_best tracks the lowest val loss
    # seen across the run AND its --ckpt resumes, so a long run that
    # overfits late still leaves its best model on disk.  Beyond the
    # reference (Lightning defaults keep only the last epoch, reference
    # train.py:40-41); the released checkpoint name epoch=799-step=119200
    # is a last-epoch artifact.
    #
    # The bar is persisted in ckpt_best/best_val.json: without it, a
    # resumed run restarts at best_val=inf, its first validation
    # unconditionally "wins", and save_train_state's keep=3 pruning can
    # delete the genuinely-best earlier checkpoint.
    best_val = float("inf")
    best_val_file = out_dir / "ckpt_best" / "best_val.json"
    if args.ckpt and best_val_file.exists():
        try:
            best_val = float(json.loads(
                best_val_file.read_text())["val_loss"])
            print(f"resumed best-val bar: {best_val:.6f}")
        except (ValueError, KeyError, TypeError) as e:
            print(f"ignoring unreadable {best_val_file}: {e!r}")

    def run_val(epoch=None):
        # epoch-cadence validation, shared by both dispatch modes (the
        # multi-step loop runs it at checkpoint boundaries so
        # --steps_per_dispatch doesn't drop the val/loss signal that
        # checkpoints are selected by)
        nonlocal best_val
        vals = [
            float(eval_fn(state.params, Batch(
                b.waveform, b.labels, b.cond_index)))
            for b in val_loader
        ]
        if vals:
            mean = float(np.mean(vals))
            rec = {"step": step, "val/loss": mean}
            if epoch is not None:
                rec["epoch"] = epoch
            if mean < best_val:
                best_val = mean
                save_train_state(out_dir / "ckpt_best", state, config)
                best_val_file.write_text(json.dumps(
                    {"val_loss": mean, "step": step}))
                rec["val/is_best"] = True
            log(rec)

    def save_ckpt():
        save_train_state(out_dir / "ckpt", state, config)

    if args.steps_per_dispatch > 1:
        from music2midi_tpu.parallel import stacked_batch_sharding
        from music2midi_tpu.train import make_multi_step

        K = args.steps_per_dispatch
        multi_fn = make_multi_step(optimizer, t5_cfg, mel_cfg)
        sshard = stacked_batch_sharding(mesh)

        def batch_stream():
            for _ in range(max_epochs):
                yield from train_loader

        def stack_group(group):
            # fixed label width: per-group max widths would recompile the
            # fused program for every distinct (K, L) shape.  384 covers
            # the densest legal 3-s window (90 notes x 4 tokens + EOS)
            max_l = max(384, max(b.labels.shape[1] for b in group))
            labels = np.full(
                (len(group),) + (group[0].labels.shape[0], max_l), -100,
                dtype=np.int32,
            )
            for i, b in enumerate(group):
                labels[i, :, : b.labels.shape[1]] = b.labels
            return Batch(
                np.stack([b.waveform for b in group]),
                labels,
                np.stack([b.cond_index for b in group]),
            )

        def log_group(pstep, plosses, pn, pparams, pbatch):
            # float(plosses[-1]) is the loop's only device->host sync;
            # callers pass the PREVIOUS dispatch here after the next one
            # is already in flight, so the fetch overlaps device compute
            # with host data staging instead of serializing them
            rec = {
                "step": pstep,
                "train/loss": float(plosses[-1]),
                "steps_per_sec": (pstep - run_start_step) / max(
                    1e-9, time.time() - t_start),
                "dispatch_steps": pn,
            }
            if pparams is not None:
                rec["train/score"] = evaluate_training_batch(
                    pparams, pbatch, config, t5_cfg, mel_cfg, tokenizer,
                    _notes_from_labels(pbatch.labels, tokenizer),
                )
            log(rec)

        stream = batch_stream()
        pending = None  # previous dispatch: (step, losses, n, params, batch)
        while True:
            group = []
            budget = K
            if args.max_steps:
                # a ragged final group (< K) compiles a second fused
                # program ONCE per run (the stream spans epochs, so there
                # is no per-epoch tail); padding it to K would take extra
                # optimizer steps and break max_steps exactness
                budget = min(K, args.max_steps - step)
            if budget <= 0:
                break
            for b in stream:
                group.append(b)
                if len(group) == budget:
                    break
            if not group:
                break  # max_epochs exhausted
            stacked = stack_group(group)
            dev = Batch(
                jax.device_put(stacked.waveform, sshard),
                jax.device_put(stacked.labels, sshard),
                jax.device_put(stacked.cond_index, sshard),
            )
            if pending is not None and pending[3] is not None:
                # eval_in_train pendings hold state.params — the next
                # multi_fn dispatch DONATES those exact buffers
                # (make_multi_step donate_argnums=(0,)), so they must be
                # consumed before the dispatch, not overlapped with it
                log_group(*pending)
                pending = None
            state, losses = multi_fn(state, dev, rng)
            step += len(group)
            if pending is not None:
                log_group(*pending)
            # eval_in_train mirrors the per-step path: score the updated
            # params on the most recent train batch (group tail)
            pending = (
                step, losses, len(group),
                state.params if args.eval_in_train else None,
                group[-1] if args.eval_in_train else None,
            )
            if step - last_saved >= min_steps_between_saves:
                log_group(*pending)
                pending = None
                run_val()
                save_ckpt()
                last_saved = step
        if pending is not None:
            log_group(*pending)
        if step > last_saved:
            run_val()
            save_ckpt()
        log({"step": step, "done": True})
        return

    try:
        for epoch in range(max_epochs):
            for batch in train_loader:
                dev_batch = Batch(
                    jax.device_put(batch.waveform, bshard),
                    jax.device_put(batch.labels, bshard),
                    jax.device_put(batch.cond_index, bshard),
                )
                state, loss = step_fn(state, dev_batch, rng)
                step += 1
                if step == 1:
                    # one deliberate sync: surfaces compile/first-contact
                    # stalls immediately instead of at the first log point
                    step = int(state.step)
                    print(f"first step done in {time.time() - t_start:.1f}s",
                          flush=True)
                if step % log_every == 0:
                    rec = {
                        "step": step, "epoch": epoch,
                        "train/loss": float(loss),
                        # steps THIS RUN over elapsed — `step` alone would
                        # inflate the rate after a --ckpt resume
                        "steps_per_sec": (step - run_start_step) / max(
                            1e-9, time.time() - t_start),
                    }
                    if args.eval_in_train:
                        rec["train/score"] = evaluate_training_batch(
                            state.params, batch, config, t5_cfg, mel_cfg,
                            tokenizer,
                            _notes_from_labels(batch.labels, tokenizer),
                        )
                    log(rec)
                if args.max_steps and step >= args.max_steps:
                    raise StopIteration
            # validation + checkpoint at epoch ends (reference cadence),
            # throttled so tiny datasets (one batch per epoch) don't spend
            # the run inside orbax saves
            if step - last_saved >= min_steps_between_saves:
                run_val(epoch)
                save_ckpt()
                last_saved = step
    except StopIteration:
        pass
    # final save: normal max_epochs completion must not drop the last
    # (< min_steps_between_saves) steps; the closing val pass scores the
    # final params (and seeds ckpt_best on short runs that never crossed
    # an epoch boundary), mirroring the multi-step path's exit sequence
    if step > last_saved:
        run_val()
        save_ckpt()
    log({"step": step, "done": True})


def _notes_from_labels(labels, tokenizer):
    out = []
    for row in np.asarray(labels):
        toks = row[row != -100]
        out.append(tokenizer.decode([toks])[0])
    return out


if __name__ == "__main__":
    main()
