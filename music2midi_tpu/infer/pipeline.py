"""Whole-song inference: audio file/waveform -> MIDI piano cover.

Public API mirroring the reference `Music2MIDI.generate` / `sample_tokens`
(reference music2midi/model.py:67-140) with a TPU-first execution plan:

  * the song is zero-padded to a multiple of the 3-s window and reshaped to
    a (num_chunks, 48000) batch — chunk-as-batch is the sequence-scaling
    strategy (SURVEY.md §5 long-context): static shapes, embarrassingly
    parallel
  * chunk batches are padded up to a small set of bucket sizes so XLA
    compiles a handful of programs, then mel + conditioning + encoder +
    greedy decode run as ONE jitted TPU program per bucket
  * token sequences come back to host once per song and are stitched by the
    tokenizer's sequential mode (reference tokenizer.py:71-83)

Checkpoint loading accepts the functional param pytree, an orbax directory,
or the reference's PyTorch-Lightning .ckpt (via `models/convert.py`).
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import audio
from ..config import ConfigNode, resolve_config
from ..midi import MidiFile
from ..models.t5 import (
    T5Config,
    conditioning_prepend,
    encode,
    init_params,
    t5_config_from,
)
from ..ops.mel import (
    LogMelConfig,
    log_mel_config_from,
    log_mel_spectrogram,
    log_mel_spectrogram_fast,
)
from ..tokenizer import MidiTokenizer
from ..utils import numpy_to_midi
from .decode import DecodeConfig, generate_tokens

_BUCKET_SIZES = (8, 16, 32, 64, 128)


def enable_compilation_cache(
    cache_dir: str = "/tmp/m2m_jax_cache",
) -> None:
    """Persist compiled programs across processes — first-generate latency
    drops from ~60-100 s (remote compile) to seconds on warm cache."""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes", 0
    )


@functools.lru_cache(maxsize=4)
def _dither_tile(split_size: int) -> np.ndarray:
    """Unit-RMS gaussian dither tile for Music2MIDI.input_dither, shared
    by every chunk (dither needs an in-distribution noise floor, not
    independence across chunks — each 3-s chunk is a separate model
    input anyway).  Fixed seed: bit-deterministic across processes."""
    return np.random.default_rng(0xD17E12).standard_normal(
        split_size
    ).astype(np.float32)


def _bucket(n: int, cap: int) -> int:
    for b in _BUCKET_SIZES:
        if n <= b and b <= cap:
            return b
    return cap


class Music2MIDI:
    """Song -> MIDI inference engine.

    Example (mirrors demo.ipynb cell-4):
        model = Music2MIDI.from_torch_checkpoint("epoch=799.ckpt")
        midi = model.generate("song.wav")
        midi.write("cover.mid")
    """

    def __init__(
        self,
        params,
        config: Optional[Union[str, ConfigNode]] = None,
        dtype=jnp.float32,
        decode_max_length: int = 1024,
        device_detokenize: bool = True,
        use_compilation_cache: bool = True,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh with ("dp", "tp") axes — chunk
        batches shard over dp and attention-heads/FFN over tp, so one
        generate_batch call scales across a slice (inference-side
        counterpart of the training mesh; SURVEY.md §2.2)."""
        if use_compilation_cache:
            enable_compilation_cache()
        self.config = resolve_config(config)
        self.t5_config: T5Config = t5_config_from(self.config, dtype=dtype)
        self.mel_config: LogMelConfig = log_mel_config_from(self.config)
        self.tokenizer = MidiTokenizer(self.config)
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, param_shardings

            params = jax.device_put(params, param_shardings(mesh, params))
            self._batch_sharding = batch_sharding(mesh)
        self.params = params
        self.decode_max_length = decode_max_length
        self.suppress_tokens: tuple = ()  # e.g. (eos,) for length-forced
        # benchmarking; applied inside the decode loop
        # int8 KV caches (self + cross) in the decode loop: the decode
        # step is bandwidth-bound on the cache reads, int8 halves them
        # (see decode.py DecodeConfig).  Default: on in serving mode
        # (non-fp32 dtype), off in the fp32 bit-parity mode.  Set to
        # True/False to override.
        self.int8_kv: Optional[bool] = None
        # int8 weight-only quantization of the decode projections
        # (models/t5.py:_quantize_w).  OFF by default pending a measured
        # quality/latency result on a trained model; set True to enable.
        self.int8_weights: bool = False
        # v2 fused Pallas kernel for the cross-attention decode blocks
        # (ops/decode_attention.py:decode_attention_cross_t): int8 cross
        # KV stored transposed (B, H, D, L) for dense int8 tiles.  OFF
        # pending the TPU probe (tools/probe_cross_kernel.py); requires
        # int8 KV at 8 bits — silently ignored otherwise.
        self.pallas_cross: bool = False
        # quantized-KV width: 8 (int8, the serving default) or 4
        # (jnp.int4 EXPERIMENT — see decode.py DecodeConfig.kv_bits;
        # check quality with evaluate.py before serving with it)
        self.kv_bits: int = 8
        # decode steps per while-loop iteration (DecodeConfig.unroll):
        # the early-exit check runs every `unroll` steps, trading a few
        # overshoot tokens for fewer loop-condition broadcasts.  Greedy
        # tokens are UNCHANGED (finished rows keep emitting PAD inside a
        # chunk); measure with bench.py --unroll before serving with it
        self.unroll: int = 1
        # serving-side input normalization (r5dither, PERFORMANCE.md):
        # deterministic gaussian dither at the training corpora's own
        # noise RMS (data/synthesize_corpus.py --noise default 0.003),
        # added in _chunk_waveform — the single chokepoint shared by
        # generate / sample_notes / generate_batch — over the full
        # zero-padded chunk array.  Digitally-silent audio (and the
        # end-of-song pad region) otherwise drives log-mel to the 1e-6
        # clamp, an input mixed-domain fine-tunes never saw in training:
        # the r4mix/r4piano exports return ZERO notes on any waveform
        # without a noise floor (reference serving contract:
        # /root/reference/music2midi/model.py:84 — generate() must work
        # on arbitrary uploads, often noise-floor-free DAW exports).
        # Bit-deterministic (fixed-seed cached tile); int16 transport
        # preserves it (quantization step 3.05e-5 << 0.003).  Parity
        # tests feed pre-built chunks to sample_tokens_batched, which
        # has no dither site.  DEFAULT OFF since the r5 normalization
        # verdicts (PERFORMANCE.md r5dither step 3 / r5clamp): BOTH
        # serving-side normalizations failed their pre-declared
        # quality-neutrality bars on paired split deltas (dither
        # -0.0066 clean / -0.0216 hard; mel clamp -0.0261 hard), so
        # neither is on by default.  The r4 zero-notes OOD class stays
        # closed by (a) the model of record being calibration-passing
        # on bare weights and (b) tools/chain_lib.sh promote_record
        # running the calibration gate mechanically at serving defaults
        # before any promotion.  Set to 0.003 (the training corpora's
        # noise RMS) for checkpoints that need a training-matched floor.
        self.input_dither: float = 0.0
        # sampling decode variants (BASELINE config 3): 0.0 => greedy
        # (the parity mode); set temperature/top_k for stochastic covers
        self.temperature: float = 0.0
        self.top_k: int = 0
        self.sample_seed: int = 0
        self.device_detokenize = device_detokenize
        self.num_conditioning = len(self.config.conditioning)
        # per-dispatch decode accounting, refreshed by generate_batch
        # (always — the stats ride the result fetch) and by
        # _token_batches when collect_decode_stats is set (extra fetch):
        # [{"batch_width", "real_rows", "steps" (executed while_loop
        # trips = max EOS position in the batch), "tokens_real",
        # "row_steps" (per-real-row generated tokens)}].  bench.py's MFU
        # accounting reads this (profiling.decode_flops).
        self.last_decode_stats: List[dict] = []
        self.collect_decode_stats: bool = False
        self._dp = 1 if mesh is None else mesh.shape["dp"]
        self._generate_fn = functools.partial(
            _encode_and_generate,
            t5_cfg=self.t5_config,
            mel_cfg=self.mel_config,
        )

    @property
    def mel_noise_floor(self) -> float:
        """r5clamp serving floor (ops/mel.py:noise_mel_floor): clamp each
        mel bin at the expected power of an RMS-sigma white noise floor
        before the log.  Touches ONLY inputs below the training floor
        (digital silence, pad tails — the r4 noise-floor OOD class);
        above-floor bins are bit-unchanged, unlike input_dither.  BOTH
        knobs default OFF: the clamp FAILED its own pre-declared
        neutrality bar too (-0.0261 [-0.0370, -0.0155] paired hard200
        delta — the white-noise-derived floor is largest in the wide
        high-frequency mel bands, where hard-mix content is sparse;
        PERFORMANCE.md r5clamp Results).  0.0 = off."""
        return self.mel_config.noise_floor_sigma

    @mel_noise_floor.setter
    def mel_noise_floor(self, sigma: float) -> None:
        self.mel_config = self.mel_config._replace(
            noise_floor_sigma=float(sigma)
        )
        self._generate_fn = functools.partial(
            _encode_and_generate,
            t5_cfg=self.t5_config,
            mel_cfg=self.mel_config,
        )

    # ------------------------------------------------------------------ #
    # constructors                                                        #
    # ------------------------------------------------------------------ #

    @classmethod
    def from_torch_checkpoint(
        cls,
        ckpt_path: Union[str, Path],
        config: Optional[Union[str, ConfigNode]] = None,
        **kw,
    ) -> "Music2MIDI":
        """Load the reference's Lightning checkpoint (weight converter —
        SURVEY.md §5 checkpoint/resume)."""
        import torch

        from ..models.convert import reference_checkpoint_to_params

        blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        state_dict = blob.get("state_dict", blob)
        cfg = resolve_config(config)
        params = reference_checkpoint_to_params(
            state_dict, t5_config_from(cfg)
        )
        return cls(params, cfg, **kw)

    @classmethod
    def from_random(
        cls,
        config: Optional[Union[str, ConfigNode]] = None,
        seed: int = 0,
        **kw,
    ) -> "Music2MIDI":
        cfg = resolve_config(config)
        num_cond = tuple(len(v) for v in cfg.conditioning.values())
        # int seed: init_params derives the same entropy as PRNGKey(seed)
        # without creating (and round-tripping) a device array — the
        # first D2H of a cold process can stall on the relay
        params = init_params(seed, t5_config_from(cfg), num_cond)
        return cls(params, cfg, **kw)

    @classmethod
    def from_npz(
        cls,
        path: Union[str, Path],
        config: Optional[Union[str, ConfigNode]] = None,
        **kw,
    ) -> "Music2MIDI":
        """Load a single-file `save_params_npz` export — the repo's
        checkpoint-of-record format (the reference's equivalent artifact
        is `epoch=799-step=119200.ckpt`, /root/reference/demo.ipynb
        cell-0)."""
        from ..train.checkpoint import load_params_npz

        params, saved_cfg = load_params_npz(path)
        return cls(params, config if config is not None else saved_cfg, **kw)

    @classmethod
    def from_orbax(
        cls,
        ckpt_dir: Union[str, Path],
        config: Optional[Union[str, ConfigNode]] = None,
        **kw,
    ) -> "Music2MIDI":
        from ..train.checkpoint import restore_params

        params, saved_cfg = restore_params(ckpt_dir)
        return cls(params, config if config is not None else saved_cfg, **kw)

    def _encode_wave(self, batch: np.ndarray) -> np.ndarray:
        """Waveform transport encoding: int16 in serving (bfloat16) mode —
        lossless vs 16-bit source audio, halves the host->device upload;
        float32 in the bit-parity (float32) mode.

        The rounding uses the uint16-bias trick (add 32768.5, truncate,
        flip the sign bit) instead of `np.round`, which profiled at up to
        0.75 s of SERIAL host time per 8-song batch set under load — on
        the dispatch critical path.  Truncation after a float32 +32768.5
        bias is round-half-up rather than np.round's half-even; it can
        differ from np.round by 1 LSB on any value within float32
        representation rounding (~2e-3 near full scale) of a truncation
        boundary, not just exact .5 products.  Harmless: serving-mode
        only, and lossless for audio that was int16 at source (the
        device side just divides by 32768 either way)."""
        if self.t5_config.dtype == jnp.bfloat16:
            y = batch * 32768.0
            np.clip(y, -32768.0, 32767.0, out=y)
            y += 32768.5
            return (y.astype(np.uint16) ^ np.uint16(0x8000)).view(np.int16)
        return batch

    def _put(self, x):
        """Device placement honoring the inference mesh (batch over dp)."""
        if self._batch_sharding is not None:
            return jax.device_put(np.asarray(x), self._batch_sharding)
        return jnp.asarray(x)

    def _stage_wave(self, batch: np.ndarray, slices: int = 4):
        """Transport-encode + upload a chunk batch, pipelined in row
        slices so the int16 encode of slice i+1 overlaps the upload of
        slice i (the encode alone costs ~0.3 s for a 64-chunk batch
        in-process — a visible share of single-song p50 latency).  Falls
        back to the single-shot path under a mesh (sharded placement
        needs the whole array) or for tiny batches."""
        n = len(batch)
        if self._batch_sharding is not None or n < 2 * slices:
            return self._put(self._encode_wave(batch))
        bounds = np.linspace(0, n, slices + 1, dtype=int)
        parts = list(self._stage_pool.map(
            lambda se: jnp.asarray(
                self._encode_wave(batch[se[0]:se[1]])
            ),
            zip(bounds[:-1], bounds[1:]),
        ))
        return jnp.concatenate(parts, axis=0)

    @functools.cached_property
    def _stage_pool(self):
        """Persistent 2-thread staging pool (one dispatch per chunk batch
        would otherwise pay executor spawn/teardown on the latency path).
        Shut down when the engine is collected — otherwise every engine
        instance leaks two idle non-daemon threads for the process life."""
        import weakref
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=2)
        weakref.finalize(self, pool.shutdown, wait=False)
        return pool

    def cond_index_from_names(self, **names) -> List[int]:
        """Conditioning names -> indices, e.g.
        cond_index_from_names(genre="pop", difficulty="beginner") -> [1, 0]
        (categories from config.conditioning; reference evaluate.py:36-39
        does this lookup inline)."""
        out = []
        for key in self.config.conditioning.keys():
            values = list(self.config.conditioning[key])
            name = names.get(key, values[0])
            if name not in values:
                raise ValueError(
                    f"unknown {key} {name!r}; choices: {values}"
                )
            out.append(values.index(name))
        return out

    def _sample_rng(self, batch_start: int):
        """Per-batch sampling key (None in greedy mode)."""
        if self.temperature == 0.0:
            return None
        return jax.random.fold_in(
            jax.random.PRNGKey(self.sample_seed), batch_start
        )

    def _dcfg(self) -> DecodeConfig:
        int8 = self.int8_kv
        if int8 is None:
            int8 = self.t5_config.dtype != jnp.float32
        if self.kv_bits != 8:
            int8 = True  # a non-default width implies quantized KV
        return DecodeConfig(
            max_length=self.decode_max_length,
            temperature=self.temperature,
            top_k=self.top_k,
            suppress_tokens=self.suppress_tokens,
            quantize_cross_kv=bool(int8),
            quantize_self_kv=bool(int8),
            quantize_weights=bool(self.int8_weights),
            kv_bits=int(self.kv_bits),
            unroll=int(self.unroll),
            pallas_cross=bool(self.pallas_cross),
        )

    @property
    def encoder_len(self) -> int:
        """Encoder sequence length the fused programs run at: mel frames
        of one 3-s chunk + the prepended conditioning tokens (the L in
        profiling.decode_flops)."""
        from ..ops.mel import num_frames

        split = int(
            self.config.model.sample_rate
            * float(self.config.dataset.segment_duration)
        )
        return num_frames(split, self.mel_config) + self.num_conditioning

    def _bucket(self, n: int) -> int:
        b = _bucket(n, int(self.config.inference.batch_size))
        # batches must divide evenly over dp
        if b % self._dp:
            b = -(-b // self._dp) * self._dp
        return b

    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Pre-compile every inference program a serving process will hit
        (one fused program per chunk-bucket size x {generate,
        generate_batch} path).  First-compile latency on a cold remote
        compiler is 20-100 s per program — paying it at server start
        instead of on the first user request.  With the persistent
        compilation cache (enable_compilation_cache) later processes warm
        from disk in seconds."""
        max_bs = int(self.config.inference.batch_size)
        if buckets is None:
            # raw chunk counts — generate()/generate_batch apply their
            # own bucket rounding, so warming goes through the exact
            # code path serving uses.  max_bs itself is included: it is
            # the steady-state full-batch dispatch even when it is not
            # one of the standard bucket sizes
            buckets = sorted(
                {b for b in _BUCKET_SIZES if b <= max_bs} | {max_bs}
            )
        split = int(
            self.config.model.sample_rate
            * float(self.config.dataset.segment_duration)
        )
        for b in sorted(set(buckets)):
            silent = np.zeros(b * split, dtype=np.float32)
            # both dispatch paths: the fused detokenizing batch program
            # and the token-level program generate() uses
            self.generate_batch([silent])
            self.generate(audio_y=silent)

    # ------------------------------------------------------------------ #
    # inference                                                           #
    # ------------------------------------------------------------------ #

    def _chunk_waveform(self, waveform: np.ndarray) -> np.ndarray:
        """Zero-pad to a 3-s multiple and reshape to (n_chunks, split_size)
        (reference model.py:85-90) — single source of truth for the
        chunking semantics shared by sample_notes and generate_batch."""
        split_size = int(
            self.config.model.sample_rate
            * float(self.config.dataset.segment_duration)
        )
        wave = np.asarray(waveform, dtype=np.float32)
        n_chunks = max(1, -(-len(wave) // split_size))
        padded = np.zeros(n_chunks * split_size, dtype=np.float32)
        padded[: len(wave)] = wave
        chunks = padded.reshape(n_chunks, split_size)
        if self.input_dither > 0.0:
            # one cached unit-RMS gaussian tile per chunk (fixed seed =>
            # same waveform -> same output, across processes).  A single
            # vectorized add instead of a fresh per-call RNG draw: host
            # numpy crawls ~10x while the device runtime is live
            # (CLAUDE.md), and this sits on the single-song latency path.
            chunks = chunks + np.float32(self.input_dither) * \
                _dither_tile(split_size)
        return chunks

    def generate(
        self,
        audio_path: Optional[Union[str, Path]] = None,
        audio_y: Optional[np.ndarray] = None,
        sr: Optional[int] = None,
        cond_index: Optional[Sequence[int]] = None,
    ) -> MidiFile:
        """Song -> MidiFile (reference model.py:67-99 semantics: load at
        16 kHz, zero-pad to 3-s multiple, chunk, decode, stitch)."""
        if audio_path is None and audio_y is None:
            raise ValueError("Either audio_path or audio_y should be specified")
        model_sr = int(self.config.model.sample_rate)
        if sr is None:
            sr = model_sr
        elif sr != model_sr:
            raise ValueError(f"sr must be {model_sr}, got {sr}")
        if audio_y is None:
            audio_y, sr = audio.load(audio_path, sr=model_sr)
        audio_y = np.asarray(audio_y, dtype=np.float32)
        notes = self.sample_notes(audio_y, cond_index)
        return numpy_to_midi(notes)

    def sample_notes(
        self,
        waveform: np.ndarray,
        cond_index: Optional[Sequence[int]] = None,
    ) -> np.ndarray:
        """waveform (S,) at model sr -> stitched (N, 4) note array.

        Detokenization runs on device by default (ops/detokenize.py) so the
        token batch never serializes through the host state machine; the
        host-tokenizer path remains as a cross-checked fallback
        (device_detokenize=False)."""
        split_duration = float(self.config.dataset.segment_duration)
        chunks = self._chunk_waveform(waveform)
        n_steps = round(split_duration / self.tokenizer.time_step)
        if self.device_detokenize:
            from ..ops.detokenize import detokenize_to_host

            parts: List[np.ndarray] = []
            for start, tokens in self._token_batches(chunks, cond_index):
                b = tokens.shape[0]
                start_idx = (np.arange(start, start + b) * n_steps).astype(
                    np.int32
                )
                parts.extend(
                    detokenize_to_host(
                        tokens, start_idx, self.tokenizer.time_step
                    )
                )
            if not parts:
                return np.zeros((0, 4))
            return np.concatenate(parts)
        tokens_list = self.sample_tokens_batched(chunks, cond_index)
        return self.tokenizer.decode(
            tokens_list, mode="sequential", duration_per_batch=split_duration
        )

    def _token_batches(
        self,
        chunks: np.ndarray,  # (N, split_size)
        cond_index: Optional[Sequence[int]] = None,
    ):
        """Yield (global_chunk_start, device_tokens (n, max_len)) per batch —
        bucket-padded for compile-cache friendliness, pad rows trimmed."""
        max_bs = int(self.config.inference.batch_size)
        if cond_index is None:
            cond = np.zeros((self.num_conditioning,), dtype=np.int32)
        else:
            cond = np.asarray(cond_index, dtype=np.int32)
        dcfg = self._dcfg()
        self.last_decode_stats = []
        for start in range(0, len(chunks), max_bs):
            batch = chunks[start:start + max_bs]
            n = len(batch)
            b = self._bucket(n)
            if n < b:
                batch = np.concatenate(
                    [batch, np.zeros((b - n, batch.shape[1]), np.float32)]
                )
            cond_batch = np.broadcast_to(cond, (b, len(cond))).copy()
            tokens, lengths = self._generate_fn(
                self.params,
                self._stage_wave(batch),
                self._put(cond_batch),
                dcfg=dcfg,
                rng=self._sample_rng(start),
            )
            if self.collect_decode_stats:
                # opt-in here: unlike generate_batch (where the stats
                # ride the result fetch), this path would pay an EXTRA
                # relay round trip per batch on the latency-critical
                # generate() path
                len_h = np.asarray(jax.device_get(lengths))
                self.last_decode_stats.append({
                    "batch_width": int(len_h.shape[0]),
                    "real_rows": int(n),
                    "steps": int(len_h.max()) - 1,
                    "tokens_real": int(len_h[:n].sum()) - n,
                    "row_steps": (len_h[:n] - 1).tolist(),
                })
            yield start, tokens[:n]

    def generate_batch(
        self,
        waveforms: Optional[Sequence[np.ndarray]] = None,
        cond_indices: Optional[Sequence[Optional[Sequence[int]]]] = None,
        audio_paths: Optional[Sequence[Union[str, Path]]] = None,
    ) -> List[MidiFile]:
        """Throughput serving API: many songs -> many MidiFiles in ONE
        chunk stream.

        All songs' 3-s chunks are concatenated into full device batches
        (a 3-min song alone fills only half a 128-wide batch).  Songs are
        chunked INCREMENTALLY: a device batch is dispatched the moment
        enough chunks are buffered, so host chunking / int16 conversion /
        upload of later songs overlaps device compute of earlier ones, and
        every batch is dispatched before any result is collected — the
        "multiple songs in flight per chip" plan from SURVEY.md §7.

        Pass `audio_paths` instead of `waveforms` to also overlap host WAV
        decode + resampling with device compute (the loads are prefetched
        on a small thread pool in input order)."""
        if (waveforms is None) == (audio_paths is None):
            raise ValueError(
                "pass exactly one of waveforms / audio_paths"
            )
        split_duration = float(self.config.dataset.segment_duration)
        n_steps = round(split_duration / self.tokenizer.time_step)
        model_sr = int(self.config.model.sample_rate)

        if audio_paths is not None:
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            n_songs = len(audio_paths)
            pool = ThreadPoolExecutor(max_workers=4)

            def _prefetched(paths, window=8):
                # bounded look-ahead: decoded waveforms are ~11.5 MB per
                # 3-min song, so submitting every load up front would
                # buffer the whole set in host memory when decode
                # outpaces dispatch
                pending = deque()
                it = iter(paths)
                for p in it:
                    pending.append(pool.submit(audio.load, p, sr=model_sr))
                    if len(pending) >= window:
                        break
                while pending:
                    f = pending.popleft()
                    nxt = next(it, None)
                    if nxt is not None:
                        pending.append(
                            pool.submit(audio.load, nxt, sr=model_sr)
                        )
                    yield f.result()[0]

            wave_stream = _prefetched(audio_paths)
        else:
            pool = None
            n_songs = len(waveforms)
            wave_stream = iter(waveforms)
        if cond_indices is None:
            cond_indices = [None] * n_songs
        elif len(cond_indices) != n_songs:
            raise ValueError(
                f"cond_indices has {len(cond_indices)} entries for "
                f"{n_songs} songs"
            )

        max_bs = int(self.config.inference.batch_size)
        dcfg = self._dcfg()
        pending = []
        buf_chunks: List[np.ndarray] = []  # pending (<=max_bs) chunk rows
        buf_cond: List[np.ndarray] = []
        buf_idx: List[int] = []  # per-chunk local index within its song
        song_spans: List[tuple] = []
        n_chunks_total = 0

        def dispatch(batch, cond_b, idx_b, seq):
            n = len(batch)
            b = self._bucket(n)
            batch = np.stack(batch)
            cond_b = np.stack(cond_b)
            if n < b:
                batch = np.concatenate(
                    [batch, np.zeros((b - n, batch.shape[1]), np.float32)]
                )
                cond_b = np.concatenate(
                    [cond_b, np.zeros((b - n, cond_b.shape[1]), np.int32)]
                )
            start_idx = np.zeros(b, np.int32)
            start_idx[:n] = np.asarray(idx_b, np.int32) * n_steps
            notes, valid, lengths = _encode_generate_detokenize(
                self.params, self._stage_wave(batch),
                self._put(cond_b),
                self._put(start_idx),
                t5_cfg=self.t5_config, mel_cfg=self.mel_config, dcfg=dcfg,
                rng=self._sample_rng(seq),
            )
            return (n, notes, valid, lengths)

        # transport prep (stack + int16 encode, ~0.6 s per 128-chunk
        # batch measured IN-PROCESS — numpy crawls when the device
        # runtime is active) + dispatch run on ONE worker thread: numpy
        # releases the GIL, so prep overlaps both device compute and the
        # main thread's chunk buffering, and a single worker keeps
        # dispatch order (= result order) deterministic
        from concurrent.futures import ThreadPoolExecutor

        dispatcher = ThreadPoolExecutor(max_workers=1)
        try:
            for wave, cond in zip(wave_stream, cond_indices):
                song_chunks = self._chunk_waveform(wave)
                c = (
                    np.zeros(self.num_conditioning, np.int32)
                    if cond is None else np.asarray(cond, np.int32)
                )
                song_spans.append(
                    (n_chunks_total, n_chunks_total + len(song_chunks))
                )
                n_chunks_total += len(song_chunks)
                for k, row in enumerate(song_chunks):
                    buf_chunks.append(row)
                    buf_cond.append(c)
                    buf_idx.append(k)
                    if len(buf_chunks) == max_bs:
                        pending.append(dispatcher.submit(
                            dispatch, buf_chunks, buf_cond, buf_idx,
                            len(pending),
                        ))
                        buf_chunks, buf_cond, buf_idx = [], [], []
            if buf_chunks:
                pending.append(dispatcher.submit(
                    dispatch, buf_chunks, buf_cond, buf_idx, len(pending)
                ))
            # collect + trim on host while the device keeps working
            per_chunk: List[np.ndarray] = []
            self.last_decode_stats = []  # per dispatched batch: see below
            for fut in pending:
                n, notes, valid, lengths = fut.result()
                # ONE fetch for all three outputs — the stats ride along
                # with the transfer the results need anyway (each
                # round trip costs 50-500 ms on the relay)
                notes_h, valid_h, len_h = jax.device_get(
                    (notes, valid, lengths)
                )
                notes_h = np.asarray(notes_h).astype(np.float64)
                valid_h = np.asarray(valid_h)
                len_h = np.asarray(len_h)
                # the while_loop steps the WHOLE batch until its slowest
                # row (lockstep): max length == executed decode steps + 1
                # — the per-batch record bench.py's MFU accounting reads
                self.last_decode_stats.append({
                    "batch_width": int(len_h.shape[0]),
                    "real_rows": int(n),
                    "steps": int(len_h.max()) - 1,
                    "tokens_real": int(len_h[:n].sum()) - n,
                    # per-REAL-row generated-token counts: the
                    # model-required FLOPs view (standard MFU) needs the
                    # full distribution, not just the lockstep max
                    "row_steps": (len_h[:n] - 1).tolist(),
                })
                for i in range(n):
                    row = notes_h[i][valid_h[i]]
                    row[:, :2] *= self.tokenizer.time_step
                    per_chunk.append(row)
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
            # wait=True: an in-flight dispatch must finish before we
            # return, or its device work would interleave with whatever
            # the caller does next (e.g. an immediate retry) — exactly
            # the incoherence the single-worker design exists to prevent
            dispatcher.shutdown(wait=True, cancel_futures=True)

        out = []
        for start, end in song_spans:
            parts = per_chunk[start:end]
            notes = (np.concatenate(parts) if parts
                     else np.zeros((0, 4)))
            out.append(numpy_to_midi(notes))
        return out

    def sample_tokens_batched(
        self,
        chunks: np.ndarray,  # (N, split_size)
        cond_index: Optional[Sequence[int]] = None,
    ) -> List[np.ndarray]:
        """Token sequences per chunk, EOS-trimmed, on host."""
        out: List[np.ndarray] = []
        for _, tokens in self._token_batches(chunks, cond_index):
            arr = np.asarray(jax.device_get(tokens))
            for row in arr:
                eos = np.nonzero(row == self.t5_config.eos_token_id)[0]
                end = int(eos[0]) + 1 if len(eos) else len(row)
                out.append(row[:end].astype(np.int64))
        return out


@functools.partial(jax.jit, static_argnames=("t5_cfg", "mel_cfg", "dcfg"))
def _encode_and_generate(
    params,
    wave_chunks: jax.Array,  # (B, split_size)
    cond_index: jax.Array,  # (B, n_cond)
    t5_cfg: T5Config,
    mel_cfg: LogMelConfig,
    dcfg: DecodeConfig,
    rng: Optional[jax.Array] = None,
):
    """One TPU program: log-mel -> conditioning prepend -> encoder ->
    greedy/sampling decode (reference call stack 3.1, fused on device).

    wave_chunks may be int16 (x / 32768 semantics): host->device upload is
    the serving bottleneck on tunneled TPUs (~22 MB/s measured), and audio
    is 16-bit at the source anyway — int16 transport halves it losslessly.

    Mel path: fp32 (the bit-parity mode) uses the jnp FFT; every other
    dtype is serving mode and takes the fused Pallas FFT kernel on TPU."""
    if jnp.issubdtype(wave_chunks.dtype, jnp.integer):
        wave_chunks = wave_chunks.astype(jnp.float32) / 32768.0
    if t5_cfg.dtype == jnp.float32:
        mel = log_mel_spectrogram(wave_chunks, mel_cfg)
    else:
        mel = log_mel_spectrogram_fast(wave_chunks, mel_cfg)
    embeds = conditioning_prepend(params, mel, cond_index)
    enc = encode(params, embeds, t5_cfg)
    return generate_tokens(params, enc, t5_cfg, dcfg, rng=rng)


@functools.partial(jax.jit, static_argnames=("t5_cfg", "mel_cfg", "dcfg"))
def _encode_generate_detokenize(
    params,
    wave_chunks: jax.Array,  # (B, split_size)
    cond_index: jax.Array,  # (B, n_cond)
    start_idx: jax.Array,  # (B,) per-chunk time offset in steps
    t5_cfg: T5Config,
    mel_cfg: LogMelConfig,
    dcfg: DecodeConfig,
    rng: Optional[jax.Array] = None,
):
    """audio chunks -> (notes, valid) in ONE dispatch: mel, encoder,
    decode, and the on-device detokenizer fused into a single program —
    one host round trip per batch (the relay latency per dispatch is the
    dominant serving cost on this stack)."""
    from ..ops.detokenize import detokenize

    tokens, lengths = _encode_and_generate(
        params, wave_chunks, cond_index, t5_cfg, mel_cfg, dcfg, rng
    )
    notes, valid = detokenize(tokens, start_idx)
    return notes, valid, lengths
