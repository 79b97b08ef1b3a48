"""music2midi-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework that turns a
pop-song recording into a MIDI piano cover — a ground-up rebuild of the
capabilities of the reference `ytinyui/music2midi` repository.

Layering (mirrors SURVEY.md §1):
  config        — one YAML tree shared by every layer
  ops           — mel frontend (jnp + fused Pallas), device detokenizer
  tokenizer     — MIDI notes <-> 400-token event vocabulary
  models        — functional T5 encoder-decoder (HF-semantics parity)
  infer         — static-KV-cache decode + whole-song chunked pipeline
  train         — Adafactor (HF parity), pjit data-parallel step, orbax ckpt
  parallel      — device mesh + sharding rules
  data          — host input pipeline + offline prep CLIs
  midi / audio  — first-party SMF and waveform I/O (no pretty_midi/librosa)
  serve         — stdlib web UI
"""

__version__ = "0.1.0"

from .config import ConfigNode, default_config, load_config, resolve_config  # noqa: F401
from .tokenizer import BOS, EOS, OFFSET, ONSET, PAD, MidiTokenizer  # noqa: F401
