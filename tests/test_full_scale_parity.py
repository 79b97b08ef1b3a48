"""Token parity vs HF transformers at the reference's REAL operating point.

test_e2e_parity pins 48-64-token decodes; the reference decodes up to 1024
tokens per chunk (/root/reference/music2midi/model.py:134) over 60+-chunk
songs with per-sequence EOS early exit (transformer.py:41-45).  These two
cases close that gap:

  * full length: decode_max_length=1024 with EOS suppressed on BOTH sides,
    so every relative-position bucket past step 64, the phased KV-cache
    growth chain (64 -> 128 -> ... -> 1024), and HF's max_length counting
    are all exercised and must agree token-for-token to position 1024.
  * multi-bucket song: a 130-chunk song (two device buckets: 128 + ragged
    2-padded-to-8) with natural EOS exits at staggered lengths — HF's
    all-finished early exit and post-EOS padding semantics vs the
    while_loop early exit, token-identical per chunk.

Both cases share MY mel frontend (as test_e2e_parity does), so the T5 stack
is the system under test.  Weights are seeded-random; for the natural-EOS
case the lm_head EOS column is biased so greedy hits EOS at realistic
lengths (30-150 tokens is the trained operating range, CLAUDE.md).
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # multi-minute: excluded by -m 'not slow'

import os

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")

import torch  # noqa: E402
from transformers import T5Config as HFT5Config  # noqa: E402
from transformers import T5ForConditionalGeneration  # noqa: E402

from music2midi_tpu.config import default_config  # noqa: E402
from music2midi_tpu.infer import Music2MIDI  # noqa: E402
from music2midi_tpu.models.convert import params_to_hf_state_dict  # noqa: E402
from music2midi_tpu.models.t5 import conditioning_prepend  # noqa: E402
from music2midi_tpu.ops.mel import log_mel_spectrogram  # noqa: E402

SR = 16000
CHUNK = 3 * SR


def _hf_from(engine):
    cfg_yaml = default_config()
    hf_cfg = HFT5Config(**cfg_yaml.model.t5.to_dict())
    hf_model = T5ForConditionalGeneration(hf_cfg).eval()
    sd = params_to_hf_state_dict(engine.params, engine.t5_config)
    hf_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    )
    return hf_model


def _embeds(engine, chunks: np.ndarray, cond: np.ndarray) -> np.ndarray:
    mel = np.asarray(log_mel_spectrogram(chunks, engine.mel_config))
    return np.asarray(conditioning_prepend(engine.params, mel, cond))


def _song_chunks(n_chunks: int, seed: int) -> np.ndarray:
    """Varied per-chunk content (chords / chirps / noise / silence) so the
    decode trajectories differ chunk to chunk."""
    rng = np.random.default_rng(seed)
    t = np.arange(CHUNK) / SR
    out = np.zeros((n_chunks, CHUNK), np.float32)
    for i in range(n_chunks):
        kind = i % 4
        if kind == 0:
            for f in rng.uniform(100, 1500, 3):
                out[i] += 0.2 * np.sin(2 * np.pi * f * t).astype(np.float32)
        elif kind == 1:
            f0, f1 = rng.uniform(100, 400), rng.uniform(600, 2000)
            out[i] = 0.4 * np.sin(
                2 * np.pi * (f0 + (f1 - f0) * t / t[-1] / 2) * t
            ).astype(np.float32)
        elif kind == 2:
            out[i] = rng.normal(0, 0.1, CHUNK).astype(np.float32)
        # kind == 3: silence
    return out


def test_full_length_1024_parity():
    """1024-token decode, EOS suppressed both sides.

    Token-for-token parity is required up to the first divergence, any
    divergence must lie beyond position 512 (so every relative-position
    bucket and the whole 64->128->...->1024 cache-phase chain is proven
    exact first), and the diverging position must be a certified argmax
    NEAR-TIE in HF's own logits (top-2 margin < 1e-3).  Rationale: after
    ~1000 greedy steps on random weights, fp32 op-ordering differences
    legitimately flip exact ties (observed: HF margin 1.7e-6 at position
    842, seed 11); a semantic bug (wrong bias bucket, cache corruption)
    diverges with a large margin and fails this gate."""
    engine = Music2MIDI.from_random(seed=11, decode_max_length=1024)
    eos = int(engine.t5_config.eos_token_id)
    engine.suppress_tokens = (eos,)
    hf_model = _hf_from(engine)

    chunks = _song_chunks(2, seed=5)
    cond = np.array([[2, 1]] * 2, np.int32)
    embeds = _embeds(engine, chunks, cond)
    with torch.no_grad():
        hf_tokens = hf_model.generate(
            inputs_embeds=torch.from_numpy(embeds),
            max_length=1024,
            do_sample=False,
            suppress_tokens=[eos],
        ).numpy()
    assert hf_tokens.shape[1] == 1024  # ran the full length

    mine = engine.sample_tokens_batched(chunks, cond_index=[2, 1])
    exact_chunks = 0
    for b in range(len(chunks)):
        assert len(mine[b]) == 1024, f"chunk {b}: early exit under suppression"
        mismatch = np.nonzero(mine[b] != hf_tokens[b])[0]
        if len(mismatch) == 0:
            exact_chunks += 1
            continue
        first = int(mismatch[0])
        assert first > 512, (
            f"chunk {b} diverges at position {first} <= 512 — inside the "
            f"bias-table/cache-phase region, not a late tie"
        )
        # certify the divergence is an argmax near-tie in HF's own logits
        with torch.no_grad():
            out = hf_model(
                inputs_embeds=torch.from_numpy(embeds[b:b + 1]),
                decoder_input_ids=torch.from_numpy(
                    hf_tokens[b][:first][None].astype(np.int64)
                ),
            )
        logits = out.logits[0, -1].numpy().astype(np.float64)
        logits[eos] = -np.inf
        top2 = np.sort(logits)[-2:]
        margin = float(top2[1] - top2[0])
        assert {int(mine[b][first]), int(hf_tokens[b][first])} <= set(
            np.argsort(logits)[-2:].tolist()
        ), f"chunk {b} pos {first}: diverging tokens are not the top-2"
        assert margin < 1e-3, (
            f"chunk {b} pos {first}: margin {margin:.3e} too large for a "
            f"tie — real divergence"
        )
    # at least one chunk must be exact at every one of the 1024 positions
    assert exact_chunks >= 1


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="~5 min CPU; run with RUN_SLOW=1 (result recorded in "
           "PERFORMANCE.md full-scale parity section)",
)
def test_multibucket_song_natural_eos_parity():
    """130-chunk song, EOS-biased weights -> staggered natural exits.
    Token-identical per chunk across both device buckets (128 + ragged
    2-padded-to-8).  Bias 0.3 x max|lm| was tuned to give a mix of
    immediate exits (len 7-10), mid exits (19-48), and never-EOS rows
    that run to max_length — covering EOS early-exit rows, post-EOS
    padding, HF's all-finished exit, and the 64->128->256 cache phases
    in one batch."""
    engine = Music2MIDI.from_random(seed=7, decode_max_length=256)
    eos = int(engine.t5_config.eos_token_id)
    # bias EOS so greedy terminates at realistic lengths on random weights
    import jax.numpy as jnp

    lm = np.asarray(engine.params["lm_head"]).copy()
    lm[:, eos] += 0.3 * np.abs(lm).max()
    engine.params["lm_head"] = jnp.asarray(lm)
    hf_model = _hf_from(engine)

    n_chunks = 130
    chunks = _song_chunks(n_chunks, seed=9)
    cond = np.array([[0, 0]] * n_chunks, np.int32)
    embeds = _embeds(engine, chunks, cond)
    with torch.no_grad():
        hf_tokens = hf_model.generate(
            inputs_embeds=torch.from_numpy(embeds),
            max_length=256,
            do_sample=False,
        ).numpy()

    mine = engine.sample_tokens_batched(chunks, cond_index=[0, 0])
    assert len(mine) == n_chunks

    lengths = []
    for b in range(n_chunks):
        hf_row = hf_tokens[b]
        if eos in hf_row:
            hf_row = hf_row[: list(hf_row).index(eos) + 1]
        np.testing.assert_array_equal(
            mine[b], hf_row, err_msg=f"chunk {b}"
        )
        lengths.append(len(mine[b]))
    lengths = np.asarray(lengths)
    # the point of the case: staggered EOS exits, rows past the first
    # 64-slot cache phase, and no degenerate all-identical trajectories
    assert lengths.min() >= 2
    assert len(np.unique(lengths)) >= 5, lengths
    assert lengths.max() > 64, f"nothing crossed a cache phase: {lengths}"
    assert (lengths < 256).sum() > 0 and (lengths == 256).sum() > 0
