"""Decode loop + whole-song pipeline tests (random weights, CPU)."""

import numpy as np
import pytest

from music2midi_tpu.config import default_config
from music2midi_tpu.infer import DecodeConfig, Music2MIDI
from music2midi_tpu.infer.decode import generate_tokens
from music2midi_tpu.midi import MidiFile
from music2midi_tpu.models import (
    decode_step,
    encode,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
    t5_config_from,
)


@pytest.fixture(scope="module")
def setup():
    import jax

    cfg = t5_config_from(default_config())
    params = init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(3)
    inputs_embeds = rng.normal(size=(3, 50, 384)).astype(np.float32)
    enc = encode(params, inputs_embeds, cfg)
    return params, cfg, enc


def test_while_loop_matches_python_loop(setup):
    import jax.numpy as jnp

    params, cfg, enc = setup
    max_len = 24
    tokens, lengths = generate_tokens(
        params, enc, cfg, DecodeConfig(max_length=max_len)
    )
    tokens = np.asarray(tokens)

    # manual python reference loop
    B = enc.shape[0]
    cross_kv = precompute_cross_kv(params, enc, cfg)
    cache = init_kv_cache(B, max_len, cfg)
    cur = np.full((B,), cfg.decoder_start_token_id, np.int32)
    ref = [cur.copy()]
    done = np.zeros(B, bool)
    for t in range(max_len - 1):
        logits, cache = decode_step(
            params, jnp.asarray(cur), jnp.int32(t), cache, cross_kv, cfg,
            max_len,
        )
        nxt = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
        nxt = np.where(done, cfg.pad_token_id, nxt)
        ref.append(nxt.copy())
        done |= nxt == cfg.eos_token_id
        cur = nxt
        if done.all():
            break
    ref_tokens = np.stack(ref, axis=1)
    np.testing.assert_array_equal(tokens[:, : ref_tokens.shape[1]], ref_tokens)
    # everything after is PAD
    assert (tokens[:, ref_tokens.shape[1]:] == cfg.pad_token_id).all()


def test_lengths_and_eos(setup):
    params, cfg, enc = setup
    tokens, lengths = generate_tokens(
        params, enc, cfg, DecodeConfig(max_length=32)
    )
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    for b in range(tokens.shape[0]):
        row = tokens[b]
        if cfg.eos_token_id in row:
            assert lengths[b] == list(row).index(cfg.eos_token_id) + 1
        else:
            assert lengths[b] == 32


def test_sampling_modes_run(setup):
    import jax

    params, cfg, enc = setup
    t1, _ = generate_tokens(
        params, enc, cfg, DecodeConfig(max_length=16, temperature=1.0),
        rng=jax.random.PRNGKey(0),
    )
    t2, _ = generate_tokens(
        params, enc, cfg,
        DecodeConfig(max_length=16, temperature=1.0, top_k=10),
        rng=jax.random.PRNGKey(1),
    )
    assert t1.shape == t2.shape == (3, 16)
    # greedy is deterministic regardless of rng
    g1, _ = generate_tokens(params, enc, cfg, DecodeConfig(max_length=16),
                            rng=jax.random.PRNGKey(0))
    g2, _ = generate_tokens(params, enc, cfg, DecodeConfig(max_length=16),
                            rng=jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


@pytest.fixture(scope="module")
def engine():
    return Music2MIDI.from_random(seed=0, decode_max_length=32)


def test_pipeline_end_to_end(engine, tmp_path):
    """4.5 s of audio -> 2 chunks -> MidiFile written to disk."""
    t = np.arange(int(4.5 * 16000)) / 16000
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    midi = engine.generate(audio_y=wave, sr=16000)
    assert isinstance(midi, MidiFile)
    path = tmp_path / "out.mid"
    midi.write(path)
    MidiFile(path)  # parses back


def test_pipeline_batch_padding_invariance(engine):
    """Tokens for a chunk must not depend on how the batch was padded."""
    rng = np.random.default_rng(0)
    chunks = rng.normal(size=(3, 48000)).astype(np.float32) * 0.1
    solo = engine.sample_tokens_batched(chunks[:1])
    batched = engine.sample_tokens_batched(chunks)
    np.testing.assert_array_equal(solo[0], batched[0])


def test_pipeline_cond_index_changes_encoder_input(engine):
    """cond_index selects different embedding rows prepended to the mel
    (reference input.py:50-59); token-level divergence is model-dependent,
    so assert at the encoder-input level and that the pipeline accepts the
    index end to end."""
    from music2midi_tpu.models.t5 import conditioning_prepend

    feats = np.zeros((1, 4, 384), np.float32)
    a = np.asarray(conditioning_prepend(
        engine.params, feats, np.array([[0, 0]], np.int32)))
    b = np.asarray(conditioning_prepend(
        engine.params, feats, np.array([[3, 2]], np.int32)))
    assert a.shape == (1, 6, 384)
    assert not np.allclose(a[0, :2], b[0, :2])
    np.testing.assert_array_equal(a[0, 2:], b[0, 2:])
    # and the full pipeline accepts cond_index
    rng = np.random.default_rng(1)
    chunks = rng.normal(size=(1, 48000)).astype(np.float32) * 0.1
    engine.sample_tokens_batched(chunks, cond_index=[3, 2])


def test_pipeline_rejects_wrong_sr(engine):
    with pytest.raises(ValueError):
        engine.generate(audio_y=np.zeros(1000, np.float32), sr=22050)


def test_device_vs_host_detokenize_equivalence():
    """The full pipeline must produce identical notes through the device
    detokenizer and the host tokenizer state machine."""
    dev_engine = Music2MIDI.from_random(seed=2, decode_max_length=48,
                                        device_detokenize=True)
    host_engine = Music2MIDI.from_random(seed=2, decode_max_length=48,
                                         device_detokenize=False)
    rng = np.random.default_rng(5)
    wave = (rng.normal(size=7 * 16000) * 0.2).astype(np.float32)
    a = dev_engine.sample_notes(wave)
    b = host_engine.sample_notes(wave)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_generate_batch_matches_single(engine):
    """generate_batch must produce the same notes as per-song generate."""
    rng = np.random.default_rng(9)
    songs = [
        (rng.normal(size=int(4.5 * 16000)) * 0.2).astype(np.float32),
        (rng.normal(size=int(7 * 16000)) * 0.2).astype(np.float32),
    ]
    conds = [[1, 1], None]
    batch_midis = engine.generate_batch(songs, conds)
    for song, cond, got in zip(songs, conds, batch_midis):
        want = engine.generate(audio_y=song, sr=16000, cond_index=cond)
        got_notes = [(n.start, n.end, n.pitch) for i in got.instruments
                     for n in i.notes]
        want_notes = [(n.start, n.end, n.pitch) for i in want.instruments
                      for n in i.notes]
        assert got_notes == want_notes


def test_generate_batch_on_8dev_mesh(engine):
    """Inference sharded over a (dp=4, tp=2) mesh matches single-device."""
    import jax

    from music2midi_tpu.parallel import make_mesh

    assert len(jax.devices()) == 8
    mesh = make_mesh(dp=4, tp=2)
    sharded = Music2MIDI(
        engine.params, decode_max_length=32, mesh=mesh,
        use_compilation_cache=False,
    )
    rng = np.random.default_rng(11)
    songs = [(rng.normal(size=9 * 16000) * 0.2).astype(np.float32)]
    a = sharded.generate_batch(songs)[0]
    b = engine.generate_batch(songs)[0]
    got = [(n.start, n.end, n.pitch) for i in a.instruments for n in i.notes]
    want = [(n.start, n.end, n.pitch) for i in b.instruments for n in i.notes]
    assert got == want


def test_engine_sampling_mode(engine):
    """temperature/top_k on the engine produce valid, seed-reproducible
    covers that differ from greedy (BASELINE config 3)."""
    rng = np.random.default_rng(12)
    wave = (rng.normal(size=4 * 16000) * 0.2).astype(np.float32)
    greedy = engine.sample_tokens_batched(engine._chunk_waveform(wave))
    engine.temperature = 1.0
    engine.top_k = 20
    try:
        s1 = engine.sample_tokens_batched(engine._chunk_waveform(wave))
        s2 = engine.sample_tokens_batched(engine._chunk_waveform(wave))
        # same seed -> reproducible
        for a, b in zip(s1, s2):
            np.testing.assert_array_equal(a, b)
        engine.sample_seed = 7
        s3 = engine.sample_tokens_batched(engine._chunk_waveform(wave))
        diff = any(
            len(a) != len(b) or (a != b).any() for a, b in zip(s1, s3)
        ) or any(
            len(a) != len(b) or (a != b).any() for a, b in zip(s1, greedy)
        )
        assert diff
    finally:
        engine.temperature = 0.0
        engine.top_k = 0
        engine.sample_seed = 0


def test_serving_dcfg_defaults(engine):
    """bf16 serving mode defaults to int8 KV caches; fp32 bit-parity mode
    must not quantize; engine.int8_kv overrides both ways."""
    import jax.numpy as jnp

    from music2midi_tpu.infer import Music2MIDI

    d = engine._dcfg()  # engine fixture is fp32
    expect = engine.t5_config.dtype != jnp.float32
    assert d.quantize_self_kv == expect and d.quantize_cross_kv == expect
    engine.int8_kv = not expect
    try:
        d = engine._dcfg()
        assert d.quantize_self_kv == (not expect)
    finally:
        engine.int8_kv = None
    bf16 = Music2MIDI.from_random(seed=0, decode_max_length=8,
                                  dtype=jnp.bfloat16)
    d = bf16._dcfg()
    assert d.quantize_self_kv and d.quantize_cross_kv


def test_warmup_compiles_buckets(engine):
    """warmup() runs both dispatch paths for each requested bucket and
    leaves the engine fully usable."""
    engine.warmup(buckets=[8])
    m = engine.generate(audio_y=np.zeros(16000, np.float32))
    assert m is not None


def test_cond_index_from_names(engine):
    assert engine.cond_index_from_names(genre="pop",
                                        difficulty="beginner") == [1, 0]
    assert engine.cond_index_from_names() == [0, 0]
    with pytest.raises(ValueError):
        engine.cond_index_from_names(genre="dubstep")


def test_quantized_cross_kv(setup):
    """int8 cross-KV (flag-gated, default off): decode runs end to end and
    the KV quantization roundtrip error is small.  (Token-level agreement
    with random weights is meaningless — near-tie logits flip freely; the
    measured figure on real scales is ~97%, see DecodeConfig docstring.)"""
    import jax.numpy as jnp

    from music2midi_tpu.models.t5 import _dequantize_kv, _quantize_kv

    params, cfg, enc = setup
    b, _ = generate_tokens(
        params, enc, cfg,
        DecodeConfig(max_length=24, quantize_cross_kv=True),
    )
    b = np.asarray(b)
    assert b.shape == (3, 24) and (b[:, 0] == 1).all()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 64)).astype(np.float32))
    back = np.asarray(_dequantize_kv(_quantize_kv(x), jnp.float32))
    rel = np.abs(back - np.asarray(x)).max() / np.abs(x).max()
    assert rel < 0.01, rel


def test_quantized_self_kv(setup):
    """int8 SELF-KV cache: decode runs end to end through the phased
    cache-growth path (growth must pad both the int8 values and the fp32
    scale planes), and the exact-vs-folded-scale algebra matches."""
    import jax
    import jax.numpy as jnp

    from music2midi_tpu.models.t5 import _attention_int8, _quantize_kv

    params, cfg, enc = setup
    b, _ = generate_tokens(
        params, enc, cfg,
        DecodeConfig(max_length=24, quantize_self_kv=True,
                     quantize_cross_kv=True),
    )
    b = np.asarray(b)
    assert b.shape == (3, 24) and (b[:, 0] == 1).all()

    # folded-scale attention == dequantize-then-attend (fp32, exact modulo
    # dot-order rounding; bias + mask applied identically)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 4, 1, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 4, 16, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 4, 16, 64)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(1, 4, 1, 16)).astype(np.float32))
    mask = (jnp.arange(16) < 12)[None, None, None, :]
    k8, v8 = _quantize_kv(k), _quantize_kv(v)
    from music2midi_tpu.models.t5 import _dequantize_kv, attention

    folded = np.asarray(_attention_int8(q, k8, v8, bias, mask, jnp.float32))
    ref = np.asarray(attention(
        q, _dequantize_kv(k8, jnp.float32), _dequantize_kv(v8, jnp.float32),
        bias, mask, jnp.float32,
    ))
    np.testing.assert_allclose(folded, ref, atol=1e-4)


def test_quantized_weights(setup):
    """int8 weight-only quantization (flag-gated, default off): decode
    runs end to end, the per-column quantization error is bounded by
    half a quantization step, and the folded-scale projection matches
    the dequantize-then-project reference."""
    import jax.numpy as jnp

    from music2midi_tpu.models.t5 import _proj, _quantize_w

    params, cfg, enc = setup
    b, _ = generate_tokens(
        params, enc, cfg,
        DecodeConfig(max_length=24, quantize_weights=True,
                     quantize_self_kv=True, quantize_cross_kv=True),
    )
    b = np.asarray(b)
    assert b.shape == (3, 24) and (b[:, 0] == 1).all()

    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(96, 48)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 1, 96)).astype(np.float32))
    vals, scale = _quantize_w(w)
    assert vals.dtype == jnp.int8 and scale.shape == (48,)
    # symmetric rounding: |w - vals*scale| <= scale/2 per column
    err = np.abs(np.asarray(w) - np.asarray(vals, np.float32)
                 * np.asarray(scale))
    assert (err <= np.asarray(scale) / 2 + 1e-7).all()
    # folded-scale projection == projecting through dequantized weights
    folded = np.asarray(_proj(x, (vals, scale), jnp.float32))
    ref = np.asarray(_proj(
        x, jnp.asarray(vals, jnp.float32) * scale, jnp.float32
    ))
    np.testing.assert_allclose(folded, ref, rtol=1e-5, atol=1e-5)


def test_int4_kv(setup):
    """kv_bits=4 (jnp.int4 EXPERIMENT, flag-gated): decode runs end to
    end through the phased cache-growth path with s4 caches, the new-row
    quantization width is derived from the cache dtype (type-driven), the
    roundtrip error is bounded by the ±7-level grid, and the folded-scale
    attention matches the dequantize-then-attend reference."""
    import jax.numpy as jnp

    from music2midi_tpu.models.t5 import (
        _attention_int8, _dequantize_kv, _kv_bits, _quantize_kv, attention,
    )

    params, cfg, enc = setup
    b, _ = generate_tokens(
        params, enc, cfg,
        DecodeConfig(max_length=24, quantize_self_kv=True,
                     quantize_cross_kv=True, kv_bits=4),
    )
    b = np.asarray(b)
    assert b.shape == (3, 24) and (b[:, 0] == 1).all()

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 64)).astype(np.float32))
    q4 = _quantize_kv(x, bits=4)
    assert q4[0].dtype == jnp.int4 and _kv_bits(q4) == 4
    # ±7 levels: |x - deq| <= scale/2 = amax/14 per position
    back = np.asarray(_dequantize_kv(q4, jnp.float32))
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert (np.abs(back - np.asarray(x)) <= amax / 14 + 1e-6).all()

    # folded-scale attention on int4 entries == dequantize-then-attend
    q = jnp.asarray(rng.normal(size=(2, 4, 1, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 4, 16, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 4, 16, 64)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(1, 4, 1, 16)).astype(np.float32))
    mask = (jnp.arange(16) < 12)[None, None, None, :]
    k4, v4 = _quantize_kv(k, bits=4), _quantize_kv(v, bits=4)
    folded = np.asarray(_attention_int8(q, k4, v4, bias, mask, jnp.float32))
    ref = np.asarray(attention(
        q, _dequantize_kv(k4, jnp.float32), _dequantize_kv(v4, jnp.float32),
        bias, mask, jnp.float32,
    ))
    np.testing.assert_allclose(folded, ref, atol=1e-4)


def test_cross_kv_lane_padding_exact(setup):
    """Lane-padded cross-KV (190 -> 256 columns + mask) must be
    bit-identical to unpadded attention: -1e9 pad scores underflow to
    exactly zero probability."""
    import jax.numpy as jnp

    from music2midi_tpu.models.t5 import CrossKV, precompute_cross_kv

    params, cfg, enc = setup
    ckv = precompute_cross_kv(params, enc, cfg)
    assert isinstance(ckv, CrossKV)
    Lp = ckv.layers[0][0].shape[2]
    assert Lp % 128 == 0 and Lp >= enc.shape[1]
    if ckv.mask is not None:
        assert int(ckv.mask.sum()) == enc.shape[1]
    # greedy tokens with padded entries+mask == manually unpadded entries
    tok_pad, _ = generate_tokens(params, enc, cfg,
                                 DecodeConfig(max_length=24))
    unpadded = [
        (k[:, :, :enc.shape[1], :], v[:, :, :enc.shape[1], :])
        for k, v in ckv.layers
    ]
    from music2midi_tpu.models.t5 import (
        init_kv_cache, decode_step, prepare_decode_params,
    )

    dparams = prepare_decode_params(params, cfg)
    cache = init_kv_cache(enc.shape[0], 24, cfg)
    cur = np.full((enc.shape[0],), cfg.decoder_start_token_id, np.int32)
    done = np.zeros((enc.shape[0],), bool)
    toks = [cur.copy()]
    for t in range(23):
        logits, cache = decode_step(
            dparams, jnp.asarray(cur), jnp.int32(t), cache, unpadded,
            cfg, 24,
        )
        cur = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
        cur = np.where(done, cfg.pad_token_id, cur).astype(np.int32)
        done |= cur == cfg.eos_token_id
        toks.append(cur.copy())
    manual = np.stack(toks, axis=1)
    np.testing.assert_array_equal(np.asarray(tok_pad), manual)


def test_generate_batch_audio_paths_mode(engine, tmp_path):
    """audio_paths mode (threaded WAV decode overlapped with dispatch)
    produces identical results to the waveform mode."""
    from music2midi_tpu.audio import write_wav

    rng = np.random.default_rng(10)
    songs = [
        (rng.normal(size=int(4.5 * 16000)) * 0.2).astype(np.float32),
        (rng.normal(size=int(7 * 16000)) * 0.2).astype(np.float32),
    ]
    paths = []
    for k, s in enumerate(songs):
        p = tmp_path / f"song{k}.wav"
        write_wav(p, s, 16000)
        paths.append(p)
    by_wave = engine.generate_batch(songs)
    by_path = engine.generate_batch(audio_paths=paths)
    for a, b in zip(by_wave, by_path):
        na = [(n.start, n.end, n.pitch) for i in a.instruments
              for n in i.notes]
        nb = [(n.start, n.end, n.pitch) for i in b.instruments
              for n in i.notes]
        assert na == nb
    with pytest.raises(ValueError):
        engine.generate_batch(songs, audio_paths=paths)
    with pytest.raises(ValueError):
        engine.generate_batch()
    # cond_indices shorter than the song list must raise, not silently
    # truncate the output (zip regression)
    with pytest.raises(ValueError):
        engine.generate_batch(songs, cond_indices=[[0, 0]])


def test_unroll_greedy_parity(setup):
    """DecodeConfig.unroll (and the engine's .unroll knob) must not
    change greedy tokens or lengths — finished rows emit PAD inside an
    unrolled chunk, and the early-exit check between chunks only
    affects how much overshoot work runs, never the outputs."""
    params, cfg, enc = setup
    base_t, base_l = generate_tokens(
        params, enc, cfg, DecodeConfig(max_length=24)
    )
    for unroll in (2, 3, 8):
        t, l = generate_tokens(
            params, enc, cfg, DecodeConfig(max_length=24, unroll=unroll)
        )
        np.testing.assert_array_equal(np.asarray(t), np.asarray(base_t),
                                      err_msg=f"unroll={unroll}")
        np.testing.assert_array_equal(np.asarray(l), np.asarray(base_l),
                                      err_msg=f"unroll={unroll}")


def test_generate_batch_decode_stats(engine):
    """last_decode_stats invariants: row_steps covers exactly the real
    rows, tokens_real is their sum, steps is the lockstep max, and the
    batch width is the padded bucket size."""
    rng = np.random.default_rng(21)
    songs = [(rng.normal(size=7 * 16000) * 0.2).astype(np.float32)]
    engine.generate_batch(songs)
    stats = engine.last_decode_stats
    assert stats, "generate_batch must record stats"
    n_chunks = sum(s["real_rows"] for s in stats)
    assert n_chunks == 3  # 7 s -> ceil(7/3) chunks
    for s in stats:
        assert len(s["row_steps"]) == s["real_rows"]
        assert s["tokens_real"] == sum(s["row_steps"])
        assert s["steps"] >= max(s["row_steps"])
        assert s["batch_width"] >= s["real_rows"]
