"""Streaming synthesis (sample/streaming.py + kernel emit_state).

The invariant that makes streaming correct: generating in chunks with
carried state is the SAME computation as one big call — deterministic
modes must match bit-for-bit. Covered here in interpret mode (CPU);
the hardware PRNG paths are covered on-chip by scripts/tpu_checks.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import ModelConfig, SampleConfig, SampleRNNConfig
from parrot_tpu.models import Parrot, SampleRNN
from parrot_tpu.sample.streaming import StreamingSynthesizer


def _setup(which_cost="MSE"):
    pcfg = ModelConfig(frame_size=5, vocab_size=7, embed_dim=8,
                       encoder_dim=8, rnn_h_dim=16, decoder_layers=2,
                       readouts_dim=16, attention_mixtures=2,
                       which_cost=which_cost, num_mixtures=2)
    model = Parrot(pcfg)
    params = model.init_params(jax.random.PRNGKey(0))
    vcfg = SampleRNNConfig(rnn_dim=16, mlp_dim=16, embed_dim=4, cond_dim=5)
    vmodel = SampleRNN(vcfg)
    vparams = vmodel.init_params(jax.random.PRNGKey(1))
    norm = {"mean": jnp.zeros((5,)), "std": jnp.ones((5,))}
    return model, params, vmodel, vparams, norm


def _stream_all(syn, text, mask, frame_chunk, max_steps):
    chunks = list(syn.stream(text, mask, frame_chunk=frame_chunk,
                             max_steps=max_steps,
                             key=jax.random.PRNGKey(3)))
    audio = np.concatenate([c.audio for c in chunks], axis=1)
    frames = np.concatenate([c.frames for c in chunks], axis=1)
    return chunks, audio, frames


@pytest.mark.slow
def test_chunked_equals_one_shot_deterministic():
    """Two F=8 chunks == one F=16 chunk, bit-for-bit (MSE head + greedy
    f32 vocoder: fully deterministic, so any state-carry error shows)."""
    model, params, vmodel, vparams, norm = _setup("MSE")
    cfg = SampleConfig(fused_weight_dtype="float32", stop_threshold=1.1)
    syn = StreamingSynthesizer(model, params, norm, vmodel, vparams,
                               cfg, vocoder_temperature=0.0,
                               interpret=True)
    rng = np.random.default_rng(0)
    B, U = 2, 6
    text = jnp.asarray(rng.integers(1, 7, (B, U)), jnp.int32)
    mask = jnp.ones((B, U), jnp.float32)

    _, audio_2, frames_2 = _stream_all(syn, text, mask, 8, 16)
    _, audio_1, frames_1 = _stream_all(syn, text, mask, 16, 16)
    np.testing.assert_array_equal(audio_2, audio_1)
    np.testing.assert_array_equal(frames_2, frames_1)
    assert audio_1.shape == (B, 16 * vmodel.cfg.hop)
    assert np.isfinite(audio_1).all()


def test_stream_stops_on_window_exhaustion():
    """With a short text and a real stop threshold the stream terminates
    before max_steps and marks rows done; finished rows emit silence."""
    model, params, vmodel, vparams, norm = _setup("MSE")
    cfg = SampleConfig(fused_weight_dtype="float32", stop_threshold=0.5)
    syn = StreamingSynthesizer(model, params, norm, vmodel, vparams,
                               cfg, vocoder_temperature=0.0,
                               interpret=True)
    B, U = 2, 4
    text = jnp.asarray([[1, 2, 0, 0], [1, 2, 3, 4]], jnp.int32)
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.float32)
    chunks = list(syn.stream(text, mask, frame_chunk=8, max_steps=256))
    assert chunks[-1].done.all()
    assert len(chunks) * 8 < 256, "stream never stopped"
    # once a row is done its live mask is 0 and its audio is silence
    from parrot_tpu.vocoder.mulaw import MULAW_ZERO, mulaw_decode_jax
    silence = float(mulaw_decode_jax(jnp.asarray(MULAW_ZERO), 256))
    last = chunks[-1]
    for b in range(B):
        dead = last.live[b] == 0.0
        if dead.any():
            first_dead = int(np.argmax(dead))
            hop = vmodel.cfg.hop
            np.testing.assert_allclose(
                last.audio[b, first_dead * hop:], silence, atol=1e-7)


# (A GMM-head streaming test cannot run in interpret mode — the
# in-kernel TPU PRNG does not lower on CPU. GMM streaming runs on
# hardware via scripts/bench_stream.py, whose flagship config uses the
# GMM head with sampling bias.)


def test_emit_state_matches_plain_sampler_state():
    """ops-level: the reader kernel's emitted state after T steps equals
    the state reached by running the same kernel in two halves — and
    the vocoder kernel's emitted state round-trips the same way."""
    from parrot_tpu.ops.fused_decode import (fused_decode, prepare_params,
                                             flatten_state, split_state)
    model, params, vmodel, vparams, norm = _setup("MSE")
    rng = np.random.default_rng(1)
    B, U, T = 2, 5, 16
    text = jnp.asarray(rng.integers(1, 7, (B, U)), jnp.int32)
    mask = jnp.ones((B, U), jnp.float32)
    enc = model.encode(params, text, mask)
    kp = prepare_params(model, params, jnp.zeros((B,), jnp.int32), B,
                        weight_dtype=jnp.float32)
    init = flatten_state(model.init_state(B, U))
    kw = dict(T=T, D=model.D, E=model.E, H=model.H, K=model.K,
              M=model.cfg.num_mixtures, L=model.L, alignment=1.0,
              is_gmm=False, chunk_steps=8, stop_threshold=1.1,
              interpret=True, emit_state=True)
    seed = jnp.zeros((1,), jnp.int32)
    _, _, flat_full = fused_decode(kp, enc, mask, init, seed, **kw)
    kw_half = dict(kw, T=T // 2)
    _, _, flat_a = fused_decode(kp, enc, mask, init, seed, **kw_half)
    half_state = split_state(flat_a, L=model.L, H=model.H, K=model.K,
                             E=model.E, D=model.D)
    _, _, flat_b = fused_decode(kp, enc, mask, half_state, seed, **kw_half)
    np.testing.assert_array_equal(np.asarray(flat_full),
                                  np.asarray(flat_b))


def test_stream_renormalizes_for_vocoder_stats_and_caps_exactly():
    """(a) A vocoder trained under different conditioning stats gets the
    frames renormalized into ITS space: streamed audio must equal the
    plain vocoder run on the streamed RAW frames under vnorm (greedy
    f32 cross-path parity). (b) max_steps is honored exactly even when
    it is not a chunk multiple."""
    model, params, vmodel, vparams, norm = _setup("MSE")
    vnorm = {"mean": jnp.full((5,), 0.7), "std": jnp.full((5,), 1.9)}
    cfg = SampleConfig(fused_weight_dtype="float32", stop_threshold=1.1)
    syn = StreamingSynthesizer(model, params, norm, vmodel, vparams,
                               cfg, vocoder_temperature=0.0,
                               interpret=True, vnorm=vnorm)
    rng = np.random.default_rng(2)
    text = jnp.asarray(rng.integers(1, 7, (2, 5)), jnp.int32)
    mask = jnp.ones((2, 5), jnp.float32)
    chunks, audio, frames = _stream_all(syn, text, mask, 8, 12)
    # (b) 12 = 8 + 4: the second chunk is trimmed to 4 frames
    assert frames.shape[1] == 12
    assert audio.shape == (2, 12 * vmodel.cfg.hop)
    assert chunks[-1].frames.shape[1] == 4

    # (a) plain vocoder on the RAW streamed frames under vnorm
    q_ref, audio_ref, _ = vmodel.generate(
        vparams, vnorm, jnp.asarray(frames), jnp.ones((2, 12), jnp.float32),
        jax.random.PRNGKey(0), temperature=0.0)
    np.testing.assert_allclose(audio, np.asarray(audio_ref),
                               rtol=0, atol=1e-6)


@pytest.mark.slow
def test_sharded_streaming_matches_single_device():
    """VERDICT r2 next-step #6: streaming under a multi-chip mesh.
    B rows split over an 8-device virtual mesh with per-shard carried
    state must reproduce the single-device stream in deterministic mode
    (MSE reader + greedy f32 vocoder — the per-shard PRNG seed
    decorrelation is then irrelevant). Tolerance is ulp-level, not
    bitwise: XLA picks a different matmul reduction order for the
    per-shard B=1 GEMMs than for the B=8 ones."""
    from parrot_tpu.parallel import make_mesh

    model, params, vmodel, vparams, norm = _setup("MSE")
    cfg = SampleConfig(fused_weight_dtype="float32", stop_threshold=1.1)
    rng = np.random.default_rng(5)
    B, U = 8, 6
    text = jnp.asarray(rng.integers(1, 7, (B, U)), jnp.int32)
    mask = jnp.ones((B, U), jnp.float32)

    single = StreamingSynthesizer(model, params, norm, vmodel, vparams,
                                  cfg, vocoder_temperature=0.0,
                                  interpret=True)
    _, audio_1, frames_1 = _stream_all(single, text, mask, 8, 16)

    mesh = make_mesh(8)
    sharded = StreamingSynthesizer(model, params, norm, vmodel, vparams,
                                   cfg, vocoder_temperature=0.0,
                                   interpret=True, mesh=mesh)
    chunks, audio_8, frames_8 = _stream_all(sharded, text, mask, 8, 16)
    np.testing.assert_allclose(audio_8, audio_1, rtol=0, atol=1e-6)
    np.testing.assert_allclose(frames_8, frames_1, rtol=0, atol=1e-6)
    assert chunks[-1].done.shape == (B,)


def test_sharded_streaming_rejects_ragged_batch():
    from parrot_tpu.parallel import make_mesh
    import pytest

    model, params, vmodel, vparams, norm = _setup("MSE")
    syn = StreamingSynthesizer(model, params, norm, vmodel, vparams,
                               SampleConfig(), vocoder_temperature=0.0,
                               interpret=True, mesh=make_mesh(8))
    text = jnp.ones((3, 4), jnp.int32)
    mask = jnp.ones((3, 4), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        next(syn.stream(text, mask, frame_chunk=8, max_steps=8))
