"""SampleRNN neural-vocoder tests: mu-law coding, TBPTT carry
equivalence, mask semantics, overfit, generation, stream, and the
train_vocoder.py -> generate.py --neural_vocoder CLI path (SURVEY.md
§2.3 N3 — the reference only exposes the hook; the native vocoder is
tested like any other model here)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import SampleRNNConfig
from parrot_tpu.models.samplernn import SampleRNN, VocoderBatch
from parrot_tpu.vocoder.mulaw import (mulaw_encode, mulaw_decode,
                                      mulaw_encode_jax, mulaw_decode_jax)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# mu-law
# ---------------------------------------------------------------------------

def test_mulaw_roundtrip_error_bound():
    x = np.linspace(-1.0, 1.0, 4001)
    ids = mulaw_encode(x)
    assert ids.min() >= 0 and ids.max() <= 255
    y = mulaw_decode(ids)
    # companding: fine resolution near zero, coarser at extremes (the
    # mu-law step at |x|=1 is ~0.022; measured max roundtrip err 0.0215)
    err = np.abs(y - x)
    assert err.max() < 0.025
    near_zero = np.abs(x) < 0.005
    assert err[near_zero].max() < 5e-4
    assert mulaw_encode(np.zeros(1))[0] == 128


def test_mulaw_jax_matches_numpy():
    x = np.random.default_rng(0).uniform(-1, 1, 2048).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(mulaw_encode_jax(jnp.asarray(x))),
                                  mulaw_encode(x))
    ids = mulaw_encode(x)
    np.testing.assert_allclose(np.asarray(mulaw_decode_jax(jnp.asarray(ids))),
                               mulaw_decode(ids), atol=1e-6)


def test_mulaw_monotone():
    x = np.linspace(-1, 1, 1001)
    ids = mulaw_encode(x)
    assert (np.diff(ids) >= 0).all()


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny():
    cfg = SampleRNNConfig(rnn_dim=32, mlp_dim=32, embed_dim=8, cond_dim=5)
    model = SampleRNN(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    norm = {"mean": jnp.zeros(5), "std": jnp.ones(5)}
    return cfg, model, params, norm


def _rand_batch(cfg, B, Sc, seed=0, D=5):
    rng = np.random.default_rng(seed)
    return VocoderBatch(
        audio=jnp.asarray(rng.integers(0, cfg.quantization,
                                       (B, Sc * cfg.hop)), jnp.int32),
        cond=jnp.asarray(rng.normal(size=(B, Sc, D)), jnp.float32),
        cond_mask=jnp.ones((B, Sc), jnp.float32),
        start_flag=jnp.float32(1.0),
    )


def test_init_loss_is_uniform_entropy(tiny):
    cfg, model, params, norm = tiny
    b = _rand_batch(cfg, 2, 3)
    loss, _, metrics = model.compute_cost(params, norm, b, None)
    # fresh params -> near-uniform softmax -> NLL ~ ln(256)
    assert abs(float(loss) - np.log(cfg.quantization)) < 0.05
    assert abs(float(metrics["bits_per_sample"]) - 8.0) < 0.1


@pytest.mark.slow
def test_tbptt_carry_full_equals_segments(tiny):
    cfg, model, params, norm = tiny
    B, Sc = 3, 4
    full = _rand_batch(cfg, B, 2 * Sc, seed=1)
    l_full, st_full, _ = model.compute_cost(params, norm, full, None)
    b1 = VocoderBatch(full.audio[:, :Sc * cfg.hop], full.cond[:, :Sc],
                      full.cond_mask[:, :Sc], jnp.float32(1.0))
    b2 = VocoderBatch(full.audio[:, Sc * cfg.hop:], full.cond[:, Sc:],
                      full.cond_mask[:, Sc:], jnp.float32(0.0))
    l1, st1, _ = model.compute_cost(params, norm, b1, None)
    l2, st2, _ = model.compute_cost(params, norm, b2, st1)
    assert abs(float(l_full) - float(l1 + l2) / 2) < 1e-5
    for a, b in zip(st_full, st2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-6)


def test_masked_frames_do_not_change_loss_or_state(tiny):
    cfg, model, params, norm = tiny
    B, Sc = 2, 4
    b = _rand_batch(cfg, B, Sc, seed=2)
    mask = b.cond_mask.at[:, 2:].set(0.0)
    bm = b._replace(cond_mask=mask)
    l_m, st_m, _ = model.compute_cost(params, norm, bm, None)
    # corrupting the masked tail must change nothing
    b2 = bm._replace(
        audio=bm.audio.at[:, 2 * cfg.hop:].set(7),
        cond=bm.cond.at[:, 2:].set(99.0))
    l_2, st_2, _ = model.compute_cost(params, norm, b2, None)
    assert float(l_m) == float(l_2)
    for a, c in zip(st_m, st_2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_grads_finite(tiny):
    cfg, model, params, norm = tiny
    b = _rand_batch(cfg, 2, 3, seed=3)
    g = jax.grad(lambda p: model.compute_cost(p, norm, b, None)[0])(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_generate_shapes_determinism_and_mask(tiny):
    cfg, model, params, norm = tiny
    B, Sc = 3, 4
    rng = np.random.default_rng(4)
    cond = jnp.asarray(rng.normal(size=(B, Sc, 5)), jnp.float32)
    mask = jnp.ones((B, Sc), jnp.float32).at[0, 2:].set(0.0)
    q, audio, st = model.generate(params, norm, cond, mask,
                                  jax.random.PRNGKey(0))
    assert q.shape == (B, Sc * cfg.hop) and audio.shape == q.shape
    assert np.isfinite(np.asarray(audio)).all()
    # same key -> same samples; different key -> different samples
    q2, _, _ = model.generate(params, norm, cond, mask, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q2))
    q3, _, _ = model.generate(params, norm, cond, mask, jax.random.PRNGKey(9))
    assert (np.asarray(q) != np.asarray(q3)).any()
    # masked tail is silence
    assert (np.asarray(q)[0, 2 * cfg.hop:] == model.zero_id).all()
    # greedy is key-independent
    g1, _, _ = model.generate(params, norm, cond, mask,
                              jax.random.PRNGKey(0), temperature=0.0)
    g2, _, _ = model.generate(params, norm, cond, mask,
                              jax.random.PRNGKey(9), temperature=0.0)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


@pytest.mark.slow
def test_overfit_memorizes_waveform():
    """One short fixed waveform + constant conditioning: the model must
    drive teacher-forced NLL far below uniform and reproduce the
    waveform greedily (this catches train/generate window mismatches —
    greedy generation only matches if the feedback layout is identical
    between the shifted teacher-forced windows and the sampling loop)."""
    from parrot_tpu.train.optim import adam_init, adam_update
    from parrot_tpu.config import TrainConfig

    cfg = SampleRNNConfig(rnn_dim=48, mlp_dim=48, embed_dim=12, cond_dim=3)
    model = SampleRNN(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    norm = {"mean": jnp.zeros(3), "std": jnp.ones(3)}
    Sc = 4
    T = Sc * cfg.hop
    t = np.arange(T)
    x = 0.6 * np.sin(2 * np.pi * t / 32) + 0.2 * np.sin(2 * np.pi * t / 80)
    q = mulaw_encode(x)
    batch = VocoderBatch(
        audio=jnp.asarray(q[None], jnp.int32),
        cond=jnp.ones((1, Sc, 3), jnp.float32),
        cond_mask=jnp.ones((1, Sc), jnp.float32),
        start_flag=jnp.float32(1.0))
    tcfg = TrainConfig(learning_rate=3e-3)
    opt = adam_init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return model.compute_cost(p, norm, batch, None)[0]
        loss, g = jax.value_and_grad(loss_fn)(params)
        params, opt, _ = adam_update(params, g, opt, tcfg)
        return params, opt, loss

    loss = None
    for _ in range(400):
        params, opt, loss = step(params, opt)
    assert float(loss) < 1.0, f"did not overfit: NLL {float(loss):.3f}"

    qg, _, _ = model.generate(params, norm, batch.cond, batch.cond_mask,
                              jax.random.PRNGKey(0), temperature=0.0)
    match = (np.asarray(qg)[0] == q).mean()
    assert match > 0.85, f"greedy replay only matches {match:.2%}"


# ---------------------------------------------------------------------------
# data: audio fixture + stream
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def audio_corpus(tmp_path_factory):
    from parrot_tpu.data.fixture import make_audio_fixture_corpus
    from parrot_tpu.data import H5Corpus
    path = str(tmp_path_factory.mktemp("voc") / "audio.h5")
    make_audio_fixture_corpus(path, num_utterances=10, vocab_size=5)
    return H5Corpus(path)


def test_corpus_stores_aligned_mulaw_audio(audio_corpus):
    c = audio_corpus
    assert c.has_audio and c.audio_hop == 80 and c.sample_rate == 16000
    a = c.audio(0)
    assert a.shape[0] == c.features(0).shape[0] * c.audio_hop
    assert 0 <= a.min() and a.max() <= 255
    # decoded audio has sane amplitude (0.95-scaled, not clipped silence)
    x = mulaw_decode(a)
    assert 0.2 < np.abs(x).max() <= 0.96


def test_vocoder_stream_shapes_and_carry(audio_corpus):
    from parrot_tpu.data.audio_pipeline import vocoder_stream
    hop = audio_corpus.audio_hop
    segs = list(vocoder_stream(audio_corpus, batch_size=4, seq_size=8,
                               split="train", training=False, epochs=1))
    assert segs, "empty stream"
    starts = [float(s.start_flag) for s in segs]
    assert starts[0] == 1.0 and 0.0 in starts  # multi-segment utterances
    for s in segs:
        B, Sc = s.cond_mask.shape
        assert s.cond.shape == (B, Sc, audio_corpus.frame_size)
        assert s.audio.shape == (B, Sc * hop)
        # padded region is mu-law silence
        pad = np.repeat(s.cond_mask == 0, hop, axis=1)
        assert (s.audio[pad] == 128).all()


def test_vocoder_stream_skip_segments_matches(audio_corpus):
    from parrot_tpu.data.audio_pipeline import vocoder_stream
    ref = list(vocoder_stream(audio_corpus, 4, 8, training=True,
                              shuffle_seed=7, epochs=1))
    skipped = list(vocoder_stream(audio_corpus, 4, 8, training=True,
                                  shuffle_seed=7, epochs=1,
                                  skip_segments=3))
    assert len(skipped) == len(ref) - 3
    np.testing.assert_array_equal(skipped[0].audio, ref[3].audio)


# ---------------------------------------------------------------------------
# CLI end-to-end: train_vocoder.py then generate.py --neural_vocoder
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_cli_train_and_neural_generate(tmp_path, audio_corpus):
    from tests.util_env import cpu_env
    env = cpu_env()
    save = str(tmp_path / "sm")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_vocoder.py"),
         "--dataset", audio_corpus.path, "--model_name", "srnn",
         "--save_dir", save, "--batch_size", "4", "--seq_size", "8",
         "--num_devices", "4",
         "--num_steps", "12", "--rnn_dim", "24", "--mlp_dim", "24",
         "--embed_dim", "8", "--eval_every", "6", "--save_every", "10",
         "--log_every", "5"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(os.path.join(save, "srnn", "best"))

    # resume must pick up and extend
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_vocoder.py"),
         "--dataset", audio_corpus.path, "--model_name", "srnn",
         "--save_dir", save, "--batch_size", "4", "--seq_size", "8",
         "--num_devices", "4",
         "--num_steps", "16", "--rnn_dim", "24", "--mlp_dim", "24",
         "--embed_dim", "8", "--eval_every", "100", "--save_every", "100",
         "--log_every", "2", "--resume"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "step=16" in r2.stdout

    # neural synthesis through the loader (the generate.py path without
    # needing a parrot checkpoint): frames -> audio -> wav-able
    from parrot_tpu.train.checkpoint import load_vocoder_for_inference
    model, params, vnorm, vcfg, step = load_vocoder_for_inference(
        save, "srnn", "best")
    assert vcfg.cond_dim == audio_corpus.frame_size
    cond = jnp.asarray(audio_corpus.features(0)[None, :6], jnp.float32)
    mask = jnp.ones((1, 6), jnp.float32)
    q, audio, _ = model.generate(params, vnorm, cond, mask,
                                 jax.random.PRNGKey(0))
    assert audio.shape == (1, 6 * vcfg.hop)
    assert np.isfinite(np.asarray(audio)).all()


# ---------------------------------------------------------------------------
# fused Pallas serving kernel (ops/fused_vocoder.py), interpret mode
# ---------------------------------------------------------------------------

def _fused_setup(seed=3):
    cfg = SampleRNNConfig(rnn_dim=32, mlp_dim=32, embed_dim=8, cond_dim=5)
    model = SampleRNN(cfg)
    params = model.init_params(jax.random.PRNGKey(seed))
    norm = {"mean": jnp.zeros(5), "std": jnp.ones(5)}
    return cfg, model, params, norm


def test_fused_vocoder_greedy_parity_interpret():
    """Greedy fused kernel == plain generate, bit-exact, incl. a masked
    row and conditioning padding (Sc=12 pads to the chunk multiple)."""
    cfg, model, params, norm = _fused_setup()
    B, Sc = 3, 12
    rng = np.random.default_rng(5)
    cond = jnp.asarray(rng.normal(size=(B, Sc, 5)), jnp.float32)
    mask = jnp.ones((B, Sc), jnp.float32).at[1, 7:].set(0.0)
    q_ref, _, _ = model.generate(params, norm, cond, mask,
                                 jax.random.PRNGKey(0), temperature=0.0)
    q_f, audio = model.generate_fused(params, norm, cond, mask, seed=0,
                                      temperature=0.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(q_ref), np.asarray(q_f))
    np.testing.assert_allclose(
        np.asarray(audio),
        np.asarray(mulaw_decode_jax(q_ref, cfg.quantization)), atol=0)


def test_fused_vocoder_carried_state_parity_interpret():
    """Starting from a NONZERO carried state (mid-utterance serving)
    the fused kernel must still match the plain path exactly."""
    cfg, model, params, norm = _fused_setup(seed=4)
    B, Sc = 2, 8
    rng = np.random.default_rng(6)
    cond = jnp.asarray(rng.normal(size=(B, 2 * Sc, 5)), jnp.float32)
    mask = jnp.ones((B, 2 * Sc), jnp.float32)
    # run the first half with the plain path to build a real state
    _, _, st = model.generate(params, norm, cond[:, :Sc], mask[:, :Sc],
                              jax.random.PRNGKey(0), temperature=0.0)
    q_ref, _, _ = model.generate(params, norm, cond[:, Sc:], mask[:, Sc:],
                                 jax.random.PRNGKey(0), temperature=0.0,
                                 state=st)
    q_f, _ = model.generate_fused(params, norm, cond[:, Sc:], mask[:, Sc:],
                                  seed=0, temperature=0.0, state=st,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(q_ref), np.asarray(q_f))


def test_fused_vocoder_weight_tuple_and_lut():
    """prepare_vocoder_params: layout sizes and the mu-law LUT column
    must equal mulaw_decode of the id range."""
    from parrot_tpu.ops.fused_vocoder import (prepare_vocoder_params,
                                              N_WEIGHTS)
    cfg, model, params, _ = _fused_setup()
    kp = prepare_vocoder_params(model, params, weight_dtype=jnp.float32)
    assert len(kp) == N_WEIGHTS
    assert kp[0].shape == (cfg.frame_size, 4 * cfg.rnn_dim)
    assert kp[1].shape == (cfg.cond_dim, 4 * cfg.rnn_dim)
    emb_lut = np.asarray(kp[-1])
    assert emb_lut.shape == (cfg.quantization, cfg.embed_dim + 1)
    # the LUT must be the f32 decode (mulaw_decode_jax) EXACTLY — that
    # is what the plain sampler feeds back, and the bit-parity of the
    # fused path hangs on it
    np.testing.assert_array_equal(
        emb_lut[:, -1],
        np.asarray(mulaw_decode_jax(jnp.arange(cfg.quantization),
                                    cfg.quantization)))


@pytest.mark.slow
def test_vocoder_dp_step_matches_single_device(tiny):
    """SURVEY.md §4 'multi-chip without a pod' for the vocoder trainer:
    one train step on the 8-device DP mesh (batch sharded, params
    replicated) must match the single-device step."""
    from parrot_tpu.parallel import (make_mesh, batch_sharding, replicated,
                                     state_sharding)
    from parrot_tpu.train.optim import adam_init, adam_update
    from parrot_tpu.config import TrainConfig

    cfg, model, params, norm = tiny
    tcfg = TrainConfig()
    batch = _rand_batch(cfg, 8, 2, seed=9)

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            loss, st, _ = model.compute_cost(p, norm, batch, None)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state, _ = adam_update(params, grads, opt_state, tcfg)
        return loss, params

    l1, p1 = jax.jit(train_step)(params, adam_init(params), batch)

    mesh = make_mesh(8)
    repl = replicated(mesh)
    repl_tree = lambda t: jax.tree.map(lambda _: repl, t)
    step8 = jax.jit(train_step,
                    out_shardings=(None, repl_tree(params)))
    params_d = jax.device_put(params, repl_tree(params))
    opt_d = jax.device_put(adam_init(params), repl_tree(adam_init(params)))
    batch_d = jax.device_put(batch, batch_sharding(mesh, batch))
    l8, p8 = step8(params_d, opt_d, batch_d)
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_neural_vocoder_report_runs(audio_corpus):
    """evaluate.neural_vocoder_report: finite MCDs, WORLD baseline
    included, bits/sample near 8 for an untrained model."""
    from parrot_tpu.evaluate import neural_vocoder_report
    cfg = SampleRNNConfig(rnn_dim=16, mlp_dim=16, embed_dim=8,
                          cond_dim=audio_corpus.frame_size)
    model = SampleRNN(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    vnorm = {"mean": jnp.asarray(audio_corpus.mean),
             "std": jnp.asarray(audio_corpus.std)}
    rep = neural_vocoder_report(model, params, vnorm, audio_corpus,
                                num_utterances=2)
    assert np.isfinite(rep["neural_resynthesis_mcd"])
    assert np.isfinite(rep["world_resynthesis_mcd"])
    assert rep["world_resynthesis_mcd"] < rep["neural_resynthesis_mcd"]
    assert abs(rep["valid_bits_per_sample"] - 8.0) < 0.3  # untrained


@pytest.mark.slow
def test_fused_vocoder_sharded_matches_single(tiny):
    """shard_map'd fused serving (one kernel per device, interpret) must
    equal the unsharded greedy kernel — incl. a ragged batch padded up
    to the mesh size."""
    from parrot_tpu.parallel import make_mesh
    cfg, model, params, norm = tiny
    B, Sc = 6, 8  # B=6 pads to 8 rows on the mesh
    rng = np.random.default_rng(7)
    cond = jnp.asarray(rng.normal(size=(B, Sc, 5)), jnp.float32)
    mask = jnp.ones((B, Sc), jnp.float32).at[2, 5:].set(0.0)
    q1, _ = model.generate_fused(params, norm, cond, mask, seed=0,
                                 temperature=0.0, interpret=True)
    mesh = make_mesh(8)
    q8, _ = model.generate_fused(params, norm, cond, mask, seed=0,
                                 temperature=0.0, interpret=True,
                                 mesh=mesh)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q8))


def test_vocoder_stream_process_sharding_matches_global(audio_corpus):
    """Each process's vocoder stream must yield exactly its row block
    of the global batch, segment boundaries and start flags identical
    (the contract parallel.staging.stage_local assembles from)."""
    import itertools
    from parrot_tpu.data.audio_pipeline import vocoder_stream
    n_batches, B, pc = 5, 4, 2
    full = list(itertools.islice(
        vocoder_stream(audio_corpus, B, 8, epochs=1), n_batches))
    per = B // pc
    for pi in range(pc):
        local = list(itertools.islice(
            vocoder_stream(audio_corpus, B, 8, epochs=1,
                           process_index=pi, process_count=pc), n_batches))
        assert len(local) == len(full)
        for g, l in zip(full, local):
            for name in g._fields:
                gv = np.asarray(getattr(g, name))
                lv = np.asarray(getattr(l, name))
                if gv.ndim == 0:
                    np.testing.assert_array_equal(gv, lv)  # start_flag
                else:
                    assert lv.shape[0] == per
                    np.testing.assert_array_equal(
                        gv[pi * per:(pi + 1) * per], lv)


@pytest.mark.slow
def test_vocoder_sigterm_flushes_checkpoint_and_resumes(tmp_path,
                                                        audio_corpus):
    """Preemption contract: SIGTERM mid-training flushes a checkpoint
    and exits cleanly; --resume continues from it."""
    import signal
    import time as _time
    from tests.util_env import cpu_env
    env = cpu_env()
    save = str(tmp_path / "sm")
    args = [sys.executable, os.path.join(REPO, "train_vocoder.py"),
            "--dataset", audio_corpus.path, "--model_name", "pre",
            "--save_dir", save, "--batch_size", "4", "--seq_size", "8",
            "--num_devices", "4",
            "--num_steps", "10000", "--rnn_dim", "16", "--mlp_dim", "16",
            "--embed_dim", "8", "--eval_every", "100000",
            "--save_every", "100000", "--log_every", "1"]
    proc = subprocess.Popen(args, cwd=REPO, env=env,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    # wait until it has taken a few steps (log_every=1 lines appear)
    deadline = _time.time() + 300
    lines = []
    while _time.time() < deadline:
        line = proc.stdout.readline()
        lines.append(line)
        if "[train] step=3" in line:
            break
    else:
        proc.kill()
        raise AssertionError("trainer never reached step 3:\n"
                             + "".join(lines))
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, out
    assert "interrupted, checkpoint flushed" in out
    assert os.path.exists(os.path.join(save, "pre", "latest"))
    import re
    import json as _json
    meta = _json.load(open(os.path.join(
        save, "pre",
        open(os.path.join(save, "pre", "latest")).read().strip(),
        "meta.json")))
    flushed_step = int(meta["step"])
    assert flushed_step >= 3
    resume_args = list(args)
    # a few steps past wherever the flush landed (SIGTERM timing varies)
    resume_args[resume_args.index("--num_steps") + 1] = str(
        flushed_step + 3)
    r = subprocess.run(resume_args + ["--resume"],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    m = re.search(r"done: step=(\d+)", r.stdout)
    assert m and int(m.group(1)) == flushed_step + 3, r.stdout


# ---------------------------------------------------------------------------
# speaker-conditioned vocoder (Char2Wav trains these for VCTK)
# ---------------------------------------------------------------------------

def _spk_setup(seed=11):
    cfg = SampleRNNConfig(rnn_dim=24, mlp_dim=24, embed_dim=8, cond_dim=5,
                          use_speaker=True, num_speakers=3, speaker_dim=4)
    model = SampleRNN(cfg)
    params = model.init_params(jax.random.PRNGKey(seed))
    norm = {"mean": jnp.zeros(5), "std": jnp.ones(5)}
    return cfg, model, params, norm


@pytest.mark.slow
def test_speaker_conditioning_changes_output_and_cost():
    cfg, model, params, norm = _spk_setup()
    rng = np.random.default_rng(0)
    B, Sc = 2, 4
    cond = jnp.asarray(rng.normal(size=(B, Sc, 5)), jnp.float32)
    mask = jnp.ones((B, Sc), jnp.float32)
    batch = lambda spk: VocoderBatch(
        audio=jnp.asarray(rng.integers(0, 256, (B, Sc * cfg.hop)),
                          jnp.int32),
        cond=cond, cond_mask=mask, start_flag=jnp.float32(1.0),
        speaker=jnp.asarray(spk, jnp.int32))
    rng = np.random.default_rng(0)  # same audio both times
    b0 = batch([0, 0])
    rng = np.random.default_rng(0)
    b1 = batch([1, 2])
    l0, _, _ = model.compute_cost(params, norm, b0, None)
    l0b, _, _ = model.compute_cost(params, norm, b0, None)
    l1, _, _ = model.compute_cost(params, norm, b1, None)
    assert float(l0) == float(l0b)
    assert abs(float(l0) - float(l1)) > 1e-6, "speaker id has no effect"
    # greedy generation differs by speaker too
    q0, _, _ = model.generate(params, norm, cond, mask,
                              jax.random.PRNGKey(0), temperature=0.0,
                              speaker=jnp.asarray([0, 0], jnp.int32))
    q1, _, _ = model.generate(params, norm, cond, mask,
                              jax.random.PRNGKey(0), temperature=0.0,
                              speaker=jnp.asarray([1, 2], jnp.int32))
    assert (np.asarray(q0) != np.asarray(q1)).any()


def test_speaker_fused_greedy_parity_interpret():
    """The kernel folds the speaker rows of the tier wx into a per-row
    gate bias — greedy fused output must stay bit-identical to the
    plain path for every row's distinct speaker."""
    cfg, model, params, norm = _spk_setup()
    rng = np.random.default_rng(5)
    B, Sc = 3, 8
    cond = jnp.asarray(rng.normal(size=(B, Sc, 5)), jnp.float32)
    mask = jnp.ones((B, Sc), jnp.float32)
    spk = jnp.asarray([2, 0, 1], jnp.int32)
    q_ref, _, _ = model.generate(params, norm, cond, mask,
                                 jax.random.PRNGKey(0), temperature=0.0,
                                 speaker=spk)
    q_f, _ = model.generate_fused(params, norm, cond, mask, seed=0,
                                  temperature=0.0, interpret=True,
                                  speaker=spk)
    np.testing.assert_array_equal(np.asarray(q_ref), np.asarray(q_f))


def test_vocoder_stream_carries_speaker(audio_corpus):
    from parrot_tpu.data.audio_pipeline import vocoder_stream
    seg = next(iter(vocoder_stream(audio_corpus, batch_size=4, seq_size=8,
                                   split="train", training=False, epochs=1)))
    assert seg.speaker is not None and seg.speaker.shape == (4,)
    idx = list(audio_corpus.split("train"))[:4]
    np.testing.assert_array_equal(
        seg.speaker, [audio_corpus.speaker(i) for i in idx])


@pytest.mark.slow
def test_joint_gradients_reach_speaker_embedding(audio_corpus):
    """Joint fine-tuning with a speaker-conditioned vocoder: the audio
    NLL must reach the vocoder's speaker table."""
    from parrot_tpu.config import ModelConfig
    from parrot_tpu.data.pipeline import parrot_stream, DataConfig
    from parrot_tpu.models.char2wav import Char2Wav
    c = audio_corpus
    pcfg = ModelConfig(frame_size=c.frame_size, vocab_size=c.vocab_size,
                       embed_dim=8, encoder_dim=8, rnn_h_dim=16,
                       decoder_layers=2, readouts_dim=16,
                       attention_mixtures=2, num_mixtures=2)
    vcfg = SampleRNNConfig(rnn_dim=16, mlp_dim=16, embed_dim=4,
                           cond_dim=c.frame_size, use_speaker=True,
                           num_speakers=max(c.num_speakers, 2),
                           speaker_dim=4)
    model = Char2Wav(pcfg, vcfg)
    params = model.init_params(jax.random.PRNGKey(2))
    norm = {"mean": jnp.asarray(c.mean), "std": jnp.asarray(c.std)}
    jb = next(iter(parrot_stream(
        c, DataConfig(batch_size=2, seq_size=6, max_text_len=12),
        split="train", training=False, epochs=1, with_audio=True)))

    g = jax.grad(lambda p: model.compute_cost(p, norm, jb, None)[0])(params)
    spk_g = float(jnp.abs(g["vocoder"]["spk"]["table"]).sum())
    assert np.isfinite(spk_g) and spk_g > 0


def test_fused_vocoder_layer_norm_parity_interpret():
    """layer_norm-trained vocoders must serve correctly through the
    fused kernel (ADVICE r2: the kernel used to silently compute plain
    LSTM gates). Greedy fused == plain generate, bit-exact."""
    cfg = SampleRNNConfig(rnn_dim=32, mlp_dim=32, embed_dim=8, cond_dim=5,
                          layer_norm=True)
    model = SampleRNN(cfg)
    params = model.init_params(jax.random.PRNGKey(11))
    # perturb the LN params away from identity so a kernel that ignores
    # them cannot pass by accident
    params["tier"]["ln_g"]["g"] = params["tier"]["ln_g"]["g"] * 1.3 + 0.1
    params["tier"]["ln_g"]["b"] = params["tier"]["ln_g"]["b"] + 0.05
    params["tier"]["ln_c"]["g"] = params["tier"]["ln_c"]["g"] * 0.8
    params["tier"]["ln_c"]["b"] = params["tier"]["ln_c"]["b"] - 0.02
    norm = {"mean": jnp.zeros(5), "std": jnp.ones(5)}
    B, Sc = 3, 12
    rng = np.random.default_rng(12)
    cond = jnp.asarray(rng.normal(size=(B, Sc, 5)), jnp.float32)
    mask = jnp.ones((B, Sc), jnp.float32).at[2, 9:].set(0.0)
    q_ref, _, _ = model.generate(params, norm, cond, mask,
                                 jax.random.PRNGKey(0), temperature=0.0)
    q_f, _ = model.generate_fused(params, norm, cond, mask, seed=0,
                                  temperature=0.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(q_ref), np.asarray(q_f))


def test_fused_vocoder_layer_norm_weight_tuple_guard():
    """prepare_vocoder_params appends 4 LN rows; serving them without
    layer_norm=True (or vice versa) must fail loudly, not silently."""
    from parrot_tpu.ops.fused_vocoder import (prepare_vocoder_params,
                                              fused_vocoder_decode,
                                              make_vocoder_init,
                                              n_weight_arrays, N_WEIGHTS)
    cfg = SampleRNNConfig(rnn_dim=32, mlp_dim=32, embed_dim=8, cond_dim=5,
                          layer_norm=True)
    model = SampleRNN(cfg)
    params = model.init_params(jax.random.PRNGKey(2))
    kp = prepare_vocoder_params(model, params, weight_dtype=jnp.float32)
    assert len(kp) == n_weight_arrays(True) == N_WEIGHTS + 4
    assert kp[-4].shape == (1, 4 * cfg.rnn_dim)   # gate LN gain
    assert kp[-2].shape == (1, cfg.rnn_dim)       # cell LN gain
    init = make_vocoder_init(params, model.init_state(2), model.RF,
                             model.E)
    cond = jnp.zeros((8, 2, 5), jnp.float32)
    mask = jnp.ones((8, 2), jnp.float32)
    with pytest.raises(AssertionError, match="layer_norm"):
        fused_vocoder_decode(kp, cond, mask, init,
                             jnp.zeros((1,), jnp.int32), T_c=8, D=5,
                             FS=cfg.frame_size, RF=cfg.rf_size,
                             E=cfg.embed_dim, H=cfg.rnn_dim,
                             M=cfg.mlp_dim, Q=cfg.quantization,
                             SPC=cfg.steps_per_cond, temperature=0.0,
                             interpret=True, layer_norm=False)


def test_generate_robust_transient_vs_permanent():
    """SampleRNN.generate_robust mirrors the Sampler fallback contract:
    transient errors retry next call, permanent ones stick."""
    cfg = SampleRNNConfig(rnn_dim=32, mlp_dim=32, embed_dim=8, cond_dim=5)
    model = SampleRNN(cfg)
    params = model.init_params(jax.random.PRNGKey(3))
    norm = {"mean": jnp.zeros(5), "std": jnp.ones(5)}
    cond = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 5)),
                       jnp.float32)
    mask = jnp.ones((2, 8), jnp.float32)
    calls = []

    def flaky(*a, **kw):
        calls.append(1)
        raise RuntimeError("transient tunnel blip")

    model.generate_fused = flaky
    q, audio = model.generate_robust(params, norm, cond, mask, seed=0,
                                     temperature=0.0)
    assert q.shape == (2, 8 * cfg.hop)
    assert not getattr(model, "_fused_broken", False)
    model.generate_robust(params, norm, cond, mask, seed=0,
                          temperature=0.0)
    assert len(calls) == 2  # retried

    def broken(*a, **kw):
        calls.append(1)
        raise ValueError("weight tuple has 13 arrays, expected 17")

    model.generate_fused = broken
    model.generate_robust(params, norm, cond, mask, seed=0,
                          temperature=0.0)
    assert getattr(model, "_fused_broken", False)
    model.generate_robust(params, norm, cond, mask, seed=0,
                          temperature=0.0)
    assert calls.count(1) == 3  # no retry once broken
