"""Quality evaluation: teacher-forced and free-running MCD + NLL.

The parity contract is MCD vs the reference (BASELINE.json:2,5). Without
the reference on disk (SURVEY.md §0) the same machinery evaluates a
trained model against ground-truth corpus features:

  * teacher-forced MCD — per-frame point predictions (argmax-pi mixture
    mean) vs ground truth, frame-aligned;
  * free-running MCD — autoregressive generation vs ground truth, DTW
    aligned (lengths differ);
  * valid NLL — the training objective on held-out data.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.config import DataConfig, SampleConfig
from parrot_tpu.data import H5Corpus, parrot_stream
from parrot_tpu.models import Parrot
from parrot_tpu.nn.mdn import gmm_nll, mse_cost, split_gmm_params
from parrot_tpu.sample import Sampler, bucket_by_length
from parrot_tpu.vocoder.mcd import mcd


def teacher_forced_predictions(model: Parrot, params, norm, batch,
                               state=None):
    """One teacher-forced pass: point predictions (GMM -> argmax-pi
    mixture mean; MSE -> head output), NLL, and attention weights.
    Returns ((B, S, D) RAW-domain frames, new_state, phis (S, B, U),
    nll_sum scalar, frames scalar). `state` is the carried TBPTT
    DecoderState — REQUIRED for segments after the first, or
    mid-utterance predictions restart with kappa=0 and attend to the
    text start."""
    cfg = model.cfg
    B, S, D = batch.features.shape
    xn = (jnp.asarray(batch.features) - norm["mean"]) / norm["std"]
    x_tgt = xn.transpose(1, 0, 2)
    start = jnp.asarray(batch.start_flag)
    prev = (jnp.asarray(batch.prev_frame) - norm["mean"]) / norm["std"]
    prev = (1.0 - start) * prev
    x_in = jnp.concatenate([prev[None], x_tgt[:-1]], axis=0)
    if state is None:
        state = model.init_state(B, batch.text.shape[1])
    state = jax.tree.map(lambda z: (1.0 - start) * z, state)
    state = state._replace(enc=model.encode(
        params, jnp.asarray(batch.text), jnp.asarray(batch.text_mask)))
    spk = model._speaker_vec(params, jnp.asarray(batch.speaker))
    raw, new_state, phis = model.scan_decoder(
        params, state, x_in, jnp.asarray(batch.features_mask).T,
        jnp.asarray(batch.text_mask), spk)
    mask_t = jnp.asarray(batch.features_mask).T            # (S, B)
    if cfg.which_cost == "GMM":
        mu, ls, pi = split_gmm_params(raw, D, cfg.num_mixtures,
                                      cfg.min_log_sigma)
        cost = gmm_nll(x_tgt, mu, ls, pi)                  # (S, B)
        comp = jnp.argmax(pi, axis=-1)                     # (S, B)
        pred = jnp.take_along_axis(
            mu, comp[..., None, None], axis=2)[..., 0, :]  # (S, B, D)
    else:
        cost = mse_cost(x_tgt, raw)
        pred = raw
    nll_sum = (cost * mask_t).sum()
    frames = mask_t.sum()
    # carry the last VALID frame (segment tails can be padding), matching
    # Parrot.compute_cost
    n_valid = mask_t.sum(axis=0)
    last_idx = jnp.maximum(n_valid - 1, 0).astype(jnp.int32)
    last_valid = jnp.take_along_axis(x_tgt, last_idx[None, :, None],
                                     axis=0)[0]
    x_last = jnp.where((n_valid > 0)[:, None], last_valid, state.x_last)
    new_state = new_state._replace(x_last=x_last)
    raw_pred = (pred * norm["std"] + norm["mean"]).transpose(1, 0, 2)
    return raw_pred, new_state, phis, nll_sum, frames


def mcd_report(model: Parrot, params, norm, corpus: H5Corpus,
               data_cfg: DataConfig, sample_cfg: SampleConfig,
               num_utterances: int = 8, n_sp: Optional[int] = None,
               split: str = "valid") -> Dict[str, float]:
    """Evaluate teacher-forced MCD, free-running (DTW) MCD, and NLL."""
    n_sp = n_sp if n_sp is not None else max(1, model.D - 6)
    idx = corpus.split(split)[:num_utterances]

    # --- teacher-forced MCD + NLL in ONE pass over the eval stream
    def _tf(b, st):
        pred, new_state, _phis, s, f = teacher_forced_predictions(
            model, params, norm, b, st)
        return pred, new_state, s, f

    tf_pred = jax.jit(_tf)
    tf_dists, nll_sum, frames_sum = [], 0.0, 0.0
    B0 = data_cfg.batch_size
    pred_state = model.init_state(B0, data_cfg.max_text_len)
    for batch in parrot_stream(corpus, data_cfg, split, training=False,
                               epochs=1):
        pred, pred_state, s, f = tf_pred(batch, pred_state)
        pred = np.asarray(pred)
        nll_sum += float(s)
        frames_sum += float(f)
        m = np.asarray(batch.features_mask)
        for b in range(pred.shape[0]):
            n = int(m[b].sum())
            if n == 0:
                continue
            ref = np.asarray(batch.features[b, :n])
            d = mcd(ref[:, :n_sp], pred[b, :n][:, :n_sp])
            tf_dists.append((d, n))

    tf_frames = sum(n for _, n in tf_dists)
    tf_mcd = (sum(d * n for d, n in tf_dists) / tf_frames
              if tf_frames else float("nan"))

    # --- free-running with DTW alignment
    sampler = Sampler(model, params, norm, sample_cfg)
    texts = [corpus.text(int(i)) for i in idx]
    speakers = [corpus.speaker(int(i)) for i in idx]
    fr_dists = []
    for bidx, text, mask in bucket_by_length(texts, sample_cfg.batch_size):
        spk = np.asarray([speakers[i] for i in bidx], np.int32)
        frames, lengths, _ = sampler.generate(text, mask, spk,
                                              return_phis=False)
        frames = np.asarray(frames)
        for r, i in enumerate(bidx):
            L = int(lengths[r])
            ref = corpus.features(int(idx[i]))
            if L < 2:
                continue
            fr_dists.append(mcd(ref[:, :n_sp], frames[r, :L, :n_sp],
                                use_dtw=True))

    # --- shuffled-pair calibration baseline: DTW-MCD between MISMATCHED
    # reference utterances (same speaker where possible). Free-running
    # MCD is only meaningful relative to this — it is what a model that
    # produces fluent but text-unrelated speech would score.
    sh_dists = []
    refs = [corpus.features(int(i)) for i in idx]
    spks = [int(corpus.speaker(int(i))) for i in idx]
    for a_i in range(len(idx)):
        cands = [b_i for b_i in range(len(idx))
                 if b_i != a_i and spks[b_i] == spks[a_i]] or \
                [b_i for b_i in range(len(idx)) if b_i != a_i]
        if not cands:
            continue
        b_i = cands[a_i % len(cands)]
        sh_dists.append(mcd(refs[a_i][:, :n_sp], refs[b_i][:, :n_sp],
                            use_dtw=True))

    return {
        "teacher_forced_mcd": float(tf_mcd),
        "free_running_mcd": float(np.mean(fr_dists)) if fr_dists else float("nan"),
        "shuffled_pair_mcd": (float(np.mean(sh_dists)) if sh_dists
                              else float("nan")),
        "valid_nll": (nll_sum / frames_sum if frames_sum
                      else float("nan")),
        "num_utterances": len(idx),
    }


def neural_vocoder_report(vmodel, vparams, vnorm, corpus: H5Corpus,
                          num_utterances: int = 4, temperature: float = 1.0,
                          seed: int = 0, n_sp: Optional[int] = None,
                          split: str = "valid") -> Dict[str, float]:
    """Quality report for a trained SampleRNN vocoder.

    Drives the vocoder with GROUND-TRUTH conditioning frames, re-analyzes
    the generated waveform with WORLD, and scores the re-coded envelope
    against the reference features (DTW MCD). The same resynthesis MCD is
    computed for the WORLD synthesis filter — the baseline the neural
    vocoder replaces — plus held-out teacher-forced bits/sample.
    """
    import jax as _jax

    from parrot_tpu.models.samplernn import VocoderBatch
    from parrot_tpu.vocoder import (analyze, code_frames, decode_frames,
                                    synthesize)

    assert corpus.has_audio, "corpus has no /audio"
    fs = corpus.sample_rate
    hop = corpus.audio_hop
    D = corpus.frame_size
    n_sp_code = D - 6  # corpus coding: D = n_sp + 4 band-ap + lf0 + vuv
    n_mcd = n_sp if n_sp is not None else n_sp_code
    idx = corpus.split(split)[:num_utterances]

    neural_d, world_d = [], []
    for i in idx:
        feats = corpus.features(int(i))                     # (T, D) raw
        T = feats.shape[0]
        cond = jnp.asarray(feats[None], jnp.float32)
        mask = jnp.ones((1, T), jnp.float32)
        spk = jnp.asarray([corpus.speaker(int(i))], jnp.int32)
        _, audio, _ = vmodel.generate(vparams, vnorm, cond, mask,
                                      _jax.random.PRNGKey(seed),
                                      temperature=temperature,
                                      speaker=spk)
        y = np.asarray(audio[0], np.float64)
        f0, sp, ap = analyze(y, fs)
        coded = code_frames(f0, sp, ap, n_sp=n_sp_code)     # (~T, D)
        neural_d.append(mcd(feats[:, :n_mcd], coded[:, :n_mcd],
                            use_dtw=True))
        # WORLD-resynthesis baseline: features -> wav -> features
        f0r, spr, apr = decode_frames(feats, fs)
        yw = synthesize(f0r, spr, apr, fs)
        f0w, spw, apw = analyze(yw, fs)
        codedw = code_frames(f0w, spw, apw, n_sp=n_sp_code)
        world_d.append(mcd(feats[:, :n_mcd], codedw[:, :n_mcd],
                           use_dtw=True))

    # held-out teacher-forced bits/sample (one whole-utterance segment
    # per utterance keeps this simple and exact)
    bits_sum, n_sum = 0.0, 0.0
    cost = _jax.jit(lambda b: vmodel.compute_cost(vparams, vnorm, b,
                                                  None)[2])
    for i in idx:
        feats = corpus.features(int(i))
        q = corpus.audio(int(i))
        b = VocoderBatch(
            audio=jnp.asarray(q[None], jnp.int32),
            cond=jnp.asarray(feats[None], jnp.float32),
            cond_mask=jnp.ones((1, feats.shape[0]), jnp.float32),
            start_flag=jnp.float32(1.0),
            speaker=jnp.asarray([corpus.speaker(int(i))], jnp.int32))
        m = cost(b)
        bits_sum += float(m["bits_per_sample"]) * float(m["samples"])
        n_sum += float(m["samples"])

    return {
        "neural_resynthesis_mcd": float(np.mean(neural_d)),
        "world_resynthesis_mcd": float(np.mean(world_d)),
        "valid_bits_per_sample": bits_sum / max(n_sum, 1.0),
        "num_utterances": len(idx),
        "temperature": float(temperature),
    }
