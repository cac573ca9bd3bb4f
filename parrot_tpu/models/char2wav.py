"""Char2Wav joint model: attention RNN + neural vocoder, trained together.

Char2Wav (Sotelo et al., ICLR 2017 workshop) is a reader (the Parrot
attention RNN, models/parrot.py) driving a SampleRNN neural vocoder
(models/samplernn.py). The paper's recipe: pretrain both halves
separately, then FINE-TUNE THEM END-TO-END — the vocoder reads the
reader's *predicted* vocoder frames (not ground truth), and its
waveform NLL back-propagates through the conditioning into every reader
parameter. The reference repo only exposes the conditioning-feature
hook to an external Theano SampleRNN (SURVEY.md §2.3 N3,
BASELINE.json:11) and cannot train jointly; with both halves native
JAX here, the joint objective is one `value_and_grad`.

Joint segment loss (teacher-forced TBPTT on both tiers):

    L = frame_w * L_parrot(frames | text)                    (GMM NLL / MSE)
      + audio_w * L_vocoder(audio | pred_frames(text))       (mu-law NLL)

where pred_frames is the parrot model's differentiable per-step frame
prediction (GMM mixture expectation / MSE output) in raw feature space
— see Parrot.compute_cost(with_predictions=True). `detach_frames=True`
stops the gradient at the conditioning boundary (vocoder-only
adaptation to predicted frames — the useful ablation and a cheaper
second pretraining stage).

Both carried TBPTT states ride in one JointState so the standard
segment stream / checkpoint machinery drives the pair.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from parrot_tpu.config import ModelConfig, SampleRNNConfig
from parrot_tpu.models.parrot import DecoderState, Parrot
from parrot_tpu.models.samplernn import (SampleRNN, SampleRNNState,
                                         VocoderBatch)


class JointState(NamedTuple):
    parrot: DecoderState
    vocoder: SampleRNNState


class Char2Wav:
    """Static structure; params are {"parrot": ..., "vocoder": ...}."""

    def __init__(self, pcfg: ModelConfig, vcfg: SampleRNNConfig):
        if pcfg.frame_size != vcfg.cond_dim:
            raise ValueError(
                f"parrot frame_size {pcfg.frame_size} != vocoder cond_dim "
                f"{vcfg.cond_dim}")
        self.pcfg = pcfg
        self.vcfg = vcfg
        self.parrot = Parrot(pcfg)
        self.vocoder = SampleRNN(vcfg)

    def init_params(self, key) -> Dict:
        kp, kv = jax.random.split(key)
        return {"parrot": self.parrot.init_params(kp),
                "vocoder": self.vocoder.init_params(kv)}

    def init_state(self, batch_size: int, text_len: int) -> JointState:
        return JointState(
            parrot=self.parrot.init_state(batch_size, text_len),
            vocoder=self.vocoder.init_state(batch_size))

    def compute_cost(self, params, norm, jbatch, state: Optional[JointState],
                     rng=None, frame_loss_weight: float = 1.0,
                     audio_loss_weight: float = 1.0,
                     detach_frames: bool = False,
                     input_frames=None
                     ) -> Tuple[jnp.ndarray, JointState, Dict]:
        """Teacher-forced joint segment cost.

        jbatch: a data.JointBatch (frames: data.Batch with RAW features,
        audio: (B, S*hop) mu-law ids). norm: the frame-feature mean/std
        (shared: the parrot model normalizes its inputs/targets with it,
        the vocoder normalizes its conditioning with it). Returns
        (scalar loss, new JointState, metrics with both halves' terms).

        input_frames (B, S, D) RAW: alternative frames for the reader's
        shifted teacher-forcing INPUT (targets stay jbatch.frames) —
        the Trainer-style parallel scheduled-sampling hook
        (Parrot.compute_cost docstring). A reader fine-tuned under
        scheduled sampling sits at an optimum conditioned on consuming
        its own frames; joint fine-tuning must match that regime or its
        gradients pull the reader toward the pure-teacher-forced
        optimum it was deliberately trained away from (the round-4
        rich10k joint divergence, docs/PERFORMANCE.md round 5).
        """
        batch = jbatch.frames
        if state is None:
            state = self.init_state(batch.features.shape[0],
                                    batch.text.shape[1])
        p_loss, p_state, p_metrics = self.parrot.compute_cost(
            params["parrot"], norm, batch, state.parrot, rng=rng,
            with_predictions=True, input_frames=input_frames)
        cond = p_metrics.pop("pred_frames")                    # (B, S, D) raw
        if detach_frames:
            cond = jax.lax.stop_gradient(cond)
        vbatch = VocoderBatch(audio=jbatch.audio, cond=cond,
                              cond_mask=batch.features_mask,
                              start_flag=batch.start_flag,
                              speaker=(batch.speaker
                                       if self.vcfg.use_speaker else None))
        v_loss, v_state, v_metrics = self.vocoder.compute_cost(
            params["vocoder"], norm, vbatch, state.vocoder)
        loss = frame_loss_weight * p_loss + audio_loss_weight * v_loss
        metrics = {
            "loss": loss,
            "frame_loss": p_loss,
            "audio_loss": v_loss,
            "bits_per_sample": v_metrics["bits_per_sample"],
            "frames": p_metrics["frames"],
            "samples": v_metrics["samples"],
        }
        return loss, JointState(parrot=p_state, vocoder=v_state), metrics
