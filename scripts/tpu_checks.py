#!/usr/bin/env python
"""On-chip acceptance checks (run manually on a real TPU; the pytest
suite deliberately forces a CPU platform). Covers what interpret mode
cannot: Mosaic lowering and the in-kernel PRNG.

  python scripts/tpu_checks.py          # ~5-10 min incl. compiles

Exit code 0 = all checks pass. SURVEY.md §4 "Kernel parity ... both
interpret mode (CPU) and real TPU".
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from parrot_tpu.config import ModelConfig, SampleConfig
    from parrot_tpu.models import Parrot
    from parrot_tpu.sample import Sampler

    backend = jax.default_backend()
    if backend == "cpu":
        sys.exit("tpu_checks must run on a TPU backend (got cpu)")
    print(f"backend: {backend}, devices: {jax.devices()}")
    failures = []

    def check(name, ok, detail=""):
        print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}")
        if not ok:
            failures.append(name)

    def parity(cfg, tag, tol):
        model = Parrot(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        D = cfg.frame_size
        norm = {"mean": jnp.zeros((D,)), "std": jnp.ones((D,))}
        s = Sampler(model, params, norm,
                    SampleConfig(max_steps=32, seed=1))
        rng = np.random.default_rng(0)
        text = jnp.asarray(rng.integers(1, cfg.vocab_size, (4, 6)),
                           jnp.int32)
        mask = jnp.ones((4, 6))
        f_ref, l_ref, p_ref = s.generate(text, mask, return_phis=True,
                                         use_fused=False)
        f_fus, l_fus, p_fus = s.generate(text, mask, return_phis=True)
        fell_back = getattr(s, "_fused_broken", False)
        a, b = np.asarray(f_ref), np.asarray(f_fus)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
        check(f"{tag}: fused kernel compiled (no fallback)", not fell_back)
        check(f"{tag}: value parity vs while_loop", err < tol,
              f"(max rel err {err:.2e}, tol {tol})")
        check(f"{tag}: stop lengths agree",
              np.array_equal(np.asarray(l_ref), np.asarray(l_fus)))
        pr, pf = np.asarray(p_ref), np.asarray(p_fus)
        perr = np.abs(pr - pf).max()
        check(f"{tag}: fused phi (attention plots) parity", perr < tol,
              f"(max abs err {perr:.2e}, tol {tol})")

    tiny = dict(frame_size=7, vocab_size=9, embed_dim=8, encoder_dim=8,
                rnn_h_dim=16, decoder_layers=3, readouts_dim=16,
                attention_mixtures=2, num_mixtures=2)
    # MSE (deterministic): value parity. Tolerance covers TPU default
    # matmul precision compounding over 32 recurrent steps.
    parity(ModelConfig(which_cost="MSE", **tiny), "MSE", 1e-2)
    parity(ModelConfig(which_cost="MSE", layer_norm=True, **tiny),
           "MSE+LN", 1e-2)

    # GMM on chip: determinism + sampling statistics + kappa monotone
    cfg = ModelConfig(**tiny)
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    norm = {"mean": jnp.zeros((7,)), "std": jnp.ones((7,))}
    s = Sampler(model, params, norm,
                SampleConfig(max_steps=64, seed=3, stop_threshold=1.1,
                             sampling_bias=0.0))
    rng = np.random.default_rng(1)
    text = jnp.asarray(rng.integers(1, 9, (8, 6)), jnp.int32)
    mask = jnp.ones((8, 6))
    f1, _, _ = s.generate(text, mask, key=jax.random.PRNGKey(5),
                          return_phis=False)
    f2, _, _ = s.generate(text, mask, key=jax.random.PRNGKey(5),
                          return_phis=False)
    f3, _, _ = s.generate(text, mask, key=jax.random.PRNGKey(6),
                          return_phis=False)
    check("GMM: kernel path used", not getattr(s, "_fused_broken", False))
    check("GMM: deterministic per seed",
          np.array_equal(np.asarray(f1), np.asarray(f2)))
    check("GMM: seed-sensitive",
          np.abs(np.asarray(f1) - np.asarray(f3)).max() > 1e-6)
    check("GMM: finite", bool(np.isfinite(np.asarray(f1)).all()))
    # bias sharpening: higher bias -> lower sample variance around mu
    s_hi = Sampler(model, params, norm,
                   SampleConfig(max_steps=64, seed=3, stop_threshold=1.1,
                                sampling_bias=3.0))
    f_hi, _, _ = s_hi.generate(text, mask, key=jax.random.PRNGKey(5),
                               return_phis=False)
    # frame-to-frame jitter proxy: variance of first differences
    d0 = np.diff(np.asarray(f1), axis=1).std()
    d3 = np.diff(np.asarray(f_hi), axis=1).std()
    check("GMM: bias reduces sampling spread", d3 < d0,
          f"(std diff {d0:.3f} -> {d3:.3f})")

    # --- in-kernel GMM sampling DISTRIBUTION with the real TPU PRNG ---
    # (the CPU tests in tests/test_gmm_distribution.py inject host
    # uniforms because the TPU interpreter stubs prng_random_bits; this
    # is the only place the hardware PRNG's statistics are checked.
    # Mixture definition + bounds live in tests/gmm_stats.py — one copy.)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from gmm_stats import check_mixture_stats, draw_kernel_samples
    for sampling_bias in (0.0, 1.0):
        # uniforms=None -> the real hardware PRNG (the one thing the CPU
        # tests cannot touch); same harness + bounds as the CPU tests,
        # loosened to 5 sigma (one-off samples, no reruns on flake)
        samples = draw_kernel_samples(sampling_bias, seed=13)
        ok_freq, ok_mean, ok_std, detail = check_mixture_stats(
            samples, sampling_bias, nsigma=5.0, std_slack=0.03)
        tag = f"GMM PRNG stats (bias={sampling_bias})"
        check(f"{tag}: component frequencies", ok_freq, detail)
        check(f"{tag}: component means", ok_mean)
        check(f"{tag}: component stddevs (sigma*e^-b)", ok_std)

    # --- fused SampleRNN vocoder kernel (ops/fused_vocoder.py) ---
    from parrot_tpu.config import SampleRNNConfig
    from parrot_tpu.models.samplernn import SampleRNN

    vcfg = SampleRNNConfig(rnn_dim=64, mlp_dim=128, embed_dim=16, cond_dim=7)
    vm = SampleRNN(vcfg)
    vparams = vm.init_params(jax.random.PRNGKey(3))
    vnorm = {"mean": jnp.zeros(7), "std": jnp.ones(7)}
    B, Sc = 8, 16
    vrng = np.random.default_rng(2)
    vcond = jnp.asarray(vrng.normal(size=(B, Sc, 7)), jnp.float32)
    vmask = jnp.ones((B, Sc), jnp.float32).at[0, 12:].set(0.0)
    q_ref, _, _ = vm.generate(vparams, vnorm, vcond, vmask,
                              jax.random.PRNGKey(0), temperature=0.0)
    q_f, _ = vm.generate_fused(vparams, vnorm, vcond, vmask, seed=0,
                               temperature=0.0)
    match = float((np.asarray(q_ref) == np.asarray(q_f)).mean())
    check("vocoder kernel: greedy parity vs plain path", match == 1.0,
          f"(match {match:.4f})")
    q1, a1 = vm.generate_fused(vparams, vnorm, vcond, vmask, seed=1,
                               temperature=1.0)
    q2, _ = vm.generate_fused(vparams, vnorm, vcond, vmask, seed=2,
                              temperature=1.0)
    q1r, _ = vm.generate_fused(vparams, vnorm, vcond, vmask, seed=1,
                               temperature=1.0)
    q1, q2, q1r = map(np.asarray, (q1, q2, q1r))
    check("vocoder kernel: sampled output finite",
          bool(np.isfinite(np.asarray(a1)).all()))
    check("vocoder kernel: PRNG seed-sensitive + deterministic",
          bool((q1 != q2).any() and (q1 == q1r).all()))
    check("vocoder kernel: masked frames emit silence",
          bool((q1[0, 12 * vcfg.hop:] == vm.zero_id).all()))

    # layer_norm variant: a distinct Mosaic lowering (mean/rsqrt in the
    # gate path); greedy agreement vs the plain path, LN params
    # perturbed so ignoring them cannot pass (round-3 ADVICE fix).
    # NOT bit-exact on hardware: Mosaic and XLA order the LN cross-lane
    # reductions differently, so rare argmax flips in the 256-way
    # categorical briefly perturb the trajectory (measured ~0.98 match;
    # an LN-IGNORING kernel measures ~0.17, so >=0.95 separates rounding
    # flutter from wrong math; CPU interpret parity is bit-exact —
    # tests/test_samplernn.py).
    lcfg = SampleRNNConfig(rnn_dim=64, mlp_dim=128, embed_dim=16,
                           cond_dim=7, layer_norm=True)
    lvm = SampleRNN(lcfg)
    lparams = lvm.init_params(jax.random.PRNGKey(5))
    lparams["tier"]["ln_g"]["g"] = lparams["tier"]["ln_g"]["g"] * 1.3 + 0.1
    lparams["tier"]["ln_c"]["b"] = lparams["tier"]["ln_c"]["b"] - 0.05
    ql_ref, _, _ = lvm.generate(lparams, vnorm, vcond, vmask,
                                jax.random.PRNGKey(0), temperature=0.0)
    ql_f, _ = lvm.generate_fused(lparams, vnorm, vcond, vmask, seed=0,
                                 temperature=0.0)
    lmatch = float((np.asarray(ql_ref) == np.asarray(ql_f)).mean())
    check("vocoder kernel: layer_norm greedy agreement", lmatch >= 0.95,
          f"(match {lmatch:.4f}; LN-ignoring kernel would be ~0.17)")

    # streaming continuation (emit_state): two chunked calls with the
    # carried state must equal the one-shot call bit-for-bit (greedy
    # f32 — the deterministic mode; sample/streaming.py relies on this)
    from parrot_tpu.ops.fused_vocoder import (
        prepare_vocoder_params, make_vocoder_init, fused_vocoder_decode,
        split_vocoder_state)

    @jax.jit
    def voc_stream_two(vparams, cond_n, vmask):
        vkp = prepare_vocoder_params(vm, vparams, jnp.float32)
        init = make_vocoder_init(vparams, vm.init_state(B), vm.RF, vm.E)
        kw = dict(D=7, FS=vcfg.frame_size, RF=vcfg.rf_size,
                  E=vcfg.embed_dim, H=vcfg.rnn_dim, M=vcfg.mlp_dim,
                  Q=vcfg.quantization, SPC=vcfg.steps_per_cond,
                  temperature=0.0, chunk_frames=8, emit_state=True)
        seed = jnp.zeros((1,), jnp.int32)
        ids_full, _ = fused_vocoder_decode(
            vkp, cond_n, vmask.T, init, seed, T_c=Sc, **kw)
        h = Sc // 2
        ids_a, st = fused_vocoder_decode(
            vkp, cond_n[:h], vmask.T[:h], init, seed, T_c=h, **kw)
        ids_b, _ = fused_vocoder_decode(
            vkp, cond_n[h:], vmask.T[h:],
            split_vocoder_state(st, H=vcfg.rnn_dim, FS=vcfg.frame_size,
                                RF=vcfg.rf_size, E=vcfg.embed_dim),
            seed, T_c=h, **kw)
        return ids_full, jnp.concatenate([ids_a, ids_b], axis=0)

    cond_n = ((vcond - vnorm["mean"]) / vnorm["std"]).transpose(1, 0, 2)
    ids_full, ids_chunked = voc_stream_two(vparams, cond_n, vmask)
    check("vocoder kernel: chunked emit_state continuation == one-shot",
          bool((np.asarray(ids_full) == np.asarray(ids_chunked)).all()))

    # sampled-distribution stats: pin the sample MLP so the per-sample
    # logits are a KNOWN constant vector (w1=w2=0, generous positive
    # biases keep the ReLUs linear-on-constant; head weights 0, head
    # bias = target logits), then the in-kernel Gumbel-max frequencies
    # must match softmax(logits / temperature). A sign/scale error in
    # the vocoder's Gumbel or temperature plumbing fails this; greedy
    # parity and seed tests alone would not catch it.
    import jax.tree_util as jtu
    Q = vcfg.quantization
    target = np.full((Q,), -3.0, np.float32)
    hot = [10, 100, 200]
    target[hot] = [1.5, 2.5, 0.5]
    vp2 = jtu.tree_map(jnp.zeros_like, vparams)
    vp2["mlp1"]["b"] = jnp.full_like(vparams["mlp1"]["b"], 1.0)
    vp2["mlp2"]["b"] = jnp.full_like(vparams["mlp2"]["b"], 1.0)
    vp2["head"]["b"] = jnp.asarray(target)
    for temp in (1.0, 0.7):
        qs = []
        for seed in range(4):
            q_s, _ = vm.generate_fused(vp2, vnorm, vcond, jnp.ones_like(vmask),
                                       seed=seed, temperature=temp)
            qs.append(np.asarray(q_s))
        ids = np.concatenate(qs, axis=0).ravel()          # 4*B*Sc*hop draws
        freq = np.bincount(ids, minlength=Q) / ids.size
        want = np.exp(target / temp)
        want = want / want.sum()
        # ~41k draws: dominant-bin frequencies are tight to ~0.5%
        ok = all(abs(freq[h] - want[h]) < 0.015 for h in hot)
        check(f"vocoder kernel: sampled id frequencies (T={temp})", ok,
              f"(got {[round(float(freq[h]), 3) for h in hot]} want "
              f"{[round(float(want[h]), 3) for h in hot]})")

    # ---- fused Pallas TRAINING scan: on-chip loss/grad parity vs the
    # lax.scan split path at flagship layer dims (ops/fused_train_scan;
    # real-batch flagship validation recorded in docs/PERFORMANCE.md)
    import dataclasses as _dc
    from parrot_tpu.data.pipeline import Batch
    from parrot_tpu.train.optim import adam_init  # noqa: F401 (warm import)
    tb = 32
    tcfg = ModelConfig(use_speaker=True, num_speakers=4)
    rng = np.random.default_rng(3)
    tbatch = Batch(
        features=jnp.asarray(rng.normal(size=(tb, 30, tcfg.frame_size)),
                             jnp.float32),
        features_mask=jnp.ones((tb, 30)),
        prev_frame=jnp.zeros((tb, tcfg.frame_size)),
        text=jnp.asarray(rng.integers(1, tcfg.vocab_size, (tb, 128)),
                         jnp.int32),
        text_mask=jnp.ones((tb, 128)),
        speaker=jnp.zeros((tb,), jnp.int32),
        start_flag=jnp.float32(1.0))
    tnorm = {"mean": jnp.zeros((tcfg.frame_size,)),
             "std": jnp.ones((tcfg.frame_size,))}
    touts = {}
    for tflag in (False, True):
        tm = Parrot(_dc.replace(tcfg, pallas_scan=tflag))
        tp = tm.init_params(jax.random.PRNGKey(0))
        tst = tm.init_state(tb, 128)

        def tcost(pp, tm=tm, tst=tst):
            loss, _, _ = tm.compute_cost(pp, tnorm, tbatch, tst)
            return loss

        touts[tflag] = jax.jit(jax.value_and_grad(tcost))(tp)
    tl0, tg0 = touts[False]
    tl1, tg1 = touts[True]
    lerr = abs(float(tl0) - float(tl1)) / max(abs(float(tl0)), 1e-9)
    check("pallas train scan: loss parity", lerr < 1e-5,
          f"(rel err {lerr:.2e})")
    worst_cos, worst_ratio = 1.0, 1.0
    for a, b in zip(jax.tree.leaves(tg0), jax.tree.leaves(tg1)):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < 1e-12:
            continue
        worst_cos = min(worst_cos, float(a @ b / (na * nb)))
        r = nb / na
        if abs(r - 1) > abs(worst_ratio - 1):
            worst_ratio = r
    check("pallas train scan: gradient parity",
          worst_cos > 0.9999 and abs(worst_ratio - 1) < 0.01,
          f"(worst cos {worst_cos:.6f}, worst norm ratio "
          f"{worst_ratio:.4f})")

    print(f"\n{len(failures)} failures" if failures else "\nALL CHECKS PASS")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
