"""Adversarial auto-pinning tests (VERDICT r2 next-step #2).

A Blocks-shaped archive with realistic brick paths, a scrambled fused
gate order, and transposed matrices must be recovered by
train/auto_pin.auto_pin WITHOUT hand-written map entries: the pinned
params' activations match the trace to 1e-5. Also exercises the
generalized build_default_map at depths the old DEFAULT_MAP hardcoded
(encoder_layers=2, decoder_layers=2 — VERDICT r2 weak #2).
"""

import jax
import numpy as np
import pytest

from parrot_tpu.config import ModelConfig
from parrot_tpu.data.pipeline import Batch
from parrot_tpu.models import Parrot
from parrot_tpu.train.auto_pin import auto_pin
from parrot_tpu.train.checkpoint import flatten_tree
from parrot_tpu.train.parity import diff_trace, dump_trace
from parrot_tpu.train.theano_import import gate_reorder


def setup(encoder_layers=2, decoder_layers=2, readouts_dim=8):
    cfg = ModelConfig(frame_size=5, vocab_size=7, embed_dim=4,
                      encoder_dim=4, rnn_h_dim=8,
                      encoder_layers=encoder_layers,
                      decoder_layers=decoder_layers,
                      readouts_dim=readouts_dim,
                      attention_mixtures=2, num_mixtures=2,
                      use_speaker=True, num_speakers=3, speaker_dim=2)
    model = Parrot(cfg)
    true_params = model.init_params(jax.random.PRNGKey(7))
    rng = np.random.default_rng(3)
    B, S, U, D = 3, 6, 9, cfg.frame_size
    batch = Batch(
        features=rng.normal(size=(B, S, D)).astype(np.float32),
        features_mask=np.ones((B, S), np.float32),
        prev_frame=np.zeros((B, D), np.float32),
        text=rng.integers(1, cfg.vocab_size, (B, U)).astype(np.int32),
        text_mask=np.ones((B, U), np.float32),
        speaker=rng.integers(0, 3, (B,)).astype(np.int32),
        start_flag=np.float32(1.0),
    )
    norm = {"mean": np.zeros(D, np.float32), "std": np.ones(D, np.float32)}
    return model, true_params, norm, batch


def blocks_name(path: str) -> str:
    """Realistic Blocks-style brick path for one of our tree paths."""
    part, leaf = path.rsplit("/", 1)
    W = {"wx": "W", "wh": "W_state", "b": "biases",
         "w": "W", "table": "W"}.get(leaf, leaf)
    if path == "embed/table":
        return "/parrot/lookup/char_embedding.W"
    if path == "speaker/table":
        return "/parrot/speaker_lookup.W"
    if part.startswith("enc_fwd/") or part.startswith("enc_bwd/"):
        d = "forward" if "fwd" in part else "backward"
        l = part.split("/")[1]
        return f"/parrot/encoder/bidir/{d}/level_{l}_lstm.{W}"
    if part.startswith("dec/"):
        l = part.split("/")[1]
        if leaf == "wx":
            return f"/parrot/sequence_gen/level_{l}_fork_inputs.W"
        return f"/parrot/sequence_gen/rnn/level_{l}_transition.{W}"
    if part == "attn/proj":
        return f"/parrot/attention/window_params.{W}"
    if part == "readout":
        return f"/parrot/readout_merge.{W if leaf == 'w' else 'b'}"
    if part == "head":
        return f"/parrot/emitter_gmm.{W if leaf == 'w' else 'b'}"
    raise KeyError(path)


_GATE_LEAVES = ("wx", "wh", "b")


def make_archive(tmp_path, flat, gate_perm, transpose_paths,
                 head_perm=(0, 1, 2), head_dims=None, name="ref.npz"):
    """Archive in 'reference convention': gate blocks permuted by
    `gate_perm`, `transpose_paths` stored transposed, head blocks laid
    out in `head_perm` order (head_perm[k] = which of OUR blocks
    (mu, log_sigma, logit_pi) the k-th archive block holds)."""
    ref = {}
    for path, arr in flat.items():
        a = np.asarray(arr)
        part, leaf = path.rsplit("/", 1)
        is_lstm = part.split("/")[0] in ("enc_fwd", "enc_bwd", "dec")
        if is_lstm and leaf in _GATE_LEAVES and gate_perm != (0, 1, 2, 3):
            a = gate_reorder(a, list(gate_perm))
        if path in ("head/w", "head/b") and head_perm != (0, 1, 2):
            M, D = head_dims
            sizes = [M * D, M * D, M]
            offs = np.cumsum([0] + sizes)
            blocks = [a[..., offs[i]:offs[i + 1]] for i in head_perm]
            a = np.concatenate(blocks, axis=-1)
        if path in transpose_paths:
            a = a.T
        ref[blocks_name(path)] = a
    p = str(tmp_path / name)
    np.savez(p, **ref)
    return p


def invert(perm):
    inv = [0] * len(perm)
    for i, v in enumerate(perm):
        inv[v] = i
    return tuple(inv)


def test_scrambled_archive_recovered_without_hints(tmp_path):
    """Global Theano-style gate scramble + transposed (non-square)
    matrices across a 2-layer encoder / 2-layer decoder: stage A of the
    search must pin it from the default map alone."""
    model, true_params, norm, batch = setup()
    flat = flatten_tree(true_params)
    scramble = (2, 0, 1, 3)
    transposes = {"enc_fwd/0/wx", "enc_bwd/1/wx", "dec/0/wh", "dec/1/wx",
                  "readout/w", "head/w", "attn/proj/w"}
    archive = make_archive(tmp_path, flat, scramble, transposes)
    trace = str(tmp_path / "trace.npz")
    dump_trace(trace, model, true_params, norm, batch)

    template = model.init_params(jax.random.PRNGKey(99))  # wrong values
    params, pin, report = auto_pin(archive, model, template, trace)

    assert pin["gate_perm"] == list(invert(scramble))
    for name, r in report.items():
        assert r["max_abs_err"] <= 1e-5, (name, r["max_abs_err"])
    got = flatten_tree(params)
    for k in flat:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(flat[k]), atol=1e-6)


def test_compound_head_scramble_needs_joint_refinement(tmp_path):
    """Square head/w stored transposed AND head blocks reordered
    (sigma, pi, mu): neither fix alone clears head_raw, so stage B's
    joint per-stage search must find the combination."""
    # readouts_dim == head out dim (2*M*D + M = 22) makes head/w square
    model, true_params, norm, batch = setup(encoder_layers=1,
                                            decoder_layers=2,
                                            readouts_dim=22)
    cfg = model.cfg
    assert flatten_tree(true_params)["head/w"].shape == (22, 22)
    flat = flatten_tree(true_params)
    head_perm = (1, 2, 0)  # archive layout: (log_sigma, logit_pi, mu)
    archive = make_archive(tmp_path, flat, (0, 1, 2, 3), {"head/w"},
                           head_perm=head_perm,
                           head_dims=(cfg.num_mixtures, cfg.frame_size))
    trace = str(tmp_path / "trace.npz")
    dump_trace(trace, model, true_params, norm, batch)

    template = model.init_params(jax.random.PRNGKey(99))
    params, pin, report = auto_pin(archive, model, template, trace)

    assert pin["head_perm"] == list(head_perm)
    assert pin["transposed"] == ["head/w"]
    for name, r in report.items():
        assert r["max_abs_err"] <= 1e-5, (name, r["max_abs_err"])
    rep2 = diff_trace(trace, model, params)
    for name, r in rep2.items():
        assert r["max_abs_err"] <= 1e-5


def test_unpinnable_archive_reports_divergence(tmp_path):
    """Damage not explainable by any searched convention (a corrupted
    tensor) must raise with the divergent layer named, not return
    silently wrong params."""
    model, true_params, norm, batch = setup(encoder_layers=1,
                                            decoder_layers=2)
    flat = dict(flatten_tree(true_params))
    flat["attn/proj/w"] = np.asarray(flat["attn/proj/w"]) + 0.5
    archive = make_archive(tmp_path, flat, (1, 0, 2, 3), set())
    trace = str(tmp_path / "trace.npz")
    dump_trace(trace, model, true_params, norm, batch)
    template = model.init_params(jax.random.PRNGKey(99))
    with pytest.raises(ValueError, match="first divergence"):
        auto_pin(archive, model, template, trace)


def test_generalized_default_map_covers_any_depth():
    """build_default_map must cover every tensor of a deep model — the
    old DEFAULT_MAP broke for encoder_layers>1 / decoder_layers!=3
    (VERDICT r2 weak #2)."""
    import re
    from parrot_tpu.train.theano_import import build_default_map
    model, true_params, _, _ = setup(encoder_layers=3, decoder_layers=5)
    flat = flatten_tree(true_params)
    rules = build_default_map(3, 5)
    covered = set()
    for path in flat:
        name = blocks_name(path)
        for pattern, our_path, _ in rules:
            if re.match(pattern, name):
                assert our_path == path, (name, our_path, path)
                covered.add(path)
                break
    assert covered == set(flat)


@pytest.mark.slow
def test_cli_auto_pin_roundtrip(tmp_path):
    """scripts/import_checkpoint.py --auto_pin: scrambled archive +
    trace + corpus in, pinned parrot-tpu checkpoint out, conventions
    recorded in meta.json.

    The (3,1,0,2) scramble is also a regression case: at tiny dims the
    LSTM runs near-linear and an i/o gate swap perturbs activations by
    only ~3e-5 < tol, so a first-to-clear search pins the WRONG
    convention — the exact-params assert below catches that (the
    search must rank clearing candidates by exactness)."""
    import json
    import subprocess
    import sys

    from util_env import cpu_env
    from parrot_tpu.config import ParrotConfig
    from parrot_tpu.data.fixture import make_fixture_corpus
    from parrot_tpu.train.checkpoint import load_for_inference

    model, true_params, norm, batch = setup()
    cfg = model.cfg
    flat = flatten_tree(true_params)
    archive = make_archive(tmp_path, flat, (3, 1, 0, 2), {"dec/0/wh"},
                           head_perm=(1, 0, 2),
                           head_dims=(cfg.num_mixtures, cfg.frame_size))
    trace = str(tmp_path / "trace.npz")
    dump_trace(trace, model, true_params, norm, batch)
    corpus = make_fixture_corpus(str(tmp_path / "c.h5"), num_utterances=6,
                                 vocab_size=cfg.vocab_size,
                                 frame_size=cfg.frame_size,
                                 num_speakers=cfg.num_speakers)
    cfg_json = tmp_path / "cfg.json"
    cfg_json.write_text(ParrotConfig(model=cfg).to_json())
    r = subprocess.run(
        [sys.executable, "scripts/import_checkpoint.py",
         "--reference", archive, "--dataset", corpus,
         "--auto_pin", trace, "--config", str(cfg_json),
         "--model_name", "autopinned", "--save_dir", str(tmp_path / "sv")],
        capture_output=True, text=True, env=cpu_env(), timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "pinned conventions" in r.stdout
    m2, params, _, _, step = load_for_inference(str(tmp_path / "sv"),
                                                "autopinned", "best")
    got = flatten_tree(params)
    for k in flat:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(flat[k]), atol=1e-6)
    meta = json.load(open(tmp_path / "sv" / "autopinned" / "step_00000000"
                          / "meta.json"))
    assert meta["auto_pin"]["head_perm"] == [1, 0, 2]


def test_fully_renamed_archive_shape_fallback(tmp_path):
    """VERDICT r3 weak #5: an archive whose keys match NO regex in the
    name map (fully renamed, shuffled order) must still round-trip via
    the shape-guided fallback — ambiguous same-shape groups (fwd/bwd
    encoder cells, the two decoder layers' wh/b) resolved by the
    activation oracle jointly with a scrambled gate order, transposed
    matrices, and a reordered head layout. Zero hand-written map
    entries."""
    # dims chosen so shape classes separate by KIND (embed_dim !=
    # encoder_dim keeps level-0 wx out of the wh class) while leaving
    # genuinely ambiguous within-kind pairs for the search to resolve
    cfg = ModelConfig(frame_size=5, vocab_size=7, embed_dim=6,
                      encoder_dim=4, rnn_h_dim=8, encoder_layers=1,
                      decoder_layers=2, readouts_dim=9,
                      attention_mixtures=2, num_mixtures=2,
                      use_speaker=True, num_speakers=3, speaker_dim=2)
    model = Parrot(cfg)
    true_params = model.init_params(jax.random.PRNGKey(7))
    rng = np.random.default_rng(3)
    B, S, U, D = 3, 6, 9, cfg.frame_size
    batch = Batch(
        features=rng.normal(size=(B, S, D)).astype(np.float32),
        features_mask=np.ones((B, S), np.float32),
        prev_frame=np.zeros((B, D), np.float32),
        text=rng.integers(1, cfg.vocab_size, (B, U)).astype(np.int32),
        text_mask=np.ones((B, U), np.float32),
        speaker=rng.integers(0, 3, (B,)).astype(np.int32),
        start_flag=np.float32(1.0),
    )
    norm = {"mean": np.zeros(D, np.float32), "std": np.ones(D, np.float32)}

    flat = flatten_tree(true_params)
    scramble = (2, 0, 1, 3)
    transposes = {"enc_fwd/0/wx", "dec/1/wx", "readout/w", "head/w",
                  "attn/proj/w"}
    head_perm = (1, 2, 0)
    # reference-convention arrays, then strip every recognizable name:
    # shuffled "blob_NN" keys defeat the whole regex map
    named = make_archive(tmp_path, flat, scramble, transposes,
                         head_perm=head_perm,
                         head_dims=(cfg.num_mixtures, cfg.frame_size),
                         name="tmp.npz")
    with np.load(named) as z:
        arrays = [z[k] for k in z.files]
    order = np.random.default_rng(11).permutation(len(arrays))
    blob = {f"blob_{i:02d}": arrays[j] for i, j in enumerate(order)}
    archive = str(tmp_path / "renamed.npz")
    np.savez(archive, **blob)

    trace = str(tmp_path / "trace.npz")
    dump_trace(trace, model, true_params, norm, batch)
    template = model.init_params(jax.random.PRNGKey(99))
    params, pin, report = auto_pin(archive, model, template, trace)

    assert "assignment" in pin and len(pin["assignment"]) == len(flat)
    for name, r in report.items():
        assert r["max_abs_err"] <= 1e-5, (name, r["max_abs_err"])
    got = flatten_tree(params)
    for k in flat:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(flat[k]), atol=1e-6)
