"""Tests: Theano/Blocks checkpoint importer machinery + SampleRNN hook."""

import pickle
import zipfile

import jax
import numpy as np
import pytest

from parrot_tpu.config import ModelConfig
from parrot_tpu.models import Parrot
from parrot_tpu.train.checkpoint import flatten_tree
from parrot_tpu.train.theano_import import (gate_reorder,
                                            import_theano_checkpoint,
                                            load_reference_arrays)
from parrot_tpu.vocoder.neural_hook import (ConditioningStream,
                                            conditioning_from_frames,
                                            conditioning_from_frames_jax)


def tiny_model():
    cfg = ModelConfig(frame_size=5, vocab_size=7, embed_dim=4,
                      encoder_dim=4, rnn_h_dim=8, decoder_layers=3,
                      readouts_dim=8, attention_mixtures=2, num_mixtures=2)
    model = Parrot(cfg)
    return model, model.init_params(jax.random.PRNGKey(0))


def reference_names_for(flat):
    """Build fake Blocks-style brick paths covering our whole tree."""
    name_map = []
    ref = {}
    for i, (path, arr) in enumerate(sorted(flat.items())):
        ref_name = f"/parrot/brick_{i}.{path.replace('/', '_')}"
        ref[ref_name] = np.asarray(arr) + 1.0  # distinguishable values
        name_map.append((f"^{ref_name.replace('.', chr(92) + '.')}$",
                         path, []))
    return ref, name_map


def test_import_roundtrip_npz(tmp_path):
    model, params = tiny_model()
    flat = flatten_tree(params)
    ref, name_map = reference_names_for(flat)
    p = str(tmp_path / "ref.npz")
    np.savez(p, **ref)
    imported, report = import_theano_checkpoint(p, params, name_map)
    assert not report["unfilled_model"]
    got = flatten_tree(imported)
    for k in flat:
        np.testing.assert_allclose(got[k], np.asarray(flat[k]) + 1.0,
                                   rtol=1e-6)


def test_import_from_pickle_and_zip(tmp_path):
    model, params = tiny_model()
    flat = flatten_tree(params)
    ref, name_map = reference_names_for(flat)
    ref_np = {k: np.asarray(v) for k, v in ref.items()}
    pk = str(tmp_path / "ref.pkl")
    with open(pk, "wb") as f:
        pickle.dump(ref_np, f)
    imported, _ = import_theano_checkpoint(pk, params, name_map)
    assert flatten_tree(imported).keys() == flat.keys()

    zp = str(tmp_path / "ref.zip")
    with zipfile.ZipFile(zp, "w") as z:
        z.write(pk, "inner.pkl")
    arrays = load_reference_arrays(zp)
    assert set(arrays) == set(ref)


def test_import_strict_coverage(tmp_path):
    model, params = tiny_model()
    flat = flatten_tree(params)
    ref, name_map = reference_names_for(flat)
    # drop one tensor -> strict import must fail, lax import must not
    dropped = sorted(ref)[0]
    del ref[dropped]
    p = str(tmp_path / "partial.npz")
    np.savez(p, **ref)
    with pytest.raises(ValueError, match="unfilled"):
        import_theano_checkpoint(p, params, name_map, strict=True)
    imported, report = import_theano_checkpoint(p, params, name_map,
                                                strict=False)
    assert len(report["unfilled_model"]) == 1


def test_import_auto_transpose_and_shape_error(tmp_path):
    model, params = tiny_model()
    flat = flatten_tree(params)
    ref, name_map = reference_names_for(flat)
    # store embed table transposed -> auto-fixed
    key = next(k for k, (pat, path, _) in
               zip(sorted(ref), name_map) if path == "embed/table")
    ref[key] = ref[key].T
    p = str(tmp_path / "t.npz")
    np.savez(p, **ref)
    imported, _ = import_theano_checkpoint(p, params, name_map)
    assert flatten_tree(imported)["embed/table"].shape == \
        np.asarray(flat["embed/table"]).shape


def test_gate_reorder():
    arr = np.arange(8.0).reshape(1, 8)  # H=2, gates [0,1|2,3|4,5|6,7]
    out = gate_reorder(arr, [3, 2, 1, 0])
    np.testing.assert_array_equal(out[0], [6, 7, 4, 5, 2, 3, 0, 1])


def test_conditioning_upsampling():
    frames = np.arange(6.0).reshape(3, 2)
    up = conditioning_from_frames(frames, fs=16000)  # hop 80
    assert up.shape == (240, 2)
    np.testing.assert_array_equal(up[:80], np.tile(frames[0], (80, 1)))
    lin = conditioning_from_frames(frames, fs=16000, mode="linear")
    assert lin.shape == (240, 2)
    # linear interp midway between frame 0 and 1
    np.testing.assert_allclose(lin[40], frames[0] + 0.5 * (frames[1] - frames[0]))

    upj = np.asarray(conditioning_from_frames_jax(frames, hop=80))
    np.testing.assert_allclose(upj, up)


def test_conditioning_stream():
    frames = np.random.default_rng(0).normal(size=(2, 10, 3))
    lengths = np.array([10, 4])
    items = list(ConditioningStream(fs=16000)(frames, lengths))
    assert len(items) == 2
    i, f, cond = items[1]
    assert f.shape == (4, 3) and cond.shape == (4 * 80, 3)
