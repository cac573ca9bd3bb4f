"""Data-layer tests: corpus roundtrip, bucketing, masks, TBPTT segments,
normalization stats, prefetch (SURVEY.md §4 "Data pipeline")."""

import numpy as np
import pytest

from parrot_tpu.config import DataConfig
from parrot_tpu.data import (H5Corpus, make_fixture_corpus, parrot_stream,
                             device_prefetch)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "fixture.h5")
    make_fixture_corpus(path, num_utterances=24, vocab_size=8, frame_size=5,
                        frames_per_char=3, min_chars=2, max_chars=9, seed=1)
    return H5Corpus(path)


def test_corpus_roundtrip(corpus):
    assert corpus.frame_size == 5
    assert corpus.num_utterances == 24
    f0 = corpus.features(0)
    assert f0.shape == (corpus.frame_lengths[0], 5)
    t0 = corpus.text(0)
    assert t0.min() >= 1 and t0.max() < corpus.vocab_size
    assert len(corpus.split("train")) + len(corpus.split("valid")) == 24


def test_norm_stats_match_train_split(corpus):
    train = corpus.split("train")
    all_f = np.concatenate([corpus.features(i) for i in train], axis=0)
    np.testing.assert_allclose(corpus.mean, all_f.mean(0), atol=1e-4)
    np.testing.assert_allclose(corpus.std, all_f.std(0), atol=1e-3)


def test_segments_reassemble_and_masks(corpus):
    cfg = DataConfig(batch_size=4, seq_size=7, max_text_len=16,
                     sort_pool_size=2)
    batches = list(parrot_stream(corpus, cfg, "train", epochs=1))
    assert batches, "stream empty"
    # group consecutive segments of one utterance-batch via start_flag
    groups, cur = [], None
    for b in batches:
        assert b.features.shape == (4, 7, 5)
        assert b.text.shape == (4, 16)
        if b.start_flag == 1.0:
            if cur:
                groups.append(cur)
            cur = []
        cur.append(b)
    groups.append(cur)

    for g in groups:
        # first segment: prev_frame must be zeros
        assert np.all(g[0].prev_frame == 0)
        # later segments: prev_frame is the last frame of prior segment
        for s in range(1, len(g)):
            np.testing.assert_array_equal(g[s].prev_frame,
                                          g[s - 1].features[:, -1])
        # reassembled mask is a prefix (no holes) and matches a real length
        full_mask = np.concatenate([b.features_mask for b in g], axis=1)
        for row in full_mask:
            n = int(row.sum())
            assert np.all(row[:n] == 1) and np.all(row[n:] == 0)
        # masks of all rows nonzero in training batches (full batch)
        assert full_mask.sum(axis=1).min() > 0


def test_bucketing_limits_padding(corpus):
    cfg = DataConfig(batch_size=4, seq_size=6, sort_pool_size=3,
                     max_text_len=16)
    batches = list(parrot_stream(corpus, cfg, "train", epochs=1))
    # within one utterance-batch, lengths should be close after sorting:
    # padding ratio must beat the unsorted worst case comfortably
    tot_valid = sum(b.features_mask.sum() for b in batches)
    tot_cells = sum(b.features_mask.size for b in batches)
    assert tot_valid / tot_cells > 0.6


def test_eval_stream_keeps_all_and_pads(corpus):
    cfg = DataConfig(batch_size=5, seq_size=6, max_text_len=16)
    batches = list(parrot_stream(corpus, cfg, "valid", training=False,
                                 epochs=1))
    valid_idx = corpus.split("valid")
    seen_frames = sum(float(b.features_mask.sum()) for b in batches)
    want = sum(int(corpus.frame_lengths[i]) for i in valid_idx)
    assert seen_frames == want  # nothing dropped, pad rows masked out


def test_epochs_reshuffle(corpus):
    cfg = DataConfig(batch_size=4, seq_size=6, max_text_len=16,
                     shuffle_seed=3)
    b1 = [b for b in parrot_stream(corpus, cfg, "train", epochs=2)
          if b.start_flag == 1.0]
    specs = [tuple(b.speaker.tolist()) + (float(b.features_mask.sum()),)
             for b in b1]
    # two epochs: same count per epoch; (likely) different batch order
    assert len(specs) % 2 == 0


def test_device_prefetch_roundtrip(corpus):
    import jax
    cfg = DataConfig(batch_size=4, seq_size=6, max_text_len=16)
    host = list(parrot_stream(corpus, cfg, "train", epochs=1))
    dev = list(device_prefetch(iter(host), depth=2))
    assert len(dev) == len(host)
    np.testing.assert_array_equal(np.asarray(dev[0].features),
                                  host[0].features)
    assert isinstance(dev[0].features, jax.Array)


def test_device_prefetch_propagates_errors():
    def boom():
        yield {"x": np.zeros(3)}
        raise RuntimeError("producer died")
    it = device_prefetch(boom(), depth=1)
    next(it)
    with pytest.raises(RuntimeError, match="producer died"):
        list(it)


def test_device_prefetch_early_stop_releases_producer():
    """Breaking out of a prefetched loop must terminate the producer
    thread (code-review regression: it used to block on q.put forever)."""
    import threading
    produced = []

    def source():
        for i in range(1000):
            produced.append(i)
            yield {"x": np.full(3, i)}

    before = threading.active_count()
    it = device_prefetch(source(), depth=2)
    for k, item in enumerate(it):
        if k == 3:
            break
    it.close()  # explicit close; GC would do the same via GeneratorExit
    import time
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    assert len(produced) < 1000  # producer stopped early, not exhausted


def test_feature_cache_readonly_and_lazy(corpus):
    """Cached corpora hand out read-only shared arrays, built lazily
    (code-review regression: in-place edits corrupted the cache; attr-only
    consumers paid the preload)."""
    from parrot_tpu.data import H5Corpus
    c = H5Corpus(corpus.path, cache_mb=512)
    assert c._cache is None  # nothing preloaded before first access
    f = c.features(0)
    assert c._cache is not None
    with pytest.raises(ValueError):
        f[0, 0] = 99.0
    # uncached mode still returns writable fresh buffers
    c0 = H5Corpus(corpus.path, cache_mb=0)
    g = c0.features(0)
    g[0, 0] = 99.0  # no error; next read unaffected
    assert c0.features(0)[0, 0] != 99.0


def test_rich_corpus_layout_and_entropy(tmp_path):
    """make_rich_corpus (the non-memorizable corpus generator): layout
    contract + the entropy properties that make it non-memorizable —
    duration jitter (the same token length varies across realizations),
    both voiced and unvoiced frames, per-speaker distinct voices."""
    import h5py
    from parrot_tpu.data.fixture import make_rich_corpus

    path = str(tmp_path / "rich.h5")
    make_rich_corpus(path, num_utterances=24, vocab_size=12,
                     num_speakers=3, min_chars=4, max_chars=8, seed=1)
    with h5py.File(path) as f:
        assert f.attrs["frame_size"] == 63
        assert f.attrs["num_speakers"] == 3
        fl = f["frame_lengths"][:]
        tl = f["text_lengths"][:]
        assert (f["audio_lengths"][:] == fl * f.attrs["audio_hop"]).all()
        # duration entropy: frames-per-char varies across utterances
        fpc = fl / tl
        assert fpc.std() > 0.5, fpc
        # voicing mix present
        feats = [f["features"][i].reshape(-1, 63) for i in range(24)]
        vuv = np.concatenate([x[:, -1] for x in feats])
        assert 0.1 < (vuv > 0.5).mean() < 0.95
        # speakers sound different: per-speaker mean voiced log-f0
        spk = f["speaker"][:]
        lf0 = []
        for s in range(3):
            v = np.concatenate([feats[i][:, -2][feats[i][:, -1] > 0.5]
                                for i in range(24) if spk[i] == s])
            lf0.append(v.mean())
        assert max(lf0) - min(lf0) > 0.05, lf0
        # every utterance is unique (no accidental duplicates)
        assert len({x.tobytes() for x in feats}) == 24
