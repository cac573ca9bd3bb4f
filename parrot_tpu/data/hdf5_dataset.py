"""HDF5 corpus format and reader.

The reference stores preprocessed corpora (Blizzard, VCTK) as HDF5 read
through Fuel's H5PYDataset (reference datasets.py — mount empty, per
SURVEY.md §0). This is our own, simpler schema:

  /features        vlen float32, entry i is utterance i flattened (T_i*D)
  /text            vlen int32, token ids (0 = pad, never used in data)
  /speaker         (N,) int32
  /audio           OPTIONAL vlen uint8, mu-law ids, T_i*hop samples per
                   utterance (for neural-vocoder training); with
                   /audio_lengths and attrs sample_rate, audio_hop
  attrs: frame_size, num_speakers, vocab_size,
         features_mean (D,), features_std (D,)
  /splits/<name>   (K,) int64 utterance indices per split

Normalization stats are computed over the TRAIN split at corpus build
time and stored in the file; they are applied on device, not here.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import h5py
import numpy as np


class H5Corpus:
    """Read access to a parrot-tpu HDF5 corpus.

    cache_mb: corpora whose features (+ text) fit under this budget are
    preloaded into RAM on FIRST feature access — per-utterance h5py vlen
    reads otherwise add host cost on large-batch training. 0 disables
    caching. Cached arrays are read-only views shared between callers.
    """

    def __init__(self, path: str, cache_mb: int = 512):
        self.path = path
        self._f = h5py.File(path, "r")
        self.frame_size = int(self._f.attrs["frame_size"])
        self.num_speakers = int(self._f.attrs["num_speakers"])
        self.vocab_size = int(self._f.attrs["vocab_size"])
        self.mean = np.asarray(self._f.attrs["features_mean"], np.float32)
        self.std = np.asarray(self._f.attrs["features_std"], np.float32)
        self._features = self._f["features"]
        self._text = self._f["text"]
        self._speaker = self._f["speaker"][:]
        self.has_audio = "audio" in self._f
        if self.has_audio:
            self.sample_rate = int(self._f.attrs["sample_rate"])
            self.audio_hop = int(self._f.attrs["audio_hop"])
            self.audio_lengths = np.asarray(self._f["audio_lengths"][:],
                                            np.int64)
        # lengths are cheap to precompute once; used for bucketing
        self.frame_lengths = np.asarray(self._f["frame_lengths"][:], np.int64)
        self.text_lengths = np.asarray(self._f["text_lengths"][:], np.int64)
        self._cache = None
        total_bytes = (int(self.frame_lengths.sum()) * self.frame_size * 4
                       + int(self.text_lengths.sum()) * 4)
        self._cacheable = bool(
            cache_mb and total_bytes <= cache_mb * 1024 * 1024)

    def _build_cache(self):
        """Lazy preload (bulk reads), on first feature access only, so
        attr-only consumers (generate.py, importer) never pay for it."""
        feats = self._features[:]          # one bulk vlen read
        texts = self._text[:]
        cache = []
        for i in range(len(self._speaker)):
            arr = feats[i].reshape(int(self.frame_lengths[i]),
                                   self.frame_size)
            arr.setflags(write=False)      # shared between callers
            cache.append(arr)
        tcache = []
        for t in texts:
            a = np.asarray(t, np.int32)
            a.setflags(write=False)
            tcache.append(a)
        self._cache = cache
        self._text_cache = tcache

    def split(self, name: str) -> np.ndarray:
        return np.asarray(self._f["splits"][name][:], np.int64)

    @property
    def num_utterances(self) -> int:
        return len(self._speaker)

    def features(self, i: int) -> np.ndarray:
        if self._cacheable:
            if self._cache is None:
                self._build_cache()
            return self._cache[i]
        t = self.frame_lengths[i]
        return self._features[i].reshape(t, self.frame_size)

    def text(self, i: int) -> np.ndarray:
        if self._cacheable:
            if self._cache is None:
                self._build_cache()
            return self._text_cache[i]
        return np.asarray(self._text[i], np.int32)

    def speaker(self, i: int) -> int:
        return int(self._speaker[i])

    def audio(self, i: int) -> np.ndarray:
        """mu-law ids (T_i * audio_hop,) int32; requires has_audio."""
        return np.asarray(self._f["audio"][i], np.int32)

    def close(self):
        self._f.close()


def write_corpus(
    path: str,
    features: Sequence[np.ndarray],   # each (T_i, D) float32, RAW (unnormalized)
    texts: Sequence[np.ndarray],      # each (U_i,) int32, ids >= 1
    speakers: Sequence[int],
    vocab_size: int,
    splits: Dict[str, Sequence[int]],
    num_speakers: Optional[int] = None,
    charset: Optional[str] = None,
    audio: Optional[Sequence[np.ndarray]] = None,  # mu-law ids per utt
    sample_rate: int = 16000,
    audio_hop: int = 80,
) -> None:
    """Write a corpus file; computes train-split normalization stats.

    audio: optional per-utterance mu-law ids; entry i must hold exactly
    features[i].shape[0] * audio_hop samples (frame-aligned raw audio
    for neural-vocoder training).
    """
    n = len(features)
    assert n == len(texts) == len(speakers)
    frame_size = features[0].shape[1]
    train_idx = list(splits.get("train", range(n)))

    acc = np.zeros(frame_size, np.float64)
    acc2 = np.zeros(frame_size, np.float64)
    count = 0
    for i in train_idx:
        f = features[i].astype(np.float64)
        acc += f.sum(0)
        acc2 += (f * f).sum(0)
        count += f.shape[0]
    mean = acc / max(count, 1)
    var = np.maximum(acc2 / max(count, 1) - mean * mean, 1e-8)

    with h5py.File(path, "w") as f:
        vf = h5py.special_dtype(vlen=np.dtype("float32"))
        vi = h5py.special_dtype(vlen=np.dtype("int32"))
        dfeat = f.create_dataset("features", (n,), dtype=vf)
        dtext = f.create_dataset("text", (n,), dtype=vi)
        for i in range(n):
            dfeat[i] = features[i].astype(np.float32).ravel()
            dtext[i] = texts[i].astype(np.int32)
        if audio is not None:
            assert len(audio) == n
            vu = h5py.special_dtype(vlen=np.dtype("uint8"))
            daud = f.create_dataset("audio", (n,), dtype=vu)
            for i in range(n):
                a = np.asarray(audio[i])
                assert a.shape[0] == features[i].shape[0] * audio_hop, \
                    (i, a.shape, features[i].shape, audio_hop)
                daud[i] = a.astype(np.uint8)
            f.create_dataset(
                "audio_lengths",
                data=np.asarray([len(a) for a in audio], np.int64))
            f.attrs["sample_rate"] = sample_rate
            f.attrs["audio_hop"] = audio_hop
        f.create_dataset("speaker", data=np.asarray(speakers, np.int32))
        f.create_dataset("frame_lengths",
                         data=np.asarray([x.shape[0] for x in features], np.int64))
        f.create_dataset("text_lengths",
                         data=np.asarray([len(t) for t in texts], np.int64))
        g = f.create_group("splits")
        for name, idx in splits.items():
            g.create_dataset(name, data=np.asarray(list(idx), np.int64))
        f.attrs["frame_size"] = frame_size
        f.attrs["num_speakers"] = (num_speakers if num_speakers is not None
                                   else int(max(speakers)) + 1)
        f.attrs["vocab_size"] = vocab_size
        f.attrs["features_mean"] = mean.astype(np.float32)
        f.attrs["features_std"] = np.sqrt(var).astype(np.float32)
        if charset is not None:
            f.attrs["charset"] = json.dumps(charset)
