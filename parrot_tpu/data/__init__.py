"""Data layer: HDF5 corpus + streaming pipeline + device prefetch.

Rebuilds what the reference gets from Fuel + its datasets.py
(SURVEY.md §2.1 "Data wrappers", §2.2): H5PYDataset-style corpus access,
shuffle → length-bucketed batches → pad+mask → fixed-length TBPTT
segments with carried state, and host→device double-buffered prefetch.
Normalization stats ship with the corpus but are applied ON DEVICE
inside the jitted step (BASELINE.json:5 "on-TPU normalization").
"""

from parrot_tpu.data.hdf5_dataset import H5Corpus, write_corpus  # noqa: F401
from parrot_tpu.data.pipeline import parrot_stream, Batch  # noqa: F401
from parrot_tpu.data.prefetch import device_prefetch  # noqa: F401
from parrot_tpu.data.fixture import (  # noqa: F401
    make_fixture_corpus,
    make_audio_fixture_corpus,
)
