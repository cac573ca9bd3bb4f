#!/usr/bin/env python
"""Create a synthetic fixture corpus (no real data needed).

  python scripts/make_fixture.py data/fixture.h5 --num_utterances 64
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from parrot_tpu.data import make_fixture_corpus  # noqa: E402
from parrot_tpu.data.fixture import make_audio_fixture_corpus  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--num_utterances", type=int, default=64)
    p.add_argument("--vocab_size", type=int, default=12)
    p.add_argument("--frame_size", type=int, default=15)
    p.add_argument("--frames_per_char", type=int, default=4)
    p.add_argument("--num_speakers", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--audio", action="store_true",
                   help="audio fixture: real WORLD features + frame-"
                        "aligned mu-law audio (for train_vocoder.py / "
                        "end-to-end tests); ignores --frame_size/"
                        "--frames_per_char")
    p.add_argument("--rich", action="store_true",
                   help="non-memorizable corpus: per-utterance prosody/"
                        "duration/coarticulation entropy over a "
                        "systematic phone inventory (docs/PERFORMANCE.md"
                        " held-out quality experiments); implies audio")
    p.add_argument("--min_chars", type=int, default=None)
    p.add_argument("--max_chars", type=int, default=None)
    a = p.parse_args()
    os.makedirs(os.path.dirname(os.path.abspath(a.path)), exist_ok=True)
    if a.rich:
        from parrot_tpu.data.fixture import make_rich_corpus
        kw = {}
        if a.min_chars is not None:
            kw["min_chars"] = a.min_chars
        if a.max_chars is not None:
            kw["max_chars"] = a.max_chars
        make_rich_corpus(a.path, num_utterances=a.num_utterances,
                         vocab_size=a.vocab_size, seed=a.seed,
                         num_speakers=a.num_speakers, progress=True, **kw)
    elif a.audio:
        make_audio_fixture_corpus(a.path, num_utterances=a.num_utterances,
                                  vocab_size=a.vocab_size, seed=a.seed,
                                  num_speakers=a.num_speakers)
    else:
        make_fixture_corpus(a.path, num_utterances=a.num_utterances,
                            vocab_size=a.vocab_size, frame_size=a.frame_size,
                            frames_per_char=a.frames_per_char,
                            num_speakers=a.num_speakers, seed=a.seed)
    print(f"wrote {a.path}")


if __name__ == "__main__":
    main()
