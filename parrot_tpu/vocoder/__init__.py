"""WORLD-style vocoder: in-repo C++ analysis/synthesis + jittable JAX
synthesis reference path + feature coding + MCD metric (SURVEY.md §2.3
N1, §7 step 7)."""

from parrot_tpu.vocoder.world import (  # noqa: F401
    analyze,
    synthesize,
    lcg_noise,
    pulse_excitation,
    write_wav,
    get_fft_size,
    hop_samples,
    F0_FLOOR,
    F0_CEIL,
    FRAME_PERIOD_MS,
    N_AP_BANDS,
)
from parrot_tpu.vocoder.jax_synthesis import synthesize_jax  # noqa: F401
from parrot_tpu.vocoder.features import (  # noqa: F401
    code_frames,
    decode_frames,
    code_sp,
    decode_sp,
    code_ap,
    decode_ap,
)
from parrot_tpu.vocoder.mcd import mcd  # noqa: F401
from parrot_tpu.vocoder.mulaw import (  # noqa: F401
    mulaw_encode,
    mulaw_decode,
    mulaw_encode_jax,
    mulaw_decode_jax,
)
