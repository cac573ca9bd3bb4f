from parrot_tpu.ops.fused_decode import (  # noqa: F401
    fused_decode,
    prepare_params,
    flatten_state,
    n_weight_arrays,
)
from parrot_tpu.ops.fused_vocoder import (  # noqa: F401
    fused_vocoder_decode,
    prepare_vocoder_params,
    make_vocoder_init,
)
