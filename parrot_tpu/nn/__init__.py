"""Pure-functional neural-net layer library (pytree params + apply fns).

This is the rebuild's replacement for the Blocks "bricks" the reference
imports (SURVEY.md §2.2): Linear, LookupTable/Embedding, LSTM,
Bidirectional. Parameters are plain nested dicts of jnp arrays; every
apply function is pure and jit/scan/shard_map friendly.
"""

from parrot_tpu.nn.core import (  # noqa: F401
    Linear,
    Embedding,
    LayerNorm,
    glorot,
    orthogonal,
)
from parrot_tpu.nn.recurrent import (  # noqa: F401
    LSTMCell,
    lstm_scan,
    bidirectional_lstm,
)
from parrot_tpu.nn.attention import (  # noqa: F401
    GravesWindow,
)
from parrot_tpu.nn.mdn import (  # noqa: F401
    gmm_nll,
    gmm_sample,
    split_gmm_params,
)
