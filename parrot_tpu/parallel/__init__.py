from parrot_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    state_sharding,
)
from parrot_tpu.parallel.staging import (  # noqa: F401
    stage_global,
    stage_local,
)
