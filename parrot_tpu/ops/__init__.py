from parrot_tpu.ops.fused_decode import fused_decode, FusedDecodeParams  # noqa: F401
