from parrot_tpu.utils.logging import MetricsLogger  # noqa: F401
