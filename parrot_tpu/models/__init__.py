from parrot_tpu.models.parrot import Parrot, DecoderState  # noqa: F401
