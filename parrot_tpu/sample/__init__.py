from parrot_tpu.sample.sampler import Sampler, bucket_by_length  # noqa: F401
