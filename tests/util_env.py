"""Environment for CPU-pinned subprocess tests.

Child interpreters (CLI tests, fault injection, 2-process clusters)
must NOT inherit the axon TPU registration: the container's
sitecustomize overrides JAX_PLATFORMS and attaches the child to the
real chip through the tunnel — the suite then silently trains over the
tunnel (slow, tunnel-load-dependent, and with a 1-device mesh instead
of the 8-device CPU mesh the tests are written for). Dropping
PALLAS_AXON_POOL_IPS skips the axon registration entirely (same trick
as __graft_entry__._reexec_on_virtual_mesh); JAX_PLATFORMS=cpu and the
8-device XLA flag then take effect normally.
"""

import os


def cpu_env(**extra):
    """os.environ copy pinned to the 8-virtual-device CPU platform."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
    env.update(extra)
    return env
