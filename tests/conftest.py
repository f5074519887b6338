"""Test configuration: force the CPU backend with 8 virtual devices.

The session environment injects an `axon` PJRT plugin via sitecustomize that
registers the single tunnelled TPU in every python process and sets
jax_platforms="axon,cpu" through jax.config (overriding the JAX_PLATFORMS env
var).  Tests must not claim that chip -- and the sharding tests need 8
devices -- so we flip the config back to pure CPU *before any backend is
initialized*.  Set DABMOD_TEST_ON_TPU=1 to run the suite on the real device.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("DABMOD_TEST_ON_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
