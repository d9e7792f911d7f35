import os

# Tests run on a virtual 8-device CPU mesh (sharding tests need the mesh;
# everything else is faster on CPU than paying TPU compile latency).
# The harness pre-sets JAX_PLATFORMS=axon, so force-override here — this
# must happen before jax is imported.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
