"""Test environment: a virtual 8-device CPU mesh.

The image imports jax at interpreter startup (an `axon` .pth hook), so
environment variables set here are too late — switch the platform through
jax.config instead, before any backend is initialized. Sharding tests get
8 virtual CPU devices; everything else avoids TPU compile latency.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
