"""Test harness: force CPU with 8 virtual devices so sharding tests run anywhere.

Mirrors the survey's test plan (SURVEY.md §4): kernel-level golden tests against
the pure-JAX reference rasterizer + multi-device tests on a virtual CPU mesh.

Note: this environment registers a TPU PJRT plugin and sets JAX_PLATFORMS at
interpreter start (before conftest runs), so we must switch platforms through
jax.config — env vars are read too early to matter here.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
