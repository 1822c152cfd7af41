"""Test env: force CPU with 8 virtual devices so sharding tests run without
TPU hardware, and Pallas kernels run in interpret mode (they auto-detect).

Note: this sandbox registers an `axon` TPU PJRT plugin at interpreter startup
via sitecustomize, which force-sets ``jax_platforms="axon,cpu"`` and ignores
the JAX_PLATFORMS env var.  Also, ``--xla_force_host_platform_device_count``
in XLA_FLAGS hangs the axon plugin.  So we use jax.config updates instead,
which must happen before the first computation (not before import).
"""
import jax

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: identical programs compiled by different
# tests (and by successive runs) become cache hits — cuts the single-core
# suite time substantially.
from rovit_kan_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(".cache/xla_test")
