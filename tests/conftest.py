"""Test harness: force an 8-fake-device CPU platform.

SURVEY.md §4 "Distributed without a cluster": all pjit/psum/mesh logic runs on
a virtual 8-device CPU mesh; real-TPU behavior is covered by bench.py and the
driver's dryrun (see __graft_entry__.py).

NOTE: this machine boots every interpreter with a sitecustomize that imports
jax and registers the remote-TPU ("axon") PJRT plugin, with JAX_PLATFORMS=axon
already in the environment. Since jax is imported before conftest runs,
setting the env var here is ineffective — we must use jax.config.update,
which works as long as no backend has been initialized yet. Running unit
tests on the tunneled TPU makes them 100-1000× slower and flaky.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

# Import the package BEFORE lowering the persistent-cache threshold: the
# package __init__ sets min_compile_time to 2.0 s at import, which used to
# silently override the 0.1 s below (tests import alphafive_tpu after
# conftest), so test-sized programs (0.1-2 s compiles — most of the suite)
# were never written to the cache and every run recompiled everything.
import alphafive_tpu  # noqa: E402, F401

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, jax.devices()
