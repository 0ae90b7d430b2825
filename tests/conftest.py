import os

# Tests run on the CPU backend with 8 virtual devices so that multi-chip
# sharding (mesh) tests work without TPU hardware, and so the test suite does
# not pay the remote-TPU tunnel handshake on every run.
#
# In this environment jax is pre-imported by a sitecustomize with
# JAX_PLATFORMS=axon, so setting the env var is not enough — the config must
# be updated on the already-imported module *before* the first backend use.
_HW = os.environ.get("TWENTY_FIRST_TPU_PALLAS_HW_TEST") == "1"
if not _HW:
    # (the opt-in hardware bit-exactness test must keep the real backend —
    # forcing CPU here would silently turn it into an interpreter run)
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _HW:
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the chained-permutation graphs (Merkle
# commits, LDE pipeline) take minutes to compile the first time; cached
# executables make repeat test runs start fast.
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_repo_root, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
