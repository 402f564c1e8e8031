"""Test configuration: force CPU backend with 8 virtual devices.

Tests must run without TPU hardware; multi-chip sharding paths are exercised
on a virtual 8-device CPU mesh. The harness exports JAX_PLATFORMS=axon (an
experimental TPU plugin) which overrides the env-var route, so we must both
drop the env var and set the config explicitly before anything uses jax.
"""
import os
import sys

os.environ.pop("JAX_PLATFORMS", None)
os.environ.pop("PALLAS_AXON_TPU_GEN", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compile cache: the suite compiles dozens of staged-folder
# programs (minutes each on this 1-core host); cached programs load
# instead of recompiling, bounding suite time after the first run.
from trx2dy.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/tmp/trx2dy_jax_cache_tests")

# This jaxlib's XLA:CPU client accumulates ~thousands of memory mappings
# per compiled/loaded executable and SEGFAULTS (mmap failure goes
# unchecked) once the process crosses vm.max_map_count — measured ~31k
# maps four minutes into the suite vs the 65530 default. Raise the limit
# when we can (root in this image); harmless no-op otherwise.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1048576:
            _f.seek(0)
            _f.write("1048576")
except (OSError, PermissionError):
    pass
