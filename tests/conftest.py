import os

# Device tests run on a virtual 8-device CPU mesh; the real-TPU bench path
# selects its own platform.  NOTE: this image's axon jax build ignores the
# JAX_PLATFORMS env var, so the platform must be forced via jax.config
# before any backend initialization.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import importlib.util
import sys

import pytest

REFERENCE_PATH = "/root/reference/MAPLEv0.7.5.4.py"
EXAMPLE_ALIGNMENT = "/root/reference/example_files/MAPLE_alignment_example.txt"

_ref_module_cache = {}


def load_reference_module(extra_argv=()):
    """Import the reference implementation as a module (argv patched so its
    top-level argparse sees a benign command line). Used purely as a test
    oracle for differential testing; skipped when the reference isn't
    mounted."""
    key = tuple(extra_argv)
    if key in _ref_module_cache:
        return _ref_module_cache[key]
    if not os.path.isfile(REFERENCE_PATH):
        pytest.skip("reference implementation not available")
    old_argv = sys.argv
    sys.argv = ["maple", "--input", EXAMPLE_ALIGNMENT,
                "--output", "/tmp/_maple_ref_oracle", "--overwrite",
                *extra_argv]
    try:
        spec = importlib.util.spec_from_file_location(
            f"reference_maple_{len(_ref_module_cache)}", REFERENCE_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.argv = old_argv
    _ref_module_cache[key] = mod
    return mod


@pytest.fixture(scope="session")
def refmod():
    return load_reference_module()
