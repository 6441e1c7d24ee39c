import os

# Tests run on CPU with a virtual 8-device mesh; the real chip is reserved
# for bench.py. racon_tpu.testing.pytest_reexec (loaded via addopts before
# pytest's capture starts) restarts the run with a clean environment when
# the image's sitecustomize froze jax at a single CPU device; by the time
# this conftest imports, the environment is already correct.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

import pytest  # noqa: E402

DATA_DIR = "/root/reference/test/data"


@pytest.fixture(scope="session")
def data_dir():
    if not os.path.isdir(DATA_DIR):
        pytest.skip("reference test data not available")
    return DATA_DIR
