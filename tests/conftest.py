import os
import sys

# Tests run on CPU with a virtual 8-device mesh so sharding paths are
# exercised without TPU hardware. PANACUS_TEST_TPU=1 skips the pin so
# the @pytest.mark.tpu hardware tests can run (pytest -m tpu).
if not os.environ.get("PANACUS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    # A TPU-tunnel plugin (e.g. axon) may have force-set jax_platforms at
    # interpreter startup, which overrides the env var — pin it back to CPU.
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE = "/root/reference"


def reference_file(rel: str) -> str:
    p = os.path.join(REFERENCE, rel)
    if not os.path.exists(p):
        pytest.skip(f"reference fixture {rel} not available")
    return p


@pytest.fixture
def t_groups_gfa():
    return reference_file("tests/test_files/t_groups.gfa")


@pytest.fixture
def chrm_gfa():
    return reference_file("test/chrM_test.gfa")


@pytest.fixture
def cdbg_gfa():
    return reference_file("test/cdbg.gfa")
