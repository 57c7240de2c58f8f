"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding is tested on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) — the idiomatic JAX
replacement for a fake distributed backend. Must run before jax initializes.
"""

import os
import sys

_TPU_LANE = os.environ.get("GHF_TPU_TESTS", "") == "1"

if not _TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# This environment's sitecustomize registers the axon TPU plugin and
# overrides jax_platforms after env vars are read — force CPU + 8 virtual
# devices via the config API (must happen before any backend init).
# GHF_TPU_TESTS=1 opts into the real-chip lane instead
# (`GHF_TPU_TESTS=1 pytest -m tpu tests/test_pallas_tpu.py`): pallas
# kernels then compile through Mosaic, catching lowering regressions the
# CPU interpreter can't.
import jax  # noqa: E402

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:  # backends already initialized (e.g. plugin probe)
        pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def toy_kg():
    from graph_hypernetwork_forge_tpu import ToyKnowledgeGraph

    return ToyKnowledgeGraph(feat_dim=16)


@pytest.fixture
def small_model():
    from graph_hypernetwork_forge_tpu import HyperGNN

    return HyperGNN(text_dim=32, node_feat_dim=16, hidden_dim=16, num_layers=2)


@pytest.fixture
def weight_gen():
    from graph_hypernetwork_forge_tpu import WeightGenerator

    return WeightGenerator(text_dim=32, d_in=16, d_out=16, hidden_dim=64)
