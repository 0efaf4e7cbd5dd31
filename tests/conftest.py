"""Test env: force CPU JAX with an 8-device virtual mesh.

Multi-chip logic is validated without TPU hardware by asking XLA for 8 host
devices (the TPU answer to "test multi-node without a cluster" — SURVEY.md
§4). Must run before the first jax import.
"""

import os

# Force CPU regardless of the ambient JAX_PLATFORMS (e.g. the axon TPU
# tunnel) — unit tests must be hermetic and fast; TPU execution is covered
# by bench.py and the driver's compile checks. NOTE: a sitecustomize hook
# may already have imported jax at interpreter startup, so setting the env
# var here is too late; jax.config still works because backends initialize
# lazily. XLA_FLAGS must land before the first CPU client is created.
os.environ["JAX_PLATFORMS"] = "cpu"
# NO persistent XLA compile cache for the CPU suite: env-var config here
# is latched before this file runs (a sitecustomize imports jax at
# interpreter startup), and this host's cache dir has held AOT entries
# compiled for a DIFFERENT machine type (XLA warns "could lead to SIGILL"
# and recompiles anyway — see test_multihost.py's _env, where mixed
# hit/miss arrival skew broke Gloo bootstrap). Measured: no repeat-run
# speedup on this CPU either way.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "virtual 8-device CPU mesh required for sharding tests"

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = pathlib.Path("/root/reference")

import importlib.util

import pytest


GOLDEN_DIR = REPO_ROOT / "tests" / "goldens"


def golden_npz(name: str, compute):
    """Frozen-golden cache for parity tests.

    Loads ``tests/goldens/{name}.npz`` if present; otherwise calls
    ``compute()`` (which may import torch/transformers and the reference
    tree) for a dict of numpy arrays, saves it, and returns it. With the
    goldens committed, the default suite run needs neither torch nor the
    reference checkout on the hot path — delete a file to regenerate it
    against the live reference."""
    import numpy as np

    path = GOLDEN_DIR / f"{name}.npz"
    if path.exists():
        blob = np.load(path, allow_pickle=False)
        return {k: blob[k] for k in blob.files}
    data = {k: np.asarray(v) for k, v in compute().items()}
    GOLDEN_DIR.mkdir(exist_ok=True)
    np.savez_compressed(path, **data)
    return data


def load_reference_module(relpath: str, name: str):
    """Import a module file from the read-only reference tree by path.

    Used only to generate golden tensors for parity tests — the reference
    code itself is never vendored into this repo.
    """
    path = REFERENCE_ROOT / relpath
    if not path.exists():
        pytest.skip(f"reference file {path} unavailable")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def ref_losses():
    return load_reference_module("toolkit/utils/loss.py", "ref_loss")


@pytest.fixture(scope="session")
def ref_model_module():
    return load_reference_module(
        "toolkit/models/wengnet_mosei_mult_views_text_missing.py", "ref_model"
    )
