"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding tests need multiple devices; the single real TPU chip (when
present) is reserved for bench.py.  These env vars must be set before JAX
initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may import jax at interpreter startup
# (before this file runs), baking in a TPU platform choice; the config
# update below overrides it regardless.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REFERENCE_BIN = REPO / ".parity" / "refbuild" / "readsb"


@pytest.fixture(scope="session")
def reference_binary():
    if not REFERENCE_BIN.exists():
        pytest.skip("reference readsb binary not built (run tools/build_reference.sh)")
    return str(REFERENCE_BIN)


@pytest.fixture(scope="session")
def capture_small(tmp_path_factory):
    """A deterministic 1 s / 4-aircraft capture shared by the session."""
    from tools.synth import build_standard_capture

    d = tmp_path_factory.mktemp("capture")
    cap = build_standard_capture(duration_s=1.0, n_aircraft=4, seed=7)
    prefix = str(d / "cap")
    cap.write_uc8(prefix + ".uc8.dat")
    cap.write_sc16(prefix + ".sc16.dat")
    cap.write_truth(prefix + ".truth.json")
    return prefix


def run_reference_raw(binary: str, path: str, fmt: str, extra: list[str] = ()) -> list[str]:
    """Run the reference on a capture, return accepted frame hex strings."""
    out = subprocess.run(
        [binary, "--device-type", "ifile", "--ifile", path, "--iformat", fmt,
         "--raw", *extra],
        capture_output=True,
        text=True,
        timeout=600,
    )
    frames = []
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("*") and line.endswith(";"):
            frames.append(line[1:-1])
    return frames
