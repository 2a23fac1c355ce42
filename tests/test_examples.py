"""Acceptance tier: run tutorial examples end-to-end (slow tier).

The examples carry their own golden-value assertions (posterior RMSE,
classification accuracy, closed-form variance checks) — mirroring the
reference's literate tutorials as acceptance tests
(reference docs/src/literate-tutorials/, BASELINE.md consequence #1).
"""

import importlib.util
import os
import sys

import pytest

_EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run_example(fname):
    # subprocess isolation: examples may flip global jax config (e.g. 04
    # enables x64 for the stiff space-time joint) and must not leak into
    # the test session
    import subprocess

    # the sandbox's sitecustomize pins JAX_PLATFORMS before user code, so
    # force CPU via jax.config AFTER import (see tests/conftest.py)
    runner = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import runpy, sys; runpy.run_path(sys.argv[1], run_name='__main__')"
    )
    r = subprocess.run(
        [sys.executable, "-c", runner, os.path.join(_EXAMPLES, fname)],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, (
        fname + "\n" + r.stdout[-2000:] + "\n" + r.stderr[-2000:]
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "fname",
    sorted(
        f
        for f in os.listdir(_EXAMPLES)
        if f.endswith(".py") and f != "12_multichip_sharding.py"
    ),
)
def test_example_runs(fname):
    # every example is exercised nightly (VERDICT r3 item 6); the
    # multichip one needs the forced 8-device env, handled below
    _run_example(fname)


@pytest.mark.slow
def test_example_multichip_runs():
    import subprocess

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(_EXAMPLES, "12_multichip_sharding.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
