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
    path = os.path.join(_EXAMPLES, fname)
    spec = importlib.util.spec_from_file_location(fname[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fname[:-3]] = mod
    spec.loader.exec_module(mod)
    mod.main()


@pytest.mark.slow
@pytest.mark.parametrize(
    "fname",
    [
        "01_getting_started.py",
        "03_bernoulli_spatial_classification.py",
        "05_autoregressive_models.py",
    ],
)
def test_example_runs(fname):
    _run_example(fname)
