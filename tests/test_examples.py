"""Smoke tests: every example script runs end-to-end on CPU.

Examples double as integration tests of the public API surface (the
reference's analogue is the documented CLI walkthrough in ``readme.md:30-79``
— here each workflow is an executable script). Run as subprocesses so each
example's own platform forcing / XLA_FLAGS handling is exercised exactly as
a user would hit it.
"""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples")

_FAST_ARGS = {
    "02_train_export_serve.py": ["--steps", "40"],
    "03_sharded_training.py": ["--steps", "2"],
    "04_generate.py": ["--new-tokens", "4"],
}


def _scripts():
    return sorted(f for f in os.listdir(EXAMPLES) if f.endswith(".py"))


def test_every_example_has_a_smoke_entry():
    # new examples must stay cheap enough to smoke-test (add args here)
    assert set(_FAST_ARGS) <= set(_scripts())


@pytest.mark.parametrize("script", _scripts())
def test_example_runs(script):
    env = dict(os.environ)
    # examples force CPU themselves; drop the test harness's device-count
    # flag so example 03's own XLA_FLAGS handling is what's under test
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script)]
        + _FAST_ARGS.get(script, []),
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}")
