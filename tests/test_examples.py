"""Every example in examples/ must run clean (CPU; small shapes)."""

import pathlib
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "examples").glob("*.py"))

_DRIVER = """
import jax
jax.config.update("jax_platforms", "cpu")
import runpy, sys
runpy.run_path(sys.argv[1], run_name="__main__")
"""


@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(script):
    out = subprocess.run(
        [sys.executable, "-c", _DRIVER, str(script)],
        capture_output=True, text=True, timeout=300,
        cwd=script.parent.parent)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip(), "examples should print something"
    assert "MISS" not in out.stdout
