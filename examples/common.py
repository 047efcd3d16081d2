"""Shared helpers for the example programs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Examples are small; prefer CPU when the TPU tunnel exposes a single chip
# with slow ahead-of-time compiles.
if os.environ.get("LSQR_EXAMPLES_DEVICE", "cpu") == "cpu":
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except RuntimeError:
        pass

REFERENCE_EXAMPLE_DATA = "/root/reference/examples/Data"
REFERENCE_TESTING_DATA = "/root/reference/testing/Data"


def banner(title):
    print(title)
    print("-" * len(title))


def report(label, values):
    vals = ", ".join(f"{float(v):.6g}" for v in values)
    print(f"{label}:\n\t[ {vals} ]\n")
