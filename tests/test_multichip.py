"""Multi-device data-parallel train step on the virtual 8-device CPU mesh."""
import sys

import numpy as np
import pytest

import jax


def test_dryrun_multichip_8dev():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (conftest sets XLA flags)")
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts finite loss internally
