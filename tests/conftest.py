"""Test configuration: run on a virtual 8-device CPU mesh by default.

jax is pre-imported at interpreter startup in this environment (axon site
hook), but the backend is initialized lazily — so switching platform via
config here still works, as long as no test module touches devices at import
time. Set COGNN_TPU_TEST_TPU=1 to run the suite against the real chip instead.
"""

import os

import jax
import pytest  # noqa: F401

if os.environ.get("COGNN_TPU_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
# uint64/float64 support for parity tests (CPU path).
jax.config.update("jax_enable_x64", True)
