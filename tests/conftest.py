"""Test configuration: force the CPU backend with 8 virtual devices.

Sharding / mesh tests exercise multi-chip code paths on a virtual 8-device
CPU mesh (the driver separately dry-runs the multi-chip path); kernels are
identical to the TPU path modulo the backend.

The environment pre-registers an accelerator plugin and pins
``jax_platforms`` programmatically, so the override must go through
``jax.config`` (env vars are already consumed by the time conftest runs).
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture(autouse=True)
def isolate_pulse_information_state():
    """Reset the global pulse configuration around every test.

    Mirrors the reference's conftest: xdist workers share process globals,
    so mutated pulse state must never leak across tests.
    """
    from qml_essentials_tpu.pulse.pulses import PulseInformation

    snapshot = PulseInformation.snapshot_state()
    yield
    PulseInformation.restore_state(snapshot)
