"""Reference-layout shim: ``qml_essentials_tpu.pulses``."""
from qml_essentials_tpu.pulse.pulses import *  # noqa: F401,F403
from qml_essentials_tpu.pulse.pulses import (  # noqa: F401
    PulseParams, PulseEnvelope, PulseInformation, PulseGates,
    PulseParamManager, DecompositionStep, PulseStateSnapshot,
)
