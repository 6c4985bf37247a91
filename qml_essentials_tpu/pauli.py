"""Reference-layout shim: ``qml_essentials_tpu.pauli``."""
from qml_essentials_tpu.analysis.pauli import *  # noqa: F401,F403
from qml_essentials_tpu.analysis.pauli import PauliCircuit  # noqa: F401
