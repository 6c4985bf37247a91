"""Reference-layout shim: ``qml_essentials_tpu.evolution``."""
from qml_essentials_tpu.pulse.evolution import *  # noqa: F401,F403
from qml_essentials_tpu.pulse.evolution import Evolution  # noqa: F401
