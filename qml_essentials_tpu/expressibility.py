"""Reference-layout shim: ``qml_essentials_tpu.expressibility``."""
from qml_essentials_tpu.analysis.expressibility import *  # noqa: F401,F403
from qml_essentials_tpu.analysis.expressibility import Expressibility  # noqa: F401
