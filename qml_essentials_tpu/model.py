"""Reference-layout shim: ``qml_essentials_tpu.model``."""
from qml_essentials_tpu.models.model import *  # noqa: F401,F403
from qml_essentials_tpu.models.model import Model  # noqa: F401
