"""Reference-layout shim: ``qml_essentials_tpu.script``."""
from qml_essentials_tpu.core.executor import *  # noqa: F401,F403
from qml_essentials_tpu.core.executor import Script  # noqa: F401
