"""Reference-layout shim: ``qml_essentials_tpu.topologies``."""
from qml_essentials_tpu.models.topologies import *  # noqa: F401,F403
from qml_essentials_tpu.models.topologies import Topology  # noqa: F401
