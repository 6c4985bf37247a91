"""Reference-layout shim: ``qml_essentials_tpu.ansaetze``."""
from qml_essentials_tpu.models.ansaetze import *  # noqa: F401,F403
from qml_essentials_tpu.models.ansaetze import (  # noqa: F401
    Ansaetze, Block, Circuit, DeclarativeCircuit, Encoding,
)
