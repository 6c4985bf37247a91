"""qml-essentials-tpu: a TPU-native QML framework.

A from-scratch rebuild of cirKITers/qml-essentials designed for TPUs:
fused matmul-shaped statevector/density kernels under jit/vmap, a
gate-fusion contraction planner, mesh-based data parallelism and
ICI-sharded statevector simulation, and the full Model / ansatz / analysis
/ pulse / QOC capability surface of the reference.

Top-level modules mirror the reference package layout
(``qml_essentials_tpu.model``, ``.ansaetze``, ...) so downstream code can
switch by renaming the import root.
"""

from qml_essentials_tpu import runtime as _runtime

_runtime.configure()

from qml_essentials_tpu.core.executor import Script  # noqa: F401,E402
from qml_essentials_tpu.core import jaqsi  # noqa: F401
from qml_essentials_tpu.models.ansaetze import (  # noqa: F401
    Ansaetze,
    Block,
    Circuit,
    DeclarativeCircuit,
    Encoding,
)
from qml_essentials_tpu.models.gates import Gates  # noqa: F401
from qml_essentials_tpu.models.model import Model  # noqa: F401
from qml_essentials_tpu.models.topologies import Topology  # noqa: F401
from qml_essentials_tpu.models.unitary import UnitaryGates  # noqa: F401

__version__ = "0.1.0"
