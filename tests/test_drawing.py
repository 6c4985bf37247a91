"""Tests for the drawing backends (text / mpl / tikz / pulse schedule)."""

import matplotlib

matplotlib.use("Agg")

import jax.numpy as jnp
import numpy as np
import pytest

import qml_essentials_tpu.ops.operations as op
from qml_essentials_tpu.core.executor import Script
from qml_essentials_tpu.models.model import Model
from qml_essentials_tpu.utils.drawing import (
    TikzFigure,
    draw_text,
    draw_tikz,
    format_pi_fraction,
)
from qml_essentials_tpu.ops.tape import recording


def circuit(theta):
    op.H(wires=0)
    op.RX(theta, wires=0)
    op.CX(wires=[0, 1])
    op.CRZ(0.5, wires=[1, 2])
    op.Barrier(wires=[0, 1, 2])
    op.RY(jnp.pi / 2, wires=2)


class TestFormatting:
    @pytest.mark.unittest
    def test_pi_fractions(self):
        assert format_pi_fraction(np.pi) == "π"
        assert format_pi_fraction(np.pi / 2) == "π/2"
        assert format_pi_fraction(-3 * np.pi / 4) == "-3π/4"
        assert format_pi_fraction(2 * np.pi) == "2π"
        assert format_pi_fraction(0.0) == "0"
        assert format_pi_fraction(0.123) == "0.12"
        assert format_pi_fraction(np.pi / 2, latex=True) == "\\pi/2"


class TestText:
    @pytest.mark.unittest
    def test_draw_text_structure(self):
        s = Script(circuit, n_qubits=3)
        txt = s.draw(figure="text", args=(0.3,))
        lines = txt.splitlines()
        assert len(lines) == 3
        assert lines[0].startswith("q0:")
        assert "H" in lines[0]
        assert "●" in lines[0]  # CX control on q0
        assert "X" in lines[1]  # CX target on q1
        # All lines have equal width
        assert len({len(line) for line in lines}) == 1

    @pytest.mark.unittest
    def test_gate_values_mode(self):
        s = Script(circuit, n_qubits=3)
        symbolic = s.draw(figure="text", args=(0.3,))
        assert "θ_0" in symbolic
        valued = s.draw(figure="text", args=(0.3,), gate_values=True)
        assert "0.30" in valued
        assert "π/2" in valued

    @pytest.mark.unittest
    def test_model_repr(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_19")
        text = str(m)
        assert "RX" in text and "RZ" in text


class TestTikz:
    @pytest.mark.unittest
    def test_tikz_output(self):
        s = Script(circuit, n_qubits=3)
        fig = s.draw(figure="tikz", args=(0.3,))
        code = str(fig)
        assert code.startswith("\\begin{quantikz}")
        assert "\\ctrl{" in code and "\\targ{}" in code
        assert "\\gate{" in code
        assert code.count("\\\\") == 2  # 3 rows

    @pytest.mark.unittest
    def test_tikz_export(self, tmp_path):
        fig = TikzFigure("\\begin{quantikz}x\\end{quantikz}")
        path = tmp_path / "circ.tex"
        fig.export(str(path), full_document=True)
        content = path.read_text()
        assert "documentclass" in content and "quantikz" in content


class TestMpl:
    @pytest.mark.smoketest
    def test_draw_mpl(self):
        s = Script(circuit, n_qubits=3)
        fig, ax = s.draw(figure="mpl", args=(0.3,))
        assert fig is not None
        import matplotlib.pyplot as plt

        plt.close(fig)


class TestPulseSchedule:
    @pytest.mark.smoketest
    def test_pulse_events_and_schedule(self):
        from qml_essentials_tpu.pulse.pulses import PulseGates, PulseInformation

        PulseInformation.set_envelope("gaussian", rwa=True)

        def pulse_circ():
            PulseGates.RX(0.5, wires=0)
            PulseGates.RZ(0.3, wires=1)
            PulseGates.CZ(wires=[0, 1])

        s = Script(pulse_circ, n_qubits=2)
        events = s.pulse_events()
        assert len(events) == 3
        assert events[0].gate == "RX"
        assert events[0].envelope_fn is not None  # physical drive
        assert events[1].envelope_fn is None  # virtual RZ

        fig, axes = s.draw(figure="pulse")
        assert len(axes) == 2
        import matplotlib.pyplot as plt

        plt.close(fig)

    @pytest.mark.smoketest
    def test_model_draw_pulse(self):
        m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_1",
                  data_reupload=False, pulse_shape="gaussian")
        fig, axes = m.draw_pulse()
        import matplotlib.pyplot as plt

        plt.close(fig)
