"""The dif60 McStas instrument assembly (data/mcstas.py) must reproduce the
published beamline (reference: support_files/Diffraction_generation_script.py:
18-264) — verified here on the declarative spec and through a mock
mcstasscript backend, so no simulator binary is needed."""

import numpy as np
import pytest

from swinwnet_tpu.data.generation import McStasRenderer, SWEEP_STATS
from swinwnet_tpu.data.mcstas import dif60_spec, materialize, run_instrument


# ---------------------------------------------------------------------------
# mcstasscript test double
# ---------------------------------------------------------------------------


class FakeComponent:
    def __init__(self, name, ctype):
        self._name = name
        self._type = ctype
        self._extend = []
        self._at = None
        self._rotated = None

    def append_EXTEND(self, line):
        self._extend.append(line)

    def set_AT(self, at, RELATIVE):
        self._at = (tuple(at), RELATIVE)

    def set_ROTATED(self, rot, RELATIVE):
        self._rotated = (tuple(rot), RELATIVE)


class FakeInstr:
    def __init__(self, name):
        self.name = name
        self.declares = []
        self.initialize = []
        self.components = []
        self.ncount = None

    def add_declare_var(self, ctype, name, value=None):
        self.declares.append((ctype, name, value))

    def append_initialize(self, line):
        self.initialize.append(line)

    def add_component(self, name, ctype):
        comp = FakeComponent(name, ctype)
        self.components.append(comp)
        return comp

    def settings(self, ncount):
        self.ncount = ncount

    def set_parameters(self):
        pass

    def backengine(self):
        return ["fake-data", self]


class FakeDetector:
    def __init__(self):
        self.Intensity = np.full((250, 480), 3.0, dtype=np.float64)


class FakeBackend:
    """Mock of the mcstasscript module surface used by materialize/run."""

    last_instr = None

    class Configurator:
        def set_mcrun_path(self, p):
            FakeBackend.mcrun = p

        def set_mcstas_path(self, p):
            FakeBackend.mcstas = p

    @staticmethod
    def McStas_instr(name):
        FakeBackend.last_instr = FakeInstr(name)
        return FakeBackend.last_instr

    @staticmethod
    def name_search(name, data):
        assert name == "Detector"
        assert data[0] == "fake-data"
        return FakeDetector()


# ---------------------------------------------------------------------------
# Spec-level checks (no backend at all)
# ---------------------------------------------------------------------------


class TestSpec:
    def test_component_chain(self):
        spec = dif60_spec('"Si.laz"', 150.0)
        names = [c.name for c in spec.components]
        assert names == [
            "origin", "source", "Ch1", "Ch11", "monitor_ndt_ch11",
            "guide", "bender", "Mon_source_lambda", "Arm_sample",
            "powdern", "Detector",
        ]
        types = {c.name: c.type for c in spec.components}
        assert types["source"] == "Source_gen"
        assert types["Ch1"] == types["Ch11"] == "DiskChopper"
        assert types["guide"] == "Guide_gravity"
        assert types["bender"] == "Bender"
        assert types["powdern"] == "PowderN"
        assert types["Detector"] == "Monitor_nD"

    def test_moderator_and_choppers(self):
        spec = dif60_spec('"Al.laz"', 10.0)
        decl = {name: value for _, name, value in spec.declares}
        assert decl["T1"] == 98.3 and decl["I1"] == 2.64e11
        assert decl["T2"] == 303.1 and decl["I2"] == 1.19e11
        assert decl["T3"] == 29.9 and decl["I3"] == 3.10e11
        assert decl["pulse_length"] == 10.0
        assert decl["source_freq"] == 60.0
        # duty-factor rescaling of all three Maxwellian components
        assert len(spec.initialize) == 3
        assert "pulse_length * 1e-6 * source_freq" in spec.initialize[0]

        by_name = {c.name: c for c in spec.components}
        ch1, ch11 = by_name["Ch1"], by_name["Ch11"]
        assert ch1.params["nu"] == 60 and ch11.params["nu"] == -60  # counter-rotating
        assert ch1.params["theta_0"] == ch11.params["theta_0"] == 8
        assert ch1.params["delay"] == ch11.params["delay"] == "0.000175/2"
        assert ch1.at == ("0", "0", "0.101") and ch1.relative == "source"

    def test_beamline_geometry(self):
        spec = dif60_spec('"Na2Ca3Al2F14.laz"', 300.0)
        by_name = {c.name: c for c in spec.components}
        guide = by_name["guide"]
        assert guide.params["l"] == 5.5 and guide.params["m"] == 2.5
        bender = by_name["bender"]
        assert bender.params["r"] == 870 and bender.params["k"] == 2 and bender.params["l"] == 12
        det = by_name["Detector"]
        assert "banana" in det.params["options"]
        assert "bins = 480" in det.params["options"]
        assert "bins 250" in det.params["options"]
        assert det.relative == "Arm_sample"
        sample = by_name["powdern"]
        assert sample.params["reflections"] == '"Na2Ca3Al2F14.laz"'
        assert sample.rotated is not None and sample.rotated_relative == "PREVIOUS"

    def test_source_time_structure(self):
        spec = dif60_spec('"Si.laz"', 50.0)
        src = next(c for c in spec.components if c.name == "source")
        assert src.params["lambda0"] == 5.0 and src.params["dlambda"] == 4.9
        # intensities bound to the declare vars, not literals
        assert src.params["I1"] == "I1" and src.params["T3"] == "T3"
        assert any("rand01()*source_pulse_number" in line for line in src.extend)
        assert any("pulse_length*1e-6" in line for line in src.extend)


# ---------------------------------------------------------------------------
# Through the (mocked) backend
# ---------------------------------------------------------------------------


class TestMaterialize:
    def test_materialize_builds_all_components(self):
        spec = dif60_spec('"Si.laz"', 100.0)
        instr = materialize(spec, FakeBackend, mcrun_path="/opt/mcrun", mcstas_path="/opt/mcstas")
        assert instr.name == "Diffraction_imshow"
        assert len(instr.components) == 11
        assert [d[1] for d in instr.declares][:6] == ["T1", "I1", "T2", "I2", "T3", "I3"]
        src = instr.components[1]
        assert src._at == (("0", "0", "0"), "origin")
        assert len(src._extend) == 2
        powdern = instr.components[9]
        assert powdern._rotated == (("0", " 0", " 0"), "PREVIOUS")

    def test_run_returns_detector_intensity(self):
        spec = dif60_spec('"Si.laz"', 100.0)
        img = run_instrument(spec, FakeBackend, ncount=2e7)
        assert img.shape == (250, 480)
        assert FakeBackend.last_instr.ncount == 2e7

    def test_renderer_and_sweep(self):
        r = McStasRenderer(backend=FakeBackend)
        img = r.get_diffraction('"Si.laz"', 1e7, 150.0)
        assert img.shape == (250, 480)
        recs = r.render_sweep(['"Si.laz"'], stats=SWEEP_STATS[:1], pulses=(10.0, 20.0))
        assert len(recs) == 2
        assert set(recs[0]) == {"Matrix", "Crystal", "Stats", "Pulce duration"}
        assert recs[0]["Matrix"].shape == (250, 480)
        assert recs[1]["Pulce duration"] == 20.0

    def test_missing_backend_raises_importerror(self):
        with pytest.raises(ImportError, match="synthesize_pattern"):
            McStasRenderer()  # no mcstasscript in this image
