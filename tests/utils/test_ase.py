"""POSCAR writer tests (reference model: `test/utils/test_ase.py`
golden-text style)."""

import numpy as np

from atomai_tpu.utils import ase_obj_basic, ase_obj_adv


def _coords():
    return {0: np.array([[10.0, 20.0, 0.0], [30.0, 40.0, 1.0],
                         [50.0, 60.0, 0.0]])}


def test_ase_obj_basic(tmp_path):
    path = str(tmp_path / "POSCAR")
    ase_obj_basic(_coords(), 0, "Graphene", {0: "C", 1: "Si"}, path, 0.1)
    lines = open(path).read().splitlines()
    assert lines[0] == "Graphene"
    assert lines[1].strip() == "1.0000"
    # element line and per-class counts
    assert "C" in lines[5] and "Si" in lines[5]
    assert lines[6].split() == ["2", "1"]
    assert lines[7].strip() == "Cartesian"
    # 3 atom rows
    assert len(lines) == 11


def test_ase_obj_adv(tmp_path):
    path = str(tmp_path / "POSCAR_adv")
    ase_obj_adv([86.0, 0.0, 0.0], [0.0, 86.0, 0.0], [0.0, 0.0, 86.0],
                _coords(), 0, "Graphene", {0: "C", 1: "Si"}, path, 0.1)
    lines = open(path).read().splitlines()
    assert lines[2].split() == ["86.0", "0.0", "0.0"]
    assert lines[7].strip() == "Cartesian"
