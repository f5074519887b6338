"""Push updated predistorter settings into the running modulator over RC
(port of python/dpd/Adapt.py:57-170).

The reference serialises the coefficients over the RC `coefs` parameter /
coefficient file; here Adapt writes the reference-format coefficient file
(format indicator 1, count, 5 AM + 5 PM coefficients --
src/MemlessPoly.cpp coefficient file reader) and triggers a reload via
`set poly coeffile`.
"""
from __future__ import annotations

import os

import numpy as np

from ..rc.client import ModRemoteControl


def write_coef_file(path: str, coefs_am, coefs_pm):
    with open(path, "w") as f:
        f.write("1\n5\n")
        for c in np.asarray(coefs_am, np.float64):
            f.write(f"{float(c)!r}\n")
        for c in np.asarray(coefs_pm, np.float64):
            f.write(f"{float(c)!r}\n")


class Adapt:
    def __init__(self, rc_endpoint: str, coef_path: str):
        self.rc = ModRemoteControl(rc_endpoint)
        self.coef_path = coef_path

    def set_predistorter(self, dpddata):
        kind, coefs_am, coefs_pm = dpddata
        if kind != "poly":
            raise ValueError("only poly predistorters are supported")
        tmp = self.coef_path + ".tmp"
        write_coef_file(tmp, coefs_am, coefs_pm)
        os.replace(tmp, self.coef_path)
        self.rc.set_param_value("poly", "coeffile", self.coef_path)

    def get_digital_gain(self) -> float:
        return float(self.rc.get_param_value("gain", "digital"))

    def set_digital_gain(self, gain: float):
        self.rc.set_param_value("gain", "digital", str(gain))
