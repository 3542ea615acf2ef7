"""Accelerometer sensor model (reference jax_plate/Accelerometer.py:1-115).

JSON-backed catalog in ``accelerometers/``; the AP1030 sensor ships with the
package (mass 1.7 g, r 3.8 mm, h 8.7 mm, effective height 0.5, transverse
sensitivity 0.03 — reference accelerometers/AP1030.json).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass

from ..utils.paths import get_package_dir


@dataclass
class AccelerometerParams:
    """Parameters of an accelerometer.

    Attributes
    ----------
    mass : float
        Mass in kg.
    radius : float
        Radius of the cylindrical accelerometer in meters.
    height : float
        Height of the cylinder in meters.
    effective_height : float
        Relative position (0..1) along the cylinder axis where the response is
        measured; 0 = bottom, 1 = top.
    transverse_sensitivity : float
        Relative transverse sensitivity (a real number, not percent).
    """

    mass: float
    radius: float
    height: float = None
    effective_height: float = None
    transverse_sensitivity: float = None


class Accelerometer:
    """Accelerometer with JSON file interface (reference Accelerometer.py:36-115)."""

    def __init__(self, name_or_params: str | AccelerometerParams):
        if isinstance(name_or_params, str):
            fpath = os.path.join(
                get_package_dir(), "accelerometers", name_or_params + ".json"
            )
            if os.path.exists(fpath):
                with open(fpath, "r") as file:
                    params = json.load(file)
            else:
                raise ValueError(
                    f"Could not find file {name_or_params}.json in "
                    "`accelerometers` folder."
                )
        elif isinstance(name_or_params, AccelerometerParams):
            params = name_or_params.__dict__
        else:
            raise TypeError(
                "Argument `name_or_params` should have type `str` or "
                "`AccelerometerParams`."
            )

        self.mass = params["mass"]
        self.radius = params["radius"]
        self.height = params["height"]
        self.effective_height = params["effective_height"]
        self.transverse_sensitivity = params["transverse_sensitivity"]

    @staticmethod
    def create_accelerometer(params: AccelerometerParams, accelerometer_name: str) -> None:
        """Write ``accelerometers/<name>.json`` (reference Accelerometer.py:84-112)."""
        folder = os.path.join(get_package_dir(), "accelerometers")
        os.makedirs(folder, exist_ok=True)
        fpath = os.path.join(folder, accelerometer_name + ".json")
        with open(fpath, "w") as file:
            json.dump(params.__dict__, file, indent=4)

    def __str__(self):
        return f"Accelerometer with {self.__dict__}."
