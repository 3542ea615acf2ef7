"""Experimental-FRF compression (reference jax_plate/Input.py:1-158).

Two algorithms with the reference's semantics:

* alg 0 — uniform subsampling (Input.py:72-82);
* alg 1 — peak-centric: log-savgol smoothing, peak finding on +-signal,
  filtering by width/prominence/smoothness, then growing symmetric windows
  around surviving peaks until the point budget is met (Input.py:84-156).
"""
from __future__ import annotations

import numpy as np
from scipy.signal import find_peaks, savgol_filter, peak_widths, peak_prominences


class Compressor:
    """Callable FRF compressor.

    Parameters
    ----------
    freqs, complex_fr : np.ndarray
        Frequency grid and complex amplitudes of the reference FRF.
    max_size : int
        Maximal array size usable in optimisation.
    use_alg : int
        0 — uniform; 1 — peak-centric.
    """

    def __init__(self, freqs: np.ndarray, complex_fr: np.ndarray,
                 max_size: int, use_alg: int):
        assert freqs.size == complex_fr.size
        self.size = freqs.size
        self.freqs = freqs
        self.complex_fr = complex_fr
        self.max_size = max_size
        self.alg = use_alg

    @staticmethod
    def _peak_smoothness(x: np.ndarray, peaks: np.ndarray) -> np.ndarray:
        """Inverse mean |diff| over the 20 nearest neighbours of each peak
        (reference Input.py:38-64)."""
        res = np.zeros_like(peaks, dtype=np.float64)
        for i, p in enumerate(peaks):
            bds = 10
            if p <= 10 or x.size - p <= 10:
                bds = min(p, x.size - p) - 1
            interval = x[p - bds : p + bds + 1]
            res[i] = np.sum(np.abs(np.diff(interval))) / 2 / bds * 20
        return 1 / res

    def __call__(self, desired_size: int) -> tuple[np.ndarray, np.ndarray]:
        if desired_size > self.max_size:
            raise ValueError(
                f"Desired size of compressed data must be lower than {self.max_size + 1}"
            )

        bool_mask = np.zeros(self.size, dtype=bool)

        if self.alg == 0:
            step = self.size / desired_size
            current = 0.0
            while current < self.size:
                bool_mask[int(current)] = True
                current += step
            if np.sum(bool_mask) > desired_size:
                bool_mask[0] = False

        elif self.alg == 1:
            freq_step = np.max(np.diff(self.freqs))
            dst = max(int(75 / freq_step), 1)  # peak width ~75 Hz (Input.py:87)

            idx = []
            window = min(30, self.size - 1)
            smooth = savgol_filter(np.abs(self.complex_fr), window, 3)
            # savgol can overshoot below zero near deep anti-resonances;
            # clamp before the log (the reference warns/NaNs here, Input.py:91)
            floor = max(np.abs(self.complex_fr).min() * 1e-3, 1e-300)
            tmp_afc = np.log(np.maximum(smooth, floor))

            for afc in (tmp_afc, -tmp_afc):
                all_peaks = find_peaks(afc, distance=dst)

                ws = peak_widths(afc, all_peaks[0])
                width_filtered = all_peaks[0][ws[0] > 20]

                pr = peak_prominences(afc, width_filtered)
                prom_filtered = width_filtered[pr[0] > 0.1]

                ps = self._peak_smoothness(afc, prom_filtered)
                idx.append(prom_filtered[ps < 50])

            idx = np.concatenate(idx)
            idx.sort()
            npeaks = idx.size

            if npeaks == 0:
                # degenerate signal: fall back to uniform subsampling
                return Compressor(self.freqs, self.complex_fr, self.max_size, 0)(
                    desired_size
                )

            pts = desired_size - npeaks
            layers = pts // (npeaks * 2)

            left_idx = idx - layers
            right_idx = idx + layers
            left_idx[left_idx < 0] = 0
            right_idx[right_idx + 1 > self.size] = self.size - 1

            for i in range(npeaks):
                bool_mask[left_idx[i] : right_idx[i] + 1] = True

            diff = desired_size - np.sum(bool_mask)

            while diff > 0:  # grow windows until budget met or they collide
                grew = False
                for i in range(npeaks - 1):
                    if right_idx[i] + 1 < left_idx[i + 1]:
                        right_idx[i] += 1
                        diff -= 1
                        grew = True
                        bool_mask[right_idx[i]] = True
                    if diff == 0:
                        break
                if diff == 0:
                    break

                if right_idx[-1] + 1 < self.size:
                    right_idx[-1] += 1
                    diff -= 1
                    grew = True
                    bool_mask[right_idx[-1]] = True
                elif left_idx[0] - 1 > 0:
                    left_idx[0] -= 1
                    diff -= 1
                    grew = True
                    bool_mask[left_idx[0]] = True

                if not grew:
                    break
        else:
            raise NotImplementedError(f"Compression algorithm {self.alg}.")

        return self.freqs[bool_mask], self.complex_fr[bool_mask]
