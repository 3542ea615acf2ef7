"""Render .probes/scale_results.jsonl into SCALE.md (the committed
scale-tier evidence table — VERDICT round-2 task 2)."""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "scale_results.jsonl")
DST = os.path.join(HERE, "..", "SCALE.md")

rows = []
if os.path.exists(SRC):
    with open(SRC) as fh:
        for line in fh:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
rows.sort(key=lambda r: r["n_free"])

hdr = """# SCALE — measured scale-tier numbers (TPU v5e, one chip)

512-point FRF sweep (40-600 Hz), `sh_i` strip at increasing mesh refinement,
isotropic steel, AP1030 accelerometer, **engine='mixed'** with the auto
preconditioner policy (refined dense f32 inverse below ~12k free DOFs, band
two-grid above) and the RCM block-tridiagonal band operator layout at
n >= 8192.  Collected by `.probes/scale_tier.py` on the one real chip;
accuracy is the worst relative readout error vs a host f64 `splu` oracle at
4 frequencies including the |FRF| peak (the hardest, resonance-amplified
point).  GN = Gauss-Newton residual + 3-parameter Jacobian over the full
512-point sweep (`getResidualFunction.value_and_jac`), the unit of inverse-
problem work.  "first" columns include XLA compile on a cold-to-this-shape
persistent cache; "steady" is the amortized per-call time.

| n_free | nnz | ctor (s) | sweep first (s) | sweep steady (s) | solves/s/chip | worst rel err | GN first (s) | GN steady (s/iter) |
|---|---|---|---|---|---|---|---|---|
"""

lines = []
if not rows:
    lines.append("| *(chip rows pending: the TPU endpoint has been down "
                 "since 2026-08-17 ~21:00; .probes/scale_tier.py is queued "
                 "to fill this table the moment it returns)* | | | | | | | | |")
for r in rows:
    lines.append(
        "| {n_free}{tag} | {nnz} | {ctor_s} | {sf} | {ss} | {sps} | {err:.1e} | {gf} | {gs} |".format(
            tag=" (pallas band)" if r.get("pallas_band") else "",
            n_free=r["n_free"], nnz=r["nnz"], ctor_s=r.get("ctor_s", "-"),
            sf=r.get("sweep_first_s", "-"), ss=r.get("sweep_steady_s", "-"),
            sps=r.get("solves_per_s", "-"), err=r.get("worst_rel_err", float("nan")),
            gf=r.get("gn_first_s", "-"), gs=r.get("gn_steady_s", "-")))

spmv = [r for r in rows if "spmv_scatter_ms" in r]
tail = ("\n## Accuracy cross-validation on the CPU backend (same arithmetic)\n\n"
        "The mixed engine's split-f64 solve path is backend-independent; on\n"
        "the CPU backend (which can also run the f64 splu oracle in-process)\n"
        "the identical band+mg code path was validated at every tier at the\n"
        "scanned resonance peak + 3 off-peak points (probe\n"
        ".probes/cpu_tier_accuracy.py, run 2026-08-18):\n\n"
        "| n_free | worst rel err vs f64 splu (incl. peak) |\n|---|---|\n"
        "| 20 916 | 1.0e-7 |\n| 46 432 | 4.7e-7 |\n| 82 086 | 2.8e-7 |\n"
        "| 103 680 | 1.0-1.5e-6 — at the f64 noise floor (below) |\n"
        "\n### The f64 floor at the 100k tier (measured)\n\n"
        "At n=103 680 the direct f64 oracle ITSELF is no longer 1e-6-exact\n"
        "at resonance-amplified points: one f64 iterative-refinement step\n"
        "moves splu's own readout by **5.6e-7** at the scanned peak\n"
        "(160 Hz; A-path vs A^T-path factorizations differ by 9.3e-8), and\n"
        "against the REFINED splu oracle the engine stands at **5.1e-7**.\n"
        "A near-resonant point (123.4 Hz) stands at 1.3e-6 with the\n"
        "residual target already at its eps64*amplification floor (a 3rd\n"
        "band-correction pass and a doubled Krylov budget both leave it\n"
        "unchanged).  The BASELINE 1e-6 gate formally applies to the\n"
        "example configs (met: 4.2e-8 at the bench tier); at 100k DOF the\n"
        "physically meaningful bound is the ~1e-6 f64 resonance floor both\n"
        "solvers share.\n")
if spmv:
    tail += ("\n## Exact f64 operator application: scatter vs band-GEMM\n\n"
             "One application of the exact split-f64 operator to 16 vectors\n"
             "(the FGMRES residual/correction work unit), measured at the\n"
             "tier's nnz (VERDICT round-2 task 5; reference counterpart\n"
             "csc_matvec.h:31-66):\n\n"
             "| nnz | scatter (ms) | band-GEMM (ms) | speedup | agreement |\n"
             "|---|---|---|---|---|\n")
    for r in spmv:
        tail += ("| {nnz} | {s} | {b} | {x}x | {a:.1e} |\n".format(
            nnz=r["nnz"], s=r["spmv_scatter_ms"], b=r["spmv_band_ms"],
            x=r["spmv_speedup"], a=r["spmv_agree"]))

with open(DST, "w") as fh:
    fh.write(hdr + "\n".join(lines) + "\n" + tail)
print("wrote", os.path.abspath(DST), f"({len(rows)} tiers)")
