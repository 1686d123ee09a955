"""Fit the serving step-cost primitives from measured flagship schedules.

Round-5 refit (VERDICT r04 weak #5): the per-class model under-resolved
attention-reuse depth — it predicted zero gain for pab288 vs pab244 while
the chip gave +3 %. This script fits the structural model in
utils/quality.py (per-kind reuse savings with a level-0 share on trunk-reuse
steps) against ALL measured 25-step flagship p50s, prints the primitives,
the per-schedule residuals, a leave-one-out validation on the pab288 line,
and model predictions for the round-5 candidate schedules.

  JAX_PLATFORMS=cpu python tools/fit_cost_model.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 25-step flagship p50 seconds, measured on v5e through the bench protocol
# (docs/PERF.md "Serving approximations"; BENCH_r04.json; round-4
# tools/measure_schedule.py runs recorded in PERF.md)
MEASURED = {
    "exact": ({}, 8.382),
    "cfg_cache3": (dict(cfg_cache_interval=3), 5.965),
    "pab244_cfg4": (dict(pab_spatial_interval=2, pab_temporal_interval=4,
                         pab_cross_interval=4, cfg_cache_interval=4), 4.946),
    "pab244_deep2_cfg4_w2": (
        dict(pab_spatial_interval=2, pab_temporal_interval=4,
             pab_cross_interval=4, cfg_cache_interval=4,
             deep_cache_interval=2, pab_warmup_steps=2), 4.809),
    "pab244_deep4_cfg4_w2": (
        dict(pab_spatial_interval=2, pab_temporal_interval=4,
             pab_cross_interval=4, cfg_cache_interval=4,
             deep_cache_interval=4, pab_warmup_steps=2), 4.461),
    "pab244_deep4_cfg4_ex": (
        dict(pab_spatial_interval=2, pab_temporal_interval=4,
             pab_cross_interval=4, cfg_cache_interval=4,
             deep_cache_interval=4, cfg_cache_extrapolate=True), 3.896),
    "pab288_deep4_cfg4_ex": (
        dict(pab_spatial_interval=2, pab_temporal_interval=8,
             pab_cross_interval=8, cfg_cache_interval=4,
             deep_cache_interval=4, cfg_cache_extrapolate=True), 3.779),
}

# Held-out validation rows — NOT in the fit. Including pab488 in the fit
# destabilizes it (level-0 share pins at 0.9, RMS 11 → 33 ms): the
# additive one-φ structure under-resolves spatial reuse on deep steps.
# The 7-row fit over-predicts pab488's p50 by 182 ms (+5.1 %) — the
# model is PESSIMISTIC about deep-spatial-reuse schedules, so it can
# under-rank winners in that family but won't oversell one.
VALIDATION = {
    "pab488_deep4_cfg4_ex": (
        dict(pab_spatial_interval=4, pab_temporal_interval=8,
             pab_cross_interval=8, cfg_cache_interval=4,
             deep_cache_interval=4, cfg_cache_extrapolate=True), 3.551),
}

CANDIDATES = {
    # deeper trunk reuse: refresh the trunk only every 8 steps
    "pab288_deep8_cfg4_ex": dict(
        pab_spatial_interval=2, pab_temporal_interval=8,
        pab_cross_interval=8, cfg_cache_interval=4, deep_cache_interval=8,
        cfg_cache_extrapolate=True),
    # spatial reuse pushed to 4 on top of the 288 line
    "pab488_deep4_cfg4_ex": dict(
        pab_spatial_interval=4, pab_temporal_interval=8,
        pab_cross_interval=8, cfg_cache_interval=4, deep_cache_interval=4,
        cfg_cache_extrapolate=True),
    "pab488_deep8_cfg4_ex": dict(
        pab_spatial_interval=4, pab_temporal_interval=8,
        pab_cross_interval=8, cfg_cache_interval=4, deep_cache_interval=8,
        cfg_cache_extrapolate=True),
    # warmup variants of the deep-8 push (quality insurance)
    "pab288_deep8_cfg4_w2_ex": dict(
        pab_spatial_interval=2, pab_temporal_interval=8,
        pab_cross_interval=8, cfg_cache_interval=4, deep_cache_interval=8,
        pab_warmup_steps=2, cfg_cache_extrapolate=True),
}


def _design_row(spec, phi):
    """Linear coefficients for [H, kappa, trunk, sp, tc] + OH (=1)."""
    from followyourclick_tpu.utils.quality import schedule_step_features

    aH = aK = aT = aS = aC = 0.0
    for cfg, deep, spr, tcr in schedule_step_features(spec):
        m = 2.0 if cfg == "full" else 1.0
        pj = phi if deep else 1.0
        aH += m
        aK += 1.0 if cfg == "full" else 0.0
        aT -= m * (1.0 if deep else 0.0)
        aS -= m * pj * (1.0 if spr else 0.0)
        aC -= m * pj * (1.0 if tcr else 0.0)
    return [aH, aK, aT, aS, aC, 1.0]


def fit(measured, phi_grid=None):
    from followyourclick_tpu.pipelines.animation import SampleSpec

    specs, y = [], []
    for kw, p50 in measured.values():
        kw = {k: v for k, v in kw.items() if k != "cfg_cache_extrapolate"}
        specs.append(SampleSpec(video_length=16, height=512, width=512,
                                num_inference_steps=25, guidance_scale=8.0,
                                **kw))
        y.append(p50 * 1e3)  # ms
    y = np.array(y)

    best = None
    for phi in (phi_grid if phi_grid is not None
                else np.linspace(0.2, 0.9, 141)):
        A = np.array([_design_row(s, phi) for s in specs])
        x, *_ = np.linalg.lstsq(A, y, rcond=None)
        resid = A @ x - y
        rms = float(np.sqrt(np.mean(resid ** 2)))
        if best is None or rms < best["rms"]:
            best = dict(phi=float(phi), x=x, rms=rms, resid=resid, A=A)
    H, K, T, S, C, OH = best["x"]
    prims = dict(overhead_ms=round(float(OH), 1),
                 half_ms=round(float(H), 1),
                 kappa_ms=round(float(K), 1),
                 trunk_ms=round(float(T), 1),
                 sp_ms=round(float(S), 1),
                 tc_ms=round(float(C), 1),
                 level0_share=round(best["phi"], 2))
    return prims, best


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from followyourclick_tpu.pipelines.animation import SampleSpec
    from followyourclick_tpu.utils import quality

    prims, best = fit(MEASURED)
    print(json.dumps({"primitives": prims, "rms_ms": round(best["rms"], 1)}))
    for name, r in zip(MEASURED, best["resid"]):
        meas = MEASURED[name][1]
        print(json.dumps({"schedule": name, "measured_s": meas,
                          "pred_s": round(meas + r / 1e3, 3),
                          "resid_ms": round(float(r), 1)}))

    # leave-one-out validation on the line the old model missed
    loo = {k: v for k, v in MEASURED.items() if k != "pab288_deep4_cfg4_ex"}
    prims_loo, _ = fit(loo)
    quality.COST_PRIMITIVES.update(prims_loo)
    kw = {k: v for k, v in MEASURED["pab288_deep4_cfg4_ex"][0].items()
          if k != "cfg_cache_extrapolate"}
    spec = SampleSpec(video_length=16, height=512, width=512,
                      num_inference_steps=25, guidance_scale=8.0, **kw)
    pred = quality.estimate_clip_seconds(spec)
    print(json.dumps({"holdout": "pab288_deep4_cfg4_ex",
                      "pred_s": round(pred, 3),
                      "measured_s": MEASURED["pab288_deep4_cfg4_ex"][1],
                      "loo_primitives": prims_loo}))

    # held-out validation rows (never in the fit)
    quality.COST_PRIMITIVES.update(prims)
    for name, (kw, meas) in VALIDATION.items():
        kw = {k: v for k, v in kw.items() if k != "cfg_cache_extrapolate"}
        spec = SampleSpec(video_length=16, height=512, width=512,
                          num_inference_steps=25, guidance_scale=8.0, **kw)
        pred = quality.estimate_clip_seconds(spec)
        print(json.dumps({"validation": name, "pred_s": round(pred, 3),
                          "measured_s": meas,
                          "bias_pct": round(100 * (pred - meas) / meas, 1)}))

    # candidate ranking under the FULL fit
    for name, kw in CANDIDATES.items():
        kw = {k: v for k, v in kw.items() if k != "cfg_cache_extrapolate"}
        spec = SampleSpec(video_length=16, height=512, width=512,
                          num_inference_steps=25, guidance_scale=8.0, **kw)
        print(json.dumps({
            "candidate": name,
            "pred_p50_s": round(quality.estimate_clip_seconds(spec), 3),
            "pred_fps": round(quality.estimate_fps(spec), 3),
            "step_classes": quality.schedule_step_classes(spec)}))


if __name__ == "__main__":
    main()
