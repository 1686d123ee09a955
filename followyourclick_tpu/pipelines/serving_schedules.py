"""Named composed serving schedules (OPT-IN approximations).

One registry shared by the CLI (``--serving_schedule``), the bench
(`bench.py` default opt-in variants), and the sweep/measure tools
(`tools/serving_sweep.py`, `tools/measure_schedule.py`). Every entry is a
dict of :class:`~followyourclick_tpu.pipelines.animation.SampleSpec`
overrides; quality bounds for the shipped ones live in docs/PERF.md
"Serving quality budget" and are regression-gated by tests/test_pab.py.

Shipped (quality-bounded, rel-l2 <= 0.10 at the flagship shape):
``pab488_deep4_cfg4_ex`` (the headline), ``pab288_deep4_cfg4_ex``,
``pab244_deep4_cfg4_ex``. The rest are sweep candidates kept for
reproducibility — several are documented REJECTS (over the quality cap).
"""

from __future__ import annotations

SCHEDULES = {
    # name: SampleSpec overrides
    "cfg_cache3": dict(cfg_cache_interval=3),
    "pab222_cfg4": dict(pab_spatial_interval=2, pab_temporal_interval=2,
                        pab_cross_interval=2, cfg_cache_interval=4),
    "pab244_cfg4": dict(pab_spatial_interval=2, pab_temporal_interval=4,
                        pab_cross_interval=4, cfg_cache_interval=4),
    "pab244_cfg4_w2": dict(pab_spatial_interval=2, pab_temporal_interval=4,
                           pab_cross_interval=4, cfg_cache_interval=4,
                           pab_warmup_steps=2),
    "pab244_cfg4_w4": dict(pab_spatial_interval=2, pab_temporal_interval=4,
                           pab_cross_interval=4, cfg_cache_interval=4,
                           pab_warmup_steps=4),
    "pab366_cfg6": dict(pab_spatial_interval=3, pab_temporal_interval=6,
                        pab_cross_interval=6, cfg_cache_interval=6),
    "pab366_cfg6_w2": dict(pab_spatial_interval=3, pab_temporal_interval=6,
                           pab_cross_interval=6, cfg_cache_interval=6,
                           pab_warmup_steps=2),
    "pab366_cfg6_w4": dict(pab_spatial_interval=3, pab_temporal_interval=6,
                           pab_cross_interval=6, cfg_cache_interval=6,
                           pab_warmup_steps=4),
    "pab266_cfg6_w2": dict(pab_spatial_interval=2, pab_temporal_interval=6,
                           pab_cross_interval=6, cfg_cache_interval=6,
                           pab_warmup_steps=2),
    "pab366_cfg6_w2_fe1": dict(pab_spatial_interval=3,
                               pab_temporal_interval=6,
                               pab_cross_interval=6, cfg_cache_interval=6,
                               pab_warmup_steps=2, cfg_final_exact_steps=1),
    "pab488_cfg8_w2": dict(pab_spatial_interval=4, pab_temporal_interval=8,
                           pab_cross_interval=8, cfg_cache_interval=8,
                           pab_warmup_steps=2),
    "pab488_cfg8_w4": dict(pab_spatial_interval=4, pab_temporal_interval=8,
                           pab_cross_interval=8, cfg_cache_interval=8,
                           pab_warmup_steps=4),
    # deeper cfg-cache with fe=1: the cost model puts these ≥3.5 f/s on v5e
    "pab488_cfg8_w2_fe1": dict(pab_spatial_interval=4,
                               pab_temporal_interval=8,
                               pab_cross_interval=8, cfg_cache_interval=8,
                               pab_warmup_steps=2, cfg_final_exact_steps=1),
    "pab488_cfg8_w4_fe1": dict(pab_spatial_interval=4,
                               pab_temporal_interval=8,
                               pab_cross_interval=8, cfg_cache_interval=8,
                               pab_warmup_steps=4, cfg_final_exact_steps=1),
    "pab366_cfg6_w4_fe1": dict(pab_spatial_interval=3,
                               pab_temporal_interval=6,
                               pab_cross_interval=6, cfg_cache_interval=6,
                               pab_warmup_steps=4, cfg_final_exact_steps=1),
    "pab266_cfg6_w2_fe1": dict(pab_spatial_interval=2,
                               pab_temporal_interval=6,
                               pab_cross_interval=6, cfg_cache_interval=6,
                               pab_warmup_steps=2, cfg_final_exact_steps=1),
    # first-order uncond forecast (SampleSpec.cfg_cache_extrapolate):
    # same step classes/compute as the plain cache
    "pab244_cfg4_ex": dict(pab_spatial_interval=2, pab_temporal_interval=4,
                           pab_cross_interval=4, cfg_cache_interval=4,
                           cfg_cache_extrapolate=True),
    "pab366_cfg6_ex": dict(pab_spatial_interval=3, pab_temporal_interval=6,
                           pab_cross_interval=6, cfg_cache_interval=6,
                           cfg_cache_extrapolate=True),
    "pab366_cfg6_w2_ex": dict(pab_spatial_interval=3,
                              pab_temporal_interval=6,
                              pab_cross_interval=6, cfg_cache_interval=6,
                              pab_warmup_steps=2, cfg_cache_extrapolate=True),
    "pab488_cfg8_w2_ex": dict(pab_spatial_interval=4,
                              pab_temporal_interval=8,
                              pab_cross_interval=8, cfg_cache_interval=8,
                              pab_warmup_steps=2, cfg_cache_extrapolate=True),
    "pab488_cfg8_w2_fe1_ex": dict(pab_spatial_interval=4,
                                  pab_temporal_interval=8,
                                  pab_cross_interval=8, cfg_cache_interval=8,
                                  pab_warmup_steps=2,
                                  cfg_final_exact_steps=1,
                                  cfg_cache_extrapolate=True),
    # DeepCache-style trunk reuse composed in (SampleSpec.deep_cache_interval,
    # arXiv 2312.00858 family): trunk-reuse steps run only the outermost
    # UNet level. Same 3-distinct-body compile cost as the shipped pab244
    # composition when deep aligns with the lcm-4 period.
    "pab244_deep2_cfg4_w2": dict(pab_spatial_interval=2,
                                 pab_temporal_interval=4,
                                 pab_cross_interval=4, cfg_cache_interval=4,
                                 deep_cache_interval=2, pab_warmup_steps=2),
    "pab244_deep4_cfg4_w2": dict(pab_spatial_interval=2,
                                 pab_temporal_interval=4,
                                 pab_cross_interval=4, cfg_cache_interval=4,
                                 deep_cache_interval=4, pab_warmup_steps=2),
    "pab244_deep4_cfg4_w4_fe1_ex": dict(pab_spatial_interval=2,
                                        pab_temporal_interval=4,
                                        pab_cross_interval=4,
                                        cfg_cache_interval=4,
                                        deep_cache_interval=4,
                                        pab_warmup_steps=4,
                                        cfg_final_exact_steps=1,
                                        cfg_cache_extrapolate=True),
    "pab366_deep6_cfg6_w4_fe1_ex": dict(pab_spatial_interval=3,
                                        pab_temporal_interval=6,
                                        pab_cross_interval=6,
                                        cfg_cache_interval=6,
                                        deep_cache_interval=6,
                                        pab_warmup_steps=4,
                                        cfg_final_exact_steps=1,
                                        cfg_cache_extrapolate=True),
    "deep2_cfg4_w2": dict(deep_cache_interval=2, cfg_cache_interval=4,
                          pab_warmup_steps=2),
    "pab244_deep4_cfg4_w2_ex": dict(pab_spatial_interval=2,
                                    pab_temporal_interval=4,
                                    pab_cross_interval=4,
                                    cfg_cache_interval=4,
                                    deep_cache_interval=4,
                                    pab_warmup_steps=2,
                                    cfg_cache_extrapolate=True),
    "pab244_deep4_cfg4_ex": dict(pab_spatial_interval=2,
                                 pab_temporal_interval=4,
                                 pab_cross_interval=4,
                                 cfg_cache_interval=4,
                                 deep_cache_interval=4,
                                 cfg_cache_extrapolate=True),
    "pab244_deep2_cfg4_w2_ex": dict(pab_spatial_interval=2,
                                    pab_temporal_interval=4,
                                    pab_cross_interval=4,
                                    cfg_cache_interval=4,
                                    deep_cache_interval=2,
                                    pab_warmup_steps=2,
                                    cfg_cache_extrapolate=True),
    # temporal/cross pushed to 8 (the slowest-drifting kinds): the lcm-8
    # period's j=4 full-CFG step reuses temporal+cross attention — one
    # extra UNet body vs the shipped schedule
    "pab288_deep4_cfg4_ex": dict(pab_spatial_interval=2,
                                 pab_temporal_interval=8,
                                 pab_cross_interval=8,
                                 cfg_cache_interval=4,
                                 deep_cache_interval=4,
                                 cfg_cache_extrapolate=True),
    # round-5 candidates from the refit cost model (tools/fit_cost_model.py
    # predictions: deep8 4.81, sp4+deep8 4.87, sp4+deep4 4.29 f/s): trunk
    # refresh pushed to every 8th step / spatial reuse pushed to 4
    "pab288_deep8_cfg4_ex": dict(pab_spatial_interval=2,
                                 pab_temporal_interval=8,
                                 pab_cross_interval=8,
                                 cfg_cache_interval=4,
                                 deep_cache_interval=8,
                                 cfg_cache_extrapolate=True),
    "pab288_deep8_cfg4_w2_ex": dict(pab_spatial_interval=2,
                                    pab_temporal_interval=8,
                                    pab_cross_interval=8,
                                    cfg_cache_interval=4,
                                    deep_cache_interval=8,
                                    pab_warmup_steps=2,
                                    cfg_cache_extrapolate=True),
    "pab488_deep4_cfg4_ex": dict(pab_spatial_interval=4,
                                 pab_temporal_interval=8,
                                 pab_cross_interval=8,
                                 cfg_cache_interval=4,
                                 deep_cache_interval=4,
                                 cfg_cache_extrapolate=True),
    "pab488_deep8_cfg4_ex": dict(pab_spatial_interval=4,
                                 pab_temporal_interval=8,
                                 pab_cross_interval=8,
                                 cfg_cache_interval=4,
                                 deep_cache_interval=8,
                                 cfg_cache_extrapolate=True),
    # round-5 trunk-forecast candidates (SampleSpec.deep_cache_extrapolate,
    # "dex"): first-order extrapolation of the trunk cache — attacks the
    # trunk-staleness cliff that rejected the deep-8 schedules (cost model
    # predicts 4.8–4.9 f/s there). Same step classes/compute as the plain
    # deep cache.
    "pab488_deep4dex_cfg4_ex": dict(pab_spatial_interval=4,
                                    pab_temporal_interval=8,
                                    pab_cross_interval=8,
                                    cfg_cache_interval=4,
                                    deep_cache_interval=4,
                                    cfg_cache_extrapolate=True,
                                    deep_cache_extrapolate=True),
    "pab488_deep8dex_cfg4_ex": dict(pab_spatial_interval=4,
                                    pab_temporal_interval=8,
                                    pab_cross_interval=8,
                                    cfg_cache_interval=4,
                                    deep_cache_interval=8,
                                    cfg_cache_extrapolate=True,
                                    deep_cache_extrapolate=True),
    "pab288_deep8dex_cfg4_ex": dict(pab_spatial_interval=2,
                                    pab_temporal_interval=8,
                                    pab_cross_interval=8,
                                    cfg_cache_interval=4,
                                    deep_cache_interval=8,
                                    cfg_cache_extrapolate=True,
                                    deep_cache_extrapolate=True),
    "pab488_deep8dex_cfg4_w2_ex": dict(pab_spatial_interval=4,
                                       pab_temporal_interval=8,
                                       pab_cross_interval=8,
                                       cfg_cache_interval=4,
                                       deep_cache_interval=8,
                                       pab_warmup_steps=2,
                                       cfg_cache_extrapolate=True,
                                       deep_cache_extrapolate=True),
    # round-5 second wave: deep-8 FAILED the cap even with the trunk
    # forecast (rel-l2 0.102–0.125 over seeds 0–2), but deep-4 + dex came
    # in at 0.045–0.059 — 23 % under the shipped pab488 headline at equal
    # compute. Spend that headroom on attention-reuse depth instead
    # (spatial 8; temporal/cross 16): trunk refresh cadence stays at the
    # measured-safe interval 4.
    "pab888_deep4dex_cfg4_ex": dict(pab_spatial_interval=8,
                                    pab_temporal_interval=8,
                                    pab_cross_interval=8,
                                    cfg_cache_interval=4,
                                    deep_cache_interval=4,
                                    cfg_cache_extrapolate=True,
                                    deep_cache_extrapolate=True),
    "pab81616_deep4dex_cfg4_ex": dict(pab_spatial_interval=8,
                                      pab_temporal_interval=16,
                                      pab_cross_interval=16,
                                      cfg_cache_interval=4,
                                      deep_cache_interval=4,
                                      cfg_cache_extrapolate=True,
                                      deep_cache_extrapolate=True),
}


def apply_schedule(spec, name: str):
    """Return ``spec`` with the named schedule's overrides applied."""
    if name not in SCHEDULES:
        raise KeyError(
            f"unknown serving schedule {name!r}; known: {sorted(SCHEDULES)}")
    return spec.replace(**SCHEDULES[name])
