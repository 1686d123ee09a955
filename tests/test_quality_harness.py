"""Schedule simulator + cost model (utils/quality.py) — pure-Python fast
tests pinning the step-class accounting that the serving sweep ranks
schedules by. The simulator must mirror _denoise_pab's static schedule
(warmup → full periods → period-prefix tail → trailing exact steps)."""

from followyourclick_tpu.pipelines.animation import SampleSpec
from followyourclick_tpu.utils.quality import (
    estimate_fps,
    schedule_step_classes,
)


def spec(**kw):
    return SampleSpec(video_length=16, height=512, width=512,
                      num_inference_steps=25, guidance_scale=8.0, **kw)


def test_exact_schedule_all_full():
    assert schedule_step_classes(spec()) == {
        "full": 25, "half_exact": 0, "half_sp": 0, "half_all": 0}


def test_plain_cfg_cache_counts():
    c = schedule_step_classes(spec(cfg_cache_interval=3))
    # i % 3 == 0 → 9 steps (0..24), plus i >= 23 (i=23; 24 ≡ 0 already)
    assert c == {"full": 10, "half_exact": 15, "half_sp": 0, "half_all": 0}


def test_pab244_cfg4_counts():
    c = schedule_step_classes(spec(
        pab_spatial_interval=2, pab_temporal_interval=4,
        pab_cross_interval=4, cfg_cache_interval=4))
    # period 4, warmup 0, final 2 exact, body 23 → 5 periods + tail 3
    # periods: j=0 full, j=2 half_sp, j∈{1,3} half_all
    # tail (j=0,1,2): full, half_all, half_sp ; final: 2 full
    assert c["full"] == 5 + 1 + 2
    assert c["half_sp"] == 5 + 1
    assert c["half_all"] == 10 + 1
    assert sum(c.values()) == 25


def test_pab366_cfg6_w2_counts():
    c = schedule_step_classes(spec(
        pab_spatial_interval=3, pab_temporal_interval=6,
        pab_cross_interval=6, cfg_cache_interval=6, pab_warmup_steps=2))
    # warmup 2 full, final 2 full, body 21 → 3 periods (18) + tail 3
    # period: j=0 full, j=3 half_sp, j∈{1,2,4,5} half_all
    # tail j=0,1,2: full, half_all, half_all
    assert c["full"] == 2 + 3 + 1 + 2
    assert c["half_sp"] == 3
    assert c["half_all"] == 12 + 2
    assert sum(c.values()) == 25


def test_final_exact_knob():
    base = dict(pab_spatial_interval=3, pab_temporal_interval=6,
                pab_cross_interval=6, cfg_cache_interval=6,
                pab_warmup_steps=2)
    c2 = schedule_step_classes(spec(**base))
    c1 = schedule_step_classes(spec(**base, cfg_final_exact_steps=1))
    # one fewer trailing exact step -> one more body step
    assert sum(c1.values()) == sum(c2.values()) == 25
    assert c1["full"] <= c2["full"]


def test_estimated_fps_ordering():
    exact = spec()
    cheap = spec(pab_spatial_interval=3, pab_temporal_interval=6,
                 pab_cross_interval=6, cfg_cache_interval=6)
    mid = spec(pab_spatial_interval=2, pab_temporal_interval=4,
               pab_cross_interval=4, cfg_cache_interval=4)
    assert estimate_fps(exact) < estimate_fps(mid) < estimate_fps(cheap)
    # the model should land near the measured BENCH_r03 numbers
    assert 1.5 < estimate_fps(exact) < 2.3          # measured 1.91
    assert 2.5 < estimate_fps(mid) < 3.4            # measured 2.97


def test_per_kind_reuse_depth_resolved():
    """Round-5 refit (VERDICT r04 weak #5): the model must distinguish
    pab288 from pab244 (the old per-class model predicted zero gain; the
    chip gave +3 %). pab288's lcm-8 schedule turns the j≡4 (mod 8)
    full-CFG steps into full_tcr steps (temporal/cross reused), which the
    structural model prices 2·tc_ms cheaper each."""
    from followyourclick_tpu.utils.quality import estimate_clip_seconds

    base = dict(pab_spatial_interval=2, cfg_cache_interval=4,
                deep_cache_interval=4)
    s244 = spec(**base, pab_temporal_interval=4, pab_cross_interval=4)
    s288 = spec(**base, pab_temporal_interval=8, pab_cross_interval=8)
    c244 = schedule_step_classes(s244)
    c288 = schedule_step_classes(s288)
    assert "full_tcr" not in c244
    assert c288["full_tcr"] == 3  # j=4 of 3 full lcm-8 periods in 25 steps
    gain_ms = (estimate_clip_seconds(s244) - estimate_clip_seconds(s288)) * 1e3
    # measured gap: 3.896 - 3.779 = 117 ms; model must land near it
    assert 80 < gain_ms < 160, gain_ms


def test_model_matches_measured_p50s():
    """The fitted primitives must reproduce the measured flagship p50s
    within 1 % (tools/fit_cost_model.py residuals; docs/PERF.md)."""
    from followyourclick_tpu.utils.quality import estimate_clip_seconds

    measured = {
        (): 8.382,
        ("cfg3",): 5.965,
        ("pab244", "cfg4"): 4.946,
        ("pab288", "deep4", "cfg4"): 3.779,
    }
    kw_map = {
        (): {},
        ("cfg3",): dict(cfg_cache_interval=3),
        ("pab244", "cfg4"): dict(pab_spatial_interval=2,
                                 pab_temporal_interval=4,
                                 pab_cross_interval=4, cfg_cache_interval=4),
        ("pab288", "deep4", "cfg4"): dict(
            pab_spatial_interval=2, pab_temporal_interval=8,
            pab_cross_interval=8, cfg_cache_interval=4,
            deep_cache_interval=4),
    }
    for key, p50 in measured.items():
        pred = estimate_clip_seconds(spec(**kw_map[key]))
        assert abs(pred - p50) / p50 < 0.01, (key, pred, p50)


def test_deep_cache_counts():
    """DeepCache trunk reuse (deep_cache_interval) step classes: aligned
    with the shipped pab244∘cfg4 composition, deep=2 turns the j∈{1,3}
    half_all steps into half_all_deep and j=2 stays half_sp (trunk
    refreshes on even phases)."""
    c = schedule_step_classes(spec(
        pab_spatial_interval=2, pab_temporal_interval=4,
        pab_cross_interval=4, cfg_cache_interval=4, deep_cache_interval=2))
    assert c["full"] == 8 and c["half_sp"] == 6
    assert c["half_all"] == 0 and c["half_all_deep"] == 11
    assert sum(c.values()) == 25
    # deep=4: the j=2 spatial-refresh step also reuses the trunk
    c4 = schedule_step_classes(spec(
        pab_spatial_interval=2, pab_temporal_interval=4,
        pab_cross_interval=4, cfg_cache_interval=4, deep_cache_interval=4))
    assert c4["half_sp"] == 0 and c4["half_sp_deep"] == 6
    # deep steps are modeled cheaper
    assert estimate_fps(spec(pab_spatial_interval=2, pab_temporal_interval=4,
                             pab_cross_interval=4, cfg_cache_interval=4,
                             deep_cache_interval=4)) > estimate_fps(
        spec(pab_spatial_interval=2, pab_temporal_interval=4,
             pab_cross_interval=4, cfg_cache_interval=4))
