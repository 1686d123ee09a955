"""bench.py output protocol — the driver evidence pipeline.

Round-2 postmortem (VERDICT.md): the harness measured four configs serially
and printed a single JSON line at the very end, so a driver timeout (rc=124)
recorded NO perf number despite the exact headline having been measured.
Round-4 postmortem: the variant ORDER spent the budget on two dominated
lines and skipped the flagship serving schedules. These tests pin the fixed
protocol WITHOUT running any real pipeline:

  1. the exact-config headline JSON line is printed/flushed BEFORE any
     opt-in variant is measured;
  2. every emitted line is parseable; consumers take the LAST line;
  3. the two flagship serving lines (pab288/pab244 ∘ deep4 ∘ cfg4_ex) run
     FIRST among opt-ins, best first — a budget cut can no longer drop the
     round's headline serving number (VERDICT r04 weak #1);
  4. dominated round-over-round comparability lines (cfg_cache3,
     pab244_cfg4), the uniform PAB variants, and the reference-default
     100-step operating point are FYC_BENCH_FULL=1 only;
  5. opt-in variants respect the wall-clock budget and record skips;
  6. an opt-in failure downgrades to a skip, never kills the headline;
  7. per-variant compile/elapsed seconds are recorded so budget tuning is
     data-driven.
"""

import json

import pytest


@pytest.fixture
def fake_bench(monkeypatch):
    """Import bench with the expensive seams stubbed out."""
    import bench

    calls = []

    def fake_build_pipeline(dtype):
        class P:
            pass
        return P()

    def fake_time_spec(pipe, spec, b, n_iters):
        calls.append(spec)
        return 1.0 / (len(calls)), 0.0, 0.5  # distinct, finite timings

    monkeypatch.setattr(bench, "build_pipeline", fake_build_pipeline)
    monkeypatch.setattr(bench, "time_spec", fake_time_spec)
    return bench, calls


def _lines(capsys):
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    return [json.loads(ln) for ln in out if not ln.startswith("#")]


def test_headline_emitted_first_and_every_line_parseable(
        fake_bench, capsys, monkeypatch):
    bench, calls = fake_bench
    monkeypatch.delenv("FYC_BENCH_FULL", raising=False)
    bench.main()
    lines = _lines(capsys)
    assert len(lines) >= 3  # headline + one emit per completed variant
    # first line: the exact headline, before any opt-in fields exist
    assert lines[0]["metric"].startswith("frames_per_sec_per_chip")
    assert lines[0]["value"] > 0
    assert not any(k.startswith("optin_pab") for k in lines[0])
    # the FIRST time_spec call is the exact spec (no caching/PAB intervals)
    first = calls[0]
    assert first.cfg_cache_interval == 1
    assert first.pab_spatial_interval == 1
    # last line carries the opt-in results and stays driver-parseable
    last = lines[-1]
    assert "optin_pab488_deep4_cfg4_ex_fps" in last
    assert "optin_pab288_deep4_cfg4_ex_fps" in last
    assert "optin_pab244_deep4_cfg4_ex_fps" in last
    # dominated + FULL-only lines each record one skip entry
    skipped = last["optin_skipped"]
    for key in ("cfg_cache3", "pab244_cfg4", "pab_222", "pab2_cfg4",
                "ref_default_100step"):
        assert any(s.startswith(key + " ") for s in skipped), key
    assert last["value"] == lines[0]["value"]


def test_flagship_serving_lines_run_first_best_first(fake_bench, capsys,
                                                     monkeypatch):
    """VERDICT r04 weak #1: budget order must equal value order."""
    bench, calls = fake_bench
    monkeypatch.delenv("FYC_BENCH_FULL", raising=False)
    bench.main()
    # call 0 = exact headline; call 1 = pab488 (round-5 best, 4.505 f/s);
    # call 2 = pab288 (round-4 best); call 3 = pab244_deep
    assert calls[1].pab_spatial_interval == 4
    assert calls[1].pab_temporal_interval == 8
    assert calls[1].deep_cache_interval == 4
    assert calls[1].cfg_cache_extrapolate
    assert calls[2].pab_spatial_interval == 2
    assert calls[2].pab_temporal_interval == 8
    assert calls[3].pab_temporal_interval == 4
    assert calls[3].deep_cache_interval == 4


def test_dominated_and_ref_default_gated_behind_full_flag(
        fake_bench, capsys, monkeypatch):
    bench, calls = fake_bench
    monkeypatch.delenv("FYC_BENCH_FULL", raising=False)
    bench.main()
    last = _lines(capsys)[-1]
    assert "optin_cfg_cache3_fps" not in last
    assert "optin_ref_default_100step_fps" not in last

    calls.clear()
    monkeypatch.setenv("FYC_BENCH_FULL", "1")
    bench.main()
    last = _lines(capsys)[-1]
    for key in ("cfg_cache3", "pab244_cfg4", "pab_222", "pab2_cfg4",
                "ref_default_100step"):
        assert f"optin_{key}_fps" in last, key
    # the reference-default line runs at its own operating point
    ref_calls = [s for s in calls if s.num_inference_steps == 100]
    assert len(ref_calls) == 1
    assert ref_calls[0].cfg_cache_interval == 1  # exact math


def test_budget_exhaustion_skips_variants_but_keeps_headline(
        fake_bench, capsys, monkeypatch):
    bench, _ = fake_bench
    monkeypatch.setenv("FYC_BENCH_BUDGET_S", "-1")  # already over budget
    monkeypatch.delenv("FYC_BENCH_FULL", raising=False)
    bench.main()
    lines = _lines(capsys)
    assert lines[0]["value"] > 0  # headline still measured + printed
    last = lines[-1]
    assert "optin_pab288_deep4_cfg4_ex_fps" not in last
    skipped = " ".join(last["optin_skipped"])
    assert "pab288_deep4_cfg4_ex" in skipped
    assert "pab244_deep4_cfg4_ex" in skipped


def test_optin_failure_downgrades_to_skip(fake_bench, capsys, monkeypatch):
    bench, calls = fake_bench

    real_time_spec = bench.time_spec

    def flaky(pipe, spec, b, n_iters):
        if spec.pab_temporal_interval == 8:
            raise RuntimeError("simulated relay loss")
        return real_time_spec(pipe, spec, b, n_iters)

    monkeypatch.setattr(bench, "time_spec", flaky)
    monkeypatch.delenv("FYC_BENCH_FULL", raising=False)
    bench.main()
    lines = _lines(capsys)
    last = lines[-1]
    assert lines[0]["value"] > 0
    assert any("pab288_deep4_cfg4_ex" in s for s in last["optin_skipped"])
    assert "optin_pab244_deep4_cfg4_ex_fps" in last  # later variants ran


def test_per_variant_cost_telemetry(fake_bench, capsys, monkeypatch):
    bench, _ = fake_bench
    monkeypatch.delenv("FYC_BENCH_FULL", raising=False)
    bench.main()
    last = _lines(capsys)[-1]
    assert "headline_compile_s" in last
    for key in ("pab288_deep4_cfg4_ex", "pab244_deep4_cfg4_ex"):
        assert f"optin_{key}_compile_s" in last
        assert f"optin_{key}_elapsed_s" in last
