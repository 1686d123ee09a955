"""bench.py output protocol — the driver evidence pipeline.

Round-2 postmortem (VERDICT.md): the harness measured four configs serially
and printed a single JSON line at the very end, so a driver timeout (rc=124)
recorded NO perf number despite the exact headline having been measured.
These tests pin the fixed protocol WITHOUT running any real pipeline:

  1. the exact-config headline JSON line is printed/flushed BEFORE any
     opt-in variant is measured;
  2. every emitted line is parseable; consumers take the LAST line;
  3. opt-in variants respect the wall-clock budget and record skips;
  4. the compile-heavy stacked variant is excluded unless FYC_BENCH_FULL=1;
  5. an opt-in failure downgrades to a skip, never kills the headline.
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
        return 1.0 / (len(calls)), 0.0  # distinct, finite timings

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
    assert not any(k.startswith("optin_cfg") for k in lines[0])
    # the FIRST time_spec call is the exact spec (no caching/PAB intervals)
    first = calls[0]
    assert first.cfg_cache_interval == 1
    assert first.pab_spatial_interval == 1
    # last line carries the opt-in results and stays driver-parseable
    last = lines[-1]
    assert "optin_cfg_cache3_fps" in last
    assert "optin_pab244_cfg4_fps" in last  # the round-3 composed schedule
    # the round-4 DeepCache ∘ PAB ∘ extrapolated-cache lines, incl. the
    # best serving schedule (temporal/cross reuse pushed to 8)
    assert "optin_pab244_deep4_cfg4_ex_fps" in last
    assert "optin_pab288_deep4_cfg4_ex_fps" in last
    # the uniform PAB variants are FYC_BENCH_FULL-only, recorded one skip
    # entry per variant key (ADVICE r03)
    assert any(s.startswith("pab_222 ") for s in last["optin_skipped"])
    assert any(s.startswith("pab2_cfg4 ") for s in last["optin_skipped"])
    assert last["value"] == lines[0]["value"]


def test_stacked_variant_gated_behind_full_flag(fake_bench, capsys,
                                                monkeypatch):
    bench, calls = fake_bench
    monkeypatch.delenv("FYC_BENCH_FULL", raising=False)
    bench.main()
    last = _lines(capsys)[-1]
    assert "optin_pab2_cfg4_fps" not in last
    assert any("pab2_cfg4" in s for s in last["optin_skipped"])

    calls.clear()
    monkeypatch.setenv("FYC_BENCH_FULL", "1")
    bench.main()
    last = _lines(capsys)[-1]
    assert "optin_pab2_cfg4_fps" in last


def test_budget_exhaustion_skips_variants_but_keeps_headline(
        fake_bench, capsys, monkeypatch):
    bench, _ = fake_bench
    monkeypatch.setenv("FYC_BENCH_BUDGET_S", "-1")  # already over budget
    bench.main()
    lines = _lines(capsys)
    assert lines[0]["value"] > 0  # headline still measured + printed
    last = lines[-1]
    assert "optin_cfg_cache3_fps" not in last
    skipped = " ".join(last["optin_skipped"])
    assert "cfg_cache3" in skipped and "pab244_cfg4" in skipped


def test_optin_failure_downgrades_to_skip(fake_bench, capsys, monkeypatch):
    bench, calls = fake_bench

    real_time_spec = bench.time_spec

    def flaky(pipe, spec, b, n_iters):
        if spec.cfg_cache_interval == 3:
            raise RuntimeError("simulated relay loss")
        return real_time_spec(pipe, spec, b, n_iters)

    monkeypatch.setattr(bench, "time_spec", flaky)
    bench.main()
    lines = _lines(capsys)
    last = lines[-1]
    assert lines[0]["value"] > 0
    assert any("cfg_cache3" in s for s in last["optin_skipped"])
    assert "optin_pab244_cfg4_fps" in last  # later variants still ran
