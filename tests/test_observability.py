"""Tests for logging, profiling harnesses, and the flow tools CLI."""

import json
import logging

import numpy as np
import jax.numpy as jnp
import pytest

from followyourclick_tpu.utils import logging as fyc_logging
from followyourclick_tpu.utils.profiling import StageTimer, fps_benchmark


class TestLogging:
    def test_get_logger_namespacing(self):
        log = fyc_logging.get_logger("models.unet3d")
        assert log.name == "followyourclick_tpu.models.unet3d"
        assert fyc_logging.get_logger().name == "followyourclick_tpu"

    def test_verbosity_roundtrip(self):
        fyc_logging.set_verbosity_debug()
        assert fyc_logging.get_verbosity() == logging.DEBUG
        fyc_logging.set_verbosity_warning()
        assert fyc_logging.get_verbosity() == logging.WARNING

    def test_env_verbosity(self, monkeypatch):
        assert fyc_logging.log_levels["info"] == logging.INFO

    def test_zero_rank_log(self, caplog):
        fyc_logging.set_verbosity_info()
        log = fyc_logging.get_logger("test")
        root = logging.getLogger("followyourclick_tpu")
        root.propagate = True  # the library handler is stderr-only
        try:
            with caplog.at_level(logging.INFO, logger=log.name):
                fyc_logging.zero_rank_log(log, "hello-from-rank-0")
        finally:
            root.propagate = False
            fyc_logging.set_verbosity_warning()
        assert any("hello-from-rank-0" in r.message for r in caplog.records)


class TestProfiling:
    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        with t.stage("b", sync=jnp.ones(4)):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2
        assert s["b"]["count"] == 1
        assert s["a"]["total_s"] >= 0

    def test_fps_benchmark(self):
        calls = []

        def fn(x):
            calls.append(x)
            return jnp.asarray(x)

        fps = fps_benchmark(fn, iter(range(100)), warmup=2, max_iter=10,
                            log=None)
        assert fps > 0
        assert len(calls) == 12  # 2 warmup + 10 timed


class TestFlowToolsCLI:
    def test_benchmark_subcommand(self, tmp_path, capsys):
        import yaml

        from followyourclick_tpu.cli.flow_tools import main

        cfg = {"model": {"type": "FlowNetS"}}
        p = tmp_path / "cfg.yaml"
        p.write_text(yaml.safe_dump(cfg))
        main(["benchmark", "--config", str(p), "--size", "64", "64",
              "--warmup", "1", "--max-iter", "2"])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        rec = json.loads(out)
        assert rec["fps"] > 0

    def test_train_and_test_subcommands(self, tmp_path, capsys):
        import cv2
        import yaml

        from followyourclick_tpu.cli.flow_tools import main
        from followyourclick_tpu.flow import flow_io

        # tiny FlyingChairs fixture
        data = tmp_path / "chairs"
        data.mkdir()
        rs = np.random.RandomState(0)
        for i in range(2):
            img = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(data / f"{i:05d}_img1.ppm"), img[..., ::-1])
            cv2.imwrite(str(data / f"{i:05d}_img2.ppm"), img[..., ::-1])
            flow_io.write_flow(np.zeros((64, 64, 2), np.float32),
                               data / f"{i:05d}_flow.flo")

        cfg = {
            "model": {"type": "RAFT", "decoder": {"iters": 2}},
            "train": {"total_steps": 2, "checkpoint_every": 2, "iters": 2,
                      "lr": 1e-4},
        }
        p = tmp_path / "cfg.yaml"
        p.write_text(yaml.safe_dump(cfg))
        wd = tmp_path / "wd"
        main(["train", "--config", str(p), "--data-root", str(data),
              "--work-dir", str(wd), "--max-steps", "2",
              "--batch-size", "1", "--crop", "64", "64"])
        ckpts = list(wd.glob("iter_*.pkl"))
        assert ckpts, "training must checkpoint"

        main(["test", "--config", str(p), "--checkpoint", str(ckpts[0]),
              "--data-root", str(data), "--dataset", "FlyingChairs",
              "--iters", "2"])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        rec = json.loads(out)
        assert "EPE" in rec and np.isfinite(rec["EPE"])
