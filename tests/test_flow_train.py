"""Flow training / dataset / registry tests with tiny synthesized fixtures
(the mmflow hermetic-fixture pattern, SURVEY.md §4)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

from followyourclick_tpu.flow import flow_io
from followyourclick_tpu.flow.datasets import (
    FlyingChairs,
    KITTI,
    Sintel,
    photometric_jitter,
    random_crop,
    random_flip,
    FlowSample,
    training_batches,
)
from followyourclick_tpu.flow.raft import RAFTConfig
from followyourclick_tpu.flow.registry import build_flow_estimator
from followyourclick_tpu.flow.train import (
    FlowTrainConfig,
    find_latest_checkpoint,
    make_optimizer,
    onecycle_linear,
    train_model,
)
from followyourclick_tpu.flow.api import init_model


def _write_ppm(path, img):
    import cv2

    cv2.imwrite(str(path), img[..., ::-1])


@pytest.fixture()
def chairs_dir(tmp_path):
    rs = np.random.RandomState(0)
    for i in range(3):
        img = (rs.rand(40, 48, 3) * 255).astype(np.uint8)
        _write_ppm(tmp_path / f"{i:05d}_img1.ppm", img)
        _write_ppm(tmp_path / f"{i:05d}_img2.ppm", img)
        flow_io.write_flow(
            rs.randn(40, 48, 2).astype(np.float32), tmp_path / f"{i:05d}_flow.flo"
        )
    return tmp_path


class TestDatasets:
    def test_flying_chairs(self, chairs_dir):
        ds = FlyingChairs(str(chairs_dir))
        assert len(ds) == 3
        s = ds[0]
        assert s.img1.shape == (40, 48, 3)
        assert s.flow_gt.shape == (40, 48, 2)
        assert s.valid.min() == 1.0

    def test_flying_chairs_split(self, chairs_dir):
        split = chairs_dir / "split.txt"
        split.write_text("1\n2\n1\n")
        assert len(FlyingChairs(str(chairs_dir), str(split))) == 2
        assert len(FlyingChairs(str(chairs_dir), str(split),
                                test_mode=True)) == 1

    def test_sintel(self, tmp_path):
        import cv2

        rs = np.random.RandomState(1)
        (tmp_path / "clean" / "alley_1").mkdir(parents=True)
        (tmp_path / "flow" / "alley_1").mkdir(parents=True)
        for i in range(3):
            img = (rs.rand(32, 32, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(tmp_path / "clean/alley_1" / f"frame_{i:04d}.png"),
                        img)
        for i in range(2):
            flow_io.write_flow(
                rs.randn(32, 32, 2).astype(np.float32),
                tmp_path / "flow/alley_1" / f"frame_{i:04d}.flo",
            )
        ds = Sintel(str(tmp_path), "clean")
        assert len(ds) == 2
        assert ds[0].flow_gt.shape == (32, 32, 2)

    def test_kitti(self, tmp_path):
        import cv2

        rs = np.random.RandomState(2)
        (tmp_path / "image_2").mkdir()
        (tmp_path / "flow_occ").mkdir()
        img = (rs.rand(24, 24, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "image_2" / "000000_10.png"), img)
        cv2.imwrite(str(tmp_path / "image_2" / "000000_11.png"), img)
        flow = rs.randn(24, 24, 2).astype(np.float32) * 5
        png = flow_io.flow_to_kitti_png(flow, np.ones((24, 24)))
        cv2.imwrite(str(tmp_path / "flow_occ" / "000000_10.png"),
                    png[..., ::-1])
        ds = KITTI(str(tmp_path))
        assert len(ds) == 1
        s = ds[0]
        np.testing.assert_allclose(s.flow_gt, flow, atol=1 / 64.0)

    def test_transforms(self):
        rs = np.random.RandomState(3)
        s = FlowSample(
            (rs.rand(20, 30, 3) * 255).astype(np.uint8),
            (rs.rand(20, 30, 3) * 255).astype(np.uint8),
            rs.randn(20, 30, 2).astype(np.float32),
            np.ones((20, 30), np.float32),
        )
        c = random_crop(s, (16, 16), rs)
        assert c.img1.shape == (16, 16, 3)
        f = random_flip(c, rs, p_h=1.0, p_v=1.0)
        # double flip of u/v sign convention: flipping horizontally negates u
        np.testing.assert_allclose(
            f.flow_gt[::-1, ::-1] * [-1, -1], c.flow_gt, atol=1e-6
        )
        j = photometric_jitter(c, rs)
        assert j.img1.dtype == np.uint8

    def test_training_batches(self, chairs_dir):
        ds = FlyingChairs(str(chairs_dir))
        it = training_batches(ds, batch_size=2, crop_size=(32, 32), seed=0)
        batch = next(it)
        assert batch["img1"].shape == (2, 32, 32, 3)
        assert batch["flow_gt"].shape == (2, 32, 32, 2)


class TestRegistry:
    def test_build_raft_from_config(self):
        model = build_flow_estimator(
            {"type": "RAFT", "num_levels": 4, "radius": 4,
             "decoder": {"iters": 3}}
        )
        assert model.config.iters == 3
        with pytest.raises(KeyError):
            build_flow_estimator({"type": "nope"})


class TestTraining:
    def test_schedule_shape(self):
        cfg = FlowTrainConfig(total_steps=100, pct_start=0.1, lr=1e-3)
        sched = onecycle_linear(cfg)
        assert float(sched(10)) == pytest.approx(1e-3, rel=1e-5)
        assert float(sched(100)) == pytest.approx(0.0, abs=1e-8)
        assert float(sched(0)) < 1e-3

    def test_train_reduces_loss_and_checkpoints(self, tmp_path):
        cfg = RAFTConfig(iters=2, feat_channels=32, h_channels=32,
                         cxt_channels=32, stem_channels=16,
                         base_channels=(16, 16, 32))
        model, variables = init_model(cfg, image_size=(64, 64))
        tcfg = FlowTrainConfig(
            lr=1e-3, total_steps=6, pct_start=0.2, checkpoint_every=3,
            iters=2,
        )
        rs = np.random.RandomState(0)
        img = (rs.rand(2, 64, 64, 3) * 255).astype(np.float32)
        batch = {
            "img1": img, "img2": img,
            "flow_gt": np.zeros((2, 64, 64, 2), np.float32),
            "valid": np.ones((2, 64, 64), np.float32),
        }
        losses = []

        def log(step, metrics):
            losses.append(metrics["loss"])

        out = train_model(
            model, variables, iter(lambda: batch, None), tcfg,
            work_dir=str(tmp_path), max_steps=6, log_fn=log,
        )
        assert len(losses) == 6
        assert losses[-1] < losses[0]  # identical-frame batch → flow → 0
        ckpt = find_latest_checkpoint(str(tmp_path))
        assert ckpt is not None and ckpt.endswith("iter_6.pkl")
        # resume picks up from the checkpoint
        losses2 = []
        train_model(
            model, out, iter(lambda: batch, None), tcfg,
            work_dir=str(tmp_path), max_steps=8,
            log_fn=lambda s, m: losses2.append(s),
        )
        assert losses2 and losses2[0] == 6

    def test_optimizer_builds(self):
        import jax.numpy as jnp

        opt = make_optimizer(FlowTrainConfig(total_steps=10))
        params = {"w": jnp.ones((3,))}
        state = opt.init(params)
        updates, _ = opt.update({"w": jnp.ones((3,))}, state, params)
        assert updates["w"].shape == (3,)


class TestSchedulesAndMixing:
    def test_multistage_lr(self):
        from followyourclick_tpu.flow.train import multistage_lr

        sched = multistage_lr(
            milestone_lrs=[1e-3, 1e-4],
            milestone_iters=[0, 100],
            steps=[[50, 80], [150]],
            gammas=[0.5, 0.1],
        )
        assert float(sched(0)) == pytest.approx(1e-3)
        assert float(sched(60)) == pytest.approx(5e-4)
        assert float(sched(90)) == pytest.approx(2.5e-4)
        assert float(sched(100)) == pytest.approx(1e-4)
        assert float(sched(200)) == pytest.approx(1e-5)

    def test_mixed_training_batches(self, chairs_dir):
        from followyourclick_tpu.flow.train import mixed_training_batches

        ds = FlyingChairs(str(chairs_dir))
        it = mixed_training_batches([ds, ds], [0.5, 0.5], batch_size=4,
                                    crop_size=(32, 32))
        batch = next(it)
        assert batch["img1"].shape == (4, 32, 32, 3)

    def test_evaluate(self, chairs_dir):
        from followyourclick_tpu.flow.api import init_model
        from followyourclick_tpu.flow.train import evaluate

        ds = FlyingChairs(str(chairs_dir))
        cfg = RAFTConfig(iters=2, feat_channels=32, h_channels=32,
                         cxt_channels=32, stem_channels=16,
                         base_channels=(16, 16, 32))
        model, variables = init_model(cfg, image_size=(40, 48))
        out = evaluate(model, variables, ds, iters=2)
        assert "EPE" in out and np.isfinite(out["EPE"])

    def test_evaluate_sharded_matches_single_process(self, chairs_dir):
        """The multi_gpu_test/DistEvalHook equivalent: device-batched
        evaluation over the 8-device CPU mesh (3 samples → pad to 8, pad
        rows masked) reduces to the same metrics as the serial path."""
        from followyourclick_tpu.flow.api import init_model
        from followyourclick_tpu.flow.train import evaluate, evaluate_sharded
        from followyourclick_tpu.parallel.mesh import create_mesh

        ds = FlyingChairs(str(chairs_dir))
        cfg = RAFTConfig(iters=2, feat_channels=32, h_channels=32,
                         cxt_channels=32, stem_channels=16,
                         base_channels=(16, 16, 32))
        model, variables = init_model(cfg, image_size=(40, 48))
        serial = evaluate(model, variables, ds, iters=2, metrics=("EPE",))
        mesh = create_mesh(data=8, model=1)
        sharded = evaluate_sharded(model, variables, ds, mesh=mesh, iters=2,
                                   metrics=("EPE", "Fl"))
        assert sharded["EPE"] == pytest.approx(serial["EPE"], rel=1e-5)
        assert 0.0 <= sharded["Fl"] <= 100.0

    def test_train_model_dist_eval_hook(self, chairs_dir, tmp_path):
        """eval_every fires the DistEvalHook role inside the runner loop and
        reports val/ metrics through log_fn."""
        from followyourclick_tpu.flow.api import init_model
        from followyourclick_tpu.flow.datasets import training_batches
        from followyourclick_tpu.flow.train import (
            FlowTrainConfig,
            train_model,
        )

        ds = FlyingChairs(str(chairs_dir))
        cfg = RAFTConfig(iters=2, feat_channels=32, h_channels=32,
                         cxt_channels=32, stem_channels=16,
                         base_channels=(16, 16, 32))
        model, variables = init_model(cfg, image_size=(32, 32))
        logs = []
        train_model(
            model, variables,
            training_batches(ds, 1, crop_size=(32, 32), seed=0),
            FlowTrainConfig(iters=2, total_steps=2, checkpoint_every=100),
            work_dir=str(tmp_path), resume=False,
            log_fn=lambda step, m: logs.append((step, m)),
            eval_dataset=ds, eval_every=2)
        val_logs = [m for _, m in logs if any(k.startswith("val/") for k in m)]
        assert val_logs and np.isfinite(val_logs[-1]["val/EPE"])
