"""Flow-stack tests, mirroring the reference's mmflow test strategy
(SURVEY.md §4): analytic op invariants (zero flow ⇒ identity warp —
reference mmflow/tests/test_op/test_warp.py:7-21), shape-level model tests
with random tensors, loss positivity, and hermetic IO round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # oracle/compile-heavy (deselect via -m 'not slow')

from followyourclick_tpu.flow import (
    RAFT,
    RAFTConfig,
    bilinear_sample,
    compute_motion_score,
    coords_grid,
    corr_lookup,
    correlation_pyramid,
    end_point_error,
    eval_metrics,
    flow_warp,
    inference_model,
    init_model,
    multi_level_charbonnier_loss,
    multi_level_epe_loss,
    optical_flow_outliers,
    sequence_loss,
)
from followyourclick_tpu.flow import flow_io
from followyourclick_tpu.flow.ops import convex_upsample, resize_flow, upflow8


class TestOps:
    def test_zero_flow_identity_warp(self, rng):
        feat = jax.random.normal(rng, (2, 10, 10, 3))
        flow = jnp.zeros((2, 10, 10, 2))
        out = flow_warp(feat, flow)
        np.testing.assert_allclose(out, feat, atol=1e-5)

    def test_integer_shift_warp(self, rng):
        feat = jax.random.normal(rng, (1, 8, 8, 2))
        # flow (+1, 0): output(p) = feat(p_x + 1, p_y)
        flow = jnp.zeros((1, 8, 8, 2)).at[..., 0].set(1.0)
        out = flow_warp(feat, flow)
        np.testing.assert_allclose(out[:, :, :-1], feat[:, :, 1:], atol=1e-5)
        # out-of-range samples are zero-padded
        np.testing.assert_allclose(out[:, :, -1], 0.0, atol=1e-6)

    def test_bilinear_sample_align_corners_roundtrip(self, rng):
        feat = jax.random.normal(rng, (1, 6, 7, 4))
        grid = coords_grid(1, 6, 7)
        out = bilinear_sample(feat, grid, align_corners=True, scale=True)
        np.testing.assert_allclose(out, feat, atol=1e-5)

    def test_correlation_pyramid_shapes_and_self_corr(self, rng):
        feat = jax.random.normal(rng, (2, 8, 8, 16))
        pyr = correlation_pyramid(feat, feat, num_levels=4)
        assert [p.shape for p in pyr] == [
            (2, 8, 8, 8, 8), (2, 8, 8, 4, 4), (2, 8, 8, 2, 2), (2, 8, 8, 1, 1)
        ]
        # self-correlation at zero displacement = |f|^2/sqrt(C) — the max
        # along the target axes for a dominant-diagonal feature map
        lvl0 = np.asarray(pyr[0])
        h = w = 8
        for y in range(h):
            for x in range(w):
                expect = np.dot(feat[0, y, x], feat[0, y, x]) / 4.0
                np.testing.assert_allclose(lvl0[0, y, x, y, x], expect, rtol=1e-4)

    def test_corr_lookup_shape(self, rng):
        k1, k2 = jax.random.split(rng)
        f1 = jax.random.normal(k1, (1, 8, 8, 16))
        f2 = jax.random.normal(k2, (1, 8, 8, 16))
        pyr = correlation_pyramid(f1, f2, num_levels=4)
        out = corr_lookup(pyr, jnp.zeros((1, 8, 8, 2)), radius=4)
        assert out.shape == (1, 8, 8, 4 * 81)

    def test_corr_lookup_zero_flow_centre(self, rng):
        """With zero flow, the centre tap of the level-0 window must equal
        the raw correlation at zero displacement."""
        f = jax.random.normal(rng, (1, 8, 8, 8))
        pyr = correlation_pyramid(f, f, num_levels=1)
        r = 4
        out = corr_lookup(pyr, jnp.zeros((1, 8, 8, 2)), radius=r)
        centre_idx = (2 * r + 1) ** 2 // 2
        centre = np.asarray(out[0, :, :, centre_idx])
        expect = np.asarray(
            [[pyr[0][0, y, x, y, x] for x in range(8)] for y in range(8)]
        )
        np.testing.assert_allclose(centre, expect, atol=1e-4)

    def test_convex_upsample_uniform_mask_constant_flow(self):
        flow = jnp.ones((1, 4, 4, 2)) * 2.0
        mask = jnp.zeros((1, 4, 4, 9 * 64))  # uniform softmax
        up = convex_upsample(flow, mask, scale=8)
        assert up.shape == (1, 32, 32, 2)
        # constant coarse flow upsamples to constant 8x-scaled fine flow
        # away from borders (border taps mix zero padding)
        np.testing.assert_allclose(up[:, 8:-8, 8:-8], 16.0, rtol=1e-5)

    def test_upflow8_and_resize_flow(self):
        flow = jnp.ones((1, 4, 4, 2))
        up = upflow8(flow)
        assert up.shape == (1, 32, 32, 2)
        np.testing.assert_allclose(up, 8.0, rtol=1e-5)
        rs = resize_flow(flow, (8, 8))
        assert rs.shape == (1, 8, 8, 2)
        np.testing.assert_allclose(rs, 2.0, rtol=1e-5)


class TestRAFT:
    @pytest.fixture(scope="class")
    def small_raft(self):
        cfg = RAFTConfig(iters=2, feat_channels=64, mask_channels=16)
        model, variables = init_model(cfg, image_size=(64, 64))
        return model, variables

    def test_forward_shape(self, small_raft, rng):
        model, variables = small_raft
        img = jax.random.uniform(rng, (1, 64, 64, 3)) * 255
        flow = model.apply(variables, img, img, iters=2)
        assert flow.shape == (1, 64, 64, 2)
        assert np.isfinite(np.asarray(flow)).all()

    def test_intermediate_predictions_for_training(self, small_raft, rng):
        model, variables = small_raft
        img = jax.random.uniform(rng, (1, 64, 64, 3))
        ups = model.apply(
            variables, img, img, iters=3, return_intermediate=True
        )
        assert ups.shape == (3, 1, 64, 64, 2)
        gt = jnp.zeros((1, 64, 64, 2))
        loss = sequence_loss(ups, gt)
        assert float(loss) > 0

    def test_inference_model_pads_odd_sizes(self, small_raft, rng):
        model, variables = small_raft
        img = np.random.RandomState(0).rand(60, 52, 3) * 255
        flow = inference_model(model, variables, img, img, iters=2)
        assert flow.shape == (60, 52, 2)

    def test_motion_score_scalar(self, small_raft):
        model, variables = small_raft
        frames = np.random.RandomState(1).rand(4, 64, 64, 3) * 255
        score = compute_motion_score(model, variables, frames, iters=2)
        assert np.isfinite(score) and score >= 0


class TestLosses:
    def test_sequence_loss_zero_for_perfect(self, rng):
        gt = jax.random.normal(rng, (2, 16, 16, 2))
        preds = jnp.broadcast_to(gt[None], (3,) + gt.shape)
        assert float(sequence_loss(preds, gt)) == pytest.approx(0.0, abs=1e-6)

    def test_sequence_loss_weights_later_iters_more(self, rng):
        gt = jnp.zeros((1, 8, 8, 2))
        bad = jnp.ones((1, 8, 8, 2))
        good = jnp.zeros((1, 8, 8, 2))
        # error on LAST iter weighs more than the same error on first
        last_bad = jnp.stack([good, good, bad])
        first_bad = jnp.stack([bad, good, good])
        assert float(sequence_loss(last_bad, gt)) > float(
            sequence_loss(first_bad, gt)
        )

    def test_sequence_loss_max_flow_mask(self):
        gt = jnp.full((1, 4, 4, 2), 1000.0)  # above max_flow=400
        preds = jnp.zeros((1, 1, 4, 4, 2))
        valid = jnp.ones((1, 4, 4))
        assert float(sequence_loss(preds, gt, valid=valid)) == 0.0

    def test_multi_level_losses_positive(self, rng):
        gt = jax.random.normal(rng, (2, 32, 32, 2)) * 5
        preds = {
            "level6": jnp.zeros((2, 4, 4, 2)),
            "level5": jnp.zeros((2, 8, 8, 2)),
            "level4": jnp.zeros((2, 16, 16, 2)),
            "level3": jnp.zeros((2, 32, 32, 2)),
            "level2": jnp.zeros((2, 32, 32, 2)),
        }
        assert float(multi_level_epe_loss(preds, gt)) > 0
        assert float(multi_level_charbonnier_loss(preds, gt)) > 0

    def test_multi_level_epe_perfect_prediction(self, rng):
        gt = jnp.ones((1, 16, 16, 2)) * 20.0
        preds = {"level3": jnp.ones((1, 8, 8, 2))}  # gt/flow_div = 1.0
        loss = multi_level_epe_loss(preds, gt, weights={"level3": 1.0})
        assert float(loss) == pytest.approx(0.0, abs=1e-5)


class TestMetrics:
    def test_epe_known_offset(self):
        gt = [np.zeros((8, 8, 2))]
        pred = [np.full((8, 8, 2), 3.0)]
        valid = [np.ones((8, 8))]
        assert end_point_error(pred, gt, valid) == pytest.approx(
            np.sqrt(18.0), rel=1e-6
        )

    def test_fl_all(self):
        gt = [np.ones((4, 4, 2))]
        pred_in = [np.ones((4, 4, 2))]
        pred_out = [np.ones((4, 4, 2)) * 10]
        valid = [np.ones((4, 4))]
        assert optical_flow_outliers(pred_in, gt, valid) == 0.0
        assert optical_flow_outliers(pred_out, gt, valid) == 100.0

    def test_eval_metrics_dispatch(self):
        gt = [np.zeros((4, 4, 2))]
        pred = [np.zeros((4, 4, 2))]
        valid = [np.ones((4, 4))]
        out = eval_metrics(pred, gt, valid, metrics=["EPE", "Fl"])
        assert set(out) == {"EPE", "Fl"}
        with pytest.raises(KeyError):
            eval_metrics(pred, gt, valid, metrics=["nope"])


class TestFlowIO:
    def test_flo_roundtrip(self, tmp_path):
        flow = np.random.RandomState(0).randn(6, 9, 2).astype(np.float32)
        p = tmp_path / "x.flo"
        flow_io.write_flow(flow, p)
        np.testing.assert_array_equal(flow_io.read_flow(p), flow)

    def test_pfm_roundtrip(self, tmp_path):
        img = np.random.RandomState(0).rand(5, 7).astype(np.float32)
        p = tmp_path / "x.pfm"
        flow_io.write_pfm(img, p)
        data, scale = flow_io.read_pfm(p)
        np.testing.assert_allclose(data, img, rtol=1e-6)
        assert scale == 1.0

    def test_kitti_roundtrip(self):
        flow = np.random.RandomState(0).randn(4, 4, 2).astype(np.float32) * 10
        valid = np.ones((4, 4))
        png = flow_io.flow_to_kitti_png(flow, valid)
        dec, v = flow_io.read_kitti_flow(png)
        np.testing.assert_allclose(dec, flow, atol=1 / 64.0)
        np.testing.assert_array_equal(v, valid)


class TestLocalCorrelation:
    def test_shape_and_centre_value(self, rng):
        from followyourclick_tpu.flow.ops import local_correlation

        f = jax.random.normal(rng, (1, 6, 6, 8))
        corr = local_correlation(f, f, max_displacement=2)
        assert corr.shape == (1, 6, 6, 25)
        centre = np.asarray(corr[0, :, :, 12])
        expect = np.asarray(jnp.sum(f[0] ** 2, axis=-1))
        np.testing.assert_allclose(centre, expect, rtol=1e-5)

    def test_shift_peak(self, rng):
        """Correlating f with f shifted (+1, 0) peaks at the (+1, 0) tap."""
        from followyourclick_tpu.flow.ops import local_correlation

        f = jax.random.normal(rng, (1, 8, 8, 16))
        f2 = jnp.roll(f, shift=-1, axis=2)  # f2[x] = f[x+1]
        corr = local_correlation(f, f2, max_displacement=1)
        # interior pixels: best match at dx=-1 (tap index dy=0,dx=-1 => 3)
        interior = np.asarray(corr[0, 2:-2, 2:-2])
        assert (interior.argmax(axis=-1) == 3).all()


class TestPWCNet:
    def test_forward_levels_and_inference(self, rng):
        from followyourclick_tpu.flow.pwcnet import PWCNet, PWCNetConfig

        cfg = PWCNetConfig(
            pyramid_channels=(8, 16, 16, 16, 16, 16),
            densefeat_channels=(16, 16, 8),
            context_channels=(16, 16, 8),
            context_dilations=(1, 2, 1),
        )
        model = PWCNet(cfg)
        img = jax.random.uniform(rng, (1, 128, 128, 3))
        params = model.init(jax.random.PRNGKey(0), img, img)
        preds = model.apply(params, img, img)
        assert set(preds) == {"level2", "level3", "level4", "level5", "level6"}
        assert preds["level2"].shape == (1, 32, 32, 2)
        assert preds["level6"].shape == (1, 2, 2, 2)
        flow = model.apply(params, img, img, inference=True)
        assert flow.shape == (1, 128, 128, 2)
        assert np.isfinite(np.asarray(flow)).all()

    def test_multilevel_loss_runs(self, rng):
        from followyourclick_tpu.flow.pwcnet import PWCNet, PWCNetConfig

        cfg = PWCNetConfig(
            pyramid_channels=(8, 16, 16, 16, 16, 16),
            densefeat_channels=(16, 8),
            context_channels=(16, 8),
            context_dilations=(1, 1),
        )
        model = PWCNet(cfg)
        img = jax.random.uniform(rng, (2, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), img, img)
        preds = model.apply(params, img, img)
        gt = jax.random.normal(rng, (2, 64, 64, 2)) * 3
        loss = multi_level_epe_loss(preds, gt)
        assert float(loss) > 0

    def test_registry_builds_pwcnet(self):
        from followyourclick_tpu.flow.registry import build_flow_estimator

        model = build_flow_estimator(
            {"type": "PWCNet",
             "decoder": {"flow_div": 20.0,
                         "corr_cfg": {"max_displacement": 4}}}
        )
        assert model.config.max_displacement == 4


class TestFlowNet:
    """Config-driven construction + forward tests, the mmflow
    test_flow_estimator.py pattern."""

    @pytest.mark.parametrize("kind", ["FlowNetS", "FlowNetC"])
    def test_forward_and_loss(self, kind, rng):
        from followyourclick_tpu.flow.registry import build_flow_estimator

        model = build_flow_estimator({"type": kind})
        img = jax.random.uniform(rng, (1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), img, img)
        preds = model.apply(params, img, img)
        assert set(preds) == {"level2", "level3", "level4", "level5",
                              "level6"}
        assert preds["level2"].shape == (1, 16, 16, 2)
        gt = jax.random.normal(rng, (1, 64, 64, 2)) * 3
        assert float(multi_level_epe_loss(preds, gt)) > 0
        flow = model.apply(params, img, img, inference=True)
        assert flow.shape == (1, 64, 64, 2)
        assert np.isfinite(np.asarray(flow)).all()

    def test_dilated_correlation_channels(self, rng):
        from followyourclick_tpu.flow.ops import local_correlation

        f = jax.random.normal(rng, (1, 12, 12, 4))
        corr = local_correlation(f, f, max_displacement=2, dilation_patch=2)
        assert corr.shape == (1, 12, 12, 25)
        # centre tap (zero displacement) unaffected by dilation
        np.testing.assert_allclose(
            np.asarray(corr[0, :, :, 12]),
            np.asarray(jnp.sum(f[0] ** 2, axis=-1)), rtol=1e-5,
        )


class TestGMA:
    def test_gma_forward_and_train_path(self, rng):
        from followyourclick_tpu.flow.registry import build_flow_estimator

        model = build_flow_estimator(
            {"type": "GMA", "decoder": {"iters": 2, "heads": 1}})
        assert model.config.use_gma
        img = jax.random.uniform(rng, (1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), img, img, iters=1)
        flow = model.apply(variables, img, img, iters=2)
        assert flow.shape == (1, 64, 64, 2)
        ups = model.apply(variables, img, img, iters=2,
                          return_intermediate=True)
        assert ups.shape == (2, 1, 64, 64, 2)
        # the zero-init gamma gate makes GMA start as plain RAFT: the
        # aggregator must expose a gamma param
        assert "aggregator" in variables["params"]["decoder"]


class TestFlowNetCSS:
    def test_stacked_forward(self, rng):
        from followyourclick_tpu.flow.registry import build_flow_estimator

        model = build_flow_estimator({"type": "FlowNetCSS"})
        img = jax.random.uniform(rng, (1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), img, img)
        # three stacked sub-estimators present
        assert {"flownetC", "flownetS1", "flownetS2"} <= set(
            params["params"])
        flow = model.apply(params, img, img, inference=True)
        assert flow.shape == (1, 64, 64, 2)
        assert np.isfinite(np.asarray(flow)).all()

    def test_border_padding_warp(self, rng):
        from followyourclick_tpu.flow.ops import flow_warp

        feat = jax.random.normal(rng, (1, 6, 6, 2))
        flow = jnp.full((1, 6, 6, 2), 10.0)  # everything out of range
        out = flow_warp(feat, flow, padding_mode="border")
        # border mode clamps to the last pixel instead of zeroing
        np.testing.assert_allclose(
            np.asarray(out[0, 0, 0]), np.asarray(feat[0, -1, -1]), atol=1e-5)


class TestMaskFlowNetS:
    def test_upsample2_align_corners_semantics(self):
        from followyourclick_tpu.flow.maskflownet import (
            upsample2_align_corners,
        )

        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        up = upsample2_align_corners(x)
        assert up.shape == (1, 4, 4, 1)
        # even positions reproduce the original samples
        np.testing.assert_allclose(np.asarray(up[0, ::2, ::2, 0]),
                                   np.asarray(x[0, :, :, 0]))
        # odd positions are neighbour averages
        assert float(up[0, 0, 1, 0]) == pytest.approx(0.5)
        assert float(up[0, 1, 0, 0]) == pytest.approx(1.0)

    def test_forward_and_masks(self, rng):
        from followyourclick_tpu.flow.registry import build_flow_estimator

        model = build_flow_estimator({"type": "MaskFlowNetS"})
        img = jax.random.uniform(rng, (1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), img, img)
        preds = model.apply(params, img, img)
        assert set(preds) == {"level2", "level3", "level4", "level5",
                              "level6"}
        assert preds["level2"].shape == (1, 16, 16, 2)
        gt = jax.random.normal(rng, (1, 64, 64, 2)) * 3
        assert float(multi_level_epe_loss(preds, gt)) > 0

        flow, mask = model.apply(params, img, img, inference=True,
                                 return_mask=True)
        assert flow.shape == (1, 64, 64, 2)
        # level-3 upmask (16x16) upsampled 4x -> 64x64 stage-2 seed
        assert mask.shape == (1, 64, 64, 1)
        assert np.isfinite(np.asarray(flow)).all()


class TestIRRPWC:
    def test_bidirectional_forward(self, rng):
        from followyourclick_tpu.flow.registry import build_flow_estimator

        model = build_flow_estimator({"type": "IRRPWC"})
        img = jax.random.uniform(rng, (1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), img, img)
        flow_preds, occ_preds = model.apply(params, img, img)
        for d in ("flow_fw", "flow_bw"):
            assert set(flow_preds[d]) == {f"level{i}" for i in range(7)}
            # refined levels carry [raw, refined] pairs
            assert len(flow_preds[d]["level2"]) == 2
            assert len(flow_preds[d]["level0"]) == 1
        assert occ_preds["occ_fw"]["level0"][0].shape == (1, 64, 64, 1)
        # shared decoders: ONE flow decoder used for every level + direction
        assert "flow_decoders" in params["params"]
        flow = model.apply(params, img, img, inference=True)
        assert flow.shape == (1, 64, 64, 2)
        assert np.isfinite(np.asarray(flow)).all()

    def test_local_conv_refine_smooths(self, rng):
        from followyourclick_tpu.flow.irrpwc import LocalConvRefine

        mod = LocalConvRefine(feat_channels=(8, 8))
        feat = jax.random.normal(rng, (1, 8, 8, 4))
        target = jax.random.normal(jax.random.PRNGKey(9), (1, 8, 8, 2)) * 10
        params = mod.init(jax.random.PRNGKey(0), feat, target)
        out = mod.apply(params, feat, target)
        assert out.shape == target.shape
        # a softmax-weighted local average cannot exceed the local max
        assert float(jnp.abs(out).max()) <= float(jnp.abs(target).max()) + 1e-4


class TestLiteFlowNet:
    def test_cascade_forward(self, rng):
        from followyourclick_tpu.flow.registry import build_flow_estimator

        model = build_flow_estimator({"type": "LiteFlowNet"})
        img = jax.random.uniform(rng, (1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), img, img)
        preds = model.apply(params, img, img)
        assert set(preds) == {"level2", "level3", "level4", "level5",
                              "level6"}
        # NetC has stride 1 at level1: level2 is 1/2 res
        assert preds["level2"].shape == (1, 32, 32, 2)
        # cascaded M/S/R blocks exist per level
        for name in ("NetM_level2", "NetS_level2", "NetR_level2"):
            assert name in params["params"]
        gt = jax.random.normal(rng, (1, 64, 64, 2)) * 3
        assert float(multi_level_epe_loss(preds, gt)) > 0
        flow = model.apply(params, img, img, inference=True)
        assert flow.shape == (1, 64, 64, 2)
        assert np.isfinite(np.asarray(flow)).all()

    def test_strided_correlation(self, rng):
        from followyourclick_tpu.flow.ops import local_correlation

        f = jax.random.normal(rng, (1, 8, 8, 4))
        corr = local_correlation(f, f, max_displacement=3, dilation_patch=2,
                                 stride=2)
        assert corr.shape == (1, 4, 4, 49)
        # centre tap at strided positions = squared norm at those positions
        centre = np.asarray(corr[0, :, :, 24])
        expect = np.asarray(jnp.sum(f[0, ::2, ::2] ** 2, axis=-1))
        np.testing.assert_allclose(centre, expect, rtol=1e-5)
