"""Config-driven model construction (the mmflow registry/builder layer,
``mmflow/mmflow/models/builder.py``): build flow estimators from dicts so the
reference's python-config style (``configs/_base_/models/raft.py``) maps
directly.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

FLOW_ESTIMATORS: Dict[str, Callable[..., Any]] = {}


def register_flow_estimator(name: str):
    def deco(fn):
        FLOW_ESTIMATORS[name] = fn
        return fn

    return deco


@register_flow_estimator("RAFT")
def _build_raft(cfg: Dict[str, Any]):
    from followyourclick_tpu.flow.raft import RAFT, RAFTConfig

    decoder = cfg.get("decoder", {})
    return RAFT(
        RAFTConfig(
            num_levels=cfg.get("num_levels", 4),
            radius=cfg.get("radius", 4),
            h_channels=cfg.get("h_channels", 128),
            cxt_channels=cfg.get("cxt_channels", 128),
            iters=decoder.get("iters", 12),
        )
    )


def build_flow_estimator(cfg: Dict[str, Any]):
    """mmflow ``build_flow_estimator``: dispatch on cfg['type']."""
    kind = cfg.get("type")
    if kind not in FLOW_ESTIMATORS:
        raise KeyError(
            f"unknown flow estimator {kind!r}; registered: "
            f"{sorted(FLOW_ESTIMATORS)}"
        )
    return FLOW_ESTIMATORS[kind](cfg)


@register_flow_estimator("PWCNet")
def _build_pwcnet(cfg):
    from followyourclick_tpu.flow.pwcnet import PWCNet, PWCNetConfig

    enc = cfg.get("encoder", {})
    dec = cfg.get("decoder", {})
    corr = dec.get("corr_cfg", {})
    return PWCNet(
        PWCNetConfig(
            pyramid_channels=tuple(
                enc.get("out_channels", (16, 32, 64, 96, 128, 196))
            ),
            max_displacement=corr.get("max_displacement", 4),
            flow_div=dec.get("flow_div", 20.0),
        )
    )


@register_flow_estimator("FlowNetS")
def _build_flownets(cfg):
    from followyourclick_tpu.flow.flownet import FlowNetConfig, FlowNetS

    dec = cfg.get("decoder", {})
    return FlowNetS(FlowNetConfig(flow_div=dec.get("flow_div", 20.0)))


@register_flow_estimator("FlowNetC")
def _build_flownetc(cfg):
    from followyourclick_tpu.flow.flownet import FlowNetC, FlowNetConfig

    dec = cfg.get("decoder", {})
    return FlowNetC(FlowNetConfig(flow_div=dec.get("flow_div", 20.0)))


@register_flow_estimator("GMA")
def _build_gma(cfg):
    """GMA = RAFT with the global-motion-aggregation decoder
    (mmflow configs/gma: decoder type GMADecoder)."""
    from followyourclick_tpu.flow.raft import RAFT, RAFTConfig

    decoder = cfg.get("decoder", {})
    return RAFT(
        RAFTConfig(
            num_levels=cfg.get("num_levels", 4),
            radius=cfg.get("radius", 4),
            h_channels=cfg.get("h_channels", 128),
            cxt_channels=cfg.get("cxt_channels", 128),
            iters=decoder.get("iters", 12),
            use_gma=True,
            gma_heads=decoder.get("heads", 1),
        )
    )


@register_flow_estimator("FlowNetCSS")
def _build_flownetcss(cfg):
    from followyourclick_tpu.flow.flownet import FlowNetCSS, FlowNetConfig

    return FlowNetCSS(
        FlowNetConfig(flow_div=cfg.get("flow_div", 20.0)),
        two_s_stages=cfg.get("flownetS2", True) is not None,
    )


@register_flow_estimator("MaskFlowNetS")
def _build_maskflownets(cfg):
    from followyourclick_tpu.flow.maskflownet import (
        MaskFlowNetS,
        MaskFlowNetSConfig,
    )

    enc = cfg.get("encoder", {})
    dec = cfg.get("decoder", {})
    corr = dec.get("corr_cfg", {})
    return MaskFlowNetS(
        MaskFlowNetSConfig(
            pyramid_channels=tuple(
                enc.get("out_channels", (16, 32, 64, 96, 128, 196))
            ),
            max_displacement=corr.get("max_displacement", 4),
            flow_div=dec.get("flow_div", 20.0),
        )
    )


@register_flow_estimator("IRRPWC")
def _build_irrpwc(cfg):
    from followyourclick_tpu.flow.irrpwc import IRRPWC, IRRPWCConfig

    dec = cfg.get("decoder", {})
    return IRRPWC(
        IRRPWCConfig(
            corr_feat_channels=dec.get("corr_feat_channels", 32),
            flow_div=dec.get("flow_div", 20.0),
        )
    )


@register_flow_estimator("LiteFlowNet")
def _build_liteflownet(cfg):
    from followyourclick_tpu.flow.liteflownet import (
        LiteFlowNet,
        LiteFlowNetConfig,
    )

    dec = cfg.get("decoder", {})
    return LiteFlowNet(
        LiteFlowNetConfig(
            flow_div=dec.get("flow_div", 20.0),
            regularized_flow=dec.get("regularized_flow", True),
        )
    )


@register_flow_estimator("FlowNet2")
def _build_flownet2(cfg):
    from followyourclick_tpu.flow.flownet2 import FlowNet2, FlowNet2Config

    return FlowNet2(FlowNet2Config(flow_div=cfg.get("flow_div", 20.0)))


@register_flow_estimator("MaskFlowNet")
def _build_maskflownet(cfg):
    from followyourclick_tpu.flow.maskflownet import (
        MaskFlowNet,
        MaskFlowNetSConfig,
    )

    dec = cfg.get("decoder", {})
    return MaskFlowNet(
        MaskFlowNetSConfig(flow_div=dec.get("flow_div", 20.0))
    )
