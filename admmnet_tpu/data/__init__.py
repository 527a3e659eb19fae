from admmnet_tpu.data.anchor import AnchorScenario, load_anchor, make_anchor_batch

__all__ = ["AnchorScenario", "load_anchor", "make_anchor_batch"]
