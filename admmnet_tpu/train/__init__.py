from admmnet_tpu.train.losses import (
    basic_anm_loss,
    basic_parameter_loss,
    phi_alignment_loss,
)

__all__ = ["basic_anm_loss", "basic_parameter_loss", "phi_alignment_loss"]
