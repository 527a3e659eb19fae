from admmnet_tpu.kernels.polar import psd_project_polar_pallas

__all__ = ["psd_project_polar_pallas"]
