from admmnet_tpu.utils.host import cjit, to_device, to_host

__all__ = ["cjit", "to_device", "to_host"]
