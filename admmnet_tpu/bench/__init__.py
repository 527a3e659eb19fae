from admmnet_tpu.bench.scaling import measure_throughput, scaling_report

__all__ = ["measure_throughput", "scaling_report"]
