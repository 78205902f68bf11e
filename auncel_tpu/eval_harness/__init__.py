from auncel_tpu.eval_harness import common, bound, effect_error, effect_time, overhead

__all__ = ["common", "bound", "effect_error", "effect_time", "overhead"]
