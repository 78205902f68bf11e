from auncel_tpu.baselines.laet import LearnedTermination

__all__ = ["LearnedTermination"]
