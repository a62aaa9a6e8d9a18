from mural_tpu.predict.pipeline import run_predict, PredictOptions

__all__ = ["run_predict", "PredictOptions"]
