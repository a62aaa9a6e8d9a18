from mural_tpu.calibrate.multinomial import MultinomialRegression
from mural_tpu.calibrate.dirichlet import (FullDirichletCalibrator,
                                           TemperatureScaling, VectorScaling)
from mural_tpu.calibrate.poisson import poisson_calibrate
from mural_tpu.calibrate.metrics import (ece, classwise_ece, brier_score,
                                         nll_from_probs)
from mural_tpu.calibrate.fit import calibrate_prob

__all__ = [
    "MultinomialRegression", "FullDirichletCalibrator",
    "TemperatureScaling", "VectorScaling", "poisson_calibrate",
    "ece", "classwise_ece", "brier_score", "nll_from_probs",
    "calibrate_prob",
]
