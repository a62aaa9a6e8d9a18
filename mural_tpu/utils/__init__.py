from mural_tpu.utils.printer import get_printer
from mural_tpu.utils.trials import (generate_trial_id, make_trial_dirs,
                                    get_best_model_from_trial)

__all__ = ["get_printer", "generate_trial_id", "make_trial_dirs",
           "get_best_model_from_trial"]
