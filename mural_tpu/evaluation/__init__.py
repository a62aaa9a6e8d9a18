from mural_tpu.evaluation.evaluator import (Evaluator, freq_kmer_comp_multi,
                                            corr_calc_sub, calc_avg_prob)
from mural_tpu.calibrate.fit import calibrate_prob

__all__ = ["Evaluator", "freq_kmer_comp_multi", "corr_calc_sub",
           "calc_avg_prob", "calibrate_prob"]
