from mural_tpu.ops.fused_code_conv import (code_conv1d, fold_bn_conv_table,
                                           code_conv1d_reference)

__all__ = ["code_conv1d", "fold_bn_conv_table", "code_conv1d_reference"]
